package graft.sources

import graft.{Graft, GraftQuery}
import graft.images.ImageOps
import graft.multimodal.TiffCodec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import SourceQueries.{workDir, mediaScale, scaledTag}
import ImageSourceQueries.{ensureImageTree, ensureTwoToneTree, ensureQoiTree}

/** Image perceptual dedup: aHash fingerprints, banded near-dup join,
  * end-to-end cluster + representative tier.
  * Split from SourceQueries.scala (round 10) - mechanical move, no
  * behavior change; fixture dirs and oracle SQL are byte-identical.
  */
object ImageDedupQueries {

  /** All three decodable image fixture trees reduced to 64-bit aHash
    * perceptual fingerprints ([[ImageOps.aHash64]]) — the shared scan
    * both image-dedup queries build on. One row per image: tree kind
    * (`s` solid PNG / `t` two-tone PNG / `x` QOI), filename index, the
    * hash split into two 32-bit halves (sign-safe in every SQL engine),
    * and byte length. Decode happens where the scan put the bytes; only
    * 4-long rows move afterwards — at 100 TB the binaries never shuffle.
    */
  private[sources] def aHashRows(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def scan(root: String, glob: String, kind: String, re: String,
        viaQoi: Boolean): DataFrame = {
      val rex = re.r
      spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(root)
        .select(col("path"), col("content"))
        .as[(String, Array[Byte])]
        .flatMap { case (path, content) =>
          val img =
            if (viaQoi) graft.multimodal.QoiCodec.decode(content)
              .map(graft.multimodal.QoiCodec.toImage)
            else ImageOps.decode(content)
          for (im <- img.toSeq; m <- rex.findFirstMatchIn(path).toSeq) yield {
            val hsh = ImageOps.aHash64(im)
            (kind, m.group(1).toLong, hsh >>> 32, hsh & 0xFFFFFFFFL,
              content.length.toLong)
          }
        }
        .toDF("kind", "asset_idx", "hash_hi", "hash_lo", "n_bytes")
    }
    scan(ensureImageTree(sfDir), "*.png", "s", "img(\\d+)\\.png", viaQoi = false)
      .unionByName(scan(ensureTwoToneTree(sfDir), "*.png", "t", "img(\\d+)\\.png", viaQoi = false))
      .unionByName(scan(ensureQoiTree(sfDir), "*.qoi", "x", "q(\\d+)\\.qoi", viaQoi = true))
  }

  /** Shared closed-form hash replay for the aHash oracles: every bit of
    * every fingerprint from the fixture formulas alone. Solid PNGs hash
    * to 0 (every cell mean equals the global mean — ties clear no bit);
    * two-tone PNGs reduce to one luma comparison (gA > gB flips at
    * i = 19), producing the 40-bit left mask or the 24-bit right mask;
    * QOI plateaus are replayed pixel-by-pixel through the same
    * cross-multiplied cell-vs-global compare.
    */
  private[sources] val aHashOracleCte =
    """h AS (
      |  SELECT 's' AS kind, i.i AS asset_idx,
      |         CAST(0 AS BIGINT) AS hash_hi, CAST(0 AS BIGINT) AS hash_lo
      |  FROM unnest(range(0, 24)) i(i)
      |  UNION ALL
      |  SELECT 't', i.i,
      |         CASE WHEN -3691 * i.i + 68185 > 0
      |              THEN CAST(31 AS BIGINT) * 16843009
      |              ELSE CAST(224 AS BIGINT) * 16843009 END,
      |         CASE WHEN -3691 * i.i + 68185 > 0
      |              THEN CAST(31 AS BIGINT) * 16843009
      |              ELSE CAST(224 AS BIGINT) * 16843009 END
      |  FROM unnest(range(0, 24)) i(i)
      |  UNION ALL
      |  SELECT 'x', asset_idx, hash_hi, hash_lo FROM (
      |    WITH px AS (
      |      SELECT i.i AS asset_idx,
      |             (8 * y.y) // 14 * 8 + (8 * x.x) // 20 AS k,
      |             299 * ((5 * i.i + 3 * (x.x // 5) + 7 * (y.y // 3)) % 256)
      |             + 587 * ((3 * i.i + 2 * (x.x // 5) + 5 * (y.y // 3)) % 256)
      |             + 114 * ((7 * i.i + (x.x // 5) + (y.y // 3)) % 256) AS luma
      |      FROM unnest(range(0, 24)) i(i),
      |           LATERAL unnest(range(0, 20)) x(x),
      |           LATERAL unnest(range(0, 14)) y(y)),
      |    cells AS (
      |      SELECT asset_idx, k, sum(luma) AS cs, count(*) AS cn
      |      FROM px GROUP BY 1, 2),
      |    tot AS (
      |      SELECT asset_idx, sum(cs) AS ts, sum(cn) AS tn
      |      FROM cells GROUP BY 1),
      |    bits AS (
      |      SELECT c.asset_idx, c.k
      |      FROM cells c JOIN tot t USING (asset_idx)
      |      WHERE c.cs * t.tn > t.ts * c.cn)
      |    SELECT t.asset_idx,
      |           CAST(coalesce(sum(CASE WHEN b.k >= 32
      |                  THEN (CAST(1 AS BIGINT) << (b.k - 32)) END), 0)
      |                AS BIGINT) AS hash_hi,
      |           CAST(coalesce(sum(CASE WHEN b.k < 32
      |                  THEN (CAST(1 AS BIGINT) << b.k) END), 0)
      |                AS BIGINT) AS hash_lo
      |    FROM tot t LEFT JOIN bits b USING (asset_idx)
      |    GROUP BY 1))""".stripMargin

  /** Image perceptual fingerprints under the hash gate: one aHash per
    * image across the solid-PNG, two-tone-PNG, and QOI fixture trees,
    * through the REAL decode paths ([[ImageOps.decode]] / the from-spec
    * [[graft.multimodal.QoiCodec]]). The oracle replays every bit of
    * every hash in closed form from the fixture formulas (no reference
    * hash constants — the same cross-multiplied integer compare on both
    * sides) and pins byte identity via `read_blob`. This is the
    * image-tier analogue of `q_doc_fingerprint`: the fingerprint the
    * image-dedup pipeline keys on, verified bit-for-bit.
    */
  object ImageAHash extends GraftQuery {
    val name = "q_image_ahash"
    def run(spark: SparkSession, sfDir: String): DataFrame =
      aHashRows(spark, sfDir).orderBy("kind", "asset_idx")
    // Pinned-glob stance like the other fixture scans: static oracle
    // text, correctness gate at sf0.01 only.
    val oracle = Some(
      s"""WITH $aHashOracleCte,
        |b AS (
        |  SELECT 's' AS kind,
        |         CAST(regexp_extract(filename, 'img(\\d+)\\.png', 1) AS BIGINT)
        |           AS asset_idx,
        |         CAST(octet_length(content) AS BIGINT) AS n_bytes
        |  FROM read_blob('/tmp/graft_img__root_testdata_sf0.01/**/*.png')
        |  UNION ALL
        |  SELECT 't',
        |         CAST(regexp_extract(filename, 'img(\\d+)\\.png', 1) AS BIGINT),
        |         CAST(octet_length(content) AS BIGINT)
        |  FROM read_blob('/tmp/graft_img2__root_testdata_sf0.01/**/*.png')
        |  UNION ALL
        |  SELECT 'x',
        |         CAST(regexp_extract(filename, 'q(\\d+)\\.qoi', 1) AS BIGINT),
        |         CAST(octet_length(content) AS BIGINT)
        |  FROM read_blob('/tmp/graft_qoi__root_testdata_sf0.01/**/*.qoi'))
        |SELECT h.kind, h.asset_idx, h.hash_hi, h.hash_lo, b.n_bytes
        |FROM h JOIN b USING (kind, asset_idx)
        |ORDER BY h.kind, h.asset_idx""".stripMargin)
  }

  /** Image near-duplicate detection — the multimodal twin of the MinHash
    * band join: 16-bit bands of each aHash bucket the candidates (a
    * pair collides iff it shares ≥ 1 of 4 bands — pigeonhole guarantees
    * recall for Hamming < 4; the standard LSH recall trade beyond), an
    * equi-join on (band index, band value) generates candidates WITHOUT
    * any all-pairs scan, and the exact Hamming ≤ 10 filter keeps true
    * near-dups.
    *
    * Round 10: EXACT-CLASS COLLAPSE ahead of the banded join (the
    * pattern `q_embed_neardup_lsh_adaptive` proved for embeddings, and
    * the round-9 ×1/×10 audit demanded for media — the solid-PNG tree
    * is ONE identical-hash class, quadratic in the band buckets). The
    * join now sees one row per DISTINCT fingerprint, so bucket
    * occupancy tracks distinct hashes, not corpus size; within-class
    * (dist-0) pairs are regenerated by an O(members) expansion join and
    * cross-class candidates by two member joins on the hash key. The
    * output set — and therefore the oracle — is unchanged. At 100 TB
    * this is the plan you'd run: exact duplicates (the fat head of any
    * crawl) never enter the candidate join at all.
    */
  object ImageNearDup extends GraftQuery {
    val name = "q_image_neardup"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val ids = aHashRows(spark, sfDir)
        .select(concat(col("kind"), lpad(col("asset_idx").cast("string"), 3, "0")).as("id"),
          col("hash_hi"), col("hash_lo"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // one node per distinct fingerprint; rep = lexicographic min id
      val classes = ids.groupBy("hash_hi", "hash_lo").agg(min(col("id")).as("rep"))
      val bands = classes.select(col("rep"), col("hash_hi"), col("hash_lo"),
        posexplode(array(
          col("hash_lo").bitwiseAND(lit(65535L)),
          shiftright(col("hash_lo"), 16).bitwiseAND(lit(65535L)),
          col("hash_hi").bitwiseAND(lit(65535L)),
          shiftright(col("hash_hi"), 16).bitwiseAND(lit(65535L)))))
        .withColumnRenamed("pos", "band_idx")
        .withColumnRenamed("col", "band_val")
      val a = bands.select(col("band_idx"), col("band_val"),
        col("rep").as("rep_a"), col("hash_hi").as("hi_a"), col("hash_lo").as("lo_a"))
      val b = bands.select(col("band_idx"), col("band_val"),
        col("rep").as("rep_b"), col("hash_hi").as("hi_b"), col("hash_lo").as("lo_b"))
      val clsPairs = a.join(b, Seq("band_idx", "band_val"))
        .where(col("rep_a") < col("rep_b"))
        .select(col("hi_a"), col("lo_a"), col("hi_b"), col("lo_b"),
          (expr("bit_count(hi_a ^ hi_b)") + expr("bit_count(lo_a ^ lo_b)"))
            .cast("long").as("dist"))
        .distinct()
        .where(col("dist") <= 10)
      // cross-class pairs: expand each surviving class pair to its members
      val cross = clsPairs
        .join(ids.select(col("hash_hi").as("hi_a"), col("hash_lo").as("lo_a"),
          col("id").as("ida")), Seq("hi_a", "lo_a"))
        .join(ids.select(col("hash_hi").as("hi_b"), col("hash_lo").as("lo_b"),
          col("id").as("idb")), Seq("hi_b", "lo_b"))
        .select(least(col("ida"), col("idb")).as("id_a"),
          greatest(col("ida"), col("idb")).as("id_b"), col("dist"))
      // within-class pairs are exact duplicates: dist 0 by construction
      val within = ids.as("x")
        .join(ids.as("y"), col("x.hash_hi") === col("y.hash_hi")
          && col("x.hash_lo") === col("y.hash_lo") && col("x.id") < col("y.id"))
        .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
          lit(0L).as("dist"))
      cross.unionByName(within).orderBy("id_a", "id_b")
    }
    val oracle = Some(
      s"""WITH $aHashOracleCte,
        |ids AS (
        |  SELECT kind || lpad(CAST(asset_idx AS VARCHAR), 3, '0') AS id,
        |         hash_hi, hash_lo
        |  FROM h),
        |bands AS (
        |  SELECT id, hash_hi, hash_lo, b.b AS band_idx,
        |         CASE b.b
        |           WHEN 0 THEN hash_lo % 65536
        |           WHEN 1 THEN hash_lo // 65536
        |           WHEN 2 THEN hash_hi % 65536
        |           ELSE hash_hi // 65536 END AS band_val
        |  FROM ids, LATERAL unnest(range(0, 4)) b(b)),
        |pairs AS (
        |  SELECT DISTINCT a.id AS id_a, c.id AS id_b,
        |         CAST(bit_count(xor(a.hash_hi, c.hash_hi))
        |              + bit_count(xor(a.hash_lo, c.hash_lo)) AS BIGINT) AS dist
        |  FROM bands a JOIN bands c USING (band_idx, band_val)
        |  WHERE a.id < c.id)
        |SELECT id_a, id_b, dist FROM pairs
        |WHERE dist <= 10
        |ORDER BY id_a, id_b""".stripMargin)
  }

  /** Image dedup taken END-TO-END: the near-dup PAIR graph
    * (`q_image_neardup`'s banded aHash join, here on numeric ids:
    * kind-code·1000 + asset index) contracted to connected components
    * ([[graft.dedup.Dedup.connectedComponents]] — the same log-round
    * machinery the text tier uses) with the production keep policy:
    * each cluster's representative is its LARGEST member by byte size
    * (keep the best-resolution copy; ties → smaller id, encoded as one
    * integer argmax key since ids are < 10⁵). This is what a real
    * pipeline does with near-dup pairs — pairs are evidence, clusters
    * are the dedup decision. The oracle replays the hashes closed-form,
    * the banding + Hamming gate, the components as a recursive CTE, and
    * the same max_by policy; cluster membership at corpus scale is
    * orders of magnitude smaller than the corpus, so everything after
    * the band join is bounded by the dedup output.
    */
  object ImageDedupCluster extends GraftQuery {
    val name = "q_image_dedup_cluster"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val ids = aHashRows(spark, sfDir)
        .select((when(col("kind") === "s", 0L).when(col("kind") === "t", 1L)
          .otherwise(2L) * 1000L + col("asset_idx")).as("nid"),
          col("hash_hi"), col("hash_lo"), col("n_bytes"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // round 10: exact-class collapse (see ImageNearDup) — the banded
      // join and the CC fixpoint both run on one node per DISTINCT
      // fingerprint; members rejoin by hash afterwards. An exact class
      // is a cluster already, so a size≥2 class with no cross-class
      // edge still surfaces (labelled by its own min id), exactly as
      // the member-level pair graph produced before.
      val classes = ids.groupBy("hash_hi", "hash_lo")
        .agg(min(col("nid")).as("rep"), count(lit(1)).as("cls_size"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bands = classes.select(col("rep"), col("hash_hi"), col("hash_lo"),
        posexplode(array(
          col("hash_lo").bitwiseAND(lit(65535L)),
          shiftright(col("hash_lo"), 16).bitwiseAND(lit(65535L)),
          col("hash_hi").bitwiseAND(lit(65535L)),
          shiftright(col("hash_hi"), 16).bitwiseAND(lit(65535L)))))
        .withColumnRenamed("pos", "band_idx")
        .withColumnRenamed("col", "band_val")
      val a = bands.select(col("band_idx"), col("band_val"),
        col("rep").as("doc_a"), col("hash_hi").as("hi_a"), col("hash_lo").as("lo_a"))
      val b = bands.select(col("band_idx"), col("band_val"),
        col("rep").as("doc_b"), col("hash_hi").as("hi_b"), col("hash_lo").as("lo_b"))
      val clsEdges = a.join(b, Seq("band_idx", "band_val"))
        .where(col("doc_a") < col("doc_b"))
        .where(expr("bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b)") <= 10)
        .select("doc_a", "doc_b").distinct()
      val ccLabels = graft.dedup.Dedup.connectedComponents(clsEdges)
        .withColumnRenamed("id", "rep")
      val clsLabeled = classes.join(ccLabels, Seq("rep"), "left")
        .where(col("label").isNotNull || col("cls_size") >= 2)
        .select(col("hash_hi"), col("hash_lo"),
          coalesce(col("label"), col("rep")).as("label"))
      ids.join(clsLabeled, Seq("hash_hi", "hash_lo"))
        .groupBy(col("label").as("cluster_id"))
        .agg(count(lit(1)).as("cluster_size"),
          max_by(col("nid"), col("n_bytes") * 100000L - col("nid"))
            .as("representative"),
          countDistinct(expr("nid div 1000")).as("n_kinds"))
        .orderBy("cluster_id")
    }
    val oracle = Some(
      s"""WITH RECURSIVE $aHashOracleCte,
        |b0 AS (
        |  SELECT 's' AS kind,
        |         CAST(regexp_extract(filename, 'img(\\d+)\\.png', 1) AS BIGINT)
        |           AS asset_idx,
        |         CAST(octet_length(content) AS BIGINT) AS n_bytes
        |  FROM read_blob('/tmp/graft_img__root_testdata_sf0.01/**/*.png')
        |  UNION ALL
        |  SELECT 't',
        |         CAST(regexp_extract(filename, 'img(\\d+)\\.png', 1) AS BIGINT),
        |         CAST(octet_length(content) AS BIGINT)
        |  FROM read_blob('/tmp/graft_img2__root_testdata_sf0.01/**/*.png')
        |  UNION ALL
        |  SELECT 'x',
        |         CAST(regexp_extract(filename, 'q(\\d+)\\.qoi', 1) AS BIGINT),
        |         CAST(octet_length(content) AS BIGINT)
        |  FROM read_blob('/tmp/graft_qoi__root_testdata_sf0.01/**/*.qoi')),
        |ids AS (
        |  SELECT (CASE h.kind WHEN 's' THEN 0 WHEN 't' THEN 1 ELSE 2 END)
        |           * 1000 + h.asset_idx AS nid,
        |         h.hash_hi, h.hash_lo, b0.n_bytes
        |  FROM h JOIN b0 USING (kind, asset_idx)),
        |bands AS (
        |  SELECT nid, hash_hi, hash_lo, bb.b AS band_idx,
        |         CASE bb.b
        |           WHEN 0 THEN hash_lo % 65536
        |           WHEN 1 THEN hash_lo // 65536
        |           WHEN 2 THEN hash_hi % 65536
        |           ELSE hash_hi // 65536 END AS band_val
        |  FROM ids, LATERAL unnest(range(0, 4)) bb(b)),
        |pr AS (
        |  SELECT DISTINCT a.nid AS da, c.nid AS db
        |  FROM bands a JOIN bands c USING (band_idx, band_val)
        |  WHERE a.nid < c.nid
        |    AND bit_count(xor(a.hash_hi, c.hash_hi))
        |        + bit_count(xor(a.hash_lo, c.hash_lo)) <= 10),
        |edges AS (SELECT da AS src, db AS dst FROM pr
        |          UNION SELECT db, da FROM pr),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |labels AS (
        |  SELECT src AS id, least(src, min(dst)) AS label
        |  FROM reach GROUP BY src)
        |SELECT l.label AS cluster_id, count(*) AS cluster_size,
        |       max_by(l.id, i.n_bytes * 100000 - l.id) AS representative,
        |       CAST(count(DISTINCT l.id // 1000) AS BIGINT) AS n_kinds
        |FROM labels l JOIN ids i ON l.id = i.nid
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }
}
