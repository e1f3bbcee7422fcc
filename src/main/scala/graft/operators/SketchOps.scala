package graft.operators

import graft.{Graft, GraftQuery}
import graft.functions.PortableHash.pHash28
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators beyond the KMV distinct-count sketch
  * ([[graft.functions.Aggregators]]): frequency estimation under a fixed
  * memory budget. At 100 TB exact per-token counts are themselves large
  * (vocabulary-sized state per combiner is fine; the full long-tail count
  * table can still be billions of rows) — a Count-Min sketch answers
  * point-frequency queries from depth×width cells regardless of corpus
  * size, and its cell grid is a pure two-key aggregate: partial sketches
  * merge by addition, so the map side combines and the shuffle carries at
  * most depth×width rows per partition.
  */
object SketchOps {

  /** Count-Min sketch over document tokens, evaluated against truth.
    *
    * Build: every token occurrence increments `Depth` cells
    * (row r, col = hash_r(token) mod Width). Rather than fanning the raw
    * occurrence stream out `Depth`-fold, the corpus is tokenized ONCE into
    * per-token exact counts (the map-side-combined aggregate the shuffle
    * carries anyway), and the sketch cells sum those counts — the
    * generator fan-out runs over the DISTINCT vocabulary, orders of
    * magnitude smaller than the corpus; the (token, count) frame is
    * persisted because cells and probes both consume it. Probe: the exact
    * top-`TopK` tokens are looked up in the sketch (est = min over rows
    * of the addressed cells); the result reports estimate next to truth,
    * so the oracle certifies both the cell math and the one-sided error
    * (`cms_n >= exact_n` by construction; the spec asserts it, the query
    * exposes `overcount`).
    *
    * Hashes are md5-slice ([[graft.functions.PortableHash]]) so DuckDB
    * replays the exact cell grid. Width 512 / depth 3 at the test corpus
    * scale gives visible-but-small collisions (overcount is nonzero for
    * some probes — the sketch is exercised, not vacuous).
    */
  object CountMin extends GraftQuery {
    val name = "q_countmin"
    private val Depth = 3
    private val Width = 512
    private val TopK = 10
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val exact = Graft.table(spark, sfDir, "documents")
        .select(explode(graft.text.TextOps.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("exact_n"))
        // vocab-sized barrier: cells and probes both consume it (released
        // by the caller via clearCache, as with every persisted barrier)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val rows = array((0 until Depth).map(lit): _*)
      val cell = (pHash28(concat(col("r").cast("string"), lit(":"),
        col("token"))) % Width).as("c")
      val cells = exact
        .select(col("token"), col("exact_n"), explode(rows).as("r"))
        .select(col("r"), cell, col("exact_n"))
        .groupBy("r", "c").agg(sum(col("exact_n")).as("cell_n"))
      val probes = exact
        .orderBy(col("exact_n").desc, col("token").asc)
        .limit(TopK)
        .select(col("token"), col("exact_n"), explode(rows).as("r"))
        .select(col("token"), col("exact_n"), col("r"), cell)
      probes.join(cells, Seq("r", "c"))
        .groupBy("token", "exact_n")
        .agg(min(col("cell_n")).as("cms_n"))
        .select(col("token"), col("exact_n"), col("cms_n"),
          (col("cms_n") - col("exact_n")).as("overcount"))
        .orderBy(col("exact_n").desc, col("token").asc)
    }
    val oracle = Some(
      s"""WITH toks AS (
         |  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
         |  FROM documents),
         |rows_ AS (SELECT unnest([0, 1, 2]) AS r),
         |cells AS (
         |  SELECT r,
         |         ('0x' || substr(md5(r::VARCHAR || ':' || token), 1, 7))::BIGINT
         |           % $Width AS c,
         |         count(*) AS cell_n
         |  FROM toks CROSS JOIN rows_ GROUP BY 1, 2),
         |probes AS (
         |  SELECT token, count(*) AS exact_n FROM toks GROUP BY 1
         |  ORDER BY exact_n DESC, token LIMIT $TopK),
         |addressed AS (
         |  SELECT p.token, p.exact_n, r.r,
         |         ('0x' || substr(md5(r.r::VARCHAR || ':' || p.token), 1, 7))::BIGINT
         |           % $Width AS c
         |  FROM probes p CROSS JOIN rows_ r)
         |SELECT a.token, a.exact_n, min(cells.cell_n) AS cms_n,
         |       min(cells.cell_n) - a.exact_n AS overcount
         |FROM addressed a JOIN cells ON cells.r = a.r AND cells.c = a.c
         |GROUP BY 1, 2
         |ORDER BY exact_n DESC, token""".stripMargin)
  }

  val all: Seq[GraftQuery] = Seq(CountMin)
}
