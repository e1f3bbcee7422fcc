package graft.text

import graft.{Graft, GraftQuery}
import graft.functions.SafeMath._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data-pipeline surface
  * (SURVEY §2.9 north-star): tokenization, token stats, quality scoring,
  * language ID, fingerprinting, pairwise similarity. All pure column
  * expressions — codegen'd, no UDFs — so they survive 100 TB fan-out.
  */
object TextOps {

  /** Whitespace tokenizer — trim first so leading/trailing blanks don't
    * produce empty tokens (matches the DuckDB oracle's
    * `string_split_regex(trim(text), '\s+')`). Whitespace is an explicit
    * char class equal to RE2's `\s`: Java's `\s` additionally matches
    * vertical tab (), which would split differently from every
    * DuckDB oracle on text containing one.
    */
  val WhitespaceClass = "[ \\t\\n\\f\\r]+"
  def tokens(c: Column): Column = split(trim(c), WhitespaceClass)

  val stopwords = Seq("the", "a", "of", "and", "to", "in")

  /** Per-language marker stopwords for the n-gram/stopword language-ID
    * heuristic. (The synthetic corpus is English-vocabulary, so real inputs
    * mostly resolve to "en" — the op's value is its shape + determinism.)
    */
  val langMarkers: Seq[(String, String)] = Seq(
    "the" -> "en", "a" -> "en", "of" -> "en",
    "el" -> "es", "la" -> "es", "los" -> "es",
    "le" -> "fr", "les" -> "fr", "des" -> "fr",
    "der" -> "de", "die" -> "de", "und" -> "de",
    "de" -> "zh")

  /** Token totals per language bucket. */
  object TokenCount extends GraftQuery {
    val name = "q_token_count"
    def run(spark: SparkSession, sfDir: String): DataFrame =
      Graft.table(spark, sfDir, "documents")
        .select(col("lang"), size(tokens(col("text"))).as("n_tok"))
        .groupBy("lang")
        .agg(sum(col("n_tok")).as("total_tokens"), count(lit(1)).as("n_docs"))
        .orderBy("lang")
    val oracle = Some(
      """SELECT lang,
        |       CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS total_tokens,
        |       count(*) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Stopword ratio of a token-array column (÷0→0 like every safe ratio
    * in the engine). Shared by [[QualityScore]] and the cluster-curation
    * query in [[graft.dedup.Dedup]] — ONE copy of the expression shape so
    * the scores stay bit-identical wherever quality is consumed.
    */
  def stopRatioExpr(tok: Column): Column =
    safeDiv(size(filter(tok, t => t.isin(stopwords.map(lit): _*))).cast("double"),
      size(tok).cast("double"))

  /** Composite quality of a token-array column: stopword ratio + length
    * saturation, equally weighted.
    */
  def qualityExpr(tok: Column): Column =
    stopRatioExpr(tok) * lit(0.5) +
      (least(size(tok).cast("double"), lit(100.0)) / lit(100.0)) * lit(0.5)

  /** DuckDB replay of [[qualityExpr]] over a SQL token-list expression. */
  def qualitySql(toks: String): String =
    s"""(CASE WHEN len($toks) = 0 THEN 0.0
       |      ELSE CAST(len(list_filter($toks, t -> t IN ($stopListSql))) AS DOUBLE)
       |           / CAST(len($toks) AS DOUBLE) END) * 0.5
       |+ (least(CAST(len($toks) AS DOUBLE), 100.0) / 100.0) * 0.5""".stripMargin

  private[graft] val stopListSql = stopwords.map(s => s"'$s'").mkString(", ")

  /** Heuristic quality score: stopword ratio + length saturation. Every term
    * is an identical IEEE expression in both engines (integer counts →
    * double divisions), so scores are bit-deterministic.
    */
  object QualityScore extends GraftQuery {
    val name = "q_quality_score"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val tok = tokens(col("text"))
      Graft.table(spark, sfDir, "documents")
        .select(col("doc_id"),
          size(tok).cast("long").as("n_tokens"),
          stopRatioExpr(tok).as("stop_ratio"),
          qualityExpr(tok).as("quality"))
        .orderBy("doc_id")
    }
    private val stopList = stopListSql
    val oracle = Some(
      s"""SELECT doc_id,
         |       len(toks) AS n_tokens,
         |       CASE WHEN len(toks) = 0 THEN 0.0
         |            ELSE CAST(len(list_filter(toks, t -> t IN ($stopList))) AS DOUBLE)
         |                 / CAST(len(toks) AS DOUBLE) END AS stop_ratio,
         |       (CASE WHEN len(toks) = 0 THEN 0.0
         |             ELSE CAST(len(list_filter(toks, t -> t IN ($stopList))) AS DOUBLE)
         |                  / CAST(len(toks) AS DOUBLE) END) * 0.5
         |       + (least(CAST(len(toks) AS DOUBLE), 100.0) / 100.0) * 0.5 AS quality
         |FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents)
         |ORDER BY doc_id""".stripMargin)
  }

  /** Stopword-marker language ID: explode tokens, join a broadcast marker
    * dim, argmax votes per doc with alphabetical tie-break, 'und' when no
    * marker hits. Relational formulation — identical in both engines.
    */
  /** Shared language-ID kernel: per-doc (pred_lang, votes) from the
    * marker-vote argmax — consumed by [[LangId]] (per-doc report) and
    * [[LangConfusion]] (label-vs-prediction matrix).
    */
  private[text] def langPredictions(docs: DataFrame): DataFrame = {
    val sp = docs.sparkSession
    import sp.implicits._
    val markers = langMarkers.toDF("marker", "cand_lang")
    val votes = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .join(broadcast(markers), col("tok") === col("marker"))
      .groupBy("doc_id", "cand_lang").agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("votes").desc, col("cand_lang").asc)
    val best = votes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("cand_lang"), col("votes"))
    docs.select(col("doc_id"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cand_lang"), lit("und")).as("pred_lang"),
        coalesce(col("votes"), lit(0L)).as("votes"))
  }

  private val markerValues = langMarkers
    .map { case (m, l) => s"('$m', '$l')" }.mkString(", ")

  /** The language-ID CTE chain both oracles share: `pred` ends as
    * (doc_id, lang, pred_lang, votes).
    */
  private val langPredSql =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
       |  FROM documents),
       |votes AS (
       |  SELECT doc_id, cand_lang, count(*) AS votes
       |  FROM toks JOIN (VALUES $markerValues) m(marker, cand_lang) ON tok = marker
       |  GROUP BY 1, 2),
       |best AS (
       |  SELECT doc_id, cand_lang, votes,
       |         row_number() OVER (PARTITION BY doc_id
       |                            ORDER BY votes DESC, cand_lang ASC) AS rn
       |  FROM votes),
       |pred AS (
       |  SELECT d.doc_id, d.lang,
       |         coalesce(b.cand_lang, 'und') AS pred_lang,
       |         coalesce(b.votes, 0) AS votes
       |  FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
       |    ON d.doc_id = b.doc_id)""".stripMargin

  object LangId extends GraftQuery {
    val name = "q_lang_id"
    def run(spark: SparkSession, sfDir: String): DataFrame =
      langPredictions(Graft.table(spark, sfDir, "documents"))
        .orderBy("doc_id")
    val oracle = Some(
      s"""$langPredSql
         |SELECT doc_id, pred_lang, votes FROM pred ORDER BY doc_id""".stripMargin)
  }

  /** Label-vs-prediction confusion matrix for the language classifier —
    * the evaluation twin of [[LangId]]: how often does the n-gram
    * heuristic agree with the corpus's `lang` metadata, and where does it
    * bleed. One extra small-key aggregate on top of the prediction kernel;
    * the output is |langs|² rows regardless of corpus size.
    */
  object LangConfusion extends GraftQuery {
    val name = "q_lang_confusion"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val docs = Graft.table(spark, sfDir, "documents")
      docs.select(col("doc_id"), col("lang"))
        .join(langPredictions(docs), Seq("doc_id"))
        .groupBy("lang", "pred_lang")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred_lang")
    }
    val oracle = Some(
      s"""$langPredSql
         |SELECT lang, pred_lang, count(*) AS n
         |FROM pred GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }

  /** Content fingerprint: md5 of the normalized text — the exact-dedup key
    * ([[graft.dedup.Dedup.ExactDedup]] groups on it); md5 is the hash both
    * engines share bit-for-bit.
    */
  object Fingerprint extends GraftQuery {
    val name = "q_doc_fingerprint"
    def run(spark: SparkSession, sfDir: String): DataFrame =
      Graft.table(spark, sfDir, "documents")
        .select(col("doc_id"), md5(to_binary(lower(trim(col("text"))), lit("utf-8"))).as("fp"))
        .orderBy("doc_id")
    val oracle = Some(
      """SELECT doc_id, md5(lower(trim(text))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin)
  }

  /** Pairwise token-set Jaccard similarity over a bounded candidate set
    * (doc_id < 20) — the n-gram Jaccard family with n=1; the shingle (n=3)
    * variant is [[graft.dedup.Dedup.ShingleJaccard]]. Pure relational:
    * distinct tokens, self-join on token, |∩| / (|A|+|B|−|∩|).
    */
  object TokenJaccard extends GraftQuery {
    val name = "q_token_jaccard"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val docs = Graft.table(spark, sfDir, "documents").filter(col("doc_id") < 20)
      val t = docs
        .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("tok"))
      val sizes = t.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = t.as("a").join(t.as("b"),
          col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_inter"))
      inter
        .join(sizes.withColumnRenamed("n", "n_a"), col("doc_a") === sizes("doc_id"))
        .drop("doc_id")
        .join(sizes.withColumnRenamed("n", "n_b"), col("doc_b") === sizes("doc_id"))
        .select(col("doc_a"), col("doc_b"),
          (col("n_inter").cast("double") /
            (col("n_a") + col("n_b") - col("n_inter")).cast("double")).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    }
    val oracle = Some(
      """WITH t AS (
        |  SELECT DISTINCT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents WHERE doc_id < 20),
        |s AS (SELECT doc_id, count(*) AS n FROM t GROUP BY 1),
        |i AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        |  FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |       CAST(n_inter AS DOUBLE)
        |       / CAST(sa.n + sb.n - n_inter AS DOUBLE) AS jaccard
        |FROM i JOIN s sa ON i.doc_a = sa.doc_id
        |       JOIN s sb ON i.doc_b = sb.doc_id
        |ORDER BY doc_a, doc_b""".stripMargin)
  }

  /** Top-5 word bigrams per language bucket (n-gram frequency stats).
    * Rank window is totally ordered (count desc, bigram asc).
    */
  object BigramStats extends GraftQuery {
    val name = "q_bigram_stats"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val counts = Graft.table(spark, sfDir, "documents")
        .select(col("lang"),
          // native fused tokenize→bigram→distinct (same pipeline as the
          // composable Dedup.shingles, which stays as the spec reference)
          explode(graft.plans.ShingleExpression.shingle_strings(col("text"), 2)).as("bigram"))
        .groupBy("lang", "bigram").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("lang")
        .orderBy(col("n").desc, col("bigram").asc)
      counts.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .orderBy("lang", "rk")
    }
    val oracle = Some(
      """WITH toks AS (
        |  SELECT doc_id, lang, t.tok, t.i
        |  FROM (SELECT doc_id, lang,
        |               string_split_regex(trim(text), '\s+') AS l FROM documents) d,
        |       LATERAL (SELECT unnest(l) AS tok, generate_subscripts(l, 1) AS i) t),
        |grams AS (
        |  SELECT DISTINCT t1.doc_id, t1.lang, t1.tok || ' ' || t2.tok AS bigram
        |  FROM toks t1 JOIN toks t2 ON t1.doc_id = t2.doc_id AND t2.i = t1.i + 1),
        |counts AS (SELECT lang, bigram, count(*) AS n FROM grams GROUP BY 1, 2)
        |SELECT lang, bigram, n,
        |       CAST(row_number() OVER (PARTITION BY lang
        |                               ORDER BY n DESC, bigram ASC) AS INT) AS rk
        |FROM counts QUALIFY rk <= 5
        |ORDER BY lang, rk""".stripMargin)
  }

  /** BPE-style pre-tokenization: the regex split every byte-pair tokenizer
    * runs before merges (letter runs / digit runs / single punctuation —
    * the GPT-2 pattern family, restricted to constructs Java regex and RE2
    * interpret identically). Per-language totals + distinct-token counts —
    * the "how many tokens is this corpus" pipeline question, answered
    * without a vocabulary file.
    */
  object BpeTokens extends GraftQuery {
    val name = "q_bpe_tokens"
    // whitespace spelled as an explicit char class: Java regex \s includes
    // vertical tab, RE2's does not — the explicit list is dialect-proof
    private val pattern = "[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\f\\r]"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val toks = regexp_extract_all(lower(col("text")), lit(pattern), lit(0))
      Graft.table(spark, sfDir, "documents")
        .select(col("lang"), col("doc_id"), explode(toks).as("tok"))
        .groupBy("lang")
        .agg(count(lit(1)).as("total_tokens"),
          countDistinct(col("tok")).as("vocab_size"),
          countDistinct(col("doc_id")).as("n_docs"))
        .orderBy("lang")
    }
    val oracle = Some(
      s"""SELECT lang, count(*) AS total_tokens,
         |       count(DISTINCT tok) AS vocab_size,
         |       count(DISTINCT doc_id) AS n_docs
         |FROM (SELECT lang, doc_id,
         |             unnest(regexp_extract_all(lower(text), '$pattern')) AS tok
         |      FROM documents)
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Winnowing fingerprint (the MOSS scheme): hash every k-char gram of the
    * normalized text, slide a w-gram window, keep each window's minimum —
    * the classic rolling-hash document fingerprint. Guarantees any shared
    * substring of length ≥ k+w-1 contributes a shared fingerprint, at
    * ~1/w the k-gram count. (Rabin-Karp's O(1) rolling *update* is an
    * optimization of the same function; grams are hashed independently here
    * so the md5-prefix hash replays in ANSI SQL.) Output is one row per doc:
    * fingerprint-set size + an md5 digest of the sorted set, so the whole
    * set is hash-verified without array-typed result columns.
    */
  object WinnowFingerprint extends GraftQuery {
    val name = "q_winnow_fingerprint"
    val K = 8 // gram length (chars)
    val W = 4 // window length (grams)
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      // the gram-hash + window-min pass runs as ONE native expression over
      // the normalized bytes ([[graft.plans.WinnowExpression]]): the
      // composable transform/slice form put ~1.4M interpreted lambda evals
      // per 5k docs on the hot path. Normalization strips non-printable-
      // ASCII, so byte slices == char slices by construction and the
      // char-based oracle stays bit-identical on ANY input. One md5 per
      // k-gram is ~1000× compute-per-byte — fan the scan out first
      // ([[Graft.fanOutSmallScan]]).
      Graft.fanOutSmallScan(Graft.table(spark, sfDir, "documents"))
        .select(col("doc_id"),
          regexp_replace(lower(trim(col("text"))), "[^ -~]", "")
            .cast("binary").as("t"))
        .select(col("doc_id"),
          graft.plans.WinnowExpression.winnow_fps(col("t"), K, W).as("fps"))
        .filter(size(col("fps")) > 0)
        .select(col("doc_id"),
          size(col("fps")).as("n_fps"),
          md5(expr("cast(concat_ws(',', transform(fps, x -> cast(x as string))) as binary)")).as("digest"))
        .orderBy("doc_id")
    }
    val oracle = Some(
      s"""WITH ${winnowOracleCtes("documents", K, W)}
         |SELECT doc_id, count(*) AS n_fps,
         |       md5(string_agg(mh::VARCHAR, ',' ORDER BY mh)) AS digest
         |FROM fps GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin)
  }

  /** DuckDB CTE chain replaying the winnowing math over `src` (any
    * relation providing doc_id, text) — normalize → k-gram 28-bit hashes →
    * w-window minima → distinct fingerprints. The ONE source of truth for
    * the replay SQL; exposes CTE `fps` (doc_id, mh).
    */
  def winnowOracleCtes(src: String, k: Int, w: Int): String =
    s"""n AS (SELECT doc_id,
       |             regexp_replace(lower(trim(text)), '[^ -~]', '', 'g') AS t
       |      FROM $src),
       |g AS (
       |  SELECT doc_id, s.i,
       |         ('0x' || substr(md5(substr(t, s.i, $k)), 1, 7))::BIGINT AS h
       |  FROM n, LATERAL (SELECT unnest(generate_series(1, length(t) - ${k - 1})) AS i) s
       |  WHERE length(t) >= $k),
       |ng AS (SELECT doc_id, max(i) AS ng FROM g GROUP BY 1),
       |w AS (
       |  SELECT g.doc_id, j.j, min(g.h) AS mh
       |  FROM ng, LATERAL (SELECT unnest(generate_series(1, greatest(ng.ng - ${w - 1}, 1))) AS j) j,
       |       g
       |  WHERE g.doc_id = ng.doc_id AND g.i BETWEEN j.j AND j.j + ${w - 1}
       |  GROUP BY 1, 2),
       |fps AS (SELECT DISTINCT doc_id, mh FROM w)""".stripMargin

  /** Train/holdout contamination check — the decontamination pipeline op:
    * a val/test document is flagged when it shares ANY winnowing
    * fingerprint (selected substring minima, so a shared-substring proxy)
    * with any train document, under the engine's own deterministic
    * hash-split ([[SplitAssign]] thresholds). Per-split report: docs,
    * contaminated docs, rate. The fingerprint overlap join is an equi-join
    * on 28-bit ints — shuffle-on-small-keys at any corpus size.
    */
  object Contamination extends GraftQuery {
    val name = "q_contamination"
    /** Contamination gram length: LONGER than the plagiarism-grade 8-char
      * grams of [[WinnowFingerprint]] — an 8-char window collides on any
      * shared common word and saturates the metric at 1.0; 24 chars
      * (~4 words, the spirit of the standard 13-token overlap rule scaled
      * to char grams) flags genuinely shared passages only.
      */
    val K = 24
    val W = 4
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import graft.functions.PortableHash.pHash60
      val bucket = pmod(pHash60(col("doc_id").cast("string")), lit(100L))
      val split = when(bucket < 80, "train").when(bucket < 90, "val")
        .otherwise("test")
      val docs = Graft.fanOutSmallScan(Graft.table(spark, sfDir, "documents"))
        .select(col("doc_id"), split.as("split"),
          regexp_replace(lower(trim(col("text"))), "[^ -~]", "")
            .cast("binary").as("t"))
      // persisted: TWO consumers (the train fingerprint set and the
      // holdout probe) would each re-run the winnow kernel otherwise.
      // The cache barrier sits BEFORE the explode — one array row per doc
      // in the columnar cache instead of one row per fingerprint (the
      // explode is trivial to recompute from cached arrays; writing the
      // exploded rows through the cache serde was the slower variant).
      // The per-split totals below deliberately read `docs`, NOT fps —
      // documents too short to produce a fingerprint must still count
      // toward n_docs
      val fpArrays = docs.select(col("doc_id"), col("split"),
          graft.plans.WinnowExpression.winnow_fps(col("t"), K, W).as("fparr"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val fps = fpArrays.select(col("doc_id"), col("split"),
        explode(col("fparr")).as("fp"))
      val trainFp = fps.filter(col("split") === "train").select("fp").distinct()
      val contaminated = fps.filter(col("split") =!= "train")
        .join(trainFp, Seq("fp"), "left_semi")
        .select("doc_id").distinct()
      docs.filter(col("split") =!= "train")
        .join(contaminated.withColumn("c", lit(1)), Seq("doc_id"), "left")
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), count(col("c")).as("n_contaminated"))
        .select(col("split"), col("n_docs"), col("n_contaminated"),
          (col("n_contaminated").cast("double") / col("n_docs").cast("double"))
            .as("contamination_rate"))
        .orderBy("split")
    }
    val oracle = Some(
      s"""WITH ${winnowOracleCtes("documents", K, W)},
         |sp AS (
         |  SELECT doc_id, CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
         |                      ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |               ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 AS b
         |        FROM documents)),
         |f AS (SELECT fps.doc_id, sp.split, fps.mh
         |      FROM fps JOIN sp ON fps.doc_id = sp.doc_id),
         |tfp AS (SELECT DISTINCT mh FROM f WHERE split = 'train'),
         |cont AS (
         |  SELECT DISTINCT f.doc_id FROM f JOIN tfp ON f.mh = tfp.mh
         |  WHERE f.split <> 'train')
         |SELECT sp.split, count(*) AS n_docs,
         |       count(cont.doc_id) AS n_contaminated,
         |       CAST(count(cont.doc_id) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |         AS contamination_rate
         |FROM sp LEFT JOIN cont ON sp.doc_id = cont.doc_id
         |WHERE sp.split <> 'train'
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Blocked edit-distance near-dup: pairwise Levenshtein over distinct
    * part names, candidate pairs bounded by a BLOCKING equi-join on the
    * first character — the classic entity-resolution pattern that keeps
    * pairwise string comparison sub-quadratic at scale (pairs exist only
    * within a block, and blocks shuffle as small keys). Levenshtein is one
    * of the few string metrics both engines implement identically.
    */
  object EditDistance extends GraftQuery {
    val name = "q_edit_distance"
    val MaxDist = 3
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val names = Graft.table(spark, sfDir, "part")
        .select(col("p_name").as("name")).distinct()
        .withColumn("blk", substring(col("name"), 1, 1))
      names.as("a").join(names.as("b"),
          col("a.blk") === col("b.blk") && col("a.name") < col("b.name"))
        .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
          levenshtein(col("a.name"), col("b.name")).as("dist"))
        .filter(col("dist") <= MaxDist)
        .orderBy("name_a", "name_b")
    }
    val oracle = Some(
      s"""WITH n AS (SELECT DISTINCT p_name AS name, substr(p_name, 1, 1) AS blk
         |           FROM part)
         |SELECT a.name AS name_a, b.name AS name_b,
         |       levenshtein(a.name, b.name) AS dist
         |FROM n a JOIN n b ON a.blk = b.blk AND a.name < b.name
         |WHERE levenshtein(a.name, b.name) <= $MaxDist
         |ORDER BY name_a, name_b""".stripMargin)
  }

  /** Deterministic train/val/test split assignment: bucket = portable hash
    * of the doc id mod 100 → 80/10/10. Hash-based splits are how real
    * corpus pipelines make held-out sets reproducible across runs AND
    * across engines (a seeded `rand()` is neither) — and membership is
    * stable under corpus growth: adding documents never moves an existing
    * one between splits, unlike any fraction-based `sample()`.
    */
  object SplitAssign extends GraftQuery {
    val name = "q_split_assign"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import graft.functions.PortableHash.pHash60
      val bucket = pmod(pHash60(col("doc_id").cast("string")), lit(100L))
      val split = when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
      Graft.table(spark, sfDir, "documents")
        .select(split.as("split"), size(tokens(col("text"))).as("n_tok"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total_tokens"))
        .orderBy("split")
    }
    val oracle = Some(
      """SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
        |            ELSE 'test' END AS split,
        |       count(*) AS n_docs,
        |       CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS total_tokens
        |FROM (SELECT text,
        |             ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 AS b
        |      FROM documents)
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Within-document repetition: the fraction of word-3-gram OCCURRENCES
    * that are repeats of an earlier 3-gram in the same document —
    * 1 - distinct/total, the standard duplicate-n-gram-fraction rule of
    * repetition-based corpus filtering. Docs too short for a single 3-gram
    * score 0 (÷0→0, the engine-wide safe-divide semantics).
    */
  object RepetitionRatio extends GraftQuery {
    val name = "q_repetition_ratio"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val total = greatest(size(tokens(col("text"))) - lit(2), lit(0))
      // distinct 3-grams via the native fused shingle kernel (dedup is on
      // the shingle STRINGS, same as the oracle's DISTINCT)
      val distinctSh = size(graft.plans.ShingleExpression.shingle_hashes(col("text"), 3))
      Graft.table(spark, sfDir, "documents")
        .select(col("doc_id"), total.as("total"), distinctSh.as("distinct_sh"))
        .select(col("doc_id"),
          safeDiv((col("total") - col("distinct_sh")).cast("double"),
            col("total").cast("double")).as("rep_ratio"))
        .orderBy("doc_id")
    }
    val oracle = Some(
      """WITH toks AS (
        |  SELECT doc_id, t.tok, t.i
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS l
        |        FROM documents) tsrc,
        |       LATERAL (SELECT unnest(l) AS tok, generate_subscripts(l, 1) AS i) t),
        |sh AS (
        |  SELECT t1.doc_id, count(DISTINCT t1.tok || ' ' || t2.tok || ' ' || t3.tok) AS ns
        |  FROM toks t1
        |  JOIN toks t2 ON t1.doc_id = t2.doc_id AND t2.i = t1.i + 1
        |  JOIN toks t3 ON t1.doc_id = t3.doc_id AND t3.i = t1.i + 2
        |  GROUP BY 1),
        |tot AS (
        |  SELECT doc_id, greatest(len(string_split_regex(trim(text), '\s+')) - 2, 0) AS total
        |  FROM documents)
        |SELECT t.doc_id,
        |       CASE WHEN t.total = 0 THEN 0.0
        |            ELSE CAST(t.total - coalesce(s.ns, 0) AS DOUBLE)
        |                 / CAST(t.total AS DOUBLE) END AS rep_ratio
        |FROM tot t LEFT JOIN sh s ON t.doc_id = s.doc_id
        |ORDER BY t.doc_id""".stripMargin)
  }

  /** Composite rule-based corpus gate (the Gopher/MassiveText rule family):
    * token-count bounds, mean-word-length bounds, stopword presence, and
    * alphabetic-token ratio — each a pure column predicate; the query
    * reports per-language doc counts, pass counts, and the pass rate.
    * Every term is integer counts → one double division, so the rates are
    * bit-deterministic cross-engine.
    */
  object GopherGates extends GraftQuery {
    val name = "q_gopher_gates"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val toks = tokens(col("text"))
      val nTok = size(toks)
      val chars = aggregate(transform(toks, t => length(t).cast("long")),
        lit(0L), (a, x) => a + x)
      val meanLen = chars.cast("double") / nTok.cast("double")
      val alphaToks = size(filter(toks, t => t.rlike("[a-zA-Z]")))
      val pass =
        (nTok >= 5 && nTok <= 10000) &&
          (meanLen >= lit(3.0) && meanLen <= lit(10.0)) &&
          arrays_overlap(toks, array(stopwords.map(lit): _*)) &&
          (alphaToks.cast("double") / nTok.cast("double") >= lit(0.8))
      Graft.table(spark, sfDir, "documents")
        .select(col("lang"), pass.as("pass"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("pass"), 1)).as("n_pass"))
        .select(col("lang"), col("n_docs"), col("n_pass"),
          (col("n_pass").cast("double") / col("n_docs").cast("double")).as("pass_rate"))
        .orderBy("lang")
    }
    val oracle = Some(
      """WITH stats AS (
        |  SELECT d.lang,
        |         len(l) AS n_tok,
        |         (SELECT sum(len(x.tok)) FROM unnest(l) x(tok)) AS chars,
        |         (SELECT count(*) FROM unnest(l) x(tok)
        |          WHERE regexp_matches(x.tok, '[a-zA-Z]')) AS alpha_toks,
        |         list_has_any(l, ['the','a','of','and','to','in']) AS has_stop
        |  FROM (SELECT lang, string_split_regex(trim(text), '\s+') AS l
        |        FROM documents) d),
        |gated AS (
        |  SELECT lang,
        |         (n_tok BETWEEN 5 AND 10000
        |          AND CAST(chars AS DOUBLE) / CAST(n_tok AS DOUBLE) BETWEEN 3.0 AND 10.0
        |          AND has_stop
        |          AND CAST(alpha_toks AS DOUBLE) / CAST(n_tok AS DOUBLE) >= 0.8) AS pass
        |  FROM stats)
        |SELECT lang, count(*) AS n_docs,
        |       count(*) FILTER (WHERE pass) AS n_pass,
        |       CAST(count(*) FILTER (WHERE pass) AS DOUBLE)
        |       / CAST(count(*) AS DOUBLE) AS pass_rate
        |FROM gated GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Corpus-composition report per source: document and token volume plus
    * the exact-duplicate rate (1 - distinct fingerprints / docs) — the
    * health metrics a corpus-mixing run reads before weighting sources.
    * Distinct counting is two-phase (group to (source, fp) first) — no
    * mixed distinct aggregation, no Expand (ARCHITECTURE.md).
    */
  object SourceMix extends GraftQuery {
    val name = "q_source_mix"
    def run(spark: SparkSession, sfDir: String): DataFrame =
      Graft.table(spark, sfDir, "documents")
        .select(col("source"), md5(lower(trim(col("text")))).as("fp"),
          size(tokens(col("text"))).as("n_tok"))
        .groupBy("source", "fp")
        .agg(count(lit(1)).as("n"), sum(col("n_tok")).as("toks"))
        .groupBy("source")
        .agg(sum(col("n")).as("n_docs"),
          count(lit(1)).as("n_distinct"),
          sum(col("toks")).as("total_tokens"))
        .select(col("source"), col("n_docs"), col("n_distinct"),
          (lit(1.0) - col("n_distinct").cast("double") / col("n_docs").cast("double"))
            .as("dup_ratio"),
          col("total_tokens"))
        .orderBy("source")
    val oracle = Some(
      """WITH per_fp AS (
        |  SELECT source, md5(lower(trim(text))) AS fp, count(*) AS n,
        |         CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS toks
        |  FROM documents GROUP BY 1, 2)
        |SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
        |       count(*) AS n_distinct,
        |       1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS dup_ratio,
        |       CAST(sum(toks) AS BIGINT) AS total_tokens
        |FROM per_fp GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Sequence packing: assign documents to fixed token-budget packs — the
    * batching step between a cleaned corpus and a trainer. The
    * deterministic document-contiguous variant: docs ordered by (lang,
    * doc_id), each assigned to `floor(preceding-token-sum / budget)` — a
    * prefix-sum window, one shuffle, identical integer math in both
    * engines. (True first-fit bin packing is inherently sequential state;
    * the contiguous variant is the standard distributed approximation and
    * what `flatMapGroupsWithState` would stream.) Report: per (lang, pack)
    * doc count and token load.
    */
  object TokenPacking extends GraftQuery {
    val name = "q_token_packing"
    val Budget = 4096L
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Graft.table(spark, sfDir, "documents")
        .select(col("lang"), col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_tok"))
        .withColumn("cum", sum(col("n_tok")).over(w))
        // integer `div`, NOT `/`: Spark's `/` on longs is double division
        // and DuckDB CASTs doubles to BIGINT by ROUNDING while Spark
        // truncates — `div` / `//` keep both engines in exact integer math
        .withColumn("pack_id", expr(s"(cum - n_tok) div $Budget"))
        .groupBy("lang", "pack_id")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("pack_tokens"))
        .orderBy("lang", "pack_id")
    }
    val oracle = Some(
      s"""WITH t AS (
         |  SELECT lang, doc_id,
         |         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok
         |  FROM documents),
         |packed AS (
         |  SELECT lang, doc_id, n_tok,
         |         CAST((sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |          - n_tok) // $Budget AS BIGINT) AS pack_id
         |  FROM t)
         |SELECT lang, pack_id, count(*) AS n_docs,
         |       CAST(sum(n_tok) AS BIGINT) AS pack_tokens
         |FROM packed GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }

  /** Token-pair association (lift): for adjacent token pairs,
    * `lift = P(ab) / (P(a)·P(b)) = co_n · N / (a_n · b_n)` — the
    * collocation detector (PMI without the log, so the score is a single
    * IEEE division of two EXACT integer products and replays bit-for-bit
    * in the oracle; log-lift would rank identically since log is
    * monotone). Top pairs by lift under a minimum-support floor.
    *
    * Plan shape: raw bigrams come from the scan-side native
    * [[graft.plans.SkipGramExpression.adjacent_pairs]] kernel (no
    * positional self-join on the Spark side — the oracle uses one, proving
    * the adjacent-pair formulation equivalent); then two vocabulary-keyed
    * equi-joins attach unigram counts. All shuffles carry (token, count)
    * pairs, never text.
    *
    * Scale note: `co_n * N` sits in BIGINT; past ~2^63/N-count corpora
    * the product must widen to DECIMAL(38,0) — exactness, not range, is
    * the portable contract.
    */
  object TokenLift extends GraftQuery {
    val name = "q_token_lift"
    private val MinCo = 3
    private val TopK = 20
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val docs = Graft.table(spark, sfDir, "documents")
      val toks = tokens(col("text"))
      val uni = docs.select(explode(toks).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n"))
      val total = docs.select(size(toks).cast("long").as("nt"))
        .agg(sum(col("nt")).as("total"))
      val big = docs
        .filter(size(toks) >= 2)
        .select(explode(
          graft.plans.SkipGramExpression.adjacent_pairs(toks)).as("bg"))
        .select(col("bg.w1").as("token_a"), col("bg.w2").as("token_b"))
        .groupBy("token_a", "token_b").agg(count(lit(1)).as("co_n"))
        .filter(col("co_n") >= MinCo)
      big
        .join(uni.select(col("tok").as("token_a"), col("n").as("a_n")), Seq("token_a"))
        .join(uni.select(col("tok").as("token_b"), col("n").as("b_n")), Seq("token_b"))
        .crossJoin(broadcast(total))
        .select(col("token_a"), col("token_b"), col("co_n"), col("a_n"), col("b_n"),
          ((col("co_n") * col("total")).cast("double") /
            (col("a_n") * col("b_n")).cast("double")).as("lift"))
        .orderBy(col("lift").desc, col("token_a").asc, col("token_b").asc)
        .limit(TopK)
    }
    val oracle = Some(
      s"""WITH tl AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l
         |  FROM documents),
         |toks AS (
         |  SELECT doc_id, t.tok, t.i
         |  FROM tl, LATERAL (SELECT unnest(l) AS tok,
         |                           generate_subscripts(l, 1) AS i) t),
         |uni AS (SELECT tok, count(*) AS n FROM toks GROUP BY 1),
         |tot AS (SELECT count(*) AS total FROM toks),
         |big AS (
         |  SELECT t1.tok AS token_a, t2.tok AS token_b, count(*) AS co_n
         |  FROM toks t1 JOIN toks t2
         |    ON t1.doc_id = t2.doc_id AND t2.i = t1.i + 1
         |  GROUP BY 1, 2 HAVING count(*) >= $MinCo)
         |SELECT token_a, token_b, co_n, ua.n AS a_n, ub.n AS b_n,
         |       CAST(co_n * total AS DOUBLE) / CAST(ua.n * ub.n AS DOUBLE) AS lift
         |FROM big
         |JOIN uni ua ON token_a = ua.tok
         |JOIN uni ub ON token_b = ub.tok
         |CROSS JOIN tot
         |ORDER BY lift DESC, token_a, token_b LIMIT $TopK""".stripMargin)
  }

  /** Cross-source passage-overlap matrix — [[Contamination]] generalized
    * from one train/holdout boundary to EVERY source pair: how many
    * contamination-grade winnow fingerprints (24-char grams, same contract
    * as q_contamination) each pair of sources shares. The scale shape is
    * the set-intersection-without-pairs trick: group fingerprints once
    * (`collect_set(source)` — state bounded by the SOURCE COUNT, not the
    * corpus), keep only fingerprints seen in ≥2 sources, and expand the
    * per-fingerprint source set into pairs — the pair generator runs over
    * the tiny multi-source remainder, never a corpus self-join.
    */
  object SourceOverlap extends GraftQuery {
    val name = "q_source_overlap"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val K = Contamination.K
      val W = Contamination.W
      val docs = Graft.fanOutSmallScan(Graft.table(spark, sfDir, "documents"))
        .select(col("source"),
          regexp_replace(lower(trim(col("text"))), "[^ -~]", "")
            .cast("binary").as("t"))
      val fps = docs
        .select(col("source"),
          explode(graft.plans.WinnowExpression.winnow_fps(col("t"), K, W)).as("fp"))
        .distinct()
      fps.groupBy("fp").agg(collect_set(col("source")).as("srcs"))
        .filter(size(col("srcs")) >= 2)
        .select(col("fp"), explode(col("srcs")).as("src_a"), col("srcs"))
        .select(col("fp"), col("src_a"), explode(col("srcs")).as("src_b"))
        .filter(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(count(lit(1)).as("n_shared_fps"))
        .orderBy("src_a", "src_b")
    }
    val oracle = Some(
      s"""WITH ${winnowOracleCtes("documents", Contamination.K, Contamination.W)},
         |sfp AS (
         |  SELECT DISTINCT d.source, fps.mh
         |  FROM fps JOIN documents d ON fps.doc_id = d.doc_id)
         |SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared_fps
         |FROM sfp a JOIN sfp b ON a.mh = b.mh AND a.source < b.source
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }

  val all: Seq[GraftQuery] =
    Seq(TokenCount, QualityScore, LangId, LangConfusion, Fingerprint,
      TokenJaccard, BigramStats, TokenLift, BpeTokens, WinnowFingerprint,
      EditDistance, SplitAssign, RepetitionRatio, GopherGates, SourceMix,
      Contamination, SourceOverlap, TokenPacking, BpeTrain.BpeMerges,
      BpeTrain.BpeApply)
}
