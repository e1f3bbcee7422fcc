package graft.sources

import graft.{Graft, GraftQuery}
import graft.images.ImageOps
import graft.multimodal.TiffCodec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import SourceQueries.{workDir, mediaScale, scaledTag}

/** Tabular source/sink round-trips (CSV `;` dialect, JSONL, ORC, Hive
  * partitioning, schema evolution, compression codecs).
  * Split from SourceQueries.scala (round 10) - mechanical move, no
  * behavior change; fixture dirs and oracle SQL are byte-identical.
  */
object TabularQueries {

  /** S2+S3 — round-trip the part table through the reference's `;`-CSV
    * dialect, then aggregate the re-read copy. The oracle runs on the
    * original parquet — matching hashes prove the CSV boundary is lossless
    * for this schema (header, separator, numeric formatting).
    */
  object CsvRoundtrip extends GraftQuery {
    val name = "q_csv_roundtrip"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val dir = workDir("csv", sfDir) + "/part"
      Sources.writeSemicolonCsv(
        Graft.table(spark, sfDir, "part").select("p_partkey", "p_brand", "p_size"), dir)
      val back = Sources.readSemicolonCsv(spark, dir)
      back.groupBy("p_brand")
        .agg(count(lit(1)).as("n"),
          sum(col("p_size").cast("long")).as("total_size"))
        .orderBy("p_brand")
    }
    val oracle = Some(
      """SELECT p_brand, count(*) AS n,
        |       CAST(sum(p_size) AS BIGINT) AS total_size
        |FROM part GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** JSON-lines round-trip — the de-facto interchange format for LLM
    * training corpora. Documents are written as JSONL, re-read with an
    * explicit schema (no sampling/inference pass — at 100 TB schema
    * inference is a full extra scan), and aggregated; the oracle runs on
    * the original parquet, so matching hashes prove the JSONL boundary is
    * lossless for this schema (string escaping, unicode, nulls).
    */
  object JsonlRoundtrip extends GraftQuery {
    val name = "q_jsonl_roundtrip"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val dir = workDir("jsonl", sfDir) + "/documents"
      val docs = Graft.table(spark, sfDir, "documents")
        .select("doc_id", "text", "lang")
      docs.write.mode("overwrite").json(dir)
      val back = spark.read.schema(docs.schema).json(dir)
      back.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).as("total_chars"),
          min(col("doc_id")).as("min_doc"))
        .orderBy("lang")
    }
    val oracle = Some(
      """SELECT lang, count(*) AS n_docs,
        |       CAST(sum(length(text)) AS BIGINT) AS total_chars,
        |       min(doc_id) AS min_doc
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** ORC round-trip — the second columnar format Spark ships a native
    * vectorized reader for (a reference user migrating a lake hits ORC
    * next after parquet). Orders are written as ORC with zlib, re-read,
    * and aggregated; the oracle runs on the original parquet, so matching
    * hashes prove the ORC boundary preserves longs, doubles (exact bits —
    * both formats store IEEE754 doubles losslessly) and strings for this
    * schema. Timestamps are round-tripped as epoch integers: ORC timestamp
    * semantics (local-time vs instant) differ per writer config, and an
    * integer column is the portable representation at any scale.
    */
  object OrcRoundtrip extends GraftQuery {
    val name = "q_orc_roundtrip"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val dir = workDir("orc", sfDir) + "/orders"
      val orders = Graft.table(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          unix_date(to_date(col("o_orderdate"))).cast("long").as("o_epoch_day"))
      orders.write.mode("overwrite").option("compression", "zlib").orc(dir)
      val back = spark.read.schema(orders.schema).orc(dir)
      back.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          graft.functions.SafeMath.exactSum(col("o_totalprice")).as("revenue"),
          min(col("o_epoch_day")).as("first_day"),
          max(col("o_epoch_day")).as("last_day"))
        .orderBy("o_orderstatus")
    }
    val oracle = Some(
      """SELECT o_orderstatus, count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS revenue,
        |       min(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS first_day,
        |       max(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS last_day
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Hive-style partitioned layout — THE 100 TB table primitive: write
    * documents partitioned by source (`.../source=<v>/part-*.parquet`),
    * read back with a partition filter, and aggregate only the surviving
    * partitions. The oracle replays the filter on the original table —
    * the hash match proves the partition column round-trips losslessly
    * through the directory encoding (it leaves the data files entirely)
    * and the pruned read returns exactly the filtered set. The spec
    * asserts the plan-level guarantee (PartitionFilters pruning, nothing
    * read from excluded directories); scan-side the filter never touches
    * row data at all.
    */
  object PartitionedRoundtrip extends GraftQuery {
    val name = "q_partitioned_roundtrip"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val dir = workDir("hivepart", sfDir) + "/documents"
      val docs = Graft.table(spark, sfDir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"), col("source"))
      docs.write.mode("overwrite").partitionBy("source").parquet(dir)
      val back = spark.read.parquet(dir)
        .filter(col("source").isin("src1", "src2"))
      back.groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .orderBy("source", "lang")
    }
    val oracle = Some(
      """SELECT source, lang, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents WHERE source IN ('src1', 'src2')
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }

  /** Parquet schema evolution — the append-only reality of a long-lived
    * dataset: an old writer produced (doc_id, text), a newer one added
    * `lang`, and readers must see the union schema with nulls where the
    * old files are silent. The corpus splits deterministically by the
    * portable md5 of doc_id (old/new writer cohorts), lands as two
    * parquet generations, and is read back with `mergeSchema` — the
    * aggregate proves total row retention and exactly the old cohort
    * null. At scale this is why schema-on-read beats rewrite-on-evolve:
    * the query plans against the merged schema without touching old
    * files' data pages beyond the projected columns.
    */
  object SchemaEvolution extends GraftQuery {
    val name = "q_schema_evolution"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import graft.functions.PortableHash.pHash60
      val dir = workDir("schemaevo", sfDir) + "/documents"
      val docs = Graft.table(spark, sfDir, "documents")
        .withColumn("cohort", pmod(pHash60(col("doc_id").cast("string")), lit(2L)))
      docs.filter(col("cohort") === 0L)
        .select(col("doc_id"), col("text"))
        .write.mode("overwrite").parquet(s"$dir/gen=v1")
      docs.filter(col("cohort") === 1L)
        .select(col("doc_id"), col("text"), col("lang"))
        .write.mode("overwrite").parquet(s"$dir/gen=v2")
      val merged = spark.read.option("mergeSchema", "true").parquet(dir)
      merged.agg(
        count(lit(1)).as("n_total"),
        sum(when(col("lang").isNull, 1L).otherwise(0L)).as("n_old_cohort"),
        sum(when(col("lang").isNotNull, 1L).otherwise(0L)).as("n_new_cohort"),
        countDistinct(col("lang")).as("n_langs"))
    }
    val oracle = Some(
      """WITH cohorts AS (
        |  SELECT doc_id, lang,
        |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 2
        |           AS cohort
        |  FROM documents)
        |SELECT count(*) AS n_total,
        |       CAST(sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_old_cohort,
        |       CAST(sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_new_cohort,
        |       count(DISTINCT CASE WHEN cohort = 1 THEN lang END) AS n_langs
        |FROM cohorts""".stripMargin)
  }

  /** Compression-codec roundtrip — the storage-tuning primitive: the same
    * corpus written under snappy (decode-speed default) and zstd (ratio
    * default), both read back and reduced to the order-independent
    * portable checksum of `q_table_checksum`. Two identical checksum rows
    * = both codecs are lossless under the same reader — the invariant a
    * codec migration at 100 TB is gated on (sizes are version-dependent
    * and deliberately NOT part of the contract).
    */
  object CodecRoundtrip extends GraftQuery {
    val name = "q_codec_roundtrip"
    private val Codecs = Seq("snappy", "zstd")
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import graft.functions.PortableHash.pHash60
      val base = workDir("codec", sfDir)
      val docs = Graft.table(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))
      val frames = Codecs.map { c =>
        val dir = s"$base/docs_$c"
        docs.write.mode("overwrite").option("compression", c).parquet(dir)
        spark.read.parquet(dir)
          .select(pHash60(concat_ws("|", col("doc_id"), md5(col("text"))))
            .as("h"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("h").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
              .cast("string").as("checksum"))
          .select(lit(c).as("codec"), col("n_rows"), col("checksum"))
      }
      frames.reduce(_.unionAll(_)).orderBy("codec")
    }
    val oracle = Some {
      val codecVals = Codecs.map(c => s"('$c')").mkString(", ")
      s"""WITH cksum AS (
         |  SELECT count(*) AS n_rows,
         |         CAST(sum(('0x' || substr(md5(
         |           doc_id || '|' || md5(text)), 1, 15))::BIGINT) AS VARCHAR)
         |           AS checksum
         |  FROM documents)
         |SELECT codec, n_rows, checksum
         |FROM (VALUES $codecVals) v(codec) CROSS JOIN cksum
         |ORDER BY codec""".stripMargin
    }
  }
}
