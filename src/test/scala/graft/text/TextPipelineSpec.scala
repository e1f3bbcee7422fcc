package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextPipelineSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    val good = "the quick brown fox jumps over the lazy dog and runs far away " * 4
    Seq(
      (0L, good),                              // keeper
      (1L, good),                              // exact dup → dropped
      (2L, good.replace("lazy", "sleepy")),    // near dup → dropped
      (3L, "short text"),                      // quality-gated (2 tokens < 5)
      (4L, "a completely different document about the spark catalyst optimizer and its rules " * 3)
    ).toDF("doc_id", "text")
  }

  test("cleanCorpus: quality gate + exact dedup + near-dup removal compose") {
    val kept = TextPipeline.cleanCorpus(corpus, minTokens = 5, minEstJaccard = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(0L, 4L))
  }

  test("stages are individually observable") {
    assert(TextPipeline.qualityFilter(corpus, 5).count() == 4) // drops doc 3
    assert(TextPipeline.exactDedup(corpus).count() == 4)       // drops doc 1
    val near = TextPipeline.nearDedup(corpus, 0.5)
    assert(!near.select("doc_id").collect().map(_.getLong(0)).contains(2L) ||
      near.count() < corpus.count())
  }
}
