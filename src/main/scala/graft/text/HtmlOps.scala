package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction for the crawl-ingest path (the step every
  * web-corpus pipeline runs between the WARC reader and the curation
  * stack — CCNet/RefinedWeb strip markup before any quality gate).
  * Implemented as a codegen-friendly column-expression chain (regexp
  * passes, no UDF) restricted to the regex subset Java and RE2 share,
  * so the semantics are replayable in the DuckDB oracle dialect:
  *
  *  1. drop `<script>…</script>` and `<style>…</style>` blocks whole
  *     (their CONTENT is code, not text — a tag-only pass would leak
  *     it, the classic naive-stripper bug);
  *  2. drop `<!-- … -->` comments;
  *  3. drop every remaining tag `<[^>]*>`;
  *  4. decode the five predefined character entities (`&lt; &gt;
  *     &quot; &#39; &amp;` — ampersand LAST, so `&amp;lt;` decodes to
  *     the literal text `&lt;` exactly like a real entity decoder);
  *  5. collapse whitespace runs and trim.
  *
  * Scope: extraction, not sanitization — strict HTML correctness is not
  * assumed (crawl HTML never parses cleanly); the scanner semantics are
  * differential-tested against an independent character-walker in
  * HtmlOpsSpec.
  */
object HtmlOps {

  def stripHtml(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val e1 = regexp_replace(noTags, "&lt;", "<")
    val e2 = regexp_replace(e1, "&gt;", ">")
    val e3 = regexp_replace(e2, "&quot;", "\"")
    val e4 = regexp_replace(e3, "&#39;", "'")
    val e5 = regexp_replace(e4, "&amp;", "&")
    trim(regexp_replace(e5, "\\s+", " "))
  }
}
