package graft.text

import org.apache.spark.sql.Column

/** HTML → main text, the first transform after a web-corpus container
  * read ([[graft.sources.Warc]] hands back raw HTTP payloads; nothing
  * downstream — quality, dedup, tokenization — wants markup). This is
  * the simplified-readability slot of trafilatura/jusText: drop
  * head/script/style/comments, strip the remaining tags to single-space
  * separators, decode core + numeric character entities, collapse
  * whitespace. BOILERPLATE (nav bars, footers, repeated chrome) is a
  * corpus-level, not document-level, signal — remove it downstream with
  * [[Boilerplate]] over the extracted text, which is exactly how the
  * public pipelines sequence it (extraction → line/segment dedup).
  *
  * One codegen'd pass per row ([[graft.plans.HtmlExtract]]), no
  * shuffle: a 100 TB extraction is a map-only scan. Also registered as
  * SQL `graft_html_extract`.
  */
object HtmlText {

  /** Main text of an HTML column (NULL in, NULL out). */
  def extract(html: Column): Column =
    graft.plans.expressions.html_extract(html)
}
