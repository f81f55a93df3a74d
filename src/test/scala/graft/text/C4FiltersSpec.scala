package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the C4 cleaning rules (Raffel 2020 §2.2) line by line. */
class C4FiltersSpec extends SparkSpec {
  import spark.implicits._

  private def cleanOne(text: String) =
    C4Filters.clean(Seq((1L, text)).toDF("id", "text"), "id", "text")
      .collect().head

  test("line rules: terminal punctuation, >= 5 words, no javascript") {
    val text = Seq(
      "this line has enough words and ends well.", // kept
      "too short a line.",                          // < 5 words
      "this line has plenty of words but no terminal punct", // no punct
      "this line mentions JavaScript so it is gone.",        // javascript
      "ending with a bang works just fine!",        // kept
      "a quoted ending counts as terminal too.\"",  // kept
      "and question marks also qualify, right?"     // kept
    ).mkString("\n")
    val r = cleanOne(text)
    assert(r.getLong(2) == 7 && r.getLong(3) == 4,
      s"4 of 7 lines survive: ${r.toSeq}")
    assert(r.getBoolean(1), "4 kept lines >= 3: page survives")
    val clean = r.getString(4)
    assert(clean.split("\n").length == 4)
    assert(!clean.toLowerCase.contains("javascript"))
  }

  test("page rules: < 3 kept lines, curly brace, lorem ipsum") {
    val good = "one perfectly fine line with enough words."
    val fewLines = cleanOne(Seq(good, good).mkString("\n"))
    assert(!fewLines.getBoolean(1) && fewLines.getString(4) == "",
      "2 kept lines < 3: page dropped, clean empty")
    val curly = cleanOne(Seq(good, good, good, "code { here }").mkString("\n"))
    assert(!curly.getBoolean(1), "a curly brace drops the page")
    val lorem = cleanOne(
      Seq(good, good, good, "Lorem Ipsum dolor sit amet.").mkString("\n"))
    assert(!lorem.getBoolean(1), "lorem ipsum drops the page (case-folded)")
    val ok = cleanOne(Seq(good, good, good).mkString("\n"))
    assert(ok.getBoolean(1) && ok.getString(4).split("\n").length == 3)
  }

  test("cleaning is a map-only plan (no exchange)") {
    val df = C4Filters.clean(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      "doc_id", "text")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"no shuffle in a per-row cleanup:\n$plan")
  }
}
