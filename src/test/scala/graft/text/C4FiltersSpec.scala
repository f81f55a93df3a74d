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

  test("blocklist: words match whole tokens, phrases match with boundaries") {
    val bl = Seq("slow", "merge batch")
    val docs = Seq(
      (1L, "the SLOW query"),          // case-insensitive token hit
      (2L, "slowly winding road"),     // substring of a longer token: no
      (3L, "a slow-ish slow_ish run"), // '-' splits tokens ('slow' hits),
                                       // '_' is a word char (no hit)
      (4L, "please merge batch jobs"), // phrase hit
      (5L, "please merge  batch jobs"),// double space: literal phrase, no
      (6L, "mergebatch or merge batching"), // no boundary on either side
      (7L, "slow slow merge batch")    // 2 word hits + 1 phrase hit
    ).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        C4Filters.blocklistHits(col("text"), bl).as("h"),
        C4Filters.keepPageBlocklist(col("text"), bl).as("k"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(out(1L) == ((1L, false)))
    assert(out(2L) == ((0L, true)))
    assert(out(3L) == ((1L, false)))
    assert(out(4L) == ((1L, false)))
    assert(out(5L) == ((0L, true)))
    assert(out(6L) == ((0L, true)))
    assert(out(7L) == ((3L, false)))
  }

  test("blocklist hit count is exposed as SQL graft_blocklist_hits") {
    Seq((1L, "a SLOW merge batch here")).toDF("id", "text")
      .createOrReplaceTempView("bl_docs")
    val n = spark.sql(
      "SELECT graft_blocklist_hits(text, 'slow', 'merge batch') FROM bl_docs")
      .head().getLong(0)
    assert(n == 2L)
  }

  test("sentences: terminator runs, terminator-less tail, edge trim") {
    val out = Seq((1L, "ab.cd"), (2L, "Hi!! Yes"), (3L, " A b. \n C d? "),
        (4L, ""), (5L, "..."))
      .toDF("id", "t")
      .select(col("id"), C4Filters.sentences(col("t")).as("ss"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(out(1L) == List("ab.", "cd"))
    assert(out(2L) == List("Hi!!", "Yes"))
    assert(out(3L) == List("A b.", "C d?"))
    assert(out(4L) == Nil)
    assert(out(5L) == List("..."))
  }

  test("span dedup: the globally first occurrence survives, later " +
      "occurrences lose exactly their span's sentences") {
    val shared = "One two three. Four five! Six seven?"
    val docs = Seq(
      (1L, s"$shared Unique tail."),
      (2L, s"Prefix here. $shared Another end.")
    ).toDF("doc_id", "text")
    val out = C4Filters.dropRepeatedSpans(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1 holds the first occurrence — untouched (re-joined with " ")
    assert(out(1L) ==
      (("One two three. Four five! Six seven? Unique tail.", 4L, 0L)))
    // doc 2's copy at position 1 is struck; its unique sentences stay
    assert(out(2L) == (("Prefix here. Another end.", 5L, 3L)))
  }

  test("span dedup: identical documents keep one full copy; overlapping " +
      "struck spans union their sentences") {
    val text = "A a. B b. C c. D d. E e."
    val docs = Seq((1L, text), (2L, text), (3L, text)).toDF("doc_id", "text")
    val out = C4Filters.dropRepeatedSpans(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(3))).toMap
    assert(out(1L) == ((text, 0L)))
    assert(out(2L) == (("", 5L)))
    assert(out(3L) == (("", 5L)))
  }

  test("span dedup: a WITHIN-document self-repeat is struck too") {
    val docs = Seq((1L, "X x. X x. X x. X x.")).toDF("doc_id", "text")
    val out = C4Filters.dropRepeatedSpans(docs, "doc_id", "text").head()
    // spans at 0 and 1 hash equal; (1,0) survives, (1,1) strikes 1..3
    assert(out.getString(1) == "X x." && out.getLong(3) == 3L)
  }

  test("span dedup: short and empty documents pass through; other " +
      "columns survive") {
    val docs = Seq((1L, "Only. Two here.", "en"), (2L, "", "fr"))
      .toDF("doc_id", "text", "lang")
    val out = C4Filters.dropRepeatedSpans(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == (("Only. Two here.", "en", 2L, 0L)))
    assert(out(2L) == (("", "fr", 0L, 0L)))
  }

  test("cleaning is a map-only plan (no exchange)") {
    val df = C4Filters.clean(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      "doc_id", "text")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"no shuffle in a per-row cleanup:\n$plan")
  }
}
