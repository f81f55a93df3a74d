package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private val footer = "all rights reserved"
  private val cookie = "we use cookies"

  test("segments repeated across minDocs documents are struck, order kept") {
    val docs = Seq(
      (1L, s"alpha body one\n$footer\n$cookie"),
      (2L, s"$cookie\nbeta body two\n$footer"),
      (3L, s"gamma body three\n$footer"),
      (4L, "delta body four")
    ).toDF("doc_id", "text")
    val out = Boilerplate.removeRepeated(docs, "doc_id", "text",
        Boilerplate.segmentsByDelimiter(col("text")), minDocs = 2,
        joinSep = "\n")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // footer appears in 3 docs, cookie in 2 — both boilerplate
    assert(out(1L) == (("alpha body one", 3L, 2L)))
    assert(out(2L) == (("beta body two", 3L, 2L)))
    assert(out(3L) == (("gamma body three", 2L, 1L)))
    assert(out(4L) == (("delta body four", 1L, 0L)))
  }

  test("a fully-boilerplate document survives as an empty row") {
    val docs = Seq(
      (1L, s"$footer\n$cookie"),
      (2L, s"$footer\nreal content"),
      (3L, s"$cookie\nmore content")
    ).toDF("doc_id", "text")
    val out = Boilerplate.removeRepeated(docs, "doc_id", "text",
        Boilerplate.segmentsByDelimiter(col("text")), minDocs = 2,
        joinSep = "\n")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    assert(out(1L) == (("", 2L)))
    assert(out(2L) == (("real content", 1L)))
    assert(out.size == 3)
  }

  test("word-window mode: repeats strike mid-stream, extra columns ride") {
    val shared = "one two three four"
    val docs = Seq(
      (1L, s"$shared unique tail here", "web"),
      (2L, s"prefix bit here $shared", "book"), // repeat NOT window-aligned
      (3L, s"$shared and a coda", "web")
    ).toDF("doc_id", "text", "source")
    val out = Boilerplate.removeRepeated(docs, "doc_id", "text",
        Boilerplate.segmentsByWords(col("text"), 4), minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    // docs 1 and 3 share the aligned window "one two three four"; doc 2's
    // copy starts at word 4 so its windows differ — window alignment is
    // part of the (documented) word-mode contract
    assert(out == Set(
      (1L, "unique tail here", "web"),
      (2L, "prefix bit here one two three four", "book"),
      (3L, "and a coda", "web")))
  }

  test("a NULL text counts as an empty document, not NULL-count rows") {
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, null),
        org.apache.spark.sql.Row(2L, "real text here"))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    val out = Boilerplate.removeRepeated(docs, "doc_id", "text",
        Boilerplate.segmentsByWords(col("text"), 2), minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (("", 0L, 0L)), "NULL text -> empty doc, 0/0 counts")
    assert(out(2L) == (("real text here", 2L, 0L)))
  }

  test("empty and token-less documents produce zero segments, not a crash") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "real words live here"))
      .toDF("doc_id", "text")
    val out = Boilerplate.removeRepeated(docs, "doc_id", "text",
        Boilerplate.segmentsByWords(col("text"), 2), minDocs = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == (("", 0L)))
    assert(out(2L) == (("", 0L)))
    assert(out(3L) == (("real words live here", 2L)))
  }

  test("keep-first: the minimum (doc, pos) occurrence survives, all " +
      "later ones strike — unlike removeRepeated, which strikes every copy") {
    val docs = Seq(
      (2L, s"$footer\nbeta body"),       // footer's min doc is 1, strikes
      (1L, s"alpha body\n$footer"),      // FIRST footer corpus-wide: kept
      (3L, s"gamma body\n$footer"),
      (4L, "delta body")
    ).toDF("doc_id", "text")
    val out = Boilerplate.dedupKeepFirst(docs, "doc_id", "text",
        Boilerplate.segmentsByDelimiter(col("text")), joinSep = "\n")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((s"alpha body\n$footer", 2L, 0L)))
    assert(out(2L) == (("beta body", 2L, 1L)))
    assert(out(3L) == (("gamma body", 2L, 1L)))
    assert(out(4L) == (("delta body", 1L, 0L)))
  }

  test("keep-first: a repeat WITHIN one document keeps only its first " +
      "position; unique segments are untouched") {
    val docs = Seq(
      (1L, "same line\nunique one\nsame line"),
      (2L, "unique two")
    ).toDF("doc_id", "text")
    val out = Boilerplate.dedupKeepFirst(docs, "doc_id", "text",
        Boilerplate.segmentsByDelimiter(col("text")), joinSep = "\n")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (("same line\nunique one", 3L, 1L)))
    assert(out(2L) == (("unique two", 1L, 0L)))
  }

  test("keep-first: extra columns ride through and NULL text is an " +
      "empty document") {
    val docs = Seq(
      (1L, "dup seg", "web"),
      (2L, "dup seg", "books"),
      (3L, null.asInstanceOf[String], "web")
    ).toDF("doc_id", "text", "source")
    val out = Boilerplate.dedupKeepFirst(docs, "doc_id", "text",
        Boilerplate.segmentsByDelimiter(col("text")))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == (("dup seg", "web", 1L, 0L)))
    assert(out(2L) == (("", "books", 1L, 1L)))
    assert(out(3L) == (("", "web", 0L, 0L)))
  }
}
