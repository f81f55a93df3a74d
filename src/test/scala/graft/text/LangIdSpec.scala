package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LangIdSpec extends SparkSpec {
  import spark.implicits._

  // two clearly separable synthetic "languages": vowel-heavy latin-ish
  // vs consonant-cluster strings — char 2/3-grams separate them easily
  private def corpus(n: Int) = (0 until n).map { i =>
    if (i % 2 == 0) (i.toLong, "aa ee ii oo uu la le li lo lu " * 3, "aa")
    else (i.toLong, "tz kr pf st sch tzk rpf zkr fts chk " * 3, "zz")
  }.toDF("doc_id", "text", "lang")

  test("trained NB over hashed char-ngrams recovers a separable " +
       "labeling exactly") {
    val out = LangId.trained(corpus(40), "doc_id", "text", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (0 until 40).foreach { i =>
      val want = if (i % 2 == 0) "aa" else "zz"
      assert(out(i.toLong) == want, s"doc $i predicted ${out(i.toLong)}")
    }
  }

  test("hashedCharNgrams: token count is sum over orders of " +
       "(len - n + 1)+, short/empty/null text yields no tokens, " +
       "and the featurization is case-insensitive") {
    val df = Seq((1L, "abcd"), (2L, "ab"), (3L, "a"), (4L, ""),
      (5L, null.asInstanceOf[String]), (6L, "AbCd"))
      .toDF("id", "t")
    val counts = df.select(col("id"),
        size(LangId.hashedCharNgrams(col("t"), Seq(2, 3), 64, "5"))
          .as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(counts(1L) == 3 + 2) // "abcd": three 2-grams + two 3-grams
    assert(counts(2L) == 1 + 0)
    assert(counts(3L) == 0)
    assert(counts(4L) == 0)
    assert(counts(5L) == 0)
    val g = df.filter(col("id").isin(1L, 6L))
      .select(col("id"),
        LangId.hashedCharNgrams(col("t"), Seq(2, 3), 64, "5").as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(g(1L) == g(6L), "lowercasing must make AbCd == abcd")
  }

  test("the kernel is bit-identical to the portable md5 column form " +
       "(pmod(conv(substring(md5(concat_ws(sep, gram, seed)),1,15),16," +
       "10), buckets)) — including multi-byte code points") {
    val texts = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "wörld ✓ ünïcode мир 中文 text"), (3L, "ab"))
      .toDF("id", "t")
    for (n <- Seq(2, 3)) {
      // reference: the engine-replayable column definition over
      // code-point windows of lower(t)
      val tl = lower(col("t"))
      val cnt = greatest(length(tl) - (n - 1), lit(0))
      val idx = when(cnt >= 1, sequence(lit(1), cnt))
        .otherwise(array().cast("array<int>"))
      val ref = texts.select(col("id"), transform(idx, i =>
        pmod(conv(substring(md5(concat_ws("",
          tl.substr(i, lit(n)), lit("5"))), 1, 15), 16, 10)
          .cast("long"), lit(97L))).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val viaKernel = texts.select(col("id"),
          LangId.hashedCharNgrams(col("t"), Seq(n), 97, "5").as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(viaKernel == ref, s"order $n kernel vs column form")
    }
    val ids = texts.select(explode(
        LangId.hashedCharNgrams(col("t"), Seq(3), 97, "5")).as("b"))
      .collect().map(_.getLong(0))
    assert(ids.nonEmpty && ids.forall(b => b >= 0 && b < 97))
  }

  test("prediction is deterministic under repartitioning") {
    val c = corpus(30)
    val a = LangId.trained(c, "doc_id", "text", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    val b = LangId.trained(c.repartition(7), "doc_id", "text", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    assert(a == b)
  }
}
