package graft.text

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.plans.ExprKernels
import graft.plans.expressions.kgram_hashes
import org.apache.spark.unsafe.types.UTF8String

class SubstrDedupSpec extends SparkSpec {
  import spark.implicits._

  // naive per-window recompute of the kernel's polynomial hash — the
  // rolling update must be bit-for-bit equal to direct evaluation
  private def directHashes(s: String, k: Int): Seq[Long] =
    (0 to s.length - k).map { i =>
      var h = 0L
      var j = i
      while (j < i + k) { h = h * 0x100000001B3L + s.charAt(j); j += 1 }
      ExprKernels.mix64(h)
    }

  test("kernel: rolling hashes equal direct recompute, length n-k+1") {
    val texts = Seq("abcdefghij", "aaaaaaaaaa", "xy zw xy zw xy", "ab")
    for (t <- texts; k <- Seq(2, 3, 5)) {
      val got = ExprKernels.kgramHashes(UTF8String.fromString(t), k).toLongArray()
      val want = directHashes(t, k)
      assert(got.toSeq == want, s"text='$t' k=$k")
      assert(got.length == math.max(t.length - k + 1, 0))
    }
    // shorter than k → empty, not a whole-text fallback (offsets matter)
    assert(ExprKernels.kgramHashes(UTF8String.fromString("abc"), 5)
      .numElements() == 0)
  }

  test("kernel: equal substrings collide, offsets line up") {
    val t = "the quick brown fox ... the quick brown dog"
    val hs = ExprKernels.kgramHashes(UTF8String.fromString(t), 15).toLongArray()
    // "the quick brown" at offsets 0 and 24
    assert(hs(0) == hs(24))
    assert(hs.count(_ == hs(0)) == 2)
  }

  // 40 DISTINCT chars — no periodicity, so the only colliding windows
  // are the ones the test plants (separators around it differ per doc,
  // keeping boundary-straddling windows unique)
  private val shared = "abcdefghijklmnopqrstuvwxyz0123456789!@#$"

  test("non-BMP text: offsets count code points (Spark substr units), " +
      "strip conserves n_clean + dup_chars") {
    // two emoji = 4 UTF-16 code units but 2 code points: a code-unit
    // indexer would mark (4, 44) and strip() (which counts code points)
    // would cut the wrong range — silent corruption ADVICE r14 flagged
    val docs = Seq(
      (1L, "\ud83d\ude00\ud83d\ude00" + shared + "_tail"),
      (2L, s"prefix-$shared")
    ).toDF("doc_id", "text")
    val marked = SubstrDedup.markSpans(docs, "doc_id", "text", k = 40)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Row](1).map(s => (s.getInt(0), s.getInt(1)))).toMap
    assert(marked(1L) == Seq((2, 42)), "code-point offsets, not UTF-16")
    assert(marked(2L) == Seq((7, 47)))
    val out = SubstrDedup.strip(docs, "doc_id", "text", k = 40)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(3))).toMap
    assert(out(1L) == (("\ud83d\ude00\ud83d\ude00_tail", 40L)),
      "exactly the shared block is removed, emoji intact")
    assert(out(2L) == (("prefix-", 40L)))
    // conservation in code points: clean + removed == original
    val origCps = Map(1L -> (2 + 40 + 5), 2L -> (7 + 40))
    for ((id, (clean, dup)) <- out)
      assert(clean.codePointCount(0, clean.length) + dup == origCps(id),
        s"doc $id conservation")
  }

  test("cross-document duplicated span is marked with exact offsets") {
    val docs = Seq(
      (1L, s"aaaa_${shared}_bbbb"),
      (2L, s"cccc-cccc-$shared"),
      (3L, "nothing in common here at all zzzz")
    ).toDF("doc_id", "text")
    val out = SubstrDedup.markSpans(docs, "doc_id", "text", k = 40)
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Row](1).map(s => (s.getInt(0), s.getInt(1))),
          r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((Seq((5, 45)), 1L, 40L)))
    assert(out(2L) == ((Seq((10, 50)), 1L, 40L)))
    assert(out(3L) == ((Seq.empty, 0L, 0L)))
  }

  test("a within-document repeat is a duplicate of itself") {
    val docs = Seq(
      (1L, "abcdefghijkl....abcdefghijkl"),
      (2L, "unrelated text of some length")
    ).toDF("doc_id", "text")
    val out = SubstrDedup.markSpans(docs, "doc_id", "text", k = 12)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Row](1).map(s => (s.getInt(0), s.getInt(1)))).toMap
    assert(out(1L) == Seq((0, 12), (16, 28)))
    assert(out(2L) == Seq.empty)
  }

  test("overlapping covered windows coalesce into one maximal span") {
    // doc 1 shares its first 10 chars with doc 2 and chars 5..15 with
    // doc 3: the two covered regions overlap → ONE span [0, 15)
    val docs = Seq(
      (1L, "ABCDEFGHIJKLMNO one"),
      (2L, "ABCDEFGHIJ two"),
      (3L, "xy FGHIJKLMNO!three")
    ).toDF("doc_id", "text")
    val out = SubstrDedup.markSpans(docs, "doc_id", "text", k = 10)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Row](1).map(s => (s.getInt(0), s.getInt(1)))).toMap
    assert(out(1L) == Seq((0, 15)))
  }

  test("strip removes exactly the spans, keeps other columns") {
    val docs = Seq(
      (1L, s"keepA_${shared}_keepB", "web"),
      (2L, s"$shared-keepC", "book"),
      (3L, "totally unique document body", "web")
    ).toDF("doc_id", "text", "source")
    val out = SubstrDedup.strip(docs, "doc_id", "text", k = 40)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == (("keepA__keepB", "web", 1L, 40L)))
    assert(out(2L) == (("-keepC", "book", 1L, 40L)))
    assert(out(3L) == (("totally unique document body", "web", 0L, 0L)))
  }

  test("a fully-duplicated document strips to empty; short text untouched") {
    val docs = Seq(
      (1L, "identical-twelve"),
      (2L, "identical-twelve"),
      (3L, "tiny")
    ).toDF("doc_id", "text")
    val out = SubstrDedup.strip(docs, "doc_id", "text", k = 16)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == (("", 1L)))
    assert(out(2L) == (("", 1L)))
    assert(out(3L) == (("tiny", 0L)))
  }

  test("kernel: coalesceSpans merges gaps <= k, drops short spans") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def spans(ps: Array[Int], k: Int, minSpan: Int): Seq[(Int, Int)] = {
      val arr = ExprKernels.coalesceSpans(new GenericArrayData(ps), k, minSpan)
      (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 2); (r.getInt(0), r.getInt(1))
      }
    }
    assert(spans(Array(0, 1, 2, 10, 25), 10, 0) == Seq((0, 20), (25, 35)))
    assert(spans(Array(0, 1, 2, 10, 25), 10, 12) == Seq((0, 20)))
    assert(spans(Array.empty, 10, 0) == Seq.empty)
    assert(spans(Array(7), 5, 0) == Seq((7, 12)))
  }

  test("kernel: coalesceSpans equals a brute-force cover union over " +
      "every position subset of [0, 10)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // independent oracle: mark the union of [p, p+k) unit-by-unit, read
    // off maximal covered runs, drop short ones — no shared code
    def brute(ps: Seq[Int], k: Int, minSpan: Int): Seq[(Int, Int)] = {
      if (ps.isEmpty) return Nil
      val covered = ps.flatMap(p => p until p + k).toSet
      val max = covered.max
      val runs = Vector.newBuilder[(Int, Int)]
      var i = 0
      while (i <= max) {
        if (covered(i)) {
          val start = i
          while (i <= max && covered(i)) i += 1
          if (i - start >= minSpan) runs += ((start, i))
        } else i += 1
      }
      runs.result()
    }
    def kernel(ps: Seq[Int], k: Int, minSpan: Int): Seq[(Int, Int)] = {
      val arr = ExprKernels.coalesceSpans(
        new GenericArrayData(ps.toArray), k, minSpan)
      (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 2); (r.getInt(0), r.getInt(1))
      }
    }
    var cases = 0
    for {
      mask <- 0 until 1024 // every subset of positions 0..9 (ascending)
      k <- Seq(2, 3, 5)
      minSpan <- Seq(0, 4)
    } {
      val ps = (0 until 10).filter(i => (mask & (1 << i)) != 0)
      assert(kernel(ps, k, minSpan) == brute(ps, k, minSpan),
        s"ps=$ps k=$k minSpan=$minSpan")
      cases += 1
    }
    assert(cases == 1024 * 6)
  }

  test("minSpan drops duplicated unions below the length threshold") {
    val twelve = "ABCDEFGHIJKL"
    val docs = Seq(
      (1L, s"${shared}__${twelve}__tail1"),
      (2L, s"zz-$shared"),
      (3L, s"qq=$twelve=qq")
    ).toDF("doc_id", "text")
    def spansOf(minSpan: Int) =
      SubstrDedup.markSpans(docs, "doc_id", "text", k = 12, minSpan = minSpan)
        .collect().map(r => r.getLong(0) ->
          r.getSeq[Row](1).map(s => (s.getInt(0), s.getInt(1)))).toMap
    assert(spansOf(0)(1L) == Seq((0, 40), (42, 54)))
    assert(spansOf(30)(1L) == Seq((0, 40)))
    assert(spansOf(30)(3L) == Seq.empty)
  }

  test("kernel: int-sequence rolling hashes equal direct recompute") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def direct(ids: Array[Int], k: Int): Seq[Long] =
      (0 to ids.length - k).map { i =>
        var h = 0L
        var j = i
        while (j < i + k) { h = h * 0x100000001B3L + ids(j); j += 1 }
        ExprKernels.mix64(h)
      }
    val ids = Array(7, 7, 7, 42, -3, 0, 42, 7, 7, 7)
    for (k <- Seq(2, 3, 5)) {
      val got = ExprKernels.kgramHashesInts(new GenericArrayData(ids), k)
        .toLongArray()
      assert(got.toSeq == direct(ids, k), s"k=$k")
    }
    assert(ExprKernels.kgramHashesInts(new GenericArrayData(Array(1)), 2)
      .numElements() == 0)
  }

  test("token-level: shared id runs are marked and stripped") {
    val docs = Seq(
      (1L, Seq(100, 1, 2, 3, 4, 5, 6, 200)),
      (2L, Seq(1, 2, 3, 4, 5, 6, 300, 400)),
      (3L, Seq(7, 8, 9, 42, 43))
    ).toDF("doc_id", "ids")
    val marked = SubstrDedup.markSpansIds(docs, "doc_id", "ids", k = 6)
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Row](1).map(s => (s.getInt(0), s.getInt(1))),
          r.getLong(3))).toMap
    assert(marked(1L) == ((Seq((1, 7)), 6L)))
    assert(marked(2L) == ((Seq((0, 6)), 6L)))
    assert(marked(3L) == ((Seq.empty, 0L)))
    val stripped = SubstrDedup.stripIds(docs, "doc_id", "ids", k = 6)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(stripped(1L) == Seq(100, 200))
    assert(stripped(2L) == Seq(300, 400))
    assert(stripped(3L) == Seq(7, 8, 9, 42, 43))
  }

  test("column expression matches the kernel and survives codegen") {
    val df = Seq("abcdefgh", "ab").toDF("t")
      .select(col("t"), kgram_hashes(col("t"), 4).as("hs"))
    val rows = df.collect().map(r =>
      r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(rows("abcdefgh") ==
      directHashes("abcdefgh", 4))
    assert(rows("ab") == Seq.empty)
  }
}
