package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private val M = UnigramLm.Meta.toString // "▁"

  /** Hand-built model in published id layout: specials first. */
  private def model(scored: (String, Double)*): UnigramLm.Model =
    UnigramLm.Model(
      Vector(("<unk>", 0f, UnigramLm.Unknown),
        ("<s>", 0f, UnigramLm.Control),
        ("</s>", 0f, UnigramLm.Control)) ++
        scored.map { case (p, s) => (p, s.toFloat, UnigramLm.Normal) })
      .validated

  private def pieces(m: UnigramLm.Model, text: String): Seq[String] =
    spark.range(1).select(UnigramLm.encode(lit(text), m).as("ids"))
      .head().getSeq[Int](0).map(id => m.pieces(id)._1)

  test("viterbi picks the max-score segmentation, not greedy longest") {
    // greedy longest-first would take ▁hel + l + o (-2 -5 -5 = -12);
    // the lattice optimum is ▁he + llo (-3 + -3 = -6)
    val m = model(M + "hel" -> -2.0, M + "he" -> -3.0, "llo" -> -3.0,
      "l" -> -5.0, "o" -> -5.0, "h" -> -9.0, "e" -> -9.0)
    assert(pieces(m, "hello") == Seq(M + "he", "llo"))
  }

  test("whitespace becomes the meta symbol with a dummy prefix; " +
      "runs collapse") {
    val m = model(M + "a" -> -1.0, M + "b" -> -1.0, "a" -> -4.0, "b" -> -4.0)
    assert(pieces(m, "a  b") == Seq(M + "a", M + "b"))
    assert(pieces(m, " a b ") == Seq(M + "a", M + "b"),
      "leading/trailing whitespace folds into the meta prefix")
  }

  test("score-tie breaks toward the longer piece") {
    // both segmentations score -4: ▁ab (one piece) vs ▁a + b
    val m = model(M + "ab" -> -4.0, M + "a" -> -2.0, "b" -> -2.0,
      "a" -> -9.0, M -> -9.0)
    assert(pieces(m, "ab") == Seq(M + "ab"))
  }

  test("uncovered characters become ONE unk per maximal run, " +
      "with the min-score-minus-10 penalty") {
    val m = model(M + "ok" -> -1.0, M -> -2.0, "o" -> -3.0, "k" -> -3.0)
    // 'xyz' has no pieces: one run -> one <unk> (id 0)
    val ids = spark.range(1)
      .select(UnigramLm.encode(lit("ok xyz ok"), m).as("ids"))
      .head().getSeq[Int](0)
    assert(ids.count(_ == 0) == 1, s"one unk for the xyz run: $ids")
    assert(ids.head != 0 && ids.last != 0)
    // and the penalty keeps unk from beating any real cover
    assert(pieces(m, "ok") == Seq(M + "ok"))
  }

  test("control pieces never match text: '<s>' encodes as characters") {
    val m = model(M + "<" -> -1.0, "s" -> -1.0, ">" -> -1.0, "<" -> -1.0)
    val got = pieces(m, "<s>")
    assert(got == Seq(M + "<", "s", ">"),
      s"the literal string must not hit the control entry: $got")
  }

  test("tsv round-trip: export -> load preserves pieces, scores, kinds") {
    val m = model(M + "the" -> -1.5, M -> -2.25, "x" -> -3.0)
    val r = UnigramLm.loadTsv(UnigramLm.exportTsv(m))
    assert(r.pieces == m.pieces)
    assert(r.unkId == 0 && r.pieces(1)._3 == UnigramLm.Control)
  }

  test("the .model protobuf reader decodes a wire-format checkpoint " +
      "(hand-encoded per the published sentencepiece_model.proto)") {
    // ModelProto { repeated SentencePiece pieces = 1; }
    // SentencePiece { string piece = 1; float score = 2; Type type = 3 }
    def varint(n: Int): Array[Byte] = {
      var v = n; val b = Vector.newBuilder[Byte]
      while ((v & ~0x7f) != 0) { b += ((v & 0x7f) | 0x80).toByte; v >>>= 7 }
      b += v.toByte
      b.result().toArray
    }
    def f32(f: Float): Array[Byte] = {
      val bits = java.lang.Float.floatToIntBits(f)
      Array(bits.toByte, (bits >> 8).toByte, (bits >> 16).toByte,
        (bits >> 24).toByte)
    }
    def piece(p: String, score: Float, tpe: Option[Int]): Array[Byte] = {
      val pb = p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val body = Array[Byte](0x0a) ++ varint(pb.length) ++ pb ++ // f1 str
        Array[Byte](0x15) ++ f32(score) ++                        // f2 fix32
        tpe.map(t => Array[Byte](0x18) ++ varint(t))              // f3 varint
          .getOrElse(Array.empty[Byte])
      Array[Byte](0x0a) ++ varint(body.length) ++ body            // pieces=1
    }
    // an unknown top-level field (trainer_spec = 2, length-delimited)
    // must be skipped by wire type
    val junk = Array[Byte](0x12, 0x03, 0x01, 0x02, 0x03)
    val bytes = piece("<unk>", 0f, Some(UnigramLm.Unknown)) ++
      piece("<s>", 0f, Some(UnigramLm.Control)) ++
      piece("</s>", 0f, Some(UnigramLm.Control)) ++ junk ++
      piece(M + "hello", -3.25f, None) ++ // type absent = NORMAL
      piece(M, -2.5f, None)
    val m = UnigramLm.loadModelBytes(bytes)
    assert(m.pieces.size == 5)
    assert(m.unkId == 0)
    assert(m.pieces(3) == ((M + "hello", -3.25f, UnigramLm.Normal)))
    assert(m.pieces(4)._2 == -2.5f)
    assert(pieces(m, "hello") == Seq(M + "hello"))
  }

  test(".model round-trip: exportModelBytes -> loadModelBytes preserves " +
      "pieces, scores, kinds; a fitted model survives the wire format") {
    val m = model(M + "the" -> -1.5, M -> -2.25, "x" -> -3.0)
    val r = UnigramLm.loadModelBytes(UnigramLm.exportModelBytes(m))
    assert(r.pieces == m.pieces)
    val fitted = UnigramLm.fit(
      Seq("aa bb aa", "aa bb").toDF("text"), "text", vocabSize = 8)
    val rf = UnigramLm.loadModelBytes(UnigramLm.exportModelBytes(fitted))
    assert(rf.pieces == fitted.pieces)
    // the exported bytes are self-describing: NORMAL type elided,
    // specials carry their enum — reload classifies without names
    assert(rf.unkId == 0 && rf.pieces(1)._3 == UnigramLm.Control)
  }

  test("decode concats pieces and restores spaces (the SentencePiece " +
      "detok rule); encode(decode) is stable for covered text") {
    val m = model(M + "the" -> -1.0, M + "cat" -> -1.5, "s" -> -2.0)
    val ids = spark.range(1)
      .select(UnigramLm.encode(lit("the cats"), m).as("ids"))
      .head().getSeq[Int](0)
    assert(UnigramLm.decode(ids, m) == "the cats")
  }

  test("fit: specials at ids 0-2, full char coverage, frequent words " +
      "as meta-prefixed pieces; export/load round-trips; zero unk on " +
      "covered corpus") {
    val docs = Seq("aa bb aa", "aa bb", "aa qz").toDF("text")
    val m = UnigramLm.fit(docs, "text", vocabSize = 8)
    assert(m.pieces(0)._1 == "<unk>" && m.pieces(1)._1 == "<s>" &&
      m.pieces(2)._1 == "</s>")
    val r = UnigramLm.loadTsv(UnigramLm.exportTsv(m))
    assert(r.pieces == m.pieces)
    // rare 'qz' (chars q/z only appear there) still has char pieces
    val unk = docs.select(explode(UnigramLm.encode(col("text"), r)).as("id"))
      .filter(col("id") === r.unkId).count()
    assert(unk == 0L, "full char coverage: no [unk] on the corpus itself")
    // counts agree with encode sizes
    val row = docs.select(
      sum(UnigramLm.tokenCount(col("text"), m)).as("c"),
      sum(size(UnigramLm.encode(col("text"), m))).as("s")).head()
    assert(row.getLong(0) == row.getLong(1))
  }

  test("exhaustive cross-check: Viterbi score equals an independent " +
      "brute-force optimum over every short {a,b,space} text") {
    // independent recursive optimizer (no shared code with the kernel):
    // best total score of segmenting s into vocab pieces
    def brute(s: String, vocab: Map[String, Double]): Double = {
      val memo = new scala.collection.mutable.HashMap[Int, Double]
      def go(i: Int): Double =
        if (i == s.length) 0.0
        else memo.getOrElseUpdate(i, {
          val opts = for {
            j <- (i + 1) to s.length
            sc <- vocab.get(s.substring(i, j))
          } yield sc + go(j)
          if (opts.isEmpty) Double.NegativeInfinity else opts.max
        })
      go(0)
    }
    // seeded vocab: every 1-char piece over the alphabet (full cover,
    // no unk paths) plus a handful of 2-3 char pieces, scores drawn
    // deterministically
    val rnd = new scala.util.Random(42)
    val alphabet = Seq("a", "b", M)
    val multis = Seq(M + "a", M + "b", "ab", "ba", "aab", M + "ab", "bb")
    val vocab = (alphabet ++ multis)
      .map(p => p -> -(1.0 + math.floor(rnd.nextDouble() * 16) / 4)).toMap
    val m = UnigramLm.Model(
      Vector(("<unk>", 0f, UnigramLm.Unknown)) ++
        vocab.toSeq.sortBy(_._1).map { case (p, s) =>
          (p, s.toFloat, UnigramLm.Normal) })
      .validated
    def gen(k: Int): Seq[String] =
      if (k == 0) Seq("")
      else gen(k - 1).flatMap(p => Seq("a", "b", " ").map(p + _))
    val distinct = (1 to 5).flatMap(gen).distinct.filter(_.trim.nonEmpty)
    assert(distinct.size > 100, s"need real coverage, got ${distinct.size}")
    val df = distinct.toDF("t")
      .select(col("t"), UnigramLm.encode(col("t"), m).as("ids"))
    df.collect().foreach { r =>
      val t = r.getString(0)
      val ids = r.getSeq[Int](1)
      assert(!ids.contains(0), s"'$t': full cover means no unk")
      val got = ids.map(id => m.pieces(id)._2.toDouble).sum
      val want = brute(UnigramLm.normalize(t), vocab)
      assert(math.abs(got - want) < 1e-4,
        s"'$t' (normalized '${UnigramLm.normalize(t)}'): kernel score " +
          s"$got != brute-force optimum $want (ids $ids)")
    }
  }

  test("column expression survives codegen and handles NULL/empty") {
    val m = model(M + "a" -> -1.0, "a" -> -2.0)
    val df = Seq(Some("a a"), Some(""), None).toDF("t")
      .select(UnigramLm.encode(col("t"), m).as("ids"),
        UnigramLm.tokenCount(coalesce(col("t"), lit("")), m).as("n"))
    val rows = df.collect()
    assert(rows(0).getSeq[Int](0).nonEmpty && rows(0).getLong(1) == 2L)
    // empty text normalizes to just the dummy prefix — a single piece
    // or unk, never a crash; NULL propagates
    assert(rows(1).getSeq[Int](0).size <= 1)
    assert(rows(2).isNullAt(0))
  }


  test("tokenizer.json (Unigram) loads: unk_id, specials as control") {
    val json =
      """{"added_tokens": [
        |   {"id": 2, "content": "</s>", "special": true}],
        | "model": {"type": "Unigram", "unk_id": 0,
        |  "vocab": [["<unk>", 0.0], ["\u2581the", -2.5],
        |            ["</s>", 0.0], ["he", -3.0], ["t", -4.0],
        |            ["\u2581", -1.0], ["e", -4.5], ["h", -4.5]]}}"""
        .stripMargin
    val m = UnigramLm.loadTokenizerJson(json)
    assert(m.pieces.length == 8)
    assert(m.unkId == 0)
    assert(m.pieces(1) == (("\u2581the", -2.5f, UnigramLm.Normal)))
    assert(m.pieces(2)._3 == UnigramLm.Control,
      "special added_token must load as CONTROL (never matched)")
    // Viterbi over the loaded pieces: "the" -> [▁the] (single best piece)
    val ids = spark.range(1)
      .select(UnigramLm.encode(
        org.apache.spark.sql.functions.lit("the"), m).as("ids"))
      .head().getSeq[Int](0)
    assert(ids == Seq(1), s"expected the single \u2581the piece, got $ids")
    // a non-Unigram file is refused
    val e = intercept[IllegalArgumentException] {
      UnigramLm.loadTokenizerJson("""{"model": {"type": "BPE"}}""")
    }
    assert(e.getMessage.contains("not Unigram"))
  }
}
