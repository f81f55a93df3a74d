package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumnBridge.{column => toColumn, expression}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM tokenization in the public SentencePiece interchange
  * formats (Kudo 2018, "Subword Regularization"; Kudo & Richardson
  * 2018, "SentencePiece") — the third tokenizer family real pipelines
  * load next to GPT-2 byte-level BPE ([[Gpt2Bpe]]) and BERT WordPiece
  * ([[WordPiece]]). The model is a (piece, log-probability) table; a
  * sentence encodes as the segmentation maximizing the sum of piece
  * scores, found by Viterbi over the character lattice. Whitespace is
  * carried IN the pieces via the published meta symbol `▁` (U+2581):
  * normalization replaces every space with `▁` and prepends one to the
  * text (SentencePiece's `add_dummy_prefix`), which is what makes
  * detokenization (`decode`) a pure string concat — the trademark
  * SentencePiece property.
  *
  * Three ways to get a model:
  *  - [[loadModelBytes]] / [[loadModelFile]] a PRETRAINED `.model`
  *    checkpoint: a protobuf `ModelProto` whose field 1 is the repeated
  *    `SentencePiece { piece = 1; score = 2; type = 3 }` message. The
  *    reader below decodes exactly that subset of the public wire
  *    format (varint keys, length-delimited strings, little-endian
  *    fixed32 floats) — enough to load any real checkpoint's vocabulary
  *    without a protobuf dependency;
  *  - [[loadTsv]] the `spm_export_vocab` format (`piece<TAB>score`, id
  *    = line number) — the text interchange form of the same table;
  *  - [[fit]] a BASELINE vocabulary on the corpus (character coverage +
  *    frequent words scored by log relative frequency — NOT the
  *    published EM trainer, which alternates Viterbi E-steps with
  *    piece-pruning M-steps; documented as such) and [[exportTsv]] it.
  *
  * Segmentation semantics pinned here (and in `UnigramLmSpec`):
  *  - Viterbi maximizes the score sum; ties break toward the LONGER
  *    final piece, then the lower piece id — deterministic on any
  *    engine;
  *  - only `NORMAL` and `USER_DEFINED` pieces participate in matching
  *    (`CONTROL` pieces like `<s>`/`</s>` and the `UNKNOWN` piece have
  *    entries but never match text, as in the published processor);
  *  - a character no piece covers maps to the unk id with score
  *    `min(score) − 10` (the processor's unk penalty), and a maximal
  *    RUN of such characters yields ONE unk token (the processor's
  *    consecutive-unknown merge).
  *
  * Scale shape, as the other two tokenizers: loading/fitting is
  * driver-side and bounded (the vocab table rides the expression as a
  * reference object); encoding is a codegen'd per-row Viterbi pass —
  * O(len · maxPieceLen) hash lookups, no joins, no shuffle, scan speed
  * at any corpus size.
  *
  * Semantics reference: google/sentencepiece (public) —
  * `sentencepiece_model.proto` for the checkpoint layout,
  * `unigram_model.cc` for Viterbi + unk penalty. The reference repo has
  * no tokenizer; this is part of the training-data-pipeline surface
  * the brief adds.
  */
object UnigramLm {

  /** The meta symbol SentencePiece uses for whitespace (U+2581). */
  final val Meta = '\u2581'

  /** Piece kinds, numbered as `sentencepiece_model.proto`'s
    * `SentencePiece.Type` enum.
    */
  final val Normal = 1
  final val Unknown = 2
  final val Control = 3
  final val UserDefined = 4

  /** A unigram-LM vocabulary: `pieces(id) = (piece, score, kind)`.
    * Matchable pieces (NORMAL / USER_DEFINED) index into `table`.
    */
  final case class Model(pieces: Vector[(String, Float, Int)]) {
    require(pieces.nonEmpty, "unigram model must have pieces")
    require(pieces.exists(_._3 == Unknown),
      "unigram model must carry an UNKNOWN piece")

    /** piece → id for the matchable subset (built once per model). */
    @transient lazy val table: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](pieces.size * 2)
      pieces.zipWithIndex.foreach { case ((p, _, k), i) =>
        if (k == Normal || k == UserDefined) m.put(p, Integer.valueOf(i))
      }
      m
    }
    @transient lazy val scores: Array[Float] = pieces.map(_._2).toArray
    @transient lazy val unkId: Int = pieces.indexWhere(_._3 == Unknown)
    @transient lazy val maxPieceLen: Int =
      pieces.iterator.filter(p => p._3 == Normal || p._3 == UserDefined)
        .map(_._1.length).maxOption.getOrElse(1)
    /** The processor's unk score: min piece score − 10. */
    @transient lazy val unkScore: Float =
      pieces.iterator.filter(p => p._3 == Normal || p._3 == UserDefined)
        .map(_._2).minOption.getOrElse(0f) - 10f

    def validated: Model = {
      val matchable = pieces.collect {
        case (p, _, k) if k == Normal || k == UserDefined => p }
      require(matchable.distinct.size == matchable.size,
        "duplicate matchable pieces — not a valid model")
      this
    }
  }

  // ------------------------------------------------------------ loading

  /** Parse the `spm_export_vocab` text format: `piece<TAB>score` per
    * line, id = line number. Pieces named `<unk>`/`<s>`/`</s>`/`<pad>`
    * take their conventional special kinds; everything else is NORMAL.
    */
  def loadTsv(vocabTsv: String): Model = {
    val lines = vocabTsv.split("\n", -1).iterator
      .map(_.stripSuffix("\r")).toVector
    val trimmed = lines.reverse.dropWhile(_.isEmpty).reverse
    require(trimmed.nonEmpty, "vocab tsv is empty")
    val pieces = trimmed.map { ln =>
      val tab = ln.indexOf('\t')
      require(tab > 0, s"not a piece<TAB>score line: '$ln'")
      val piece = ln.substring(0, tab)
      val score = ln.substring(tab + 1).toFloat
      val kind = piece match {
        case "<unk>" => Unknown
        case "<s>" | "</s>" | "<pad>" => Control
        case _ => Normal
      }
      (piece, score, kind)
    }
    Model(pieces).validated
  }

  /** Serialize as the `spm_export_vocab` format (inverse of
    * [[loadTsv]]).
    */
  def exportTsv(model: Model): String =
    model.pieces.map { case (p, s, _) =>
      val txt =
        if (s == s.toLong.toFloat && math.abs(s) < 1e15) s.toLong.toString
        else s.toString
      s"$p\t$txt"
    }.mkString("\n") + "\n"

  /** Decode a pretrained `.model` checkpoint (protobuf `ModelProto`):
    * reads every `pieces` entry (field 1, length-delimited) taking
    * `piece` (field 1, string), `score` (field 2, float) and `type`
    * (field 3, varint enum; absent = NORMAL, per proto3 defaulting in
    * the published schema — the file writes it only for specials).
    * Unknown fields (trainer/normalizer specs etc.) are skipped by wire
    * type, so any real checkpoint parses.
    */
  def loadModelBytes(bytes: Array[Byte]): Model = {
    var pos = 0
    def varint(): Long = {
      var shift = 0; var v = 0L
      var more = true
      while (more) {
        require(pos < bytes.length, "truncated varint")
        val b = bytes(pos); pos += 1
        v |= (b & 0x7fL) << shift; shift += 7
        more = (b & 0x80) != 0
      }
      v
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => val n = varint().toInt; pos += n
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"wire type $w")
    }
    val out = Vector.newBuilder[(String, Float, Int)]
    while (pos < bytes.length) {
      val key = varint()
      val field = (key >> 3).toInt
      val wire = (key & 7).toInt
      if (field == 1 && wire == 2) {
        val len = varint().toInt
        val end = pos + len
        var piece = ""
        var score = 0f
        var kind = Normal
        while (pos < end) {
          val k2 = varint()
          val f2 = (k2 >> 3).toInt
          val w2 = (k2 & 7).toInt
          if (f2 == 1 && w2 == 2) {
            val n = varint().toInt
            piece = new String(bytes, pos, n,
              java.nio.charset.StandardCharsets.UTF_8)
            pos += n
          } else if (f2 == 2 && w2 == 5) {
            score = java.lang.Float.intBitsToFloat(
              (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8) |
                ((bytes(pos + 2) & 0xff) << 16) |
                ((bytes(pos + 3) & 0xff) << 24))
            pos += 4
          } else if (f2 == 3 && w2 == 0) {
            kind = varint().toInt
          } else skip(w2)
        }
        out += ((piece, score, kind))
      } else skip(wire)
    }
    Model(out.result()).validated
  }

  /** [[loadModelBytes]] from a local `.model` file (driver-side). */
  def loadModelFile(path: String): Model =
    loadModelBytes(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)))

  /** Parse a huggingface/tokenizers `tokenizer.json` whose
    * `model.type` is `"Unigram"` (the single-file format T5/mBART-class
    * checkpoints ship): `model.vocab` is an array of `[piece, score]`
    * pairs in id order, `model.unk_id` indexes the UNKNOWN piece, and
    * `added_tokens` flagged `special: true` load as CONTROL pieces
    * (never matched from text, the SentencePiece convention the
    * `.model` loader follows too). The BPE sibling lives in
    * [[Gpt2Bpe.loadTokenizerJson]].
    */
  def loadTokenizerJson(json: String): Model = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    val m = root.get("model")
    require(m != null && m.isObject, "tokenizer.json: missing model object")
    val tpe = Option(m.get("type")).map(_.asText()).getOrElse("")
    require(tpe == "Unigram",
      s"tokenizer.json: model.type '$tpe' is not Unigram")
    val vocab = m.get("vocab")
    require(vocab != null && vocab.isArray,
      "tokenizer.json: model.vocab must be an array of [piece, score]")
    val unkNode = Option(m.get("unk_id")).filter(!_.isNull)
    require(unkNode.isDefined,
      "tokenizer.json: model.unk_id is absent/null (a byte-fallback " +
        "model without an unk piece) — this engine requires an UNKNOWN " +
        "piece; defaulting to piece 0 would silently reclassify it")
    val unkId = unkNode.get.asInt()
    val specials: Set[String] = {
      val added = root.get("added_tokens")
      if (added == null || !added.isArray) Set.empty
      else {
        val b = Set.newBuilder[String]
        val it = added.elements()
        while (it.hasNext) {
          val a = it.next()
          if (Option(a.get("special")).exists(_.asBoolean(false)))
            b += a.get("content").asText()
        }
        b.result()
      }
    }
    val pieces = Vector.newBuilder[(String, Float, Int)]
    var i = 0
    val it = vocab.elements()
    while (it.hasNext) {
      val e = it.next()
      require(e.isArray && e.size == 2,
        s"tokenizer.json: vocab entry $i is not a [piece, score] pair")
      val piece = e.get(0).asText()
      val score = e.get(1).asDouble().toFloat
      val kind =
        if (i == unkId) Unknown
        else if (specials.contains(piece)) Control
        else Normal
      pieces += ((piece, score, kind))
      i += 1
    }
    Model(pieces.result()).validated
  }

  /** Serialize as a `.model` checkpoint (inverse of [[loadModelBytes]]):
    * one length-delimited `pieces` entry per piece with the same
    * field/wire layout the reader decodes — `piece` (field 1), `score`
    * (field 2, little-endian fixed32), `type` (field 3, written only
    * when not NORMAL, matching the published files' proto3 default
    * elision). `loadModelBytes(exportModelBytes(m))` round-trips
    * exactly, and the output is a valid minimal `ModelProto` any
    * SentencePiece-format consumer of the pieces table can read.
    */
  def exportModelBytes(model: Model): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(model.pieces.size * 16)
    def varint(n0: Int): Unit = {
      var v = n0
      while ((v & ~0x7f) != 0) { out.write((v & 0x7f) | 0x80); v >>>= 7 }
      out.write(v)
    }
    model.pieces.foreach { case (p, score, kind) =>
      val pb = p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val body = new java.io.ByteArrayOutputStream(pb.length + 12)
      def bvarint(n0: Int): Unit = {
        var v = n0
        while ((v & ~0x7f) != 0) { body.write((v & 0x7f) | 0x80); v >>>= 7 }
        body.write(v)
      }
      body.write(0x0a); bvarint(pb.length); body.write(pb, 0, pb.length)
      body.write(0x15)
      val bits = java.lang.Float.floatToIntBits(score)
      body.write(bits & 0xff); body.write((bits >> 8) & 0xff)
      body.write((bits >> 16) & 0xff); body.write((bits >> 24) & 0xff)
      if (kind != Normal) { body.write(0x18); bvarint(kind) }
      out.write(0x0a); varint(body.size())
      body.writeTo(out)
    }
    out.toByteArray
  }

  // ------------------------------------------------------------ fitting

  /** Fit a BASELINE vocabulary: `<unk>`, `<s>`, `</s>` (the published
    * default specials at ids 0-2), every character observed anywhere in
    * the normalized corpus (full coverage — the same whole-corpus
    * inventory rule as [[WordPiece.fit]]), then the most frequent
    * whole words as `▁word` pieces (count desc, piece asc) until
    * `vocabSize`. Scores are log relative frequencies over the
    * corpus's normalized character mass for char pieces and word
    * occurrences for word pieces — a seed distribution, NOT the
    * published EM trainer (which would alternate Viterbi E-steps with
    * likelihood-driven pruning from a large seed set); the point is a
    * model that round-trips the public formats with stable budgets.
    *
    * Distributed the same way as [[WordPiece.fit]]: word counts via
    * TakeOrderedAndProject (only top rows reach the driver), the char
    * inventory via per-document `array_distinct` + global distinct.
    */
  def fit(df: DataFrame, textCol: String, vocabSize: Int = 8192,
          lowerCase: Boolean = false): Model = {
    require(vocabSize >= 4, s"vocabSize must be >= 4, got $vocabSize")
    val t = if (lowerCase) lower(col(textCol)) else col(textCol)
    val words = df.select(explode(split(t, "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(vocabSize)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val totalWords = df.select(explode(split(t, "\\s+")).as("w"))
      .filter(length(col("w")) > 0).count().max(1L)
    // full-corpus char counts (chars of the NORMALIZED text: spaces
    // become the meta symbol, so ▁ is always covered)
    val charCounts = df
      .select(explode(split(regexp_replace(t, "\\s+", Meta.toString),
        "")).as("c"))
      .filter(length(col("c")) > 0)
      .groupBy("c").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val totalChars = math.max(charCounts.map(_._2).sum, 1L)
    val b = Vector.newBuilder[(String, Float, Int)]
    b += (("<unk>", 0f, Unknown))
    b += (("<s>", 0f, Control))
    b += (("</s>", 0f, Control))
    val seen = scala.collection.mutable.HashSet.empty[String]
    // chars sorted for determinism; ▁ guaranteed by the normalization
    charCounts.sortBy(_._1).foreach { case (c, n) =>
      if (seen.add(c))
        b += ((c, math.log(n.toDouble / totalChars).toFloat, Normal))
    }
    if (seen.add(Meta.toString))
      b += ((Meta.toString, math.log(1.0 / totalChars).toFloat, Normal))
    var size = 3 + seen.size
    words.foreach { case (w, n) =>
      val piece = Meta.toString + w
      if (size < vocabSize && seen.add(piece)) {
        b += ((piece, math.log(n.toDouble / totalWords).toFloat, Normal))
        size += 1
      }
    }
    Model(b.result()).validated
  }

  /** EM-TRAINED unigram model — the Viterbi ("hard-EM") variant of the
    * published SentencePiece trainer, the step [[fit]]'s whole-word
    * initializer deliberately skips:
    *
    *  1. SEED: the highest `freq × len` substrings (≤ `maxPieceLen`) of
    *     the corpus's distinct `▁`-prefixed words — the spm seeding
    *     heuristic — plus EVERY single character (coverage guarantee,
    *     never pruned).
    *  2. E-step, DISTRIBUTED: every distinct word, weighted by its
    *     corpus count, re-segments by Viterbi (the same [[encodeData]]
    *     kernel inference uses) under the broadcast current scores and
    *     emits per-piece usage counts — corpus text is touched exactly
    *     once (the distinct-word aggregation); every EM pass runs over
    *     the far smaller word table.
    *  3. M-step: scores re-estimate as log relative frequency of the
    *     Viterbi usage mass (chars add-one-floored so coverage never
    *     dies); zero-use multi-char pieces drop.
    *  4. PRUNE: multi-char pieces rank by usage mass (piece tiebreak)
    *     and shrink geometrically (keep 75 %) toward the
    *     `vocabSize − specials − chars` budget, hard-capped after the
    *     final round.
    *
    * Differences from `spm_train` are documented, not hidden: spm's
    * E-step computes full lattice marginals (soft EM) and prunes by
    * held-out likelihood loss; the Viterbi form keeps the same
    * fixed-point shape with deterministic integer counts — which is
    * what makes the result reproducible across partitionings and
    * engines. Deterministic: every rank orders by (mass, piece).
    */
  def fitEm(df: DataFrame, textCol: String, vocabSize: Int = 8192,
            seedSize: Int = 0, emIters: Int = 3, maxPieceLen: Int = 8,
            lowerCase: Boolean = false): Model = {
    require(vocabSize >= 8, s"vocabSize must be >= 8, got $vocabSize")
    require(emIters >= 1 && maxPieceLen >= 2)
    val targetSeed = if (seedSize > 0) seedSize else vocabSize * 4
    val spark = df.sparkSession
    import spark.implicits._
    val t0 = if (lowerCase) lower(col(textCol)) else col(textCol)
    val dw = df.select(explode(split(t0, "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .as[(String, Long)].persist()
    try {
      val metaStr = Meta.toString
      // substring windows advance by CODE POINT, not UTF-16 unit — a
      // per-unit walk would split supplementary-plane characters into
      // lone surrogates, which are not valid Unicode scalar values and
      // don't round-trip the UTF-8 .model wire format; the "every single
      // character survives" coverage guarantee must hold per code point
      val subs = dw.flatMap { case (w, n) =>
        val s = metaStr + w
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
        var i = 0
        while (i < s.length) {
          var j = i
          var cps = 0
          while (j < s.length && cps < maxPieceLen) {
            j = s.offsetByCodePoints(j, 1)
            cps += 1
            out += ((s.substring(i, j), n))
          }
          i = s.offsetByCodePoints(i, 1)
        }
        out
      }.toDF("p", "n").groupBy("p").agg(sum("n").as("n")).persist()
      val chars = subs.filter(length(col("p")) === 1)
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy(_._1)
      var multi: Array[(String, Long)] = subs
        .filter(length(col("p")) > 1)
        .orderBy((col("n") * length(col("p"))).desc, col("p"))
        .limit(targetSeed)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      subs.unpersist()
      val budget = math.max(vocabSize - 3 - chars.length, 1)

      def build(charScores: Map[String, Double],
                multiScores: Seq[(String, Double)]): Model = {
        val b = Vector.newBuilder[(String, Float, Int)]
        b += (("<unk>", 0f, Unknown))
        b += (("<s>", 0f, Control))
        b += (("</s>", 0f, Control))
        chars.foreach { case (c, n) =>
          b += ((c, charScores.getOrElse(c,
            math.log(n.toDouble).toFloat.toDouble).toFloat, Normal))
        }
        multiScores.foreach { case (p, sc) => b += ((p, sc.toFloat, Normal)) }
        Model(b.result()).validated
      }

      // init scores: log relative seed frequency over the joint mass
      val initTotal = (chars.map(_._2).sum + multi.map(_._2).sum).toDouble
      var charScores = chars.map { case (c, n) =>
        c -> math.log((n + 1).toDouble / initTotal) }.toMap
      var multiScores: Seq[(String, Double)] = multi.map { case (p, n) =>
        p -> math.log(n.toDouble / initTotal) }.toSeq

      var iter = 0
      while (iter < emIters) {
        val model = build(charScores, multiScores)
        val bc = spark.sparkContext.broadcast(model)
        val counts = dw.flatMap { case (w, n) =>
          val m = bc.value
          val arr = encodeData(
            org.apache.spark.unsafe.types.UTF8String.fromString(w),
            m.table, m.scores, m.unkId, m.unkScore, m.maxPieceLen)
          (0 until arr.numElements()).map(i => (arr.getInt(i), n))
        }.toDF("id", "n").groupBy("id").agg(sum("n").as("cn"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        val pieceCount: Map[String, Long] =
          model.pieces.zipWithIndex.collect {
            case ((p, _, k), id) if k == Normal =>
              p -> counts.getOrElse(id, 0L)
          }.toMap
        val total = math.max(pieceCount.values.sum, 1L).toDouble
        // M-step: chars floored (coverage), zero-use multis drop
        charScores = chars.map { case (c, _) =>
          c -> math.log((pieceCount.getOrElse(c, 0L) + 1).toDouble /
            (total + chars.length))
        }.toMap
        var survivors = multiScores.map(_._1)
          .map(p => p -> pieceCount.getOrElse(p, 0L))
          .filter(_._2 > 0L)
          .sortBy { case (p, c) => (-c, p) }
        // geometric prune toward the budget; hard cap on the last round
        val keep =
          if (iter == emIters - 1) budget
          else math.max(budget, (survivors.size * 3) / 4)
        survivors = survivors.take(keep)
        multiScores = survivors.map { case (p, c) =>
          p -> math.log(c.toDouble / total) }
        bc.unpersist()
        iter += 1
      }
      build(charScores, multiScores)
    } finally dw.unpersist()
  }

  // --------------------------------------------------------------- core

  /** Normalize for the lattice: runs of whitespace collapse to one
    * meta symbol, plus the dummy prefix (published defaults).
    */
  private[text] def normalize(text: String): String = {
    val sb = new java.lang.StringBuilder(text.length + 1)
    sb.append(Meta)
    var i = 0
    var ws = false
    while (i < text.length) {
      val c = text.charAt(i)
      if (Character.isWhitespace(c)) ws = true
      else {
        if (ws && sb.length() > 1) sb.append(Meta)
        ws = false
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Viterbi encode of one row (kernel entry point for codegen —
    * public so Janino can call it). DP over the normalized text: at
    * each end position keep the best (score, start, id) among every
    * vocab piece ending there plus the unk fallback; ties prefer the
    * longer piece, then the lower id. One backward pass emits ids;
    * consecutive unks merge.
    */
  def encodeData(input: UTF8String,
                 table: java.util.HashMap[String, Integer],
                 scores: Array[Float], unkId: Int, unkScore: Float,
                 maxPieceLen: Int): GenericArrayData = {
    val s = normalize(input.toString)
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val best = new Array[Float](n + 1)
    val from = new Array[Int](n + 1)
    val ids = new Array[Int](n + 1)
    java.util.Arrays.fill(best, Float.NegativeInfinity)
    best(0) = 0f
    var end = 1
    while (end <= n) {
      // unk fallback: one char, lowest priority (strictly-better wins)
      if (best(end - 1) != Float.NegativeInfinity) {
        best(end) = best(end - 1) + unkScore
        from(end) = end - 1
        ids(end) = unkId
      }
      var len = 1
      val maxLen = math.min(maxPieceLen, end)
      while (len <= maxLen) {
        val start = end - len
        if (best(start) != Float.NegativeInfinity) {
          val id = table.get(s.substring(start, end))
          if (id != null) {
            val cand = best(start) + scores(id.intValue())
            // >= with lengths iterated ascending: on an exact score tie
            // the LONGER piece ending here wins (and any real piece
            // beats the unk fallback installed above); per (start, end)
            // the map holds exactly one id, so no further tie exists
            if (cand >= best(end)) {
              best(end) = cand
              from(end) = start
              ids(end) = id.intValue()
            }
          }
        }
        len += 1
      }
      end += 1
    }
    // backtrack (reversed), merging consecutive unks
    val rev = new java.util.ArrayList[Integer](16)
    var p = n
    while (p > 0) {
      val id = ids(p)
      if (id != unkId || rev.isEmpty || rev.get(rev.size() - 1) != unkId)
        rev.add(Integer.valueOf(id))
      p = from(p)
    }
    val out = new Array[Any](rev.size())
    var i = 0
    while (i < out.length) {
      out(i) = rev.get(out.length - 1 - i).intValue(); i += 1
    }
    new GenericArrayData(out)
  }

  /** Token count of one row (kernel entry point for codegen). */
  def countData(input: UTF8String,
                table: java.util.HashMap[String, Integer],
                scores: Array[Float], unkId: Int, unkScore: Float,
                maxPieceLen: Int): Long =
    encodeData(input, table, scores, unkId, unkScore, maxPieceLen)
      .numElements().toLong

  /** Decode an id sequence: concat pieces, meta symbols back to
    * spaces, leading dummy prefix dropped — the SentencePiece
    * detokenization rule (lossy only through `<unk>` and whitespace
    * collapsing). Control pieces render as nothing; unknown ids raise.
    */
  def decode(ids: Seq[Int], model: Model): String = {
    val sb = new java.lang.StringBuilder
    ids.foreach { id =>
      require(id >= 0 && id < model.pieces.size, s"id $id not in the vocab")
      val (p, _, kind) = model.pieces(id)
      if (kind == Normal || kind == UserDefined) sb.append(p)
      // U+2047, the published default unk surface glyph
      else if (kind == Unknown) sb.append('\u2047')
    }
    val joined = sb.toString.replace(Meta, ' ')
    if (joined.startsWith(" ")) joined.substring(1) else joined
  }

  // ------------------------------------------------------------- columns

  /** Token-id array column (codegen'd per-row Viterbi; `array<int>`). */
  def encode(text: Column, model: Model): Column =
    toColumn(UnigramEncode(expression(text), model))

  /** Token count column (codegen'd per-row). */
  def tokenCount(text: Column, model: Model): Column =
    toColumn(UnigramCount(expression(text), model))

  /** The id <-> piece table as a DataFrame:
    * `(token_id, piece, score)`.
    */
  def vocabDf(spark: org.apache.spark.sql.SparkSession,
              model: Model): DataFrame = {
    import spark.implicits._
    model.pieces.zipWithIndex
      .map { case ((p, s, _), i) => (i, p, s) }
      .toDF("token_id", "piece", "score")
  }
}

/** Codegen'd unigram-LM Viterbi encoding (see
  * [[UnigramLm.encodeData]]): the piece table and score array ride the
  * expression as reference objects.
  */
case class UnigramEncode(child: Expression, model: UnigramLm.Model)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes() =
    graft.plans.expressions.stringCheck(child, "unigram_encode")

  override def nullSafeEval(input: Any): Any =
    UnigramLm.encodeData(input.asInstanceOf[UTF8String], model.table,
      model.scores, model.unkId, model.unkScore, model.maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val table = ctx.addReferenceObj("ulmTable", model.table,
      "java.util.HashMap")
    val scores = ctx.addReferenceObj("ulmScores", model.scores, "float[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.text.UnigramLm.encodeData($c, $table, $scores,
         |  ${model.unkId}, ${model.unkScore}f, ${model.maxPieceLen});""".stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): UnigramEncode =
    copy(child = c)
}

/** Codegen'd unigram-LM token count (see [[UnigramLm.countData]]). */
case class UnigramCount(child: Expression, model: UnigramLm.Model)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    graft.plans.expressions.stringCheck(child, "unigram_count")

  override def nullSafeEval(input: Any): Any =
    UnigramLm.countData(input.asInstanceOf[UTF8String], model.table,
      model.scores, model.unkId, model.unkScore, model.maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val table = ctx.addReferenceObj("ulmTable", model.table,
      "java.util.HashMap")
    val scores = ctx.addReferenceObj("ulmScores", model.scores, "float[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.text.UnigramLm.countData($c, $table, $scores,
         |  ${model.unkId}, ${model.unkScore}f, ${model.maxPieceLen});""".stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): UnigramCount =
    copy(child = c)
}
