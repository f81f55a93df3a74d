package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumnBridge.{column => toColumn, expression}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BYTE-LEVEL BPE in the public GPT-2 interchange format (Radford et al.
  * 2019; the `vocab.json` + `merges.txt` pair every Hugging Face
  * byte-level tokenizer ships): case-preserving pre-tokenization with the
  * published GPT-2 regex, UTF-8 bytes mapped through the published
  * `bytes_to_unicode` table so every possible input is encodable (no
  * `<unk>`, decode is LOSSLESS — `decode(encodeIds(t)) == t` for ANY
  * string), greedy lowest-rank merging shared with [[Bpe]].
  *
  * Two ways to get a model:
  *  - [[load]] / [[loadFiles]] a PRETRAINED tokenizer from its published
  *    `vocab.json`/`merges.txt`, so token budgets match what the real
  *    trainer sees;
  *  - [[fit]] one on the corpus sample and [[exportVocabJson]] /
  *    [[exportMergesTxt]] it in the same format for downstream trainers.
  *
  * Scale shape, as [[Bpe]]: training/loading is driver-side and bounded;
  * encoding is a codegen'd per-row expression (rank + id tables ride the
  * closure as reference objects) — no joins, no shuffle, scan speed at
  * 100 TB.
  *
  * Semantics reference for the format: OpenAI `gpt-2/src/encoder.py`
  * (public), Hugging Face `tokenizers` ByteLevel docs. The reference repo
  * has no tokenizer (mack is a Delta helper library); this is part of the
  * training-data-pipeline surface the brief adds.
  */
object Gpt2Bpe {

  /** The published `bytes_to_unicode` table: printable latin bytes map to
    * themselves ('!'..'~', '¡'..'¬', '®'..'ÿ'); the remaining 68 bytes
    * map, in ascending byte order, to code points 256.. — so every byte
    * becomes one PRINTABLE char and merge rules never contain raw
    * whitespace/controls (what keeps `merges.txt` a plain text file).
    * Known published values: 0x20 -> 'Ġ' (U+0120), 0x0A -> 'Ċ' (U+010A),
    * 0x09 -> 'ĉ' (U+0109).
    */
  val byteToChar: Array[Char] = {
    val out = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      val direct = (b >= '!' && b <= '~') || (b >= 0xA1 && b <= 0xAC) ||
        (b >= 0xAE && b <= 0xFF)
      if (direct) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    out
  }

  /** Inverse of [[byteToChar]] (indexed by char code; -1 = not a byte unit). */
  val charToByte: Array[Int] = {
    val out = Array.fill(324)(-1) // max mapped code point is 256+67 = 323
    byteToChar.zipWithIndex.foreach { case (c, b) => out(c.toInt) = b }
    out
  }

  /** The 256 byte-unit tokens in GPT-2's PUBLISHED vocab order (ids
    * 0..255 of every byte-level vocab): the self-mapped printable ranges
    * first, then the shifted bytes in ascending byte order.
    */
  private[text] val byteUnitsInVocabOrder: Vector[String] = {
    val direct = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).map(_.toChar)
    val shifted = (0 until 256).filter(b => byteToChar(b) >= 256)
      .map(b => byteToChar(b))
    (direct ++ shifted).map(_.toString).toVector
  }

  /** GPT-2's published pre-tokenization regex: contractions, optionally
    * space-prefixed letter/number/symbol runs (the leading space rides
    * the token — 'Ġword' is a different token than 'word'), then
    * whitespace runs. Case-PRESERVING, unlike [[Bpe.preTokens]].
    */
  private val pretok = java.util.regex.Pattern.compile(
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""",
    java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  /** The regex tiles any string completely: every char lands in exactly
    * one pre-token and `preTokenize(t).mkString == t`.
    */
  def preTokenize(text: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val m = pretok.matcher(text)
    while (m.find()) out += m.group()
    out.toSeq
  }

  /** UTF-8 bytes of `s`, each mapped through [[byteToChar]]. */
  def toByteUnits(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) { sb.append(byteToChar(bytes(i) & 0xFF)); i += 1 }
    sb.toString
  }

  /** Inverse of [[toByteUnits]]; refuses chars outside the byte table. */
  def fromByteUnits(s: String): String = {
    val bytes = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i).toInt
      val b = if (c < charToByte.length) charToByte(c) else -1
      require(b >= 0, s"not a byte-level unit: U+${c.toHexString} in '$s'")
      bytes(i) = b.toByte
      i += 1
    }
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** A byte-level model: `encoder` is the vocab.json map (token string in
    * byte-unit space -> id), `merges` the merges.txt rules in rank order.
    * Loaded models are validated so encode can never miss a lookup: all
    * 256 byte units and every merge product must be in the vocab.
    */
  final case class Model(encoder: Map[String, Int],
                         merges: Vector[(String, String)]) {
    @transient lazy val ranks: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer]()
      merges.zipWithIndex.foreach { case ((a, b), i) =>
        m.put(a + "\u0000" + b, i)
      }
      m
    }
    @transient lazy val ids: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer]()
      encoder.foreach { case (t, i) => m.put(t, i) }
      m
    }
    /** id -> token (dense array when ids are 0..n-1, the format norm). */
    @transient lazy val decoder: Map[Int, String] =
      encoder.map { case (t, i) => i -> t }

    def validated: Model = {
      byteUnitsInVocabOrder.foreach(u => require(encoder.contains(u),
        s"gpt2 vocab is missing byte unit '$u' — not a byte-level vocab"))
      merges.foreach { case (a, b) => require(encoder.contains(a + b),
        s"gpt2 vocab is missing merge product '${a + b}' — vocab.json and " +
          "merges.txt disagree") }
      this
    }
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Parse the public GPT-2 format from in-memory strings: `vocab.json`
    * is one JSON object token->id; `merges.txt` is an optional
    * `#version` header then one space-separated pair per line.
    */
  def load(vocabJson: String, mergesTxt: String): Model = {
    val root = mapper.readTree(vocabJson)
    require(root.isObject, "vocab.json must be a single JSON object")
    val enc = Map.newBuilder[String, Int]
    val it = root.fields()
    while (it.hasNext) {
      val e = it.next()
      enc += e.getKey -> e.getValue.asInt()
    }
    // Only the FIRST line may be a '#version' header (encoder.py skips
    // exactly one line; HF tokenizers skips only '#version…'). '#' is a
    // self-mapped byte unit, so later lines starting with '#' (e.g.
    // "# #" producing the '##' token) are REAL merge rules — dropping
    // them would silently mis-tokenize '#'-heavy text.
    val merges = mergesTxt.split("\n", -1).iterator
      .map(_.stripSuffix("\r"))
      .zipWithIndex
      .filter { case (l, i) =>
        l.nonEmpty && !(i == 0 && l.startsWith("#version"))
      }
      .map(_._1)
      .map { l =>
        val sp = l.indexOf(' ')
        require(sp > 0 && l.indexOf(' ', sp + 1) < 0,
          s"merges.txt line is not one space-separated pair: '$l'")
        (l.substring(0, sp), l.substring(sp + 1))
      }.toVector
    Model(enc.result(), merges).validated
  }

  /** [[load]] from files on local disk (driver-side, once per job). */
  def loadFiles(vocabPath: String, mergesPath: String): Model = {
    def slurp(p: String) = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
      java.nio.charset.StandardCharsets.UTF_8)
    load(slurp(vocabPath), slurp(mergesPath))
  }

  /** Serialize the vocab as GPT-2's `vocab.json` (ids ascending, JSON
    * string escaping via Jackson — byte-unit chars survive round-trip).
    */
  def exportVocabJson(model: Model): String = {
    val node = mapper.createObjectNode()
    model.encoder.toSeq.sortBy(_._2).foreach { case (t, i) => node.put(t, i) }
    mapper.writeValueAsString(node)
  }

  /** Serialize the merges as GPT-2's `merges.txt` (version header + one
    * pair per line in rank order).
    */
  def exportMergesTxt(model: Model): String =
    ("#version: 0.2" +: model.merges.map { case (a, b) => s"$a $b" })
      .mkString("\n") + "\n"

  /** Parse the MODERN single-file format — huggingface/tokenizers'
    * `tokenizer.json` (the file every HF `PreTrainedTokenizerFast`
    * ships): `model.type` must be `"BPE"`, `model.vocab` is the
    * token→id object, and `model.merges` is an array of either
    * `"a b"` strings (tokenizers < 0.20) or `["a", "b"]` pairs
    * (0.20+) — both published encodings accepted. Returns the model
    * plus the `added_tokens` contents flagged `special: true`, ready
    * for [[specialsOf]]/`addedTokens`-aware encoding. The
    * normalizer / pre_tokenizer / decoder specs are NOT interpreted —
    * this loader targets byte-level-BPE files whose pre-tokenization
    * is the GPT-2 convention [[preTokenize]] implements; a file
    * declaring some other scheme still loads, but encoding follows the
    * GPT-2 rules (same stance as the `.tiktoken` loader).
    */
  def loadTokenizerJson(json: String): (Model, Vector[String]) = {
    val root = mapper.readTree(json)
    val m = root.get("model")
    require(m != null && m.isObject, "tokenizer.json: missing model object")
    val tpe = Option(m.get("type")).map(_.asText()).getOrElse("")
    require(tpe == "BPE", s"tokenizer.json: model.type '$tpe' is not BPE")
    val vocabNode = m.get("vocab")
    require(vocabNode != null && vocabNode.isObject,
      "tokenizer.json: model.vocab must be an object")
    val enc = Map.newBuilder[String, Int]
    val it = vocabNode.fields()
    while (it.hasNext) {
      val e = it.next()
      enc += e.getKey -> e.getValue.asInt()
    }
    val mergesNode = m.get("merges")
    require(mergesNode != null && mergesNode.isArray,
      "tokenizer.json: model.merges must be an array")
    val merges = Vector.newBuilder[(String, String)]
    val mit = mergesNode.elements()
    while (mit.hasNext) {
      val n = mit.next()
      if (n.isArray) {
        require(n.size == 2,
          s"tokenizer.json: merge pair arity ${n.size}")
        merges += ((n.get(0).asText(), n.get(1).asText()))
      } else {
        val l = n.asText()
        val sp = l.indexOf(' ')
        require(sp > 0 && l.indexOf(' ', sp + 1) < 0,
          s"tokenizer.json: merge is not one space-separated pair: '$l'")
        merges += ((l.substring(0, sp), l.substring(sp + 1)))
      }
    }
    val specials = Vector.newBuilder[String]
    val added = root.get("added_tokens")
    if (added != null && added.isArray) {
      val ait = added.elements()
      while (ait.hasNext) {
        val a = ait.next()
        if (Option(a.get("special")).exists(_.asBoolean(false)))
          specials += a.get("content").asText()
      }
    }
    (Model(enc.result(), merges.result()).validated, specials.result())
  }

  /** [[loadTokenizerJson]] from a local file (driver-side). */
  def loadTokenizerJsonFile(path: String): (Model, Vector[String]) =
    loadTokenizerJson(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  /** Serialize as a minimal valid `tokenizer.json` (BPE model, merges
    * in the `"a b"` string form both tokenizers generations read,
    * `added_tokens` marked special). `loadTokenizerJson` round-trips
    * it exactly.
    */
  def exportTokenizerJson(model: Model,
                          specials: Seq[String] = Nil): String = {
    val root = mapper.createObjectNode()
    root.put("version", "1.0")
    val addedArr = root.putArray("added_tokens")
    specials.zipWithIndex.foreach { case (t, i) =>
      val a = addedArr.addObject()
      // an added token may already hold a vocab id (GPT-2 places
      // <|endoftext|> in the encoder); fresh ones append after it
      a.put("id", model.encoder.getOrElse(t, model.encoder.size + i))
      a.put("content", t)
      a.put("special", true)
      ()
    }
    val m = root.putObject("model")
    m.put("type", "BPE")
    val v = m.putObject("vocab")
    model.encoder.toSeq.sortBy(_._2).foreach { case (t, i) => v.put(t, i) }
    val ma = m.putArray("merges")
    model.merges.foreach { case (a, b) => ma.add(s"$a $b") }
    mapper.writeValueAsString(root)
  }

  /** Learn a byte-level model from a bounded corpus sample — the same
    * deterministic pair-frequency loop as [[Bpe.fit]], but over
    * case-preserving GPT-2 pre-tokens in byte-unit space (EVERY pre-token
    * trains, spaces riding their words as 'Ġ'). The id space is the
    * format's: byte units 0..255 in published order, one id per merge in
    * rank order, then `<|endoftext|>` last (as GPT-2 places it).
    */
  def fit(df: DataFrame, textCol: String, numMerges: Int = 200,
          sampleSize: Int = 2000, seed: Long = 42L): Model = {
    require(numMerges >= 1 && sampleSize >= 1)
    val rows = graft.ml.BoundedSample.rows(df, textCol, sampleSize, seed)
    val wordFreq = scala.collection.mutable.HashMap.empty[String, Long]
    rows.foreach { r =>
      val t = if (r.isNullAt(0)) "" else r.getString(0)
      preTokenize(t).foreach { w =>
        wordFreq.updateWith(toByteUnits(w)) { c => Some(c.getOrElse(0L) + 1L) }
      }
    }
    var words: Map[Vector[String], Long] = wordFreq.map { case (w, c) =>
      w.map(_.toString).toVector -> c
    }.toMap
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          pairs.updateWith((syms(i), syms(i + 1))) { x =>
            Some(x.getOrElse(0L) + c)
          }
          i += 1
        }
      }
      if (pairs.isEmpty) done = true
      else {
        val best = pairs.toSeq.maxBy { case ((a, b), c) => (c, a, b) }(
          Ordering.Tuple3(Ordering.Long, Ordering.String.reverse,
            Ordering.String.reverse))
        if (best._2 < 2) done = true
        else {
          val (a, b) = best._1
          merges += ((a, b))
          val merged = a + b
          words = words.map { case (syms, c) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
                out += merged; i += 2
              } else { out += syms(i); i += 1 }
            }
            out.result() -> c
          }.groupMapReduce(_._1)(_._2)(_ + _)
          m += 1
        }
      }
    }
    val ms = merges.result()
    val vocab = (byteUnitsInVocabOrder ++ ms.map { case (a, b) => a + b })
      .distinct :+ "<|endoftext|>"
    Model(vocab.zipWithIndex.toMap, ms).validated
  }

  /** Encode one text to token ids: GPT-2 pre-tokenize, map each pre-token
    * to byte units, run the shared greedy lowest-rank merge loop, look up
    * each resulting symbol. Total on a validated model — every byte has a
    * unit token, so nothing is ever dropped or unk'd.
    */
  def encodeIds(text: String, ranks: java.util.HashMap[String, Integer],
                ids: java.util.HashMap[String, Integer]): Array[Int] = {
    val out = new scala.collection.mutable.ArrayBuilder.ofInt
    encodeInto(text, ranks, ids, out)
    out.result()
  }

  private def encodeInto(text: String,
                         ranks: java.util.HashMap[String, Integer],
                         ids: java.util.HashMap[String, Integer],
                         out: scala.collection.mutable.ArrayBuilder.ofInt)
      : Unit =
    preTokenize(text).foreach { w =>
      val syms = scala.collection.mutable.ArrayBuffer.empty[String]
      toByteUnits(w).foreach(c => syms += c.toString)
      Bpe.mergeGreedy(syms, ranks)
      syms.foreach { s =>
        val i = ids.get(s)
        if (i == null) throw new IllegalStateException(
          s"gpt2 encode: symbol '$s' missing from a validated vocab")
        out += i.intValue
      }
    }

  /** Added tokens matched ATOMICALLY at encode time (HF `AddedToken` /
    * tiktoken `allowed_special` semantics): a literal longest-match-first
    * scan runs BEFORE pre-tokenization, each occurrence emitting the
    * token's single id; the text between matches is BPE'd independently,
    * so no pre-token or merge ever crosses an added-token boundary.
    * Without this, encoding a document that CONTAINS the literal string
    * `<|endoftext|>` splits it into ~7 pieces.
    */
  /** Build [[Gpt2Specials]] from the model vocab; tokens sorted
    * longest-first so that at a tied match position the longer added
    * token wins (HF behavior). Added tokens are given in SOURCE text
    * (the vocab lookup goes through [[toByteUnits]]).
    */
  def specialsOf(model: Model, added: Seq[String]): Gpt2Specials = {
    val sorted = added.distinct.sortBy(t => (-t.length, t)).toVector
    val resolved = sorted.map { t =>
      require(t.nonEmpty, "added token must be non-empty")
      model.encoder.getOrElse(toByteUnits(t),
        throw new IllegalArgumentException(
          s"added token '$t' is not in the vocab"))
    }
    Gpt2Specials(sorted, resolved)
  }

  /** [[encodeIds]] with added-token atomicity; `specials == null` is the
    * plain path (codegen passes null when no added tokens are set).
    */
  def encodeIdsSpecial(text: String,
                       ranks: java.util.HashMap[String, Integer],
                       ids: java.util.HashMap[String, Integer],
                       specials: Gpt2Specials): Array[Int] = {
    if (specials == null) return encodeIds(text, ranks, ids)
    val out = new scala.collection.mutable.ArrayBuilder.ofInt
    foreachSegment(text, specials)(
      seg => encodeInto(seg, ranks, ids, out), id => out += id)
    out.result()
  }

  /** [[countTokens]] with added-token atomicity (1 token per match). */
  def countTokensSpecial(text: String,
                         ranks: java.util.HashMap[String, Integer],
                         specials: Gpt2Specials): Long = {
    if (specials == null) return countTokens(text, ranks)
    var n = 0L
    foreachSegment(text, specials)(
      seg => n += countTokens(seg, ranks), _ => n += 1L)
    n
  }

  /** Walk `text` left-to-right: plain segments between added-token
    * occurrences go to `onSegment`, matches (earliest position wins;
    * ties go to the longest token, which sorts first) to `onSpecial`.
    */
  private def foreachSegment(text: String, specials: Gpt2Specials)
      (onSegment: String => Unit, onSpecial: Int => Unit): Unit = {
    var pos = 0
    while (pos < text.length) {
      var bestStart = -1
      var bestIdx = -1
      var i = 0
      while (i < specials.tokens.length) {
        val s = text.indexOf(specials.tokens(i), pos)
        if (s >= 0 && (bestStart < 0 || s < bestStart)) {
          bestStart = s; bestIdx = i
        }
        i += 1
      }
      if (bestStart < 0) {
        onSegment(text.substring(pos)); pos = text.length
      } else {
        if (bestStart > pos) onSegment(text.substring(pos, bestStart))
        onSpecial(specials.ids(bestIdx))
        pos = bestStart + specials.tokens(bestIdx).length
      }
    }
  }

  /** Token count under the model (same walk as [[encodeIds]]). */
  def countTokens(text: String, ranks: java.util.HashMap[String, Integer])
      : Long = {
    var n = 0L
    preTokenize(text).foreach { w =>
      val syms = scala.collection.mutable.ArrayBuffer.empty[String]
      toByteUnits(w).foreach(c => syms += c.toString)
      Bpe.mergeGreedy(syms, ranks)
      n += syms.length
    }
    n
  }

  /** LOSSLESS decode: ids -> token strings -> byte units -> UTF-8. The
    * round-trip law `decode(encodeIds(t)) == t` holds for every string
    * (whitespace, case, emoji — byte-level's point).
    */
  def decode(tokenIds: Seq[Int], model: Model): String = {
    val sb = new java.lang.StringBuilder
    tokenIds.foreach { id =>
      val t = model.decoder.getOrElse(id,
        throw new IllegalArgumentException(s"unknown token id $id"))
      sb.append(t)
    }
    fromByteUnits(sb.toString)
  }

  /** [[encodeIdsSpecial]] boxed as Catalyst array data (codegen entry
    * point; `specials` null when no added tokens are configured).
    */
  def encodeIdsData(text: String, ranks: java.util.HashMap[String, Integer],
                    ids: java.util.HashMap[String, Integer],
                    specials: Gpt2Specials)
      : org.apache.spark.sql.catalyst.util.ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(encodeIdsSpecial(text, ranks, ids, specials))

  /** Token-id array column (codegen'd per-row; `array<int>`). Pass
    * `addedTokens` (e.g. `Seq("<|endoftext|>")`) to encode those literal
    * strings as single atomic ids instead of BPE pieces.
    */
  def encode(text: Column, model: Model,
             addedTokens: Seq[String] = Nil): Column =
    toColumn(Gpt2Encode(expression(text), model,
      if (addedTokens.isEmpty) None else Some(specialsOf(model, addedTokens))))

  /** Token count column (codegen'd per-row). */
  def tokenCount(text: Column, model: Model,
                 addedTokens: Seq[String] = Nil): Column =
    toColumn(Gpt2TokenCount(expression(text), model,
      if (addedTokens.isEmpty) None else Some(specialsOf(model, addedTokens))))

  /** The id <-> token table as a DataFrame: `(token_id, token)`. */
  def vocabDf(spark: org.apache.spark.sql.SparkSession,
              model: Model): DataFrame = {
    import spark.implicits._
    model.encoder.toSeq.sortBy(_._2).map(_.swap).toDF("token_id", "token")
      .select(col("token_id"), col("token"))
  }
}

/** Codegen'd byte-level BPE id encoding (see [[Gpt2Bpe.encodeIds]]):
  * rank and id tables ride the expression as reference objects.
  */
case class Gpt2Encode(child: Expression, model: Gpt2Bpe.Model,
                      specials: Option[Gpt2Specials] = None)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes() =
    graft.plans.expressions.stringCheck(child, "gpt2_encode")

  override def nullSafeEval(input: Any): Any =
    Gpt2Bpe.encodeIdsData(input.asInstanceOf[UTF8String].toString,
      model.ranks, model.ids, specials.orNull)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranks = ctx.addReferenceObj("gpt2Ranks", model.ranks,
      "java.util.HashMap")
    val ids = ctx.addReferenceObj("gpt2Ids", model.ids,
      "java.util.HashMap")
    val sp = specials.map(s => ctx.addReferenceObj("gpt2Specials", s,
      "graft.text.Gpt2Specials")).getOrElse(
      "((graft.text.Gpt2Specials) null)")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.text.Gpt2Bpe.encodeIdsData($c.toString(), $ranks, $ids, $sp);")
  }

  override protected def withNewChildInternal(c: Expression): Gpt2Encode =
    copy(child = c)
}

/** Codegen'd byte-level BPE token count (see [[Gpt2Bpe.countTokens]]). */
case class Gpt2TokenCount(child: Expression, model: Gpt2Bpe.Model,
                          specials: Option[Gpt2Specials] = None)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    graft.plans.expressions.stringCheck(child, "gpt2_token_count")

  override def nullSafeEval(input: Any): Any =
    Gpt2Bpe.countTokensSpecial(input.asInstanceOf[UTF8String].toString,
      model.ranks, specials.orNull)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranks = ctx.addReferenceObj("gpt2Ranks", model.ranks,
      "java.util.HashMap")
    val sp = specials.map(s => ctx.addReferenceObj("gpt2Specials", s,
      "graft.text.Gpt2Specials")).getOrElse(
      "((graft.text.Gpt2Specials) null)")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.text.Gpt2Bpe.countTokensSpecial($c.toString(), $ranks, $sp);")
  }

  override protected def withNewChildInternal(c: Expression): Gpt2TokenCount =
    copy(child = c)
}

/** Added tokens for atomic matching at encode time, longest-first.
  * Top-level (not nested in the `Gpt2Bpe` object) so codegen can name
  * the type in Java source; build via [[Gpt2Bpe.specialsOf]].
  */
final case class Gpt2Specials(tokens: Vector[String], ids: Vector[Int]) {
  require(tokens.nonEmpty && tokens.length == ids.length,
    "specials: tokens and ids must be parallel and non-empty")
}
