package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumnBridge.{column => toColumn, expression}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece tokenization in the public BERT interchange format (Devlin
  * et al. 2019; the one-token-per-line `vocab.txt` every BERT checkpoint
  * ships, id = line number): BERT's BasicTokenizer pre-tokenization —
  * optional lowercasing with accent stripping (NFD, drop combining
  * marks), whitespace split, punctuation split off as single-char
  * tokens — followed by the published greedy longest-match-first
  * WordPiece loop: continuation pieces carry the `##` prefix; a word
  * with no possible segmentation, or longer than `maxInputChars`,
  * becomes the `[UNK]` token. Decode re-joins pieces and strips `##`
  * joints — LOSSY by design (case folding, accent stripping and `[UNK]`
  * lose information), unlike [[Gpt2Bpe]]'s byte-level encoding and
  * exactly like the published tokenizer.
  *
  * Two ways to get a model:
  *  - [[load]] / [[loadFiles]] a PRETRAINED vocabulary from its
  *    published `vocab.txt`, so token budgets match a real BERT-family
  *    trainer;
  *  - [[fit]] a BASELINE vocabulary on the corpus (full character
  *    coverage + the most frequent whole words — NOT the BERT
  *    likelihood trainer, which needs a seed corpus LM; documented as
  *    such) and [[exportVocabTxt]] it in the same format.
  *
  * Scale shape, as [[Bpe]]/[[Gpt2Bpe]]: loading/fitting is driver-side
  * and bounded; encoding is a codegen'd per-row expression (the vocab
  * table rides the closure as a reference object) — no joins, no
  * shuffle, scan speed at any corpus size.
  *
  * Semantics reference: google-research/bert `tokenization.py` (public),
  * Hugging Face tokenizers WordPiece docs. The reference repo has no
  * tokenizer; this is part of the training-data-pipeline surface the
  * brief adds.
  */
object WordPiece {

  /** A WordPiece vocabulary. `vocab` maps token → id (continuation
    * pieces carry their `##` prefix, as in the published file).
    */
  final case class Model(vocab: Map[String, Int],
                         unkToken: String = "[UNK]",
                         maxInputChars: Int = 100,
                         lowerCase: Boolean = true) {
    require(vocab.nonEmpty, "WordPiece vocab must be non-empty")
    require(vocab.contains(unkToken),
      s"vocab must contain the unk token '$unkToken'")
    require(maxInputChars > 0,
      s"maxInputChars must be positive, got $maxInputChars")

    /** Codegen-friendly lookup table (built once per model). */
    @transient lazy val table: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](vocab.size * 2)
      vocab.foreach { case (t, i) => m.put(t, Integer.valueOf(i)) }
      m
    }
    @transient lazy val unkId: Int = vocab(unkToken)
    @transient lazy val inverse: Map[Int, String] = vocab.map(_.swap)

    /** Fail fast on duplicate ids (a malformed vocab.txt). */
    def validated: Model = {
      require(vocab.values.toSet.size == vocab.size,
        "vocab has duplicate ids — not a valid one-token-per-line file")
      this
    }
  }

  /** Parse the public `vocab.txt` format: one token per line, id = line
    * number (0-based). Blank trailing lines are ignored, interior
    * tokens are kept verbatim (the published files contain no blanks).
    */
  def load(vocabTxt: String, unkToken: String = "[UNK]",
           maxInputChars: Int = 100, lowerCase: Boolean = true): Model = {
    val toks = vocabTxt.split("\n", -1).iterator
      .map(_.stripSuffix("\r")).toVector
    val trimmed = toks.reverse.dropWhile(_.isEmpty).reverse
    require(trimmed.nonEmpty, "vocab.txt is empty")
    require(trimmed.forall(_.nonEmpty),
      "vocab.txt has an interior blank line — ids would shift")
    require(trimmed.distinct.size == trimmed.size,
      "vocab.txt has duplicate tokens")
    Model(trimmed.zipWithIndex.toMap, unkToken, maxInputChars, lowerCase)
      .validated
  }

  /** [[load]] from a file on local disk (driver-side, once per job). */
  def loadFiles(vocabPath: String, unkToken: String = "[UNK]",
                maxInputChars: Int = 100, lowerCase: Boolean = true): Model =
    load(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(vocabPath)),
      java.nio.charset.StandardCharsets.UTF_8),
      unkToken, maxInputChars, lowerCase)

  /** Serialize as the public `vocab.txt` (ids must be dense 0..n-1 —
    * they are for loaded and fitted models).
    */
  def exportVocabTxt(model: Model): String = {
    val byId = model.vocab.toSeq.sortBy(_._2)
    require(byId.map(_._2) == byId.indices.map(identity),
      "vocab ids are not dense 0..n-1 — cannot serialize as vocab.txt")
    byId.map(_._1).mkString("\n") + "\n"
  }

  /** Fit a BASELINE vocabulary on the corpus: `[UNK]`, then every
    * single character observed ANYWHERE in the corpus (word-initial and
    * `##`-continuation forms — the inventory comes from a full-corpus
    * distinct-characters aggregation, not just the top-`vocabSize`
    * words, so a rare word made of characters the frequent words never
    * use still tokenizes without `[UNK]`; the only `[UNK]` a fitted
    * model can emit on its own corpus is a word longer than
    * `maxInputChars`), then the most frequent whole words (count desc,
    * word asc — deterministic) until `vocabSize`. This is the standard
    * baseline, not BERT's likelihood-scored trainer; the point is a
    * model that round-trips through the public format and yields stable
    * token budgets.
    *
    * Both aggregations are distributed: the character inventory is a
    * per-document `array_distinct` then a global distinct (bounded by
    * the alphabet, not the corpus), and only the top `vocabSize` word
    * rows reach the driver (TakeOrderedAndProject).
    */
  def fit(df: DataFrame, textCol: String, vocabSize: Int = 8192,
          maxInputChars: Int = 100, lowerCase: Boolean = true): Model = {
    require(vocabSize >= 2, s"vocabSize must be >= 2, got $vocabSize")
    val spark = df.sparkSession
    val words = df.select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .select((if (lowerCase) lower(col("w")) else col("w")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(vocabSize)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // FULL-corpus character inventory, basic-tokenized the same way
    // encode will (case fold, clean-text strip), so the char vocab
    // covers every character wordpiece can actually see — not only the
    // ones the top-vocabSize words happen to contain
    val corpusChars = df
      .select(explode(array_distinct(split(col(textCol), ""))).as("c"))
      .filter(length(col("c")) > 0)
      .distinct().collect().map(_.getString(0))
    val chars = scala.collection.mutable.SortedSet.empty[Char]
    corpusChars.foreach { s =>
      basicTokens(s, lowerCase).foreach(t => t.foreach(chars += _))
    }
    val b = Vector.newBuilder[String]
    b += "[UNK]"
    chars.foreach(c => b += c.toString)
    chars.foreach(c => b += s"##$c")
    val sofar = scala.collection.mutable.LinkedHashSet(b.result(): _*)
    words.iterator
      .flatMap { case (w, _) => basicTokens(w, lowerCase) }
      .foreach { t =>
        if (sofar.size < vocabSize && t.length <= maxInputChars &&
          !sofar.contains(t)) sofar += t
      }
    Model(sofar.toVector.zipWithIndex.toMap, "[UNK]",
      maxInputChars, lowerCase).validated
  }

  // ---------------------------------------------------------------- core

  private def isBertPunct(c: Char): Boolean = {
    // bert tokenization.py _is_punctuation: ASCII symbol ranges OR any
    // Unicode P* category
    (c >= 33 && c <= 47) || (c >= 58 && c <= 64) ||
      (c >= 91 && c <= 96) || (c >= 123 && c <= 126) || {
      val t = Character.getType(c)
      t == Character.CONNECTOR_PUNCTUATION || t == Character.DASH_PUNCTUATION ||
        t == Character.START_PUNCTUATION || t == Character.END_PUNCTUATION ||
        t == Character.INITIAL_QUOTE_PUNCTUATION ||
        t == Character.FINAL_QUOTE_PUNCTUATION ||
        t == Character.OTHER_PUNCTUATION
    }
  }

  /** BERT BasicTokenizer over one input: whitespace split, optional
    * lowercase + accent strip (NFD, drop Mn), punctuation split off as
    * single-char tokens.
    */
  private[text] def basicTokens(text: String,
                                lowerCase: Boolean): Vector[String] = {
    val prepared =
      if (!lowerCase) text
      else {
        val nfd = java.text.Normalizer.normalize(text.toLowerCase,
          java.text.Normalizer.Form.NFD)
        val sb = new java.lang.StringBuilder(nfd.length)
        var i = 0
        while (i < nfd.length) {
          val c = nfd.charAt(i)
          if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
          i += 1
        }
        sb.toString
      }
    val out = Vector.newBuilder[String]
    val cur = new java.lang.StringBuilder
    def flush(): Unit = if (cur.length > 0) { out += cur.toString; cur.setLength(0) }
    var i = 0
    while (i < prepared.length) {
      val c = prepared.charAt(i)
      if (Character.isWhitespace(c)) flush()
      else if (isBertPunct(c)) { flush(); out += c.toString }
      else cur.append(c)
      i += 1
    }
    flush()
    out.result()
  }

  /** The published greedy longest-match-first loop for one word;
    * appends ids to `acc`. Returns the number of ids appended.
    */
  private def wordpiece(word: String,
                        table: java.util.HashMap[String, Integer],
                        unkId: Int, maxInputChars: Int,
                        acc: java.util.ArrayList[Integer]): Unit = {
    if (word.length > maxInputChars) { acc.add(Integer.valueOf(unkId)); return }
    val mark = acc.size()
    var start = 0
    var bad = false
    while (!bad && start < word.length) {
      var end = word.length
      var cur: Integer = null
      while (cur == null && start < end) {
        val piece =
          if (start == 0) word.substring(start, end)
          else "##" + word.substring(start, end)
        cur = table.get(piece)
        if (cur == null) end -= 1
      }
      if (cur == null) bad = true
      else { acc.add(cur); start = end }
    }
    if (bad) {
      // no segmentation: the WHOLE word becomes [UNK] (published rule)
      while (acc.size() > mark) acc.remove(acc.size() - 1)
      acc.add(Integer.valueOf(unkId))
    }
  }

  /** Full encode of one row (kernel entry point for codegen — public
    * so Janino can call it).
    */
  def encodeData(input: UTF8String,
                 table: java.util.HashMap[String, Integer],
                 unkId: Int, maxInputChars: Int,
                 lowerCase: Boolean): GenericArrayData = {
    val acc = new java.util.ArrayList[Integer]()
    basicTokens(input.toString, lowerCase)
      .foreach(w => wordpiece(w, table, unkId, maxInputChars, acc))
    val out = new Array[Any](acc.size())
    var i = 0
    while (i < out.length) { out(i) = acc.get(i).intValue(); i += 1 }
    new GenericArrayData(out)
  }

  /** Token count of one row (kernel entry point for codegen). */
  def countData(input: UTF8String,
                table: java.util.HashMap[String, Integer],
                unkId: Int, maxInputChars: Int, lowerCase: Boolean): Long =
    encodeData(input, table, unkId, maxInputChars, lowerCase).numElements().toLong

  /** Decode an id sequence: pieces joined with single spaces, `##`
    * joints fused. Unknown ids raise (they cannot appear in this
    * model's output).
    */
  def decode(ids: Seq[Int], model: Model): String = {
    val sb = new java.lang.StringBuilder
    ids.foreach { id =>
      val t = model.inverse.getOrElse(id,
        throw new IllegalArgumentException(s"id $id is not in the vocab"))
      if (t.startsWith("##")) sb.append(t.substring(2))
      else {
        if (sb.length > 0) sb.append(' ')
        sb.append(t)
      }
    }
    sb.toString
  }

  // ------------------------------------------------------------- columns

  /** Token-id array column (codegen'd per-row; `array<int>`). */
  def encode(text: Column, model: Model): Column =
    toColumn(WordPieceEncode(expression(text), model))

  /** Token count column (codegen'd per-row). */
  def tokenCount(text: Column, model: Model): Column =
    toColumn(WordPieceCount(expression(text), model))

  /** The id <-> token table as a DataFrame: `(token_id, token)`. */
  def vocabDf(spark: org.apache.spark.sql.SparkSession,
              model: Model): DataFrame = {
    import spark.implicits._
    model.vocab.toSeq.sortBy(_._2).map(_.swap).toDF("token_id", "token")
  }
}

/** Codegen'd WordPiece id encoding (see [[WordPiece.encodeData]]): the
  * vocab table rides the expression as a reference object.
  */
case class WordPieceEncode(child: Expression, model: WordPiece.Model)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes() =
    graft.plans.expressions.stringCheck(child, "wordpiece_encode")

  override def nullSafeEval(input: Any): Any =
    WordPiece.encodeData(input.asInstanceOf[UTF8String], model.table,
      model.unkId, model.maxInputChars, model.lowerCase)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val table = ctx.addReferenceObj("wpTable", model.table,
      "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.text.WordPiece.encodeData($c, $table,
         |  ${model.unkId}, ${model.maxInputChars}, ${model.lowerCase});""".stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): WordPieceEncode =
    copy(child = c)
}

/** Codegen'd WordPiece token count (see [[WordPiece.countData]]). */
case class WordPieceCount(child: Expression, model: WordPiece.Model)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    graft.plans.expressions.stringCheck(child, "wordpiece_count")

  override def nullSafeEval(input: Any): Any =
    WordPiece.countData(input.asInstanceOf[UTF8String], model.table,
      model.unkId, model.maxInputChars, model.lowerCase)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val table = ctx.addReferenceObj("wpTable", model.table,
      "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.text.WordPiece.countData($c, $table,
         |  ${model.unkId}, ${model.maxInputChars}, ${model.lowerCase});""".stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): WordPieceCount =
    copy(child = c)
}
