package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumnBridge.{column => toColumn, expression}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL byte-pair encoding (Sennrich et al. 2016, the tokenization every
  * modern LLM pipeline budgets by): merge rules are LEARNED from corpus
  * pair frequencies on a bounded driver-side sample (the standard
  * offline recipe — same shape as [[graft.ml.IvfIndex.fit]]), then
  * applied per document by a codegen'd kernel expression — greedy
  * lowest-merge-rank pairing, the actual BPE algorithm, not a
  * regex approximation ([[TextAnalysis.tokenCountBpe]] stays as the
  * cheap pre-tokenizer count).
  *
  * Scale shape: training is one bounded sample collect; encoding is a
  * pure per-row expression (merge table rides the closure, reaching
  * generated code as a reference object) — no joins, no shuffle, no
  * per-row driver work, so the encoder runs at scan speed on 100 TB.
  *
  * Word pre-tokenization: lowercased maximal letter runs and digit runs
  * (each non-space symbol is its own token and never merges — the
  * GPT-2-style boundary that keeps punctuation out of words); words are
  * sequences of single characters plus a terminal `</w>` marker, the
  * classic BPE word-end convention.
  */
object Bpe {

  final case class Model(merges: Vector[(String, String)],
                         baseSymbols: Vector[String] = Vector.empty) {
    /** rank map: pair -> priority (lower merges first) */
    @transient lazy val ranks: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer]()
      merges.zipWithIndex.foreach { case ((a, b), i) => m.put(a + "\u0000" + b, i) }
      m
    }

    /** id -> token. Id space: 0 = `<unk>`, then the sorted base symbols
      * recorded at fit time (every single character seen in the sample,
      * plus `</w>`), then one token per merge in rank order. `distinct`
      * keeps the FIRST occurrence, so the rare case of two merge paths
      * producing the same surface string yields one id (ids must be a
      * function of the token string - a training pipeline embeds by id).
      */
    @transient lazy val vocab: Vector[String] =
      (Unk +: (baseSymbols ++ merges.map { case (a, b) => a + b })).distinct

    /** token -> id (inverse of [[vocab]]). */
    @transient lazy val ids: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer]()
      vocab.zipWithIndex.foreach { case (t, i) => m.put(t, i) }
      m
    }
  }

  /** Id 0: any symbol outside the trained vocabulary (a character the
    * fit sample never saw).
    */
  val Unk = "<unk>"

  private[text] val EndOfWord = "</w>"

  /** Lowercased letter/digit-run pre-tokens of one text (symbols are
    * single-char tokens, excluded from merge training and from word
    * encoding — they count as one BPE token each).
    */
  private[text] def preTokens(text: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val s = text.toLowerCase(java.util.Locale.ROOT)
    var i = 0
    val sb = new StringBuilder
    var mode = 0 // 0 none, 1 letters, 2 digits
    def flush(): Unit = { if (sb.nonEmpty) { out += sb.toString; sb.clear() }; mode = 0 }
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val isL = Character.isLetter(cp)
      val isD = cp >= '0' && cp <= '9'
      if (isL) { if (mode != 1) flush(); mode = 1; sb.appendAll(Character.toChars(cp)) }
      else if (isD) { if (mode != 2) flush(); mode = 2; sb.appendAll(Character.toChars(cp)) }
      else {
        flush()
        if (!Character.isWhitespace(cp)) out += new String(Character.toChars(cp))
      }
      i += Character.charCount(cp)
    }
    flush()
    out.toSeq
  }

  private def isWordToken(t: String): Boolean =
    t.length > 0 && (Character.isLetter(t.codePointAt(0)) ||
      (t.charAt(0) >= '0' && t.charAt(0) <= '9'))

  /** Learn `numMerges` merge rules from a bounded corpus sample:
    * classic BPE training — count adjacent symbol pairs across all
    * words (weighted by word frequency), repeatedly merge the most
    * frequent pair (ties broken lexicographically, so training is
    * DETERMINISTIC for a given sample).
    */
  def fit(df: DataFrame, textCol: String, numMerges: Int = 200,
          sampleSize: Int = 2000, seed: Long = 42L): Model = {
    require(numMerges >= 1 && sampleSize >= 1)
    val rows = graft.ml.BoundedSample.rows(df, textCol, sampleSize, seed)
    // word frequency over the sample, words as symbol vectors + </w>;
    // base symbols = every single character the sample surfaces (word
    // chars AND standalone symbol chars) + the end-of-word marker -
    // sorted, so the id space is deterministic for a given sample
    val wordFreq = scala.collection.mutable.HashMap.empty[String, Long]
    val baseSyms = scala.collection.mutable.TreeSet.empty[String]
    baseSyms += EndOfWord
    rows.foreach { r =>
      val t = if (r.isNullAt(0)) "" else r.getString(0)
      preTokens(t).foreach { w =>
        w.foreach(c => baseSyms += c.toString)
        if (isWordToken(w))
          wordFreq.updateWith(w) { c => Some(c.getOrElse(0L) + 1L) }
      }
    }
    var words: Map[Vector[String], Long] = wordFreq.map { case (w, c) =>
      (w.map(_.toString).toVector :+ EndOfWord) -> c
    }.toMap
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          pairs.updateWith((syms(i), syms(i + 1))) { x => Some(x.getOrElse(0L) + c) }
          i += 1
        }
      }
      if (pairs.isEmpty) done = true
      else {
        val best = pairs.toSeq.maxBy { case ((a, b), c) => (c, a, b) }(
          Ordering.Tuple3(Ordering.Long, Ordering.String.reverse,
            Ordering.String.reverse))
        if (best._2 < 2) done = true // nothing repeats: no signal left
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
    Model(merges.result(), baseSyms.toVector)
  }

  /** Encode one word (symbol vector with `</w>`) under the merge ranks:
    * repeatedly merge the adjacent pair with the LOWEST rank — the
    * actual BPE inference loop.
    */
  private[text] def encodeWordSyms(word: String,
      ranks: java.util.HashMap[String, Integer])
      : scala.collection.mutable.ArrayBuffer[String] = {
    val syms = scala.collection.mutable.ArrayBuffer.empty[String]
    word.foreach(c => syms += c.toString)
    syms += EndOfWord
    mergeGreedy(syms, ranks)
    syms
  }

  /** The greedy merge loop shared by the char-level ([[encodeWordSyms]])
    * and byte-level ([[Gpt2Bpe]]) encoders: repeatedly merge the adjacent
    * pair with the LOWEST rank until none ranks. One-occurrence-at-a-time
    * is equivalent to merge-all-occurrences for any TRAINED merge list: a
    * pair involving a merge's product always ranks after that merge (the
    * product didn't exist earlier), so a newly-formed pair can never
    * preempt remaining occurrences of the current minimum.
    */
  private[text] def mergeGreedy(
      syms: scala.collection.mutable.ArrayBuffer[String],
      ranks: java.util.HashMap[String, Integer]): Unit = {
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestI = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(syms(i) + "\u0000" + syms(i + 1))
        if (r != null && r < bestRank) { bestRank = r; bestI = i }
        i += 1
      }
      if (bestI < 0) continue = false
      else {
        syms(bestI) = syms(bestI) + syms(bestI + 1)
        syms.remove(bestI + 1)
        if (syms.length < 2) continue = false
      }
    }
  }

  private[text] def encodeWord(word: String,
                               ranks: java.util.HashMap[String, Integer]): Int =
    encodeWordSyms(word, ranks).length

  /** BPE token count of one text under the model: word tokens encode
    * through the merge loop; symbol tokens count 1 each.
    */
  def countTokens(text: String,
                  ranks: java.util.HashMap[String, Integer]): Long = {
    var n = 0L
    preTokens(text).foreach { t =>
      n += (if (isWordToken(t)) encodeWord(t, ranks) else 1)
    }
    n
  }

  /** Encode one text to token IDS under the model: the artifact a
    * training pipeline actually ships. Word tokens run the greedy merge
    * loop and emit one id per resulting symbol; standalone symbol tokens
    * emit their own id; anything outside the trained vocabulary is
    * [[Unk]] (id 0). `countTokens(t) == encodeIds(t).length` always -
    * both walk the same merge loop.
    */
  def encodeIds(text: String, ranks: java.util.HashMap[String, Integer],
                ids: java.util.HashMap[String, Integer]): Array[Int] = {
    val out = new scala.collection.mutable.ArrayBuilder.ofInt
    def idOf(t: String): Int = {
      val i = ids.get(t); if (i == null) 0 else i.intValue
    }
    preTokens(text).foreach { t =>
      if (isWordToken(t)) encodeWordSyms(t, ranks).foreach(sym => out += idOf(sym))
      else out += idOf(t)
    }
    out.result()
  }

  /** [[encodeIds]] boxed as Catalyst array data (codegen entry point). */
  def encodeIdsData(text: String, ranks: java.util.HashMap[String, Integer],
                    ids: java.util.HashMap[String, Integer])
      : org.apache.spark.sql.catalyst.util.ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(encodeIds(text, ranks, ids))

  /** Decode ids back to the PRE-TOKEN sequence (the tokenizer's normal
    * form: lowercased words and standalone symbols — whitespace and case
    * are lossy by design, as in any BPE pre-tokenizer). Sub-word pieces
    * accumulate until an end-of-word token closes the word; the
    * round-trip law `decodeTokens(encodeIds(t)) == preTokens(t)` holds
    * for any text whose characters the fit sample saw.
    */
  def decodeTokens(tokenIds: Seq[Int], model: Model): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val word = new StringBuilder
    def flushWord(): Unit =
      if (word.nonEmpty) { out += word.toString; word.clear() }
    tokenIds.foreach { id =>
      val tok =
        if (id >= 0 && id < model.vocab.length) model.vocab(id) else Unk
      if (tok == Unk) { flushWord(); out += Unk }
      else if (tok.endsWith(EndOfWord)) {
        word ++= tok.dropRight(EndOfWord.length); flushWord()
      } else if (isWordToken(tok)) word ++= tok
      else { flushWord(); out += tok } // standalone symbol
    }
    flushWord()
    out.toSeq
  }

  /** Token count column under a trained model (codegen'd, per-row). */
  def tokenCount(text: Column, model: Model): Column =
    toColumn(BpeTokenCount(expression(text), model))

  /** Token-id array column under a trained model (codegen'd, per-row;
    * `array<int>`, never null elements).
    */
  def encode(text: Column, model: Model): Column =
    toColumn(BpeEncode(expression(text), model))

  /** The id <-> token table as a DataFrame: `(token_id, token)`. */
  def vocabDf(spark: org.apache.spark.sql.SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    model.vocab.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("token_id", "token")
  }

  /** The learned merge rules as a DataFrame: `(rank, left, right)`. */
  def mergesDf(spark: org.apache.spark.sql.SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    model.merges.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("rank", "left", "right")
  }

  /** Per-document BPE token counts: `(idCol, n_tokens_bpe)`. */
  def withTokenCounts(df: DataFrame, idCol: String, textCol: String,
                      model: Model): DataFrame =
    df.select(col(idCol), tokenCount(col(textCol), model).as("n_tokens_bpe"))
}

/** Codegen'd BPE token count: the merge-rank table rides the expression
  * and reaches generated code as a reference object.
  */
case class BpeTokenCount(child: Expression, model: Bpe.Model)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    graft.plans.expressions.stringCheck(child, "bpe_token_count")

  override def nullSafeEval(input: Any): Any =
    Bpe.countTokens(input.asInstanceOf[UTF8String].toString, model.ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranks = ctx.addReferenceObj("bpeRanks", model.ranks,
      "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.text.Bpe.countTokens($c.toString(), $ranks);")
  }

  override protected def withNewChildInternal(c: Expression): BpeTokenCount =
    copy(child = c)
}

/** Codegen'd BPE id encoding: `text -> array<int>` under the model's
  * merge ranks and vocabulary (both ride the expression as reference
  * objects — no join, no shuffle; the encoder runs at scan speed).
  */
case class BpeEncode(child: Expression, model: Bpe.Model)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes() =
    graft.plans.expressions.stringCheck(child, "bpe_encode")

  override def nullSafeEval(input: Any): Any =
    Bpe.encodeIdsData(input.asInstanceOf[UTF8String].toString,
      model.ranks, model.ids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranks = ctx.addReferenceObj("bpeRanks", model.ranks,
      "java.util.HashMap")
    val ids = ctx.addReferenceObj("bpeIds", model.ids,
      "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.text.Bpe.encodeIdsData($c.toString(), $ranks, $ids);")
  }

  override protected def withNewChildInternal(c: Expression): BpeEncode =
    copy(child = c)
}
