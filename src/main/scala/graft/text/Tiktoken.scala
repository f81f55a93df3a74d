package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge.{column => toColumn, expression}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BYTE-LEVEL BPE in the public `.tiktoken` interchange format (OpenAI
  * `tiktoken`, MIT-licensed; the `cl100k_base.tiktoken`-style file every
  * current-generation tokenizer ships): one `base64(token_bytes) rank`
  * line per token, where the RANK IS the token id AND the merge
  * priority. Unlike the GPT-2 `vocab.json`+`merges.txt` pair
  * ([[Gpt2Bpe]]), there is no explicit merge list — the encode loop
  * merges whichever adjacent pair's CONCATENATION holds the lowest rank
  * in the table (tiktoken's published algorithm, `_educational.py`).
  *
  * Same byte-level guarantees as [[Gpt2Bpe]]: every input is encodable
  * with no `<unk>` as long as all 256 single bytes are ranked (validated
  * on load — true of every published table), and decode is LOSSLESS.
  * Tokens are held internally in [[Gpt2Bpe.byteToChar]] byte-unit space
  * so the two formats share their machinery; the file format speaks raw
  * bytes via base64.
  *
  * Pre-tokenization: published patterns are per-model; [[Cl100kPattern]]
  * is cl100k_base's (contractions case-insensitive, number runs split at
  * 3 digits, possessive quantifiers — Java regex supports both).
  * [[load]]/[[fromGpt2]] take the pattern so a table rides with the
  * regex the checkpoint was trained with.
  *
  * Scale shape, as the other tokenizers: loading is driver-side and
  * bounded; encoding is a codegen'd per-row expression (the rank table
  * rides the closure as a reference object) — no joins, no shuffle,
  * scan speed at 100 TB.
  *
  * Semantics reference: openai/tiktoken `tiktoken/_educational.py` and
  * `tiktoken/load.py` (both public). The reference repo has no
  * tokenizer; this is part of the training-data-pipeline surface the
  * brief adds.
  */
object Tiktoken {

  /** cl100k_base's published pre-tokenization regex (tiktoken
    * `tiktoken_ext/openai_public.py`): case-insensitive contractions,
    * letter runs with one optional non-letter prefix char, number runs
    * of AT MOST 3 digits, symbol runs swallowing trailing newlines,
    * whitespace handling. Possessive quantifiers (`?+`, `++`) are kept —
    * Java regex supports them natively.
    */
  val Cl100kPattern: String =
    """'(?i:[sdmt]|ll|ve|re)|[^\r\n\p{L}\p{N}]?+\p{L}+|\p{N}{1,3}| ?[^\s\p{L}\p{N}]++[\r\n]*|\s*[\r\n]|\s+(?!\S)|\s+"""

  /** GPT-2's published pattern, for tables converted via [[fromGpt2]]
    * (a converted table must keep the regex its merges were learned
    * under, or token boundaries shift).
    */
  val Gpt2Pattern: String =
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""

  /** A loaded rank table: `ranks` keys are tokens in BYTE-UNIT space
    * ([[Gpt2Bpe.toByteUnits]] of the raw token bytes), values the
    * rank = id. `pattern` is the pre-tokenization regex the table was
    * trained with.
    */
  final case class Table(ranks: Map[String, Int], pattern: String) {
    @transient lazy val ids: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer]()
      ranks.foreach { case (t, r) => m.put(t, r) }
      m
    }
    @transient lazy val compiled: java.util.regex.Pattern =
      java.util.regex.Pattern.compile(pattern,
        java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)
    @transient lazy val decoder: Map[Int, String] =
      ranks.map { case (t, r) => r -> t }

    /** Every published table ranks all 256 single bytes — what makes
      * every input encodable. Enforced here so encode can never strand
      * an unmergeable byte.
      */
    def validated: Table = {
      var b = 0
      while (b < 256) {
        val unit = Gpt2Bpe.byteToChar(b).toString
        require(ranks.contains(unit),
          s"tiktoken table is missing single-byte token 0x${b.toHexString}" +
            " — every byte must be encodable")
        b += 1
      }
      require(ranks.values.toSet.size == ranks.size,
        "tiktoken table has duplicate ranks — rank is the id, ids must be unique")
      this
    }
  }

  /** Parse the `.tiktoken` format: one `base64 rank` pair per line,
    * blank lines ignored (tiktoken `load.py` `load_tiktoken_bpe`).
    */
  def load(content: String, pattern: String = Cl100kPattern): Table = {
    val b64 = java.util.Base64.getDecoder
    val ranks = content.linesIterator.filter(_.nonEmpty).map { line =>
      val sp = line.indexOf(' ')
      require(sp > 0, s"malformed .tiktoken line: '$line'")
      val bytes = b64.decode(line.substring(0, sp))
      val unitStr = {
        val sb = new java.lang.StringBuilder(bytes.length)
        bytes.foreach(b => sb.append(Gpt2Bpe.byteToChar(b & 0xFF)))
        sb.toString
      }
      unitStr -> line.substring(sp + 1).trim.toInt
    }.toMap
    Table(ranks, pattern).validated
  }

  def loadFile(path: String, pattern: String = Cl100kPattern): Table =
    load(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8), pattern)

  /** Emit the `.tiktoken` format, lines in rank order. */
  def export(table: Table): String = {
    val b64 = java.util.Base64.getEncoder
    table.ranks.toSeq.sortBy(_._2).map { case (unitStr, rank) =>
      // recover raw token bytes through the unit table (NOT via a UTF-8
      // round-trip — a token can hold a partial UTF-8 sequence)
      val raw = new Array[Byte](unitStr.length)
      var i = 0
      while (i < unitStr.length) {
        raw(i) = Gpt2Bpe.charToByte(unitStr.charAt(i).toInt).toByte
        i += 1
      }
      b64.encodeToString(raw) + " " + rank
    }.mkString("\n")
  }

  /** Convert a fitted/loaded GPT-2-format model into a rank table with
    * the SAME ids (vocab.json ids double as ranks — in a byte-level
    * vocab laid out as 256 byte units then merge products in merge
    * order, vocab order IS merge order, which is what makes the two
    * encode algorithms agree; see `TiktokenSpec`'s parity pin). Carries
    * [[Gpt2Pattern]] for the same reason.
    */
  def fromGpt2(model: Gpt2Bpe.Model): Table =
    Table(model.encoder, Gpt2Pattern).validated

  /** tiktoken's merge loop: collapse whichever adjacent pair's
    * concatenation has the lowest rank, until none merges. Differs from
    * [[Bpe.mergeGreedy]] only in where the rank comes from (the vocab
    * itself vs an explicit merge list).
    */
  private def mergeByVocab(
      syms: scala.collection.mutable.ArrayBuffer[String],
      ids: java.util.HashMap[String, Integer]): Unit = {
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestI = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ids.get(syms(i) + syms(i + 1))
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

  def encodeIds(text: String, ids: java.util.HashMap[String, Integer],
                pattern: java.util.regex.Pattern): Array[Int] = {
    val out = new scala.collection.mutable.ArrayBuilder.ofInt
    val m = pattern.matcher(text)
    while (m.find()) {
      val syms = scala.collection.mutable.ArrayBuffer.empty[String]
      Gpt2Bpe.toByteUnits(m.group()).foreach(c => syms += c.toString)
      mergeByVocab(syms, ids)
      syms.foreach { s =>
        val i = ids.get(s)
        if (i == null) throw new IllegalStateException(
          s"tiktoken encode: symbol '$s' missing from a validated table")
        out += i.intValue
      }
    }
    out.result()
  }

  def encodeIdsData(text: String, ids: java.util.HashMap[String, Integer],
                    pattern: java.util.regex.Pattern)
      : org.apache.spark.sql.catalyst.util.ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(encodeIds(text, ids, pattern))

  /** Lossless inverse: ids → byte-unit tokens → raw bytes → UTF-8. */
  def decode(tokenIds: Seq[Int], table: Table): String = {
    val sb = new java.lang.StringBuilder()
    tokenIds.foreach { id =>
      val t = table.decoder.getOrElse(id,
        throw new IllegalArgumentException(s"unknown token id $id"))
      sb.append(t)
    }
    Gpt2Bpe.fromByteUnits(sb.toString)
  }

  /** Token-id array column (codegen'd per-row; `array<int>`). */
  def encode(text: Column, table: Table): Column =
    toColumn(TiktokenEncode(expression(text), table))
}

/** Codegen'd `.tiktoken` byte-level BPE encoding (see
  * [[Tiktoken.encodeIds]]): the rank table and compiled pattern ride the
  * expression as reference objects.
  */
case class TiktokenEncode(child: Expression, table: Tiktoken.Table)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes() =
    graft.plans.expressions.stringCheck(child, "tiktoken_encode")

  override def nullSafeEval(input: Any): Any =
    Tiktoken.encodeIdsData(input.asInstanceOf[UTF8String].toString,
      table.ids, table.compiled)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ids = ctx.addReferenceObj("tiktokenIds", table.ids,
      "java.util.HashMap")
    val pat = ctx.addReferenceObj("tiktokenPattern", table.compiled,
      "java.util.regex.Pattern")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.text.Tiktoken.encodeIdsData($c.toString(), $ids, $pat);")
  }

  override protected def withNewChildInternal(c: Expression): TiktokenEncode =
    copy(child = c)
}
