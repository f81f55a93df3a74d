package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions.lit

/** Custom Catalyst expressions for the hot loops of the dedup / similarity
  * operators. Spark's higher-order functions (`transform`, `aggregate`,
  * `zip_with`) evaluate interpreted — one lambda dispatch plus array
  * allocation per element — which dominates scan cost when an operator
  * needs dozens of passes per row (64-permutation minhash, 64-bit simhash
  * voting, embedding dot products). Each expression here replaces an
  * O(numHashes·|arr|) interpreted HOF tree with one tight JVM loop per row
  * (~10-40× on the minhash/simhash stages at sf0.1).
  */
object expressions {

  /** splitmix64 — deterministic per-index constants for the affine hash
    * family (aⱼ·x + bⱼ with odd aⱼ is a bijection on Z/2^64).
    */
  private[plans] def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  // Column-API entry points -------------------------------------------
  // (Spark 4 classic: Column ⟷ Expression via the sql-package bridge)
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Minhash signature (array<bigint>, length numHashes) of an
    * `array<bigint>` of element hashes.
    */
  def minhash_sig(hashes: Column, numHashes: Int): Column =
    column(MinHashSig(expression(hashes), numHashes))

  /** Distinct word-w-shingle hashes of a text column, in one pass (see
    * [[ShingleHashes]]).
    */
  def shingle_hashes(text: Column, w: Int): Column =
    column(ShingleHashes(expression(text), w))

  /** Distinct character-n-gram hashes of a text column, in one pass (see
    * [[CharNgramHashes]]).
    */
  def char_ngram_hashes(text: Column, n: Int): Column =
    column(CharNgramHashes(expression(text), n))

  /** 64-bit simhash of an `array<bigint>` of token hashes. */
  def simhash64(hashes: Column): Column = column(SimHash64(expression(hashes)))

  /** Dot product of two float/double array columns, in double. */
  def dot_product(a: Column, b: Column): Column =
    column(VecDot(expression(a), expression(b), DotMode.Dot))

  /** Cosine similarity of two float/double array columns, in double. */
  def cosine_sim(a: Column, b: Column): Column =
    column(VecDot(expression(a), expression(b), DotMode.Cosine))
}

/** One-permutation minhash (Li, Owen, Zhang 2012): the hash space is
  * split into `numHashes` buckets by the top bits of each element hash and
  * the minimum is kept per bucket — ONE O(|arr|) pass instead of the
  * classic numHashes × |arr| permutations, with rotation densification
  * (empty buckets borrow the next non-empty bucket's value, mixed with the
  * distance so borrowed entries stay distinguishable) for short inputs.
  * Bucket-match probability ≈ Jaccard, as with classic minhash, so the
  * banded-LSH S-curve downstream is unchanged. NULL input → NULL; empty
  * array → NULL (no shingles ⇒ no signature, never collides).
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  require(numHashes > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects array<bigint>, got ${other.sql}")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val out = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = expressions.mix64(arr.getLong(i)) // decorrelate bucket vs value bits
      val b = ((h >>> 1) % numHashes).toInt
      if (h < out(b)) out(b) = h
      i += 1
    }
    // rotation densification against the pre-densification snapshot
    // (Long.MaxValue marks an empty bucket)
    val orig = out.clone()
    var j = 0
    while (j < numHashes) {
      if (orig(j) == Long.MaxValue) {
        var d = 1
        while (d < numHashes && orig((j + d) % numHashes) == Long.MaxValue) d += 1
        out(j) = expressions.mix64(orig((j + d) % numHashes) + d)
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** Text → distinct hashes of its lowercase word w-shingles, one pass.
  *
  * Replaces the interpreted HOF chain `split → filter → transform(slice +
  * concat_ws) → array_distinct → transform(xxhash64)`: tokens are scanned
  * directly from the UTF8 string (runs of Unicode letters, lowercased),
  * each token is hashed incrementally, and a shingle hash mixes the `w`
  * consecutive token hashes — no intermediate token/shingle strings are
  * materialized. Documents shorter than `w` tokens produce one hash over
  * all their tokens (so they can still bucket). NULL text → NULL.
  *
  * Collision note: downstream Jaccard verification compares these 64-bit
  * hash sets rather than shingle strings; collisions (~2⁻⁶⁴ per pair) are
  * negligible against LSH's own approximation.
  */
case class ShingleHashes(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(w >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = {
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hashes expects string, got ${other.sql}")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.toString
    // 1. token hashes: runs of letters, lowercased, hashed incrementally
    val tokenHashes = new scala.collection.mutable.ArrayBuffer[Long](64)
    var h = 0L
    var inTok = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isLetter(c)) {
        val lc = Character.toLowerCase(c)
        h = if (inTok) h * 0x100000001B3L ^ lc else 0xCBF29CE484222325L ^ lc
        inTok = true
      } else if (inTok) {
        tokenHashes += expressions.mix64(h)
        inTok = false
      }
      i += 1
    }
    if (inTok) tokenHashes += expressions.mix64(h)

    val n = tokenHashes.length
    // 2. shingle hashes: mix of w consecutive token hashes, deduplicated
    val out = new java.util.HashSet[Long]()
    if (n == 0) {
      // keep parity with the HOF formulation: empty text still yields one
      // (empty-join) shingle so the row can participate in exact-dup checks
      out.add(expressions.mix64(0L))
    } else if (n < w) {
      var acc = 0L
      var j = 0
      while (j < n) { acc = acc * 0x9E3779B97F4A7C15L ^ tokenHashes(j); j += 1 }
      out.add(expressions.mix64(acc))
    } else {
      var start = 0
      while (start <= n - w) {
        var acc = 0L
        var j = start
        while (j < start + w) { acc = acc * 0x9E3779B97F4A7C15L ^ tokenHashes(j); j += 1 }
        out.add(expressions.mix64(acc))
        start += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(c: Expression): ShingleHashes =
    copy(child = c)
}

/** Text → distinct hashes of its character n-grams, one pass. The text is
  * normalized on the fly (lowercased; runs of non-letters collapse to a
  * single space) and each n-char window is hashed with a rolling recompute
  * — no substring materialization. Texts shorter than n yield one hash of
  * the whole normalized text. The finer-grained cousin of
  * [[ShingleHashes]]: robust to word-boundary edits and typos, the
  * standard n-gram-Jaccard dedup primitive.
  */
case class CharNgramHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 2)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = {
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_ngram_hashes expects string, got ${other.sql}")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val raw = input.toString
    // normalize: lowercase letters kept, everything else → single space
    val sb = new java.lang.StringBuilder(raw.length)
    var lastSpace = true
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (Character.isLetter(c)) {
        sb.append(Character.toLowerCase(c)); lastSpace = false
      } else if (!lastSpace) { sb.append(' '); lastSpace = true }
      i += 1
    }
    while (sb.length > 0 && sb.charAt(sb.length - 1) == ' ')
      sb.setLength(sb.length - 1)
    val s = sb
    val out = new java.util.HashSet[Long]()
    def windowHash(from: Int, until: Int): Long = {
      var h = 0xCBF29CE484222325L
      var j = from
      while (j < until) { h = h * 0x100000001B3L ^ s.charAt(j); j += 1 }
      expressions.mix64(h)
    }
    if (s.length < n) out.add(windowHash(0, s.length))
    else {
      var start = 0
      while (start <= s.length - n) {
        out.add(windowHash(start, start + n))
        start += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(c: Expression): CharNgramHashes =
    copy(child = c)
}

/** One-pass 64-bit simhash (Charikar): every input hash votes ±1 on each
  * of the 64 bit positions; the sign of each counter forms the output bit.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 expects array<bigint>, got ${other.sql}")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counters = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

private[plans] object DotMode extends Enumeration { val Dot, Cosine = Value }

/** Single-pass dot product / cosine similarity over two numeric array
  * columns (float or double elements), accumulating in double. Cosine of a
  * zero vector → NULL.
  */
case class VecDot(left: Expression, right: Expression,
                  mode: DotMode.Value)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  private def elemType(e: Expression) = e.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }
  override def checkInputDataTypes() = {
    (elemType(left), elemType(right)) match {
      case (FloatType | DoubleType, FloatType | DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec dot expects two array<float|double>, got $other")
    }
  }

  // lazy: children may still be unresolved when the node is constructed
  private lazy val leftIsFloat = elemType(left) == FloatType
  private lazy val rightIsFloat = elemType(right) == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (leftIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightIsFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      if (mode == DotMode.Cosine) { na += x * x; nb += y * y }
      i += 1
    }
    if (mode == DotMode.Dot) java.lang.Double.valueOf(dot)
    else {
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}
