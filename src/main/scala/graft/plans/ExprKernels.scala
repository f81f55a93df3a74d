package graft.plans

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row kernels shared by the interpreted (`nullSafeEval`) and
  * generated (`doGenCode`) paths of the custom expressions in this package.
  *
  * A top-level Scala object with no companion class compiles to a class
  * with static forwarder methods, so whole-stage-codegen'd Java calls
  * `graft.plans.ExprKernels.minhashSig(...)` directly. The expressions
  * generate exactly one such call each: the win over `CodegenFallback` is
  * not the loop itself (already a tight JVM loop) but that the surrounding
  * stage stays fused — a single CodegenFallback expression de-optimizes
  * every operator in its stage back to the interpreted Volcano path.
  */
object ExprKernels {

  /** splitmix64 — deterministic per-index constants for hash families. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** One-permutation minhash with rotation densification (see
    * [[MinHashSig]]). Returns null for an empty input array.
    */
  def minhashSig(input: ArrayData, numHashes: Int): ArrayData = {
    val n = input.numElements()
    if (n == 0) return null
    val out = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = mix64(input.getLong(i)) // decorrelate bucket vs value bits
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
        out(j) = mix64(orig((j + d) % numHashes) + d)
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  private def hashSetToArray(out: java.util.HashSet[java.lang.Long]): ArrayData = {
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    new GenericArrayData(arr)
  }

  /** Distinct hashes of lowercase word w-shingles, one pass (see
    * [[ShingleHashes]]).
    */
  def shingleHashes(input: UTF8String, w: Int): ArrayData = {
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
        tokenHashes += mix64(h)
        inTok = false
      }
      i += 1
    }
    if (inTok) tokenHashes += mix64(h)

    val n = tokenHashes.length
    // 2. shingle hashes: mix of w consecutive token hashes, deduplicated
    val out = new java.util.HashSet[java.lang.Long]()
    if (n == 0) {
      // keep parity with the HOF formulation: empty text still yields one
      // (empty-join) shingle so the row can participate in exact-dup checks
      out.add(mix64(0L))
    } else if (n < w) {
      var acc = 0L
      var j = 0
      while (j < n) { acc = acc * 0x9E3779B97F4A7C15L ^ tokenHashes(j); j += 1 }
      out.add(mix64(acc))
    } else {
      var start = 0
      while (start <= n - w) {
        var acc = 0L
        var j = start
        while (j < start + w) { acc = acc * 0x9E3779B97F4A7C15L ^ tokenHashes(j); j += 1 }
        out.add(mix64(acc))
        start += 1
      }
    }
    hashSetToArray(out)
  }

  /** Distinct hashes of normalized character n-grams, one pass (see
    * [[CharNgramHashes]]).
    */
  def charNgramHashes(input: UTF8String, n: Int): ArrayData = {
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
    val out = new java.util.HashSet[java.lang.Long]()
    def windowHash(from: Int, until: Int): Long = {
      var h = 0xCBF29CE484222325L
      var j = from
      while (j < until) { h = h * 0x100000001B3L ^ s.charAt(j); j += 1 }
      mix64(h)
    }
    if (s.length < n) out.add(windowHash(0, s.length))
    else {
      var start = 0
      while (start <= s.length - n) {
        out.add(windowHash(start, start + n))
        start += 1
      }
    }
    hashSetToArray(out)
  }

  /** One-pass 64-bit simhash (see [[SimHash64]]). */
  def simhash64(input: ArrayData): Long = {
    val n = input.numElements()
    val counters = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = input.getLong(i)
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
    out
  }

  /** Σ aᵢ·bᵢ in double (see [[VecDot]]). */
  def vecDot(a: ArrayData, b: ArrayData,
             aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      i += 1
    }
    dot
  }

  /** Cosine similarity in double; null for a zero vector (see [[VecDot]]). */
  def vecCosine(a: ArrayData, b: ArrayData,
                aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  /** The `nprobe` nearest centroids by dot product, as array<int> (see
    * [[graft.ml.NearestCentroids]]).
    */
  def nearestCentroids(input: ArrayData, centroids: Array[Array[Double]],
                       nprobe: Int, isFloat: Boolean): ArrayData = {
    val dim = math.min(input.numElements(), centroids(0).length)
    val k = centroids.length
    val scores = new Array[Double](k)
    var c = 0
    while (c < k) {
      var s = 0.0; var i = 0
      val cent = centroids(c)
      while (i < dim) {
        val x = if (isFloat) input.getFloat(i).toDouble else input.getDouble(i)
        s += x * cent(i)
        i += 1
      }
      scores(c) = s
      c += 1
    }
    // partial selection of the nprobe best (descending score, index tiebreak)
    val out = new Array[Int](math.min(nprobe, k))
    val taken = new Array[Boolean](k)
    var p = 0
    while (p < out.length) {
      var best = -1
      var bs = Double.NegativeInfinity
      var j = 0
      while (j < k) {
        if (!taken(j) && scores(j) > bs) { bs = scores(j); best = j }
        j += 1
      }
      taken(best) = true
      out(p) = best
      p += 1
    }
    new GenericArrayData(out)
  }
}
