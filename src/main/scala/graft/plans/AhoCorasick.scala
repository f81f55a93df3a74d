package graft.plans

/** Aho-Corasick multi-pattern string matcher (Aho & Corasick 1975, the
  * classic goto/fail automaton — the same structure behind fgrep and
  * every production blocklist scanner): matches ALL occurrences of ALL
  * patterns in ONE pass over the text, O(n + matches), independent of
  * pattern count. The per-pattern `indexOf` scan it replaces in
  * [[graft.plans.expressions]]'s BlocklistHits is O(n · P): at a real
  * blocklist size (the public LDNOOBW English list alone is ~400
  * entries, many multiword) that is hundreds of full-text scans per
  * document — per 100 TB corpus row. The automaton builds once on the
  * driver, ships with the plan (plain serializable arrays + maps), and
  * walks each document exactly once.
  *
  * Determinism: matches are visited in increasing END offset; the
  * per-pattern order at equal end follows the collapsed suffix chain —
  * callers that track independent per-pattern state (the non-overlap
  * rule in blocklistHits) are order-insensitive at equal end.
  */
final class AhoCorasick(val patterns: Array[String]) extends Serializable {
  require(patterns.forall(_.nonEmpty), "empty pattern")

  /** pattern lengths, exposed so visitors can map end → start offset */
  val lengths: Array[Int] = patterns.map(_.length)

  // trie: node 0 = root; children as per-node char→node maps (text is
  // arbitrary unicode, so a dense array over the alphabet is not an
  // option; one boxed lookup per char is noise next to the decode the
  // row already paid for)
  private val children =
    new java.util.ArrayList[java.util.HashMap[Character, Integer]]()

  private val built: (Array[Int], Array[Array[Int]]) = {
    children.add(new java.util.HashMap())
    val ownOut = new java.util.ArrayList[java.util.ArrayList[Integer]]()
    ownOut.add(new java.util.ArrayList())
    var p = 0
    while (p < patterns.length) {
      val pat = patterns(p)
      var node = 0
      var i = 0
      while (i < pat.length) {
        val c = Character.valueOf(pat.charAt(i))
        var nxt = children.get(node).get(c)
        if (nxt == null) {
          children.add(new java.util.HashMap())
          ownOut.add(new java.util.ArrayList())
          nxt = Integer.valueOf(children.size() - 1)
          children.get(node).put(c, nxt)
        }
        node = nxt.intValue()
        i += 1
      }
      ownOut.get(node).add(p)
      p += 1
    }
    // BFS: fail links + collapsed outputs (own ++ outputs(fail)) — BFS
    // order guarantees fail(v) is finished before v
    val n = children.size()
    val failArr = new Array[Int](n)
    val outArr = new Array[Array[Int]](n)
    outArr(0) = toIntArray(ownOut.get(0))
    val queue = new java.util.ArrayDeque[Integer]()
    val rootIt = children.get(0).entrySet().iterator()
    while (rootIt.hasNext) {
      val v = rootIt.next().getValue.intValue()
      failArr(v) = 0
      outArr(v) = merge(ownOut.get(v), outArr(0))
      queue.add(v)
    }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      val it = children.get(u).entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getKey
        val v = e.getValue.intValue()
        var f = failArr(u)
        while (f != 0 && children.get(f).get(c) == null) f = failArr(f)
        val t = children.get(f).get(c)
        failArr(v) = if (t == null || t.intValue() == v) 0 else t.intValue()
        outArr(v) = merge(ownOut.get(v), outArr(failArr(v)))
        queue.add(v)
      }
    }
    (failArr, outArr)
  }

  private val fail: Array[Int] = built._1
  private val outputs: Array[Array[Int]] = built._2 // collapsed via fail links

  private def toIntArray(l: java.util.ArrayList[Integer]): Array[Int] = {
    val a = new Array[Int](l.size())
    var i = 0
    while (i < a.length) { a(i) = l.get(i).intValue(); i += 1 }
    a
  }

  private def merge(own: java.util.ArrayList[Integer],
                    inherited: Array[Int]): Array[Int] = {
    if (own.isEmpty) inherited
    else {
      val a = new Array[Int](own.size() + inherited.length)
      var i = 0
      while (i < own.size()) { a(i) = own.get(i).intValue(); i += 1 }
      System.arraycopy(inherited, 0, a, own.size(), inherited.length)
      a
    }
  }

  /** Visit `(patternIndex, endOffsetExclusive)` for EVERY occurrence of
    * every pattern in `s`, in increasing end order — one pass, no
    * allocation beyond the sink's own state.
    */
  def visit(s: String, sink: AhoCorasick.MatchSink): Unit = {
    var node = 0
    var i = 0
    val n = s.length
    while (i < n) {
      val c = Character.valueOf(s.charAt(i))
      var nxt = children.get(node).get(c)
      while (nxt == null && node != 0) {
        node = fail(node)
        nxt = children.get(node).get(c)
      }
      if (nxt != null) node = nxt.intValue()
      val outs = outputs(node)
      var j = 0
      while (j < outs.length) { sink.onMatch(outs(j), i + 1); j += 1 }
      i += 1
    }
  }
}

object AhoCorasick {
  /** Monomorphic callback — avoids boxed Function2 dispatch per match. */
  trait MatchSink { def onMatch(pattern: Int, endExclusive: Int): Unit }
}
