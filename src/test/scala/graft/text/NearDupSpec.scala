package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class NearDupSpec extends SparkSpec {
  import spark.implicits._

  private val docA = "the quick brown fox jumps over the lazy dog while the " +
    "sun sets slowly behind the tall green mountains of the western range"
  private val docANear = "the quick brown fox jumps over the lazy dog while the " +
    "sun sets slowly behind the tall green mountains of the eastern range"
  private val docB = "completely unrelated content about database engines and " +
    "columnar storage formats with vectorized execution and code generation"
  private val docBDup = docB

  private def docs = Seq(
    (1L, docA), (2L, docANear), (3L, docB), (4L, docBDup),
    (5L, "tiny doc"), (6L, "another entirely distinct piece of writing about cooking pasta al dente"))
    .toDF("doc_id", "text")

  test("minhash signature shape and determinism") {
    val sig = docs.select(
      MinHashDedup.minHashSignature(
        MinHashDedup.wordShingles(col("text")), 64).as("sig"))
    val first = sig.head().getSeq[Long](0)
    assert(first.length == 64)
    val again = sig.head().getSeq[Long](0)
    assert(first == again)
  }

  test("minhash LSH finds near-dup and exact-dup pairs, not unrelated") {
    val pairs = MinHashDedup.nearDupPairs(docs, "doc_id", "text", threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((1L, 2L)), s"near-dup pair missing: ${keys.mkString(",")}")
    assert(keys.contains((3L, 4L)), "exact-dup pair missing")
    assert(keys.size == 2, s"unexpected pairs: $keys")
    val exact = pairs.find(p => p._1 == 3L).get
    assert(exact._3 == 1.0)
  }

  test("minhash dedup keeps min-id survivor") {
    val out = MinHashDedup.dedup(docs, "doc_id", "text", threshold = 0.6)
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 3L, 5L, 6L))
  }

  test("simhash: identical docs have distance 0, near-dups small, unrelated large") {
    val fp = docs.select(col("doc_id"), SimHashDedup.simHash64(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(3L) == fp(4L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(1L), fp(2L)) < ham(fp(1L), fp(3L)))
  }

  test("simhash pairs + dedup") {
    val pairs = SimHashDedup.nearDupPairs(docs, "doc_id", "text", maxDist = 6, chunks = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((3L, 4L)))
    val out = SimHashDedup.dedup(docs, "doc_id", "text", maxDist = 6, chunks = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(!out.contains(4L) && out.contains(3L))
  }

  test("simhash pigeonhole buckets are capped: a planted mega-clique can't go quadratic") {
    // 10^3 identical docs: every chunk of every fingerprint collides, so an
    // uncapped pigeonhole join would build 4 buckets of 1000 ids each
    // (~2M candidate pairs from 1000 rows). With the cap below the clique
    // size the degenerate buckets are dropped whole — zero candidate pairs
    // ever materialize — while normal-sized buckets keep working.
    val clique = (1L to 1000L).map(i => (i, "identical boilerplate text row"))
    val normal = Seq(
      (2001L, "the quick brown fox jumps over the lazy dog again and again"),
      (2002L, "the quick brown fox jumps over the lazy dog again and again!"))
    val d = (clique ++ normal).toDF("doc_id", "text")
    val pairs = SimHashDedup.nearDupPairs(d, "doc_id", "text",
        maxDist = 3, chunks = 4, maxBucketSize = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.exists(p => p._1 <= 1000L || p._2 <= 1000L),
      "capped mega-clique buckets must be dropped whole")
    assert(pairs == Set((2001L, 2002L)),
      s"normal buckets must keep matching, got $pairs")
    // with the cap above the clique size the pairs come back
    val uncapped = SimHashDedup.nearDupPairs(d, "doc_id", "text",
        maxDist = 3, chunks = 4, maxBucketSize = 5000)
      .filter(col("id_a") === 1L).count()
    assert(uncapped == 999L)
  }

  test("no near-dups within real documents table (sanity at sf0.001)") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = MinHashDedup.nearDupPairs(real, "doc_id", "text", threshold = 0.9).count()
    // synthetic word-soup docs: high-overlap pairs are possible but rare
    assert(n < real.count() / 10)
  }

  test("char n-gram jaccard mode catches typo-level near-dups") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val typo = "the quick brown fox jumps ovar the lazy dog near the river bank today"
    val other = "completely different content with no overlap whatsoever in any way"
    val d = Seq((1L, base), (2L, typo), (3L, other)).toDF("doc_id", "text")
    val pairs = MinHashDedup.nearDupPairs(d, "doc_id", "text",
      threshold = 0.7, charNgram = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.length == 1 && pairs.head._1 == 1L && pairs.head._2 == 2L,
      s"expected only the typo pair, got ${pairs.toSeq}")
    assert(pairs.head._3 > 0.7 && pairs.head._3 < 1.0)
    // word-shingle mode also pairs them, but with lower similarity: a
    // one-char typo breaks 3 word-shingles out of ~12
    val wordPairs = MinHashDedup.nearDupPairs(d, "doc_id", "text", threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(wordPairs.get((1L, 2L)).forall(_ < pairs.head._3),
      "char-ngram similarity should exceed word-shingle similarity for a typo")
  }

  test("containmentPairs catches doc-inside-doc that Jaccard LSH misses") {
    // small doc fully quoted inside a ~6× larger doc: containment 1.0,
    // Jaccard well under any near-dup threshold
    val small = "the quarterly revenue figures exceeded analyst " +
      "expectations across all major product categories this fiscal year"
    val filler = (1 to 60).map(i => s"unrelated filler sentence number $i " +
      "covering assorted topics like weather gardening travel and sport").mkString(" ")
    val d = Seq(
      (1L, small),
      (2L, s"$filler $small"),
      (3L, "a fully distinct document about compiler construction and " +
        "register allocation strategies in modern optimizing backends"))
      .toDF("doc_id", "text")
    val cont = MinHashDedup.containmentPairs(d, "doc_id", "text",
      threshold = 0.9, maxDf = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cont.map(p => (p._1, p._2)).toSet == Set((1L, 2L)),
      s"expected exactly the contained pair, got ${cont.toSeq}")
    assert(cont.head._3 == 1.0, s"full quote ⇒ containment 1.0: ${cont.head}")
    // the symmetric-Jaccard pipeline does NOT pair them — the structural gap
    val jac = MinHashDedup.nearDupPairs(d, "doc_id", "text", threshold = 0.5)
    assert(jac.isEmpty, "Jaccard at 0.5 must miss the contained pair")
    // determinism: repartitioning changes nothing
    val again = MinHashDedup.containmentPairs(d.repartition(5), "doc_id",
      "text", threshold = 0.9, maxDf = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == Set((1L, 2L)))
    intercept[IllegalArgumentException](
      MinHashDedup.containmentPairs(d, "doc_id", "text", maxDf = 1))
  }

  test("hash_containment kernel: sets, duplicates, empties, zero values") {
    import graft.plans.expressions.hash_containment
    def c(a: Seq[Long], b: Seq[Long]): Option[Double] = {
      val r = Seq((a, b)).toDF("a", "b")
        .select(hash_containment(col("a"), col("b"))).head()
      if (r.isNullAt(0)) None else Some(r.getDouble(0))
    }
    assert(c(Seq(1L, 2L), Seq(1L, 2L, 3L, 4L)) == Some(1.0)) // A ⊆ B
    assert(c(Seq(1L, 2L, 3L, 4L), Seq(3L, 4L)) == Some(1.0)) // B ⊆ A
    assert(c(Seq(1L, 2L), Seq(2L, 3L)) == Some(0.5))
    assert(c(Seq(1L), Seq(2L)) == Some(0.0))
    assert(c(Seq(), Seq()) == None)                          // both empty
    assert(c(Seq(1L), Seq()) == Some(0.0))                   // one empty
    // duplicates collapse (set semantics) and 0L participates correctly
    assert(c(Seq(1L, 1L, 2L), Seq(1L, 2L, 2L)) == Some(1.0))
    assert(c(Seq(0L, 5L), Seq(0L)) == Some(1.0))
    assert(c(Seq(0L, 5L), Seq(7L)) == Some(0.0))
  }

  test("table shells: near-dedup a ManagedTable in place") {
    val loc = tmpDir("nd")
    val t = graft.tables.ManagedTable.create(docs, loc)
    MinHashDedup.dedup(t, "doc_id", "text", 0.6, 64, 16, 3, 0)
    assert(t.toDF.count() == 4) // same survivors as the pure core test
    assert(t.latestVersion == 1)
  }


  test("tuneBands: the S-curve fit behaves like the published optimum") {
    // P(s) = 1-(1-s^r)^b; the chosen split must tile the signature and
    // put the curve's steep region at the threshold
    def p(s: Double, br: (Int, Int)) =
      1.0 - math.pow(1.0 - math.pow(s, br._2), br._1)
    Seq(0.3, 0.5, 0.8).foreach { t =>
      val br = MinHashDedup.tuneBands(t, numHashes = 64)
      assert(br._1 * br._2 == 64, s"banding must tile the signature: $br")
      assert(p(math.min(t + 0.2, 0.99), br) > 0.9,
        s"well above t=$t must be near-certain: $br -> ${p(t + 0.2, br)}")
      assert(p(math.max(t - 0.25, 0.01), br) < 0.5,
        s"well below t=$t must be unlikely: $br")
    }
    // monotonicity: a higher threshold wants longer rows (steeper, later)
    val loose = MinHashDedup.tuneBands(0.3, 128)
    val strict = MinHashDedup.tuneBands(0.8, 128)
    assert(strict._2 >= loose._2,
      s"rows must not shrink as the threshold rises: $loose vs $strict")
    // asymmetric weights shift the curve the right way: punishing false
    // positives more must not DECREASE rows (longer rows = stricter)
    val fpAverse = MinHashDedup.tuneBands(0.5, 64, fpWeight = 0.9,
      fnWeight = 0.1)
    val fnAverse = MinHashDedup.tuneBands(0.5, 64, fpWeight = 0.1,
      fnWeight = 0.9)
    assert(fpAverse._2 >= fnAverse._2)
    // the documented default (64, 16 bands of 4) is what a 0.8-ish
    // threshold with fp-averse weighting actually selects
    val e = intercept[IllegalArgumentException] {
      MinHashDedup.tuneBands(1.5)
    }
    assert(e.getMessage.contains("threshold"))
  }
}
