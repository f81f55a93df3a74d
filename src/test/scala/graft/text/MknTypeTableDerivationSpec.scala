package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the count identities behind [[VocabStats.suffixTypeMerge]]:
  * from one suffix-keyed aggregation over G_{k+1} plus the doc-mass
  * boundary stream, (a) `__c` must equal the k-gram type table built
  * by a token-mass explode + groupBy — exactly, count for count
  * (`c_k(g) = Σ_w c_{k+1}(w·g) + #{docs whose first k tokens are g}`),
  * and (b) `__cc` must equal the continuation count
  * `N1+(·g) = #{w : c_{k+1}(w·g) > 0}` the fit's continuation tables
  * fold. The corpus deliberately stresses the boundary term: empty
  * docs, docs shorter than k, docs of exactly length k (zero
  * (k+1)-grams — the whole count comes from the boundary stream),
  * repeated prefixes shared across docs, and a pseudo-random block so
  * collisions between interior and boundary occurrences of the same
  * k-gram are exercised.
  */
class MknTypeTableDerivationSpec extends SparkSpec {
  import spark.implicits._

  private def words(c: org.apache.spark.sql.Column) =
    filter(split(lower(c), "\\s+"), w => length(w) > 0)

  private val rnd = new scala.util.Random(42)
  private val vocab = Vector("a", "b", "c", "d", "e")
  private val corpus: Seq[String] = Seq(
    "",                      // empty: contributes nothing anywhere
    "a",                     // shorter than every k here
    "a b",                   // exactly k for k=2
    "a b c",                 // exactly k for k=3
    "b c d e",               // exactly k for k=4
    "a b c d e",             // exactly k for k=5
    "a a a a a a",           // one type repeated — interior == boundary
    "c b a",
    "a b c d e a b c d e a b c",
    "e d c b a e d c b a"    // repeated spans across positions
  ) ++ (1 to 40).map(_ =>
    Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
      .mkString(" "))

  private lazy val ws =
    corpus.toDF("text").select(words(col("text")).as("__ws")).persist()

  /** The explode-built reference — byte-for-byte the type-table form
    * the derivation replaced (positional transform, no self-joins).
    */
  private def exploded(k: Int): DataFrame = ws
    .select(explode(transform(
      slice(col("__ws"), lit(1),
        greatest(size(col("__ws")) - (k - 1), lit(0))),
      (w, i) => struct(w.as("g1") +: (2 to k).map(j =>
        element_at(col("__ws"), i + j).as(s"g$j")): _*))).as("__g"))
    .select((1 to k).map(j => col(s"__g.g$j").as(s"__w$j")): _*)
    .groupBy((1 to k).map(j => col(s"__w$j")): _*)
    .agg(count(lit(1)).as("__c"))

  private def asMap(df: DataFrame, k: Int,
                    valueCol: String): Map[Seq[String], Long] =
    df.select((1 to k).map(j => col(s"__w$j")) :+ col(valueCol): _*)
      .collect().map(r =>
        (0 until k).map(r.getString) -> r.getLong(k)).toMap

  test("suffixTypeMerge __c equals the explode-built G_k and __cc the " +
    "explode-built continuation count, chained 5 -> 4 -> 3 -> 2") {
    // chain exactly as fitMknModel does: each merged level feeds the
    // next derivation, so an error at any level would compound
    var higher = exploded(5)
    (4 to 2 by -1).foreach { k =>
      val m = VocabStats.suffixTypeMerge(higher, ws, k)
      assert(asMap(m, k, "__c") == asMap(exploded(k), k, "__c"),
        s"derived G_$k differs from the explode-built reference")
      // continuation reference: N1+(·g) over the explode-built G_{k+1}.
      // The merged table additionally carries __cc = 0 rows for
      // boundary-only k-grams (real G_k types no (k+1)-gram covers);
      // the fit's contTable view filters them, so compare the
      // positive entries — they must match the reference EXACTLY
      val contRef = exploded(k + 1)
        .groupBy((2 to k + 1).map(j =>
          col(s"__w$j").as(s"__w${j - 1}")): _*)
        .agg(count(lit(1)).as("__cc"))
      assert(asMap(m.where(col("__cc") > 0), k, "__cc") ==
        asMap(contRef, k, "__cc"),
        s"derived N1+ at level $k differs from the explode-built " +
          "continuation count")
      higher = m.select((1 to k).map(j => col(s"__w$j")) :+
        col("__c"): _*)
    }
  }

  test("boundary-only level: a corpus where every doc has length k " +
    "yields G_k entirely from the boundary stream and zero " +
    "continuation counts") {
    val short = Seq("a b c", "c b a", "a b c", "b b b")
      .toDF("text").select(words(col("text")).as("__ws"))
    val gTop = short // G_4 of this corpus is empty
      .select(explode(transform(
        slice(col("__ws"), lit(1),
          greatest(size(col("__ws")) - 3, lit(0))),
        (w, i) => struct(w.as("g1"), element_at(col("__ws"), i + 2).as("g2"),
          element_at(col("__ws"), i + 3).as("g3"),
          element_at(col("__ws"), i + 4).as("g4")))).as("__g"))
      .select((1 to 4).map(j => col(s"__g.g$j").as(s"__w$j")): _*)
      .groupBy((1 to 4).map(j => col(s"__w$j")): _*)
      .agg(count(lit(1)).as("__c"))
    assert(gTop.count() == 0L)
    val m = VocabStats.suffixTypeMerge(gTop, short, 3)
    assert(asMap(m, 3, "__c") == Map(
      Seq("a", "b", "c") -> 2L,
      Seq("c", "b", "a") -> 1L,
      Seq("b", "b", "b") -> 1L))
    // no (k+1)-gram exists, so every continuation count is zero
    assert(m.collect().forall(_.getLong(4) == 0L))
  }
}
