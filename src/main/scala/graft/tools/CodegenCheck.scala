package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.plans.expressions._

/** Proves the custom expressions really run under whole-stage codegen:
  * executes each with codegen FORCED (fallback disabled — a Janino error
  * becomes a hard failure instead of a silent interpreted retry) and
  * prints the WholeStageCodegen spans of a representative plan.
  */
object CodegenCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      // hard-fail on codegen compile errors instead of falling back
      .config("spark.sql.codegen.fallback", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

    val sh = docs.select(shingle_hashes(col("text"), 3).as("h"))
      .select(minhash_sig(col("h"), 64).as("sig"), simhash64(col("h")).as("sim"))
    sh.agg(sum(size(col("sig"))), expr("bit_xor(sim)")).head()
    println("[1] shingle_hashes -> minhash_sig/simhash64 OK under forced codegen")

    val ng = docs.select(char_ngram_hashes(col("text"), 5).as("h"))
    ng.agg(sum(size(col("h")))).head()
    println("[2] char_ngram_hashes OK under forced codegen")

    val fp = docs.select(normalized_md5(col("text")).as("h"))
    fp.agg(count(col("h"))).head()
    println("[2b] normalized_md5 OK under forced codegen")

    val d = emb.as("a").crossJoin(emb.limit(3).as("b"))
      .select(dot_product(col("a.embedding"), col("b.embedding")).as("d"),
        cosine_sim(col("a.embedding"), col("b.embedding")).as("c"))
    d.agg(sum(col("d")), sum(col("c"))).head()
    println("[3] dot_product/cosine_sim OK under forced codegen")

    val ts = docs.select(graft.text.TextAnalysis.surfaceStats(col("text")).as("st"))
      .select(sum(col("st.n_chars")), sum(col("st.n_toks")), sum(col("st.hits")(0)))
    ts.head()
    println("[3b] text_surface_stats OK under forced codegen")

    val rs = docs.select(graft.text.QualityFilters.repetitionStats(col("text")).as("st"))
      .select(sum(col("st.n_lines")), sum(col("st.top2gram_char_frac")))
    rs.head()
    println("[3e] repetition_stats OK under forced codegen")

    val hj = docs.as("a").crossJoin(docs.limit(3).as("b"))
      .select(hash_jaccard(
        shingle_hashes(col("a.text"), 3), shingle_hashes(col("b.text"), 3)).as("j"))
    hj.agg(sum(col("j"))).head()
    println("[3d] hash_jaccard OK under forced codegen")

    val planes = Seq.tabulate(4 * 8 * 64)(i => math.sin(i.toDouble)) // any fixed matrix
    val lb = emb.select(lsh_buckets(col("embedding"), planes, 4, 8, 64).as("b"))
    lb.agg(expr("bit_xor(b[0])"), expr("bit_xor(b[3])")).head()
    println("[3c] lsh_buckets OK under forced codegen")

    val model = graft.ml.IvfIndex.fit(emb, "embedding", k = 8)
    val assigned = emb.select(graft.ml.IvfIndex.assign(col("embedding"), model).as("cell"))
    assigned.agg(sum(col("cell").cast("long"))).head()
    println("[4] nearest_centroids OK under forced codegen")

    // zero-vector cosine → null survives codegen
    val z = Seq((Seq(0f, 0f), Seq(1f, 2f))).toDF("a", "b")
      .select(cosine_sim(col("a"), col("b")).as("c"))
    assert(z.head().isNullAt(0), "zero-vector cosine must be null")
    // empty-array minhash → null survives codegen
    val e = Seq(Seq.empty[Long]).toDF("h").select(minhash_sig(col("h"), 8).as("s"))
    assert(e.head().isNullAt(0), "empty-array minhash must be null")
    println("[5] null paths OK under forced codegen")

    // blocklist via the Aho-Corasick path (>= AcThreshold phrases) and
    // the short-list indexOf path, same answer, both codegen'd
    val manyPhrases = (0 until 70).map(i => s"w$i w${i + 1}")
    val few = Seq("merge batch", "fast key")
    val bl = docs.select(
      blocklist_hits(col("text"), manyPhrases).as("big"),
      blocklist_hits(col("text"), few).as("small"))
    bl.agg(sum(col("big")), sum(col("small"))).head()
    println("[6] blocklist_hits (automaton + scan paths) OK under forced codegen")

    val lr = docs.select(luhn_redact(
      concat(col("text"), lit(" 4111 1111 1111 1111"))).as("c"))
    lr.agg(count(col("c"))).head()
    println("[7] luhn_redact OK under forced codegen")

    // bloom probe, string + long paths
    val bfS = graft.text.BloomDedup.buildFilter(
      docs.select(md5(col("text")).as("k")), "k")
    val bfL = graft.text.BloomDedup.buildFilter(
      docs.select(col("doc_id").as("k")), "k")
    val bp = docs.select(
      bloom_might_contain(md5(col("text")), bfS).as("s"),
      bloom_might_contain(col("doc_id"), bfL).as("l"))
    bp.agg(sum(when(col("s"), 1).otherwise(0)),
      sum(when(col("l"), 1).otherwise(0))).head()
    println("[8] bloom_might_contain (string + long) OK under forced codegen")

    val cu = docs.select(canonicalize_url(
      concat(lit("HTTP://Ex.COM:80/p/"), col("doc_id"),
        lit("?utm_s=1&b=2&a=1#f"))).as("u"))
    cu.agg(count(col("u"))).head()
    println("[9] canonicalize_url OK under forced codegen")

    val dr = docs.select(deflate_ratio(col("text")).as("r"))
    dr.agg(min(col("r")), max(col("r"))).head()
    println("[10] deflate_ratio OK under forced codegen")

    val bank = graft.text.BloomDedup.buildBank(
      docs.select(md5(col("text")).as("k")), "k", shards = 4)
    val bp2 = docs.select(
      bloom_bank_might_contain(md5(col("text")), bank).as("s"),
      bloom_bank_might_contain(col("doc_id"), graft.text.BloomDedup
        .buildBank(docs.select(col("doc_id").as("k")), "k", 4)).as("l"))
    bp2.agg(sum(when(col("s"), 1).otherwise(0)),
      sum(when(col("l"), 1).otherwise(0))).head()
    println("[11] bloom_bank_might_contain (string + long) OK under forced codegen")

    val mj = docs.select(fix_mojibake(
      decode(encode(col("text"), "UTF-8"), "ISO-8859-1")).as("f"))
    mj.agg(count(col("f"))).head()
    println("[12] fix_mojibake OK under forced codegen")

    val hc = docs.select(hash_containment(
      shingle_hashes(col("text"), 3),
      shingle_hashes(reverse(col("text")), 3)).as("c"))
    hc.agg(min(col("c")), max(col("c"))).head()
    println("[13] hash_containment OK under forced codegen")

    println("--- WholeStageCodegen spans of the minhash stage ---")
    sh.explain("formatted")
    spark.stop()
  }
}
