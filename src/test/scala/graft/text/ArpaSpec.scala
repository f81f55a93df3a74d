package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ArpaSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val dir = new java.io.File(s"target/tmp/arpa_spec/$name")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
    }
    rm(dir); dir.getParentFile.mkdirs()
    dir.getPath
  }

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val model = VocabStats.fitKnModel(docs, "text")

  test("write -> read round-trips the probability model BIT-exactly " +
       "(Double.toString shortest-repr) including missing backoffs") {
    val arpa = Arpa.fromKnModel(model)
    val path = tmp("roundtrip") + "/m.arpa"
    Arpa.write(arpa, path)
    val back = Arpa.read(spark, path)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("order", "ngram", "logprob", "backoff")
        .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(rows(back) == rows(arpa))
    // the \data\ header's counts match the sections
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    val counts = arpa.groupBy("order").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    counts.foreach { case (o, n) =>
      assert(text.contains(s"ngram $o=$n"), s"header must carry order $o")
    }
    assert(text.startsWith("\\data\\\n") && text.endsWith("\\end\\\n"))
  }

  test("self-scoring through the ARPA file matches trigramKnNll (every " +
       "corpus trigram is an entry, so the backoff chain never fires)") {
    val path = tmp("selfscore") + "/m.arpa"
    Arpa.write(Arpa.fromKnModel(model), path)
    val viaArpa = Arpa.nll(Arpa.read(spark, path), docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    val direct = VocabStats.trigramKnNll(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    assert(viaArpa.keySet == direct.keySet)
    direct.foreach { case (id, (n, nll)) =>
      val (na, nlla) = viaArpa(id)
      assert(na == n, s"doc $id trigram count")
      (nll, nlla) match {
        case (Some(x), Some(y)) =>
          // same probabilities; only the fold association differs
          // (sorted ln fold vs sum of log10), absorbed well inside 4dp
          assert(math.abs(x - y) <= 2e-4, s"doc $id: direct $x arpa $y")
        case (a, b) => assert(a == b, s"doc $id nullability")
      }
    }
  }

  test("backoff chain on UNSEEN text: missing trigram backs off through " +
       "the (w1,w2) weight; OOV continuation hits the -99 floor") {
    // tiny corpus with full trigram coverage of 'a b c a b d'
    val corpus = Seq((1L, "a b c a b d")).toDF("doc_id", "text")
    val m = VocabStats.fitKnModel(corpus, "text")
    val arpa = Arpa.fromKnModel(m).cache()
    def entry(o: Int, g: String): (Double, Option[Double]) = {
      val r = arpa.filter(col("order") === o && col("ngram") === g)
        .select("logprob", "backoff").head()
      (r.getDouble(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    }
    val ln10 = math.log(10.0)
    def score(text: String): Double =
      Arpa.nll(arpa, Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text").head().getDouble(2)
    // seen trigram: exact entry
    val (lpAbc, _) = entry(3, "a b c")
    assert(math.abs(score("a b c") - (-lpAbc * ln10)) <= 1e-4)
    // unseen trigram (c a d): backoff(c a) + p(a d -> 'd'|'a')... the
    // bigram (a d) IS an entry ('a b d' ends with d after b — check the
    // actual support first)
    val biAd = arpa.filter(col("order") === 2 && col("ngram") === "a d")
    assert(biAd.isEmpty, "a d never occurs as a trigram continuation")
    // unseen trigram whose bigram IS in support: (c, a, b): seen. Use
    // (b, a, b): backoff(b a) missing -> weight 1; bigram (a b) entry
    val (lpAb, _) = entry(2, "a b")
    assert(math.abs(score("b a b") - (-lpAb * ln10)) <= 1e-4,
      "missing (b,a) context backs off with weight 1 to the (a,b) entry")
    // OOV continuation: 'a b z' -> floor
    assert(math.abs(score("a b z") - (99.0 * ln10)) <= 1e-4)
    // present context backoff actually applies: (a b) has a backoff
    // weight (it is a trigram history); trigram (x a b) missing ->
    // chain = bo(?) ... context (x a) missing -> weight 1 -> bigram
    // (a b). Same value as above but through the x-prefixed path
    assert(math.abs(score("x a b") - (-lpAb * ln10)) <= 1e-4)
    arpa.unpersist()
    ()
  }

  // ---- arbitrary-order interchange: fromMknModel (KenLM's production
  // artifact is an ORDER-5 modified-KN .arpa) ----

  private lazy val mkn5 = VocabStats.fitMknModel(docs, "text", order = 5)

  test("fromMknModel order 5: write -> read round-trips BIT-exactly " +
       "with per-order header counts and five sections") {
    val arpa = Arpa.fromMknModel(mkn5, order = 5)
    val path = tmp("mkn5_roundtrip") + "/m.arpa"
    Arpa.write(arpa, path)
    val back = Arpa.read(spark, path)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("order", "ngram", "logprob", "backoff")
        .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(rows(back) == rows(arpa))
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    val counts = arpa.groupBy("order").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set(1, 2, 3, 4, 5))
    counts.foreach { case (o, n) =>
      assert(text.contains(s"ngram $o=$n"), s"header must carry order $o")
    }
  }

  test("fromMknModel at any order: each section's support is the " +
       "distinct top-order SUFFIX set, and a k-gram entry carries a " +
       "backoff weight exactly where its words occur as a " +
       "level-(k+1) CONTEXT; the top order carries none") {
    for (n <- Seq(3, 4)) {
      val m = VocabStats.fitMknModel(docs, "text", order = n)
      val arpa = Arpa.fromMknModel(m, order = n).cache()
      val top = arpa.filter(col("order") === n)
      assert(top.filter(col("backoff").isNotNull).isEmpty,
        s"order $n: top section must carry no backoff")
      val tops = top.select("ngram").collect().map(_.getString(0))
      def sfx(g: String, k: Int) = g.split(" ").takeRight(k).mkString(" ")
      def ctx(g: String, k: Int) =
        g.split(" ").dropRight(1).takeRight(k).mkString(" ")
      for (k <- 1 until n) {
        val sec = arpa.filter(col("order") === k)
          .select("ngram", "backoff").collect()
          .map(r => r.getString(0) ->
            (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
        // support = distinct suffixes of the top section
        assert(sec.keySet == tops.map(sfx(_, k)).toSet,
          s"order $n section $k support")
        // backoff attachment rule: present iff the words occur as a
        // level-(k+1) context (= positions N-k..N-1 of some top entry)
        val contexts = tops.map(ctx(_, k)).toSet
        sec.foreach { case (g, bo) =>
          assert(bo.isDefined == contexts(g),
            s"order $n: $k-gram '$g' backoff presence")
        }
      }
      arpa.unpersist()
    }
  }

  test("fromMknModel top section self-scores identically to " +
       "mknNllFromModel on in-support text (entry probabilities are " +
       "the interpolated probabilities the engine folds)") {
    import org.apache.spark.sql.functions.{filter => afilter}
    val n = 5
    val arpa = Arpa.fromMknModel(mkn5, order = n)
    val top = arpa.filter(col("order") === n)
      .select(col("ngram"), col("logprob"))
    // doc 5-gram stream with the engine's tokenizer
    val ws = docs.select(col("doc_id"),
      afilter(split(lower(col("text")), "\\s+"), w => length(w) > 0)
        .as("__ws"))
    val grams = ws.select(col("doc_id"), explode(transform(
        slice(col("__ws"), lit(1),
          greatest(size(col("__ws")) - (n - 1), lit(0))),
        (w, i) => concat_ws(" ",
          w +: (2 to n).map(j => element_at(col("__ws"), i + j)): _*)))
      .as("ngram"))
    val ln10 = math.log(10.0)
    val viaArpa = grams.join(top, Seq("ngram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_ngrams"),
        round(-sum(col("logprob") * lit(ln10)) / count(lit(1)), 4)
          .as("nll"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val direct = VocabStats.mknNllFromModel(mkn5, docs, "doc_id", "text",
        order = n)
      .filter(col("n_ngrams") > 0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(viaArpa.keySet == direct.keySet)
    direct.foreach { case (id, (cnt, nll)) =>
      val (ca, nlla) = viaArpa(id)
      assert(ca == cnt, s"doc $id 5-gram count")
      // identical probabilities; only fold association differs (sorted
      // ln fold vs sum of log10), absorbed well inside 4dp
      assert(math.abs(nll - nlla) <= 2e-4, s"doc $id: $nll vs $nlla")
    }
  }

  test("generic backoff chain (order 4): entry hit, single-level " +
       "backoff, full fall-through to the unigram, and the OOV floor") {
    val corpus = Seq((1L, "a b c d a b c e")).toDF("doc_id", "text")
    val m = VocabStats.fitMknModel(corpus, "text", order = 4)
    val arpa = Arpa.fromMknModel(m, order = 4).cache()
    def lp(o: Int, g: String): Double =
      arpa.filter(col("order") === o && col("ngram") === g)
        .select("logprob").head().getDouble(0)
    def score(text: String): Double =
      Arpa.nll(arpa, Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", order = 4).head().getDouble(2)
    val ln10 = math.log(10.0)
    // direct 4-gram entry
    assert(math.abs(score("a b c d") - (-lp(4, "a b c d") * ln10)) <= 1e-4)
    // (x b c d): 4-gram absent, context (x b c) absent -> weight 1 ->
    // trigram entry (b c d)
    assert(math.abs(score("x b c d") - (-lp(3, "b c d") * ln10)) <= 1e-4)
    // (x y z d): falls all the way through to the unigram (d)
    assert(math.abs(score("x y z d") - (-lp(1, "d") * ln10)) <= 1e-4)
    // (c a b c): 4-gram absent, (c a b) not an entry -> weight 1 ->
    // trigram (a b c) present
    assert(math.abs(score("c a b c") - (-lp(3, "a b c") * ln10)) <= 1e-4)
    // OOV continuation: the -99 floor
    assert(math.abs(score("a b c q") - (99.0 * ln10)) <= 1e-4)
    arpa.unpersist()
    ()
  }

  test("order-5 self-scoring through the generic chain matches " +
       "mknNllFromModel (every corpus 5-gram is an entry, the chain " +
       "never fires)") {
    val arpa = Arpa.fromMknModel(mkn5, order = 5)
    val viaArpa = Arpa.nll(arpa, docs, "doc_id", "text", order = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    val direct = VocabStats.mknNllFromModel(mkn5, docs, "doc_id", "text",
        order = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    assert(viaArpa.keySet == direct.keySet)
    direct.foreach { case (id, (cnt, nll)) =>
      val (ca, nlla) = viaArpa(id)
      assert(ca == cnt, s"doc $id 5-gram count")
      (nll, nlla) match {
        case (Some(x), Some(y)) =>
          assert(math.abs(x - y) <= 2e-4, s"doc $id: direct $x arpa $y")
        case (a, b) => assert(a == b, s"doc $id nullability")
      }
    }
  }

  test("read tolerates a hand-written KenLM-style file (headers, blank " +
       "lines, no trailing backoffs on the top order)") {
    val dir = tmp("handwritten")
    val path = s"$dir/hand.arpa"
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      ("\\data\\\nngram 1=2\nngram 2=1\n\n\\1-grams:\n" +
        "-0.30103\tthe\t-0.25\n-1.0\tcat\n\n\\2-grams:\n" +
        "-0.5\tthe cat\n\n\\end\\\n").getBytes("UTF-8"))
    val back = Arpa.read(spark, path).orderBy("order", "ngram")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(back == Seq(
      (1, "cat", -1.0, None),
      (1, "the", -0.30103, Some(-0.25)),
      (2, "the cat", -0.5, None)))
  }

  test("sharded layout: writeSharded -> read round-trips BIT-exactly, " +
       "the manifest covers every section, and assemble reproduces the " +
       "single-file bytes identically") {
    val arpa = Arpa.fromKnModel(model)
    val dir = tmp("sharded")
    // small rowsPerShard to force genuinely multi-shard sections
    Arpa.writeSharded(arpa, dir, rowsPerShard = 500L)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("order", "ngram", "logprob", "backoff")
        .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(rows(Arpa.read(spark, dir)) == rows(arpa))
    // manifest: counts match the frame, files exist, >1 shard somewhere
    val mf = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, "manifest.json")))
    assert(mf.path("format").asText() == "graft-arpa-sharded")
    val counts = arpa.groupBy("order").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val it = mf.path("orders").elements()
    var nFiles = 0
    var seen = Set.empty[Int]
    while (it.hasNext) {
      val o = it.next()
      seen += o.path("order").asInt()
      assert(o.path("count").asLong() == counts(o.path("order").asInt()))
      val fit = o.path("files").elements()
      while (fit.hasNext) {
        nFiles += 1
        assert(java.nio.file.Files.exists(
          java.nio.file.Paths.get(dir, fit.next().asText())))
      }
    }
    assert(seen == counts.keySet)
    assert(nFiles > counts.size, "rowsPerShard=500 must force >1 shard")
    // assemble == write, byte for byte (the external-consumer contract)
    val single = tmp("sharded-single") + "/m.arpa"
    new java.io.File(single).getParentFile.mkdirs()
    Arpa.write(arpa, single)
    val asm = tmp("sharded-asm") + "/m.arpa"
    new java.io.File(asm).getParentFile.mkdirs()
    Arpa.assemble(spark, dir, asm)
    val a = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(asm))
    val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(single))
    assert(java.util.Arrays.equals(a, b),
      s"assembled ${a.length}B != single-file ${b.length}B")
  }
}
