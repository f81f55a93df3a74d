package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ARPA n-gram interchange (the Doug Paul / MIT-LL text format every LM
  * toolchain speaks — KenLM, SRILM, IRSTLM read and emit it): a `\data\`
  * header with per-order counts, then one `\N-grams:` section per order
  * of `log10prob<TAB>w1 … wN[<TAB>log10backoff]` lines, `\end\` last.
  * This is the interchange layer for [[VocabStats.fitKnModel]] — the
  * fit-once/score-many split's PORTABLE leg, alongside the parquet
  * count-model (hash-exact serving) the declared query uses.
  *
  * In-engine the ARPA model is a DataFrame of
  * `(order INT, ngram STRING, logprob DOUBLE, backoff DOUBLE?)` — the
  * row form the sections flatten to (order is recoverable from the
  * ngram's word count, which is how [[read]] parses files without
  * tracking section state).
  *
  * Probabilities serialize via `Double.toString` (the shortest string
  * that round-trips the IEEE value), so write → read is BIT-exact —
  * pinned by ArpaSpec. Standard ARPA conventions: a missing backoff
  * field means backoff weight 1 (log10 = 0); the top order carries no
  * backoff; `-99` is the customary stand-in for log10(0) entries
  * ([[fromKnModel]] never needs it — KN continuation probabilities of
  * entries in the model's support are positive).
  *
  * Scale shape: an .arpa is a MODEL artifact (type mass, not corpus
  * mass). [[write]] streams one sorted section at a time through a
  * single Hadoop-FS file via `toLocalIterator` — only one partition of
  * model rows is resident at once, matching the repo's model-sized
  * collect rule; [[read]] parses distributed (`spark.read.text`, every
  * data line self-describing).
  */
object Arpa {

  /** The probability VIEW of a [[VocabStats.fitKnModel]] count table,
    * in interpolated-KN backoff form (Chen & Goodman 1999: interpolated
    * models written as ARPA store the INTERPOLATED probability on each
    * entry and the discount mass as the context's backoff weight):
    *
    *  - 3-grams: every model row, p(w3|w1w2) — the full interpolated
    *    trigram probability (what self-scoring folds).
    *  - 2-grams: every distinct (w2,w3), p(w3|w2) — the interpolated
    *    middle order; backoff γ(w2,w3) = d·N1+(w2w3·)/c(w2w3) attached
    *    where the pair also occurs as a trigram HISTORY (absent pairs
    *    back off with weight 1, the ARPA missing-field rule).
    *  - 1-grams: every distinct w3, p(w) = N1+(·w)/N1+(··); backoff
    *    γ(w) = d·N1+(w·)/N1+(·w·) attached where the word occurs as a
    *    bigram context.
    *
    * Support is the trigram model's own: words/pairs that never occur
    * inside a trigram are not entries (the model never scores them).
    */
  def fromKnModel(model: DataFrame, discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"need 0 < discount < 1, got $discount")
    val d = lit(discount)
    val log10e = lit(1.0 / math.log(10.0)) // ln → log10
    def l10(p: org.apache.spark.sql.Column) = log(p) * log10e

    val uniP = l10(col("cc1") / col("b")).as("logprob")
    val pmid =
      greatest(col("cc2") - d, lit(0.0)) / col("nmid") +
        d * col("n2f") / col("nmid") * (col("cc1") / col("b"))
    val ptri =
      greatest(col("c3") - d, lit(0.0)) / col("ch") +
        d * col("n3f") / col("ch") * pmid

    // per-word and per-pair slices of the model (type mass throughout)
    val uni = model.select(col("w3"), col("cc1"), col("b")).distinct()
      .select(lit(1).as("order"), col("w3").as("ngram"), uniP)
    // backoff of the unigram CONTEXT w: γ(w) = d·n2f(w)/nmid(w)
    val uniBo = model.select(col("w2").as("ngram"),
        (l10(d * col("n2f") / col("nmid"))).as("backoff")).distinct()
    val bi = model.select(col("w2"), col("w3"), col("cc2"), col("nmid"),
        col("n2f"), col("cc1"), col("b")).distinct()
      .select(lit(2).as("order"),
        concat_ws(" ", col("w2"), col("w3")).as("ngram"),
        l10(pmid).as("logprob"))
    // backoff of the bigram CONTEXT (w1,w2): γ = d·n3f/ch
    val biBo = model.select(
        concat_ws(" ", col("w1"), col("w2")).as("ngram"),
        l10(d * col("n3f") / col("ch")).as("backoff")).distinct()
    val tri = model.select(lit(3).as("order"),
      concat_ws(" ", col("w1"), col("w2"), col("w3")).as("ngram"),
      l10(ptri).as("logprob"))

    uni.join(uniBo, Seq("ngram"), "left")
      .select(col("order"), col("ngram"), col("logprob"), col("backoff"))
      .unionByName(bi.join(biBo, Seq("ngram"), "left")
        .select(col("order"), col("ngram"), col("logprob"), col("backoff")))
      .unionByName(tri.withColumn("backoff",
        lit(null).cast("double")))
  }

  /** The probability VIEW of a [[VocabStats.fitMknModel]] count table at
    * ANY order — the interchange form of KenLM's actual production
    * artifact (an order-5 modified-KN `.arpa`; `lmplz` emits exactly
    * this shape). Generalizes the trigram [[fromKnModel]] section
    * construction to N sections:
    *
    *  - N-grams: every model row, the full interpolated top-order
    *    probability (what [[VocabStats.mknNllFromModel]] folds); no
    *    backoff field (the ARPA top-order rule).
    *  - k-grams (1 ≤ k < N): every distinct length-k SUFFIX
    *    (w_{N−k+1} … w_N) with the interpolated level-k probability —
    *    well-defined per suffix because every count p_k reads
    *    (cc_j, den_j, m_j·, cc1, b) is keyed by suffix positions.
    *    Backoff: γ of the SAME k words read as the level-(k+1)
    *    CONTEXT (w_{N−k} … w_{N−1}) — γ_{k+1} = (D1·m1 + D2·m2 +
    *    D3·m3)/den for middle levels, (D1·n1h + D2·n2h + D3·n3h)/ch
    *    for the top — attached where those words occur as a context,
    *    absent entries backing off with weight 1 (the ARPA
    *    missing-field rule). The per-order (D1, D2, D3) evaluate from
    *    the model's constant stat columns with the same
    *    unsound-estimate → 0.75 fallback the scorer applies, so the
    *    view is consistent with in-engine serving.
    *
    * Support is the top-order model's own (suffixes that never occur
    * inside a top-order n-gram are not entries — the model never
    * scores them). A context whose removed mass is exactly zero writes
    * the customary `-99` stand-in rather than log10(0).
    *
    * DELIBERATE DEVIATION from `lmplz`: backoffs attach via a left
    * join FROM the suffix-entry set, so a k-gram occurring ONLY as a
    * level-(k+1) context (e.g. a document-initial window that never
    * appears in suffix position) is not an entry and its computed
    * gamma is dropped — external consumers back off with weight 1
    * there (the ARPA missing-field rule), where lmplz would union the
    * context into the entry set and emit its gamma. Round-trip,
    * self-scoring, and the DuckDB oracle are unaffected (none evaluate
    * the dropped branch); pinned by ArpaSpec.
    *
    * Scale shape: per-section `distinct()` over suffix columns — type
    * mass shrinking with k; no corpus-mass work.
    */
  def fromMknModel(model: DataFrame, order: Int): DataFrame = {
    val n = order
    require(n >= 3 && n <= 8, s"need 3 <= order <= 8, got $n")
    (1 to n).foreach(j => require(model.columns.contains(s"w$j"),
      s"model lacks column w$j — was it fit at order $n?"))
    require(!model.columns.contains(s"w${n + 1}"),
      s"model carries w${n + 1} — it was fit at a higher order than $n")
    val log10e = lit(1.0 / math.log(10.0))
    def l10(p: org.apache.spark.sql.Column) = log(p) * log10e

    // per-order discounts from the constant stat columns — the exact
    // expression [[VocabStats.mknNllFromModel]] evaluates (incl. the
    // unsound-estimate fallback to the single 0.75 discount)
    type C = org.apache.spark.sql.Column
    def discounts(k: Int): (C, C, C) = {
      val s1 = col(s"s${k}1"); val s2 = col(s"s${k}2")
      val s3 = col(s"s${k}3"); val s4 = col(s"s${k}4")
      val ok = s1 > 0 && s2 > 0 && s3 > 0 && s4 > 0
      val y = when(s1 > 0, s1 / (s1 + lit(2L) * s2)).otherwise(lit(0.0))
      val r1 = when(ok, lit(1.0) - lit(2.0) * y * s2 / s1).otherwise(lit(0.75))
      val r2 = when(ok, lit(2.0) - lit(3.0) * y * s3 / s2).otherwise(lit(0.75))
      val r3 = when(ok, lit(3.0) - lit(4.0) * y * s4 / s3).otherwise(lit(0.75))
      val sound = ok && r1 >= 0.0 && r1 <= 1.0 &&
        r2 >= 0.0 && r2 <= 2.0 && r3 >= 0.0 && r3 <= 3.0
      (when(sound, r1).otherwise(lit(0.75)),
        when(sound, r2).otherwise(lit(0.75)),
        when(sound, r3).otherwise(lit(0.75)))
    }
    val dsc = (2 to n).map(k => k -> discounts(k)).toMap
    def disc(c: C, t: (C, C, C)): C =
      when(c === 1, t._1).when(c === 2, t._2).otherwise(t._3)

    // interpolated level-k probability over a model row (suffix-keyed)
    def pk(k: Int): C =
      if (k == 1) col("cc1") / col("b")
      else if (k < n) {
        val e = dsc(k)
        (col(s"cc$k") - disc(col(s"cc$k"), e)) / col(s"den$k") +
          (e._1 * col(s"m${k}1") + e._2 * col(s"m${k}2") +
            e._3 * col(s"m${k}3")) / col(s"den$k") * pk(k - 1)
      } else {
        val e = dsc(n)
        (col("c") - disc(col("c"), e)) / col("ch") +
          (e._1 * col("n1h") + e._2 * col("n2h") +
            e._3 * col("n3h")) / col("ch") * pk(n - 1)
      }

    def sfx(k: Int): Seq[C] = (n - k + 1 to n).map(j => col(s"w$j"))
    def ctx(k: Int): Seq[C] = (n - k to n - 1).map(j => col(s"w$j"))

    def entries(k: Int): DataFrame = model
      .select(concat_ws(" ", sfx(k): _*).as("ngram"),
        l10(pk(k)).as("logprob")).distinct()
      .select(lit(k).as("order"), col("ngram"), col("logprob"))
    def backoffs(k: Int): DataFrame = {
      val g: C = if (k + 1 == n) {
        val e = dsc(n)
        (e._1 * col("n1h") + e._2 * col("n2h") + e._3 * col("n3h")) /
          col("ch")
      } else {
        val e = dsc(k + 1)
        (e._1 * col(s"m${k + 1}1") + e._2 * col(s"m${k + 1}2") +
          e._3 * col(s"m${k + 1}3")) / col(s"den${k + 1}")
      }
      model.select(concat_ws(" ", ctx(k): _*).as("ngram"),
        when(g > 0, l10(g)).otherwise(lit(-99.0)).as("backoff"))
        .distinct()
    }

    val top = model.select(lit(n).as("order"),
      concat_ws(" ", (1 to n).map(j => col(s"w$j")): _*).as("ngram"),
      l10(pk(n)).as("logprob"), lit(null).cast("double").as("backoff"))
    (1 until n).map { k =>
      entries(k).join(backoffs(k), Seq("ngram"), "left")
        .select(col("order"), col("ngram"), col("logprob"),
          col("backoff"))
    }.reduce(_ unionByName _).unionByName(top)
  }

  /** Write the `(order, ngram, logprob, backoff)` frame as one `.arpa`
    * file (ngram-sorted sections for determinism). Model-sized driver
    * streaming — see the object doc.
    */
  def write(arpa: DataFrame, path: String): Unit = {
    val spark = arpa.sparkSession
    val counts = arpa.groupBy("order").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val orders = counts.keys.toSeq.sorted
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      fs.create(p, true), java.nio.charset.StandardCharsets.UTF_8), 1 << 16)
    try {
      out.write("\\data\\\n")
      orders.foreach(o => out.write(s"ngram $o=${counts(o)}\n"))
      // ONE global (order, ngram) sort streamed once through the
      // driver, section markers emitted at order boundaries — not a
      // sort + full-plan re-evaluation per section (at order 5 the
      // per-section form re-ran the model-mass plan five times and
      // dominated the export; byte-identical output either way).
      // Partitions are sized to the MODEL (~500k rows each, ≥1):
      // toLocalIterator launches one fetch job per partition, so a
      // session-width sort of a small model pays width-many job
      // latencies for nothing (measured 9.5 s → ~1 s on a 36k-row
      // ARPA); range partitions ascend with the sort key, so global
      // order is preserved at any width.
      val total = counts.values.sum
      val parts = math.max(1L, math.min(200L, (total + 499999L) / 500000L))
        .toInt
      val it = arpa
        .select(col("order"), col("logprob"), col("ngram"), col("backoff"))
        .repartitionByRange(parts, col("order"), col("ngram"))
        .sortWithinPartitions("order", "ngram").toLocalIterator()
      var cur = Int.MinValue
      while (it.hasNext) {
        val r = it.next()
        val o = r.getInt(0)
        if (o != cur) { out.write(s"\n\\$o-grams:\n"); cur = o }
        out.write(r.getDouble(1).toString)
        out.write('\t')
        out.write(r.getString(2))
        if (!r.isNullAt(3)) { out.write('\t'); out.write(r.getDouble(3).toString) }
        out.write('\n')
      }
      out.write("\n\\end\\\n")
    } finally out.close()
  }

  /** [[write]]'s single driver-streamed file is the right FORMAT (one
    * sorted text file is what external toolchains consume) but the only
    * serial stage left in the quality ladder — a production order-5
    * model is tens of GB of type mass. `writeSharded` is the scale
    * path: each order's section splits into `ceil(n/rowsPerShard)`
    * range-partitioned, within-shard-sorted shard files written IN
    * PARALLEL by executors (`df.write.text`, no driver streaming at
    * all), plus a `manifest.json` recording per-order counts and the
    * shard files in global ngram order. Lines are byte-identical to
    * [[write]]'s (`Double.toString` shortest-repr), so
    * [[assemble]]-ing the shards reproduces the single-file form
    * BIT-exactly, and [[read]] accepts the sharded directory directly
    * (the manifest is detected; data lines stay self-describing).
    */
  def writeSharded(arpa: DataFrame, dir: String,
                   rowsPerShard: Long = 500000L): Unit = {
    require(rowsPerShard > 0, s"need rowsPerShard > 0, got $rowsPerShard")
    val spark = arpa.sparkSession
    val counts = arpa.groupBy("order").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val orders = counts.keys.toSeq.sorted
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(root, true)
    fs.mkdirs(root)
    val fmt = org.apache.spark.sql.Encoders.STRING
    val manifest = orders.map { o =>
      val n = counts(o)
      val parts = math.max(1L, (n + rowsPerShard - 1L) / rowsPerShard)
        .toInt
      val sec = arpa.filter(col("order") === o)
        .select(col("logprob"), col("ngram"), col("backoff"))
        .repartitionByRange(parts, col("ngram"))
        .sortWithinPartitions("ngram")
        // exact Double.toString formatting, matching [[write]] byte for
        // byte (a cast-to-string column would follow Spark's cast
        // rules, not Java's shortest-repr)
        .map { r =>
          val sb = new java.lang.StringBuilder(64)
          sb.append(java.lang.Double.toString(r.getDouble(0)))
          sb.append('\t').append(r.getString(1))
          if (!r.isNullAt(2))
            sb.append('\t').append(java.lang.Double.toString(r.getDouble(2)))
          sb.toString
        }(fmt)
      sec.write.mode("overwrite").text(s"$dir/order=$o")
      // list what actually landed (empty tasks may write no file);
      // part-file names ascend with partition id, and range partitions
      // ascend with the sort key, so filename order IS global order
      val files = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/order=$o"))
        .map(_.getPath.getName)
        .filter(f => f.startsWith("part-") && !f.endsWith(".crc"))
        .sorted.toSeq
      (o, n, files)
    }
    val json = {
      val secs = manifest.map { case (o, n, files) =>
        val named = files.map(f => "\"order=" + o + "/" + f + "\"")
        s"""{"order":$o,"count":$n,"files":${named.mkString("[", ",", "]")}}"""
      }
      s"""{"format":"graft-arpa-sharded","version":1,"orders":${secs.mkString("[", ",", "]")}}"""
    }
    val out = fs.create(new org.apache.hadoop.fs.Path(root, "manifest.json"),
      true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Reassemble a [[writeSharded]] directory into the single-file form
    * for external consumers — a pure byte-copy concatenation (header
    * from the manifest counts, shard files streamed in manifest order,
    * section markers at order boundaries), never recomputing the
    * model. Output is BIT-identical to what [[write]] would have
    * produced from the same frame (pinned by ArpaSpec).
    */
  def assemble(spark: SparkSession, shardedDir: String,
               outPath: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(shardedDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mf = readManifest(fs, root)
    val p = new org.apache.hadoop.fs.Path(outPath)
    val out = new java.io.BufferedOutputStream(fs.create(p, true), 1 << 16)
    try {
      def w(s: String): Unit =
        out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      w("\\data\\\n")
      mf.foreach { case (o, n, _) => w(s"ngram $o=$n\n") }
      mf.foreach { case (o, _, files) =>
        w(s"\n\\$o-grams:\n")
        files.foreach { f =>
          val in = fs.open(new org.apache.hadoop.fs.Path(root, f))
          try {
            val buf = new Array[Byte](1 << 16)
            var k = in.read(buf)
            while (k >= 0) { if (k > 0) out.write(buf, 0, k); k = in.read(buf) }
          } finally in.close()
        }
      }
      w("\n\\end\\\n")
    } finally out.close()
  }

  /** Parse `manifest.json` → ordered (order, count, files). */
  private def readManifest(fs: org.apache.hadoop.fs.FileSystem,
                           root: org.apache.hadoop.fs.Path)
      : Seq[(Int, Long, Seq[String])] = {
    val in = fs.open(new org.apache.hadoop.fs.Path(root, "manifest.json"))
    val bytes =
      try {
        val bo = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](1 << 16)
        var k = in.read(buf)
        while (k >= 0) { if (k > 0) bo.write(buf, 0, k); k = in.read(buf) }
        bo.toByteArray
      } finally in.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(bytes)
    require(node.path("format").asText() == "graft-arpa-sharded",
      s"not a sharded .arpa manifest: ${node.path("format").asText()}")
    val it = node.path("orders").elements()
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, Seq[String])]
    while (it.hasNext) {
      val o = it.next()
      val fit = o.path("files").elements()
      val files = scala.collection.mutable.ArrayBuffer.empty[String]
      while (fit.hasNext) files += fit.next().asText()
      out += ((o.path("order").asInt(), o.path("count").asLong(),
        files.toSeq))
    }
    out.sortBy(_._1).toSeq
  }

  /** Read an `.arpa` back to the `(order, ngram, logprob, backoff)`
    * frame. Distributed: every data line is self-describing
    * (`float<TAB>words[<TAB>float]` — the order is the ngram's word
    * count), so no section-state tracking is needed and the text source
    * parallelizes freely. Header (`ngram N=...`), section markers, and
    * blank lines filter out structurally. A [[writeSharded]] directory
    * (detected by its `manifest.json`) reads the same way, over the
    * shard files.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a manifest under the path marks the sharded layout (under a
    // FILE path the child can't exist, so no isDirectory probe needed)
    val isSharded =
      fs.exists(new org.apache.hadoop.fs.Path(root, "manifest.json"))
    val lines =
      if (isSharded) spark.read.text(s"$path/order=*")
      else spark.read.text(path)
    lines
      .filter(col("value").contains("\t"))
      .select(split(col("value"), "\t").as("f"))
      .select(
        size(split(element_at(col("f"), 2), " ")).as("order"),
        element_at(col("f"), 2).as("ngram"),
        element_at(col("f"), 1).cast("double").as("logprob"),
        when(size(col("f")) >= 3, element_at(col("f"), 3).cast("double"))
          .as("backoff"))
  }

  /** Score documents against an ARPA model of ANY order with the FULL
    * backoff chain (what a KenLM consumer does for text the model has
    * never seen): p(w_N|w_1..w_{N−1}) = the N-gram entry if present,
    * else backoff(w_1..w_{N−1}) · p(w_N|w_2..w_{N−1}) recursively down
    * to the unigram, missing contexts backing off with weight 1 (the
    * ARPA missing-field rule); n-grams whose whole chain is absent
    * (OOV continuation) score `floorLog10` (the `-99` convention).
    * Output shape `(idCol, n_ngrams, nll)` with nll = −mean ln p
    * rounded to 4.
    *
    * Scale shape: 2N−1 broadcast-or-hash joins of the doc n-gram
    * stream against model-sized section slices (each section joins
    * once as the ENTRY at suffix positions and once as the CONTEXT
    * backoff one position left) — the model never shuffles at corpus
    * mass, the text is never re-counted.
    */
  def nll(arpa: DataFrame, df: DataFrame, idCol: String, textCol: String,
          floorLog10: Double = -99.0, order: Int = 3): DataFrame = {
    val n = order
    require(n >= 2 && n <= 8, s"need 2 <= order <= 8, got $n")
    val ws = df.select(col(idCol),
      filter(split(lower(col(textCol)), "\\s+"), w => length(w) > 0)
        .as("__ws"))
    val tg = ws.select(col(idCol), explode(transform(
        slice(col("__ws"), lit(1),
          greatest(size(col("__ws")) - (n - 1), lit(0))),
        (w, i) => struct(w.as("g1") +: (2 to n).map(j =>
          element_at(col("__ws"), i + j).as(s"g$j")): _*))).as("__t"))
      .select(col(idCol) +:
        (1 to n).map(j => col(s"__t.g$j").as(s"__w$j")): _*)

    def sec(k: Int): DataFrame = arpa.filter(col("order") === k).select(
      split(col("ngram"), " ").as("__p"),
      col("logprob").as(s"__lp$k"), col("backoff").as(s"__bo$k"))

    var joined = tg
    // entry joins: section k keyed at suffix positions N−k+1..N
    for (k <- n to 1 by -1) {
      val e = sec(k).select((1 to k).map(i =>
        element_at(col("__p"), i).as(s"__w${n - k + i}")) :+
        col(s"__lp$k"): _*)
      // broadcast: sections are MODEL mass; without the hint a
      // file-read arpa's size estimate falls to sort-merge and
      // shuffles the corpus n-gram stream once per section
      joined = joined.join(broadcast(e),
        (n - k + 1 to n).map("__w" + _), "left")
    }
    // context-backoff joins: section j keyed one position LEFT
    // (N−j..N−1) — the weight paid when the (j+1)-gram entry is absent
    for (j <- 1 until n) {
      val b = sec(j).select((1 to j).map(i =>
        element_at(col("__p"), i).as(s"__w${n - j - 1 + i}")) :+
        col(s"__bo$j").as(s"__boc$j"): _*)
      joined = joined.join(broadcast(b),
        (n - j to n - 1).map("__w" + _), "left")
    }
    // the chain, unigram outward; a null anywhere below propagates so
    // the outer coalesce lands on the floor exactly when the whole
    // chain is absent
    var chain: org.apache.spark.sql.Column = col("__lp1")
    for (k <- 2 to n)
      chain = coalesce(col(s"__lp$k"),
        coalesce(col(s"__boc${k - 1}"), lit(0.0)) + chain)
    val lp = coalesce(chain, lit(floorLog10))
    val ln10 = math.log(10.0)
    val scored = joined
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        round(-sum(lp * lit(ln10)) / count(lit(1)), 4).as("nll"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_ngrams"), lit(0L)).as("n_ngrams"), col("nll"))
  }
}
