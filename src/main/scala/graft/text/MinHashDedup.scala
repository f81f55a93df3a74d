package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded-LSH near-duplicate detection, the standard web-scale
  * text-dedup pipeline (shingle → minhash signature → band buckets →
  * bucket join → exact-Jaccard verify).
  *
  * Scale shape (the whole point of LSH): no pairwise comparison ever
  * happens outside a bucket. The per-document work is one scan computing
  * the signature (numHashes × |shingles| codegen'd xxhash64 evals); the
  * explode multiplies rows by `bands` (not by numHashes); the candidate
  * join shuffles on (band, bandHash) — near-duplicates collide, everything
  * else spreads uniformly. Degenerate buckets (boilerplate cliques) are
  * capped by `maxBucketSize` so one pathological key can't produce a
  * quadratic bucket — the cap is logged in the result's lineage rather than
  * silently applied: capped buckets are dropped whole, which only ever
  * *misses* near-dup pairs inside mega-cliques (those are better handled by
  * exact dedup of their shared boilerplate first).
  *
  * With numHashes=64 and bands=16 (r=4), the detection probability at
  * Jaccard 0.8 is 1-(1-0.8^4)^16 ≈ 0.9997; at 0.3 it is ≈ 0.12 — the usual
  * S-curve. Tune bands/rows for other thresholds.
  */
object MinHashDedup {

  /** Pick `(bands, rowsPerBand)` for a target Jaccard `threshold` and a
    * signature budget of `numHashes` — the standard S-curve fit every
    * LSH deployment needs (datasketch's `MinHashLSH` solves the same
    * optimization; re-derived here from the published objective): the
    * candidate probability of a pair at similarity s under (b, r)
    * banding is `P(s) = 1 − (1 − s^r)^b`, and the chosen split
    * minimizes
    * `fnWeight·∫_t^1 (1−P) ds + fpWeight·∫_0^t P ds`
    * (midpoint rule, 1000 cells — deterministic), i.e. missed true
    * pairs above the threshold plus spurious candidates below it.
    * Only exact divisors of `numHashes` are considered so the banding
    * actually tiles the signature. Driver-side arithmetic over ≤
    * numHashes candidates — nothing distributed to tune.
    */
  def tuneBands(threshold: Double, numHashes: Int = 64,
                fpWeight: Double = 0.5, fnWeight: Double = 0.5)
      : (Int, Int) = {
    require(threshold > 0 && threshold < 1,
      s"need 0 < threshold < 1, got $threshold")
    require(numHashes >= 2, s"need numHashes >= 2, got $numHashes")
    require(fpWeight >= 0 && fnWeight >= 0 && fpWeight + fnWeight > 0,
      "need non-negative weights, not both zero")
    val cells = 1000
    def candidateP(s: Double, b: Int, r: Int): Double =
      1.0 - math.pow(1.0 - math.pow(s, r), b)
    def cost(b: Int, r: Int): Double = {
      var fp = 0.0
      var fn = 0.0
      var i = 0
      while (i < cells) {
        val s = (i + 0.5) / cells
        val p = candidateP(s, b, r)
        if (s < threshold) fp += p else fn += 1.0 - p
        i += 1
      }
      (fpWeight * fp + fnWeight * fn) / cells
    }
    val splits = (1 to numHashes)
      .filter(numHashes % _ == 0)
      .map(b => (b, numHashes / b))
    splits.minBy { case (b, r) => (cost(b, r), b) }
  }

  /** w-shingles from an already-tokenized array. Pass an ATTRIBUTE (a
    * staged projection column): `toks` is referenced four times here, and
    * an inline expression subtree would be recomputed four times per row —
    * tokenization is the single most expensive step of the pipeline.
    */
  def shinglesFromTokens(toks: Column, w: Int = 3): Column = {
    val joined = array(concat_ws(" ", toks))
    val slid = transform(
      sequence(lit(0), size(toks) - w),
      i => concat_ws(" ", slice(toks, i + 1, lit(w))))
    array_distinct(when(size(toks) >= w, slid).otherwise(joined))
  }

  /** Lowercased word w-shingles, distinct. Documents shorter than `w`
    * words collapse to their full token join, so they can still bucket.
    * (Convenience form — recomputes tokenization 4×; prefer staging
    * [[graft.text.TextAnalysis.tokens]] + [[shinglesFromTokens]].)
    */
  def wordShingles(text: Column, w: Int = 3): Column =
    shinglesFromTokens(TextAnalysis.tokens(text), w)

  /** numHashes minhash values from PRE-HASHED shingles (`array<bigint>`).
    * Each function is xxhash64 seeded by its index over the 8-byte base
    * hash — far cheaper than re-hashing the shingle strings numHashes
    * times. Pass an attribute (not an inline expression) so the base-hash
    * subtree isn't duplicated numHashes times in the plan.
    */
  def minHashFromHashes(hashes: Column, numHashes: Int = 64): Column =
    graft.plans.expressions.minhash_sig(hashes, numHashes)

  /** numHashes-element minhash signature of a shingle array. Convenience
    * wrapper over [[minHashFromHashes]]; prefer staging `transform(shingles,
    * xxhash64)` as its own projection first when composing plans.
    */
  def minHashSignature(shingles: Column, numHashes: Int = 64): Column =
    minHashFromHashes(transform(shingles, s => xxhash64(s)), numHashes)

  /** Banded bucket keys: `bands` hashes, each over numHashes/bands
    * consecutive signature entries.
    */
  def bandHashes(signature: Column, numHashes: Int, bands: Int): Column = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val r = numHashes / bands
    array((0 until bands).map { b =>
      xxhash64(lit(b), concat_ws(",", slice(signature, b * r + 1, r)))
    }: _*)
  }

  /** Candidate near-duplicate id pairs (idA < idB) from LSH bucket
    * collisions. Distinct across bands.
    */
  /** The shingling expression: word shingles by default, character
    * n-grams when `charNgram > 0` (n-gram Jaccard mode — robust to typos
    * and word-boundary edits).
    */
  private def shingler(textCol: String, shingleWidth: Int, charNgram: Int) =
    if (charNgram > 0)
      graft.plans.expressions.char_ngram_hashes(col(textCol), charNgram)
    else
      graft.plans.expressions.shingle_hashes(col(textCol), shingleWidth)

  def candidatePairs(df: DataFrame, idCol: String, textCol: String,
                     numHashes: Int = 64, bands: Int = 16,
                     shingleWidth: Int = 3,
                     maxBucketSize: Int = 1000,
                     charNgram: Int = 0): DataFrame =
    candidatePairsFromHashes(
      df.select(col(idCol).as("__id"),
        shingler(textCol, shingleWidth, charNgram).as("__hh")),
      numHashes, bands, maxBucketSize)

  /** Candidate pairs from a pre-hashed `(__id, __hh: array<bigint>)` frame —
    * the shared entry for [[candidatePairs]] and [[nearDupPairs]], which
    * stages the (dominant-cost) shingling once and feeds both the LSH
    * banding and the verification join from the same persisted frame.
    */
  def candidatePairsFromHashes(hashed: DataFrame, numHashes: Int = 64,
                               bands: Int = 16,
                               maxBucketSize: Int = 1000): DataFrame = {
    // two tight-loop expressions: shingle hashes → signature
    // (each stage referencing the previous ATTRIBUTE; see ShingleHashes /
    // MinHashSig scaladoc for why HOF formulations were replaced)
    val signed = hashed.select(col("__id"),
      minHashFromHashes(col("__hh"), numHashes).as("__sig"))
    val banded = signed.select(col("__id"),
        posexplode(bandHashes(col("__sig"), numHashes, bands)).as(Seq("__band", "__bh")))
    // cap pathological buckets (see scaladoc)
    val bucketed = banded
      .withColumn("__bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("__band", "__bh")))
      .filter(col("__bucket_n") <= maxBucketSize)
      .drop("__bucket_n")
    val a = bucketed.select(col("__band"), col("__bh"), col("__id").as("id_a"))
    val b = bucketed.select(col("__band"), col("__bh"), col("__id").as("id_b"))
    a.join(b, Seq("__band", "__bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Exact-Jaccard-verified near-duplicate pairs: candidates whose word-
    * shingle Jaccard similarity ≥ `threshold`. Shingle sets are joined
    * back by id (two hash joins on the id — the shingle arrays never ride
    * through the bucket shuffle).
    *
    * The shingle-hash frame is computed ONCE and persisted
    * (memory-and-disk): tokenization dominates pipeline cost, and the
    * frame is consumed three times (LSH banding + both sides of the
    * verification join). The persisted frame is (id, array<bigint>) —
    * orders of magnitude smaller than the text it summarizes; Spark's
    * ContextCleaner unpersists it once the plan is no longer referenced.
    */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.8, numHashes: Int = 64,
                   bands: Int = 16, shingleWidth: Int = 3,
                   charNgram: Int = 0,
                   maxBucketSize: Int = 1000): DataFrame = {
    val hashed = df.select(col(idCol).as("__id"),
        shingler(textCol, shingleWidth, charNgram).as("__hh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = candidatePairsFromHashes(hashed, numHashes, bands, maxBucketSize)
    // verification compares 64-bit shingle-hash sets (collision odds are
    // negligible next to LSH recall; the strings are never materialized)
    val withA = cands.join(hashed.select(col("__id").as("id_a"),
      col("__hh").as("__sh_a")), Seq("id_a"))
    val withB = withA.join(hashed.select(col("__id").as("id_b"),
      col("__hh").as("__sh_b")), Seq("id_b"))
    withB
      // one-pass set-Jaccard kernel (== size(intersect)/size(union), which
      // built two hash sets and materialized two arrays per candidate)
      .withColumn("jaccard",
        graft.plans.expressions.hash_jaccard(col("__sh_a"), col("__sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Containment-verified pair detection — the doc-INSIDE-doc signal
    * symmetric Jaccard structurally misses: a page fully quoted inside a
    * 10× larger page has containment `|A∩B|/min(|A|,|B|)` = 1.0 but
    * Jaccard ≈ 0.1, under every near-dup threshold — and minhash-LSH
    * candidates miss it too, because band collision probability tracks
    * JACCARD. Candidates here come from the inverted-index route instead:
    * two documents pair iff they share at least one RARE shingle (document
    * frequency ≤ `maxDf`). A contained doc shares its ENTIRE shingle set
    * with its container, so the pair is missed only if every one of its
    * shingles is corpus-boilerplate above the cut — exactly the documents
    * exact/boilerplate dedup already owns.
    *
    * Scale shape: one scan shingles each doc; the exploded `(hash, id)`
    * postings aggregate df count-only first (map-side partials, the
    * [[graft.text.VocabStats.invertedIndex]] rule: no per-hash id list
    * ever materializes for frequent shingles); only hashes with
    * `df ≤ maxDf` self-join, so a shingle contributes at most
    * `maxDf·(maxDf−1)/2` candidate pairs and the frequent-shingle
    * quadratic blowup is cut BEFORE the join. Verification joins the two
    * full hash sets back by id and runs the one-pass
    * [[graft.plans.expressions.hash_containment]] kernel — document text
    * never shuffles.
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       threshold: Double = 0.9, shingleWidth: Int = 3,
                       maxDf: Int = 64, charNgram: Int = 0): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"need 0 < threshold <= 1, got $threshold")
    require(maxDf >= 2, s"maxDf < 2 can never produce a pair, got $maxDf")
    // shingler output is already distinct (hash-set kernels)
    val hashed = df.select(col(idCol).as("__id"),
        shingler(textCol, shingleWidth, charNgram).as("__hh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val postings = hashed.select(col("__id"), explode(col("__hh")).as("__h"))
    // df-first cut: count-only aggregation, then the rare-hash semi-join —
    // a boilerplate shingle never lands its postings in one reducer
    val rare = postings.groupBy(col("__h"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf)
      .select(col("__h"))
    val rarePostings = postings.join(rare, Seq("__h"), "left_semi")
    val cands = rarePostings.select(col("__h"), col("__id").as("id_a"))
      .join(rarePostings.select(col("__h"), col("__id").as("id_b")), Seq("__h"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    cands
      .join(hashed.select(col("__id").as("id_a"), col("__hh").as("__sh_a")),
        Seq("id_a"))
      .join(hashed.select(col("__id").as("id_b"), col("__hh").as("__sh_b")),
        Seq("id_b"))
      .withColumn("containment",
        graft.plans.expressions.hash_containment(col("__sh_a"), col("__sh_b")))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("containment"), 4).as("containment"))
  }

  /** Near-dedup: drop every document that has a verified near-duplicate
    * with a smaller id (deterministic min-id survivor per pair; the usual
    * LSH-dedup "keep first" rule, not transitive closure).
    */
  def dedup(df: DataFrame, idCol: String, textCol: String,
            threshold: Double = 0.8, numHashes: Int = 64,
            bands: Int = 16, shingleWidth: Int = 3,
            charNgram: Int = 0): DataFrame = {
    val losers = nearDupPairs(df, idCol, textCol, threshold, numHashes, bands,
      shingleWidth, charNgram).select(col("id_b").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** ManagedTable shell: near-dedup the table in place (atomic overwrite,
    * same core as [[dedup]]).
    */
  def dedup(table: graft.tables.ManagedTable, idCol: String, textCol: String,
            threshold: Double, numHashes: Int, bands: Int,
            shingleWidth: Int, charNgram: Int): Unit =
    table.overwrite(dedup(table.toDF, idCol, textCol, threshold, numHashes,
      bands, shingleWidth, charNgram), operation = "DELETE")
}
