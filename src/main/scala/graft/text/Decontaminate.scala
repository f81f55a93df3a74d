package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — drop training documents that share any
  * word n-gram with an evaluation set (the GPT-3 appendix-C / Dolma
  * "exact n-gram overlap" rule; 8-grams by default, 13 in some
  * pipelines). Distinct from near-dup removal: ONE shared 8-gram
  * contaminates, however different the rest of the document is, so
  * Jaccard-threshold machinery (MinHash/SimHash) cannot express it.
  *
  * Scale shape, the part that matters at 100 TB: the benchmark side is
  * small BY CONSTRUCTION (eval sets are thousands of documents, not
  * billions), so its distinct n-grams build once and BROADCAST; the
  * corpus side explodes its n-grams in the map phase — a generator
  * expression over `transform(sequence(...))`, no UDF — and the
  * LEFT SEMI broadcast join marks contaminated ids without shuffling a
  * single corpus row. The whole operator is scan → explode →
  * broadcast-semi-join → anti-join: map-side only, no corpus shuffle,
  * linear in corpus tokens.
  *
  * Normalization (lower-case, non-letters collapsed to single spaces)
  * follows the same convention as [[MinHashDedup]]'s shingling so
  * "The  Quick---Brown fox" and "the quick brown FOX" contaminate each
  * other; n-grams are over WORDS, bounded by ` `-joined strings.
  */
object Decontaminate {

  /** Normalized word array of `text` (empty tokens dropped). Kept for
    * API users composing their own gram logic; [[contaminatedIds]]
    * itself runs on the codegen'd hash kernel below.
    */
  private def words(text: Column): Column =
    filter(split(trim(regexp_replace(lower(text), "[^\\p{L}]+", " ")), " "),
      w => length(w) > 0)

  /** All word `n`-grams of `text` as space-joined strings (empty when
    * the document has fewer than `n` words — a short document cannot
    * carry a full n-gram and is never contaminated).
    */
  def ngrams(text: Column, n: Int): Column = {
    val w = words(text)
    when(size(w) >= n,
      array_distinct(transform(sequence(lit(0), size(w) - n),
        i => array_join(slice(w, i + 1, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  /** IDs of `corpus` documents sharing at least one word `n`-gram with
    * `bench` — the contamination report (one row per contaminated id).
    *
    * Grams are compared as 64-bit hashes from the one-pass
    * [[graft.plans.WordNgramHashes]] kernel (no token/gram strings
    * materialize), not as strings: a hash collision falsely drops a
    * clean document at ~2⁻⁶⁴ per candidate pair — the stance of the
    * bloom-filter-based production pipelines this rule comes from,
    * where a false positive only ever costs one extra dropped document.
    */
  def contaminatedIds(corpus: DataFrame, bench: DataFrame,
                      idCol: String, textCol: String, n: Int): DataFrame = {
    val benchGrams = bench
      .select(explode(graft.plans.expressions.word_ngram_hashes(
        col(textCol), n)).as("__gram")).distinct()
    corpus
      .select(col(idCol), explode(graft.plans.expressions.word_ngram_hashes(
        col(textCol), n)).as("__gram"))
      .join(broadcast(benchGrams), Seq("__gram"), "left_semi")
      .select(idCol).distinct()
  }

  /** Per-document contamination RATE against `bench`: the fraction of
    * the document's distinct word `n`-grams that appear anywhere in the
    * benchmark — the audit number contamination studies publish (and the
    * knob behind "drop if > x% overlap" policies, where the binary
    * any-hit rule of [[contaminatedIds]] is too blunt for long documents
    * that merely quote a sentence). Documents with fewer than `n` words
    * report 0 hits over 0 grams (rate null) — they cannot carry a gram.
    *
    * Output: `(id, n_grams, n_hit, rate)`. The rate is the RAW double
    * division `n_hit / n_grams` — one IEEE-754 op, bit-identical in any
    * engine, so no rounding is needed (rounding would ADD a cross-engine
    * hazard at half-way decimals, e.g. k/32).
    *
    * Scale shape: identical to [[contaminatedIds]] — the benchmark gram
    * set broadcasts, the corpus aggregates its own exploded grams with
    * map-side partials, and the hit flag is evaluated inside the scan's
    * projection. The corpus never shuffles text, and the only exchange
    * carries `(id, two longs)`.
    */
  def contaminationRate(corpus: DataFrame, bench: DataFrame,
                        idCol: String, textCol: String,
                        n: Int = 8): DataFrame = {
    val benchGrams = bench
      .select(explode(graft.plans.expressions.word_ngram_hashes(
        col(textCol), n)).as("__gram")).distinct()
    corpus
      .select(col(idCol), explode_outer(graft.plans.expressions.word_ngram_hashes(
        col(textCol), n)).as("__gram"))
      .join(broadcast(benchGrams.withColumn("__hit", lit(1L))),
        Seq("__gram"), "left")
      .groupBy(col(idCol))
      .agg(count(col("__gram")).as("n_grams"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_hit"))
      .select(col(idCol), col("n_grams"), col("n_hit"),
        when(col("n_grams") > 0,
          col("n_hit").cast("double") / col("n_grams")).as("rate"))
  }

  /** `corpus` minus every document contaminated by `bench` (schema
    * preserved; the benchmark rows themselves are NOT part of `corpus`
    * here — pass a corpus that excludes them, as a real pipeline holds
    * them in a separate eval table anyway).
    */
  def dropContaminated(corpus: DataFrame, bench: DataFrame,
                       idCol: String, textCol: String,
                       n: Int = 8): DataFrame =
    // no broadcast hint on the id anti-join: the contaminated set is
    // usually tiny (AQE will broadcast it) but is bounded only by the
    // corpus — a pathological benchmark must degrade to a shuffle, not
    // an OOM
    corpus.join(contaminatedIds(corpus, bench, idCol, textCol, n),
      Seq(idCol), "left_anti")

  /** FUZZY contamination — corpus documents whose word-shingle Jaccard
    * with any benchmark document reaches `threshold`. The exact n-gram
    * rule above misses light paraphrases (every 8-gram breaks when one
    * word in eight changes); set-level Jaccard survives them. This is
    * the "near-duplicate contamination" complement most published
    * pipelines run alongside exact overlap.
    *
    * Scale shape: the benchmark side is small BY CONSTRUCTION, so its
    * minhash band keys AND its shingle-hash sets broadcast; the corpus
    * computes signatures map-side ([[MinHashDedup]]'s codegen'd shingle
    * → minhash kernels), collides with the broadcast buckets, and only
    * the (usually tiny) candidate set rides a join back for exact
    * verification — no corpus shuffle, no all-pairs anywhere. Same
    * S-curve/parameter reasoning as [[MinHashDedup.nearDupPairs]].
    */
  def contaminatedIdsFuzzy(corpus: DataFrame, bench: DataFrame,
                           idCol: String, textCol: String,
                           threshold: Double = 0.8, numHashes: Int = 64,
                           bands: Int = 16,
                           shingleWidth: Int = 3): DataFrame = {
    import MinHashDedup.{bandHashes, minHashFromHashes}
    def hashed(df: DataFrame, as: String) = df.select(
      col(idCol).as(as),
      graft.plans.expressions.shingle_hashes(col(textCol), shingleWidth)
        .as(s"${as}_hh"))
    def banded(df: DataFrame, as: String) = df
      .select(col(as), minHashFromHashes(col(s"${as}_hh"), numHashes).as("__sig"))
      .select(col(as),
        posexplode(bandHashes(col("__sig"), numHashes, bands))
          .as(Seq("__band", "__bh")))
    val bHashed = hashed(bench, "__bid")
    // deliberately NOT persisted: the verify join-back re-scans the
    // corpus through the codegen'd shingle kernel instead. Two scans
    // beat caching a corpus-sized intermediate — a persist here is
    // executor memory/disk pressure proportional to the CORPUS that
    // outlives the call in a long-running session (and at 100 TB could
    // never be pinned anyway), while the second scan is embarrassingly
    // parallel and touches only the candidates' rows after pushdown of
    // the (tiny, AQE-broadcast) candidate join
    val cHashed = hashed(corpus, "__cid")
    val cands = banded(cHashed, "__cid")
      .join(broadcast(banded(bHashed, "__bid")), Seq("__band", "__bh"))
      .select("__cid", "__bid").distinct()
    // exact verify over 64-bit shingle-hash sets: candidates join back
    // to the corpus hashes (candidate set is small — AQE broadcasts it;
    // a pathological bench degrades to a shuffle, not an OOM) and to the
    // broadcast bench hashes
    cands.join(cHashed, Seq("__cid"))
      .join(broadcast(bHashed), Seq("__bid"))
      .filter(graft.plans.expressions.hash_jaccard(
        col("__cid_hh"), col("__bid_hh")) >= threshold)
      .select(col("__cid").as(idCol)).distinct()
  }

  /** `corpus` minus fuzzy-contaminated documents (see
    * [[contaminatedIdsFuzzy]]).
    */
  def dropContaminatedFuzzy(corpus: DataFrame, bench: DataFrame,
                            idCol: String, textCol: String,
                            threshold: Double = 0.8, numHashes: Int = 64,
                            bands: Int = 16,
                            shingleWidth: Int = 3): DataFrame =
    corpus.join(
      contaminatedIdsFuzzy(corpus, bench, idCol, textCol, threshold,
        numHashes, bands, shingleWidth),
      Seq(idCol), "left_anti")
}
