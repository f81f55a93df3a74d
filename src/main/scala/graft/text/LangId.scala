package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TRAINED language identification — the production slot the heuristic
  * one-pass label ([[TextAnalysis.langId]]) stands in for: CCNet and
  * every published web-corpus recipe since run a trained char-n-gram
  * linear classifier (fastText `lid.176`, Joulin et al. 2017) and drop
  * or re-route documents whose declared language disagrees. The
  * reference (mack, `mack/__init__.py`) has no text surface at all;
  * this extends the engine's trainable-classifier family
  * ([[NaiveBayes]], `ml.Perceptron`) to the language-id slot.
  *
  * Model: multinomial Naive Bayes over HASHED character n-gram counts —
  * the fastText featurization (char n-grams hashed into a fixed bucket
  * table) with the engine's aggregation-native trainable member as the
  * linear classifier on top. Hashing is the scale lever: the model is
  * O(buckets × languages) rows regardless of corpus size or n-gram
  * order, so it broadcasts at any corpus scale, and the hash is the
  * engine-portable md5 form (`Sampling.portableHash`) so an external
  * engine replays the identical features, fit, and argmax.
  *
  * Scale shape (inherited from [[NaiveBayes]]): fit is one explode →
  * (label, bucket) count with map-side partials; predict's evidence
  * join is against the broadcast-sized model; text shuffles never.
  */
object LangId {

  /** Hashed char-n-gram featurization (fastText's): for each order n in
    * `ns`, every character n-gram of `lower(text)` — spaces and
    * punctuation INCLUDED, word boundaries are a language signal —
    * hashed into `buckets` via the portable md5 hash and surfaced as
    * the bucket id string. Deterministic, engine-replayable, and
    * evaluated inline at scan speed (no UDF).
    */
  def hashedCharNgrams(text: Column, ns: Seq[Int], buckets: Int,
                       seed: String): Column = {
    require(ns.nonEmpty && ns.forall(n => n >= 1 && n <= 8),
      s"need 1 <= n <= 8 char-gram orders, got $ns")
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    val t = lower(text)
    ns.map { n =>
      // sequence() is direction-inferring (1..0 yields [1, 0], not
      // empty) — guard the short-text case to an explicit empty array
      val cnt = greatest(length(t) - (n - 1), lit(0))
      val idx = when(cnt >= 1, sequence(lit(1), cnt))
        .otherwise(array().cast("array<int>"))
      transform(idx, i =>
        pmod(graft.operators.Sampling.portableHash(
            Seq(t.substr(i, lit(n))), seed),
          lit(buckets.toLong)).cast("string"))
    }.reduce(concat(_, _))
  }

  /** Train-and-label in one call (the corpus-as-its-own-teacher form
    * the declared query uses, like [[NaiveBayes.classify]]): fit NB
    * over hashed char-n-gram counts with `labelCol` (the declared
    * language) as teacher, then argmax-label every document. Output
    * `(idCol, pred, score)`; compose with the declared label for the
    * CCNet mismatch-drop rule, and with [[TextAnalysis.langId]] for
    * the trained-vs-heuristic confusion audit.
    */
  def trained(df: DataFrame, idCol: String, textCol: String,
              labelCol: String, ns: Seq[Int] = Seq(2, 3),
              buckets: Int = 4096, alpha: Double = 0.5,
              seed: String = "5"): DataFrame =
    NaiveBayes.classify(df, idCol, textCol, labelCol, alpha,
      tokens = c => hashedCharNgrams(c, ns, buckets, seed))
}
