package graft.ml

import org.apache.spark.sql.{DataFrame, Row}

/** The shared bounded driver-sample recipe behind every offline trainer
  * (IVF coarse quantizer, PQ codebooks, BPE merges): a UNIFORM random
  * sample, not `limit()` — limit takes the FIRST partitions, which
  * biases training on any sorted/partitioned corpus. One cheap count
  * (column-pruned scan) sizes a Bernoulli fraction; the 1.2× oversample
  * keeps the post-sample limit from undershooting.
  */
object BoundedSample {

  def rows(df: DataFrame, colName: String, sampleSize: Int,
           seed: Long): Array[Row] = {
    require(sampleSize >= 1, s"sampleSize must be positive, got $sampleSize")
    val one = df.select(colName)
    val total = one.count()
    if (total <= sampleSize) one.collect()
    else {
      val fraction = math.min(1.0, sampleSize * 1.2 / total)
      one.sample(withReplacement = false, fraction, seed)
        .limit(sampleSize).collect()
    }
  }
}
