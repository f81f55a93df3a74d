package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact top-k heavy hitters by a two-pass candidate sweep — the
  * skewed-key DISCOVERY step in front of [[Skew.saltedJoin]]/
  * [[Skew.saltedAgg]] (you cannot salt what you have not found), and
  * the frequency audit every curation pipeline runs on domains, URLs,
  * boilerplate lines, user agents.
  *
  * Pass 1 runs a Misra–Gries summary (Misra & Gries 1982) with
  * `capacity` counters inside each partition (`mapPartitions`, O(c)
  * memory, no shuffle) and unions the kept keys: a key absent from
  * EVERY partition summary has global count ≤ N/(capacity+1) — the
  * classic frequent-items guarantee, summed across partitions. Pass 2
  * semi-joins the corpus against the broadcast candidate set and
  * counts EXACTLY — only candidate rows reach the aggregation, so the
  * shuffle is O(partitions × capacity) partial counts, not O(distinct
  * keys). The result is therefore provably the exact top-k whenever
  * the k-th exact count strictly exceeds N/(capacity+1), and the
  * operator CHECKS that certificate and fails loudly instead of
  * returning a silently-approximate answer (raise `capacity`, or fall
  * back to a full groupBy, when it trips).
  *
  * Scale shape: pass 1 is a map-only scan; pass 2's aggregation input
  * is bounded by the candidate set — at 100 TB the full
  * `groupBy(key)` alternative shuffles every distinct URL or user id,
  * exactly the aggregation that falls over on crawl-scale key
  * cardinalities. The k result rows come back as a driver-side
  * literal frame (they were already collected to check the
  * certificate — the model-sized-result convention, like fitted
  * centroids or perceptron weights). Null keys are excluded, the SQL
  * aggregate convention. Ties break deterministically
  * (count desc, key asc).
  */
object HeavyHitters {

  /** Exact top-k `(key, cnt, rank)` for the (stringified) `keyCol`.
    * `capacity` is the Misra–Gries counter budget per partition; the
    * exactness certificate requires `cnt_k · (capacity+1) > N`.
    */
  def topK(df: DataFrame, keyCol: String, k: Int,
           capacity: Int = 4096): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    require(capacity > k, s"need capacity > k, got $capacity <= $k")
    val spark = df.sparkSession
    import spark.implicits._
    // persisted for the operator's duration: the MG pass, the exact
    // recount, and the certificate's N all read the SAME materialized
    // rows (one upstream computation, and a nondeterministic input
    // cannot desynchronize the certificate from the counted passes)
    val keyed = df.select(col(keyCol).cast("string").as("key"))
      .filter(col("key").isNotNull).persist()

    // pass 1: per-partition Misra-Gries, union of kept keys. A live
    // counter is always >= 1, so getOrDefault 0 means absent.
    val candidates = keyed.mapPartitions { it =>
      val counters = new java.util.HashMap[String, Long](capacity * 2)
      it.foreach { r =>
        val key = r.getString(0)
        val cur: Long = counters.getOrDefault(key, 0L)
        if (cur > 0L) {
          counters.put(key, cur + 1L)
          ()
        } else if (counters.size < capacity) {
          counters.put(key, 1L)
          ()
        } else {
          // decrement-all, dropping zeroed counters (the MG step)
          val itr = counters.entrySet().iterator()
          while (itr.hasNext) {
            val e = itr.next()
            if (e.getValue == 1L) itr.remove()
            else e.setValue(e.getValue - 1L)
          }
        }
      }
      val out = new Array[String](counters.size)
      counters.keySet().toArray(out)
      out.iterator
    }.toDF("key").distinct()

    // pass 2: exact counts for candidates only; non-candidate rows are
    // filtered at scan speed by the broadcast semi-join
    try {
      val top = keyed
      .join(broadcast(candidates), Seq("key"), "left_semi")
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("key").asc)
      .limit(k)
      .collect()

    val total = keyed.count()
    if (top.length < k) {
      // under-filled top-k is exact only if NO key can be absent from
      // the summaries at all: absent keys have count <= N/(capacity+1),
      // so N <= capacity forces that bound below 1
      require(total <= capacity.toLong,
        s"heavy-hitter certificate failed: only ${top.length} of $k " +
          s"candidates with N=$total > capacity=$capacity — an unseen " +
          "key could hold an unfilled slot; raise capacity")
    } else {
      val kthCount = top.last.getLong(1)
      require(kthCount * (capacity + 1).toLong > total,
        s"heavy-hitter certificate failed: k-th count $kthCount <= " +
          s"N/(capacity+1) with N=$total — an unseen key could outrank " +
          "the tail; raise capacity or use a full groupBy")
    }

    val rows = top.zipWithIndex.map { case (r, i) =>
      Row(r.getString(0), r.getLong(1), (i + 1).toLong)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(StructField("key", StringType, nullable = false),
        StructField("cnt", LongType, nullable = false),
        StructField("rank", LongType, nullable = false))))
    } finally keyed.unpersist(blocking = false) // also on the throw
  }
}
