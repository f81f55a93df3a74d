package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.tables.ManagedTable
import graft.text.MinHashDedup

/** Streaming near-duplicate dedup: documents stream in, each micro-batch
  * is near-dedup'd against EVERYTHING seen so far, and only novel
  * documents flow to the output table — the incremental form of the
  * batch MinHash pipeline (continuous training-data ingestion, where the
  * corpus index outlives any one job).
  *
  * Shape: `foreachBatch` + a persistent signature index (a
  * [[ManagedTable]] of `(id, shingle hashes, band hashes)`). Per batch:
  *
  *  1. batch-internal near-dedup (keep-first, the batch pipeline's rule);
  *  2. LSH candidate join of the batch's band hashes against the
  *     index's — only bucket collisions are compared, never all pairs;
  *  3. exact-Jaccard verification of candidates over the stored shingle
  *     hash sets (same predicate as the batch path, so a batch replay
  *     equals the batch dedup);
  *  4. novel docs append to the output table, their signatures to the
  *     index — both ManagedTable appends, so a crashed batch retried by
  *     the checkpoint simply re-runs (appends of already-indexed ids are
  *     prevented by an id-level anti-join, making the batch idempotent);
  *  5. the index auto-compacts once it fragments past `maxIndexFiles`
  *     ([[graft.operators.TableOps.autoOptimize]]).
  *
  * Scale notes: the index join is band-bucket-keyed (shuffle on
  * (band, bandHash)), so per-batch cost is |batch buckets| ⋈ |index
  * buckets| — at very large index sizes, partition the index table by a
  * band-hash prefix so the join prunes to matching partitions; signatures
  * are ~100 longs per doc, orders of magnitude smaller than the text.
  */
object StreamingDedup {

  /** Index schema columns (alongside the id column). */
  private val HH = "__hh"
  private val BANDS = "__bands"

  /** Create (or open) the signature index for an id column of `idType`. */
  def openIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                idCol: String, idType: org.apache.spark.sql.types.DataType):
      ManagedTable =
    if (ManagedTable.exists(path)) ManagedTable.forPath(spark, path)
    else {
      import org.apache.spark.sql.types._
      // containsNull = true: bandHashes builds its array from nullable
      // expressions, and Spark refuses nullable→non-nullable array casts
      val schema = StructType(Seq(
        StructField(idCol, idType),
        StructField(HH, ArrayType(LongType, containsNull = true)),
        StructField(BANDS, ArrayType(LongType, containsNull = true))))
      ManagedTable.create(
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          schema), path)
    }

  /** Pure per-batch core (callable from batch jobs too): near-dedup
    * `batch` against `index`, append novel docs to `out` and their
    * signatures to `index`. Returns the number of novel documents.
    */
  def incremental(batch: DataFrame, idCol: String, textCol: String,
                  index: ManagedTable, out: ManagedTable,
                  threshold: Double = 0.8, numHashes: Int = 64,
                  bands: Int = 16, shingleWidth: Int = 3,
                  maxBucketSize: Int = 1000,
                  maxIndexFiles: Int = 64): Long = {
    // 1. tokenize + hash ONCE for the whole batch: this single persisted
    // frame feeds the within-batch dedup, the index candidate join, the
    // verification, and the index append (tokenization dominates the
    // pipeline; the earlier formulation ran it twice per batch)
    val hashed = batch.select(col(idCol),
        graft.plans.expressions.shingle_hashes(col(textCol), shingleWidth).as(HH))
      .withColumn("__sig",
        MinHashDedup.minHashFromHashes(col(HH), numHashes))
      .select(col(idCol), col(HH),
        MinHashDedup.bandHashes(col("__sig"), numHashes, bands).as(BANDS))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // batch-internal keep-first near-dedup (the batch operator's rule:
    // drop the larger id of every verified pair), over the staged frame
    val withinCands = MinHashDedup.candidatePairsFromHashes(
      hashed.select(col(idCol).as("__id"), col(HH).as("__hh")),
      numHashes, bands, maxBucketSize)
    val losers = withinCands
      .join(hashed.select(col(idCol).as("id_a"), col(HH).as("__ha")), Seq("id_a"))
      .join(hashed.select(col(idCol).as("id_b"), col(HH).as("__hb")), Seq("id_b"))
      .filter(graft.plans.expressions.hash_jaccard(col("__ha"), col("__hb"))
        >= threshold)
      .select(col("id_b").as(idCol)).distinct()

    val idx = index.toDF
    // retry-idempotence: ids already indexed (a replayed micro-batch) drop
    val fresh = hashed
      .join(losers, Seq(idCol), "left_anti")
      .join(idx.select(col(idCol)), Seq(idCol), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 3. LSH candidates vs the index (bucket collisions only) + verify
    def explodeBands(df: DataFrame, as: String) = df.select(
      col(idCol).as(as), posexplode(col(BANDS)).as(Seq("__band", "__bh")))
    val cands = explodeBands(fresh, "__new_id")
      .join(explodeBands(idx, "__idx_id"), Seq("__band", "__bh"))
      .select("__new_id", "__idx_id").distinct()
    val verified = cands
      .join(fresh.select(col(idCol).as("__new_id"), col(HH).as("__hh_new")), Seq("__new_id"))
      .join(idx.select(col(idCol).as("__idx_id"), col(HH).as("__hh_idx")), Seq("__idx_id"))
      .withColumn("__j",
        graft.plans.expressions.hash_jaccard(col("__hh_new"), col("__hh_idx")))
      .filter(col("__j") >= threshold)
      .select(col("__new_id").as(idCol)).distinct()

    // 4. novel docs → out; novel signatures → index (persisted: consumed
    // by the count and BOTH appends — unpersisted it would re-run the
    // candidate join + verification three times)
    val novelSigs = fresh.join(verified, Seq(idCol), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val novelCount = novelSigs.count()
    if (novelCount > 0) {
      // size the append's file count by rows — a small batch written at
      // the session's full shuffle parallelism produces dozens of tiny
      // files per commit, and every later batch re-opens all of them
      val parts = math.max(1L, novelCount / 100000L).toInt
      out.append(batch.join(novelSigs.select(idCol), Seq(idCol), "left_semi")
        .coalesce(parts))
      index.append(novelSigs.select(col(idCol), col(HH), col(BANDS))
        .coalesce(parts))
      // 5. bound index fragmentation (one commit dir per batch otherwise)
      graft.operators.TableOps.autoOptimize(index, maxFiles = maxIndexFiles)
    }
    hashed.unpersist()
    fresh.unpersist()
    novelSigs.unpersist()
    novelCount
  }

  /** Streaming shell: wire a streaming `docs` frame through
    * [[incremental]] with `foreachBatch`. `checkpointDir` gives
    * exactly-once batch replay; combined with the id-level anti-join the
    * pipeline is idempotent under retries.
    */
  def start(docs: DataFrame, idCol: String, textCol: String,
            indexPath: String, outPath: String, checkpointDir: String,
            threshold: Double = 0.8, numHashes: Int = 64, bands: Int = 16,
            shingleWidth: Int = 3): StreamingQuery = {
    val spark = docs.sparkSession
    val idType = docs.schema(idCol).dataType
    val index = openIndex(spark, indexPath, idCol, idType)
    val out =
      if (ManagedTable.exists(outPath)) ManagedTable.forPath(spark, outPath)
      else ManagedTable.create(
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          docs.schema), outPath)
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        incremental(batch, idCol, textCol, index, out,
          threshold, numHashes, bands, shingleWidth)
        ()
      }
      .start()
  }
}
