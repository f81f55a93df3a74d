package graft.tables

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Property-style invariants for the DML + CDF machinery over seeded
  * random commit sequences (append / delete / update / optimize) against
  * a driver-side multiset model:
  *   1. the table's contents equal the model after every sequence;
  *   2. the change feed replayed over the starting snapshot reproduces
  *      the final snapshot (inserts added, deletes removed, in commit
  *      order) — at whatever file layout the sequence produced;
  *   3. versions advance only for effective commits (no-op DML burns
  *      nothing).
  */
class DmlPropertySpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("v", LongType)))

  test("DML + CDF invariants hold for 8 random commit sequences") {
    val rnd = new scala.util.Random(77)
    (1 to 8).foreach { i =>
      // alternate CDF sidecar capture on/off so the replay invariant
      // property-tests BOTH feed paths (sidecar read vs derivation)
      val t = ManagedTable.create(
        df(schema, (0L until 60L).map(k => Row(k, k * 2))), tmpDir(s"dmlp$i"),
        properties =
          if (i % 2 == 0) Map(ManagedTable.cdfPropKey -> "true") else Map.empty)
      t.optimize(targetFileSizeBytes = 1024, sortBy = Seq("k"))
      var model: Vector[(Long, Long)] =
        (0L until 60L).map(k => (k, k * 2)).toVector
      val v0 = t.latestVersion
      var nextK = 1000L * i

      (1 to 6).foreach { _ =>
        rnd.nextInt(4) match {
          case 0 => // append a small batch (possibly duplicate keys)
            val rows = (0 until 1 + rnd.nextInt(4)).map { _ =>
              val k = if (rnd.nextBoolean()) { nextK += 1; nextK }
                      else rnd.nextInt(60).toLong
              (k, k + 7)
            }
            t.append(df(schema, rows.map { case (k, v) => Row(k, v) }))
            model = model ++ rows
          case 1 => // range delete
            val lo = rnd.nextInt(80).toLong
            val hi = lo + rnd.nextInt(20)
            val before = t.latestVersion
            val n = t.delete(s"k >= $lo AND k <= $hi")
            val (dropped, kept) = model.partition(r => r._1 >= lo && r._1 <= hi)
            assert(n == dropped.size, s"case $i delete [$lo,$hi]")
            model = kept
            if (n == 0) assert(t.latestVersion == before, "no-op delete burned a version")
          case 2 => // conditional update
            val lo = rnd.nextInt(80).toLong
            val hi = lo + rnd.nextInt(25)
            val before = t.latestVersion
            val n = t.update(Map("v" -> "v + 1"), Some(s"k >= $lo AND k <= $hi"))
            assert(n == model.count(r => r._1 >= lo && r._1 <= hi))
            model = model.map(r =>
              if (r._1 >= lo && r._1 <= hi) (r._1, r._2 + 1) else r)
            if (n == 0) assert(t.latestVersion == before, "no-op update burned a version")
          case 3 => // compaction: contents unchanged, CDF silent
            t.optimize(targetFileSizeBytes = 4 * 1024, sortBy = Seq("k"))
        }
      }

      // 1. contents == model (multiset)
      val got = t.toDF.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == model.sorted.toSeq, s"case $i contents diverged from model")

      // 2. CDF replay: from-snapshot + feed == final snapshot
      val to = t.latestVersion
      val ch = t.changes(v0, to).persist()
      var state = t.toDF(v0)
      ((v0 + 1) to to).foreach { v =>
        val c = ch.filter(col("_commit_version") === v)
        state = state
          .exceptAll(c.filter(col("_change_type")
            .isin("delete", "update_preimage")).select("k", "v"))
          .unionAll(c.filter(col("_change_type")
            .isin("insert", "update_postimage")).select("k", "v"))
      }
      val replayed = state.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(replayed == got, s"case $i CDF replay diverged")
      ch.unpersist()
      ()
    }
  }
}
