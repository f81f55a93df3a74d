package graft.tables

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import graft.SparkSpec

/** Z-order clustering (`optimize(zorderBy = ...)`): the kernel's bit
  * interleaving, and the property that matters at scale — after a Z-order
  * rewrite, a filtered scan on ANY clustered column skips most files,
  * where a lexicographic sort only serves its leading column.
  */
class ZorderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue kernel: interleaving, ordering, null/NaN bucket to 0") {
    val bits = 2 // 4 buckets per column, 3 boundaries
    // col0 boundaries: 10,20,30 ; col1 boundaries: 1,2,3
    val bounds = Array(10.0, 20.0, 30.0, 1.0, 2.0, 3.0)
    def z(a: java.lang.Double, b: java.lang.Double): Long =
      graft.plans.ExprKernels.zValue(
        new GenericArrayData(Array[Any](a, b)), bounds, 2, bits)
    // bucket(col0=5)=0, bucket(col1=0.5)=0 → z=0
    assert(z(5.0, 0.5) == 0L)
    // bucket(col0=35)=3 (bits 11), col1=0 → z bits at positions 0 and 2
    assert(z(35.0, 0.5) == 5L) // b0*2+0=bit0, b1*2+0=bit2 → 0b101
    // col0=0, bucket(col1=3.5)=3 → bits at positions 1 and 3 → 0b1010
    assert(z(5.0, 3.5) == 10L)
    // both max → all four low bits set
    assert(z(35.0, 3.5) == 15L)
    // boundary semantics: value equal to a boundary goes right
    assert(z(10.0, 0.5) == 1L) // bucket 1 → bit0
    // null and NaN cluster to bucket 0
    assert(z(null, 3.5) == 10L)
    assert(z(Double.NaN, 3.5) == 10L)
    // z-order is monotonic-ish: same col1 bucket, growing col0 buckets
    val zs = Seq(5.0, 15.0, 25.0, 35.0).map(v => z(v, 0.5))
    assert(zs == zs.sorted && zs.distinct.size == 4)
  }

  test("zorder rewrite preserves contents and clusters BOTH columns' file bounds") {
    // x and y are independent: lexicographic sort by (x, y) gives tight
    // x-bounds but every file spans all of y; Z-order bounds both.
    val n = 40000
    val base = spark.range(n.toLong).select(
      (col("id") % 200).cast("int").as("x"),
      (col("id") / 200).cast("int").as("y"),
      col("id").as("payload"))
    val filesOf = (t: ManagedTable, pred: String) =>
      t.toDFWhere(pred).inputFiles.length

    val lexLoc = tmpDir("zlex")
    val lex = ManagedTable.create(base, lexLoc)
    lex.optimize(targetFileSizeBytes = 6 * 1024, sortBy = Seq("x", "y"))
    val lexTotal = lex.detail.numFiles
    assert(lexTotal >= 20, s"need multi-file table, got $lexTotal")

    val zLoc = tmpDir("zord")
    val zt = ManagedTable.create(base, zLoc)
    zt.optimize(targetFileSizeBytes = 6 * 1024, zorderBy = Seq("x", "y"))
    val zTotal = zt.detail.numFiles
    assert(zTotal >= 20, s"need multi-file table, got $zTotal")

    // contents identical to the lex table (and to the source)
    assertDfEquality(zt.toDF, base)
    assert(zt.latestVersion == 1L)

    // leading column: both cluster it
    assert(filesOf(lex, "x = 17") < lexTotal)
    assert(filesOf(zt, "x = 17") < zTotal)
    // NON-leading column: lex sort reads everything, Z-order skips
    val lexY = filesOf(lex, "y = 100")
    val zY = filesOf(zt, "y = 100")
    assert(lexY == lexTotal,
      s"lex sort should not bound y, read $lexY of $lexTotal")
    assert(zY * 2 <= zTotal,
      s"z-order should skip at least half the files on y, read $zY of $zTotal")
    // range predicate on y skips too
    assert(filesOf(zt, "y BETWEEN 40 AND 60") < zTotal)
    // and the filtered rows are exactly right
    assertDfEquality(zt.toDFWhere("y = 100"), base.filter(col("y") === 100))
  }

  test("zorder argument validation") {
    val t = ManagedTable.create(
      spark.range(10).select(col("id"), col("id").cast("string").as("s"),
        encode(col("id").cast("string"), "UTF-8").as("bin")),
      tmpDir("zval"))
    intercept[IllegalArgumentException](
      t.optimize(sortBy = Seq("id"), zorderBy = Seq("id")))
    intercept[IllegalArgumentException](t.optimize(zorderBy = Seq("bin")))
    val pt = ManagedTable.create(
      spark.range(10).select(col("id"), (col("id") % 2).as("p")),
      tmpDir("zpart"), partitionBy = Seq("p"))
    // z-ordering BY a partition column is rejected; by data columns is not
    intercept[IllegalArgumentException](pt.optimize(zorderBy = Seq("p")))
  }

  test("zorder on a string column prunes prefix probes (Delta's 8-byte rank)") {
    val n = 20000
    // 8-char keys (u0000042): every discriminating digit sits inside the
    // ranked 8-byte prefix. (Keys whose prefix is shared — e.g.
    // user_00042, where only "user_000" ranks — bucket coarsely by
    // construction; that is Delta's 8-byte limitation too.)
    val base = spark.range(n.toLong).select(
      format_string("u%07d", col("id")).as("uid"),
      (col("id") % 997).as("v"))
    val t = ManagedTable.create(
      base.repartition(8), tmpDir("zstr"))
    t.optimize(targetFileSizeBytes = 12 * 1024, zorderBy = Seq("uid", "v"))
    val total = t.fileStats.size
    assert(total >= 6, s"setup needs a multi-file rewrite, got $total")
    def filesOf(where: String): Int = t.toDFWhere(where).inputFiles.length
    // equality and range probes on the string column skip most files
    assert(filesOf("uid = 'u0000042'") * 2 <= total,
      s"string z-order must prune, read ${filesOf("uid = 'u0000042'")} of $total")
    assert(filesOf("uid BETWEEN 'u0010000' AND 'u0010200'") * 2 <= total)
    // the co-clustered numeric column prunes too, and results are exact
    assert(filesOf("v = 500") < total)
    assertDfEquality(t.toDFWhere("uid = 'u0000042'"),
      base.filter(col("uid") === "u0000042"))
    assertDfEquality(t.toDFWhere("v = 123"), base.filter(col("v") === 123))
  }

  test("zorder on a partitioned table clusters within each partition") {
    val n = 40000
    val base = spark.range(n.toLong).select(
      (col("id") % 2).as("p"),
      (col("id") % 200).cast("int").as("x"),
      (col("id") / 200).cast("int").as("y"),
      col("id").as("payload"))
    val t = ManagedTable.create(base, tmpDir("zpart2"), partitionBy = Seq("p"))
    t.optimize(targetFileSizeBytes = 6 * 1024, zorderBy = Seq("x", "y"))
    val total = t.detail.numFiles
    assert(total >= 16, s"need multi-file partitions, got $total")
    assertDfEquality(t.toDF.select("p", "x", "y", "payload"),
      base.select("p", "x", "y", "payload"))
    // partition pruning still works, and BOTH z columns skip within it
    val pFiles = t.toDFWhere("p = 0").inputFiles.length
    assert(pFiles < total, "partition pruning must still apply")
    assert(t.toDFWhere("p = 0 AND x = 17").inputFiles.length < pFiles)
    assert(t.toDFWhere("p = 0 AND y = 100").inputFiles.length < pFiles)
    // contents through the pruned read stay exact
    assertDfEquality(
      t.toDFWhere("p = 0 AND y = 100").select("p", "x", "y", "payload"),
      base.filter(col("p") === 0 && col("y") === 100))
  }

  test("zorder handles an all-null column without losing the others") {
    val base = spark.range(1000).select(
      (col("id") % 10).cast("int").as("x"),
      lit(null).cast("double").as("dead"),
      col("id").as("payload"))
    val t = ManagedTable.create(base, tmpDir("znull"))
    t.optimize(targetFileSizeBytes = 4 * 1024, zorderBy = Seq("x", "dead"))
    assertDfEquality(t.toDF, base)
    val total = t.detail.numFiles
    if (total > 1)
      assert(t.toDFWhere("x = 3").inputFiles.length < total)
  }
}
