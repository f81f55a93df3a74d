package graft.tables

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hilbert-curve clustering (`optimize(zorderBy = ..., curve =
  * "hilbert")`): the kernel's defining locality property (consecutive
  * curve positions are adjacent bucket coordinates — the guarantee
  * Z-order lacks at boundary jumps), and the same file-skipping outcome
  * as Z-order on both clustered columns.
  */
class HilbertSpec extends SparkSpec {
  import spark.implicits._

  private def enumerate(n: Int, bits: Int): Seq[(Seq[Int], Long)] = {
    val side = 1 << bits
    def coords(dims: Int): Seq[Seq[Int]] =
      if (dims == 0) Seq(Seq.empty)
      else for (rest <- coords(dims - 1); v <- 0 until side) yield v +: rest
    coords(n).map { c =>
      c -> graft.plans.ExprKernels.hilbertIndex(c.toArray, n, bits)
    }
  }

  test("hilbertIndex is a bijection with unit-step locality (2D and 3D)") {
    for ((n, bits) <- Seq((2, 3), (2, 4), (3, 2))) {
      val all = enumerate(n, bits)
      val size = 1L << (n * bits)
      assert(all.map(_._2).toSet == (0L until size).toSet,
        s"n=$n bits=$bits must be a bijection onto [0, $size)")
      // THE Hilbert property: consecutive indices differ by exactly one
      // step in exactly one dimension
      val byIndex = all.sortBy(_._2).map(_._1)
      byIndex.sliding(2).foreach { case Seq(a, b) =>
        val d = a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
        assert(d == 1, s"n=$n bits=$bits: $a -> $b steps $d dims")
      }
      // and it starts at the origin
      assert(byIndex.head == Seq.fill(n)(0))
    }
  }

  test("the unrolled 2D fast path is bit-for-bit equal to the generic " +
       "transpose (exhaustive at small bits, random at OPTIMIZE's 15)") {
    for (bits <- Seq(2, 3, 5); x <- 0 until (1 << bits);
         y <- 0 until (1 << bits)) {
      assert(graft.plans.ExprKernels.hilbertIndex2(x, y, bits) ==
        graft.plans.ExprKernels.hilbertIndex(Array(x, y), 2, bits),
        s"bits=$bits x=$x y=$y")
    }
    val rnd = new scala.util.Random(99L)
    val bits = 15
    (1 to 20000).foreach { _ =>
      val x = rnd.nextInt(1 << bits)
      val y = rnd.nextInt(1 << bits)
      assert(graft.plans.ExprKernels.hilbertIndex2(x, y, bits) ==
        graft.plans.ExprKernels.hilbertIndex(Array(x, y), 2, bits),
        s"bits=$bits x=$x y=$y")
    }
  }

  test("hilbert rewrite preserves contents and clusters BOTH columns; " +
       "SQL HILBERT BY parses") {
    val n = 40000
    val base = spark.range(n.toLong).select(
      (col("id") % 200).cast("int").as("x"),
      (col("id") / 200).cast("int").as("y"),
      col("id").as("payload"))
    val loc = tmpDir("hilb")
    val t = ManagedTable.create(base, loc)
    t.optimize(targetFileSizeBytes = 6 * 1024, zorderBy = Seq("x", "y"),
      curve = "hilbert")
    val total = t.detail.numFiles
    assert(total >= 20, s"need multi-file table, got $total")
    // contents survive the rewrite
    assert(t.toDF.count() == n)
    assert(t.toDF.agg(sum("payload")).head().getLong(0) ==
      n.toLong * (n - 1) / 2)
    // both columns' range probes skip most files
    def filesOf(pred: String) = t.toDFWhere(pred).inputFiles.length
    val fx = filesOf("x BETWEEN 20 AND 39")
    val fy = filesOf("y BETWEEN 20 AND 39")
    assert(fx * 2 <= total, s"x probe reads $fx of $total")
    assert(fy * 2 <= total, s"y probe reads $fy of $total")
    // SQL surface: HILBERT BY re-clusters without error and keeps rows
    graft.plans.GraftFunctions.register(spark)
    val out = spark.sql(
      s"OPTIMIZE graft.`$loc` HILBERT BY (x, y)").collect()
    assert(out.head.getLong(1) >= 1)
    assert(t.toDF.count() == n)
  }

  test("hilbert matches or beats zorder's probe file count on the same " +
       "layout (locality sanity, not a microbenchmark)") {
    val n = 40000
    val base = spark.range(n.toLong).select(
      (col("id") % 200).cast("int").as("x"),
      (col("id") / 200).cast("int").as("y"))
    def probeFiles(curve: String): (Long, Long) = {
      val t = ManagedTable.create(base, tmpDir(s"hvz$curve"))
      t.optimize(targetFileSizeBytes = 6 * 1024,
        zorderBy = Seq("x", "y"), curve = curve)
      (t.toDFWhere("x BETWEEN 100 AND 119").inputFiles.length +
        t.toDFWhere("y BETWEEN 100 AND 119").inputFiles.length,
        t.detail.numFiles)
    }
    val (hProbe, hTotal) = probeFiles("hilbert")
    val (zProbe, zTotal) = probeFiles("zorder")
    assert(math.abs(hTotal - zTotal) <= 2, s"same layout: $hTotal vs $zTotal")
    // Hilbert's locality should not be WORSE than Z-order here; allow a
    // small tolerance against bucket-boundary luck
    assert(hProbe <= zProbe + 2,
      s"hilbert probes read $hProbe files vs zorder's $zProbe")
  }
}
