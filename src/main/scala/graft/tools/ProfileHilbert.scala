package graft.tools

/** Driver-side microbenchmark of the two clustering kernels
  * ([[graft.plans.ExprKernels.zValue]] vs `hilbertValue`) at the exact
  * shape OPTIMIZE uses (2 columns, zorderBits buckets) — attributes any
  * table_hilbert vs table_zorder bench gap to the per-row transpose (or
  * rules it out, pointing at phase costs / box noise instead).
  */
object ProfileHilbert {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5_000_000)
    val bits = 15
    val nCols = 2
    val perCol = (1 << bits) - 1
    val bounds = new Array[Double](nCols * perCol)
    var i = 0
    while (i < bounds.length) { bounds(i) = (i % perCol).toDouble; i += 1 }
    val rnd = new java.util.Random(42L)
    val rows = Array.fill(n) {
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array(rnd.nextDouble() * perCol, rnd.nextDouble() * perCol))
    }
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val acc = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[hilbert-prof] $name%-10s $n rows in $sec%6.3fs " +
        f"(${n / sec / 1e6}%6.1f Mrow/s, acc=$acc)")
    }
    (1 to 3).foreach { iter =>
      println(s"--- iteration $iter ---")
      time("zValue") {
        var acc = 0L; var j = 0
        while (j < n) {
          acc ^= graft.plans.ExprKernels.zValue(rows(j), bounds, nCols, bits)
          j += 1
        }
        acc
      }
      time("hilbert") {
        var acc = 0L; var j = 0
        while (j < n) {
          acc ^= graft.plans.ExprKernels.hilbertValue(rows(j), bounds, nCols, bits)
          j += 1
        }
        acc
      }
    }
  }
}
