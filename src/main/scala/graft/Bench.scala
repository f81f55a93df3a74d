package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main: runs every declared query against
  * `SPARK_GRAFT_SF_DIR`, printing one JSON line with per-query seconds.
  */
object Bench {

  /** Time one query through the pruning-proof sink. Returns (seconds,
    * error): a query that crashes reports its error rather than billing
    * ~0 s and "improving" the total.
    */
  private[graft] def timeQuery(
      spark: SparkSession, sfDir: String, name: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame):
      (Double, Option[String]) = {
    val t0 = System.nanoTime()
    val err: Option[String] =
      try {
        val df = fn(spark, sfDir)
        df.select(xxhash64(df.columns.map(col).toIndexedSeq: _*).as("__h"))
          .agg(expr("bit_xor(__h)")).head()
        None
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }
    ((System.nanoTime() - t0) / 1e9, err)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up outside the timed region: session/codegen/parquet-footer
    // initialization would otherwise be billed to whichever query runs
    // first (~5s of JVM+Janino+reader setup, not query cost).
    spark.range(1000).selectExpr("sum(id)").collect()
    Seq("lineitem", "orders", "customer", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").limit(1).collect()
      catch { case _: Throwable => () }
    }

    // Pruning-proof sink (see timeQuery): a bare count() would let
    // Catalyst drop every projected column, under-billing projection-only
    // queries; hashing the full row forces evaluation of every column and
    // bit_xor folds the hashes without ANSI sum overflow.
    //
    // Each query is timed twice and the MIN reported: single-shot timings
    // on this box swing ±1 s (GC, page cache), which is the same order as
    // real regressions — min-of-2 keeps cross-round comparisons signal.
    // When the two iterations disagree by >2x the box was noisy during one
    // of them (r12: a 19.5 s reading on a 6.7 s query hit BOTH driver
    // iterations) — a third iteration breaks the tie so one bad window
    // can't double a query's reported time.
    // (Safe to repeat: the mutating queries recreate their scratch tables
    // from scratch on every invocation.) A first-run failure short-circuits
    // — re-timing a crash adds nothing.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (sec1, err1) = timeQuery(spark, sfDir, name, fn)
      if (err1.isDefined) (name, sec1, Seq(sec1), err1)
      else {
        val (sec2, err2) = timeQuery(spark, sfDir, name, fn)
        val noisy = err2.isEmpty &&
          math.max(sec1, sec2) > 2.0 * math.min(sec1, sec2) &&
          math.max(sec1, sec2) > 1.0 // sub-second jitter isn't worth a rerun
        if (!noisy) (name, math.min(sec1, sec2), Seq(sec1, sec2), err2)
        else {
          val (sec3, err3) = timeQuery(spark, sfDir, name, fn)
          (name, Seq(sec1, sec2, sec3).min, Seq(sec1, sec2, sec3), err3)
        }
      }
    }
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    // millisecond precision: full doubles once doubled the line past the
    // driver's output-capture tail and truncated the totals mid-record
    def sec(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // the TOTALS line must survive a 2000-char tail-anchored capture
    // with sbt's footer after it: 10ms precision per query keeps ~60+
    // queries safely under that budget (full precision rides the
    // detail line)
    def sec2(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val qs = results.map { case (k, v, _, _) => s"\"" + k + "\":" + sec2(v) }
      .mkString("{", ",", "}")
    // both raw iterations (first = cold: JIT/page-cache; second = warm) so
    // cross-round regressions separate environment noise from plan changes
    val runs = results.map { case (k, _, rs, _) =>
      s"\"" + k + "\":" + rs.map(sec).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, Some(e)) => s"\"$k\":${jstr(e)}" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // THREE lines, bulky first: the driver's output capture is
    // tail-anchored (~2000 chars), and r12 proved that even at 2-decimal
    // precision an 86-query dict overflows it — the totals line lost its
    // head and `parsed` came back null. The per-query dict now rides its
    // own line; the FINAL line is a compact fixed-size total (value +
    // errors only, no per-query dict) that parses alone no matter how
    // many queries exist.
    println(s"""{"metric":"total_detail","queries_runs":$runs,"sf":"$sfDir"}""")
    println(s"""{"metric":"total_queries","queries":$qs,"sf":"$sfDir"}""")
    println(s"""{"metric":"total","value":${sec(total)},"unit":"sec","n_queries":${results.size},"errors":$errs,"sf":"$sfDir"}""")
    System.out.flush()
    spark.stop()
    if (results.exists(_._4.isDefined)) sys.exit(1)
  }
}
