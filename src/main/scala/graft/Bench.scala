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

  /** The timing estimator: min of 2 runs, with a third iteration whenever
    * the first two can't BOTH be trusted as warm readings — they disagree
    * by >1.5x (one window was noisy; sub-second jitter exempt), or both
    * exceed 3 s (the high-spread case: streaming queries have ~2x
    * cold/warm spread, and a sustained noisy window can hit both
    * iterations, so a slow query always earns a third chance at a warm
    * window). Returns (reported seconds, raw runs, error, flaky error).
    * A first-run failure short-circuits; a third-run failure after two
    * successes keeps the min of the two good timings (folding the
    * fast-fail elapsed into the min would misreport a query that
    * measured fine twice) but the error surfaces in the FLAKY slot —
    * an intermittent crash must stay visible across rounds, not vanish
    * because two runs happened to succeed.
    */
  private[graft] def robustTime(run: () => (Double, Option[String]))
      : (Double, Seq[Double], Option[String], Option[String]) = {
    val (sec1, err1) = run()
    if (err1.isDefined) (sec1, Seq(sec1), err1, None)
    else {
      val (sec2, err2) = run()
      val spread = math.max(sec1, sec2) > 1.5 * math.min(sec1, sec2) &&
        math.max(sec1, sec2) > 1.0
      val needThird = err2.isEmpty && (spread || math.min(sec1, sec2) > 3.0)
      if (!needThird) (math.min(sec1, sec2), Seq(sec1, sec2), err2, None)
      else {
        val (sec3, err3) = run()
        if (err3.isDefined) (math.min(sec1, sec2), Seq(sec1, sec2), None, err3)
        else (Seq(sec1, sec2, sec3).min, Seq(sec1, sec2, sec3), None, None)
      }
    }
  }

  /** Fixed synthetic calibration probe: a pure-CPU range aggregation
    * plus one small parquet scan-agg — constant work independent of the
    * query set. Timed at bench start AND end, it anchors the whole run
    * against the box's ambient load: a round whose queries all drift
    * 1.3x while the probe also drifts 1.3x is a slow WINDOW, not a
    * regression. Per-query min-of-N cannot detect that case (r13/r14
    * both manufactured phantom regressions in sustained slow windows);
    * a constant-work anchor can.
    */
  private[graft] def calibProbe(spark: SparkSession, sfDir: String): Double = {
    val t0 = System.nanoTime()
    spark.range(20000000L).selectExpr("sum(id * 2 + 1)").collect()
    try spark.read.parquet(s"$sfDir/orders.parquet")
      .agg(sum(col("o_totalprice")), count(lit(1))).collect()
    catch { case _: Throwable => () }
    (System.nanoTime() - t0) / 1e9
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
    // Timing estimator: see [[robustTime]]. (Safe to repeat: the mutating
    // queries recreate their scratch tables from scratch per invocation.)
    val wall0 = System.nanoTime()
    def now(): Double = (System.nanoTime() - wall0) / 1e9
    val calibStart = calibProbe(spark, sfDir)
    val tCalibStart = now()
    // SPARK_GRAFT_ONLY=q1,q2 restricts the run to the named queries —
    // for per-query attribution work (e.g. back-to-back variance runs
    // of one family); the driver never sets it, so round benches are
    // always the full suite
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val named = {
      val all = SparkEntry.queries.toSeq.sortBy(_._1)
      only.map(o => all.filter(kv => o(kv._1))).getOrElse(all)
    }
    val midIdx = named.size / 2
    var calibMid = calibStart
    var tCalibMid = tCalibStart
    val results = named.zipWithIndex.map { case ((name, fn), i) =>
      if (i == midIdx) {
        calibMid = calibProbe(spark, sfDir)
        tCalibMid = now()
      }
      val (best, runs, err, flaky) =
        robustTime(() => timeQuery(spark, sfDir, name, fn))
      (name, best, runs, err, flaky, now())
    }
    val calibEnd = calibProbe(spark, sfDir)
    val tCalibEnd = now()
    // Calib-normalized view, v2 (the r17 ask — v1 over-corrected: two
    // same-code runs whose RAW totals agreed within 2 % produced
    // normalized totals 34 % apart, because dividing by an ABSOLUTE
    // pure-CPU probe value scales IO/overhead-bound queries by the full
    // CPU-ambient ratio they only partly feel). v2 changes two things:
    //  1. WITHIN-RUN centering: the correction is against the run's own
    //     mean probe, not the absolute CalibRef — a uniformly slower or
    //     faster box gets NO correction (raw is the cross-run signal,
    //     and RAW IS PRIMARY), only within-run drift (slow start,
    //     thermal sag) is normalized away;
    //  2. DAMPING: the ratio enters at exponent α = 0.5, splitting the
    //     difference between "queries are pure CPU" (α = 1) and
    //     "queries don't feel ambient at all" (α = 0) — the r16/r17
    //     A/B showed real queries sit between the two.
    // Back-to-back same-box verification (this round): raw totals and
    // v2-normalized totals now agree to the same order (see BENCHNOTES
    // .md). CalibRef stays in the output for cross-round context only.
    val CalibRef = 0.5
    val NormAlpha = 0.5
    // MEDIAN, not mean: the start probe runs JVM-cold (JIT, page
    // cache) and reads 2-4x the steady-state probes, so a mean would
    // let one cold probe shift the whole run's center; the median is
    // the steady-state ambient level (5-run A/B in BENCHNOTES.md)
    val calibRun = Seq(calibStart, calibMid, calibEnd).sorted.apply(1)
    def calibAt(t: Double): Double = {
      val c =
        if (t <= tCalibStart) calibStart
        else if (t <= tCalibMid && tCalibMid > tCalibStart)
          calibStart + (calibMid - calibStart) *
            ((t - tCalibStart) / (tCalibMid - tCalibStart))
        else if (t <= tCalibEnd && tCalibEnd > tCalibMid)
          calibMid + (calibEnd - calibMid) *
            ((t - tCalibMid) / (tCalibEnd - tCalibMid))
        else calibEnd
      math.max(c, 0.05) // probe noise floor: never divide by ~0
    }
    def normalize(secs: Double, tDone: Double): Double =
      secs * math.pow(calibRun / calibAt(tDone), NormAlpha)
    // which probe segment a completion time fell in: 0 = start→mid,
    // 1 = mid→end, 2 = after the end probe (clock skew only)
    def calibSeg(t: Double): Int =
      if (t <= tCalibMid) 0 else if (t <= tCalibEnd) 1 else 2
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
    val qs = results.map { case (k, v, _, _, _, _) => s"\"" + k + "\":" + sec2(v) }
      .mkString("{", ",", "}")
    // the calib-normalized per-query view (see normalize above)
    val qsNorm = results.map { case (k, v, _, _, _, t) =>
      s"\"" + k + "\":" + sec2(normalize(v, t))
    }.mkString("{", ",", "}")
    // both raw iterations (first = cold: JIT/page-cache; second = warm) so
    // cross-round regressions separate environment noise from plan changes
    val runs = results.map { case (k, _, rs, _, _, _) =>
      s"\"" + k + "\":" + rs.map(sec).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // per-query ambient pairing (the r18 ask: outlier adjudication was
    // hand-matching a query's position against three probes): each
    // query's interpolated probe level AT ITS COMPLETION TIME plus the
    // probe segment it fell in — an outlier dispute is now arithmetic
    // (seconds vs calib_at on the same line), not forensics
    val calibAtQ = results.map { case (k, _, _, _, _, t) =>
      s"\"" + k + "\":[" + sec2(calibAt(t)) + "," + calibSeg(t) + "]"
    }.mkString("{", ",", "}")
    val errs = results.collect {
      case (k, _, _, Some(e), _, _) => s"\"$k\":${jstr(e)}"
    }.mkString("{", ",", "}")
    // a third-run crash after two good timings: reported time stands
    // (min of the good runs) but the failure stays visible here
    val flaky = results.collect {
      case (k, _, _, _, Some(e), _) => s"\"$k\":${jstr(e)}"
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val totalNorm = results.map { case (_, v, _, _, _, t) =>
      normalize(v, t) }.sum
    // gust summary (r21 VERDICT Next #5 — additions only, timing
    // untouched): iteration spread per query, folded to three fixed
    // numbers on the compact totals line so a contaminated window is
    // diagnosable from the tail capture alone. A query "gusts" when
    // its iterations disagree >1.5x (>3x for the hard count) above
    // the 1 s jitter floor; excess_sec is the summed max-min over
    // gusting queries — the wall-clock the window injected beyond the
    // reported minimums.
    val spreads = results.map { case (_, _, rs, _, _, _) =>
      (rs.min, rs.max) }
    def gusty(f: Double) = spreads.count { case (lo, hi) =>
      hi > f * lo && hi > 1.0 }
    val gustExcess = spreads.collect { case (lo, hi)
      if hi > 1.5 * lo && hi > 1.0 => hi - lo }.sum
    // THREE lines, bulky first: the driver's output capture is
    // tail-anchored (~2000 chars), and r12 proved that even at 2-decimal
    // precision an 86-query dict overflows it — the totals line lost its
    // head and `parsed` came back null. The per-query dict now rides its
    // own line; the FINAL line is a compact fixed-size total (value +
    // errors only, no per-query dict) that parses alone no matter how
    // many queries exist.
    // a filtered run must be self-describing: without this marker a
    // SPARK_GRAFT_ONLY subset's totals could be mistaken for a
    // full-suite bench (only n_queries hinted at it)
    val onlyField = only.fold("") { o =>
      s""","only":${o.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")}"""
    }
    val lines = Seq(
      s"""{"metric":"total_detail","queries_runs":$runs,"calib_at":$calibAtQ,"sf":"$sfDir"$onlyField}""",
      s"""{"metric":"total_queries_norm","queries":$qsNorm,"calib_ref":$CalibRef,"calib_run":${sec(calibRun)},"alpha":$NormAlpha,"sf":"$sfDir"}""",
      s"""{"metric":"total_queries","queries":$qs,"sf":"$sfDir"}""",
      s"""{"metric":"total","value":${sec(total)},"value_norm":${sec(totalNorm)},"unit":"sec","n_queries":${results.size},"errors":$errs,"flaky":$flaky,"calib":{"start":${sec(calibStart)},"mid":${sec(calibMid)},"end":${sec(calibEnd)},"ref":$CalibRef},"gust":{"n1_5x":${gusty(1.5)},"n3x":${gusty(3.0)},"excess_sec":${sec2(gustExcess)}},"sf":"$sfDir"$onlyField}""")
    lines.foreach(println)
    // The driver's output capture is tail-anchored (~2000 chars), which
    // hides the per-query detail and calib pairing from the committed
    // BENCH_r{N}.json — so the FULL detail also lands on disk, where it
    // is committed alongside the round artifacts (BENCH_DETAIL_r{N}
    // .json) and adjudication reads a self-sufficient file instead of
    // builder logs.
    try {
      val p = java.nio.file.Paths.get("target", "bench_detail.json")
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.writeString(p, lines.mkString("", "\n", "\n"))
      System.err.println(s"[bench] full detail written to $p")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write detail file: $e")
    }
    System.out.flush()
    spark.stop()
    if (results.exists(_._4.isDefined)) sys.exit(1)
  }
}
