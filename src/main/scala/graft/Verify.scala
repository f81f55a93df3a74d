package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * LOUD BY CONSTRUCTION (the r18 lesson: the round's official
  * CORRECTNESS_r18.json came back `{}` while the engine was healthy —
  * a silently-empty gate would mask a real regression just as well):
  * the run ends with ONE machine-parsable JSON summary line
  * (`{"queries":N,"dumped":N,"oracle_entries":N,...}`) and exits
  * NONZERO unless every selected query dumped a non-empty parquet dir
  * AND the written oracle map covers exactly the declared queries
  * (minus the documented sf0.01-only golden literals at other scales).
  * A passing gate and an empty gate are now distinguishable at a
  * glance; VerifySpec pins the summary/exit invariants.
  */
object Verify {

  /** A dumped query dir is usable by the driver iff it holds at least
    * one non-empty parquet part file (a zero-row result still writes a
    * schema-bearing part; a crashed write leaves nothing).
    */
  private[graft] def dumpNonEmpty(dir: Path): Boolean =
    Files.isDirectory(dir) && {
      val s = Files.list(dir)
      try s.iterator().asScala.exists(p =>
        p.getFileName.toString.endsWith(".parquet") && Files.size(p) > 0)
      finally s.close()
    }

  /** The gate's pass/fail decision, pure for spec-pinning: every
    * selected query dumped, and oracle coverage over the FULL declared
    * set is total up to the documented sf-gated omissions (empty
    * `missingOracle` at sf0.01; a subset of the golden-literal names
    * elsewhere) with no orphan oracle keys.
    */
  private[graft] def gateOk(selected: Set[String], dumped: Set[String],
                            allQueries: Set[String],
                            oracleKeys: Set[String],
                            sf001: Boolean): Boolean = {
    val missingOracle = allQueries.diff(oracleKeys)
    val allowedMissing =
      if (sf001) Set.empty[String]
      else SparkEntry.sf001OnlyOracles ++ SparkEntry.sf001RegimeOracles
    selected.subsetOf(dumped) &&
      oracleKeys.subsetOf(allQueries) &&
      missingOracle.subsetOf(allowedMissing)
  }

  private[graft] def summaryLine(queries: Int, dumped: Int,
                                 oracleEntries: Int, ok: Boolean,
                                 failed: Seq[String]): String = {
    val f = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    s"""{"queries":$queries,"dumped":$dumped,"oracle_entries":$oracleEntries,"ok":$ok,"failed":$f}"""
  }

  /** The whole gate as a function returning the exit code — `main`
    * without the `sys.exit`, so VerifySpec can drive it end-to-end.
    */
  private[graft] def run(args: Array[String]): Int = {
    require(args.length >= 2, "usage: Verify <sfDir> <outDir> [query...]")
    val Array(sfDir, outDir) = args.take(2)
    // optional trailing query names: dump only those (local iteration);
    // the driver passes two args and gets every query
    val only = args.drop(2).toSet
    val unknown = only.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")} — a typo here would " +
        "silently dump nothing")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // VerifySpec drives run() inside the shared test session — stopping
    // a session we didn't create would kill every later suite
    val preExisting = SparkSession.getDefaultSession.isDefined
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
    val dumped = selected.flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // verify the write LANDED — an empty dir from a swallowed
        // executor-side failure must not count as dumped
        if (dumpNonEmpty(Paths.get(outDir, name))) Some(name)
        else { System.err.println(s"[verify] $name wrote an empty dir"); None }
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        None
      }
    }.toSet
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // oracleSqlFor drops golden-literal oracles pinned to sf0.01 when
    // verifying any other scale factor (rows-only fallback there)
    val oracle = SparkEntry.oracleSqlFor(sfDir)
    val json = oracle
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    if (!preExisting) spark.stop()
    val sf001 = sfDir.replaceAll("/+$", "").endsWith("sf0.01")
    val ok = gateOk(selected.keySet.toSet, dumped,
      SparkEntry.queries.keySet.toSet, oracle.keySet.toSet, sf001)
    println(summaryLine(selected.size, dumped.size, oracle.size, ok,
      selected.keySet.toSeq.diff(dumped.toSeq)))
    System.out.flush()
    if (ok) 0 else 1
  }

  def main(args: Array[String]): Unit = {
    val rc = run(args)
    if (rc != 0) sys.exit(rc)
  }
}
