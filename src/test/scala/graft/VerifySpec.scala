package graft

import java.nio.file.{Files, Paths}

/** The correctness gate must be loud-by-construction: r18's official
  * artifact came back `{}` while the engine was healthy, proving the
  * gate could fail SILENTLY. These specs pin the summary-line and
  * exit-code invariants that make an empty gate distinguishable from a
  * passing one.
  */
class VerifySpec extends SparkSpec {

  private val allQ = Set("a", "b", "c") ++ SparkEntry.sf001OnlyOracles

  test("gateOk passes when every selected query dumped and oracle " +
       "coverage is total (sf0.01)") {
    assert(Verify.gateOk(allQ, allQ, allQ, allQ, sf001 = true))
  }

  test("gateOk fails when a selected query did not dump") {
    assert(!Verify.gateOk(allQ, allQ - "a", allQ, allQ, sf001 = true))
  }

  test("gateOk fails at sf0.01 when any query lacks an oracle — even a " +
       "golden-literal one (totality is the sf0.01 contract)") {
    assert(!Verify.gateOk(allQ, allQ, allQ,
      allQ - SparkEntry.sf001OnlyOracles.head, sf001 = true))
  }

  test("gateOk allows exactly the documented golden-literal omissions " +
       "at other scale factors, nothing else") {
    val dropped = allQ -- SparkEntry.sf001OnlyOracles
    assert(Verify.gateOk(allQ, allQ, allQ, dropped, sf001 = false))
    assert(!Verify.gateOk(allQ, allQ, allQ, dropped - "b", sf001 = false))
  }

  test("gateOk fails on orphan oracle keys (an oracle for a query that " +
       "does not exist would desync the driver's compare)") {
    assert(!Verify.gateOk(allQ, allQ, allQ, allQ + "ghost", sf001 = true))
  }

  test("summaryLine is one-line machine-parsable JSON carrying the " +
       "three counts, the verdict, and the failed list") {
    val line = Verify.summaryLine(176, 175, 176, ok = false, Seq("zq", "aq"))
    assert(!line.contains("\n"))
    val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    assert(n.get("queries").asInt() == 176)
    assert(n.get("dumped").asInt() == 175)
    assert(n.get("oracle_entries").asInt() == 176)
    assert(!n.get("ok").asBoolean())
    assert(n.get("failed").get(0).asText() == "aq") // sorted
  }

  test("dumpNonEmpty: only a dir holding a non-empty parquet part counts") {
    val d = Paths.get(tmpDir("verify-dump"))
    assert(!Verify.dumpNonEmpty(d)) // missing
    Files.createDirectories(d)
    assert(!Verify.dumpNonEmpty(d)) // empty dir
    Files.writeString(d.resolve("_SUCCESS"), "")
    assert(!Verify.dumpNonEmpty(d)) // marker only
    Files.writeString(d.resolve("part-00000.parquet"), "")
    assert(!Verify.dumpNonEmpty(d)) // zero-byte part
    Files.writeString(d.resolve("part-00001.parquet"), "PAR1")
    assert(Verify.dumpNonEmpty(d))
  }

  test("end-to-end: run() on a real subset exits 0, dumps parquet, " +
       "writes oracle_sql.json, and leaves the shared session alive") {
    val out = tmpDir("verify-e2e")
    spark.range(1).count() // ensure the shared session exists first
    val rc = Verify.run(Array("/root/testdata/sf0.001", out,
      "humanize_bytes", "q1_agg"))
    assert(rc == 0)
    assert(Verify.dumpNonEmpty(Paths.get(out, "q1_agg")))
    assert(Verify.dumpNonEmpty(Paths.get(out, "humanize_bytes")))
    val oracle = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readString(Paths.get(out, "oracle_sql.json")))
    assert(oracle.has("q1_agg") && oracle.has("humanize_bytes"))
    // run() must not have stopped the pre-existing shared session
    assert(!spark.sparkContext.isStopped)
    assert(spark.range(3).count() == 3)
  }
}
