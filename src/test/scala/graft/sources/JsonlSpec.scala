package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private val schema = new StructType()
    .add("id", LongType).add("text", StringType).add("lang", StringType)

  private def docs = Seq(
    (1L, "hello jsonl world", "en"),
    (2L, "zweites dokument mit umlauten: äöü", "de"),
    (3L, "third \"quoted\" and \\ escaped\nwith a newline", "de"),
    (4L, "", "en")) // empty text round-trips as "", not null
    .toDF("id", "text", "lang")

  test("gzip round-trip is bit-exact, including escapes and newlines") {
    val dir = tmpDir("jsonl_rt")
    Jsonl.export(docs.repartition(2), dir)
    // gzip shards with the interchange extension
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".json.gz"))
    assert(files.length == 2, files.map(_.getName).toSeq.toString)
    val back = Jsonl.read(spark, dir, schema)
    // (corrupt-only plans are disallowed on raw files — Catalyst prunes a
    // filter+count down to the corrupt column; collect both instead)
    assert(back.select("id", "_corrupt_record").collect()
      .forall(_.isNullAt(1)))
    val got = back.select("id", "text", "lang").as[(Long, String, String)]
      .collect().sortBy(_._1).toSeq
    assert(got == docs.as[(Long, String, String)].collect().sortBy(_._1).toSeq)
  }

  test("pinned schema: no inference, extra JSON fields pruned silently") {
    val dir = tmpDir("jsonl_extra")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.json"),
      ("{\"id\": 7, \"text\": \"t\", \"lang\": \"en\", \"extra\": [1,2]}\n" +
        "{\"id\": 8, \"lang\": \"fr\"}\n") // missing field -> null, not corrupt
        .getBytes("UTF-8"))
    val back = Jsonl.read(spark, dir, schema)
    assert(back.columns.toSeq ==
      Seq("id", "text", "lang", "_corrupt_record"))
    val rows = back.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(1).getLong(0) == 8L && rows(1).isNullAt(1) &&
      rows(1).isNullAt(3), "absent optional field is null, row is clean")
  }

  test("malformed and type-mismatched lines quarantine; clean rows survive") {
    val dir = tmpDir("jsonl_bad")
    Jsonl.export(docs, dir, gzip = false)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "bad.json"),
      ("{truncated\n" +
        "utter garbage\n" +
        "{\"id\": \"not-a-long\", \"text\": \"x\", \"lang\": \"en\"}\n")
        .getBytes("UTF-8"))
    val parsed = Jsonl.read(spark, dir, schema)
      .persist() // both split sides consumed below
    val (clean, quarantine) = Jsonl.partitionCorrupt(parsed)
    assert(clean.count() == 4 && !clean.columns.contains("_corrupt_record"))
    val bad = quarantine.as[String].collect().toSet
    assert(bad.size == 3 && bad.exists(_.contains("truncated")) &&
      bad.exists(_.contains("not-a-long")),
      s"raw lines preserved for re-parse/audit: $bad")
    parsed.unpersist()
    // corruptCol collision is rejected up front
    intercept[IllegalArgumentException](
      Jsonl.read(spark, dir, schema.add("_corrupt_record", StringType)))
  }
}
