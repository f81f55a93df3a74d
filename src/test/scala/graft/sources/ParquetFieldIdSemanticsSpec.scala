package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkSpec
import scala.jdk.CollectionConverters._

/** Pins the SPARK semantics the Iceberg field-id design is built on —
  * if an upgrade changes these, the import's regime rules need
  * re-deriving:
  *
  *  1. with `fieldId.read.enabled`, an id-bearing read schema resolves
  *     parquet columns BY ID (names ignored) — what makes renamed-table
  *     imports readable;
  *  2. an id-less file under an id-bearing read schema THROWS by
  *     default — why graft's writeData re-stamps ids into every write
  *     to an id-bearing table (a post-import append would otherwise
  *     brick the table);
  *  3. `fieldId.read.ignoreMissing=true` does NOT fall back to name
  *     matching — it NULL-FILLS the id-less file (verified; this ruled
  *     out the scan-side "fix" as silent corruption).
  */
class ParquetFieldIdSemanticsSpec extends SparkSpec {

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("id-resolution reads by id; id-less files throw by default and " +
       "NULL-FILL (not name-match) under ignoreMissing") {
    val dir = tmpDir("fid-sem")
    val idSchema = StructType(Seq(
      StructField("name", StringType, metadata =
        new MetadataBuilder().putLong("parquet.field.id", 2L).build()),
      StructField("id", LongType, metadata =
        new MetadataBuilder().putLong("parquet.field.id", 1L).build())))
    withConf("spark.sql.parquet.fieldId.write.enabled" -> "true") {
      spark.createDataFrame(Seq(Row("alice", 1L)).asJava, idSchema)
        .write.parquet(dir + "/a")
    }
    withConf("spark.sql.parquet.fieldId.write.enabled" -> "false") {
      spark.createDataFrame(Seq(Row("bob", 2L)).asJava,
        StructType(Seq(StructField("customer", StringType),
          StructField("id", LongType))))
        .write.parquet(dir + "/b")
    }
    // read schema: renamed column, different order, ids on both fields
    val readSchema = StructType(Seq(
      StructField("id", LongType, metadata =
        new MetadataBuilder().putLong("parquet.field.id", 1L).build()),
      StructField("customer", StringType, metadata =
        new MetadataBuilder().putLong("parquet.field.id", 2L).build())))
    withConf("spark.sql.parquet.fieldId.read.enabled" -> "true") {
      // (1) id file: resolved by id despite the rename
      val a = spark.read.schema(readSchema).parquet(dir + "/a").collect()
      assert(a.toSeq.map(r => (r.getLong(0), r.getString(1))) ==
        Seq((1L, "alice")))
      // (2) id-less file: throws by default
      intercept[Exception] {
        spark.read.schema(readSchema).parquet(dir + "/b").collect()
      }
      // (3) ignoreMissing=true: NULL-FILLS the id-less file — it does
      // NOT name-match ('customer' exists in the file by name!)
      withConf("spark.sql.parquet.fieldId.read.ignoreMissing" -> "true") {
        val b = spark.read.schema(readSchema).parquet(dir + "/b").collect()
        assert(b.length == 1)
        assert(b.head.isNullAt(0) && b.head.isNullAt(1),
          s"expected full null-fill, got ${b.head}")
      }
    }
  }
}
