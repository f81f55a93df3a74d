package graft.tables

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[ManagedTable.convert]]: an existing parquet directory becomes a
  * managed table in O(metadata) — hard-linked files, footer stats, one
  * CONVERT commit — and the converted table supports the full surface
  * (pruned reads, DML, history).
  */
class ConvertSpec extends SparkSpec {
  import spark.implicits._

  test("plain parquet dir converts zero-copy; stats prune; DML works") {
    val src = tmpDir("cvt1_src")
    spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("v"))
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
      .write.parquet(src)
    val t = ManagedTable.convert(spark, src, tmpDir("cvt1"))
    assert(t.toDF.count() == 1000)
    assert(t.history.head().getString(2) == "CONVERT")
    // footer stats landed: a key-range probe prunes files
    assert(t.toDFWhere("k < 10").inputFiles.length == 1)
    assert(t.toDFWhere("k < 10").count() == 10)
    // adopted files are links, not copies
    val walked = java.nio.file.Files.walk(
      java.nio.file.Paths.get(t.location, "data"))
    val linked = try {
      import scala.jdk.CollectionConverters._
      walked.iterator().asScala.filter(_.toString.endsWith(".parquet"))
        .forall(p => java.nio.file.Files.getAttribute(p, "unix:nlink")
          .asInstanceOf[Number].intValue() >= 2)
    } finally walked.close()
    assert(linked)
    // DML on the converted table (file-granular rewrite of linked files)
    assert(t.delete("k < 250") == 250)
    assert(t.toDF.count() == 750)
    // the source directory is untouched
    assert(spark.read.parquet(src).count() == 1000)
  }

  test("hive-partitioned dir converts with partition pruning") {
    val src = tmpDir("cvt2_src")
    spark.range(300).select(col("id").as("k"),
        (col("id") % 3).cast("string").as("p"))
      .write.partitionBy("p").parquet(src)
    val t = ManagedTable.convert(spark, src, tmpDir("cvt2"),
      partitionBy = Seq("p"))
    assert(t.partitionColumns == Seq("p"))
    assert(t.toDF.count() == 300)
    assert(t.toDFWhere("p = '1'").count() == 100)
    // wrong partition spec refuses
    val e = intercept[IllegalArgumentException](
      ManagedTable.convert(spark, src, tmpDir("cvt2b"),
        partitionBy = Seq("nope")))
    assert(e.getMessage.contains("hive-layout"))
  }
}
