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

  private def rmTree(p: java.nio.file.Path): Unit = {
    val s = java.nio.file.Files.walk(p)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
    } finally s.close()
  }

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
    // a partition name that is only a SUFFIX of the real one refuses
    // too (segment-wise startsWith, not substring contains: a
    // fiscalyear=… layout must not satisfy partitionBy("year"))
    val src2 = tmpDir("cvt2fy_src")
    spark.range(20).select(col("id").as("k"),
        (col("id") % 2).cast("string").as("fiscalyear"))
      .write.partitionBy("fiscalyear").parquet(src2)
    val e2 = intercept[IllegalArgumentException](
      ManagedTable.convert(spark, src2, tmpDir("cvt2fy"),
        partitionBy = Seq("year")))
    assert(e2.getMessage.contains("hive-layout"))
  }

  test("hidden and underscore directories are not adopted") {
    val src = tmpDir("cvt3_src")
    spark.range(100).select(col("id").as("k")).write.parquet(src)
    // junk a killed job and a Delta log would leave behind — Spark's
    // reader ignores these; convert must too
    val p = java.nio.file.Paths.get(src)
    val tmp = p.resolve("_temporary/0/task_1")
    java.nio.file.Files.createDirectories(tmp)
    spark.range(5).select(col("id").as("k")).write
      .parquet(p.resolve("junk_stage").toString)
    val junk = java.nio.file.Files.list(p.resolve("junk_stage"))
    try {
      import scala.jdk.CollectionConverters._
      junk.iterator().asScala.filter(_.toString.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(f,
          tmp.resolve(f.getFileName)))
    } finally junk.close()
    rmTree(p.resolve("junk_stage"))
    val t = ManagedTable.convert(spark, src, tmpDir("cvt3"))
    assert(t.toDF.count() == 100)
    assert(t.toDF.count() == spark.read.parquet(src).count())
  }

  test("flattened name collisions get distinct targets") {
    val src = tmpDir("cvt4_src")
    val p = java.nio.file.Paths.get(src)
    // a/b-c.parquet and a-b/c.parquet both flatten to a-b-c.parquet
    spark.range(10).select(col("id").as("k")).coalesce(1)
      .write.parquet(p.resolve("stage").toString)
    val one = {
      val s = java.nio.file.Files.list(p.resolve("stage"))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.find(_.toString.endsWith(".parquet")).get
      } finally s.close()
    }
    java.nio.file.Files.createDirectories(p.resolve("a"))
    java.nio.file.Files.createDirectories(p.resolve("a-b"))
    java.nio.file.Files.copy(one, p.resolve("a/b-c.parquet"))
    java.nio.file.Files.copy(one, p.resolve("a-b/c.parquet"))
    rmTree(p.resolve("stage"))
    val t = ManagedTable.convert(spark, src, tmpDir("cvt4"))
    assert(t.toDF.count() == 20)
  }

  test("explicit schema pins types and skips inference") {
    val src = tmpDir("cvt5_src")
    spark.range(60).select(col("id").as("k"),
        (col("id") % 3).cast("string").as("p"))
      .write.partitionBy("p").parquet(src)
    import org.apache.spark.sql.types._
    val pinned = StructType(Seq(
      StructField("k", LongType), StructField("p", StringType)))
    val t = ManagedTable.convert(spark, src, tmpDir("cvt5"),
      partitionBy = Seq("p"), schema = Some(pinned))
    // inference would type p as integer; the pinned schema keeps string
    assert(t.toDF.schema("p").dataType == StringType)
    assert(t.toDFWhere("p = '1'").count() == 20)
  }

  test("vacuum grace period covers adopted files despite ancient mtimes") {
    val src = tmpDir("cvt6_src")
    spark.range(200).select(col("id").as("k"), col("id").as("v"))
      .repartitionByRange(2, col("k")).sortWithinPartitions("k")
      .write.parquet(src)
    // age the source inodes far past any cutoff (hard links share them)
    val s = java.nio.file.Files.walk(java.nio.file.Paths.get(src))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(_.toString.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.setLastModifiedTime(f,
          java.nio.file.attribute.FileTime.fromMillis(1L)))
    } finally s.close()
    val t = ManagedTable.convert(spark, src, tmpDir("cvt6"))
    // replace one adopted file via file-granular DELETE, then vacuum
    // with a non-zero grace: the just-unreferenced adopted file must
    // survive (recency retention), even though its mtime is ancient
    assert(t.delete("k < 100") == 100)
    val (dirs, _) = t.vacuum(retainVersions = 1,
      minAgeMillis = 60 * 60 * 1000L)
    assert(dirs == 0L, "adopted file reclaimed inside the grace period")
    // with the grace collapsed the same file IS reclaimed
    val (dirs2, _) = t.vacuum(retainVersions = 1, minAgeMillis = 0L)
    assert(dirs2 >= 1L)
    assert(t.toDF.count() == 100)
  }
}
