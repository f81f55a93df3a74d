package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

class WebDatasetSpec extends SparkSpec {
  import spark.implicits._

  private val schema = new StructType()
    .add("key", StringType).add("txt", StringType).add("meta", StringType)

  private def sample() = df(schema, Seq(
    Row("000001", "first doc", """{"lang":"en"}"""),
    Row("000002", "second doc", null), // absent modality
    Row("000003", null, """{"lang":"de"}""")))

  test("samples round-trip with adjacency grouping; nulls are absent") {
    val dir = tmpDir("wds_rt")
    WebDataset.export(sample().coalesce(1), "key",
      Seq("txt" -> "txt", "meta" -> "json"), dir)
    val back = WebDataset.read(spark, dir + "/shard-*")
      .select(col("key"), col("parts.txt").cast("string").as("txt"),
        col("parts.json").cast("string").as("meta"))
      .collect().sortBy(_.getString(0))
    assert(back.length == 3)
    assert(back(0).getString(1) == "first doc")
    assert(back(0).getString(2) == """{"lang":"en"}""")
    assert(back(1).getString(1) == "second doc")
    assert(back(1).isNullAt(2), "null cell = absent modality = null read")
    assert(back(2).isNullAt(1))
    assert(back(2).getString(2) == """{"lang":"de"}""")
  }

  test("first-dot key rule: x.seg.json groups under x as seg.json") {
    val dir = tmpDir("wds_dot")
    val d = df(new StructType().add("key", StringType)
      .add("a", BinaryType).add("b", BinaryType), Seq(
      Row("s1", "A".getBytes("UTF-8"), "B".getBytes("UTF-8"))))
    WebDataset.export(d.coalesce(1), "key",
      Seq("a" -> "seg.json", "b" -> "txt"), dir)
    val r = WebDataset.read(spark, dir + "/shard-*").head
    assert(r.getString(1) == "s1")
    val parts = r.getMap[String, Array[Byte]](2)
    assert(parts.keys.toSet == Set("seg.json", "txt"))
    assert(new String(parts("seg.json"), "UTF-8") == "A")
  }

  test("plain and gzip shards mix; shard count = partition count") {
    val dir = tmpDir("wds_gz")
    val d = (0 until 20).map(i => (f"k$i%03d", s"body $i"))
      .toDF("key", "txt")
    WebDataset.export(d.repartition(3), "key", Seq("txt" -> "txt"), dir)
    WebDataset.export(d.repartition(2), "key", Seq("txt" -> "txt"),
      dir, gzip = true)
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(names.count(_.endsWith(".tar")) == 3)
    assert(names.count(_.endsWith(".tar.gz")) == 2)
    val all = WebDataset.read(spark, dir + "/shard-*")
    assert(all.count() == 40)
    assert(all.select("key").distinct().count() == 20)
  }

  test("binary payloads with NULs and 512-boundary sizes round-trip") {
    val sizes = Seq(0, 1, 511, 512, 513, 1024)
    val rows = sizes.map { n =>
      Row(f"b$n%05d", Array.tabulate[Byte](n)(i => (i % 251).toByte))
    }
    val dir = tmpDir("wds_bin")
    WebDataset.export(
      df(new StructType().add("key", StringType).add("bin", BinaryType),
        rows).coalesce(1), "key", Seq("bin" -> "bin"), dir)
    val back = WebDataset.read(spark, dir + "/shard-*")
      .select(col("key"), col("parts.bin").as("bin"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    sizes.foreach { n =>
      assert(back(f"b$n%05d").toSeq ==
        Array.tabulate[Byte](n)(i => (i % 251).toByte).toSeq,
        s"payload of size $n mangled")
    }
  }

  test("dotted or slashed keys are refused (they would break grouping)") {
    val dir = tmpDir("wds_refuse")
    val e = intercept[org.apache.spark.SparkException] {
      WebDataset.export(Seq(("bad.key", "x")).toDF("key", "txt"),
        "key", Seq("txt" -> "txt"), dir)
    }
    assert(e.getMessage.contains("dot- and slash-free") ||
      Option(e.getCause).exists(_.getMessage.contains("dot- and slash-free")))
  }

  test("GNU tar reads our shards; we read GNU tar's (ustar interop)") {
    import scala.sys.process._
    val dir = tmpDir("wds_interop")
    WebDataset.export(sample().coalesce(1), "key",
      Seq("txt" -> "txt", "meta" -> "json"), dir)
    val shard = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).head
    val listed = Seq("tar", "-tf", shard.getAbsolutePath).!!.trim
      .split("\n").toSet
    assert(listed == Set("000001.txt", "000001.json", "000002.txt",
      "000003.json"), s"GNU tar saw: $listed")
    // now the reverse: a GNU-tar-authored archive
    val src = new java.io.File(dir, "gnu-src")
    src.mkdirs()
    java.nio.file.Files.write(new java.io.File(src, "s9.txt").toPath,
      "gnu payload".getBytes("UTF-8"))
    java.nio.file.Files.write(new java.io.File(src, "s9.json").toPath,
      """{"by":"gnu"}""".getBytes("UTF-8"))
    val gnuTar = new java.io.File(dir, "gnu/shard-gnu.tar")
    gnuTar.getParentFile.mkdirs()
    assert(Seq("tar", "-cf", gnuTar.getAbsolutePath, "-C",
      src.getAbsolutePath, "s9.txt", "s9.json").! == 0)
    val r = WebDataset.read(spark, dir + "/gnu/shard-*.tar").head
    assert(r.getString(1) == "s9")
    val parts = r.getMap[String, Array[Byte]](2)
    assert(new String(parts("txt"), "UTF-8") == "gnu payload")
    assert(new String(parts("json"), "UTF-8") == """{"by":"gnu"}""")
  }


  test("directory prefixes stay in the key (base_plus_ext): adjacent " +
       "a/0001.* and b/0001.* are distinct samples, not merged") {
    import scala.sys.process._
    val dir = tmpDir("wds_dirkeys")
    val src = new java.io.File(dir, "src")
    new java.io.File(src, "a").mkdirs()
    new java.io.File(src, "b").mkdirs()
    java.nio.file.Files.write(new java.io.File(src, "a/0001.jpg").toPath,
      Array[Byte](1, 2, 3))
    java.nio.file.Files.write(new java.io.File(src, "b/0001.txt").toPath,
      "other sample".getBytes("UTF-8"))
    val tar = new java.io.File(dir, "shards/shard-0.tar")
    tar.getParentFile.mkdirs()
    assert(Seq("tar", "-cf", tar.getAbsolutePath, "-C",
      src.getAbsolutePath, "a/0001.jpg", "b/0001.txt").! == 0)
    val rows = WebDataset.read(spark, dir + "/shards/shard-*.tar")
      .collect().map(r => r.getString(1) ->
        r.getMap[String, Array[Byte]](2).keys.toSet).toMap
    assert(rows.keySet == Set("a/0001", "b/0001"),
      s"got keys ${rows.keySet}")
    assert(rows("a/0001") == Set("jpg") && rows("b/0001") == Set("txt"))
  }

  test("long tar names refuse loudly instead of mis-grouping") {
    import scala.sys.process._
    val dir = tmpDir("wds_long")
    val src = new java.io.File(dir, "src")
    src.mkdirs()
    val longBase = "k" * 120 // forces a GNU longname ('L') entry
    java.nio.file.Files.write(
      new java.io.File(src, longBase + ".txt").toPath,
      "x".getBytes("UTF-8"))
    val tarFile = new java.io.File(dir, "shard-long.tar")
    assert(Seq("tar", "-cf", tarFile.getAbsolutePath, "-C",
      src.getAbsolutePath, longBase + ".txt").! == 0)
    val e = intercept[org.apache.spark.SparkException] {
      WebDataset.read(spark, dir + "/shard-long.tar").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("long-name")),
      s"expected the loud long-name refusal, got: $e")
  }
}
