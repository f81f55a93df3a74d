package graft.tables

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bloom-filter file skipping ([[BloomSkip]]): parquet-native filters
  * written for `graft.bloom.columns`, equality probes pruning files
  * min/max bounds cannot (high-cardinality hash-like values whose
  * ranges all overlap), correctness of every pruned read, and the DML
  * candidate narrowing.
  */
class BloomSkipSpec extends SparkSpec {
  import spark.implicits._

  /** A table of md5-ish keys spread over `nFiles` files — every file's
    * [min, max] on `h` spans nearly the whole hex domain, so bounds
    * alone prune nothing.
    */
  private def hashTable(name: String, nFiles: Int = 8,
                        rows: Int = 4000): ManagedTable = {
    val df = spark.range(rows.toLong)
      .select(col("id"), md5(col("id").cast("string")).as("h"),
        (col("id") % 97).as("grp"))
    ManagedTable.create(df.repartition(nFiles), tmpDir(name),
      properties = Map(BloomSkip.columnsPropKey -> "h,id",
        s"${BloomSkip.ndvPropKey}.h" -> "2000"))
  }

  test("point probe on a bloom column reads a fraction of the files") {
    val t = hashTable("bloom1")
    val total = t.detail.numFiles
    assert(total >= 8)
    val probe = md5(lit("1234").cast("string"))
    val target = spark.range(1).select(probe).head().getString(0)
    val hit = t.toDFWhere(s"h = '$target'")
    assert(hit.collect().map(_.getLong(0)).toSeq == Seq(1234L))
    assert(hit.inputFiles.length * 2 <= total,
      s"expected bloom skipping, read ${hit.inputFiles.length} of $total")
    // bounds alone keep everything: same probe on a non-indexed shape
    val noBloom = t.toDFWhere(s"h >= '$target' AND h <= '$target'")
    assert(noBloom.count() == 1, "range shape bypasses blooms but stays correct")
  }

  test("absent value prunes every file; IN probes all values") {
    val t = hashTable("bloom2")
    val total = t.detail.numFiles
    val absent = t.toDFWhere("h = 'not-a-real-hash'")
    assert(absent.count() == 0)
    assert(absent.inputFiles.isEmpty,
      s"absent key must prove every file out, read ${absent.inputFiles.length}")
    val targets = Seq("7", "1999", "3777").map(s =>
      spark.range(1).select(md5(lit(s))).head().getString(0))
    val in = t.toDFWhere(targets.mkString("h IN ('", "', '", "')"))
    assert(in.collect().map(_.getLong(0)).sorted.toSeq == Seq(7L, 1999L, 3777L))
    assert(in.inputFiles.length < total)
    // long-typed bloom column probes too
    val byId = t.toDFWhere("id = 2718")
    assert(byId.collect().map(_.getLong(0)).toSeq == Seq(2718L))
  }

  test("non-indexed columns and non-equality shapes keep all candidates") {
    val t = hashTable("bloom3")
    // grp is NOT in graft.bloom.columns: equality on it cannot bloom-prune
    val g = t.toDFWhere("grp = 13")
    assert(g.count() == t.toDF.filter("grp = 13").count())
    // conjunction: the bloom conjunct prunes, the rest still filters rows
    val target = spark.range(1).select(md5(lit("55"))).head().getString(0)
    val both = t.toDFWhere(s"h = '$target' AND grp = ${55 % 97}")
    assert(both.collect().map(_.getLong(0)).toSeq == Seq(55L))
    assert(both.inputFiles.length * 2 <= t.detail.numFiles)
  }

  test("files written before the property have no filters and are kept") {
    val df = spark.range(100L)
      .select(col("id"), md5(col("id").cast("string")).as("h"))
    val t = ManagedTable.create(df.repartition(2), tmpDir("bloom4"))
    t.setProperties(Map(BloomSkip.columnsPropKey -> "h"))
    t.append(spark.range(100L, 200L)
      .select(col("id"), md5(col("id").cast("string")).as("h"))
      .repartition(2))
    val total = t.detail.numFiles
    assert(total == 4)
    // key in the PRE-property files: their lack of filters keeps them
    val target = spark.range(1).select(md5(lit("42"))).head().getString(0)
    val hit = t.toDFWhere(s"h = '$target'")
    assert(hit.collect().map(_.getLong(0)).toSeq == Seq(42L))
    assert(hit.inputFiles.length >= 2,
      "unfiltered legacy files must never be pruned")
    // key in the POST-property files: legacy files kept, new ones pruned
    val t2 = spark.range(1).select(md5(lit("142"))).head().getString(0)
    val hit2 = t.toDFWhere(s"h = '$t2'")
    assert(hit2.collect().map(_.getLong(0)).toSeq == Seq(142L))
    assert(hit2.inputFiles.length <= 3, "bloomed non-matching file must drop")
  }

  test("point DELETE narrows its candidate files through blooms") {
    val t = hashTable("bloom5")
    val target = spark.range(1).select(md5(lit("99"))).head().getString(0)
    assert(t.delete(s"h = '$target'") == 1L)
    assert(t.toDF.count() == 3999)
    assert(t.toDFWhere(s"h = '$target'").count() == 0)
    // an absent-key delete proves no candidates and burns no version
    val v = t.latestVersion
    assert(t.delete("h = 'nope'") == 0L)
    assert(t.latestVersion == v)
  }

  test("OPTIMIZE regenerates filters with the rewritten files") {
    val t = hashTable("bloom6", nFiles = 12)
    t.optimize(targetFileSizeBytes = Long.MaxValue)
    val total = t.detail.numFiles
    val target = spark.range(1).select(md5(lit("2500"))).head().getString(0)
    val hit = t.toDFWhere(s"h = '$target'")
    assert(hit.collect().map(_.getLong(0)).toSeq == Seq(2500L))
    val absent = t.toDFWhere("h = 'still-not-a-hash'")
    assert(absent.inputFiles.isEmpty,
      s"compacted files must carry fresh filters (total now $total)")
  }
}
