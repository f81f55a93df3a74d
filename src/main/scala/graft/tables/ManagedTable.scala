package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import com.fasterxml.jackson.databind.{ObjectMapper, JsonNode}
import com.fasterxml.jackson.databind.node.{ObjectNode, ArrayNode}
import java.nio.file.{Files, Paths, Path, StandardCopyOption}
import java.util.UUID
import scala.jdk.CollectionConverters._

/** A versioned, parquet-backed managed table: the engine's replacement for
  * the transactional table layer the reference builds on
  * (`delta.tables.DeltaTable`, used throughout
  * /root/reference/mack/__init__.py:4,12,144,631).
  *
  * Layout:
  * {{{
  *   <path>/data/<uuid>/...parquet     # immutable data files, per commit
  *   <path>/_graft_log/v0.json …vN.json # one JSON entry per committed version
  * }}}
  *
  * Each log entry records the complete current snapshot (list of data
  * directories), the schema (JSON), partition columns, and table properties.
  * Commits are atomic: data is fully written under a fresh UUID directory
  * first, then the log entry is moved into place with an atomic rename.
  * Readers resolve the latest vN.json and read exactly the directories it
  * lists, so concurrent readers never observe a half-written commit.
  *
  * Scale note: on a real cluster this maps to object-store
  * put-if-absent on the log key (the same protocol Delta/Iceberg use); the
  * data path is already cluster-safe because every commit writes to a unique
  * directory via the normal distributed parquet writer.
  */
final class ManagedTable private (val spark: SparkSession, val location: String) {
  import ManagedTable._

  private def logDir: Path = Paths.get(location, "_graft_log")
  private def dataDir: Path = Paths.get(location, "data")

  // ---- log access ------------------------------------------------------

  private[tables] def latestEntry: LogEntry = {
    val v = latestVersion
    require(v >= 0, s"No committed version at $location")
    readEntry(v)
  }

  def latestVersion: Long = {
    if (!Files.isDirectory(logDir)) -1L
    else {
      // Files.list holds a directory fd until closed; this runs on every
      // read/commit, so close it deterministically.
      val s = Files.list(logDir)
      try
        s.iterator().asScala
          .map(_.getFileName.toString)
          .collect { case VersionFile(n) => n.toLong }
          .foldLeft(-1L)(math.max)
      finally s.close()
    }
  }

  private def readEntry(v: Long): LogEntry =
    LogEntry.fromJson(Files.readString(logDir.resolve(s"v$v.json")))

  private[tables] def commit(e: LogEntry): Unit = {
    Files.createDirectories(logDir)
    val tmp = logDir.resolve(s".tmp-${UUID.randomUUID()}.json")
    Files.writeString(tmp, e.toJson)
    val target = logDir.resolve(s"v${e.version}.json")
    // Atomic put-if-absent: link(2) fails if the version file exists
    // (a plain ATOMIC_MOVE rename would silently REPLACE it on POSIX —
    // last-writer-wins, i.e. lost commits). On an object store this is
    // the conditional-put the same way Delta/Iceberg do it.
    try {
      Files.createLink(target, tmp)
      Files.deleteIfExists(tmp)
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new IllegalStateException(
          s"Concurrent commit detected for version ${e.version} at $location")
    }
  }

  // ---- reads -----------------------------------------------------------

  /** Current table contents. Missing columns of older commits (schema
    * evolution via mergeSchema-style appends) are null-filled so the frame
    * always carries the latest, union'd schema — mirroring Delta's read path
    * for tables evolved by `.option("mergeSchema","true")` appends
    * (reference: mack/__init__.py:378,683,690).
    */
  def toDF: DataFrame = snapshotDF(latestEntry)

  /** Time travel: the table contents as of `version` (Delta
    * `VERSION AS OF` analog — every log entry records its complete file
    * snapshot, so old versions stay readable until vacuumed).
    */
  def toDF(version: Long): DataFrame = {
    require(version >= 0 && version <= latestVersion,
      s"Version $version out of range [0, $latestVersion]")
    snapshotDF(readEntry(version))
  }

  /** RESTORE analog: commit a new version whose contents are version `v`'s
    * snapshot (history is preserved; nothing is deleted).
    */
  def restore(version: Long): Unit = {
    require(version >= 0 && version <= latestVersion,
      s"Version $version out of range [0, $latestVersion]")
    val src = readEntry(version)
    val cur = latestEntry
    commit(cur.copy(version = cur.version + 1,
      timestampMs = System.currentTimeMillis(),
      operation = s"RESTORE v$version",
      dirs = src.dirs, schema = src.schema,
      partitionColumns = src.partitionColumns))
  }

  private def snapshotDF(e: LogEntry): DataFrame = {
    val schema = e.schema
    if (e.dirs.isEmpty) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    } else {
      val reader = spark.read
        .option("mergeSchema", "true")
        .option("basePath", dataDir.toString)
      val df = reader.parquet(e.dirs.map(d => dataDir.resolve(d).toString): _*)
      // project to the committed schema (order + null-fill evolved columns)
      val cols = schema.fields.map { f =>
        if (df.columns.contains(f.name)) col(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }
      df.select(cols.toIndexedSeq: _*)
    }
  }

  def schema: StructType = latestEntry.schema
  def partitionColumns: Seq[String] = latestEntry.partitionColumns
  def properties: Map[String, String] = latestEntry.properties

  /** detail() analog (reference: delta_table.detail() at mack/__init__.py:277,
    * :310, :469, :658): location, partition columns, properties, file stats.
    */
  def detail: TableDetail = {
    val e = latestEntry
    var n = 0L
    var bytes = 0L
    e.dirs.foreach { d =>
      val p = dataDir.resolve(d)
      if (Files.isDirectory(p)) {
        val s = Files.walk(p)
        try s.iterator().asScala.foreach { f =>
          val name = f.getFileName.toString
          if (Files.isRegularFile(f) && name.endsWith(".parquet")) {
            n += 1; bytes += Files.size(f)
          }
        }
        finally s.close()
      }
    }
    TableDetail(location, e.partitionColumns, e.properties, n, bytes)
  }

  /** history() analog (mack/__init__.py:626): one row per committed version. */
  def history: DataFrame = {
    val rows = (0L to latestVersion).map { v =>
      val e = readEntry(v)
      Row(v, new java.sql.Timestamp(e.timestampMs), e.operation)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("timestamp", TimestampType, nullable = false),
        StructField("operation", StringType, nullable = false))))
  }

  // ---- writes ----------------------------------------------------------

  private def writeData(df: DataFrame, parts: Seq[String]): String = {
    val id = UUID.randomUUID().toString
    val out = dataDir.resolve(id).toString
    val w = df.write.mode("overwrite")
    (if (parts.nonEmpty) w.partitionBy(parts: _*) else w).parquet(out)
    id
  }

  /** Append `df`. With `mergeSchema=true`, new columns are allowed and the
    * table schema becomes the union (existing rows read back null for the
    * new columns); otherwise the frame is aligned to the table schema.
    */
  def append(df: DataFrame, mergeSchema: Boolean = false,
             operation: String = "APPEND"): Unit = {
    val e = latestEntry
    val newSchema =
      if (mergeSchema) unionSchema(e.schema, df.schema)
      else e.schema
    val aligned = df.select(newSchema.fields.map { f =>
      if (df.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
    val dir = writeData(aligned, e.partitionColumns)
    commit(LogEntry(e.version + 1, System.currentTimeMillis(), operation,
      e.dirs :+ dir, newSchema, e.partitionColumns, e.properties))
  }

  /** Atomically replace the table contents with `df` (new files + log swap;
    * old files become unreferenced, as in Delta overwrite).
    */
  def overwrite(df: DataFrame, operation: String = "OVERWRITE"): Unit = {
    val e = latestEntry
    val aligned = df.select(e.schema.fields.map { f =>
      col(f.name).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
    val dir = writeData(aligned, e.partitionColumns)
    commit(LogEntry(e.version + 1, System.currentTimeMillis(), operation,
      Seq(dir), e.schema, e.partitionColumns, e.properties))
  }

  def setProperties(props: Map[String, String]): Unit = {
    val e = latestEntry
    commit(e.copy(version = e.version + 1,
      timestampMs = System.currentTimeMillis(),
      operation = "SET TBLPROPERTIES", properties = e.properties ++ props))
  }

  /** Directory move + fresh log entry (reference rename_delta_table,
    * mack/__init__.py:696-737).
    */
  def rename(newLocation: String): ManagedTable = {
    val target = Paths.get(newLocation)
    require(!Files.exists(target), s"Target exists: $newLocation")
    Files.createDirectories(target.getParent)
    Files.move(Paths.get(location), target)
    new ManagedTable(spark, newLocation)
  }
}

final case class TableDetail(location: String, partitionColumns: Seq[String],
                             properties: Map[String, String],
                             numFiles: Long, sizeInBytes: Long) {
  def averageFileSizeInBytes: Long =
    if (numFiles == 0) 0L else sizeInBytes / numFiles
}

object ManagedTable {
  private val VersionFile = "v(\\d+)\\.json".r
  private val mapper = new ObjectMapper()

  private[tables] final case class LogEntry(
      version: Long, timestampMs: Long, operation: String,
      dirs: Seq[String], schema: StructType,
      partitionColumns: Seq[String], properties: Map[String, String]) {

    def toJson: String = {
      val root = mapper.createObjectNode()
      root.put("version", version)
      root.put("timestampMs", timestampMs)
      root.put("operation", operation)
      val ds = root.putArray("dirs"); dirs.foreach(ds.add)
      root.put("schema", schema.json)
      val ps = root.putArray("partitionColumns"); partitionColumns.foreach(ps.add)
      val pr = root.putObject("properties")
      properties.foreach { case (k, v) => pr.put(k, v) }
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
    }
  }

  private[tables] object LogEntry {
    def fromJson(s: String): LogEntry = {
      val n = mapper.readTree(s)
      def arr(field: String): Seq[String] =
        n.get(field).elements().asScala.map(_.asText()).toSeq
      LogEntry(
        n.get("version").asLong(),
        n.get("timestampMs").asLong(),
        n.get("operation").asText(),
        arr("dirs"),
        DataType.fromJson(n.get("schema").asText()).asInstanceOf[StructType],
        arr("partitionColumns"),
        n.get("properties").properties().asScala
          .map(e => e.getKey -> e.getValue.asText()).toMap)
    }
  }

  private def unionSchema(base: StructType, extra: StructType): StructType = {
    val existing = base.fieldNames.toSet
    StructType(base.fields ++ extra.fields.filterNot(f => existing(f.name)))
  }

  def exists(location: String): Boolean =
    Files.isDirectory(Paths.get(location, "_graft_log"))

  def forPath(spark: SparkSession, location: String): ManagedTable = {
    require(exists(location), s"Not a managed table: $location")
    new ManagedTable(spark, location)
  }

  /** Create a new table at `location` from `df`. */
  def create(df: DataFrame, location: String,
             partitionBy: Seq[String] = Nil,
             properties: Map[String, String] = Map.empty): ManagedTable = {
    require(!exists(location), s"Table already exists: $location")
    val t = new ManagedTable(df.sparkSession, location)
    val dir = t.writeData(df, partitionBy)
    t.commit(LogEntry(0L, System.currentTimeMillis(), "CREATE",
      Seq(dir), df.schema, partitionBy, properties))
    t
  }
}
