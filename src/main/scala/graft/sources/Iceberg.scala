package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import graft.tables.{FileStat, ManagedTable}

/** Read-only access to, and zero-copy export of, Apache ICEBERG tables —
  * the open-lakehouse sibling of [[DeltaImport]] and the second-most-
  * common migration source for the reference's audience (mack users are
  * lakehouse-table operators, mack/__init__.py:4). No Iceberg jars are
  * needed: the table format is a public spec (iceberg.apache.org/spec) —
  * a `*.metadata.json` pointer file under `metadata/`, an Avro manifest LIST per
  * snapshot, Avro manifests of data-file entries, plain parquet data —
  * and the Avro container layer is hand-coded in [[Avro]] the way
  * [[Tfrecord]] hand-codes protobuf.
  *
  * Supported: format versions 1 and 2, `version-hint.text` and
  * catalog-style (`00000-<uuid>`) metadata naming, v1 inline `manifests`
  * lists and v2 `manifest-list` files, snapshot resolution by
  * `current-snapshot-id`, schema by `current-schema-id`, identity (and
  * no-op `void`) partition transforms, metadata paths re-rooted when the
  * table has MOVED since its metadata was written (the embedded
  * `location` prefix is rewritten to the directory being read — the
  * HadoopTables relocation rule). Identity partitioning honors the
  * spec's COLUMN PROJECTION rule: data files that carry the source
  * columns (the Iceberg java writer's output) adopt flat — per-file
  * min/max footer stats give the managed scan equivalent pruning —
  * while files that LACK them (Hive-migrated data, where the spec says
  * readers resolve the value from the manifest's partition record)
  * adopt into synthesized `k=v` dirs from those manifest values, so the
  * managed scan serves the same constants an Iceberg reader would.
  * Every adopted footer is CHECKED for which regime it is in; a mixed
  * or partial carry refuses loud — the failure mode dodged is a silent
  * null-fill.
  *
  * Refused loud (silently misreading a table would be worse than
  * failing): format version 3+, non-identity partition transforms
  * (bucket/truncate/year/month/day/hour — the layout hint is lossy and
  * honoring it wrongly corrupts pruning), v2 ROW-LEVEL DELETES in
  * either form (delete manifests in the manifest list, or
  * position/equality-delete data-file entries), non-parquet data files,
  * unsupported column types (uuid/fixed/time), and RENAMED COLUMNS —
  * the spec resolves columns by field id, so a renamed column's files
  * carry the old name; when footers stamp parquet field ids (Iceberg
  * writers always do) any id whose footer name differs from the
  * schema's refuses rather than null-filling (footers without ids are
  * uncheckable and trusted by name — the documented boundary).
  * [[snapshot]]/[[importTable]] take an optional `snapshotId` for TIME
  * TRAVEL to any snapshot still listed in the metadata.
  *
  * Import integrity: the adopted table's metadata row count (parquet
  * footer sum) must equal the manifests' `record_count` sum — a
  * mismatch means the metadata and the files disagree and the import
  * aborts.
  *
  * Scale shape: manifests are file-granular METADATA, parsed
  * driver-side exactly like Delta's `_delta_log` (same as
  * [[DeltaImport]]'s snapshot reconstruction); the data itself never
  * moves — files hard-link via [[ManagedTable.adoptFiles]] and the
  * managed scan is a plain distributed parquet read. [[exportTable]] is
  * zero-copy in the other direction: the written metadata REFERENCES
  * the managed table's live data files by absolute URI, so publishing a
  * 100 TB table to an Iceberg reader writes only O(files) metadata.
  */
object Iceberg {

  private val mapper = new ObjectMapper()

  // ---- schema conversion (Iceberg JSON -> Spark) ----------------------

  private val DecimalRe = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r

  private[sources] def toSparkType(t: JsonNode): DataType =
    if (t.isTextual) t.asText() match {
      case "boolean" => BooleanType
      case "int" => IntegerType
      case "long" => LongType
      case "float" => FloatType
      case "double" => DoubleType
      case "date" => DateType
      case "timestamp" => TimestampNTZType
      case "timestamptz" => TimestampType
      case "string" => StringType
      case "binary" => BinaryType
      case DecimalRe(p, s) => DecimalType(p.toInt, s.toInt)
      case other => throw new IllegalArgumentException(
        s"unsupported Iceberg column type: $other " +
          "(uuid/time/fixed have no faithful Spark mapping here)")
    } else t.path("type").asText() match {
      case "struct" => toStructType(t)
      case "list" =>
        ArrayType(toSparkType(t.get("element")),
          containsNull = !t.path("element-required").asBoolean(false))
      case "map" =>
        MapType(toSparkType(t.get("key")), toSparkType(t.get("value")),
          valueContainsNull = !t.path("value-required").asBoolean(false))
      case other => throw new IllegalArgumentException(
        s"unsupported Iceberg nested type: $other")
    }

  private[sources] def toStructType(struct: JsonNode): StructType =
    StructType(struct.path("fields").elements().asScala.map { f =>
      StructField(f.path("name").asText(), toSparkType(f.get("type")),
        nullable = !f.path("required").asBoolean(false))
    }.toSeq)

  // ---- snapshot model --------------------------------------------------

  final case class DataFileRef(path: String, recordCount: Long,
                               sizeBytes: Long,
                               /** manifest partition record, keyed by
                                 * SPEC FIELD name (raw Avro values).
                                 */
                               partition: Map[String, Any])

  final case class Snapshot(formatVersion: Int,
                            schema: StructType,
                            fieldIdToName: Map[Int, String],
                            /** identity spec fields:
                              * (spec field name, source column name).
                              */
                            identityFields: Seq[(String, String)],
                            properties: Map[String, String],
                            files: Seq[DataFileRef]) {
    def partitionSourceCols: Seq[String] = identityFields.map(_._2)
  }

  /** Current metadata file under `tableDir/metadata`: the
    * `version-hint.text` pointer when present (HadoopTables), else the
    * newest `*.metadata.json` (numeric `v<N>` order when all files use
    * that form; the zero-padded catalog form sorts lexicographically).
    */
  private[sources] def currentMetadataFile(tableDir: String): Path = {
    val metaDir = Paths.get(tableDir, "metadata")
    require(Files.isDirectory(metaDir),
      s"not an Iceberg table (no metadata/ directory): $tableDir")
    val hint = metaDir.resolve("version-hint.text")
    if (Files.isRegularFile(hint)) {
      val v = Files.readString(hint).trim
      val cands = Seq(s"v$v.metadata.json", s"$v.metadata.json")
        .map(metaDir.resolve)
      cands.find(Files.isRegularFile(_)).getOrElse(
        throw new IllegalArgumentException(
          s"version-hint.text says $v but no matching metadata file in $metaDir"))
    } else {
      val all = {
        val s = Files.list(metaDir)
        try s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.endsWith(".metadata.json")).toSeq
        finally s.close()
      }
      require(all.nonEmpty, s"no *.metadata.json under $metaDir")
      val VRe = """v(\d+)\.metadata\.json""".r
      val numeric = all.flatMap {
        case VRe(n) => Some(n.toLong); case _ => None
      }
      val pick =
        if (numeric.length == all.length) s"v${numeric.max}.metadata.json"
        else all.max // catalog form: zero-padded sequence prefix
      metaDir.resolve(pick)
    }
  }

  /** Re-root a metadata path: strip any `file:` scheme; rewrite the
    * table's embedded original `location` prefix to the directory being
    * read (tables move; their metadata keeps the old absolute paths).
    */
  private[sources] def resolvePath(p: String, metaLocation: String,
                                   tableDir: String): Path = {
    def deScheme(s: String): String =
      if (s.startsWith("file:")) {
        val rest = s.stripPrefix("file:")
        // file:///x and file:/x both mean /x; file://host/x unsupported
        if (rest.startsWith("///")) rest.substring(2)
        else if (rest.startsWith("//")) throw new IllegalArgumentException(
          s"file URI with authority unsupported: $s")
        else rest
      } else s
    val raw = deScheme(p)
    val loc = deScheme(metaLocation).stripSuffix("/")
    val candidate =
      if (loc.nonEmpty && raw.startsWith(loc + "/"))
        Paths.get(tableDir, raw.stripPrefix(loc + "/"))
      else if (raw.startsWith("/")) Paths.get(raw)
      else Paths.get(tableDir, raw)
    require(Files.isRegularFile(candidate),
      s"Iceberg metadata references a missing file: $p (resolved $candidate)")
    candidate
  }

  /** Load and validate the current snapshot — or, for TIME TRAVEL, the
    * explicit `snapshotId` (any snapshot still listed in the metadata's
    * `snapshots[]`; an unknown id fails loud listing what exists, like
    * `toDF(version)` on a vacuumed managed table).
    */
  def snapshot(tableDir: String, snapshotId: Option[Long] = None): Snapshot = {
    val metaPath = currentMetadataFile(tableDir)
    val root = mapper.readTree(Files.readString(metaPath))
    val fv = root.path("format-version").asInt(1)
    require(fv == 1 || fv == 2,
      s"unsupported Iceberg format-version $fv (1 and 2 are supported)")
    val location = root.path("location").asText("")

    // schema: v2 schemas[] by current-schema-id, else v1 inline "schema"
    val schemaNode: JsonNode =
      if (root.has("schemas") && root.has("current-schema-id")) {
        val id = root.get("current-schema-id").asInt()
        root.get("schemas").elements().asScala
          .find(_.path("schema-id").asInt(-1) == id)
          .getOrElse(throw new IllegalArgumentException(
            s"current-schema-id $id not in schemas[]"))
      } else root.path("schema")
    require(schemaNode != null && schemaNode.has("fields"),
      "Iceberg metadata lacks a schema")
    val schema = toStructType(schemaNode)
    val idToName = schemaNode.path("fields").elements().asScala.map(f =>
      f.path("id").asInt() -> f.path("name").asText()).toMap

    // partition spec: v2 partition-specs[] by default-spec-id, else v1
    // inline "partition-spec"
    val specFields: Seq[JsonNode] =
      if (root.has("partition-specs")) {
        val id = root.path("default-spec-id").asInt(0)
        root.get("partition-specs").elements().asScala
          .find(_.path("spec-id").asInt(-1) == id)
          .map(_.path("fields").elements().asScala.toSeq)
          .getOrElse(throw new IllegalArgumentException(
            s"default-spec-id $id not in partition-specs[]"))
      } else if (root.has("partition-spec"))
        root.get("partition-spec").elements().asScala.toSeq
      else Nil
    val identityFields = specFields.flatMap { f =>
      f.path("transform").asText() match {
        case "identity" =>
          val src = idToName.getOrElse(f.path("source-id").asInt(),
            throw new IllegalArgumentException(
              s"partition source-id ${f.path("source-id").asInt()} not in schema"))
          Some(f.path("name").asText(src) -> src)
        case "void" => None // always-null transform: no data dependency
        case other => throw new IllegalArgumentException(
          s"unsupported Iceberg partition transform: $other " +
            "(identity is honored; bucket/truncate/date transforms are " +
            "refused rather than mis-honored)")
      }
    }

    val properties = root.path("properties") match {
      case o: ObjectNode =>
        o.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
      case _ => Map.empty[String, String]
    }

    // snapshot: explicit time-travel id, else current; absent / -1 =>
    // empty table
    val curId = snapshotId.getOrElse(
      root.path("current-snapshot-id").asLong(-1L))
    if (curId == -1L)
      return Snapshot(fv, schema, idToName, identityFields, properties,
        Nil)
    val snap = root.path("snapshots").elements().asScala
      .find(_.path("snapshot-id").asLong() == curId)
      .getOrElse {
        val known = root.path("snapshots").elements().asScala
          .map(_.path("snapshot-id").asLong()).toSeq.sorted
        throw new IllegalArgumentException(
          s"snapshot-id $curId not in snapshots[] (available: " +
            s"${known.mkString(", ")})")
      }

    // manifest paths: v2 manifest-list file, or v1 inline manifests[]
    val manifestPaths: Seq[Path] =
      if (snap.has("manifest-list")) {
        val mlPath = resolvePath(snap.get("manifest-list").asText(),
          location, tableDir)
        val ml = readAvro(mlPath)
        ml.records.map(_.asInstanceOf[Map[String, Any]]).map { r =>
          val content = r.get("content") match {
            case Some(i: Int) => i
            case Some(l: Long) => l.toInt
            case _ => 0 // v1 lists carry no content field: all data
          }
          require(content == 0,
            s"v2 row-level deletes present (delete manifest " +
              s"${r("manifest_path")}) — merge-on-read Iceberg tables are " +
              "refused; compact with rewrite_data_files first")
          resolvePath(r("manifest_path").asInstanceOf[String], location,
            tableDir)
        }
      } else if (snap.has("manifests"))
        snap.get("manifests").elements().asScala.toSeq
          .map(m => resolvePath(m.asText(), location, tableDir))
      else throw new IllegalArgumentException(
        "snapshot has neither manifest-list nor manifests")

    val files = manifestPaths.flatMap { mp =>
      val c = readAvro(mp)
      c.meta.get("content")
        .map(new String(_, java.nio.charset.StandardCharsets.UTF_8))
        .foreach(ct => require(ct == "data",
          s"v2 row-level deletes present (manifest $mp has content=$ct)"))
      c.records.map(_.asInstanceOf[Map[String, Any]]).flatMap { e =>
        val status = e("status").asInstanceOf[Int]
        val df = e("data_file").asInstanceOf[Map[String, Any]]
        val dfContent = df.get("content") match {
          case Some(i: Int) => i
          case Some(l: Long) => l.toInt
          case _ => 0 // v1 entries: data by definition
        }
        require(dfContent == 0,
          s"v2 row-level deletes present (data_file content=$dfContent " +
            s"in $mp) — position/equality deletes are refused")
        if (status == 2) None // DELETED: not live in this snapshot
        else {
          val fmt = df("file_format").asInstanceOf[String]
          require(fmt.equalsIgnoreCase("PARQUET"),
            s"non-parquet Iceberg data file ($fmt): ${df("file_path")}")
          Some(DataFileRef(df("file_path").asInstanceOf[String],
            df("record_count").asInstanceOf[Long],
            df.get("file_size_in_bytes") match {
              case Some(l: Long) => l; case Some(i: Int) => i.toLong
              case _ => 0L
            },
            df.get("partition") match {
              case Some(m: Map[_, _]) =>
                m.asInstanceOf[Map[String, Any]]
              case _ => Map.empty
            }))
        }
      }
    }
    Snapshot(fv, schema, idToName, identityFields, properties, files)
  }

  private def readAvro(p: Path): Avro.Container = {
    val in = Files.newInputStream(p)
    try Avro.readContainer(in) finally in.close()
  }

  // ---- import ----------------------------------------------------------

  /** Import the current snapshot as a [[ManagedTable]] at `targetPath` —
    * zero-copy (hard links) like the Delta path. See the object doc for
    * the supported/refused matrix and the integrity checks.
    */
  def importTable(spark: SparkSession, tableDir: String,
                  targetPath: String,
                  snapshotId: Option[Long] = None): ManagedTable = {
    val snap = snapshot(tableDir, snapshotId)
    if (snap.files.isEmpty)
      return ManagedTable.create(
        spark.createDataFrame(new java.util.ArrayList[Row](), snap.schema),
        targetPath, properties = snap.properties)
    val location = {
      // re-read the metadata location for path re-rooting
      val root = mapper.readTree(Files.readString(currentMetadataFile(tableDir)))
      root.path("location").asText("")
    }
    val resolved = snap.files.map(f =>
      (resolvePath(f.path, location, tableDir), f))
    // RENAMED-COLUMN detection (the spec resolves columns by FIELD ID,
    // this import by NAME): a table that renamed a column leaves files
    // whose footers carry the OLD name — a name-based scan would
    // null-fill the new name silently, the worst failure mode. When
    // the footers carry parquet field ids (Iceberg writers always
    // stamp them), any id whose footer name differs from the table
    // schema's name for that id refuses loud. Footers WITHOUT ids
    // (foreign/migrated files) can't be checked this way — documented
    // boundary, names are then trusted.
    locally {
      val conf = spark.sparkContext.hadoopConfiguration
      resolved.foreach { case (p, _) =>
        parquetFieldIds(conf, p).foreach { case (id, fileName) =>
          snap.fieldIdToName.get(id).foreach { schemaName =>
            require(schemaName == fileName,
              s"column renamed: field id $id is '$fileName' in data " +
                s"file $p but '$schemaName' in the table schema — " +
                "name-based adoption would null-fill it silently; " +
                "rewrite the files or re-import under the old name")
          }
        }
      }
    }
    // identity-partition handling per the spec's COLUMN PROJECTION rule
    // (iceberg spec "Column Projection" #2: a field absent from a data
    // file whose id is an identity partition source resolves to the
    // manifest's partition value). Two clean regimes:
    //   - every file CARRIES the sources (the Iceberg java writer's
    //     output): adopt flat — re-exposing hive dirs would double the
    //     column against the file contents;
    //   - every file LACKS them (Hive-migrated data): adopt into
    //     synthesized k=v dirs from the manifest partition values, so
    //     the managed scan serves the constants the way an Iceberg
    //     reader would.
    // A PARTIAL carry (some columns, or some files) is refused loud —
    // blending both rules in one table risks a silent null-fill.
    val hivePlaced: Boolean =
      if (snap.partitionSourceCols.isEmpty) false
      else {
        val conf = spark.sparkContext.hadoopConfiguration
        val carries = resolved.map { case (p, _) =>
          val cols = parquetTopLevelColumns(conf, p)
          val present = snap.partitionSourceCols.count(cols.contains)
          require(present == 0 || present == snap.partitionSourceCols.size,
            s"data file $p carries only part of the identity partition " +
              s"sources ${snap.partitionSourceCols.mkString(", ")} — " +
              "mixed layouts are refused (silent null-fill hazard)")
          present > 0
        }
        require(carries.forall(_ == carries.head),
          "some data files carry the identity partition sources and " +
            "some rely on manifest partition values — mixed tables are " +
            "refused (silent null-fill hazard)")
        !carries.head
      }
    // hive segment (k=v) per file from the manifest partition record,
    // typed per the source column (dates ride Avro as epoch days)
    def hiveSegs(f: DataFileRef): Seq[String] =
      if (!hivePlaced) Nil
      else snap.identityFields.map { case (specName, srcCol) =>
        val raw = f.partition.getOrElse(specName, null)
        val v: Any = (raw, snap.schema(snap.schema.fieldIndex(srcCol))
            .dataType) match {
          case (null, _) => null
          case (i: Int, DateType) =>
            java.time.LocalDate.ofEpochDay(i.toLong).toString
          case (x, DateType) => throw new IllegalArgumentException(
            s"date partition value of unexpected shape: $x")
          case (x, _) => x
        }
        ManagedTable.partitionSegment(srcCol, v)
      }
    // one adopted-uuid dir; source path segments flatten into the name
    // (same collision rule as the Delta import's non-hive layout)
    val uuid = java.util.UUID.randomUUID().toString
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val links = resolved.sortBy(_._1.toString).map { case (src, f) =>
      val base = src.toString.split('/').filter(_.nonEmpty).takeRight(3)
        .mkString("-")
      val segs = hiveSegs(f)
      val key = (segs :+ base).mkString("/")
      val n = seen.getOrElse(key, 0)
      seen(key) = n + 1
      val name =
        if (n == 0) base
        else base.stripSuffix(".parquet") + s"-dup$n.parquet"
      (src, (uuid +: segs :+ name).mkString("/"))
    }
    val tbl = ManagedTable.adoptFiles(spark, targetPath, links,
      schema = snap.schema,
      partitionBy = if (hivePlaced) snap.partitionSourceCols else Nil,
      properties = snap.properties)
    val expected = snap.files.map(_.recordCount).sum
    val got = tbl.numRows
    require(got == expected,
      s"Iceberg import integrity failure: manifests claim $expected rows, " +
        s"parquet footers carry $got — metadata and data disagree")
    tbl
  }

  /** Top-level (field id -> name) of one parquet file, for fields that
    * carry ids; empty when the writer stamped none.
    */
  private def parquetFieldIds(
      conf: org.apache.hadoop.conf.Configuration, file: Path)
      : Map[Int, String] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.toUri), conf)
    val reader = ParquetFileReader.open(in)
    try reader.getFooter.getFileMetaData.getSchema.getFields.asScala
      .flatMap(f => Option(f.getId).map(id => id.intValue() -> f.getName))
      .toMap
    finally reader.close()
  }

  /** Top-level column names of one parquet file, from its footer. */
  private def parquetTopLevelColumns(
      conf: org.apache.hadoop.conf.Configuration, file: Path): Set[String] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.toUri), conf)
    val reader = ParquetFileReader.open(in)
    try reader.getFooter.getFileMetaData.getSchema.getFields.asScala
      .map(_.getName).toSet
    finally reader.close()
  }

  // ---- export ----------------------------------------------------------

  /** Spark type -> Iceberg schema-JSON type (ids assigned by `nextId`). */
  private def toIcebergType(dt: DataType, nextId: () => Int): Object =
    dt match {
      case BooleanType => "boolean"
      case IntegerType | ShortType | ByteType => "int"
      case LongType => "long"
      case FloatType => "float"
      case DoubleType => "double"
      case DateType => "date"
      case TimestampNTZType => "timestamp"
      case TimestampType => "timestamptz"
      case StringType => "string"
      case BinaryType => "binary"
      case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
      case s: StructType =>
        val o = mapper.createObjectNode()
        o.put("type", "struct")
        val fs = o.putArray("fields")
        s.fields.foreach { f =>
          val fo = fs.addObject()
          fo.put("id", nextId())
          fo.put("name", f.name)
          fo.put("required", !f.nullable)
          putType(fo, "type", toIcebergType(f.dataType, nextId))
        }
        o
      case a: ArrayType =>
        val o = mapper.createObjectNode()
        o.put("type", "list")
        o.put("element-id", nextId())
        o.put("element-required", !a.containsNull)
        putType(o, "element", toIcebergType(a.elementType, nextId))
        o
      case m: MapType =>
        val o = mapper.createObjectNode()
        o.put("type", "map")
        o.put("key-id", nextId())
        o.put("value-id", nextId())
        o.put("value-required", !m.valueContainsNull)
        putType(o, "key", toIcebergType(m.keyType, nextId))
        putType(o, "value", toIcebergType(m.valueType, nextId))
        o
      case other => throw new IllegalArgumentException(
        s"cannot export column type $other to Iceberg")
    }

  private def putType(o: ObjectNode, field: String, t: Object): Unit =
    t match {
      case s: String => o.put(field, s); ()
      case n: JsonNode => o.set(field, n); ()
    }

  /** Export the table's CURRENT snapshot as an Iceberg v2 table at
    * `targetDir` — ZERO-COPY: the metadata references the managed
    * table's live data files by absolute `file:` URI (Iceberg paths are
    * location-independent URIs by spec), so no data moves; only
    * O(files) Avro/JSON metadata is written. Identity partitioning is
    * carried over (partition values from the hive layout typed per the
    * schema); the data files of a hive-partitioned managed table do not
    * contain the partition columns, which is exactly the layout the
    * spec's COLUMN PROJECTION rule exists for — Iceberg readers resolve
    * identity values from the manifest partition record (and
    * [[importTable]] round-trips them the same way). Deletion-vector
    * snapshots refuse loud (Iceberg v2
    * expresses masks as delete files this exporter does not write —
    * materialize with OPTIMIZE first). Readers: any Iceberg client that
    * speaks HadoopTables layout (`metadata/v1.metadata.json` +
    * `version-hint.text`).
    *
    * @return number of data files referenced
    */
  def exportTable(table: ManagedTable, targetDir: String): Long = {
    val stats = table.currentFileStats
    require(stats.forall(_.dv.isEmpty),
      s"cannot export deletion-vector snapshots to Iceberg " +
        "(masks would need v2 delete files); run OPTIMIZE to materialize")
    val root = Paths.get(targetDir)
    require(!Files.exists(root) || {
      val s = Files.list(root); try !s.iterator().hasNext finally s.close()
    }, s"exportTable target exists and is not empty: $targetDir")
    val metaDir = root.resolve("metadata")
    Files.createDirectories(metaDir)
    val schema = table.schema
    val partCols = table.partitionColumns
    partCols.foreach(c => require(schema.fieldNames.contains(c),
      s"partition column $c missing from schema"))

    // ---- schema JSON with stable field ids (top-level 1..n first,
    // nested ids appended after — the Iceberg java writer's rule)
    var id = schema.fields.length
    val nextId = () => { id += 1; id }
    val schemaNode = mapper.createObjectNode()
    schemaNode.put("type", "struct")
    schemaNode.put("schema-id", 0)
    val sf = schemaNode.putArray("fields")
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val fo = sf.addObject()
      fo.put("id", i + 1)
      fo.put("name", f.name)
      fo.put("required", !f.nullable)
      putType(fo, "type", toIcebergType(f.dataType, nextId))
    }
    val fieldId = schema.fieldNames.zipWithIndex.map { case (n, i) =>
      n -> (i + 1)
    }.toMap

    // ---- partition spec (identity over the table's partition columns)
    val specNode = mapper.createObjectNode()
    specNode.put("spec-id", 0)
    val spf = specNode.putArray("fields")
    partCols.zipWithIndex.foreach { case (c, i) =>
      val fo = spf.addObject()
      fo.put("name", c)
      fo.put("transform", "identity")
      fo.put("source-id", fieldId(c))
      fo.put("field-id", 1000 + i)
    }

    // ---- manifest (one, all files ADDED)
    val partFieldsJson = partCols.zipWithIndex.map { case (c, i) =>
      val tjson = schema(schema.fieldIndex(c)).dataType match {
        case StringType => "\"string\""
        case IntegerType => "\"int\""
        case LongType => "\"long\""
        case BooleanType => "\"boolean\""
        case DateType => """{"type":"int","logicalType":"date"}"""
        case other => throw new IllegalArgumentException(
          s"identity partition column $c of type $other not exportable")
      }
      s"""{"name":"$c","type":["null",$tjson],"default":null,"field-id":${1000 + i}}"""
    }
    val partRecord =
      s"""{"type":"record","name":"r102","fields":[${partFieldsJson.mkString(",")}]}"""
    val manifestEntrySchema =
      s"""{"type":"record","name":"manifest_entry","fields":[
         |{"name":"status","type":"int","field-id":0},
         |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
         |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
         |{"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
         |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
         |{"name":"content","type":"int","field-id":134},
         |{"name":"file_path","type":"string","field-id":100},
         |{"name":"file_format","type":"string","field-id":101},
         |{"name":"partition","type":$partRecord,"field-id":102},
         |{"name":"record_count","type":"long","field-id":103},
         |{"name":"file_size_in_bytes","type":"long","field-id":104}
         |]},"field-id":2}]}""".stripMargin.replace("\n", "")

    def partValue(c: String, raw: String): Any = {
      if (raw == null) return null
      schema(schema.fieldIndex(c)).dataType match {
        case StringType => raw
        case IntegerType => raw.toInt
        case LongType => raw.toLong
        case BooleanType => java.lang.Boolean.parseBoolean(raw)
        case DateType => java.sql.Date.valueOf(raw).toLocalDate.toEpochDay.toInt
        case other => throw new IllegalArgumentException(s"$other")
      }
    }
    val entries: Seq[Any] = stats.map { f =>
      val abs = table.dataFilePath(f.path).toAbsolutePath
      val pv = table.hivePartitionValues(f).toMap
      Map[String, Any](
        "status" -> 1,
        "snapshot_id" -> 1L,
        "sequence_number" -> null,
        "file_sequence_number" -> null,
        "data_file" -> Map[String, Any](
          "content" -> 0,
          "file_path" -> s"file://$abs",
          "file_format" -> "PARQUET",
          "partition" -> partCols.map(c =>
            c -> partValue(c, pv.getOrElse(c, null))).toMap,
          "record_count" -> f.rows,
          "file_size_in_bytes" -> f.bytes))
    }
    val manifestPath = metaDir.resolve("graft-m0.avro")
    val mout = Files.newOutputStream(manifestPath)
    try Avro.writeContainer(mout, manifestEntrySchema, entries, Map(
      "schema" -> mapper.writeValueAsString(schemaNode),
      "partition-spec" -> mapper.writeValueAsString(specNode.get("fields")),
      "partition-spec-id" -> "0",
      "format-version" -> "2",
      "content" -> "data"))
    finally mout.close()
    val manifestLen = Files.size(manifestPath)

    // ---- manifest list
    val manifestListSchema =
      """{"type":"record","name":"manifest_file","fields":[
        |{"name":"manifest_path","type":"string","field-id":500},
        |{"name":"manifest_length","type":"long","field-id":501},
        |{"name":"partition_spec_id","type":"int","field-id":502},
        |{"name":"content","type":"int","field-id":517},
        |{"name":"sequence_number","type":"long","field-id":515},
        |{"name":"min_sequence_number","type":"long","field-id":516},
        |{"name":"added_snapshot_id","type":"long","field-id":503},
        |{"name":"added_files_count","type":"int","field-id":504},
        |{"name":"existing_files_count","type":"int","field-id":505},
        |{"name":"deleted_files_count","type":"int","field-id":506},
        |{"name":"added_rows_count","type":"long","field-id":512},
        |{"name":"existing_rows_count","type":"long","field-id":513},
        |{"name":"deleted_rows_count","type":"long","field-id":514}
        |]}""".stripMargin.replace("\n", "")
    val listPath = metaDir.resolve("snap-1-1-graft.avro")
    val lout = Files.newOutputStream(listPath)
    try Avro.writeContainer(lout, manifestListSchema, Seq(Map[String, Any](
      "manifest_path" -> s"file://${manifestPath.toAbsolutePath}",
      "manifest_length" -> manifestLen,
      "partition_spec_id" -> 0,
      "content" -> 0,
      "sequence_number" -> 1L,
      "min_sequence_number" -> 1L,
      "added_snapshot_id" -> 1L,
      "added_files_count" -> stats.size,
      "existing_files_count" -> 0,
      "deleted_files_count" -> 0,
      "added_rows_count" -> stats.map(_.rows).sum,
      "existing_rows_count" -> 0L,
      "deleted_rows_count" -> 0L)))
    finally lout.close()

    // ---- table metadata json + version hint
    val md = mapper.createObjectNode()
    md.put("format-version", 2)
    md.put("table-uuid", java.util.UUID
      .nameUUIDFromBytes(targetDir.getBytes("UTF-8")).toString)
    md.put("location", root.toAbsolutePath.toString)
    md.put("last-sequence-number", 1L)
    md.put("last-updated-ms", 1L)
    md.put("last-column-id", id)
    md.put("current-schema-id", 0)
    md.set[ObjectNode]("schemas",
      mapper.createArrayNode().add(schemaNode))
    md.put("default-spec-id", 0)
    md.set[ObjectNode]("partition-specs",
      mapper.createArrayNode().add(specNode))
    md.put("last-partition-id", 1000 + math.max(partCols.size - 1, 0))
    md.put("default-sort-order-id", 0)
    val so = mapper.createObjectNode()
    so.put("order-id", 0)
    so.putArray("fields")
    md.set[ObjectNode]("sort-orders", mapper.createArrayNode().add(so))
    val props = md.putObject("properties")
    table.properties.foreach { case (k, v) => props.put(k, v) }
    md.put("current-snapshot-id", 1L)
    val snaps = md.putArray("snapshots")
    val sn = snaps.addObject()
    sn.put("snapshot-id", 1L)
    sn.put("timestamp-ms", 1L)
    sn.put("sequence-number", 1L)
    sn.put("manifest-list", s"file://${listPath.toAbsolutePath}")
    val summary = sn.putObject("summary")
    summary.put("operation", "append")
    sn.put("schema-id", 0)
    Files.writeString(metaDir.resolve("v1.metadata.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(md))
    Files.writeString(metaDir.resolve("version-hint.text"), "1")
    stats.size.toLong
  }
}
