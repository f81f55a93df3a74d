package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraftTypeError
import graft.functions.{humanizeBytes, humanizeBytesBinary}
import graft.tables.ManagedTable

/** Table-metadata operators (reference: copy_table mack/__init__.py:287-325,
  * delta_file_sizes :459-477, show_delta_file_sizes :480-509, latest_version
  * :616-627, rename_delta_table :696-737).
  */
object TableOps {

  /** Clone data + partitioning + properties (NOT history) to `targetPath`
    * (reference :287-325; history exclusion per README.md:201).
    */
  def copyTable(table: ManagedTable, targetPath: String): ManagedTable = {
    if (targetPath == null || targetPath.isEmpty)
      throw new GraftTypeError("Either target_path or target_table must be specified.")
    ManagedTable.create(table.toDF, targetPath,
      partitionBy = table.partitionColumns,
      properties = table.properties)
  }

  final case class FileSizes(sizeInBytes: Long, numberOfFiles: Long,
                             averageFileSizeInBytes: Long)

  /** delta_file_sizes (:459-477). */
  def fileSizes(table: ManagedTable): FileSizes = {
    val d = table.detail
    FileSizes(d.sizeInBytes, d.numFiles,
      if (d.numFiles == 0) 0 else math.round(d.sizeInBytes.toDouble / d.numFiles))
  }

  /** show_delta_file_sizes (:480-509): returns the formatted line (caller
    * prints), matching the reference's message exactly.
    */
  def describeFileSizes(table: ManagedTable, humanizeBinary: Boolean = false): String = {
    val s = fileSizes(table)
    val h: Long => String = if (humanizeBinary) humanizeBytesBinary else humanizeBytes
    f"The delta table contains ${s.numberOfFiles}%,d files " +
      s"with a size of ${h(s.sizeInBytes)}. " +
      s"The average file size is ${h(s.averageFileSizeInBytes)}"
  }

  def showFileSizes(table: ManagedTable, humanizeBinary: Boolean = false): Unit =
    println(describeFileSizes(table, humanizeBinary))

  /** File-count-triggered compaction: OPTIMIZE only when the snapshot has
    * fragmented past `maxFiles` (append-heavy tables accumulate one commit
    * dir per append; each compaction is O(table), so triggering by file
    * count amortizes it to O(table/maxFiles) per append). Returns true if
    * a compaction ran. The streaming ingestion path calls this per batch.
    */
  def autoOptimize(table: ManagedTable, maxFiles: Int = 64,
                   targetFileSizeBytes: Long = 128L * 1024 * 1024,
                   sortBy: Seq[String] = Nil): Boolean = {
    require(maxFiles >= 1)
    if (table.detail.numFiles <= maxFiles) false
    else { table.optimize(targetFileSizeBytes, sortBy); true }
  }

  /** latest_version (:616-627). */
  def latestVersion(table: ManagedTable): Long = {
    import table.spark.implicits._
    table.history.agg(max($"version")).head().getLong(0)
  }

  /** rename_delta_table, OSS path (:735-737): re-register under a new name.
    * Our ManagedTable equivalent is a directory move + fresh handle.
    */
  def renameTable(table: ManagedTable, newLocation: String): ManagedTable =
    table.rename(newLocation)

  /** copy_table `target_table` branch (:317): materialize the table into
    * the session catalog (parquet `saveAsTable`), preserving partitioning.
    */
  def copyTableToCatalog(table: ManagedTable, targetTable: String): Unit = {
    if (targetTable == null || targetTable.isEmpty)
      throw new GraftTypeError("Either target_path or target_table must be specified.")
    val parts = table.partitionColumns
    val w = table.toDF.write.format("parquet")
    (if (parts.nonEmpty) w.partitionBy(parts: _*) else w).saveAsTable(targetTable)
  }

  /** rename_delta_table non-Databricks branch (:735-737): rewrite the
    * table as a new catalog table under the new name.
    */
  def renameToCatalog(table: ManagedTable, newTableName: String): Unit =
    table.toDF.write.format("parquet").mode("overwrite").saveAsTable(newTableName)

  /** Row-level diff of two frames by primary key — the audit view
    * "what changed between snapshot A and B" that a curation experiment
    * or a replication check actually reads (CDF answers "what did each
    * COMMIT do"; this answers the end-to-end NET question across any
    * two versions, including ones compacted or vacuumed in between).
    * One row per differing key:
    *
    *  - `change = 'insert'`  — key only in `newDf`;
    *  - `change = 'delete'`  — key only in `oldDf`;
    *  - `change = 'update'`  — key in both with ≥ 1 differing value
    *    column; `changed_columns` lists them comma-joined in schema
    *    order (a STRING, not an array — engine-portable). Null-safe
    *    comparison (`<=>`), so null→value and value→null both count
    *    and null→null does not. Keys whose rows are identical are
    *    ABSENT — a no-op rewrite produces an empty diff.
    *
    * Columns present in only one side compare against null (schema
    * evolution shows up as updates on the new column). Scale shape:
    * ONE full-outer shuffle join on the key — no window, no collect;
    * both sides prune to key + compared columns at the scan.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame,
           pkey: Seq[String]): DataFrame = {
    require(pkey.nonEmpty, "need at least one primary-key column")
    pkey.foreach { k =>
      require(oldDf.columns.contains(k) && newDf.columns.contains(k),
        s"primary-key column $k must exist on both sides") }
    val valueCols =
      (oldDf.columns ++ newDf.columns).distinct.toSeq.filterNot(pkey.contains)
    def side(df: DataFrame, tag: String) = df.select(
      pkey.map(col) ++
        valueCols.map(c =>
          (if (df.columns.contains(c)) col(c)
           else lit(null)).as(s"__${tag}_$c")) :+
        lit(1).as(s"__${tag}_present"): _*)
    val joined = side(oldDf, "o")
      .join(side(newDf, "n"), pkey, "full_outer")
    val change = when(col("__o_present").isNull, lit("insert"))
      .when(col("__n_present").isNull, lit("delete"))
      .otherwise(lit("update"))
    val changed = concat_ws(",", filter(
      array(valueCols.map(c =>
        when(!(col(s"__o_$c") <=> col(s"__n_$c")), lit(c))): _*),
      x => x.isNotNull))
    joined
      .select(pkey.map(col) :+ change.as("change") :+
        // only meaningful for updates; inserts/deletes would otherwise
        // list every non-null column
        when(change === "update", changed).otherwise(lit(""))
          .as("changed_columns"): _*)
      .filter(col("change") =!= "update" || col("changed_columns") =!= "")
  }

  /** [[diff]] between two versions of a managed table (time travel on
    * both sides; `toVersion = -1` means the latest).
    */
  def versionDiff(table: ManagedTable, fromVersion: Long, toVersion: Long,
                  pkey: Seq[String]): DataFrame = {
    val newDf =
      if (toVersion < 0) table.toDF else table.toDF(toVersion)
    diff(table.toDF(fromVersion), newDf, pkey)
  }
}
