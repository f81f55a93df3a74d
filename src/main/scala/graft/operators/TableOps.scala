package graft.operators

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
}
