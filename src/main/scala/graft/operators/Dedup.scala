package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftTypeError, errors}
import graft.tables.ManagedTable

/** The reference's three dedup strategies (mack/__init__.py:144-284), as pure
  * `DataFrame => DataFrame` cores plus `ManagedTable` shells.
  *
  * Scale shape: each core is a single window aggregate — one shuffle hash-
  * partitioned on the duplication columns, fully map-side-combinable — with
  * no join back to the base table. (The reference routes a distinct-ed
  * duplicate set through Delta MERGE to limit file rewrites, an extra join +
  * second shuffle that buys nothing in a snapshot-overwrite storage layer;
  * the window formulation computes the identical surviving-row set in one
  * pass. Skewed duplication keys are handled by AQE skew-split since the
  * window's partition key is the shuffle key.)
  */
object Dedup {

  /** Reference NULL parity: mack deletes duplicates through a Delta MERGE
    * whose condition is null-UNSAFE equality (`old.c = new.c`,
    * mack/__init__.py:186-192, :246-255), so a row with NULL in any
    * duplication column never matches the delete and is always retained —
    * even though the Window.partitionBy that finds duplicates groups NULLs
    * together. The window cores below reproduce that by exempting
    * NULL-keyed rows from deletion/trimming.
    */
  private def anyNull(cols: Seq[String]) =
    cols.map(col(_).isNull).reduce(_ || _)

  /** kill_duplicates (reference :144-192): remove EVERY member of each
    * duplicate group over `duplicationColumns` — no survivor. Rows with a
    * NULL duplication-column value are always retained (see NULL parity
    * note above).
    */
  def killDuplicates(df: DataFrame, duplicationColumns: Seq[String]): DataFrame = {
    if (duplicationColumns.isEmpty)
      throw new GraftTypeError("Duplication columns must be specified")
    val cols = df.columns.toSeq
    duplicationColumns.foreach { c =>
      if (!cols.contains(c))
        throw new GraftTypeError(
          s"The base table has these columns ${errors.pyRepr(cols)}, " +
          s"but these columns are required ${errors.pyRepr(duplicationColumns)}")
    }
    val cnt = "amount_of_records"
    df.withColumn(cnt,
        count("*").over(Window.partitionBy(duplicationColumns.map(col): _*)))
      .filter(col(cnt) === 1 || anyNull(duplicationColumns))
      .drop(cnt)
  }

  def killDuplicates(table: ManagedTable, duplicationColumns: Seq[String]): Unit =
    table.overwrite(killDuplicates(table.toDF, duplicationColumns), "DELETE")

  /** drop_duplicates_pkey (reference :195-255): keep exactly the
    * minimum-primary-key row of each duplicate group, delete the rest.
    * Rows with a NULL duplication-column value are all retained (see NULL
    * parity note above).
    */
  def dropDuplicatesPkey(df: DataFrame, primaryKey: String,
                         duplicationColumns: Seq[String]): DataFrame = {
    if (primaryKey == null || primaryKey.isEmpty)
      throw new GraftTypeError("A unique primary key must be specified.")
    if (duplicationColumns.isEmpty)
      throw new GraftTypeError("A duplication column must be specified.")
    if (duplicationColumns.contains(primaryKey))
      throw new GraftTypeError(
        "Primary key must not be part of the duplication columns.")
    val cols = df.columns.toSeq
    val required = primaryKey +: duplicationColumns
    required.foreach { c =>
      if (!cols.contains(c))
        throw new GraftTypeError(
          s"The base table has these columns ${errors.pyRepr(cols)}, " +
          s"but these columns are required ${errors.pyRepr(required)}")
    }
    val rn = "row_number"
    df.withColumn(rn, row_number().over(
        Window.partitionBy(duplicationColumns.map(col): _*).orderBy(col(primaryKey))))
      .filter(col(rn) === 1 || anyNull(duplicationColumns))
      .drop(rn)
  }

  def dropDuplicatesPkey(table: ManagedTable, primaryKey: String,
                         duplicationColumns: Seq[String]): Unit =
    table.overwrite(
      dropDuplicatesPkey(table.toDF, primaryKey, duplicationColumns), "DELETE")

  /** drop_duplicates (reference :258-284): Spark dropDuplicates semantics
    * (arbitrary survivor), whole-table overwrite.
    */
  def dropDuplicates(df: DataFrame, duplicationColumns: Seq[String]): DataFrame = {
    if (duplicationColumns.isEmpty)
      throw new GraftTypeError("A duplication column must be specified.")
    df.dropDuplicates(duplicationColumns)
  }

  def dropDuplicates(table: ManagedTable, duplicationColumns: Seq[String]): Unit =
    table.overwrite(dropDuplicates(table.toDF, duplicationColumns), "OVERWRITE")
}
