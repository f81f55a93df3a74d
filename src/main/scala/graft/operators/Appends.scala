package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{GraftTypeError, errors}
import graft.tables.ManagedTable

/** The reference's append family: validate_append (mack/__init__.py:328-380),
  * append_without_duplicates (:383-412), constraint_append (:630-693).
  */
object Appends {

  /** validate_append: allowlist-gated append with schema evolution.
    * All `requiredCols` must be present in `appendDf`; any appended column
    * not already on the table must be listed in `optionalCols`. New columns
    * merge into the table schema (existing rows read back NULL).
    */
  def validateAppend(table: ManagedTable, appendDf: DataFrame,
                     requiredCols: Seq[String], optionalCols: Seq[String]): Unit = {
    val appendCols = appendDf.columns.toSeq
    requiredCols.foreach { c =>
      if (!appendCols.contains(c))
        throw new GraftTypeError(
          s"The base Delta table has these columns ${errors.pyRepr(appendCols)}, " +
          s"but these columns are required ${errors.pyRepr(requiredCols)}")
    }
    val tableCols = table.toDF.columns.toSeq
    appendCols.foreach { c =>
      if (!tableCols.contains(c) && !optionalCols.contains(c))
        throw new GraftTypeError(
          s"The column '$c' is not part of the current Delta table. " +
          "If you want to add the column to the table you must set the optional_cols parameter.")
    }
    table.append(appendDf, mergeSchema = true)
  }

  /** Pure core of validate_append for oracle checks: the post-append table
    * contents given a base frame (schema-evolving union with null-fill).
    */
  def validateAppendResult(base: DataFrame, appendDf: DataFrame,
                           requiredCols: Seq[String],
                           optionalCols: Seq[String]): DataFrame = {
    val appendCols = appendDf.columns.toSeq
    requiredCols.foreach { c =>
      if (!appendCols.contains(c))
        throw new GraftTypeError(
          s"The base Delta table has these columns ${errors.pyRepr(appendCols)}, " +
          s"but these columns are required ${errors.pyRepr(requiredCols)}")
    }
    val tableCols = base.columns.toSeq
    appendCols.foreach { c =>
      if (!tableCols.contains(c) && !optionalCols.contains(c))
        throw new GraftTypeError(
          s"The column '$c' is not part of the current Delta table. " +
          "If you want to add the column to the table you must set the optional_cols parameter.")
    }
    val allCols = tableCols ++ appendCols.filterNot(tableCols.contains)
    def aligned(df: DataFrame): DataFrame =
      df.select(allCols.map { c =>
        if (df.columns.contains(c)) col(c) else lit(null).as(c)
      }: _*)
    aligned(base).unionByName(aligned(appendDf))
  }

  /** append_without_duplicates: dedup the source on `pKeys`, insert only
    * rows whose key combination is absent from the target — a left-anti
    * join, which is exactly Delta's `whenNotMatchedInsertAll` (:410-412).
    * Scale: anti-join shuffles on pKeys; with AQE the (usually small)
    * deduped source side broadcasts.
    */
  def appendWithoutDuplicatesResult(base: DataFrame, appendDf: DataFrame,
                                    pKeys: Seq[String]): DataFrame = {
    if (pKeys.isEmpty)
      throw new GraftTypeError("At least one primary key must be specified.")
    val dedup = appendDf.dropDuplicates(pKeys)
    base.unionByName(dedup.join(base, pKeys, "left_anti"))
  }

  def appendWithoutDuplicates(table: ManagedTable, appendDf: DataFrame,
                              pKeys: Seq[String]): Unit = {
    val base = table.toDF
    val newRows = appendDf.dropDuplicates(pKeys).join(base, pKeys, "left_anti")
    table.append(newRows)
  }

  /** constraint_append (:630-693): split `appendDf` by the conjunction of the
    * table's CHECK constraints (properties `delta.constraints.*`) and
    * NOT-NULL constraints (non-nullable schema fields): passing rows append
    * to the target, failing rows to the quarantine table.
    *
    * Faithful three-valued-logic pitfall preserved: the quarantine filter is
    * `NOT(c1 AND c2 …)`, so a NULL in a nullable CHECK-constraint column
    * makes both filters NULL and the row lands in NEITHER table (:677-687).
    */
  def constraintAppend(table: ManagedTable, appendDf: DataFrame,
                       quarantineTable: ManagedTable): Unit = {
    val constraints = discoverConstraints(table)
    // one scan of appendDf feeds both filtered appends
    val cached = appendDf.cache()
    try {
      if (quarantineTable != null) {
        quarantineTable.append(
          cached.filter("not (" + constraints.mkString(" and ") + ")"),
          mergeSchema = true)
      }
      table.append(cached.filter(constraints.mkString(" and ")),
        mergeSchema = true)
    } finally cached.unpersist()
  }

  /** Constraint discovery (:658-672): CHECK constraints from properties,
    * NOT-NULL from schema nullability; error when none exist.
    */
  def discoverConstraints(table: ManagedTable): Seq[String] = {
    val checks = table.properties.collect {
      case (k, v) if k.startsWith("delta.constraints") => v
    }.toSeq
    val notNulls = table.schema.fields.collect {
      case f if !f.nullable => s"${f.name} is not null"
    }.toSeq
    val constraints = checks ++ notNulls
    if (constraints.isEmpty)
      throw new GraftTypeError(
        "There are no constraints present in the target delta table")
    constraints
  }

  /** Pure cores of the constraint split for oracle checks. */
  def constraintFilter(appendDf: DataFrame, constraints: Seq[String]): DataFrame =
    appendDf.filter(constraints.mkString(" and "))
  def constraintQuarantine(appendDf: DataFrame, constraints: Seq[String]): DataFrame =
    appendDf.filter("not (" + constraints.mkString(" and ") + ")")
}
