package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column profiling — the data-quality monitoring surface (the
  * AWS-Deequ / Great-Expectations staple) a pipeline runs on every
  * ingest before the data is trusted: one row per profiled column with
  * row/null/distinct counts, min/max, and the modal value. The
  * reference has key-discovery (`is_composite_key_candidate`,
  * `find_composite_key_candidates` — `mack/__init__.py:368`, `:440`)
  * but no value-level profiling; this is the companion those operators
  * assume you already ran.
  *
  * Scale shape, two passes by design:
  *  1. min/max/null counts ride ONE aggregation node (4 expressions per
  *     column, map-side partials, a single result row — no shuffle of
  *     data rows);
  *  2. exact distinct + modal value melt the profiled columns to
  *     (column, value) and aggregate — one shuffle keyed on the value,
  *     the only way to get EXACT answers (the key-discovery ops use
  *     `approx_count_distinct` where approximation is acceptable; a
  *     profile that reports approximate null/mode counts is wrong).
  *
  * Values render as strings (the only type a mixed-column result can
  * carry); min/max are computed in the COLUMN's native type first, so
  * numeric columns get numeric ordering, then cast. Modal ties break to
  * the smallest value string — deterministic in any engine.
  */
object Profile {

  val schema: StructType = StructType(Seq(
    StructField("column", StringType, nullable = false),
    StructField("n_rows", LongType, nullable = false),
    StructField("n_nulls", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("min_value", StringType, nullable = true),
    StructField("max_value", StringType, nullable = true),
    StructField("top_value", StringType, nullable = true),
    StructField("top_count", LongType, nullable = true)))

  /** Profile `cols` of `df` (default: every column). Output rows follow
    * the requested column order.
    */
  def profile(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val targets = if (cols.isEmpty) df.columns.toSeq else cols
    targets.foreach(c => require(df.columns.contains(c), s"no column $c"))
    val spark = df.sparkSession

    // pass 1: one aggregation node — count/min/max per column + total
    val aggs = count(lit(1)).as("__n") +:
      targets.flatMap { c =>
        Seq(count(col(c)).as(s"__nn_$c"),
          min(col(c)).cast(StringType).as(s"__min_$c"),
          max(col(c)).cast(StringType).as(s"__max_$c"))
      }
    val h = df.agg(aggs.head, aggs.tail: _*).head()
    val nRows = h.getAs[Long]("__n")
    val header = spark.createDataFrame(
      spark.sparkContext.parallelize(targets.map { c =>
        Row(c, nRows, nRows - h.getAs[Long](s"__nn_$c"),
          h.getAs[String](s"__min_$c"), h.getAs[String](s"__max_$c"))
      }, 1),
      StructType(Seq(
        StructField("column", StringType, nullable = false),
        StructField("n_rows", LongType, nullable = false),
        StructField("n_nulls", LongType, nullable = false),
        StructField("min_value", StringType, nullable = true),
        StructField("max_value", StringType, nullable = true))))

    // pass 2: melt non-null values, count, reduce per column
    val melted = df.select(explode(array(targets.map(c =>
        struct(lit(c).as("column"), col(c).cast(StringType).as("value"))): _*))
        .as("kv"))
      .select(col("kv.column"), col("kv.value"))
      .filter(col("value").isNotNull)
    val valueStats = melted
      .groupBy("column", "value").agg(count(lit(1)).as("n"))
      .groupBy("column")
      .agg(count(lit(1)).as("n_distinct"),
        min(struct((col("n") * -1).as("neg"), col("value"))).as("__top"))
      .select(col("column"), col("n_distinct"),
        col("__top.value").as("top_value"),
        (col("__top.neg") * -1).as("top_count"))

    header.join(valueStats, Seq("column"), "left")
      .select(col("column"), col("n_rows"), col("n_nulls"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_value"), col("max_value"),
        col("top_value"), col("top_count"))
  }

  /** Profile a managed table in place. */
  def profile(table: graft.tables.ManagedTable): DataFrame =
    profile(table.toDF)

  /** The SCALE path: a one-pass sketch profile — counts, null counts,
    * HyperLogLog++ distinct estimates (`rsd` relative error), and
    * native-type min/max, all in a SINGLE aggregation node. Nothing
    * but the one-row aggregate ever moves: no melt, no value shuffle —
    * the shape that holds when the exact profile's per-value
    * aggregation (distinct + mode need it) would shuffle 100 TB of
    * values. No modal value here: an approximate mode needs a
    * heavy-hitter pass ([[HeavyHitters.topK]] per column is that tool
    * when a column's mode is actually needed).
    */
  def profileApprox(df: DataFrame, cols: Seq[String] = Nil,
                    rsd: Double = 0.05): DataFrame = {
    val targets = if (cols.isEmpty) df.columns.toSeq else cols
    targets.foreach(c => require(df.columns.contains(c), s"no column $c"))
    require(rsd > 0 && rsd < 0.4, s"need 0 < rsd < 0.4, got $rsd")
    val spark = df.sparkSession
    val aggs = count(lit(1)).as("__n") +:
      targets.flatMap { c =>
        Seq(count(col(c)).as(s"__nn_$c"),
          approx_count_distinct(col(c), rsd).as(s"__nd_$c"),
          min(col(c)).cast(StringType).as(s"__min_$c"),
          max(col(c)).cast(StringType).as(s"__max_$c"))
      }
    val h = df.agg(aggs.head, aggs.tail: _*).head()
    val nRows = h.getAs[Long]("__n")
    spark.createDataFrame(
      spark.sparkContext.parallelize(targets.map { c =>
        Row(c, nRows, nRows - h.getAs[Long](s"__nn_$c"),
          h.getAs[Long](s"__nd_$c"),
          h.getAs[String](s"__min_$c"), h.getAs[String](s"__max_$c"))
      }, 1),
      StructType(Seq(
        StructField("column", StringType, nullable = false),
        StructField("n_rows", LongType, nullable = false),
        StructField("n_nulls", LongType, nullable = false),
        StructField("n_distinct_approx", LongType, nullable = false),
        StructField("min_value", StringType, nullable = true),
        StructField("max_value", StringType, nullable = true))))
  }
}
