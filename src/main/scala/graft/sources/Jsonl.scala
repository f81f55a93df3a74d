package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** JSON-Lines ingest/export — the de-facto interchange format of LLM
  * training corpora (one JSON object per line; the format every public
  * dataset dump, annotation tool, and inference batch API speaks).
  *
  * The operator is deliberately a thin, OPINIONATED shell over Spark's
  * native JSON source — the native reader/writer is already distributed,
  * splittable, and codegen-friendly; what it gets wrong by default at
  * 100 TB is policy:
  *
  *  - **No schema inference, ever.** `spark.read.json(path)` with no
  *    schema runs a FULL extra pass over the corpus just to guess types
  *    (and guesses differently as the data drifts, silently changing
  *    downstream plans). [[read]] requires the schema. Column pruning
  *    then reaches the parser: unprojected JSON fields are never even
  *    tokenized (`spark.sql.optimizer.enableJsonExpressionOptimization`).
  *  - **Malformed lines are data, not poison.** A 100 TB crawl dump WILL
  *    contain truncated lines, encoding garbage, and half-written shards.
  *    The default FAILFAST kills a 10-hour job at hour nine;
  *    DROPMALFORMED silently changes corpus statistics. [[read]] runs
  *    PERMISSIVE with an explicit corrupt-record column so bad lines
  *    survive as rows — countable, quarantinable, re-parsable — and good
  *    fields of bad lines are null rather than absent.
  *  - **Compressed shards for export.** gzip JSONL (`.json.gz`) is what
  *    the ecosystem exchanges; one file per partition, so export
  *    parallelism = partitioning, same contract as [[Warc.export]].
  *    (gzip shards are non-splittable on read — each shard is one task,
  *    the standard trade for interchange files; repartition after ingest
  *    if shards are large.)
  */
object Jsonl {

  /** Read JSONL with a REQUIRED schema (no inference pass) in PERMISSIVE
    * mode: rows that fail to parse land with all data fields null and the
    * raw line preserved in `corruptCol`; well-formed rows carry a null
    * `corruptCol`. The returned frame always has `schema`'s fields plus
    * `corruptCol` appended.
    *
    * Note the Spark contract: a query that selects ONLY the corrupt
    * column forces a parse anyway (internally it must attempt the full
    * row); filter `corruptCol IS NOT NULL` together with at least the
    * fields you quarantine on.
    */
  def read(spark: SparkSession, path: String, schema: StructType,
           corruptCol: String = "_corrupt_record"): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema already has a '$corruptCol' column — pick another corruptCol")
    spark.read
      .schema(schema.add(corruptCol, StringType, nullable = true))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
  }

  /** Split a [[read]] result into (clean, quarantine): clean rows drop
    * the corrupt column; quarantined rows keep only it (the raw line is
    * the re-parse / audit unit). PERSIST (or save) the parsed frame
    * before consuming the quarantine side: Spark refuses plans over raw
    * JSON files whose referenced columns are only the corrupt column
    * (`UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN`), and the
    * quarantine projection is exactly that once Catalyst prunes.
    */
  def partitionCorrupt(parsed: DataFrame,
                       corruptCol: String = "_corrupt_record")
      : (DataFrame, DataFrame) = {
    val clean = parsed.filter(parsed(corruptCol).isNull).drop(corruptCol)
    val bad = parsed.filter(parsed(corruptCol).isNotNull)
      .select(parsed(corruptCol).as("raw_line"))
    (clean, bad)
  }

  /** Export as gzip JSONL shards, one file per partition (repartition
    * first to choose the shard count). Field order in each line follows
    * the frame's column order; `overwrite` replaces the directory
    * atomically via the committer.
    */
  def export(df: DataFrame, dir: String, gzip: Boolean = true,
             overwrite: Boolean = true): Unit = {
    val w = df.write.mode(if (overwrite) "overwrite" else "errorifexists")
    (if (gzip) w.option("compression", "gzip") else w).json(dir)
  }
}
