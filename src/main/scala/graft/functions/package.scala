package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar helpers (reference: with_md5_cols mack/__init__.py:589-613,
  * humanize_bytes :512-532, humanize_bytes_binary :535-555).
  */
package object functions {

  /** Append an md5 surrogate-key column over `cols`, default name
    * `md5_<c1>_<c2>…`. NULL columns are SKIPPED by `concat_ws` — md5 of
    * ("a", NULL) equals md5 of "a" (reference test
    * tests/test_public_interface.py:781-812) — and both Spark's and the
    * reference's `concat_ws`/`md5` are codegen'd built-ins, so this stays
    * inside whole-stage codegen.
    */
  def withMd5Cols(df: DataFrame, cols: Seq[String],
                  outputColName: Option[String] = None): DataFrame = {
    val out = outputColName.getOrElse(("md5" +: cols).mkString("_"))
    df.withColumn(out, md5Col(cols.map(col): _*))
  }

  /** The md5-of-concat_ws expression itself, reusable in larger plans. */
  def md5Col(cols: Column*): Column = md5(concat_ws("||", cols: _*))

  private val decimalPrefixes = Seq(
    "PB" -> math.pow(1000, 5), "TB" -> math.pow(1000, 4),
    "GB" -> math.pow(1000, 3), "MB" -> math.pow(1000, 2),
    "kB" -> 1000.0)
  private val binaryPrefixes = Seq(
    "PB" -> math.pow(1024, 5), "TB" -> math.pow(1024, 4),
    "GB" -> math.pow(1024, 3), "MB" -> math.pow(1024, 2),
    "kB" -> 1024.0)

  private def humanize(n: Long, prefixes: Seq[(String, Double)]): String = {
    prefixes.foreach { case (prefix, k) =>
      if (n >= k * 0.9) return f"${n / k}%.2f $prefix"
    }
    s"$n B"
  }

  /** "1.23 GB" with powers of 1000, ≥0.9·unit threshold (reference :512-532). */
  def humanizeBytes(n: Long): String = humanize(n, decimalPrefixes)

  /** Same with powers of 1024 (reference :535-555). */
  def humanizeBytesBinary(n: Long): String = humanize(n, binaryPrefixes)
}
