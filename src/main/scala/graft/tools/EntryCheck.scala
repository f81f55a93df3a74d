package graft.tools

/** Smoke-check the driver contract: the flagship entry returns rows, and
  * every golden-literal oracle (a `FROM (VALUES ...)` table pinned on the
  * sf0.01 dataset) is registered in `sf001OnlyOracles` — an unguarded
  * literal would be served verbatim at any other sf and manufacture a
  * false correctness failure.
  */
object EntryCheck {
  def main(a: Array[String]): Unit = {
    val literal = graft.SparkEntry.oracleSql.collect {
      case (name, sql) if sql.contains("FROM (VALUES") => name
    }.toSet
    val unguarded = literal -- graft.SparkEntry.sf001OnlyOracles
    require(unguarded.isEmpty,
      s"golden-literal oracles missing from sf001OnlyOracles: " +
        unguarded.toSeq.sorted.mkString(", "))
    println(s"guarded golden literals = ${literal.toSeq.sorted.mkString(", ")}")

    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("entry rows = " + graft.SparkEntry.entry(spark).count())
    spark.stop()
  }
}
