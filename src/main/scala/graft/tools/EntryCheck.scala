package graft.tools

/** Smoke-check the driver contract: the flagship entry returns rows, and
  * every golden-literal oracle (a `FROM (VALUES ...)` table pinned on the
  * sf0.01 dataset) is registered in `sf001OnlyOracles` — an unguarded
  * literal would be served verbatim at any other sf and manufacture a
  * false correctness failure.
  */
object EntryCheck {
  private val baseTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def main(a: Array[String]): Unit = {
    // A GOLDEN literal is pinned to sf0.01's data without reading it:
    // a VALUES table and no reference to any base table. An oracle
    // that uses VALUES merely as constant query INPUT (e.g. the batch
    // BM25 query list) still derives from a base table and is valid at
    // every sf — it must NOT be guarded (guarding would silently skip
    // real verification at sf0.1).
    val refsTable = (sql: String) =>
      baseTables.exists(t => ("""(?i)\b""" + t + """\b""").r
        .findFirstIn(sql).isDefined)
    val literal = graft.SparkEntry.oracleSql.collect {
      case (name, sql) if sql.contains("FROM (VALUES") && !refsTable(sql) =>
        name
    }.toSet
    val unguarded = literal -- graft.SparkEntry.sf001OnlyOracles
    require(unguarded.isEmpty,
      s"golden-literal oracles missing from sf001OnlyOracles: " +
        unguarded.toSeq.sorted.mkString(", "))
    // Guarded entries that DON'T match the pure-literal shape are legal
    // (dedup_simhash pins a literal id-exclusion list OVER documents) but
    // each one skips real verification above sf0.01 — keep them visible.
    val overGuarded = graft.SparkEntry.sf001OnlyOracles -- literal
    if (overGuarded.nonEmpty)
      println(s"note: sf-pinned by review, not literal-shaped: " +
        overGuarded.toSeq.sorted.mkString(", "))
    println(s"guarded golden literals = ${literal.toSeq.sorted.mkString(", ")}")

    // declared-query ⟷ oracle totality: every query has an oracle and
    // every oracle (and guard-set member) names a real query — a typo in
    // either direction silently weakens or skips verification
    val qs = graft.SparkEntry.queries.keySet
    val os = graft.SparkEntry.oracleSql.keySet
    require((qs -- os).isEmpty,
      s"queries without an oracle: ${(qs -- os).toSeq.sorted.mkString(", ")}")
    require((os -- qs).isEmpty,
      s"oracles without a query: ${(os -- qs).toSeq.sorted.mkString(", ")}")
    val guards = graft.SparkEntry.sf001OnlyOracles ++
      graft.SparkEntry.sf001RegimeOracles
    require((guards -- qs).isEmpty,
      s"guard entries naming no query: ${(guards -- qs).toSeq.sorted.mkString(", ")}")
    println(s"query/oracle totality holds over ${qs.size} queries " +
      s"(${guards.size} sf-guarded)")

    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("entry rows = " + graft.SparkEntry.entry(spark).count())
    spark.stop()
  }
}
