package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeMkn {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def words(c: org.apache.spark.sql.Column) =
      filter(split(lower(c), "\\s+"), w => length(w) > 0)
    val ws = docs.select(col("doc_id"), words(col("text")).as("ws"))
    val tg = ws.select(explode(transform(
        slice(col("ws"), lit(1), greatest(size(col("ws")) - 2, lit(0))),
        (w, i) => struct(w.as("w1"),
          element_at(col("ws"), i + 2).as("w2"),
          element_at(col("ws"), i + 3).as("w3")))).as("t"))
      .select(col("t.w1"), col("t.w2"), col("t.w3"))
    val tcnt = tg.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3"))
    val cc2 = tcnt.groupBy("w2", "w3").agg(count(lit(1)).as("cc2"))
    tcnt.groupBy("c3").count().orderBy("c3").show(6)
    cc2.groupBy("cc2").count().orderBy("cc2").show(6)
    spark.stop()
  }
}
