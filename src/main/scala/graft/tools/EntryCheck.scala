package graft.tools
object EntryCheck {
  def main(a: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("entry rows = " + graft.SparkEntry.entry(spark).count())
    spark.stop()
  }
}
