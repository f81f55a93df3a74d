package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Leg-by-leg attribution of `lang_id_trained` (r21): where do the
  * ~6.4 s go — the char-gram tokenize+tf corpus pass, the evidence
  * join (tf × |languages| through the (id, label) hash aggregate), or
  * the argmax window? Times each prefix of the plan through the noop
  * sink (guide §1.4), with the fixed calib probe bracketing the run.
  *
  * The `evidence` leg here is deliberately the PRE-r21 ROW FORM
  * (`tf ⋈ wcF` → ×|languages| blow-up into the (id, label) hash
  * aggregate), kept as the before/after yardstick for the r21 dense
  * rework inside [[graft.text.LangId.trained]]: post-rework, `full`
  * (the whole query, dense evidence included) times BELOW this single
  * old leg — sf0.1 measured round: tf=2.0 wc=2.4 evidence(row
  * form)=7.3 full(dense)=4.3 at calib ~0.8.
  */
object ProfileLangId {
  private def noop(df: DataFrame): Double = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    println(f"calib: ${graft.Bench.calibProbe(spark, sfDir)}%.3f")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val (idCol, textCol, labelCol) = ("doc_id", "text", "lang")
    val ns = Seq(2, 3); val buckets = 4096; val seed = "5"
    val alpha = 0.5; val LnScale = 1.0e9

    def tf = docs
      .select(col(idCol),
        explode(graft.text.LangId.hashedCharNgrams(
          col(textCol), ns, buckets, seed)).as("word"))
      .groupBy(col(idCol), col("word")).agg(count(lit(1)).as("tf"))
    val labels = docs.filter(col(labelCol).isNotNull)
      .select(col(idCol), col(labelCol).as("label"))
    def wc = tf.join(labels, Seq(idCol))
      .groupBy(col("label"), col("word")).agg(sum(col("tf")).as("c"))
    def wcF = wc.select(col("label"), col("word"),
      round(log(col("c") + lit(alpha)) * lit(LnScale)).cast("long")
        .as("lnfp"))
    def matched = tf.join(wcF, Seq("word"))
      .groupBy(col(idCol), col("label"))
      .agg(sum(col("tf") * col("lnfp")).as("__evfp"),
        sum(col("tf")).as("__mtoks"))

    for (round <- 1 to 2) {
      spark.sparkContext.setJobDescription("leg 1: tokenize+tf")
      val t1 = noop(tf)
      spark.sparkContext.setJobDescription("leg 2: fit wc")
      val t2 = noop(wcF)
      spark.sparkContext.setJobDescription("leg 3: evidence join+agg")
      val t3 = noop(matched)
      spark.sparkContext.setJobDescription("leg 4: full trained()")
      val t4 = noop(graft.text.LangId.trained(docs, idCol, textCol, labelCol))
      spark.sparkContext.setJobDescription(null)
      println(f"round $round: tf=$t1%6.2f  wc=$t2%6.2f  evidence=$t3%6.2f  full=$t4%6.2f")
    }
    println(f"calib end: ${graft.Bench.calibProbe(spark, sfDir)}%.3f")
    spark.stop()
  }
}
