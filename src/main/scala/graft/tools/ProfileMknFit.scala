package graft.tools
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Structural profile of the mkn/kn fits: wall time plus LISTENER
  * counters (jobs, stages, tasks, shuffle read/write bytes, input
  * rows×) for `fitMknModel` / `fitKnModel` and one serve pass — the
  * window-independent evidence for fit-graph changes (a gusty box
  * moves seconds, not stage counts or shuffled bytes).
  *
  * Usage: runMain graft.tools.ProfileMknFit [sfDir] [order] [reps]
  */
object ProfileMknFit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val order = args.lift(1).map(_.toInt).getOrElse(5)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val shufWrite = new AtomicLong(0L)
    val shufRead = new AtomicLong(0L)
    val verbose = sys.env.get("GRAFT_PROFILE_STAGES").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        val w = s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        val r = s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
        shufWrite.addAndGet(w)
        shufRead.addAndGet(r)
        if (verbose && (w > 0 || r > 0))
          println(f"    stage ${s.stageInfo.stageId}%4d " +
            f"tasks=${s.stageInfo.numTasks}%3d shufW=${w / 1024}%8d KiB " +
            f"shufR=${r / 1024}%8d KiB  ${s.stageInfo.name.take(90)}")
        ()
      }
    })
    def snap(): (Int, Int, Int, Long, Long) =
      (jobs.get, stages.get, tasks.get, shufWrite.get, shufRead.get)
    def timed(name: String)(f: => Unit): Unit = {
      // settle the listener queue so counters attribute correctly
      // (the bus drain API is private[spark]; a short sleep after the
      // blocking actions is enough for local-mode structural counts)
      Thread.sleep(400)
      val b = snap(); val t0 = System.nanoTime()
      f
      Thread.sleep(400)
      val a = snap()
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  " +
        f"jobs=${a._1 - b._1}%3d stages=${a._2 - b._2}%3d " +
        f"tasks=${a._3 - b._3}%4d " +
        f"shufW=${(a._4 - b._4) / 1024}%8d KiB shufR=${(a._5 - b._5) / 1024}%8d KiB")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.limit(1).collect() // footer warm
    (1 to reps).foreach { r =>
      println(s"--- rep $r")
      var m: org.apache.spark.sql.DataFrame = null
      timed(s"fitMknModel(order=$order)") {
        m = graft.text.VocabStats.fitMknModel(docs, "text", order)
      }
      timed("mknNllFromModel serve") {
        graft.text.VocabStats.mknNllFromModel(m, docs, "doc_id", "text",
          order).write.format("noop").mode("overwrite").save()
      }
      graft.text.VocabStats.releaseModel(m)
      var k: org.apache.spark.sql.DataFrame = null
      timed("fitKnModel") {
        k = graft.text.VocabStats.fitKnModel(docs, "text")
      }
      timed("knNllFromModel serve") {
        graft.text.VocabStats.knNllFromModel(k, docs, "doc_id", "text")
          .write.format("noop").mode("overwrite").save()
      }
      k.unpersist()
    }
    spark.stop()
  }
}
