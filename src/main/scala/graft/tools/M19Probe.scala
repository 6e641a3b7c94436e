package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: decompose m19's 32-core anti-scaling (2.9 s at local[32]
  * vs 0.6 s at local[8] while GifScaleProbe shows the raw kernel
  * scaling perfectly in a plain thread pool — the loss is in the query
  * DAG, not the codec). Times each sub-stage at the session's width
  * with a per-stage task-metrics listener.
  */
object M19Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val stageAgg = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long, Long)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) stageAgg.merge(e.stageId,
            (1, e.taskInfo.duration, m.executorRunTime),
            (a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3))
        }
      })

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      stageAgg.clear()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val el = (System.nanoTime() - t0) / 1e9
      val stages = {
        import scala.jdk.CollectionConverters._
        stageAgg.asScala.toSeq.sortBy(_._1).map { case (sid, (n, dur, run)) =>
          f"s$sid:n=$n,dur=${dur}ms,run=${run}ms"
        }.mkString(" ")
      }
      println(f"$label%-34s $el%6.2f s   $stages")
    }

    import graft.datapipe.Multimodal
    val m19 = Multimodal.queries("m19_gif_timing")
    // warmup
    time("m19 full (warmup)")(m19(spark, sfDir))
    (1 to 2).foreach { rep =>
      time(s"m19 full (rep $rep)")(m19(spark, sfDir))
      val ids = graft.Tables.documents(spark, sfDir).select(col("doc_id"))
        .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
        .as[Long]
      time(s"ids+kernel, no sort (rep $rep)")(
        ids.mapPartitions(_.map { id =>
          Multimodal.GifWalk.walk(id, Multimodal.VideoCodec.synthVideoTimed(id))
        }).toDF())
      time(s"ids only (rep $rep)")(ids.toDF())
    }
    spark.stop()
  }
}
