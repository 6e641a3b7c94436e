package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe for the r21 scan-spread work: times the corpus text
  * kernels over the plain one-split scan vs the doc_id-range spread
  * union, in one session.
  */
object SpreadProbe {
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
    import spark.implicits._
    graft.GraftExtensions.register(spark)

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$label%-52s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }

    val plain = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text", $"lang", $"source")
    val spread = graft.Tables.documentsSpread(spark, sfDir)
      .select($"doc_id", $"text", $"lang", $"source")
    println(s"plain partitions:  ${plain.rdd.getNumPartitions}")
    println(s"spread partitions: ${spread.rdd.getNumPartitions}")

    import graft.functions.WordShinglePHashes.word_shingle_phashes
    def shingles(base: org.apache.spark.sql.DataFrame) = base
      .withColumn("hset", word_shingle_phashes($"text", 3))
      .filter(size($"hset") >= 1)
      .select($"doc_id", explode($"hset").as("h"))
      .groupBy($"h").agg(count(lit(1)).as("df"))

    // per-task metrics listener: prints task durations of each stage
    val taskLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) taskLog.add(
            f"stage=${e.stageId}%4d task dur=${e.taskInfo.duration}%5d ms " +
            f"run=${m.executorRunTime}%5d cpu=${m.executorCpuTime / 1000000}%5d " +
            f"deser=${m.executorDeserializeTime}%4d gc=${m.jvmGCTime}%4d " +
            f"launch-gap=${e.taskInfo.launchTime}%d")
        }
      })

    def spreadK(k: Int): org.apache.spark.sql.DataFrame = {
      val lo = 0L; val hi = 4999L; val span = hi - lo + 1
      val cuts = (0L to k.toLong).map(i => lo + span * i / k).distinct
      cuts.sliding(2).map { case Seq(a, b) =>
        plain.filter($"doc_id" >= a && $"doc_id" < b)
      }.reduce(_ unionByName _)
    }

    import org.apache.spark.sql.graft.DatasetBridge
    (1 to 3).foreach { rep =>
      time(s"shingle kernel plain  (rep $rep)")(shingles(plain))
      for (k <- Seq(2, 4, 8, 16, 32)) {
        time(f"shingle kernel fan=$k%2d  (rep $rep)")(
          shingles(DatasetBridge.fanOutScan(plain, k)))
      }
    }
    Thread.sleep(300)
    spark.stop()
  }
}
