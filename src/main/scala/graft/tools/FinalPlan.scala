package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: execute selected registry queries and print the FINAL
  * adaptive plan (post-AQE — ReusedExchange and runtime join switches
  * only appear here, never in the static explain).
  */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // "COUNTS" mode: execute every registry query and print one line of
    // plan-shape counters (parquet scans, reused exchanges) — the cheap
    // whole-registry sweep for duplicated-subtree hunting.
    if (args.headOption.contains("COUNTS")) {
      graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          df.write.format("noop").mode("overwrite").save()
          val p = df.queryExecution.executedPlan.toString
          println(s"COUNTS $name scans=${p.sliding(12).count(_ == "Scan parquet")} " +
            s"reused=${p.sliding(14).count(_ == "ReusedExchange")}")
          spark.catalog.clearCache()
        } catch { case e: Throwable =>
          println(s"COUNTS $name ERROR ${e.getMessage}")
        }
      }
    } else {
      args.foreach { name =>
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        println(s"==== $name ====")
        println(df.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
