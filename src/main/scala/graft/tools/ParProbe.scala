package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe: measures the input-split parallelism floor on the
  * fixture corpora (one ~600 KB parquet file = one scan split) and the
  * effect of an early narrow repartition on the pre-shuffle kernel
  * stages (guide §2.5 input skew / §2.6 idle capacity).
  */
object ParProbe {
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
      println(f"$label%-44s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }

    val corpus = graft.datapipe.Dedup.corpus(spark, sfDir)
    println(s"corpus partitions: ${corpus.rdd.getNumPartitions}")
    println(s"defaultParallelism: ${spark.sparkContext.defaultParallelism}")

    // d02 signature kernel, as-is vs early repartition
    def sigs(base: org.apache.spark.sql.DataFrame) = base
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 3)
      .withColumn("shingles", expr(
        """array_distinct(transform(sequence(0, size(words) - 3),
          |  i -> concat_ws(' ', element_at(words, i + 1),
          |                 element_at(words, i + 2), element_at(words, i + 3))))"""
          .stripMargin))
      .withColumn("mhbase", expr("transform(shingles, s -> graft_phash(s) % 2147483647)"))
      .select($"doc_id", $"mhbase")
    (1 to 2).foreach { rep =>
      time(s"d02 sigs as-is (rep $rep)")(sigs(corpus))
      time(s"d02 sigs repartitioned (rep $rep)")(
        sigs(corpus.repartition(spark.sparkContext.defaultParallelism, $"doc_id")))
    }

    // m08 kernel, as-is vs repartition
    def m08(base: org.apache.spark.sql.Dataset[Long]) = {
      import graft.datapipe.Multimodal.VideoCodec
      base.mapPartitions(_.map { id =>
        VideoCodec.sceneCuts(id, VideoCodec.synthVideoScenes(id))
      }).toDF()
    }
    val ids = graft.Tables.documents(spark, sfDir).select($"doc_id").as[Long]
    (1 to 2).foreach { rep =>
      time(s"m08 kernel as-is (rep $rep)")(m08(ids))
      time(s"m08 kernel repartitioned (rep $rep)")(
        m08(ids.repartition(spark.sparkContext.defaultParallelism, $"doc_id")))
    }
    spark.stop()
  }
}
