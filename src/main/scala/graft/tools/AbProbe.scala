package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only interleaved A/B: runs two formulations of the same query
  * alternately in ONE JVM so external load bursts hit both equally —
  * the ratio is trustworthy even on a non-idle box.
  */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    graft.GraftExtensions.register(spark)

    def time(mk: => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // A = d33 WITHOUT the sh/sizes checkpoints (the pre-change shape,
    // inlined); B = the committed query (with them).
    import graft.functions.WordShinglePHashes.word_shingle_phashes
    def d33Old: DataFrame = {
      val docs = graft.Tables.documents(spark, sfDir)
        .select($"doc_id", $"text", $"lang", $"source")
      val quotes = docs.filter($"doc_id" % 11 === 0)
        .withColumn("w", split($"text", " "))
        .filter(size($"w") >= 10)
        .select(($"doc_id" + 4000000L).as("doc_id"),
          array_join(expr("slice(w, 1, greatest(5, (size(w) * 3) div 10))"),
            " ").as("text"),
          $"lang", $"source")
      val hs = graft.datapipe.Dedup.corpus(spark, sfDir).unionByName(quotes)
        .withColumn("hset", word_shingle_phashes($"text", 3))
        .filter(size($"hset") >= 1)
        .select($"doc_id", explode($"hset").as("h"))
      val rare = hs.groupBy($"h").agg(count(lit(1)).as("df"))
        .filter($"df" <= 64).select($"h")
      val sh = hs.join(rare, Seq("h"), "left_semi")
      val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("sz"))
      sh.as("x").join(sh.as("y"),
          col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
        .agg(count(lit(1)).as("inter"))
        .join(sizes.select($"doc_id".as("da"), $"sz".as("sza")), Seq("da"))
        .join(sizes.select($"doc_id".as("db"), $"sz".as("szb")), Seq("db"))
        .withColumn("aIsSub",
          $"sza" < $"szb" || ($"sza" === $"szb" && $"da" < $"db"))
        .select(
          when($"aIsSub", $"da").otherwise($"db").as("d_sub"),
          when($"aIsSub", $"db").otherwise($"da").as("d_sup"),
          $"inter",
          when($"aIsSub", $"sza").otherwise($"szb").as("sz_sub"),
          when($"aIsSub", $"szb").otherwise($"sza").as("sz_sup"),
          ($"inter" / ($"sza" + $"szb" - $"inter").cast("double"))
            .as("jaccard"))
        .withColumn("cont_ppm", expr("inter * 1000000 DIV sz_sub"))
        .filter($"cont_ppm" >= 800000L && $"jaccard" < 0.5)
        .select($"d_sub", $"d_sup", $"inter", $"sz_sub", $"sz_sup",
          $"cont_ppm", $"jaccard")
        .orderBy($"d_sub", $"d_sup")
    }
    def d33New: DataFrame =
      graft.datapipe.Dedup.queries("d33_containment")(spark, sfDir)

    // warmup both
    time(d33Old); time(d33New)
    val as = collection.mutable.ArrayBuffer[Double]()
    val bs = collection.mutable.ArrayBuffer[Double]()
    (1 to 5).foreach { i =>
      as += time(d33Old)
      bs += time(d33New)
      println(f"rep $i  old=${as.last}%6.2f  new=${bs.last}%6.2f")
    }
    println(f"median old=${as.sorted.apply(2)}%6.2f  new=${bs.sorted.apply(2)}%6.2f")
    spark.stop()
  }
}
