package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only stage profiler: times labeled sub-plans of the heavy dedup
  * queries so optimization targets the measured hot stage, not a guess.
  * Not part of the driver contract.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.GraftExtensions.register(spark)

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }

    val corpus = graft.datapipe.Dedup.corpus(spark, sfDir)

    // d04 stage 1: gram hashing only
    time("d04 grams only") {
      corpus
        .withColumn("n_chars", length($"text"))
        .filter($"n_chars" >= 4)
        .withColumn("grams", expr(
          """array_sort(array_distinct(transform(
            |  sequence(1, length(text) - 3),
            |  i -> graft_phash(substring(text, i, 4)))))""".stripMargin))
        .select($"doc_id", $"grams")
    }
    // d04 full
    time("d04 full")(graft.datapipe.Dedup.queries("d04_ngram_jaccard")(spark, sfDir))

    // d02 stage 1: signatures only
    time("d02 sigs only") {
      corpus
        .withColumn("words", split(col("text"), " "))
        .filter(size(col("words")) >= 3)
        .withColumn("shingles", expr(
          """array_distinct(transform(sequence(0, size(words) - 3),
            |  i -> concat_ws(' ', element_at(words, i + 1),
            |                 element_at(words, i + 2), element_at(words, i + 3))))"""
            .stripMargin))
        .withColumn("mhbase", expr("transform(shingles, s -> graft_phash(s) % 2147483647)"))
        .select($"doc_id", $"mhbase")
    }
    time("d02 full")(graft.datapipe.Dedup.queries("d02_minhash_lsh")(spark, sfDir))

    // d07 stage split: blocked join fanout vs the banded full-text DP
    val d07docs = corpus
      .withColumn("n_chars", length($"text").cast("long"))
      .withColumn("lenb", ($"n_chars" / 64L).cast("long"))
      .select($"doc_id", $"lang", $"source", $"lenb", $"n_chars", $"text")
    def d07join = d07docs.as("x").join(d07docs.as("y"),
      col("x.lang") === col("y.lang") && col("x.source") === col("y.source") &&
      col("x.lenb") === col("y.lenb") && col("x.doc_id") < col("y.doc_id") &&
      abs(col("x.n_chars") - col("y.n_chars")) <= 5)
    time("d07 join only (no DP)") {
      d07join.select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
    }
    time("d07 join + builtin lev DP") {
      d07join
        .withColumn("editdist", levenshtein(col("x.text"), col("y.text"), 5))
        .filter($"editdist" >= 0)
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"), $"editdist")
    }
    time("d07 join + banded DP expr") {
      d07join
        .withColumn("editdist", graft.functions.BandedLevenshtein
          .banded_levenshtein(col("x.text"), col("y.text"), 5))
        .filter($"editdist" >= 0)
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"), $"editdist")
    }
    time("d07 full")(graft.datapipe.Dedup.queries("d07_edit_distance")(spark, sfDir))
    spark.stop()
  }
}
