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

    // ----- s16 stage split (PQ helpers replicated from Similarity;
    // dev-only — the query itself stays the source of truth) -----
    val PQ_M = 4
    val PQ_K = 8
    val NQ = 32
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(size($"embedding") > 0)
    def pqSubs(e: org.apache.spark.sql.DataFrame) = e
      .select(col("vec_id"), explode(expr(
        s"transform(sequence(0, $PQ_M - 1), j -> struct(j AS j, " +
        s"slice(embedding, j * (size(embedding) div $PQ_M) + 1, " +
        s"size(embedding) div $PQ_M) AS sv))")).as("x"))
      .select(col("vec_id"), col("x.j").as("j"), col("x.sv").as("sv"))
    def intL2(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("d2", expr(
        "aggregate(zip_with(sv, centroid, (a, b) -> " +
        "CAST(round(CAST(a AS DOUBLE) * 1e8) AS BIGINT) - " +
        "CAST(round(CAST(b AS DOUBLE) * 1e8) AS BIGINT)), " +
        "CAST(0 AS BIGINT), (acc, x) -> acc + x * x)"))
    val subs = pqSubs(emb)
    val cb = subs
      .withColumn("code", (col("vec_id") % PQ_K).cast("int"))
      .select(col("j"), col("code"), posexplode(col("sv")).as(Seq("pos", "v")))
      .groupBy(col("j"), col("code"), col("pos"))
      .agg((sum(round(col("v").cast("double") * 1e8).cast("long")).cast("double")
              / count(lit(1)) / 1e8).cast("float").as("m"))
      .groupBy(col("j"), col("code"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), x -> x.m)")
        .as("centroid"))
    time("s16 codebook")(cb)
    val cbC = cb.localCheckpoint()
    val codes = intL2(subs.join(broadcast(cbC), Seq("j")))
      .groupBy(col("vec_id"), col("j"))
      .agg(min(struct(col("d2"), col("code"))).as("best"))
      .select(col("vec_id"), col("j"), col("best.code").as("code"))
    time("s16 encode")(codes)
    val qs0 = emb
      .orderBy(graft.Dets.phash($"vec_id".cast("string")), $"vec_id")
      .limit(NQ)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
      .localCheckpoint()
    val dt = intL2(
        pqSubs(qs0.select($"q_id".as("vec_id"), $"q_emb".as("embedding")))
          .join(broadcast(cbC), Seq("j")))
      .select($"vec_id".as("q_id"), $"j", $"code", $"d2".as("dq"))
    time("s16 dt")(dt)
    val codesC = codes.localCheckpoint()
    val adc = codesC.join(broadcast(dt), Seq("j", "code"))
      .filter($"vec_id" =!= $"q_id")
      .groupBy($"q_id", $"vec_id")
      .agg(sum($"dq").as("adc"))
    time("s16 adc scan (codes ckpt)")(adc)
    import org.apache.spark.sql.expressions.Window
    val wA = Window.partitionBy($"q_id").orderBy($"adc", $"vec_id")
    time("s16 adc+rank")(adc.withColumn("rn", row_number().over(wA))
      .filter($"rn" <= 100).select($"q_id", $"vec_id", $"rn"))
    time("s16 exact10 brute force") {
      val wE = Window.partitionBy($"q_id").orderBy($"d2", $"vec_id")
      emb.join(broadcast(qs0), $"vec_id" =!= $"q_id")
        .withColumn("d2", expr(
          "aggregate(zip_with(embedding, q_emb, (a, b) -> " +
          "CAST(round(CAST(a AS DOUBLE) * 1e8) AS BIGINT) - " +
          "CAST(round(CAST(b AS DOUBLE) * 1e8) AS BIGINT)), " +
          "CAST(0 AS BIGINT), (acc, x) -> acc + x * x)"))
        .select($"q_id", $"vec_id", $"d2")
        .withColumn("rn", row_number().over(wE))
        .filter($"rn" <= 10).select($"q_id", $"vec_id")
    }
    time("s16 full")(
      graft.datapipe.Similarity.queries("s16_pq_recall")(spark, sfDir))
    spark.stop()
  }
}
