package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-only probe for a perf-weak set: in ONE boot (the repo's
  * same-boot A/B discipline), separates per-query cost into PLANNING
  * (analysis+optimization+physical planning, forced via
  * queryExecution.executedPlan) and EXECUTION (noop write), repeated,
  * with q01 as the load sentinel.
  *
  * Usage: `runMain graft.tools.DriftProbe [sfDir] [q1,q2,...]`.
  * With an explicit query list (round-16 shape: the s-family + q69
  * drift check), probes those names on a clean warmed session —
  * rep1 vs warm separates first-execution codegen/JIT session cost
  * from a real plan regression. Without one, runs the original
  * round-15 protocol for q29/q43/q75: clean-vs-extensions session A/B
  * plus component floors.
  */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val explicit = args.drop(1).headOption.map(_.split(",").toSeq)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    def bench(s: SparkSession, name: String, reps: Int = 3)
             (mk: => DataFrame): Unit = {
      (1 to reps).foreach { i =>
        val df = mk
        val t0 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimize+plan
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        println(f"$name%-34s rep$i plan=${(t1 - t0) / 1e9}%7.3f s exec=${(t2 - t1) / 1e9}%7.3f s")
      }
    }

    // ---- phase 1: session WITHOUT GraftExtensions' rule/strategy ----
    // (fresh derived session: shares the warmed SparkContext/JIT but has
    // clean experimental methods and no temp functions)
    val clean = spark.newSession()
    clean.conf.set("spark.sql.shuffle.partitions", 32)
    // warmup on the clean session (parquet reader init, codegen)
    graft.Tables.lineitem(clean, sfDir).count()
    graft.SparkEntry.queries("q01_pricing_summary")(clean, sfDir)
      .write.format("noop").mode("overwrite").save()

    explicit.foreach { names =>
      // round-16 shape: probe an explicit suspect list, reps=4 — rep1
      // carries any first-execution codegen/JIT cost, warm reps are the
      // query's true bill; q01 sentinels bracket the list for load
      println(s"== explicit probe: ${names.mkString(", ")} ==")
      bench(clean, "q01_pricing_summary(sentinel)")(
        graft.SparkEntry.queries("q01_pricing_summary")(clean, sfDir))
      names.foreach { n =>
        bench(clean, n, reps = 4)(graft.SparkEntry.queries(n)(clean, sfDir))
      }
      bench(clean, "q01_pricing_summary(sentinel)")(
        graft.SparkEntry.queries("q01_pricing_summary")(clean, sfDir))
      spark.stop()
      return
    }

    println("== phase 1: clean session (no extensions registered) ==")
    Seq("q01_pricing_summary", "q29_asof_join", "q43_bottomk_sketch",
        "q46_asof_join_native", "q75_snapshot_diff").foreach { n =>
      bench(clean, n)(graft.SparkEntry.queries(n)(clean, sfDir))
    }

    // ---- phase 2: same boot, session WITH extensions (the bench shape:
    // by the time q* runs in Bench, d* queries have registered them) ----
    val ext = spark.newSession()
    ext.conf.set("spark.sql.shuffle.partitions", 32)
    graft.GraftExtensions.register(ext)
    graft.Tables.lineitem(ext, sfDir).count()
    println("== phase 2: extensions registered (bench-session shape) ==")
    Seq("q01_pricing_summary", "q29_asof_join", "q43_bottomk_sketch",
        "q46_asof_join_native", "q75_snapshot_diff").foreach { n =>
      bench(ext, n)(graft.SparkEntry.queries(n)(ext, sfDir))
    }

    // ---- phase 3: component floors on the clean session ----
    println("== phase 3: component floors ==")
    bench(clean, "events scan+truncate") {
      graft.Tables.events(clean, sfDir)
        .withColumn("ts", date_trunc("second", col("ts")))
    }
    bench(clean, "documents scan") {
      graft.Tables.documents(clean, sfDir)
    }
    bench(clean, "documents groupBy count only") {
      graft.Tables.documents(clean, sfDir)
        .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    }
    bench(clean, "q43 phash only (no bottom_k)") {
      graft.Tables.documents(clean, sfDir)
        .groupBy(col("lang"))
        .agg(sum(graft.Dets.phash(col("text")) % 1000000L).as("s"),
             count(lit(1)).as("n_docs"))
    }
    bench(clean, "orders scan") {
      graft.Tables.orders(clean, sfDir)
    }
  }
}
