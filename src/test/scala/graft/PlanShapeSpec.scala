package graft

/** Plan-quality regression tests: the physical-plan properties the 100 TB
  * design depends on must survive refactors — pushdown reaching the
  * Parquet scan, dimension broadcasts, top-k as TakeOrderedAndProject,
  * and whole-stage codegen over the hot expressions.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString

  /** Plan after execution — AQE has finalized, codegen spans visible. */
  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q02: predicates and projection push into the Parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: ["), p.take(800))
    // toString truncates the filter list — match the stable prefix
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      "shipdate filters not pushed")
    // pruned read schema: 6 columns, not the full 11
    assert(!p.contains("l_tax"), "projection not pruned — reads unused columns")
  }

  test("q03/q08: dimension joins broadcast") {
    assert(plan("q03_join_broadcast").contains("BroadcastHashJoin"))
    assert(plan("q08_multiway_join").contains("BroadcastHashJoin"))
  }

  test("q10: top-k plans as TakeOrderedAndProject (no global sort)") {
    val p = plan("q10_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(400))
  }

  test("q82: bucketed fact-fact join carries NO exchange below the sort-merge join") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    // building the plan also materializes the bucketed layout
    val tree = planTree("q82_bucketed_join")
    val smj = tree.collect { case j: SortMergeJoinExec => j }
    assert(smj.size === 1, "bucketed join did not plan as sort-merge:\n" +
      tree.toString.take(600))
    assert(smj.head.collect { case e: ShuffleExchangeLike => e }.isEmpty,
      "exchange below the co-located join — bucketing not engaged:\n" +
        smj.head.toString.take(600))
    assert(smj.head.toString.contains("SelectedBucketsCount"),
      "scan is not bucket-aware:\n" + smj.head.toString.take(600))
    // above the join: exactly the post-join aggregate + output sort
    val above = tree.collect { case e: ShuffleExchangeLike => e }
    assert(above.size === 2,
      s"expected agg + sort exchanges only, found ${above.size}")
  }

  test("q92: AQE splits the planted hot partition — skew marks in the executed plan") {
    val df = operators.Nested.skewJoinFrame(spark, sf)
    // execute through the dataset's OWN QueryExecution (write()/count()
    // build separate ones and the adaptive plan would stay unexecuted)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("skew=true"),
      "OptimizeSkewedJoin did not fire on the planted hot key:\n" +
        p.take(1200))
  }

  test("q93: AQE coalesces the overprovisioned shuffle — coalesced AQEShuffleRead, far fewer partitions") {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec}
    val df = operators.Nested.coalesceAggFrame(spark, sf)
    // execute through the dataset's OWN QueryExecution (q92's lesson:
    // write()/count() build separate ones, leaving this one unexecuted)
    df.collect()
    val adaptive = df.queryExecution.executedPlan
      .collectFirst { case a: AdaptiveSparkPlanExec => a }
      .getOrElse(fail("no adaptive plan — AQE did not engage:\n" +
        df.queryExecution.executedPlan.toString.take(600)))
    // query stages wrap their subplans as non-child fields, so a plain
    // collect stops at the stage boundary — descend explicitly
    def allReads(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[AQEShuffleReadExec] =
      p.collect { case r: AQEShuffleReadExec => r } ++
        p.collect { case qs: QueryStageExec => qs }
          .flatMap(qs => allReads(qs.plan))
    val reads = allReads(adaptive.executedPlan)
    assert(reads.nonEmpty, "no AQEShuffleRead in the final adaptive plan:\n"
      + adaptive.executedPlan.toString.take(1200))
    // every post-shuffle read must have been folded below the
    // overprovisioned count — at fixture scale, far below it
    reads.foreach { r =>
      assert(r.partitionSpecs.size < operators.Nested.CoalesceInitialPartitions,
        s"read kept ${r.partitionSpecs.size} partitions of the " +
          s"overprovisioned ${operators.Nested.CoalesceInitialPartitions}")
    }
    assert(adaptive.executedPlan.toString.contains("coalesced"),
      "AQEShuffleRead present but not marked coalesced:\n" +
        adaptive.executedPlan.toString.take(1200))
  }

  test("q95: AQE converts the statically-planned sort-merge join to broadcast at runtime") {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
    val df = operators.Nested.broadcastSwitchFrame(spark, sf)
    // half 1: the STATIC physical plan carries the sort-merge join —
    // the file-size estimate genuinely forbids a broadcast at plan time
    // (otherwise the runtime conversion below pins nothing)
    val static = df.queryExecution.sparkPlan
    assert(static.collect { case j: SortMergeJoinExec => j }.nonEmpty,
      "static plan did not pick SMJ — the mispricing setup is broken:\n" +
        static.toString.take(800))
    // half 2: execute; the final adaptive plan must carry a broadcast
    // join where the SMJ stood (descend into query stages — q93's
    // traversal lesson)
    df.collect()
    val adaptive = df.queryExecution.executedPlan
      .collectFirst { case a: AdaptiveSparkPlanExec => a }
      .getOrElse(fail("no adaptive plan"))
    def joins(p: org.apache.spark.sql.execution.SparkPlan)
        : (Seq[BroadcastHashJoinExec], Seq[SortMergeJoinExec]) = {
      val bh = p.collect { case j: BroadcastHashJoinExec => j }
      val sm = p.collect { case j: SortMergeJoinExec => j }
      val stages = p.collect { case qs: QueryStageExec => qs }
      stages.map(qs => joins(qs.plan)).foldLeft((bh, sm)) {
        case ((b, s0), (b2, s2)) => (b ++ b2, s0 ++ s2)
      }
    }
    val (bhj, smj) = joins(adaptive.executedPlan)
    assert(bhj.nonEmpty, "runtime did not convert to broadcast:\n" +
      adaptive.executedPlan.toString.take(1200))
    assert(smj.isEmpty, "a sort-merge join survived execution:\n" +
      adaptive.executedPlan.toString.take(1200))
  }

  test("q94: unpivot plans a map-only Expand — no exchange below the reshape") {
    import org.apache.spark.sql.execution.ExpandExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    // sparkPlan, not executedPlan: the adaptive root is a leaf to
    // collect() and this pin is structural, not runtime
    val plan = operators.AdvancedAggs.queries("q94_unpivot")(spark, sf)
      .queryExecution.sparkPlan
    val expands = plan.collect { case e: ExpandExec => e }
    assert(expands.size === 1, "unpivot did not plan as Expand:\n" +
      plan.toString.take(600))
    // the reshape itself moves no data — the only exchange in the whole
    // plan is the final presentation sort's range partitioning
    val below = expands.head.collect {
      case ex: ShuffleExchangeLike => ex }
    assert(below.isEmpty,
      "a shuffle crept below the Expand:\n" + plan.toString.take(900))
  }

  test("q91: CBO reorders the stated worst-order join — customer meets orders before lineitem") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val lp = operators.Extras.cboJoinFrame(spark, sf)
      .queryExecution.optimizedPlan
    val joins = lp.collect { case j: Join => j }
    assert(joins.size === 2, "expected a 2-join tree:\n" + lp.toString.take(800))
    // the INNERMOST join (no Join below it) must pair orders with the
    // filtered customer — the stated order pairs lineitem with orders,
    // so this shape only exists if the cost-based reorder fired
    val inner = joins.filter(j =>
      j.children.forall(_.collect { case jj: Join => jj }.isEmpty))
    assert(inner.size === 1, lp.toString.take(800))
    val sub = inner.head.toString
    assert(sub.contains("graft_cbo_orders") &&
           sub.contains("graft_cbo_customer") &&
           !sub.contains("graft_cbo_lineitem"),
      "CBO did not reorder the join tree:\n" + lp.toString.take(1200))
  }

  test("q83: both predicates resolve as partition filters — no row-level filter survives") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // building the frame also writes the partitioned layout
    val ev = spark.read.parquet(
      operators.Extras.partitionedEventsLayout(spark, sf))
    val tree = operators.Extras.prunedClickWeek(ev)
      .queryExecution.executedPlan
    val scans = tree.collect { case sc: FileSourceScanExec => sc }
    assert(scans.size === 1, tree.toString.take(400))
    val sc = scans.head
    val pf = sc.partitionFilters.map(_.sql).mkString(";")
    assert(pf.contains("event_type") && pf.contains("event_date"),
      s"predicates not pruned at partition level: $pf")
    assert(sc.dataFilters.isEmpty,
      "row-level filter survived a metadata-resolvable predicate: " +
        sc.dataFilters.map(_.sql).mkString(";"))
  }

  test("q84: fact scan carries a DynamicPruningExpression (runtime partition filter)") {
    val p = plan("q84_runtime_filtered_scan")
    assert(p.toLowerCase.contains("dynamicpruning"),
      "no runtime partition filter in the fact scan:\n" + p.take(1200))
  }

  test("q01: aggregation is partial (map-side combine) before the shuffle") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_"), "no partial aggregation in:\n" + p.take(800))
  }

  test("d05: codegen'd cosine runs inside WholeStageCodegen") {
    val p = finalPlan("d05_embedding_neardup")
    assert(p.contains("cosinesim") || p.contains("CosineSim"),
      "custom expression missing from plan")
    // compact notation: "*(n)" prefixes whole-stage-codegen'd operators
    assert(p.contains("*(") && p.linesIterator.exists(l =>
        l.contains("*(") && l.contains("cosinesim")),
      "cosine expression not inside a codegen stage:\n" + p.take(1200))
  }

  test("q46: native as-of join plans with clustered exchanges and sorts") {
    val p = plan("q46_asof_join_native")
    assert(p.contains("AsOfJoin"), "custom exec node missing")
    assert(p.contains("Exchange hashpartitioning"), "children not hash-clustered")
    assert(p.contains("Sort ["), "children not sorted for merge")
  }

  test("q55: unpivot is map-only before its final sort (no mid-plan shuffle)") {
    val p = plan("q55_unpivot")
    // exactly one exchange: the rangepartitioning for the output ORDER BY
    val exchanges = p.linesIterator.count(_.contains("Exchange "))
    assert(exchanges == 1, s"expected only the final sort exchange:\n${p.take(1200)}")
    assert(p.contains("Expand") || p.contains("Generate"),
      "unpivot not planned as row expansion")
  }

  test("t06/s04: exploded corpus stats partial-aggregate before the shuffle") {
    assert(plan("t06_ngram_topk").contains("partial_"),
      "bigram counts not map-side combined")
    assert(plan("s04_label_centroids").contains("partial_"),
      "centroid sums not map-side combined")
  }

  test("runtime Bloom-filter join pruning injects on a selective join side") {
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force shuffle join
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions._
      val big = Tables.lineitem(spark, sf)
      val selective = Tables.orders(spark, sf)
        .filter(col("o_totalprice") > 300000) // few survivors
      val joined = big.join(selective,
        big("l_orderkey") === selective("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.toLowerCase.contains("bloomfilter"),
        "no runtime bloom filter injected:\n" + plan.take(1200))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("s03/s05: centroid assignment is map-only — no shuffle of embeddings") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
    // centroids as a literal one-row frame: the assignment stage under
    // test is exactly what s03/s05 run after their (separately shuffled)
    // centroid aggregation
    val centsRow = spark.range(1).select(expr(
      """array(
        |  named_struct('cell', 0L, 'centroid', CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)),
        |  named_struct('cell', 1L, 'centroid', CAST(array(0.0, 1.0) AS ARRAY<FLOAT>)))"""
        .stripMargin).as("cents"))
    val assigned = datapipe.Similarity.assignCells(emb, centsRow, "cell")
    assigned.collect()
    val p = assigned.queryExecution.executedPlan.toString
    Seq("Exchange hashpartitioning", "Exchange rangepartitioning",
        "Exchange SinglePartition").foreach { shuffle =>
      assert(!p.contains(shuffle),
        s"assignment stage shuffles ($shuffle):\n" + p.take(1200))
    }
    assert(p.contains("BroadcastNestedLoopJoin"),
      "centroid row not broadcast:\n" + p.take(1200))
    assert(p.contains("nearest_centroid") || p.contains("NearestCentroid"),
      "fused argmax expression missing:\n" + p.take(1200))
  }

  test("q62: no Window over DATA rows (one-task groups); control-frame window only") {
    val p = plan("q62_distribution_scalable")
    // prefix offsets are computed by a window over the per-(partition,
    // group) COUNT frame — every Window node must partition by the
    // control struct _g, never by the raw 3-value data key (which would
    // serialize each group onto one task)
    val winLines = p.linesIterator.filter(_.contains("Window [")).toList
    assert(winLines.nonEmpty, "expected the control-frame prefix window")
    winLines.foreach { l =>
      assert(l.contains("_g#"),
        "Window over data rows (not the control count frame):\n" + l)
      assert(!l.contains("l_extendedprice"),
        "Window orders by data columns — one-task groups are back:\n" + l)
    }
    assert(p.contains("rangepartitioning"),
      "expected a range repartition to own the total order:\n" + p.take(800))
    // the offsets must come back via a broadcast join, not a shuffle of
    // the data frame
    assert(p.contains("BroadcastHashJoin"),
      "offset attach is not a broadcast join:\n" + p.take(1200))
  }

  test("t27: curriculum ranking windows only the control frame, never docs") {
    // q62's invariant over the composed t27 plan: the global quartile
    // must come from DistributedRank's control-frame prefix window, not
    // an empty-PARTITION-BY window over the score rows (the single-task
    // global sort trap)
    val p = plan("t27_curriculum_buckets")
    val winLines = p.linesIterator.filter(_.contains("Window [")).toList
    assert(winLines.nonEmpty, "expected the control-frame prefix window")
    winLines.foreach { l =>
      assert(l.contains("_g#"),
        "Window over data rows (not the control count frame):\n" + l)
      assert(!l.contains("avg_nll"),
        "Window orders by the score column — the one-task global sort is back:\n" + l)
    }
    assert(p.contains("rangepartitioning"),
      "expected a range repartition to own the total order:\n" + p.take(800))
  }

  test("t28: every shuffle carries only fixed-width numeric columns — never grams") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
    val exchanges = planTree("t28_crossdoc_grams").collect {
      case e: ShuffleExchangeExec => e
    }
    assert(exchanges.nonEmpty, "expected shuffles in the t28 plan")
    exchanges.foreach { e =>
      val bad = e.output.filterNot(a => a.dataType == LongType ||
        a.dataType == IntegerType || a.dataType == DoubleType)
      assert(bad.isEmpty, "non-numeric columns cross a t28 shuffle: " +
        bad.map(a => s"${a.name}:${a.dataType}").mkString(", "))
    }
  }

  test("s13: the filtered query set broadcasts; candidates join by (label, bucket)") {
    val p = plan("s13_filtered_ann")
    assert(p.contains("BroadcastHashJoin"),
      "query set must broadcast against the corpus scan:\n" + p.take(800))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "filter not fused as equi-join keys — candidate generation is a cross product")
  }

  test("s14: candidate generation hash-joins on bucket; no raw cartesian") {
    // the brute-force ground truth is checkpointed away at build time, so
    // the surviving plan is the production path: broadcast query set,
    // bucket equi-joins, and 1-row scalar frames — never a non-broadcast
    // cartesian product
    val p = plan("s14_ann_recall")
    assert(p.contains("BroadcastHashJoin"),
      "bucket candidate joins must broadcast the query set:\n" + p.take(800))
    assert(!p.contains("CartesianProduct"),
      "non-broadcast cartesian in the recall harness:\n" + p.take(800))
  }

  test("s15: posting-list probe hash-joins on cell; no raw cartesian") {
    val p = plan("s15_ivf_recall")
    assert(p.contains("BroadcastHashJoin"),
      "probe list must broadcast against the assigned corpus:\n" + p.take(800))
    assert(!p.contains("CartesianProduct"),
      "non-broadcast cartesian in the IVF recall harness:\n" + p.take(800))
  }

  test("w09: one partitioned window; ranges never global-sort the grid") {
    import org.apache.spark.sql.execution.window.WindowExec
    val tree = planTree("w09_backfill_ranges")
    val windows = tree.collect { case w: WindowExec => w }
    assert(windows.size === 1, s"expected ONE islands window, got ${windows.size}")
    assert(windows.head.partitionSpec.nonEmpty,
      "islands window must partition by location (empty spec = one-task sort)")
  }

  test("t07: sketch and exact branches reuse ONE explode/count exchange") {
    // The corpus explode + (lang, word) count shuffle must be computed
    // once and shared (AQE ReusedExchange) — the r7 regression was this
    // exact frame materializing twice. Inspect only the final adaptive
    // plan; the initial-plan section still shows per-branch explodes.
    val p = finalPlan("t07_heavy_hitters").split("== Initial Plan ==")(0)
    assert(p.contains("ReusedExchange"),
      "explode/count exchange not reused across branches:\n" + p.take(1500))
    assert(p.linesIterator.count(_.contains("Generate explode")) == 1,
      "corpus must be exploded exactly once:\n" + p.take(1500))
  }

  test("q39: split keeps both aggregations hash-based (no Expand+sort-agg)") {
    val p = plan("q39_approx_sketches")
    assert(!p.contains("SortAggregate"),
      "sketch aggregation degraded to sort-based:\n" + p.take(1200))
    assert(p.contains("BroadcastHashJoin"), "group-key join not broadcast")
  }

  /** Plain (non-AQE) physical plan, so the node tree is traversable —
    * AdaptiveSparkPlanExec is a leaf, which hides exchanges from
    * TreeNode.collect.
    */
  private def planTree(name: String): org.apache.spark.sql.execution.SparkPlan = {
    val key = "spark.sql.adaptive.enabled"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan
    finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("d09: every shuffle carries only fixed-width numeric columns — never text") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val exchanges = planTree("d09_winnow_neardup").collect {
      case e: ShuffleExchangeExec => e
    }
    assert(exchanges.nonEmpty, "expected shuffles in the d09 plan")
    exchanges.foreach { e =>
      val bad = e.output.filterNot(a =>
        a.dataType == LongType || a.dataType == IntegerType)
      assert(bad.isEmpty, "non-numeric columns cross a d09 shuffle: " +
        bad.map(a => s"${a.name}:${a.dataType}").mkString(", "))
    }
  }

  test("t11: the repetition gate's scan prunes to (doc_id, text)") {
    val p = plan("t11_repetition")
    assert(!p.contains("n_chars") && !p.contains("source"),
      "map-only gate reads columns it never uses:\n" + p.take(600))
  }

  test("t23: model join broadcasts; one hash shuffle of narrow longs only") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.LongType
    val tree = planTree("t23_classifier_score")
    assert(tree.toString.contains("BroadcastHashJoin"),
      "weight table not broadcast — a D-row model must never shuffle the corpus")
    val hashEx = tree.collect {
      case e: ShuffleExchangeExec
        if e.outputPartitioning.toString.contains("hashpartitioning") => e
    }
    // exactly the per-doc reduce (the output orderBy adds a range
    // exchange, which is fine); its rows must be fixed-width partials,
    // never grams or text
    assert(hashEx.size === 1,
      s"expected one hash exchange (per-doc partial-aggregated reduce), " +
        s"found ${hashEx.size}")
    val bad = hashEx.head.output.filterNot(_.dataType == LongType)
    assert(bad.isEmpty, "non-long columns cross the t23 shuffle: " +
      bad.map(a => s"${a.name}:${a.dataType}").mkString(", "))
  }

  test("t24: representative + group-size ride ONE window over one hash exchange") {
    import org.apache.spark.sql.execution.window.WindowExec
    val tree = planTree("t24_leakage_free_split")
    val windows = tree.collect { case w: WindowExec => w }
    assert(windows.size === 1,
      s"rep and cnt must share one WindowExec, found ${windows.size}")
    assert(windows.head.partitionSpec.nonEmpty, "window must be partitioned")
  }

  test("t25: top-100 plans as TakeOrderedAndProject; lambda table broadcasts") {
    val p = plan("t25_dsir_resample")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must not global-sort the pool:\n" + p.take(600))
    assert(p.contains("BroadcastHashJoin"),
      "the O(B) lambda table must broadcast, never shuffle the corpus side")
  }

  test("t26: bigram adjacency is array-local — no Window over the corpus") {
    import org.apache.spark.sql.execution.window.WindowExec
    val tree = planTree("t26_bigram_nll")
    assert(tree.collect { case w: WindowExec => w }.isEmpty,
      "previous-word must come from the token array, not a window sort")
  }

  test("q64: both windows and the groupBy reuse ONE user_id hash exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val hashEx = planTree("q64_gaps_islands").collect {
      case e: ShuffleExchangeExec
        if e.outputPartitioning.toString.contains("hashpartitioning") => e
    }
    assert(hashEx.size === 1,
      s"expected one hash exchange (lag + cumsum windows + groupBy share " +
        s"the user_id clustering), found ${hashEx.size}")
  }

  test("q66: both SCD2 membership joins broadcast the change batch") {
    val p = plan("q66_scd2_merge")
    assert(p.contains("BroadcastHashJoin"),
      "change-batch membership join not broadcast:\n" + p.take(800))
    assert(!p.contains("SortMergeJoin"),
      "dimension shuffled for a membership join:\n" + p.take(800))
  }

  test("d12: benchmark n-gram set joins as a broadcast, never a shuffle join") {
    val p = plan("d12_decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      "benchmark fp set not broadcast:\n" + p.take(800))
    assert(!p.contains("SortMergeJoin"),
      "training corpus shuffled for the contamination join:\n" + p.take(800))
  }

  test("s09: both retrieval stages plan as TakeOrderedAndProject") {
    val p = plan("s09_two_stage_rerank")
    val n = "TakeOrderedAndProject".r.findAllIn(p).size
    assert(n >= 2, s"expected 2 top-k stages, found $n:\n" + p.take(800))
    assert(!p.contains("Sort ["), "global sort planned for a top-k stage")
  }

  test("d17: bloom probe filters grams map-side, before any shuffle") {
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val p = planTree("d17_bloom_decontaminate")
    val probes = p.collect {
      case f: FilterExec if f.condition.toString.contains("might_contain") => f
    }
    assert(probes.nonEmpty, "bloom might_contain probe missing:\n" + p.toString.take(800))
    // nothing below the probe may shuffle: a gram that misses the filter
    // must die in the scan stage, or the prefilter saves no traffic
    probes.foreach { f =>
      assert(f.collect { case s: ShuffleExchangeLike => s }.isEmpty,
        "training grams crossed an exchange before the bloom probe")
    }
  }

  test("q75: the snapshot diff joins narrow (key, hash) rows, never wide rows") {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.catalyst.plans.FullOuter
    val p = planTree("q75_snapshot_diff")
    val diffs = p.collect { case j: SortMergeJoinExec if j.joinType == FullOuter => j }
    assert(diffs.nonEmpty, "full-outer diff join missing:\n" + p.toString.take(800))
    diffs.foreach { j =>
      Seq(j.left, j.right).foreach { side =>
        assert(side.output.size <= 2,
          s"diff side shuffles ${side.output.size} columns — the row-width " +
            "independence of the reconciliation is gone: " + side.output.mkString(", "))
      }
    }
  }

  test("s07: probe explode runs on the broadcast query side, not per corpus row") {
    import org.apache.spark.sql.execution.GenerateExec
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    val p = planTree("s07_ann_multiprobe")
    val broadcasts = p.collect { case b: BroadcastExchangeExec => b }
    assert(broadcasts.nonEmpty, "query side not broadcast")
    val all = p.collect { case g: GenerateExec => g }
    val inBroadcast = broadcasts.flatMap(_.collect { case g: GenerateExec => g })
    assert(all.nonEmpty, "probe explode missing from the plan")
    assert(all.size === inBroadcast.size,
      "probe explode planned outside the broadcast side — the probe list " +
        "must be computed once on the 1-row query, never per candidate")
  }

  test("q79: the naive global running-total window re-plans distributed") {
    val p = plan("q79_running_total_global")
    assert(p.contains("GlobalRunningTotal"),
      "optimizer rule did not fire:\n" + p.take(800))
    assert(!p.contains("Window"),
      "single-task Window survived the rewrite:\n" + p.take(800))
    // exactly one exchange (the range repartition) — the appended column
    // preserves the child's partitioning, so the final ORDER BY must not
    // re-shuffle
    assert("Exchange".r.findAllIn(p).size === 1,
      "more than one exchange:\n" + p.take(1200))
  }

  test("t20: the pipeline's global cumsum is rewritten, the per-source rank is not") {
    val p = plan("t20_curation_pipeline")
    assert(p.contains("GlobalRunningTotal"),
      "stage-4 cumsum not rewritten:\n" + p.take(800))
    // the stage-3 ranking window is PARTITIONED (by source) — it must
    // keep the builtin Window operator
    assert(p.contains("Window"),
      "partitioned ranking window missing:\n" + p.take(800))
  }

  test("t17/t19/t21/t22: global cumsum rides the rewritten exec path — no cache, no helper") {
    // t21 exercises the running-COUNT branch over a hash-permutation
    // key; t22 the running-SUM branch over a derived ranking key —
    // together with t17/t19's doc_id orders they cover both rule arms
    // on both natural and computed order attributes.
    Seq("t17_sequence_pack", "t19_shard_plan",
        "t21_corpus_shuffle", "t22_token_budget").foreach { name =>
      val p = plan(name)
      assert(p.contains("GlobalRunningTotal"),
        s"$name: optimizer rule did not fire:\n" + p.take(1000))
      assert(!p.contains("InMemoryTableScan"),
        s"$name: a cache survives in the plan (helper path?):\n" + p.take(1000))
    }
  }

  test("q62/t17/t19: range exchange follows spark.sql.shuffle.partitions") {
    // the round-8 finding: a pinned nParts=32 would make the range
    // exchange ~3 TB/task at 100x scale. The exchange must now size from
    // session config — assert with a distinctive partition count.
    val orig = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "17")
      Seq("q62_distribution_scalable", "t17_sequence_pack",
          "t19_shard_plan").foreach { name =>
        val p = plan(name)
        val rangeLines = p.linesIterator
          .filter(_.contains("rangepartitioning")).toList
        assert(rangeLines.nonEmpty,
          s"$name: no range exchange in plan:\n" + p.take(1000))
        assert(rangeLines.exists(_.contains(", 17)")),
          s"$name: range exchange ignores spark.sql.shuffle.partitions:\n" +
            rangeLines.mkString("\n"))
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", orig)
  }

  test("whole registry: no single-task window, no cartesian product") {
    // the two plan shapes that cannot survive 100 TB: a WindowExec with
    // an empty partition spec serializes the WHOLE row stream onto one
    // task (the global window trap — q62/q79 exist precisely to avoid
    // it; single-partition exchanges of PARTIAL-AGGREGATE frames are
    // fine and excluded — they carry O(partitions) rows, not the data),
    // and a CartesianProduct explodes row counts (the intended theta
    // join q49 plans as a dimension-bounded BroadcastNestedLoopJoin).
    // Asserted over EVERY registered query's physical plan.
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val tree = planTree(name)
      val globalWindows = tree.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w }
      val cartesian = tree.collect { case c: CartesianProductExec => c }
      val bad = (if (globalWindows.nonEmpty) Seq("global WindowExec") else Nil) ++
        (if (cartesian.nonEmpty) Seq("CartesianProductExec") else Nil)
      if (bad.nonEmpty) Some(s"$name: ${bad.mkString(", ")}") else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("q79 rule guards: nullable operands keep the builtin window") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftExtensions.register(spark)
    val w = Window.orderBy($"k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // nullable long value: Sum skips nulls (leading nulls -> NULL cum),
    // which the distributed accumulate does not reproduce — must NOT fire
    val df = Seq((1L, Some(2L)), (2L, None), (3L, Some(5L)))
      .toDF("k", "v")
      .withColumn("cum", sum($"v").over(w))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Window"), "rule fired on a nullable operand:\n" + p)
    assert(!p.contains("GlobalRunningTotal"))
    // and the rewrite-eligible shape computes identically to the builtin
    val nn = Seq((3L, 7L), (1L, 2L), (2L, 5L)).toDF("k", "v")
      .withColumn("cum", sum($"v").over(w))
      .orderBy($"k")
    assert(nn.queryExecution.executedPlan.toString
      .contains("GlobalRunningTotal"))
    assert(nn.as[(Long, Long, Long)].collect().toSeq ===
      Seq((1L, 2L, 2L), (2L, 5L, 7L), (3L, 7L, 14L)))
    // ASC NULLS LAST over a NULLABLE key must NOT rewrite: the exec
    // sorts plain ASC (nulls first), which would move null-key rows to
    // a different accumulation position than the builtin window
    val nl = Seq((Some(1L), 2L), (None, 5L), (Some(3L), 7L))
      .toDF("k", "v")
      .withColumn("cum", sum($"v").over(
        Window.orderBy($"k".asc_nulls_last)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(!nl.queryExecution.executedPlan.toString
      .contains("GlobalRunningTotal"),
      "rule fired on ASC NULLS LAST over a nullable key")
    // running COUNT rewrites too (no null caveat — count skips nothing)
    val rc = Seq((30L, "c"), (10L, "a"), (20L, "b")).toDF("k", "s")
      .withColumn("pos", count(lit(1)).over(w))
      .orderBy($"k")
    assert(rc.queryExecution.executedPlan.toString
      .contains("GlobalRunningTotal"),
      "running count not rewritten:\n" + rc.queryExecution.executedPlan)
    assert(rc.select($"k", $"pos").as[(Long, Long)].collect().toSeq ===
      Seq((10L, 1L), (20L, 2L), (30L, 3L)))
  }

  test("q96: the optimizer injects a bloom-filter runtime filter on the fact side") {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val df = operators.Nested.bloomFilterFrame(spark, sf)
    val opt = df.queryExecution.optimizedPlan
    val exprs = opt.collect { case p => p.expressions }.flatten
    // the probe: might_contain(<bloom>, xxhash64(l_orderkey)) guards the
    // fact scan — rows that cannot join never reach the shuffle
    assert(exprs.exists(_.exists(_.isInstanceOf[BloomFilterMightContain])),
      "no BloomFilterMightContain in the optimized plan:\n" +
        opt.toString.take(1200))
    // the build: a BloomFilterAggregate over the FILTERED dim's join
    // keys — it lives inside the probe's scalar subquery, so descend
    // into subquery plans explicitly
    import org.apache.spark.sql.catalyst.expressions.ScalarSubquery
    val subExprs = exprs
      .flatMap(_.collect { case ss: ScalarSubquery => ss.plan })
      .flatMap(p => p.collect { case n => n.expressions }.flatten)
    assert(subExprs.exists(_.exists(_.isInstanceOf[BloomFilterAggregate])),
      "no BloomFilterAggregate in the probe's subquery:\n" +
        opt.toString.take(1200))
    // and the filter is conservative — the result is the plain join+agg
    val rows = df.collect()
    assert(rows.nonEmpty, "bloom-filtered join returned nothing")
  }

  test("q97: NOT IN plans the O(M) null-aware anti join, not a nested loop") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}
    // the static plan: NAAJ flag set, nested loop absent (the naive
    // evaluation of the three-valued contract)
    val planted = operators.Relational.naajFrame(spark, sf, planted = true)
    val static = planted.queryExecution.sparkPlan
    assert(static.collect {
      case j: BroadcastHashJoinExec if j.isNullAwareAntiJoin => j }.nonEmpty,
      "NOT IN did not plan isNullAwareAntiJoin=true:\n" +
        static.toString.take(1200))
    assert(static.collect {
      case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      "NOT IN fell back to the O(M*N) nested loop")
    // runtime bonus: once the broadcast build materializes WITH a null,
    // AQE's eliminateSingleColumnNullAwareAntiJoin knows every probe is
    // UNKNOWN and replaces the whole join with EmptyRelation — the
    // 100 TB probe scan never runs at all
    assert(planted.collect().isEmpty)
    assert(planted.queryExecution.executedPlan.toString
      .contains("EmptyRelation"),
      "planted-null NAAJ did not short-circuit to EmptyRelation:\n" +
        planted.queryExecution.executedPlan.toString.take(1200))
    // and the null-free twin executes THROUGH the hash-probe NAAJ
    val clean = operators.Relational.naajFrame(spark, sf, planted = false)
    assert(clean.collect().nonEmpty, "null-free NOT IN returned nothing")
    assert(clean.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin") &&
      !clean.queryExecution.executedPlan.toString.contains("EmptyRelation"),
      "null-free NAAJ did not execute as a broadcast hash probe")
  }

  test("q101: both pagination methods plan bounded heaps; pages identical") {
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    val (offsetPage, keysetPage) =
      operators.Relational.paginationFrames(spark, sf)
    // offset: ONE TakeOrderedAndProject carrying limit+offset — a
    // per-partition heap of 60, never a global sort (but the heap
    // grows with page DEPTH — the reason deep pagination melts down)
    val off = offsetPage.queryExecution.executedPlan.collect {
      case t: TakeOrderedAndProjectExec => t }
    assert(off.nonEmpty && off.head.offset === 40,
      "offset page did not plan TakeOrderedAndProject with offset:\n" +
        offsetPage.queryExecution.executedPlan.toString.take(800))
    assert(off.head.limit === 60, s"heap should hold offset+limit rows")
    // keyset: the re-anchored filter keeps the heap at O(pageSize)
    // at ANY depth (string match — the broadcast bound puts this plan
    // under an AQE root, which a typed collect cannot cross)
    val ksPlan = keysetPage.queryExecution.executedPlan.toString
    assert(ksPlan.contains("TakeOrderedAndProject(limit=20, orderBy"),
      "keyset page did not plan an O(pageSize) heap:\n" + ksPlan.take(800))
    // and no global Sort node anywhere in either plan
    Seq(offsetPage, keysetPage).foreach { df =>
      assert(!df.queryExecution.executedPlan.toString.contains("Sort ["),
        "pagination fell back to a global sort")
    }
    // the two methods return the IDENTICAL page
    val a = offsetPage.collect().map(_.toSeq).toSeq
    val b = keysetPage.collect().map(_.toSeq).toSeq
    assert(a === b && a.length === 20)
  }

  test("q11: rank<=k filter plans WindowGroupLimit below the full window") {
    // InferWindowGroupLimit inserts per-PARTITION top-k selection ahead
    // of the shuffle + final window: each map task keeps at most k rows
    // per group, so the window never materializes a full 100 TB group
    // just to throw away rank > 3
    val p = finalPlan("q11_window_rank")
    val n = "WindowGroupLimit".r.findAllIn(p).size
    assert(n >= 2,
      s"expected map-side (Partial) AND reduce-side (Final) WindowGroupLimit, got $n:\n" +
        p.take(1200))
    assert(p.contains("Partial") && p.contains("Final"),
      "group limits not split across the shuffle:\n" + p.take(1200))
  }
}
