package graft.operators

import graft.{Dets, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Dets._

/** Advanced aggregation surface: rollup / cube / grouping sets, pivot,
  * exact-decimal moment statistics, HAVING, subquery predicates, and
  * approximate sketches.
  *
  * Scale notes: rollup/cube plan as a single Expand + hash aggregate —
  * one shuffle regardless of grouping-set count. Moment statistics
  * (stddev/corr) are re-derived from exact decimal power sums instead of
  * float merge formulas: the result is bit-identical across partition
  * counts — i.e., re-running on 10 vs 1000 executors gives the same
  * bytes, which float stddev does not. Sketch aggs (HLL, KLL) are
  * mergeable partial aggregates: constant-size state per partition, the
  * only aggregation family that stays cheap on 100 TB group-bys.
  */
object AdvancedAggs {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_rollup" -> { (s, d) =>
      import s.implicits._
      T.lineitem(s, d)
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"), dsum($"l_quantity").as("sum_qty"),
             grouping_id().as("gid"))
        .orderBy($"gid", $"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    },

    "q32_cube" -> { (s, d) =>
      import s.implicits._
      T.orders(s, d)
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"),
             grouping_id().as("gid"))
        .orderBy($"gid", $"o_orderstatus".asc_nulls_first,
                 $"o_orderpriority".asc_nulls_first)
    },

    "q33_grouping_sets" -> { (s, d) =>
      import s.implicits._
      T.lineitem(s, d)
        .groupingSets(
          Seq(Seq($"l_returnflag"), Seq($"l_linestatus")),
          $"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"), dsum($"l_extendedprice").as("sum_price"),
             grouping_id().as("gid"))
        .orderBy($"gid", $"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    },

    // Pivot: per linestatus, quantity sums pivoted by return flag.
    "q34_pivot" -> { (s, d) =>
      import s.implicits._
      T.lineitem(s, d)
        .groupBy($"l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(dec($"l_quantity")).cast("double"))
        .orderBy($"l_linestatus")
    },

    // Unpivot (melt) — q34's inverse and the wide→long reshape every
    // feature table eventually needs (metrics stored one-column-per-
    // measure must melt to (entity, measure, value) rows before a
    // generic aggregation/quality pass can treat measures uniformly).
    // Spark's native unpivot plans a map-only Expand — a row multiplier
    // with NO shuffle, so the 100 TB reshape is one scan; values share
    // one DOUBLE column (unpivot requires a common type — the exact
    // reason the long form exists).
    "q94_unpivot" -> { (s, d) =>
      import s.implicits._
      T.lineitem(s, d)
        .filter($"l_orderkey" % 50 === 0)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".as("quantity"),
          $"l_extendedprice".as("extendedprice"),
          $"l_discount".as("discount"),
          $"l_tax".as("tax"))
        .unpivot(Array($"l_orderkey", $"l_linenumber"),
          Array($"quantity", $"extendedprice", $"discount", $"tax"),
          "measure", "value")
        .orderBy($"l_orderkey", $"l_linenumber", $"measure")
    },

    // Moment stats from exact decimal power sums: deterministic stddev /
    // variance / correlation (bit-identical at any partition count).
    "q35_stats_moments" -> { (s, d) =>
      import s.implicits._
      val x = dec($"l_extendedprice")
      val y = dec($"l_quantity")
      T.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(x).as("sx"), sum(y).as("sy"),
          sum((x * x).cast("decimal(38,8)")).as("sxx"),
          sum((y * y).cast("decimal(38,8)")).as("syy"),
          sum((x * y).cast("decimal(38,8)")).as("sxy"))
        .select($"l_returnflag", $"n",
          ($"sx".cast("double") / $"n").as("mean_price"),
          round(sqrt(($"sxx".cast("double") - $"sx".cast("double") * $"sx".cast("double") / $"n")
            / ($"n" - 1)), 6).as("stddev_price"),
          round((($"sxy".cast("double") - $"sx".cast("double") * $"sy".cast("double") / $"n"))
            / (sqrt($"sxx".cast("double") - $"sx".cast("double") * $"sx".cast("double") / $"n")
             * sqrt($"syy".cast("double") - $"sy".cast("double") * $"sy".cast("double") / $"n")), 6)
            .as("corr_price_qty"))
        .orderBy($"l_returnflag")
    },

    // Exact interpolated percentiles (Spark `percentile` == DuckDB
    // quantile_cont: sorted-order interpolation, deterministic).
    "q36_percentiles" -> { (s, d) =>
      import s.implicits._
      T.lineitem(s, d)
        .groupBy($"l_returnflag")
        // one percentile(array(...)) call = one sorted-counts buffer per
        // group instead of four
        .agg(expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.9))")
          .as("ps"))
        .select($"l_returnflag",
          element_at($"ps", 1).as("p25"), element_at($"ps", 2).as("p50"),
          element_at($"ps", 3).as("p75"), element_at($"ps", 4).as("p90"))
        .orderBy($"l_returnflag")
    },

    // HAVING: post-aggregation predicate.
    "q37_having" -> { (s, d) =>
      import s.implicits._
      T.orders(s, d)
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("total"))
        .filter($"n_orders" >= 25)
        .orderBy($"o_custkey")
    },

    // Equal-width histogram with IN-PLAN bounds: global min/max via one
    // tiny aggregate broadcast back to the scan (no driver scalar — the
    // whole thing stays one lazy DAG), bin by identical IEEE arithmetic
    // on both engines, then a 10-group count/sum. Two passes over the
    // column at 100 TB (bounds + binning), both full scans with partial
    // aggregation — the standard profile/dashboard primitive.
    "q65_histogram" -> { (s, d) =>
      import s.implicits._
      val li = T.lineitem(s, d)
      val bounds = li.agg(min($"l_extendedprice").as("lo"),
                          max($"l_extendedprice").as("hi"))
      li.crossJoin(broadcast(bounds))
        .withColumn("bin", least(lit(9L),
          floor(($"l_extendedprice" - $"lo") * 10.0 / ($"hi" - $"lo")))
          .cast("int"))
        .groupBy($"bin")
        .agg(count(lit(1)).as("n"), dsum($"l_extendedprice").as("total"))
        .orderBy($"bin")
    },

    // IN / scalar subquery predicates via the SQL API.
    "q38_subqueries" -> { (s, d) =>
      T.orders(s, d).createOrReplaceTempView("v_orders")
      T.customer(s, d).createOrReplaceTempView("v_customer")
      s.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice
          |FROM v_orders
          |WHERE o_custkey IN (SELECT c_custkey FROM v_customer WHERE c_acctbal > 9000)
          |  AND o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM v_orders)
          |ORDER BY o_orderkey""".stripMargin)
    },

    // Correlated scalar subquery: each order vs its customer's own average.
    "q52_correlated_subquery" -> { (s, d) =>
      T.orders(s, d).createOrReplaceTempView("v_orders2")
      s.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice
          |FROM v_orders2 o
          |WHERE o_totalprice > 1.8 *
          |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
          |          / COUNT(*)
          |   FROM v_orders2 i WHERE i.o_custkey = o.o_custkey)
          |ORDER BY o_orderkey""".stripMargin)
    },

    // FILTER clause on aggregates (conditional aggregation, SQL form).
    // Grouped string aggregation (LISTAGG / string_agg): the reporting
    // concatenation. Deterministic on both engines by sorting the
    // collected set first — an unordered string_agg is partition-order
    // nondeterministic on ANY engine. The shuffle carries the (small)
    // distinct name set per group, not concatenated strings.
    "q73_string_agg" -> { (s, d) =>
      import s.implicits._
      T.nation(s, d)
        .groupBy($"n_regionkey")
        .agg(
          concat_ws(",", array_sort(collect_set($"n_name"))).as("nations"),
          count(lit(1)).as("n_nations"))
        .orderBy($"n_regionkey")
    },

    "q53_agg_filter_clause" -> { (s, d) =>
      T.lineitem(s, d).createOrReplaceTempView("v_lineitem2")
      s.sql(
        """SELECT l_returnflag,
          |  COUNT(*) AS n_all,
          |  COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
          |       FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_f
          |FROM v_lineitem2
          |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    },

    // Transcendental scalar functions. libm (DuckDB) and java.lang.Math
    // (Spark) differ in the last ulp, so oracle-checked outputs are
    // rounded to 6 dp — ulp noise (~1e-15 relative) cannot move a 1e-6
    // rounding boundary. Full-precision accuracy is asserted separately
    // in OperatorSpec, which recomputes the UNROUNDED expressions from
    // lineitem and checks identities at 1e-12.
    "q54_scalar_transcendental" -> { (s, d) =>
      import s.implicits._
      T.lineitem(s, d)
        .filter($"l_orderkey" % 200 === 0)
        .select($"l_orderkey", $"l_linenumber",
          round(exp($"l_discount"), 6).as("e_disc"),
          round(log($"l_extendedprice"), 6).as("ln_price"),
          round(log10($"l_extendedprice"), 6).as("log10_price"),
          round(sin($"l_quantity"), 6).as("sin_qty"),
          round(cos($"l_quantity"), 6).as("cos_qty"),
          round(atan2($"l_quantity", $"l_extendedprice"), 6).as("angle"),
          round(sinh($"l_discount"), 6).as("sinh_disc"))
        .orderBy($"l_orderkey", $"l_linenumber")
    },

    // Custom TypedImperativeAggregate: deterministic bottom-k (KMV)
    // sketch over the portable hash — O(k) mergeable state, same result
    // at any parallelism, and (unlike HLL) oracle-reproducible.
    "q43_bottomk_sketch" -> { (s, d) =>
      import s.implicits._
      import graft.functions.BottomKAgg.bottom_k
      T.documents(s, d)
        .groupBy($"lang")
        .agg(bottom_k(Dets.phash($"text"), 8).as("sketch"),
             count(lit(1)).as("n_docs"))
        // CSV-joined: the sketch is an array, which the driver's row-sort
        // can't order; integer→string rendering is engine-identical
        .select($"lang",
          expr("array_join(transform(sketch, x -> CAST(x AS STRING)), ',')")
            .as("sketch_csv"),
          $"n_docs")
        .orderBy($"lang")
    },

    // Approximate sketches: HLL distinct + KLL-ish percentile. Raw sketch
    // estimates are engine-specific, so the oracle-checked outputs are the
    // exact values plus error-band FLAGS: the oracle asserts TRUE, i.e.
    // "the sketch landed within its documented error bound". HLL default
    // rsd 0.05 -> 10% band; approx_percentile's accuracy parameter bounds
    // RANK error (1/accuracy), not value error, so the median flag checks
    // the estimate lies between the exact percentiles at 0.5 +- 2/accuracy
    // (doubled to absorb the discrete-rank-to-interpolated-grid gap) —
    // a value-relative band would flake on value-skewed distributions.
    "q39_approx_sketches" -> { (s, d) =>
      import s.implicits._
      // exact distincts and sketch aggs computed in SEPARATE aggregations:
      // multi-column countDistinct plans an Expand (row multiplication)
      // and, combined with object-hash sketch aggregates, degrades the
      // whole agg to sort-based — split + broadcast-join on the 3-row
      // group key keeps both sides hash-aggregated
      val exact = T.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(countDistinct($"l_orderkey").as("n_orders"),
             countDistinct($"l_partkey").as("n_parts"))
      val sketches = T.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          approx_count_distinct($"l_orderkey").as("a_orders"),
          approx_count_distinct($"l_partkey").as("a_parts"),
          expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("a_median"),
          // one percentile buffer for the rank band + the exact median
          expr("percentile(l_extendedprice, array(0.498D, 0.5D, 0.502D))")
            .as("pcts"))
      exact.join(broadcast(sketches), Seq("l_returnflag"))
        .select($"l_returnflag", $"n_orders", $"n_parts",
          element_at($"pcts", 2).as("x_median"),
          (abs($"a_orders" - $"n_orders") <= $"n_orders" * 0.1).as("hll_orders_ok"),
          (abs($"a_parts" - $"n_parts") <= $"n_parts" * 0.1).as("hll_parts_ok"),
          ($"a_median" >= element_at($"pcts", 1) &&
           $"a_median" <= element_at($"pcts", 3)).as("median_ok"))
        .orderBy($"l_returnflag")
    },

    // Re-aggregatable distincts — the dashboard/cube pattern HLL
    // sketches exist for: per-day sketches are built once (binary
    // states a real deployment WRITES to its daily rollup table), and
    // any coarser rollup — weekly here — merges sketch states instead
    // of rescanning raw events: count-distinct becomes re-aggregatable
    // like a sum, which is what makes 100 TB dashboard refreshes
    // incremental. Spark's DataSketches builtins (hll_sketch_agg /
    // hll_union_agg / hll_sketch_estimate); sketch bytes are
    // engine-specific, so the oracle checks exact values plus a
    // q39-style error-band flag (default lgK=12 → rsd ~1.6%, the 10%
    // band is >6σ and the estimate is deterministic per dataset).
    "q77_hll_union" -> { (s, d) =>
      import s.implicits._
      val ev = T.events(s, d).withColumn("day", date_trunc("day", $"ts"))
      val daily = ev.groupBy($"day")
        .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      val weekly = daily
        .withColumn("week", date_trunc("week", $"day"))
        .groupBy($"week")
        .agg(count(lit(1)).as("n_days"),
             expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      val exact = ev.withColumn("week", date_trunc("week", $"day"))
        .groupBy($"week").agg(countDistinct($"user_id").as("exact_users"))
      exact.join(broadcast(weekly), Seq("week"))
        .select($"week", $"n_days", $"exact_users",
          (abs($"est" - $"exact_users") <= $"exact_users" * 0.1).as("est_ok"))
        .orderBy($"week")
    },

    // Incremental aggregate maintenance — the materialized-view delta
    // fold: a stored per-key partial-aggregate state absorbs a new
    // batch WITHOUT re-scanning history. Only the batch is re-
    // aggregated (its partials shuffle); the state joins by key — with
    // the state bucketed/pre-partitioned on the key (the layout a real
    // MV store keeps), only delta partials move at 100 TB. Exactness:
    // counts and DECIMAL(18,4) sums are associative, so fold(state,
    // delta) == full recompute — which is precisely what the oracle
    // checks (it recomputes from scratch; the query folds).
    "q80_incremental_agg" -> { (s, d) =>
      import s.implicits._
      val o = T.orders(s, d)
      val hist  = o.filter($"o_orderkey" % 5 =!= 0) // the stored MV's input
      val delta = o.filter($"o_orderkey" % 5 === 0) // the new batch
      def partials(df: DataFrame) = df.groupBy($"o_custkey")
        .agg(count(lit(1)).as("n"),
             sum($"o_totalprice".cast("decimal(18,4)")).as("t"))
      partials(hist).as("s")
        .join(partials(delta).as("b"), Seq("o_custkey"), "full_outer")
        .select($"o_custkey",
          (coalesce(col("s.n"), lit(0L)) + coalesce(col("b.n"), lit(0L)))
            .as("n_orders"),
          (coalesce(col("s.t"), lit(0).cast("decimal(18,4)")) +
           coalesce(col("b.t"), lit(0).cast("decimal(18,4)")))
            .cast("double").as("total"),
          col("b.n").isNotNull.as("updated"))
        .orderBy($"o_custkey")
    },

    // Re-aggregatable QUANTILE rollup — q77's mergeability story for
    // percentiles: each day folds `value` into a fixed-64-bin
    // equi-width histogram (global [lo, hi] is one broadcast row);
    // weekly percentiles come from MERGED day sketches, and merging is
    // integer bin-count addition — associative, so the same per-day
    // partials roll up to week/month/all-time without re-touching
    // facts. At 100 TB: one fact scan builds the partials, every
    // rollup after that is arithmetic on (period × 64) integer rows.
    // All outputs are integer bins or closed-form bin arithmetic — no
    // FP comparison anywhere, so engine parity is exact; the bin-width
    // error bound vs the true percentile is pinned in OperatorSpec.
    "q78_quantile_rollup" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val B = 64
      val ev = T.events(s, d).withColumn("day", date_trunc("day", $"ts"))
      val bounds = ev.agg(min($"value").as("lo"), max($"value").as("hi"))
      // ONE fact scan: daily partials eagerly materialized (the qb and
      // nd branches both read this frame in one job, and a lazy cache
      // races there — each branch re-scanned the facts), then every
      // rollup below is arithmetic on the (day × 64) frame; both
      // quantiles come from a single conditional aggregate over the
      // cumulative frame
      val daily = ev.crossJoin(broadcast(bounds))
        .withColumn("bin", least(lit(B - 1),
          floor(($"value" - $"lo") * B / ($"hi" - $"lo"))).cast("int"))
        .groupBy($"day", $"bin").agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val weekly = daily
        .withColumn("week", date_trunc("week", $"day"))
        .groupBy($"week", $"bin")
        .agg(sum($"n").as("n")) // sketch merge = integer addition
      val wk = Window.partitionBy($"week").orderBy($"bin")
      val qb = weekly
        .withColumn("cum", sum($"n").over(wk))
        .withColumn("tot", sum($"n").over(Window.partitionBy($"week")))
        .groupBy($"week")
        .agg(min(when($"cum" >= expr("CAST(ceil(tot * 0.5) AS BIGINT)"),
               $"bin")).as("p50_bin"),
             min(when($"cum" >= expr("CAST(ceil(tot * 0.9) AS BIGINT)"),
               $"bin")).as("p90_bin"))
      val nd = daily
        .groupBy(date_trunc("week", $"day").as("week"))
        .agg(countDistinct($"day").as("n_days"), sum($"n").as("n_events"))
      qb.join(nd, Seq("week"))
        .crossJoin(broadcast(bounds))
        .select($"week", $"n_days", $"n_events", $"p50_bin", $"p90_bin",
          ($"lo" + ($"p50_bin" + 0.5) * ($"hi" - $"lo") / B).as("p50_est"),
          ($"lo" + ($"p90_bin" + 0.5) * ($"hi" - $"lo") / B).as("p90_est"))
        .orderBy($"week")
    },

    // KMV set algebra — distinct-count union/intersection across
    // segments WITHOUT joining fact scans: each segment folds to an
    // O(k) bottom-k sketch (one shuffle of 2 KB states), merging two
    // sketches is array concat+sort+slice on a 3-row frame, and the
    // estimators are closed-form: D_union = (k-1)·M / kth_min (M = the
    // 2^60 phash space), D_inter = D_union · ρ where ρ = the fraction
    // of the merged sketch present in BOTH inputs (membership via the
    // input sketches is sound: a merged bottom-k value from A must be
    // in A's own bottom-k). At 100 TB this replaces a fact×fact
    // distinct join with constant-size state; segment-pair estimates
    // compose from ONE sketch per segment, so S segments cost S scans'
    // worth of sketching, not S² joins. The sketch internals (kth_min,
    // ρ numerator) are hash-deterministic and oracle-checked EXACTLY;
    // estimator accuracy is asserted as q39-style error-band flags
    // (k=256 → ~6% σ for union; bands at 20%/35% are >3σ and the
    // values are deterministic per dataset, so the flags cannot flake).
    "q74_kmv_set_algebra" -> { (s, d) =>
      import s.implicits._
      import graft.functions.BottomKAgg.bottom_k
      val K = 256
      // orderkey universe: an order appears under a flag iff some line
      // item carries it, so segments genuinely partially overlap
      // (J ≈ 0.6) — the regime the intersection estimator exists for
      val pk = Dets.phash($"l_orderkey".cast("string"))
      // materialize the distinct (seg, key-hash) frame ONCE: its four
      // consumers below (sketch ×2 broadcast sides, per-seg counts ×2
      // broadcast sides, self-join ×2) carry different downstream
      // projections, so ReuseExchange cannot collapse them and each
      // broadcast would re-run the fact scan + distinct — six fact
      // scans per execution (the s12 codebook lesson, same shape).
      // The frame is narrow (seg + one long) and bounded by the
      // distinct key count; localCheckpoint distributes it across
      // executors MEMORY_AND_DISK, so the materialization survives
      // the same at 100 TB — one fact scan, period.
      val dpk = T.lineitem(s, d)
        .select($"l_returnflag".as("seg"), pk.as("pk")).distinct()
        .localCheckpoint()
      // ONE aggregation pass computes both the sketch and the exact
      // per-segment count (they share the (seg) grouping — running
      // them as two groupBys paid a second full pass over dpk and a
      // second checkpoint job); the result is an S-row frame each
      // broadcast reads materialized
      val stats = dpk.groupBy($"seg")
        .agg(bottom_k($"pk", K).as("sk"), count(lit(1)).as("n"))
        .localCheckpoint()
      // exact pairwise intersections: equi-self-join on the key hash.
      // (A groupBy-pk collect_list pair generator was measured and
      // rejected: it plans as ObjectHashAggregate — off codegen — and
      // reads 0.2-0.4 s SLOWER than the sort-merge join of two long
      // columns at sf0.1.)
      val inter = dpk.as("x").join(dpk.as("y"), Seq("pk"))
        .filter(col("x.seg") < col("y.seg"))
        .groupBy(col("x.seg").as("seg_a"), col("y.seg").as("seg_b"))
        .agg(count(lit(1)).as("n_inter"))
      inter
        .join(broadcast(stats.select($"seg".as("seg_a"), $"n".as("n_a"),
          $"sk".as("sk_a"))), Seq("seg_a"))
        .join(broadcast(stats.select($"seg".as("seg_b"), $"n".as("n_b"),
          $"sk".as("sk_b"))), Seq("seg_b"))
        .withColumn("n_union", $"n_a" + $"n_b" - $"n_inter")
        .withColumn("mrg",
          expr(s"slice(array_sort(array_distinct(concat(sk_a, sk_b))), 1, $K)"))
        .withColumn("kth_min",
          expr(s"IF(size(mrg) >= $K, element_at(mrg, $K), CAST(NULL AS BIGINT))"))
        .withColumn("rho_k",
          expr("CAST(size(array_intersect(array_intersect(mrg, sk_a), sk_b)) AS BIGINT)"))
        .withColumn("est_union", expr(
          s"IF(kth_min IS NULL, CAST(size(mrg) AS DOUBLE), " +
          s"CAST(${K - 1} AS DOUBLE) * 1152921504606846976D / kth_min)"))
        // ρ's denominator is the MERGED sketch size: below k the sketch
        // is the complete set, so est_union is exact and est_inter
        // collapses to the exact intersection — no small-corpus bias
        .withColumn("est_inter",
          expr("est_union * rho_k / CAST(size(mrg) AS DOUBLE)"))
        .select($"seg_a", $"seg_b", $"n_union", $"n_inter", $"kth_min", $"rho_k",
          (abs($"est_union" - $"n_union") <= $"n_union" * 0.2).as("union_ok"),
          (abs($"est_inter" - $"n_inter") <= $"n_inter" * 0.35).as("inter_ok"))
        .orderBy($"seg_a", $"seg_b")
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q31_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CASE WHEN l_returnflag IS NULL AND l_linestatus IS NULL THEN 3
        |       WHEN l_linestatus IS NULL THEN 1 ELSE 0 END AS gid
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q32_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
        |  CASE WHEN o_orderstatus IS NULL AND o_orderpriority IS NULL THEN 3
        |       WHEN o_orderstatus IS NULL THEN 2
        |       WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END AS gid
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q33_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  CASE WHEN l_returnflag IS NOT NULL THEN 1 ELSE 2 END AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q34_pivot" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CAST(CASE WHEN l_returnflag = 'A' THEN l_quantity END
        |    AS DECIMAL(18,4))) AS DOUBLE) AS "A",
        |  CAST(SUM(CAST(CASE WHEN l_returnflag = 'N' THEN l_quantity END
        |    AS DECIMAL(18,4))) AS DOUBLE) AS "N",
        |  CAST(SUM(CAST(CASE WHEN l_returnflag = 'R' THEN l_quantity END
        |    AS DECIMAL(18,4))) AS DOUBLE) AS "R"
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    // q94: DuckDB's UNPIVOT — an independent engine's native melt must
    // produce the identical long form (values are exact doubles moved,
    // never computed, so the hash compare is safe).
    "q94_unpivot" ->
      """SELECT l_orderkey, l_linenumber, measure, value FROM (
        |  UNPIVOT (
        |    SELECT l_orderkey, l_linenumber,
        |      l_quantity AS quantity,
        |      l_extendedprice AS extendedprice,
        |      l_discount AS discount,
        |      l_tax AS tax
        |    FROM lineitem WHERE l_orderkey % 50 = 0)
        |  ON quantity, extendedprice, discount, tax
        |  INTO NAME measure VALUE value)
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin,

    "q35_stats_moments" ->
      """WITH m AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS sx,
        |    SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sy,
        |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(19,4))
        |        * CAST(l_extendedprice AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS sxx,
        |    SUM(CAST(CAST(l_quantity AS DECIMAL(19,4))
        |        * CAST(l_quantity AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS syy,
        |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(19,4))
        |        * CAST(l_quantity AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  CAST(sx AS DOUBLE) / n AS mean_price,
        |  round(sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
        |       / (n - 1)), 6) AS stddev_price,
        |  round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
        |  / (sqrt(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
        |   * sqrt(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)), 6)
        |    AS corr_price_qty
        |FROM m ORDER BY l_returnflag""".stripMargin,

    "q36_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.25) AS p25,
        |  quantile_cont(l_extendedprice, 0.5) AS p50,
        |  quantile_cont(l_extendedprice, 0.75) AS p75,
        |  quantile_cont(l_extendedprice, 0.9) AS p90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q37_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 25
        |ORDER BY o_custkey""".stripMargin,

    "q65_histogram" ->
      """WITH bounds AS (
        |  SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
        |  FROM lineitem)
        |SELECT CAST(least(9, floor((l_extendedprice - lo) * 10.0 / (hi - lo)))
        |            AS INT) AS bin,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM lineitem, bounds
        |GROUP BY 1 ORDER BY bin""".stripMargin,

    "q38_subqueries" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        |  AND o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    "q52_correlated_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > 1.8 *
        |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |          / COUNT(*)
        |   FROM orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q73_string_agg" ->
      """SELECT n_regionkey,
        |  string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS nations,
        |  COUNT(*) AS n_nations
        |FROM nation
        |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,

    "q53_agg_filter_clause" ->
      """SELECT l_returnflag,
        |  COUNT(*) AS n_all,
        |  COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
        |       FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_f
        |FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q54_scalar_transcendental" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(exp(l_discount), 6) AS e_disc,
        |  round(ln(l_extendedprice), 6) AS ln_price,
        |  round(log10(l_extendedprice), 6) AS log10_price,
        |  round(sin(l_quantity), 6) AS sin_qty,
        |  round(cos(l_quantity), 6) AS cos_qty,
        |  round(atan2(l_quantity, l_extendedprice), 6) AS angle,
        |  round((exp(l_discount) - exp(-l_discount)) / 2, 6) AS sinh_disc
        |FROM lineitem WHERE l_orderkey % 200 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q43_bottomk_sketch" ->
      s"""SELECT lang,
         |  array_to_string(list_slice(list_sort(list_distinct(
         |    list(${graft.Dets.phashSql("text")}))), 1, 8), ',') AS sketch_csv,
         |  COUNT(*) AS n_docs
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // The oracle asserts the error-band flags: exact values computed by
    // DuckDB, flags TRUE by definition of the bound (sketches are
    // deterministic per engine, so this is stable run-to-run).
    "q39_approx_sketches" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_orderkey) AS n_orders,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  quantile_cont(l_extendedprice, 0.5) AS x_median,
        |  TRUE AS hll_orders_ok, TRUE AS hll_parts_ok, TRUE AS median_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q77_hll_union" ->
      """SELECT date_trunc('week', day) AS week,
        |  COUNT(DISTINCT day) AS n_days,
        |  COUNT(DISTINCT user_id) AS exact_users,
        |  TRUE AS est_ok
        |FROM (SELECT date_trunc('day', ts) AS day, user_id FROM events)
        |GROUP BY 1 ORDER BY week""".stripMargin,

    // Full recompute from scratch — the query must fold to exactly this.
    "q80_incremental_agg" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
        |  MAX(CASE WHEN o_orderkey % 5 = 0 THEN 1 ELSE 0 END) = 1 AS updated
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q78_quantile_rollup" ->
      """WITH ev AS (
        |  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, value
        |  FROM events),
        |bounds AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM ev),
        |daily AS (
        |  SELECT day,
        |    CAST(least(63, floor((value - lo) * 64 / (hi - lo))) AS INT) AS bin,
        |    COUNT(*) AS n
        |  FROM ev, bounds GROUP BY 1, 2),
        |weekly AS (
        |  SELECT date_trunc('week', day) AS week, bin,
        |    CAST(SUM(n) AS BIGINT) AS n
        |  FROM daily GROUP BY 1, 2),
        |cum AS (
        |  SELECT week, bin, n,
        |    SUM(n) OVER (PARTITION BY week ORDER BY bin
        |                 ROWS UNBOUNDED PRECEDING) AS cum,
        |    SUM(n) OVER (PARTITION BY week) AS tot
        |  FROM weekly),
        |p50 AS (SELECT week, MIN(bin) AS p50_bin FROM cum
        |        WHERE cum >= CAST(ceil(tot * 0.5) AS BIGINT) GROUP BY week),
        |p90 AS (SELECT week, MIN(bin) AS p90_bin FROM cum
        |        WHERE cum >= CAST(ceil(tot * 0.9) AS BIGINT) GROUP BY week),
        |nd AS (
        |  SELECT date_trunc('week', day) AS week,
        |    COUNT(DISTINCT day) AS n_days, CAST(SUM(n) AS BIGINT) AS n_events
        |  FROM daily GROUP BY 1)
        |SELECT week, n_days, n_events, p50_bin, p90_bin,
        |  lo + (p50_bin + 0.5) * (hi - lo) / 64 AS p50_est,
        |  lo + (p90_bin + 0.5) * (hi - lo) / 64 AS p90_est
        |FROM p50 JOIN p90 USING (week) JOIN nd USING (week), bounds
        |ORDER BY week""".stripMargin,

    // The bottom-k sketch is hash-deterministic, so unlike q39's HLL
    // the oracle reproduces the sketch internals (kth_min, rho_k)
    // EXACTLY — sort+slice IS the sketch; the estimator flags use the
    // same double arithmetic on both engines.
    "q74_kmv_set_algebra" -> {
      val pk = graft.Dets.phashSql("CAST(l_orderkey AS VARCHAR)")
      s"""WITH dpk AS (
         |  SELECT DISTINCT l_returnflag AS seg, $pk AS pk FROM lineitem),
         |per_seg AS (SELECT seg, COUNT(*) AS n FROM dpk GROUP BY seg),
         |sk AS (SELECT seg, list_slice(list_sort(list(pk)), 1, 256) AS sk
         |       FROM dpk GROUP BY seg),
         |inter AS (
         |  SELECT x.seg AS seg_a, y.seg AS seg_b, COUNT(*) AS n_inter
         |  FROM dpk x JOIN dpk y USING (pk)
         |  WHERE x.seg < y.seg GROUP BY 1, 2),
         |m AS (
         |  SELECT i.seg_a, i.seg_b, i.n_inter,
         |    a.n + b.n - i.n_inter AS n_union,
         |    sa.sk AS sk_a, sb.sk AS sk_b,
         |    list_slice(list_sort(list_distinct(sa.sk || sb.sk)), 1, 256) AS mrg
         |  FROM inter i
         |  JOIN per_seg a ON a.seg = i.seg_a
         |  JOIN per_seg b ON b.seg = i.seg_b
         |  JOIN sk sa ON sa.seg = i.seg_a
         |  JOIN sk sb ON sb.seg = i.seg_b),
         |e AS (
         |  SELECT *,
         |    CASE WHEN len(mrg) >= 256 THEN mrg[256] ELSE NULL END AS kth_min,
         |    len(list_filter(mrg, v -> list_contains(sk_a, v)
         |        AND list_contains(sk_b, v))) AS rho_k
         |  FROM m),
         |f AS (
         |  SELECT *,
         |    CASE WHEN kth_min IS NULL THEN CAST(len(mrg) AS DOUBLE)
         |         ELSE CAST(255 AS DOUBLE) * 1152921504606846976 / kth_min
         |    END AS est_union
         |  FROM e)
         |SELECT seg_a, seg_b, n_union, n_inter, kth_min, rho_k,
         |  abs(est_union - n_union) <= n_union * 0.2 AS union_ok,
         |  abs(est_union * rho_k / CAST(len(mrg) AS DOUBLE) - n_inter)
         |    <= n_inter * 0.35 AS inter_ok
         |FROM f ORDER BY seg_a, seg_b""".stripMargin
    }
  )
}
