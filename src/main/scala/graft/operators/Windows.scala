package graft.operators

import graft.{Dets, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Dets._

/** Window-function surface: ranking, analytic (lag/lead), rows/range
  * frames, running totals, distribution functions.
  *
  * Scale notes: a window = one shuffle on partitionBy keys + an in-partition
  * sort. Each query partitions by a real entity key (custkey/suppkey/user_id)
  * so state per partition stays bounded at 100 TB (no global, key-less
  * windows — those serialize onto one task). Every orderBy is tie-broken to
  * a total order: window semantics over duplicate sort keys are otherwise
  * nondeterministic under shuffle, on any cluster size.
  */
object Windows {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // row_number / rank / dense_rank: top-3 orders per customer.
    "q11_window_rank" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      T.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .withColumn("rk", rank().over(w))
        .withColumn("drk", dense_rank().over(w))
        .filter($"rn" <= 3)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn", $"rk", $"drk")
        .orderBy($"o_custkey", $"rn")
    },

    // lag/lead deltas per user over the event sequence.
    "q12_window_lag_lead" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"event_id")
      T.events(s, d)
        .withColumn("prev_value", lag($"value", 1).over(w))
        .withColumn("next_value", lead($"value", 1).over(w))
        .withColumn("delta", $"value" - lag($"value", 1).over(w))
        .select($"user_id", $"event_id", $"value", $"prev_value", $"next_value", $"delta")
        .orderBy($"user_id", $"event_id")
    },

    // ROWS frame: trailing-7-rows moving sum/avg per supplier.
    "q13_window_rows_frame" -> { (s, d) =>
      import s.implicits._
      // (orderkey, linenumber) is NOT unique in the generated data;
      // l_quantity tie-break makes the frame order total
      val w = Window.partitionBy($"l_suppkey")
        .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber", $"l_quantity")
        .rowsBetween(-6, 0)
      T.lineitem(s, d)
        .withColumn("mov_sum_qty", sum(dec($"l_quantity")).over(w).cast("double"))
        .withColumn("mov_n", count(lit(1)).over(w))
        .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_quantity",
                $"mov_sum_qty", $"mov_n")
        .orderBy($"l_suppkey", $"l_shipdate", $"l_orderkey", $"l_linenumber",
                 $"l_quantity")
    },

    // ROLLING MEDIAN — the robust-statistics frame q13/q14's sum/avg
    // cannot express (one outlier sensor reading drags a moving average
    // arbitrarily far; the rolling median is the standard smoother for
    // spiky telemetry): per user, the exact median of the last 5 values
    // in (ts, event_id) order, emitted only for full frames so the
    // median is always the odd-count middle element — identical
    // element, not an interpolation, on both engines (array_sort of the
    // frame's 5 values, take the 3rd). Spark has no median window
    // function; the collect_list-over-frame formulation keeps the
    // window partitioned by user (never global) and the frame O(5).
    // NULL values are filtered BEFORE windowing on both engines:
    // Spark's collect_list drops NULLs while DuckDB's list() keeps
    // them (and the two engines' array sorts place NULLs at opposite
    // ends), so a nullable `value` would silently diverge the median
    // frame. The fixtures have no NULL values today; the filter makes
    // the semantics engine-independent rather than fixture-dependent.
    "q90_rolling_median" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val wf = w.rowsBetween(-4, 0)
      T.events(s, d).withColumn("ts", date_trunc("second", $"ts"))
        .filter($"value".isNotNull)
        .select($"user_id", $"ts", $"event_id", $"value")
        .withColumn("rn", row_number().over(w))
        .withColumn("vals", collect_list($"value").over(wf))
        .filter($"rn" >= 5)
        .select($"user_id", $"event_id", $"ts", $"value",
          expr("element_at(array_sort(vals), 3)").as("med5"))
        .orderBy($"user_id", $"ts", $"event_id")
    },

    // RANGE frame over a numeric ordering: orders within 10k price below.
    "q14_window_range_frame" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice")
        .rangeBetween(-10000, 0)
      T.orders(s, d)
        .withColumn("n_in_band", count(lit(1)).over(w))
        .withColumn("band_total", sum(dec($"o_totalprice")).over(w).cast("double"))
        .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"n_in_band", $"band_total")
        .orderBy($"o_custkey", $"o_totalprice", $"o_orderkey")
    },

    // Running (cumulative) revenue per customer across order history.
    "q15_window_running_total" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
      T.orders(s, d)
        .withColumn("cum_spend", sum(dec($"o_totalprice")).over(w).cast("double"))
        .withColumn("order_seq", row_number().over(
          Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")))
        .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"cum_spend", $"order_seq")
        .orderBy($"o_custkey", $"order_seq")
    },

    // Distribution functions: quartiles + percent_rank + cume_dist.
    "q16_window_distribution" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"l_returnflag")
        .orderBy($"l_extendedprice", $"l_orderkey", $"l_linenumber", $"l_quantity")
      T.lineitem(s, d)
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("pct_rank", percent_rank().over(w))
        .withColumn("cume", cume_dist().over(w))
        .filter($"l_orderkey" % 100 === 0)
        .select($"l_returnflag", $"l_orderkey", $"l_linenumber",
                $"l_extendedprice", $"quartile", $"pct_rank", $"cume")
        .orderBy($"l_returnflag", $"l_extendedprice", $"l_orderkey",
                 $"l_linenumber", $"pct_rank")
    },

    // first/last value over a bounded frame per user.
    "q17_window_first_last" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      T.events(s, d)
        .withColumn("first_type", first($"event_type").over(w))
        .withColumn("last_type", last($"event_type").over(w))
        .withColumn("n_events", count(lit(1)).over(w))
        .filter($"event_id" % 10 === 0)
        .select($"user_id", $"event_id", $"event_type",
                $"first_type", $"last_type", $"n_events")
        .orderBy($"user_id", $"event_id")
    },

    // q16's distribution functions, DISTRIBUTED: Window.partitionBy on a
    // 3-value key serializes each group onto one task (3 x 33 TB tasks at
    // 100 TB); this computes the identical ntile/percent_rank/cume_dist
    // via DistributedRank — range-repartition + broadcast prefix offsets,
    // so no group ever gathers on one executor. Same oracle as q16.
    "q62_distribution_scalable" -> { (s, d) =>
      import s.implicits._
      import DistributedRank._
      val ranked = withRankStats(
        T.lineitem(s, d).select($"l_returnflag", $"l_orderkey",
          $"l_linenumber", $"l_extendedprice", $"l_quantity"),
        Seq("l_returnflag"),
        Seq($"l_extendedprice", $"l_orderkey", $"l_linenumber", $"l_quantity"))
      // with the tie-broken total order, rank == row_number == SQL rank,
      // so the distribution functions are arithmetic on (_rank0, _gn)
      ranked
        .withColumn("quartile", ntileFromRank(4, $"_rank0", $"_gn"))
        .withColumn("pct_rank",
          when($"_gn" > 1, $"_rank0".cast("double") / ($"_gn" - 1))
            .otherwise(0.0))
        .withColumn("cume", ($"_rank0" + 1).cast("double") / $"_gn")
        .filter($"l_orderkey" % 100 === 0)
        .select($"l_returnflag", $"l_orderkey", $"l_linenumber",
                $"l_extendedprice", $"quartile", $"pct_rank", $"cume")
        .orderBy($"l_returnflag", $"l_extendedprice", $"l_orderkey",
                 $"l_linenumber", $"pct_rank")
    },

    // q15's GLOBAL variant: `SUM OVER (ORDER BY ...)` with no PARTITION
    // BY plans as a single-task window — the whole table gathers on one
    // executor at 100 TB. The code below IS that naive window; the
    // injected optimizer rule (plans.RewriteGlobalRunningTotal, the
    // Rule[LogicalPlan] rung of the custom-operator ladder) re-plans it
    // as GlobalRunningTotalExec: range exchange + O(partitions)
    // broadcast prefix offsets + map-only accumulate — identical
    // results, no single-task stage (plan-asserted in PlanShapeSpec).
    // Exact-decimal cents keep the sum integer at any parallelism;
    // the oracle runs the same naive window, so the driver's gate
    // checks the rewrite end-to-end. (graft.operators.RunningTotal is
    // the same algorithm as a DataFrame helper, kept as the documented
    // fallback for frames the rule's guards reject; t17/t19/t20 all
    // ride this exec path.)
    "q79_running_total_global" -> { (s, d) =>
      import s.implicits._
      graft.GraftExtensions.register(s)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy($"o_orderkey")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
                     org.apache.spark.sql.expressions.Window.currentRow)
      T.orders(s, d)
        .select($"o_orderkey",
          coalesce(($"o_totalprice".cast("decimal(18,4)") * 10000)
            .cast("long"), lit(0L)).as("cents"))
        .withColumn("cum_cents", sum($"cents").over(w))
        .orderBy($"o_orderkey")
    },

    // Time-interval RANGE frame: trailing 1-hour count/sum per user —
    // the event-time sliding aggregate q14's numeric range frame can't
    // express. Ordered on epoch SECONDS (identical integers on both
    // engines); RANGE includes equal-key peers identically everywhere.
    "q61_window_time_range" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id")
        .orderBy($"tsec").rangeBetween(-3600, Window.currentRow)
      T.events(s, d)
        .withColumn("ts_s", date_trunc("second", $"ts"))
        .withColumn("tsec", unix_timestamp($"ts_s"))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("sum_1h", sum(dec($"value")).over(w).cast("double"))
        .filter($"event_id" % 20 === 0)
        .select($"user_id", $"event_id", $"ts_s", $"n_1h", $"sum_1h")
        .orderBy($"user_id", $"event_id")
    },

    // Aggregate functions as window functions: rolling exact median
    // (robust smoothing for noisy time series) over a trailing frame.
    "q60_rolling_median" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"event_id")
        .rowsBetween(-10, Window.currentRow)
      T.events(s, d)
        .withColumn("med", expr("percentile(value, 0.5)").over(w))
        .withColumn("rolling_n", count(lit(1)).over(w))
        .filter($"event_id" % 25 === 0)
        .select($"user_id", $"event_id", $"value", $"med", $"rolling_n")
        .orderBy($"user_id", $"event_id")
    },

    // Keep-latest-per-key (the QUALIFY row_number() = 1 pattern): the
    // CDC/compaction primitive — latest event per (user, type) by
    // (ts, event_id) desc. One shuffle on the composite key; ties are
    // impossible under the event_id tie-break, so the survivor is
    // deterministic at any cluster size. Precision parity: events.ts is
    // ns parquet; Spark's load truncates to µs (ts div 1000) and DuckDB's
    // CAST(ts AS TIMESTAMP) truncates ns→µs identically (verified: a
    // .999-ns fraction truncates, never rounds), so ordering on the µs
    // value is engine-exact — and keeps sub-second recency that a
    // second-truncated ORDER BY would throw away (same-second events
    // would fall through to the event_id tie-break and could keep the
    // genuinely EARLIER row).
    "q63_keep_latest" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id", $"event_type")
        .orderBy($"ts".desc, $"event_id".desc)
      T.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"event_type", $"event_id",
          date_trunc("second", $"ts").as("ts_s"), $"value")
        .orderBy($"user_id", $"event_type")
    },

    // Gaps-and-islands: burst detection in pure SQL — a new island when
    // the per-user gap exceeds 1 day, island id by cumulative sum of
    // the boundary flags, then per-island aggregates. Both windows and
    // the final groupBy share the user_id partitioning, so Catalyst
    // reuses ONE exchange end to end (no second shuffle). Gap compares
    // run on integer epoch seconds — engine-exact.
    "q64_gaps_islands" -> { (s, d) =>
      import s.implicits._
      val wSeq = Window.partitionBy($"user_id").orderBy($"tsec", $"event_id")
      T.events(s, d)
        .withColumn("tsec", unix_timestamp(date_trunc("second", $"ts")))
        .withColumn("gap", $"tsec" - lag($"tsec", 1).over(wSeq))
        .withColumn("new_island",
          when($"gap".isNull || $"gap" > 86400, 1L).otherwise(0L))
        .withColumn("island", sum($"new_island").over(
          wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"island")
        .agg(count(lit(1)).as("n_events"),
             min($"tsec").as("start_sec"), max($"tsec").as("end_sec"),
             dsum($"value").as("total"))
        .filter($"n_events" >= 3)
        .orderBy($"user_id", $"island")
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q11_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn, rk, drk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |) WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "q12_window_lag_lead" ->
      """SELECT user_id, event_id, value,
        |  lag(value, 1) OVER w AS prev_value,
        |  lead(value, 1) OVER w AS next_value,
        |  value - lag(value, 1) OVER w AS delta
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |ORDER BY user_id, event_id""".stripMargin,

    "q13_window_rows_frame" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER w AS DOUBLE) AS mov_sum_qty,
        |  COUNT(*) OVER w AS mov_n
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey
        |             ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_quantity""".stripMargin,

    // q90: identical frame, identical sorted-middle-element definition —
    // never an interpolated median. NULLs filtered pre-window on both
    // engines (Spark collect_list drops them, DuckDB list() keeps them).
    "q90_rolling_median" ->
      """WITH ev AS (
        |  SELECT user_id, date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts,
        |    event_id, value
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT user_id, ts, event_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |                       ORDER BY ts, event_id) AS rn,
        |    list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |      AS vals
        |  FROM ev)
        |SELECT user_id, event_id, ts, value, list_sort(vals)[3] AS med5
        |FROM r WHERE rn >= 5
        |ORDER BY user_id, ts, event_id""".stripMargin,

    "q14_window_range_frame" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  COUNT(*) OVER w AS n_in_band,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS band_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
        |             RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_totalprice, o_orderkey""".stripMargin,

    "q15_window_running_total" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS cum_spend,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, order_seq""".stripMargin,

    "q16_window_distribution" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |  quartile, pct_rank, cume FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |    ntile(4) OVER w AS quartile,
        |    percent_rank() OVER w AS pct_rank,
        |    cume_dist() OVER w AS cume
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_returnflag
        |               ORDER BY l_extendedprice, l_orderkey, l_linenumber, l_quantity)
        |) WHERE l_orderkey % 100 = 0
        |ORDER BY l_returnflag, l_extendedprice, l_orderkey, l_linenumber, pct_rank""".stripMargin,

    "q17_window_first_last" ->
      """SELECT user_id, event_id, event_type,
        |  first_value(event_type) OVER w AS first_type,
        |  last_value(event_type) OVER w AS last_type,
        |  COUNT(*) OVER w AS n_events
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |QUALIFY event_id % 10 = 0
        |ORDER BY user_id, event_id""".stripMargin,

    // identical semantics to q16 (the distributed formulation must compute
    // the very same function) — same oracle text
    "q79_running_total_global" ->
      """WITH c AS (
        |  SELECT o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
        |      AS cents
        |  FROM orders)
        |SELECT o_orderkey, cents,
        |  CAST(SUM(cents) OVER (ORDER BY o_orderkey ROWS UNBOUNDED PRECEDING)
        |       AS BIGINT) AS cum_cents
        |FROM c ORDER BY o_orderkey""".stripMargin,

    "q62_distribution_scalable" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |  quartile, pct_rank, cume FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |    ntile(4) OVER w AS quartile,
        |    percent_rank() OVER w AS pct_rank,
        |    cume_dist() OVER w AS cume
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_returnflag
        |               ORDER BY l_extendedprice, l_orderkey, l_linenumber, l_quantity)
        |) WHERE l_orderkey % 100 = 0
        |ORDER BY l_returnflag, l_extendedprice, l_orderkey, l_linenumber, pct_rank""".stripMargin,

    "q61_window_time_range" ->
      """SELECT user_id, event_id,
        |  date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts_s,
        |  COUNT(*) OVER w AS n_1h,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |  ORDER BY epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
        |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |QUALIFY event_id % 20 = 0
        |ORDER BY user_id, event_id""".stripMargin,

    // Spark `percentile` == DuckDB `quantile_cont` bit-for-bit.
    "q60_rolling_median" ->
      """SELECT user_id, event_id, value,
        |  quantile_cont(value, 0.5) OVER w AS med,
        |  COUNT(*) OVER w AS rolling_n
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |             ROWS BETWEEN 10 PRECEDING AND CURRENT ROW)
        |QUALIFY event_id % 25 = 0
        |ORDER BY user_id, event_id""".stripMargin,

    "q63_keep_latest" ->
      """SELECT user_id, event_type, event_id,
        |  date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts_s, value
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id, event_type
        |        ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin,

    "q64_gaps_islands" ->
      """WITH e AS (
        |  SELECT user_id, event_id, value,
        |    CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
        |         AS BIGINT) AS tsec
        |  FROM events),
        |g AS (
        |  SELECT *, CASE WHEN tsec - lag(tsec) OVER w IS NULL
        |                   OR tsec - lag(tsec) OVER w > 86400
        |            THEN 1 ELSE 0 END AS new_island
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsec, event_id)),
        |i AS (
        |  SELECT *, SUM(new_island) OVER (
        |    PARTITION BY user_id ORDER BY tsec, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM g)
        |SELECT user_id, CAST(island AS BIGINT) AS island,
        |  COUNT(*) AS n_events,
        |  CAST(MIN(tsec) AS BIGINT) AS start_sec,
        |  CAST(MAX(tsec) AS BIGINT) AS end_sec,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM i GROUP BY user_id, island
        |HAVING COUNT(*) >= 3
        |ORDER BY user_id, island""".stripMargin
  )
}
