package graft.operators

import graft.{Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-series joins Spark lacks as built-ins: as-of join and bounded
  * range (interval) join, composed from equi-joins + windows so Catalyst
  * keeps full pushdown/codegen (SURVEY §2.2 "Joins" build target;
  * preference (a) of the custom-operator ladder).
  *
  * Scale design:
  *  - As-of: the naive formulation (theta-join on user + p.ts <= c.ts,
  *    keep latest) explodes to |clicks_u| x |purchases_u| pairs per user.
  *    Implemented instead as union + partitioned sort + last_value carry-
  *    forward: one shuffle on user_id, linear state, no pair explosion —
  *    the classic distributed as-of that survives 100 TB and skewed users.
  *  - Range join: equi-join on (user, time_bucket) with the probe side
  *    exploded to the two candidate buckets, then exact interval filter.
  *    Turns an O(n^2) theta-join into a co-partitioned hash join whose
  *    fan-out is bounded by bucket width / interval ratio.
  */
object TemporalJoins {

  /** As-of join: for each left row, the latest right row with
    * right.ts <= left.ts, per key. Union-based carry-forward: tag sides,
    * sort by (key, ts, side-priority), propagate the last seen right row.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
               rightCols: Seq[String]): DataFrame = {
    val payload = rightCols.filterNot(c => c == key || c == tsCol)
    // internal prefix isolates right payload from same-named left columns —
    // otherwise the ignoreNulls carry-forward would pick up the left rows'
    // own values and every left row would "match" itself
    val pfx = "_asof_r_"
    val l = left.withColumn("_side", lit(1))
    val r = right.withColumn("_side", lit(0))
    def aligned(df: DataFrame, isRight: Boolean) = df.select(
      (Seq(col(key), col(tsCol), col("_side")) ++
        left.columns.filterNot(c => c == key || c == tsCol).map(c =>
          if (!isRight && df.columns.contains(c)) col(c) else lit(null).as(c)) ++
        payload.map(c =>
          if (isRight) col(c).as(pfx + c) else lit(null).as(pfx + c))): _*)
    val unioned = aligned(l, isRight = false)
      .unionByName(aligned(r, isRight = true))
    // right rows sort before left rows at equal ts => "<=" semantics
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = payload.foldLeft(unioned)((df, c) =>
      df.withColumn(pfx + c, last(col(pfx + c), ignoreNulls = true).over(w)))
    val carriedTs = carried.withColumn("_asof_ts",
      last(when(col("_side") === 0, col(tsCol)), ignoreNulls = true).over(w))
    // expose payload under its own name; on collision with a left column,
    // suffix "_right" (pandas merge_asof convention), repeating until free
    // so the output is never ambiguous and never drops the left's data
    payload.foldLeft(carriedTs.filter(col("_side") === 1).drop("_side")) {
      (df, c) =>
        var out = c
        while (left.columns.contains(out)) out += "_right"
        df.withColumnRenamed(pfx + c, out)
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // As-of: for each click, the user's latest purchase at-or-before it.
    // Right side deduped to unique (user, ts) first — deterministic under
    // second-truncation ties, and what an as-of reference table should be.
    "q29_asof_join" -> { (s, d) =>
      import s.implicits._
      val ev = T.events(s, d).withColumn("ts", date_trunc("second", $"ts"))
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts", $"event_id")
      val wDedup = Window.partitionBy($"user_id", $"ts").orderBy($"event_id".desc)
      val purchases = ev.filter($"event_type" === "purchase")
        .withColumn("_rn", row_number().over(wDedup)).filter($"_rn" === 1)
        .select($"user_id", $"ts", $"value".as("purchase_value"))
      asofJoin(clicks, purchases, "user_id", "ts", Seq("purchase_value"))
        .select($"event_id", $"user_id", $"ts",
                $"purchase_value", $"_asof_ts".as("purchase_ts"))
        .orderBy($"event_id")
    },

    // Same as-of semantics through the native custom operator
    // (graft.plans.AsOfJoinExec: LogicalPlan + Strategy + BinaryExecNode,
    // partitioned sort-merge with carry-forward) — the ladder-(c) path.
    "q46_asof_join_native" -> { (s, d) =>
      import s.implicits._
      val ev = T.events(s, d).withColumn("ts", date_trunc("second", $"ts"))
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts", $"event_id")
      val wDedup = Window.partitionBy($"user_id", $"ts").orderBy($"event_id".desc)
      val purchases = ev.filter($"event_type" === "purchase")
        .withColumn("_rn", row_number().over(wDedup)).filter($"_rn" === 1)
        .select($"user_id", $"ts", $"value".as("purchase_value"))
      graft.plans.AsOfJoin.asofJoin(clicks, purchases, "user_id", "ts")
        .select($"event_id", $"user_id", $"ts", $"purchase_value")
        .orderBy($"event_id")
    },

    // NEAREST join — the bidirectional half the as-of join lacks (as-of
    // looks only backward; attribution and sensor alignment often want
    // "the closest reading in EITHER direction"): for each click, the
    // same-user purchase minimizing |Δts|, ties broken backward-first
    // then by smallest event id — the pandas merge_asof
    // direction='nearest' contract. Composed as TWO carry-forward
    // passes over ONE union frame (ascending for the latest at-or-
    // before, descending for the earliest at-or-after), then a per-row
    // pick — same shuffle bill as the as-of join (one exchange on
    // user_id, two partitioned sorts, linear state), no pair explosion,
    // skew-safe at 100 TB for the same reason.
    "q87_nearest_join" -> { (s, d) =>
      import s.implicits._
      val ev = T.events(s, d).withColumn("ts", date_trunc("second", $"ts"))
      val l = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts", lit(1).as("_side"), $"event_id",
          lit(null).cast("long").as("_rid"),
          lit(null).cast("timestamp").as("_rts"))
      val r = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", lit(0).as("_side"),
          lit(null).cast("long").as("event_id"),
          $"event_id".as("_rid"), $"ts".as("_rts"))
      // rid DESC within a ts group => last() lands on the SMALLEST rid
      // among equally-near rows, the deterministic tie rule the oracle
      // replays; right rows sort before left at equal ts on both
      // passes, so both directions use inclusive (<=, >=) semantics
      val wb = Window.partitionBy($"user_id")
        .orderBy($"ts".asc, $"_side".asc, $"_rid".desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val wf = Window.partitionBy($"user_id")
        .orderBy($"ts".desc, $"_side".asc, $"_rid".desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      l.unionByName(r)
        .withColumn("_prid", last($"_rid", ignoreNulls = true).over(wb))
        .withColumn("_prts", last($"_rts", ignoreNulls = true).over(wb))
        .withColumn("_nrid", last($"_rid", ignoreNulls = true).over(wf))
        .withColumn("_nrts", last($"_rts", ignoreNulls = true).over(wf))
        .filter($"_side" === 1)
        .withColumn("_db", unix_timestamp($"ts") - unix_timestamp($"_prts"))
        .withColumn("_df", unix_timestamp($"_nrts") - unix_timestamp($"ts"))
        .withColumn("_useB", $"_prid".isNotNull &&
          ($"_nrid".isNull || $"_db" <= $"_df"))
        .select($"event_id", $"user_id", $"ts",
          when($"_useB", $"_prid").otherwise($"_nrid").as("match_id"),
          when($"_useB", $"_db").otherwise($"_df").as("delta_s"),
          when($"_useB", lit("backward"))
            .when($"_nrid".isNotNull, lit("forward"))
            .otherwise(lit(null).cast("string")).as("side"))
        .orderBy($"event_id")
    },

    // SEQUENCE PATTERN MATCH — the MATCH_RECOGNIZE / CEP class no
    // other operator covers (q67 counts first-timestamps per stage;
    // attribution, fraud, and conversion analytics need the ORDERED
    // chain with bounded gaps): per user, every view that completes
    // view → first-click-after-within-24h → first-purchase-after-
    // that-within-24h (the gap is the pattern's knob), with overlapping matches allowed and every step
    // deterministic (earliest by (ts, event_id), strictly-after
    // semantics at equal seconds). Spark evaluates it as TWO
    // carry-forward passes over union frames (q87's machinery — one
    // exchange per stage on user_id, partitioned sorts, linear state,
    // no pair explosion at any fan-in); the DuckDB oracle states the
    // same contract as LATERAL nearest-row subqueries — two different
    // evaluation strategies forced to agree row-for-row (the q85
    // discipline). "Nearest click overall, then gap-filtered" equals
    // "nearest click within gap": if the nearest is out of gap,
    // nothing is in gap. Report per user: views, completed chains,
    // total view→purchase latency, and an id-sum match checksum (a
    // chain through the wrong events fails the hash even if counts
    // match).
    "q89_sequence_match" -> { (s, d) =>
      import s.implicits._
      val GAP = 86400L
      val ev = T.events(s, d).withColumn("ts", date_trunc("second", $"ts"))
      val views = ev.filter($"event_type" === "view")
        .select($"user_id", $"ts", $"event_id")
      // stage 1: earliest click strictly after each view. Scan order
      // (ts DESC, _side ASC, _cid DESC): at equal ts the view row
      // precedes the clicks, so a same-second click is never carried
      // (strict >); _cid DESC makes the carried value the smallest
      // click id among equal-ts clicks — the oracle's (ts, id) rule.
      val v1 = views.select($"user_id", $"ts", lit(0).as("_side"),
        $"event_id", lit(null).cast("long").as("_cid"),
        lit(null).cast("timestamp").as("_cts"))
      val c1 = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts", lit(1).as("_side"),
          lit(null).cast("long").as("event_id"),
          $"event_id".as("_cid"), $"ts".as("_cts"))
      val w1 = Window.partitionBy($"user_id")
        .orderBy($"ts".desc, $"_side".asc, $"_cid".desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val stage1 = v1.unionByName(c1)
        .withColumn("_ncid", last($"_cid", ignoreNulls = true).over(w1))
        .withColumn("_ncts", last($"_cts", ignoreNulls = true).over(w1))
        .filter($"_side" === 0 && $"_ncid".isNotNull &&
          unix_timestamp($"_ncts") - unix_timestamp($"ts") <= GAP)
        .select($"user_id", $"event_id".as("v_id"), $"ts".as("v_ts"),
          $"_ncid".as("c_id"), $"_ncts".as("c_ts"))
      // stage 2: earliest purchase strictly after each DISTINCT matched
      // click (clicks shared by several views resolve once, join back)
      val cl = stage1.select($"user_id", $"c_id", $"c_ts").distinct()
        .select($"user_id", $"c_ts".as("ts"), lit(0).as("_side"),
          $"c_id", lit(null).cast("long").as("_pid"),
          lit(null).cast("timestamp").as("_pts"))
      val p1 = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", lit(1).as("_side"),
          lit(null).cast("long").as("c_id"),
          $"event_id".as("_pid"), $"ts".as("_pts"))
      val w2 = Window.partitionBy($"user_id")
        .orderBy($"ts".desc, $"_side".asc, $"_pid".desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val cp = cl.unionByName(p1)
        .withColumn("_npid", last($"_pid", ignoreNulls = true).over(w2))
        .withColumn("_npts", last($"_pts", ignoreNulls = true).over(w2))
        .filter($"_side" === 0 && $"_npid".isNotNull &&
          unix_timestamp($"_npts") - unix_timestamp($"ts") <= GAP)
        .select($"user_id", $"c_id", $"_npid".as("p_id"),
          $"_npts".as("p_ts"))
      val full = stage1.join(cp, Seq("user_id", "c_id"))
      views.groupBy($"user_id").agg(count(lit(1)).as("n_views"))
        .join(full.groupBy($"user_id").agg(
          count(lit(1)).as("n_matched"),
          sum(unix_timestamp($"p_ts") - unix_timestamp($"v_ts"))
            .as("sum_latency_s"),
          sum($"v_id" + $"c_id" + $"p_id").as("match_chk")),
          Seq("user_id"), "left")
        .select($"user_id", $"n_views",
          coalesce($"n_matched", lit(0L)).as("n_matched"),
          coalesce($"sum_latency_s", lit(0L)).as("sum_latency_s"),
          coalesce($"match_chk", lit(0L)).as("match_chk"))
        .orderBy($"user_id")
    },

    // Range join: for each error event, count same-user events in the
    // preceding 10 minutes — bucketed equi-join, not a theta-join.
    "q30_range_join" -> { (s, d) =>
      import s.implicits._
      val ev = T.events(s, d).withColumn("ts", date_trunc("second", $"ts"))
      val bucketSec = 600L
      val probe = ev.filter($"event_type" === "error")
        .select($"event_id", $"user_id", $"ts",
                (unix_timestamp($"ts") / bucketSec).cast("long").as("b0"))
        .withColumn("bucket", explode(array($"b0" - 1, $"b0"))).drop("b0")
      val build = ev.select($"user_id".as("b_user"), $"ts".as("b_ts"),
          (unix_timestamp($"ts") / bucketSec).cast("long").as("bucket"))
      probe.join(build,
          probe("user_id") === $"b_user" && probe("bucket") === build("bucket") &&
          $"b_ts" >= probe("ts") - expr("INTERVAL 10 MINUTES") &&
          $"b_ts" < probe("ts"))
        .groupBy($"event_id", probe("user_id"), probe("ts"))
        .agg(count(lit(1)).as("n_prior_10m"))
        .orderBy($"event_id")
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q29_asof_join" ->
      """WITH ev AS (SELECT event_id, user_id,
        |    date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts, event_type, value
        |  FROM events),
        |p AS (SELECT user_id, ts, value FROM ev WHERE event_type = 'purchase'
        |      QUALIFY row_number() OVER (PARTITION BY user_id, ts
        |                                 ORDER BY event_id DESC) = 1)
        |SELECT c.event_id, c.user_id, c.ts,
        |  p.value AS purchase_value, p.ts AS purchase_ts
        |FROM (SELECT * FROM ev WHERE event_type = 'click') c
        |ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.ts <= c.ts
        |ORDER BY c.event_id""".stripMargin,

    "q46_asof_join_native" ->
      """WITH ev AS (SELECT event_id, user_id,
        |    date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts, event_type, value
        |  FROM events),
        |p AS (SELECT user_id, ts, value FROM ev WHERE event_type = 'purchase'
        |      QUALIFY row_number() OVER (PARTITION BY user_id, ts
        |                                 ORDER BY event_id DESC) = 1)
        |SELECT c.event_id, c.user_id, c.ts, p.value AS purchase_value
        |FROM (SELECT * FROM ev WHERE event_type = 'click') c
        |ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.ts <= c.ts
        |ORDER BY c.event_id""".stripMargin,

    // q87: the tuple rule (|Δ|, backward-first, smallest rid) as a
    // correlated LATERAL top-1 — O(per-user pairs) in the oracle only;
    // the Spark side is the linear two-pass carry-forward.
    "q87_nearest_join" ->
      """WITH ev AS (SELECT event_id, user_id,
        |    date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts, event_type
        |  FROM events),
        |l AS (SELECT event_id, user_id, ts FROM ev
        |      WHERE event_type = 'click'),
        |r AS (SELECT event_id AS rid, user_id, ts AS rts FROM ev
        |      WHERE event_type = 'purchase')
        |SELECT l.event_id, l.user_id, l.ts, m.rid AS match_id,
        |  m.delta_s, m.side
        |FROM l LEFT JOIN LATERAL (
        |  SELECT r.rid,
        |    abs(epoch_us(r.rts) - epoch_us(l.ts)) // 1000000 AS delta_s,
        |    CASE WHEN r.rts <= l.ts THEN 'backward' ELSE 'forward' END
        |      AS side
        |  FROM r WHERE r.user_id = l.user_id
        |  ORDER BY abs(epoch_us(r.rts) - epoch_us(l.ts)),
        |    CASE WHEN r.rts <= l.ts THEN 0 ELSE 1 END, r.rid
        |  LIMIT 1) m ON TRUE
        |ORDER BY l.event_id""".stripMargin,

    // q89: the same chain contract as LATERAL nearest-row subqueries —
    // a different evaluation strategy than Spark's carry-forward
    // passes, forced to the same rows.
    "q89_sequence_match" ->
      """WITH ev AS (SELECT event_id, user_id,
        |    date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts, event_type
        |  FROM events),
        |v AS (SELECT event_id AS v_id, user_id, ts AS v_ts FROM ev
        |      WHERE event_type = 'view'),
        |c AS (SELECT event_id AS c_id, user_id, ts AS c_ts FROM ev
        |      WHERE event_type = 'click'),
        |p AS (SELECT event_id AS p_id, user_id, ts AS p_ts FROM ev
        |      WHERE event_type = 'purchase'),
        |vc AS (
        |  SELECT v.user_id, v.v_id, v.v_ts, m.c_id, m.c_ts
        |  FROM v JOIN LATERAL (
        |    SELECT c.c_id, c.c_ts FROM c
        |    WHERE c.user_id = v.user_id AND c.c_ts > v.v_ts
        |      AND epoch_us(c.c_ts) - epoch_us(v.v_ts) <= CAST(86400 AS BIGINT) * 1000000
        |    ORDER BY c.c_ts, c.c_id LIMIT 1) m ON TRUE),
        |vcp AS (
        |  SELECT vc.user_id, vc.v_id, vc.v_ts, vc.c_id, m.p_id, m.p_ts
        |  FROM vc JOIN LATERAL (
        |    SELECT p.p_id, p.p_ts FROM p
        |    WHERE p.user_id = vc.user_id AND p.p_ts > vc.c_ts
        |      AND epoch_us(p.p_ts) - epoch_us(vc.c_ts) <= CAST(86400 AS BIGINT) * 1000000
        |    ORDER BY p.p_ts, p.p_id LIMIT 1) m ON TRUE),
        |agg AS (
        |  SELECT user_id, COUNT(*) AS n_matched,
        |    CAST(SUM((epoch_us(p_ts) - epoch_us(v_ts)) // 1000000)
        |      AS BIGINT) AS sum_latency_s,
        |    CAST(SUM(v_id + c_id + p_id) AS BIGINT) AS match_chk
        |  FROM vcp GROUP BY user_id)
        |SELECT nv.user_id, nv.n_views,
        |  COALESCE(a.n_matched, 0) AS n_matched,
        |  COALESCE(a.sum_latency_s, 0) AS sum_latency_s,
        |  COALESCE(a.match_chk, 0) AS match_chk
        |FROM (SELECT user_id, COUNT(*) AS n_views FROM v
        |      GROUP BY user_id) nv
        |LEFT JOIN agg a USING (user_id)
        |ORDER BY user_id""".stripMargin,

    "q30_range_join" ->
      """WITH ev AS (SELECT event_id, user_id,
        |    date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts, event_type
        |  FROM events)
        |SELECT e.event_id, e.user_id, e.ts, COUNT(*) AS n_prior_10m
        |FROM (SELECT * FROM ev WHERE event_type = 'error') e
        |JOIN ev b ON b.user_id = e.user_id
        |  AND b.ts >= e.ts - INTERVAL 10 MINUTE AND b.ts < e.ts
        |GROUP BY e.event_id, e.user_id, e.ts
        |ORDER BY e.event_id""".stripMargin
  )
}
