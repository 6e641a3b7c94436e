package graft.operators

import graft.{Dets, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Dets._

/** Core relational operator surface: scans, filters, projections, joins
  * (all types + strategies), aggregations, sort/limit/top-k.
  *
  * Scale notes (100 TB design intent, verified via .explain on local[32]):
  *  - Dimension tables (region/nation/customer/supplier/part) are broadcast
  *    explicitly — at SF100k the fact tables shuffle ~100 TB if joined
  *    shuffle-side, while dims stay MB-GB sized. Catalyst would often pick
  *    broadcast on its own via size stats; we hint where we *know* the dim
  *    is small so the plan survives missing/stale stats on a real cluster.
  *  - Aggregations rely on Spark's partial (map-side) HashAggregate: only
  *    the group-key cardinality crosses the shuffle, never raw rows.
  *  - Filters are plain column predicates so they push into the Parquet
  *    scan (PushedFilters) and prune row groups via min/max stats.
  *  - Top-k uses orderBy+limit which Spark plans as TakeOrderedAndProject:
  *    per-partition heap of k, no global sort.
  */
object Relational {
  private val CUTOFF = "2000-09-02"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O4/O6 analog + TPC-H Q1 shape: filter -> partial agg -> final agg -> sort.
    "q01_pricing_summary" -> { (s, d) =>
      import s.implicits._
      T.lineitem(s, d)
        .filter($"l_shipdate" <= lit(CUTOFF).cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          dsumDec(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
            .as("sum_disc_price"),
          dsumDec((dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
            .cast("decimal(18,6)") * (lit(1) + dec($"l_tax"))).as("sum_charge"),
          davg($"l_quantity").as("avg_qty"),
          davg($"l_extendedprice").as("avg_price"),
          davg($"l_discount").as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // Pushdown showcase: both predicates and the 5-col projection reach the
    // Parquet reader (verified: PushedFilters + ReadSchema in explain).
    "q02_filter_project" -> { (s, d) =>
      import s.implicits._
      T.lineitem(s, d)
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
                $"l_shipdate" <  lit("1997-01-01").cast("timestamp") &&
                $"l_quantity" < 24 && $"l_discount" >= 0.05 && $"l_discount" <= 0.07)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity",
                $"l_extendedprice", $"l_discount")
        // (orderkey, linenumber) is NOT unique in the generated data —
        // tie-break on the measures for a total order
        .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity",
                 $"l_extendedprice", $"l_discount")
    },

    // Broadcast hash join: customer is the small build side.
    "q03_join_broadcast" -> { (s, d) =>
      import s.implicits._
      T.orders(s, d)
        .join(broadcast(T.customer(s, d)), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("total_price"))
        .orderBy($"c_mktsegment")
    },

    // Left outer join preserving customers with zero orders.
    "q04_join_left_outer" -> { (s, d) =>
      import s.implicits._
      T.customer(s, d)
        .join(T.orders(s, d), $"c_custkey" === $"o_custkey", "left_outer")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("n_orders"),
             coalesce(dsum($"o_totalprice"), lit(0.0)).as("total_price"))
        .orderBy($"c_custkey")
    },

    // Left semi join == EXISTS; no right columns materialized, no dup rows.
    "q05_join_semi" -> { (s, d) =>
      import s.implicits._
      T.customer(s, d)
        .join(T.orders(s, d).filter($"o_totalprice" > 150000),
              $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    },

    // Left anti join == NOT EXISTS (also the upsert primitive, SURVEY O9).
    "q06_join_anti" -> { (s, d) =>
      import s.implicits._
      T.customer(s, d)
        .join(T.orders(s, d), $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name", $"c_nationkey")
        .orderBy($"c_custkey")
    },

    // NULL-AWARE anti join — NOT IN's three-valued logic, which q06's
    // plain anti join (NOT EXISTS) does NOT have: one NULL in the
    // subquery makes `k NOT IN (...)` UNKNOWN for every probe row, so
    // the result is EMPTY — and the naive execution of that contract
    // is O(M·N) (every probe must check every build row for the NULL).
    // Spark's ExtractSingleColumnNullAwareAntiJoin plans the idiomatic
    // Or(EqualTo, IsNull(EqualTo)) left-anti into a BroadcastHashJoin
    // with isNullAwareAntiJoin=true — O(M) hash probes with an O(1)
    // global null short-circuit (at 100 TB, the difference between a
    // scan and a cross product). Two branches pin the semantics
    // non-vacuously: the null-free subquery keeps NOT IN = NOT EXISTS
    // (rows survive), the planted-null twin must return COUNT 0 / SUM
    // NULL. PlanShapeSpec pins the NAAJ flag in the executed plan.
    "q97_null_aware_anti_join" -> { (s, d) =>
      import s.implicits._
      def branch(planted: Boolean, tag: String) =
        naajFrame(s, d, planted)
          .agg(count(lit(1)).as("n_cust"), sum($"c_custkey").as("sum_key"))
          .select(lit(tag).as("branch"), $"n_cust", $"sum_key")
      branch(planted = false, "no_null")
        .union(branch(planted = true, "with_null"))
        .orderBy($"branch")
    },

    // PAGINATION — the same page 3 computed BOTH ways a production API
    // serves it, pinned equal: OFFSET (ORDER BY ... LIMIT 20 OFFSET 40
    // — Spark plans TakeOrderedAndProject with a per-partition heap of
    // offset+limit, so page N costs O(N·pageSize) PER PARTITION and
    // deep pagination melts down at 100 TB) vs KEYSET (the client
    // passes page 2's last (price, key); the filter re-anchors the
    // scan and the heap stays O(pageSize) at ANY depth — the
    // cursor-based pattern every large API converges on). The keyset
    // boundary is computed engine-side as a broadcast 1-row frame —
    // no driver scalar, so the whole two-method comparison is one lazy
    // DAG. Rows must agree exactly — keyset pagination is only correct
    // when the sort is a TOTAL order (the tie-break column IS the
    // correctness condition, not a style choice).
    "q101_pagination" -> { (s, d) =>
      import s.implicits._
      val (offsetPage, keysetPage) = paginationFrames(s, d)
      offsetPage.select(lit("offset").as("method"), col("*"))
        .union(keysetPage.select(lit("keyset").as("method"), col("*")))
        .orderBy($"method", $"o_totalprice".desc, $"o_orderkey")
    },

    // Full outer join of two pre-aggregated sides (agg-before-join keeps the
    // shuffled volume at key-cardinality, not row-cardinality).
    "q07_join_full_outer" -> { (s, d) =>
      import s.implicits._
      val cust = T.customer(s, d).groupBy($"c_nationkey".as("ck"))
        .agg(count(lit(1)).as("n_cust"))
      val supp = T.supplier(s, d).groupBy($"s_nationkey".as("sk"))
        .agg(count(lit(1)).as("n_supp"))
      cust.join(supp, $"ck" === $"sk", "full_outer")
        .select(coalesce($"ck", $"sk").as("nationkey"),
                coalesce($"n_cust", lit(0L)).as("n_cust"),
                coalesce($"n_supp", lit(0L)).as("n_supp"))
        .orderBy($"nationkey")
    },

    // TPC-H Q5 shape: 6-table multiway join; dims broadcast, facts shuffle
    // once on the join key chain. Revenue by nation for ASIA, 1996.
    "q08_multiway_join" -> { (s, d) =>
      import s.implicits._
      val asia = broadcast(
        T.nation(s, d)
          .join(broadcast(T.region(s, d).filter($"r_name" === "ASIA")),
                $"n_regionkey" === $"r_regionkey"))
      T.customer(s, d)
        .join(T.orders(s, d)
                .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
                        $"o_orderdate" <  lit("1997-01-01").cast("timestamp")),
              $"c_custkey" === $"o_custkey")
        .join(T.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
        .join(T.supplier(s, d),
              $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(asia, $"s_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(dsumDec(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
               .as("revenue"),
             count(lit(1)).as("n_lineitems"))
        .orderBy($"n_name")
    },

    // Aggregate breadth: exact distinct counts, min/max, conditional agg.
    "q09_agg_distinct" -> { (s, d) =>
      import s.implicits._
      T.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_orderkey").as("n_orders"),
          countDistinct($"l_partkey").as("n_parts"),
          count(lit(1)).as("n_rows"),
          min($"l_quantity").as("min_qty"),
          max($"l_quantity").as("max_qty"),
          dsum(when($"l_linestatus" === "F", $"l_quantity").otherwise(lit(0.0)))
            .as("qty_f"))
        .orderBy($"l_returnflag")
    },

    // Top-k: planned as TakeOrderedAndProject (per-partition heaps, no
    // global sort) — the only top-k that survives 100 TB. Tie-broken by key
    // so the result is total-ordered and oracle-stable.
    "q10_topk" -> { (s, d) =>
      import s.implicits._
      T.orders(s, d)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderdate")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(10)
    }
  )

  /** q101's two page-3 formulations, factored for PlanShapeSpec. */
  private[graft] def paginationFrames(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val cols = Seq(col("o_orderkey"), col("o_totalprice"), col("o_custkey"))
    val sorted = T.orders(s, d).select(cols: _*)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val offsetPage = sorted.offset(40).limit(20)
    // keyset: the client passes page 2's LAST row; the boundary is a
    // 1-row engine-side frame (never a driver scalar)
    val bound = sorted.offset(39).limit(1)
      .select(col("o_totalprice").as("bp"), col("o_orderkey").as("bk"))
    val keysetPage = T.orders(s, d).select(cols: _*)
      .crossJoin(broadcast(bound))
      .filter(col("o_totalprice") < col("bp") ||
        (col("o_totalprice") === col("bp") && col("o_orderkey") > col("bk")))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
      .select(cols: _*)
    (offsetPage, keysetPage)
  }

  /** q97's NOT IN anti join before aggregation — factored out so
    * PlanShapeSpec can pin isNullAwareAntiJoin on the executed plan.
    * The subquery is the urgent orders' custkeys; `planted` nulls out
    * the keys of orderkey ≡ 7 (mod 10) rows (~10% of the filtered set —
    * plant AFTER the filter so a null is guaranteed at every sf, never
    * dependent on which keys happen to be urgent). The join condition
    * is the idiomatic NOT IN shape the planner's
    * ExtractSingleColumnNullAwareAntiJoin pattern-matches:
    * Or(EqualTo(l, r), IsNull(EqualTo(l, r))). */
  private[graft] def naajFrame(s: SparkSession, d: String,
                               planted: Boolean): DataFrame = {
    val sub = T.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(
        (if (planted)
           when(col("o_orderkey") % 10 === 7, lit(null))
             .otherwise(col("o_custkey"))
         else col("o_custkey")).as("k"))
    val eq = col("c_custkey") === col("k")
    T.customer(s, d).join(sub, eq || isnull(eq), "left_anti")
  }

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
         |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4)) * (1 - CAST(l_discount AS DECIMAL(19,4)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
         |  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(19,4)) * (1 - CAST(l_discount AS DECIMAL(19,4))) AS DECIMAL(18,6)) * (1 + CAST(l_tax AS DECIMAL(19,4)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
         |  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '$CUTOFF 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_quantity < 24 AND l_discount >= 0.05 AND l_discount <= 0.07
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount""".stripMargin,

    "q03_join_broadcast" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q04_join_left_outer" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        |  COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 0.0) AS total_price
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey
        |ORDER BY c_custkey""".stripMargin,

    "q05_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 150000)
        |ORDER BY c_custkey""".stripMargin,

    "q06_join_anti" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    // q101: both formulations stated literally; the two methods must
    // return the identical page.
    "q101_pagination" ->
      """WITH ofs AS (
        |  SELECT 'offset' AS method, o_orderkey, o_totalprice, o_custkey
        |  FROM orders
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 40),
        |bnd AS (
        |  SELECT o_totalprice AS bp, o_orderkey AS bk FROM orders
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1 OFFSET 39),
        |ks AS (
        |  SELECT 'keyset' AS method, o.o_orderkey, o.o_totalprice,
        |    o.o_custkey
        |  FROM orders o, bnd
        |  WHERE o.o_totalprice < bnd.bp
        |     OR (o.o_totalprice = bnd.bp AND o.o_orderkey > bnd.bk)
        |  ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 20)
        |SELECT * FROM ofs
        |UNION ALL
        |SELECT * FROM ks
        |ORDER BY method, o_totalprice DESC, o_orderkey""".stripMargin,

    // q97: the oracle states NOT IN literally — DuckDB evaluates the
    // three-valued contract its own way; the planted-null branch must
    // read COUNT 0 / SUM NULL on both engines.
    "q97_null_aware_anti_join" ->
      """SELECT 'no_null' AS branch, COUNT(*) AS n_cust,
        |  CAST(SUM(c_custkey) AS BIGINT) AS sum_key
        |FROM customer WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |UNION ALL
        |SELECT 'with_null', COUNT(*), CAST(SUM(c_custkey) AS BIGINT)
        |FROM customer WHERE c_custkey NOT IN
        |  (SELECT CASE WHEN o_orderkey % 10 = 7 THEN NULL ELSE o_custkey END
        |   FROM orders WHERE o_orderpriority = '1-URGENT')
        |ORDER BY branch""".stripMargin,

    "q07_join_full_outer" ->
      """SELECT COALESCE(ck, sk) AS nationkey,
        |  COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey AS ck, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
        |FULL OUTER JOIN (SELECT s_nationkey AS sk, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
        |  ON ck = sk
        |ORDER BY nationkey""".stripMargin,

    "q08_multiway_join" ->
      """SELECT n_name,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4)) * (1 - CAST(l_discount AS DECIMAL(19,4)))) AS VARCHAR) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lineitems
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    "q09_agg_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_orderkey) AS n_orders,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(*) AS n_rows,
        |  MIN(l_quantity) AS min_qty,
        |  MAX(l_quantity) AS max_qty,
        |  CAST(SUM(CAST(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE) AS qty_f
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q10_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10""".stripMargin
  )
}
