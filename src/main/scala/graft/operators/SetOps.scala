package graft.operators

import graft.{Dets, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Dets._

/** Set operations: union all / union distinct / intersect / except /
  * distinct projection (the SURVEY §2.2 set-op targets; O9's sink dedup is
  * `except` on keys).
  *
  * Scale notes: UNION ALL is a zero-shuffle concatenation of partitions;
  * the distinct variants hash-shuffle on the full row — at 100 TB prefer
  * pre-projecting to the minimal column set (done here) so the shuffle
  * carries keys, not payloads. INTERSECT/EXCEPT plan as aggregate+join in
  * Spark; both sides here are pre-aggregated key sets.
  */
object SetOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // UNION ALL with provenance tag.
    "q18_union_all" -> { (s, d) =>
      import s.implicits._
      val o = T.orders(s, d)
      val urgent = o.filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey", lit("urgent").as("src"))
      val big = o.filter($"o_totalprice" > 250000)
        .select($"o_orderkey", lit("big").as("src"))
      urgent.union(big).orderBy($"o_orderkey", $"src")
    },

    // UNION (distinct): same sides, duplicates collapsed.
    "q19_union_distinct" -> { (s, d) =>
      import s.implicits._
      val o = T.orders(s, d)
      val urgent = o.filter($"o_orderpriority" === "1-URGENT").select($"o_orderkey")
      val big = o.filter($"o_totalprice" > 250000).select($"o_orderkey")
      urgent.union(big).distinct().orderBy($"o_orderkey")
    },

    // INTERSECT: customers active in both 1996 and 1997.
    "q20_intersect" -> { (s, d) =>
      import s.implicits._
      def activeIn(y: Int) = T.orders(s, d)
        .filter($"o_orderdate" >= lit(s"$y-01-01").cast("timestamp") &&
                $"o_orderdate" <  lit(s"${y + 1}-01-01").cast("timestamp"))
        .select($"o_custkey")
      activeIn(1996).intersect(activeIn(1997)).orderBy($"o_custkey")
    },

    // EXCEPT: active in 1996 but not 1997.
    "q21_except" -> { (s, d) =>
      import s.implicits._
      def activeIn(y: Int) = T.orders(s, d)
        .filter($"o_orderdate" >= lit(s"$y-01-01").cast("timestamp") &&
                $"o_orderdate" <  lit(s"${y + 1}-01-01").cast("timestamp"))
        .select($"o_custkey")
      activeIn(1996).except(activeIn(1997)).orderBy($"o_custkey")
    },

    // DISTINCT projection (exact dedup on a key subset).
    "q22_distinct_projection" -> { (s, d) =>
      import s.implicits._
      T.lineitem(s, d)
        .select($"l_suppkey", $"l_returnflag", $"l_linestatus")
        .distinct()
        .orderBy($"l_suppkey", $"l_returnflag", $"l_linestatus")
    },

    // INTERSECT ALL — multiset intersection: a customer with 3 orders in
    // 1996 and 2 in 1997 appears min(3, 2) = 2 times. Plans as one
    // count-per-side aggregate + join + replicate-by-min generate: the
    // shuffle carries (key, two counts), never the duplicated rows.
    "q70_intersect_all" -> { (s, d) =>
      import s.implicits._
      def activeIn(y: Int) = T.orders(s, d)
        .filter($"o_orderdate" >= lit(s"$y-01-01").cast("timestamp") &&
                $"o_orderdate" <  lit(s"${y + 1}-01-01").cast("timestamp"))
        .select($"o_custkey")
      activeIn(1996).intersectAll(activeIn(1997)).orderBy($"o_custkey")
    },

    // EXCEPT ALL — multiset difference: 3 orders in 1996 minus 2 in 1997
    // leaves the customer once (max(m1 - m2, 0) copies).
    "q71_except_all" -> { (s, d) =>
      import s.implicits._
      def activeIn(y: Int) = T.orders(s, d)
        .filter($"o_orderdate" >= lit(s"$y-01-01").cast("timestamp") &&
                $"o_orderdate" <  lit(s"${y + 1}-01-01").cast("timestamp"))
        .select($"o_custkey")
      activeIn(1996).exceptAll(activeIn(1997)).orderBy($"o_custkey")
    },

    // TABLESAMPLE — the physical sampling operator (SQL
    // `TABLESAMPLE (10 PERCENT) REPEATABLE(42)`): per-partition seeded
    // Bernoulli evaluated INSIDE the scan stage, so a 100 TB profile
    // query reads and filters in one pass with no shuffle (t05's hash
    // sampling is the content-deterministic alternative; this is the
    // cheap statistical one). Seeded sampling is deterministic for a
    // fixed partitioning but engine-specific RNG — no DuckDB oracle can
    // match it row-for-row, so this entry takes the driver's rows>0
    // check and SetOpsSampleSpec pins repeatability, fraction bounds,
    // and the no-shuffle plan INSIDE Spark. (q81 below closes the gap:
    // the same Sample operator, oracle-checked via its integrity law.)
    "q72_tablesample" -> { (s, d) =>
      import s.implicits._
      T.orders(s, d)
        .sample(withReplacement = false, fraction = 0.1, seed = 42L)
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_sampled"),
             dsum($"o_totalprice").as("sampled_total"))
        .orderBy($"o_orderpriority")
    },

    // q72's ORACLE-CHECKABLE companion: the Sample operator's integrity
    // law — sample ∪ its anti-join complement reconstructs the full
    // table EXACTLY (o_orderkey is unique; the seeded per-partition
    // Bernoulli is deterministic over the shared scan partitioning, so
    // both branches evaluate the SAME sample — repeatability pinned in
    // ScaleOpsSpec). The DuckDB oracle is the plain full-table
    // aggregate: a row the sampler dropped that the complement missed,
    // or one duplicated across branches, breaks the hash match — a hard
    // correctness row for the Sample physical operator that its RNG
    // output itself cannot have. Scale shape: only (orderkey, priority,
    // price) enter the anti-join's key shuffle; sort-merge on the
    // unique key, no broadcast of the 10% sample needed.
    "q81_sample_integrity" -> { (s, d) =>
      import s.implicits._
      val orders = T.orders(s, d)
        .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
      val sampled = orders
        .sample(withReplacement = false, fraction = 0.1, seed = 42L)
      val rest = orders.join(sampled.select($"o_orderkey"),
        Seq("o_orderkey"), "left_anti")
      sampled.unionByName(rest)
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
             dsum($"o_totalprice").as("total_price"))
        .orderBy($"o_orderpriority")
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q18_union_all" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, 'urgent' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
        |  UNION ALL
        |  SELECT o_orderkey, 'big' AS src FROM orders WHERE o_totalprice > 250000
        |) ORDER BY o_orderkey, src""".stripMargin,

    "q19_union_distinct" ->
      """SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |UNION
        |SELECT o_orderkey FROM orders WHERE o_totalprice > 250000
        |ORDER BY o_orderkey""".stripMargin,

    "q20_intersect" ->
      """SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |INTERSECT
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |ORDER BY o_custkey""".stripMargin,

    "q21_except" ->
      """SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |EXCEPT
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |ORDER BY o_custkey""".stripMargin,

    "q22_distinct_projection" ->
      """SELECT DISTINCT l_suppkey, l_returnflag, l_linestatus
        |FROM lineitem
        |ORDER BY l_suppkey, l_returnflag, l_linestatus""".stripMargin,

    "q70_intersect_all" ->
      """SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |INTERSECT ALL
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |ORDER BY o_custkey""".stripMargin,

    "q71_except_all" ->
      """SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |EXCEPT ALL
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |ORDER BY o_custkey""".stripMargin,

    // q81: sample ∪ complement must equal the FULL table — the oracle is
    // the plain full-table aggregate, independent of any RNG.
    "q81_sample_integrity" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |         AS total_price
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin
  )
}
