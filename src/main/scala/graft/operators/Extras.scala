package graft.operators

import graft.{Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Wide-to-long reshaping and lateral (correlated table) joins — the two
  * relational surfaces not already covered by Relational/Windows/SetOps.
  *
  * Scale notes: unpivot is a map-only row expansion (no shuffle; output
  * is k× rows but narrow), safe at any scale. The lateral aggregate is
  * planned by Catalyst as a left outer aggregate-join (DecorrelateInnerQuery),
  * i.e. one shuffle on the join key — not a per-row subquery execution.
  */
object Extras {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Wide→long melt with the DataFrame unpivot API (ids kept, measure
    // name + value columns emitted).
    "q55_unpivot" -> { (s, d) =>
      import s.implicits._
      T.lineitem(s, d)
        .filter($"l_orderkey" % 100 === 0)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "measure", "val")
        // lineitem has duplicate (orderkey, linenumber) keys at sf0.1 —
        // val joins the sort to keep the order total
        .orderBy($"l_orderkey", $"l_linenumber", $"measure", $"val")
    },

    // EXISTS / NOT EXISTS correlated subqueries (planned as semi/anti
    // joins — same scale shape as q05/q06, stated in SQL).
    "q58_exists_subquery" -> { (s, d) =>
      T.customer(s, d).createOrReplaceTempView("v_customer_e")
      T.orders(s, d).createOrReplaceTempView("v_orders_e")
      s.sql(
        """SELECT c.c_custkey, c.c_name
          |FROM v_customer_e c
          |WHERE EXISTS (
          |    SELECT 1 FROM v_orders_e o
          |    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
          |  AND NOT EXISTS (
          |    SELECT 1 FROM v_orders_e o
          |    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice < 5000)
          |ORDER BY c.c_custkey""".stripMargin)
    },

    // Window navigation with null handling: nth_value, and lead/first
    // with IGNORE NULLS (the gap-filling idiom for sparse time series).
    "q59_window_ignore_nulls" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy($"event_id")
      val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      T.events(s, d)
        .withColumn("purchase_val",
          when($"event_type" === "purchase", $"value")) // null otherwise
        .withColumn("second_type", nth_value($"event_type", 2).over(wAll))
        .withColumn("next_purchase",
          lead($"purchase_val", 1, null, ignoreNulls = true).over(w))
        .withColumn("first_purchase",
          first($"purchase_val", ignoreNulls = true).over(wAll))
        .filter($"event_id" % 20 === 0)
        .select($"user_id", $"event_id", $"second_type",
                $"next_purchase", $"first_purchase")
        .orderBy($"user_id", $"event_id")
    },

    // LATERAL correlated aggregate subquery (SQL surface; Catalyst
    // decorrelates it into an aggregate + left outer join).
    "q56_lateral_agg" -> { (s, d) =>
      T.customer(s, d).createOrReplaceTempView("v_customer_l")
      T.orders(s, d).createOrReplaceTempView("v_orders_l")
      s.sql(
        """SELECT c.c_custkey, c.c_name, o.n_orders, o.max_price
          |FROM v_customer_l c,
          |LATERAL (
          |  SELECT COUNT(*) AS n_orders,
          |    CAST(MAX(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
          |      AS max_price
          |  FROM v_orders_l WHERE o_custkey = c.c_custkey) o
          |WHERE c.c_custkey % 10 = 0
          |ORDER BY c.c_custkey""".stripMargin)
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q55_unpivot" ->
      """SELECT l_orderkey, l_linenumber, measure, val FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
        |         l_quantity AS val
        |  FROM lineitem WHERE l_orderkey % 100 = 0
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |  FROM lineitem WHERE l_orderkey % 100 = 0
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
        |  FROM lineitem WHERE l_orderkey % 100 = 0)
        |ORDER BY l_orderkey, l_linenumber, measure, val""".stripMargin,

    "q58_exists_subquery" ->
      """SELECT c.c_custkey, c.c_name
        |FROM customer c
        |WHERE EXISTS (
        |    SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice < 5000)
        |ORDER BY c.c_custkey""".stripMargin,

    // DuckDB has no IGNORE NULLS clause; "next/first non-null" is
    // min_by(val, order) FILTER (val IS NOT NULL) over the matching
    // frame (event_id is unique, so min_by is unambiguous).
    "q59_window_ignore_nulls" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    CASE WHEN event_type = 'purchase' THEN value END AS purchase_val
        |  FROM events),
        |win AS (
        |  SELECT user_id, event_id,
        |    nth_value(event_type, 2) OVER wall AS second_type,
        |    min_by(purchase_val, event_id) FILTER (purchase_val IS NOT NULL)
        |      OVER (PARTITION BY user_id ORDER BY event_id
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        |      AS next_purchase,
        |    min_by(purchase_val, event_id) FILTER (purchase_val IS NOT NULL)
        |      OVER wall AS first_purchase
        |  FROM e
        |  WINDOW wall AS (PARTITION BY user_id ORDER BY event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT user_id, event_id, second_type, next_purchase, first_purchase
        |FROM win WHERE event_id % 20 = 0
        |ORDER BY user_id, event_id""".stripMargin,

    // The lateral aggregate without GROUP BY yields exactly one row per
    // outer row (NULL max / 0 count when no orders) == left join on the
    // grouped aggregate.
    "q56_lateral_agg" ->
      """SELECT c.c_custkey, c.c_name,
        |  COALESCE(o.n_orders, 0) AS n_orders, o.max_price
        |FROM customer c
        |LEFT JOIN (
        |  SELECT o_custkey, COUNT(*) AS n_orders,
        |    CAST(CAST(MAX(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR)
        |      AS DOUBLE) AS max_price
        |  FROM orders GROUP BY o_custkey) o
        |  ON o.o_custkey = c.c_custkey
        |WHERE c.c_custkey % 10 = 0
        |ORDER BY c.c_custkey""".stripMargin
  )
}
