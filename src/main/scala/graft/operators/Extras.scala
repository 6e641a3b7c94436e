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
