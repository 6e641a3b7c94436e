package graft.operators

import graft.{Tables => T}
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed Dataset API surface: case-class Encoders, groupByKey, and a
  * user-facing `Aggregator[IN, BUF, OUT]` (the typed custom-aggregate
  * path of SURVEY §2.2's UDF row; `BottomKAgg` covers the lower-level
  * TypedImperativeAggregate path).
  *
  * The Aggregator sums through java BigDecimal quantized to 4 dp — the
  * typed mirror of the library's exact-decimal convention, so the result
  * is order-independent and the DuckDB oracle matches bit-for-bit.
  */
object TypedOps {

  final case class LineSlim(l_returnflag: String, l_quantity: Double)

  /** Exact decimal sum of quantity: mergeable, order-independent. */
  object QtySum extends Aggregator[LineSlim, java.math.BigDecimal, Double] {
    private def dec(d: Double) = // valueOf = shortest-repr, matching Spark's cast
      java.math.BigDecimal.valueOf(d).setScale(4, java.math.RoundingMode.HALF_UP)
    override def zero: java.math.BigDecimal = java.math.BigDecimal.ZERO
    override def reduce(b: java.math.BigDecimal, a: LineSlim): java.math.BigDecimal =
      b.add(dec(a.l_quantity))
    override def merge(x: java.math.BigDecimal, y: java.math.BigDecimal): java.math.BigDecimal =
      x.add(y)
    override def finish(b: java.math.BigDecimal): Double = b.doubleValue()
    override def bufferEncoder: Encoder[java.math.BigDecimal] = Encoders.DECIMAL
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q51_typed_aggregator" -> { (s, d) =>
      import s.implicits._
      T.lineitem(s, d)
        .select($"l_returnflag", $"l_quantity")
        .as[LineSlim]
        .groupByKey(_.l_returnflag)
        .agg(QtySum.toColumn.name("sum_qty"))
        .toDF("l_returnflag", "sum_qty")
        .orderBy($"l_returnflag")
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q51_typed_aggregator" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
