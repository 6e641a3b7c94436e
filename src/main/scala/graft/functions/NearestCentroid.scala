package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Per-row nearest-centroid assignment: given an embedding and ONE
  * broadcast array of (cell, centroid) structs, return the cell whose
  * centroid has the highest cosine similarity to the embedding.
  *
  * This is the map-only replacement for the crossJoin+groupBy assignment
  * shape (fan every row out K ways, then re-aggregate by row id): that
  * plan re-shuffles every full embedding through a hash aggregate, which
  * is the scale-killer at 100 TB. Here the K centroids ride along as one
  * broadcast value and the argmax is a single fused codegen'd loop per
  * row — assignment shuffles nothing.
  *
  * Determinism contract: centroids are scanned in array order and a
  * candidate replaces the best only on a STRICTLY greater cosine, so ties
  * resolve to the earliest array entry. Callers pass
  * `array_sort(collect_list(struct(cell, centroid)))`, making the winner
  * the smallest cell id — the oracle mirrors this with
  * `ROW_NUMBER() OVER (ORDER BY cos DESC, cell ASC)`. Cosines accumulate
  * in index order (same IEEE sequence as [[CosineSim]]), so Spark and
  * DuckDB compare bit-identical values.
  */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _),
            ArrayType(StructType(Array(f1, f2)), _)) =>
        f1.dataType == LongType &&
          (f2.dataType match {
            case ArrayType(FloatType, _) => true
            case _ => false
          })
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "nearest_centroid expects (array<float>, array<struct<cell: bigint, " +
        s"centroid: array<float>>>), got ${left.dataType.catalogString}, " +
        right.dataType.catalogString)
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    NearestCentroid.assign(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.NearestCentroid.assign($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "nearest_centroid"
}

object NearestCentroid {
  /** Argmax-cosine over the centroid structs; first entry wins ties.
    * NaN cosines (a zero-norm embedding or a collapsed zero centroid)
    * never win: `cos > bestCos` is false for NaN, and bestCell starts at
    * the FIRST (smallest, by the caller's array_sort) cell, so an
    * all-NaN row degrades to the smallest cell deterministically. The
    * oracle mirrors this with an `isnan` sort key ahead of the cosine
    * (DuckDB would otherwise sort NaN above every real value in DESC
    * order and pick a collapsed centroid Spark never picks).
    */
  def assign(emb: ArrayData, cents: ArrayData): Long = {
    val k = cents.numElements()
    var bestCell = if (k > 0) cents.getStruct(0, 2).getLong(0) else -1L
    var bestCos = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      val row = cents.getStruct(c, 2)
      val cell = row.getLong(0)
      val cent = row.getArray(1)
      val n = math.min(emb.numElements(), cent.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xi = emb.getFloat(i).toDouble
        val yi = cent.getFloat(i).toDouble
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      val cos = dot / (math.sqrt(na) * math.sqrt(nb))
      if (cos > bestCos) { bestCos = cos; bestCell = cell } // NaN never wins
      c += 1
    }
    bestCell
  }

  def nearest_centroid(emb: Column, cents: Column): Column =
    ColumnBridge.column(NearestCentroid(
      ColumnBridge.expression(emb), ColumnBridge.expression(cents)))
}
