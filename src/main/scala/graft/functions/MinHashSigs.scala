package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All K minhash signature components in one pass: for base hashes m_i,
  * sig_k = min_i((a_k * m_i + b_k) mod p). Replaces K separate
  * `array_min(transform(...))` higher-order calls (K interpreted lambda
  * passes per document) with a single fused loop in codegen — the
  * signature stage is the per-document hot loop of MinHash LSH.
  * Arithmetic is identical to the declarative form (and the DuckDB
  * oracle): same (a*m+b)%p over the same m values.
  */
case class MinHashSigs(child: Expression, a: Array[Long], b: Array[Long], p: Long)
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sigs expects array<bigint>, got ${other.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val ms = v.asInstanceOf[ArrayData]
    MinHashSigs.compute(ms, a, b, p)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", a, "long[]")
    val bRef = ctx.addReferenceObj("mhB", b, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSigs.compute($c, $aRef, $bRef, ${p}L);")
  }

  override protected def withNewChildInternal(c: Expression): MinHashSigs =
    copy(child = c)
  override def prettyName: String = "minhash_sigs"
}

object MinHashSigs {
  def compute(ms: ArrayData, a: Array[Long], b: Array[Long], p: Long): ArrayData = {
    val k = a.length
    val out = Array.fill(k)(Long.MaxValue)
    val n = ms.numElements()
    var i = 0
    while (i < n) {
      val m = ms.getLong(i)
      var j = 0
      while (j < k) {
        val h = (a(j) * m + b(j)) % p
        if (h < out(j)) out(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def minhash_sigs(c: Column, a: Seq[Long], b: Seq[Long], p: Long): Column =
    ColumnBridge.column(
      MinHashSigs(ColumnBridge.expression(c), a.toArray, b.toArray, p))
}
