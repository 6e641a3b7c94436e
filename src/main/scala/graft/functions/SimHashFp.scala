package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused SimHash fingerprint: split the text on single spaces, take the
  * portable 60-bit hash ([[PortableHashExpr.hash60]]) of every token
  * (empty tokens included — the exact token set of `split(text, ' ')` /
  * DuckDB `string_split`), and majority-vote the low `nBits` bits
  * (bit j set iff 2 * count_of_ones >= n_tokens).
  *
  * Replaces the declarative `transform(words, w -> graft_phash(w))` +
  * `aggregate(sequence(0, nBits-1), ...)` chain — which pays one
  * interpreted lambda pass per bit over the whole token array — with a
  * single loop: one md5 per token (no substring materialization; tokens
  * are hashed as byte ranges of the UTF-8 text) and one counter array.
  * Bit-identical to the declarative form and the DuckDB oracle
  * (`string_split` + md5 arithmetic over the same tokens).
  */
case class SimHashFp(child: Expression, nBits: Int) extends UnaryExpression {
  require(nBits >= 1 && nBits <= 60, "nBits must be in [1, 60]")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash_fp expects string, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    SimHashFp.compute(v.asInstanceOf[UTF8String], nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHashFp.compute($c, $nBits)")

  override protected def withNewChildInternal(c: Expression): SimHashFp =
    copy(child = c)
  override def prettyName: String = "simhash_fp"
}

object SimHashFp {
  /** One pass over the text: hash each space-delimited token (as a byte
    * range — a space byte can never occur inside a multi-byte UTF-8
    * sequence), count per-bit ones, majority-vote the fingerprint.
    */
  def compute(s: UTF8String, nBits: Int): Long = {
    val bytes = s.getBytes
    val counts = new Array[Int](nBits)
    var nTokens = 0
    var start = 0
    var i = 0
    val len = bytes.length
    while (i <= len) {
      if (i == len || bytes(i) == ' ') {
        val h = PortableHashExpr.hash60Bytes(bytes, start, i - start)
        var j = 0
        while (j < nBits) {
          counts(j) += ((h >>> j) & 1L).toInt
          j += 1
        }
        nTokens += 1
        start = i + 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < nBits) {
      if (2 * counts(j) >= nTokens) fp |= (1L << j)
      j += 1
    }
    fp
  }

  def simhash_fp(c: Column, nBits: Int): Column =
    ColumnBridge.column(SimHashFp(ColumnBridge.expression(c), nBits))
}
