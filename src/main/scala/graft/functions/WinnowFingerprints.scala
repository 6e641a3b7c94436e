package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints over a Rabin–Karp ROLLING hash (the
  * MOSS scheme): polynomial hashes of every k-byte gram — each next hash
  * derived from the previous in O(1) ("subtract the outgoing byte's
  * B^(k-1) term, shift by B, add the incoming byte") — then the minimum
  * hash of every w-wide window, distinct + sorted, as the document's
  * fingerprint set. Guarantee (winnowing): any shared substring of
  * length >= k + w - 1 contributes at least one shared fingerprint.
  *
  * One fused codegen pass per document: the declarative mirror
  * recomputes every gram's polynomial from scratch (O(k) per gram) and
  * pays interpreted-lambda costs per window; values are identical
  * because the rolling recurrence is algebraically the same polynomial
  * mod M (asserted bit-for-bit in OperatorSpec against the from-scratch
  * chain). ASCII contract: hashes are over BYTES; the SQL mirror uses
  * per-character `ascii()`, identical on the ASCII corpus.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 2 && w >= 1, "need k >= 2, w >= 1")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"winnow_fps expects string, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    WinnowFingerprints.compute(v.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowFingerprints.compute($c, $k, $w)")

  override protected def withNewChildInternal(c: Expression): WinnowFingerprints =
    copy(child = c)
  override def prettyName: String = "winnow_fps"
}

object WinnowFingerprints {
  val B = 257L
  val M = 2147483647L // 2^31 - 1

  /** Rolling k-gram hashes + w-window minima + distinct sorted set. */
  def compute(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val nGrams = n - k + 1
    if (nGrams < w) return new GenericArrayData(Array.empty[Long])
    // B^(k-1) mod M for the outgoing byte's term
    var bk1 = 1L
    var j = 0
    while (j < k - 1) { bk1 = bk1 * B % M; j += 1 }
    val grams = new Array[Long](nGrams)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * B + (bytes(i) & 0xffL)) % M; i += 1 }
    grams(0) = h
    i = 1
    while (i < nGrams) {
      // rolling update: drop byte i-1, append byte i+k-1
      val out = (bytes(i - 1) & 0xffL) * bk1 % M
      h = ((h - out + M) * B + (bytes(i + k - 1) & 0xffL)) % M
      grams(i) = h
      i += 1
    }
    // w-window minima (w is small; windows overlap heavily so the naive
    // scan is fine — the rolling hash is the per-byte saving)
    val minima = new java.util.TreeSet[java.lang.Long]()
    i = 0
    while (i + w <= nGrams) {
      var m = grams(i)
      var t = 1
      while (t < w) { if (grams(i + t) < m) m = grams(i + t); t += 1 }
      minima.add(m)
      i += 1
    }
    val out = new Array[Long](minima.size())
    val it = minima.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  def winnow_fps(c: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(c), k, w))
}
