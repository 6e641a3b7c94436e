package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The library's portable 60-bit hash (Dets.phash) as a native codegen'd
  * expression: MD5 of the UTF-8 bytes, first 60 bits as a positive long —
  * bit-identical to `conv(substring(md5(s),1,15),16,10)` (and to the
  * DuckDB oracle's `CAST('0x'||substring(md5(s),1,15) AS BIGINT)`), but
  * without materializing hex strings and running a base-16 string parse
  * per value. This sits under every shingle/word/gram hash in the dedup
  * and text operators — the highest-frequency scalar in the library.
  */
case class PortableHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_phash expects string, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    PortableHashExpr.hash60(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PortableHashExpr.hash60($c)")

  override protected def withNewChildInternal(c: Expression): PortableHashExpr =
    copy(child = c)
  override def prettyName: String = "graft_phash"
}

object PortableHashExpr {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex digits of md5 == (big-endian first 8 bytes) >>> 4. */
  def hash60(s: UTF8String): Long = {
    val b = s.getBytes
    hash60Bytes(b, 0, b.length)
  }

  /** [[hash60]] over a byte range — lets callers hash token slices
    * without materializing substrings ([[SimHashFp]]).
    */
  def hash60Bytes(bytes: Array[Byte], off: Int, len: Int): Long = {
    val md = digest.get()
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    val be = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
             ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
             ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
             ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    be >>> 4
  }

  def graft_phash(c: Column): Column =
    ColumnBridge.column(PortableHashExpr(ColumnBridge.expression(c)))
}
