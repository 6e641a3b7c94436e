package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sorted distinct portable hashes of every character n-gram of a string,
  * fused into one codegen'd pass — replaces the
  * `array_sort(array_distinct(transform(sequence(..), i ->
  * graft_phash(substring(text, i, n)))))` chain, whose higher-order
  * lambdas evaluate interpreted per gram (~1.4us/gram measured at sf0.1,
  * ~10x the md5 itself). Bit-identical to the declarative form and to the
  * DuckDB oracle's md5-substring expression.
  *
  * ASCII inputs take a zero-copy byte-slice path; non-ASCII falls back to
  * code-point-correct slicing via UTF8String.substring.
  */
case class GramPHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "gram size must be positive")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"gram_phashes expects string, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    GramPHashes.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramPHashes.compute($c, $n);")

  override protected def withNewChildInternal(c: Expression): GramPHashes =
    copy(child = c)
  override def prettyName: String = "gram_phashes"
}

object GramPHashes {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    var ascii = true
    var i = 0
    while (ascii && i < bytes.length) { ascii = bytes(i) >= 0; i += 1 }
    val out =
      if (ascii) hashAsciiGrams(bytes, n)
      else hashGramsByCodePoint(s, n)
    java.util.Arrays.sort(out)
    // in-place dedup of the sorted array
    var w = 0
    i = 0
    while (i < out.length) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  /** ASCII: chars == bytes, grams are byte slices hashed in place. */
  private def hashAsciiGrams(bytes: Array[Byte], n: Int): Array[Long] = {
    val count = math.max(bytes.length - n + 1, 0)
    val out = new Array[Long](count)
    val md = digest.get()
    val buf = new Array[Byte](16)
    var i = 0
    while (i < count) {
      md.reset()
      md.update(bytes, i, n)
      md.digest(buf, 0, 16)
      out(i) = hash60(buf)
      i += 1
    }
    out
  }

  private def hashGramsByCodePoint(s: UTF8String, n: Int): Array[Long] = {
    val chars = s.numChars()
    val count = math.max(chars - n + 1, 0)
    val out = new Array[Long](count)
    val md = digest.get()
    val buf = new Array[Byte](16)
    var i = 0
    while (i < count) {
      val gram = s.substring(i, i + n).getBytes
      md.reset()
      md.update(gram)
      md.digest(buf, 0, 16)
      out(i) = hash60(buf)
      i += 1
    }
    out
  }

  /** First 15 hex digits of md5 == (big-endian first 8 bytes) >>> 4 —
    * same reduction as [[PortableHashExpr.hash60]].
    */
  private def hash60(d: Array[Byte]): Long = {
    val be = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
             ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
             ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
             ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    be >>> 4
  }

  def gram_phashes(c: Column, n: Int): Column =
    ColumnBridge.column(GramPHashes(ColumnBridge.expression(c), n))

  private[functions] def digestFor(): java.security.MessageDigest = digest.get()

  private[functions] def hash60Of(d: Array[Byte]): Long = hash60(d)
}

/** Sorted distinct portable hashes of every k-word shingle (consecutive
  * words joined by a single space), fused into one codegen'd pass.
  * Because `split(text, ' ')` segments on single spaces, the k-word
  * shingle `concat_ws(' ', w_i..w_{i+k-1})` is exactly the byte range of
  * the original text between the enclosing word boundaries — and 0x20
  * never occurs inside a UTF-8 multibyte sequence, so byte scanning is
  * correct for all inputs (empty words included). Bit-identical to the
  * declarative distinct-shingle transform + graft_phash chain.
  */
case class WordShinglePHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "shingle size must be positive")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"word_shingle_phashes expects string, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    WordShinglePHashes.compute(v.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShinglePHashes.compute($c, $k);")

  override protected def withNewChildInternal(c: Expression): WordShinglePHashes =
    copy(child = c)
  override def prettyName: String = "word_shingle_phashes"
}

object WordShinglePHashes {
  def compute(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    // word start offsets (words = segments between single spaces)
    var nWords = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nWords += 1; i += 1 }
    val starts = new Array[Int](nWords + 1) // sentinel: starts(n) = len+1
    starts(0) = 0
    var w = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { starts(w) = i + 1; w += 1 }
      i += 1
    }
    starts(nWords) = bytes.length + 1
    val count = math.max(nWords - k + 1, 0)
    val out = new Array[Long](count)
    val md = GramPHashes.digestFor()
    val buf = new Array[Byte](16)
    i = 0
    while (i < count) {
      val from = starts(i)
      val until = starts(i + k) - 1 // exclusive: char before next word start
      md.reset()
      md.update(bytes, from, until - from)
      md.digest(buf, 0, 16)
      out(i) = GramPHashes.hash60Of(buf)
      i += 1
    }
    java.util.Arrays.sort(out)
    var n = 0
    i = 0
    while (i < out.length) {
      if (n == 0 || out(i) != out(n - 1)) { out(n) = out(i); n += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, n))
  }

  def word_shingle_phashes(c: Column, k: Int): Column =
    ColumnBridge.column(WordShinglePHashes(ColumnBridge.expression(c), k))
}
