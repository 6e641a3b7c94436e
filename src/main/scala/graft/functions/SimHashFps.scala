package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WIDE SimHash: `nWords` concatenated 60-bit fingerprint words over the
  * same space-split tokens as [[SimHashFp]] — the fingerprint widening
  * that lets d03's 4 disjoint bands grow past 15 bits (band width must
  * track log2(corpus), and 4 × bw ≤ 60 × words).
  *
  * Word sources (all replicable in the DuckDB oracle):
  *   - word 0: first 15 md5 hex digits of each token — EXACTLY
  *     [[SimHashFp]]'s fingerprint, bit for bit;
  *   - word 1: md5 hex digits 17–31 of the SAME digest — the upper half
  *     md5 already computed and [[SimHashFp]] discarded, so the 2-word
  *     fingerprint (enough for corpora to 2^29 docs) hashes NO more
  *     than the 1-word one;
  *   - words 2/3: the two halves of md5("s2:" ++ token) — one extra
  *     digest per token, only computed when nWords = 4 (corpora past
  *     2^29 docs).
  *
  * `nWords` is an Expression (not a constructor constant) so the word
  * count can come from the corpus-count broadcast IN-PLAN, like the band
  * width itself — no driver scalar, no plan recompile per corpus.
  */
case class SimHashFps(left: Expression, right: Expression, nBits: Int)
    extends BinaryExpression {
  require(nBits >= 1 && nBits <= 60, "nBits must be in [1, 60]")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash_fps expects (string, int), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(text: Any, nw: Any): Any =
    SimHashFps.compute(text.asInstanceOf[UTF8String], nBits,
                       nw.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, n) => s"graft.functions.SimHashFps.compute($t, $nBits, $n)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SimHashFps = copy(left = l, right = r)
  override def prettyName: String = "simhash_fps"
}

object SimHashFps {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val Salt2 = Array[Byte]('s', '2', ':')

  private def half(d: Array[Byte], off: Int): Long = {
    val be = ((d(off) & 0xffL) << 56) | ((d(off + 1) & 0xffL) << 48) |
             ((d(off + 2) & 0xffL) << 40) | ((d(off + 3) & 0xffL) << 32) |
             ((d(off + 4) & 0xffL) << 24) | ((d(off + 5) & 0xffL) << 16) |
             ((d(off + 6) & 0xffL) << 8) | (d(off + 7) & 0xffL)
    be >>> 4
  }

  /** One pass over the text: per token, one md5 (two when nWords = 4),
    * per-word-per-bit one counts, then the majority vote per word.
    * Word 0 is bit-identical to [[SimHashFp.compute]].
    */
  def compute(s: UTF8String, nBits: Int, nWords: Int): ArrayData = {
    require(nWords == 1 || nWords == 2 || nWords == 4,
      s"nWords must be 1, 2 or 4, got $nWords")
    val bytes = s.getBytes
    val counts = new Array[Int](nBits * nWords)
    var nTokens = 0
    var start = 0
    var i = 0
    val len = bytes.length
    val md = digest.get()
    while (i <= len) {
      if (i == len || bytes(i) == ' ') {
        md.reset()
        md.update(bytes, start, i - start)
        val d0 = md.digest()
        accumulate(counts, 0, nBits, half(d0, 0))
        if (nWords >= 2) accumulate(counts, nBits, nBits, half(d0, 8))
        if (nWords == 4) {
          md.reset()
          md.update(Salt2)
          md.update(bytes, start, i - start)
          val d1 = md.digest()
          accumulate(counts, 2 * nBits, nBits, half(d1, 0))
          accumulate(counts, 3 * nBits, nBits, half(d1, 8))
        }
        nTokens += 1
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Long](nWords)
    var w = 0
    while (w < nWords) {
      var fp = 0L
      var j = 0
      while (j < nBits) {
        if (2 * counts(w * nBits + j) >= nTokens) fp |= (1L << j)
        j += 1
      }
      out(w) = fp
      w += 1
    }
    new GenericArrayData(out)
  }

  private def accumulate(counts: Array[Int], base: Int, nBits: Int,
                         h: Long): Unit = {
    var j = 0
    while (j < nBits) {
      counts(base + j) += ((h >>> j) & 1L).toInt
      j += 1
    }
  }

  def simhash_fps(c: Column, nBits: Int, nWords: Column): Column =
    ColumnBridge.column(SimHashFps(
      ColumnBridge.expression(c), ColumnBridge.expression(nWords), nBits))
}
