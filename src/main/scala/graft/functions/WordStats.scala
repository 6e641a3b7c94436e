package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused word statistics for the quality-score formula (t02/t09/t20/
  * t22): one pass over the text computing (token count, distinct-token
  * count, stopword count) for the exact token set of `split(text, ' ')`
  * / DuckDB `string_split` — empty tokens from consecutive/leading/
  * trailing spaces included, same as the declarative chain.
  *
  * Replaces `split` + `size(array_distinct(words))` +
  * `size(filter(words, w -> ...))`: the higher-order `filter` evaluates
  * its lambda INTERPRETED per element (HigherOrderFunction is
  * CodegenFallback), and the chain materializes the token array plus an
  * extra distinct copy per row — three passes and two allocations where
  * one suffices. At 100 TB the quality gate is a pure map stage over
  * every document, so per-row constant factors are the scan budget.
  *
  * Returns a struct of three longs (not a packed word — a fixed-width
  * packing would cap tokens-per-document and crash on the pathological
  * megadoc a web-scale corpus always contains); callers read the fields
  * with codegen'd GetStructField and feed the IDENTICAL double
  * arithmetic the declarative formula used — bit-identical quality
  * scores, same DuckDB oracle.
  */
case class WordStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"word_stats expects string, got ${child.dataType.catalogString}")

  override def dataType: DataType = WordStats.schema
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    WordStats.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordStats.compute($c)")

  override protected def withNewChildInternal(c: Expression): WordStats =
    copy(child = c)
  override def prettyName: String = "word_stats"
}

object WordStats {
  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false)))

  /** One pass: tokens are byte ranges between 0x20 bytes (a space can
    * never occur inside a multi-byte UTF-8 sequence); distinct via exact
    * string equality (HashSet of token slices); stopwords are 'the'/'a'.
    */
  def compute(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val seen = new java.util.HashSet[UTF8String]()
    var nWords = 0L
    var nDistinct = 0L
    var nStop = 0L
    var start = 0
    var i = 0
    val len = bytes.length
    while (i <= len) {
      if (i == len || bytes(i) == ' ') {
        val tlen = i - start
        nWords += 1
        if ((tlen == 1 && bytes(start) == 'a') ||
            (tlen == 3 && bytes(start) == 't' &&
             bytes(start + 1) == 'h' && bytes(start + 2) == 'e'))
          nStop += 1
        if (seen.add(UTF8String.fromBytes(bytes, start, tlen)))
          nDistinct += 1
        start = i + 1
      }
      i += 1
    }
    InternalRow(nWords, nDistinct, nStop)
  }

  def word_stats(c: Column): Column =
    ColumnBridge.column(WordStats(ColumnBridge.expression(c)))

  /** Field accessors — codegen'd GetStructField. */
  def nWords(ws: Column): Column = ws.getField("n_words")
  def nDistinct(ws: Column): Column = ws.getField("n_distinct")
  def nStop(ws: Column): Column = ws.getField("n_stop")
}
