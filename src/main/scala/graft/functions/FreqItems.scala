package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a `TypedImperativeAggregate`:
  * at most k counters per group, O(k) state, and the MERGEABLE variant
  * (Agarwal et al., "Mergeable Summaries"): merge sums counters, then
  * subtracts the (k+1)-th largest count and drops non-positives —
  * preserving the deterministic GUARANTEE that any item with true count
  * > N/(k+1) survives arbitrary merge trees (partials on every
  * partition, constant-size shuffle). The surviving SET beyond that
  * guarantee depends on merge order, so queries assert the guarantee
  * (all exact-heavy items ⊆ sketch), not the raw item list.
  */
case class FreqItemsAgg(child: Expression, k: Int,
                        weight: Option[Expression] = None,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {
  require(k >= 1, "counter capacity must be positive")

  override def children: Seq[Expression] = child +: weight.toSeq
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType != StringType)
      TypeCheckFailure(
        s"freq_items expects a string item, got " + child.dataType.catalogString)
    else weight match {
      // the weighted update casts straight to Long - demand it at
      // analysis time instead of a mid-job ClassCastException
      case Some(w) if w.dataType != org.apache.spark.sql.types.LongType =>
        TypeCheckFailure(
          s"freq_items weight must be BIGINT, got " + w.dataType.catalogString)
      case _ => TypeCheckSuccess
    }
  }

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(buf: java.util.HashMap[String, Long],
                      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      weight match {
        case None =>
          val cur = buf.getOrDefault(item, 0L) // counters are >=1: 0 == absent
          if (cur != 0L) buf.put(item, cur + 1L)
          else if (buf.size < k) buf.put(item, 1L)
          else decrementAll(buf, 1L)
        case Some(wExpr) =>
          // Weighted update == merging the summary of w copies of the
          // item (a one-entry map), so the mergeable-variant bound
          // applies verbatim: any item with total weight > N/(k+1)
          // survives, independent of input order.
          val wv = wExpr.eval(input)
          if (wv != null) {
            val w = wv.asInstanceOf[Long]
            if (w > 0L) {
              buf.put(item, buf.getOrDefault(item, 0L) + w)
              trimToK(buf)
            }
          }
      }
    }
    buf
  }

  override def merge(buf: java.util.HashMap[String, Long],
                     other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.getOrDefault(e.getKey, 0L)
      buf.put(e.getKey, cur + e.getValue)
    }
    trimToK(buf)
    buf
  }

  /** Restores the ≤k-counters invariant: subtract the (k+1)-th largest
    * count and drop non-positives (Agarwal et al. merge rule). */
  private def trimToK(buf: java.util.HashMap[String, Long]): Unit = {
    if (buf.size > k) {
      val counts = new Array[Long](buf.size)
      var i = 0
      val vs = buf.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(buf.size - k - 1)
      decrementAll(buf, sub)
    }
  }

  private def decrementAll(buf: java.util.HashMap[String, Long], by: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= by) it.remove() else e.setValue(e.getValue - by)
    }
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val items = new Array[String](buf.size)
    val it = buf.keySet().iterator()
    var i = 0
    while (it.hasNext) { items(i) = it.next(); i += 1 }
    java.util.Arrays.sort(items, java.util.Comparator.naturalOrder[String]())
    new GenericArrayData(
      items.map(s => UTF8String.fromString(s).asInstanceOf[AnyRef]))
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    var size = 4
    val it0 = buf.entrySet().iterator()
    while (it0.hasNext) {
      size += 4 + it0.next().getKey.getBytes(StandardCharsets.UTF_8).length + 8
    }
    val bb = ByteBuffer.allocate(size)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes(StandardCharsets.UTF_8)
      bb.putInt(kb.length); bb.put(kb); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](bb.getInt)
      bb.get(kb)
      buf.put(new String(kb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItemsAgg =
    copy(child = newChildren.head,
         weight = if (newChildren.length > 1) Some(newChildren(1)) else None)
  override def prettyName: String = "freq_items"
}

object FreqItemsAgg {
  def freq_items(c: Column, k: Int): Column =
    ColumnBridge.column(
      FreqItemsAgg(ColumnBridge.expression(c), k).toAggregateExpression())

  /** Sketch over pre-aggregated (item, count) rows — lets a query
    * derive the sketch from an existing per-key count frame instead of
    * re-exploding the corpus. `w` must be LONG; non-positive weights
    * are ignored. */
  def freq_items_weighted(c: Column, w: Column, k: Int): Column =
    ColumnBridge.column(
      FreqItemsAgg(ColumnBridge.expression(c), k,
                   Some(ColumnBridge.expression(w))).toAggregateExpression())
}
