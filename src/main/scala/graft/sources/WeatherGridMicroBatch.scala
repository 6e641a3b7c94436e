package graft.sources

import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Streaming form of the weather-grid source: a `MicroBatchStream` whose
  * offset is the global slot index — the Spark-native restatement of the
  * reference's cursor-based micro-batch loop (SURVEY O5/O12: CloudWatch
  * cron + MAX(date) cursor == trigger + offset log). Each trigger emits at
  * most `maxSlotsPerTrigger` new slots across all locations; the offset
  * checkpoint IS the cursor, so restart-resume comes from Spark's offset
  * log instead of a SELECT MAX over the sink.
  *
  * The per-trigger readers are the SAME wire-framed path the batch scan
  * uses ([[WeatherGridSource.wireReader]]): the production loop (O1+O12,
  * deploy.sh:36-37 + lambda_function.py:89-124) exercises frame decode —
  * including the in-stream error magic — on every micro-batch, not just
  * on full-table reads. A wire error fails the trigger before its offset
  * commits, so the restarted query re-reads the range exactly once
  * (StreamingSpec pins fail-then-recover).
  */
class WeatherGridMicroBatchStream(start: Long, end: Long, interval: Long,
                                  locations: Int, maxSlotsPerTrigger: Long,
                                  schema: StructType = WeatherGridSource.SCHEMA,
                                  monthly: Boolean = false)
    extends MicroBatchStream {

  // monthly slots are calendar points, not an arithmetic grid — enumerate
  // them once (months are O(window/30d): tiny) so offsets can stay indices
  private lazy val months: Array[Long] =
    WeatherGridSource.monthSlots(start, end).toArray

  private val totalSlots: Long =
    if (monthly) WeatherGridSource.monthSlots(start, end).size.toLong
    else math.max((end - start) / interval, 0L) +
      (if ((end - start) % interval > 0) 1L else 0L)

  /** Slot index -> the half-open ts bound it cuts at. */
  private def slotTs(slot: Long): Long =
    if (monthly) { if (slot >= months.length) end else months(slot.toInt) }
    else start + slot * interval

  private case class SlotOffset(slot: Long) extends Offset {
    override def json(): String = slot.toString
  }

  // Rate limiting: each latestOffset() call (one per trigger) advances the
  // reported horizon by at most maxSlotsPerTrigger. Capping inside
  // planInputPartitions instead would silently skip slots (Spark
  // checkpoints the full latestOffset), and keying off commit() stalls:
  // the engine checks latestOffset before committing the previous batch.
  @volatile private var horizon: Long = 0L

  override def initialOffset(): Offset = SlotOffset(0L)
  override def deserializeOffset(json: String): Offset = {
    // restart path: checkpointed offsets arrive here — clamp the horizon
    // up so latestOffset never regresses below processed slots (a fresh
    // instance starting at 0 would re-emit them as duplicates)
    val slot = json.toLong
    if (slot > horizon) horizon = slot
    SlotOffset(slot)
  }
  override def latestOffset(): Offset = {
    horizon = math.min(horizon + maxSlotsPerTrigger, totalSlots)
    SlotOffset(horizon)
  }

  override def planInputPartitions(s: Offset, e: Offset): Array[InputPartition] = {
    val from = s.asInstanceOf[SlotOffset].slot
    if (from > horizon) horizon = from // belt-and-braces restart clamp
    val until = math.min(e.asInstanceOf[SlotOffset].slot, totalSlots)
    (0 until locations).map(l =>
      WeatherGridRangePartition(l.toLong, slotTs(from),
        slotTs(until)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WeatherGridRangeReaderFactory(interval, schema, monthly)

  override def commit(offset: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class WeatherGridRangePartition(loc: Long, fromTs: Long, untilTs: Long)
    extends InputPartition

class WeatherGridRangeReaderFactory(interval: Long, schema: StructType,
                                    monthly: Boolean = false)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[WeatherGridRangePartition]
    // fault hook: consume one pending injection (test-only, local mode)
    val inject = WeatherGridSource.streamWireErrors
      .getAndUpdate(n => math.max(0, n - 1)) > 0
    WeatherGridSource.wireReader(part.loc, part.fromTs, part.untilTs,
      interval, monthly, schema, inject)
  }
}
