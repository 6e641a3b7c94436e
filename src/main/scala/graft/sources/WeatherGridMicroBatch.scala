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
  */
class WeatherGridMicroBatchStream(start: Long, end: Long, interval: Long,
                                  locations: Int, maxSlotsPerTrigger: Long,
                                  schema: StructType = WeatherGridSource.SCHEMA)
    extends MicroBatchStream {

  private val totalSlots: Long = math.max((end - start) / interval, 0L) +
    (if ((end - start) % interval > 0) 1L else 0L)

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
      WeatherGridRangePartition(l.toLong, start + from * interval,
        start + until * interval): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WeatherGridRangeReaderFactory(interval, schema)

  override def commit(offset: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class WeatherGridRangePartition(loc: Long, fromTs: Long, untilTs: Long)
    extends InputPartition

class WeatherGridRangeReaderFactory(interval: Long, schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[WeatherGridRangePartition]
    val gen = new WeatherGridSource.RowGen(schema)
    new PartitionReader[InternalRow] {
      private var ts = part.fromTs - interval
      override def next(): Boolean = { ts += interval; ts < part.untilTs }
      override def get(): InternalRow = gen.row(part.loc, ts)
      override def close(): Unit = ()
    }
  }
}
