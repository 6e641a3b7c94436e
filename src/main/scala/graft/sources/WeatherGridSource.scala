package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.jdk.CollectionConverters._

/** DataSource V2 connector generalizing the reference's HTTP columnar scan
  * (O1: lambda_function.py:89-124 — fetch a dense 15-min grid of 8 weather
  * variables, decode columnar payload, emit rows). The reference fetches
  * ONE location per Lambda invocation; the idiomatic Spark generalization
  * is one InputPartition per location — 10k locations = 10k parallel
  * tasks, the natural 100 TB sharding for a fleet-scale scrape.
  *
  * No network in this environment, so the "API" is a deterministic
  * synthetic generator with the reference's exact shape: half-open
  * [start, end) grid at interval_s (lambda_function.py:106-111), the 8
  * minutely_15 variables in request order (lambda_function.py:27-36),
  * float measures with NaN holes (the wire format's missing-value
  * encoding, VariableWithValues.py:58-62).
  *
  * Scan-level pushdown: ts range predicates narrow the generated grid
  * (SupportsPushDownFilters) — the analog of the reference passing
  * `past_days`/`forecast_days` to the API instead of filtering locally.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.WeatherGridSource")
  *   .option("start", "2024-01-01 00:00:00").option("end", "2024-01-03 00:00:00")
  *   .option("locations", 4).option("interval_s", 900).load()
  * }}}
  */
class WeatherGridSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WeatherGridSource.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new WeatherGridTable(new CaseInsensitiveStringMap(properties))
}

object WeatherGridSource {
  /** Test hook: partition readers opened (local-mode single JVM) — lets
    * IngestSpec assert one source scan per ingest run.
    */
  private[graft] val readerOpens = new java.util.concurrent.atomic.AtomicLong(0)

  /** Reference sink schema: date key + 8 measures in request order
    * (lambda_function.py:155-165), plus location_id for the multi-location
    * generalization (WeatherApiResponse.LocationId).
    */
  val MEASURES: Seq[String] = Seq(
    "temperature_2m", "relative_humidity_2m", "apparent_temperature", "rain",
    "sunshine_duration", "precipitation", "dew_point_2m", "wind_speed_10m")
  val SCHEMA: StructType = StructType(
    StructField("location_id", LongType, nullable = false) +:
    StructField("ts", TimestampType, nullable = false) +:
    MEASURES.map(StructField(_, DoubleType, nullable = true)))

  def parseTs(s: String): Long = // micros since epoch, input UTC
    java.time.LocalDateTime.parse(s.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L

  /** Deterministic measure value; NaN holes every 50th slot/measure. */
  def value(loc: Long, slotMicros: Long, m: Int): Double = {
    val h = java.lang.Long.rotateLeft(
      (loc * 0x9e3779b97f4a7c15L) ^ (slotMicros / 1000000L) ^ (m * 0x85ebca6bL), 17)
    if (math.floorMod(h, 50L) == 0L) Double.NaN
    else math.floorMod(h, 20000L) / 100.0 - 50.0
  }
}

class WeatherGridTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "weather_grid"
  override def schema(): StructType = WeatherGridSource.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = {
    val interval = options.getOrDefault("interval_s", "900").toLong * 1000000L
    val maxSlots = options.getOrDefault("maxSlotsPerTrigger", "96").toLong
    // The real API's slots sit on absolute clock boundaries regardless of
    // the request window — anchor the grid to epoch multiples of interval
    // (first slot = smallest aligned ts >= start).
    val rawStart = WeatherGridSource.parseTs(
      options.getOrDefault("start", "2024-01-01 00:00:00"))
    val aligned = ((rawStart + interval - 1) / interval) * interval
    new WeatherGridScanBuilder(
      aligned,
      WeatherGridSource.parseTs(options.getOrDefault("end", "2024-01-03 00:00:00")),
      interval,
      options.getOrDefault("locations", "1").toInt,
      maxSlots)
  }
}

/** Pushdown: ts bounds tighten [start, end) before generation — rows that
  * a filter excludes are never produced (the API-side cut).
  */
class WeatherGridScanBuilder(var start: Long, var end: Long,
                             interval: Long, locations: Int,
                             maxSlotsPerTrigger: Long = 96L)
    extends ScanBuilder with SupportsPushDownFilters {
  private var pushed: Array[Filter] = Array.empty

  private def micros(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp => // full micro precision: getTime is ms-only
      Some(Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L)
    case i: java.time.Instant =>
      Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // Conservative pruning: tighten [start, end) to grid-aligned bounds
    // that provably contain every qualifying slot, and return ALL filters
    // so Spark re-applies them post-scan — the cut is a pure optimization,
    // correctness never depends on the rounding.
    def alignDown(m: Long): Long = // greatest grid slot <= m
      if (m <= start) start else start + ((m - start) / interval) * interval
    filters.foreach {
      case GreaterThan("ts", v) => micros(v).foreach(m => start = alignDown(m))
      case GreaterThanOrEqual("ts", v) => micros(v).foreach(m => start = alignDown(m))
      case LessThan("ts", v) => micros(v).foreach(m => end = math.min(end, m))
      case LessThanOrEqual("ts", v) => micros(v).foreach(m => end = math.min(end, m + 1))
      case _ =>
    }
    pushed = filters.filter {
      case GreaterThan("ts", _) | GreaterThanOrEqual("ts", _)
         | LessThan("ts", _) | LessThanOrEqual("ts", _) => true
      case _ => false
    }
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan =
    new WeatherGridScan(start, end, interval, locations, maxSlotsPerTrigger)
}

class WeatherGridScan(start: Long, end: Long, interval: Long, locations: Int,
                      maxSlotsPerTrigger: Long = 96L)
    extends Scan with Batch {
  override def readSchema(): StructType = WeatherGridSource.SCHEMA
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new WeatherGridMicroBatchStream(start, end, interval, locations,
      maxSlotsPerTrigger)
  override def description(): String =
    s"weather_grid [$start, $end) step=$interval locs=$locations"

  // one partition per location: the reference's per-invocation unit
  override def planInputPartitions(): Array[InputPartition] =
    (0 until locations).map(l => WeatherGridPartition(l.toLong): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new WeatherGridReaderFactory(start, end, interval)
}

case class WeatherGridPartition(loc: Long) extends InputPartition

class WeatherGridReaderFactory(start: Long, end: Long, interval: Long)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    WeatherGridSource.readerOpens.incrementAndGet() // test hook: scans-per-run
    val loc = p.asInstanceOf[WeatherGridPartition].loc
    new PartitionReader[InternalRow] {
      private var ts = start - interval
      override def next(): Boolean = { ts += interval; ts < end } // half-open
      override def get(): InternalRow = {
        val vals = new Array[Any](2 + WeatherGridSource.MEASURES.size)
        vals(0) = loc
        vals(1) = ts
        var m = 0
        while (m < WeatherGridSource.MEASURES.size) {
          vals(2 + m) = WeatherGridSource.value(loc, ts, m)
          m += 1
        }
        InternalRow.fromSeq(vals.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
