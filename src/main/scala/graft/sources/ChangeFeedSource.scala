package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration
import scala.jdk.CollectionConverters._

/** CHANGE DATA FEED over a [[SnapshotLog]] store — the incremental-read
  * half of the manifest layer (Delta's `readChangeFeed` in miniature):
  * each committed version's ROW-LEVEL changes, tagged `_change_type` ∈
  * insert | delete | update_preimage | update_postimage and
  * `_change_version`, WITHOUT diffing table contents:
  *
  *  - an APPEND version's changes are its added files' rows (manifest
  *    diff names exactly those files — O(delta) IO per version, the
  *    property that lets a 100 TB CDC consumer tail the table instead
  *    of re-scanning it), `_change_type = 'insert'` stamped by the
  *    reader;
  *  - a DML version (COW/MoR delete, MERGE) emits the explicit change
  *    files its commit wrote (`#cdc:` manifest headers — Delta's
  *    `_change_data/` idea): full-row delete preimages and update
  *    pre/post images, so a replica tailing the feed stays byte-equal
  *    through the FULL DML surface instead of silently diverging
  *    (round-18 verdict #1);
  *  - a pure byte-moving rewrite (compaction / z-order) emits NOTHING
  *    (Delta's dataChange=false), which q104 pins;
  *  - a RESTORE through `restoreVersion(s, dir, v)` emits its rollback
  *    as file-diff deletes + inserts (the 2-arg metadata-only restore
  *    stays silent — prefer the CDC overload on a tailed store).
  *
  * Surfaces (one Scan, both read paths): BATCH = all changes in
  * versions (fromVersion, latest] (q111/q113 hash-check it end-to-end,
  * incl. this source's own parquet row decoding); MICRO-BATCH = one
  * committed version per trigger (admission control), AvailableNow
  * drains exactly to the head captured at start.
  *
  * The feed schema resolves from the manifests' `#schema=` headers
  * UNIONED across the tailed range — O(range) log text, zero footer
  * opens, and correct on schema-evolved stores where the old
  * first-file-of-head inference was file-order-dependent (round-18
  * review #1); stores written before the header fall back to a footer
  * union of the range's contributed files. Per-file readers decode
  * parquet straight off the footer schema with column projection
  * pushed into the parquet read schema; a column a file predates reads
  * as NULL (the mergeSchema convention). Spark's file-source machinery
  * is bypassed on purpose: it plans whole directories, not
  * manifest-diff slices.
  */
class ChangeFeedSource extends TableProvider {
  // the end version CAPTURED when the schema was resolved: a batch
  // scan must plan EXACTLY the range its schema was unioned over — a
  // commit landing (and evolving the schema) between inferSchema and
  // plan time would otherwise be fed with the older schema, silently
  // dropping its new column instead of the documented union semantics
  // (round-19 advice #3). Spark calls inferSchema then getTable on
  // this same provider instance.
  @volatile private var resolvedTo: Option[(String, Int)] = None

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val dir = options.get("path")
    val (schema, to) = ChangeFeed.feedSchemaAt(dir,
      ChangeFeed.resolveFrom(dir, options))
    resolvedTo = Some((dir, to))
    schema
  }
  // the schema Spark hands back IS inferSchema's result — reuse it so
  // the log walk happens once per read, not once per table/scan-builder
  // call (round-18 review #8)
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val o = new CaseInsensitiveStringMap(properties)
    val captured = resolvedTo.collect {
      case (d, to) if d == o.get("path") => to
    }
    new ChangeFeedTable(schema, o, captured)
  }
}

object ChangeFeed {
  import org.apache.spark.sql.{DataFrame, SparkSession}

  /** Batch read: all changes in versions (fromVersion, latest]. */
  def readBatch(s: SparkSession, dir: String, fromVersion: Int): DataFrame =
    s.read.format("graft.sources.ChangeFeedSource")
      .option("path", dir).option("fromVersion", fromVersion).load()

  /** Batch read of the changes in (fromVersion, latest] whose `column`
    * falls in [lo, hi] — PREDICATE SKIPPING inside the feed (round-19
    * verdict #5): the manifests already carry `#range:` stats for each
    * version's appended data files AND its CDC change files, so the
    * scan plans only the change files whose stats can intersect the
    * range (a range-scoped sync of a 100 TB tailed store opens the few
    * files that own the range, not the whole delta). Files without
    * stats are read (conservative), and the row predicate still
    * applies — pruning is semantically invisible. */
  def readBatchWhere(s: SparkSession, dir: String, fromVersion: Int,
                     column: String, lo: Long, hi: Long): DataFrame =
    s.read.format("graft.sources.ChangeFeedSource")
      .option("path", dir).option("fromVersion", fromVersion)
      .option("pruneColumn", column)
      .option("pruneLo", lo).option("pruneHi", hi).load()
      .filter(org.apache.spark.sql.functions.col(column).between(lo, hi))

  /** Streaming read: tails the store one committed version per
    * micro-batch, starting after `fromVersion`. */
  def readStream(s: SparkSession, dir: String, fromVersion: Int): DataFrame =
    s.readStream.format("graft.sources.ChangeFeedSource")
      .option("path", dir).option("fromVersion", fromVersion).load()

  /** Batch read of all changes committed strictly AFTER the wall-clock
    * instant (Delta's `startingTimestamp`): resolves against the
    * manifests' commit mtimes — the versionAsOf clock — so "what
    * changed since last night's sync" needs no version bookkeeping. */
  def readBatchSince(s: SparkSession, dir: String, tsMillis: Long): DataFrame =
    s.read.format("graft.sources.ChangeFeedSource")
      .option("path", dir).option("fromTimestamp", tsMillis).load()

  /** Streaming tail starting strictly after the wall-clock instant. */
  def readStreamSince(s: SparkSession, dir: String,
                      tsMillis: Long): DataFrame =
    s.readStream.format("graft.sources.ChangeFeedSource")
      .option("path", dir).option("fromTimestamp", tsMillis).load()

  /** The exclusive starting version: an explicit `fromVersion` wins;
    * else `fromTimestamp` (epoch millis) resolves to the largest
    * version committed at or before it — versions committed strictly
    * after the instant feed (an instant before the first commit feeds
    * everything); else 0. */
  private[graft] def resolveFrom(dir: String,
                                 options: CaseInsensitiveStringMap): Int =
    Option(options.get("fromVersion")).map(_.toInt).getOrElse {
      Option(options.get("fromTimestamp")).map { t =>
        val ts = t.toLong
        SnapshotLog.versions(dir)
          .filter(v => SnapshotLog.commitTimeMillis(dir, v) <= ts)
          .maxOption.getOrElse(0)
      }.getOrElse(0)
    }

  /** The session Hadoop conf on the driver (the DSv2 entry points run
    * there) — NOT a bare `new Configuration()`, so non-default
    * filesystem/credential settings reach the feed's planning and,
    * serialized through the reader factory, its row decoding
    * (round-18 advice #4). */
  private[graft] def driverHadoopConf(): org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()

  /** The data files version `v` ADDED, empty for rewrite versions —
    * the O(delta) planning unit of an append's feed (and the spec's
    * direct pin that a feed batch touches only these files). */
  private[graft] def addedDataFiles(dir: String, v: Int): Seq[String] = {
    val cur = SnapshotLog.dataEntries(SnapshotLog.manifest(dir, v))
    val prev =
      if (v <= 1) Seq.empty
      else SnapshotLog.dataEntries(SnapshotLog.manifest(dir, v - 1))
    val removed = prev.toSet -- cur.toSet
    if (removed.nonEmpty) Seq.empty // rewrite: moves bytes, not rows
    else (cur.toSet -- prev.toSet).toSeq.sorted
  }

  /** What version `v` contributes to the feed: its explicit CDC change
    * files when the commit wrote them (DML versions; `isChange=true` —
    * `_change_type` is a real file column), else its appended data
    * files (insert-only), else nothing (byte-moving rewrites). */
  private[graft] def feedEntries(dir: String, v: Int)
      : Seq[(String, Boolean)] = {
    val cdc = SnapshotLog.cdcFiles(dir, v)
    if (cdc.nonEmpty) cdc.sorted.map((_, true))
    else addedDataFiles(dir, v).map((_, false))
  }

  private[graft] def footerSchema(path: String,
                                  conf: org.apache.hadoop.conf.Configuration)
      : org.apache.parquet.schema.MessageType = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path), conf))
    try r.getFooter.getFileMetaData.getSchema finally r.close()
  }

  /** Spark type of a parquet primitive field — the supported feed
    * column surface; anything else (nested groups, timestamps,
    * decimals) fails loud at schema time, not mid-read. */
  private[graft] def sparkTypeOf(f: org.apache.parquet.schema.Type)
      : DataType = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    require(f.isPrimitive,
      s"change feed supports primitive columns only; '${f.getName}' is nested")
    val p = f.asPrimitiveType()
    val ann = p.getLogicalTypeAnnotation
    p.getPrimitiveTypeName match {
      case INT64 if ann == null ||
        ann.isInstanceOf[LogicalTypeAnnotation.IntLogicalTypeAnnotation] =>
        LongType
      case INT32 if ann == null ||
        ann.isInstanceOf[LogicalTypeAnnotation.IntLogicalTypeAnnotation] =>
        IntegerType
      case DOUBLE  => DoubleType
      case FLOAT   => FloatType
      case BOOLEAN => BooleanType
      case BINARY if
        ann.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
        StringType
      case other => throw new IllegalArgumentException(
        s"change feed: unsupported column '${f.getName}' ($other, $ann)")
    }
  }

  /** First-seen-order field union, keyed by PHYSICAL name (column
    * mapping: a rename changes only the logical name, so the same
    * physical column must union to ONE field — surfaced under its
    * LATEST logical name, the r20 rename contract — while a re-added
    * dropped column has a fresh physical and unions separately).
    * An existing physical keeps its first type (the evolvedSchema
    * rule); on unmapped stores physical == name and this is exactly
    * the old name-keyed union. */
  private def unionFields(schemas: Seq[StructType]): Seq[StructField] = {
    val out = scala.collection.mutable.LinkedHashMap[String, StructField]()
    schemas.foreach(_.fields.foreach { f =>
      val p = SnapshotLog.physicalName(f)
      out.get(p) match {
        case None       => out(p) = f
        case Some(prev) => out(p) = f.copy(dataType = prev.dataType)
      }
    })
    out.values.toSeq
  }

  /** Feed schema over the TAILED RANGE (fromVersion, latest]: the
    * union of each range version's table schema from its manifest's
    * `#schema=` header (O(range) log text), falling back per version
    * to a footer union of the files it contributes (legacy stores),
    * plus the `_change_type` / `_change_version` tags. Union — not
    * head-version — because a pre-evolution batch must still NULL-fill
    * the evolved column and a post-evolution batch must carry it,
    * independent of file order (round-18 review #1). */
  private[graft] def feedSchema(dir: String, fromVersion: Int): StructType =
    feedSchemaAt(dir, fromVersion)._1

  /** [[feedSchema]] plus the END VERSION the union covered — captured
    * so a batch scan plans exactly this range (round-19 advice #3). */
  private[graft] def feedSchemaAt(dir: String, fromVersion: Int)
      : (StructType, Int) = {
    require(dir != null, "change feed requires a 'path' option")
    val conf = driverHadoopConf()
    val to = SnapshotLog.latestVersion(dir)
    def fromFooters(files: Seq[String]): Seq[StructType] = files.map { f =>
      val mt = footerSchema(s"$dir/$f", conf)
      StructType(mt.getFields.asScala.toSeq.map(g =>
        StructField(g.getName, sparkTypeOf(g), nullable = true)))
    }
    val perVersion = ((fromVersion + 1) to to).flatMap { v =>
      SnapshotLog.tableSchema(dir, v).map(Seq(_)).getOrElse(
        fromFooters(feedEntries(dir, v).map(_._1)))
    }
    // an empty tailed range (stream started at head) still needs a
    // schema: the head version's, by header or legacy head-file footer
    val schemas =
      if (perVersion.nonEmpty) perVersion
      else SnapshotLog.tableSchema(dir, to).map(Seq(_)).getOrElse {
        val files = SnapshotLog.dataEntries(SnapshotLog.manifest(dir, to))
        require(files.nonEmpty, s"store at $dir has no data files")
        fromFooters(files.take(1))
      }
    // ALL THREE tag names shadow same-named user columns uniformly
    // (review: _change_timestamp was missing here, so a user column of
    // that name duplicated the field and the reader overwrote it)
    val dataFields = unionFields(schemas)
      .filterNot(f => f.name == "_change_type" ||
        f.name == "_change_version" || f.name == "_change_timestamp")
      // field METADATA survives: it carries the column-mapping
      // physical name the per-file readers project by
      .map(f => StructField(f.name, f.dataType, nullable = true,
        metadata = f.metadata))
    // a range spanning a DROP + RE-ADD of one logical name holds two
    // distinct physical columns under that name — one feed schema
    // cannot carry both; fail loud with the split escape hatch
    val dup = dataFields.groupBy(_.name).filter(_._2.size > 1).keys.toSeq
    require(dup.isEmpty,
      s"change feed range at $dir spans conflicting schema generations " +
        s"for column(s) ${dup.sorted.mkString(",")} (drop + re-add) — " +
        "tail the ranges on either side of the re-add separately")
    (StructType(dataFields :+
      StructField("_change_type", StringType, nullable = false) :+
      StructField("_change_version", LongType, nullable = false) :+
      StructField("_change_timestamp", TimestampType, nullable = false)),
      to)
  }

  /** The feed's file plan over (from, to], each entry flagged KEPT
    * under the optional prune range: a file is skipped only when its
    * version's own manifest stats PROVE `column` cannot intersect
    * [lo, hi] (no stat = kept, conservative). Factored out so the
    * spec pins kept/total counts directly against what
    * planInputPartitions reads. */
  private[graft] def plannedEntries(dir: String, from: Int, to: Int,
                                    prune: Option[(String, Long, Long)])
      : Seq[(Int, String, Boolean, Boolean)] =
    ((from + 1) to to).flatMap { v =>
      lazy val stats = SnapshotLog.versionStats(dir, v)
      feedEntries(dir, v).map { case (f, isChange) =>
        val kept = prune match {
          case None => true
          case Some((c, lo, hi)) => stats.get((f, c)) match {
            case Some((mn, mx)) => mx >= lo && mn <= hi
            case None           => true
          }
        }
        (v, f, isChange, kept)
      }
    }
}

class ChangeFeedTable(schema0: StructType,
                      options: CaseInsensitiveStringMap,
                      capturedTo: Option[Int])
    extends Table with SupportsRead {
  private val dir = options.get("path")
  private val prune = Option(options.get("pruneColumn")).map(c =>
    (c, options.get("pruneLo").toLong, options.get("pruneHi").toLong))
  override def name(): String = s"change_feed($dir)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ChangeFeedScanBuilder(dir,
      ChangeFeed.resolveFrom(dir, options), schema0, capturedTo, prune)
}

/** Column pruning reaches the parquet readers (the projection is
  * pushed into each file's read schema); row filters stay Spark-side
  * (a CDC feed is consumed whole by definition) — but the OPTIONAL
  * key-range prune option skips whole change files off the manifest
  * stats. */
class ChangeFeedScanBuilder(dir: String, fromVersion: Int,
                            full: StructType, capturedTo: Option[Int],
                            prune: Option[(String, Long, Long)])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var readSchema: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    readSchema = requiredSchema
  override def build(): Scan =
    new ChangeFeedScan(dir, fromVersion, readSchema, capturedTo, prune)
}

class ChangeFeedScan(dir: String, fromVersion: Int, schema: StructType,
                     capturedTo: Option[Int] = None,
                     prune: Option[(String, Long, Long)] = None)
    extends Scan with Batch {
  // captured ONCE on the driver, shipped serialized to every reader —
  // the feed honors session filesystem/credential settings end to end
  private val conf =
    new SerializableConfiguration(ChangeFeed.driverHadoopConf())
  // logical -> physical (column mapping): derived from the scan's
  // schema metadata here on the driver, because Spark's column pruning
  // may hand the reader a metadata-stripped requiredSchema
  private val physMap: Map[String, String] = schema.fields
    .map(f => f.name -> SnapshotLog.physicalName(f)).toMap

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"change_feed $dir from=v$fromVersion cols=${schema.fieldNames.mkString(",")}"

  // batch: every change version in the CAPTURED range (the range the
  // schema was unioned over — never past it, round-19 advice #3),
  // O(delta) files each, minus the files the prune range's stats
  // exclude
  override def planInputPartitions(): Array[InputPartition] = {
    val to = capturedTo.getOrElse(
      SnapshotLog.versions(dir).lastOption.getOrElse(0))
    ChangeFeed.plannedEntries(dir, fromVersion, to, prune)
      .collect { case (v, f, isChange, true) =>
        ChangeFeedPartition(s"$dir/$f", v, isChange,
          SnapshotLog.commitTimeMillis(dir, v)): InputPartition
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ChangeFeedReaderFactory(schema, physMap, conf)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ChangeFeedMicroBatchStream(dir, fromVersion, schema, physMap, conf)
}

case class ChangeFeedPartition(path: String, version: Int,
                               isChange: Boolean, commitMs: Long)
    extends InputPartition

/** One committed version per micro-batch: admission control caps each
  * trigger's end offset at start+1, so the stream applies versions in
  * commit order — the consumer sees version boundaries as batch
  * boundaries (the foreachBatch-apply contract). AvailableNow captures
  * the head version at start and drains exactly to it. */
class ChangeFeedMicroBatchStream(dir: String, fromVersion: Int,
                                 schema: StructType,
                                 physMap: Map[String, String],
                                 conf: SerializableConfiguration)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private case class VersionOffset(v: Int) extends Offset {
    override def json(): String = v.toString
  }

  @volatile private var availableTarget: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableTarget = Some(math.max(fromVersion,
      SnapshotLog.versions(dir).lastOption.getOrElse(fromVersion)))

  override def initialOffset(): Offset = VersionOffset(fromVersion)
  override def deserializeOffset(json: String): Offset =
    VersionOffset(json.toInt)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[VersionOffset].v
    val cap = availableTarget.getOrElse(
      SnapshotLog.versions(dir).lastOption.getOrElse(fromVersion))
    VersionOffset(if (from < cap) from + 1 else from)
  }

  override def reportLatestOffset(): Offset =
    VersionOffset(availableTarget.getOrElse(
      SnapshotLog.versions(dir).lastOption.getOrElse(fromVersion)))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: latestOffset(start, limit) is used")

  override def planInputPartitions(s: Offset, e: Offset): Array[InputPartition] = {
    val from = s.asInstanceOf[VersionOffset].v
    val to = e.asInstanceOf[VersionOffset].v
    ((from + 1) to to).flatMap { v =>
      val ts = SnapshotLog.commitTimeMillis(dir, v)
      ChangeFeed.feedEntries(dir, v).map { case (f, isChange) =>
        ChangeFeedPartition(s"$dir/$f", v, isChange, ts): InputPartition
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ChangeFeedReaderFactory(schema, physMap, conf)

  override def commit(offset: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Reads ONE contributed file through parquet-hadoop's Group API with
  * the requested columns projected into the read schema (column
  * pruning at the parquet layer, not post-hoc), converting rows
  * straight to InternalRow; `_change_version` is stamped from the
  * partition, `_change_type` is a real column of a CDC change file and
  * the literal 'insert' for an appended data file. A column the file
  * predates reads as NULL (the mergeSchema convention). */
class ChangeFeedReaderFactory(schema: StructType,
                              physMap: Map[String, String],
                              conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[ChangeFeedPartition]
    new ChangeFeedReader(part.path, part.version, part.isChange,
      part.commitMs, schema, physMap, conf.value)
  }
}

class ChangeFeedReader(path: String, version: Int, isChange: Boolean,
                       commitMs: Long, schema: StructType,
                       physMap: Map[String, String],
                       baseConf: org.apache.hadoop.conf.Configuration)
    extends PartitionReader[InternalRow] {
  import org.apache.parquet.example.data.Group
  import org.apache.parquet.hadoop.ParquetReader
  import org.apache.parquet.hadoop.example.GroupReadSupport
  import org.apache.parquet.hadoop.api.ReadSupport

  // per-reader copy: Configuration is mutable and the factory's base
  // is shared across an executor's readers
  private val conf = new org.apache.hadoop.conf.Configuration(baseConf)
  private val fileSchema = ChangeFeed.footerSchema(path, conf)
  // `_change_type` is a REAL column of a change file; for a plain
  // appended data file it's synthesized as 'insert'
  private def phys(n: String): String = physMap.getOrElse(n, n)
  private val wanted = schema.fieldNames
    .filter(n => n != "_change_version" && n != "_change_timestamp" &&
      (isChange || n != "_change_type"))
    .map(phys)
    .toSet
  // project the requested columns that EXIST in this file; if none do
  // (count-only reads, or a file predating every requested column),
  // read the narrowest primitive just to drive row iteration
  private val projected = {
    val fields = fileSchema.getFields.asScala.filter(f =>
      wanted.contains(f.getName))
    def width(t: org.apache.parquet.schema.Type): Int = {
      import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
      if (!t.isPrimitive) 64
      else t.asPrimitiveType().getPrimitiveTypeName match {
        case BOOLEAN        => 1
        case INT32 | FLOAT  => 4
        case INT64 | DOUBLE => 8
        case _              => 32 // binary/string: width unknown, avoid
      }
    }
    val eff = if (fields.nonEmpty) fields
              else Seq(fileSchema.getFields.asScala.minBy(width))
    new org.apache.parquet.schema.MessageType(fileSchema.getName, eff.asJava)
  }
  conf.set(ReadSupport.PARQUET_READ_SCHEMA, projected.toString)

  private val reader: ParquetReader[Group] =
    ParquetReader.builder(new GroupReadSupport(),
      new org.apache.hadoop.fs.Path(path)).withConf(conf).build()

  // per output field: extraction plan (projected-group index or tag)
  private val FieldVersion = -1
  private val FieldNull = -2
  private val FieldInsertTag = -3
  private val FieldCommitTs = -4
  private val plan: Array[(Int, DataType)] = schema.fields.map { f =>
    if (f.name == "_change_version") (FieldVersion, f.dataType)
    else if (f.name == "_change_timestamp") (FieldCommitTs, f.dataType)
    else if (f.name == "_change_type" && !isChange)
      (FieldInsertTag, f.dataType)
    else if (projected.containsField(phys(f.name)))
      (projected.getFieldIndex(phys(f.name)), f.dataType)
    else (FieldNull, f.dataType)
  }

  private val InsertTag = UTF8String.fromString("insert")

  private var cur: Group = _
  override def next(): Boolean = { cur = reader.read(); cur != null }

  override def get(): InternalRow = {
    val vals = new Array[Any](plan.length)
    var i = 0
    while (i < plan.length) {
      vals(i) = plan(i) match {
        case (FieldVersion, _)   => version.toLong
        case (FieldNull, _)      => null
        case (FieldInsertTag, _) => InsertTag
        case (FieldCommitTs, _)  => commitMs * 1000L // micros (TimestampType)
        case (idx, dt) =>
          if (cur.getFieldRepetitionCount(idx) == 0) null
          else dt match {
            case LongType    => cur.getLong(idx, 0)
            case IntegerType => cur.getInteger(idx, 0)
            case DoubleType  => cur.getDouble(idx, 0)
            case FloatType   => cur.getFloat(idx, 0)
            case BooleanType => cur.getBoolean(idx, 0)
            case StringType  =>
              UTF8String.fromBytes(cur.getBinary(idx, 0).getBytes)
            case other => throw new IllegalStateException(
              s"change feed: unsupported read type $other")
          }
      }
      i += 1
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  override def close(): Unit = reader.close()
}
