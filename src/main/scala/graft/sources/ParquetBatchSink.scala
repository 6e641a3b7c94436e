package graft.sources

import java.util
import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.jdk.CollectionConverters._

/** DataSource V2 batch SINK with the full two-phase commit protocol —
  * the write-side counterpart of [[WeatherGridSource]] (the reference's
  * load boundary, lambda_function.py:176-186, as a first-class connector
  * instead of a DataFrameWriter call).
  *
  * Protocol (what a 1000-executor job needs from a sink):
  *  - each task's [[DataWriter]] streams rows into its own staged parquet
  *    file (`_staging_<queryId>/part-p<partition>-t<task>.parquet`) — no
  *    coordination during the write;
  *  - task commit returns the staged file name as its commit message;
  *    task abort deletes the staged file — a speculative or failed
  *    attempt can never corrupt the sink;
  *  - job commit moves EXACTLY the files named in the collected commit
  *    messages into the sink directory (files from failed/speculative
  *    attempts are left behind and swept with the staging dir), then
  *    removes staging. Job abort removes staging wholesale.
  *
  * Local-filesystem moves stand in for what a cluster deployment does
  * through the Hadoop FileSystem/committer API (same protocol, different
  * rename primitive). Dedup stays upstream (`WeatherPipeline.upsertNew`'s
  * anti-join); this sink guarantees the append itself is all-or-nothing.
  *
  * Usage:
  * {{{
  * df.write.format("graft.sources.ParquetBatchSink")
  *   .option("path", dir).mode("append").save()
  * }}}
  */
class ParquetBatchSink extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true // accept df schema
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new UnsupportedOperationException(
      "ParquetBatchSink is write-only: read the sink directory with " +
        "spark.read.parquet instead")
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ParquetBatchSinkTable(schema,
      Option(properties.get("path")).getOrElse(
        throw new IllegalArgumentException("option 'path' is required")))
}

object ParquetBatchSink {
  /** Spark schema → parquet MessageType (all fields optional; the subset
    * the library's sinks need — extend per type as they appear).
    */
  def parquetType(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val t: PrimitiveType = f.dataType match {
        case LongType => Types.optional(INT64).named(f.name)
        case IntegerType => Types.optional(INT32).named(f.name)
        case DoubleType => Types.optional(DOUBLE).named(f.name)
        case BooleanType => Types.optional(BOOLEAN).named(f.name)
        case TimestampType => Types.optional(INT64)
          .as(LogicalTypeAnnotation.timestampType(true,
            LogicalTypeAnnotation.TimeUnit.MICROS)).named(f.name)
        case StringType => Types.optional(BINARY)
          .as(LogicalTypeAnnotation.stringType()).named(f.name)
        case other => throw new IllegalArgumentException(
          s"ParquetBatchSink: unsupported type ${other.catalogString} (${f.name})")
      }
      b.addField(t)
    }
    b.named("graft_row")
  }
}

class ParquetBatchSinkTable(schema0: StructType, path: String)
    extends Table with SupportsWrite {
  override def name(): String = s"parquet_batch_sink($path)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE).asJava
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new ParquetBatchWrite(info.schema(), path, info.queryId())
      }
    }
}

/** Job-level coordinator: lives on the driver. */
class ParquetBatchWrite(schema: StructType, path: String, queryId: String)
    extends BatchWrite {
  private val staging = s"$path/_staging_$queryId"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(staging))
    new ParquetSinkWriterFactory(schema, staging, queryId)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // move exactly the committed tasks' files; sweep everything else
    messages.foreach { case ParquetSinkCommit(file) =>
      java.nio.file.Files.move(
        java.nio.file.Paths.get(staging, file),
        java.nio.file.Paths.get(path, file),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    sweepStaging()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = sweepStaging()

  private def sweepStaging(): Unit = {
    val dir = new java.io.File(staging)
    Option(dir.listFiles()).foreach(_.foreach(_.delete()))
    dir.delete()
  }
}

case class ParquetSinkCommit(file: String) extends WriterCommitMessage

class ParquetSinkWriterFactory(schema: StructType, staging: String,
                               queryId: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ParquetSinkDataWriter(schema, staging, partitionId, taskId, queryId)
}

/** Task-level writer: streams rows into one staged parquet file. */
class ParquetSinkDataWriter(schema: StructType, staging: String,
                            partitionId: Int, taskId: Long, queryId: String)
    extends DataWriter[InternalRow] {
  // queryId in the name: (partition, task) ids repeat across jobs, and a
  // later append's job-commit move would silently REPLACE an earlier
  // append's identically-named file
  private val fileName = f"part-p$partitionId%05d-t$taskId-$queryId.parquet"
  private val msgType = ParquetBatchSink.parquetType(schema)
  private val factory = new SimpleGroupFactory(msgType)
  private val writer: ParquetWriter[Group] = {
    val conf = new Configuration(false)
    ExampleParquetWriter.builder(
        new org.apache.hadoop.fs.Path(s"$staging/$fileName"))
      .withType(msgType)
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
  }

  override def write(row: InternalRow): Unit = {
    val g = factory.newGroup()
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) {
        schema.fields(i).dataType match {
          case LongType | TimestampType => g.add(i, row.getLong(i))
          case IntegerType => g.add(i, row.getInt(i))
          case DoubleType => g.add(i, row.getDouble(i))
          case BooleanType => g.add(i, row.getBoolean(i))
          case StringType => g.add(i, row.getUTF8String(i).toString)
          case other => throw new IllegalStateException(other.catalogString)
        }
      }
      i += 1
    }
    writer.write(g)
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    ParquetSinkCommit(fileName)
  }

  override def abort(): Unit = {
    writer.close()
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(staging, fileName))
  }

  override def close(): Unit = ()
}
