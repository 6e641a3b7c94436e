package graft.datapipe

import graft.{Tables => T}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads with typed metadata,
  * batch-shaped decode / feature-extract / frame-sample operators.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic stub ([[StubDecoder]]); everything Spark-
  * side is real and tested: the schema (binary payload + metadata struct),
  * the mapPartitions batching (the Scala analog of `mapInPandas` — one
  * decoder instance per partition, streamed row batches, no per-row init),
  * and the partitioning contract (payloads stay columnar-compressed in
  * Parquet; feature extraction is map-only so 100 TB of assets never
  * shuffles — only extracted features, ~1e3x smaller, move).
  */
object Multimodal {

  /** A multimodal asset row: payload is opaque bytes + typed metadata. */
  final case class Asset(asset_id: Long, payload: Array[Byte], mime: String,
                         lang: String, n_chars: Long)

  /** Extracted features (what a real image/audio model would emit). */
  final case class AssetFeatures(asset_id: Long, n_bytes: Int, mime: String,
                                 fake_class: Int, sample_offsets: Seq[Long])

  /** STUB — stands in for an image/audio decoder (libs absent in this
    * container). Deterministic: class = first-8-bytes sum mod 256;
    * "frame sample" = 5 evenly spaced byte offsets. A real deployment
    * swaps `decode` for e.g. JPEG decode + model inference; the
    * mapPartitions harness around it is unchanged.
    */
  object StubDecoder {
    def decode(a: Asset): AssetFeatures = {
      val head = a.payload.take(8).map(_ & 0xff).sum % 256
      val n = a.payload.length
      val step = math.max(n / 5, 1)
      AssetFeatures(a.asset_id, n, a.mime, head,
        (0 until 5).map(i => math.min(i.toLong * step, math.max(n - 1, 0))))
    }
  }

  /** The real plumbing: batch decode via mapPartitions — decoder init once
    * per partition (like a model load), rows streamed through it.
    */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition init would go here (decoder/model handle)
      it.map(StubDecoder.decode)
    }
  }

  /** STUB resize: binary -> binary map with a deterministic stride sample
    * (a real deployment swaps in an image scaler). Demonstrates the
    * payload-transform plumbing: map-only, binary in/out, metadata
    * updated — 100 TB of assets re-encode without any shuffle.
    */
  def resize(assets: Dataset[Asset], factor: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    require(factor >= 1)
    assets.mapPartitions(_.map { a =>
      val resized = a.payload.grouped(factor).map(_.head).toArray
      a.copy(payload = resized, mime = a.mime + s";resized=1/$factor",
             n_chars = resized.length.toLong)
    })
  }

  /** Build an asset table from documents (text bytes as stand-in payload). */
  def assets(s: SparkSession, d: String): Dataset[Asset] = {
    import s.implicits._
    T.documents(s, d)
      .select(col("doc_id").as("asset_id"),
              encode(col("text"), "UTF-8").as("payload"),
              lit("text/plain").as("mime"), col("lang"), col("n_chars"))
      .as[Asset]
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Oracle-checkable slice of the pipeline: payload sizing + the stub
    // feature computations re-expressed as pure SQL (byte lengths, evenly
    // spaced sample offsets). Mirrors what extractFeatures emits.
    "m01_binary_features" -> { (s, d) =>
      import s.implicits._
      extractFeatures(assets(s, d)).toDF()
        // offsets unpacked to scalars: the driver's row-sort can't order
        // list cells
        .select($"asset_id", $"n_bytes", $"mime", $"fake_class",
                element_at($"sample_offsets", 1).as("off_0"),
                element_at($"sample_offsets", 2).as("off_1"),
                element_at($"sample_offsets", 3).as("off_2"),
                element_at($"sample_offsets", 4).as("off_3"),
                element_at($"sample_offsets", 5).as("off_4"))
        .orderBy($"asset_id")
    }
  )

  def oracleSql: Map[String, String] = Map(
    // ASCII corpus => octet_length(text) == payload bytes; the stub class
    // is the sum of the first 8 bytes mod 256, offsets are i*(n/5) capped.
    "m01_binary_features" ->
      """SELECT doc_id AS asset_id,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  'text/plain' AS mime,
        |  CAST(list_sum(list_transform(range(1, least(octet_length(encode(text)), 8) + 1),
        |    i -> ascii(substring(text, i, 1)))) % 256 AS INT) AS fake_class,
        |  CAST(least(0 * greatest(octet_length(encode(text)) // 5, 1),
        |       greatest(octet_length(encode(text)) - 1, 0)) AS BIGINT) AS off_0,
        |  CAST(least(1 * greatest(octet_length(encode(text)) // 5, 1),
        |       greatest(octet_length(encode(text)) - 1, 0)) AS BIGINT) AS off_1,
        |  CAST(least(2 * greatest(octet_length(encode(text)) // 5, 1),
        |       greatest(octet_length(encode(text)) - 1, 0)) AS BIGINT) AS off_2,
        |  CAST(least(3 * greatest(octet_length(encode(text)) // 5, 1),
        |       greatest(octet_length(encode(text)) - 1, 0)) AS BIGINT) AS off_3,
        |  CAST(least(4 * greatest(octet_length(encode(text)) // 5, 1),
        |       greatest(octet_length(encode(text)) - 1, 0)) AS BIGINT) AS off_4
        |FROM documents ORDER BY asset_id""".stripMargin
  )
}
