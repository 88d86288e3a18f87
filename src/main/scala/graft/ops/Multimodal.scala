package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed metadata,
  * decoded/feature-extracted in partition-sized batches.
  *
  * The decode itself is a STUB — a deterministic fake (this container has no
  * image/audio codecs), clearly marked below. Everything around it is the
  * real Spark shape for this workload at 100 TB:
  *   - assets travel as (id, modality, bytes, meta) rows, binary column
  *     opaque to Catalyst (no per-cell interpretation until decode);
  *   - decode runs via `mapPartitions` so a codec is initialized once per
  *     partition (the JVM analogue of `mapInPandas` batch decode) and
  *     processes rows streaming, never materializing a partition in memory;
  *   - output is a typed case-class row, so downstream ops are columnar
  *     again.
  */
object Multimodal {

  final case class Asset(asset_id: Long, modality: String, bytes: Array[Byte])

  final case class AssetMeta(
      asset_id: Long, modality: String, byte_len: Long,
      width: Int, height: Int, n_frames: Int, checksum: String)

  /** Wrap a documents-like table into binary assets (the ingest shape:
    * payload bytes + modality tag). Deterministic: bytes = UTF-8 of `text`.
    */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("bytes"))

  /** Batched "decode": one codec handle per partition, streaming rows.
    *
    * ======= STUB DECODE =======
    * A real deployment opens the codec library here (per partition, not per
    * row) and parses actual media headers. This container has none, so the
    * fake derives deterministic "media properties" from the payload length —
    * the dataflow (partition-batched, codec-once, streaming) is the real
    * thing; only the arithmetic inside is fake.
    */
  def decodeMeta(spark: SparkSession, assets: DataFrame): Dataset[AssetMeta] = {
    import spark.implicits._
    assets.select("asset_id", "modality", "bytes").as[Asset]
      .mapPartitions { it =>
        // per-partition "codec" init (real decoders are expensive to open)
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { a =>
          val len = a.bytes.length.toLong
          md.reset()
          val checksum = md.digest(a.bytes).map("%02x".format(_)).mkString
          AssetMeta(
            asset_id = a.asset_id,
            modality = a.modality,
            byte_len = len,
            width = (64 + len % 577).toInt,  // STUB: fake header fields
            height = (64 + (len * 31) % 353).toInt,
            n_frames = (1 + len % 24).toInt,
            checksum = checksum)
        }
      }
  }

  final case class AssetFeatures(asset_id: Long, features: Seq[Double])

  /** Batched "feature extraction": the model-inference shape — one "model"
    * handle per partition, rows streaming through, a dense feature vector
    * out (which then feeds the [[Similarity]] ANN/near-dup operators).
    *
    * ======= STUB MODEL =======
    * A real deployment loads an ONNX/JNI model per partition and runs
    * batched inference. None exists in this container, so the fake derives
    * `dims` doubles in [-1, 1] from md5 chunks of the payload — again, only
    * the arithmetic is fake; the partition-batched dataflow is real.
    */
  def extractFeatures(spark: SparkSession, assets: DataFrame,
                      dims: Int = 8): Dataset[AssetFeatures] = {
    import spark.implicits._
    require(dims <= 8, "stub derives at most 8 dims from one md5")
    assets.select("asset_id", "modality", "bytes").as[Asset]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5") // per-partition "model"
        it.map { a =>
          md.reset()
          val hex = md.digest(a.bytes).map("%02x".format(_)).mkString
          val fs = (0 until dims).map { i =>
            val v = Integer.parseInt(hex.substring(i * 4, i * 4 + 4), 16)
            (v / 65535.0 - 0.5) * 2.0
          }
          AssetFeatures(a.asset_id, fs)
        }
      }
  }

  /** Resize planning: fit (width, height) into a `box` x `box` square
    * preserving aspect ratio — the metadata half of an image-resize stage
    * (the pixel work belongs in the stubbed decode). Pure column arithmetic,
    * pipelined with the scan.
    */
  def resizePlan(meta: DataFrame, box: Int): DataFrame = {
    val scale = least(lit(box) / col("width"), lit(box) / col("height"))
    meta.select(col("asset_id"), col("width"), col("height"),
      greatest(lit(1L), floor(col("width") * scale)).as("out_w"),
      greatest(lit(1L), floor(col("height") * scale)).as("out_h"),
      scale.as("scale"))
  }

  /** Frame sampling plan: byte offsets of every `stride`-th fake frame —
    * the explode-shaped half of a video pipeline (rows multiply, stay narrow).
    */
  def sampleFrames(assets: DataFrame, stride: Int): DataFrame = {
    val len = length(col("bytes"))
    // guard: sequence(0, -1, +stride) throws on empty payloads
    val offsets = when(len > 0,
      sequence(lit(0L), (len - 1).cast("long"), lit(stride.toLong)))
      .otherwise(array().cast("array<bigint>"))
    assets.select(col("asset_id"), explode(offsets).as("frame_offset"))
  }
}
