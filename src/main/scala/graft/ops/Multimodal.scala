package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns with
  * typed metadata. The Spark-side structure — schema, size-aware partitioning,
  * batched per-partition processing — is real and tested; the actual media codec
  * is STUBBED with a deterministic fake (this container ships no image/audio
  * libraries), clearly marked below. Swap `decodeStub` for a real decoder (JNI
  * or Pandas-UDF `mapInPandas` on a Python cluster) without touching the plan.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, media: Array[Byte],
      width: Int, height: Int, duration_ms: Long)
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      features: Array[Float])

  /** Deterministic fake "decode + feature-extract": 8 floats from a rolling hash
    * of the bytes. === STUB === replace with a real codec; the signature (bytes →
    * fixed-length feature vector) and the batching around it are the contract. */
  def decodeStub(bytes: Array[Byte], dims: Int = 8): Array[Float] = {
    val out = new Array[Float](dims)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      h = 31 * h + bytes(i)
      out(i % dims) += ((h >>> 32).toInt % 1000) / 1000.0f
      i += 1
    }
    out
  }

  /** Media table → feature table. Structure for scale:
    *  - repartitionByRange on byte size so one task never gets all the 4K videos
    *    while another gets thumbnails (size skew is the dominant skew axis for
    *    media corpora);
    *  - mapPartitions processes rows in order, amortizing any per-batch decoder
    *    init (a real codec holds native context per partition, not per row).
    */
  def extractFeatures(ds: Dataset[MediaRow], dims: Int = 8): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.withColumn("__sz", length(col("media")))
      .repartitionByRange(col("__sz"), col("media_id"))
      .drop("__sz")
      .as[MediaRow]
      .mapPartitions { it =>
        // per-partition decoder init would go here (native context, model load)
        it.map(r => MediaFeatures(r.media_id, r.kind, r.media.length.toLong,
          decodeStub(r.media, dims)))
      }
  }

  final case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampling: one media row → every `stride`-th fixed-size chunk as a
    * frame row. === STUB === the chunker stands in for a video demuxer; the
    * Spark shape is the contract: flatMap explosion with bounded fan-out, frame
    * rows carry (media_id, frame_idx) for downstream grouping, and the output
    * is explode-partitioned so one long video never pins a task. */
  def sampleFrames(ds: Dataset[MediaRow], frameBytes: Int = 256, stride: Int = 4): Dataset[Frame] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.flatMap { r =>
      val nFrames = math.max(1, r.media.length / frameBytes)
      (0 until nFrames by stride).iterator.map { f =>
        val from = f * frameBytes
        val until = math.min(r.media.length, from + frameBytes)
        Frame(r.media_id, f, java.util.Arrays.copyOfRange(r.media, from, until))
      }
    }
  }

  /** "Resize": deterministic downsample of a frame to `outBytes` by strided
    * byte selection. === STUB === stands in for image resize; signature
    * (bytes, target dims → bytes) and per-partition batching are the contract. */
  def resizeStub(frame: Array[Byte], outBytes: Int = 64): Array[Byte] = {
    if (frame.isEmpty) return Array.emptyByteArray
    val out = new Array[Byte](math.min(outBytes, frame.length))
    val step = math.max(1, frame.length / out.length)
    var i = 0
    while (i < out.length) { out(i) = frame(math.min(frame.length - 1, i * step)); i += 1 }
    out
  }

  /** Deterministic synthetic media table (documents' text bytes as stand-in
    * payloads) — exercises binary-column IO, partitioning, and batch shape. */
  def syntheticMedia(spark: SparkSession, documentsPath: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(documentsPath)
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("media"),
        (pmod(col("doc_id"), lit(64)) * 16 + 16).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) * 16 + 16).cast("int").as("height"),
        (pmod(col("doc_id"), lit(1000)) * 40).as("duration_ms"))
      .as[MediaRow]
  }
}
