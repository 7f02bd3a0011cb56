package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2.9): opaque binary payloads
  * with typed metadata, and batched decode / feature-extraction over
  * them.
  *
  * The decode kernel itself is STUBBED (no image/audio codecs in this
  * environment) behind [[Multimodal.decodeStub]] — a deterministic
  * fake that consumes real bytes and emits a fixed-width feature
  * vector. Everything around it is the real Spark plumbing a 100 TB
  * media pipeline needs:
  *  - payloads as `binary` columns riding next to typed metadata
  *    structs (so pruning can drop the heavy bytes when a query only
  *    touches metadata);
  *  - partition-wise batched processing via `mapPartitions` (the Scala
  *    analog of `mapInPandas`: the per-partition iterator IS the
  *    batch — a real decoder would hand it to a native library in
  *    chunks without per-row JNI crossings);
  *  - explicit output schema so Catalyst keeps optimizing above the
  *    opaque stage.
  */
object Multimodal {

  val FeatureDim = 4

  case class MediaRow(media_id: Long, payload: Array[Byte],
                      media_type: String, width: Int, height: Int)
  case class MediaFeatures(media_id: Long, byte_len: Long,
                           checksum: Long, features: Array[Float])

  /** Wrap the documents table as a fake media table: UTF-8 payload
    * bytes + typed metadata. (Stand-in for image/audio blobs.)
    */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    graft.sources.Tables.table(spark, sfDir, "documents")
      .select(
        col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("text/plain").as("media_type"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"))

  /** STUB decode kernel — deterministic fake feature extraction over
    * raw bytes. A real pipeline swaps ONLY this function for a codec
    * call; signature and batch shape stay identical.
    */
  def decodeStub(payload: Array[Byte]): (Long, Array[Float]) = {
    var checksum = 0L
    var i = 0
    while (i < payload.length) {
      checksum = (checksum * 31 + (payload(i) & 0xff)) & 0x7fffffffL
      i += 1
    }
    val mean =
      if (payload.isEmpty) 0f
      else (payload.map(b => (b & 0xff).toLong).sum.toFloat / payload.length)
    (checksum, Array(payload.length.toFloat, mean, (checksum % 256).toFloat,
      if (payload.isEmpty) 0f else (payload.head & 0xff).toFloat))
  }

  /** Batched decode: one `mapPartitions` pass; each partition's
    * iterator is the batch handed to the (stubbed) kernel.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, payload) =>
          val (checksum, feats) = decodeStub(payload)
          MediaFeatures(id, payload.length.toLong, checksum, feats)
        }
      }
  }

  /** STUB resample kernel for [[transformMedia]]: deterministic byte
    * decimation standing in for a real resampler — keeps every k-th
    * byte where k scales the payload toward the target dimensions.
    * Consumes real bytes, emits real bytes; only this function changes
    * when a codec exists.
    */
  def resizeStub(payload: Array[Byte], srcW: Int, srcH: Int,
                 dstW: Int, dstH: Int): Array[Byte] = {
    val srcArea = math.max(1L, srcW.toLong * srcH)
    val dstArea = math.max(1L, dstW.toLong * dstH)
    val k = math.max(1L, srcArea / dstArea).toInt
    payload.grouped(k).map(_.head).toArray
  }

  /** M4 — media TRANSFORM plumbing (the resize analog): payload →
    * payload rewrite with consistent metadata update, batched per
    * partition like [[extractFeatures]]. The output schema equals the
    * input schema (media stays media), so transforms compose —
    * resize → re-extract → frame-sample chains without special cases.
    */
  def transformMedia(media: DataFrame, dstW: Int,
                     dstH: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("media_type"),
        col("width"), col("height"))
      .as[MediaRow]
      .mapPartitions { batch =>
        batch.map { m =>
          MediaRow(m.media_id,
            resizeStub(m.payload, m.width, m.height, dstW, dstH),
            m.media_type, dstW, dstH)
        }
      }
  }

  /** M3 — frame sampling plumbing (the video→frames analog): one
    * binary payload fans out into fixed-size byte windows at a chosen
    * stride, each tagged with its frame index — entirely in codegen'd
    * expressions (binary `substr`), no UDF, no decode, no shuffle. A
    * real video pipeline swaps the byte-window slicing for a
    * container-aware frame splitter; the schema, fan-out shape and
    * per-frame metadata stay identical. Every payload yields at least
    * one (possibly short) frame; tail bytes past the last full stride
    * are dropped, the standard sampling convention.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64,
                   stride: Int = 48): DataFrame = {
    val nMax = greatest(
      floor((length(col("payload")) - frameBytes).cast("double") / stride),
      lit(0.0)).cast("int")
    val frame = col("payload")
      .substr(col("frame_idx") * stride + lit(1), lit(frameBytes))
    media
      .select(col("media_id"), col("payload"), nMax.as("__n"))
      .select(col("media_id"), col("payload"),
        explode(sequence(lit(0), col("__n"))).as("frame_idx"))
      .select(col("media_id"), col("frame_idx").cast("bigint").as("frame_idx"),
        length(frame).cast("bigint").as("frame_len"),
        hex(frame).as("frame_hex"))
  }

  /** Metadata-only projection — demonstrates that a query touching
    * only typed metadata never deserializes the payload bytes
    * (column pruning drops the binary column at the scan).
    */
  def metadataSummary(media: DataFrame): DataFrame =
    media.groupBy(col("media_type"))
      .agg(count(lit(1)).as("n_media"),
        max(col("width")).as("max_width"),
        max(col("height")).as("max_height"))
}
