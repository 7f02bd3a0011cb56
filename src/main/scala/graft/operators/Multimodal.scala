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
