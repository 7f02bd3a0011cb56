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

  // ---- M2 (real codec) — PNG decode through javax.imageio --------

  case class ImageMeta(media_id: Long, width: Int, height: Int,
                       channels: Int, mean_gray: Double)

  /** A REAL image decode behind the same batched plumbing as
    * [[extractFeatures]]: `javax.imageio` (in-JDK, no external
    * codec) reads PNG/JPEG/BMP/GIF payloads per partition and emits
    * decoded dimensions, band count, and the exact pixel mean of
    * band 0. Undecodable payloads become explicit poison rows
    * (width/height/channels = -1) rather than silent drops — a
    * filterable contract, the same philosophy as the null-row gates.
    *
    * Mean arithmetic is cross-engine exact: integer sample sum and
    * pixel count are exact, the final division is one correctly-
    * rounded IEEE op, rounded to 6 dp.
    */
  def decodeImages(media: DataFrame): Dataset[ImageMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // per-partition: disable ImageIO's tmp-file cache once, then
        // stream the batch through the codec — no per-row setup
        javax.imageio.ImageIO.setUseCache(false)
        batch.map { case (id, payload) =>
          // NonFatal, not just IOException: ImageIO codec plugins
          // throw RuntimeExceptions (IllegalArgument, IndexOutOfBounds)
          // on malformed payloads — one adversarial byte string must
          // become a poison row, never fail the whole job
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(payload))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) ImageMeta(id, -1, -1, -1, 0.0)
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            val raster = img.getRaster
            var sum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                sum += raster.getSample(x, y, 0)
                x += 1
              }
              y += 1
            }
            // raw IEEE quotient of exact integers — callers round
            // (Spark round == oracle ROUND; rounding here would pick
            // a different tie rule than the gates' shared one)
            ImageMeta(id, w, h, raster.getNumBands,
              sum.toDouble / (w.toLong * h))
          }
        }
      }
  }

  /** Deterministic synthetic PNG corpus for gating [[decodeImages]]:
    * one grayscale PNG per document, dimensions and every pixel an
    * integer function of `media_id` —
    * `w = 8 + id % 9`, `h = 8 + id % 7`,
    * `gray(x, y) = (id·31 + x·7 + y·13) mod 256` — ENCODED through
    * the real `javax.imageio` PNG writer. The decode gate's oracle
    * recomputes dimensions and pixel mean from the same integer
    * formulas, so the Spark side must round-trip actual PNG bytes
    * through a genuine codec to match: a broken encoder, decoder, or
    * raster walk all break the hash.
    */
  def syntheticPngTable(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.sources.Tables.table(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false)
        ids.map { id =>
          val w = (8 + id % 9).toInt
          val h = (8 + id % 7).toInt
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              raster.setSample(x, y, 0,
                ((id * 31 + x * 7 + y * 13) % 256).toInt)
              x += 1
            }
            y += 1
          }
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
          (id, out.toByteArray, "image/png", w, h)
        }
      }
      .toDF("media_id", "payload", "media_type", "width", "height")
  }
}
