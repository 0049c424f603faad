package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed by batch-shaped `mapPartitions` passes (the Scala
  * analogue of `mapInPandas`: iterator-of-batches in, iterator out, no
  * driver collection).
  *
  * IMAGES decode for real: the JDK ships ImageIO readers for PNG / JPEG /
  * BMP / GIF, so `decodeImage` / `extractImageFeatures` / `resizeImages`
  * operate on actual pixels (nearest-neighbor resize and integer channel
  * sums keep results deterministic across JVMs). Audio/video codecs are
  * NOT in the JDK, so `decodeToFeature` remains a clearly-marked
  * deterministic fake for those payloads — the binary schema, batch
  * iteration, and partition parallelism around it are the real
  * production shape, and swapping in a JNI/ffmpeg/ONNX decoder changes
  * only the marked function body.
  */
object Multimodal {

  /** Deterministic media table derived from documents: payload = utf-8
    * bytes of text, with typed metadata. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        length(col("text")).as("n_chars"),
        col("source").as("origin")).as("meta"))

  // ---------------------------------------------------------------------------
  // STUB DECODER — replace this body with a real decoder (libjpeg/ffmpeg/
  // ONNX runtime) in production. Deterministic fake: 16-bin histogram of
  // (byte & 0x0F). Signature and batch shape are the real contract.
  // ---------------------------------------------------------------------------
  def decodeToFeature(payload: Array[Byte]): Array[Long] = {
    val bins = new Array[Long](16)
    var i = 0
    while (i < payload.length) {
      bins(payload(i) & 0x0f) += 1
      i += 1
    }
    bins
  }

  /** Feature extraction over the binary column: one mapPartitions pass,
    * schema (media_id, n_bytes, feature[16]). */
  def extractFeatures(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_bytes", IntegerType, nullable = false),
      StructField("feature", ArrayType(LongType, containsNull = false))))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        Row(r.getLong(idIdx), payload.length, decodeToFeature(payload).toSeq)
      }
    }(Encoders.row(schema))
  }

  /** "Resize" for opaque payloads: keep every `factor`-th byte, emitting a
    * media-shaped table (media_id, payload, meta) so the result composes
    * with extractFeatures / sampleFrames — the pipeline shape of an image
    * resize stage (a real decoder would resample pixels; the byte
    * decimation is the deterministic stand-in, same batch contract). */
  def resizePayload(media: DataFrame, factor: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("meta", StructType(Seq(
        StructField("mime", StringType, nullable = false),
        StructField("n_chars", IntegerType, nullable = false),
        StructField("origin", StringType, nullable = true))), nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    val metaIdx = media.schema.fieldIndex("meta")
    media.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val resized = payload.indices.by(factor).map(payload).toArray
        val meta = r.getStruct(metaIdx)
        Row(r.getLong(idIdx), resized,
          Row(meta.getString(0), resized.length, meta.getString(2)))
      }
    }(Encoders.row(schema))
  }

  // ---------------------------------------------------------------------------
  // REAL image path — JDK ImageIO (PNG / JPEG / BMP / GIF ship with the
  // JVM, no external codec needed). Audio/video formats have no JDK
  // decoder, so only those still go through the marked stub above.
  // ---------------------------------------------------------------------------

  /** Magic-number sniff for the JDK-decodable formats. */
  def looksLikeImage(payload: Array[Byte]): Boolean =
    payload.length >= 4 && (
      (payload(0) == 0x89.toByte && payload(1) == 'P' && payload(2) == 'N') ||
      (payload(0) == 0xFF.toByte && payload(1) == 0xD8.toByte) || // JPEG
      (payload(0) == 'B' && payload(1) == 'M') || // BMP
      (payload(0) == 'G' && payload(1) == 'I' && payload(2) == 'F'))

  def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (!looksLikeImage(payload)) None
    else Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload)))

  /** Real per-image features: dimensions + exact per-channel pixel sums
    * (integer arithmetic — deterministic across JVMs). Non-image payloads
    * yield width = height = -1 with the stub histogram's total instead. */
  def extractImageFeatures(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        decodeImage(payload) match {
          case Some(img) =>
            var (sr, sg, sb) = (0L, 0L, 0L)
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
                x += 1
              }
              y += 1
            }
            Row(r.getLong(idIdx), img.getWidth, img.getHeight, sr, sg, sb)
          case None =>
            Row(r.getLong(idIdx), -1, -1,
              payload.length.toLong, 0L, 0L)
        }
      }
    }(Encoders.row(schema))
  }

  /** Real image resize (nearest-neighbor — deterministic, no filtering
    * kernels that vary by JVM) to fit within `maxDim`, re-encoded as PNG;
    * non-image payloads pass through untouched. Output schema matches the
    * input media shape so it composes with extractImageFeatures. */
  def resizeImages(media: DataFrame, maxDim: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("was_image", BooleanType, nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        decodeImage(payload) match {
          case Some(img) =>
            val scale = math.min(1.0,
              maxDim.toDouble / math.max(img.getWidth, img.getHeight))
            val w = math.max(1, (img.getWidth * scale).toInt)
            val h = math.max(1, (img.getHeight * scale).toInt)
            val out = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) { // nearest-neighbor sample
              var x = 0
              while (x < w) {
                out.setRGB(x, y, img.getRGB(
                  math.min(img.getWidth - 1, x * img.getWidth / w),
                  math.min(img.getHeight - 1, y * img.getHeight / h)))
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            Row(r.getLong(idIdx), bos.toByteArray, true)
          case None => Row(r.getLong(idIdx), payload, false)
        }
      }
    }(Encoders.row(schema))
  }

  /** Frame sampling for "video"-shaped payloads: every `stride`-th byte,
    * re-emitted as a sampled payload plus its digest. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("sample_digest", StringType, nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val sampled = payload.indices.by(stride).map(payload).toArray
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(sampled).map("%02x".format(_)).mkString
        Row(r.getLong(idIdx), sampled.length, digest)
      }
    }(Encoders.row(schema))
  }
}
