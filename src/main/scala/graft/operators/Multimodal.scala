package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed by batch-shaped `mapPartitions` passes (the Scala
  * analogue of `mapInPandas`: iterator-of-batches in, iterator out, no
  * driver collection).
  *
  * The actual image/audio decoders are NOT available in this environment,
  * so `decode` is a clearly-marked deterministic fake: it "decodes" a
  * payload into a 16-bin byte histogram feature. Everything around it —
  * binary schema, batch iteration, partition parallelism, feature-vector
  * output — is the real production shape: swapping in a JNI/ONNX decoder
  * changes only the marked function body.
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
