package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.operators.Multimodal

/** Multimodal plumbing queries. The engine computes over the BINARY payload
  * column (real byte-level plumbing); the oracle reproduces the numbers
  * from the source text, which is valid because payload = utf-8(text) and
  * the documents are ASCII. */
object MultimodalQueries {

  private def media(s: SparkSession, dir: String): DataFrame =
    Multimodal.mediaFromDocuments(s.read.parquet(s"$dir/documents.parquet"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the feature vector is emitted as a comma-joined string: the driver's
    // pandas-based compare cannot sort/hash an ARRAY column
    "q25_media_features" -> ((s, dir) =>
      Multimodal.extractFeatures(media(s, dir))
        .select(col("media_id"), col("n_bytes"),
          array_join(transform(col("feature"), _.cast(StringType)), ",")
            .as("feature"))
        .orderBy("media_id")),
    "q26_media_frames" -> ((s, dir) =>
      Multimodal.sampleFrames(media(s, dir), 100).orderBy("media_id")),
    // resize composes with feature extraction: resized payload re-enters
    // the same pipeline (the production contract of a decode→resize→
    // featurize chain)
    "q56_media_resize" -> ((s, dir) =>
      Multimodal.extractFeatures(Multimodal.resizePayload(media(s, dir), 7))
        .select(col("media_id"), col("n_bytes"),
          array_join(transform(col("feature"), _.cast(StringType)), ",")
            .as("feature"))
        .orderBy("media_id")))

  val oracles: Map[String, String] = Map(
    "q25_media_features" ->
      """SELECT doc_id AS media_id, CAST(length(text) AS INT) AS n_bytes,
        | array_to_string(list_transform(generate_series(1, 16), b ->
        |   CAST(len(list_filter(generate_series(1, length(text)),
        |        i -> ord(substr(text, i, 1)) % 16 = b - 1)) AS BIGINT)), ',') AS feature
        |FROM documents ORDER BY media_id""".stripMargin,
    "q26_media_frames" ->
      """SELECT doc_id AS media_id,
        | CAST(len(generate_series(1, length(text), 100)) AS INT) AS n_frames,
        | md5(coalesce(list_aggregate(list_transform(generate_series(1, length(text), 100),
        |   i -> substr(text, i, 1)), 'string_agg', ''), '')) AS sample_digest
        |FROM documents ORDER BY media_id""".stripMargin,
    "q56_media_resize" ->
      """WITH resized AS (SELECT doc_id AS media_id,
        |  coalesce(list_aggregate(list_transform(generate_series(1, length(text), 7),
        |    i -> substr(text, i, 1)), 'string_agg', ''), '') AS rt
        |  FROM documents)
        |SELECT media_id, CAST(length(rt) AS INT) AS n_bytes,
        | array_to_string(list_transform(generate_series(1, 16), b ->
        |   CAST(len(list_filter(generate_series(1, length(rt)),
        |        i -> ord(substr(rt, i, 1)) % 16 = b - 1)) AS BIGINT)), ',') AS feature
        |FROM resized ORDER BY media_id""".stripMargin)
}
