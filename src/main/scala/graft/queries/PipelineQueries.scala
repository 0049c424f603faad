package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Dedup

/** Round-4 training-data-pipeline additions: benchmark decontamination,
  * Gopher-style repetition metrics, weighted source mixing, and C4-style
  * keep-first dedup — each with a bit-parity DuckDB oracle built from the
  * same constants. */
object PipelineQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private val normSql = graft.functions.TextFunctions.normTextSql("text")

  /** The q57 shingle CTE pair (docs must already be bound upstream). */
  private val shingleCtes =
    s"""normd AS (SELECT doc_id, string_split($normSql, ' ') AS w, $normSql AS norm FROM docs),
       |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
       |  THEN list_transform(generate_series(1, len(w)-2), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
       |  ELSE [norm] END) AS s FROM normd)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    /** Benchmark decontamination: docs sharing any 3-gram shingle with the
      * (doc_id % 37 = 0) benchmark slice, with distinct-shingle hit
      * counts. Broadcast semi-join — no corpus shuffle. */
    "q73_decontaminate" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.decontaminate(
        corpus = d.filter(col("doc_id") % 37 =!= 0),
        benchmark = d.filter(col("doc_id") % 37 === 0),
        idCol = "doc_id", textCol = "text")
        .orderBy("doc_id")
    }))

  val oracles: Map[String, String] = Map(
    "q73_decontaminate" ->
      s"""WITH docs AS (SELECT * FROM documents),
         |$shingleCtes,
         |cpost AS (SELECT doc_id, unnest(s) AS sg FROM sh WHERE doc_id % 37 <> 0),
         |bsh AS (SELECT DISTINCT unnest(s) AS sg FROM sh WHERE doc_id % 37 = 0)
         |SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_hits
         |FROM cpost c JOIN bsh b USING (sg) GROUP BY 1 ORDER BY doc_id""".stripMargin)
}
