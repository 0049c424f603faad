package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CoreQueries, Coverage2Queries, Coverage3Queries, Coverage4Queries, Coverage5Queries, Coverage6Queries, CoverageQueries, DedupQueries, JsonQueries, MultimodalQueries, PipelineQueries, StreamingQueries, TextQueries}
import graft.transcripts.{QualityFilter, Transcripts}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: the full transcript quality-filter + scrub pipeline on
    * sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    QualityFilter(Transcripts.fromEvents(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ DedupQueries.queries ++ TextQueries.queries ++
      MultimodalQueries.queries ++ CoverageQueries.queries ++ JsonQueries.queries ++
      Coverage2Queries.queries ++ Coverage3Queries.queries ++
      Coverage4Queries.queries ++ Coverage5Queries.queries ++
      Coverage6Queries.queries ++
      PipelineQueries.queries ++ StreamingQueries.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ DedupQueries.oracles ++ TextQueries.oracles ++
      MultimodalQueries.oracles ++ CoverageQueries.oracles ++ JsonQueries.oracles ++
      Coverage2Queries.oracles ++ Coverage3Queries.oracles ++
      Coverage4Queries.oracles ++ Coverage5Queries.oracles ++
      Coverage6Queries.oracles ++
      PipelineQueries.oracles ++ StreamingQueries.oracles
}
