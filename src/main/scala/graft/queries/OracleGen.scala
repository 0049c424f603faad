package graft.queries

/** Generates DuckDB oracle SQL that reproduces `Graft.resultsToDF` rows for
  * a suite — one UNION ALL branch per expectation, with the exact column
  * names/types of the EVR DataFrame (expectation_type STRING, domain STRING,
  * success BOOLEAN, element_count/missing_count/unexpected_count BIGINT,
  * observed DOUBLE). The per-expectation predicates are supplied as SQL
  * strings that must mirror the engine's Column expressions (same CASE-WHEN
  * null semantics as Spark's sum(when(cond,1).otherwise(0))). */
object OracleGen {

  private def domainLit(d: String): String =
    if (d == null) "CAST(NULL AS VARCHAR)" else s"'$d'"

  /** One map-expectation branch. */
  final case class MapBranch(
      expectationType: String,
      domain: String,
      unexpectedSql: String,
      missingSql: String = "FALSE",
      mostly: Double = 1.0,
      fromSql: String = "lineitem")

  /** One aggregate-expectation branch (observed is a DOUBLE expression). */
  final case class AggBranch(
      expectationType: String,
      domain: String,
      observedSql: String,
      successSql: String,
      fromSql: String = "lineitem")

  def mapSql(b: MapBranch): String =
    s"""SELECT '${b.expectationType}' AS expectation_type, ${domainLit(b.domain)} AS domain,
       |  CASE WHEN cnt - miss = 0 THEN TRUE
       |       ELSE CAST(cnt - miss - unexp AS DOUBLE) / CAST(cnt - miss AS DOUBLE) >= ${b.mostly}
       |  END AS success,
       |  cnt AS element_count, miss AS missing_count, unexp AS unexpected_count,
       |  CAST(NULL AS DOUBLE) AS observed
       |FROM (SELECT CAST(count(*) AS BIGINT) AS cnt,
       |             CAST(coalesce(sum(CASE WHEN ${b.missingSql} THEN 1 ELSE 0 END), 0) AS BIGINT) AS miss,
       |             CAST(coalesce(sum(CASE WHEN ${b.unexpectedSql} THEN 1 ELSE 0 END), 0) AS BIGINT) AS unexp
       |      FROM ${b.fromSql}) s""".stripMargin

  def aggSql(b: AggBranch): String =
    s"""SELECT '${b.expectationType}' AS expectation_type, ${domainLit(b.domain)} AS domain,
       |  ${b.successSql} AS success,
       |  CAST(NULL AS BIGINT) AS element_count, CAST(NULL AS BIGINT) AS missing_count,
       |  CAST(NULL AS BIGINT) AS unexpected_count,
       |  CAST(${b.observedSql} AS DOUBLE) AS observed
       |FROM ${b.fromSql}""".stripMargin

  def union(branches: Seq[String]): String = branches.mkString("\n", "\nUNION ALL\n", "\n")
}
