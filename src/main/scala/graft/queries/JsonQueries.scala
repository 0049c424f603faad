package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core._
import OracleGen._

/** JSON parseability / JSON-schema / datetime-format expectations plus the
  * row-condition mini-DSL, oracled against DuckDB's json/strptime functions.
  * Malformed inputs are planted deterministically by event_id residue, with
  * the SAME derivation expression in both engines. */
object JsonQueries {

  private def t(dir: String, name: String)(implicit s: SparkSession): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** props with planted invalid JSON (%11) and wrong-typed payloads (%7). */
  private def jsonCol =
    when(col("event_id") % 11 === 0, concat(col("props"), lit("}")))
      .when(col("event_id") % 7 === 0, lit("""{"k": "high"}"""))
      .otherwise(col("props"))
  private val jsonColSql =
    """CASE WHEN event_id % 11 = 0 THEN props || '}'
      |     WHEN event_id % 7 = 0 THEN '{"k": "high"}'
      |     ELSE props END""".stripMargin

  private val KSchema =
    """{"type":"object","required":["k"],"properties":{"k":{"type":"integer","minimum":0,"maximum":100}}}"""

  /** timestamp strings with planted garbage (%13). */
  private def dtCol =
    when(col("event_id") % 13 === 0, lit("not-a-date"))
      .otherwise(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
  private val dtColSql =
    "CASE WHEN event_id % 13 = 0 THEN 'not-a-date' ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_json_parseable" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val df = t(dir, "events").withColumn("j", jsonCol)
      val suite = Suite("json", Seq(
        ExpectColumnValuesToBeJsonParseable("j", mostly = 0.9)))
      Graft.resultsToDF(s, Graft.validate(df, suite))
    }),
    "q42_json_schema" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val df = t(dir, "events").withColumn("j", jsonCol)
      val suite = Suite("jsonschema", Seq(
        ExpectColumnValuesToMatchJsonSchema("j", KSchema, mostly = 0.5)))
      Graft.resultsToDF(s, Graft.validate(df, suite))
    }),
    "q43_strftime" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val df = t(dir, "events").withColumn("d", dtCol)
      val suite = Suite("strftime", Seq(
        ExpectColumnValuesToMatchStrftimeFormat("d", "%Y-%m-%d %H:%M:%S",
          mostly = 0.9)))
      Graft.resultsToDF(s, Graft.validate(df, suite))
    }),
    "q44_dateutil_parseable" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val df = t(dir, "events").withColumn("d", dtCol)
      val suite = Suite("dateutil", Seq(
        ExpectColumnValuesToBeDateutilParseable("d", mostly = 0.9)))
      Graft.resultsToDF(s, Graft.validate(df, suite))
    }),
    "q45_row_condition_dsl" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      // reference mini-DSL (row_conditions.py) → Column → compute domain
      val domain = t(dir, "lineitem")
        .filter(RowConditionDsl.toColumn("""col("l_quantity") > 25"""))
        .filter(RowConditionDsl.toColumn("""col("l_returnflag") == "A""""))
      val suite = Suite("dsl", Seq(
        ExpectTableRowCountToBeBetween(Some(1), None),
        ExpectColumnMinToBeBetween("l_quantity", Some(25.0), None)))
      Graft.resultsToDF(s, Graft.validate(domain, suite))
        .orderBy("expectation_type")
    }))

  val oracles: Map[String, String] = Map(
    "q41_json_parseable" -> mapSql(MapBranch(
      "expect_column_values_to_be_json_parseable", "j",
      "j IS NOT NULL AND NOT json_valid(j)", "j IS NULL", 0.9,
      s"(SELECT $jsonColSql AS j FROM events) tt")),
    "q42_json_schema" -> mapSql(MapBranch(
      "expect_column_values_to_match_json_schema", "j",
      """j IS NOT NULL AND NOT (json_valid(j)
        | AND json_type(CASE WHEN json_valid(j) THEN j ELSE '{}' END, '$.k') IN ('UBIGINT', 'BIGINT')
        | AND coalesce(try_cast(json_extract(CASE WHEN json_valid(j) THEN j ELSE '{}' END, '$.k') AS BIGINT) BETWEEN 0 AND 100, FALSE))""".stripMargin,
      "j IS NULL", 0.5,
      s"(SELECT $jsonColSql AS j FROM events) tt")),
    "q43_strftime" -> mapSql(MapBranch(
      "expect_column_values_to_match_strftime_format", "d",
      "d IS NOT NULL AND try_strptime(d, '%Y-%m-%d %H:%M:%S') IS NULL",
      "d IS NULL", 0.9,
      s"(SELECT $dtColSql AS d FROM events) tt")),
    "q44_dateutil_parseable" -> mapSql(MapBranch(
      "expect_column_values_to_be_dateutil_parseable", "d",
      "d IS NOT NULL AND try_cast(d AS TIMESTAMP) IS NULL",
      "d IS NULL", 0.9,
      s"(SELECT $dtColSql AS d FROM events) tt")),
    "q45_row_condition_dsl" -> (union(Seq(
      aggSql(AggBranch("expect_column_min_to_be_between", "l_quantity",
        "min(l_quantity)", "min(l_quantity) >= 25",
        "(SELECT * FROM lineitem WHERE l_quantity > 25 AND l_returnflag = 'A') tt")),
      aggSql(AggBranch("expect_table_row_count_to_be_between", null,
        "count(*)", "count(*) >= 1",
        "(SELECT * FROM lineitem WHERE l_quantity > 25 AND l_returnflag = 'A') tt")))) +
      " ORDER BY expectation_type"))
}
