package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core._
import OracleGen._

/** Coverage wave 2: regex lists, decreasing, most-common-in-set,
  * multicolumn-sum/compound-unique over derived columns with planted
  * failures. */
object Coverage2Queries {

  private def t(dir: String, name: String)(implicit s: SparkSession): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** lineitem-derived trio: x + y + z = 3 except planted rows. */
  private def trio(df: DataFrame): DataFrame = df.selectExpr(
    "l_orderkey", "l_linenumber",
    "CAST(l_linenumber % 3 AS INT) AS x",
    "CAST(CASE WHEN l_orderkey % 10 = 0 THEN 5 ELSE 2 - l_linenumber % 3 END AS INT) AS y",
    "1 AS z")
  private val trioSql =
    """(SELECT l_orderkey, l_linenumber,
      |  CAST(l_linenumber % 3 AS INT) AS x,
      |  CAST(CASE WHEN l_orderkey % 10 = 0 THEN 5 ELSE 2 - l_linenumber % 3 END AS INT) AS y,
      |  1 AS z FROM lineitem) tt""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q46_regex_lists" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val suite = Suite("regex_lists", Seq(
        ExpectColumnValuesToMatchRegexList("p_type",
          Seq("BRASS", "STEEL", "COPPER", "TIN", "NICKEL"), matchOn = "any"),
        ExpectColumnValuesToMatchRegexList("p_type",
          Seq("^(STANDARD|SMALL|MEDIUM|LARGE|ECONOMY|PROMO)", "ED$"),
          matchOn = "all", mostly = 0.2),
        ExpectColumnValuesToNotMatchRegexList("p_name",
          Seq("unobtainium", "vibranium")),
        ExpectColumnMostCommonValueToBeInSet("p_brand",
          (1 to 5).map(i => s"Brand#$i"), tiesOkay = true)))
      Graft.resultsToDF(s, Graft.validate(t(dir, "part"), suite))
        .drop("observed").orderBy("expectation_type", "domain", "unexpected_count")
    }),
    "q47_multicolumn_sum" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val suite = Suite("mcs", Seq(
        ExpectMulticolumnSumToEqual(Seq("x", "y", "z"), 3.0, mostly = 0.85),
        ExpectCompoundColumnsToBeUnique(Seq("l_orderkey", "l_linenumber")),
        ExpectSelectColumnValuesToBeUniqueWithinRecord(Seq("x", "y"), mostly = 0.5)))
      Graft.resultsToDF(s, Graft.validate(trio(t(dir, "lineitem")), suite))
        .orderBy("expectation_type")
    }),
    "q48_decreasing" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      // decreasing within partition: countdown = 100 - turn-like index
      val df = t(dir, "events").selectExpr("user_id", "event_id",
        "CAST(CASE WHEN event_id % 101 = 0 THEN 1000000 ELSE -event_id END AS BIGINT) AS countdown")
      val suite = Suite("dec", Seq(
        ExpectColumnValuesToBeDecreasing("countdown",
          partitionBy = Seq("user_id"), orderBy = Seq("event_id"), mostly = 0.9)))
      Graft.resultsToDF(s, Graft.validate(df, suite))
    }))

  val oracles: Map[String, String] = Map(
    "q46_regex_lists" -> {
      val anyRe = "regexp_matches(p_type, 'BRASS') OR regexp_matches(p_type, 'STEEL') OR regexp_matches(p_type, 'COPPER') OR regexp_matches(p_type, 'TIN') OR regexp_matches(p_type, 'NICKEL')"
      val allRe = "regexp_matches(p_type, '^(STANDARD|SMALL|MEDIUM|LARGE|ECONOMY|PROMO)') AND regexp_matches(p_type, 'ED$')"
      def noObs(sql: String): String =
        s"SELECT expectation_type, domain, success, element_count, missing_count, unexpected_count FROM ($sql) x"
      union(Seq(
        noObs(mapSql(MapBranch("expect_column_values_to_match_regex_list", "p_type",
          s"p_type IS NOT NULL AND NOT ($anyRe)", "p_type IS NULL", 1.0, "part"))),
        noObs(mapSql(MapBranch("expect_column_values_to_match_regex_list", "p_type",
          s"p_type IS NOT NULL AND NOT ($allRe)", "p_type IS NULL", 0.2, "part"))),
        noObs(mapSql(MapBranch("expect_column_values_to_not_match_regex_list", "p_name",
          "p_name IS NOT NULL AND NOT (NOT regexp_matches(p_name, 'unobtainium') AND NOT regexp_matches(p_name, 'vibranium'))",
          "p_name IS NULL", 1.0, "part"))),
        """SELECT 'expect_column_most_common_value_to_be_in_set' AS expectation_type,
          | 'p_brand' AS domain,
          | (SELECT count(*) FROM (
          |    SELECT p_brand, count(*) AS n FROM part WHERE p_brand IS NOT NULL GROUP BY 1
          |    QUALIFY n = max(n) OVER ()) m
          |  WHERE p_brand IN ('Brand#1','Brand#2','Brand#3','Brand#4','Brand#5')) >= 1 AS success,
          | CAST(NULL AS BIGINT) AS element_count, CAST(NULL AS BIGINT) AS missing_count,
          | CAST(NULL AS BIGINT) AS unexpected_count""".stripMargin)) +
        " ORDER BY expectation_type, domain, unexpected_count"
    },
    "q47_multicolumn_sum" -> (union(Seq(
      mapSql(MapBranch("expect_multicolumn_sum_to_equal", "x,y,z",
        "NOT (x IS NULL AND y IS NULL AND z IS NULL) AND NOT (coalesce(x,0) + coalesce(y,0) + coalesce(z,0) = 3.0)",
        "x IS NULL AND y IS NULL AND z IS NULL", 0.85, trioSql)),
      mapSql(MapBranch("expect_compound_columns_to_be_unique", "l_orderkey,l_linenumber",
        "NOT (l_orderkey IS NULL AND l_linenumber IS NULL) AND __w > 1",
        "l_orderkey IS NULL AND l_linenumber IS NULL", 1.0,
        s"(SELECT *, count(*) OVER (PARTITION BY l_orderkey, l_linenumber) AS __w FROM $trioSql) uu")),
      mapSql(MapBranch("expect_select_column_values_to_be_unique_within_record", "x,y",
        "NOT (x IS NULL AND y IS NULL) AND (x IS NOT DISTINCT FROM y)",
        "x IS NULL AND y IS NULL", 0.5, trioSql)))) +
      " ORDER BY expectation_type"),
    "q48_decreasing" -> mapSql(MapBranch(
      "expect_column_values_to_be_decreasing", "countdown",
      "countdown IS NOT NULL AND NOT (__prev IS NULL OR countdown <= __prev)",
      "countdown IS NULL", 0.9,
      """(SELECT *, last_value(countdown IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS __prev
        | FROM (SELECT user_id, event_id,
        |   CAST(CASE WHEN event_id % 101 = 0 THEN 1000000 ELSE -event_id END AS BIGINT) AS countdown
        |   FROM events) d) tt""".stripMargin)))
}
