package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core._
import OracleGen._

/** Remaining SURVEY.md §2 operator coverage: LIKE patterns, schema/type
  * expectations, value metrics (most-common, proportion-unique,
  * between-count, length min/max, head), date-part/hashed partitioners,
  * list/random samplers, distinct-set expectations, KL divergence, and the
  * cross-table row-count comparison. */
object CoverageQueries {

  private def t(dir: String, name: String)(implicit s: SparkSession): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q27_like_patterns" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val suite = Suite("like", Seq(
        ExpectColumnValuesToMatchLikePattern("p_type", "%BRASS%"),
        ExpectColumnValuesToMatchLikePattern("p_brand", "Brand#%", negate = false),
        ExpectColumnValuesToMatchLikePattern("p_type", "%unobtainium%", negate = true),
        ExpectColumnValuesToMatchLikePatternList("p_type",
          Seq("%BRASS%", "%STEEL%", "%COPPER%", "%TIN%", "%NICKEL%"), matchOn = "any"),
        ExpectColumnValuesToMatchLikePatternList("p_type",
          Seq("%zzz%", "%yyy%"), negate = true)))
      Graft.resultsToDF(s, Graft.validate(t(dir, "part"), suite))
        .orderBy("expectation_type", "domain", "unexpected_count")
    }),
    "q28_type_schema" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val suite = Suite("types", Seq(
        ExpectColumnValuesToBeOfType("l_quantity", "DoubleType"),
        ExpectColumnValuesToBeInTypeList("l_orderkey", Seq("LongType", "IntegerType")),
        ExpectColumnToExist("l_shipdate"),
        ExpectTableColumnsToMatchSet(Seq("l_orderkey", "l_partkey", "l_suppkey",
          "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax",
          "l_returnflag", "l_linestatus", "l_shipdate")),
        ExpectTableColumnCountToBeBetween(Some(10), Some(12))))
      Graft.resultsToDF(s, Graft.validate(t(dir, "lineitem"), suite))
        .orderBy("expectation_type")
    }),
    "q29_most_common" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      // column.most_common_value (column_most_common_value.py:33-55)
      t(dir, "orders").filter(col("o_orderpriority").isNotNull)
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("o_orderpriority")).limit(1)
    }),
    "q30_proportion_unique" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      t(dir, "customer").agg(
        (count_distinct(col("c_name")).cast(DoubleType) /
          count(col("c_name")).cast(DoubleType)).as("prop_unique_name"),
        (count_distinct(col("c_mktsegment")).cast(DoubleType) /
          count(col("c_mktsegment")).cast(DoubleType)).as("prop_unique_segment"))
    }),
    "q31_between_count" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      // column_values.between_count (column_values_between_count.py)
      t(dir, "lineitem").agg(
        sum(when(col("l_quantity").between(10, 20), 1L).otherwise(0L)).as("n_between"),
        count(lit(1)).as("n_total"))
    }),
    "q32_partition_date_parts" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      // partition_on_date_parts incl. hour (sparkdf_data_partitioner.py:103-149)
      t(dir, "events")
        .filter(year(col("ts")) === 2024 && month(col("ts")) === 1 &&
          dayofmonth(col("ts")) <= 7)
        .groupBy(hour(col("ts")).as("h")).agg(count(lit(1)).as("n"))
        .orderBy(col("h"))
    }),
    "q33_partition_hashed" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      // partition_on_hashed_column (sparkdf_data_partitioner.py:272-290)
      graft.sources.Partitioners.onHashedColumn(t(dir, "events"), "user_id", 8, 3)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),
    "q34_sample_list" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      // sample_using_a_list (sparkdf_data_sampler.py:95-99)
      t(dir, "events").filter(col("user_id").isin(1L, 5L, 7L, 11L))
        .select(col("event_id"), col("user_id")).orderBy(col("event_id"))
    }),
    "q35_distinct_sets" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val suite = Suite("sets", Seq(
        ExpectColumnDistinctValuesToBeInSet("o_orderstatus",
          Seq("F", "O", "P", "X")),
        ExpectColumnDistinctValuesToContainSet("o_orderstatus", Seq("F")),
        ExpectColumnDistinctValuesToEqualSet("o_orderstatus", Seq("F", "O", "P"))))
      Graft.resultsToDF(s, Graft.validate(t(dir, "orders"), suite))
        .drop("observed").orderBy("expectation_type")
    }),
    "q36_kl_divergence" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val suite = Suite("kl", Seq(
        ExpectColumnKlDivergenceToBeLessThan("event_type",
          Seq("click", "error", "purchase", "signup", "view"),
          Seq(0.2, 0.2, 0.2, 0.2, 0.2), 0.1),
        ExpectColumnKlDivergenceToBeLessThan("event_type",
          Seq("click", "error", "purchase", "signup", "view"),
          Seq(0.9, 0.025, 0.025, 0.025, 0.025), 0.1)))
      // observed KL is libm-sensitive at the last ulp → compare success only
      Graft.resultsToDF(s, Graft.validate(t(dir, "events"), suite))
        .drop("observed").orderBy("expectation_type", "success")
    }),
    "q37_rowcount_other_table" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val suite = Suite("xtable", Seq(
        ExpectTableRowCountToEqualOtherTable(t(dir, "orders"), "orders"),
        ExpectTableRowCountToEqualOtherTable(t(dir, "lineitem"), "lineitem")))
      Graft.resultsToDF(s, Graft.validate(t(dir, "lineitem"), suite))
        .orderBy("observed", "success")
    }),
    "q38_length_min_max" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      // column_values.length_min / length_max (column_values_length_min.py)
      t(dir, "customer").agg(
        min(length(col("c_name"))).cast(IntegerType).as("len_min"),
        max(length(col("c_name"))).cast(IntegerType).as("len_max"))
    }),
    "q39_sample_random" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      // sample_using_random(p, seed) (sparkdf_data_sampler.py:43-47) via
      // the deterministic md5-threshold variant: rand(seed) streams are
      // engine- and partitioning-specific, so the oracle-checked sampler
      // hashes the key instead (sampleRandom keeps the reference-faithful
      // rand(seed) API for parity).
      graft.sources.Partitioners.sampleRandomDeterministic(
          t(dir, "events"), "event_id", 0.1)
        .select(col("event_id"), col("event_type")).orderBy("event_id")
    }),
    "q40_table_head" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      // table.head (table_head.py) made deterministic via key order
      t(dir, "events").orderBy(col("event_id")).limit(5)
    }))

  val oracles: Map[String, String] = Map(
    "q27_like_patterns" -> (union(Seq(
      mapSql(MapBranch("expect_column_values_to_match_like_pattern", "p_type",
        "p_type IS NOT NULL AND p_type NOT LIKE '%BRASS%'", "p_type IS NULL", 1.0, "part")),
      mapSql(MapBranch("expect_column_values_to_match_like_pattern", "p_brand",
        "p_brand IS NOT NULL AND p_brand NOT LIKE 'Brand#%'", "p_brand IS NULL", 1.0, "part")),
      mapSql(MapBranch("expect_column_values_to_not_match_like_pattern", "p_type",
        "p_type IS NOT NULL AND p_type LIKE '%unobtainium%'", "p_type IS NULL", 1.0, "part")),
      mapSql(MapBranch("expect_column_values_to_match_like_pattern_list", "p_type",
        "p_type IS NOT NULL AND NOT (p_type LIKE '%BRASS%' OR p_type LIKE '%STEEL%' OR p_type LIKE '%COPPER%' OR p_type LIKE '%TIN%' OR p_type LIKE '%NICKEL%')",
        "p_type IS NULL", 1.0, "part")),
      mapSql(MapBranch("expect_column_values_to_not_match_like_pattern_list", "p_type",
        "p_type IS NOT NULL AND NOT (p_type NOT LIKE '%zzz%' AND p_type NOT LIKE '%yyy%')",
        "p_type IS NULL", 1.0, "part")))) +
      " ORDER BY expectation_type, domain, unexpected_count"),
    "q28_type_schema" ->
      """SELECT * FROM (
        | SELECT 'expect_column_to_exist' AS expectation_type, 'l_shipdate' AS domain, TRUE AS success,
        |   CAST(NULL AS BIGINT) AS element_count, CAST(NULL AS BIGINT) AS missing_count,
        |   CAST(NULL AS BIGINT) AS unexpected_count, CAST(NULL AS DOUBLE) AS observed
        | UNION ALL SELECT 'expect_column_values_to_be_in_type_list', 'l_orderkey', TRUE, NULL, NULL, NULL, NULL
        | UNION ALL SELECT 'expect_column_values_to_be_of_type', 'l_quantity', TRUE, NULL, NULL, NULL, NULL
        | UNION ALL SELECT 'expect_table_column_count_to_be_between', NULL, TRUE, NULL, NULL, NULL, CAST(11 AS DOUBLE)
        | UNION ALL SELECT 'expect_table_columns_to_match_set', NULL, TRUE, NULL, NULL, NULL, NULL
        |) u ORDER BY expectation_type""".stripMargin,
    "q29_most_common" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders
        |WHERE o_orderpriority IS NOT NULL GROUP BY 1
        |ORDER BY n DESC, o_orderpriority LIMIT 1""".stripMargin,
    "q30_proportion_unique" ->
      """SELECT CAST(count(DISTINCT c_name) AS DOUBLE) / count(c_name) AS prop_unique_name,
        | CAST(count(DISTINCT c_mktsegment) AS DOUBLE) / count(c_mktsegment) AS prop_unique_segment
        |FROM customer""".stripMargin,
    "q31_between_count" ->
      """SELECT CAST(coalesce(sum(CASE WHEN l_quantity BETWEEN 10 AND 20 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_between,
        | count(*) AS n_total FROM lineitem""".stripMargin,
    "q32_partition_date_parts" ->
      """SELECT CAST(hour(ts) AS INT) AS h, count(*) AS n FROM events
        |WHERE year(ts) = 2024 AND month(ts) = 1 AND day(ts) <= 7
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q33_partition_hashed" ->
      """SELECT event_type, count(*) AS n FROM events
        |WHERE CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 2)) AS BIGINT) % 8 = 3
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q34_sample_list" ->
      "SELECT event_id, user_id FROM events WHERE user_id IN (1, 5, 7, 11) ORDER BY event_id",
    "q35_distinct_sets" ->
      """SELECT * FROM (
        | SELECT 'expect_column_distinct_values_to_be_in_set' AS expectation_type,
        |   'o_orderstatus' AS domain,
        |   (SELECT count(*) FROM (SELECT DISTINCT o_orderstatus FROM orders WHERE o_orderstatus IS NOT NULL) d
        |    WHERE o_orderstatus NOT IN ('F','O','P','X')) = 0 AS success,
        |   CAST(NULL AS BIGINT) AS element_count, CAST(NULL AS BIGINT) AS missing_count,
        |   CAST(NULL AS BIGINT) AS unexpected_count
        | UNION ALL SELECT 'expect_column_distinct_values_to_contain_set', 'o_orderstatus',
        |   (SELECT count(DISTINCT o_orderstatus) FROM orders WHERE o_orderstatus = 'F') = 1,
        |   NULL, NULL, NULL
        | UNION ALL SELECT 'expect_column_distinct_values_to_equal_set', 'o_orderstatus',
        |   (SELECT count(*) FROM (
        |      SELECT DISTINCT o_orderstatus FROM orders WHERE o_orderstatus IS NOT NULL) d
        |    WHERE o_orderstatus NOT IN ('F','O','P')) = 0
        |   AND (SELECT count(DISTINCT o_orderstatus) FROM orders WHERE o_orderstatus IN ('F','O','P')) = 3,
        |   NULL, NULL, NULL
        |) u ORDER BY expectation_type""".stripMargin,
    "q36_kl_divergence" ->
      """WITH vc AS (SELECT event_type, count(*) AS n FROM events WHERE event_type IS NOT NULL GROUP BY 1),
        |tot AS (SELECT sum(n) AS t FROM vc),
        |kl AS (
        | SELECT 'uniform' AS which, sum((n / t) * ln((n / t) / 0.2)) AS d FROM vc, tot
        | UNION ALL
        | SELECT 'skewed', sum(CASE WHEN event_type = 'click' THEN (n / t) * ln((n / t) / 0.9)
        |                           ELSE (n / t) * ln((n / t) / 0.025) END) FROM vc, tot)
        |SELECT 'expect_column_kl_divergence_to_be_less_than' AS expectation_type,
        | 'event_type' AS domain, d < 0.1 AS success,
        | CAST(NULL AS BIGINT) AS element_count, CAST(NULL AS BIGINT) AS missing_count,
        | CAST(NULL AS BIGINT) AS unexpected_count
        |FROM kl ORDER BY expectation_type, success""".stripMargin,
    "q37_rowcount_other_table" ->
      """SELECT * FROM (
        | SELECT 'expect_table_row_count_to_equal_other_table' AS expectation_type,
        |  CAST(NULL AS VARCHAR) AS domain,
        |  (SELECT count(*) FROM lineitem) = (SELECT count(*) FROM orders) AS success,
        |  CAST(NULL AS BIGINT) AS element_count, CAST(NULL AS BIGINT) AS missing_count,
        |  CAST(NULL AS BIGINT) AS unexpected_count,
        |  CAST((SELECT count(*) FROM lineitem) AS DOUBLE) AS observed
        | UNION ALL SELECT 'expect_table_row_count_to_equal_other_table', NULL,
        |  TRUE, NULL, NULL, NULL, CAST((SELECT count(*) FROM lineitem) AS DOUBLE)
        |) u ORDER BY observed, success""".stripMargin,
    "q38_length_min_max" ->
      """SELECT CAST(min(length(c_name)) AS INT) AS len_min,
        | CAST(max(length(c_name)) AS INT) AS len_max FROM customer""".stripMargin,
    "q39_sample_random" ->
      s"""SELECT event_id, event_type FROM events
         |WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':0'), 1, 8)) AS BIGINT)
         |  < ${(0.1 * 4294967296.0).toLong}
         |ORDER BY event_id""".stripMargin,
    "q40_table_head" ->
      "SELECT * FROM events ORDER BY event_id LIMIT 5")
}
