package graft

/** Wave 4 of the fixture port (round 4) — the final 12 usable files of the
  * reference's tests/test_definitions corpus. (The two tz_informed files
  * contain zero tests and expect_this_test_to_be_suppressed is a meta-test
  * of the reference's own harness — nothing to port.)
  *
  * Gating notes:
  *  - the four like_pattern files gate every test to SQL dialects (GE's
  *    spark engine lacks like_pattern; this engine implements it with
  *    Spark's ANSI `like`), so the ANSI-dialect variants (sqlite/postgresql
  *    family and the plain-sqlalchemy ones, whose patterns are either ANSI
  *    or inert literals) are the semantics to match; mssql variants use
  *    `[...]` bracket classes that ANSI LIKE does not define — skipped by
  *    not listing mssql in extraDialects.
  *  - multi_table gates to sqlalchemy only; the two-dataset harness builds
  *    each named table and resolves `other_table_name`.
  *  - KL divergence runs ungated (all 45 tests are cross-engine). */
class GoldenSpec7 extends GoldenFixtureSpec {
  def files = Seq(
    "column_distributional_expectations/expect_column_kl_divergence_to_be_less_than.json",
    "column_map_expectations/expect_column_values_to_be_of_type.json",
    "column_map_expectations/expect_column_values_to_be_in_type_list.json",
    "column_map_expectations/expect_column_values_to_match_like_pattern.json",
    "column_map_expectations/expect_column_values_to_match_like_pattern_list.json",
    "column_map_expectations/expect_column_values_to_not_match_like_pattern.json",
    "column_map_expectations/expect_column_values_to_not_match_like_pattern_list.json",
    "column_map_expectations/expect_column_values_to_match_strftime_format.json",
    "column_map_expectations/expect_column_values_to_be_dateutil_parseable.json",
    "column_aggregate_expectations/expect_column_stdev_to_be_between.json",
    "column_aggregate_expectations/expect_column_quantile_values_to_be_between.json",
    "multi_table_expectations/expect_table_row_count_to_equal_other_table.json")

  private val ansi = Set("sqlite", "postgresql", "sqlalchemy")
  override def extraDialects: Map[String, Set[String]] = Map(
    "column_map_expectations/expect_column_values_to_match_like_pattern.json" -> ansi,
    "column_map_expectations/expect_column_values_to_match_like_pattern_list.json" -> ansi,
    "column_map_expectations/expect_column_values_to_not_match_like_pattern.json" -> ansi,
    "column_map_expectations/expect_column_values_to_not_match_like_pattern_list.json" -> ansi,
    "multi_table_expectations/expect_table_row_count_to_equal_other_table.json" ->
      Set("sqlalchemy"))
}
