package graft

/** Wave 2 of the fixture port: the remaining like/regex/type/unique/
  * monotonic map families, the aggregate between-family, table-shape
  * files, and pair a>b / pair in_set. (Same harness and gating as
  * GoldenSpec4; dialect- or engine-specific cases stay gated by the
  * corpus's own only_for/suppress_test_for markers.) */
class GoldenSpec6 extends GoldenFixtureSpec {
  def files = Seq(
    // (the four like_pattern files are omitted: every case in them is
    // only_for sqlalchemy dialects — zero spark-runnable rows; the like
    // family is oracle-checked by q27 instead)
    "column_map_expectations/expect_column_values_to_match_regex.json",
    "column_map_expectations/expect_column_values_to_not_match_regex_list.json",
    "column_map_expectations/expect_column_value_lengths_to_equal.json",
    "column_map_expectations/expect_column_value_lengths_to_be_between.json",
    "column_map_expectations/expect_column_values_to_be_unique.json",
    "column_map_expectations/expect_column_values_to_be_decreasing.json",
    "column_map_expectations/expect_column_values_to_be_increasing.json",
    "column_map_expectations/expect_column_values_to_be_json_parseable.json",
    "column_map_expectations/expect_column_values_to_match_json_schema.json",
    "column_map_expectations/expect_column_values_to_be_between.json",
    "column_map_expectations/expect_column_values_to_be_between_tz_naive.json",
    "column_map_expectations/expect_column_values_to_be_between__evaluation_parameters.json",
    "column_map_expectations/expect_column_value_z_scores_to_be_less_than.json",
    "query_expectations/unexpected_rows_expectation.json",
    "column_pair_map_expectations/expect_column_pair_values_a_to_be_greater_than_b.json",
    "column_pair_map_expectations/expect_column_pair_values_to_be_in_set.json",
    "multicolumn_map_expectations/expect_select_column_values_to_be_unique_within_record.json",
    "column_aggregate_expectations/expect_column_min_to_be_between.json",
    "column_aggregate_expectations/expect_column_max_to_be_between.json",
    "column_aggregate_expectations/expect_column_median_to_be_between.json",
    "column_aggregate_expectations/expect_column_most_common_value_to_be_in_set.json",
    "column_aggregate_expectations/expect_column_proportion_of_unique_values_to_be_between.json",
    "column_aggregate_expectations/expect_column_unique_value_count_to_be_between.json",
    "column_aggregate_expectations/expect_column_distinct_values_to_be_in_set.json",
    "column_aggregate_expectations/expect_column_distinct_values_to_contain_set.json",
    "other_expectations/expect_column_to_exist.json",
    "other_expectations/expect_table_column_count_to_be_between.json",
    "other_expectations/expect_table_column_count_to_equal.json",
    "other_expectations/expect_table_columns_to_match_ordered_list.json",
    "other_expectations/expect_table_columns_to_match_set.json",
    "other_expectations/expect_table_row_count_to_be_between.json",
    "other_expectations/expect_table_row_count_to_equal.json")
}
