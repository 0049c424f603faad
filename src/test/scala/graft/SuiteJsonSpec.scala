package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** SuiteJson: GE's on-disk JSON suite documents load and run unchanged
  * (format per tests/test_sets/titanic_parameterized_expectations.json). */
class SuiteJsonSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val df = {
    val rows = (1 to 10).map { i =>
      (i, if (i <= 5) Some(i) else None,
        ('a' + i - 1).toChar.toString, if (i % 2 == 0) "even" else "odd")
    }
    rows.toDF("x", "z", "alpha", "parity")
  }

  val json =
    """{
      | "expectation_suite_name": "titanic_style",
      | "expectations": [
      |  {"expectation_type": "expect_column_to_exist", "kwargs": {"column": "x"}},
      |  {"expectation_type": "expect_column_values_to_be_between",
      |   "kwargs": {"column": "x",
      |     "min_value": {"$PARAMETER": "min_x"}, "max_value": {"$PARAMETER": "max_x"},
      |     "mostly": 0.9}},
      |  {"expectation_type": "expect_column_values_to_match_regex",
      |   "kwargs": {"column": "alpha", "regex": "[a-z]", "mostly": 0.95}},
      |  {"expectation_type": "expect_column_values_to_be_in_set",
      |   "kwargs": {"column": "parity", "value_set": ["even", "odd"]}},
      |  {"expectation_type": "expect_column_mean_to_be_between",
      |   "kwargs": {"column": "x", "min_value": 5, "max_value": 6}},
      |  {"expectation_type": "expect_column_values_to_not_be_null",
      |   "kwargs": {"column": "z", "mostly": 0.5,
      |     "row_condition": "parity = 'odd'"}},
      |  {"expectation_type": "expect_table_row_count_to_be_between",
      |   "kwargs": {"min_value": 10, "max_value": 10}},
      |  {"expectation_type": "expect_column_quantile_values_to_be_between",
      |   "kwargs": {"column": "x", "quantile_ranges": {
      |     "quantiles": [0.0, 0.5, 1.0],
      |     "value_ranges": [[0, 2], [4, 7], [9, null]]}}},
      |  {"expectation_type": "expect_column_kl_divergence_to_be_less_than",
      |   "kwargs": {"column": "parity", "threshold": 0.1,
      |     "partition_object": {"values": ["even", "odd"], "weights": [0.5, 0.5]}}},
      |  {"expectation_type": "expect_from_the_future", "kwargs": {"column": "x"}}
      | ],
      | "meta": {}
      |}""".stripMargin

  test("GE JSON suite loads, parameters resolve, and EVRs match") {
    val suite = SuiteJson.fromJson(json)
    assert(suite.name == "titanic_style")
    assert(suite.expectations.size == 10)
    val sr = Graft.validate(df, suite,
      suiteParameters = Map("min_x" -> 1, "max_x" -> 10))
    val byIdx = sr.results
    assert(byIdx(0).success) // column exists
    assert(byIdx(1).success) // between via $PARAMETERs
    assert(byIdx(1).result("unexpected_count") == 0L)
    assert(byIdx(2).success)
    assert(byIdx(3).success)
    assert(byIdx(4).success) // mean 5.5
    assert(byIdx(5).success) // z not-null on odd rows: 3 of 5 ≥ 0.5
    assert(byIdx(5).result("element_count") == 5L)
    assert(byIdx(6).success) // row count 10
    assert(byIdx(7).success) // quantiles 1, 5.5, 10
    assert(byIdx(8).success) // 5/5 even/odd split, KL 0
    assert(!byIdx(9).success) // unknown type → exception EVR, isolated
    assert(byIdx(9).exception.exists(_.contains("unknown expectation_type")))
    assert(sr.statistics.successfulExpectations == 9)
  }

  test("$PARAMETER in a typed scalar slot fails loudly, not silently as 0") {
    val suite = SuiteJson.fromJson(
      """{"expectations": [
        | {"expectation_type": "expect_column_values_to_match_regex",
        |  "kwargs": {"column": "alpha", "regex": "^z$",
        |    "mostly": {"$PARAMETER": "pct"}}},
        | {"expectation_type": "expect_column_values_to_match_regex",
        |  "kwargs": {"column": "alpha", "regex": {"$PARAMETER": "re"}}}]}""".stripMargin)
    // typed slot (mostly): InvalidExpectation — NOT mostly=0.0 false-green
    val r = Graft.validate(df, suite, suiteParameters = Map("re" -> "[a-z]"))
    assert(!r.results.head.success && r.results.head.exception.isDefined)
    // string slot (regex): ref resolves through SuiteParams
    assert(r.results(1).success)
    assert(r.results(1).result("unexpected_count") == 0L)
  }

  test("value_set null is the reference's vacuous None, not the empty set") {
    val suite = SuiteJson.fromJson(
      """{"expectations": [
        | {"expectation_type": "expect_column_values_to_be_in_set",
        |  "kwargs": {"column": "alpha", "value_set": null}},
        | {"expectation_type": "expect_column_values_to_be_in_set",
        |  "kwargs": {"column": "alpha", "value_set": []}}]}""".stripMargin)
    val r = Graft.validate(df, suite)
    assert(r.results.head.success) // null set → vacuously true
    assert(r.results.head.result("unexpected_count") == 0L)
    assert(!r.results(1).success) // empty set → all non-null unexpected
    assert(r.results(1).result("unexpected_count") == 10L)
  }

  test("condition_parser great_expectations translates the mini-DSL") {
    val suite = SuiteJson.fromJson(
      """{"expectations": [
        | {"expectation_type": "expect_column_values_to_not_be_null",
        |  "kwargs": {"column": "z", "mostly": 0.5,
        |    "row_condition": "col(\"parity\") == \"odd\"",
        |    "condition_parser": "great_expectations__experimental__"}},
        | {"expectation_type": "expect_column_values_to_be_between",
        |  "kwargs": {"column": "x", "min_value": 6,
        |    "row_condition": "col(\"x\") > 5",
        |    "condition_parser": "great_expectations"}}]}""".stripMargin)
    val r = Graft.validate(df, suite)
    assert(r.results.head.success)
    assert(r.results.head.result("element_count") == 5L) // odd rows only
    assert(r.results(1).success)
    assert(r.results(1).result("element_count") == 5L) // x in 6..10
    assert(r.results(1).result("unexpected_count") == 0L)
  }

  test("kl partition_object with bins loads the continuous path") {
    val suite = SuiteJson.fromJson(
      """{"expectations": [
        | {"expectation_type": "expect_column_kl_divergence_to_be_less_than",
        |  "kwargs": {"column": "x", "threshold": 2.0,
        |    "partition_object": {"bins": [0, 5, 10], "weights": [0.5, 0.5]},
        |    "tail_weight_holdout": 0.1}}]}""".stripMargin)
    val r = Graft.validate(df, suite).results.head
    assert(r.exception.isEmpty, r.exception)
    assert(r.success)
  }
}
