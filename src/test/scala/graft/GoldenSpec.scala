package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Golden cases transcribed from the reference's cross-engine JSON corpus
  * (tests/test_definitions/column_map_expectations/
  * expect_column_values_to_be_between.json and .._to_be_in_set.json,
  * executed per self_check/util.py:2030-2571 comparison rules: only keys
  * present in `out` checked, unexpected lists as multisets). Dataset is the
  * corpus's canonical table: x dense 1..10, z = 1..5 + 5 nulls,
  * alpha a..j, pk_index 0..9. */
class GoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val df = {
    val rows = (1 to 10).map { i =>
      (i - 1, i, if (i <= 5) Some(i) else None, ('a' + i - 1).toChar.toString)
    }
    rows.toDF("pk_index", "x", "z", "alpha")
  }

  private def runOne(e: Expectation,
      format: ResultFormat = ResultFormat.Complete): Evr =
    new SuiteRunner(format, idColumns = Seq("pk_index"))
      .run(df, Suite("golden", Seq(e))).results.head

  /** (title, expectation, success, unexpected_list, unexpected pk_indexes) */
  val betweenCases: Seq[(String, Expectation, Boolean, Seq[String], Seq[Int])] = Seq(
    ("basic_positive_test",
      ExpectColumnValuesToBeBetween("x", Some(1), Some(10)), true, Nil, Nil),
    ("another_basic_positive_test",
      ExpectColumnValuesToBeBetween("x", Some(0), Some(20)), true, Nil, Nil),
    ("missing_min_value",
      ExpectColumnValuesToBeBetween("x", None, Some(20)), true, Nil, Nil),
    ("missing_max_value",
      ExpectColumnValuesToBeBetween("x", Some(0), None), true, Nil, Nil),
    ("basic_negative_test",
      ExpectColumnValuesToBeBetween("x", Some(1), Some(9)), false, Seq("10"), Seq(9)),
    ("another_negative_test",
      ExpectColumnValuesToBeBetween("x", Some(3), Some(10)), false, Seq("1", "2"), Seq(0, 1)),
    ("positive_test_with_mostly",
      ExpectColumnValuesToBeBetween("x", Some(1), Some(10), mostly = 0.9), true, Nil, Nil),
    ("3rd_positive_test_with_mostly",
      ExpectColumnValuesToBeBetween("x", Some(1), Some(9), mostly = 0.9), true, Seq("10"), Seq(9)),
    ("negative_test_with_mostly",
      ExpectColumnValuesToBeBetween("x", Some(3), Some(10), mostly = 0.9), false, Seq("1", "2"), Seq(0, 1)),
    ("mostly_denominator_with_missing_values_negative",
      ExpectColumnValuesToBeBetween("z", Some(1), Some(4), mostly = 0.9), false, Seq("5"), Seq(4)),
    ("mostly_denominator_with_missing_values_positive",
      ExpectColumnValuesToBeBetween("z", Some(1), Some(4), mostly = 0.8), true, Seq("5"), Seq(4)),
    ("test_strict_min_failure",
      ExpectColumnValuesToBeBetween("x", Some(1), Some(10), strictMin = true), false, Seq("1"), Seq(0)),
    ("test_strict_min_success",
      ExpectColumnValuesToBeBetween("x", Some(1), Some(10)), true, Nil, Nil),
    ("test_strict_max_failure",
      ExpectColumnValuesToBeBetween("x", Some(0), Some(10), strictMax = true), false, Seq("10"), Seq(9)),
    ("test_strict_max_success",
      ExpectColumnValuesToBeBetween("x", Some(0), Some(10)), true, Nil, Nil),
    // in_set corpus highlights
    ("in_set_basic_positive",
      ExpectColumnValuesToBeInSet("x", (1 to 10).map(x => x: Any)), true, Nil, Nil),
    ("in_set_basic_negative",
      ExpectColumnValuesToBeInSet("x", Seq(2, 4, 6, 8, 10)), false,
      Seq("1", "3", "5", "7", "9"), Seq(0, 2, 4, 6, 8)),
    ("in_set_nulls_excluded",
      ExpectColumnValuesToBeInSet("z", Seq(1, 2, 3, 4)), false, Seq("5"), Seq(4)),
    // expect_column_values_to_be_in_set.json:54-60 — empty value_set fails
    // with every non-null value unexpected (only value_set=None is vacuous)
    ("in_set_empty_set_all_unexpected",
      ExpectColumnValuesToBeInSet("alpha", Nil), false,
      ('a' to 'j').map(_.toString), 0 to 9))

  betweenCases.foreach { case (title, e, wantSuccess, wantList, wantIdx) =>
    test(s"golden: $title") {
      val r = runOne(e)
      assert(r.exception.isEmpty, r.exception)
      assert(r.success == wantSuccess)
      val gotList = r.result("unexpected_list").asInstanceOf[Seq[String]]
      assert(gotList.sorted == wantList.sorted) // multiset compare
      val gotIdx = r.result("unexpected_index_list").asInstanceOf[Seq[String]]
      assert(gotIdx.sorted == wantIdx.map(i => s"""{"pk_index":$i}""").sorted)
    }
  }

  test("golden: error on min > max") {
    intercept[IllegalArgumentException] {
      ExpectColumnValuesToBeBetween("x", Some(10), Some(0))
    }
  }

  test("golden: error on both bounds missing") {
    intercept[IllegalArgumentException] {
      ExpectColumnValuesToBeBetween("x", None, None)
    }
  }

  test("golden: BOOLEAN_ONLY variants") {
    assert(runOne(ExpectColumnValuesToBeBetween("x", Some(1), Some(10)),
      ResultFormat.BooleanOnly).success)
    val neg = runOne(ExpectColumnValuesToBeBetween("x", Some(3), Some(10)),
      ResultFormat.BooleanOnly)
    assert(!neg.success && neg.result.isEmpty)
  }
}
