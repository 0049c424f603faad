package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Golden corpus wave 3 — value_lengths_to_be_between and not_be_in_set
  * cases transcribed from the reference fixtures
  * (tests/test_definitions/column_map_expectations/
  * expect_column_value_lengths_to_be_between.json, .._to_not_be_in_set.json;
  * backend-tagged and catch_exceptions harness cases skipped). */
class GoldenSpec3 extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val lenDf = {
    val s1 = Seq("smart", "silly", "sassy", "slimy", "sexy")
    val s2 = Seq("cool", "calm", "collected", "casual", "creepy")
    val s3 = Seq(Some("cool"), Some("calm"), Some("collected"), Some("casual"), None)
    (0 to 4).map(i => (i, s1(i), s2(i), s3(i)))
      .toDF("pk_index", "s1", "s2", "s3")
  }

  lazy val setDf = {
    val x = Seq(1, 2, 4)
    val z = Seq("hello", "jello", "mello")
    val y = Seq(1.1, 2.2, 5.5)
    val n = Seq(None, None, Some(2))
    (0 to 2).map(i => (i, x(i), z(i), y(i), n(i)))
      .toDF("pk_index", "x", "z", "y", "n")
  }

  private def runOne(df: org.apache.spark.sql.DataFrame, e: Expectation): Evr =
    new SuiteRunner(ResultFormat.Complete, idColumns = Seq("pk_index"))
      .run(df, Suite("golden3", Seq(e))).results.head

  val cases: Seq[(String, () => org.apache.spark.sql.DataFrame, Expectation,
      Boolean, Seq[String], Seq[Int])] = Seq(
    // --- value_lengths_to_be_between ------------------------------------------
    ("lengths_positive_exact_min_max", () => lenDf,
      ExpectColumnValueLengthsToBeBetween("s1", Some(4), Some(5)), true, Nil, Nil),
    ("lengths_negative_max_too_small", () => lenDf,
      ExpectColumnValueLengthsToBeBetween("s2", Some(4), Some(8)),
      false, Seq("collected"), Seq(2)),
    ("lengths_negative_min_too_large", () => lenDf,
      ExpectColumnValueLengthsToBeBetween("s2", Some(5), Some(9)),
      false, Seq("cool", "calm"), Seq(0, 1)),
    ("lengths_positive_null_min", () => lenDf,
      ExpectColumnValueLengthsToBeBetween("s1", None, Some(5)), true, Nil, Nil),
    ("lengths_positive_null_max", () => lenDf,
      ExpectColumnValueLengthsToBeBetween("s1", Some(4), None), true, Nil, Nil),
    ("lengths_positive_with_missing_value", () => lenDf,
      ExpectColumnValueLengthsToBeBetween("s3", Some(4), Some(9)), true, Nil, Nil),
    // --- not_be_in_set --------------------------------------------------------
    ("not_in_set_positive_absent_value", () => setDf,
      ExpectColumnValuesToNotBeInSet("x", Seq(0)), true, Nil, Nil),
    ("not_in_set_negative_one_present", () => setDf,
      ExpectColumnValuesToNotBeInSet("x", Seq(1)), false, Seq("1"), Seq(0)),
    ("not_in_set_positive_empty_set", () => setDf,
      ExpectColumnValuesToNotBeInSet("x", Nil), true, Nil, Nil),
    ("not_in_set_negative_all_strings", () => setDf,
      ExpectColumnValuesToNotBeInSet("z", Seq("hello", "jello", "mello")),
      false, Seq("hello", "jello", "mello"), Seq(0, 1, 2)),
    ("not_in_set_positive_substring_not_member", () => setDf,
      ExpectColumnValuesToNotBeInSet("z", Seq("ello")), true, Nil, Nil),
    ("not_in_set_negative_floats_mostly", () => setDf,
      ExpectColumnValuesToNotBeInSet("y", Seq(1.1, 2.2), mostly = 0.65),
      false, Seq("1.1", "2.2"), Seq(0, 1)))

  cases.foreach { case (title, df, e, wantSuccess, wantList, wantIdx) =>
    test(s"golden3: $title") {
      val r = runOne(df(), e)
      assert(r.exception.isEmpty, r.exception)
      assert(r.success == wantSuccess)
      val gotList = r.result("unexpected_list").asInstanceOf[Seq[String]]
      assert(gotList.sorted == wantList.sorted, s"values: $gotList")
      val gotIdx = r.result("unexpected_index_list").asInstanceOf[Seq[String]]
      assert(gotIdx.sorted == wantIdx.map(i => s"""{"pk_index":$i}""").sorted,
        s"indexes: $gotIdx")
    }
  }

  test("golden3: error on lengths max < min (reference catch_exceptions case)") {
    // the reference surfaces this as a caught exception; here the invalid
    // bound pair is rejected at construction
    intercept[IllegalArgumentException] {
      ExpectColumnValuesToBeBetween("s1", Some(1), Some(0))
    }
  }
}
