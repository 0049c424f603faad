package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Golden corpus wave 2 — cases transcribed from the reference's
  * cross-engine JSON fixtures for unique / increasing / match_regex
  * (tests/test_definitions/column_map_expectations/
  * expect_column_values_to_be_unique.json, .._to_be_increasing.json,
  * .._to_match_regex.json; backend-suppressed cases skipped per their
  * only_for/suppress_test_for tags). Comparison rules per
  * self_check/util.py: unexpected lists as multisets. The reference's
  * increasing metric evaluates in dataframe order; transcribed here as
  * orderBy the fixture's pk_index with no partition (the global-window
  * shape). */
class GoldenSpec2 extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // expect_column_values_to_be_unique.json dataset
  lazy val uniqueDf = {
    val unique = Seq[Any](1, 2, 3, null)
    val c = Seq[Any](1, 1, 2, null)
    val n = Seq[Any](null, null, 2, null)
    val multDup = Seq[Any]("1", "1", "2", "2")
    val allNull = Seq[Any](null, null, null, null)
    (0 to 3).map(i => (i,
      Option(unique(i)).map(_.asInstanceOf[Int]),
      Option(c(i)).map(_.asInstanceOf[Int]),
      Option(n(i)).map(_.asInstanceOf[Int]),
      multDup(i).asInstanceOf[String],
      Option(allNull(i)).map(_.asInstanceOf[Int])))
      .toDF("pk_index", "unique", "c", "n", "mult_dup", "null_col")
  }

  // expect_column_values_to_be_increasing.json dataset
  lazy val incDf = {
    val w = Seq(1, 2, 3, 4, 5, 5, 4, 3, 2, 1).map(Option(_))
    val x = Seq(2, 3, 4, 5, 6, 7, 8, 9, 10).map(Option(_)) :+ None
    val y = Seq(1, 1, 1, 2, 2, 2, 3, 3, 3, 4).map(Option(_))
    val a = Seq(None, Some(0), None, None, Some(1), None, None, Some(2), None, None)
    val b = Seq(None, Some(0), None, None, Some(2), None, None, Some(1), None, None)
    (0 to 9).map(i => (i, w(i), x(i), y(i), a(i), b(i)))
      .toDF("pk_index", "w", "x", "y", "a", "b")
  }

  // expect_column_values_to_match_regex.json dataset
  lazy val regexDf = {
    val a = Seq("aaa", "abb", "acc", "add", "bee")
    val b = Seq(Some("aaa"), Some("abb"), Some("acc"), Some("bdd"), None)
    (0 to 4).map(i => (i, a(i), b(i))).toDF("pk_index", "a", "b")
  }

  private def runOne(df: org.apache.spark.sql.DataFrame, e: Expectation): Evr =
    new SuiteRunner(ResultFormat.Complete, idColumns = Seq("pk_index"))
      .run(df, Suite("golden2", Seq(e))).results.head

  /** (title, df, expectation, success, unexpected_list, pk indexes) */
  val cases: Seq[(String, () => org.apache.spark.sql.DataFrame, Expectation,
      Boolean, Seq[String], Seq[Int])] = Seq(
    // --- unique -------------------------------------------------------------
    ("unique_basic_positive", () => uniqueDf,
      ExpectColumnValuesToBeUnique("unique"), true, Nil, Nil),
    ("unique_negative_numeric", () => uniqueDf,
      ExpectColumnValuesToBeUnique("c"), false, Seq("1", "1"), Seq(0, 1)),
    ("unique_positive_mostly", () => uniqueDf,
      ExpectColumnValuesToBeUnique("c", mostly = 0.3), true, Seq("1", "1"), Seq(0, 1)),
    ("unique_negative_mostly", () => uniqueDf,
      ExpectColumnValuesToBeUnique("c", mostly = 0.4), false, Seq("1", "1"), Seq(0, 1)),
    ("unique_positive_multiple_nulls", () => uniqueDf,
      ExpectColumnValuesToBeUnique("n"), true, Nil, Nil),
    ("unique_negative_multiple_duplicates", () => uniqueDf,
      ExpectColumnValuesToBeUnique("mult_dup"), false,
      Seq("1", "1", "2", "2"), Seq(0, 1, 2, 3)),
    ("unique_positive_all_null", () => uniqueDf,
      ExpectColumnValuesToBeUnique("null_col"), true, Nil, Nil),
    // --- increasing ---------------------------------------------------------
    ("increasing_basic_positive", () => incDf,
      ExpectColumnValuesToBeIncreasing("x", orderBy = Seq("pk_index")), true, Nil, Nil),
    ("increasing_2nd_basic_positive", () => incDf,
      ExpectColumnValuesToBeIncreasing("y", orderBy = Seq("pk_index")), true, Nil, Nil),
    ("increasing_positive_with_strictly", () => incDf,
      ExpectColumnValuesToBeIncreasing("y", strictly = true, orderBy = Seq("pk_index")),
      false, Seq("1", "1", "2", "2", "3", "3"), Seq(1, 2, 4, 5, 7, 8)),
    ("increasing_basic_negative", () => incDf,
      ExpectColumnValuesToBeIncreasing("w", orderBy = Seq("pk_index")),
      false, Seq("4", "3", "2", "1"), Seq(6, 7, 8, 9)),
    ("increasing_positive_interspersed_nulls", () => incDf,
      ExpectColumnValuesToBeIncreasing("a", orderBy = Seq("pk_index")), true, Nil, Nil),
    ("increasing_negative_interspersed_nulls", () => incDf,
      ExpectColumnValuesToBeIncreasing("b", orderBy = Seq("pk_index")),
      false, Seq("1"), Seq(7)),
    // --- match_regex --------------------------------------------------------
    ("regex_negative_insufficient_mostly", () => regexDf,
      ExpectColumnValuesToMatchRegex("a", "^a", mostly = 0.9),
      false, Seq("bee"), Seq(4)),
    ("regex_positive_exact_mostly", () => regexDf,
      ExpectColumnValuesToMatchRegex("a", "^a", mostly = 0.8),
      true, Seq("bee"), Seq(4)),
    ("regex_with_nulls", () => regexDf,
      ExpectColumnValuesToMatchRegex("b", "^a"),
      false, Seq("bdd"), Seq(3)))

  cases.foreach { case (title, df, e, wantSuccess, wantList, wantIdx) =>
    test(s"golden2: $title") {
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

  test("golden2: grouped-unique path (no index columns) matches the corpus") {
    // without index columns the runner takes the groupBy-combine path;
    // value multisets (incl. row multiplicity) must match the fixtures
    def values(col: String): Seq[String] =
      Graft.validate(uniqueDf, Suite("g", Seq(ExpectColumnValuesToBeUnique(col))),
        ResultFormat.Complete).results.head
        .result("unexpected_list").asInstanceOf[Seq[String]]
    assert(values("mult_dup").sorted == Seq("1", "1", "2", "2"))
    assert(values("c").sorted == Seq("1", "1"))
    assert(values("unique").isEmpty)
    assert(values("null_col").isEmpty)
  }
}
