package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core._

class ProfilerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("profiled suite validates green against its own batch") {
    val df = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    val suite = SuiteProfiler.profile(df)
    val sr = Graft.validate(df, suite)
    assert(sr.success, sr.results.filterNot(_.success).map(e =>
      s"${e.expectationType}/${e.kwargs.get("column")}: ${e.result} ${e.exception}"))
    assert(sr.results.size == 10) // 1 table + 3 not_null + 2 between + 1 length + 1 set + 2 unique
  }

  test("derivation rules: mostly percent, set gating, uniqueness") {
    val df = Seq(
      (1, Some("a"), "x"), (2, Some("a"), "y"), (3, Some("b"), "z"),
      (4, None, "x")).toDF("id", "cat", "dup")
    val suite = SuiteProfiler.profile(df, cardinalityLimit = 2)
    val byType = suite.expectations.groupBy(_.expectationType)

    // cat: 3/4 non-null → mostly 75% via integer arithmetic
    val notNulls = byType("expect_column_values_to_not_be_null")
      .collect { case e: ExpectColumnValuesToNotBeNull => e.column -> e.mostly }
      .toMap
    assert(notNulls("cat") == 0.75)
    assert(notNulls("id") == 1.0)

    // set only for ≤2 distinct: cat (a,b); id (4) and dup (3) are above
    val sets = byType("expect_column_distinct_values_to_be_in_set")
      .collect { case e: ExpectColumnDistinctValuesToBeInSet => e.column -> e.valueSet }
      .toMap
    assert(sets.keySet == Set("cat"))
    assert(sets("cat") == Seq("a", "b"))

    // unique: id (all distinct) and cat (a,a,b → no); dup has a repeat
    val uniques = byType("expect_column_values_to_be_unique")
      .collect { case e: ExpectColumnValuesToBeUnique => e.column }.toSet
    assert(uniques == Set("id"))

    // between bounds from observed min/max
    val betweens = byType("expect_column_values_to_be_between")
      .collect { case e: ExpectColumnValuesToBeBetween =>
        e.column -> (e.minValue, e.maxValue) }.toMap
    assert(betweens("id") == (Some(1.0), Some(4.0)))

    // the derived suite is green on the batch it came from
    assert(Graft.validate(df, suite).success)
  }

  test("text profiler annotate: empty text gives zero counts, null fracs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val d = Seq((1L, ""), (2L, "one"), (3L, "a a b")).toDF("doc_id", "text")
    val a = TextProfiler.annotate(d, "text")
      .select("doc_id", "n_words", "top_word_frac", "dup_2gram_frac")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(a(1L) == ((0, None, None)))
    assert(a(2L) == ((1, Some(1.0), None)))
    assert(a(3L)._1 == 3 && a(3L)._2.isDefined && a(3L)._3.isDefined)
  }

  test("text profiler: derived gates validate green on their own corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val suite = TextProfiler.textSuite(docs, "text")
    val annotated = TextProfiler.annotate(docs, "text")
    val sr = Graft.validate(annotated, suite)
    assert(sr.success, sr.results.map(r =>
      s"${r.expectationType}: ${r.exception}").mkString("; "))
    // the IQR band really is a band: some docs fall outside it
    val iqr = sr.results.head
    assert(iqr.result("unexpected_count").asInstanceOf[Long] > 0L)
    // ceilings are maxima: zero rows above them
    sr.results.drop(1).foreach(r =>
      assert(r.result("unexpected_count") == 0L, r.expectationType))
  }
}
