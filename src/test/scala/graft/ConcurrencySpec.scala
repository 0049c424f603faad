package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** The runner submits independent metric jobs concurrently; these cases
  * hammer that path — many domains, VALUE jobs, window jobs, and failure
  * isolation all in flight at once — and require run-to-run stability. */
class ConcurrencySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def df = {
    import spark.implicits._
    (1 to 2000).map(i =>
      (i.toLong, i % 7, s"v${i % 13}", if (i % 11 == 0) null else s"w$i"))
      .toDF("id", "grp", "cat", "maybe")
  }

  private def suite = Suite("stress", Seq(
    // three distinct row_condition domains → three fused jobs
    ExpectColumnValuesToNotBeNull("maybe", rowCondition = Some("grp = 0")),
    ExpectColumnValuesToNotBeNull("maybe", rowCondition = Some("grp = 1")),
    ExpectColumnValuesToNotBeNull("maybe"),
    ExpectColumnValuesToBeBetween("id", Some(1), Some(2000)),
    ExpectColumnValuesToMatchRegex("cat", "^v"),
    // window/uniqueness jobs
    ExpectColumnValuesToBeUnique("id"),
    ExpectColumnValuesToBeUnique("cat"), // fails: 13 distinct over 2000
    // aggregates (incl. the count/count-distinct pair that must NOT dedup)
    ExpectColumnProportionOfUniqueValuesToBeBetween("cat",
      Some(0.0), Some(0.01)),
    ExpectColumnUniqueValueCountToBeBetween("cat", Some(13), Some(13)),
    // VALUE jobs
    ExpectColumnMedianToBeBetween("id", Some(1000.0), Some(1001.0)),
    ExpectColumnMostCommonValueToBeInSet("grp", Seq(1, 2, 3), tiesOkay = true),
    ExpectColumnDistinctValuesToContainSet("grp", Seq(0, 6)),
    // isolated failure must not poison any sibling
    ExpectColumnValuesToNotBeNull("no_such_column")))

  test("concurrent metric jobs: stable results across repeated runs") {
    val runs = (1 to 5).map(_ => Graft.validate(df, suite))
    val fingerprints = runs.map(_.results.map(e =>
      (e.expectationType, e.kwargs.get("column").orNull,
        e.success, e.exception.isDefined,
        e.result.get("unexpected_count"), e.observed)))
    assert(fingerprints.distinct.size == 1,
      s"unstable results across runs:\n${fingerprints.distinct.mkString("\n")}")
    val r = runs.head.results
    assert(r.count(_.exception.isDefined) == 1) // only the missing column
    assert(r(5).success && !r(6).success) // id unique, cat not
    assert(r(7).success) // 13/2000 = 0.0065 — count vs count_distinct intact
  }
}
