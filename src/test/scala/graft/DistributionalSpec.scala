package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Spark-level regression cases for the distributional expectations (the
  * edges the fixture corpus does not reach). */
class DistributionalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions.col

  private def toDf(name: String, vs: Seq[Any]) = {
    import spark.implicits._
    vs.map(String.valueOf(_)).toDF(name)
  }

  test("cramers phi with an explicit numeric edge list of 3+ bins") {
    import spark.implicits._
    // 1..12 binned into [0,4),[4,8),[8,12] vs a perfectly-aligned category
    val df = (1 to 12).map { i =>
      (i.toDouble, if (i < 4) 0 else if (i < 8) 1 else 2)
    }.toDF("x", "g")
    val evr = ExpectColumnPairCramersPhiValueToBeLessThan(
      "x", "g", binsA = Some(Seq(0, 4, 8, 12))).run(df)
    assert(evr.exception.isEmpty, s"3-bin edge list threw: ${evr.exception}")
    assert(evr.observed.contains(1.0)) // perfect association
  }

  test("chi-square: unexpected category without holdout -> inf stat, p = 0") {
    import spark.implicits._
    val df = (Seq.fill(50)("a") ++ Seq.fill(50)("b") ++ Seq.fill(5)("zzz"))
      .toDF("c")
    val evr = ExpectColumnChisquareTestPValueToBeGreaterThan(
      "c", Seq("a", "b"), Seq(0.5, 0.5)).run(df)
    assert(evr.exception.isEmpty)
    assert(!evr.success)
    assert(evr.observed.contains(0.0)) // scipy: stat = inf, p = 0 (not NaN)
    val stat = evr.result("details").asInstanceOf[Map[String, Any]]("chi_squared")
      .asInstanceOf[Double]
    assert(stat.isPosInfinity)
  }

  test("distributed prefix-sum ECDF == local sorted-sample KS statistic") {
    import spark.implicits._
    import graft.functions.StatsMath
    // 100k skewed values across many partitions, with ties plus null/NaN
    // rows that must be excluded from both the count and the sup
    val vals = (0 until 100000).map(i => math.pow(i % 1000 / 1000.0, 2.0))
    val df = (vals.map(v => java.lang.Double.valueOf(v)) ++
      Seq[java.lang.Double](null, Double.NaN)).toDF("v")
      .repartition(37)
    val cdf = StatsMath.cdf("uniform", IndexedSeq(0.0, 1.0)) _
    val (d, n) = KsDistance.supDistance(df, "v", cdf)
    assert(n == 100000L)
    // local reference: classic sorted-sample sup over the same data
    val sorted = vals.sorted
    var best = 0.0
    var i = 0
    while (i < sorted.length) {
      val f = cdf(sorted(i))
      best = math.max(best, math.max((i + 1).toDouble / n - f,
        f - i.toDouble / n))
      i += 1
    }
    assert(d == best, s"distributed $d vs local $best")
  }

  test("KS asymptotic guard: near-perfect fit at huge n gives p ~ 1") {
    import graft.functions.StatsMath
    val n = 10000000L
    val d = 1.0 / (4.0 * n) // t = n d^2 ~ 6e-15
    assert(StatsMath.ksSf(d, n) == 1.0)
    // and the boundary above the guard still decreases monotonically
    assert(StatsMath.ksSfAsymptotic(math.sqrt(0.01 / n), n) >
      StatsMath.ksSfAsymptotic(math.sqrt(2.0 / n), n))
  }
}
