package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.StatsMath._

/** Scalar checks for the special functions behind the distributional
  * expectations, against independently-computed constants (scipy values
  * recorded in the reference fixture corpus and standard tables). */
class StatsMathSpec extends AnyFunSuite {

  test("chi2 sf matches the reference fixture's scipy value to 1e-12 rel") {
    // categorical_fixed ([540,320,140] vs uniform thirds, n=1000):
    // stat = 240.8, df = 2, scipy p = 5.139778209762386e-53
    val (stat, p) = chisquare(Array(540, 320, 140.0),
      Array(1000 / 3.0, 1000 / 3.0, 1000 / 3.0))
    assert(math.abs(stat - 240.8) < 1e-9)
    assert(math.abs(p - 5.139778209762386e-53) / 5.139778209762386e-53 < 1e-12)
    // exact-match partition: stat 0 -> p 1
    assert(chisquare(Array(540.0, 320, 140), Array(540.0, 320, 140))._2 == 1.0)
  }

  test("lgamma / incomplete gamma / beta against standard values") {
    assert(math.abs(lgamma(1.0)) < 1e-12)
    assert(math.abs(lgamma(5.0) - math.log(24.0)) < 1e-12)
    assert(math.abs(gammaP(1.0, 1.0) - (1 - math.exp(-1.0))) < 1e-12)
    assert(math.abs(gammaQ(0.5, 2.0) - 0.045500263896358396) < 1e-12) // erfc(√2)
    assert(math.abs(betaInc(2.0, 3.0, 0.5) - 0.6875) < 1e-12) // exact 11/16
    // I_0.3(1/2,1/2) = (2/π)·asin(√0.3)
    assert(math.abs(betaInc(0.5, 0.5, 0.3) - 0.36901011956554536) < 1e-10)
  }

  test("normal CDF symmetric and matches Φ(1.96)") {
    assert(math.abs(normCdf(0.0, 0.0, 1.0) - 0.5) < 1e-15)
    assert(math.abs(normCdf(1.959963984540054, 0, 1) - 0.975) < 1e-12)
    assert(math.abs(normCdf(-1.0, 0, 1) + normCdf(1.0, 0, 1) - 1.0) < 1e-14)
  }

  test("scipy positional-arg quirk: uniform max is a SCALE") {
    val c = cdf("uniform", IndexedSeq(-5.0, 11.0)) _
    assert(c(-5.0) == 0.0)
    assert(c(6.0) == 1.0) // support is [-5, -5+11], NOT [-5, 11]
    assert(math.abs(c(0.5) - 0.5) < 1e-15)
  }

  test("exact Kolmogorov CDF matches known table values") {
    // P(D_10 <= 0.40925) ~= 0.95 (classic two-sided 5% point for n=10)
    assert(math.abs(ksCdfExact(0.40925, 10) - 0.95) < 5e-4)
    // scipy.special.kolmogorov asymptotic: Q(1.0) = 0.26999967167735456
    assert(math.abs(ksSfAsymptotic(1.0, 1) * 1.0 - // d=1,n=1 edge unused
      ksSfAsymptotic(1.0, 1)) == 0.0)
    val q1 = { val d = 1.0; ksSfAsymptotic(d / math.sqrt(1e12), 1e12.toLong) }
    assert(math.abs(q1 - 0.26999967167735456) < 1e-10)
    // exact and asymptotic agree for large n at moderate d
    val n = 5000L
    val d = 1.36 / math.sqrt(n.toDouble)
    val ex = 1.0 - ksCdfExact(d, n)
    val as = ksSfAsymptotic(d, n)
    assert(math.abs(ex - as) < 2e-3, s"exact $ex vs asymptotic $as")
  }

  test("ksSf crossover is continuous at the exact/asymptotic boundary") {
    val n = 100000L
    val dAt = 140.0 / n // k = ceil(n d) = 140 -> exact path
    val dAbove = 141.5 / n // asymptotic path
    val a = ksSf(dAt, n)
    val b = ksSf(dAbove, n)
    assert(a > b && a < 1.0 && b > 0.0)
    assert(math.abs(a - ksSfAsymptotic(dAt, n)) < 1e-3)
  }
}
