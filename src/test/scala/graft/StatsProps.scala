package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.StatsMath._

/** Property-based invariants for the special functions behind the
  * distributional expectations. */
class StatsProps extends Properties("StatsMath") {

  private val pos = Gen.choose(0.05, 50.0)
  private val unit = Gen.choose(1e-6, 1.0 - 1e-6)

  property("gammaP + gammaQ = 1") = forAll(pos, pos) { (a, x) =>
    math.abs(gammaP(a, x) + gammaQ(a, x) - 1.0) < 1e-10
  }

  property("betaInc symmetry I_x(a,b) = 1 - I_{1-x}(b,a)") =
    forAll(pos, pos, unit) { (a, b, x) =>
      math.abs(betaInc(a, b, x) - (1.0 - betaInc(b, a, 1.0 - x))) < 1e-9
    }

  property("parameterized CDFs monotone and bounded") =
    forAll(Gen.choose(-5.0, 5.0), Gen.choose(0.0, 3.0)) { (x, d) =>
      Seq(
        "norm" -> IndexedSeq(0.0, 1.0),
        "gamma" -> IndexedSeq(2.0, 0.0, 1.0),
        "chi2" -> IndexedSeq(3.0, 0.0, 1.0),
        "beta" -> IndexedSeq(2.0, 3.0, 0.0, 1.0),
        "uniform" -> IndexedSeq(-1.0, 2.0),
        "expon" -> IndexedSeq(0.0, 1.0)).forall { case (name, args) =>
        val f = cdf(name, args) _
        val lo = f(x); val hi = f(x + d)
        lo >= 0.0 && hi <= 1.0 && lo <= hi + 1e-12
      }
    }

  property("exact Kolmogorov CDF monotone in d, bounded") =
    forAll(Gen.choose(5L, 200L), Gen.choose(0.05, 0.5),
      Gen.choose(0.0, 0.3)) { (n, d, delta) =>
      val a = ksCdfExact(d, n)
      val b = ksCdfExact(math.min(0.99, d + delta), n)
      a >= -1e-12 && b <= 1.0 + 1e-12 && a <= b + 1e-9
    }

  property("ksSf in [0,1], non-increasing in d") =
    forAll(Gen.choose(10L, 100000L), Gen.choose(1e-4, 0.8),
      Gen.choose(1.0, 2.0)) { (n, d, k) =>
      val p1 = ksSf(d, n)
      val p2 = ksSf(math.min(0.99, d * k), n)
      p1 >= 0.0 && p1 <= 1.0 && p2 <= p1 + 1e-6
    }

  property("chisquare permutation-invariant, p in [0,1]") =
    forAll(Gen.listOfN(5, Gen.choose(1L, 500L))) { counts =>
      val o = counts.map(_.toDouble).toArray
      val n = o.sum
      val e = Array.fill(5)(n / 5.0)
      val (s1, p1) = chisquare(o, e)
      val (s2, p2) = chisquare(o.reverse, e)
      Prop.propBoolean(
        math.abs(s1 - s2) < 1e-9 * math.max(1.0, s1) &&
          p1 >= 0.0 && p1 <= 1.0 && math.abs(p1 - p2) < 1e-9)
    }
}
