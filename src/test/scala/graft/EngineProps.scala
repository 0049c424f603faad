package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.core._

/** ScalaCheck property tests for the invariants the reference's golden
  * corpus relies on (FIXTURES.md: count identities, mostly monotonicity,
  * set partition laws). Each case drives the real fused runner. */
object EngineProps extends Properties("graft.engine") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20)

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val genValues: Gen[List[Option[Int]]] =
    Gen.listOfN(40, Gen.oneOf(
      Gen.const(None), Gen.choose(-5, 15).map(Some(_))))

  private def df(vs: List[Option[Int]]) = vs.toDF("x")

  property("count identity: element = missing + nonnull; unexpected <= nonnull") =
    forAll(genValues) { vs =>
      val r = Graft.validate(df(vs), Suite("p", Seq(
        ExpectColumnValuesToBeBetween("x", Some(0), Some(9))))).results.head
      val el = r.result("element_count").asInstanceOf[Long]
      val miss = r.result("missing_count").asInstanceOf[Long]
      val unexp = r.result("unexpected_count").asInstanceOf[Long]
      el == vs.size && miss == vs.count(_.isEmpty) && unexp <= el - miss &&
        unexp == vs.flatten.count(v => v < 0 || v > 9)
    }

  property("mostly monotone: success at high mostly implies success at lower") =
    forAll(genValues, Gen.choose(0.1, 0.9)) { (vs, m) =>
      def ok(mostly: Double) = Graft.validate(df(vs), Suite("p", Seq(
        ExpectColumnValuesToBeBetween("x", Some(0), Some(9), mostly = mostly))))
        .results.head.success
      !ok(math.min(m + 0.1, 1.0)) || ok(m)
    }

  property("in_set + not_in_set partition the non-null domain") =
    forAll(genValues) { vs =>
      val set: Seq[Any] = Seq(1, 2, 3)
      val sr = Graft.validate(df(vs), Suite("p", Seq(
        ExpectColumnValuesToBeInSet("x", set),
        ExpectColumnValuesToNotBeInSet("x", set))))
      val u1 = sr.results(0).result("unexpected_count").asInstanceOf[Long]
      val u2 = sr.results(1).result("unexpected_count").asInstanceOf[Long]
      u1 + u2 == vs.flatten.size
    }

  property("$PARAMETER resolution ≡ literal suite for any numeric bounds") =
    forAll(genValues, Gen.choose(-5, 5), Gen.choose(6, 15)) { (vs, lo, hi) =>
      val d = df(vs)
      val literal = Graft.validate(d, Suite("p", Seq(
        ExpectColumnValuesToBeBetween("x", Some(lo), Some(hi)),
        ExpectColumnMeanToBeBetween("x", Some(lo.toDouble), Some(hi.toDouble)))))
      val params = Graft.validate(d, Suite("p", Seq(
        ExpectColumnValuesToBeBetween("x", Some(ParamRef("lo")), Some(ParamRef("hi"))),
        ExpectColumnMeanToBeBetween("x", Some(ParamRef("dlo")), Some(ParamRef("dhi"))))),
        suiteParameters = Map("lo" -> lo, "hi" -> hi,
          "dlo" -> lo.toDouble, "dhi" -> hi.toDouble))
      literal.results.zip(params.results).forall { case (a, b) =>
        a.success == b.success &&
          a.result.get("unexpected_count") == b.result.get("unexpected_count")
      }
    }

  property("vacuous truth on empty domains for any map expectation") =
    forAll(Gen.choose(0.0, 1.0)) { m =>
      val empty = List.empty[Option[Int]].toDF("x")
      Graft.validate(empty, Suite("p", Seq(
        ExpectColumnValuesToBeBetween("x", Some(0), Some(1), mostly = m),
        ExpectColumnValuesToBeUnique("x", mostly = m)))).success
    }

  property("suite statistics arithmetic") =
    forAll(genValues) { vs =>
      val sr = Graft.validate(df(vs), Suite("p", Seq(
        ExpectColumnValuesToBeBetween("x", Some(0), Some(9)),
        ExpectColumnValuesToBeNull("x"),
        ExpectColumnValuesToNotBeNull("x"))))
      val st = sr.statistics
      st.evaluatedExpectations == 3 &&
        st.successfulExpectations + st.unsuccessfulExpectations == 3 &&
        st.successPercent.contains(st.successfulExpectations * 100.0 / 3)
    }

  property("exact-moment stddev ≡ Welford stddev on integer data (1e-9)") =
    forAll(Gen.listOfN(30, Gen.choose(-1000, 1000)).suchThat(_.size >= 2)) { vs =>
      import org.apache.spark.sql.functions.{col, stddev_samp}
      val d = vs.toDF("v")
      val r = d.agg(Moments.stddevExact(col("v")).as("e"),
        stddev_samp(col("v")).as("w")).head()
      val (e, w) = (r.getDouble(0), r.getDouble(1))
      // all-equal lists → stddev 0; exact form may see -0.0/tiny negative
      // under sqrt guarded upstream by require(sd != 0) in the runner
      (e.isNaN && w.isNaN) || math.abs(e - w) < 1e-9
    }
}
