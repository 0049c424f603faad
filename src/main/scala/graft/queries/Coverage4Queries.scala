package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core._

/** Coverage wave 4: the distributional hypothesis-test family (chi-square
  * goodness of fit, Cramér's φ, parameterized-distribution KS).
  *
  * Oracle strategy: the p-values are libm territory (incomplete gamma) and
  * stay golden-tested (GoldenSpec5 vs the reference fixture corpus); what
  * the DuckDB oracle checks bit-for-bit here is every DISTRIBUTED part —
  * value counts, alignment, the χ² statistic (an ordered sequential fold:
  * Spark's while-loop accumulation ≡ DuckDB list_sum over the same-ordered
  * list), Cramér's φ (IEEE sqrt of exact-count arithmetic), and the KS
  * sup-distance against the uniform CDF (pure +−×÷ and max). */
object Coverage4Queries {

  private def t(dir: String, name: String)(implicit s: SparkSession): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // q62: events.event_type vs a 3-value partition with holdout — exercises
  // scaling by (1−holdout) AND the unexpected-category fill — plus a
  // 5-value full partition (pure alignment).
  private val ChiValues = Seq("click", "view", "purchase")
  private val ChiWeights = Seq(0.5, 0.3, 0.2)
  private val ChiHoldout = 0.3
  private val ChiFull = Seq("click", "view", "purchase", "error", "signup")
  private val ChiFullW = Seq(0.35, 0.3, 0.15, 0.1, 0.1)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q62_chisquare_stat" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import s.implicits._
      val ev = t(dir, "events")
      def statOf(e: ExpectColumnChisquareTestPValueToBeGreaterThan): (Double, Long) = {
        val r = e.run(ev)
        val d = r.result("details").asInstanceOf[Map[String, Any]]
        (d("chi_squared").asInstanceOf[Double],
          d("element_count").asInstanceOf[Long])
      }
      val (s1, n1) = statOf(ExpectColumnChisquareTestPValueToBeGreaterThan(
        "event_type", ChiValues, ChiWeights, tailWeightHoldout = ChiHoldout))
      val (s2, n2) = statOf(ExpectColumnChisquareTestPValueToBeGreaterThan(
        "event_type", ChiFull, ChiFullW))
      Seq(("holdout", s1, n1), ("full", s2, n2))
        .toDF("chi_case", "chi_squared", "element_count").orderBy("chi_case")
    }),
    "q63_cramers_phi" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import s.implicits._
      val r = ExpectColumnPairCramersPhiValueToBeLessThan(
        "o_orderstatus", "o_orderpriority").run(t(dir, "orders"))
      val d = r.result("details").asInstanceOf[Map[String, Any]]
      val shape = d("crosstab_shape").asInstanceOf[Seq[Int]]
      Seq((r.result("observed_value").asInstanceOf[Double],
        d("chi_squared").asInstanceOf[Double], shape.head, shape(1)))
        .toDF("phi", "chi_squared", "n_rows", "n_cols")
    }),
    "q64_ks_uniform" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import s.implicits._
      // l_quantity ∈ {1..50} vs uniform(loc=0, scale=50): the sup-distance
      // comes out of the distributed prefix-sum ECDF (KsDistance)
      val r = ExpectColumnParameterizedDistributionKsTestPValueToBeGreaterThan(
        "l_quantity", "uniform", IndexedSeq(0.0, 50.0)).run(t(dir, "lineitem"))
      val d = r.result("details").asInstanceOf[Map[String, Any]]
      Seq((d("ks_statistic").asInstanceOf[Double],
        d("element_count").asInstanceOf[Long]))
        .toDF("ks_d", "element_count")
    }))

  // --- oracles ---------------------------------------------------------------

  private def chiCaseSql(name: String, values: Seq[String], weights: Seq[Double],
      holdout: Double): String = {
    // index order = partition literal order, then unexpected (sorted) —
    // exactly the Spark fold order; contributions fold via list_sum over
    // that ordering (sequential fold, bit-parity with the Scala while loop).
    // Coefficients are computed HERE in IEEE double and emitted as
    // string→DOUBLE casts: a bare 17-digit literal goes through DuckDB's
    // DECIMAL path (int64 mantissa beyond 2^53 + power-of-ten division),
    // which lands 1 ulp off the correctly-rounded double the Scala side
    // holds; VARCHAR→DOUBLE parsing is correctly rounded in both engines.
    // Unexpected categories are DERIVED from the data so the oracle stays
    // honest on regenerated testdata; fill = n · (h / #unexp) with
    // h / #unexp the same double ÷ int64 division the Scala side performs.
    val valsList = values.map(v => s"'$v'").mkString(", ")
    def dbl(x: Double): String = s"CAST('$x' AS DOUBLE)"
    // engine branch parity: the (1-holdout) scaling applies ONLY when the
    // data has unexpected categories (expectations.scala alignment); both
    // branch coefficients are precomputed Scala doubles
    val unexpCnt = s"(SELECT count(*) FROM cnts WHERE cat NOT IN ($valsList))"
    val exp = values.zip(weights).zipWithIndex.map { case ((v, w), i) =>
      val scaled = w * (1 - holdout)
      val e =
        if (holdout == 0.0) s"${dbl(w)} * n"
        else s"(CASE WHEN $unexpCnt > 0 THEN ${dbl(scaled)} ELSE ${dbl(w)} END) * n"
      s"SELECT $i AS ord, '$v' AS cat, $e AS e FROM nn"
    }
    val unexp =
      s"""SELECT ${values.size} + row_number() OVER (ORDER BY u.cat) - 1 AS ord,
         |  u.cat AS cat, n * (${dbl(holdout)} / $unexpCnt) AS e
         |FROM (SELECT cat FROM cnts WHERE cat NOT IN ($valsList)) u, nn""".stripMargin
    // e = 0 (zero holdout + unexpected category): the engine's IEEE fold
    // yields +Infinity; DuckDB's x/0 is NULL and list_sum would drop it
    val contrib =
      """CASE WHEN x.e = 0 THEN 'Infinity'::DOUBLE
        |  ELSE (CAST(COALESCE(c.cnt, 0) AS DOUBLE) - x.e)
        |    * (CAST(COALESCE(c.cnt, 0) AS DOUBLE) - x.e) / x.e END""".stripMargin
    s"""SELECT '$name' AS chi_case,
       |  list_sum(list($contrib ORDER BY x.ord)) AS chi_squared,
       |  (SELECT CAST(n AS BIGINT) FROM nn) AS element_count
       |FROM (${exp.mkString(" UNION ALL ")} UNION ALL $unexp) x
       |LEFT JOIN cnts c ON c.cat = x.cat""".stripMargin
  }

  private val q62Oracle: String = {
    s"""WITH cnts AS (SELECT event_type AS cat, count(*) AS cnt FROM events
       |    WHERE event_type IS NOT NULL GROUP BY 1),
       |nn AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n FROM cnts)
       |${chiCaseSql("holdout", ChiValues, ChiWeights, ChiHoldout)}
       |UNION ALL
       |${chiCaseSql("full", ChiFull, ChiFullW, 0.0)}
       |ORDER BY chi_case""".stripMargin
  }

  private val q63Oracle: String =
    // full r×c grid (zero cells included), row-major fold over sorted keys —
    // the same (i,j) order as the Scala nested loop; e = (rowS*colS)/n and
    // φ = sqrt((chi2/n)/k) with the identical operation order
    """WITH cells AS (SELECT o_orderstatus AS a, o_orderpriority AS b, count(*) AS c
      |    FROM orders GROUP BY 1, 2),
      |aks AS (SELECT DISTINCT a FROM cells), bks AS (SELECT DISTINCT b FROM cells),
      |grid AS (SELECT aks.a, bks.b, CAST(COALESCE(c.c, 0) AS DOUBLE) AS o
      |  FROM aks CROSS JOIN bks LEFT JOIN cells c ON c.a = aks.a AND c.b = bks.b),
      |tot AS (SELECT CAST(sum(o) AS DOUBLE) AS n FROM grid),
      |marg AS (SELECT g.a, g.b, g.o,
      |  sum(g.o) OVER (PARTITION BY g.a) AS rs,
      |  sum(g.o) OVER (PARTITION BY g.b) AS cs FROM grid g),
      |chi AS (SELECT list_sum(list(
      |    CASE WHEN (m.rs * m.cs) / t.n > 0
      |      THEN (m.o - (m.rs * m.cs) / t.n) * (m.o - (m.rs * m.cs) / t.n)
      |             / ((m.rs * m.cs) / t.n)
      |      ELSE 0 END ORDER BY m.a, m.b)) AS chi2,
      |  max(t.n) AS n FROM marg m, tot t),
      |shape AS (SELECT (SELECT count(*) FROM aks) AS r, (SELECT count(*) FROM bks) AS c)
      |SELECT sqrt((chi.chi2 / chi.n) / (CASE WHEN shape.r < shape.c THEN shape.r ELSE shape.c END - 1)) AS phi,
      |  chi.chi2 AS chi_squared,
      |  CAST(shape.r AS INT) AS n_rows, CAST(shape.c AS INT) AS n_cols
      |FROM chi, shape""".stripMargin

  private val q64Oracle: String =
    """WITH c AS (SELECT CAST(l_quantity AS DOUBLE) AS v, count(*) AS cnt
      |    FROM lineitem WHERE l_quantity IS NOT NULL
      |      AND NOT isnan(CAST(l_quantity AS DOUBLE)) GROUP BY 1),
      |n AS (SELECT sum(cnt) AS nn FROM c),
      |e AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS thr,
      |        sum(cnt) OVER (ORDER BY v) - cnt AS bel FROM c),
      |f AS (SELECT v, thr, bel,
      |        LEAST(GREATEST((v - 0.0) / 50.0, 0.0), 1.0) AS cdf FROM e)
      |SELECT max(GREATEST(CAST(thr AS DOUBLE) / CAST(n.nn AS DOUBLE) - cdf,
      |                    cdf - CAST(bel AS DOUBLE) / CAST(n.nn AS DOUBLE))) AS ks_d,
      |  CAST(max(n.nn) AS BIGINT) AS element_count
      |FROM f, n""".stripMargin

  val oracles: Map[String, String] = Map(
    "q62_chisquare_stat" -> q62Oracle,
    "q63_cramers_phi" -> q63Oracle,
    "q64_ks_uniform" -> q64Oracle)
}
