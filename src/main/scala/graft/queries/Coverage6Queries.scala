package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core._

/** Coverage wave 6 (round 5): the bootstrapped-KS metric — the last
  * golden-only distributional metric — oracle-checked end-to-end through
  * the expectation's cross-engine-exact resolution mode.
  *
  * The oracle SQL is generated from the SAME Scala constants the engine
  * evaluates (partition CDF ordinates, interpolation coefficients, the
  * one KS critical value), every double emitted as a VARCHAR→DOUBLE cast
  * (DuckDB's bare-literal DECIMAL path misrounds 17-digit mantissas), and
  * the md5 resample is the q39 sampler's hex-prefix technique — so the
  * bootstrap p-value matches bit-for-bit, not approximately. */
object Coverage6Queries {

  private def t(dir: String, name: String)(implicit s: SparkSession): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // q92 constants (shared by the expectation call and the oracle text)
  private val Q92Edges = Seq(0.0, 10.0, 25.0, 50.0)
  private val Q92Weights = Seq(0.3, 0.3, 0.4)
  private val Q92Samples = 200
  private val Q92Size = 25
  private val Q92Seed = 42L
  private val Q92P = 0.05

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    /** Bootstrapped KS through the ENGINE path (exact = true): 200
      * md5-seeded resamples of 25 from l_quantity's value histogram,
      * each KS-tested against a deliberately-offset partition CDF
      * (uniform data vs 0.3/0.3/0.4 weights ⇒ a nontrivial pass/fail
      * mix), p-value = (1 + #pass)/201 — an exact rational. */
    "q92_bootstrap_ks" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import s.implicits._
      val evr = ExpectColumnBootstrappedKsTestPValueToBeGreaterThan(
        "l_quantity", Q92Edges, Q92Weights, p = Q92P,
        bootstrapSamples = Q92Samples, bootstrapSampleSize = Q92Size,
        seed = Q92Seed, exact = true).run(t(dir, "lineitem"))
      val d = evr.result("details").asInstanceOf[Map[String, Any]]
      Seq((d("element_count").asInstanceOf[Long],
        d("n_above").asInstanceOf[Long],
        evr.result("observed_value").asInstanceOf[Double],
        evr.success))
        .toDF("element_count", "n_above", "p_value", "success")
    }))

  private def dbl(x: Double): String = s"CAST('$x' AS DOUBLE)"

  /** The engine's interpCdf when-chain, transcribed with the identical
    * precomputed coefficients and the identical a + b*(v-e)/d evaluation
    * order (SQL * and / are left-associative like Column ops). */
  private def interpSql(v: String, edges: Seq[Double],
      weights: Seq[Double]): String = {
    val cdf = ExpectColumnBootstrappedKsTestPValueToBeGreaterThan.cdfOf(weights)
    val first = s"WHEN $v <= ${dbl(edges.head)} THEN ${dbl(cdf(0))}"
    val mids = (1 until edges.length).map { i =>
      val dc = cdf(i) - cdf(i - 1)
      val de = edges(i) - edges(i - 1)
      s"WHEN $v < ${dbl(edges(i))} THEN ${dbl(cdf(i - 1))} + ${dbl(dc)} * " +
        s"($v - ${dbl(edges(i - 1))}) / ${dbl(de)}"
    }
    s"CASE $first ${mids.mkString(" ")} ELSE ${dbl(cdf.last)} END"
  }

  private val q92Oracle: String = {
    val dCrit = graft.functions.StatsMath.ksCritical(Q92Size.toLong, Q92P)
    val pv = s"(CAST(1 AS DOUBLE) + CAST(agg.n_above AS DOUBLE)) / " +
      s"CAST(${Q92Samples + 1} AS DOUBLE)"
    s"""WITH vals AS (SELECT CAST(l_quantity AS DOUBLE) AS v FROM lineitem
       |    WHERE l_quantity IS NOT NULL AND NOT isnan(CAST(l_quantity AS DOUBLE))),
       |hist AS (SELECT v, count(*) AS cnt FROM vals GROUP BY v),
       |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM hist),
       |rng AS (SELECT v, sum(cnt) OVER (ORDER BY v) - cnt AS lo,
       |        sum(cnt) OVER (ORDER BY v) AS hi FROM hist),
       |draws AS (SELECT ss.s AS s, ii.i AS i,
       |    CAST(('0x' || substr(md5('$Q92Seed:' || CAST(ss.s AS VARCHAR) || ':' || CAST(ii.i AS VARCHAR)), 1, 15)) AS BIGINT) AS u
       |  FROM unnest(generate_series(0, ${Q92Samples - 1})) AS ss(s),
       |       unnest(generate_series(0, ${Q92Size - 1})) AS ii(i)),
       |drawn AS (SELECT d.s, d.i, r.v FROM draws d CROSS JOIN tot t
       |  JOIN rng r ON (d.u % t.n) >= r.lo AND (d.u % t.n) < r.hi),
       |scored AS (SELECT s, v, row_number() OVER (PARTITION BY s ORDER BY v, i) AS rn,
       |    ${interpSql("v", Q92Edges, Q92Weights)} AS f FROM drawn),
       |ds AS (SELECT s, max(GREATEST(CAST(rn AS DOUBLE) / CAST($Q92Size AS DOUBLE) - f,
       |    f - CAST(rn - 1 AS DOUBLE) / CAST($Q92Size AS DOUBLE))) AS d
       |  FROM scored GROUP BY s),
       |agg AS (SELECT CAST(sum(CASE WHEN d <= ${dbl(dCrit)} THEN 1 ELSE 0 END) AS BIGINT) AS n_above FROM ds)
       |SELECT (SELECT n FROM tot) AS element_count, agg.n_above AS n_above,
       |  $pv AS p_value, $pv > ${dbl(Q92P)} AS success
       |FROM agg""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q92_bootstrap_ks" -> q92Oracle)
}
