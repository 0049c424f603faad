package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core._

/** Coverage wave 5 (round 4): the auto-partition KL path end-to-end and the
  * reference-shaped aggregate-EVR count fields. */
object Coverage5Queries {

  private def t(dir: String, name: String)(implicit s: SparkSession): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    /** Auto-partition KL (partition built FROM the batch, reference
      * kl_divergence.py:578-590): the data-derived bin count travels
      * through the expectation's details, and the self-comparison KL must
      * clear a tiny threshold after holdout scaling + normalization. The
      * auto n_bins is the q50-checked FD/Sturges rule — here verified
      * through the expectation itself rather than ColumnPartition. */
    "q67_kl_auto_partition" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import s.implicits._
      val li = t(dir, "lineitem")
      def run(name: String, e: ExpectColumnKlDivergenceAutoToBeLessThan) = {
        val evr = e.run(li)
        val nBins = evr.result("details").asInstanceOf[Map[String, Any]](
          "expected_partition").asInstanceOf[Map[String, Any]]("bins")
          .asInstanceOf[Seq[_]].size - 1
        (name, nBins, evr.success)
      }
      Seq(
        // self-comparison KL is zero up to normalization dust (|kl| ≤
        // ~1e-16, sign not deterministic — Σweights rounds either side
        // of 1), so every threshold is 1e-9, far above the dust and far
        // below any real divergence
        run("auto_strict", ExpectColumnKlDivergenceAutoToBeLessThan(
          "l_quantity", threshold = 1e-9, bins = "auto")),
        // internal holdout scales expected by 0.8; scipy-normalization
        // cancels it up to FP dust — well under 1e-9
        run("uniform7_internal", ExpectColumnKlDivergenceAutoToBeLessThan(
          "l_quantity", threshold = 1e-9, bins = "uniform", nBins = 7,
          internalWeightHoldout = 0.2)),
        run("ntile4_strict", ExpectColumnKlDivergenceAutoToBeLessThan(
          "l_quantity", threshold = 1e-9, bins = "ntile", nBins = 4)))
        .toDF("kl_case", "n_bins", "success").orderBy("kl_case")
    }),
    /** Aggregate EVRs carry element_count/missing_count/missing_percent
      * like the reference's (mean over a column with planted nulls; the
      * fused pass resolves the counts via the dedup'd __ec/__nn
      * aggregates). */
    "q68_agg_result_fields" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import s.implicits._
      val d = t(dir, "lineitem").selectExpr(
        "CASE WHEN l_orderkey % 7 = 0 THEN NULL ELSE l_quantity END AS q")
      val sr = Graft.validate(d, Suite("agg", Seq(
        ExpectColumnMeanToBeBetween("q", Some(1.0), Some(50.0)),
        ExpectColumnSumToBeBetween("q", Some(1.0), None))))
      sr.results.map { r =>
        (r.expectationType, r.success,
          r.result("element_count").asInstanceOf[Long],
          r.result("missing_count").asInstanceOf[Long],
          r.result("missing_percent").asInstanceOf[Double])
      }.toDF("expectation_type", "success", "element_count", "missing_count",
        "missing_pct").orderBy("expectation_type")
    }),
    /** Star-contraction connected components on a CHAIN-shaped graph —
      * the diameter regime min-label propagation cannot handle (the
      * Kiveris SoCC'14 path). Edges link consecutive doc_ids with a break
      * before every multiple of 10, so components are the exact intervals
      * [10m, 10m+9] and the oracle has the closed form id - id%10. */
    "q69_cc_star_chain" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val d = t(dir, "documents").select(col("doc_id"))
      val maxId = d.agg(max("doc_id")).head().getLong(0)
      val pairs = d
        .filter((col("doc_id") + 1) % 10 =!= 0 && col("doc_id") < maxId)
        .select(col("doc_id").as("doc_a"), (col("doc_id") + 1L).as("doc_b"))
      graft.operators.Dedup.connectedComponentsStar(pairs, "doc_a", "doc_b")
        .select(col("id").cast("bigint").as("id"),
          col("cluster").cast("bigint").as("cluster"))
        .orderBy("id")
    }),
    /** Suite profiler (the reference's UserConfigurableProfiler flow):
      * derive a suite FROM the batch — emitted as rows so DuckDB can
      * reproduce every derived parameter from the same table. */
    "q72_profile_suite" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      SuiteProfiler.profileRows(t(dir, "nation"))
        .orderBy(col("column"), col("expectation_type"))
    }))

  // --- oracles ---------------------------------------------------------------

  /** auto n_bins: the same exact-integer FD/Sturges rule as q50's oracle. */
  private val q67Oracle: String =
    """SELECT kl_case, CAST(n_bins AS INT) AS n_bins, TRUE AS success FROM (
      | SELECT 'auto_strict' AS kl_case,
      |   GREATEST(CAST(length(bin(CAST(cnt AS BIGINT))) AS BIGINT), fdb) AS n_bins
      | FROM (
      |   SELECT cnt, min(CASE WHEN CAST(b AS DOUBLE)*b*b >= r*r*r*cnt THEN b END) AS fdb
      |   FROM (SELECT cnt, (mx - mn) / (2.0 * (q75 - q25)) AS r
      |         FROM (SELECT min(l_quantity) AS mn, max(l_quantity) AS mx,
      |           quantile_cont(l_quantity, 0.25) AS q25, quantile_cont(l_quantity, 0.75) AS q75,
      |           CAST(count(l_quantity) AS DOUBLE) AS cnt FROM lineitem)),
      |        (SELECT unnest(generate_series(1, 100000)) AS b)
      |   GROUP BY cnt, r)
      | UNION ALL SELECT 'uniform7_internal', 7
      | UNION ALL SELECT 'ntile4_strict', 4
      |) u ORDER BY kl_case""".stripMargin

  private val q68Oracle: String =
    """SELECT expectation_type, TRUE AS success,
      | ec AS element_count, mc AS missing_count,
      | CAST(mc AS DOUBLE) / ec * 100 AS missing_pct
      |FROM (SELECT CAST(count(*) AS BIGINT) AS ec,
      |        CAST(sum(CASE WHEN l_orderkey % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS mc
      |      FROM lineitem) s,
      |     (SELECT unnest(['expect_column_mean_to_be_between',
      |                     'expect_column_sum_to_be_between']) AS expectation_type) e
      |ORDER BY expectation_type""".stripMargin

  val oracles: Map[String, String] = Map(
    "q67_kl_auto_partition" -> q67Oracle,
    "q68_agg_result_fields" -> q68Oracle,
    "q69_cc_star_chain" ->
      """SELECT CAST(doc_id AS BIGINT) AS id,
        | CAST(doc_id - (doc_id % 10) AS BIGINT) AS cluster
        |FROM documents ORDER BY id""".stripMargin,
    "q72_profile_suite" -> q72Oracle)

  /** Reproduce every profiler-derived parameter from the nation table:
    * integer-arithmetic mostly percent, min/max bounds, length bounds,
    * gated sorted value sets (HAVING mirrors the profiler's cardinality
    * gate), and data-driven uniqueness rows. */
  private def q72Oracle: String = {
    val header = """CAST(NULL AS VARCHAR) AS "column",
      | 'expect_table_row_count_to_be_between' AS expectation_type,
      | CAST(count(*) AS DOUBLE) AS p1, CAST(count(*) AS DOUBLE) AS p2,
      | CAST(NULL AS VARCHAR) AS set_csv""".stripMargin
    def colRows(c: String, numeric: Boolean): Seq[String] = Seq(
      s"""SELECT '$c', 'expect_column_values_to_not_be_null',
         | CAST((count($c)*100)//count(*) AS DOUBLE), NULL, NULL FROM nation""".stripMargin,
      if (numeric)
        s"""SELECT '$c', 'expect_column_values_to_be_between',
           | CAST(min($c) AS DOUBLE), CAST(max($c) AS DOUBLE), NULL FROM nation""".stripMargin
      else
        s"""SELECT '$c', 'expect_column_value_lengths_to_be_between',
           | CAST(min(length($c)) AS DOUBLE), CAST(max(length($c)) AS DOUBLE), NULL FROM nation""".stripMargin,
      s"""SELECT '$c', 'expect_column_distinct_values_to_be_in_set', NULL, NULL,
         | string_agg(DISTINCT CAST($c AS VARCHAR), ',' ORDER BY CAST($c AS VARCHAR))
         |FROM nation HAVING count(DISTINCT $c) BETWEEN 1 AND 20""".stripMargin,
      s"""SELECT '$c', 'expect_column_values_to_be_unique', NULL, NULL, NULL
         |FROM nation HAVING count($c) > 0 AND count(DISTINCT $c) = count($c)""".stripMargin)
    val branches =
      s"SELECT $header FROM nation" +:
        Seq("n_nationkey" -> true, "n_name" -> false, "n_regionkey" -> true)
          .flatMap { case (c, num) => colRows(c, num) }
    branches.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
      "\n) u ORDER BY \"column\" NULLS FIRST, expectation_type")
  }
}
