package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core._
import OracleGen._

/** Coverage wave 3: column.partition bin strategies, KL-divergence
  * holdouts, and the mixed window/fused suite. */
object Coverage3Queries {

  private def t(dir: String, name: String)(implicit s: SparkSession): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // q50 bin-strategy parameters (l_quantity is integral 1..50 so uniform
  // edges are exact doubles; quantile edges interpolate identically in
  // Spark `percentile` and DuckDB `quantile_cont`)
  private val UniformBins = 7
  private val QuantileBins = 4

  // q51 partitions (weights sum to 1 so scipy-style normalization is a
  // no-op and the oracle can use the plain Σ p·ln(p/q))
  private val IntEdges = Seq(0.0, 10.0, 20.0, 30.0, 51.0)
  private val IntWeights = Seq(0.2, 0.0, 0.3, 0.5) // zero-weight middle bin
  private val TailEdges = Seq(1.0, 10.0, 20.0, 30.0, 40.0) // max(qty)=50 > 40
  private val TailWeights = Seq(0.25, 0.25, 0.25, 0.25)
  private val CatValues = Seq("click", "view", "purchase") // error/signup outside
  private val CatWeights = Seq(0.5, 0.3, 0.2)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_column_partition" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import s.implicits._
      val li = t(dir, "lineitem")
      val specs = Seq(
        "uniform" -> ColumnPartition.compute(li, "l_quantity", "uniform", UniformBins),
        "quantile" -> ColumnPartition.compute(li, "l_quantity", "quantile", QuantileBins),
        "auto" -> ColumnPartition.compute(li, "l_quantity", "auto"))
      specs.flatMap { case (st, es) =>
        es.zipWithIndex.map { case (e, i) => (st, i, e) }
      }.toDF("strategy", "idx", "edge").orderBy("strategy", "idx")
    }),
    "q51_kl_holdouts" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import s.implicits._
      val li = t(dir, "lineitem")
      val ev = t(dir, "events")
      val cases: Seq[(String, Evr)] = Seq(
        "cat_tail_holdout" -> ExpectColumnKlDivergenceToBeLessThan(
          "event_type", CatValues, CatWeights, 5.0, tailWeightHoldout = 0.2).run(ev),
        "cat_tail_strict" -> ExpectColumnKlDivergenceToBeLessThan(
          "event_type", CatValues, CatWeights, 5.0).run(ev),
        "cont_internal_holdout" -> ExpectColumnKlDivergenceContinuousToBeLessThan(
          "l_quantity", IntEdges, IntWeights, 0.5,
          internalWeightHoldout = 0.2).run(li),
        "cont_internal_strict" -> ExpectColumnKlDivergenceContinuousToBeLessThan(
          "l_quantity", IntEdges, IntWeights, 0.5).run(li),
        "cont_tail_holdout" -> ExpectColumnKlDivergenceContinuousToBeLessThan(
          "l_quantity", TailEdges, TailWeights, 1.0,
          tailWeightHoldout = 0.3).run(li),
        "cont_tail_strict" -> ExpectColumnKlDivergenceContinuousToBeLessThan(
          "l_quantity", TailEdges, TailWeights, 1.0).run(li))
      cases.map { case (n, e) => (n, e.success) }
        .toDF("kl_case", "success").orderBy("kl_case")
    }),
    "q58_pair_equal" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      // pair equal / pair in_set over a derived pair with planted mismatches
      val d = t(dir, "orders").selectExpr("o_orderkey",
        "o_orderstatus AS a",
        "CASE WHEN o_orderkey % 10 = 0 THEN 'X' ELSE o_orderstatus END AS b")
      val suite = Suite("pair", Seq(
        ExpectColumnPairValuesToBeEqual("a", "b", mostly = 0.85),
        ExpectColumnPairValuesToBeInSet("a", "b",
          Seq(("O", "O"), ("F", "F"), ("P", "P"), ("O", "X"), ("F", "X"), ("P", "X")))))
      Graft.resultsToDF(s, Graft.validate(d, suite))
        .drop("observed").orderBy("expectation_type")
    }),
    "q59_partitioner_family" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import s.implicits._
      import graft.sources.Partitioners._
      val ev = t(dir, "events")
      // one count per partitioner variant not covered elsewhere
      val slices: Seq[(String, DataFrame)] = Seq(
        "whole_table" -> wholeTable(ev),
        "year" -> onYear(ev, "ts", 2024),
        "year_month_day" -> onYearMonthDay(ev, "ts", 2024, 1, 2),
        "column_value" -> onColumnValue(ev, "event_type", "click"),
        "converted_datetime" -> onConvertedDatetime(ev, "ts", "yyyy-MM-dd", "2024-01-02"),
        "divided_integer" -> onDividedInteger(ev, "event_id", 100, 2),
        "multi_column_values" -> onMultiColumnValues(ev,
          Map("event_type" -> "click", "user_id" -> 3L)))
      slices.map { case (op, df) => (op, df.count()) }
        .toDF("op", "n").orderBy("op")
    }),
    "q53_unexpected_value_counts" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      // FULL (uncapped) unexpected_value_counts over all unexpected values
      Graft.unexpectedValueCounts(t(dir, "part"),
        ExpectColumnValuesToBeInSet("p_brand",
          Seq("Brand#11", "Brand#12", "Brand#13")))
        .select(col("value"), col("count").as("n"))
    }),
    "q54_batch_definition" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import s.implicits._
      // "validate the latest monthly batch" as engine code
      val bd = graft.sources.BatchDefinition.monthly("monthly_events", "ts")
      val ev = t(dir, "events")
      val p = bd.latestParameters(ev)
      bd.latestBatch(ev)
        .agg(count(lit(1)).as("n"),
          countDistinct(col("event_type")).cast("int").as("types"))
        .select(lit(p("year")).as("y"), lit(p("month")).as("m"),
          col("n"), col("types"))
    }),
    "q52_mixed_window_suite" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      // one GLOBAL-window monotonic check + 5 fused map expectations: the
      // runner must evaluate the window in its own job (fused pass stays
      // window-free) and every EVR must still match the oracle
      val suite = Suite("mixed", Seq(
        ExpectColumnValuesToBeIncreasing("o_orderkey", orderBy = Seq("o_orderkey")),
        ExpectColumnValuesToNotBeNull("o_custkey"),
        ExpectColumnValuesToBeInSet("o_orderstatus", Seq("O", "F", "P")),
        ExpectColumnValuesToBeBetween("o_totalprice", Some(0.0), Some(600000.0)),
        ExpectColumnValuesToMatchRegex("o_orderpriority", "^[1-5]-"),
        ExpectColumnValueLengthsToBeBetween("o_orderstatus", Some(1), Some(1))))
      Graft.resultsToDF(s, Graft.validate(t(dir, "orders"), suite))
        .drop("observed").orderBy("expectation_type", "domain")
    }))

  // --- oracles ---------------------------------------------------------------

  private val q50Oracle: String = {
    val uni = s"""SELECT 'uniform' AS strategy, CAST(i AS INT) AS idx,
                 |  mn + (mx - mn) * i / $UniformBins AS edge
                 |FROM (SELECT min(l_quantity) AS mn, max(l_quantity) AS mx FROM lineitem),
                 |     (SELECT unnest(generate_series(0, $UniformBins)) AS i)""".stripMargin
    val qLits = (0 to QuantileBins).map(i => i.toDouble / QuantileBins)
      .mkString("[", ", ", "]")
    val qnt = s"""SELECT 'quantile', CAST(i AS INT), qs[i + 1]
                 |FROM (SELECT quantile_cont(l_quantity, $qLits) AS qs FROM lineitem),
                 |     (SELECT unnest(generate_series(0, $QuantileBins)) AS i)""".stripMargin
    // auto: n_bins = max(bitLength(n), fd_bins); bitLength(n) =
    // length(bin(n)) — exact integer arithmetic; fd_bins is the smallest b
    // with b³ ≥ r³·n for r = (mx-mn)/(2·iqr) — ⌈(mx-mn)/fd⌉ re-expressed
    // with IEEE *,/ and comparisons only (no libm pow in either engine),
    // matching ColumnPartition.auto's definition bit for bit
    val auto = s"""SELECT 'auto', CAST(i AS INT), mn + (mx - mn) * i / nb
                  |FROM (
                  |  SELECT mn, mx, GREATEST(CAST(length(bin(CAST(cnt AS BIGINT))) AS BIGINT), fdb) AS nb
                  |  FROM (
                  |    SELECT mn, mx, cnt,
                  |      min(CASE WHEN CAST(b AS DOUBLE)*b*b >= r*r*r*cnt THEN b END) AS fdb
                  |    FROM (SELECT mn, mx, cnt, (mx - mn) / (2.0 * (q75 - q25)) AS r
                  |          FROM (SELECT min(l_quantity) AS mn, max(l_quantity) AS mx,
                  |            quantile_cont(l_quantity, 0.25) AS q25, quantile_cont(l_quantity, 0.75) AS q75,
                  |            CAST(count(l_quantity) AS DOUBLE) AS cnt FROM lineitem)),
                  |         (SELECT unnest(generate_series(1, 100000)) AS b)
                  |    GROUP BY mn, mx, cnt, r)),
                  |  (SELECT unnest(generate_series(0, 10000)) AS i)
                  |WHERE i <= nb""".stripMargin
    s"$uni\nUNION ALL\n$qnt\nUNION ALL\n$auto\nORDER BY strategy, idx"
  }

  private val q51Oracle: String = {
    // per-bin observed weights over lineitem (np.histogram: last bin closed)
    def hist(edges: Seq[Double]): String = {
      val bins = edges.indices.dropRight(1).map { i =>
        val hi = if (i == edges.size - 2) s"l_quantity <= ${edges(i + 1)}"
                 else s"l_quantity < ${edges(i + 1)}"
        s"CAST(sum(CASE WHEN l_quantity >= ${edges(i)} AND $hi THEN 1 ELSE 0 END) AS DOUBLE) / count(l_quantity) AS p$i"
      }
      (bins :+
        s"CAST(sum(CASE WHEN l_quantity < ${edges.head} THEN 1 ELSE 0 END) AS DOUBLE) / count(l_quantity) AS pb" :+
        s"CAST(sum(CASE WHEN l_quantity > ${edges.last} THEN 1 ELSE 0 END) AS DOUBLE) / count(l_quantity) AS pa")
        .mkString("SELECT ", ", ", " FROM lineitem")
    }
    def term(p: String, q: Double): String =
      if (q == 0.0) s"CASE WHEN $p > 0 THEN 'Infinity'::DOUBLE ELSE 0 END"
      else s"CASE WHEN $p > 0 THEN $p * ln($p / $q) ELSE 0 END"
    // internal cases: expected scaled by (1 - internal), zero bins filled
    def contSql(name: String, edges: Seq[Double], qs: Seq[Double],
        threshold: Double, tail: Double): String = {
      val terms = qs.indices.map(i => term(s"p$i", qs(i))) ++
        Seq(term("pb", tail / 2), term("pa", tail / 2))
      s"""SELECT '$name' AS kl_case, (${terms.mkString(" + ")}) <= $threshold AS success
         |FROM (${hist(edges)})""".stripMargin
    }
    val internalQ = IntWeights.map(_ * 0.8).map(w => if (w == 0.0) 0.2 else w)
    val tailQ = TailWeights.map(_ * 0.7)
    // categorical: p per event_type; strict → unexpected observed ⇒ ∞
    def catSql(name: String, tail: Double): String = {
      val inQ = CatValues.zip(CatWeights).map { case (v, w) =>
        term(s"(SELECT CAST(count(*) AS DOUBLE) FROM events WHERE event_type = '$v') / (SELECT count(event_type) FROM events)",
          w * (1 - tail))
      }
      val outQ = Seq("error", "signup").map { v =>
        term(s"(SELECT CAST(count(*) AS DOUBLE) FROM events WHERE event_type = '$v') / (SELECT count(event_type) FROM events)",
          tail / 2)
      }
      s"SELECT '$name' AS kl_case, (${(inQ ++ outQ).mkString(" + ")}) <= 5.0 AS success"
    }
    Seq(
      catSql("cat_tail_holdout", 0.2),
      catSql("cat_tail_strict", 0.0),
      contSql("cont_internal_holdout", IntEdges, internalQ, 0.5, 0.0),
      contSql("cont_internal_strict", IntEdges, IntWeights, 0.5, 0.0),
      contSql("cont_tail_holdout", TailEdges, tailQ, 1.0, 0.3),
      contSql("cont_tail_strict", TailEdges, TailWeights, 1.0, 0.0))
      .mkString("", "\nUNION ALL\n", "\nORDER BY kl_case")
  }

  private val q52Oracle: String = union(Seq(
    mapSql(MapBranch("expect_column_values_to_be_increasing", "o_orderkey",
      "o_orderkey IS NOT NULL AND NOT (__prev IS NULL OR o_orderkey >= __prev)",
      "o_orderkey IS NULL", 1.0,
      "(SELECT o_orderkey, last_value(o_orderkey IGNORE NULLS) OVER (ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS __prev FROM orders) tt")),
    mapSql(MapBranch("expect_column_values_to_not_be_null", "o_custkey",
      "o_custkey IS NULL", "FALSE", 1.0, "orders")),
    mapSql(MapBranch("expect_column_values_to_be_in_set", "o_orderstatus",
      "o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O','F','P')",
      "o_orderstatus IS NULL", 1.0, "orders")),
    mapSql(MapBranch("expect_column_values_to_be_between", "o_totalprice",
      "o_totalprice IS NOT NULL AND NOT (o_totalprice >= 0.0 AND o_totalprice <= 600000.0)",
      "o_totalprice IS NULL", 1.0, "orders")),
    mapSql(MapBranch("expect_column_values_to_match_regex", "o_orderpriority",
      "o_orderpriority IS NOT NULL AND NOT regexp_matches(o_orderpriority, '^[1-5]-')",
      "o_orderpriority IS NULL", 1.0, "orders")),
    mapSql(MapBranch("expect_column_value_lengths_to_be_between", "o_orderstatus",
      "o_orderstatus IS NOT NULL AND NOT (length(o_orderstatus) >= 1 AND length(o_orderstatus) <= 1)",
      "o_orderstatus IS NULL", 1.0, "orders"))))

  val oracles: Map[String, String] = Map(
    "q50_column_partition" -> q50Oracle,
    "q51_kl_holdouts" -> q51Oracle,
    "q58_pair_equal" -> {
      val derived =
        """(SELECT o_orderkey, o_orderstatus AS a,
          |  CASE WHEN o_orderkey % 10 = 0 THEN 'X' ELSE o_orderstatus END AS b
          |  FROM orders) tt""".stripMargin
      val inSet =
        "(a = 'O' AND b = 'O') OR (a = 'F' AND b = 'F') OR (a = 'P' AND b = 'P') OR " +
          "(a = 'O' AND b = 'X') OR (a = 'F' AND b = 'X') OR (a = 'P' AND b = 'X')"
      s"""SELECT expectation_type, domain, success, element_count, missing_count, unexpected_count
         |FROM (${union(Seq(
               mapSql(MapBranch("expect_column_pair_values_to_be_equal", "a,b",
                 "NOT (a IS NULL AND b IS NULL) AND NOT (a IS NOT DISTINCT FROM b)",
                 "a IS NULL AND b IS NULL", 0.85, derived)),
               mapSql(MapBranch("expect_column_pair_values_to_be_in_set", "a,b",
                 s"NOT (a IS NULL AND b IS NULL) AND NOT ($inSet)",
                 "a IS NULL AND b IS NULL", 1.0, derived))))}) z
         |ORDER BY expectation_type""".stripMargin
    },
    "q59_partitioner_family" ->
      """SELECT op, CAST(n AS BIGINT) AS n FROM (
        | SELECT 'whole_table' AS op, count(*) AS n FROM events
        | UNION ALL SELECT 'year', count(*) FROM events
        |   WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2025-01-01'
        | UNION ALL SELECT 'year_month_day', count(*) FROM events
        |   WHERE ts >= TIMESTAMP '2024-01-02' AND ts < TIMESTAMP '2024-01-03'
        | UNION ALL SELECT 'column_value', count(*) FROM events WHERE event_type = 'click'
        | UNION ALL SELECT 'converted_datetime', count(*) FROM events
        |   WHERE strftime(ts, '%Y-%m-%d') = '2024-01-02'
        | UNION ALL SELECT 'divided_integer', count(*) FROM events
        |   WHERE CAST(floor(event_id / 100.0) AS BIGINT) = 2
        | UNION ALL SELECT 'multi_column_values', count(*) FROM events
        |   WHERE event_type = 'click' AND user_id = 3
        |) u ORDER BY op""".stripMargin,
    "q53_unexpected_value_counts" ->
      """SELECT p_brand AS value, CAST(count(*) AS BIGINT) AS n FROM part
        |WHERE p_brand IS NOT NULL
        |  AND p_brand NOT IN ('Brand#11', 'Brand#12', 'Brand#13')
        |GROUP BY 1 ORDER BY n DESC, value""".stripMargin,
    "q54_batch_definition" ->
      """WITH mx AS (SELECT max(ts) AS t FROM events)
        |SELECT CAST(year(t) AS INT) AS y, CAST(month(t) AS INT) AS m,
        |  (SELECT CAST(count(*) AS BIGINT) FROM events, mx
        |     WHERE ts >= date_trunc('month', t)
        |       AND ts < date_trunc('month', t) + INTERVAL 1 MONTH) AS n,
        |  (SELECT CAST(count(DISTINCT event_type) AS INT) FROM events, mx
        |     WHERE ts >= date_trunc('month', t)
        |       AND ts < date_trunc('month', t) + INTERVAL 1 MONTH) AS types
        |FROM mx""".stripMargin,
    "q52_mixed_window_suite" -> {
      // resultsToDF emits observed; drop it on the Spark side, so project
      // the same columns here
      s"""SELECT expectation_type, domain, success, element_count, missing_count, unexpected_count
         |FROM ($q52Oracle) z ORDER BY expectation_type, domain""".stripMargin
    })
}
