package graft.core

import scala.collection.mutable
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.CollectLimited.collect_limited

final case class Suite(name: String, expectations: Seq[Expectation])

/** Plans and executes an expectation suite against a DataFrame.
  *
  * Physical strategy (SURVEY.md §4): where the reference resolves each metric
  * with its own backend round-trip (sparkdf_execution_engine.py:843-915 fuses
  * only AGGREGATE_FN partials), we fuse the ENTIRE suite per compute domain:
  *
  *   1. optional tiny pre-agg job for z-score mean/stddev dependencies;
  *   2. ONE projection evaluating every map expectation's unexpected/missing
  *      boolean (window conditions included) followed by ONE `df.agg` that
  *      bundles row_count, per-expectation unexpected/missing counts, capped
  *      unexpected-value samples (graft.functions.CollectLimited), and all
  *      aggregate expectations' aggregates;
  *   3. individual small jobs only for VALUE-type expectations (median,
  *      quantiles, distinct sets, KL) and SQL passthroughs.
  *
  * So a suite of N row-rules costs ~1 scan instead of ~N.
  */
final class SuiteRunner(
    resultFormat: ResultFormat = ResultFormat.default,
    idColumns: Seq[String] = Nil,
    batchViewName: String = "batch") {

  import ResultFormat._

  def run(df: DataFrame, suite: Suite): SuiteResult = {
    val evrs = mutable.LinkedHashMap.empty[Int, Evr] // preserve suite order
    val exps = suite.expectations.toIndexedSeq

    def record(i: Int, t: Try[Evr]): Unit = evrs(i) = t match {
      case Success(e) => e
      case Failure(ex) =>
        val e = exps(i)
        Evr(e.expectationType, e.kwargs, success = false, Map.empty,
          exception = Some(s"${ex.getClass.getSimpleName}: ${ex.getMessage}"))
    }

    // -- schema expectations: pure driver-side --------------------------------
    exps.zipWithIndex.foreach {
      case (e: SchemaExpectation, i) => record(i, Try(e.run(df.schema)))
      case _ =>
    }

    // -- group map+agg expectations by compute domain (row_condition) ---------
    val fuseable = exps.zipWithIndex.collect {
      case (e: MapExpectation, i) => (e: Expectation, i)
      case (e: AggExpectation, i) => (e: Expectation, i)
    }
    fuseable.groupBy(_._1.rowCondition).foreach { case (cond, group) =>
      val domainDf = cond.map(df.filter).getOrElse(df)
      runFusedDomain(domainDf, group, record)
    }

    // -- VALUE expectations: one small job each -------------------------------
    exps.zipWithIndex.foreach {
      case (e: ValueExpectation, i) =>
        record(i, Try(e.run(e.rowCondition.map(df.filter).getOrElse(df))))
      case _ =>
    }

    // -- query expectations ----------------------------------------------------
    exps.zipWithIndex.foreach {
      case (e: UnexpectedRowsExpectation, i) =>
        record(i, Try {
          df.createOrReplaceTempView(batchViewName)
          val sql = e.unexpectedRowsQuery.replace("{batch}", batchViewName)
          val rows = df.sparkSession.sql(sql).limit(MaxResultRecords).collect()
          Evr(e.expectationType, e.kwargs, rows.isEmpty, Map(
            "observed_value" -> rows.length,
            "unexpected_rows" -> rows.take(PartialUnexpectedCount)
              .map(_.toString).toSeq))
        })
      case _ =>
    }

    SuiteResult.of(suite.name, exps.indices.map(i =>
      evrs.getOrElse(i, Evr(exps(i).expectationType, exps(i).kwargs,
        success = false, Map.empty, Some("not evaluated")))))
  }

  /** Pre-resolve z-score dependencies, then run the single fused
    * projection+aggregate job for one compute domain. */
  private def runFusedDomain(domainDf: DataFrame,
      group: Seq[(Expectation, Int)], record: (Int, Try[Evr]) => Unit): Unit = {

    // Per-expectation failure isolation (validation_graph.py:48,263-271 /
    // validator.py:782-805): an expectation referencing a missing column gets
    // its own exception EVR and is excluded from the fused plan.
    val fields = domainDf.schema.fieldNames.toSet
    def missingCols(e: Expectation): Seq[String] = (e match {
      case m: MapExpectation => m.domainColumns
      case a: ColumnAggBetween => Seq(a.column)
      case p: ExpectColumnProportionOfUniqueValuesToBeBetween => Seq(p.column)
      case _ => Nil
    }).filterNot(fields.contains)
    group.foreach { case (e, i) =>
      val miss = missingCols(e)
      if (miss.nonEmpty) record(i, Failure(new IllegalArgumentException(
        s"column(s) not found: ${miss.mkString(", ")}")))
    }
    val ok = group.filter { case (e, _) => missingCols(e).isEmpty }
    val mapExps = ok.collect { case (e: MapExpectation, i) => (e, i) }
    val aggExps = ok.collect { case (e: AggExpectation, i) => (e, i) }
    if (mapExps.isEmpty && aggExps.isEmpty) return

    // phase 0: z-score mean/std (one fused pre-agg if any are present)
    val zCols = mapExps.collect {
      case (z: ExpectColumnValueZScoresToBeLessThan, _) => z.column
    }.distinct
    val zStats: Map[String, (Double, Double)] =
      if (zCols.isEmpty) Map.empty
      else {
        val aggsZ = zCols.flatMap(c => Seq(
          avg(col(c)).as(s"__zm_$c"), stddev_samp(col(c)).as(s"__zs_$c")))
        val r = domainDf.agg(aggsZ.head, aggsZ.tail: _*).head()
        zCols.map(c => c -> (
          r.getAs[Any](s"__zm_$c").asInstanceOf[Number].doubleValue(),
          r.getAs[Any](s"__zs_$c").asInstanceOf[Number].doubleValue())).toMap
      }

    def unexpectedCond(e: MapExpectation): Column = e match {
      case z: ExpectColumnValueZScoresToBeLessThan =>
        val (m, s) = zStats(z.column)
        col(z.column).isNotNull && !z.expectedWith(col(z.column), m, s)
      case other => other.unexpectedCondition
    }

    val collectValues = resultFormat.rank >= Basic.rank
    val collectIndexes = idColumns.nonEmpty && resultFormat.rank >= Summary.rank
    val cap =
      if (resultFormat.rank >= Complete.rank) MaxResultRecords
      else PartialUnexpectedCount

    // phase 1: projection — all conditions (incl. window shapes) in one pass
    val projCols = mutable.ArrayBuffer[Column](col("*"))
    mapExps.zipWithIndex.foreach { case ((e, _), k) =>
      projCols += unexpectedCond(e).as(s"__u$k")
      projCols += e.missingCondition.as(s"__m$k")
      if (collectValues) projCols += e.unexpectedValue.as(s"__v$k")
      if (collectIndexes)
        projCols += to_json(struct(idColumns.map(col): _*)).as(s"__ix$k")
    }
    val proj = domainDf.select(projCols.toSeq: _*)

    // phase 2: single fused aggregate
    val aggCols = mutable.ArrayBuffer[Column](count(lit(1)).as("__n"))
    mapExps.zipWithIndex.foreach { case (_, k) =>
      aggCols += sum(when(col(s"__u$k"), 1L).otherwise(0L)).as(s"__uc$k")
      aggCols += sum(when(col(s"__m$k"), 1L).otherwise(0L)).as(s"__mc$k")
      if (collectValues)
        aggCols += collect_limited(when(col(s"__u$k"), col(s"__v$k")), cap).as(s"__uv$k")
      if (collectIndexes)
        aggCols += collect_limited(when(col(s"__u$k"), col(s"__ix$k")), cap).as(s"__uix$k")
    }
    aggExps.zipWithIndex.foreach { case ((e, _), j) =>
      e.aggs.foreach { case (name, c) => aggCols += c.as(s"__a${j}_$name") }
    }

    val rowT = Try(proj.agg(aggCols.head, aggCols.tail.toSeq: _*).head())
    rowT match {
      case Failure(ex) =>
        group.foreach { case (_, i) => record(i, Failure(ex)) }
      case Success(row) =>
        val n = row.getAs[Long]("__n")
        mapExps.zipWithIndex.foreach { case ((e, i), k) =>
          record(i, Try {
            val uc = row.getAs[Long](s"__uc$k")
            val mc = row.getAs[Long](s"__mc$k")
            val vals: Seq[String] =
              if (collectValues) row.getAs[scala.collection.Seq[String]](s"__uv$k").toSeq else Nil
            val ixs: Seq[String] =
              if (collectIndexes) row.getAs[scala.collection.Seq[String]](s"__uix$k").toSeq else Nil
            buildMapEvr(e, n, mc, uc, vals, ixs)
          })
        }
        aggExps.zipWithIndex.foreach { case ((e, i), j) =>
          record(i, Try {
            val resolved = e.aggs.map { case (name, _) =>
              name -> row.getAs[Any](s"__a${j}_$name")
            }.toMap
            val (ok, obs) = e.validate(resolved)
            Evr(e.expectationType, e.kwargs, ok, Map("observed_value" -> obs))
          })
        }
    }
  }

  /** _format_map_output port (expectations/expectation.py:2605-2752). */
  private def buildMapEvr(e: MapExpectation, elementCount: Long,
      missingCount: Long, unexpectedCount: Long,
      values: Seq[String], indexes: Seq[String]): Evr = {
    val nonnull = elementCount - missingCount
    val success = MostlyMath.success(nonnull, unexpectedCount, e.mostly)
    if (resultFormat == BooleanOnly)
      return Evr(e.expectationType, e.kwargs, success, Map.empty)

    def pct(num: Long, den: Long): Any =
      if (den == 0) null else num.toDouble / den * 100.0
    val partial = values.take(ResultFormat.PartialUnexpectedCount)
    val base = Map[String, Any](
      "element_count" -> elementCount,
      "unexpected_count" -> unexpectedCount,
      "unexpected_percent" -> pct(unexpectedCount, nonnull),
      "partial_unexpected_list" -> partial,
      "missing_count" -> missingCount,
      "missing_percent" -> pct(missingCount, elementCount),
      "unexpected_percent_total" -> pct(unexpectedCount, elementCount),
      "unexpected_percent_nonmissing" -> pct(unexpectedCount, nonnull))

    val summary =
      if (resultFormat.rank < Summary.rank) Map.empty[String, Any]
      else {
        // Counter(...).most_common with (-count, value) tie-break
        // (expectation.py:2714-2721)
        val counts = values.groupBy(identity).view.mapValues(_.size).toSeq
          .sortBy { case (v, c) => (-c, v) }
          .take(ResultFormat.PartialUnexpectedCount)
          .map { case (v, c) => Map("value" -> v, "count" -> c) }
        Map[String, Any]("partial_unexpected_counts" -> counts) ++
          (if (indexes.nonEmpty)
            Map[String, Any]("partial_unexpected_index_list" ->
              indexes.take(ResultFormat.PartialUnexpectedCount))
           else Map.empty[String, Any])
      }

    val complete =
      if (resultFormat.rank < Complete.rank) Map.empty[String, Any]
      else Map[String, Any](
        "unexpected_list" -> values.take(ResultFormat.MaxResultRecords),
        "unexpected_index_list" -> indexes.take(ResultFormat.MaxResultRecords),
        "unexpected_index_query" ->
          s"df.filter(${e.unexpectedCondition.toString})")

    Evr(e.expectationType, e.kwargs, success, base ++ summary ++ complete)
  }
}

object Graft {
  /** Convenience entry point: validate `df` against `suite`. */
  def validate(df: DataFrame, suite: Suite,
      resultFormat: ResultFormat = ResultFormat.default,
      idColumns: Seq[String] = Nil): SuiteResult =
    new SuiteRunner(resultFormat, idColumns).run(df, suite)

  /** EVR list as a DataFrame with a stable, oracle-friendly schema. */
  def resultsToDF(spark: SparkSession, sr: SuiteResult): DataFrame = {
    val schema = StructType(Seq(
      StructField("expectation_type", StringType, nullable = false),
      StructField("domain", StringType, nullable = true),
      StructField("success", BooleanType, nullable = false),
      StructField("element_count", LongType, nullable = true),
      StructField("missing_count", LongType, nullable = true),
      StructField("unexpected_count", LongType, nullable = true),
      StructField("observed", DoubleType, nullable = true)))
    val rows = sr.results.map { e =>
      val domain = e.kwargs.get("column")
        .orElse(e.kwargs.get("column_list").map {
          case s: Seq[_] => s.mkString(",")
          case other => other
        })
        .orElse(e.kwargs.get("column_A").map(a =>
          s"${a},${e.kwargs.getOrElse("column_B", "")}"))
        .map(String.valueOf).orNull
      def longOf(k: String): Any = e.result.get(k) match {
        case Some(v: Number) => v.longValue()
        case _ => null
      }
      val obs: Any = e.result.get("observed_value") match {
        case Some(v: Number) => v.doubleValue()
        case _ => null
      }
      Row(e.expectationType, domain, e.success, longOf("element_count"),
        longOf("missing_count"), longOf("unexpected_count"), obs)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }
}
