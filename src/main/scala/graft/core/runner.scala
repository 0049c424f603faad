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
  *   2. ONE projection evaluating every window-free map expectation's
  *      unexpected/missing boolean followed by ONE `df.agg` that bundles
  *      row_count, per-expectation unexpected/missing counts, capped
  *      unexpected-value samples (graft.functions.CollectLimited), and all
  *      aggregate expectations' aggregates (identical aggregates deduped);
  *   3. one job per WINDOW-shaped map expectation (unique / compound-unique
  *      / monotonic): its window would otherwise drag the whole fused
  *      projection through its shuffle — or a single-partition sort for
  *      unpartitioned monotonic checks — so each runs isolated, like the
  *      reference's per-metric jobs (map_condition_auxilliary_methods.py:
  *      600-625);
  *   4. individual small jobs only for VALUE-type expectations (median,
  *      quantiles, distinct sets, KL) and SQL passthroughs.
  *
  * So a suite of N row-rules costs ~1 scan + 1 scan per window rule instead
  * of ~N. Transient job failures are retried up to MaxAttempts times
  * (validation_graph.py:48,263-271).
  */
final class SuiteRunner(
    resultFormat: ResultFormatSpec = ResultFormatSpec.default,
    idColumns: Seq[String] = Nil,
    batchViewName: String = "batch") {

  import ResultFormat.{MaxResultRecords, BooleanOnly, Basic, Summary, Complete}
  import SuiteRunner.MaxAttempts

  /** Index columns: the result_format parameter wins over the constructor. */
  private val indexColumns: Seq[String] =
    if (resultFormat.unexpectedIndexColumnNames.nonEmpty)
      resultFormat.unexpectedIndexColumnNames
    else idColumns

  /** ≤3 attempts per Spark job, mirroring the reference's per-metric retry
    * (validation_graph.py MAX_METRIC_COMPUTATION_RETRIES). Retries guard
    * against transient executor failures; deterministic errors just fail
    * three times and surface the last exception. */
  private def withRetry[T](f: => T): T = {
    var attempt = 1
    var last: Throwable = null
    while (attempt <= MaxAttempts) {
      try return f
      catch { case t: Throwable => last = t; attempt += 1 }
    }
    throw last
  }

  def run(df: DataFrame, suite: Suite): SuiteResult =
    runAll(df, Seq(suite)).head

  /** Validate SEVERAL suites against one batch in a single planning unit —
    * the cross-suite metric cache (reference: execution_engine.py:152-159
    * keys resolved metrics by (metric, domainId, valueId) for a whole
    * session). Map+agg expectations from every suite fuse into ONE job per
    * compute domain (identical aggregates dedup via the canonical-
    * expression key), and identical VALUE/query expectations (same case
    * class, same row_condition) resolve once and share their Evr. */
  def runAll(df: DataFrame, suitesIn: Seq[Suite]): Seq[SuiteResult] = {
    // resolve any still-unresolved $PARAMETER refs (built-ins like now();
    // undefined refs → isolated exception EVRs). Graft.validate resolves
    // user params first; this pass makes direct SuiteRunner use safe too.
    val suites = suitesIn.map(s => SuiteParams.resolve(s, Map.empty))
    val evrs = mutable.HashMap.empty[Int, Evr]
    val exps = suites.flatMap(_.expectations).toIndexedSeq
    val bounds = suites.map(_.expectations.size).scanLeft(0)(_ + _)

    // metric jobs run CONCURRENTLY (SuiteRunner.jobEc), so results land in
    // a lock-guarded map; suite order is restored from the index at the end
    def record(i: Int, t: Try[Evr]): Unit = evrs.synchronized {
      evrs(i) = t match {
        case Success(e) => e
        case Failure(ex) =>
          val e = exps(i)
          Evr(e.expectationType, e.kwargs, success = false, Map.empty,
            exception = Some(s"${ex.getClass.getSimpleName}: ${ex.getMessage}"))
      }
    }

    // -- schema expectations: pure driver-side --------------------------------
    exps.zipWithIndex.foreach {
      case (e: SchemaExpectation, i) => record(i, Try(e.run(df.schema)))
      case (e: InvalidExpectation, i) =>
        record(i, Failure(new IllegalArgumentException(e.error)))
      case _ =>
    }

    // -- group map+agg expectations by compute domain (row_condition) ---------
    val fuseable = exps.zipWithIndex.collect {
      case (e: MapExpectation, i) => (e: Expectation, i)
      case (e: AggExpectation, i) => (e: Expectation, i)
    }
    // Independent Spark jobs — one per compute domain, plus one per VALUE
    // expectation — are SUBMITTED CONCURRENTLY: on a 32-core local box or a
    // 1000-executor cluster the scheduler interleaves their tasks, so a
    // suite's wall-clock is ~max(job) instead of Σ(job). The reference runs
    // its metric graph serially; nothing in the semantics requires that.
    val domainJobs = fuseable.groupBy(_._1.rowCondition).toSeq.map {
      case (cond, group) => () =>
        // an unparseable row_condition (bad SQL, unresolved $param) fails
        // only ITS domain group, not the whole run
        Try(cond.map(df.filter).getOrElse(df)) match {
          case Success(domainDf) => runFusedDomain(domainDf, group, record)
          case Failure(ex) => group.foreach { case (_, i) => record(i, Failure(ex)) }
        }
    }

    // VALUE expectations: one small job each; identical expectations
    // (case-class equality covers type, kwargs AND row_condition) resolve
    // once across the planning unit and share the Evr
    val valueExps = exps.zipWithIndex.collect {
      case (e: ValueExpectation, i) => (e, i)
    }
    val valueMemo = new java.util.concurrent.ConcurrentHashMap[
      Expectation, Try[Evr]]()
    val valueJobs = valueExps.map(_._1).distinct.map { e => () =>
      valueMemo.put(e, Try(withRetry(
        e.run(e.rowCondition.map(df.filter).getOrElse(df))))): Unit
    }

    // value jobs are leaves (one Spark action each) → permit-bounded;
    // domain jobs are parents (they submit their own leaf batch)
    SuiteRunner.awaitAll(domainJobs ++ valueJobs.map(SuiteRunner.leafJob))
    valueExps.foreach { case (e, i) => record(i, valueMemo.get(e)) }

    // -- query expectations (memoized like value expectations) ----------------
    val queryMemo = mutable.Map.empty[Expectation, Try[Evr]]
    exps.zipWithIndex.foreach {
      case (e: UnexpectedRowsExpectation, i) =>
        record(i, queryMemo.getOrElseUpdate(e, Try(withRetry {
          // unique per-evaluation view: a fixed name would clobber a user's
          // session view and race across concurrent validations
          val view = s"${batchViewName}_${java.util.UUID.randomUUID()
            .toString.replace("-", "")}"
          df.createOrReplaceTempView(view)
          try {
            val sql = e.unexpectedRowsQuery.replace("{batch}", view)
            val resDf0 = df.sparkSession.sql(sql)
            // positional rename: a query may emit duplicate or dotted
            // output names (SELECT a.x, b.x ...), which col(name) cannot
            // address unambiguously
            val resDf = resDf0.toDF(
              resDf0.columns.indices.map(i => s"__c$i"): _*)
            // ONE job: the TRUE unexpected-row count and the capped row
            // sample come from a single fused aggregate (the old shape
            // re-ran the whole query for the count when the sample cap
            // was hit). observed_value stays the true count
            // (unexpected_rows_expectation.py:96). The sample is an
            // arbitrary capped subset (a query-level ORDER BY does not
            // survive the aggregate) — the count is exact.
            val rowStr = concat(lit("["), concat_ws(",",
              resDf.columns.map(c =>
                coalesce(col(c).cast(StringType), lit("null"))): _*), lit("]"))
            val r = resDf.agg(count(lit(1)).as("__n"),
              collect_limited(rowStr, MaxResultRecords).as("__rows")).head()
            val total = r.getLong(0)
            val rows = r.getAs[scala.collection.Seq[String]](1)
            // reference shape (unexpected_rows_expectation.py:142-152):
            // observed_value is the human-formatted count string, rows live
            // under details.unexpected_rows; the raw count rides
            // unexpected_count for programmatic/oracle use
            Evr(e.expectationType, e.kwargs, total == 0L, Map(
              "observed_value" ->
                s"$total unexpected ${if (total == 1L) "row" else "rows"}",
              "unexpected_count" -> total,
              "details" -> Map("unexpected_rows" ->
                rows.take(resultFormat.partialUnexpectedCount).toSeq)))
          } finally df.sparkSession.catalog.dropTempView(view)
        })))
      case _ =>
    }

    val all = exps.indices.map(i =>
      evrs.getOrElse(i, Evr(exps(i).expectationType, exps(i).kwargs,
        success = false, Map.empty, Some("not evaluated"))))
    suites.zipWithIndex.map { case (s, k) =>
      SuiteResult.of(s.name, all.slice(bounds(k), bounds(k + 1)))
    }
  }

  /** Pre-resolve z-score dependencies, split window-shaped conditions into
    * their own jobs, then run the single fused projection+aggregate job for
    * one compute domain. */
  private def runFusedDomain(domainDf: DataFrame,
      group: Seq[(Expectation, Int)], record: (Int, Try[Evr]) => Unit): Unit = {

    // Per-expectation failure isolation (validation_graph.py:48,263-271 /
    // validator.py:782-805): an expectation referencing a missing column —
    // or whose Column CONSTRUCTION throws (empty regex_list, <2 compound
    // columns, …) — gets its own exception EVR and is excluded, so it
    // cannot poison the fused plan for its siblings. Column lookup honors
    // spark.sql.caseSensitive like the plan itself would.
    val caseSensitive = Try(domainDf.sparkSession.conf
      .get("spark.sql.caseSensitive").toBoolean).getOrElse(false)
    def norm(c: String): String =
      if (caseSensitive) c else c.toLowerCase(java.util.Locale.ROOT)
    val fields = domainDf.schema.fieldNames.map(norm).toSet
    def missingCols(e: Expectation): Seq[String] = (e match {
      case m: MapExpectation => m.domainColumns
      case a: ColumnAggBetween => Seq(a.column)
      case p: ExpectColumnProportionOfUniqueValuesToBeBetween => Seq(p.column)
      case _ => Nil
    }).filterNot(c => fields.contains(norm(c)))
    def buildError(e: Expectation): Option[Throwable] = Try(e match {
      case m: MapExpectation
          if !m.isInstanceOf[ExpectColumnValueZScoresToBeLessThan] =>
        m.unexpectedCondition; m.missingCondition; ()
      case a: AggExpectation => a.aggs; ()
      case _ => ()
    }).failed.toOption
    // one probe per expectation (the Columns are rebuilt for the real plan
    // anyway, but rebuilding twice more just to classify was pure waste on
    // 100-expectation suites)
    val probed = group.map { case (e, i) =>
      val miss = missingCols(e)
      val err: Option[Throwable] =
        if (miss.nonEmpty) Some(new IllegalArgumentException(
          s"column(s) not found: ${miss.mkString(", ")}"))
        // kwarg/construction errors (malformed bounds, empty regex lists)
        // fire BEFORE the schema gate — the reference validates kwargs at
        // configuration time, before any metric resolution
        else buildError(e).orElse(e match {
          case m: MapExpectation => m.schemaError(domainDf.schema)
            .map(msg => new IllegalArgumentException(msg): Throwable)
          case a: AggExpectation => a.schemaError(domainDf.schema)
            .map(msg => new IllegalArgumentException(msg): Throwable)
          case _ => None
        })
      (e, i, err)
    }
    probed.foreach { case (_, i, err) =>
      err.foreach(ex => record(i, Failure(ex)))
    }
    val ok = probed.collect { case (e, i, None) => (e, i) }
    val mapExps = ok.collect { case (e: MapExpectation, i) => (e, i) }
    val aggExps = ok.collect { case (e: AggExpectation, i) => (e, i) }
    if (mapExps.isEmpty && aggExps.isEmpty) return

    // phase 0: z-score mean/std (one fused pre-agg if any are present).
    // Extraction is per-column Try: an all-null / single-row / zero-stddev
    // column fails only ITS z-score expectations with an exception EVR
    // instead of aborting the whole run.
    val zExps = mapExps.collect {
      case (z: ExpectColumnValueZScoresToBeLessThan, i) => (z, i)
    }
    // keyed by (column, exactMoments): the same column may be probed with
    // both the Welford and the bit-reproducible sum-of-squares form
    val zKeys = zExps.map(z => (z._1.column, z._1.exactMoments)).distinct
    val zStats: Map[(String, Boolean), Try[(Double, Double)]] =
      if (zKeys.isEmpty) Map.empty
      else Try(withRetry {
        val aggsZ = zKeys.zipWithIndex.flatMap { case ((c, exact), k) =>
          if (exact) Seq(Moments.meanExact(col(c)).as(s"__zm_$k"),
            Moments.stddevExact(col(c)).as(s"__zs_$k"))
          else Seq(avg(col(c)).as(s"__zm_$k"),
            stddev_samp(col(c)).as(s"__zs_$k"))
        }
        domainDf.agg(aggsZ.head, aggsZ.tail: _*).head()
      }) match {
        case Failure(ex) => zKeys.map(kk => kk -> Failure[(Double, Double)](ex)).toMap
        case Success(r) => zKeys.zipWithIndex.map { case (kk @ (c, _), k) =>
          kk -> Try {
            val m = r.getAs[Any](s"__zm_$k")
            val s = r.getAs[Any](s"__zs_$k")
            require(m != null && s != null,
              s"mean/stddev of '$c' undefined (empty or single-row domain)")
            val sd = s.asInstanceOf[Number].doubleValue()
            require(sd != 0.0 && !sd.isNaN, s"stddev of '$c' is zero or NaN")
            (m.asInstanceOf[Number].doubleValue(), sd)
          }
        }.toMap
      }
    def zKey(z: ExpectColumnValueZScoresToBeLessThan) = (z.column, z.exactMoments)
    val zFailed = zExps.filter { case (z, _) => zStats(zKey(z)).isFailure }
    zFailed.foreach { case (z, i) =>
      record(i, Failure(zStats(zKey(z)).failed.get))
    }
    val zFailedIdx = zFailed.map(_._2).toSet

    def unexpectedCond(e: MapExpectation): Column = e match {
      case z: ExpectColumnValueZScoresToBeLessThan =>
        val (m, s) = zStats(zKey(z)).get
        col(z.column).isNotNull && !z.expectedWith(col(z.column), m, s)
      case other => other.unexpectedCondition
    }

    // Window-shaped conditions run isolated; everything else fuses.
    val live = mapExps.filterNot { case (_, i) => zFailedIdx.contains(i) }
    val (windowExps, plainExps) = live.partition(_._1.usesWindow)

    // the fused batch and each window-shaped job are independent Spark
    // jobs over the same scan — submit them concurrently (see runAll)
    val collectIndexes =
      indexColumns.nonEmpty && resultFormat.rank >= Summary.rank
    val jobs = (() => runMapAggBatch(
      domainDf, plainExps, aggExps, unexpectedCond, record)) +:
      windowExps.map { case (e, i) => () =>
        e match {
          // uniqueness = a group count, not a window: groupBy gets map-side
          // combine and shuffles only (distinct key, count) — the full-row
          // window shuffle is needed only when per-row INDEXES are requested
          case (_: ExpectColumnValuesToBeUnique |
                _: ExpectCompoundColumnsToBeUnique) if !collectIndexes =>
            runGroupedUnique(domainDf, e, i, record)
          case _ =>
            if (e.usesGlobalWindow)
              SuiteRunner.log.warn(s"${e.expectationType}: unpartitioned " +
                "window — evaluating on a single partition (reference " +
                "semantics; pass partitionBy for a shuffle-parallel check)")
            runMapAggBatch(domainDf, Seq((e, i)), Nil, unexpectedCond, record)
        }
      }
    SuiteRunner.awaitAll(jobs.map(SuiteRunner.leafJob))
  }

  /** Uniqueness via groupBy(keys).count: semantically identical to the
    * count-over-window condition (the window partitions by the same keys),
    * but partial-aggregated map-side — at scale this shuffles distinct
    * keys + counts instead of every row. The unexpected-value sample is
    * rebuilt with row multiplicity (value repeated count times) to match
    * the reference's per-row partial_unexpected_list. */
  private def runGroupedUnique(domainDf: DataFrame, e: MapExpectation,
      idx: Int, record: (Int, Try[Evr]) => Unit): Unit = {
    val collectValues =
      resultFormat.rank >= Basic.rank && !resultFormat.excludeUnexpectedValues
    val cap =
      if (resultFormat.rank >= Complete.rank) MaxResultRecords
      else resultFormat.partialUnexpectedCount
    record(idx, Try {
      val keyCols = e.domainColumns.map(col)
      val g = domainDf.groupBy(keyCols: _*).agg(count(lit(1)).as("__cnt"))
      val missing = e.missingCondition
      val dup = !missing && col("__cnt") > 1
      val aggCols = mutable.ArrayBuffer[Column](
        sum(col("__cnt")).as("__n"),
        sum(when(missing, col("__cnt")).otherwise(0L)).as("__mc"),
        sum(when(dup, col("__cnt")).otherwise(0L)).as("__uc"))
      if (collectValues) {
        // value + its count collected in lockstep (same row order within
        // one aggregation buffer), expanded to row multiplicity below
        aggCols += collect_limited(when(dup, e.unexpectedValue), cap).as("__uv")
        aggCols += collect_limited(when(dup, col("__cnt").cast(StringType)), cap)
          .as("__un")
      }
      val row = withRetry(g.agg(aggCols.head, aggCols.tail.toSeq: _*).head())
      val n = Option(row.getAs[Any]("__n")).fold(0L)(_.asInstanceOf[Long])
      val mc = Option(row.getAs[Any]("__mc")).fold(0L)(_.asInstanceOf[Long])
      val uc = Option(row.getAs[Any]("__uc")).fold(0L)(_.asInstanceOf[Long])
      val vals: Seq[String] =
        if (!collectValues) Nil
        else {
          val vs = row.getAs[scala.collection.Seq[String]]("__uv")
          val cs = row.getAs[scala.collection.Seq[String]]("__un")
          vs.zip(cs).iterator
            // cap BEFORE toInt: a >2^31-row duplicate group must not NFE
            .flatMap { case (v, c) =>
              Iterator.fill(math.min(c.toLong, cap.toLong).toInt)(v)
            }
            .take(cap).toSeq
        }
      buildMapEvr(e, n, mc, uc, vals, Nil)
    })
  }

  /** One projection + one SUMS-ONLY aggregate over `domainDf` for the given
    * map and aggregate expectations — plain count/sum-when columns, so the
    * whole fused pass is a codegen'd HashAggregate (no ObjectHashAggregate
    * anywhere in the steady state). Unexpected-value/index SAMPLES are
    * deferred to [[sampleRow]], which runs only for the expectations whose
    * unexpected count came back non-zero — an all-green suite costs exactly
    * one whole-stage-codegen scan. Exposed package-private so plan tests
    * can assert the fused frame's physical plan. */
  private[graft] def fusedFrame(domainDf: DataFrame,
      mapExps: Seq[(MapExpectation, Int)],
      aggExps: Seq[(AggExpectation, Int)],
      unexpectedCond: MapExpectation => Column)
      : (DataFrame, Map[(Int, String), String]) = {
    // phase 1: projection — all fused conditions in one pass
    val projCols = mutable.ArrayBuffer[Column](col("*"))
    mapExps.zipWithIndex.foreach { case ((e, _), k) =>
      projCols += unexpectedCond(e).as(s"__u$k")
      projCols += e.missingCondition.as(s"__m$k")
    }
    val proj = domainDf.select(projCols.toSeq: _*)

    // phase 2: single fused aggregate
    val aggCols = mutable.ArrayBuffer[Column](count(lit(1)).as("__n"))
    mapExps.zipWithIndex.foreach { case (_, k) =>
      aggCols += sum(when(col(s"__u$k"), 1L).otherwise(0L)).as(s"__uc$k")
      aggCols += sum(when(col(s"__m$k"), 1L).otherwise(0L)).as(s"__mc$k")
    }
    // Aggregate expectations: identical aggregate expressions requested by
    // two expectations are computed ONCE, keyed by the canonical expression
    // string ((name, domainId, value) dedup per SURVEY.md §4 / the
    // reference's metric-value cache, execution_engine.py:152-159).
    val aggAlias = mutable.LinkedHashMap.empty[String, String]
    val resolveAlias = mutable.Map.empty[(Int, String), String]
    aggExps.foreach { case (e, i) =>
      e.aggs.foreach { case (name, c) =>
        // Spark 4 Column.toString elides aggregate modifiers (count(x) and
        // count(DISTINCT x) print identically) — key on the normalized
        // ColumnNode (Column.equals semantics: keeps isDistinct, strips
        // per-instance origins)
        val key = org.apache.spark.sql.graftshim.Shims.columnKey(c)
        val alias = aggAlias.getOrElseUpdate(key, {
          val a = s"__agg${aggAlias.size}"
          aggCols += c.as(a)
          a
        })
        resolveAlias((i, name)) = alias
      }
    }
    (proj.agg(aggCols.head, aggCols.tail.toSeq: _*), resolveAlias.toMap)
  }

  /** Deferred sample pass: collect_limited value/index samples for ONLY the
    * expectations whose fused counts showed unexpected rows. The projection
    * selects just the referenced columns (parquet-pruned), and the
    * ObjectHashAggregate this forces exists only on the failure path.
    *
    * Consistency note: counts come from the fused scan, samples from this
    * second scan — on a nondeterministic source (unstable sampling, a view
    * over mutating data) the two can disagree; the counts are
    * authoritative. */
  private def sampleRow(domainDf: DataFrame,
      toSample: Seq[MapExpectation],
      unexpectedCond: MapExpectation => Column,
      collectValues: Boolean, collectIndexes: Boolean): Row = {
    val cap =
      if (resultFormat.rank >= Complete.rank) MaxResultRecords
      else resultFormat.partialUnexpectedCount
    val projCols = mutable.ArrayBuffer.empty[Column]
    toSample.zipWithIndex.foreach { case (e, j) =>
      projCols += unexpectedCond(e).as(s"__u$j")
      // coalesce to the NUL-framed sentinel: a NULL unexpected VALUE (e.g.
      // to_not_be_null's unexpected rows) must still occupy its list slot;
      // the sentinel maps back to a real null at EVR build, so it cannot
      // collide with a column whose actual value is the string "null"
      // (NUL bytes never survive the engine's string sources)
      if (collectValues)
        projCols += coalesce(e.unexpectedValue,
          lit(SuiteRunner.NullSentinel)).as(s"__v$j")
      if (collectIndexes)
        projCols += to_json(struct(indexColumns.map(col): _*)).as(s"__ix$j")
    }
    val proj = domainDf.select(projCols.toSeq: _*)
    val aggCols = mutable.ArrayBuffer.empty[Column]
    toSample.indices.foreach { j =>
      if (collectValues)
        aggCols += collect_limited(when(col(s"__u$j"), col(s"__v$j")), cap).as(s"__uv$j")
      if (collectIndexes)
        aggCols += collect_limited(when(col(s"__u$j"), col(s"__ix$j")), cap).as(s"__uix$j")
    }
    withRetry(proj.agg(aggCols.head, aggCols.tail.toSeq: _*).head())
  }

  private def runMapAggBatch(domainDf: DataFrame,
      mapExps: Seq[(MapExpectation, Int)],
      aggExps: Seq[(AggExpectation, Int)],
      unexpectedCond: MapExpectation => Column,
      record: (Int, Try[Evr]) => Unit): Unit = {
    if (mapExps.isEmpty && aggExps.isEmpty) return
    val collectValues =
      resultFormat.rank >= Basic.rank && !resultFormat.excludeUnexpectedValues
    val collectIndexes = indexColumns.nonEmpty && resultFormat.rank >= Summary.rank

    val rowT = Try {
      val (fused, resolveAlias) =
        fusedFrame(domainDf, mapExps, aggExps, unexpectedCond)
      (withRetry(fused.head()), resolveAlias)
    }
    rowT match {
      case Failure(ex) =>
        (mapExps ++ aggExps).foreach { case (_, i) => record(i, Failure(ex)) }
      case Success((row, resolveAlias)) =>
        val n = row.getAs[Long]("__n")
        // deferred samples: only for expectations with unexpected rows
        val toSample: Seq[Int] =
          if (!collectValues && !collectIndexes) Nil
          else mapExps.indices.filter(k => row.getAs[Long](s"__uc$k") > 0L)
        val samplePos: Map[Int, Int] = toSample.zipWithIndex.toMap
        lazy val sampleT: Try[Row] = Try(sampleRow(domainDf,
          toSample.map(k => mapExps(k)._1), unexpectedCond,
          collectValues, collectIndexes))
        mapExps.zipWithIndex.foreach { case ((e, i), k) =>
          record(i, Try {
            val uc = row.getAs[Long](s"__uc$k")
            val mc = row.getAs[Long](s"__mc$k")
            val (vals, ixs) = samplePos.get(k) match {
              case None => (Nil, Nil)
              case Some(j) =>
                val s = sampleT.get // a sample failure fails only samplers
                (if (collectValues)
                  s.getAs[scala.collection.Seq[String]](s"__uv$j").toSeq
                    .map(v => if (v == SuiteRunner.NullSentinel) null else v)
                 else Nil,
                 if (collectIndexes)
                  s.getAs[scala.collection.Seq[String]](s"__uix$j").toSeq else Nil)
            }
            buildMapEvr(e, n, mc, uc, vals, ixs)
          })
        }
        aggExps.foreach { case (e, i) =>
          record(i, Try {
            val resolved = e.aggs.map { case (name, _) =>
              name -> row.getAs[Any](resolveAlias((i, name)))
            }.toMap
            val (ok, obs) = e.validate(resolved)
            // column-aggregate EVRs carry element/missing counts like the
            // reference's (expectation.py aggregate result shape); the counts
            // ride the fused pass via the dedup'd __ec/__nn aggregates
            val extra = (resolved.get("__ec"), resolved.get("__nn")) match {
              case (Some(ec: Long), Some(nn: Long))
                  if resultFormat.rank >= Basic.rank =>
                Map[String, Any]("element_count" -> ec,
                  "missing_count" -> (ec - nn),
                  "missing_percent" ->
                    (if (ec == 0L) null else (ec - nn).toDouble / ec * 100.0))
              case _ => Map.empty[String, Any]
            }
            Evr(e.expectationType, e.kwargs, ok,
              Map("observed_value" -> obs) ++ extra)
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
    if (resultFormat.level == BooleanOnly)
      return Evr(e.expectationType, e.kwargs, success, Map.empty)

    val partialCap = resultFormat.partialUnexpectedCount
    def pct(num: Long, den: Long): Any =
      if (den == 0) null else num.toDouble / den * 100.0
    val partial = values.take(partialCap)
    val base = Map[String, Any](
      "element_count" -> elementCount,
      "unexpected_count" -> unexpectedCount,
      "unexpected_percent" -> pct(unexpectedCount, nonnull),
      "missing_count" -> missingCount,
      "missing_percent" -> pct(missingCount, elementCount),
      "unexpected_percent_total" -> pct(unexpectedCount, elementCount),
      "unexpected_percent_nonmissing" -> pct(unexpectedCount, nonnull)) ++
      (if (resultFormat.excludeUnexpectedValues) Map.empty[String, Any]
       else Map[String, Any]("partial_unexpected_list" -> partial))

    val summary =
      if (resultFormat.rank < Summary.rank) Map.empty[String, Any]
      else {
        // Counter(...).most_common with (-count, value) tie-break
        // (expectation.py:2714-2721); null entries (restored from the
        // sample sentinel) sort as the empty string
        val counts = values.groupBy(identity).view.mapValues(_.size).toSeq
          .sortBy { case (v, c) => (-c, if (v == null) "" else v) }
          .take(partialCap)
          .map { case (v, c) => Map("value" -> v, "count" -> c) }
        (if (resultFormat.excludeUnexpectedValues) Map.empty[String, Any]
         else Map[String, Any]("partial_unexpected_counts" -> counts)) ++
          (if (indexes.nonEmpty)
            Map[String, Any]("partial_unexpected_index_list" ->
              indexes.take(partialCap))
           else Map.empty[String, Any])
      }

    val complete =
      if (resultFormat.rank < Complete.rank) Map.empty[String, Any]
      else {
        (if (resultFormat.excludeUnexpectedValues) Map.empty[String, Any]
         else Map[String, Any](
           "unexpected_list" -> values.take(ResultFormat.MaxResultRecords))) ++
        Map[String, Any](
          "unexpected_index_list" -> indexes.take(ResultFormat.MaxResultRecords)) ++
        (if (resultFormat.returnUnexpectedIndexQuery)
          Map[String, Any]("unexpected_index_query" ->
            Try(s"df.filter(${e.unexpectedCondition.toString})").getOrElse(
              "<condition requires runtime-resolved metric dependencies>"))
         else Map.empty[String, Any])
      }

    Evr(e.expectationType, e.kwargs, success, base ++ summary ++ complete)
  }
}

object SuiteRunner {
  /** validation_graph.py:48 MAX_METRIC_COMPUTATION_RETRIES = 3. */
  val MaxAttempts = 3

  /** NUL-framed marker for a null unexpected value riding collect_limited
    * (which drops real nulls); mapped back to null at EVR build. */
  private[core] val NullSentinel = "\u0000\u0000graft:null\u0000\u0000"
  private[core] val log = org.slf4j.LoggerFactory.getLogger(classOf[SuiteRunner])

  /** Shared daemon pool for concurrent metric-job SUBMISSION. Threads here
    * only drive Spark actions (the work itself runs on executors), so a
    * cached pool is safe; jobs nest (runAll → runFusedDomain), hence no
    * fixed THREAD bound that could deadlock a parent waiting on its
    * children. Backpressure comes from [[jobPermits]] instead: LEAF jobs
    * (the ones that actually run Spark actions) acquire a permit, parent
    * jobs never hold one — a checkpoint batching hundreds of suites queues
    * beyond `maxConcurrentJobs` in-flight actions instead of flooding the
    * scheduler and driver with unbounded simultaneous jobs. */
  private[core] lazy val jobPool =
    java.util.concurrent.Executors.newCachedThreadPool(r => {
      val t = new Thread(r, "graft-metric-job")
      t.setDaemon(true)
      t
    })

  /** Cap on concurrently-RUNNING leaf metric jobs (override with
    * -Dgraft.maxConcurrentJobs=N). Default: 2× cores, floor 8 — enough to
    * keep a local[32] scheduler saturated, bounded for a 1000-suite batch. */
  private[core] val maxConcurrentJobs: Int =
    sys.props.get("graft.maxConcurrentJobs").flatMap(_.toIntOption)
      .getOrElse(math.max(8, 2 * Runtime.getRuntime.availableProcessors()))
  private val jobPermits =
    new java.util.concurrent.Semaphore(maxConcurrentJobs)

  /** Wrap a leaf thunk with permit backpressure. Only leaves acquire, so
    * the nested-submission pattern (domain job → window jobs) cannot
    * deadlock on exhausted permits. */
  private[core] def leafJob(f: () => Unit): () => Unit = () => {
    jobPermits.acquire()
    try f() finally jobPermits.release()
  }

  /** Run the thunks concurrently, wait for all, rethrow the first failure
    * (after every job has finished — matching the serial form's guarantee
    * that record() callbacks for completed jobs are never lost). */
  private[core] def awaitAll(jobs: Seq[() => Unit]): Unit = {
    if (jobs.isEmpty) return
    if (jobs.size == 1) { jobs.head(); return }
    val futures = jobs.map(j =>
      jobPool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = j()
      }))
    var firstFailure: Throwable = null
    futures.foreach { f =>
      try f.get()
      catch {
        case e: java.util.concurrent.ExecutionException =>
          if (firstFailure == null) firstFailure = e.getCause
      }
    }
    if (firstFailure != null) throw firstFailure
  }
}

object Graft {
  /** Convenience entry point: validate `df` against `suite`.
    * `suiteParameters` resolves `$name` placeholders at run time
    * (SuiteParams; core/suite_parameters.py). */
  def validate(df: DataFrame, suite: Suite,
      resultFormat: ResultFormatSpec = ResultFormatSpec.default,
      idColumns: Seq[String] = Nil,
      suiteParameters: Map[String, Any] = Map.empty): SuiteResult = {
    // ALWAYS resolve: a "$name" ref left in a suite with no parameters must
    // surface as that expectation's isolated exception EVR, not evaluate as
    // the literal string "$name" (silently wrong on string columns, a
    // whole-domain ANSI cast failure on numeric ones)
    val resolved = SuiteParams.resolve(suite, suiteParameters)
    new SuiteRunner(resultFormat, idColumns).run(df, resolved)
  }

  /** FULL (uncapped) unexpected_value_counts metric: counts over ALL
    * unexpected values as a distributed DataFrame — the COMPLETE-format
    * companion to the partial counts the EVR carries (reference computes it
    * in column_map_condition_auxilliary_methods.py:312-353). Sorted by
    * (-count, value), the Counter.most_common tie-break. */
  def unexpectedValueCounts(df: DataFrame, e: MapExpectation): DataFrame =
    df.filter(e.unexpectedCondition)
      .groupBy(e.unexpectedValue.as("value"))
      .agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col("value"))

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
      // count columns describe the MAP-expectation row shape; aggregate EVRs
      // also carry element/missing counts (reference parity) but this compact
      // projection keeps them NULL there for a stable oracle-friendly schema
      val isMap = e.result.contains("unexpected_count")
      val obs: Any = e.result.get("observed_value") match {
        case Some(v: Number) => v.doubleValue()
        // dict-shaped observed (row_count_to_equal_other_table) → self count
        case Some(m: Map[_, _]) =>
          m.asInstanceOf[Map[String, Any]].get("self") match {
            case Some(v: Number) => v.doubleValue()
            case _ => null
          }
        case _ => null
      }
      Row(e.expectationType, domain, e.success,
        if (isMap) longOf("element_count") else null,
        if (isMap) longOf("missing_count") else null,
        longOf("unexpected_count"), obs)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }
}
