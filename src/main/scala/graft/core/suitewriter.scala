package graft.core

/** Suite → GE-JSON expectation-suite document (the inverse of SuiteJson):
  * author suites in Scala, persist them in the reference's interchange
  * format, reload them anywhere — the expectation-store round-trip
  * (data_context/store/expectations_store.py is the reference surface;
  * the document schema is the same one its fixtures and user suites use).
  *
  * `SuiteJson.fromJson(SuiteWriter.toJson(s))` reproduces `s` exactly for
  * every JSON-expressible expectation; the engine-only types that carry
  * live objects (custom predicate functions, a DataFrame handle) fail
  * loudly instead of serializing something unloadable. */
object SuiteWriter {

  def toJson(suite: Suite): String = {
    val exps = suite.expectations.map(expectationJson)
    Json.write(Map(
      "expectation_suite_name" -> suite.name,
      "expectations" -> exps))
  }

  def write(suite: Suite, path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(p,
      toJson(suite).getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
  }

  // --- kwargs construction ---------------------------------------------------

  /** A value slot: ParamRefs (typed or in-string marker) re-emit as the
    * {"$PARAMETER": name} dict form. */
  private def slot(v: Any): Any = v match {
    case ParamRef(name) => Map("$PARAMETER" -> name)
    case s: String => ParamRef.fromString(s)
      .map(n => Map("$PARAMETER" -> n)).getOrElse(s)
    case other => other
  }

  private def irf(i: IgnoreRowIf): String = i match {
    case IgnoreRowIf.BothValuesAreMissing => "both_values_are_missing"
    case IgnoreRowIf.EitherValueIsMissing => "either_value_is_missing"
    case IgnoreRowIf.AllValuesAreMissing => "all_values_are_missing"
    case IgnoreRowIf.AnyValueIsMissing => "any_value_is_missing"
    case IgnoreRowIf.Neither => "neither"
  }

  private def base(tp: String, kw: (String, Any)*): Map[String, Any] =
    Map("expectation_type" -> tp,
      "kwargs" -> kw.filterNot(_._2 == None).map {
        case (k, Some(x)) => k -> slot(x)
        case (k, x) => k -> slot(x)
      }.toMap)

  private def mapKw(mostly: Double, rc: Option[String]): Seq[(String, Any)] =
    (if (mostly != 1.0) Seq("mostly" -> mostly) else Nil) ++
      rc.map("row_condition" -> (_: Any)).toSeq

  private def rcKw(rc: Option[String]): Seq[(String, Any)] =
    rc.map("row_condition" -> (_: Any)).toSeq

  private def expectationJson(e: Expectation): Map[String, Any] = e match {
    case x: ExpectColumnValuesToBeNull =>
      base(x.expectationType, Seq("column" -> x.column) ++
        mapKw(x.mostly, x.rowCondition): _*)
    case x: ExpectColumnValuesToNotBeNull =>
      base(x.expectationType, Seq("column" -> x.column) ++
        mapKw(x.mostly, x.rowCondition): _*)
    case x: ExpectColumnValuesToBeInSet =>
      base(x.expectationType, Seq("column" -> x.column,
        "value_set" -> (if (x.universalSet) null else x.valueSet.map(slot))) ++
        mapKw(x.mostly, x.rowCondition): _*)
    case x: ExpectColumnValuesToNotBeInSet =>
      base(x.expectationType, Seq("column" -> x.column,
        "value_set" -> (if (x.universalSet) null else x.valueSet.map(slot))) ++
        mapKw(x.mostly, x.rowCondition): _*)
    case x: ExpectColumnValuesToBeBetween =>
      base(x.expectationType, Seq("column" -> x.column) ++
        x.minValue.map("min_value" -> slot(_)) ++
        x.maxValue.map("max_value" -> slot(_)) ++
        (if (x.strictMin) Seq("strict_min" -> true) else Nil) ++
        (if (x.strictMax) Seq("strict_max" -> true) else Nil) ++
        mapKw(x.mostly, x.rowCondition): _*)
    case x: ExpectColumnValuesToMatchRegex =>
      base(x.expectationType, Seq("column" -> x.column,
        "regex" -> slot(x.regex)) ++ mapKw(x.mostly, x.rowCondition): _*)
    case x: ExpectColumnValuesToNotMatchRegex =>
      base(x.expectationType, Seq("column" -> x.column,
        "regex" -> slot(x.regex)) ++ mapKw(x.mostly, x.rowCondition): _*)
    case x: ExpectColumnValuesToMatchRegexList =>
      base(x.expectationType, Seq("column" -> x.column,
        "regex_list" -> x.regexList.map(slot), "match_on" -> x.matchOn) ++
        mapKw(x.mostly, x.rowCondition): _*)
    case x: ExpectColumnValuesToNotMatchRegexList =>
      base(x.expectationType, Seq("column" -> x.column,
        "regex_list" -> x.regexList.map(slot)) ++
        mapKw(x.mostly, x.rowCondition): _*)
    case x: ExpectColumnValuesToMatchLikePattern =>
      val tp = if (x.negate) "expect_column_values_to_not_match_like_pattern"
               else "expect_column_values_to_match_like_pattern"
      base(tp, Seq("column" -> x.column,
        "like_pattern" -> slot(x.likePattern)) ++
        mapKw(x.mostly, x.rowCondition): _*)
    case x: ExpectColumnValuesToMatchLikePatternList =>
      val tp = if (x.negate) "expect_column_values_to_not_match_like_pattern_list"
               else "expect_column_values_to_match_like_pattern_list"
      base(tp, Seq("column" -> x.column,
        "like_pattern_list" -> x.likePatternList.map(slot),
        "match_on" -> x.matchOn) ++ mapKw(x.mostly, x.rowCondition): _*)
    case x: ExpectColumnValueLengthsToBeBetween =>
      base(x.expectationType, Seq("column" -> x.column) ++
        x.minValue.map("min_value" -> (_: Any)) ++
        x.maxValue.map("max_value" -> (_: Any)) ++
        mapKw(x.mostly, x.rowCondition): _*)
    case x: ExpectColumnValueLengthsToEqual =>
      base(x.expectationType, Seq("column" -> x.column, "value" -> x.value) ++
        mapKw(x.mostly, x.rowCondition): _*)
    case x: ExpectColumnValuesToBeUnique =>
      base(x.expectationType, Seq("column" -> x.column) ++
        mapKw(x.mostly, x.rowCondition): _*)
    case x: ExpectColumnValuesToBeIncreasing =>
      base(x.expectationType, Seq("column" -> x.column,
        "strictly" -> x.strictly) ++
        (if (x.partitionBy.nonEmpty) Seq("partition_by" -> x.partitionBy) else Nil) ++
        (if (x.orderBy.nonEmpty) Seq("order_by" -> x.orderBy) else Nil) ++
        mapKw(x.mostly, x.rowCondition): _*)
    case x: ExpectColumnValuesToBeDecreasing =>
      base(x.expectationType, Seq("column" -> x.column,
        "strictly" -> x.strictly) ++
        (if (x.partitionBy.nonEmpty) Seq("partition_by" -> x.partitionBy) else Nil) ++
        (if (x.orderBy.nonEmpty) Seq("order_by" -> x.orderBy) else Nil) ++
        mapKw(x.mostly, x.rowCondition): _*)
    case x: ExpectColumnValuesToMatchStrftimeFormat =>
      base(x.expectationType, Seq("column" -> x.column,
        "strftime_format" -> x.strftimeFormat) ++
        mapKw(x.mostly, x.rowCondition): _*)
    case x: ExpectColumnValuesToBeJsonParseable =>
      base(x.expectationType, Seq("column" -> x.column) ++
        mapKw(x.mostly, x.rowCondition): _*)
    case x: ExpectColumnValuesToMatchJsonSchema =>
      // string form — SuiteJson accepts both the object and string forms
      base(x.expectationType, Seq("column" -> x.column,
        "json_schema" -> x.jsonSchema) ++
        mapKw(x.mostly, x.rowCondition): _*)
    case x: ExpectColumnValuesToBeDateutilParseable =>
      base(x.expectationType, Seq("column" -> x.column) ++
        mapKw(x.mostly, x.rowCondition): _*)
    case x: ExpectColumnValueZScoresToBeLessThan =>
      base(x.expectationType, Seq("column" -> x.column,
        "threshold" -> x.threshold, "double_sided" -> x.doubleSided) ++
        (if (x.exactMoments) Seq("exact_moments" -> true) else Nil) ++
        mapKw(x.mostly, x.rowCondition): _*)
    case x: ExpectColumnPairValuesToBeEqual =>
      base(x.expectationType, Seq("column_A" -> x.columnA,
        "column_B" -> x.columnB, "ignore_row_if" -> irf(x.ignoreRowIf)) ++
        mapKw(x.mostly, x.rowCondition): _*)
    case x: ExpectColumnPairValuesAToBeGreaterThanB =>
      base(x.expectationType, Seq("column_A" -> x.columnA,
        "column_B" -> x.columnB, "or_equal" -> x.orEqual,
        "ignore_row_if" -> irf(x.ignoreRowIf)) ++
        mapKw(x.mostly, x.rowCondition): _*)
    case x: ExpectColumnPairValuesToBeInSet =>
      base(x.expectationType, Seq("column_A" -> x.columnA,
        "column_B" -> x.columnB,
        "value_pairs_set" -> x.valuePairs.map(p => Seq(slot(p._1), slot(p._2))),
        "ignore_row_if" -> irf(x.ignoreRowIf)) ++
        mapKw(x.mostly, x.rowCondition): _*)
    case x: ExpectCompoundColumnsToBeUnique =>
      base(x.expectationType, Seq("column_list" -> x.columns,
        "ignore_row_if" -> irf(x.ignoreRowIf)) ++
        mapKw(x.mostly, x.rowCondition): _*)
    case x: ExpectMulticolumnSumToEqual =>
      base(x.expectationType, Seq("column_list" -> x.columns,
        "sum_total" -> x.sumTotal, "ignore_row_if" -> irf(x.ignoreRowIf)) ++
        mapKw(x.mostly, x.rowCondition): _*)
    case x: ExpectSelectColumnValuesToBeUniqueWithinRecord =>
      base(x.expectationType, Seq("column_list" -> x.columns,
        "ignore_row_if" -> irf(x.ignoreRowIf)) ++
        mapKw(x.mostly, x.rowCondition): _*)
    case x: ExpectColumnMinToBeBetween => aggBetween(x.expectationType,
      x.column, x.minValue, x.maxValue, x.strictMin, x.strictMax, x.rowCondition)
    case x: ExpectColumnMaxToBeBetween => aggBetween(x.expectationType,
      x.column, x.minValue, x.maxValue, x.strictMin, x.strictMax, x.rowCondition)
    case x: ExpectColumnSumToBeBetween => aggBetween(x.expectationType,
      x.column, x.minValue, x.maxValue, x.strictMin, x.strictMax, x.rowCondition)
    case x: ExpectColumnMeanToBeBetween => aggBetween(x.expectationType,
      x.column, x.minValue, x.maxValue, x.strictMin, x.strictMax, x.rowCondition)
    case x: ExpectColumnStdevToBeBetween => aggBetween(x.expectationType,
      x.column, x.minValue, x.maxValue, x.strictMin, x.strictMax, x.rowCondition,
      extra = if (x.exactMoments) Seq("exact_moments" -> true) else Nil)
    case x: ExpectColumnUniqueValueCountToBeBetween =>
      base(x.expectationType, Seq("column" -> x.column) ++
        x.minValue.map("min_value" -> slot(_)) ++
        x.maxValue.map("max_value" -> slot(_)) ++ rcKw(x.rowCondition): _*)
    case x: ExpectColumnProportionOfUniqueValuesToBeBetween =>
      base(x.expectationType, Seq("column" -> x.column) ++
        x.minValue.map("min_value" -> (_: Any)) ++
        x.maxValue.map("max_value" -> (_: Any)) ++ rcKw(x.rowCondition): _*)
    case x: ExpectTableRowCountToBeBetween =>
      base(x.expectationType,
        (x.minValue.map("min_value" -> slot(_)).toSeq ++
          x.maxValue.map("max_value" -> slot(_)) ++ rcKw(x.rowCondition)): _*)
    case x: ExpectTableRowCountToEqual =>
      base(x.expectationType, Seq("value" -> x.value) ++
        rcKw(x.rowCondition): _*)
    case x: ExpectColumnMedianToBeBetween =>
      base(x.expectationType, Seq("column" -> x.column) ++
        x.minValue.map("min_value" -> (_: Any)) ++
        x.maxValue.map("max_value" -> (_: Any)) ++ rcKw(x.rowCondition): _*)
    case x: ExpectColumnQuantileValuesToBeBetween =>
      base(x.expectationType, Seq("column" -> x.column,
        "quantile_ranges" -> Map(
          "quantiles" -> x.quantiles,
          "value_ranges" -> x.ranges.map(r =>
            Seq[Any](r._1.map(d => d: Any).orNull,
              r._2.map(d => d: Any).orNull))),
        "relative_error" -> x.relativeError) ++
        (if (x.exact) Seq("exact" -> true) else Nil) ++
        rcKw(x.rowCondition): _*)
    case x: ExpectColumnMostCommonValueToBeInSet =>
      base(x.expectationType, Seq("column" -> x.column,
        "value_set" -> x.valueSet.map(slot), "ties_okay" -> x.tiesOkay) ++
        rcKw(x.rowCondition): _*)
    case x: ExpectColumnDistinctValuesToBeInSet =>
      base(x.expectationType, Seq("column" -> x.column,
        "value_set" -> (if (x.universalSet) null else x.valueSet.map(slot))) ++
        rcKw(x.rowCondition): _*)
    case x: ExpectColumnDistinctValuesToContainSet =>
      base(x.expectationType, Seq("column" -> x.column,
        "value_set" -> x.valueSet.map(slot)) ++ rcKw(x.rowCondition): _*)
    case x: ExpectColumnDistinctValuesToEqualSet =>
      base(x.expectationType, Seq("column" -> x.column,
        "value_set" -> x.valueSet.map(slot)) ++ rcKw(x.rowCondition): _*)
    case x: ExpectColumnKlDivergenceToBeLessThan =>
      base(x.expectationType, Seq("column" -> x.column,
        "partition_object" -> Map("values" -> x.partitionValues.map(slot),
          "weights" -> x.partitionWeights),
        "threshold" -> x.threshold,
        "tail_weight_holdout" -> x.tailWeightHoldout,
        "internal_weight_holdout" -> x.internalWeightHoldout) ++
        rcKw(x.rowCondition): _*)
    case x: ExpectColumnKlDivergenceContinuousToBeLessThan =>
      base(x.expectationType, Seq("column" -> x.column,
        "partition_object" -> (Map[String, Any]("bins" -> x.binEdges,
          "weights" -> x.binWeights) ++
          x.tailWeights.map(t => "tail_weights" -> Seq(t._1, t._2))),
        "threshold" -> x.threshold,
        "tail_weight_holdout" -> x.tailWeightHoldout,
        "internal_weight_holdout" -> x.internalWeightHoldout) ++
        rcKw(x.rowCondition): _*)
    case x: ExpectColumnKlDivergenceAutoToBeLessThan =>
      base(x.expectationType, Seq("column" -> x.column,
        "threshold" -> x.threshold, "bins" -> x.bins, "n_bins" -> x.nBins,
        "tail_weight_holdout" -> x.tailWeightHoldout,
        "internal_weight_holdout" -> x.internalWeightHoldout) ++
        rcKw(x.rowCondition): _*)
    case x: ExpectColumnChisquareTestPValueToBeGreaterThan =>
      base(x.expectationType, Seq("column" -> x.column,
        "partition_object" -> Map("values" -> x.partitionValues.map(slot),
          "weights" -> x.partitionWeights),
        "p" -> x.p, "tail_weight_holdout" -> x.tailWeightHoldout) ++
        rcKw(x.rowCondition): _*)
    case x: ExpectColumnParameterizedDistributionKsTestPValueToBeGreaterThan =>
      base(x.expectationType, Seq("column" -> x.column,
        "distribution" -> x.distribution, "params" -> x.params,
        "p_value" -> x.pValue) ++ rcKw(x.rowCondition): _*)
    case x: ExpectColumnBootstrappedKsTestPValueToBeGreaterThan =>
      base(x.expectationType, Seq("column" -> x.column,
        "partition_object" -> Map("bins" -> x.binEdges,
          "weights" -> x.binWeights),
        "p" -> x.p, "bootstrap_samples" -> x.bootstrapSamples,
        "bootstrap_sample_size" -> x.bootstrapSampleSize,
        "seed" -> x.seed) ++
        (if (x.exact) Seq("exact" -> true) else Nil) ++
        rcKw(x.rowCondition): _*)
    case x: ExpectColumnPairCramersPhiValueToBeLessThan =>
      def binSlot(b: Seq[Any]): Seq[Any] = b.map {
        case s: Seq[_] => s.map(slot)
        case v => slot(v)
      }
      base(x.expectationType, Seq("column_A" -> x.columnA,
        "column_B" -> x.columnB) ++
        x.binsA.map(b => "bins_A" -> (binSlot(b): Any)) ++
        x.binsB.map(b => "bins_B" -> (binSlot(b): Any)) ++
        x.nBinsA.map("n_bins_A" -> (_: Any)) ++
        x.nBinsB.map("n_bins_B" -> (_: Any)) ++
        Seq("threshold" -> x.threshold) ++ rcKw(x.rowCondition): _*)
    case x: ExpectColumnToExist =>
      base(x.expectationType, Seq("column" -> x.column) ++
        x.columnIndex.map("column_index" -> (_: Any)): _*)
    case x: ExpectColumnValuesToBeOfType =>
      base(x.expectationType, "column" -> x.column, "type_" -> x.typeName)
    case x: ExpectColumnValuesToBeInTypeList =>
      base(x.expectationType, "column" -> x.column, "type_list" -> x.typeList)
    case x: ExpectTableColumnCountToBeBetween =>
      base(x.expectationType,
        (x.minValue.map("min_value" -> (_: Any)).toSeq ++
          x.maxValue.map("max_value" -> (_: Any))): _*)
    case x: ExpectTableColumnCountToEqual =>
      base(x.expectationType, "value" -> x.value)
    case x: ExpectTableColumnsToMatchOrderedList =>
      base(x.expectationType,
        "column_list" -> (if (x.vacuous) null else x.columnList))
    case x: ExpectTableColumnsToMatchSet =>
      base(x.expectationType, "column_set" -> x.columnSet,
        "exact_match" -> x.exactMatch)
    case x: UnexpectedRowsExpectation =>
      base("unexpected_rows_expectation",
        "unexpected_rows_query" -> x.unexpectedRowsQuery)
    case x: InvalidExpectation =>
      // an unknown type loaded from a document keeps its captured kwargs
      // blob, so a load→save store round-trip preserves it verbatim
      // instead of dropping or crashing
      Map("expectation_type" -> x.expectationType,
        "kwargs" -> Json.RawJson(x.kwargs.get("kwargs") match {
          case Some(s: String) => s
          case _ => "{}"
        }))
    case other =>
      throw new IllegalArgumentException(
        s"${other.expectationType} (${other.getClass.getSimpleName}) carries " +
          "live objects (a custom predicate or DataFrame handle) and cannot " +
          "be serialized to a GE JSON suite document")
  }

  private def aggBetween(tp: String, column: String, minValue: Option[Any],
      maxValue: Option[Any], strictMin: Boolean, strictMax: Boolean,
      rc: Option[String],
      extra: Seq[(String, Any)] = Nil): Map[String, Any] =
    base(tp, Seq("column" -> column) ++
      minValue.map("min_value" -> slot(_)) ++
      maxValue.map("max_value" -> slot(_)) ++
      (if (strictMin) Seq("strict_min" -> true) else Nil) ++
      (if (strictMax) Seq("strict_max" -> true) else Nil) ++
      extra ++
      rcKw(rc): _*)
}
