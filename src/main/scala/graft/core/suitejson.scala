package graft.core

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Loader for the reference's JSON expectation-suite documents
  * (`{"expectation_suite_name": ..., "expectations": [{"expectation_type":
  * ..., "kwargs": {...}}]}` — the on-disk format GE stores suites in, e.g.
  * tests/test_sets/titanic_parameterized_expectations.json), so existing
  * suite files run unchanged against this engine.
  *
  * `{"$PARAMETER": "name"}` kwarg values map to this engine's "$name"
  * refs and resolve through SuiteParams at validation time. An unknown
  * expectation_type or malformed kwargs yields an InvalidExpectation
  * (exception EVR at run time) rather than failing the whole load —
  * the same isolation the reference applies per expectation. */
object SuiteJson {

  // ±Infinity literals appear in continuous partition_object bins (the
  // reference serializes numpy ±inf bare); standard JSON forbids them, so
  // opt in to Jackson's non-numeric-number extension
  private val mapper = new ObjectMapper().configure(
    com.fasterxml.jackson.core.JsonParser.Feature.ALLOW_NON_NUMERIC_NUMBERS,
    true)

  def fromJson(json: String): Suite = {
    val root = mapper.readTree(json)
    val name = Option(root.get("expectation_suite_name"))
      .map(_.asText()).getOrElse("suite")
    val exps = Option(root.get("expectations")).toSeq
      .flatMap(_.elements().asScala)
      .map(parseExpectation)
    Suite(name, exps)
  }

  // --- kwarg readers ----------------------------------------------------------

  /** JSON value → Any, with {"$PARAMETER": "x"} → ParamRef("x") — the
    * DISTINCT ref type, so literal "$..." data strings stay literal. */
  private def value(n: JsonNode): Any = n match {
    case null => null
    case _ if n.isNull => null
    case _ if n.isObject && n.has("$PARAMETER") => ParamRef(n.get("$PARAMETER").asText())
    case _ if n.isTextual => n.asText()
    case _ if n.isIntegralNumber => n.longValue()
    case _ if n.isNumber => n.doubleValue()
    case _ if n.isBoolean => n.booleanValue()
    case _ if n.isArray => n.elements().asScala.map(value).toSeq
    case other => other.toString
  }

  private final class Kw(k: JsonNode) {
    private def node(name: String): Option[JsonNode] =
      Option(k.get(name)).filterNot(_.isNull)
    /** Absent OR null — both mean the reference's None/default. */
    def isMissingOrNull(name: String): Boolean =
      k.get(name) == null || k.get(name).isNull
    private def isRef(n: JsonNode): Boolean = n.isObject && n.has("$PARAMETER")
    /** Typed scalar slots cannot carry a late-bound ref in this model —
      * fail loudly (→ InvalidExpectation) instead of Jackson's silent
      * asDouble()/asInt() = 0 coercion producing a false-green check. */
    private def scalar(name: String): Option[JsonNode] = node(name).map { n =>
      if (isRef(n)) throw new IllegalArgumentException(
        s"$$PARAMETER ref not supported for typed kwarg '$name'")
      n
    }
    /** String slots DO support refs via the in-band NUL marker
      * (SuiteParams resolves it for regex/like patterns; a literal
      * "$name" pattern string stays a literal pattern). */
    def str(name: String): String = node(name).map {
      case n if isRef(n) => ParamRef.inString(n.get("$PARAMETER").asText())
      case n => n.asText()
    }.getOrElse(throw new IllegalArgumentException(s"missing kwarg: $name"))
    def strOpt(name: String): Option[String] = node(name).map {
      case n if isRef(n) => ParamRef.inString(n.get("$PARAMETER").asText())
      case n => n.asText()
    }
    def anyOpt(name: String): Option[Any] = node(name).map(value)
    def seq(name: String): Seq[Any] =
      node(name).map(value(_).asInstanceOf[Seq[Any]]).getOrElse(Nil)
    def strSeq(name: String): Seq[String] = seq(name).map(String.valueOf)
    /** Strict numeric read: Jackson's asDouble()/asInt() silently coerce
      * non-numeric text to 0 — a "mostly": "One" must load as an error EVR
      * ("is not a valid float", like the reference's pydantic validation),
      * not as mostly=0 vacuous success. */
    private def num(name: String): Option[Double] = scalar(name).map { n =>
      if (n.isNumber) n.doubleValue()
      else if (n.isTextual)
        try n.asText().toDouble
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"'$name' value '${n.asText()}' is not a valid float")
        }
      else throw new IllegalArgumentException(s"'$name' is not a valid float")
    }
    def dbl(name: String, default: Double): Double =
      num(name).getOrElse(default)
    def dblOpt(name: String): Option[Double] = num(name)
    /** Strict integer reads with the reference's (pydantic) "is not a
      * valid integer" phrasing for non-numeric text. The long form exists
      * for row-count magnitudes (a 3·10⁹ value must not truncate). */
    def longOpt(name: String): Option[Long] = scalar(name).map { n =>
      if (n.isNumber) n.longValue()
      else if (n.isTextual)
        try n.asText().trim.toLong
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"'$name' value '${n.asText()}' is not a valid integer")
        }
      else throw new IllegalArgumentException(s"'$name' is not a valid integer")
    }
    def intOpt(name: String): Option[Int] = longOpt(name).map(_.toInt)
    def bool(name: String, default: Boolean): Boolean =
      scalar(name).map(_.asBoolean()).getOrElse(default)
    def mostly: Double = {
      val m = dbl("mostly", 1.0)
      // expectation.py validates mostly ∈ [0,1] (pydantic ge=0/le=1, whose
      // message text the fixture corpus pins); out-of-range must load as
      // an InvalidExpectation (error EVR), not evaluate vacuously
      if (m > 1.0) throw new IllegalArgumentException(
        s"mostly: input should be less than or equal to 1 (got $m)")
      if (m < 0.0) throw new IllegalArgumentException(
        s"mostly: input should be greater than or equal to 0 (got $m)")
      m
    }
    /** row_condition honoring condition_parser: "great_expectations*"
      * (the col("x") > 5 mini-DSL, row_conditions.py:36-66) is translated
      * to the equivalent Spark SQL; "spark" (and absent) pass through. */
    def rowCondition: Option[String] = strOpt("row_condition").map { rc =>
      strOpt("condition_parser") match {
        case Some(p) if p.startsWith("great_expectations") =>
          RowConditionDsl.toSql(rc)
        case _ => rc
      }
    }
    def ignoreRowIf: IgnoreRowIf =
      strOpt("ignore_row_if").getOrElse("both_values_are_missing") match {
        case "both_values_are_missing" => IgnoreRowIf.BothValuesAreMissing
        case "either_value_is_missing" => IgnoreRowIf.EitherValueIsMissing
        case "all_values_are_missing" => IgnoreRowIf.AllValuesAreMissing
        case "any_value_is_missing" => IgnoreRowIf.AnyValueIsMissing
        case "neither" => IgnoreRowIf.Neither
        case other => throw new IllegalArgumentException(s"ignore_row_if: $other")
      }
    def multiIgnoreRowIf: IgnoreRowIf =
      strOpt("ignore_row_if").getOrElse("all_values_are_missing") match {
        case "all_values_are_missing" => IgnoreRowIf.AllValuesAreMissing
        case "any_value_is_missing" => IgnoreRowIf.AnyValueIsMissing
        case "neither" => IgnoreRowIf.Neither
        case other => throw new IllegalArgumentException(s"ignore_row_if: $other")
      }
  }

  // --- dispatch ----------------------------------------------------------------

  private def parseExpectation(e: JsonNode): Expectation = {
    val tp = Option(e.get("expectation_type")).map(_.asText()).getOrElse("unknown")
    val kwNode = Option(e.get("kwargs"))
      .getOrElse(mapper.createObjectNode(): JsonNode)
    val kw = new Kw(kwNode)
    try build(tp, kw, kwNode)
    catch {
      case ex: Exception =>
        InvalidExpectation(tp, Map("kwargs" -> kwNode.toString),
          s"cannot load expectation: ${ex.getMessage}")
    }
  }

  private def build(tp: String, kw: Kw, kwNode: JsonNode): Expectation = tp match {
    case "expect_column_values_to_be_null" =>
      ExpectColumnValuesToBeNull(kw.str("column"), kw.mostly, kw.rowCondition)
    case "expect_column_values_to_not_be_null" =>
      ExpectColumnValuesToNotBeNull(kw.str("column"), kw.mostly, kw.rowCondition)
    case "expect_column_values_to_be_in_set" =>
      // value_set null OR absent is the reference's vacuously-true None
      // (column_values_in_set.py:78-88) — NOT the empty set (which marks
      // every non-null value unexpected)
      ExpectColumnValuesToBeInSet(kw.str("column"),
        if (kw.isMissingOrNull("value_set")) Nil else kw.seq("value_set"),
        kw.mostly, kw.rowCondition,
        universalSet = kw.isMissingOrNull("value_set"))
    case "expect_column_values_to_not_be_in_set" =>
      ExpectColumnValuesToNotBeInSet(kw.str("column"),
        if (kw.isMissingOrNull("value_set")) Nil else kw.seq("value_set"),
        kw.mostly, kw.rowCondition,
        universalSet = kw.isMissingOrNull("value_set"))
    case "expect_column_values_to_be_between" =>
      ExpectColumnValuesToBeBetween(kw.str("column"),
        kw.anyOpt("min_value"), kw.anyOpt("max_value"),
        kw.bool("strict_min", false), kw.bool("strict_max", false),
        kw.mostly, kw.rowCondition)
    case "expect_column_values_to_match_regex" =>
      ExpectColumnValuesToMatchRegex(kw.str("column"), kw.str("regex"),
        kw.mostly, kw.rowCondition)
    case "expect_column_values_to_not_match_regex" =>
      ExpectColumnValuesToNotMatchRegex(kw.str("column"), kw.str("regex"),
        kw.mostly, kw.rowCondition)
    case "expect_column_values_to_match_regex_list" =>
      ExpectColumnValuesToMatchRegexList(kw.str("column"), kw.strSeq("regex_list"),
        kw.strOpt("match_on").getOrElse("any"), kw.mostly, kw.rowCondition)
    case "expect_column_values_to_not_match_regex_list" =>
      ExpectColumnValuesToNotMatchRegexList(kw.str("column"),
        kw.strSeq("regex_list"), kw.mostly, kw.rowCondition)
    case "expect_column_values_to_match_like_pattern" =>
      ExpectColumnValuesToMatchLikePattern(kw.str("column"),
        kw.str("like_pattern"), negate = false, kw.mostly, kw.rowCondition)
    case "expect_column_values_to_not_match_like_pattern" =>
      ExpectColumnValuesToMatchLikePattern(kw.str("column"),
        kw.str("like_pattern"), negate = true, kw.mostly, kw.rowCondition)
    case "expect_column_values_to_match_like_pattern_list" =>
      ExpectColumnValuesToMatchLikePatternList(kw.str("column"),
        kw.strSeq("like_pattern_list"), kw.strOpt("match_on").getOrElse("any"),
        negate = false, kw.mostly, kw.rowCondition)
    case "expect_column_values_to_not_match_like_pattern_list" =>
      ExpectColumnValuesToMatchLikePatternList(kw.str("column"),
        kw.strSeq("like_pattern_list"), kw.strOpt("match_on").getOrElse("any"),
        negate = true, kw.mostly, kw.rowCondition)
    case "expect_column_value_lengths_to_be_between" =>
      ExpectColumnValueLengthsToBeBetween(kw.str("column"),
        kw.intOpt("min_value"), kw.intOpt("max_value"), kw.mostly, kw.rowCondition)
    case "expect_column_value_lengths_to_equal" =>
      ExpectColumnValueLengthsToEqual(kw.str("column"),
        kw.intOpt("value").get, kw.mostly, kw.rowCondition)
    case "expect_column_values_to_be_unique" =>
      ExpectColumnValuesToBeUnique(kw.str("column"), kw.mostly, kw.rowCondition)
    case "expect_column_values_to_be_increasing" =>
      // partition_by/order_by are the engine's shuffle-parallel extension
      // (SuiteWriter round-trips them; plain GE documents omit them)
      ExpectColumnValuesToBeIncreasing(kw.str("column"),
        kw.bool("strictly", false),
        partitionBy = kw.strSeq("partition_by"),
        orderBy = kw.strSeq("order_by"),
        mostly = kw.mostly, rowCondition = kw.rowCondition)
    case "expect_column_values_to_be_decreasing" =>
      ExpectColumnValuesToBeDecreasing(kw.str("column"),
        kw.bool("strictly", false),
        partitionBy = kw.strSeq("partition_by"),
        orderBy = kw.strSeq("order_by"),
        mostly = kw.mostly, rowCondition = kw.rowCondition)
    case "expect_column_values_to_match_strftime_format" =>
      ExpectColumnValuesToMatchStrftimeFormat(kw.str("column"),
        kw.str("strftime_format"), kw.mostly, kw.rowCondition)
    case "expect_column_values_to_be_json_parseable" =>
      ExpectColumnValuesToBeJsonParseable(kw.str("column"), kw.mostly, kw.rowCondition)
    case "expect_column_values_to_match_json_schema" =>
      val schema = Option(kwNode.get("json_schema")) match {
        case Some(n) if n.isObject => n.toString
        case Some(n) => n.asText()
        case None => throw new IllegalArgumentException("missing kwarg: json_schema")
      }
      ExpectColumnValuesToMatchJsonSchema(kw.str("column"), schema,
        kw.mostly, kw.rowCondition)
    case "expect_column_values_to_be_dateutil_parseable" =>
      ExpectColumnValuesToBeDateutilParseable(kw.str("column"), kw.mostly,
        kw.rowCondition)
    case "expect_column_value_z_scores_to_be_less_than" =>
      ExpectColumnValueZScoresToBeLessThan(kw.str("column"),
        kw.dblOpt("threshold").get, kw.bool("double_sided", true),
        kw.mostly, kw.rowCondition,
        exactMoments = kw.bool("exact_moments", false))
    case "expect_column_pair_values_to_be_equal" =>
      ExpectColumnPairValuesToBeEqual(kw.str("column_A"), kw.str("column_B"),
        kw.ignoreRowIf, kw.mostly, kw.rowCondition)
    case "expect_column_pair_values_a_to_be_greater_than_b" =>
      ExpectColumnPairValuesAToBeGreaterThanB(kw.str("column_A"),
        kw.str("column_B"), kw.bool("or_equal", false), kw.ignoreRowIf,
        kw.mostly, kw.rowCondition)
    case "expect_column_pair_values_to_be_in_set" =>
      val pairs = kw.seq("value_pairs_set").map {
        case s: Seq[_] if s.size == 2 => (s(0), s(1))
        case other => throw new IllegalArgumentException(s"bad pair: $other")
      }
      ExpectColumnPairValuesToBeInSet(kw.str("column_A"), kw.str("column_B"),
        pairs, kw.ignoreRowIf, kw.mostly, kw.rowCondition)
    case "expect_compound_columns_to_be_unique" =>
      ExpectCompoundColumnsToBeUnique(kw.strSeq("column_list"),
        kw.multiIgnoreRowIf, kw.mostly, kw.rowCondition)
    case "expect_multicolumn_sum_to_equal" =>
      ExpectMulticolumnSumToEqual(kw.strSeq("column_list"),
        kw.dblOpt("sum_total").get, kw.multiIgnoreRowIf, kw.mostly, kw.rowCondition)
    case "expect_select_column_values_to_be_unique_within_record" |
         "expect_multicolumn_values_to_be_unique" =>
      ExpectSelectColumnValuesToBeUniqueWithinRecord(kw.strSeq("column_list"),
        kw.multiIgnoreRowIf, kw.mostly, kw.rowCondition)
    // --- aggregates -----------------------------------------------------------
    case "expect_column_min_to_be_between" =>
      ExpectColumnMinToBeBetween(kw.str("column"), kw.anyOpt("min_value"),
        kw.anyOpt("max_value"), kw.bool("strict_min", false),
        kw.bool("strict_max", false), kw.rowCondition)
    case "expect_column_max_to_be_between" =>
      ExpectColumnMaxToBeBetween(kw.str("column"), kw.anyOpt("min_value"),
        kw.anyOpt("max_value"), kw.bool("strict_min", false),
        kw.bool("strict_max", false), kw.rowCondition)
    case "expect_column_sum_to_be_between" =>
      ExpectColumnSumToBeBetween(kw.str("column"), kw.anyOpt("min_value"),
        kw.anyOpt("max_value"), kw.bool("strict_min", false),
        kw.bool("strict_max", false), kw.rowCondition)
    case "expect_column_mean_to_be_between" =>
      ExpectColumnMeanToBeBetween(kw.str("column"), kw.anyOpt("min_value"),
        kw.anyOpt("max_value"), kw.bool("strict_min", false),
        kw.bool("strict_max", false), kw.rowCondition)
    case "expect_column_stdev_to_be_between" =>
      ExpectColumnStdevToBeBetween(kw.str("column"), kw.anyOpt("min_value"),
        kw.anyOpt("max_value"), kw.bool("strict_min", false),
        kw.bool("strict_max", false), kw.rowCondition,
        exactMoments = kw.bool("exact_moments", false))
    case "expect_column_unique_value_count_to_be_between" =>
      ExpectColumnUniqueValueCountToBeBetween(kw.str("column"),
        kw.anyOpt("min_value"), kw.anyOpt("max_value"), kw.rowCondition)
    case "expect_column_proportion_of_unique_values_to_be_between" =>
      ExpectColumnProportionOfUniqueValuesToBeBetween(kw.str("column"),
        kw.dblOpt("min_value"), kw.dblOpt("max_value"), kw.rowCondition)
    case "expect_table_row_count_to_be_between" =>
      ExpectTableRowCountToBeBetween(kw.anyOpt("min_value"),
        kw.anyOpt("max_value"), kw.rowCondition)
    case "expect_table_row_count_to_equal" =>
      ExpectTableRowCountToEqual(kw.longOpt("value").get, kw.rowCondition)
    case "expect_column_median_to_be_between" =>
      ExpectColumnMedianToBeBetween(kw.str("column"), kw.dblOpt("min_value"),
        kw.dblOpt("max_value"), kw.rowCondition)
    case "expect_column_quantile_values_to_be_between" =>
      val qr = kwNode.get("quantile_ranges")
      val qs = qr.get("quantiles").elements().asScala.map(_.asDouble()).toSeq
      val ranges = qr.get("value_ranges").elements().asScala.map { r =>
        val it = r.elements().asScala.toSeq
        (if (it.head.isNull) None else Some(it.head.asDouble()),
          if (it(1).isNull) None else Some(it(1).asDouble()))
      }.toSeq
      ExpectColumnQuantileValuesToBeBetween(kw.str("column"), qs, ranges,
        kw.dblOpt("relative_error").getOrElse(1e-4), kw.rowCondition,
        exact = kw.bool("exact", false))
    case "expect_column_most_common_value_to_be_in_set" =>
      ExpectColumnMostCommonValueToBeInSet(kw.str("column"), kw.seq("value_set"),
        kw.bool("ties_okay", false), kw.rowCondition)
    case "expect_column_distinct_values_to_be_in_set" =>
      // value_set null = universal set (vacuous pass), like map in_set above
      ExpectColumnDistinctValuesToBeInSet(kw.str("column"),
        if (kw.isMissingOrNull("value_set")) Nil else kw.seq("value_set"),
        kw.rowCondition, universalSet = kw.isMissingOrNull("value_set"))
    case "expect_column_distinct_values_to_contain_set" =>
      ExpectColumnDistinctValuesToContainSet(kw.str("column"), kw.seq("value_set"),
        kw.rowCondition)
    case "expect_column_distinct_values_to_equal_set" =>
      ExpectColumnDistinctValuesToEqualSet(kw.str("column"), kw.seq("value_set"),
        kw.rowCondition)
    case "expect_column_kl_divergence_to_be_less_than" =>
      val po = Option(kwNode.get("partition_object")).filterNot(_.isNull)
      val threshold = kw.dblOpt("threshold").getOrElse(Double.PositiveInfinity)
      val tail = kw.dbl("tail_weight_holdout", 0.0)
      val internal = kw.dbl("internal_weight_holdout", 0.0)
      po match {
        case None =>
          ExpectColumnKlDivergenceAutoToBeLessThan(kw.str("column"), threshold,
            kw.strOpt("bins").getOrElse("auto"),
            kw.intOpt("n_bins").getOrElse(10),
            tailWeightHoldout = tail, internalWeightHoldout = internal,
            rowCondition = kw.rowCondition)
        case Some(p) if p.has("bins") && p.has("weights") =>
          val bins = p.get("bins").elements().asScala.map(_.asDouble()).toSeq
          val weights = p.get("weights").elements().asScala.map(_.asDouble()).toSeq
          val tw = Option(p.get("tail_weights")).filterNot(_.isNull).map { n =>
            val t = n.elements().asScala.map(_.asDouble()).toSeq
            if (t.size != 2) throw new IllegalArgumentException(
              "Invalid partition object.")
            (t.head, t(1))
          }
          ExpectColumnKlDivergenceContinuousToBeLessThan(kw.str("column"),
            bins, weights, threshold, tail, internal, tw, kw.rowCondition)
        case Some(p) if p.has("values") && p.has("weights") =>
          val values = p.get("values").elements().asScala.map(value).toSeq
          val weights = p.get("weights").elements().asScala.map(_.asDouble()).toSeq
          ExpectColumnKlDivergenceToBeLessThan(kw.str("column"), values, weights,
            threshold, tail, internal, kw.rowCondition)
        case Some(_) =>
          // shape-invalid partition (e.g. {}) — the reference raises
          // "Invalid partition object." at validation time
          InvalidExpectation(tp, Map("kwargs" -> kwNode.toString),
            "Invalid partition object.")
      }
    // --- distributional hypothesis tests -----------------------------------------
    case "expect_column_chisquare_test_p_value_to_be_greater_than" =>
      val po = Option(kwNode.get("partition_object")).filterNot(_.isNull)
        .getOrElse(throw new IllegalArgumentException(
          "ValueError: chisquare test requires a categorical partition_object"))
      if (po.has("bins") || !po.has("values"))
        throw new IllegalArgumentException(
          "ValueError: chisquare test requires a categorical partition_object " +
            "(values + weights), not a continuous one")
      val values = po.get("values").elements().asScala.map(value).toSeq
      val weights = po.get("weights").elements().asScala.map(_.asDouble()).toSeq
      ExpectColumnChisquareTestPValueToBeGreaterThan(kw.str("column"),
        values, weights, kw.dbl("p", 0.05),
        kw.dbl("tail_weight_holdout", 0.0), kw.rowCondition)
    case "expect_column_parameterized_distribution_ks_test_p_value_to_be_greater_than" =>
      val dist = kw.str("distribution")
      val pNode = kwNode.get("params")
      val args =
        if (pNode == null || pNode.isNull)
          throw new IllegalArgumentException("params is required")
        else if (pNode.isArray)
          pNode.elements().asScala.map(_.asDouble()).toIndexedSeq
        else {
          val m = pNode.fieldNames().asScala
            .map(k => k -> pNode.get(k).asDouble()).toMap
          graft.functions.StatsMath.positionalArgs(dist, m)
        }
      ExpectColumnParameterizedDistributionKsTestPValueToBeGreaterThan(
        kw.str("column"), dist, args, kw.dbl("p_value", 0.05), kw.rowCondition)
    case "expect_column_bootstrapped_ks_test_p_value_to_be_greater_than" =>
      val po = Option(kwNode.get("partition_object")).filterNot(_.isNull)
        .getOrElse(throw new IllegalArgumentException(
          "ValueError: bootstrapped KS requires a continuous partition_object"))
      if (!po.has("bins"))
        throw new IllegalArgumentException(
          "ValueError: Invalid continuous partition object.")
      if (po.has("tail_weights") &&
          po.get("tail_weights").elements().asScala.map(_.asDouble()).sum > 0)
        throw new IllegalArgumentException(
          "Partition cannot have tail weights -- endpoints must be finite.")
      val bins = po.get("bins").elements().asScala.map(_.asDouble()).toSeq
      if (bins.exists(_.isInfinite))
        throw new IllegalArgumentException("Partition endpoints must be finite.")
      val weights = po.get("weights").elements().asScala.map(_.asDouble()).toSeq
      ExpectColumnBootstrappedKsTestPValueToBeGreaterThan(kw.str("column"),
        bins, weights, kw.dbl("p", 0.05),
        kw.intOpt("bootstrap_samples").getOrElse(1000),
        kw.intOpt("bootstrap_sample_size").getOrElse(0),
        seed = kw.anyOpt("seed") // exact int64 read (dblOpt would round >2^53)
          .map(_.asInstanceOf[Number].longValue()).getOrElse(42L),
        exact = kw.bool("exact", default = false),
        rowCondition = kw.rowCondition)
    case "expect_column_pair_cramers_phi_value_to_be_less_than" =>
      def binsOf(k: String): Option[Seq[Any]] =
        Option(kwNode.get(k)).filterNot(_.isNull).map(_.elements().asScala
          .map { n =>
            if (n.isArray) n.elements().asScala.map(value).toSeq
            else value(n)
          }.toSeq)
      ExpectColumnPairCramersPhiValueToBeLessThan(
        kw.str("column_A"), kw.str("column_B"),
        binsOf("bins_A"), binsOf("bins_B"),
        kw.intOpt("n_bins_A"), kw.intOpt("n_bins_B"),
        kw.dbl("threshold", 0.1), kw.rowCondition)
    // --- schema / table shape ---------------------------------------------------
    case "expect_column_to_exist" =>
      ExpectColumnToExist(kw.str("column"), kw.intOpt("column_index"))
    case "expect_column_values_to_be_of_type" =>
      ExpectColumnValuesToBeOfType(kw.str("column"), kw.str("type_"))
    case "expect_column_values_to_be_in_type_list" =>
      // type_list null = universal (vacuous pass), like column_list above
      ExpectColumnValuesToBeInTypeList(kw.str("column"),
        if (kw.isMissingOrNull("type_list")) Nil else kw.strSeq("type_list"),
        universalList = kw.isMissingOrNull("type_list"))
    case "expect_table_column_count_to_be_between" =>
      ExpectTableColumnCountToBeBetween(kw.intOpt("min_value"), kw.intOpt("max_value"))
    case "expect_table_column_count_to_equal" =>
      ExpectTableColumnCountToEqual(kw.intOpt("value").get)
    case "expect_table_columns_to_match_ordered_list" =>
      ExpectTableColumnsToMatchOrderedList(
        if (kw.isMissingOrNull("column_list")) Nil else kw.strSeq("column_list"),
        vacuous = kw.isMissingOrNull("column_list"))
    case "expect_table_columns_to_match_set" =>
      ExpectTableColumnsToMatchSet(kw.strSeq("column_set"),
        kw.bool("exact_match", true))
    case "unexpected_rows_expectation" | "expect_query_to_return_no_rows" =>
      UnexpectedRowsExpectation(kw.str("unexpected_rows_query"))
    case other =>
      InvalidExpectation(other, Map("kwargs" -> kwNode.toString),
        s"unknown expectation_type: $other")
  }
}
