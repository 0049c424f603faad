package graft.core

/** Suite parameters — `$PARAMETER` late binding
  * (core/suite_parameters.py:237-330, applied at
  * validator/v1_validator.py:117-136): a suite is authored once with
  * "$name" placeholders and resolved against a runtime parameter map just
  * before validation, so the same suite validates "orders since $start
  * with quantity ≥ $min_qty" day after day.
  *
  * Parameterizable slots in this typed model: every Any-typed value slot
  * (between bounds — map and aggregate —, value sets, pair value sets)
  * carries a `ParamRef`; String pattern slots (regex/like) carry the
  * `ParamRef.inString` marker; row_condition strings and SQL passthroughs
  * substitute every "$name" token with a SQL literal (in-band by nature —
  * they are SQL text). An unresolved ref that survives to evaluation
  * fails that expectation, not the run. */
/** A late-bound suite-parameter reference. Only this type is resolved by
  * SuiteParams — produced by SuiteJson's `{"$PARAMETER": "name"}` form or
  * constructed explicitly via the Scala API. Literal "$..." data strings
  * (prices, shell snippets, "$admin" role labels) are plain values and
  * never collapse into the ref representation (reference:
  * core/suite_parameters.py — only the dict form is a ref there too). */
final case class ParamRef(name: String)

object ParamRef {
  /** In-band ref marker for String-typed slots (regex / like patterns),
    * which cannot carry a ParamRef value. NUL never occurs in a
    * legitimate pattern, so literal strings are never mistaken for refs. */
  def inString(name: String): String = "\u0000" + name
  private[core] def fromString(s: String): Option[String] =
    if (s != null && s.nonEmpty && s.charAt(0) == '\u0000') Some(s.substring(1))
    else None
}

object SuiteParams {

  def resolve(suite: Suite, params: Map[String, Any]): Suite =
    Suite(suite.name, suite.expectations.map { e =>
      try resolveExp(e, params)
      catch {
        case ex: IllegalArgumentException =>
          // an undefined parameter fails THIS expectation (exception EVR),
          // not the whole run — same isolation as a missing column
          InvalidExpectation(e.expectationType, e.kwargs, ex.getMessage)
      }
    })

  /** A ref is the distinct ParamRef type (or its in-band string marker)
    * ONLY — any plain string, including identifier-shaped "$admin"-style
    * data values, stays literal instead of resolving or failing. */
  private def ref(v: Any): Option[String] = v match {
    case ParamRef(name) => Some(name)
    case s: String => ParamRef.fromString(s)
    case _ => None
  }

  /** Built-in evaluation-parameter expressions (the reference's
    * parse_evaluation_parameter grammar, core/suite_parameters.py:
    * `now()`, `datetime(y, m, d)`, and `now() ± timedelta(unit=expr)`
    * with integer arithmetic) — user-supplied params take precedence. */
  private val DatetimeRe =
    """datetime\(\s*(\d+)\s*,\s*(\d+)\s*,\s*(\d+)\s*\)""".r
  private val NowTimedeltaRe =
    """now\(\)\s*([+-])\s*timedelta\(\s*(\w+)\s*=\s*([0-9*+\s]+)\)""".r

  /** Products summed: "52*100 + 3" — the grammar subset the reference's
    * fixtures exercise. */
  private def intExpr(s: String): Long =
    s.split('+').map(_.split('*').map(_.trim.toLong).product).sum

  private def builtin(name: String): Option[Any] = name.trim match {
    case "now()" => Some(new java.sql.Timestamp(System.currentTimeMillis()))
    case DatetimeRe(y, m, d) => Some(java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(y.toInt, m.toInt, d.toInt, 0, 0)))
    case NowTimedeltaRe(sign, unit, amount) =>
      val n = intExpr(amount)
      val seconds = unit match {
        case "weeks" => n * 7L * 86400L
        case "days" => n * 86400L
        case "hours" => n * 3600L
        case "minutes" => n * 60L
        case "seconds" => n
        case other => throw new IllegalArgumentException(
          s"unsupported timedelta unit: $other")
      }
      val delta = if (sign == "-") -seconds else seconds
      Some(new java.sql.Timestamp(System.currentTimeMillis() + delta * 1000L))
    case _ => None
  }

  private def value(params: Map[String, Any])(v: Any): Any = ref(v) match {
    case Some(name) => params.get(name).orElse(builtin(name)).getOrElse(
      throw new IllegalArgumentException(s"undefined suite parameter: $$$name"))
    case None => v
  }

  private def str(params: Map[String, Any])(s: String): String =
    value(params)(s) match {
      case out: String => out
      case other => String.valueOf(other)
    }

  /** SQL literal rendering for row_condition / query substitution. */
  private def sqlLit(v: Any): String = v match {
    case s: String => "'" + s.replace("'", "''") + "'"
    case ts: java.sql.Timestamp => s"TIMESTAMP '${ts.toString}'"
    case d: java.sql.Date => s"DATE '${d.toString}'"
    case other => String.valueOf(other)
  }

  private val SqlRefToken = """\$([A-Za-z_][A-Za-z0-9_]*)""".r

  /** Token-wise substitution: "$name" is replaced only when the WHOLE
    * identifier matches a parameter, so a defined $min never corrupts an
    * undefined $min_qty sharing its prefix (the undefined ref is left in
    * place and fails loudly at SQL parse time). */
  private def sql(params: Map[String, Any])(s: String): String =
    ParamRef.fromString(s) match {
      // a whole-condition {"$PARAMETER": ...} ref: the parameter IS the
      // SQL text (not a quoted literal)
      case Some(name) => params.get(name) match {
        case Some(v: String) => v
        case Some(v) => sqlLit(v)
        case None => throw new IllegalArgumentException(
          s"undefined suite parameter: $$$name")
      }
      case None => SqlRefToken.replaceAllIn(s, m =>
        params.get(m.group(1)) match {
          case Some(v) => java.util.regex.Matcher.quoteReplacement(sqlLit(v))
          case None => java.util.regex.Matcher.quoteReplacement(m.matched)
        })
    }

  private def cond(params: Map[String, Any])(c: Option[String]): Option[String] =
    c.map(sql(params))

  private def resolveExp(e: Expectation, params: Map[String, Any]): Expectation = {
    val v = value(params) _
    val vo = (o: Option[Any]) => o.map(v)
    val st = str(params) _
    val rc = cond(params) _
    e match {
      case x: ExpectColumnValuesToBeBetween =>
        x.copy(minValue = vo(x.minValue), maxValue = vo(x.maxValue),
          rowCondition = rc(x.rowCondition))
      case x: ExpectColumnValuesToBeInSet =>
        x.copy(valueSet = x.valueSet.map(v), rowCondition = rc(x.rowCondition))
      case x: ExpectColumnValuesToNotBeInSet =>
        x.copy(valueSet = x.valueSet.map(v), rowCondition = rc(x.rowCondition))
      case x: ExpectColumnValuesToMatchRegex =>
        x.copy(regex = st(x.regex), rowCondition = rc(x.rowCondition))
      case x: ExpectColumnValuesToNotMatchRegex =>
        x.copy(regex = st(x.regex), rowCondition = rc(x.rowCondition))
      case x: ExpectColumnValuesToMatchRegexList =>
        x.copy(regexList = x.regexList.map(st), rowCondition = rc(x.rowCondition))
      case x: ExpectColumnValuesToNotMatchRegexList =>
        x.copy(regexList = x.regexList.map(st), rowCondition = rc(x.rowCondition))
      case x: ExpectColumnValuesToMatchLikePatternList =>
        x.copy(likePatternList = x.likePatternList.map(st),
          rowCondition = rc(x.rowCondition))
      case x: ExpectColumnDistinctValuesToBeInSet =>
        x.copy(valueSet = x.valueSet.map(v), rowCondition = rc(x.rowCondition))
      case x: ExpectColumnDistinctValuesToContainSet =>
        x.copy(valueSet = x.valueSet.map(v), rowCondition = rc(x.rowCondition))
      case x: ExpectColumnDistinctValuesToEqualSet =>
        x.copy(valueSet = x.valueSet.map(v), rowCondition = rc(x.rowCondition))
      case x: ExpectColumnMostCommonValueToBeInSet =>
        x.copy(valueSet = x.valueSet.map(v), rowCondition = rc(x.rowCondition))
      case x: ExpectColumnValuesToMatchLikePattern =>
        x.copy(likePattern = st(x.likePattern), rowCondition = rc(x.rowCondition))
      case x: ExpectColumnPairValuesToBeInSet =>
        x.copy(valuePairs = x.valuePairs.map { case (a, b) => (v(a), v(b)) },
          rowCondition = rc(x.rowCondition))
      case x: ExpectColumnMinToBeBetween =>
        x.copy(minValue = vo(x.minValue), maxValue = vo(x.maxValue),
          rowCondition = rc(x.rowCondition))
      case x: ExpectColumnMaxToBeBetween =>
        x.copy(minValue = vo(x.minValue), maxValue = vo(x.maxValue),
          rowCondition = rc(x.rowCondition))
      case x: ExpectColumnSumToBeBetween =>
        x.copy(minValue = vo(x.minValue), maxValue = vo(x.maxValue),
          rowCondition = rc(x.rowCondition))
      case x: ExpectColumnMeanToBeBetween =>
        x.copy(minValue = vo(x.minValue), maxValue = vo(x.maxValue),
          rowCondition = rc(x.rowCondition))
      case x: ExpectColumnStdevToBeBetween =>
        x.copy(minValue = vo(x.minValue), maxValue = vo(x.maxValue),
          rowCondition = rc(x.rowCondition))
      case x: ExpectColumnUniqueValueCountToBeBetween =>
        x.copy(minValue = vo(x.minValue), maxValue = vo(x.maxValue),
          rowCondition = rc(x.rowCondition))
      case x: ExpectTableRowCountToBeBetween =>
        x.copy(minValue = vo(x.minValue), maxValue = vo(x.maxValue),
          rowCondition = rc(x.rowCondition))
      case x: UnexpectedRowsExpectation =>
        x.copy(unexpectedRowsQuery = sql(params)(x.unexpectedRowsQuery))
      case other if other.rowCondition.exists(_.contains("$")) =>
        // generic row_condition substitution for the remaining types
        copyWithRowCondition(other, rc(other.rowCondition))
      case other => other
    }
  }

  private def copyWithRowCondition(e: Expectation,
      c: Option[String]): Expectation = e match {
    case x: ExpectColumnValuesToBeNull => x.copy(rowCondition = c)
    case x: ExpectColumnValuesToNotBeNull => x.copy(rowCondition = c)
    case x: ExpectColumnValuesToMatchRegexList => x.copy(rowCondition = c)
    case x: ExpectColumnValuesToNotMatchRegexList => x.copy(rowCondition = c)
    case x: ExpectColumnValuesToMatchLikePatternList => x.copy(rowCondition = c)
    case x: ExpectColumnValueLengthsToBeBetween => x.copy(rowCondition = c)
    case x: ExpectColumnValueLengthsToEqual => x.copy(rowCondition = c)
    case x: ExpectColumnValuesToBeUnique => x.copy(rowCondition = c)
    case x: ExpectColumnValuesToBeIncreasing => x.copy(rowCondition = c)
    case x: ExpectColumnValuesToBeDecreasing => x.copy(rowCondition = c)
    case x: ExpectColumnValuesToMatchStrftimeFormat => x.copy(rowCondition = c)
    case x: ExpectColumnValuesToBeJsonParseable => x.copy(rowCondition = c)
    case x: ExpectColumnValuesToMatchJsonSchema => x.copy(rowCondition = c)
    case x: ExpectColumnValuesToBeDateutilParseable => x.copy(rowCondition = c)
    case x: ExpectColumnValueZScoresToBeLessThan => x.copy(rowCondition = c)
    case x: ExpectColumnPairValuesToBeEqual => x.copy(rowCondition = c)
    case x: ExpectColumnPairValuesAToBeGreaterThanB => x.copy(rowCondition = c)
    case x: ExpectCompoundColumnsToBeUnique => x.copy(rowCondition = c)
    case x: ExpectMulticolumnSumToEqual => x.copy(rowCondition = c)
    case x: ExpectSelectColumnValuesToBeUniqueWithinRecord => x.copy(rowCondition = c)
    case x: ExpectColumnProportionOfUniqueValuesToBeBetween => x.copy(rowCondition = c)
    case x: ExpectTableRowCountToEqual => x.copy(rowCondition = c)
    case x: ExpectColumnMedianToBeBetween => x.copy(rowCondition = c)
    case x: ExpectColumnQuantileValuesToBeBetween => x.copy(rowCondition = c)
    case x: ExpectColumnMostCommonValueToBeInSet => x.copy(rowCondition = c)
    case x: ExpectColumnDistinctValuesToBeInSet => x.copy(rowCondition = c)
    case x: ExpectColumnDistinctValuesToContainSet => x.copy(rowCondition = c)
    case x: ExpectColumnDistinctValuesToEqualSet => x.copy(rowCondition = c)
    case x: ExpectColumnKlDivergenceToBeLessThan => x.copy(rowCondition = c)
    case x: ExpectColumnKlDivergenceContinuousToBeLessThan => x.copy(rowCondition = c)
    case x: ExpectColumnKlDivergenceAutoToBeLessThan => x.copy(rowCondition = c)
    case x: ExpectColumnChisquareTestPValueToBeGreaterThan => x.copy(rowCondition = c)
    case x: ExpectColumnParameterizedDistributionKsTestPValueToBeGreaterThan =>
      x.copy(rowCondition = c)
    case x: ExpectColumnBootstrappedKsTestPValueToBeGreaterThan =>
      x.copy(rowCondition = c)
    case x: ExpectColumnPairCramersPhiValueToBeLessThan => x.copy(rowCondition = c)
    case x: CustomColumnMapExpectation => x.copy(rowCondition = c)
    case x: CustomMulticolumnMapExpectation => x.copy(rowCondition = c)
    case other => other // schema expectations have no row condition
  }
}
