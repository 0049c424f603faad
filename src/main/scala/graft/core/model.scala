package graft.core

/** Core ADTs for the validation engine.
  *
  * Mirrors the reference's result model
  * (great_expectations/core/expectation_validation_result.py:67,414-489 and
  * great_expectations/core/result_format.py:7-18) re-expressed as plain Scala
  * case classes. All heavy lifting is done by Spark; these types only carry
  * driver-side results.
  */
sealed abstract class ResultFormat(val name: String, val rank: Int)
object ResultFormat {
  case object BooleanOnly extends ResultFormat("BOOLEAN_ONLY", 0)
  case object Basic extends ResultFormat("BASIC", 1)
  case object Summary extends ResultFormat("SUMMARY", 2)
  case object Complete extends ResultFormat("COMPLETE", 3)
  val default: ResultFormat = Summary
  /** Caps from the reference: partial lists 20, complete lists 200
    * (expectations/metrics/util.py:92  MAX_RESULT_RECORDS). */
  val PartialUnexpectedCount = 20
  val MaxResultRecords = 200
}

/** Full result_format parameter object
  * (expectation_configuration.py:47 `parse_result_format`; field use at
  * expectations/expectation.py:2605-2752): a bare level string is promoted
  * to a spec with defaults, and the dict form tunes the partial caps,
  * value exclusion, index columns and index-query emission. */
final case class ResultFormatSpec(
    level: ResultFormat,
    partialUnexpectedCount: Int = ResultFormat.PartialUnexpectedCount,
    excludeUnexpectedValues: Boolean = false,
    returnUnexpectedIndexQuery: Boolean = true,
    unexpectedIndexColumnNames: Seq[String] = Nil) {
  def rank: Int = level.rank
}
object ResultFormatSpec {
  import scala.language.implicitConversions
  /** `result_format="SUMMARY"` shorthand, as in the reference. */
  implicit def fromLevel(level: ResultFormat): ResultFormatSpec =
    ResultFormatSpec(level)
  val default: ResultFormatSpec = ResultFormatSpec(ResultFormat.default)
}

/** Null handling for pair/multicolumn domains
  * (execution_engine/sparkdf_execution_engine.py:687-726). */
sealed trait IgnoreRowIf
object IgnoreRowIf {
  case object BothValuesAreMissing extends IgnoreRowIf
  case object EitherValueIsMissing extends IgnoreRowIf
  case object AllValuesAreMissing extends IgnoreRowIf
  case object AnyValueIsMissing extends IgnoreRowIf
  case object Neither extends IgnoreRowIf
}

/** ExpectationValidationResult: one expectation's outcome.
  * `result` keys follow the reference's `_format_map_output`
  * (expectations/expectation.py:2605-2752). */
final case class Evr(
    expectationType: String,
    kwargs: Map[String, Any],
    success: Boolean,
    result: Map[String, Any],
    exception: Option[String] = None) {
  def observed: Option[Any] = result.get("observed_value")
}

final case class ValidationStatistics(
    evaluatedExpectations: Int,
    successfulExpectations: Int,
    unsuccessfulExpectations: Int,
    successPercent: Option[Double])

object ValidationStatistics {
  /** validator/validation_statistics.py:19-50 */
  def of(evrs: Seq[Evr]): ValidationStatistics = {
    val n = evrs.size
    val ok = evrs.count(_.success)
    ValidationStatistics(n, ok, n - ok,
      if (n == 0) None else Some(ok.toDouble / n * 100.0))
  }
}

final case class SuiteResult(
    suiteName: String,
    success: Boolean,
    results: Seq[Evr],
    statistics: ValidationStatistics)

object SuiteResult {
  def of(suiteName: String, evrs: Seq[Evr]): SuiteResult =
    SuiteResult(suiteName, evrs.forall(_.success), evrs, ValidationStatistics.of(evrs))
}

/** Minimal JSON writer for results/manifests (no external deps). */
object Json {
  /** Pre-serialized JSON text injected verbatim (caller guarantees it is
    * valid JSON — e.g. a kwargs blob captured at load time). */
  final case class RawJson(text: String)
  def esc(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }
  def write(v: Any): String = v match {
    case null | None => "null"
    case RawJson(t) => t
    case Some(x) => write(x)
    case s: String => esc(s)
    case b: Boolean => b.toString
    case d: Double => if (d.isNaN || d.isInfinite) esc(d.toString) else d.toString
    case f: Float => write(f.toDouble)
    case n: Number => n.toString
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => esc(String.valueOf(k)) + ":" + write(x) }.mkString("{", ",", "}")
    case it: Iterable[_] => it.map(write).mkString("[", ",", "]")
    case arr: Array[_] => arr.map(write).mkString("[", ",", "]")
    case ts: java.sql.Timestamp => esc(ts.toString)
    case d: java.sql.Date => esc(d.toString)
    case other => esc(String.valueOf(other))
  }
}
