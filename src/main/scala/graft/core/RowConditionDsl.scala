package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Parser for the reference's row-condition mini-DSL
  * (expectations/row_conditions.py:36-66 grammar, :127
  * parse_condition_to_spark): `col("x") > 5`, `col("x") == "v"`,
  * `col("x").notNull()`, with int/float/quoted-string/date("...") literals.
  * The reference supports exactly one comparison per condition (no boolean
  * combinators); raw Spark-SQL strings remain the escape hatch
  * (condition_parser="spark"). */
object RowConditionDsl {

  private val NotNullRe = """\s*col\("([^"]+)"\)\.notNull\(\)\s*""".r
  private val CmpRe = """\s*col\("([^"]+)"\)\s*(>=|<=|==|!=|>|<)\s*(.+?)\s*""".r
  private val DateRe = """date\("([^"]+)"\)""".r
  private val StrRe = """"([^"]*)"""".r

  private def literal(s: String): Column = s match {
    case DateRe(d) => to_date(lit(d))
    case StrRe(v) => lit(v)
    case v if v.matches("[+-]?\\d+") => lit(v.toLong)
    case v if v.matches("[+-]?\\d*\\.\\d+([eE][+-]?\\d+)?") => lit(v.toDouble)
    case other => throw new IllegalArgumentException(s"unparseable literal: $other")
  }

  def toColumn(condition: String): Column = condition match {
    case NotNullRe(c) => col(c).isNotNull
    case CmpRe(c, op, rhs) =>
      val l = col(c)
      val r = literal(rhs)
      op match {
        case ">" => l > r
        case ">=" => l >= r
        case "<" => l < r
        case "<=" => l <= r
        case "==" => l === r
        case "!=" => l =!= r
      }
    case other =>
      throw new IllegalArgumentException(s"unparseable row condition: $other")
  }

  /** Translate a mini-DSL condition to the equivalent Spark-SQL string
    * (the form Expectation.rowCondition carries), so JSON suites with
    * condition_parser="great_expectations" load without a Column slot. */
  def toSql(condition: String): String = {
    def lit(s: String): String = s match {
      case DateRe(d) => s"DATE '$d'"
      case StrRe(v) => "'" + v.replace("'", "''") + "'"
      case v if v.matches("[+-]?\\d+") ||
        v.matches("[+-]?\\d*\\.\\d+([eE][+-]?\\d+)?") => v
      case other => throw new IllegalArgumentException(s"unparseable literal: $other")
    }
    def q(c: String): String = "`" + c.replace("`", "``") + "`"
    condition match {
      case NotNullRe(c) => s"${q(c)} IS NOT NULL"
      case CmpRe(c, op, rhs) =>
        val sqlOp = op match {
          case "==" => "="
          case "!=" => "<>"
          case o => o
        }
        s"${q(c)} $sqlOp ${lit(rhs)}"
      case other =>
        throw new IllegalArgumentException(s"unparseable row condition: $other")
    }
  }
}
