package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Table-driven golden runner over the reference's cross-engine JSON
  * fixture corpus (the JSON files under tests/test_definitions, executed per
  * self_check/util.py:2030-2571 comparison rules): datasets are built
  * from each file's `data` block (mixed-type columns and the corpus's own
  * engine gating honored — `suppress_test_for`/`only_for` with "spark"),
  * kwargs load through SuiteJson (the same path user JSON suites take),
  * and `out` keys present are compared: success, unexpected_list as a
  * multiset, unexpected pk_index multiset, observed_value. These files
  * carry the reference's hand-written edge cases (nulls, NaN, mixed
  * types) that the repo's own oracles don't synthesize. */
abstract class GoldenFixtureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val base = "/root/reference/tests/test_definitions"
  private val mapper = new ObjectMapper()

  /** Fixture files (relative to tests/test_definitions) to run. */
  def files: Seq[String]

  /** Test titles to skip with a documented rationale. */
  def skipTitles: Set[String] = Set.empty

  /** Column type from the non-null values; None = mixed/unsupported (tests
    * touching such a column are pandas-object-semantics and are skipped,
    * as the corpus itself gates them to pandas in the overwhelming case). */
  private def columnType(vals: Seq[JsonNode]): Option[DataType] = {
    val nn = vals.filterNot(v => v == null || v.isNull)
    if (nn.isEmpty) Some(StringType)
    else if (nn.forall(_.isBoolean)) Some(BooleanType)
    else if (nn.forall(_.isIntegralNumber)) Some(LongType)
    else if (nn.forall(_.isNumber)) Some(DoubleType)
    else if (nn.forall(_.isTextual)) Some(StringType)
    else None
  }

  /** The corpus declares per-engine types (`schemas.spark`); honor the
    * temporal ones — the reference's spark harness loads those columns as
    * timestamps, and string-typed stand-ins change between/max semantics. */
  private def declaredType(ds: JsonNode, c: String): Option[DataType] =
    for {
      schemas <- Option(ds.get("schemas"))
      sp <- Option(schemas.get("spark"))
      t <- Option(sp.get(c)).map(_.asText())
      dt <- t match {
        case "TimestampType" => Some(TimestampType)
        case "DateType" => Some(DateType)
        case _ => None
      }
    } yield dt

  private def toValue(n: JsonNode, dt: DataType): Any =
    if (n == null || n.isNull) null
    else dt match {
      case BooleanType => n.booleanValue()
      case LongType => n.longValue()
      case DoubleType => n.doubleValue()
      case TimestampType =>
        val s = n.asText().replace("T", " ")
        try java.sql.Timestamp.valueOf(if (s.length == 10) s + " 00:00:00" else s)
        catch {
          case _: IllegalArgumentException =>
            // the corpus also carries legacy US-style stamps (Jan 01 1970…)
            java.sql.Timestamp.valueOf(java.time.LocalDateTime.parse(n.asText(),
              java.time.format.DateTimeFormatter.ofPattern(
                "MMM dd yyyy HH:mm:ss", java.util.Locale.ROOT)))
        }
      case DateType => java.sql.Date.valueOf(n.asText().take(10))
      case StringType => n.asText()
      case _ => n.asText()
    }

  private def sparkAllows(t: JsonNode): Boolean = {
    val sup = Option(t.get("suppress_test_for")).toSeq
      .flatMap(_.elements().asScala).map(_.asText())
    val only = Option(t.get("only_for")).map(_.elements().asScala
      .map(_.asText()).toSeq)
    !sup.contains("spark") && only.forall(_.contains("spark"))
  }

  /** Canonical numeric form so "1"/"1.0"/fixture-int all collide. */
  private def canon(s: String): String =
    try java.lang.Double.parseDouble(s).toString catch { case _: Exception => s }

  /** Normalize a fixture value (scalar OR the dict form pair/multicolumn
    * lists carry) to a comparable string. */
  private def expectedStr(n: JsonNode): String =
    if (n == null || n.isNull) "null"
    // pair/multicolumn entries: the fixture writes value ARRAYS, our EVR
    // writes {col: value} JSON — compare as the sorted value multiset
    else if (n.isObject)
      n.fieldNames().asScala.toSeq.map(k => expectedStr(n.get(k)))
        .sorted.mkString("[", ",", "]")
    else if (n.isArray)
      n.elements().asScala.map(expectedStr).toSeq.sorted
        .mkString("[", ",", "]")
    else {
      // JSON-shaped scalar strings (json_parseable/match_json_schema data)
      // must normalize like OUR collected strings do in gotStr — otherwise
      // the two sides canonicalize asymmetrically
      val s = n.asText()
      if (s.startsWith("{") || s.startsWith("["))
        try expectedStr(mapper.readTree(s)) catch { case _: Exception => canon(s) }
      else canon(s)
    }

  /** Normalize one of OUR collected values (a string; JSON for pair/
    * multicolumn domains) the same way. */
  private def gotStr(v: Any): String = {
    val s = String.valueOf(v)
    if (s.startsWith("{") || s.startsWith("["))
      try expectedStr(mapper.readTree(s)) catch { case _: Exception => canon(s) }
    else canon(s)
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
      val types: Map[String, Option[DataType]] =
        colVals.map { case (c, vs) =>
          c -> declaredType(ds, c).orElse(columnType(vs))
        }
      val okCols = colNames.filter(types(_).isDefined)
      val schema = StructType(
        StructField("pk_index", LongType, nullable = false) +:
          okCols.map(c => StructField(c, types(c).get, nullable = true)))
      val rows = (0 until nRows).map { i =>
        Row.fromSeq(i.toLong +: okCols.map(c =>
          toValue(colVals(c).lift(i).orNull, types(c).get)))
      }
      val df = spark.createDataFrame(rows.asJava, schema)

      ds.get("tests").elements().asScala.foreach { t =>
        val in = t.get("in")
        val usedCols = Seq("column", "column_A", "column_B").flatMap(k =>
          Option(in.get(k)).map(_.asText())) ++
          Option(in.get("column_list")).toSeq.flatMap(
            _.elements().asScala.map(_.asText()))
        val mixedCol = usedCols.exists(c =>
          colNames.contains(c) && types(c).isEmpty)
        if (!sparkAllows(t) || mixedCol ||
            skipTitles.contains(t.get("title").asText())) { skipped += 1 }
        else {
          ran += 1
          val title = t.get("title").asText()
          val clue = s"$relPath :: $title"
          val suiteNode = mapper.createObjectNode()
          suiteNode.put("expectation_suite_name", "golden4")
          val e = suiteNode.putArray("expectations").addObject()
          e.put("expectation_type", tp)
          e.set("kwargs", in)
          val suite = SuiteJson.fromJson(suiteNode.toString)
          // table-shape expectations see the dataset's OWN columns — the
          // synthetic pk_index would shift counts/lists/indexes
          val shapeTypes = Set("expect_column_to_exist",
            "expect_table_column_count_to_be_between",
            "expect_table_column_count_to_equal",
            "expect_table_columns_to_match_ordered_list",
            "expect_table_columns_to_match_set")
          val target = if (shapeTypes.contains(tp)) df.drop("pk_index") else df
          val evr = new SuiteRunner(
            ResultFormatSpec(ResultFormat.Complete,
              unexpectedIndexColumnNames = Seq("pk_index")))
            .run(target, suite).results.head
          val out = t.get("out")
          if (out.has("error") || (out.has("traceback_substring"))) {
            assert(evr.exception.isDefined, s"$clue: expected an error EVR")
          } else {
            if (out.has("success"))
              assert(evr.success == out.get("success").booleanValue(),
                s"$clue: success mismatch (got ${evr.success}, " +
                  s"exception=${evr.exception})")
            if (out.has("unexpected_list")) {
              val want = out.get("unexpected_list").elements().asScala
                .map(expectedStr).toSeq.sorted
              val got = evr.result.getOrElse("unexpected_list", Nil)
                .asInstanceOf[Seq[_]].map(gotStr).sorted
              assert(got == want, s"$clue: unexpected_list (got $got, want $want)")
            }
            if (out.has("unexpected_index_list")) {
              val want = out.get("unexpected_index_list").elements().asScala
                .map(_.get("pk_index").longValue()).toSeq.sorted
              val got = evr.result.getOrElse("unexpected_index_list", Nil)
                .asInstanceOf[Seq[_]].map(s =>
                  mapper.readTree(String.valueOf(s)).get("pk_index").longValue())
                .sorted
              assert(got == want, s"$clue: unexpected pk_index (got $got, want $want)")
            }
            if (out.has("observed_value")) {
              val w = out.get("observed_value")
              val g = evr.result.get("observed_value")
              if (w.isNumber) {
                val gd = g match {
                  case Some(n: Number) => n.doubleValue()
                  case other => fail(s"$clue: observed_value not numeric: $other")
                }
                assert(math.abs(gd - w.doubleValue()) <= 1e-9 ||
                  gd == w.doubleValue(), s"$clue: observed (got $gd, want $w)")
              } else if (w.isArray) {
                val want = w.elements().asScala.map(expectedStr).toSeq.sorted
                val got = g.getOrElse(Nil).asInstanceOf[Seq[_]]
                  .map(gotStr).sorted
                assert(got == want, s"$clue: observed list (got $got, want $want)")
              }
            }
          }
        }
      }
    }
    info(s"$relPath: ran $ran cases, skipped $skipped (engine-gated/mixed-type)")
    assert(ran > 0, s"$relPath: no runnable cases")
  }

  // registration runs in the base constructor, so subclasses MUST supply
  // `files` as a def (a subclass val would still be null here)
  files.foreach { f =>
    test(s"golden: $f") {
      assume(new java.io.File(s"$base/$f").exists(),
        "reference fixture corpus not present")
      runFile(f)
    }
  }
}

/** Wave 1 of the fixture port (round 3). */
class GoldenSpec4 extends GoldenFixtureSpec {
  def files = Seq(
    "column_map_expectations/expect_column_values_to_be_null.json",
    "column_map_expectations/expect_column_values_to_not_be_null.json",
    "column_map_expectations/expect_column_values_to_be_in_set.json",
    "column_map_expectations/expect_column_values_to_not_be_in_set.json",
    "column_map_expectations/expect_column_values_to_match_regex_list.json",
    "column_map_expectations/expect_column_values_to_not_match_regex.json",
    "column_pair_map_expectations/expect_column_pair_values_to_be_equal.json",
    "multicolumn_map_expectations/expect_multicolumn_sum_to_equal.json",
    "multicolumn_map_expectations/expect_compound_columns_to_be_unique.json",
    "column_aggregate_expectations/expect_column_mean_to_be_between.json",
    "column_aggregate_expectations/expect_column_sum_to_be_between.json",
    "column_aggregate_expectations/expect_column_distinct_values_to_equal_set.json")
}
