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
  // ±Infinity literals appear bare in distributional fixtures
  private val mapper = new ObjectMapper().configure(
    com.fasterxml.jackson.core.JsonParser.Feature.ALLOW_NON_NUMERIC_NUMBERS,
    true)

  /** Fixture files (relative to tests/test_definitions) to run. */
  def files: Seq[String]

  /** Test titles to skip with a documented rationale. */
  def skipTitles: Set[String] = Set.empty

  /** Per-file extra dialect gates to accept beyond "spark". The like_pattern
    * corpus gates every test to SQL dialects (the reference's spark engine
    * lacks like_pattern; ours implements ANSI LIKE = Spark `like`), so the
    * ANSI-dialect variants are the semantics to match. */
  def extraDialects: Map[String, Set[String]] = Map.empty

  /** np.allclose with the reference harness's tolerances
    * (self_check/util.py:407-408 RTOL/ATOL). */
  private def allclose(a: Double, b: Double,
      rtol: Double = 1.0e-7, atol: Double = 5.0e-2): Boolean =
    a == b || math.abs(a - b) <= atol + rtol * math.abs(b)

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

  /** The corpus declares per-engine types (`schemas.spark`); honor them —
    * the reference's spark harness loads each column with exactly this
    * schema, and of_type/float-precision semantics depend on it. */
  private def declaredType(ds: JsonNode, c: String): Option[DataType] =
    for {
      schemas <- Option(ds.get("schemas"))
      sp <- Option(schemas.get("spark"))
      t <- Option(sp.get(c)).map(_.asText())
      dt <- t match {
        case "TimestampType" => Some(TimestampType)
        case "DateType" => Some(DateType)
        case "IntegerType" => Some(IntegerType)
        case "LongType" => Some(LongType)
        case "FloatType" => Some(FloatType)
        case "DoubleType" => Some(DoubleType)
        case "StringType" => Some(StringType)
        case "BooleanType" => Some(BooleanType)
        case _ => None
      }
    } yield dt

  private def toValue(n: JsonNode, dt: DataType): Any =
    if (n == null || n.isNull) null
    else dt match {
      case BooleanType => n.booleanValue()
      case IntegerType =>
        // defensive: a declared-type column may carry corpus values meant
        // for other engines; unconvertible → null (never used by
        // spark-gated tests)
        if (n.isNumber) n.intValue()
        else try n.asText().toInt catch { case _: Exception => null }
      case LongType =>
        if (n.isNumber) n.longValue()
        else try n.asText().toLong catch { case _: Exception => null }
      case FloatType =>
        if (n.isNumber) n.floatValue()
        else try n.asText().toFloat catch { case _: Exception => null }
      case DoubleType =>
        if (n.isNumber) n.doubleValue()
        else try n.asText().toDouble catch { case _: Exception => null }
      case TimestampType =>
        val raw = n.asText()
        val s = raw.replace("T", " ")
        try java.sql.Timestamp.valueOf(if (s.length == 10) s + " 00:00:00" else s)
        catch {
          case _: IllegalArgumentException =>
            // the corpus also carries offset stamps (…T12:34:56Z / +09:00)
            // and legacy US-style stamps (Jan 01 1970 12:00:01)
            try java.sql.Timestamp.from(
              java.time.OffsetDateTime.parse(raw).toInstant)
            catch {
              case _: java.time.format.DateTimeParseException =>
                try java.sql.Timestamp.valueOf(
                  java.time.LocalDateTime.parse(raw,
                    java.time.format.DateTimeFormatter.ofPattern(
                      "MMM dd yyyy HH:mm:ss", java.util.Locale.ROOT)))
                catch { case _: java.time.format.DateTimeParseException => null }
            }
        }
      case DateType => java.sql.Date.valueOf(n.asText().take(10))
      case StringType => n.asText()
      case _ => n.asText()
    }

  private def sparkAllows(t: JsonNode, extra: Set[String]): Boolean = {
    val sup = Option(t.get("suppress_test_for")).toSeq
      .flatMap(_.elements().asScala).map(_.asText())
    val only = Option(t.get("only_for")).map(_.elements().asScala
      .map(_.asText()).toSeq)
    !sup.contains("spark") &&
      only.forall(o => o.contains("spark") || o.exists(extra.contains))
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

  /** One dataset's columns → DataFrame with a synthetic pk_index. */
  private def buildDf(ds: JsonNode, data: JsonNode)
      : (org.apache.spark.sql.DataFrame, Seq[String], Map[String, Option[DataType]]) = {
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
    (spark.createDataFrame(rows.asJava, schema), colNames, types)
  }

  /** Compare one observed/expected partition object against the engine's
    * details entry (bins/weights/tail_weights via np.allclose, values as
    * normalized strings — self_check/util.py:2244-2280). */
  private def assertPartition(clue: String, want: JsonNode, got: Any): Unit = {
    val g = got.asInstanceOf[Map[String, Any]]
    def nums(k: String): Seq[Double] = g.get(k).map(
      _.asInstanceOf[Seq[_]].map(_.asInstanceOf[Number].doubleValue()))
      .getOrElse(Nil)
    for (k <- Seq("bins", "weights", "tail_weights") if want.has(k)) {
      val w = want.get(k).elements().asScala.map(_.doubleValue()).toSeq
      val gg = nums(k)
      assert(gg.size == w.size && gg.zip(w).forall { case (a, b) =>
        allclose(a, b, atol = 1e-9) },
        s"$clue: partition $k (got $gg, want $w)")
    }
    if (want.has("values")) {
      val w = want.get("values").elements().asScala.map(expectedStr).toSeq
      val gg = g.getOrElse("values", Nil).asInstanceOf[Seq[_]].map(gotStr)
      assert(gg == w, s"$clue: partition values (got $gg, want $w)")
    }
  }

  private def runFile(relPath: String): Unit = {
    val json = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$base/$relPath"))
    val root = mapper.readTree(json)
    val tp = root.get("expectation_type").asText()
    val extra = extraDialects.getOrElse(relPath, Set.empty)
    var ran = 0
    var skipped = 0
    root.get("datasets").elements().asScala.foreach { ds =>
      val data = ds.get("data")
      // multi_table files: `data` is a LIST of named tables; the first is
      // the validated batch, the rest resolve by dataset_name
      val (df, colNames, types, otherTables) =
        if (data.isArray) {
          val named = data.elements().asScala.toSeq.map { d =>
            val (tdf, _, _) = buildDf(ds, d.get("data"))
            d.get("dataset_name").asText() -> tdf
          }
          (named.head._2, Seq.empty[String],
            Map.empty[String, Option[DataType]], named.toMap)
        } else {
          val (tdf, cn, ty) = buildDf(ds, data)
          (tdf, cn, ty, Map.empty[String, org.apache.spark.sql.DataFrame])
        }

      ds.get("tests").elements().asScala.foreach { t =>
        val in = t.get("in")
        val usedCols = Seq("column", "column_A", "column_B").flatMap(k =>
          Option(in.get(k)).map(_.asText())) ++
          Option(in.get("column_list")).toSeq.flatMap(
            _.elements().asScala.map(_.asText()))
        val mixedCol = usedCols.exists(c =>
          colNames.contains(c) && types(c).isEmpty)
        if (!sparkAllows(t, extra) || mixedCol ||
            skipTitles.contains(t.get("title").asText())) { skipped += 1 }
        else {
          ran += 1
          val title = t.get("title").asText()
          val clue = s"$relPath :: $title"
          val suite =
            if (otherTables.nonEmpty) {
              val otherName = in.get("other_table_name").asText()
              Suite("golden4", Seq(ExpectTableRowCountToEqualOtherTable(
                otherTables(otherName).drop("pk_index"), otherName)))
            } else {
              val suiteNode = mapper.createObjectNode()
              suiteNode.put("expectation_suite_name", "golden4")
              val e = suiteNode.putArray("expectations").addObject()
              e.put("expectation_type", tp)
              e.set("kwargs", in)
              SuiteJson.fromJson(suiteNode.toString)
            }
          // table-shape expectations see the dataset's OWN columns — the
          // synthetic pk_index would shift counts/lists/indexes
          val shapeTypes = Set("expect_column_to_exist",
            "expect_table_column_count_to_be_between",
            "expect_table_column_count_to_equal",
            "expect_table_columns_to_match_ordered_list",
            "expect_table_columns_to_match_set",
            "expect_table_row_count_to_equal_other_table")
          val target = if (shapeTypes.contains(tp)) df.drop("pk_index") else df
          val evr = new SuiteRunner(
            ResultFormatSpec(ResultFormat.Complete,
              unexpectedIndexColumnNames = Seq("pk_index")))
            .run(target, suite).results.head
          val out = t.get("out")

          def checkObserved(w: JsonNode, g: Option[Any]): Unit = {
            if (w.isNull) {
              assert(g.forall(_ == null),
                s"$clue: observed_value should be null (got $g)")
            } else if (w.isNumber) {
              val gd = g match {
                case Some(n: Number) => n.doubleValue()
                case other => fail(s"$clue: observed_value not numeric: $other")
              }
              assert(allclose(gd, w.doubleValue()),
                s"$clue: observed (got $gd, want $w)")
            } else if (w.isTextual) {
              // temporal observed values serialize ISO-T in the reference;
              // normalize java.sql temporals the same way before comparing
              val gs = g.map {
                case t: java.sql.Timestamp => t.toLocalDateTime.toString
                case d: java.sql.Date => d.toLocalDate.toString
                case other => String.valueOf(other)
              }
              assert(gs.contains(w.asText()),
                s"$clue: observed (got $g, want ${w.asText()})")
            } else if (w.isObject) {
              // dict observed: quantile {quantiles, values} via allclose on
              // values; row-count {self, other} as exact numbers
              // (self_check/util.py:2140-2165)
              val gm = g.getOrElse(Map.empty).asInstanceOf[Map[String, Any]]
              w.fieldNames().asScala.foreach { k =>
                val wv = w.get(k)
                if (wv.isArray && wv.elements().asScala.forall(_.isNumber)) {
                  val want = wv.elements().asScala.map(_.doubleValue()).toSeq
                  val got = gm.getOrElse(k, Nil).asInstanceOf[Seq[_]]
                    .map(_.asInstanceOf[Number].doubleValue())
                  assert(got.size == want.size && got.zip(want)
                    .forall { case (a, b) => allclose(a, b) },
                    s"$clue: observed.$k (got $got, want $want)")
                } else if (wv.isNumber) {
                  val got = gm.get(k).map(_.asInstanceOf[Number].doubleValue())
                  assert(got.exists(allclose(_, wv.doubleValue())),
                    s"$clue: observed.$k (got $got, want $wv)")
                } else {
                  assert(gm.get(k).map(gotStr).contains(expectedStr(wv)),
                    s"$clue: observed.$k (got ${gm.get(k)}, want $wv)")
                }
              }
            } else if (w.isArray) {
              val want = w.elements().asScala.map(expectedStr).toSeq.sorted
              val got = g.getOrElse(Nil).asInstanceOf[Seq[_]]
                .map(gotStr).sorted
              assert(got == want, s"$clue: observed list (got $got, want $want)")
            }
          }

          if (out.has("error") || out.has("traceback_substring")) {
            assert(evr.exception.isDefined,
              s"$clue: expected an error EVR (got success=${evr.success})")
            Option(out.get("traceback_substring")).foreach { s =>
              val sub = s.asText()
              // Python exception CLASS names have no Scala analogue — any
              // captured engine error satisfies them; message substrings
              // must match our exception text
              if (sub != "ValueError" && sub != "TypeError")
                assert(evr.exception.get.contains(sub),
                  s"$clue: exception '${evr.exception.get}' lacks '$sub'")
            }
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
            if (out.has("observed_value"))
              checkObserved(out.get("observed_value"),
                evr.result.get("observed_value"))
            // of_type's multi-valid-answer key: observed must be IN the list
            if (out.has("observed_value_list")) {
              val want = out.get("observed_value_list").elements().asScala
                .map(expectedStr).toSet
              val got = evr.result.get("observed_value").map(gotStr)
              assert(got.exists(want.contains),
                s"$clue: observed_value $got not in $want")
            }
            lazy val details = evr.result.getOrElse("details", Map.empty)
              .asInstanceOf[Map[String, Any]]
            for (k <- Seq("expected_partition", "observed_partition")
                 if out.has(k)) {
              assert(details.contains(k), s"$clue: no $k in details")
              assertPartition(s"$clue :: $k", out.get(k), details(k))
            }
            if (out.has("details")) {
              val wd = out.get("details")
              for (k <- Seq("expected_partition", "observed_partition")
                   if wd.has(k)) {
                assert(details.contains(k), s"$clue: no $k in details")
                assertPartition(s"$clue :: details.$k", wd.get(k), details(k))
              }
            }
            // nested `result` (COMPLETE-format fixtures): check the keys
            // present — observed through the shared handler, counts numeric
            if (out.has("result")) {
              val wr = out.get("result")
              wr.fieldNames().asScala.foreach { k =>
                val wv = wr.get(k)
                if (k == "observed_value")
                  checkObserved(wv, evr.result.get("observed_value"))
                else if (wv.isNumber) {
                  val got = evr.result.get(k).map(
                    _.asInstanceOf[Number].doubleValue())
                  assert(got.exists(allclose(_, wv.doubleValue())),
                    s"$clue: result.$k (got $got, want $wv)")
                }
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
