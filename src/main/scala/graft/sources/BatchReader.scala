package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import org.apache.spark.storage.StorageLevel

import graft.core.{Json, SuiteResult}

/** Batch acquisition layer (SURVEY.md §2.1).
  *
  * Mirrors the reference's path-batch reader: format inferred from the file
  * suffix unless given explicitly (sparkdf_execution_engine.py:415-536
  * reader_method guess), optional explicit schema, reader options passed
  * through, and `.persist()` on load by default
  * (sparkdf_execution_engine.py:409-411). Cloud paths (s3a://, gs://,
  * wasbs://) ride the same readers via Hadoop FS configs — nothing
  * format-specific here.
  */
object BatchReader {

  /** reader_method guess from path suffix. */
  def inferFormat(path: String): String = {
    val p = path.toLowerCase(java.util.Locale.ROOT)
    if (p.endsWith(".csv")) "csv"
    else if (p.endsWith(".tsv")) "tsv"
    else if (p.endsWith(".parquet") || p.endsWith(".parq") || p.endsWith(".pqt")) "parquet"
    else if (p.endsWith(".json") || p.endsWith(".jsonl")) "json"
    else if (p.endsWith(".orc")) "orc"
    else if (p.endsWith(".txt") || p.endsWith(".text")) "text"
    else if (p.endsWith(".delta")) "delta"
    else throw new IllegalArgumentException(s"cannot infer reader method for $path")
  }

  def read(spark: SparkSession, path: String,
      format: Option[String] = None,
      schema: Option[StructType] = None,
      options: Map[String, String] = Map.empty,
      persist: Boolean = true): DataFrame = {
    val fmt = format.getOrElse(inferFormat(path))
    var reader = spark.read
    schema.foreach(s => reader = reader.schema(s))
    val (resolvedFmt, extraOpts) = fmt match {
      case "csv" => ("csv", Map("header" -> "true", "inferSchema" ->
        (if (schema.isEmpty) "true" else "false")))
      case "tsv" => ("csv", Map("header" -> "true", "sep" -> "\t",
        "inferSchema" -> (if (schema.isEmpty) "true" else "false")))
      case other => (other, Map.empty[String, String])
    }
    val df = reader.options(extraOpts ++ options).format(resolvedFmt).load(path)
    if (persist) df.persist(StorageLevel.MEMORY_AND_DISK) else df
  }

  /** GE-shaped JSON document for one suite result (the payload every
    * results store writes — filesystem, in-memory, JDBC). */
  def suiteResultJson(sr: SuiteResult): String = {
    val evrs = sr.results.map { e =>
      Map(
        "expectation_config" -> Map(
          "type" -> e.expectationType,
          "kwargs" -> e.kwargs),
        "success" -> e.success,
        "result" -> e.result,
        "exception_info" -> e.exception.map(x =>
          Map("raised_exception" -> true, "exception_message" -> x))
          .getOrElse(Map("raised_exception" -> false)))
    }
    val doc = Map(
      "suite_name" -> sr.suiteName,
      "success" -> sr.success,
      "statistics" -> Map(
        "evaluated_expectations" -> sr.statistics.evaluatedExpectations,
        "successful_expectations" -> sr.statistics.successfulExpectations,
        "unsuccessful_expectations" -> sr.statistics.unsuccessfulExpectations,
        "success_percent" -> sr.statistics.successPercent
          .map(x => x: Any).getOrElse(null)),
      "results" -> evrs)
    Json.write(doc)
  }

  /** Results sink: suite result as a GE-shaped JSON document
    * (checkpoint actions analogue — validation_results_store). */
  def writeSuiteResultJson(sr: SuiteResult, outPath: String): Unit = {
    val p = Paths.get(outPath)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.writeString(p, suiteResultJson(sr),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }
}
