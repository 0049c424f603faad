package graft.sources

import java.sql.Timestamp
import java.time.LocalDateTime

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch partitioners (SURVEY.md §2.2, sparkdf_data_partitioner.py).
  *
  * Semantics match the reference, but the datetime partitioners emit RANGE
  * predicates instead of `year(ts) = y AND month(ts) = m`: a function-
  * wrapped column defeats parquet row-group pruning (`.explain` shows
  * PushedFilters: [IsNotNull(ts)] only), while `ts >= lo AND ts < hi` pushes
  * to the scan and prunes row groups / partitions — the difference between
  * reading one month and reading 100 TB.
  */
object Partitioners {

  def wholeTable(df: DataFrame): DataFrame = df

  // lit(LocalDateTime) creates the TIMESTAMP_NTZ literal directly — going
  // through java.sql.Timestamp.valueOf would interpret the wall-clock in
  // the driver JVM's default timezone and shift batch boundaries whenever
  // it differs from spark.sql.session.timeZone
  private def ts(d: LocalDateTime): Column = lit(d)

  def onYear(df: DataFrame, column: String, year: Int): DataFrame = {
    val lo = LocalDateTime.of(year, 1, 1, 0, 0)
    df.filter(col(column) >= ts(lo) && col(column) < ts(lo.plusYears(1)))
  }

  def onYearMonth(df: DataFrame, column: String, year: Int, month: Int): DataFrame = {
    val lo = LocalDateTime.of(year, month, 1, 0, 0)
    df.filter(col(column) >= ts(lo) && col(column) < ts(lo.plusMonths(1)))
  }

  def onYearMonthDay(df: DataFrame, column: String, year: Int, month: Int,
      day: Int): DataFrame = {
    val lo = LocalDateTime.of(year, month, day, 0, 0)
    df.filter(col(column) >= ts(lo) && col(column) < ts(lo.plusDays(1)))
  }

  def onColumnValue(df: DataFrame, column: String, value: Any): DataFrame =
    df.filter(col(column) === lit(value))

  def onConvertedDatetime(df: DataFrame, column: String, fmt: String,
      value: String): DataFrame =
    df.filter(date_format(col(column), fmt) === value)

  def onDividedInteger(df: DataFrame, column: String, divisor: Int,
      value: Int): DataFrame =
    df.filter(floor(col(column) / divisor) === value)

  def onModInteger(df: DataFrame, column: String, mod: Int, value: Int): DataFrame =
    df.filter(col(column) % mod === value)

  def onMultiColumnValues(df: DataFrame, values: Map[String, Any]): DataFrame =
    values.foldLeft(df) { case (d, (c, v)) => d.filter(col(c) === lit(v)) }

  /** md5-bucket partitioner (sparkdf_data_partitioner.py:272-290). */
  def onHashedColumn(df: DataFrame, column: String, buckets: Int,
      bucket: Int): DataFrame =
    df.filter(conv(substring(md5(col(column).cast(StringType)), 1, 2), 16, 10)
      .cast(LongType) % buckets === bucket)

  // --- samplers (§2.3, sparkdf_data_sampler.py) -------------------------------

  def sampleLimit(df: DataFrame, n: Int): DataFrame = df.limit(n)

  def sampleRandom(df: DataFrame, p: Double, seed: Long): DataFrame =
    df.withColumn("__rand", rand(seed)).filter(col("__rand") < p).drop("__rand")

  /** Deterministic, engine-independent variant of sample_using_random:
    * keeps a row iff the first 8 md5 hex digits of "key:seed", read as a
    * fraction of 2³², fall below p. rand(seed) streams are engine- AND
    * partitioning-specific; this one is reproducible anywhere (same
    * md5 in Spark, DuckDB, and the JVM) and stable under repartitioning —
    * the property that matters for resumable sampling at scale. */
  def sampleRandomDeterministic(df: DataFrame, column: String, p: Double,
      seed: Long = 0L): DataFrame = {
    val threshold = (p * 4294967296.0).toLong
    df.filter(
      conv(substring(md5(concat(col(column).cast(StringType), lit(s":$seed"))), 1, 8),
        16, 10).cast(LongType) < lit(threshold))
  }

  /** Per-group weighted sampling for corpus mixing (the "data mixture"
    * step of training-data pipelines: sample each source at its own
    * rate). A row is kept iff the deterministic md5 fraction of
    * "key:seed" (same construction as sampleRandomDeterministic) falls
    * below its group's rate; groups absent from `rates` use
    * `defaultRate`. Rates are converted to integer thresholds ONCE here,
    * so oracles can inject the same literals and the comparison is exact
    * long arithmetic on both engines. Deterministic, partitioning-stable,
    * and resumable — the rate table is a tiny literal CASE chain (no join
    * at all), so the filter is map-side and codegen'd. */
  def sampleWeighted(df: DataFrame, keyCol: String, groupCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0,
      seed: Long = 0L): DataFrame = {
    val tcol = rates.toSeq.sortBy(_._1).foldLeft(lit(rateThreshold(defaultRate))) {
      case (acc, (g, r)) =>
        when(col(groupCol) === g, lit(rateThreshold(r))).otherwise(acc)
    }
    df.filter(
      conv(substring(md5(concat(col(keyCol).cast(StringType), lit(s":$seed"))), 1, 8),
        16, 10).cast(LongType) < tcol)
  }

  /** Keep threshold on the first 8 md5 hex digits for rate p (shared by
    * sampleWeighted and its oracles). */
  def rateThreshold(p: Double): Long = (p * 4294967296.0).toLong

  /** Temperature-flattened mixing at alpha = 1/2: each group's keep rate
    * is sqrt(n_g / n_max), i.e. keep probability ∝ n^(alpha-1) — the
    * standard multilingual temperature-sampling rebalance that
    * up-weights small sources without discarding most of the big ones.
    * Rates are DERIVED FROM THE DATA inside the plan (group counts →
    * broadcast rate table → map-side filter; no driver collect), and
    * alpha is fixed at 1/2 because sqrt is IEEE exactly-rounded — the
    * whole path stays bit-reproducible where a general pow() is not. */
  def sampleTemperatureHalf(df: DataFrame, keyCol: String, groupCol: String,
      seed: Long = 0L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ONE aggregation: n_max comes from a global window over the
    // already-tiny counts frame (one row per group), not a second scan of
    // the input. A null group counts and samples like any other group
    // (null-safe join below), mirroring keepFirst's null semantics.
    val rates = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__nmax", max(col("__n")).over(Window.partitionBy()))
      .select(col(groupCol).as("__g"),
        sqrt(col("__n").cast(DoubleType) / col("__nmax").cast(DoubleType))
          .as("__rate"))
    df.join(broadcast(rates), col(groupCol) <=> col("__g"))
      .filter(
        conv(substring(md5(concat(col(keyCol).cast(StringType), lit(s":$seed"))), 1, 8),
          16, 10).cast(LongType).cast(DoubleType) < col("__rate") * lit(4294967296.0))
      .drop("__g", "__rate")
  }

  def sampleMod(df: DataFrame, column: String, mod: Int, value: Int): DataFrame =
    df.filter(col(column) % mod === value)

  def sampleList(df: DataFrame, column: String, values: Seq[Any]): DataFrame =
    df.filter(col(column).isin(values: _*))

  def sampleHash(df: DataFrame, column: String, digits: Int,
      value: String): DataFrame =
    df.filter(substring(md5(col(column).cast(StringType)), 33 - digits, digits)
      === value)
}
