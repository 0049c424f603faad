package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Named batch definitions (core/batch_definition.py:36-66 and the fluent
  * Spark datasource's add_batch_definition_{whole_dataframe,yearly,monthly,
  * daily}, datasource/fluent/spark_datasource.py:174-329): a reusable
  * binding of a datetime column + granularity that turns "validate the
  * latest daily batch" from caller code into engine code.
  *
  * `batch` slices with the RANGE predicates from Partitioners (pushes to
  * the parquet scan; a `year(ts)=y` formulation would defeat row-group
  * pruning). `latestParameters` is one tiny aggregate (max of the
  * datetime column) — no full-table distinct. */
final case class BatchDefinition(
    name: String,
    granularity: BatchDefinition.Granularity,
    datetimeColumn: String = "ts",
    sortAscending: Boolean = true) {
  import BatchDefinition._

  /** The batch slice for explicit parameters (year / +month / +day). */
  def batch(df: DataFrame, params: Map[String, Int]): DataFrame =
    granularity match {
      case Whole => df
      case Yearly => Partitioners.onYear(df, datetimeColumn, params("year"))
      case Monthly =>
        Partitioners.onYearMonth(df, datetimeColumn, params("year"), params("month"))
      case Daily =>
        Partitioners.onYearMonthDay(df, datetimeColumn, params("year"),
          params("month"), params("day"))
    }

  /** Parameters of the newest (sortAscending) or oldest batch: ONE max/min
    * aggregate, no distinct over the table. */
  def latestParameters(df: DataFrame): Map[String, Int] = {
    if (granularity == Whole) return Map.empty
    val agg = if (sortAscending) max(col(datetimeColumn)) else min(col(datetimeColumn))
    val r = df.agg(agg.cast("timestamp_ntz").as("t")).head()
    require(!r.isNullAt(0), s"no non-null $datetimeColumn values")
    val t = r.getAs[java.time.LocalDateTime]("t")
    granularity match {
      case Yearly => Map("year" -> t.getYear)
      case Monthly => Map("year" -> t.getYear, "month" -> t.getMonthValue)
      case Daily => Map("year" -> t.getYear, "month" -> t.getMonthValue,
        "day" -> t.getDayOfMonth)
      case Whole => Map.empty
    }
  }

  /** The default batch when no parameters are given — the reference
    * returns the LAST batch in sort order (batch_definition.py:66). */
  def latestBatch(df: DataFrame): DataFrame =
    if (granularity == Whole) df else batch(df, latestParameters(df))

  /** All batch parameter combinations present in the data, in sort order —
    * one distinct over the truncated datetime (shuffles only the distinct
    * keys). The collect is metadata-scale for any real datetime column
    * (years × months × days), but a caller pointing this at a
    * wild-cardinality column would otherwise OOM the driver — the
    * [[BatchDefinition.MaxBatchIdentifiers]] cap turns that into a loud
    * error instead (only cap+1 rows are ever fetched). */
  def batchIdentifiers(df: DataFrame,
      cap: Int = BatchDefinition.MaxBatchIdentifiers): Seq[Map[String, Int]] = {
    val parts: Seq[(String, org.apache.spark.sql.Column)] = granularity match {
      case Whole => return Seq(Map.empty)
      case Yearly => Seq("year" -> year(col(datetimeColumn)))
      case Monthly => Seq("year" -> year(col(datetimeColumn)),
        "month" -> month(col(datetimeColumn)))
      case Daily => Seq("year" -> year(col(datetimeColumn)),
        "month" -> month(col(datetimeColumn)),
        "day" -> dayofmonth(col(datetimeColumn)))
    }
    val cols = parts.map { case (n, c) => c.as(n) }
    val sortCols = parts.map { case (n, _) =>
      if (sortAscending) col(n).asc else col(n).desc
    }
    val rows = df.filter(col(datetimeColumn).isNotNull)
      .select(cols: _*).distinct().orderBy(sortCols: _*)
      .limit(cap + 1) // TakeOrdered: the driver never sees more than cap+1
      .collect()
    require(rows.length <= cap,
      s"batchIdentifiers($name): more than $cap distinct " +
        s"$granularity batches in column '$datetimeColumn' — this is not a " +
        "datetime-partitioned layout; slice explicitly instead")
    rows.map(r => parts.map { case (n, _) => n -> r.getAs[Int](n) }.toMap)
      .toSeq
  }
}

object BatchDefinition {
  /** Driver-safety cap for [[BatchDefinition.batchIdentifiers]]: ~275
    * years of daily batches. Generous for any datetime layout, tiny for
    * the driver. */
  val MaxBatchIdentifiers: Int = 100000

  sealed trait Granularity
  case object Whole extends Granularity
  case object Yearly extends Granularity
  case object Monthly extends Granularity
  case object Daily extends Granularity

  def wholeDataframe(name: String): BatchDefinition =
    BatchDefinition(name, Whole)
  def yearly(name: String, column: String, sortAscending: Boolean = true): BatchDefinition =
    BatchDefinition(name, Yearly, column, sortAscending)
  def monthly(name: String, column: String, sortAscending: Boolean = true): BatchDefinition =
    BatchDefinition(name, Monthly, column, sortAscending)
  def daily(name: String, column: String, sortAscending: Boolean = true): BatchDefinition =
    BatchDefinition(name, Daily, column, sortAscending)
}
