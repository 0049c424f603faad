package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Suite profiler — the engine-scope core of the reference's
  * UserConfigurableProfiler / BasicSuiteBuilder flow (great_expectations/
  * profile/user_configurable_profiler.py): derive an expectation suite FROM
  * a batch, so "profile once, validate every later batch" works without
  * hand-writing a suite.
  *
  * Deterministic derivation rules (a bounded, scale-safe subset of the
  * reference's):
  *  - table: row_count_to_be_between(n, n);
  *  - every column: values_to_not_be_null with mostly = ⌊100·nonnull/n⌋%
  *    (integer arithmetic — exactly reproducible by any engine);
  *  - numeric columns: values_to_be_between(min, max);
  *  - string columns: value_lengths_to_be_between(min len, max len);
  *  - columns with ≤ cardinalityLimit distinct non-null values:
  *    distinct_values_to_be_in_set(sorted values);
  *  - columns where every non-null value is distinct: values_to_be_unique.
  *
  * Cost: ONE fused aggregate over the batch for all per-column stats, plus
  * one more for the low-cardinality value sets (collect_set gated on the
  * measured distinct count, so it can never explode on a high-cardinality
  * column). The profiled suite validates green against its own batch by
  * construction (ProfilerSpec asserts it).
  */
object SuiteProfiler {

  final case class ProfiledColumn(
      name: String, dataType: DataType, n: Long, nonnull: Long,
      distinct: Long, minNum: Option[Double], maxNum: Option[Double],
      minLen: Option[Int], maxLen: Option[Int], set: Option[Seq[String]]) {
    def mostlyPct: Long = if (n == 0) 100L else nonnull * 100L / n
  }

  def isNumeric(dt: DataType): Boolean = dt.isInstanceOf[NumericType]

  /** Two-job profile scan (stats, then gated value sets). */
  def profileColumns(df: DataFrame,
      cardinalityLimit: Int = 20): (Long, Seq[ProfiledColumn]) = {
    val fields = df.schema.fields.toSeq
    val aggs = count(lit(1)).as("__n") +: fields.flatMap { f =>
      val c = col(f.name)
      val base = Seq(
        count(c).as(s"__nn_${f.name}"),
        count_distinct(c).as(s"__d_${f.name}"))
      val typed = f.dataType match {
        case t if isNumeric(t) => Seq(
          min(c).cast(DoubleType).as(s"__mn_${f.name}"),
          max(c).cast(DoubleType).as(s"__mx_${f.name}"))
        case StringType => Seq(
          min(length(c)).as(s"__ln_${f.name}"),
          max(length(c)).as(s"__lx_${f.name}"))
        case _ => Nil
      }
      base ++ typed
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val n = r.getAs[Long]("__n")
    def opt[T](name: String): Option[T] = {
      val i = r.fieldIndex(name)
      if (r.isNullAt(i)) None else Some(r.getAs[T](i))
    }
    val stats = fields.map { f =>
      ProfiledColumn(f.name, f.dataType, n,
        r.getAs[Long](s"__nn_${f.name}"), r.getAs[Long](s"__d_${f.name}"),
        if (isNumeric(f.dataType)) opt[Double](s"__mn_${f.name}") else None,
        if (isNumeric(f.dataType)) opt[Double](s"__mx_${f.name}") else None,
        if (f.dataType == StringType) opt[Int](s"__ln_${f.name}") else None,
        if (f.dataType == StringType) opt[Int](s"__lx_${f.name}") else None,
        None)
    }
    // gated value sets: only the columns MEASURED low-cardinality
    val setCols = stats.filter(s =>
      s.distinct > 0 && s.distinct <= cardinalityLimit &&
        (isNumeric(s.dataType) || s.dataType == StringType))
    if (setCols.isEmpty) (n, stats)
    else {
      val setAggs = setCols.map(s =>
        collect_set(col(s.name).cast(StringType)).as(s"__s_${s.name}"))
      val sr = df.agg(setAggs.head, setAggs.tail: _*).head()
      val sets = setCols.map(s => s.name ->
        sr.getAs[scala.collection.Seq[String]](s"__s_${s.name}").sorted.toSeq)
        .toMap
      (n, stats.map(s => s.copy(set = sets.get(s.name))))
    }
  }

  /** Profile a batch into a runnable Suite. */
  def profile(df: DataFrame, suiteName: String = "profiled",
      cardinalityLimit: Int = 20): Suite = {
    val (n, cols) = profileColumns(df, cardinalityLimit)
    val table: Seq[Expectation] =
      Seq(ExpectTableRowCountToBeBetween(Some(n), Some(n)))
    val perCol = cols.flatMap { s =>
      val notNull: Seq[Expectation] =
        Seq(ExpectColumnValuesToNotBeNull(s.name,
          mostly = s.mostlyPct / 100.0))
      val between: Seq[Expectation] =
        (s.minNum, s.maxNum) match {
          case (Some(lo), Some(hi)) =>
            Seq(ExpectColumnValuesToBeBetween(s.name, Some(lo), Some(hi)))
          case _ => Nil
        }
      val lengths: Seq[Expectation] =
        (s.minLen, s.maxLen) match {
          case (Some(lo), Some(hi)) =>
            Seq(ExpectColumnValueLengthsToBeBetween(s.name, Some(lo), Some(hi)))
          case _ => Nil
        }
      val inSet: Seq[Expectation] = s.set.toSeq.map(vs =>
        ExpectColumnDistinctValuesToBeInSet(s.name, vs))
      val unique: Seq[Expectation] =
        if (s.nonnull > 0 && s.distinct == s.nonnull)
          Seq(ExpectColumnValuesToBeUnique(s.name))
        else Nil
      notNull ++ between ++ lengths ++ inSet ++ unique
    }
    Suite(suiteName, table ++ perCol)
  }

  /** The profile as an oracle-friendly row set: one row per derived
    * expectation with numeric params in typed columns and value sets as a
    * sorted CSV — the shape the driver's DuckDB oracle reproduces from the
    * same table. */
  def profileRows(df: DataFrame, cardinalityLimit: Int = 20): DataFrame = {
    val spark = df.sparkSession
    val (n, cols) = profileColumns(df, cardinalityLimit)
    val rows = scala.collection.mutable.ArrayBuffer.empty[
      (String, String, Option[Double], Option[Double], Option[String])]
    rows += (((null: String), "expect_table_row_count_to_be_between",
      Some(n.toDouble), Some(n.toDouble), None))
    cols.foreach { s =>
      rows += ((s.name, "expect_column_values_to_not_be_null",
        Some(s.mostlyPct.toDouble), None, None))
      (s.minNum, s.maxNum) match {
        case (Some(lo), Some(hi)) =>
          rows += ((s.name, "expect_column_values_to_be_between",
            Some(lo), Some(hi), None))
        case _ =>
      }
      (s.minLen, s.maxLen) match {
        case (Some(lo), Some(hi)) =>
          rows += ((s.name, "expect_column_value_lengths_to_be_between",
            Some(lo.toDouble), Some(hi.toDouble), None))
        case _ =>
      }
      s.set.foreach(vs =>
        rows += ((s.name, "expect_column_distinct_values_to_be_in_set",
          None, None, Some(vs.mkString(",")))))
      if (s.nonnull > 0 && s.distinct == s.nonnull)
        rows += ((s.name, "expect_column_values_to_be_unique",
          None, None, None))
    }
    import spark.implicits._
    rows.toSeq.toDF("column", "expectation_type", "p1", "p2", "set_csv")
  }
}

/** Text-column profiler: derive quality-filter gates FROM an observed
  * corpus, the way SuiteProfiler derives a generic suite from a batch.
  * One map-side repetition_stats pass annotates each document; the
  * derived parameters are chosen to be bit-reproducible:
  *  - token-count bounds at the QUARTILES via exact percentile (binary
  *    fractions over integer counts → exact interpolation, identical to
  *    DuckDB quantile_cont);
  *  - repetition ceilings as the observed MAXIMA of top_word_frac /
  *    dup_2gram_frac (each per-row value is one IEEE division of exact
  *    ints, and max is a selection, not a sum — order-independent).
  * `textSuite` turns the profile into a runnable Suite over the annotated
  * frame; ProfilerSpec asserts it validates green on its own batch. */
object TextProfiler {

  /** One codegen'd pass: n_words, n_distinct, top_count, top_word_frac,
    * dup_2gram_frac columns (normalized-text semantics; fractions null
    * for empty / sub-2-word text). The single home of this derivation —
    * q74 and the gates both select from it. */
  def annotate(df: DataFrame, textCol: String): DataFrame = {
    import graft.functions.{RepetitionStats, TextFunctions}
    df.withColumn("__rep",
        RepetitionStats.repetition_stats(TextFunctions.normText(col(textCol))))
      .withColumn("n_words", col("__rep.n_words"))
      .withColumn("n_distinct", col("__rep.n_distinct"))
      .withColumn("top_count", col("__rep.top_count"))
      .withColumn("top_word_frac",
        // empty/null text → 0 words → NULL fraction (ANSI would throw)
        when(col("__rep.n_words") === 0, lit(null).cast(DoubleType))
          .otherwise(
            col("__rep.top_count").cast(DoubleType) / col("__rep.n_words")))
      .withColumn("dup_2gram_frac",
        when(col("__rep.n_2grams") === 0, lit(null).cast(DoubleType))
          .otherwise(lit(1.0) -
            col("__rep.n_distinct_2grams").cast(DoubleType) / col("__rep.n_2grams")))
      .drop("__rep")
  }

  /** The derived gates as oracle-friendly rows (metric, p1, p2). */
  def profileText(df: DataFrame, textCol: String): DataFrame = {
    val spark = df.sparkSession
    val a = annotate(df, textCol)
    val r = a.agg(
      percentile(col("n_words").cast(DoubleType),
        typedLit(Seq(0.25, 0.75))).as("q"),
      max(col("top_word_frac")).as("twf"),
      max(col("dup_2gram_frac")).as("dgf")).head()
    // empty corpus → null quartiles; degenerate corpora (all docs < 2
    // words) → null maxima. Preserve the nulls instead of unboxing to 0.0
    val q = Option(r.getAs[scala.collection.Seq[Double]]("q"))
    def optD(name: String): Option[Double] =
      Option(r.getAs[java.lang.Double](name)).map(_.doubleValue())
    import spark.implicits._
    Seq(
      ("token_count_iqr", q.map(_(0)), q.map(_(1))),
      ("top_word_frac_max", optD("twf"), Option.empty[Double]),
      ("dup_2gram_frac_max", optD("dgf"), Option.empty[Double]))
      .toDF("metric", "p1", "p2")
  }

  /** Runnable suite over `annotate(df, textCol)`: mostly-gated token-count
    * IQR band plus hard repetition ceilings at the observed maxima. */
  def textSuite(df: DataFrame, textCol: String,
      suiteName: String = "text_profile"): Suite = {
    val rows = profileText(df, textCol).collect()
      .map(r => r.getString(0) -> r).toMap
    require(rows.values.forall(r => !r.isNullAt(1)),
      "corpus too small or degenerate to derive text-quality gates " +
        "(empty corpus or no document with 2+ words)")
    val iqr = rows("token_count_iqr")
    Suite(suiteName, Seq(
      // ~half the mass sits inside the closed IQR by construction; 0.45
      // leaves slack for discrete data where interpolation can place the
      // quartiles between integer values and shave boundary rows
      ExpectColumnValuesToBeBetween("n_words",
        Some(iqr.getDouble(1)), Some(iqr.getDouble(2)), mostly = 0.45),
      ExpectColumnValuesToBeBetween("top_word_frac",
        None, Some(rows("top_word_frac_max").getDouble(1))),
      ExpectColumnValuesToBeBetween("dup_2gram_frac",
        None, Some(rows("dup_2gram_frac_max").getDouble(1)))))
  }
}
