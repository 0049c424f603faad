package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed two-sided Kolmogorov–Smirnov sup-distance.
  *
  * The statistic needs the empirical CDF evaluated at every distinct value
  * in sorted order — naively a collect-and-sort (the reference's pandas
  * path, column_parameterized_distribution_ks_test_p_value.py:42) or a
  * single-partition window. Neither survives 100 TB, so this computes a
  * distributed prefix-sum ECDF instead:
  *
  *  1. distinct-value counts (one shuffle, carries only distinct values),
  *  2. range-partition + sort by value,
  *  3. per-partition totals — ONE tiny collect (a row per partition),
  *  4. broadcast prefix offsets; a final mapPartitions pass walks each
  *     sorted partition once with its global offset, emitting a single
  *     per-partition max of  max(C_i/n − F(v_i), F(v_i) − C_{i−1}/n).
  *
  * The driver never sees values, only P partial sums and P partial maxima.
  */
object KsDistance {

  /** @return (supDistance, nonNullCount); (0, 0) when the column is empty. */
  def supDistance(df: DataFrame, column: String,
      cdf: Double => Double): (Double, Long) = {
    val spark = df.sparkSession
    import spark.implicits._

    val counts = df.select(col(column).cast("double").as("v"))
      .filter($"v".isNotNull && !isnan($"v"))
      .groupBy($"v").agg(count(lit(1)).as("c"))
      .as[(Double, Long)]

    val nParts = math.max(1, spark.sessionState.conf.numShufflePartitions / 2)
    val sorted = counts.repartitionByRange(nParts, $"v")
      .sortWithinPartitions("v")
      .persist()
    try {
      val partSums = sorted
        .mapPartitions(it => Iterator.single(it.map(_._2).sum))
        .collect()
      val n = partSums.sum
      if (n == 0L) return (0.0, 0L)
      val offsets = partSums.scanLeft(0L)(_ + _)

      val maxima = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
        var cum = offsets(pid)
        var best = 0.0
        while (it.hasNext) {
          val (v, c) = it.next()
          val f = cdf(v)
          val below = cum.toDouble / n
          cum += c
          val through = cum.toDouble / n
          val dPlus = through - f
          val dMinus = f - below
          if (dPlus > best) best = dPlus
          if (dMinus > best) best = dMinus
        }
        Iterator.single(best)
      }.collect()

      (maxima.max, n)
    } finally sorted.unpersist()
  }
}
