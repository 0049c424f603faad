package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared banded-LSH plumbing: skew accounting + hot-bucket capping used by
  * the MinHash, SimHash and embedding near-dup operators. */
object Lsh {

  /** Per-run LSH skew accounting (no silent truncation): buckets whose size
    * exceeds the cap are dropped from candidate generation and counted
    * here. */
  final case class LshStats(droppedBuckets: Long, droppedRows: Long)

  private val log = org.slf4j.LoggerFactory.getLogger("graft.operators.Lsh")

  /** Skew defense for banded LSH: a mass-duplicated boilerplate key would
    * make its per-bucket candidate join quadratic (1M identical docs →
    * 10¹² pairs in one bucket). Buckets larger than `maxBucket` are
    * dropped (run `exactDedup` first so true duplicates are already
    * collapsed), and the drop is counted + logged. The bucket census
    * shuffles only (band_idx, band_key) pairs; the hot-key set is tiny by
    * construction (≤ rows/maxBucket keys) and broadcast to the anti-join. */
  def capBuckets(exploded: DataFrame, maxBucket: Int): (DataFrame, LshStats) = {
    if (maxBucket == Int.MaxValue) (exploded, LshStats(0L, 0L))
    else {
      // hot-key census runs once and is PERSISTED: it is tiny by
      // construction (≤ rows/maxBucket keys) and feeds both the stats
      // aggregate here and the broadcast anti-join in the result plan —
      // without the persist the census (and the banding expressions under
      // it) would be recomputed at execution time
      val hot = exploded.groupBy("band_idx", "band_key")
        .agg(count(lit(1)).as("__bn")).filter(col("__bn") > maxBucket)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val r = hot.agg(count(lit(1)).as("nb"),
        coalesce(sum("__bn"), lit(0L)).as("nr")).head()
      val stats = LshStats(r.getLong(0), r.getLong(1))
      if (stats.droppedBuckets > 0)
        log.warn(s"LSH bucket cap $maxBucket dropped ${stats.droppedBuckets} " +
          s"hot buckets (${stats.droppedRows} rows) from candidate generation")
      val capped = exploded.join(
        broadcast(hot.select("band_idx", "band_key")),
        Seq("band_idx", "band_key"), "left_anti")
      (capped, stats)
    }
  }
}
