package graft

import org.apache.spark.sql.SparkSession

import graft.core.Json
import graft.transcripts.{Checkpoint, Transcripts}

/** Production entry point (spark-submit shape):
  *
  *   spark-submit --class graft.QualityFilterJob graft.jar \
  *     <transcripts-parquet-or-sfDir> <outDir> [buckets]
  *
  * Reads the transcript table (a parquet path with the north-rule schema,
  * or a testdata sf dir to synthesize from events.parquet), runs the
  * quality-filter + scrub pipeline checkpointed by conv_id hash bucket
  * (resumable: re-running after a crash skips committed buckets), and
  * prints a one-line JSON run report with per-partition lineage totals. */
object QualityFilterJob {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QualityFilterJob <input> <outDir> [buckets]")
    val (input, outDir) = (args(0), args(1))
    val buckets = if (args.length > 2) args(2).toInt else 64
    val builder = SparkSession.builder()
      .appName("graft-quality-filter")
      .config("spark.sql.session.timeZone", "UTC")
    // spark-submit provides the master on a cluster; SPARK_GRAFT_CPUS
    // enables the same binary to run locally (tests / sandboxes)
    sys.env.get("SPARK_GRAFT_CPUS").foreach { c =>
      builder.master(s"local[$c]")
        .config("spark.sql.shuffle.partitions", (c.toInt * 3).toString)
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val transcripts =
      if (new java.io.File(s"$input/events.parquet").exists())
        Transcripts.fromEvents(spark, input)
      else spark.read.parquet(input)
    val report = Checkpoint.runResumable(transcripts, outDir, buckets, input)
    val lineage = Checkpoint.committedBuckets(outDir).values.toSeq
    println(Json.write(Map(
      "processed_buckets" -> report.processed.size,
      "skipped_buckets" -> report.skipped.size,
      "rows_in" -> lineage.map(_.rowsIn).sum,
      "rows_kept" -> lineage.map(_.rowsKept).sum,
      "pii_rows" -> lineage.map(_.piiRows).sum,
      "out_dir" -> outDir)))
    spark.stop()
  }
}
