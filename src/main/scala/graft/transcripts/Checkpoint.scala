package graft.transcripts

import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

import scala.jdk.CollectionConverters._
import scala.util.Try

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Json

/** Resumable, lineage-tracked pipeline runs with Iceberg-style snapshot
  * semantics (SURVEY.md §7.4: no Iceberg jar ships with this Spark build,
  * so the snapshot layer is parquet + JSON manifests with an atomic HEAD
  * swap mirroring Iceberg's commit protocol).
  *
  * Layout under `outDir`:
  *   data/bucket=<b>/…parquet     one directory per hash bucket of conv_id
  *   _manifests/manifest-<n>.json  immutable snapshot: committed buckets +
  *                                 per-bucket lineage/metrics
  *   _manifests/HEAD               current snapshot number (atomic rename)
  *
  * A run processes only buckets missing from the HEAD snapshot, committing
  * one new snapshot per completed bucket — so a crash at any point loses at
  * most the in-flight bucket, and a re-run is idempotent (work already
  * committed is skipped; a completed run re-runs as a no-op). Per-bucket
  * metrics ride the same job via `Observation` (no second pass).
  */
object Checkpoint {

  final case class BucketLineage(
      bucket: Int, rowsIn: Long, rowsKept: Long, piiRows: Long,
      wallSecs: Double, inputPath: String, committedAtMs: Long)

  final case class RunReport(
      processed: Seq[Int], skipped: Seq[Int], lineage: Seq[BucketLineage])

  private def manifestDir(outDir: String): Path = Paths.get(outDir, "_manifests")

  private def headSnapshot(outDir: String): Option[Int] = {
    val head = manifestDir(outDir).resolve("HEAD")
    if (Files.exists(head)) Try(Files.readString(head).trim.toInt).toOption
    else None
  }

  /** Buckets committed as of the current HEAD snapshot. */
  def committedBuckets(outDir: String): Map[Int, BucketLineage] =
    headSnapshot(outDir).map { n =>
      val f = manifestDir(outDir).resolve(s"manifest-$n.json")
      parseManifest(Files.readString(f))
    }.getOrElse(Map.empty)

  /** Minimal manifest parser (flat, engine-written JSON only). */
  private def parseManifest(s: String): Map[Int, BucketLineage] = {
    val entry = """\{"bucket":(\d+),"rows_in":(\d+),"rows_kept":(\d+),"pii_rows":(\d+),"wall_secs":([0-9.Ee+-]+),"input_path":"([^"]*)","committed_at_ms":(\d+)\}""".r
    entry.findAllMatchIn(s).map { m =>
      m.group(1).toInt -> BucketLineage(m.group(1).toInt, m.group(2).toLong,
        m.group(3).toLong, m.group(4).toLong, m.group(5).toDouble,
        m.group(6), m.group(7).toLong)
    }.toMap
  }

  private def lineageJson(l: BucketLineage): String =
    s"""{"bucket":${l.bucket},"rows_in":${l.rowsIn},"rows_kept":${l.rowsKept},"pii_rows":${l.piiRows},"wall_secs":${l.wallSecs},"input_path":${Json.esc(l.inputPath)},"committed_at_ms":${l.committedAtMs}}"""

  /** Atomically commit a new snapshot = previous lineage + one bucket. */
  private def commitSnapshot(outDir: String, all: Map[Int, BucketLineage]): Int = {
    val dir = manifestDir(outDir)
    Files.createDirectories(dir)
    val next = headSnapshot(outDir).getOrElse(-1) + 1
    val body = all.values.toSeq.sortBy(_.bucket).map(lineageJson)
      .mkString(s"""{"snapshot":$next,"buckets":[""", ",", "]}")
    Files.writeString(dir.resolve(s"manifest-$next.json"), body,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    val tmp = dir.resolve(s"HEAD.tmp-$next")
    Files.writeString(tmp, next.toString)
    Files.move(tmp, dir.resolve("HEAD"), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** Run the quality-filter pipeline over `transcripts`, checkpointed by
    * conv_id hash bucket. `failAfterBuckets` injects a crash for tests. */
  def runResumable(transcripts: DataFrame, outDir: String, buckets: Int = 8,
      inputPath: String = "", failAfterBuckets: Int = Int.MaxValue): RunReport = {
    val committed = committedBuckets(outDir)
    val todo = (0 until buckets).filterNot(committed.contains)
    val done = scala.collection.mutable.ArrayBuffer.empty[BucketLineage]
    var lineage = committed
    var processedCount = 0
    todo.foreach { b =>
      if (processedCount >= failAfterBuckets)
        throw new RuntimeException(s"injected failure before bucket $b")
      val t0 = System.nanoTime()
      val slice = transcripts.filter(pmod(hash(col("conv_id")), lit(buckets)) === b)
      val obs = new Observation(s"bucket_$b")
      val out = QualityFilter(slice).observe(obs,
        count(lit(1)).as("rows_in"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("rows_kept"),
        sum(when(col("pii_found"), 1L).otherwise(0L)).as("pii_rows"))
      out.write.mode("overwrite").parquet(s"$outDir/data/bucket=$b")
      val m = obs.get
      val l = BucketLineage(b,
        m.getOrElse("rows_in", 0L).asInstanceOf[Long],
        m.getOrElse("rows_kept", 0L).asInstanceOf[Long],
        m.getOrElse("pii_rows", 0L).asInstanceOf[Long],
        (System.nanoTime() - t0) / 1e9, inputPath, System.currentTimeMillis())
      lineage = lineage + (b -> l)
      commitSnapshot(outDir, lineage)
      done += l
      processedCount += 1
    }
    RunReport(done.map(_.bucket).toSeq, committed.keys.toSeq.sorted, done.toSeq)
  }

  /** Read back the committed output as one DataFrame. */
  def readCommitted(spark: SparkSession, outDir: String): DataFrame = {
    val committed = committedBuckets(outDir).keys.toSeq.sorted
    val paths = committed.map(b => s"$outDir/data/bucket=$b")
    spark.read.parquet(paths: _*)
  }
}
