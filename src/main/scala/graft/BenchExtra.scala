package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame

/** Diagnostic benchmark harness (guide §1): per-query wall time, executor
  * CPU time, job/stage/shuffle attribution, and `.explain("formatted")`
  * dumps — everything `Bench` (frozen measurement protocol) cannot carry.
  *
  * Not part of the driver contract; `Bench.scala` stays the protocol
  * artifact. Usage:
  *
  * {{{
  * SPARK_GRAFT_QUERIES=q90_dedup_canonical,q05_q1_agg \
  * SPARK_GRAFT_PLAN_DIR=plans/r06 SPARK_GRAFT_PLAN_SUFFIX=_before \
  * sbt -batch "runMain graft.BenchExtra"
  * }}}
  *
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
  * (default 32), SPARK_GRAFT_QUERIES (default: the 12 headline SparkEntry
  * queries), SPARK_GRAFT_REPS (timed repetitions, default 3),
  * SPARK_GRAFT_PLAN_DIR / SPARK_GRAFT_PLAN_SUFFIX (optional plan dumps).
  */
object BenchExtra {

  /** Task-end metrics accumulator — same metering idea as
    * DedupScalingBench's listener, lifted into a reusable reporter. */
  final class Meter extends SparkListener {
    val cpuNs = new java.util.concurrent.atomic.LongAdder
    val runMs = new java.util.concurrent.atomic.LongAdder
    val shuffleWriteBytes = new java.util.concurrent.atomic.LongAdder
    val shuffleReadBytes = new java.util.concurrent.atomic.LongAdder
    val tasks = new java.util.concurrent.atomic.LongAdder
    val jobs = new java.util.concurrent.atomic.LongAdder
    val stages = new java.util.concurrent.atomic.LongAdder
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        cpuNs.add(m.executorCpuTime)
        runMs.add(m.executorRunTime)
        shuffleWriteBytes.add(m.shuffleWriteMetrics.bytesWritten)
        shuffleReadBytes.add(m.shuffleReadMetrics.totalBytesRead)
      }
      tasks.increment()
    }
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs.increment()
    /** Optional per-stage rows (stageId, tasks, cpuMs, runMs, shufR, shufW,
      * name) for drill-down; enabled via SPARK_GRAFT_STAGE_LOG=1. */
    val stageRows = new java.util.concurrent.ConcurrentLinkedQueue[
      (Int, Int, Long, Long, Long, Long, String)]
    var logStages = false
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      stages.increment()
      if (logStages) {
        val m = s.stageInfo.taskMetrics
        stageRows.add((s.stageInfo.stageId, s.stageInfo.numTasks,
          m.executorCpuTime / 1000000L, m.executorRunTime,
          m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten,
          s.stageInfo.name.take(100)))
      }
    }
    def snapshot(): Map[String, Long] = Map(
      "cpu_ms" -> cpuNs.sum() / 1000000L,
      "run_ms" -> runMs.sum(),
      "shuffle_write_b" -> shuffleWriteBytes.sum(),
      "shuffle_read_b" -> shuffleReadBytes.sum(),
      "tasks" -> tasks.sum(), "jobs" -> jobs.sum(), "stages" -> stages.sum())
    def reset(): Unit = {
      Seq(cpuNs, runMs, shuffleWriteBytes, shuffleReadBytes,
        tasks, jobs, stages).foreach(_.reset())
      stageRows.clear()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val planSuffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "")
    val defaultQs = Seq("q01_suite_lineitem", "q05_q1_agg", "q03_qf_turns",
      "q15_dedup_minhash", "q19_sim_topk", "q21_text_stats",
      "q49_dedup_embedding_10x", "q73_decontaminate", "q76_keepfirst_turns",
      "q85_chunk_words", "q86_pack_sequences", "q90_dedup_canonical")
    val names = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(defaultQs)

    val spark = Bench.session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val meter = new Meter
    spark.sparkContext.addSparkListener(meter)

    val warmDir = "/root/testdata/sf0.001"
    val out = new StringBuilder("{")
    names.zipWithIndex.foreach { case (name, qi) =>
      val q = SparkEntry.queries(name)
      // plan/codegen warmup at sf0.001 (Bench protocol)
      spark.sparkContext.setJobDescription(s"$name warmup")
      Bench.consume(q(spark, warmDir))
      planDir.foreach { dir =>
        val d = new java.io.File(dir); d.mkdirs()
        val plan = q(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, s"$name$planSuffix.txt"),
          plan.getBytes("UTF-8"))
      }
      val samples = (1 to reps).map { r =>
        spark.sparkContext.setJobDescription(s"$name rep$r")
        // listener delivery is async — drain before resetting/reading
        org.apache.spark.GraftSparkShim.drainListeners(spark.sparkContext)
        meter.reset()
        val t0 = System.nanoTime()
        Bench.consume(q(spark, sfDir))
        val wall = (System.nanoTime() - t0) / 1e9
        org.apache.spark.GraftSparkShim.drainListeners(spark.sparkContext)
        (wall, meter.snapshot())
      }
      if (sys.env.get("SPARK_GRAFT_STAGE_LOG").contains("1")) {
        // one extra instrumented run; per-stage rows sorted by CPU desc
        meter.logStages = true
        org.apache.spark.GraftSparkShim.drainListeners(spark.sparkContext)
        meter.reset()
        Bench.consume(q(spark, sfDir))
        org.apache.spark.GraftSparkShim.drainListeners(spark.sparkContext)
        meter.logStages = false
        import scala.jdk.CollectionConverters._
        println(s"STAGES for $name (stageId tasks cpuMs runMs shufR shufW name):")
        meter.stageRows.asScala.toSeq.sortBy(-_._3).foreach { r =>
          println(f"  ${r._1}%5d ${r._2}%5d ${r._3}%7d ${r._4}%7d " +
            f"${r._5}%10d ${r._6}%10d ${r._7}")
        }
      }
      val best = samples.minBy(_._1)
      val walls = samples.map(_._1).map(w => f"$w%.3f").mkString("[", ",", "]")
      val m = best._2
      val line = f""""$name":{"wall_min":${best._1}%.3f,"walls":$walls,""" +
        s""""cpu_ms":${m("cpu_ms")},"run_ms":${m("run_ms")},""" +
        s""""jobs":${m("jobs")},"stages":${m("stages")},"tasks":${m("tasks")},""" +
        s""""shuffle_w":${m("shuffle_write_b")},"shuffle_r":${m("shuffle_read_b")}}"""
      out.append(if (qi == 0) "" else ",").append(line)
      println(s"BENCHX $line")
    }
    out.append("}")
    val path = sys.env.getOrElse("SPARK_GRAFT_BENCHX_OUT", "benchx_out.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      (out.toString + "\n").getBytes("UTF-8"))
    spark.stop()
    println(out.toString)
  }
}
