package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

import graft.transcripts.QualityFilter

/** North-rule scaling evidence: the identical quality-filter job on the
  * identical input at two parallelism levels (local[8] = N, local[32] = 4N,
  * shuffle partitions scaled proportionally), reporting throughput at both
  * plus scaling efficiency = thr(4N) / (4 · thr(N)). Acceptance ≥ 0.8
  * (BASELINE.md).
  *
  * Also reports executor CPU nanoseconds per turn at each level (summed
  * task executorCpuTime over the min-wall run ÷ turns): flat CPU/row from
  * N to 4N demonstrates the plan itself adds no serialization work with
  * parallelism — wall-clock efficiency loss beyond that is the single
  * box's shared DRAM, which separate executors would not share.
  * Run: sbt "runMain graft.ScalingBench [sfDir]". */
object ScalingBench {

  def run(cpus: Int, sfDir: String, rep: Int): (Long, Double, Double) = {
    val spark = Bench.session(cpus.toString)
    // 3 waves of tasks per core: lets the scheduler load-balance uneven
    // partitions, which a single wave (partitions == cores) cannot.
    spark.conf.set("spark.sql.shuffle.partitions", (cpus * 3).toString)
    spark.sparkContext.setLogLevel("WARN")
    try {
      // warmup pass (JIT + parquet footer caches)
      Bench.consume(QualityFilter(
        Bench.replicatedTranscripts(spark, sfDir, 1)))
      val transcripts = Bench.replicatedTranscripts(spark, sfDir, rep)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      val turns = transcripts.count()
      val cpuNs = new AtomicLong(0L)
      val listener = new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null) cpuNs.addAndGet(t.taskMetrics.executorCpuTime)
      }
      spark.sparkContext.addSparkListener(listener)
      // min-of-5 wall: the sandbox host is shared and single runs vary ±2×;
      // the minimum approximates an unloaded machine for both configs.
      // CPU time is averaged per run (it is load-insensitive).
      val runs = 5
      val secs = (1 to runs).map { _ =>
        Bench.timed(Bench.consume(QualityFilter(transcripts)))
      }.min
      // listener-bus delivery is async; drain before detaching or the last
      // run's task metrics undercount (CLAUDE.md gotcha: ~1s minimum)
      Thread.sleep(2000)
      spark.sparkContext.removeSparkListener(listener)
      val cpuPerTurn = cpuNs.get().toDouble / runs / turns
      transcripts.unpersist()
      (turns, secs, cpuPerTurn)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val rep = sys.env.getOrElse("SPARK_GRAFT_REP", "100").toInt
    val n = sys.env.getOrElse("SPARK_GRAFT_N", "8").toInt
    val (turnsN, secsN, cpuN) = run(n, sfDir, rep)
    val (turns4N, secs4N, cpu4N) = run(n * 4, sfDir, rep)
    val thrN = turnsN / secsN
    val thr4N = turns4N / secs4N
    val eff = thr4N / (4 * thrN)
    println(f"""{"metric":"scaling_efficiency","value":$eff%.4f,"unit":"ratio","n_cores":$n,"turns":$turnsN,"secs_localN":$secsN%.3f,"secs_local4N":$secs4N%.3f,"turns_per_sec_localN":$thrN%.1f,"turns_per_sec_local4N":$thr4N%.1f,"cpu_ns_per_turn_localN":$cpuN%.1f,"cpu_ns_per_turn_local4N":$cpu4N%.1f,"sf":"$sfDir"}""")
  }
}
