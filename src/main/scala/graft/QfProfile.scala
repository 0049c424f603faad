package graft

import graft.transcripts.QualityFilter

/** Stage-level profiling for the flagship qf_pipeline bench: times the
  * cached-scan baseline, the role-seq window alone, the fused scoring
  * expression alone, and the full pipeline, so regressions can be
  * attributed to a stage instead of guessed at. Dev tool — not part of the
  * driver contract. */
object QfProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_N", "3").toInt
    val rep = sys.env.getOrElse("SPARK_GRAFT_REP",
      Bench.Replication.toString).toInt
    val spark = Bench.session(cpus)
    spark.conf.set("spark.sql.shuffle.partitions", (cpus.toInt * 3).toString)
    spark.sparkContext.setLogLevel("ERROR")
    val transcripts = Bench.replicatedTranscripts(spark, sfDir, rep)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val turns = transcripts.count()
    def t(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      Bench.consume(df) // warm (codegen + JIT)
      val s = Bench.timedMin(n)(Bench.consume(df))
      println(f"$name%-28s ${s}%8.3f s  ${turns / s / 1e6}%6.2f M turns/s")
    }
    println(s"turns=$turns cpus=$cpus n=$n")
    t("scan-only")(transcripts)
    t("window-only")(QualityFilter.withRoleSeq(transcripts))
    t("scores-only")(QualityFilter.withScoresFused(transcripts))
    t("full")(QualityFilter(transcripts))
    spark.stop()
  }
}
