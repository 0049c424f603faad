package graft
import org.apache.spark.scheduler._
import org.apache.spark.sql.functions._
import graft.transcripts.QualityFilter
object Prof {
  def run(cpus: Int): Unit = {
    val spark = Bench.session(cpus.toString)
    spark.conf.set("spark.sql.shuffle.partitions", (cpus * 3).toString)
    spark.sparkContext.setLogLevel("WARN")
    @volatile var cpu = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        cpu += sc.stageInfo.taskMetrics.executorCpuTime / 1000000
    })
    val t = Bench.replicatedTranscripts(spark, "/root/testdata/sf0.1", 50)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    t.count()
    def m(name: String)(f: => Unit): Unit = {
      f // warm
      cpu = 0
      val w = Bench.timed(f)
      println(s"cpus=$cpus $name wall=$w cpuSec=${cpu / 1000}")
    }
    m("langppl_noshuffle")(Bench.consume(QualityFilter.withLangPpl(t)))
    m("scan_only")(Bench.consume(t.select(length(col("text")).as("l"))))
    m("shuffle_only")(Bench.consume(t.repartition(cpus * 3, col("conv_id"))))
    m("full")(Bench.consume(QualityFilter(t)))
    spark.stop()
  }
  def main(args: Array[String]): Unit = { run(8); run(32) }
}
