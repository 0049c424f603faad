package graft
import org.apache.spark.sql.functions._
import graft.transcripts.{QualityFilter, Transcripts}
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = Bench.session("8")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    println("===== PIPELINE (scan pruning + single window):")
    QualityFilter(Transcripts.fromEvents(spark, dir)).explain("formatted")
    println("===== Q01 fused suite (expect ONE Aggregate):")
    // capture job count via listener while running q01
    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
    })
    SparkEntry.queries("q01_suite_lineitem")(spark, dir).collect()
    Thread.sleep(300)
    println(s"q01 spark jobs = $jobs (suite of 14 expectations)")
    println("===== partition_year_month filter pushdown:")
    spark.read.parquet(s"$dir/events.parquet")
      .filter(year(col("ts")) === 2024 && month(col("ts")) === 1)
      .select(col("event_type")).explain("formatted")
    println("===== q19 topk broadcast check:")
    SparkEntry.queries("q19_sim_topk")(spark, dir).explain()
    spark.stop()
  }
}
