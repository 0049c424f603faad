package graft
import org.apache.spark.sql.functions._
import graft.transcripts.{QualityFilter, Transcripts}

/** Manual plan-audit entry point (the spec-level assertions live in
  * PartitionersSpec/EngineSpec; this prints the full plans for eyeballing). */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = Bench.session("8")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    println("===== PIPELINE (window on slim input, fused QfScore in output stage):")
    QualityFilter(Transcripts.fromEvents(spark, dir)).explain("formatted")
    println("===== Q01 suite job count (fused pass + one isolated job per window rule):")
    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
    })
    SparkEntry.queries("q01_suite_lineitem")(spark, dir).collect()
    Thread.sleep(1000)
    println(s"q01 spark jobs = $jobs (fused agg for 13 plain rules + " +
      "groupBy-combine job for the unique rule + AQE stages + result collect)")
    println("===== partition_year_month range form pushes; year(ts)=y does not:")
    graft.sources.Partitioners.onYearMonth(
        spark.read.parquet(s"$dir/events.parquet"), "ts", 2024, 1)
      .select(col("event_type")).explain("formatted")
    spark.read.parquet(s"$dir/events.parquet")
      .filter(year(col("ts")) === 2024 && month(col("ts")) === 1)
      .select(col("event_type")).explain("formatted")
    println("===== q15 minhash-LSH: band keys native, candidate shuffle id-only:")
    SparkEntry.queries("q15_dedup_minhash")(spark, dir).explain()
    println("===== q49 banded embedding near-dup (no BroadcastNestedLoopJoin):")
    SparkEntry.queries("q49_dedup_embedding_10x")(spark, dir).explain()
    spark.stop()
  }
}
