package graft

import org.apache.spark.sql.functions._

import graft.core._

/** Stage-level profiling for the q01 fused-suite bench: times the raw
  * parquet scan, the fused aggregate pass in isolation, the uniqueness
  * group-combine, and the full validate, so the steady-state budget can be
  * attributed per phase. Dev tool — not part of the driver contract. */
object SuiteProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_N", "5").toInt
    val spark = Bench.session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")

    val suite = Suite("lineitem_core_profile", Seq(
      ExpectColumnValuesToNotBeNull("l_quantity"),
      ExpectColumnValuesToBeBetween("l_quantity", Some(1), Some(50)),
      ExpectColumnValuesToBeInSet("l_returnflag", Seq("A", "N", "R"), mostly = 0.9),
      ExpectColumnValuesToMatchRegex("l_linestatus", "^[OF]$"),
      ExpectColumnValueLengthsToEqual("l_returnflag", 1),
      ExpectColumnValuesToBeUnique("l_orderkey"),
      ExpectColumnPairValuesAToBeGreaterThanB("l_extendedprice", "l_discount"),
      ExpectSelectColumnValuesToBeUniqueWithinRecord(Seq("l_partkey", "l_suppkey")),
      ExpectColumnMeanToBeBetween("l_quantity", Some(20), Some(30)),
      ExpectColumnMinToBeBetween("l_quantity", Some(0), Some(5)),
      ExpectColumnMaxToBeBetween("l_quantity", Some(45), Some(50)),
      ExpectColumnSumToBeBetween("l_quantity", Some(0), None),
      ExpectColumnUniqueValueCountToBeBetween("l_returnflag", Some(1), Some(5)),
      ExpectTableRowCountToBeBetween(Some(100), None)))
    val noUnique = Suite("no_unique", suite.expectations.filterNot(e =>
      e.isInstanceOf[ExpectColumnValuesToBeUnique] ||
        e.isInstanceOf[ExpectColumnUniqueValueCountToBeBetween] ||
        e.isInstanceOf[ExpectSelectColumnValuesToBeUniqueWithinRecord]))

    def t(name: String)(f: => Unit): Unit = {
      f // warm
      val s = (1 to n).map(_ => Bench.timed(f)).min
      println(f"$name%-26s ${s}%8.3f s")
    }
    println(s"cpus=$cpus n=$n sf=$sfDir rows=${li.count()}")
    t("scan-only")(Bench.consume(li))
    t("scan-used-cols")(Bench.consume(li.select("l_quantity", "l_returnflag",
      "l_linestatus", "l_orderkey", "l_extendedprice", "l_discount",
      "l_partkey", "l_suppkey")))
    t("unique-groupby-only")(Bench.consume(
      li.groupBy("l_orderkey").agg(count(lit(1)).as("c")).filter(col("c") > 1)))
    t("validate-no-unique")(Graft.validate(li, noUnique))
    t("validate-unique-only")(Graft.validate(li,
      Suite("u", Seq(ExpectColumnValuesToBeUnique("l_orderkey")))))
    t("validate-uwr-only")(Graft.validate(li,
      Suite("u2", Seq(ExpectSelectColumnValuesToBeUniqueWithinRecord(
        Seq("l_partkey", "l_suppkey"))))))
    t("validate-bool-only")(new SuiteRunner(ResultFormat.BooleanOnly)
      .run(li, suite))
    t("validate-full")(Graft.validate(li, suite))
    t("validate+resultsToDF")(Bench.consume(
      Graft.resultsToDF(spark, Graft.validate(li, suite))))
    spark.stop()
  }
}
