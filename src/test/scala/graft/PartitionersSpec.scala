package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.sources.Partitioners

class PartitionersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")

  test("datetime partitioners match function-based semantics") {
    import org.apache.spark.sql.functions._
    val byRange = Partitioners.onYearMonth(events, "ts", 2024, 1).count()
    val byFn = events.filter(year(col("ts")) === 2024 && month(col("ts")) === 1).count()
    assert(byRange == byFn && byRange > 0)
    val d = Partitioners.onYearMonthDay(events, "ts", 2024, 1, 2).count()
    val dFn = events.filter(year(col("ts")) === 2024 &&
      month(col("ts")) === 1 && dayofmonth(col("ts")) === 2).count()
    assert(d == dFn && d > 0)
  }

  test("value / mod / divided / multi-column / hashed partitioners") {
    assert(Partitioners.onColumnValue(events, "event_type", "click").count() > 0)
    val mod = Partitioners.onModInteger(events, "event_id", 10, 3)
    assert(mod.collect().forall(_.getAs[Long]("event_id") % 10 == 3))
    val div = Partitioners.onDividedInteger(events, "event_id", 100, 2)
    assert(div.collect().forall(r => r.getAs[Long]("event_id") / 100 == 2))
    val mc = Partitioners.onMultiColumnValues(events,
      Map("event_type" -> "click", "user_id" -> 3L))
    assert(mc.collect().forall(r =>
      r.getAs[String]("event_type") == "click" && r.getAs[Long]("user_id") == 3L))
    val buckets = (0 until 8).map(b =>
      Partitioners.onHashedColumn(events, "user_id", 8, b).count()).sum
    assert(buckets == events.count()) // hash buckets partition the table
  }

  test("samplers") {
    assert(Partitioners.sampleLimit(events, 10).count() == 10)
    val r = Partitioners.sampleRandom(events, 0.1, 42)
    assert(r.count() > 0 && r.count() < events.count())
    assert(r.count() == Partitioners.sampleRandom(events, 0.1, 42).count()) // seeded
    assert(Partitioners.sampleList(events, "user_id", Seq(1L, 2L)).count() > 0)
    val h = Partitioners.sampleHash(events, "event_id", 1, "a")
    assert(h.count() > 0 && h.count() < events.count() / 8)
  }

  test("range partitioner predicates reach the parquet scan (pushdown)") {
    import org.apache.spark.sql.functions._
    def scanOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    // range form: ts bounds appear in PushedFilters → row-group pruning
    val pushed = scanOf(Partitioners.onYearMonth(events, "ts", 2024, 1)
      .select("event_type"))
    assert(pushed.contains("PushedFilters"))
    assert(pushed.contains("GreaterThanOrEqual(ts") ||
      pushed.contains("GreaterThanOrEqual(`ts`"), pushed.linesIterator
        .filter(_.contains("PushedFilters")).mkString("\n"))
    // function form (the reference's year(ts)=y): nothing but IsNotNull pushes
    val unpushed = scanOf(events
      .filter(year(col("ts")) === 2024 && month(col("ts")) === 1)
      .select("event_type"))
    assert(!unpushed.contains("GreaterThanOrEqual(ts"))
    // column pruning: a 1-column projection reads a 1-column schema
    assert(pushed.linesIterator.exists(l =>
      l.contains("ReadSchema") && l.contains("event_type") && !l.contains("user_id")))
  }

  test("batch definitions: latest batch, identifiers, slices") {
    import org.apache.spark.sql.functions._
    import graft.sources.BatchDefinition
    val daily = BatchDefinition.daily("daily_events", "ts")
    val latest = daily.latestParameters(events)
    val mx = events.agg(max(col("ts")).cast("timestamp_ntz")).head()
      .getAs[java.time.LocalDateTime](0)
    assert(latest == Map("year" -> mx.getYear, "month" -> mx.getMonthValue,
      "day" -> mx.getDayOfMonth))
    val ids = daily.batchIdentifiers(events)
    assert(ids.last == latest) // ascending sort → last is the latest
    assert(ids.map(i => daily.batch(events, i).count()).sum == events.count())
    assert(daily.latestBatch(events).count() ==
      Partitioners.onYearMonthDay(events, "ts", latest("year"),
        latest("month"), latest("day")).count())
    // descending sort → the default batch is the OLDEST (last in order)
    val monthlyDesc = BatchDefinition.monthly("m", "ts", sortAscending = false)
    assert(monthlyDesc.batchIdentifiers(events).last ==
      monthlyDesc.latestParameters(events))
    assert(BatchDefinition.wholeDataframe("w").latestBatch(events).count() ==
      events.count())
    // identifier-count cap: a wild-cardinality column fails loudly instead
    // of collecting an unbounded distinct to the driver
    val e = intercept[IllegalArgumentException](daily.batchIdentifiers(events, cap = 2))
    assert(e.getMessage.contains("more than 2 distinct"))
    assert(ids.size <= graft.sources.BatchDefinition.MaxBatchIdentifiers)
  }

  test("deterministic md5 sampler is partitioning-invariant") {
    val a = Partitioners.sampleRandomDeterministic(events, "event_id", 0.1)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Partitioners.sampleRandomDeterministic(
        events.repartition(7), "event_id", 0.1)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b && a.nonEmpty && a.size < events.count())
  }

  test("continuous KL divergence over bins") {
    import spark.implicits._
    val d = (1 to 1000).map(_ % 100 / 100.0).toDF("v") // ~uniform [0,1)
    val ok = Graft.validate(d, Suite("kl", Seq(
      ExpectColumnKlDivergenceContinuousToBeLessThan("v",
        Seq(0.0, 0.25, 0.5, 0.75, 1.0), Seq(0.25, 0.25, 0.25, 0.25), 0.01))))
    assert(ok.success)
    val skewed = Graft.validate(d, Suite("kl", Seq(
      ExpectColumnKlDivergenceContinuousToBeLessThan("v",
        Seq(0.0, 0.25, 0.5, 0.75, 1.0), Seq(0.9, 0.05, 0.03, 0.02), 0.5))))
    assert(!skewed.success)
    val outside = Graft.validate(d, Suite("kl", Seq(
      ExpectColumnKlDivergenceContinuousToBeLessThan("v",
        Seq(0.0, 0.25, 0.5), Seq(0.5, 0.5), 100.0))))
    assert(!outside.success) // values beyond last edge → ∞
  }

  test("weighted mixing sampler: rates, default, nested determinism") {
    import graft.sources.Partitioners
    import spark.implicits._
    val df = (1 to 2000).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "g")
    // rate 1.0 keeps every row of the group; rate 0.0 keeps none
    val full = Partitioners.sampleWeighted(df, "id", "g",
      Map("a" -> 1.0, "b" -> 0.0))
    assert(full.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap == Map("a" -> 1000L))
    // unlisted groups use defaultRate; thresholds nest: keep(0.25) ⊆ keep(0.5)
    def ids(p: Double) = Partitioners.sampleWeighted(df, "id", "g",
      Map("a" -> p), defaultRate = p).select("id").as[Long].collect().toSet
    val (q, h) = (ids(0.25), ids(0.5))
    assert(q.subsetOf(h) && q.nonEmpty && h.size < 2000)
    assert(ids(0.5) == h) // deterministic across runs
  }

  test("temperature mixing (alpha=1/2): max group keeps all, small thins") {
    import graft.sources.Partitioners
    import spark.implicits._
    val df = ((1 to 1600).map(i => (i.toLong, "big")) ++
      (2001 to 2100).map(i => (i.toLong, "small"))).toDF("id", "g")
    def kept() = Partitioners.sampleTemperatureHalf(df, "id", "g")
      .groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val k = kept()
    assert(k("big") == 1600L) // rate sqrt(1600/1600) = 1.0
    // small rate = sqrt(100/1600) = 0.25: thinned but nonempty
    assert(k.getOrElse("small", 0L) > 0L && k("small") < 100L)
    assert(kept() == k) // deterministic
  }
}
