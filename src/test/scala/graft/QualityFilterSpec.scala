package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.transcripts.{QualityFilter, Transcripts, Turn}

/** Hand-labeled keep/drop + scrub cases for the quality-filter pipeline
  * (FIXTURES.md §3). */
class QualityFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)

  def run(turns: Seq[Turn]): Map[(String, Int), org.apache.spark.sql.Row] = {
    val df = QualityFilter(turns.toDF())
    df.collect().map(r => (r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx")) -> r).toMap
  }

  val goodText = "we discussed the project plan with many more details today"

  test("clean English conversation keeps") {
    val rows = run(Seq(
      Turn("c1", 0, "system", goodText, null, ts(0)),
      Turn("c1", 1, "user", "please check the latest results and the team agreed quickly", null, ts(1)),
      Turn("c1", 2, "assistant", goodText, null, ts(2))))
    assert(rows.values.forall(_.getAs[Boolean]("keep")))
    assert(rows.values.forall(r => r.getAs[String]("scrubbed_text") == r.getAs[String]("text")))
  }

  test("email is scrubbed, turn kept, pii flagged") {
    val t = s"$goodText contact me at user42@example.com"
    val rows = run(Seq(Turn("c1", 0, "system", t, null, ts(0))))
    val r = rows(("c1", 0))
    assert(r.getAs[Boolean]("pii_found"))
    assert(r.getAs[Boolean]("email_found"))
    assert(r.getAs[String]("scrubbed_text") == s"$goodText contact me at [EMAIL]")
    assert(r.getAs[Boolean]("keep"))
  }

  test("phone and ssn scrub exact") {
    val t = s"$goodText call 555-123-4567 my ssn is 219-09-9999"
    val r = run(Seq(Turn("c1", 0, "system", t, null, ts(0))))(("c1", 0))
    assert(r.getAs[String]("scrubbed_text") ==
      s"$goodText call [PHONE] my ssn is [SSN]")
    assert(r.getAs[Boolean]("phone_found") && r.getAs[Boolean]("ssn_found"))
  }

  test("profanity drops and is redacted") {
    val t = s"$goodText damn it"
    val r = run(Seq(Turn("c1", 0, "system", t, null, ts(0))))(("c1", 0))
    assert(r.getAs[Boolean]("tox_found"))
    assert(!r.getAs[Boolean]("keep"))
    assert(r.getAs[String]("scrubbed_text") == s"$goodText [REDACTED] it")
  }

  test("non-English drops via langid + ppl") {
    val r = run(Seq(Turn("c1", 0, "system",
      "der die das und nicht ich sie wir haben sein werden", null, ts(0))))(("c1", 0))
    assert(!r.getAs[Boolean]("lang_ok"))
    assert(!r.getAs[Boolean]("ppl_ok"))
    assert(!r.getAs[Boolean]("keep"))
  }

  test("repetition drops") {
    val r = run(Seq(Turn("c1", 0, "system",
      "again again again again again again again again again again", null,
      ts(0))))(("c1", 0))
    assert(!r.getAs[Boolean]("rep_ok"))
    assert(!r.getAs[Boolean]("keep"))
  }

  test("symbol noise and empty drop") {
    val rows = run(Seq(
      Turn("c1", 0, "system", "!!! ### $$$ %%% ^^^ &&&", null, ts(0)),
      Turn("c1", 1, "user", "", null, ts(1))))
    assert(!rows(("c1", 0)).getAs[Boolean]("symbol_ok"))
    assert(!rows(("c1", 1)).getAs[Boolean]("len_ok"))
    assert(rows.values.forall(!_.getAs[Boolean]("keep")))
  }

  test("role sequence: first turn must be system; no duplicate roles except tool") {
    val rows = run(Seq(
      Turn("c1", 0, "user", goodText, null, ts(0)), // bad: not system
      Turn("c1", 1, "assistant", goodText, null, ts(1)),
      Turn("c1", 2, "assistant", goodText, null, ts(2)), // bad: duplicate
      Turn("c1", 3, "tool", goodText, "checkout", ts(3)),
      Turn("c1", 4, "tool", goodText, "checkout", ts(4)), // ok: tool streak
      Turn("c1", 5, "operator", goodText, null, ts(5)))) // bad: invalid role
    assert(!rows(("c1", 0)).getAs[Boolean]("role_seq_ok"))
    assert(rows(("c1", 1)).getAs[Boolean]("role_seq_ok"))
    assert(!rows(("c1", 2)).getAs[Boolean]("role_seq_ok"))
    assert(rows(("c1", 3)).getAs[Boolean]("role_seq_ok"))
    assert(rows(("c1", 4)).getAs[Boolean]("role_seq_ok"))
    assert(!rows(("c1", 5)).getAs[Boolean]("role_seq_ok"))
  }

  test("ppl scoring is exact (multiples of 0.5 sum exactly)") {
    // "the quick brown fox jumps": -1.0 + 4*-2.5 = -11.0; avg = -2.2
    val r = run(Seq(Turn("c1", 0, "system",
      "the quick brown fox jumps", null, ts(0))))(("c1", 0))
    assert(r.getAs[Double]("avg_logprob") == -11.0 / 5)
  }

  test("expression scorer ≡ mapPartitions scorer (lang_ok, ppl_ok, avg_logprob)") {
    val t = Transcripts.fromEvents(spark, "/root/testdata/sf0.001")
    val cols = Seq("conv_id", "turn_idx", "lang_ok", "ppl_ok", "avg_logprob")
    val a = QualityFilter.withLangPpl(t).select(cols.head, cols.tail: _*)
    val b = QualityFilter.withLangPplMapPartitions(t).select(cols.head, cols.tail: _*)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("fused QfScore pipeline ≡ staged expressions on every column") {
    val t = Transcripts.fromEvents(spark, "/root/testdata/sf0.001")
    val staged = QualityFilter.withKeepForTest(
      QualityFilter.withRulesStateless(
        QualityFilter.withLangPpl(QualityFilter.withRoleSeq(t))))
    val fused = QualityFilter(t)
    assert(staged.columns.sorted.toSeq == fused.columns.sorted.toSeq)
    val cols = fused.columns.sorted.toSeq
    val a = fused.select(cols.head, cols.tail: _*)
    val b = staged.select(cols.head, cols.tail: _*)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("adjacent PII: earlier substitution enables later pattern, as chained") {
    import org.apache.spark.sql.functions.col
    // "…com555-…" has no \b before 555 in the ORIGINAL text; the [EMAIL]
    // substitution creates one — the chained regexp_replace (and the DuckDB
    // oracle) scrub the phone, so the engine must too
    val d = Seq((1L, "reach me a@b.com555-123-4567")).toDF("id", "text")
    val r = d.select(graft.functions.ScrubFlags.scrub_flags(col("text")).as("s"))
      .select(col("s.scrubbed_text"), col("s.phone_found")).head()
    assert(r.getString(0) == "reach me [EMAIL][PHONE]", r.getString(0))
    assert(!r.getBoolean(1)) // flag reflects the ORIGINAL text (no \b there)
    // fused expression behaves identically
    val q = d.select(graft.functions.QfScore.qf_score(col("text")).as("s"))
      .select(col("s.scrubbed_text")).head()
    assert(q.getString(0) == "reach me [EMAIL][PHONE]")
  }

  test("replicated user_ids keep distinct conversations (no lpad truncation)") {
    val t = Bench.replicatedTranscripts(spark, "/root/testdata/sf0.001", 3)
    val users = t.select("conv_id").distinct().count()
    val base = Transcripts.fromEvents(spark, "/root/testdata/sf0.001")
      .select("conv_id").distinct().count()
    assert(users == base * 3, s"replication must multiply conversations: $users vs $base")
    // and (conv_id, turn_idx) stays unique — the window-shape invariant
    assert(t.select("conv_id", "turn_idx").distinct().count() == t.count())
  }

  test("synthesized transcripts: deterministic, ordered, conv-unique") {
    val t = Transcripts.fromEvents(spark, "/root/testdata/sf0.001")
    val n = t.count()
    assert(n == 1000)
    assert(t.select("conv_id", "turn_idx").distinct().count() == n)
    val again = Transcripts.fromEvents(spark, "/root/testdata/sf0.001")
    assert(t.exceptAll(again).isEmpty)
  }

  test("salted conv stats match unsalted groupBy") {
    val filtered = QualityFilter(Transcripts.fromEvents(spark, "/root/testdata/sf0.001"))
    val salted = QualityFilter.convStatsSalted(filtered, 8)
      .orderBy("conv_id").collect()
    val plain = filtered.groupBy("conv_id")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n_turns"))
      .orderBy("conv_id").collect()
    assert(salted.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      plain.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("qf plan: clustered+sorted cached input runs the role-seq window " +
      "with NO Exchange and NO Sort") {
    import org.apache.spark.sql.functions.col
    // the layout a 10^12-turn deployment writes once as the table's sort
    // order: the cached scan forwards partitioning+ordering, so the
    // per-conversation window must add neither a shuffle nor a sort
    val t = Transcripts.fromEvents(spark, "/root/testdata/sf0.001")
      .repartition(col("conv_id"))
      .sortWithinPartitions(col("conv_id"), col("turn_idx"))
      .persist()
    try {
      t.count()
      // assert over the plan ABOVE the cache boundary only — the
      // InMemoryRelation's child records the one-time layout job (its
      // Exchange/Sort is the table write, outside the steady-state query)
      val full = QualityFilter(t).queryExecution.executedPlan.toString
      val plan = full.substring(0, full.indexOf("InMemoryRelation"))
      assert(plan.contains("InMemoryTableScan"), s"expected cached scan:\n$full")
      assert(!plan.contains("Exchange"),
        s"unexpected Exchange in the quality-filter plan:\n$plan")
      assert(!plan.split("\n").exists(l =>
          l.trim.startsWith("+- Sort") || l.trim.startsWith("Sort ")),
        s"unexpected Sort in the quality-filter plan:\n$plan")
    } finally { t.unpersist(); () }
  }

  test("repetition_stats: counts, top word, 2-gram dups, growth, null") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.col
    import graft.functions.RepetitionStats.repetition_stats
    import spark.implicits._
    def stats(s: String): Row =
      Seq(s).toDF("t").select(repetition_stats(col("t")).as("r"))
        .select("r.*").collect().head
    // "a a a b b c": 6 words, 3 distinct, top=3; 2-grams
    // [a a, a a, a b, b b, b c] → 5 total, 4 distinct
    assert(stats("a a a b b c") == Row(6, 3, 3, 5, 4))
    assert(stats("solo") == Row(1, 1, 1, 0, 0))
    // growth past the 256-entry scratch: 300 distinct + 5 repeats of w0
    val many = ((0 until 300).map(i => s"w$i") ++ Seq.fill(5)("w0")).mkString(" ")
    assert(stats(many) == Row(305, 300, 6, 304, 301))
    // null → all-zero row (engine treats missing text as empty)
    val r = Seq((1, Option.empty[String])).toDF("id", "t")
      .select(repetition_stats(col("t")).as("r")).select("r.*").collect().head
    assert(r == Row(0, 0, 0, 0, 0))
  }
}
