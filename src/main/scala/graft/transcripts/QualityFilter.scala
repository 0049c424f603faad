package graft.transcripts

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** The north-rule quality-filter + scrub pipeline.
  *
  * Recasts the reference's expectation-suite model (SURVEY.md §1) as one
  * Catalyst column-expression DAG over transcript turns:
  *
  *   - language-ID + n-gram log-prob scoring: ONE `mapPartitions` pass with
  *     two broadcast models (stopword set + unigram log-prob table). Model
  *     log-probs are exact multiples of 0.5, so score sums are exact in IEEE
  *     double regardless of summation order — bit-reproducible across
  *     engines and partitionings.
  *   - Gopher/C4-style heuristics (token count, symbol ratio, repetition) as
  *     pure codegen'd `functions._` columns.
  *   - role-sequence validity via `Window.partitionBy(conv_id)
  *     .orderBy(turn_idx)` (same primitive as the reference's
  *     column_values_increasing, column_values_increasing.py:96-99, but
  *     conversation-partitioned and therefore shuffle-parallel).
  *   - compiled-regex PII/toxicity scrub emitting `scrubbed_text` plus
  *     per-rule flags and the final `keep` label.
  *
  * Every rule is deterministic and integer/boolean-valued (or exact-double),
  * so the DuckDB oracle reproduces it bit-for-bit.
  */
object QualityFilter {

  // --- models (deterministic, code-defined; stand-ins for fastText / KenLM
  // --- artifacts which would be broadcast the same way) ---------------------
  val enStopwords: Set[String] = Set(
    "the", "a", "and", "we", "with", "over", "during", "before", "was", "so",
    "but", "when", "if", "until", "please", "because", "although", "since",
    "while", "after")

  /** Unigram log-prob table; all values are multiples of 0.5 (exact in
    * binary), OOV penalty -7.0, acceptance threshold avg >= -4.0. */
  val unigramLogProb: Map[String, Double] = {
    val stop = enStopwords.map(_ -> -1.0)
    val content = Set(
      "quick", "brown", "fox", "jumps", "lazy", "dog", "sleeps", "quietly",
      "discussed", "project", "plan", "model", "answers", "hard", "questions",
      "spark", "jobs", "run", "very", "fast", "data", "quality", "matters",
      "lot", "check", "latest", "results", "then", "continued", "working",
      "many", "more", "details", "today", "large", "input", "table", "long",
      "review", "session", "next", "planned", "step", "answer", "clear",
      "some", "parts", "were", "slow", "cluster", "busy", "tests", "kept",
      "passing", "saved", "team", "agreed", "quickly", "pipeline", "stayed",
      "green", "costs", "low", "ready", "schema", "stays", "stable", "job",
      "done").map(_ -> -2.5)
    val rare = Set("contact", "me", "at", "user", "example", "com", "call",
      "my", "is", "ssn", "noise").map(_ -> -3.0)
    (stop ++ content ++ rare).toMap
  }
  val OovLogProb = -7.0
  val PplThreshold = -4.0
  val MinStopwordHits = 2

  // --- compiled scrub patterns ----------------------------------------------
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b555-[0-9]{3}-[0-9]{4}\\b"
  val SsnRe = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  val ToxRe = "\\bdamn\\b"
  val AllowedRoles = Seq("system", "user", "assistant", "tool")

  /** Stage 1: langid + unigram log-prob scoring in one mapPartitions pass
    * over the broadcast models (north star: "batched hash lookups via
    * mapPartitions over a broadcast trie"). Adds lang_ok, ppl_ok,
    * avg_logprob. */
  def withLangPpl(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val bcVocab = spark.sparkContext.broadcast(unigramLogProb)
    val bcStop = spark.sparkContext.broadcast(enStopwords)
    val outSchema = df.schema
      .add("lang_ok", BooleanType, nullable = false)
      .add("ppl_ok", BooleanType, nullable = false)
      .add("avg_logprob", DoubleType, nullable = false)
    val textIdx = df.schema.fieldIndex("text")
    df.mapPartitions { it =>
      val vocab = bcVocab.value
      val stop = bcStop.value
      it.map { r =>
        val text = if (r.isNullAt(textIdx)) "" else r.getString(textIdx)
        val tokens = text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
        var hits = 0
        var lp = 0.0
        var i = 0
        while (i < tokens.length) {
          val w = tokens(i)
          if (stop.contains(w)) hits += 1
          lp += vocab.getOrElse(w, OovLogProb)
          i += 1
        }
        val avg = if (tokens.isEmpty) OovLogProb else lp / tokens.length
        Row.fromSeq(r.toSeq ++ Seq(hits >= MinStopwordHits, avg >= PplThreshold, avg))
      }
    }(Encoders.row(outSchema))
  }

  /** Stage 2: heuristic rules, role-sequence window, scrub, keep. */
  def withRules(df: DataFrame): DataFrame = {
    val text = col("text")
    val trimmed = trim(text)
    val toks = split(trimmed, " +")
    val nTokens = when(trimmed === "", lit(0)).otherwise(size(toks))
    val lenOk = nTokens.between(3, 64) && length(text) <= lit(500)
    val symRatio = when(length(text) === 0, lit(1.0)).otherwise(
      length(regexp_replace(text, "[a-zA-Z0-9 ]", "")).cast(DoubleType) /
        length(text).cast(DoubleType))
    val symbolOk = symRatio <= lit(0.25)
    val distinctRatio = when(nTokens === 0, lit(0.0)).otherwise(
      size(array_distinct(toks)).cast(DoubleType) / nTokens.cast(DoubleType))
    val repOk = nTokens < lit(8) || distinctRatio >= lit(0.5)

    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    val prevRole = lag(col("role"), 1).over(w)
    val roleSeqOk = col("role").isin(AllowedRoles: _*) &&
      (col("turn_idx") =!= 0 || col("role") === "system") &&
      (prevRole.isNull || col("role") =!= prevRole || col("role") === "tool")

    val emailF = text.rlike(EmailRe)
    val phoneF = text.rlike(PhoneRe)
    val ssnF = text.rlike(SsnRe)
    val toxF = text.rlike(ToxRe)
    val scrubbed =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(text, EmailRe, "[EMAIL]"),
            SsnRe, "[SSN]"),
          PhoneRe, "[PHONE]"),
        ToxRe, "[REDACTED]")

    // Two projections: flags once, then derived columns referencing the flag
    // COLUMNS. Inlining the flag expressions into `keep`/`pii_found` doubles
    // the generated code for the hot projection (every regex/split expands
    // again), which measured ~5× slower cold on 2M rows (JIT of the giant
    // generated method dominates). CollapseProject keeps the split because
    // each flag is referenced more than once.
    val flagged = df
      .withColumn("n_tokens", nTokens)
      .withColumn("len_ok", lenOk)
      .withColumn("symbol_ok", symbolOk)
      .withColumn("rep_ok", repOk)
      .withColumn("role_seq_ok", roleSeqOk)
      .withColumn("email_found", emailF)
      .withColumn("phone_found", phoneF)
      .withColumn("ssn_found", ssnF)
      .withColumn("tox_found", toxF)
      .withColumn("scrubbed_text", scrubbed)
    flagged
      .withColumn("pii_found",
        col("email_found") || col("phone_found") || col("ssn_found"))
      .withColumn("keep",
        col("lang_ok") && col("ppl_ok") && col("len_ok") && col("symbol_ok") &&
          col("rep_ok") && col("role_seq_ok") && !col("tox_found"))
  }

  /** Full pipeline: transcripts in → per-turn flags + scrubbed text + keep. */
  def apply(transcripts: DataFrame): DataFrame =
    withRules(withLangPpl(transcripts))

  /** Conversation-level stats with salted two-phase aggregation: hot
    * conv_ids (10^12-turn scale can put ~10% of turns in a few
    * conversations) are split across `saltBuckets` partial groups before the
    * final merge, so no single reducer owns a hot key. */
  def convStatsSalted(filtered: DataFrame, saltBuckets: Int = 16): DataFrame = {
    val salted = filtered.withColumn("__salt",
      pmod(hash(col("turn_idx")), lit(saltBuckets)))
    val partial = salted.groupBy(col("conv_id"), col("__salt")).agg(
      count(lit(1)).as("pn"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("pk"),
      max(col("turn_idx")).as("pmax"))
    partial.groupBy(col("conv_id")).agg(
      sum(col("pn")).as("n_turns"),
      sum(col("pk")).as("n_keep"),
      max(col("pmax")).as("max_turn_idx"))
  }
}
