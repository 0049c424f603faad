package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis primitives for training-data pipelines: token counting,
  * quality scoring, stopword-vote language ID, and positional polynomial
  * fingerprinting. Pure integer/boolean (or exact-double) arithmetic so the
  * DuckDB oracle reproduces every value bit-for-bit. */
object TextFunctions {

  /** Whitespace-collapsed lowercase normalization. `NormTextSql` is its
    * DuckDB twin — every oracle references that ONE string, so the pair
    * can only change together. */
  def normText(c: Column): Column = trim(regexp_replace(lower(c), "\\s+", " "))
  def normTextSql(col: String): String =
    s"trim(regexp_replace(lower($col), '\\s+', ' ', 'g'))"

  def tokens(c: Column): Column =
    when(normText(c) === "", array().cast(ArrayType(StringType)))
      .otherwise(split(normText(c), " "))

  def nTokens(c: Column): Column = size(tokens(c)).cast(IntegerType)

  /** Mean token length = non-space chars / tokens (exact int division). */
  def avgTokenLen(c: Column): Column =
    when(nTokens(c) === 0, lit(0.0)).otherwise(
      length(regexp_replace(normText(c), " ", "")).cast(DoubleType) /
        nTokens(c).cast(DoubleType))

  def punctRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0)).otherwise(
      length(regexp_replace(c, "[a-zA-Z0-9 ]", "")).cast(DoubleType) /
        length(c).cast(DoubleType))

  def stopwordHits(c: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(c), w => w.isin(stopwords: _*))).cast(IntegerType)

  val EnStop = Seq("the", "a", "of", "to", "and", "in", "is", "value", "table", "row")
  val EsStop = Seq("el", "la", "de", "que", "y", "los", "se", "un", "por", "con")
  val DeStop = Seq("der", "die", "das", "und", "nicht", "ich", "mit", "ein", "zu", "auf")

  /** Stopword-vote language ID with deterministic tie-break en > es > de;
    * no votes → 'unknown'. */
  def langId(c: Column): Column = {
    val en = stopwordHits(c, EnStop)
    val es = stopwordHits(c, EsStop)
    val de = stopwordHits(c, DeStop)
    when(en === 0 && es === 0 && de === 0, lit("unknown"))
      .when(en >= es && en >= de, lit("en"))
      .when(es >= de, lit("es"))
      .otherwise(lit("de"))
  }

  /** Gopher/C4-flavored quality gate over cheap heuristics. */
  def qualityOk(c: Column, minTokens: Int = 5, maxTokens: Int = 5000,
      maxPunct: Double = 0.2, minAvgLen: Double = 2.0,
      maxAvgLen: Double = 12.0): Column =
    nTokens(c).between(minTokens, maxTokens) &&
      punctRatio(c) <= lit(maxPunct) &&
      avgTokenLen(c).between(minAvgLen, maxAvgLen)

  /** GPT-2-flavored pre-tokenizer pattern (contractions, letter runs,
    * digit runs, punctuation runs, each with an optional leading space) —
    * the "BPE-ish" token estimator for LLM-corpus budgeting. ASCII-only
    * and lookahead-free so Java regex (Spark) and RE2 (DuckDB) agree. */
  val BpeishRe: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+"

  /** BPE-ish token count: |regexp_extract_all(text, BpeishRe)|. */
  def nBpeTokens(c: Column): Column =
    size(regexp_extract_all(coalesce(c, lit("")), lit(BpeishRe), lit(0)))
      .cast(IntegerType)

  private val FpMod = 1000000007L
  private val FpMix = 2654435761L

  /** 28-bit token hash from the md5 hex prefix (overflow-safe modular
    * arithmetic under ANSI mode; identical in DuckDB via
    * ('0x'||substr(md5(w),1,7))::BIGINT). */
  def tokenHash28(w: Column): Column =
    conv(substring(md5(w), 1, 7), 16, 10).cast(LongType)

  /** Position-sensitive document fingerprint:
    * Σ_i (h28(w_i) · ((i·FpMix) mod M)) mod M, all mod M — a rolling-hash
    * equivalent with order sensitivity but no fold dependency, so it is
    * expressible as one list_transform+list_sum in the oracle. */
  def fingerprint(c: Column): Column = {
    val ts = tokens(c)
    val terms = zip_with(ts, sequence(lit(1), size(ts)),
      (w, i) => (tokenHash28(w) * ((i.cast(LongType) * lit(FpMix)) % lit(FpMod))) % lit(FpMod))
    when(size(ts) === 0, lit(0L)).otherwise(
      aggregate(terms, lit(0L), (acc, v) => acc + v) % lit(FpMod))
  }
}
