package graft.queries

import graft.transcripts.{QualityFilter, Transcripts}

/** DuckDB oracle SQL for the transcript quality-filter pipeline, generated
  * from the SAME model constants the engine broadcasts — one source of truth
  * for vocab, thresholds, and scrub patterns. */
object TranscriptOracles {

  private def sqlList(ws: Iterable[String]): String =
    ws.toSeq.sorted.map(w => s"'$w'").mkString("[", ",", "]")

  /** CASE arm list mapping token → log-prob, grouped by value. */
  private def lpCase: String = {
    val byLp = QualityFilter.unigramLogProb.groupBy(_._2)
      .view.mapValues(_.keys).toSeq.sortBy(_._1)
    byLp.map { case (lp, ws) =>
      s"WHEN list_contains(${sqlList(ws)}, w) THEN $lp"
    }.mkString(" ")
  }

  import QualityFilter._

  /** Per-turn flags + scrub + keep — mirrors QualityFilter.apply exactly. */
  def qfTurnsSql: String = {
    val stop = sqlList(enStopwords)
    s"""WITH transcripts AS (${Transcripts.transcriptSql.trim}),
tok AS (
  SELECT *, list_filter(string_split_regex(lower(text), '[^a-z]+'), w -> w <> '') AS lt
  FROM transcripts
),
scored AS (
  SELECT *,
    CAST(len(list_filter(lt, w -> list_contains($stop, w))) AS INT) AS en_hits,
    CASE WHEN len(lt) = 0 THEN $OovLogProb
         ELSE list_sum(list_transform(lt, w -> CASE $lpCase ELSE $OovLogProb END)) / len(lt)
    END AS avg_logprob
  FROM tok
),
flagged AS (
  SELECT conv_id, turn_idx, role, text, tool, ts, avg_logprob,
    en_hits >= $MinStopwordHits AS lang_ok,
    avg_logprob >= $PplThreshold AS ppl_ok,
    CASE WHEN trim(text) = '' THEN 0
         ELSE CAST(len(string_split_regex(trim(text), ' +')) AS INT) END AS n_tokens,
    CASE WHEN trim(text) = '' THEN 0.0
         ELSE CAST(len(list_distinct(string_split_regex(trim(text), ' +'))) AS DOUBLE)
              / len(string_split_regex(trim(text), ' +')) END AS distinct_ratio,
    CASE WHEN length(text) = 0 THEN 1.0
         ELSE CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
              / length(text) END AS sym_ratio,
    lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role,
    regexp_matches(text, '$EmailRe') AS email_found,
    regexp_matches(text, '$PhoneRe') AS phone_found,
    regexp_matches(text, '$SsnRe') AS ssn_found,
    regexp_matches(text, '$ToxRe') AS tox_found,
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
      '$EmailRe', '[EMAIL]', 'g'), '$SsnRe', '[SSN]', 'g'),
      '$PhoneRe', '[PHONE]', 'g'), '$ToxRe', '[REDACTED]', 'g') AS scrubbed_text
  FROM scored
)
SELECT conv_id, turn_idx, role, text, tool, ts, n_tokens,
  lang_ok, ppl_ok, avg_logprob,
  (n_tokens BETWEEN 3 AND 64) AND length(text) <= 500 AS len_ok,
  sym_ratio <= 0.25 AS symbol_ok,
  (n_tokens < 8 OR distinct_ratio >= 0.5) AS rep_ok,
  (role IN ('system','user','assistant','tool')
    AND (turn_idx <> 0 OR role = 'system')
    AND (prev_role IS NULL OR role <> prev_role OR role = 'tool')) AS role_seq_ok,
  email_found, phone_found, ssn_found,
  (email_found OR phone_found OR ssn_found) AS pii_found,
  tox_found, scrubbed_text,
  (lang_ok AND ppl_ok
    AND ((n_tokens BETWEEN 3 AND 64) AND length(text) <= 500)
    AND sym_ratio <= 0.25
    AND (n_tokens < 8 OR distinct_ratio >= 0.5)
    AND (role IN ('system','user','assistant','tool')
      AND (turn_idx <> 0 OR role = 'system')
      AND (prev_role IS NULL OR role <> prev_role OR role = 'tool'))
    AND NOT tox_found) AS keep
FROM flagged
ORDER BY conv_id, turn_idx"""
  }
}
