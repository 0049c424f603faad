package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

/** Data Docs: static HTML rendering of validation results.
  *
  * The reference renders a full documentation site
  * (render/renderer/site_builder.py; checkpoint actions
  * UpdateDataDocsAction, checkpoint/actions.py:697-735). The engine-grade
  * subset here is the validation-result page and an index: self-contained
  * HTML (inline CSS, zero assets, no JS) a checkpoint action can drop on
  * any static host. Rendering is pure string work over already-computed
  * `SuiteResult`s — no Spark involvement.
  */
object DataDocs {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def fmt(v: Any): String = v match {
    case null | None => "—"
    case Some(x) => fmt(x)
    case d: Double => if (d == math.rint(d) && math.abs(d) < 1e15)
      d.toLong.toString else f"$d%.6g"
    case s: scala.collection.Seq[_] =>
      s.take(20).map(x => fmt(x)).mkString(", ") +
        (if (s.size > 20) ", …" else "")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => s"$k: ${fmt(x)}" }.mkString("; ")
    case other => String.valueOf(other)
  }

  private val css =
    """body{font-family:system-ui,sans-serif;margin:2rem;color:#1a1a2e}
      |h1{font-size:1.4rem}h2{font-size:1.1rem;margin-top:1.5rem}
      |table{border-collapse:collapse;width:100%;font-size:.9rem}
      |th,td{border:1px solid #d7d7e0;padding:.4rem .6rem;text-align:left;vertical-align:top}
      |th{background:#f2f2f7}
      |.ok{color:#0a7d32;font-weight:600}.bad{color:#b3261e;font-weight:600}
      |.stats span{display:inline-block;margin-right:1.5rem}
      |code{background:#f2f2f7;padding:0 .25rem;border-radius:3px}""".stripMargin

  /** One validation-result page (the per-run page of the reference's
    * rendered site). */
  def renderSuiteResult(sr: SuiteResult, runName: String = ""): String = {
    val st = sr.statistics
    val rows = sr.results.map { e =>
      val status =
        if (e.exception.isDefined) """<td class="bad">ERROR</td>"""
        else if (e.success) """<td class="ok">PASSED</td>"""
        else """<td class="bad">FAILED</td>"""
      val kw = e.kwargs.map { case (k, v) => s"$k=${fmt(v)}" }.mkString(", ")
      val obs = e.exception
        .map(x => s"<code>${esc(x)}</code>")
        .getOrElse(esc(fmt(e.observed.orNull)))
      val sample = e.result.get("partial_unexpected_list")
        .map(v => esc(fmt(v))).getOrElse("")
      s"""<tr>$status<td><code>${esc(e.expectationType)}</code></td>
         |<td>${esc(kw)}</td><td>$obs</td><td>$sample</td></tr>""".stripMargin
    }
    s"""<!DOCTYPE html>
       |<html lang="en"><head><meta charset="utf-8">
       |<title>${esc(sr.suiteName)} — validation result</title>
       |<style>$css</style></head><body>
       |<h1>Validation result: ${esc(sr.suiteName)}${
         if (runName.nonEmpty) s" <small>(${esc(runName)})</small>" else ""}</h1>
       |<p class="stats">
       |<span>Status: ${if (sr.success) """<b class="ok">SUCCESS</b>"""
                        else """<b class="bad">FAILED</b>"""}</span>
       |<span>Evaluated: ${st.evaluatedExpectations}</span>
       |<span>Successful: ${st.successfulExpectations}</span>
       |<span>Unsuccessful: ${st.unsuccessfulExpectations}</span>
       |<span>Success: ${st.successPercent.map(p => f"$p%.2f%%")
                          .getOrElse("—")}</span></p>
       |<h2>Expectations</h2>
       |<table><tr><th>Status</th><th>Expectation</th><th>Arguments</th>
       |<th>Observed</th><th>Unexpected sample</th></tr>
       |${rows.mkString("\n")}
       |</table></body></html>""".stripMargin
  }

  /** Index page linking every rendered result. */
  def renderIndex(entries: Seq[(String, SuiteResult)]): String = {
    val rows = entries.map { case (file, sr) =>
      val cls = if (sr.success) "ok" else "bad"
      s"""<tr><td class="$cls">${if (sr.success) "SUCCESS" else "FAILED"}</td>
         |<td><a href="${esc(file)}">${esc(sr.suiteName)}</a></td>
         |<td>${sr.statistics.successfulExpectations}/${
           sr.statistics.evaluatedExpectations}</td></tr>""".stripMargin
    }
    s"""<!DOCTYPE html>
       |<html lang="en"><head><meta charset="utf-8"><title>Data Docs</title>
       |<style>$css</style></head><body><h1>Data Docs — validation results</h1>
       |<table><tr><th>Status</th><th>Suite</th><th>Passed</th></tr>
       |${rows.mkString("\n")}
       |</table></body></html>""".stripMargin
  }

  /** Write a site (index.html + one page per result) under `dir`. Returns
    * the index path. */
  def writeSite(dir: String, results: Seq[SuiteResult],
      runName: String = ""): Path = {
    val base = Paths.get(dir)
    Files.createDirectories(base)
    val entries = results.zipWithIndex.map { case (sr, i) =>
      val safe = sr.suiteName.replaceAll("[^A-Za-z0-9_.-]", "_")
      val file = s"${i}_$safe.html"
      Files.write(base.resolve(file),
        renderSuiteResult(sr, runName).getBytes(StandardCharsets.UTF_8))
      file -> sr
    }
    val idx = base.resolve("index.html")
    Files.write(idx, renderIndex(entries).getBytes(StandardCharsets.UTF_8))
    idx
  }
}

/** Checkpoint action that renders Data Docs after a run — the analogue of
  * the reference's UpdateDataDocsAction (checkpoint/actions.py:697-735). */
final case class DataDocsAction(dir: String)
    extends SuiteCheckpoint.ValidationAction {
  def run(checkpointName: String, sr: SuiteResult): Unit = {
    DataDocs.writeSite(s"$dir/$checkpointName", Seq(sr), checkpointName): Unit
  }
}
