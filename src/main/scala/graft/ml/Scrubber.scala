package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrub + HTML→text extraction — the engine's two value-rewriting
  * (non-flagging) transforms.
  *
  * Reference archetype: rr_windcorr adjusts still-good values in place while
  * preserving the original (`data$rawvalue`)
  * (/root/reference/functions/windcorr/rr_windcorr.r:194-208); our scrub
  * rewrites `text → scrubbed_text` for alive rows and keeps `text` intact.
  * The HTML extraction is the DEM-fill analog: deterministic backfill of a
  * missing field from a sibling source
  * (functions/IO/read_dem.r:44-58), byte-identical per url (input_hint).
  *
  * Everything here is a chain of `regexp_replace` Column expressions —
  * whole-stage-codegen'd, no UDF — and every pattern is restricted to the
  * regex subset with identical semantics in Java regex (Spark) and RE2
  * (DuckDB), so the scrub has a SQL oracle.
  */
object Scrubber {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val SsnRe   = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  val PhoneRe = "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"

  /** Fixed order: email → ssn → phone (disjoint patterns; order fixed so
    * the byte-identity oracle is stable).
    */
  def scrub(t: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(t, EmailRe, "<EMAIL>"),
        SsnRe, "<SSN>"),
      PhoneRe, "<PHONE>")

  /** Plain-Scala twin of `scrub` for driver-side expected-value tests. */
  def scrubString(s: String): String =
    s.replaceAll(EmailRe, "<EMAIL>")
      .replaceAll(SsnRe, "<SSN>")
      .replaceAll(PhoneRe, "<PHONE>")

  /** Deterministic HTML→text: drop script/style subtrees, strip tags,
    * decode the five core entities, collapse whitespace. Column-level.
    */
  def extractText(html: Column): Column = {
    val noScript = regexp_replace(decode(html, "UTF-8"),
      "(?s)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noTags = regexp_replace(noScript, "<[^>]*>", " ")
    val decoded =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(noTags, "&amp;", "&"),
              "&lt;", "<"),
            "&gt;", ">"),
          "&quot;", "\""),
        "&#39;", "'")
    trim(regexp_replace(decoded, "[ \\t\\n\\r]+", " "))
  }

  /** Plain-Scala twin of `extractText`. */
  def extractTextString(html: String): String = {
    val noScript = html.replaceAll("(?s)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noTags = noScript.replaceAll("<[^>]*>", " ")
    val decoded = noTags.replaceAll("&amp;", "&").replaceAll("&lt;", "<")
      .replaceAll("&gt;", ">").replaceAll("&quot;", "\"").replaceAll("&#39;", "'")
    decoded.replaceAll("[ \\t\\n\\r]+", " ").trim
  }
}
