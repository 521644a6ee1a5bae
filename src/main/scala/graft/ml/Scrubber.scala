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
    * the byte-identity oracle is stable). One native call — same
    * java.util.regex engine and order as the previous `regexp_replace`
    * chain, but a single compact codegen block with patterns compiled once
    * (see functions/ScrubExprs.scala).
    */
  def scrub(t: Column): Column =
    org.apache.spark.sql.GraftColumns.of(
      graft.functions.ScrubExpr(org.apache.spark.sql.GraftColumns.exprOf(t)))

  /** Plain-Scala twin of `scrub` for driver-side expected-value tests. */
  def scrubString(s: String): String = graft.functions.ScrubPatterns.scrub(s)

  /** Deterministic HTML→text: drop script/style subtrees, strip tags,
    * decode the five core entities, collapse whitespace. One native call
    * (same regex engine/order as the previous 8-deep chain).
    */
  def extractText(html: Column): Column =
    org.apache.spark.sql.GraftColumns.of(
      graft.functions.HtmlExtractExpr(org.apache.spark.sql.GraftColumns.exprOf(html)))

  /** Plain-Scala twin of `extractText`. */
  def extractTextString(html: String): String =
    graft.functions.ScrubPatterns.extract(html.getBytes("UTF-8")).toString
}
