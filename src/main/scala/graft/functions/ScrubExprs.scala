package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-call forms of the two value-rewriting regex chains (PII
  * scrub, HTML→text extraction).
  *
  * Semantics are EXACTLY the previous `regexp_replace` Column chains:
  * Spark's RegExpReplace is java.util.regex underneath, and these
  * expressions run the same patterns in the same order through the same
  * engine (`Matcher.replaceAll`; replacements contain no `$`/`\` so the
  * replacement-string processing is inert). The win is generated-code size:
  * each chain used to contribute 3–8 nested regexp codegen blocks to the
  * fused row-local span — a major driver of the janino 64 KB method-limit
  * fallback that silently disabled whole-stage codegen for the whole
  * cascade prefix — and is now one static call with patterns compiled once
  * per JVM instead of referenced per-operator.
  *
  * The DuckDB oracle keeps the SQL regexp_replace chain (OracleSql.qScrub);
  * all patterns stay inside the Java-regex ∩ RE2 common subset as before.
  *
  * Reference analog: windcorr's in-place value adjustment
  * (/root/reference/functions/windcorr/rr_windcorr.r:194-208) and the DEM
  * backfill (functions/IO/read_dem.r:44-58).
  */
object ScrubPatterns {
  val Email: Pattern = Pattern.compile("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")
  val Ssn: Pattern   = Pattern.compile("\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b")
  val Phone: Pattern = Pattern.compile("\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b")

  /** Toxicity lexicon (north_rule: "PII/toxicity scrub"). A deterministic
    * placeholder word list — the corpus is synthetic, so the lexicon is a
    * stand-in of the same shape as a production bad-word list: a compiled
    * single-alternation word-boundary regex, matched CASE-INSENSITIVELY
    * (a real lexicon must catch 'Drokk'/'DROKK'; the inline `(?i)` flag is
    * honored identically by java.util.regex and DuckDB's RE2, so the one
    * pattern string serves both the engine and the oracle). The terms are
    * chosen to collide with nothing in the langid seed vocab or the driver
    * testdata (verified: 0 hits over sf0.1 documents.text). Sorted so the
    * pattern string is deterministic.
    */
  val ToxWords: Seq[String] =
    Seq("drokk", "fraggit", "frellox", "gorram", "smeghead", "zarkful")
  /** Inside the Java-regex ∩ RE2 common subset (`\b` is the ASCII word
    * boundary in both engines; `(?i)` + plain alternation of literal words).
    */
  val ToxReStr: String = ToxWords.mkString("(?i)\\b(", "|", ")\\b")
  val Tox: Pattern = Pattern.compile(ToxReStr)

  val Script: Pattern = Pattern.compile("(?s)<(script|style)[^>]*>.*?</(script|style)>")
  val Tag: Pattern    = Pattern.compile("<[^>]*>")
  val Amp: Pattern    = Pattern.compile("&amp;")
  val Lt: Pattern     = Pattern.compile("&lt;")
  val Gt: Pattern     = Pattern.compile("&gt;")
  val Quot: Pattern   = Pattern.compile("&quot;")
  val Apos: Pattern   = Pattern.compile("&#39;")
  val Ws: Pattern     = Pattern.compile("[ \\t\\n\\r]+")

  def scrub(s: String): String = {
    val a = Email.matcher(s).replaceAll("<EMAIL>")
    val b = Ssn.matcher(a).replaceAll("<SSN>")
    val c = Phone.matcher(b).replaceAll("<PHONE>")
    Tox.matcher(c).replaceAll("<TOX>")
  }

  def scrubUtf8(s: UTF8String): UTF8String = UTF8String.fromString(scrub(s.toString))

  def extract(html: Array[Byte]): UTF8String = {
    // decode exactly like StringDecode(html, 'UTF-8'): malformed sequences
    // become U+FFFD (the String constructor's REPLACE action)
    val s = new String(html, java.nio.charset.StandardCharsets.UTF_8)
    val noScript = Script.matcher(s).replaceAll(" ")
    val noTags = Tag.matcher(noScript).replaceAll(" ")
    val d1 = Amp.matcher(noTags).replaceAll("&")
    val d2 = Lt.matcher(d1).replaceAll("<")
    val d3 = Gt.matcher(d2).replaceAll(">")
    val d4 = Quot.matcher(d3).replaceAll("\"")
    val d5 = Apos.matcher(d4).replaceAll("'")
    UTF8String.fromString(Ws.matcher(d5).replaceAll(" ").trim)
  }
}

/** PII/toxicity scrub (email → ssn → phone → tox-lexicon mask) as one
  * native call — string → string.
  */
case class ScrubExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pii_scrub requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = child.dataType
  override def prettyName: String = "pii_scrub"
  override protected def withNewChildInternal(newChild: Expression): ScrubExpr =
    copy(child = newChild)

  protected override def nullSafeEval(input: Any): Any =
    ScrubPatterns.scrubUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ScrubPatterns.scrubUtf8($c);")
}

/** HTML (binary) → extracted text as one native call. */
case class HtmlExtractExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[BinaryType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"html_extract requires a binary input, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "html_extract"
  override protected def withNewChildInternal(newChild: Expression): HtmlExtractExpr =
    copy(child = newChild)

  protected override def nullSafeEval(input: Any): Any =
    ScrubPatterns.extract(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ScrubPatterns.extract($c);")
}
