package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text statistics of a string column.
  *
  * The cascade needs seven counting features per document (code points,
  * spaces, newlines, ASCII letters, ASCII digits, stopword hits, distinct
  * words). Expressed with built-ins each count is its own `regexp_replace`/
  * `replace`/`split` pass (plus String re-allocation), and because several
  * features combine the same counts the work multiplies — profiled at
  * ~3 ms/doc, the single largest cost of the whole filter. Worse, the
  * built-in trees for the stopword and distinct-word counts are so large
  * that a cascade projection stacking them exceeds janino's 64 KB method
  * limit and silently disables whole-stage codegen for the entire row-local
  * stage family. This native expression computes everything in one scan
  * with proper codegen; every scalar feature becomes integer arithmetic
  * over the struct fields, and the fused row-local chain stays inside one
  * compact codegen span.
  *
  * Exact-parity contract (the DuckDB oracle keeps the built-in formulas):
  *   nchars    == length(t)                                 (code points)
  *   nspaces   == length(t) - length(replace(t, ' ', ''))
  *   nlines    == length(t) - length(replace(t, chr(10), ''))
  *   nalpha    == length(regexp_replace(t, '[^A-Za-z]', '', 'g'))
  *   ndigits   == length(regexp_replace(t, '[^0-9]', '', 'g'))
  *   nstophits == Σ_w (length(p) - length(replace(p, ' '||w||' ', ''))) / (len(w)+2)
  *                where p = ' ' || t || ' '   (leftmost non-overlapping,
  *                exactly `replace`'s scan order — adjacent repeats are
  *                undercounted identically in both engines)
  *   ndistinct == size(array_distinct(split(t, ' ')))       (empty tokens
  *                from leading/trailing/double spaces included, as `split`
  *                produces them)
  * Code points are counted as non-continuation bytes; the classified
  * characters are single-byte ASCII, so multi-byte code points fall through
  * to "other" exactly as the regex character classes treat them.
  *
  * Reference analog: TITAN's one-time derived-quantity pass reused by every
  * check (/root/reference/functions/misc/spatconv.r:10-17).
  */
case class TextStatsExpr(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"text_stats requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = TextStatsExpr.schema
  override def prettyName: String = "text_stats"
  override protected def withNewChildInternal(newChild: Expression): TextStatsExpr =
    copy(child = newChild)

  // " w " needles precomputed once per expression instance
  @transient private lazy val needles: Array[String] =
    stopwords.map(w => " " + w + " ").toArray

  protected override def nullSafeEval(input: Any): Any =
    TextStatsExpr.compute(input.asInstanceOf[UTF8String], needles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("needles", needles, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextStatsExpr.compute($c, $ref);")
  }
}

object TextStatsExpr {
  val schema: StructType = StructType(Seq(
    StructField("nchars", IntegerType, nullable = false),
    StructField("nspaces", IntegerType, nullable = false),
    StructField("nlines", IntegerType, nullable = false),
    StructField("nalpha", IntegerType, nullable = false),
    StructField("ndigits", IntegerType, nullable = false),
    StructField("nstophits", IntegerType, nullable = false),
    StructField("ndistinct", IntegerType, nullable = false)))

  def compute(s: UTF8String, needles: Array[String]): InternalRow = {
    val n = s.numBytes
    var nchars = 0; var nspaces = 0; var nlines = 0; var nalpha = 0; var ndigits = 0
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if ((b & 0xc0) != 0x80) nchars += 1
      if (b == ' ') nspaces += 1
      else if (b == '\n') nlines += 1
      else if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) nalpha += 1
      else if (b >= '0' && b <= '9') ndigits += 1
      i += 1
    }

    // The two word-level counts work on the JVM string (one materialization,
    // replacing what was previously several `replace`/`split` allocations per
    // feature). Matching on UTF-16 chars equals matching on UTF-8 bytes here:
    // needles and the space separator are pure ASCII.
    val str = s.toString

    // leftmost non-overlapping occurrences of each " w " in " t " — exactly
    // the scan order of StringReplace, so adjacent repeats undercount the
    // same way the built-in formula does
    var nstophits = 0
    if (needles.length > 0) {
      val padded = " " + str + " "
      var w = 0
      while (w < needles.length) {
        val needle = needles(w)
        var from = padded.indexOf(needle)
        while (from >= 0) {
          nstophits += 1
          from = padded.indexOf(needle, from + needle.length)
        }
        w += 1
      }
    }

    // distinct tokens under split-on-single-space semantics (limit -1:
    // leading/trailing/double spaces yield empty tokens, kept distinct-once)
    val seen = new java.util.HashSet[String]()
    var start = 0
    var j = 0
    val len = str.length
    while (j <= len) {
      if (j == len || str.charAt(j) == ' ') {
        seen.add(str.substring(start, j))
        start = j + 1
      }
      j += 1
    }

    new GenericInternalRow(
      Array[Any](nchars, nspaces, nlines, nalpha, ndigits, nstophits, seen.size))
  }
}
