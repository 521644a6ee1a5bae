package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass 64-bit SimHash of a document: one native scan computes the
  * entire signature per row — no token explode, no 64-aggregate shuffle.
  *
  * Portability contract (the DuckDB oracle keeps the exploded SQL form, see
  * OracleSql.simhash64Ctes): tokens are the maximal runs between single
  * 0x20 bytes of the UTF-8 text (== `split(text, ' ')`), empty tokens are
  * skipped, and each token contributes via the first 16 hex nibbles of
  * `md5(token)`: bit b of the signature reads bit (b mod 4) of nibble
  * floor(b/4); the per-bit vote is sum over tokens of (2·bit − 1) and the
  * output bit is 1 iff the vote is positive. The signature is exposed as
  * four 16-bit words sh0..sh3 (word j = bits 16j..16j+15) plus the
  * non-empty-token count `ntok` (callers drop rows with ntok == 0, matching
  * the exploded form where a tokenless doc simply produces no row).
  *
  * This replaces a ~256-branch CASE-chain nibble extraction + 64-column
  * aggregation (19.4 s for 5k docs in the round-2 driver bench — one third
  * of the whole bench) with one MD5 per token and integer bit math, and it
  * removes the groupBy shuffle entirely: at 100 TB the signature pass
  * becomes embarrassingly parallel map work.
  *
  * Reference analog: the one-pass kernel spirit of TITAN's vectorized
  * statistics kernels (/root/reference/functions/misc/statistics_util.r:15-98).
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = SimHash64Expr.schema
  override def prettyName: String = "simhash64"
  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)

  protected override def nullSafeEval(input: Any): Any =
    SimHash64Expr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64Expr.compute($c);")
}

object SimHash64Expr {
  val schema: StructType = StructType(Seq(
    StructField("sh0", IntegerType, nullable = false),
    StructField("sh1", IntegerType, nullable = false),
    StructField("sh2", IntegerType, nullable = false),
    StructField("sh3", IntegerType, nullable = false),
    StructField("ntok", IntegerType, nullable = false)))

  // MessageDigest is stateful; one instance per task thread, reset per token.
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def compute(s: UTF8String): InternalRow = {
    val bytes = s.getBytes // materialize once; tokens are slices of this
    val n = bytes.length
    val votes = new Array[Int](64)
    var ntok = 0
    val digest = md5.get()
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        if (i > start) { // non-empty token [start, i)
          ntok += 1
          digest.reset()
          digest.update(bytes, start, i - start)
          val d = digest.digest() // 16 bytes; we use the first 8 (16 nibbles)
          var j = 0
          while (j < 16) {
            // nibble j of the hex form: high half of byte j/2 when j even
            val b = d(j >> 1)
            val nib = if ((j & 1) == 0) (b >> 4) & 0xf else b & 0xf
            var k = 0
            while (k < 4) {
              val bit = (nib >> k) & 1
              votes(4 * j + k) += 2 * bit - 1
              k += 1
            }
            j += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    val words = new Array[Any](5)
    var w = 0
    while (w < 4) {
      var acc = 0
      var b0 = 0
      while (b0 < 16) {
        if (votes(16 * w + b0) > 0) acc |= 1 << b0
        b0 += 1
      }
      words(w) = acc
      w += 1
    }
    words(4) = ntok
    new GenericInternalRow(words)
  }
}
