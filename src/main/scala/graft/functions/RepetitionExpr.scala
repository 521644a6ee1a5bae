package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass word n-gram repetition fractions of a string column.
  *
  * Computes, for word 2-grams and 3-grams of the whitespace-token stream,
  *   top{n}_frac = occurrences of the most frequent n-gram / total n-grams
  *   dup{n}_frac = occurrences belonging to n-grams seen > once / total
  * (the Gopher-style repetition signals behind the 503 check). A fraction
  * is null when the document has fewer than n words (no gram population).
  *
  * Why native: the first implementation was an `array_sort` + `aggregate`
  * higher-order-function fold per fraction. Catalyst gives HOF lambdas no
  * whole-stage codegen and no common-subexpression elimination, so inside
  * the fused cascade projection the fold was re-evaluated per downstream
  * reference — measured 0.6 s → 6.9 s on the sf0.1 `q_cascade` (same box,
  * worktree A/B). This expression computes all four fractions in ONE pass
  * with proper codegen, so the 503 stage costs one opaque call per row and
  * the row-local chain stays inside a compact codegen span — the same cure
  * TextStatsExpr applied to the counting features.
  *
  * Exact-parity contract (the DuckDB oracle counts the exploded gram
  * multiset): grams are tokens joined by a single space; tokens are the
  * non-empty pieces of split-on-space, so a gram's joined string is
  * injective in its token sequence and id-sequence equality below equals
  * string equality. Fractions are IEEE double quotients of exact integer
  * counts — bit-identical across engines. The mode of the gram multiset is
  * found as the longest run of the sorted gram-key array (primitive
  * `long[]` sort), mirroring the sorted-run-fold definition the oracle SQL
  * documents.
  */
case class RepetitionExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"repetition_stats requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = RepetitionExpr.schema
  override def prettyName: String = "repetition_stats"
  override protected def withNewChildInternal(newChild: Expression): RepetitionExpr =
    copy(child = newChild)

  protected override def nullSafeEval(input: Any): Any =
    RepetitionExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RepetitionExpr.compute($c);")
}

object RepetitionExpr {
  val schema: StructType = StructType(Seq(
    StructField("top2", DoubleType, nullable = true),
    StructField("dup2", DoubleType, nullable = true),
    StructField("top3", DoubleType, nullable = true),
    StructField("dup3", DoubleType, nullable = true)))

  /** (longest run, occurrences inside runs of length >= 2) of a sorted
    * key array — the mode count and duplicate count of the multiset.
    */
  private def runScan(a: Array[Long]): (Long, Long) = {
    var best = 0L; var dup = 0L; var run = 1L
    var i = 1
    while (i <= a.length) {
      if (i < a.length && a(i) == a(i - 1)) run += 1
      else {
        if (run > best) best = run
        if (run > 1) dup += run
        run = 1
      }
      i += 1
    }
    (best, dup)
  }

  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    val len = str.length

    // token ids: dense ints in first-occurrence order; ids fit an int and
    // two ids pack exactly into one long gram key
    val tokenIds = new java.util.HashMap[String, Integer]()
    var ids = new Array[Int](math.max(8, len / 8))
    var nT = 0
    var start = 0
    var j = 0
    while (j <= len) {
      if (j == len || str.charAt(j) == ' ') {
        if (j > start) { // skip empty tokens (leading/double/trailing spaces)
          val tok = str.substring(start, j)
          var id = tokenIds.get(tok)
          if (id == null) { id = Integer.valueOf(tokenIds.size); tokenIds.put(tok, id) }
          if (nT == ids.length) ids = java.util.Arrays.copyOf(ids, nT * 2)
          ids(nT) = id.intValue(); nT += 1
        }
        start = j + 1
      }
      j += 1
    }

    val out = new Array[Any](4)
    if (nT >= 2) {
      val big = new Array[Long](nT - 1)
      var i = 0
      while (i < nT - 1) {
        big(i) = (ids(i).toLong << 32) | (ids(i + 1).toLong & 0xffffffffL)
        i += 1
      }
      val bigSorted = big.clone()
      java.util.Arrays.sort(bigSorted)
      val (top2, dup2) = runScan(bigSorted)
      val total2 = (nT - 1).toDouble
      out(0) = top2.toDouble / total2
      out(1) = dup2.toDouble / total2

      if (nT >= 3) {
        // a 2-gram's id = its (deterministic) position in the sorted key
        // array: equal keys share every binarySearch result, distinct keys
        // occupy disjoint positions — injective, and rank < 2^31
        val tri = new Array[Long](nT - 2)
        i = 0
        while (i < nT - 2) {
          val rank = java.util.Arrays.binarySearch(bigSorted, big(i))
          tri(i) = (rank.toLong << 32) | (ids(i + 2).toLong & 0xffffffffL)
          i += 1
        }
        java.util.Arrays.sort(tri)
        val (top3, dup3) = runScan(tri)
        val total3 = (nT - 2).toDouble
        out(2) = top3.toDouble / total3
        out(3) = dup3.toDouble / total3
      }
    }
    new GenericInternalRow(out)
  }
}
