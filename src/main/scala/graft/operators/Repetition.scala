package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumns
import graft.functions.RepetitionExpr

/** Repetition quality signals — the canonical webtext filter family
  * (Gopher-style "fraction of characters in the most common n-gram" /
  * "fraction of duplicate n-grams"): for word n-grams of a document,
  *   rep_top{n}_frac = occurrences of the most frequent n-gram / total
  *   rep_dup{n}_frac = occurrences belonging to n-grams seen > once / total
  * Degenerate SEO/boilerplate pages score high on both; the reference's
  * plausibility family (functions/checks/plausibility_test.r) is the analog
  * slot these thresholds plug into (code 503, RowChecks-adjacent).
  *
  * Scale design: completely row-local — all four fractions come from ONE
  * native codegen'd expression per row ([[graft.functions.RepetitionExpr]]:
  * tokenize, pack gram keys into primitive longs, sort, run-length scan).
  * No explode, no groupBy, no shuffle, nothing driver-side: the mode count
  * of a multiset equals the longest run of its sorted form. A 100 TB corpus
  * pays O(w log w) per document on its own partition and nothing else. (The
  * naive shape — explode grams + groupBy(doc, gram) — shuffles the entire
  * token stream of the corpus; don't. The in-between shape — `array_sort` +
  * `aggregate` HOF folds — is also wrong in a fused projection: HOF lambdas
  * get neither codegen nor common-subexpression elimination, measured 10×
  * on the cascade; see RepetitionExpr's scaladoc.)
  */
object Repetition {

  /** Append rep_top2_frac / rep_dup2_frac / rep_top3_frac /
    * rep_dup3_frac for `textCol`. Row-local; see the scale note above.
    */
  def features(df: DataFrame, textCol: String = "text"): DataFrame = {
    val st = GraftColumns.of(RepetitionExpr(GraftColumns.exprOf(col(textCol))))
    df.withColumn("_rep", st)
      .withColumn("rep_top2_frac", col("_rep")("top2"))
      .withColumn("rep_dup2_frac", col("_rep")("dup2"))
      .withColumn("rep_top3_frac", col("_rep")("top3"))
      .withColumn("rep_dup3_frac", col("_rep")("dup3"))
      .drop("_rep")
  }

  // ---- executable specification (differential-tested against the native
  // expression in FeatureSpec; not used in any shipped path) ----

  /** Non-empty whitespace tokens. Bind this to its OWN projection column
    * before referencing it inside higher-order lambdas — Spark HOFs get no
    * common-subexpression elimination, so an inlined `split` would re-run
    * once per element.
    */
  private def words(text: Column): Column =
    filter(split(text, " "), w => w =!= "")

  /** Overlapping word n-grams of a bound words column (null when fewer
    * than n words — no gram population to measure).
    */
  private def grams(ws: Column, n: Int): Column =
    when(size(ws) >= n,
      transform(sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", (1 to n).map(k => element_at(ws, i + lit(k))): _*)))

  /** (top_frac, dup_frac) of a gram array via the sorted run-length fold.
    * State: (prev gram, current run, best run, duplicated occurrences);
    * entering a run's 2nd element credits both, each further element one —
    * a run of length k contributes exactly k duplicated occurrences.
    */
  private def runStats(gs: Column): (Column, Column) = {
    val zero = struct(
      lit(null).cast("string").as("prev"),
      lit(0L).as("run"), lit(0L).as("best"), lit(0L).as("dup"))
    val st = aggregate(array_sort(gs), zero, (acc, g) => {
      val same = acc.getField("prev").isNotNull && acc.getField("prev") === g
      val run2 = when(same, acc.getField("run") + 1).otherwise(lit(1L))
      val dup2 = when(same && acc.getField("run") === 1, acc.getField("dup") + 2)
        .when(same, acc.getField("dup") + 1)
        .otherwise(acc.getField("dup"))
      struct(g.as("prev"), run2.as("run"),
        greatest(acc.getField("best"), run2).as("best"), dup2.as("dup"))
    })
    val total = size(gs).cast("double")
    (when(total > 0, st.getField("best").cast("double") / total),
      when(total > 0, st.getField("dup").cast("double") / total))
  }

  /** The declarative-HOF form of [[features]], kept as the executable
    * specification the native expression is differential-tested against.
    */
  private[graft] def featuresSpec(df: DataFrame, textCol: String = "text"): DataFrame = {
    val ws = df.withColumn("_rep_ws", words(col(textCol)))
      .withColumn("_rep_g2", grams(col("_rep_ws"), 2))
      .withColumn("_rep_g3", grams(col("_rep_ws"), 3))
    val (t2, d2) = runStats(col("_rep_g2"))
    val (t3, d3) = runStats(col("_rep_g3"))
    ws.withColumn("rep_top2_frac", t2)
      .withColumn("rep_dup2_frac", d2)
      .withColumn("rep_top3_frac", t3)
      .withColumn("rep_dup3_frac", d3)
      .drop("_rep_ws", "_rep_g2", "_rep_g3")
  }
}
