package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus sampling / partitioning operators for a training-data pipeline.
  *
  * Both operators are deterministic functions of the row (no RNG state), so
  * a re-run over 100 TB — or a resumed run over the un-processed remainder —
  * selects exactly the same rows, the property the reference gets from its
  * fixed provider files + seeds (titan.r argparser defaults; the keep/drop
  * decision must be reproducible per row for the metrics table to be
  * meaningful).
  */
object Sampling {

  /** Threshold hex string for a sampling rate in [0, 1]: a row survives iff
    * the first 8 md5 hex chars of its salted id compare lexicographically
    * below it. 8 lowercase hex chars are uniform on [0, 2^32), so string
    * comparison against floor(rate·2^32) in hex is an exact rate cut —
    * and the identical expression runs in any engine with md5.
    */
  private def rateHex(rate: Double): String =
    if (rate >= 1.0) "zzzzzzzz" // above every hex string: keep all
    else f"${math.max(0L, (rate * 4294967296.0).toLong)}%08x"

  /** Deterministic stratified sampling: per-stratum keep rates applied via a
    * salted hash of the id — no shuffle, no RNG, pure row-local filter (the
    * only shape that is both resumable and cheap at 10^12 docs). Rows whose
    * stratum is absent from `rates` use `defaultRate`.
    */
  def stratifiedHash(df: DataFrame, idCol: String, strataCol: String,
                     rates: Map[String, Double], defaultRate: Double,
                     salt: String): DataFrame = {
    val u = substring(md5(concat(lit(s"$salt#"), col(idCol).cast("string"))), 1, 8)
    val thresh = rates.toSeq.sortBy(_._1).foldLeft(lit(rateHex(defaultRate))) {
      case (acc, (k, r)) =>
        when(col(strataCol) === k, lit(rateHex(r))).otherwise(acc)
    }
    df.filter(u < thresh)
  }

  /** CCNet-style per-stratum quality buckets: split each stratum (language)
    * into head / middle / tail terciles of a quality score. Cut points are
    * EXACT order statistics computed from a distinct-value histogram — the
    * same skew-proof machinery as the sct order-stats pass: per-group state
    * is bounded by the number of DISTINCT score values, not rows, so a
    * billion-doc language costs the same window state as a thousand-doc one
    * (the score is a ratio of small ints — its distinct-value count is
    * bounded by construction). The resulting cut-point table is one row per
    * stratum — broadcast back; the corpus side never shuffles.
    *
    * c1 = smallest score with cumulative count ≥ ⌈n/3⌉, c2 likewise for
    * ⌈2n/3⌉; bucket = head (score ≤ c1), middle (≤ c2), tail. Rows with a
    * NULL score get a NULL bucket (not silently binned).
    */
  def qualityBuckets(df: DataFrame, strataCol: String, scoreCol: Column,
                     out: String = "bucket"): DataFrame = {
    val scored = df.withColumn("_score", scoreCol)
    val hist = scored.filter(col("_score").isNotNull)
      .groupBy(col(strataCol), col("_score")).agg(count(lit(1)).as("_c"))
    val cum = hist.withColumn("_cum",
      sum(col("_c")).over(Window.partitionBy(strataCol).orderBy("_score")))
    val tot = hist.groupBy(col(strataCol)).agg(sum(col("_c")).as("_n"))
    val cuts = cum.join(tot, Seq(strataCol))
      .groupBy(col(strataCol)).agg(
        min(when(col("_cum") >= ceil(col("_n") / 3.0), col("_score"))).as("_c1"),
        min(when(col("_cum") >= ceil(col("_n") * 2.0 / 3.0), col("_score"))).as("_c2"))
    scored.join(broadcast(cuts), Seq(strataCol), "left")
      .withColumn(out,
        when(col("_score").isNull, lit(null).cast("string"))
          .when(col("_score") <= col("_c1"), lit("head"))
          .when(col("_score") <= col("_c2"), lit("middle"))
          .otherwise(lit("tail")))
      .drop("_score", "_c1", "_c2")
  }
}
