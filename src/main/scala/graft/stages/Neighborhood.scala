package graft.stages

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.{CascadeConfig, FlagCodes}

/** The neighborhood ("buddy"/SCT) check family — TITAN's core
  * (SURVEY.md §2.4). A document's neighborhood is its registered domain
  * (the provider analog); each check compares a per-document statistic
  * against an aggregate of its *alive* neighbors, excluding itself
  * (leave-one-out, like the reference kernel's self-exclusion in
  * /root/reference/functions/misc/statistics_util.r:15-98).
  *
  * Scale design — deliberately NOT `Window.partitionBy(domain)`:
  * neighborhood statistics are computed with a two-level (salted)
  * `groupBy` — partial sums per (domain, salt(url)) then merge per domain —
  * and joined back with an explicit `broadcast` of the tiny per-domain
  * stats table. Map-side combine plus the salt level means a giant host
  * domain (50% of a 100 TB corpus on one key) never lands on a single
  * reducer, which `Window.partitionBy(domain)` would force. Leave-one-out
  * aggregates are recovered algebraically from (sum, sumsq, count), so no
  * per-row window pass is ever needed.
  *
  * All sums are over integer features (exact in both Spark and the DuckDB
  * oracle); doubles appear only in the final z-score arithmetic, with the
  * operation order fixed so both engines produce bit-identical IEEE values.
  */
object Neighborhood {
  import Cols._

  /** Exact per-domain (sum, sumsq, count) of `x` (an integral column) over
    * reference-eligible rows, via two-level salted aggregation.
    */
  def groupStats(df: DataFrame, x: Column, cfg: CascadeConfig,
                 refFilter: Column = Stage.referenceEligible,
                 keys: Seq[String] = Seq(Domain)): DataFrame = {
    val xl = when(refFilter, x.cast("long"))
    val keyCols = keys.map(col)
    val partial = df
      .groupBy(keyCols :+ pmod(xxhash64(col(Url)), lit(cfg.saltBuckets.max(1))).as("_salt"): _*)
      .agg(
        sum(xl).as("_ps"),
        sum(xl * xl).as("_pq"),
        count(xl).as("_pn"))
    partial.groupBy(keyCols: _*).agg(
      sum("_ps").as("_s"),
      sum("_pq").as("_q"),
      sum("_pn").as("_n"))
  }

  /** Buddy check (code 10). Reference: functions/checks/buddy.r — each
    * checked observation vs mean ± sd of its neighbors; here the per-doc
    * word count vs its domain's leave-one-out mean/sd. The titanlib-kernel
    * math (neighbors' mean/sd, self excluded) is spelled out in the legacy
    * in-repo kernel statistics_util.r:15-98.
    *
    * Honors priority rounds (buddy.r:112-155): descending priority classes;
    * a round's references are alive rows with prio >= the class, checked
    * rows are the class itself. With no priorities configured this is a
    * single round over everything.
    */
  def buddyOnce(df: DataFrame, cfg: CascadeConfig): DataFrame = {
    val prios = cfg.priorities.values.toSet + 0
    if (prios.size == 1) buddyRound(df, cfg, None)
    else prios.toSeq.sorted(Ordering[Int].reverse)
      .foldLeft(df)((d, p) => buddyRound(d, cfg, Some(p)))
  }

  private def buddyRound(df: DataFrame, cfg: CascadeConfig, prioClass: Option[Int]): DataFrame = {
    val refFilter = prioClass match {
      case Some(p) => Stage.referenceEligible && col(Prio) >= p
      case None    => Stage.referenceEligible
    }
    val stats = groupStats(df, col(NWords), cfg, refFilter, keys = cfg.buddyKeys)
    val joined = df.join(broadcast(stats), cfg.buddyKeys, "left")

    val x    = col(NWords).cast("long")
    val nn   = (col("_n") - lit(1)).cast("double")            // leave-one-out count
    val mean = when(nn > 0, (col("_s") - x).cast("double") / nn)
    val vr   = when(col("_n") > 2,
      ((col("_q") - x * x).cast("double") - nn * mean * mean) /
        (col("_n") - lit(2)).cast("double"))
    val sd   = sqrt(greatest(vr, lit(0.0)))
    val z    = when(sd > 0, (x.cast("double") - mean) / sd)

    val inClass = prioClass.map(p => col(Prio) === p).getOrElse(lit(true))
    val fail = inClass &&
      (col("_n") - lit(1)) >= cfg.buddyMinN && sd > 0.0 && abs(z) > cfg.buddyZ
    Stage.sticky(joined, fail, FlagCodes.Buddy, flagsKeep = false)
      .drop("_s", "_q", "_n")
  }

  /** SCT-resistant analog (code 1): robust z-score — deviation from the
    * domain median in MAD units, "resistant" = robust estimators, exactly
    * the spirit of the reference's resistant elaborations
    * (functions/checks/sct_resistant.r:158-204). Median/MAD are computed
    * with Spark's exact `percentile` aggregate (partial-aggregating, so
    * skew-safe) over alive rows, then broadcast back.
    */
  def sctOnce(df: DataFrame, cfg: CascadeConfig): DataFrame = {
    val aliveX = when(Stage.referenceEligible, col(NWords).cast("double"))
    val med = df.groupBy(col(Domain)).agg(
      percentile(aliveX, lit(0.5)).as("_med"),
      count(aliveX).as("_n"))
    val withMed = df.join(broadcast(med), Seq(Domain), "left")
    val dev = abs(col(NWords).cast("double") - col("_med"))
    val aliveDev = when(Stage.referenceEligible, dev)
    val mad = withMed.groupBy(col(Domain)).agg(
      percentile(aliveDev, lit(0.5)).as("_mad"))
    val joined = withMed.join(broadcast(mad), Seq(Domain), "left")

    val z = when(col("_mad") > 0, dev / (lit(1.4826) * col("_mad")))
    val fail = col("_n") >= cfg.sctMinN && col("_mad") > 0.0 && z > cfg.sctZ
    Stage.sticky(joined, fail, FlagCodes.Sct, flagsKeep = false)
      .drop("_med", "_n", "_mad")
  }

  /** sct_dual analog (code 3): a *binary* attribute per doc (here: "long
    * doc", word count > threshold) checked against the leave-one-out event
    * fraction among domain buddies — the reference's dichotomous check
    * (functions/checks/sct_dual_r.r:112-130; event-fraction kernel
    * statistics_util.r:77-94). Flag when the doc disagrees with a
    * near-unanimous neighborhood.
    */
  def dualOnce(df: DataFrame, cfg: CascadeConfig): DataFrame = {
    val event = (col(NWords) > cfg.dualEventWords).cast("int")
    val stats = groupStats(df.withColumn("_ev", event), col("_ev"), cfg)
      .withColumnRenamed("_s", "_evs").withColumnRenamed("_n", "_evn").drop("_q")
    val joined = df.withColumn("_ev", event)
      .join(broadcast(stats), Seq(Domain), "left")

    val nn   = (col("_evn") - lit(1)).cast("double")
    val frac = when(nn > 0, (col("_evs") - col("_ev").cast("long")).cast("double") / nn)
    val fail = (col("_evn") - lit(1)) >= cfg.dualMinN &&
      ((frac >= cfg.dualHiFrac && col("_ev") === 0) ||
       (frac <= cfg.dualLoFrac && col("_ev") === 1))
    Stage.sticky(joined, fail, FlagCodes.SctDual, flagsKeep = false)
      .drop("_ev", "_evs", "_evn")
  }

  /** Isolation check (code 800): a doc whose domain has too few alive
    * buddies cannot be consistency-checked — flag it low-confidence.
    * Reference: titanlib isolation_check(n=10, dr=25 km)
    * (functions/checks/isolation.r:25-28; count-in-box kernel
    * statistics_util.r:2-12). Leave-one-out: the doc itself doesn't count.
    */
  def isolationOnce(df: DataFrame, cfg: CascadeConfig): DataFrame = {
    val keys = cfg.isolationKeys
    val stats = groupStats(df, lit(1), cfg, keys = keys)
      .select((keys.map(col) :+ col("_n")): _*)
    val joined = df.join(broadcast(stats), keys, "left")
    val fail = coalesce(col("_n"), lit(0L)) - lit(1) < cfg.isolationMinN
    Stage.sticky(joined, fail, FlagCodes.Isolation, flagsKeep = false)
      .drop("_n")
  }
}
