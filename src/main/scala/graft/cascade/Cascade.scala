package graft.cascade

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.{CascadeConfig, FlagCodes}
import graft.stages._

/** The ordered check cascade — the engine's top-level operator.
  *
  * Order is part of the spec (SURVEY.md §2.6.1; /root/reference/titan.r:115-257):
  * metadata(901) → langMismatch(902) → crossField(301) → plausibility(501) →
  * langBounds(502) → sctFgDual(4) → sctDual(3) → fgt(11) → buddy(10) →
  * sctFg(2) → sct(1) → isolation(800) → good(0). Each stage is a
  * null-guarded projection or a group-stats join; the row-local prefix fuses
  * into one codegen span, and Catalyst pushes the feature projection into
  * the scan.
  */
object Cascade {
  import Cols._

  /** Iterate a spatial check to convergence: rerun while the number of new
    * suspects exceeds `breakAt`, up to `maxIter` rounds — removing an
    * outlier changes its neighbors' statistics
    * (/root/reference/functions/checks/buddy.r:97,209; bound like i.sct=10
    * in test/ini/ta_sct.ini:7). Each round is checkpointed to truncate
    * lineage; the per-round suspect count is the driver-side action.
    */
  def iterate(df: DataFrame, maxIter: Int, breakAt: Long, code: Int)
             (once: DataFrame => DataFrame): DataFrame = {
    if (maxIter <= 1) return once(df)
    var cur = df
    var prevFlagged = 0L
    var i = 0
    var converged = false
    while (i < maxIter && !converged) {
      cur = once(cur).localCheckpoint(true)
      val flagged = cur.filter(col(Dqc) === code).count()
      val fresh = flagged - prevFlagged
      prevFlagged = flagged
      i += 1
      converged = fresh <= breakAt
    }
    cur
  }

  /** The ordered stage list for a config. Order mirrors titan.r:115-257:
    * meta(901) → dem-fill+meta2 → windcorr/scrub → ccrrt(301) → dem(902) →
    * plausibility(501) → clim(502) → sct_fg_dual(4) → sct_dual(3) →
    * fgt(11) → buddy(10) → sct_fg(2) → sct(1) → isolation(800).
    * Model-based variants replace the heuristic ones when `models` is given.
    */
  def stages(cfg: CascadeConfig,
             models: Option[Models] = None,
             pseudoTexts: Seq[String] = Nil): Seq[(Int, DataFrame => DataFrame)] = {
    import FlagCodes._
    val b = Seq.newBuilder[(Int, DataFrame => DataFrame)]
    if (cfg.enabled.contains(Metadata)) {
      b += Metadata -> (d => RowChecks.metadata.transform(d, cfg))
      b += Metadata -> (d => ModelChecks.backfillAndRecheck(d, cfg))
    }
    // scrub is non-flagging; code 0 marks it as a transform, always on
    b += Good -> (d => ModelChecks.scrubStage(d))
    models.foreach(m => b += Good -> (d => ModelChecks.withModelFeatures(d, m)))
    if (cfg.enabled.contains(CrossField))
      b += CrossField -> (d => RowChecks.crossField.transform(d, cfg))
    if (cfg.enabled.contains(LangMismatch))
      b += LangMismatch -> (d => models match {
        case Some(_) => ModelChecks.langMismatch(d, cfg)
        case None    => RowChecks.langMismatchHeuristic.transform(d, cfg)
      })
    if (cfg.enabled.contains(Plausibility))
      b += Plausibility -> (d => RowChecks.plausibility.transform(d, cfg))
    if (cfg.enabled.contains(LangBounds))
      b += LangBounds -> (d => RowChecks.langBounds.transform(d, cfg))
    if (cfg.enabled.contains(SctFgDual) && pseudoTexts.nonEmpty)
      b += SctFgDual -> (d => ModelChecks.sctFgDual(d, cfg, pseudoTexts))
    if (cfg.enabled.contains(SctDual))
      b += SctDual -> (d => Neighborhood.dualOnce(d, cfg))
    models.foreach { m =>
      if (cfg.enabled.contains(Fgt))
        b += Fgt -> (d => ModelChecks.fgt(d, cfg, m))
    }
    if (cfg.enabled.contains(Buddy))
      b += Buddy -> (d => iterate(d, cfg.buddyMaxIter, cfg.buddyBreakAt, Buddy)(
        Neighborhood.buddyOnce(_, cfg)))
    models.foreach { _ =>
      if (cfg.enabled.contains(SctFg))
        b += SctFg -> (d => ModelChecks.sctFg(d, cfg))
    }
    if (cfg.enabled.contains(Sct))
      b += Sct -> (d => iterate(d, cfg.sctMaxIter, cfg.sctBreakAt, Sct)(
        Neighborhood.sctOnce(_, cfg)))
    if (cfg.enabled.contains(Isolation))
      b += Isolation -> (d => Neighborhood.isolationOnce(d, cfg))
    b.result()
  }

  /** Normalize + stamp lists + fold the enabled checks + final decision. */
  def run(pages: DataFrame, cfg: CascadeConfig,
          models: Option[Models] = None,
          pseudoTexts: Seq[String] = Nil): DataFrame = {
    val prepared = Ingest.stampLists(Ingest.normalize(pages, cfg), cfg)
    val checked = stages(cfg, models, pseudoTexts)
      .foldLeft(prepared) { case (d, (_, f)) => f(d) }
    finalDecision(checked)
  }

  /** Surviving nulls are declared good and the boolean keep column is added
    * (functions/misc/final_decision.r:9-47).
    */
  def finalDecision(df: DataFrame): DataFrame =
    df.withColumn(Dqc, coalesce(col(Dqc), lit(FlagCodes.Good)))
      .withColumn(KeepCol, col(Dqc) === FlagCodes.Good || col(Dqc) === FlagCodes.Keep)

  /** Check-level reject counts per provider plus per-partition lineage —
    * the metrics table the north rule requires (reference prints the same
    * counts per check, e.g. buddy.r:185-205, final_decision.r:12-47).
    */
  def metrics(labeled: DataFrame): DataFrame =
    labeled
      .withColumn("partition_id", spark_partition_id())
      .groupBy(col(Domain), col(Dqc), col("partition_id"))
      .agg(count(lit(1)).as("n_docs"))
}
