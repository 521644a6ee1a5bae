package graft.cascade

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.{CascadeConfig, FlagCodes}
import graft.stages._

/** The ordered check cascade — the engine's top-level operator.
  *
  * Order is part of the spec (SURVEY.md §2.6.1; /root/reference/titan.r:115-257):
  * metadata(901) → crossField(301) → langMismatch(902) → plausibility(501) →
  * langBounds(502) → sctFgDual(4) → sctDual(3) → fgt(11) → buddy(10) →
  * sctFg(2) → sct(1) → isolation(800) → good(0). Each stage is a
  * null-guarded projection or a group-stats join; the row-local prefix fuses
  * into one codegen span, and Catalyst pushes the feature projection into
  * the scan.
  */
object Cascade {
  import Cols._

  /** Checkpoint storage level. MEMORY_AND_DISK stores the UnsafeRow
    * batches as-is — SQL rows are already compact byte arrays, not object
    * trees, so "deserialized" costs little extra heap and ZERO codec CPU
    * per scan. MEMORY_AND_DISK_SER pushes every block through the
    * serializer on each write AND each of the many per-stage re-reads; that
    * CPU is core-count-invariant, i.e. exactly the kind of term that caps
    * multi-core scaling. Measured A/B on the identical 2M-doc corpus at
    * local[32] (steady-state rep): SER 304.7 s vs DESER 171.5 s — a 1.78×
    * end-to-end difference. Default is deserialized;
    * SPARK_GRAFT_CKPT_LEVEL=ser restores the round-2 behavior for A/Bs.
    */
  private val ckptLevel: org.apache.spark.storage.StorageLevel =
    sys.env.get("SPARK_GRAFT_CKPT_LEVEL") match {
      case Some("ser") => org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
      case _           => org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    }

  /** Materialize a stage input (lazy local checkpoint); storage level per
    * [[ckptLevel]]. (Cluster form: ResumableCascade snapshots.)
    */
  def materialize(df: DataFrame, eager: Boolean = false): DataFrame =
    df.localCheckpoint(eager, ckptLevel)

  /** One cascade stage. `selfRef` marks the self-join shape — the stage
    * aggregates statistics over its input and joins them back, so it scans
    * the input more than once. Folding such stages over a lazy plan would
    * re-execute the whole upstream (including the model UDF columns) once
    * per scan, compounding per stage — the runtime blows up exponentially
    * in cascade depth. `run` therefore materializes the input of every
    * selfRef stage (localCheckpoint: computes it once, truncates the
    * logical plan); ResumableCascade gets the same effect from its
    * per-stage snapshot commit + re-read, which is the cluster-reliable
    * form (executor-local checkpoint blocks don't survive executor loss).
    */
  final case class StageDef(code: Int, selfRef: Boolean, f: DataFrame => DataFrame)

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
      cur = materialize(once(cur), eager = true)
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
             pseudoTexts: Seq[String] = Nil): Seq[StageDef] = {
    import FlagCodes._
    val b = Seq.newBuilder[StageDef]
    if (cfg.enabled.contains(Metadata)) {
      b += StageDef(Metadata, selfRef = false, d => RowChecks.metadata.transform(d, cfg))
      b += StageDef(Metadata, selfRef = false, d => ModelChecks.backfillAndRecheck(d, cfg))
    }
    // html is consumed only by the backfill and the cross-field check;
    // dropping it as soon as it is dead halves the bytes later stage
    // checkpoints materialize. Folded into the last consumer's stage (not a
    // stage of its own: in ResumableCascade every stage is a full-corpus
    // snapshot, and a pure projection doesn't deserve one).
    val dropHtmlAtCrossField = cfg.enabled.contains(CrossField)
    // scrub is non-flagging; code 0 marks it as a transform, always on
    b += StageDef(Good, selfRef = false, d => {
      val s = ModelChecks.scrubStage(d)
      if (dropHtmlAtCrossField) s else s.drop(Cols.Html)
    })
    models.foreach(m =>
      b += StageDef(Good, selfRef = false, d => ModelChecks.withModelFeatures(d, m)))
    if (cfg.enabled.contains(CrossField))
      b += StageDef(CrossField, selfRef = false,
        d => RowChecks.crossField.transform(d, cfg).drop(Cols.Html))
    if (cfg.enabled.contains(LangMismatch))
      b += StageDef(LangMismatch, selfRef = false, d => models match {
        case Some(_) => ModelChecks.langMismatch(d, cfg)
        case None    => RowChecks.langMismatchHeuristic.transform(d, cfg)
      })
    if (cfg.enabled.contains(Plausibility))
      b += StageDef(Plausibility, selfRef = false, d => RowChecks.plausibility.transform(d, cfg))
    if (cfg.enabled.contains(LangBounds))
      b += StageDef(LangBounds, selfRef = false, d => RowChecks.langBounds.transform(d, cfg))
    // built only when a ceiling is configured (like sctFgDual's pseudoTexts
    // gate): the gram pass costs a per-row sort, pointless at the off
    // defaults (a fraction never exceeds 1.0)
    if (cfg.enabled.contains(Repetition) && cfg.repetitionActive)
      b += StageDef(Repetition, selfRef = false, d => RowChecks.repetition.transform(d, cfg))
    if (cfg.enabled.contains(SctFgDual) && pseudoTexts.nonEmpty)
      b += StageDef(SctFgDual, selfRef = true, d => ModelChecks.sctFgDual(d, cfg, pseudoTexts))
    if (cfg.enabled.contains(SctDual))
      b += StageDef(SctDual, selfRef = true, d => Neighborhood.dualOnce(d, cfg))
    models.foreach { m =>
      if (cfg.enabled.contains(Fgt))
        b += StageDef(Fgt, selfRef = false, d => ModelChecks.fgt(d, cfg, m))
    }
    if (cfg.enabled.contains(Buddy))
      b += StageDef(Buddy, selfRef = true, d =>
        iterate(d, cfg.buddyMaxIter, cfg.buddyBreakAt, Buddy)(Neighborhood.buddyOnce(_, cfg)))
    models.foreach { m =>
      if (cfg.enabled.contains(SctFg))
        b += StageDef(SctFg, selfRef = false, d => ModelChecks.sctFg(d, cfg, m.lms.size))
    }
    if (cfg.enabled.contains(Sct))
      b += StageDef(Sct, selfRef = true, d =>
        iterate(d, cfg.sctMaxIter, cfg.sctBreakAt, Sct)(Neighborhood.sctOnce(_, cfg)))
    if (cfg.enabled.contains(Isolation))
      b += StageDef(Isolation, selfRef = true, d => Neighborhood.isolationOnce(d, cfg))
    b.result()
  }

  /** Normalize + stamp lists + fold the enabled checks + final decision.
    * The input of every self-join-shaped stage is materialized first
    * (see StageDef) — the narrow row-local prefix between two such stages
    * stays fused in one codegen span, and each stage's statistics pass
    * reads the materialized blocks instead of recomputing the cascade
    * prefix.
    */
  def run(pages: DataFrame, cfg: CascadeConfig,
          models: Option[Models] = None,
          pseudoTexts: Seq[String] = Nil): DataFrame = {
    val normalized = Ingest.normalize(pages, cfg)
    // ingest-time duplicate drop BEFORE any check (read_data_to_check.r:
    // 122-143): duplicates must never inflate neighborhood statistics.
    // Self-join-shaped, so the input is materialized like selfRef stages.
    val deduped =
      if (cfg.dedupIngest) Ingest.dropDuplicatePages(materialize(normalized))
      else normalized
    val prepared = Ingest.stampLists(deduped, cfg)
    // Each selfRef stage's input is eagerly checkpointed (so its two scans
    // share one computation), and the PREVIOUS stage's blocks — now
    // superseded by the new leaf — are unpersisted immediately. Without
    // this, every stage's blocks stay pinned until driver GC and a long
    // cascade over millions of rows turns into an eviction storm. Only
    // RDDs this run created are touched (callers' caches are left alone).
    val sc = pages.sparkSession.sparkContext
    var prevCkptIds: Set[Int] = Set.empty
    def ckpt(d: DataFrame): DataFrame = {
      val before = sc.getPersistentRDDs.keySet.toSet
      val c = materialize(d, eager = true)
      val added = sc.getPersistentRDDs.keySet.toSet.diff(before)
      prevCkptIds.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      prevCkptIds = added
      c
    }
    val checked = stages(cfg, models, pseudoTexts)
      .foldLeft(prepared) { case (d, s) => s.f(if (s.selfRef) ckpt(d) else d) }
    finalDecision(checked)
  }

  private val observeId = new java.util.concurrent.atomic.AtomicLong()

  /** Surviving nulls are declared good and the boolean keep column is added
    * (functions/misc/final_decision.r:9-47).
    *
    * The result carries an `observe` metric (total/kept counts — the
    * final_decision.r summary line, surfaced through Spark's observation
    * listener on batch AND streaming). The CollectMetrics node is also a
    * deliberate OPTIMIZATION BARRIER: Catalyst never pushes a predicate
    * below it (that would change the observed counts), so a consumer's
    * `filter(keep)` cannot be substituted down through the ~14 stacked
    * flag projections — that substitution duplicates the dqc chain once
    * per reference per layer (exponential; measured blowing janino's 64 KB
    * method limit, which silently disabled whole-stage codegen for the
    * entire row-local chain) and re-evaluates the whole cascade inside the
    * scan filter. Consumers filter on the materialized label instead,
    * which is both the compiling plan and the cheaper one.
    */
  def finalDecision(df: DataFrame): DataFrame =
    df.withColumn(Dqc, coalesce(col(Dqc), lit(FlagCodes.Good)))
      .withColumn(KeepCol, col(Dqc) === FlagCodes.Good || col(Dqc) === FlagCodes.Keep)
      .observe(s"graft_cascade_${observeId.incrementAndGet()}",
        count(lit(1)).as("n_docs"),
        sum(col(KeepCol).cast("long")).as("n_keep"))

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
