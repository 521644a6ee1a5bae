package graft.cascade

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.{CascadeConfig, FlagCodes}
import graft.stages._

/** The ordered check cascade — the engine's top-level operator.
  *
  * Order is part of the spec (SURVEY.md §2.6.1; /root/reference/titan.r:115-257):
  * metadata(901) → crossField(301) → langMismatch(902) → plausibility(501) →
  * langBounds(502) → repetition(503) → toxicity(504) → sctFgDual(4) →
  * sctDual(3) → fgt(11) → buddy(10) → sctFg(2) → sct(1) → isolation(800) →
  * good(0). Each stage is a
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

  /** Per-run registry of the checkpoint RDD ids THIS run created — the
    * sweep scope of [[run]]/[[iterate]]. The previous scope (everything
    * registered on the shared SparkContext after the run's baseline) would
    * unpersist blocks a CONCURRENT query, streaming micro-batch, or second
    * cascade run registered mid-run; tracking only ids observed around this
    * run's own localCheckpoint calls confines the sweep to blocks the run
    * provably created. (Residual exposure: a foreign registration landing
    * inside one of our own localCheckpoint calls — a window of a single
    * `persist` call, not the whole run.)
    */
  private[graft] final class RunTracker {
    private val set = scala.collection.mutable.LinkedHashSet.empty[Int]
    def record(ids: Iterable[Int]): Unit = synchronized { set ++= ids }
    def remove(ids: Iterable[Int]): Unit = synchronized { set --= ids }
    def snapshot: Set[Int] = synchronized { set.toSet }
  }

  /** The active run's tracker (thread-local: a cascade run builds its whole
    * plan on one driver thread). [[materialize]] records into it, so the
    * per-group stats checkpoints Neighborhood.joinReady/groupStats create
    * while a stage plan is BUILT are captured too.
    */
  private[graft] val runTracker =
    new scala.util.DynamicVariable[Option[RunTracker]](None)

  /** Materialize a stage input (lazy local checkpoint); storage level per
    * [[ckptLevel]]. (Cluster form: ResumableCascade snapshots.) Records the
    * registered RDD ids into the active [[RunTracker]], if any.
    */
  def materialize(df: DataFrame, eager: Boolean = false): DataFrame =
    runTracker.value match {
      case None => df.localCheckpoint(eager, ckptLevel)
      case Some(t) =>
        val sc = df.sparkSession.sparkContext
        val before = sc.getPersistentRDDs.keySet.toSet
        val c = df.localCheckpoint(eager, ckptLevel)
        t.record(sc.getPersistentRDDs.keySet.toSet.diff(before))
        c
    }

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
    val sc = df.sparkSession.sparkContext
    // scope the per-round sweep to ids THIS iteration created (standalone
    // callers get a fresh tracker; inside Cascade.run the run's tracker is
    // reused so the run-level sweep sees the leftovers too)
    val tracker = runTracker.value.getOrElse(new RunTracker)
    runTracker.withValue(Some(tracker)) {
      var cur = df
      var prevIds: Set[Int] = Set.empty
      var prevFlagged = 0L
      var i = 0
      var converged = false
      while (i < maxIter && !converged) {
        // track the round's blocks (the checkpoint plus any per-group stats
        // checkpoints `once` registered while building) and release the
        // PREVIOUS round's as soon as the new round is materialized — a
        // 4-round iteration otherwise keeps four full light-corpus
        // checkpoints pinned until the next stage-level sweep. The round
        // checkpoint is LAZY: the suspect count below scans every
        // partition and materializes it in the same Spark action (one job
        // per round instead of two); the previous round's blocks are only
        // unpersisted AFTER that count, since the lazy compute reads them.
        val before = tracker.snapshot
        cur = materialize(once(cur), eager = false)
        val added = tracker.snapshot.diff(before)
        val flagged = cur.filter(col(Dqc) === code).count()
        prevIds.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
        tracker.remove(prevIds)
        prevIds = added
        val fresh = flagged - prevFlagged
        prevFlagged = flagged
        i += 1
        converged = fresh <= breakAt
      }
      cur
    }
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
    if (cfg.enabled.contains(Toxicity) && cfg.toxicityActive)
      b += StageDef(Toxicity, selfRef = false, d => RowChecks.toxicity.transform(d, cfg))
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

  /** Synthetic 1:1 reattach key for the payload split. Assigned once, on
    * the frame that is then materialized — both the light and the payload
    * side read the SAME frozen blocks, so the (per-run, partition-derived)
    * ids are consistent between them by construction.
    */
  private[cascade] val RowId = "_graft_rid"

  /** Columns the post-prefix stages actually read. Every `text`/`html`
    * consumer (metadata, backfill, scrub, model features, cross-field,
    * repetition) is row-local and runs in the prefix BEFORE the first
    * self-join stage; the neighborhood family reads only the configured
    * group keys, the row state (doit, prio, dqc), the url HASH (salting and
    * the deterministic neighbor-cap sample — the url string itself is
    * payload from here on) and the specific numeric features it consumes:
    * `f_nwords` (buddy/sct and the dual event), `f_digr` (sctFgDual) and
    * the per-member perplexities (fgt/sctFg). Everything else the prefix
    * derived — the `f_stats` struct, the row-local ratio features, the
    * detected-language pair — is dead after the prefix and travels as
    * payload, which at corpus scale roughly halves the bytes every light
    * checkpoint/stat scan moves (measured via SPARK_GRAFT_SPLIT_DEBUG).
    * SPARK_GRAFT_WIDE_LIGHT=1 restores the carry-all-f_* round-3 set for
    * A/Bs on identical inputs.
    */
  private[cascade] def workingCol(cfg: graft.model.CascadeConfig)(c: String): Boolean =
    if (wideLight)
      c == RowId || c == Url || c == Domain || c == Lang ||
        c == Doit || c == Prio || c == Dqc || c.startsWith("f_")
    else
      c == RowId || c == UrlHash || c == Domain || c == Lang ||
        c == Doit || c == Prio || c == Dqc ||
        c == NWords || c == DigitRatio || c.startsWith(LogPpl) ||
        cfg.buddyKeys.contains(c) || cfg.isolationKeys.contains(c)

  private val wideLight: Boolean = sys.env.contains("SPARK_GRAFT_WIDE_LIGHT")

  /** Group-key dictionary encoding for the light working set: `domain` and
    * `lang` travel as null-preserving xxhash64 codes (one 8-byte fixed slot
    * each) instead of strings (8-byte slot + padded bytes) through every
    * post-prefix checkpoint/snapshot and stats scan — bytes/row of the
    * iterated working set is the single-box DRAM-roofline currency
    * (BENCH/BASELINE.md §1). The post-prefix stages only ever GROUP and
    * JOIN on these columns (equal strings ↔ equal hashes; null stays null,
    * so null keys still never match an equi-join), and the one value
    * comparison (fgt's per-language background lookup) hashes its literals
    * to match. The original strings ride the payload and rejoin at the end,
    * so caller-visible output is unchanged. Collision risk: two domains
    * colliding on xxhash64 would merge their neighborhood statistics —
    * expected colliding PAIRS at 10⁸ domains ≈ (10⁸)²/2⁶⁵ ≈ 3·10⁻⁴, i.e.
    * none, and the consequence is a slightly-blended stat, not corruption
    * (the url already travels as xxhash64 under the same argument).
    * SPARK_GRAFT_NO_KEYCODE=1 restores string keys for A/Bs.
    */
  private val keyCode: Boolean = !sys.env.contains("SPARK_GRAFT_NO_KEYCODE")

  private[cascade] def encodedKeyCols(cfg: graft.model.CascadeConfig,
                                      outCols: Seq[String]): Seq[String] =
    if (!keyCode) Nil
    else Seq(Domain, Lang).filter(c => outCols.contains(c) && workingCol(cfg)(c))

  private[cascade] def encodeKeys(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c,
        when(col(c).isNull, lit(null).cast("long")).otherwise(xxhash64(col(c)))))

  /** Payload split on/off (default on); SPARK_GRAFT_PAYLOAD_SPLIT=off
    * restores the carry-everything behavior for A/Bs.
    */
  private val payloadSplit: Boolean =
    !sys.env.get("SPARK_GRAFT_PAYLOAD_SPLIT").contains("off")

  /** Normalize + stamp lists + fold the enabled checks + final decision.
    * The input of every self-join-shaped stage is materialized first
    * (see StageDef) — the narrow row-local prefix between two such stages
    * stays fused in one codegen span, and each stage's statistics pass
    * reads the materialized blocks instead of recomputing the cascade
    * prefix.
    *
    * Payload split: the self-join stages form a chain of full-corpus
    * materializations, but they only ever read the light working set
    * ([[workingCol]] — ~100 bytes/row). The heavy payload columns (text,
    * scrubbed_text, any caller passthrough) are pure cargo there, and
    * row-based checkpoint blocks have no column pruning — every stats scan
    * and every re-checkpoint would move the text bytes through memory
    * again. Core-count-invariant memory traffic is exactly the term that
    * caps single-box scaling (BENCH/BASELINE.md §1), so after the row-local
    * prefix (the last text consumer) the corpus is materialized ONCE and
    * split: the checks fold over the light projection, and the payload is
    * reattached 1:1 by [[RowId]] at the end. Consumers that never read the
    * payload (e.g. a keep-count) pay only a pruned id-join; the cluster
    * analog is writing stage snapshots without the payload columns and
    * re-joining the immutable ingest table at the end (ResumableCascade
    * gets the same effect from columnar snapshot pruning).
    */
  def run(pages: DataFrame, cfg: CascadeConfig,
          models: Option[Models] = None,
          pseudoTexts: Seq[String] = Nil): DataFrame = {
    // Each selfRef stage's input is eagerly checkpointed (so its two scans
    // share one computation), and everything this run created that the
    // new leaf supersedes — the previous stage's checkpoint, iterate-round
    // leftovers, the per-group stats checkpoints groupStats/joinReady
    // created while the stage plan was BUILT — is unpersisted immediately
    // after the leaf materializes. Without this, blocks stay pinned until
    // driver GC and a long cascade over millions of rows turns into an
    // eviction storm. Sweep scope: ONLY ids recorded by this run's own
    // materialize calls ([[RunTracker]]); concurrent queries', streaming
    // jobs', or callers' caches — whenever registered — are never touched.
    val sc = pages.sparkSession.sparkContext
    val tracker = new RunTracker
    runTracker.withValue(Some(tracker)) {
    var protectedIds: Set[Int] = Set.empty
    def matTracked(d: DataFrame, eager: Boolean = true): (DataFrame, Set[Int]) = {
      val before = tracker.snapshot
      val c = materialize(d, eager)
      (c, tracker.snapshot.diff(before))
    }
    def unpersistIds(ids: Set[Int]): Unit = {
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      tracker.remove(ids)
    }
    def sweepExcept(keep: Set[Int]): Unit =
      unpersistIds(tracker.snapshot.diff(keep).diff(protectedIds))
    def ckpt(d: DataFrame): DataFrame = {
      val (c, added) = matTracked(d)
      sweepExcept(added)
      c
    }
    // UI/diagnostic labels for the run's driver-side actions (guide: label
    // your jobs); thread-local, cleared after each materialization
    def labeled[T](desc: String)(f: => T): T = {
      sc.setJobDescription(desc)
      try f finally sc.setJobDescription(null)
    }
    /** Fold one selfRef stage over a LAZY input checkpoint: the stage's own
      * stats pass (every selfRef stage measures its per-group statistics
      * with a driver action while its plan is built — that is what makes it
      * selfRef) materializes the checkpoint inside that same Spark action,
      * so the separate eager-checkpoint job the old shape paid per stage
      * disappears. The sweep of superseded blocks is DEFERRED until after
      * the stage ran: the lazy checkpoint's compute still reads the
      * previous stage's blocks, and the stage's own stats checkpoints (its
      * broadcast builds read them at the NEXT action) must survive it —
      * both are exactly what the old shape kept alive across this window.
      * A defensive check forces materialization in the (currently
      * impossible) case of a selfRef stage that ran no action, so the
      * sweep can never strand an unmaterialized lineage-truncated plan.
      */
    def foldSelfRef(d: DataFrame, s: StageDef): DataFrame =
      labeled(s"cascade: stage ${s.code}") {
        val (c, added) = matTracked(d, eager = false)
        val before = tracker.snapshot
        val out = s.f(c)
        val fullyCached = sc.getRDDStorageInfo.exists(i =>
          added.contains(i.id) && i.numCachedPartitions == i.numPartitions)
        if (!fullyCached) c.count() // force: see scaladoc
        sweepExcept(added ++ tracker.snapshot.diff(before))
        out
      }
    // ingest-time duplicate drop BEFORE any check (read_data_to_check.r:
    // 122-143): duplicates must never inflate neighborhood statistics.
    // Self-join-shaped, so the input is materialized like selfRef stages;
    // its blocks (still carrying html) are dead the moment the next
    // checkpoint materializes, and the baseline sweep reaps them there.
    // The materialized frame is the PRE-feature normalization (the drop
    // reads only url/warc_ts/text): the checkpoint is narrower by the
    // whole f_* working set, and the feature pass runs once per surviving
    // row, after the drop (result-identical — features are deterministic
    // per row; see Ingest.normalizeCore).
    // LAZY checkpoint: the first downstream action (the first selfRef
    // stage's stats pass, or the payload-split `full` materialization)
    // computes and pins it inside that same Spark action; its blocks are
    // swept by that stage's deferred sweep, by which point both frames
    // are materialized.
    val deduped = if (cfg.dedupIngest) {
      val (m, _) = matTracked(Ingest.normalizeCore(pages, cfg), eager = false)
      Ingest.features(Ingest.dropDuplicatePages(m))
    } else Ingest.normalize(pages, cfg)
    val prepared = Ingest.stampLists(deduped, cfg)
    val stageList = stages(cfg, models, pseudoTexts)
    val firstSelf = stageList.indexWhere(_.selfRef)
    // Catalyst's input-size estimate (exact file bytes for a parquet scan)
    // gates the split: the savings scale with corpus size, the cost is fixed
    val bigEnough =
      pages.queryExecution.optimizedPlan.stats.sizeInBytes >= cfg.payloadSplitMinBytes
    val checked =
      if (firstSelf < 0 || !payloadSplit || !bigEnough)
        stageList.foldLeft(prepared) { case (d, s) =>
          if (s.selfRef) foldSelfRef(d, s) else s.f(d) }
      else {
        val prefixed = stageList.take(firstSelf).foldLeft(prepared) { case (d, s) => s.f(d) }
        val (full, fullIds) = matTracked(prefixed.withColumn(RowId, monotonically_increasing_id()))
        sweepExcept(fullIds) // the ingest-dedup blocks are superseded here
        val outCols = full.columns.filterNot(_ == RowId)
        // key-encoded columns live TWICE: hashed in the light set (grouping/
        // join key) and as strings in the payload (caller-visible output)
        val encKeys = encodedKeyCols(cfg, outCols.toSeq)
        val payloadCols = outCols.filterNot(workingCol(cfg)) ++ encKeys
        // fold the remaining stages; index 0 (the first selfRef stage) is
        // already materialized, so only LATER selfRef inputs re-checkpoint
        def foldRest(start: DataFrame): DataFrame =
          stageList.drop(firstSelf).zipWithIndex.foldLeft(start) {
            case (d, (s, i)) =>
              if (s.selfRef && i > 0) foldSelfRef(d, s) else s.f(d)
          }
        if (payloadCols.isEmpty) {
          foldRest(full).drop(RowId)
        } else {
          // payload stays a LAZY projection of the pinned `full` blocks —
          // materializing it as its own checkpoint would put a second copy
          // of the text bytes in the storage pool next to `full` (measured:
          // eviction/spill churn that nearly doubled the 2M-doc cascade).
          // UnsafeRow field access is offset-based, so the end-join's
          // pruned read of (RowId, payloadCols) never copies bytes the
          // consumer didn't ask for.
          val payload = full.select((RowId +: payloadCols).map(col): _*)
          protectedIds ++= fullIds // `full` stays pinned: it backs `payload`
          val (light, lightIds) =
            matTracked(encodeKeys(
              full.select(full.columns.filter(workingCol(cfg)).map(col): _*), encKeys))
          sweepExcept(lightIds)
          // measurement hook for the working-set-width A/B (pair with
          // SPARK_GRAFT_WIDE_LIGHT): rows and stored bytes of the light
          // checkpoint, i.e. what every post-prefix stat scan re-reads
          if (sys.env.contains("SPARK_GRAFT_SPLIT_DEBUG")) {
            val n = light.count()
            val bytes = sc.getRDDStorageInfo
              .filter(i => lightIds.contains(i.id)).map(i => i.memSize + i.diskSize).sum
            System.err.println(
              f"[cascade] light working set: $n rows, $bytes bytes (${
                bytes.toDouble / math.max(n, 1L)}%.1f B/row, cols=${light.columns.length})")
          }
          foldRest(light)
            .drop(encKeys: _*) // hashed keys: the string originals rejoin below
            .join(payload, Seq(RowId)) // 1:1 by construction
            .select(outCols.map(col): _*)
        }
      }
    finalDecision(checked)
    } // runTracker scope
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
