package graft.cascade

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, monotonically_increasing_id}
import graft.model.CascadeConfig
import graft.stages.{Ingest, Models}
import graft.io.TableIO

/** Checkpointed cascade: every stage's output is committed as a TableIO
  * snapshot, and a restarted run resumes from the last committed stage
  * instead of recomputing — the north_rule "any stage restarts from the
  * last committed Iceberg snapshot". Stage writes are idempotent (a rerun
  * of a committed stage appends a fresh snapshot; readers only ever see the
  * committed manifest). At cluster scale this also truncates lineage, which
  * the iterate-to-convergence checks need (SURVEY.md §4, "checkpoint
  * between iterations").
  *
  * PAYLOAD-PRUNED SNAPSHOTS (the cluster analog of the batch engine's
  * payload split, Cascade.run scaladoc): the row-local prefix — every
  * text/html consumer — is folded into ONE full-width `prefix` commit that
  * also stamps the 1:1 reattach id. Every subsequent stage snapshot holds
  * only the light working set (Cascade.workingCol: keys, state, numeric
  * features — ~100 bytes/row), because the neighborhood stages never read
  * the payload; parquet being columnar, even the first light projection of
  * `prefix` never moves the text bytes off disk. The payload is re-joined
  * from the immutable `prefix` table by the reattach id once, at the end.
  * Compared to full-width stage snapshots this removes the text bytes from
  * every per-stage write AND every stats-pass re-read — the dominant I/O
  * term of a 10^12-doc cascade, and core-count-invariant, i.e. exactly what
  * caps scaling efficiency.
  *
  * Reference analog: every check's output is the next check's committed
  * input (/root/reference/titan.r:103-263 sequential flag mutation).
  */
object ResumableCascade {

  def stageTable(i: Int, code: Int) = f"stage_$i%03d_$code"
  val PrefixTable = "prefix"

  /** Run the cascade committing each stage; resume from the last committed
    * stage if `root` already holds prior progress for the same stage list.
    *
    * `stopAfterStages`: commit at most this many post-prefix stages and
    * return early WITHOUT the final label/metrics commit — a deterministic
    * stand-in for a mid-run kill, used by the resume-equivalence tests and
    * the scaling bench's resume check. Production callers leave the
    * default.
    */
  def run(spark: SparkSession, pages: DataFrame, cfg: CascadeConfig, root: String,
          models: Option[Models] = None, pseudoTexts: Seq[String] = Nil,
          stopAfterStages: Int = Int.MaxValue): DataFrame = {
    val stages = Cascade.stages(cfg, models, pseudoTexts)
    val firstSelf = stages.indexWhere(_.selfRef)
    val splitAt = if (firstSelf < 0) stages.length else firstSelf
    import Cascade.RowId
    // per-run tracker (Cascade.RunTracker): the per-group stats checkpoints
    // a selfRef stage creates while its plan is built are dead the moment
    // the stage's snapshot commits — reap them per stage instead of letting
    // them pile up across the ~18-stage chain. Scope is ids THIS run
    // created, never a concurrent run's blocks.
    val tracker = new Cascade.RunTracker
    val sc = spark.sparkContext
    def reapRun(): Unit = {
      val ids = tracker.snapshot
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      tracker.remove(ids)
    }
    Cascade.runTracker.withValue(Some(tracker)) {

    // ---- prefix: ingest + the whole row-local chain, committed ONCE with
    // the payload columns and the reattach id. Written before any light
    // stage, so on resume its presence is the progress indicator.
    if (TableIO.currentSnapshot(root, PrefixTable).isEmpty) {
      // dedup over the pre-feature normalization: the duplicate drop's
      // keeper aggregate + semi-join + union scan their input three times,
      // and here that input is a lazy re-read of the source (no local
      // checkpoint — the prefix commit is the durable materialization), so
      // keeping the single-pass text feature scan OUT of the thrice-
      // scanned subtree computes it once per surviving row instead of
      // three times per ingested row (result-identical; normalizeCore).
      val base =
        if (cfg.dedupIngest)
          Ingest.features(Ingest.dropDuplicatePages(Ingest.normalizeCore(pages, cfg)))
        else Ingest.normalize(pages, cfg)
      val prepared = Ingest.stampLists(base, cfg)
      val prefixed = stages.take(splitAt).foldLeft(prepared) { case (d, s) => s.f(d) }
      // the id is persisted WITH the data, so it is stable across restarts
      // by construction (a resumed run reads it, never re-derives it)
      TableIO.write(prefixed.withColumn(RowId, monotonically_increasing_id()),
        root, PrefixTable)
    }
    val prefixDf = TableIO.read(spark, root, PrefixTable)
    val outCols = prefixDf.columns.filterNot(_ == RowId)
    // key-encoded grouping columns (Cascade.encodeKeys): hashed in every
    // light stage snapshot, re-joined as strings from the prefix at the end
    val encKeys = Cascade.encodedKeyCols(cfg, outCols.toSeq)
    val payloadCols = outCols.filterNot(Cascade.workingCol(cfg)) ++ encKeys

    // ---- light stage chain: resume from the greatest committed stage
    val lastDone = (splitAt until stages.length).reverse
      .find(i => TableIO.currentSnapshot(root, stageTable(i, stages(i).code)).isDefined)
    var light = lastDone match {
      case Some(i) => TableIO.read(spark, root, stageTable(i, stages(i).code))
      // columnar projection: the text bytes stay on disk
      case None => Cascade.encodeKeys(
        prefixDf.select(prefixDf.columns.filter(Cascade.workingCol(cfg)).map(col): _*),
        encKeys)
    }
    val startAt = lastDone.map(_ + 1).getOrElse(splitAt)
    var committed = 0
    for (i <- startAt until stages.length if committed < stopAfterStages) {
      val code = stages(i).code
      // re-read the committed snapshot: truncates lineage AND guarantees the
      // next stage consumes exactly what a restart would consume; a selfRef
      // stage's two stats scans each read the pruned columnar snapshot
      TableIO.write(stages(i).f(light), root, stageTable(i, code))
      light = TableIO.read(spark, root, stageTable(i, code))
      reapRun() // the stage's build-time stats checkpoints are committed now
      committed += 1
    }
    if (committed >= stopAfterStages) return light // simulated mid-run kill

    // ---- payload reattach (1:1 by the persisted id) + final commit
    val joined =
      if (payloadCols.isEmpty) light.drop(RowId)
      else light
        .drop(encKeys: _*) // hashed keys: the string originals rejoin here
        .join(prefixDf.select((RowId +: payloadCols.toSeq).map(col): _*), Seq(RowId))
        .select(outCols.map(col): _*)
    val labeled = Cascade.finalDecision(joined)
    TableIO.write(labeled, root, "pages_labeled")
    TableIO.write(Cascade.metrics(labeled), root, "metrics")
    reapRun()
    TableIO.read(spark, root, "pages_labeled")
    } // runTracker scope
  }
}
