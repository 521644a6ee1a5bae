package graft.cascade

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  */
object ResumableCascade {

  def stageTable(i: Int, code: Int) = f"stage_$i%03d_$code"

  /** Run the cascade committing each stage; resume from the last committed
    * stage if `root` already holds prior progress for the same stage list.
    */
  def run(spark: SparkSession, pages: DataFrame, cfg: CascadeConfig, root: String,
          models: Option[Models] = None, pseudoTexts: Seq[String] = Nil): DataFrame = {
    val stages = Cascade.stages(cfg, models, pseudoTexts)

    // find the greatest stage index with a committed snapshot
    val lastDone = stages.indices.reverse
      .find(i => TableIO.currentSnapshot(root, stageTable(i, stages(i).code)).isDefined)

    var df = lastDone match {
      case Some(i) => TableIO.read(spark, root, stageTable(i, stages(i).code))
      case None    =>
        val normalized = Ingest.normalize(pages, cfg)
        val deduped =
          if (cfg.dedupIngest) Ingest.dropDuplicatePages(normalized) else normalized
        Ingest.stampLists(deduped, cfg)
    }
    val startAt = lastDone.map(_ + 1).getOrElse(0)
    for (i <- startAt until stages.length) {
      val code = stages(i).code
      df = stages(i).f(df)
      TableIO.write(df, root, stageTable(i, code))
      // re-read the committed snapshot: truncates lineage AND guarantees the
      // next stage consumes exactly what a restart would consume
      df = TableIO.read(spark, root, stageTable(i, code))
    }
    val labeled = Cascade.finalDecision(df)
    TableIO.write(labeled, root, "pages_labeled")
    TableIO.write(Cascade.metrics(labeled), root, "metrics")
    TableIO.read(spark, root, "pages_labeled")
  }
}
