package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row
import graft.cascade.Cascade
import graft.model.CascadeConfig
import graft.stages.{Cols, Ingest, Models}

/** Structured-Streaming form of the quality filter — continuous crawl
  * ingest (`readStream` on the landing table → transforms → `writeStream`).
  *
  * Two fidelity levels, both over the same stage definitions as the batch
  * engine (no second implementation to drift):
  *
  *  - [[rowLocalPrefix]]: every stateless check (metadata, html backfill,
  *    PII scrub, model features, cross-field, lang-mismatch, plausibility,
  *    lang-bounds, fgt, sct_fg — all pure projections with broadcast model
  *    lookups) lifted directly onto a streaming DataFrame. One
  *    whole-stage-codegen span per micro-batch, no state store, unlimited
  *    throughput. Optionally deduplicates by url within the watermark
  *    window (the streaming analog of the batch ingest-time duplicate
  *    drop, read_data_to_check.r:122-143).
  *
  *  - [[microBatchCascade]]: the FULL cascade (neighborhood checks
  *    included) via `foreachBatch` — each micro-batch is a complete
  *    snapshot run, so buddy/sct statistics are computed within the batch
  *    window. That is a documented approximation (a batch boundary is a
  *    statistics boundary), matching how the reference processes one
  *    observation snapshot per invocation (titan.r is a per-snapshot batch
  *    job); at crawl scale a micro-batch of one WARC segment is exactly
  *    the snapshot granularity a production pipeline wants.
  *
  * The batch cascade remains the primary surface (SURVEY.md §1.2 scopes the
  * engine as per-snapshot batch); this adapter exists because a 100 TB
  * training-data pipeline ingests continuously and the row-local prefix —
  * which rejects the large majority of defective docs — should not wait
  * for a nightly batch.
  */
object StreamingFilter {

  /** Stateless checks + final decision on a streaming (or batch) frame.
    *
    * `watermarkDedup = Some(delay)` inserts `withWatermark(warc_ts, delay)
    * .dropDuplicates(url, warc_ts)` after normalization — bounded-state
    * exact dedup within the lateness window (Spark drops state older than
    * the watermark, so memory is bounded by window × arrival rate, not
    * corpus size).
    */
  def rowLocalPrefix(pages: DataFrame, cfg: CascadeConfig,
                     models: Option[Models] = None,
                     watermarkDedup: Option[String] = None): DataFrame = {
    val normalized = Ingest.normalize(pages, cfg)
    val deduped = watermarkDedup match {
      case Some(delay) if normalized.isStreaming =>
        normalized.withWatermark(Cols.WarcTs, delay)
          .dropDuplicates(Cols.Url, Cols.WarcTs)
      case _ => normalized
    }
    val prepared = Ingest.stampLists(deduped, cfg)
    val labeled = Cascade.stages(cfg, models)
      .filterNot(_.selfRef) // stateless subset, original order preserved
      .foldLeft(prepared) { case (d, s) => s.f(d) }
    Cascade.finalDecision(labeled)
  }

  /** Full-cascade streaming writer: each micro-batch runs the complete
    * batch cascade (all neighborhood checks) and `sink` receives the
    * labeled frame plus the batch id — typically a snapshot-commit
    * `TableIO.write` (idempotent by batchId) of the labeled table and the
    * per-partition metrics table.
    */
  def microBatchCascade(pages: DataFrame, cfg: CascadeConfig,
                        models: Option[Models] = None,
                        pseudoTexts: Seq[String] = Nil)
                       (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    // Codegen-cache alignment: Spark keys its generated-class cache per
    // session classloader, and every StreamingQuery start clones the
    // session — so every micro-batch cascade executed under the clone
    // recompiles generated code the original session has long since cached
    // (measured: 74 janino compilations ≈ 1.2 s per streaming run whose
    // generated source is byte-identical to the batch plans). Re-binding
    // the batch's analyzed plan onto the ORIGINAL session (the standard
    // foreachBatch re-binding move, also used for temp-view access) makes
    // those lookups hit. A long-lived production query amortizes the
    // compiles either way; this removes the fixed per-query-start cost.
    // Same plan, same data, same results — only the owning session (and
    // with it the codegen cache key) changes.
    val session = pages.sparkSession
    pages.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val rebound = org.apache.spark.sql.GraftColumns.rebind(session, batch)
      sink(Cascade.run(rebound, cfg, models, pseudoTexts), batchId)
    }
  }
}
