package graft

import org.apache.spark.sql.functions._
import graft.model._
import graft.stages._
import graft.cascade.Cascade
import graft.io.Docs

/** Cascade semantics — the invariants from SURVEY.md §2.6 that make the
  * check order part of the spec.
  */
class CascadeSpec extends SparkSpec {
  private def cfg = SparkEntry.docCfg

  test("entry returns labeled rows with a total keep/drop decision") {
    val out = SparkEntry.entry(spark).cache()
    assert(out.count() > 0)
    assert(out.filter(col(Cols.Dqc).isNull).count() === 0)
    val codes = out.select(Cols.Dqc).distinct().collect().map(_.getInt(0)).toSet
    val legal = Set(FlagCodes.Good, FlagCodes.Keep, FlagCodes.Blacklist,
      FlagCodes.Metadata, FlagCodes.LangMismatch, FlagCodes.Plausibility,
      FlagCodes.LangBounds, FlagCodes.SctDual, FlagCodes.Buddy, FlagCodes.Sct,
      FlagCodes.Isolation)
    assert(codes.subsetOf(legal), s"unexpected codes ${codes -- legal}")
    out.unpersist()
  }

  test("sticky first-failure: stages never overwrite a non-null flag") {
    // Fold the stages one at a time; after each stage, every previously
    // non-null flag must be byte-identical (plausibility_test.r:7-11 skeleton).
    val prepared = Ingest.stampLists(Ingest.normalize(Docs.pages(spark, sfDir), cfg), cfg)
    var prev = prepared.select(col("doc_id"), col(Cols.Dqc)).withColumnRenamed(Cols.Dqc, "prev")
    var cur = prepared
    for (s <- Cascade.stages(cfg)) {
      cur = s.f(if (s.selfRef) cur.localCheckpoint(true) else cur)
      val joined = cur.select(col("doc_id"), col(Cols.Dqc)).join(prev, "doc_id")
      val overwritten = joined.filter(
        col("prev").isNotNull && (col(Cols.Dqc).isNull || col(Cols.Dqc) =!= col("prev")) &&
          // metadata/plausibility may legally replace 990 (keep) flags
          !(col("prev") === FlagCodes.Keep &&
            col(Cols.Dqc).isin(FlagCodes.Metadata, FlagCodes.Plausibility))
      ).count()
      assert(overwritten === 0, s"stage ${s.code} overwrote sticky flags")
      prev = cur.select(col("doc_id"), col(Cols.Dqc)).withColumnRenamed(Cols.Dqc, "prev")
    }
  }

  test("keep-list asymmetry: keep rows only flaggable by metadata/plausibility") {
    val out = Cascade.run(Docs.pages(spark, sfDir), cfg)
    val keepDomainRows = out.filter(col(Cols.Domain).isin(cfg.keepDomains.toSeq: _*))
    val badCodes = keepDomainRows
      .filter(!col(Cols.Dqc).isin(FlagCodes.Keep, FlagCodes.Metadata, FlagCodes.Plausibility))
      .count()
    assert(badCodes === 0)
  }

  test("blacklist wins over keeplist and over every check") {
    val out = Cascade.run(Docs.pages(spark, sfDir), cfg)
    val black = out.filter(col(Cols.Domain).isin(cfg.blacklistDomains.toSeq: _*))
    assert(black.count() > 0)
    assert(black.filter(col(Cols.Dqc) =!= FlagCodes.Blacklist).count() === 0)
  }

  test("doit=0 providers are excluded entirely; doit=2 never flagged") {
    val c2 = cfg.copy(doit = Map("src1" -> 0, "src2" -> 2))
    val out = Cascade.run(Docs.pages(spark, sfDir), c2)
    assert(out.filter(col(Cols.Domain) === "src1").count() === 0)
    val src2Flagged = out.filter(col(Cols.Domain) === "src2" &&
      !col(Cols.Dqc).isin(FlagCodes.Good, FlagCodes.Keep)).count()
    assert(src2Flagged === 0)
  }

  test("final decision is total and keep = (dqc in {0, 990})") {
    val out = Cascade.run(Docs.pages(spark, sfDir), cfg)
    val bad = out.filter(
      col(Cols.KeepCol) =!= (col(Cols.Dqc) === FlagCodes.Good || col(Cols.Dqc) === FlagCodes.Keep)
    ).count()
    assert(bad === 0)
  }

  test("metrics table has per-partition lineage and covers all rows") {
    val out = Cascade.run(Docs.pages(spark, sfDir), cfg)
    val m = Cascade.metrics(out)
    assert(m.columns.toSet === Set("domain", "dqc", "partition_id", "n_docs"))
    val total = m.agg(sum("n_docs")).collect()(0).getLong(0)
    assert(total === out.count())
  }

  test("convergence loop terminates and flags at least the single pass") {
    val c2 = cfg.copy(buddyMaxIter = 5, buddyBreakAt = 0L)
    val once = Cascade.run(Docs.pages(spark, sfDir), cfg)
      .filter(col(Cols.Dqc) === FlagCodes.Buddy).count()
    val iter = Cascade.run(Docs.pages(spark, sfDir), c2)
      .filter(col(Cols.Dqc) === FlagCodes.Buddy).count()
    assert(iter >= once)
  }
}
