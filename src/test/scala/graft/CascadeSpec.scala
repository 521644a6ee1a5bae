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
      FlagCodes.Metadata, FlagCodes.CrossField, FlagCodes.LangMismatch,
      FlagCodes.Plausibility, FlagCodes.LangBounds, FlagCodes.Repetition,
      FlagCodes.SctDual, FlagCodes.Buddy, FlagCodes.Sct, FlagCodes.Isolation)
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
      // materialize every stage output before the diagnostic self-join:
      // joining two lazy copies of the same 14-stage chain and pushing the
      // `prev` predicates through it is a plan no real consumer builds
      // (Cascade.run checkpoints selfRef inputs and ends in an optimizer
      // barrier), and it needlessly recomputes the cascade twice per stage
      cur = Cascade.materialize(s.f(if (s.selfRef) cur.localCheckpoint(true) else cur),
        eager = true)
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

  test("priority rounds: higher-priority providers are judged only by their own class") {
    // Two providers sharing one neighborhood (buddy key = lang, as providers
    // share spatial circles in the reference, buddy.r:112-155): a dense
    // trusted provider A (prio 1) and a sparse wild provider B (prio 0).
    import spark.implicits._
    val rows =
      (1 to 20).map(i => (s"https://a.example/$i", "a.example", "en", 100 + (i % 5))) ++
      (1 to 2).map(i => (s"https://b.example/$i", "b.example", "en", 400))
    val df = rows.toDF("url", "domain", "lang", "nw")
      .withColumn("text", concat_ws(" ", transform(sequence(lit(1), col("nw")), _ => lit("w"))))
      .select("url", "domain", "lang", "text")
    // dedupIngest off: this corpus deliberately reuses identical "w w w…"
    // texts, and the flagship config's ingest dedup would collapse them —
    // this test isolates priority-round semantics
    val base = cfg.copy(buddyKeys = Seq("lang"), buddyZ = 2.5, buddyMinN = 3,
      enabled = Set(FlagCodes.Buddy), blacklistDomains = Set.empty, keepDomains = Set.empty,
      dedupIngest = false, buddyLog1p = false)

    // A first (prio 1): A judged against A only (consistent), then B judged
    // against everything alive — B's outliers get flagged.
    val out1 = Cascade.run(df, base.copy(priorities = Map("a.example" -> 1)))
    assert(out1.filter(col(Cols.Domain) === "b.example" &&
      col(Cols.Dqc) === FlagCodes.Buddy).count() === 2)
    assert(out1.filter(col(Cols.Domain) === "a.example" &&
      col(Cols.Dqc) === FlagCodes.Buddy).count() === 0)

    // B first (prio 1): B judged only by its own tiny class (below buddyMinN,
    // unjudgeable), then A judged against the B-contaminated pool — nothing
    // clears the z threshold. Order of judgement changes the verdict, which
    // is exactly the reference's priority semantics.
    val out2 = Cascade.run(df, base.copy(priorities = Map("b.example" -> 1)))
    assert(out2.filter(col(Cols.Dqc) === FlagCodes.Buddy).count() === 0)
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
