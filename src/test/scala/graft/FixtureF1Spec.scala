package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model._
import graft.stages._
import graft.cascade.Cascade
import graft.io.PagesGen

/** The reference-style acceptance gate (BASELINE.md): generate a corpus with
  * planted defects + ground-truth labels, run the cascade, score detection
  * with contingency metrics; keep/drop F1 must be ≥ 0.99 per check and
  * overall, and scrubbed/extracted text must be byte-identical
  * (reference scorer: /root/reference/test/test_titan_ta_sct.r:10-21).
  */
object Fixture {
  val cfg: CascadeConfig = PagesGen.matchingConfig

  val N = 3000L

  /** F1 of predicted-positive vs truth-positive over a labeled frame. */
  def f1(df: DataFrame, pred: org.apache.spark.sql.Column,
         truth: org.apache.spark.sql.Column): (Double, Long, Long, Long) = {
    val r = df.select(
      sum(when(pred && truth, 1).otherwise(0)).as("tp"),
      sum(when(pred && !truth, 1).otherwise(0)).as("fp"),
      sum(when(!pred && truth, 1).otherwise(0)).as("fn")).collect()(0)
    val (tp, fp, fn) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val p = if (tp + fp == 0) 1.0 else tp.toDouble / (tp + fp)
    val rec = if (tp + fn == 0) 1.0 else tp.toDouble / (tp + fn)
    val f = if (p + rec == 0) 0.0 else 2 * p * rec / (p + rec)
    (f, tp, fp, fn)
  }
}

class FixtureF1Spec extends SparkSpec {
  import Fixture._

  private lazy val corpus = PagesGen.generate(spark, N).cache()
  private lazy val trainSet = PagesGen.generateWithClass(spark, N)
    .filter(col("clazz") === "clean").select("text", "lang").cache()
  private lazy val models = Models.train(spark, trainSet)
  private lazy val labeled = Cascade.run(
    corpus, cfg, Some(models), PagesGen.exemplarTexts()).cache()

  private def perCheckF1(code: Int): Unit = {
    val (f, tp, fp, fn) = f1(labeled, col(Cols.Dqc) === code, col("ge_check") === code)
    if (f < 0.99) {
      // diagnostic dump for threshold calibration
      labeled.filter((col(Cols.Dqc) === code) =!= (col("ge_check") === code))
        .select("url", "lang", Cols.Dqc, "ge_check", Cols.NWords, Cols.StopRatio,
          Cols.MeanWordLen, Cols.DistinctWordRatio, Cols.LogPpl)
        .show(20, false)
    }
    assert(f >= 0.99, s"check $code F1=$f tp=$tp fp=$fp fn=$fn")
  }

  test("overall keep/drop F1 >= 0.99")(
    assert(f1(labeled, !col(Cols.KeepCol), col("ge") === 1)._1 >= 0.99))

  test("metadata (901) F1")(perCheckF1(901))
  test("cross-field (301) F1")(perCheckF1(301))
  test("lang mismatch (902) F1")(perCheckF1(902))
  test("plausibility (501) F1")(perCheckF1(501))
  test("lang bounds (502) F1")(perCheckF1(502))
  test("repetition (503) F1")(perCheckF1(503))
  test("toxicity (504) F1")(perCheckF1(504))
  test("sct_fg_dual (4) F1")(perCheckF1(4))
  test("sct_dual (3) F1")(perCheckF1(3))
  test("fgt (11) F1")(perCheckF1(11))
  test("buddy (10) F1")(perCheckF1(10))
  test("isolation (800) F1")(perCheckF1(800))
  test("blacklist (999) F1")(perCheckF1(999))
  test("keeplist (990) F1")(perCheckF1(990))

  test("sct (1) single-check F1 — shadowed by buddy in the full cascade") {
    val c = PagesGen.generate(spark, N, classes = Seq("sctout"), defectPct = 4)
    val out = Cascade.run(c, cfg.copy(enabled = Set(FlagCodes.Sct),
      blacklistDomains = Set.empty, keepDomains = Set.empty))
    val (f, tp, fp, fn) = f1(out, col(Cols.Dqc) === 1, col("ge_check") === 1)
    assert(f >= 0.99, s"sct F1=$f tp=$tp fp=$fp fn=$fn")
  }

  test("sct_fg perplexity (2) single-check F1") {
    val c = PagesGen.generate(spark, N, classes = Seq("gibberish"), defectPct = 4)
    val out = Cascade.run(c, cfg.copy(enabled = Set(FlagCodes.SctFg),
      blacklistDomains = Set.empty, keepDomains = Set.empty), Some(models))
    val (f, tp, fp, fn) = f1(out, col(Cols.Dqc) === 2, col("ge_check") === 11)
    assert(f >= 0.99, s"sctFg F1=$f tp=$tp fp=$fp fn=$fn")
  }

  test("byte-identical scrubbed/extracted text per url (input_hint invariant)") {
    val bad = labeled.filter(col(Cols.KeepCol) &&
      col(Cols.ScrubbedText) =!= col("expected_text"))
    val n = bad.count()
    if (n > 0) bad.select("url", Cols.ScrubbedText, "expected_text").show(5, false)
    assert(n === 0)
  }

  test("determinism: same corpus and labels at different parallelism") {
    val a = PagesGen.generate(spark, 500L).select("url", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    val b = PagesGen.generate(spark, 500L).repartition(13)
      .select("url", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(a.sameElements(b))
  }
}
