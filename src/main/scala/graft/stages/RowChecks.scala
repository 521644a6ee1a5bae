package graft.stages

import org.apache.spark.sql.functions._
import graft.model.FlagCodes._

/** The row-local ("plausibility family") checks — each one null-guarded
  * `when` over precomputed feature columns; Catalyst fuses the whole family
  * into one codegen stage and pushes the feature projection to the scan.
  */
object RowChecks {
  import Cols._

  /** 901 — required-field / hard-structure check. Reference:
    * functions/checks/metadata_check.r:23-34 (missing lat/lon/elev/value,
    * elevation outside [zmin,zmax], optional in-box test). Webtext analog:
    * null/blank url or text, text length outside hard bounds. May flag
    * keep-listed rows (metadata_check.r:20).
    */
  val metadata: CheckStage = PredicateStage("metadata", Metadata, flagsKeep = true,
    cfg =>
      col(Url).isNull || length(trim(col(Url))) === 0 ||
      col(Text).isNull || length(trim(col(Text))) === 0 ||
      col(NChars) < cfg.minChars || col(NChars) > cfg.maxChars)

  /** 501 — plausibility: C4/Gopher-style hard bounds on word count, mean
    * word length, symbol ratio. Reference:
    * functions/checks/plausibility_test.r (titanlib range_check vmin/vmax,
    * defaults argparsers/argparser_plausibility.r:4-13). May flag keep rows
    * (plausibility_test.r:7-11).
    */
  val plausibility: CheckStage = PredicateStage("plausibility", Plausibility, flagsKeep = true,
    cfg =>
      col(NWords) < cfg.minWords || col(NWords) > cfg.maxWords ||
      col(MeanWordLen) < cfg.meanWordLen.min || col(MeanWordLen) > cfg.meanWordLen.max ||
      col(SymbolRatio) > cfg.maxSymbolRatio ||
      col(DistinctWordRatio) < cfg.minDistinctWordRatio)

  /** 502 — lang-conditioned bounds: threshold looked up by `lang` the way
    * the reference looks bounds up by month
    * (functions/checks/climatological_check.r:12-28, 12-month tables in
    * argparsers/argparser_climatcheck.r:2-11). Cannot flag keep rows
    * (titan.r:199). The lookup is a CASE chain over a small driver-side map
    * (broadcast-equivalent; stays inside codegen).
    */
  val langBounds: CheckStage = PredicateStage("langBounds", LangBounds, flagsKeep = false,
    cfg => {
      if (cfg.langStopMin.isEmpty) lit(false)
      else {
        val thresh = cfg.langStopMin.foldLeft(lit(Double.NegativeInfinity)) {
          case (acc, (lang, min)) => when(col(Lang) === lang, lit(min)).otherwise(acc)
        }
        col(StopRatio) < thresh
      }
    })

  /** 503 — n-gram repetition ceilings (Gopher-style top/duplicate n-gram
    * fractions), the plausibility-family slot for boilerplate/SEO spam.
    * The reference's analog is the climatological family: a bound looked
    * up from config, applied row-locally (climatological_check.r:12-28).
    * Features are computed inside the stage (row-local sorted-run fold,
    * [[graft.operators.Repetition]]) and dropped after — they are not part
    * of the cascade's persistent working set. Cannot flag keep rows.
    */
  val repetition: CheckStage = new CheckStage {
    val name = "repetition"
    val code = Repetition
    def transform(df: org.apache.spark.sql.DataFrame,
                  cfg: graft.model.CascadeConfig): org.apache.spark.sql.DataFrame = {
      val f = graft.operators.Repetition.features(df, Text)
      Stage.sticky(f,
          col("rep_top2_frac") > cfg.maxTop2GramFrac ||
          col("rep_dup2_frac") > cfg.maxDup2GramFrac ||
          col("rep_top3_frac") > cfg.maxTop3GramFrac,
          code, flagsKeep = false)
        .drop("rep_top2_frac", "rep_dup2_frac", "rep_top3_frac", "rep_dup3_frac")
    }
  }

  /** 504 — toxic-term density ceiling (the flag side of the north_rule's
    * "PII/toxicity scrub"; the value-rewriting side masks the same lexicon
    * in `scrubbed_text`, ml/Scrubber). Density is lexicon hits per word
    * over the ORIGINAL text — the check must see what the scrub removes.
    * One compiled-alternation regexp_count per row (codegen'd builtin);
    * like 502/503, the ceiling is config-driven and cannot flag keep rows.
    */
  val toxicity: CheckStage = PredicateStage("toxicity", Toxicity, flagsKeep = false,
    cfg =>
      col(NWords) > 0 &&
      regexp_count(col(Text), lit(graft.functions.ScrubPatterns.ToxReStr))
        .cast("double") > lit(cfg.maxToxicFrac) * col(NWords).cast("double"))

  /** 902 (heuristic form) — declared vs detected language disagreement,
    * the analog of the reference's station-elevation vs DEM cross-check
    * (functions/checks/check_z_against_dem.r:18-27, |z−zdem| > dz.dem).
    * This SQL-expressible variant calls text "detected English" when the
    * English stopword ratio clears a confidence margin; the model-based
    * variant (char-n-gram langid) lives in ModelChecks. Keep rows exempt
    * (titan.r:184).
    */
  val langMismatchHeuristic: CheckStage =
    PredicateStage("langMismatch", LangMismatch, flagsKeep = false,
      cfg => col(StopRatio) >= cfg.langMismatchMinConf && col(Lang) =!= "en")

  /** 301 — cross-field consistency, analog of the reference's
    * cross-variable check (precip flagged where a *different* field, T2m,
    * is too cold: functions/checks/ccrrt.r:91-96). Webtext: html present
    * but text blank, or text longer than its html source — two columns
    * that cannot disagree this way on a well-formed page.
    */
  val crossField: CheckStage = PredicateStage("crossField", CrossField, flagsKeep = false,
    _ =>
      col(Html).isNotNull && length(col(Html)) > 0 &&
      (col(Text).isNull || length(col(Text)) > length(col(Html))))
}
