package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model._
import graft.stages._
import graft.cascade.Cascade
import graft.io.Docs
import graft.functions.TextFeatures

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry exercises one operator of the engine over the
  * driver-provided parquet tables; `oracleSql` holds the DuckDB-equivalent
  * SQL (generated from the same config via OracleSql so thresholds cannot
  * drift). Model-based checks that SQL cannot express are exposed as
  * rows-only queries (no oracle entry) and verified by ScalaTest F1 gates.
  */
object SparkEntry {
  import FlagCodes._

  /** Config for the documents-table demo corpus (thresholds calibrated so
    * every check fires on some rows of the sf0.01 table).
    */
  val docCfg: CascadeConfig = CascadeConfig(
    minChars = 60, maxChars = 100000,
    minWords = 12, maxWords = 100000,
    meanWordLen = Bounds(3.0, 10.0),
    maxSymbolRatio = 0.30,
    langStopMin = Map("en" -> 0.05),
    langMismatchMinConf = 0.10,
    buddyMinN = 5, buddyZ = 2.0,
    sctMinN = 5, sctZ = 2.5,
    dualMinN = 5, dualEventWords = 85, dualLoFrac = 0.1, dualHiFrac = 0.95,
    isolationMinN = 3,
    blacklistDomains = Set("src19"),
    keepDomains = Set("src7"),
    enabled = Set(Metadata, LangMismatch, Plausibility, LangBounds,
      SctDual, Buddy, Sct, Isolation))

  private def norm(s: SparkSession, dir: String): DataFrame =
    Ingest.normalize(Docs.pages(s, dir), docCfg)

  private def checkQ(stage: DataFrame => DataFrame): (SparkSession, String) => DataFrame =
    (s, dir) => stage(norm(s, dir))
      .select(col("doc_id"), col(Cols.Dqc).cast("int").as("dqc"))
      .orderBy("doc_id")

  /** Flagship: the full quality-filter cascade on sf=0.001. */
  def entry(spark: SparkSession): DataFrame =
    Cascade.run(Docs.pages(spark, "/root/testdata/sf0.001"), docCfg)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- cascade checks (SURVEY.md §2.2/§2.4) ----
    "q_check_metadata"     -> checkQ(RowChecks.metadata.transform(_, docCfg)),
    "q_check_plausibility" -> checkQ(RowChecks.plausibility.transform(_, docCfg)),
    "q_check_langbounds"   -> checkQ(RowChecks.langBounds.transform(_, docCfg)),
    "q_check_langmismatch" -> checkQ(RowChecks.langMismatchHeuristic.transform(_, docCfg)),
    "q_check_buddy"        -> checkQ(Neighborhood.buddyOnce(_, docCfg)),
    "q_check_sct"          -> checkQ(Neighborhood.sctOnce(_, docCfg)),
    "q_check_dual"         -> checkQ(Neighborhood.dualOnce(_, docCfg)),
    "q_check_isolation"    -> checkQ(Neighborhood.isolationOnce(_, docCfg)),
    "q_cascade" -> ((s, dir) =>
      Cascade.run(Docs.pages(s, dir), docCfg)
        .select(col("doc_id"), col(Cols.Dqc).cast("int").as("dqc"), col(Cols.KeepCol).as("keep"))
        .orderBy("doc_id")),

    // ---- text-analysis operators (feature pass; SURVEY.md §2.3 spatconv analog) ----
    "q_text_stats" -> ((s, dir) => {
      val t = col("text")
      Docs.read(s, dir).select(
        col("doc_id"),
        TextFeatures.nChars(t).as("f_nchars"),
        TextFeatures.nWords(t).as("f_nwords"),
        TextFeatures.meanWordLen(t).as("f_mwl"),
        TextFeatures.symbolRatio(t).as("f_symr"),
        TextFeatures.stopwordRatio(t, Ingest.EnStopwords).as("f_stopr"),
        TextFeatures.distinctWordRatio(t).as("f_dwr"),
        TextFeatures.fingerprint(t).as("f_fp")
      ).orderBy("doc_id")
    }),

    // ---- dedup operators ----
    "q_dedup_exact" -> ((s, dir) =>
      Docs.read(s, dir)
        .groupBy(TextFeatures.fingerprint(col("text")).as("fp"))
        .agg(count(lit(1)).as("n_dups"), min("doc_id").as("keep_id"))
        .orderBy("fp")),

    // ---- relational aggregates (SURVEY.md §2.5) ----
    "q_agg_lineitem" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast("bigint")).as("sum_qty"),
          sum(round(col("l_extendedprice") * lit(100)).cast("bigint")).as("price_cents"),
          sum(round((col("l_extendedprice") * (lit(1.0) - col("l_discount"))) * lit(100))
            .cast("bigint")).as("revenue_cents"))
        .orderBy("l_returnflag", "l_linestatus"))
  )

  def oracleSql: Map[String, String] = Map(
    "q_check_metadata"     -> OracleSql.qMetadata(docCfg),
    "q_check_plausibility" -> OracleSql.qPlausibility(docCfg),
    "q_check_langbounds"   -> OracleSql.qLangBounds(docCfg),
    "q_check_langmismatch" -> OracleSql.qLangMismatch(docCfg),
    "q_check_buddy"        -> OracleSql.qBuddy(docCfg),
    "q_check_sct"          -> OracleSql.qSct(docCfg),
    "q_check_dual"         -> OracleSql.qDual(docCfg),
    "q_check_isolation"    -> OracleSql.qIsolation(docCfg),
    "q_cascade"            -> OracleSql.qCascade(docCfg),
    "q_text_stats" ->
      s"""SELECT doc_id, ${OracleSql.nc} AS f_nchars, ${OracleSql.nw} AS f_nwords,
         |${OracleSql.mwl} AS f_mwl, ${OracleSql.symr} AS f_symr,
         |${OracleSql.stopr} AS f_stopr, ${OracleSql.dwr} AS f_dwr,
         |${OracleSql.fingerprint} AS f_fp
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_dedup_exact" ->
      s"""SELECT ${OracleSql.fingerprint} AS fp, CAST(COUNT(*) AS BIGINT) AS n_dups,
         |CAST(MIN(doc_id) AS BIGINT) AS keep_id
         |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,
    "q_agg_lineitem" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(COUNT(*) AS BIGINT) AS n_rows,
        |CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
        |CAST(SUM(CAST(ROUND((l_extendedprice * (1.0 - l_discount)) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
