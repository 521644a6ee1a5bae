package graft

import org.apache.spark.sql.functions._
import graft.model.{CascadeConfig, FlagCodes}
import graft.stages.{Cols, Neighborhood}

/** Physical-plan invariants for the neighborhood stats join-backs.
  *
  * The production input of every spatial stage is a localCheckpoint
  * (LogicalRDD), whose size Catalyst cannot estimate statically — so the
  * static plan for "stats table joined back to the corpus" would default to
  * a SortMergeJoin that shuffles the whole corpus by the group key
  * (zipf-skewed on a web corpus). The engine therefore measures the group
  * cardinality at run time and chooses the join form itself
  * (Neighborhood.statsJoinForm): broadcast while the dimension fits, real
  * SMJ + AQE skew split beyond. The broadcast choice must hold in the
  * INITIAL plan, not just the AQE-final one — relying on runtime conversion
  * still materializes the corpus-side probe exchange the static SMJ
  * planned, and was measured propagating a 60 %-of-rows skewed partition
  * into every downstream checkpoint (the round-4 2→8-core scaling deficit).
  * These tests pin both regimes and the result's independence of the form.
  */
class PlanSpec extends SparkSpec {
  import spark.implicits._

  /** Skewed two-domain corpus behind a checkpoint, like a cascade stage
    * input: a LogicalRDD with unknown statistics.
    */
  private def checkpointedCorpus() = {
    val rows = (0 until 3000).map(i => (s"https://big.example/$i", "big.example", "en", i % 97)) ++
      (0 until 50).map(i => (s"https://small.example/$i", "small.example", "en", i % 7))
    rows.toDF("url", "domain", "lang", Cols.NWords)
      .withColumn(Cols.Dqc, lit(null).cast("int"))
      .withColumn(Cols.Doit, lit(1))
      .withColumn(Cols.Prio, lit(0))
      .withColumn(Cols.UrlHash, xxhash64(col("url")))
      .localCheckpoint(true)
  }

  /** (finalPlan, initialPlan) strings of the executed AQE plan. */
  private def executedPlanStrings(df: org.apache.spark.sql.DataFrame): (String, String) = {
    // collect() drives THIS DataFrame's queryExecution (count() would build a
    // derived aggregate plan and leave this one's AQE at isFinalPlan=false)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), s"AQE did not finalize:\n$plan")
    // the AdaptiveSparkPlan string carries BOTH the final and the initial
    // (pre-runtime-replanning) trees; only the final one executes, but the
    // initial one decides which exchanges get materialized along the way
    val parts = plan.split("== Initial Plan ==")
    (parts(0), if (parts.length > 1) parts(1) else parts(0))
  }

  test("capped groupStats join-back is a STATIC broadcast (no corpus-wide SMJ, " +
       "no probe-side exchange planned)") {
    val cfg = CascadeConfig(
      enabled = Set(FlagCodes.Buddy),
      blacklistDomains = Set.empty, keepDomains = Set.empty,
      buddyMinN = 5, buddyZ = 4.0,
      maxRefsPerGroup = Some(1000))
    val (fin, init) = executedPlanStrings(Neighborhood.buddyOnce(checkpointedCorpus(), cfg))
    assert(fin.contains("BroadcastHashJoin"),
      s"stats join-back should be broadcast:\n$fin")
    assert(!fin.contains("SortMergeJoin"),
      s"corpus must not be shuffled by the skewed group key:\n$fin")
    // the load-bearing half: the join must be broadcast BEFORE runtime
    // replanning, or the corpus-side exchange is still written to disk
    assert(init.contains("BroadcastHashJoin") && !init.contains("SortMergeJoin"),
      s"join form must be chosen statically from the measured cardinality:\n$init")
  }

  test("sct fused stats join-back is a static broadcast") {
    val cfg = CascadeConfig(
      enabled = Set(FlagCodes.Sct),
      blacklistDomains = Set.empty, keepDomains = Set.empty,
      sctMinN = 5, sctZ = 4.0)
    val (fin, init) = executedPlanStrings(Neighborhood.sctOnce(checkpointedCorpus(), cfg))
    assert(fin.contains("BroadcastHashJoin"),
      s"order-stats join-backs should be broadcast:\n$fin")
    assert(!fin.contains("SortMergeJoin"),
      s"corpus must not be shuffled by the skewed group key:\n$fin")
    assert(init.contains("BroadcastHashJoin") && !init.contains("SortMergeJoin"),
      s"join form must be chosen statically from the measured cardinality:\n$init")
  }

  test("web-scale regime keeps a real SMJ, and the flags are form-invariant") {
    val base = CascadeConfig(
      enabled = Set(FlagCodes.Buddy),
      blacklistDomains = Set.empty, keepDomains = Set.empty,
      buddyMinN = 5, buddyZ = 4.0,
      maxRefsPerGroup = Some(1000))
    val corpus = checkpointedCorpus()
    val smjCfg = base.copy(statsBroadcastMaxGroups = 0L) // dimension "too big"
    val (_, init) = executedPlanStrings(Neighborhood.buddyOnce(corpus, smjCfg))
    // the STATIC plan must be sort-merge (no broadcast hint). At this toy
    // scale AQE still converts the 22-row table at runtime — the conversion
    // is impossible at the 10⁷⁺-group cardinality the regime models, where
    // the stats side is far above the auto-broadcast threshold.
    assert(init.contains("SortMergeJoin"),
      s"above the broadcast bound the static join must stay sort-merge:\n$init")
    // identical labels under both physical forms
    val a = Neighborhood.buddyOnce(corpus, base)
      .select("url", Cols.Dqc).collect().map(r => r.getString(0) -> r.get(1)).toMap
    val b = Neighborhood.buddyOnce(corpus, smjCfg)
      .select("url", Cols.Dqc).collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(a == b, "join form changed the flags")
  }
}
