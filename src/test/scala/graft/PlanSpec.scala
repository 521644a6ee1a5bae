package graft

import org.apache.spark.sql.functions._
import graft.model.{CascadeConfig, FlagCodes}
import graft.stages.{Cols, Neighborhood}

/** Physical-plan invariants for the neighborhood stats join-backs.
  *
  * The production input of every spatial stage is a localCheckpoint
  * (LogicalRDD), whose size Catalyst cannot estimate statically — so the
  * static plan for "stats table joined back to the corpus" is always a
  * SortMergeJoin that shuffles the whole corpus by the group key (zipf-skewed
  * on a web corpus). The engine relies on AQE runtime size discovery
  * (Neighborhood.sizeDiscovered: the stats subtree is materialized as its own
  * round-robin shuffle stage) to turn that join into a broadcast at runtime.
  * These tests pin the behavior: if the discovery repartition is removed (or
  * gets elided by the optimizer again), the executed plan regresses to a
  * corpus-wide SortMergeJoin and this suite fails.
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

  private def executedPlanString(df: org.apache.spark.sql.DataFrame): String = {
    // collect() drives THIS DataFrame's queryExecution (count() would build a
    // derived aggregate plan and leave this one's AQE at isFinalPlan=false,
    // i.e. still showing the static SMJ that runtime re-planning replaces)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), s"AQE did not finalize:\n$plan")
    // the AdaptiveSparkPlan string carries BOTH the final and the initial
    // (pre-runtime-replanning) trees; only the final one executes
    plan.split("== Initial Plan ==")(0)
  }

  test("capped groupStats join-back broadcasts at runtime (no corpus-wide SMJ)") {
    val cfg = CascadeConfig(
      enabled = Set(FlagCodes.Buddy),
      blacklistDomains = Set.empty, keepDomains = Set.empty,
      buddyMinN = 5, buddyZ = 4.0,
      maxRefsPerGroup = Some(1000))
    val plan = executedPlanString(Neighborhood.buddyOnce(checkpointedCorpus(), cfg))
    assert(plan.contains("BroadcastHashJoin"),
      s"stats join-back should be broadcast after AQE size discovery:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus must not be shuffled by the skewed group key:\n$plan")
  }

  test("sct order-stats and MAD join-backs broadcast at runtime") {
    val cfg = CascadeConfig(
      enabled = Set(FlagCodes.Sct),
      blacklistDomains = Set.empty, keepDomains = Set.empty,
      sctMinN = 5, sctZ = 4.0)
    val plan = executedPlanString(Neighborhood.sctOnce(checkpointedCorpus(), cfg))
    assert(plan.contains("BroadcastHashJoin"),
      s"order-stats join-backs should be broadcast after AQE size discovery:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus must not be shuffled by the skewed group key:\n$plan")
  }
}
