package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: z-scores of the planted buddy outliers under the fixture
  * config's group statistics — diagnoses per-check F1 misses.
  */
object ProfileBuddyCalib {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tune(SparkSession.builder())
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = io.PagesGen.matchingConfig
    val c = io.PagesGen.generateWithClass(spark, Fixture0.N)
    val labeled = cascade.Cascade.run(c.drop("clazz"), cfg,
      Some(stages.Models.train(spark,
        c.filter(col("clazz") === "clean").select("text", "lang"))),
      io.PagesGen.exemplarTexts())
    // alive at buddy time ≈ final code unset-or-assigned-at/after buddy
    val alive = labeled.filter(col(stages.Cols.Dqc).isin(0, 990, 10, 1, 800))
      .withColumn("x", log1p(col(stages.Cols.NWords)))
    val st = alive.groupBy(stages.Cols.Domain).agg(
      count(lit(1)).as("n"), avg("x").as("mean"), stddev_pop("x").as("sd"))
    labeled.filter(col("ge_check") === 10)
      .withColumn("x", log1p(col(stages.Cols.NWords)))
      .join(st, stages.Cols.Domain)
      .withColumn("z", abs(col("x") - col("mean")) / col("sd"))
      .select("url", stages.Cols.Domain, stages.Cols.Dqc, stages.Cols.NWords,
        "n", "mean", "sd", "z")
      .orderBy("z").show(45, false)
    spark.stop()
  }
}

object Fixture0 { val N = 3000L }
