package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: per-class distribution of the repetition fractions on the
  * fixture corpus — used to calibrate matchingConfig's 503 ceilings.
  */
object ProfileRepCalib {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tune(SparkSession.builder())
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val c = io.PagesGen.generateWithClass(spark, 6000L)
    val f = graft.operators.Repetition.features(c.select("clazz", "text"))
    f.groupBy("clazz").agg(
      count(lit(1)).as("n"),
      round(min("rep_top2_frac"), 3).as("t2_min"),
      round(expr("percentile(rep_top2_frac, 0.5)"), 3).as("t2_med"),
      round(max("rep_top2_frac"), 3).as("t2_max"),
      round(max("rep_dup2_frac"), 3).as("d2_max"),
      round(min("rep_top3_frac"), 3).as("t3_min"),
      round(max("rep_top3_frac"), 3).as("t3_max"),
      round(max("rep_dup3_frac"), 3).as("d3_max"))
      .orderBy("clazz").show(30, false)
    spark.stop()
  }
}
