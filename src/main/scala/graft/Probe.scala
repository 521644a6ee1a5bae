package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run one SparkEntry query by name with timing and optional
  * physical-plan dump. Usage: runMain graft.Probe <name> <sfDir> [explain]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // comma-separated names run in sequence in ONE JVM (Bench-order
    // degradation repro); each is timed Bench-style: construction + count
    name.split(",").foreach { nm =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(nm)(spark, sfDir)
      if (args.length > 2 && args(2) == "explain") df.explain("formatted")
      val n = df.count()
      println(f"[probe] $nm rows=$n time=${(System.nanoTime() - t0) / 1e9}%.3f s (construct+count)")
      ScalingBench.reapCheckpoints(spark)
    }
    spark.stop()
  }
}
