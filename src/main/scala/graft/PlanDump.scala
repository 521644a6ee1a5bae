package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Diagnostic: dump `.explain("formatted")` of declared queries to files —
  * the plan evidence for plans/r06 (the optimization-round deliverable).
  * Not part of the driver contract; Bench/Verify are untouched.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> [suffix] [nameSubstr...]
  * Writes <outDir>/<query>_<suffix>.txt (suffix default "plan").
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = if (args.length > 2) args(2) else "plan"
    val names: String => Boolean =
      if (args.length > 3) n => args.drop(3).exists(n.contains) else _ => true
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.filter(e => names(e._1)).toSeq.sortBy(_._1).foreach {
      case (name, fn) =>
        try {
          spark.sparkContext.setJobDescription(s"plandump: $name")
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
          println(s"[plandump] wrote $name")
          ScalingBench.reapCheckpoints(spark)
        } catch {
          case e: Throwable =>
            System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
    }
    spark.stop()
  }
}
