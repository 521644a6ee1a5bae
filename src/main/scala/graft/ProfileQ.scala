package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool: run one declared query with a job listener, printing every
  * Spark job's wall time + description — locates where a query's seconds
  * go (checkpoint jobs, stats passes, broadcast builds, final action).
  * Usage: runMain graft.ProfileQ <queryName> [reps]
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val qname = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    var b = GraftSession.tune(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // experiment hook: SPARK_GRAFT_TESTCONF="k=v;k=v" for conf A/Bs
    sys.env.get("SPARK_GRAFT_TESTCONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); b = b.config(k, v) })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var record = false
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        if (record) {
          val ph = qe.tracker.phases.map { case (k, v) =>
            f"$k=${(v.endTimeMs - v.startTimeMs)}%dms" }.mkString(" ")
          println(f"[qe] $funcName dur=${durationNs / 1e9}%.3f s  $ph")
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    })
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = if (record) {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        starts.put(j.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = if (record) {
        Option(starts.get(j.jobId)).foreach { case (t0, desc) =>
          println(f"[job] ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%8.3f s  $desc")
        }
      }
    })
    Seq("documents", "lineitem", "orders", "customer", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count() catch { case _: Throwable => }
    }
    try SparkEntry.trainedModels(spark, sfDir) catch { case _: Throwable => }
    try { SparkEntry.entry(spark).count(); ScalingBench.reapCheckpoints(spark) }
    catch { case _: Throwable => }
    val fn = SparkEntry.queries(qname)
    if (sys.env.contains("SPARK_GRAFT_CODEGEN_DEBUG"))
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.WholeStageCodegenExec",
        org.apache.logging.log4j.Level.DEBUG)
    val cg = org.apache.spark.metrics.source.CodegenMetrics
    for (r <- 1 to reps) {
      println(s"=== rep $r ===")
      record = r == reps // only print the warm rep's jobs
      val c0 = cg.METRIC_COMPILATION_TIME.getCount
      val g0 = cg.METRIC_GENERATED_CLASS_BYTECODE_SIZE.getCount
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dc = cg.METRIC_COMPILATION_TIME.getCount - c0
      // mean compile ms over the whole histogram × new compiles ~ compile wall
      val meanMs = cg.METRIC_COMPILATION_TIME.getSnapshot.getMean
      println(f"[total] ${(System.nanoTime() - t0) / 1e9}%8.3f s  " +
        f"codegenCompiles=$dc (~${dc * meanMs / 1000}%.2f s est) " +
        f"classes=${cg.METRIC_GENERATED_CLASS_BYTECODE_SIZE.getCount - g0}")
      record = false
      ScalingBench.reapCheckpoints(spark)
    }
    spark.stop()
  }
}
