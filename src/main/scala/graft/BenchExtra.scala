package graft
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1.4): time a SUBSET of the
  * declared queries with repeats, reporting min/median per query — the
  * driver-contract Bench is frozen, so extra measurements live here.
  * Same session config, warm-up, action (count) and per-query checkpoint
  * hygiene as Bench; NOT part of the driver contract.
  *
  * Usage: runMain graft.BenchExtra [reps] [nameSubstr...]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in Bench;
  *      SPARK_GRAFT_NOOP=1 times a noop-sink write instead of count().
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val names: String => Boolean =
      if (args.length > 1) n => args.drop(1).exists(n.contains) else _ => true
    val noop = sys.env.get("SPARK_GRAFT_NOOP").contains("1")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("documents", "lineitem", "orders", "customer", "embeddings", "events",
        "supplier", "nation").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count() catch { case _: Throwable => }
    }
    try SparkEntry.trainedModels(spark, sfDir) catch { case _: Throwable => }
    try {
      SparkEntry.entry(spark).count()
      ScalingBench.reapCheckpoints(spark)
    } catch { case _: Throwable => }
    val sel = SparkEntry.queries.filter(e => names(e._1)).toSeq.sortBy(_._1)
    val rows = sel.map { case (name, fn) =>
      val ts = (1 to reps).map { r =>
        spark.sparkContext.setJobDescription(s"benchextra: $name rep$r")
        val t0 = System.nanoTime()
        try {
          val df = fn(spark, sfDir)
          if (noop) df.write.format("noop").mode("overwrite").save() else df.count()
        } catch { case e: Throwable =>
          System.err.println(s"[benchextra] $name rep$r FAILED: ${e.getMessage}")
        }
        val t = (System.nanoTime() - t0) / 1e9
        ScalingBench.reapCheckpoints(spark)
        t
      }.sorted
      val med = ts(ts.length / 2)
      println(f"[benchextra] $name%-24s min=${ts.head}%7.3f med=$med%7.3f " +
        ts.map(t => f"$t%.3f").mkString("[", ",", "]"))
      name -> (ts.head, med)
    }
    println(rows.map { case (n, (mn, md)) =>
      s""""$n":{"min":$mn,"med":$md}""" }.mkString("{", ",", "}"))
    spark.stop()
  }
}
