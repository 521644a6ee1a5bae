package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.cascade.Cascade
import graft.io.PagesGen
import graft.stages.Models

/** Two-cluster-size scaling evidence (BASELINE.json north_rule): run the
  * identical end-to-end filter job on the identical input at N and 4N
  * parallelism (local[8] vs local[32] — the sandbox proxy for N vs 4N
  * executors per the driver instruction) and report throughput at both plus
  * scaling efficiency = (t_N / t_4N) / 4. Target ≥ 0.8.
  *
  * The input corpus is written to parquet once, up front, so both sessions
  * scan byte-identical files; each session does one warm-up pass (JIT) and
  * then `reps` timed passes, keeping the best (steady-state throughput).
  *
  * Usage: runMain graft.ScalingBench [nDocs] [outJson]
  */
object ScalingBench {

  def session(cores: Int): SparkSession = {
    val b = GraftSession.tune(SparkSession.builder())
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      // 4 partitions per core, not 1: (a) skew headroom — with exactly
      // `cores` post-shuffle partitions one zipf-hot domain partition leaves
      // the other slots idle (measured: four 8-task stages at ~50% occupancy
      // in the 4M-doc local[8] event log, ~90 s of wall per rep); (b) a 4x
      // smaller aggregate in-flight working set (cores x partition size),
      // which is what inflates per-task CPU on one box as the corpus grows
      // (measured: task-time sum x1.42 going 2M->4M docs at local[8] while
      // local[2] stayed x1.07). AQE's parallelismFirst coalescing keeps
      // these partitions (>= 1 MB each at these corpus sizes). On a real
      // cluster the same 2-4x-cores rule is the standard setting.
      .config("spark.sql.shuffle.partitions", (4 * cores).toString)
      // smaller scan splits for the same in-flight-bytes reason; the corpus
      // parquet is ~25 MB/file so this also splits multi-file packing
      .config("spark.sql.files.maxPartitionBytes", "32m")
      // A/B hook: AQE's parallelismFirst coalescing shrinks the 4x-cores
      // shuffle partitions back down to ~1.6x cores (e.g. 13 tasks on 8
      // slots = two ragged waves, ~81% packing in the four checkpoint-write
      // stages of the 2M-doc local[8] event log). Disabling coalescing
      // keeps whole waves (32 tasks / 8 slots = 4 full waves).
      .config("spark.sql.adaptive.coalescePartitions.enabled",
        (!sys.env.contains("SPARK_GRAFT_NO_COALESCE")).toString)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // SPARK_GRAFT_EVENTLOG=<dir>: record the Spark event log so a run can be
    // decomposed post-hoc into task time vs driver-serial gaps (used to
    // attribute the core-count-invariant term in the scaling analysis).
    val withLog = sys.env.get("SPARK_GRAFT_EVENTLOG").fold(b) { dir =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      b.config("spark.eventLog.enabled", "true").config("spark.eventLog.dir", dir)
    }
    val s = withLog.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def cascadeJob(spark: SparkSession, path: String, models: Models): Long = {
    // exactly the input_hint relation: (url, warc_ts, html, text, lang)
    val pages = spark.read.parquet(path).select("url", "warc_ts", "html", "text", "lang")
    val labeled = Cascade.run(pages, PagesGen.matchingConfig, Some(models), PagesGen.exemplarTexts())
    // count(keep) forces the full pipeline; no result materialization cost
    labeled.filter(org.apache.spark.sql.functions.col("keep")).count()
  }

  /** Free checkpoint blocks left by a completed run — measurement hygiene:
    * without this a second rep starts with the previous rep's blocks still
    * pinned and measures eviction, not the job.
    */
  def reapCheckpoints(spark: SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    System.gc()
  }

  def timeBest(reps: Int, spark: SparkSession)(f: => Unit): Double = {
    var best = Double.MaxValue
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      f
      val t = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[scaling] rep$r ${t}%.1f s")
      best = math.min(best, t)
      reapCheckpoints(spark)
    }
    best
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 200000L
    val outJson = if (args.length > 1) Some(args(1)) else None
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    // reuse a previously generated corpus dir (pages.parquet + warmup.parquet)
    val reuseDir = sys.env.get("SPARK_GRAFT_CORPUS_DIR")

    // materialize the identical input once (32-way for generation speed);
    // a small warm-up slice compiles codegen/JIT without paying a full pass
    val gen = session(32)
    val dir = reuseDir.getOrElse(Files.createTempDirectory("scalingbench").toString)
    val corpusPath = s"$dir/pages.parquet"
    val warmupPath = s"$dir/warmup.parquet"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(corpusPath)))
      PagesGen.generate(gen, nDocs).write.parquet(corpusPath)
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(warmupPath)))
      PagesGen.generate(gen, math.min(nDocs, 100000L)).write.parquet(warmupPath)
    // published throughput must reflect the corpus actually scanned: a
    // reused dir with a different nDocs would otherwise silently skew
    // docs_per_sec (footer-only count — cheap)
    val actualDocs = gen.read.parquet(corpusPath).count()
    if (actualDocs != nDocs)
      System.err.println(
        s"[scaling] WARNING reused corpus has $actualDocs docs (requested $nDocs); reporting $actualDocs")
    System.err.println(s"[scaling] corpus ready at $dir ($actualDocs docs)")
    val models = Models.train(gen,
      PagesGen.generateWithClass(gen, 10000L)
        .filter(org.apache.spark.sql.functions.col("clazz") === "clean")
        .select("text", "lang"))
    gen.stop()
    System.err.println("[scaling] models trained")

    // SPARK_GRAFT_CORES lets a harness run each parallelism level in its
    // own JVM (the honest analog of two separate clusters — no leftover
    // heap/codegen state from the first level can slow the second).
    val coresList = sys.env.get("SPARK_GRAFT_CORES")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(8, 32))
    val results = coresList.map { cores =>
      val s = session(cores)
      cascadeJob(s, warmupPath, models) // warm-up (JIT, codegen, footer cache)
      reapCheckpoints(s)
      System.err.println(s"[scaling] local[$cores] warmed")
      val best = timeBest(reps, s)(cascadeJob(s, corpusPath, models))
      s.stop()
      cores -> best
    }.toMap

    val json = if (results.size == 2 && results.contains(8) && results.contains(32)) {
      val t8 = results(8); val t32 = results(32)
      val eff = (t8 / t32) / 4.0
      f"""{"metric":"scaling_efficiency","value":$eff%.4f,"unit":"ratio","n_docs":$actualDocs,""" +
        f""""t_local8_sec":$t8%.3f,"t_local32_sec":$t32%.3f,""" +
        f""""docs_per_sec_local8":${actualDocs / t8}%.1f,"docs_per_sec_local32":${actualDocs / t32}%.1f,""" +
        f""""speedup_8_to_32":${t8 / t32}%.3f}"""
    } else {
      results.toSeq.sortBy(_._1).map { case (c, t) =>
        f"""{"metric":"cascade_time","cores":$c,"value":$t%.3f,"unit":"sec","n_docs":$actualDocs,"docs_per_sec":${actualDocs / t}%.1f}"""
      }.mkString("\n")
    }
    println(json)
    outJson.foreach(p => Files.write(java.nio.file.Paths.get(p), json.getBytes("UTF-8")))
  }
}
