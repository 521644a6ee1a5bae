ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "titanspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked run output goes straight to stdout, NOT through sbt's logger: the
// logger prefixes every line with "[info] ", which breaks any consumer that
// parses the one-line JSON contract of Bench/ScalingBench from the process
// output (a JSON line must start with '{').
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // legacy (non-ANSI) arithmetic: x/0 → NULL, matching the DuckDB oracle
  "-Dspark.sql.ansi.enabled=false",
  // The janino compiled-class cache defaults to 100 entries; a session that
  // runs the 36-query driver bench generates far more codegen units, so by
  // the time the 17-stage cascade re-runs its ~30 units have been evicted
  // and every invocation re-pays ~5 s of janino compilation (measured:
  // q_cascade 7.3 s in-bench vs 1.7 s cold in an isolated JVM — the gap is
  // recompilation, not execution). Sized for the full query surface.
  "-Dspark.sql.codegen.cache.maxEntries=5000",
  // ...and whole-stage units embed the per-query codegen-stage id in the
  // generated CLASS NAME (debugging nicety), so two runs of the identical
  // plan produce different source text and never hit that cache. Constant
  // class names make re-invocations of the same pipeline compile-free.
  "-Dspark.sql.codegen.useIdInClassName=false",
  // Pin the heap (-Xms == -Xmx): without it G1 resizes the heap
  // continuously under the allocation-heavy filter workload, and the
  // commit/uncommit churn (page faults + madvise + TLB shootdowns across
  // every core) was measured burning ~90% of ALL cpu in kernel time at
  // local[32] — the single biggest scaling killer found in this sandbox.
  // Back the heap with transparent huge pages (the host has THP in
  // madvise mode). Without this the first pass over a large corpus
  // demand-faults the heap 4 KiB at a time from 32 task threads at once
  // and the kernel mmap_lock serializes them — measured 279 s for a stage
  // that takes 15.6 s once the heap is faulted (8-thread run: 71 s — the
  // contention is superlinear in thread count). 2 MiB pages cut the fault
  // count 512x (and TLB pressure with it), which removes the contention.
  // AlwaysPreTouch faults the whole heap in at JVM start, BEFORE any
  // timed work. Measured matrix on this host (stage08 at local[32],
  // 400k docs): no flags → 279 s first pass; THP without pretouch →
  // unstable (direct-compaction storms on later passes, 78–317 s); THP
  // with pretouch → 16–20 s on every pass at every core count. The
  // pretouch itself is slow on this virtualized host (~13 min for 48 GiB)
  // but it is a one-time untimed startup cost — exactly the trade a
  // long-lived production executor makes. The pair is enabled for EVERY
  // forked JVM: a 16 g pretouch costs ~2 min at startup and buys stable
  // allocation-heavy phases for the whole JVM lifetime (without it the
  // bench JVM progressively degrades: a 1 s groupBy measured at 60 s
  // after a dozen cascade queries). Hosts with less free memory can opt
  // out with SPARK_GRAFT_SMALL_HEAP=1 (plain -Xmx4g, no pretouch — dev
  // convenience only; never use it for timed runs).
) ++ {
  val mem = sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")
  if (sys.env.contains("SPARK_GRAFT_SMALL_HEAP")) Seq("-Xmx4g")
  else Seq(s"-Xmx$mem", s"-Xms$mem",
    "-XX:+UseTransparentHugePages", "-XX:+AlwaysPreTouch")
}
