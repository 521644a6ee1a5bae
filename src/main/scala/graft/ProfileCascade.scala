package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.cascade.Cascade
import graft.io.PagesGen
import graft.stages.{Ingest, Models}

/** Dev tool: per-stage wall-clock of the full cascade at a given core count.
  * Usage: runMain graft.ProfileCascade [cores] [nDocs]
  */
object ProfileCascade {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 32
    val nDocs = if (args.length > 1) args(1).toLong else 200000L

    val spark = ScalingBench.session(cores)
    val dir = Files.createTempDirectory("profile").toString
    var t0 = System.nanoTime()
    def lap(name: String): Unit = {
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      t0 = System.nanoTime()
    }
    PagesGen.generate(spark, nDocs).write.parquet(s"$dir/pages.parquet")
    lap("generate+write")
    val models = Models.train(spark,
      PagesGen.generateWithClass(spark, 10000L)
        .filter(org.apache.spark.sql.functions.col("clazz") === "clean")
        .select("text", "lang"))
    lap("train models")

    val useModels = args.length <= 2 || args(2) != "nomodels"
    for (rep <- 1 to 2) {
      val pages = spark.read.parquet(s"$dir/pages.parquet")
      val cfg = PagesGen.matchingConfig
      val prepared = Ingest.stampLists(Ingest.normalize(pages, cfg), cfg)
      var df: DataFrame = prepared
      t0 = System.nanoTime()
      Cascade.stages(cfg, if (useModels) Some(models) else None,
          PagesGen.exemplarTexts()).zipWithIndex.foreach {
        case (s, i) =>
          if (s.selfRef) {
            df = Cascade.materialize(df, eager = true)
            lap(f"rep$rep stage$i%02d code=${s.code} CKPT")
          }
          df = s.f(df)
      }
      val n = Cascade.finalDecision(df)
        .filter(org.apache.spark.sql.functions.col("keep")).count()
      lap(f"rep$rep tail+count keep=$n")
      ScalingBench.reapCheckpoints(spark)
      lap(f"rep$rep reap")
    }
    spark.stop()
  }
}
