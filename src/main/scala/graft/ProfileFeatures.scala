package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.functions.TextFeatures
import graft.io.PagesGen
import graft.stages.Ingest

/** Dev tool: per-feature cost bisect. Usage: runMain graft.ProfileFeatures [cores] [nDocs] */
object ProfileFeatures {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 32
    val nDocs = if (args.length > 1) args(1).toLong else 200000L
    val spark = ScalingBench.session(cores)
    val dir = Files.createTempDirectory("proffeat").toString
    PagesGen.generate(spark, nDocs).select("url", "text", "lang")
      .write.parquet(s"$dir/pages.parquet")
    def pages = spark.read.parquet(s"$dir/pages.parquet")
    val t = col("text")

    def time(name: String)(c: org.apache.spark.sql.Column): Unit = {
      for (rep <- 1 to 2) {
        val t0 = System.nanoTime()
        pages.select(col("url"), c.as("x")).localCheckpoint(true)
        println(f"[feat] $name%-22s rep$rep ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
    time("baseline(text)")(t)
    time("nChars")(TextFeatures.nChars(t))
    time("nWords")(TextFeatures.nWords(t))
    time("nAlpha-regex")(TextFeatures.nAlpha(t))
    time("meanWordLen")(TextFeatures.meanWordLen(t))
    time("symbolRatio")(TextFeatures.symbolRatio(t))
    time("stopwordRatio")(TextFeatures.stopwordRatio(t, Ingest.EnStopwords))
    time("distinctWordRatio")(TextFeatures.distinctWordRatio(t))
    time("digitRatio")(TextFeatures.digitRatio(t))
    time("fingerprint")(TextFeatures.fingerprint(t))
    spark.stop()
  }
}
