package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import graft.io.PagesGen
import graft.model.CascadeConfig
import graft.stages._

/** Dev tool: incremental cost of the narrow (row-local) cascade prefix.
  * Usage: runMain graft.ProfileNarrow [cores] [nDocs]
  */
object ProfileNarrow {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 32
    val nDocs = if (args.length > 1) args(1).toLong else 200000L
    val spark = ScalingBench.session(cores)
    val dir = Files.createTempDirectory("profnarrow").toString
    PagesGen.generate(spark, nDocs).write.parquet(s"$dir/pages.parquet")
    val cfg: CascadeConfig = PagesGen.matchingConfig

    def time(name: String)(f: => DataFrame): Unit = {
      for (rep <- 1 to 2) {
        val t0 = System.nanoTime()
        f.localCheckpoint(true)
        println(f"[narrow] $name%-28s rep$rep ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
    def pages = spark.read.parquet(s"$dir/pages.parquet")

    time("scan only")(pages)
    time("normalize(features)")(Ingest.normalize(pages, cfg))
    time("+stampLists")(Ingest.stampLists(Ingest.normalize(pages, cfg), cfg))
    val prepared = Ingest.stampLists(Ingest.normalize(pages, cfg), cfg)
    time("+metadata")(RowChecks.metadata.transform(prepared, cfg))
    time("+backfill")(ModelChecks.backfillAndRecheck(
      RowChecks.metadata.transform(prepared, cfg), cfg))
    val afterBackfill = ModelChecks.backfillAndRecheck(
      RowChecks.metadata.transform(prepared, cfg), cfg)
    time("+scrub")(ModelChecks.scrubStage(afterBackfill))
    val afterScrub = ModelChecks.scrubStage(afterBackfill)
    time("+rowchecks(501/502/902)")(
      RowChecks.langBounds.transform(
        RowChecks.plausibility.transform(
          RowChecks.langMismatchHeuristic.transform(afterScrub, cfg), cfg), cfg))

    // model-UDF bisect: langid alone, each LM member, then the full
    // withModelFeatures projection as the cascade runs it
    import org.apache.spark.sql.functions._
    val models = Models.train(spark,
      PagesGen.generateWithClass(spark, 10000L)
        .filter(col("clazz") === "clean").select("text", "lang"))
    val bc = spark.sparkContext.broadcast(models)
    val detUdf = udf((t: String) => bc.value.langId.detect(t))
    time("+udf langid only")(afterScrub.withColumn("_det", detUdf(col("text"))))
    models.lms.indices.foreach { i =>
      val pplUdf = udf((t: String) => bc.value.lms(i).logPerplexity(t))
      time(s"+udf ppl member$i only")(afterScrub.withColumn("_p", pplUdf(col("text"))))
    }
    time("+withModelFeatures(all)")(ModelChecks.withModelFeatures(afterScrub, models))
    time("+crossField")(RowChecks.crossField.transform(
      ModelChecks.withModelFeatures(afterScrub, models), cfg))
    spark.stop()
  }
}
