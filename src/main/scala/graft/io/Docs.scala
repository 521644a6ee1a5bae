package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adapter: the driver-provided `documents` parquet table → the engine's
  * canonical pages shape (url, warc_ts, html, text, lang, domain).
  * Deterministic: url/warc_ts/html are pure functions of the row, so the
  * DuckDB oracle can re-derive any of them. `source` plays the provider
  * role (TITAN prid; our registered-domain analog).
  */
object Docs {
  def read(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** documents shape → pages shape; pure projection, so it lifts onto a
    * streaming frame unchanged (q_stream_cascade reads the same table via
    * readStream and applies this same adapter).
    */
  def pagesFrom(docs: DataFrame): DataFrame =
    docs.select(
      concat(lit("https://"), col("source"), lit(".example.com/d/"), col("doc_id")).as("url"),
      to_timestamp(lit("2024-11-08 00:00:00")).as("warc_ts"),
      encode(col("text"), "UTF-8").as("html"),
      col("text"),
      col("lang"),
      col("source").as("domain"),
      col("doc_id"))

  def pages(spark: SparkSession, sfDir: String): DataFrame =
    pagesFrom(read(spark, sfDir))
}
