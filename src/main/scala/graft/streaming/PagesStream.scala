package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.config.GraftConfig
import graft.operators.MinHashLsh
import graft.functions.TextFunctions

/** Streaming ingestion (SURVEY.md §2.1 S13): the reference's file watcher
  * (`/root/reference/src/event_dedup/worker/watcher.py:25-64`) re-expressed
  * as a Structured Streaming file source. New parquet drops under
  * `inputDir` are picked up incrementally; each micro-batch runs
  * extraction + signatures and appends to the signatures stage table —
  * the incremental analog of the reference's per-file pipeline trigger
  * (`worker/orchestrator.py:60-131`), except arriving data only pays for
  * its own signatures (the reference rescores the whole corpus per file).
  *
  * `Trigger.AvailableNow` gives the reference's batch mode
  * (`process_file_batch`): drain everything pending, then stop.
  */
object PagesStream {

  /** Start the incremental signature stream. Returns the running query. */
  def signatureStream(
      spark: SparkSession,
      inputDir: String,
      outputDir: String,
      checkpointDir: String,
      cfg: GraftConfig = GraftConfig.default,
      availableNow: Boolean = true
  ): StreamingQuery = {
    val pages = spark.readStream
      .schema("url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING")
      .parquet(inputDir)

    val writer = pages.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val extracted = batch.select(
          col("url"), col("warc_ts"), col("lang"),
          TextFunctions.extractText(col("html")).as("extracted_text"))
        MinHashLsh.signatures(extracted, cfg)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outputDir)
      }

    val triggered = if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer
    triggered.start()
  }

  /** Streaming exact-dedup: emit only the FIRST page per content
    * fingerprint, with dedup state bounded by the event-time watermark
    * (`dropDuplicatesWithinWatermark` — state for a fingerprint expires
    * once the watermark passes it, so state size tracks the window, not
    * the corpus). The incremental analog of the batch exact-dedup tier
    * (q14-q17); duplicates arriving later than the watermark delay re-emit
    * — the documented bounded-state tradeoff, resolved downstream by the
    * batch pipeline.
    */
  def dedupStream(
      spark: SparkSession,
      inputDir: String,
      outputDir: String,
      checkpointDir: String,
      watermarkDelay: String = "10 minutes",
      availableNow: Boolean = true
  ): StreamingQuery = {
    val pages = spark.readStream
      .schema("url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING")
      .parquet(inputDir)
    val deduped = pages
      .select(col("url"), col("warc_ts"), col("lang"),
        TextFunctions.extractText(col("html")).as("extracted_text"))
      .withColumn("fp", graft.operators.TextAnalysis.fingerprint64(col("extracted_text")))
      .withWatermark("warc_ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")
    val writer = deduped.writeStream
      .format("parquet")
      .option("path", outputDir)
      .option("checkpointLocation", checkpointDir)
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }
}
