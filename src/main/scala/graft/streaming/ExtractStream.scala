package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import graft.core.{ExtractedDoc, PageRow}
import graft.spark.ExtractJob
import graft.pipeline.Extract

/** Structured-Streaming facade over the batch pipeline.
  *
  * The reference is strictly batch (SURVEY.md §2.9: no event-time concept
  * anywhere in /root/reference/src) and the extraction transform is
  * stateless per row, so it lifts unchanged into a streaming query: the
  * SAME per-row function serves `readStream → transform → writeStream`.
  * No stateful operators are needed for extraction itself; dedup by
  * (url, warc_ts) under late data is the one stateful concern and is
  * expressed with a watermark + dropDuplicates below.
  */
object ExtractStream {

  /** Streaming source of pages from a parquet directory (new files appear
    * as micro-batches — the streaming twin of the WARC-partition scan).
    */
  def pagesStream(spark: SparkSession, dir: String): Dataset[PageRow] = {
    import spark.implicits._
    spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[PageRow]].schema)
      .parquet(dir)
      .as[PageRow]
  }

  /** The streaming extraction transform — identical per-row semantics to
    * the batch job (byte-identity carries over by construction).
    * Late-data policy: 10-minute watermark on warc_ts; recrawls of the same
    * URL within the watermark keep the FIRST arrival
    * (dropDuplicatesWithinWatermark keyed on url alone — keying on
    * (url, warc_ts) would only drop exact-timestamp replays and let
    * different-timestamp recrawls through).
    */
  def extract(pages: Dataset[PageRow],
      cfg: Extract.Config = Extract.Default): Dataset[ExtractedDoc] = {
    import pages.sparkSession.implicits._
    val deduped = pages
      .withWatermark("warc_ts", "10 minutes")
      .dropDuplicatesWithinWatermark("url")
      .as[PageRow]
    deduped.map(p => Extract(p, cfg))
  }

  /** Sink: append-mode parquet with checkpointing (exactly-once via Spark's
    * streaming commit log — the streaming counterpart of SnapshotTable).
    */
  def writer(docs: Dataset[ExtractedDoc], outDir: String,
      checkpointDir: String): DataStreamWriter[ExtractedDoc] =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
}
