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
  def pagesStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 0): Dataset[PageRow] = {
    import spark.implicits._
    val r = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[PageRow]].schema)
    val r2 = if (maxFilesPerTrigger > 0)
      r.option("maxFilesPerTrigger", maxFilesPerTrigger) else r
    r2.parquet(dir).as[PageRow]
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

  /** One micro-batch committed atomically to a [[graft.table.SnapshotTable]]
    * under runId `batch<id>` — IDEMPOTENT: a batch replayed after a crash
    * (Spark re-delivers the same batchId from the checkpoint) finds its
    * runId already in the committed snapshot and is skipped, so a kill at
    * ANY point (before the data write, between data write and manifest
    * commit, after commit but before the checkpoint advances) converges to
    * exactly-once. This is the batch job's snapshot-resume contract
    * (SnapshotTable.append's atomic manifest CAS) lifted to foreachBatch;
    * StreamKillSpec drives a real kill-mid-batch → restart → byte-identity
    * check (VERDICT r3 item 9).
    */
  def snapshotBatch(batch: Dataset[ExtractedDoc], batchId: Long,
      tableDir: String, buckets: Int): Unit = {
    val runId = s"batch$batchId"
    val committed = graft.table.SnapshotTable.currentSnapshot(tableDir)
      .map(_.runIds).getOrElse(Seq.empty)
    if (!committed.contains(runId))
      graft.table.SnapshotTable.append(batch.toDF(), tableDir, runId, buckets = buckets)
  }

  /** Streaming sink over [[snapshotBatch]]: exactly-once into an
    * Iceberg-style snapshot table, resumable across kills from the pair
    * (streaming checkpoint, committed manifest).
    */
  def snapshotWriter(docs: Dataset[ExtractedDoc], tableDir: String,
      checkpointDir: String, buckets: Int = 16): DataStreamWriter[ExtractedDoc] =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[ExtractedDoc], batchId: Long) =>
        snapshotBatch(batch, batchId, tableDir, buckets)
      }
}
