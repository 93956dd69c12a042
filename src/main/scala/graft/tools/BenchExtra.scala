package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Measurement-only companion of [[graft.Bench]] (guide §1.1/§1.4): NOT a
  * bench-of-record — Bench.scala is frozen. This tool isolates WHERE the
  * per-query wall of the 15 headline entries goes:
  *   - per-pass wall (first pass = codegen-cold, later passes = steady);
  *   - per-job wall + stage/task counts via a listener (scheduling overhead
  *     vs compute);
  *   - optional `.explain("formatted")` dump to plans/r06/<q>_<tag>.txt.
  *
  * Usage: sbt "runMain graft.tools.BenchExtra [explainTag]"
  * Env: same as Bench (SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS), plus
  *      SPARK_GRAFT_EXTRA_PASSES (default 4),
  *      SPARK_GRAFT_EXTRA_QUERIES (comma list; default = headline queries).
  */
object BenchExtra {

  final case class JobRec(id: Int, wallMs: Double, stages: Int, tasks: Int,
      desc: String)

  final class JobMeter extends SparkListener {
    private val t0 = mutable.Map.empty[Int, Long]
    private val descs = mutable.Map.empty[Int, String]
    private val stageCounts = mutable.Map.empty[Int, Int]
    private val taskCounts = mutable.Map.empty[Int, Int]
    private val stageToJob = mutable.Map.empty[Int, Int]
    val jobs = mutable.ArrayBuffer.empty[JobRec]
    override def onJobStart(j: SparkListenerJobStart): Unit = synchronized {
      t0(j.jobId) = System.nanoTime()
      descs(j.jobId) = Option(j.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
      stageCounts(j.jobId) = j.stageInfos.size
      taskCounts(j.jobId) = j.stageInfos.map(_.numTasks).sum
      j.stageIds.foreach(s => stageToJob(s) = j.jobId)
    }
    override def onJobEnd(j: SparkListenerJobEnd): Unit = synchronized {
      val ms = (System.nanoTime() - t0.getOrElse(j.jobId, System.nanoTime())) / 1e6
      jobs += JobRec(j.jobId, ms, stageCounts.getOrElse(j.jobId, 0),
        taskCounts.getOrElse(j.jobId, 0), descs.getOrElse(j.jobId, ""))
    }
    def reset(): Unit = synchronized { jobs.clear() }
    def snapshot(): Seq[JobRec] = synchronized { jobs.toVector }
  }

  def main(args: Array[String]): Unit = {
    val explainTag = args.headOption
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_EXTRA_PASSES", "4").toInt
    val spark = graft.Bench.session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val meter = new JobMeter
    spark.sparkContext.addSparkListener(meter)

    val headline = Seq(
      "q_sauvola", "q_window_stats", "q_wolfjolion", "q_otsu", "q_minhash",
      "q_ngram_jaccard", "q_dedup_exact", "q_ann_bucketed", "q_lsh_bucket",
      "q_golden_join", "q_event_windows", "q_topk", "q_quality_scores",
      "q_extract")
    val wanted = sys.env.get("SPARK_GRAFT_EXTRA_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(headline)

    wanted.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      explainTag.foreach { tag =>
        val dir = java.nio.file.Paths.get("plans/r06")
        java.nio.file.Files.createDirectories(dir)
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(dir.resolve(s"${name}_$tag.txt"), plan)
      }
      val walls = mutable.ArrayBuffer.empty[Double]
      val plans = mutable.ArrayBuffer.empty[Double]
      var lastJobs: Seq[JobRec] = Nil
      var lastDf: org.apache.spark.sql.DataFrame = null
      (0 until passes).foreach { p =>
        meter.reset()
        spark.sparkContext.setJobDescription(s"$name pass$p")
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        lastDf = df
        df.queryExecution.executedPlan // force analysis + optimization + planning
        val t1 = System.nanoTime()
        df.collect()
        plans += (t1 - t0) / 1e9
        walls += (System.nanoTime() - t0) / 1e9
        Thread.sleep(150) // let listener drain
        lastJobs = meter.snapshot()
        spark.sparkContext.setJobDescription(null)
      }
      val w = walls.map(x => f"$x%.3f").mkString(" ")
      val pl = plans.map(x => f"$x%.3f").mkString(" ")
      println(f"EXTRA $name%-16s walls=[$w] best=${walls.min}%.3f plan=[$pl]")
      // last pass's planning phase split (ms): where the plan-time goes
      val phases = lastDf.queryExecution.tracker.phases
        .map { case (ph, t) => f"$ph=${(t.endTimeMs - t.startTimeMs)}%d" }
        .mkString(" ")
      println(s"      phases(ms): $phases")
      lastJobs.foreach { j =>
        println(f"      job ${j.id}%3d wall=${j.wallMs}%7.1fms stages=${j.stages}%2d tasks=${j.tasks}%4d ${j.desc.take(60)}")
      }
    }
    spark.stop()
  }
}
