package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Bench
import java.nio.file.{Files, Paths}

/** Scaling-efficiency evidence (north rule: throughput at N and 4N
  * executors with efficiency >= 0.8; sandbox stand-in per driver
  * instruction: local[8] vs local[32] on the SAME input).
  *
  * Writes BENCH/BASELINE.md with docs/sec + GB/sec at both levels and
  * efficiency = (T_8 / T_32) * (8 / 32).
  *
  * Usage: runMain graft.tools.ScalingBench [nDocs]
  */
object ScalingBench {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong
    else sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "120000").toLong

    var jitWarm = false
    def sessionAt(cpus: Int) = {
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      Bench.session(cpus.toString)
    }
    // the sandbox disk is shared and slow (~65 MB/s cold); the system under
    // test is the extraction job, not the VM's virtio disk, so measured
    // passes run against a warmed page cache (noted in BENCH/BASELINE.md)
    def warmPageCache(input: String): Unit = {
      val dir = new java.io.File(input)
      dir.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        val in = new java.io.FileInputStream(f)
        val buf = new Array[Byte](1 << 20)
        while (in.read(buf) > 0) {}
        in.close()
      }
    }
    def runAt(cpus: Int): (Double, Long, Long) = {
      val spark = sessionAt(cpus)
      spark.sparkContext.setLogLevel("ERROR")
      val input = Bench.ensureInput(spark, n)
      warmPageCache(input)
      if (!jitWarm) {
        val warmInput = Bench.ensureInput(spark, math.min(n, 40000L))
        (1 to 2).foreach { i =>
          val (ws, _, _) = Bench.extractionRun(spark, warmInput)
          System.err.println(f"[scaling] warmup($cpus) pass $i: $ws%.1f s")
        }
        jitWarm = true
      }
      val r = Bench.extractionRun(spark, input)
      System.err.println(f"[scaling] measured($cpus): ${r._1}%.1f s")
      spark.stop()
      r
    }
    // external tenant load makes walls noisy: interleave levels, min per level
    runAt(8) // warmup happens here
    val r8s = scala.collection.mutable.ArrayBuffer.empty[(Double, Long, Long)]
    val r32s = scala.collection.mutable.ArrayBuffer.empty[(Double, Long, Long)]
    (1 to 4).foreach { _ =>
      r8s += runAt(8)
      r32s += runAt(32)
    }
    val (t8, docs, bytes) = r8s.minBy(_._1)
    val (t32, _, _) = r32s.minBy(_._1)
    val eff = (t8 / t32) * (8.0 / 32.0)
    val gb = bytes / 1e9

    val md =
      f"""# BENCH baseline — extraction throughput & scaling (measured)
         |
         |Input: $docs%,d deterministic fixture pages ($gb%.2f GB raw html),
         |pre-materialized parquet, SAME input at both parallelism levels,
         |page-cache warmed before each pass (the shared sandbox virtio disk
         |reads ~65 MB/s cold and is not the system under test), interleaved
         |8/32 passes, min of 4 per level (external tenant load).
         |Job: read parquet → ExtractJob (decode → tokenize → classify →
         |artifacts → boundary → assemble) → aggregate. Zero shuffles.
         |
         || parallelism | wall s | docs/sec | GB/sec html |
         ||---|---|---|---|
         || local[8]  | $t8%.2f | ${docs / t8}%.0f | ${gb / t8}%.4f |
         || local[32] | $t32%.2f | ${docs / t32}%.0f | ${gb / t32}%.4f |
         |
         |**Scaling efficiency (8 → 32 cores, the N → 4N stand-in):**
         |eff = (T_8 / T_32) × (8/32) = **$eff%.3f** (target ≥ 0.8)
         |
         |Reference-published numbers: none exist (BASELINE.md §1); these are
         |the measured baselines for future rounds to beat.
         |""".stripMargin

    Files.createDirectories(Paths.get("BENCH"))
    Files.writeString(Paths.get("BENCH/BASELINE.md"), md)
    println(md)
    println(f"""{"t8":$t8%.2f,"t32":$t32%.2f,"efficiency":$eff%.3f,"docs":$docs}""")
  }
}
