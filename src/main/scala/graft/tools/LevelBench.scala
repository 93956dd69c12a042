package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong
import java.nio.file.{Files, Paths, StandardOpenOption}

/** One parallelism level, one long-lived session, many short extraction
  * passes. Records wall AND summed executor CPU time per pass — under the
  * sandbox's bursty external tenant load, the min wall and the CPU-time
  * throughput together give a contention-robust picture. Appends one JSON
  * line per pass to the given results file (consumed by
  * scripts/assemble_bench.py → BENCH/BASELINE.md).
  *
  * Usage: runMain graft.tools.LevelBench <cpus> <nDocs> <passes> <outFile>
  */
object LevelBench {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val n = args(1).toLong
    val passes = args(2).toInt
    val outFile = args(3)

    val spark = graft.Bench.session(cpus.toString)
    spark.sparkContext.setLogLevel("ERROR")
    val cpuNs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) cpuNs.addAndGet(t.taskMetrics.executorCpuTime)
    })
    val input = graft.Bench.ensureInput(spark, n)
    // warmup (JIT)
    val warm = graft.Bench.ensureInput(spark, math.min(n, 40000L))
    (1 to 2).foreach(_ => graft.Bench.extractionRun(spark, warm))

    var i = 0
    while (i < passes) {
      val c0 = cpuNs.get()
      val (wall, docs, bytes) = graft.Bench.extractionRun(spark, input)
      // settle the async listener bus before reading (tail task events)
      var prevC = -1L
      var curC = cpuNs.get()
      var si = 0
      while (si < 20 && curC != prevC) { Thread.sleep(50); prevC = curC; curC = cpuNs.get(); si += 1 }
      val cpuS = (curC - c0) / 1e9
      val line = f"""{"cpus":$cpus,"pass":${i + 1},"wall_s":$wall%.2f,"cpu_s":$cpuS%.2f,"docs":$docs,"bytes":$bytes}""" + "\n"
      Files.write(Paths.get(outFile), line.getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      System.err.println(line.trim)
      i += 1
    }
    spark.stop()
  }
}
