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
  *          [quietLoad maxWaitS]
  *
  * With the optional `quietLoad maxWaitS` arguments the session HUNTS from
  * inside the warm JVM: after warmup it polls /proc/loadavg and fires a
  * pass only when the 1-min load is below `quietLoad`, sleeping otherwise,
  * until `passes` quiet-start passes ran or `maxWaitS` is spent. This is
  * the only reliable way to hit this VM's sub-minute quiet windows — a
  * fresh JVM pays ~60 s of startup+JIT and always misses them.
  */
object LevelBench {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val n = args(1).toLong
    val passes = args(2).toInt
    val outFile = args(3)
    val quietLoad = if (args.length > 4) args(4).toDouble else Double.MaxValue
    val maxWaitS = if (args.length > 5) args(5).toDouble else 0.0

    val spark = graft.Bench.session(cpus.toString)
    spark.sparkContext.setLogLevel("ERROR")
    val cpuNs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) cpuNs.addAndGet(t.taskMetrics.executorCpuTime)
    })
    val input = graft.Bench.ensureInput(spark, n)
    val split = graft.Bench.tuneSplitFor(spark, input) // auto split sizing (r3 item 6)
    System.err.println(s"split_bytes=$split")
    // warmup (JIT)
    val warm = graft.Bench.ensureInput(spark, math.min(n, 40000L))
    (1 to 2).foreach(_ => graft.Bench.extractionRun(spark, warm))

    // with a quiet threshold: 2 extra FULL-corpus warm passes so the hot
    // loop is fully compiled before the first counted quiet pass
    if (maxWaitS > 0) (1 to 2).foreach(_ => graft.Bench.extractionRun(spark, input))

    // instantaneous co-tenant busy cores AND iowait cores over a 2 s probe —
    // unlike the 1-min loadavg this is NOT polluted by our own just-finished
    // pass, so consecutive quiet passes are possible inside one window. The
    // hunt gates on the MAX of both axes (r4: a cold-page-cache co-tenant
    // can saturate disk at <1 busy core — iowait is the only tell).
    def extBusyNow(): Double = {
      val tb = graft.Bench.totalBusyJiffies(); val ob = graft.Bench.ownJiffies()
      val ib = graft.Bench.iowaitJiffies()
      Thread.sleep(2000)
      val ta = graft.Bench.totalBusyJiffies(); val oa = graft.Bench.ownJiffies()
      val ia = graft.Bench.iowaitJiffies()
      if (tb < 0 || ta < 0) Double.MaxValue
      else {
        val ext = math.max(0.0, ((ta - tb) - (oa - ob)) / 100.0 / 2.0)
        val iow = if (ib < 0 || ia < 0) Double.MaxValue
          else math.max(0.0, (ia - ib) / 100.0 / 2.0)
        math.max(ext, iow)
      }
    }

    val huntT0 = System.nanoTime()
    var i = 0
    var waiting = true
    while (i < passes && waiting) {
      val lb = if (maxWaitS > 0) extBusyNow() else -1.0
      if (lb >= quietLoad &&
          (System.nanoTime() - huntT0) / 1e9 < maxWaitS) {
        Thread.sleep(8000) // warm-idle until the window opens
      } else {
        if (lb >= quietLoad) waiting = false // budget spent: stop hunting
        else {
          val tb = graft.Bench.totalBusyJiffies(); val ob = graft.Bench.ownJiffies()
          val wb = graft.Bench.iowaitJiffies(); val rb = graft.Bench.selfReadBytes()
          val c0 = cpuNs.get()
          val (wall, docs, bytes) = graft.Bench.extractionRun(spark, input)
          // settle the async listener bus before reading (tail task events)
          var prevC = -1L
          var curC = cpuNs.get()
          var si = 0
          while (si < 20 && curC != prevC) { Thread.sleep(50); prevC = curC; curC = cpuNs.get(); si += 1 }
          val cpuS = (curC - c0) / 1e9
          val ta = graft.Bench.totalBusyJiffies(); val oa = graft.Bench.ownJiffies()
          val wa = graft.Bench.iowaitJiffies(); val ra = graft.Bench.selfReadBytes()
          val ext =
            if (tb < 0 || ob < 0 || ta < 0 || oa < 0 || wall <= 0) -1.0
            else math.max(0.0, ((ta - tb) - (oa - ob)) / 100.0 / wall)
          val iow = if (wb < 0 || wa < 0 || wall <= 0) -1.0
            else math.max(0.0, (wa - wb) / 100.0 / wall)
          val mbps = if (rb < 0 || ra < 0 || wall <= 0) -1.0
            else math.max(0.0, (ra - rb) / 1e6 / wall)
          val line = f"""{"cpus":$cpus,"pass":${i + 1},"wall_s":$wall%.2f,"cpu_s":$cpuS%.2f,""" +
            f""""gate_ext_cores":$lb%.2f,"ext_busy_cores":$ext%.2f,""" +
            f""""iowait_cores":$iow%.2f,"self_read_mbps":$mbps%.1f,""" +
            f""""docs":$docs,"bytes":$bytes}""" + "\n"
          Files.write(Paths.get(outFile), line.getBytes("UTF-8"),
            StandardOpenOption.CREATE, StandardOpenOption.APPEND)
          System.err.println(line.trim)
          i += 1
        }
      }
    }
    spark.stop()
  }
}
