package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong
import java.nio.file.{Files, Paths, StandardOpenOption}

/** One emulated EXECUTOR for the multi-JVM scaling experiment (VERDICT r3
  * item 1): a standalone JVM running `local[threads]` over a file-slice of
  * the bench corpus, firing extraction passes in lock-step with its sibling
  * workers via a file barrier in `ctrlDir`.
  *
  * Why this exists: the north rule's scaling criterion is N→4N EXECUTORS,
  * but every bench so far ran one JVM with more threads — which conflates
  * true plan/DRAM scaling with single-JVM artifacts (consolidated G1 heap at
  * ~4 GB/s transient allocation, one task-tail). Running 4 × local[8] JVMs
  * concurrently against 1 × local[8] on the same per-JVM work is the
  * faithful sandbox emulation of a 4-executor vs 1-executor cluster: each
  * JVM has its own heap, its own GC, its own scheduler — exactly what
  * spark-submit gives each executor (SURVEY §1.1's embarrassingly-parallel
  * design carries over).
  *
  * Protocol (coordinator = [[MultiJvmBench]]):
  *   1. warm up (JIT) on the slice, then write `ready_<id>_<pass>`
  *   2. poll for `go_<pass>` (all workers see the same file → synchronized
  *      start within one poll interval) or `stop`
  *   3. run ONE extraction pass over the slice; write `done_<id>_<pass>`
  *      containing epoch start/end (cross-JVM wall alignment), wall, summed
  *      executor CPU, GC time delta, docs, bytes
  *
  * Usage: MultiJvmWorker <threads> <heapTag> <inputDir> <sliceK> <sliceM>
  *                       <ctrlDir> <workerId>
  * sliceK/sliceM: worker reads parquet part-files with index % M == K
  * (round-robin over the sorted listing → balanced slice bytes); M=1 reads
  * the whole corpus.
  */
object MultiJvmWorker {
  def main(args: Array[String]): Unit = {
    val threads = args(0).toInt
    val heapTag = args(1) // informational, echoed into records
    val inputDir = args(2)
    val sliceK = args(3).toInt
    val sliceM = args(4).toInt
    val ctrlDir = Paths.get(args(5))
    val id = args(6).toInt

    val spark = graft.Bench.session(threads.toString)
    spark.sparkContext.setLogLevel("ERROR")
    val cpuNs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) cpuNs.addAndGet(t.taskMetrics.executorCpuTime)
    })

    val all = new java.io.File(inputDir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    val files = all.zipWithIndex.collect { case (f, i) if i % sliceM == sliceK => f }
    // fail fast with a diagnosable message: an empty slice (corpus has fewer
    // part-files than sliceM) would otherwise die inside spark.read.parquet
    // during warmup as an opaque worker-died error (ADVICE r4)
    require(files.nonEmpty,
      s"worker $id: slice $sliceK/$sliceM selects 0 of ${all.length} parquet " +
        s"part-files in $inputDir — corpus must have >= sliceM part-files")
    val sliceBytes = files.map(_.length()).sum
    // auto split sizing scoped to THIS slice and THIS core count (r3 item 6)
    val split = math.max(4L << 20,
      math.min(128L << 20, (sliceBytes / (3.5 * threads)).toLong))
    spark.conf.set("spark.sql.files.maxPartitionBytes", split.toString)
    val paths = files.map(_.getAbsolutePath)

    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }

    // the shared pass definition — identical measurement across all tools
    def onePass(): (Double, Long, Long) =
      graft.Bench.extractionRunFiles(spark, paths.toSeq)

    // warmup: 2 slice passes bring C2 + the page cache for this slice up
    onePass(); onePass()

    var pass = 1
    var running = true
    while (running) {
      Files.write(ctrlDir.resolve(s"ready_${id}_$pass"), Array.emptyByteArray,
        StandardOpenOption.CREATE)
      var fired = false
      while (!fired && running) {
        if (Files.exists(ctrlDir.resolve("stop"))) running = false
        else if (Files.exists(ctrlDir.resolve(s"go_$pass"))) fired = true
        else Thread.sleep(50)
      }
      if (fired) {
        val g0 = gcMs
        val c0 = cpuNs.get()
        val e0 = System.currentTimeMillis()
        val (wall, docs, bytes) = onePass()
        val e1 = System.currentTimeMillis()
        // settle the async listener bus (tail task events)
        var prevC = -1L; var curC = cpuNs.get(); var si = 0
        while (si < 20 && curC != prevC) {
          Thread.sleep(50); prevC = curC; curC = cpuNs.get(); si += 1
        }
        val cpuS = (curC - c0) / 1e9
        val g1 = gcMs
        val line = f"""{"id":$id,"pass":$pass,"threads":$threads,"heap":"$heapTag",""" +
          f""""slice":"$sliceK/$sliceM","slice_bytes":$sliceBytes,"split_bytes":$split,""" +
          f""""t0_ms":$e0,"t1_ms":$e1,"wall_s":$wall%.3f,"cpu_s":$cpuS%.3f,""" +
          f""""gc_ms":${g1 - g0},"docs":$docs,"bytes":$bytes}"""
        Files.write(ctrlDir.resolve(s"done_${id}_$pass"),
          (line + "\n").getBytes("UTF-8"), StandardOpenOption.CREATE)
        pass += 1
      }
    }
    spark.stop()
  }
}
