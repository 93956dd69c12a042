package graft.tools

import java.nio.file.{Files, StandardOpenOption}

import org.scalatest.funsuite.AnyFunSuite

/** The coordinator's done-file read races the worker's content write:
  * Files.exists can observe the CREATE before the bytes land, and r5e
  * pair 1 parsed an empty record into NaN walls while the worker-side
  * record was complete. readDoneRecord must wait out a truncated file.
  */
class MultiJvmBenchSpec extends AnyFunSuite {

  test("readDoneRecord waits for a truncated record to complete") {
    val dir = Files.createTempDirectory("mjvm_spec_")
    val p = dir.resolve("done_0_1")
    val full = """{"id":0,"pass":1,"t0_ms":1,"t1_ms":2,"cpu_s":3.5,"docs":10}"""
    // stage 1: the race — file exists but holds only a prefix
    Files.write(p, full.substring(0, 20).getBytes("UTF-8"),
      StandardOpenOption.CREATE)
    val writer = new Thread(() => {
      Thread.sleep(300)
      Files.write(p, full.getBytes("UTF-8"),
        StandardOpenOption.TRUNCATE_EXISTING)
    })
    writer.start()
    val rec = MultiJvmBench.readDoneRecord(p)
    writer.join()
    assert(rec == full, s"read a truncated record: $rec")
  }

  test("readDoneRecord returns a complete record immediately") {
    val dir = Files.createTempDirectory("mjvm_spec_")
    val p = dir.resolve("done_0_2")
    val full = """{"id":0,"pass":2,"cpu_s":1.0}"""
    Files.write(p, full.getBytes("UTF-8"), StandardOpenOption.CREATE)
    val t0 = System.nanoTime()
    assert(MultiJvmBench.readDoneRecord(p) == full)
    assert((System.nanoTime() - t0) / 1e9 < 1.0, "complete record should not wait")
  }
}
