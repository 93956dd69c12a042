package graft.tools

import graft.fixtures.FixtureGen
import graft.pipeline.Extract
import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** Pure-JVM thread-scaling probe of the extractor (no Spark): isolates
  * library scalability (allocation/GC/locks) from Spark scheduling.
  */
object ThreadScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 40000
    println(s"generating $n pages...")
    val pagesArr = {
      val a = new Array[graft.core.PageRow](n)
      val pool = Executors.newFixedThreadPool(16)
      val idx = new AtomicInteger(0)
      (0 until 16).foreach { _ =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var i = idx.getAndIncrement()
            while (i < n) { a(i) = FixtureGen.fixture(i.toLong).page; i = idx.getAndIncrement() }
          }
        })
      }
      pool.shutdown(); pool.awaitTermination(600, TimeUnit.SECONDS)
      a
    }
    // warmup
    pagesArr.take(2000).foreach(Extract(_))
    for (threads <- Seq(1, 8, 32)) {
      val pool = Executors.newFixedThreadPool(threads)
      val idx = new AtomicInteger(0)
      val t0 = System.nanoTime()
      (0 until threads).foreach { _ =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var i = idx.getAndIncrement()
            while (i < n) { Extract(pagesArr(i)); i = idx.getAndIncrement() }
          }
        })
      }
      pool.shutdown(); pool.awaitTermination(600, TimeUnit.SECONDS)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"threads=$threads%2d  wall=$sec%7.2f s  docs/s=${n / sec}%9.0f")
    }
  }
}
