package graft.tools

import java.nio.file.{Files, Paths, StandardOpenOption}

/** PAIRED scaling measurement: alternate the two parallelism levels within
  * the same seconds-scale window (one JVM, sessions created/stopped per
  * pass) so external-tenant load hits both levels of a pair equally, then
  * report the median per-pair efficiency. Un-paired best-of-N walls from
  * different windows measured anywhere from 0.75 to 1.07 efficiency on this
  * box — the pairing removes the window bias that dominates that spread.
  *
  * Usage: runMain graft.tools.PairBench <lo> <hi> <nDocs> <rounds> <outFile>
  */
object PairBench {
  def main(args: Array[String]): Unit = {
    val lo = args(0).toInt
    val hi = args(1).toInt
    val n = args(2).toLong
    val rounds = args(3).toInt
    val outFile = args(4)

    def onePass(cpus: Int, input: String): Double = {
      val spark = graft.Bench.session(cpus.toString)
      spark.sparkContext.setLogLevel("ERROR")
      val (wall, _, _) = graft.Bench.extractionRun(spark, input)
      spark.stop()
      wall
    }

    // materialize input + JIT warmup (the warm code persists across sessions
    // in this JVM; only the Spark scheduler restarts per pass)
    val warmSpark = graft.Bench.session(hi.toString)
    warmSpark.sparkContext.setLogLevel("ERROR")
    val input = graft.Bench.ensureInput(warmSpark, n)
    val warm = graft.Bench.ensureInput(warmSpark, math.min(n, 40000L))
    (1 to 2).foreach(_ => graft.Bench.extractionRun(warmSpark, warm))
    graft.Bench.extractionRun(warmSpark, input)
    warmSpark.stop()

    val effs = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to rounds).foreach { r =>
      val tLo = onePass(lo, input)
      val tHi = onePass(hi, input)
      val eff = (tLo / tHi) * (lo.toDouble / hi.toDouble)
      effs += eff
      val line =
        f"""{"round":$r,"lo":$lo,"hi":$hi,"t_lo_s":$tLo%.2f,"t_hi_s":$tHi%.2f,"eff":$eff%.3f}""" + "\n"
      Files.write(Paths.get(outFile), line.getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      System.err.println(line.trim)
    }
    val sorted = effs.sorted
    val med = sorted((sorted.length - 1) / 2)
    val line = f"""{"summary":true,"lo":$lo,"hi":$hi,"rounds":$rounds,"median_eff":$med%.3f,"max_eff":${sorted.last}%.3f}""" + "\n"
    Files.write(Paths.get(outFile), line.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    println(line.trim)
  }
}
