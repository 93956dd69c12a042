package graft.tools

import org.apache.spark.sql.functions._
import graft.spark.ExtractJob
import graft.core.PageRow

/** Diagnose extraction parallelism: partitions, read-only vs extract times,
  * distinct task threads used.
  */
object ParallelDiag {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = 40000L
    val spark = graft.Bench.session(cpus)
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val input = graft.Bench.ensureInput(spark, n)
    val pages = spark.read.parquet(input).as[PageRow]
    println("NUM_PARTITIONS=" + pages.rdd.getNumPartitions)

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    t("read+count only") { spark.read.parquet(input).count() }
    t("read+decode html length") {
      spark.read.parquet(input).as[PageRow].map(p => p.html.length).reduce(_ + _)
    }
    // thread coverage during extraction
    val threads = spark.sparkContext.collectionAccumulator[String]("threads")
    t("full extract (typed)") {
      ExtractJob.extract(spark.read.parquet(input).as[PageRow])
        .mapPartitions { it => threads.add(Thread.currentThread().getName); it }
        .agg(count(lit(1))).collect()
    }
    println("DISTINCT_THREADS=" + threads.value.size + " unique=" +
      new java.util.HashSet(threads.value).size)
    t("extract, rdd only") {
      spark.read.parquet(input).as[PageRow].rdd
        .map(p => graft.pipeline.Extract(p).extracted_text.length.toLong)
        .reduce(_ + _)
    }
    spark.stop()
  }
}
