package graft.tools
import org.apache.spark.sql.functions._
object PlanCost {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.session("32")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    (1 to 4).foreach { r =>
      val t0 = System.nanoTime()
      val d = spark.read.parquet(s"$dir/documents.parquet")
      val t1 = System.nanoTime()
      val df = graft.queries.RelationalQueries.qSauvola(spark, dir)
      val t2 = System.nanoTime()
      df.queryExecution.executedPlan
      val t3 = System.nanoTime()
      df.collect()
      val t4 = System.nanoTime()
      println(f"r$r read=${(t1-t0)/1e6}%.0fms chain=${(t2-t1)/1e6}%.0fms plan=${(t3-t2)/1e6}%.0fms exec=${(t4-t3)/1e6}%.0fms")
    }
    spark.stop()
  }
}
