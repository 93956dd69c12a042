package graft.tools

import org.apache.spark.sql.functions._

/** Dump the physical plan of the EXACT bench aggregation shape
  * (Bench.extractionRunFiles) — to verify whether ObjectSerializerPruning
  * trims the ExtractedDoc serializer (spans / unused stats fields) out of
  * the SerializeFromObject node, i.e. whether the bench pass pays for
  * serializing columns its aggregate never reads.
  */
object AggPlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.session("4")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val input = graft.Bench.ensureInput(spark, 1000L)
    val pages = spark.read.parquet(input).as[graft.core.PageRow]
    val agg = graft.spark.ExtractJob.extract(pages)
      .agg(count(lit(1)).as("docs"), sum($"stats.htmlBytes").as("bytes"),
        sum(octet_length($"extracted_text")).as("textBytes"))
    agg.explain("formatted")
    spark.stop()
  }
}
