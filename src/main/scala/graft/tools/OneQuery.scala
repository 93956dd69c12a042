package graft.tools
import org.apache.spark.sql.SparkSession
object OneQuery {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val Array(name, dir, out) = args
    graft.SparkEntry.queries(name)(spark, dir).coalesce(1)
      .write.mode("overwrite").parquet(s"$out/$name")
    val q = (s: String) => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\t", "\\t") + "\""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$out/oracle_sql.json"),
      s"{${q(name)}: ${q(graft.SparkEntry.oracleSql(name))}}")
    spark.stop()
  }
}
