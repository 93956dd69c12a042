package graft.tools

import org.apache.spark.sql.SparkSession

/** Equivalence gate for the r6 query restructurings: row-compare two Verify
  * output trees (old code vs new code), per query, INCLUDING row order —
  * Verify writes coalesce(1) so file row order is the query's global order.
  * Any difference in rows, order, or schema prints DIFF and exits 1.
  *
  * Usage: runMain graft.tools.DiffDirs <oldDir> <newDir>
  */
object DiffDirs {
  def main(args: Array[String]): Unit = {
    val Array(oldDir, newDir) = args.take(2)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = new java.io.File(oldDir).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    var bad = 0
    names.foreach { n =>
      val o = spark.read.parquet(s"$oldDir/$n")
      val nw = spark.read.parquet(s"$newDir/$n")
      val so = o.schema.treeString
      val sn = nw.schema.treeString
      if (so != sn) {
        println(s"DIFF $n: schema\nOLD: $so\nNEW: $sn"); bad += 1
      } else {
        val ro = o.collect().map(_.toString).toSeq
        val rn = nw.collect().map(_.toString).toSeq
        if (ro == rn) println(s"OK   $n rows=${ro.size}")
        else {
          bad += 1
          val firstBad = ro.zipAll(rn, "<missing>", "<missing>")
            .indexWhere { case (a, b) => a != b }
          println(s"DIFF $n rows old=${ro.size} new=${rn.size} firstDiff@$firstBad")
          if (firstBad >= 0) {
            println(s"  old: ${ro.lift(firstBad)}")
            println(s"  new: ${rn.lift(firstBad)}")
          }
        }
      }
    }
    println(s"SUMMARY: ${names.length} queries, $bad diffs")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
