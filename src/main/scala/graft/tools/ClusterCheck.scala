package graft.tools

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession

/** Run the shuffle-bearing SparkEntry queries against an arbitrary master
  * (a REAL standalone cluster — multiple executor JVMs, Netty shuffle,
  * cross-process serialization — or local[N] for the reference run) and
  * write a canonical result hash per query, so cluster output can be
  * byte-compared against the local-mode output (VERDICT r4 item 2 /
  * SURVEY §4.3 scale boundary 2: every prior run used in-process shuffle).
  *
  * Canonical hash: columns sorted by name, every value rendered with
  * String.valueOf, rows sorted lexicographically, sha256 over the joined
  * text. The queries gated here are deterministic per-row (they all carry
  * a DuckDB oracle hash in CORRECTNESS), so sort-then-hash is exact.
  *
  * Usage: ClusterCheck <master> <sfDir> <out.json> [query ...]
  */
object ClusterCheck {
  private val DefaultQueries = Seq(
    // the shuffle-heavy family: banded self-join, AQE broadcast-vs-shuffle
    // join both regimes, 4-stage window exchange, salted two-phase distinct
    "q_lsh_pairs", "q_template_chrome", "q_template_strip",
    "q_kuwahara_aniso", "q_salted_distinct", "q_ann_bucketed",
    // the 100 TB job itself (zero-exchange plan + lineage agg)
    "q_extract")

  def main(args: Array[String]): Unit = {
    val master = args(0)
    val sfDir = args(1)
    val out = args(2)
    val names = if (args.length > 3) args.drop(3).toSeq else DefaultQueries

    val b = SparkSession.builder()
      .master(master)
      .appName("graft-cluster-check")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val results = names.map { name =>
      val q = graft.SparkEntry.queries.getOrElse(
        name, sys.error(s"unknown query $name"))
      val t0 = System.nanoTime()
      val df = q(spark, sfDir)
      val cols = df.columns.sorted.toSeq
      val rows = df.selectExpr(cols.map(c => s"`$c`"): _*).collect()
      val wall = (System.nanoTime() - t0) / 1e9
      val lines = rows.map { r =>
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i < r.length) {
          if (i > 0) sb.append('')
          val v = r.get(i)
          sb.append(v match {
            case a: Array[_] => a.iterator.map(String.valueOf).mkString("[", ",", "]")
            case s: Seq[_] => s.iterator.map(String.valueOf).mkString("[", ",", "]")
            case x => String.valueOf(x)
          })
          i += 1
        }
        sb.toString
      }.sorted
      val md = MessageDigest.getInstance("SHA-256")
      lines.foreach { l => md.update(l.getBytes(StandardCharsets.UTF_8)); md.update('\n'.toByte) }
      val hash = md.digest().map(b => f"$b%02x").mkString
      System.err.println(f"$name%-22s rows=${rows.length}%7d wall=$wall%7.2f s $hash")
      (name, rows.length, hash, wall)
    }

    val json = results.map { case (n, rows, h, w) =>
      s"""  "$n": {"rows": $rows, "hash": "$h", "wall_s": ${f"$w%.3f"}}"""
    }.mkString("{\n", ",\n", s""",\n  "master": "${master.replace("\"", "")}"\n}\n""")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes(StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
