package graft.tools

import graft.fixtures.FixtureGen
import graft.html.{Decode, HtmlTokenizer}
import graft.classify.Classifiers
import graft.clean.Artifacts
import graft.boundary.Boundary
import graft.pipeline.Extract

/** Single-threaded per-stage cost profile of the extraction pipeline. */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2000
    val fixtures = FixtureGen.fixtures(n)
    val pages = fixtures.map(_.page).toArray
    // warmup
    pages.take(500).foreach(Extract(_))

    def time[A](label: String, reps: Int)(f: => A): Unit = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < reps) { f; i += 1 }
      val perOp = (System.nanoTime() - t0) / 1e6 / reps
      println(f"$label%-22s ${perOp}%8.3f ms/doc-batch")
    }

    val t0 = System.nanoTime()
    pages.foreach(Extract(_))
    val full = (System.nanoTime() - t0) / 1e6 / n
    println(f"full pipeline          $full%8.3f ms/doc")

    val decoded = pages.map(p => Decode(p.html).text)
    time("decode only", 3) { pages.foreach(p => Decode(p.html)) }
    time("tokenize only", 3) { decoded.foreach(d => HtmlTokenizer(d)) }
    val toks = decoded.map(d => HtmlTokenizer(d).blocks)
    time("classify only", 3) { toks.foreach(b => Classifiers.classify(b)) }
    val labels = toks.map(b => Classifiers.classify(b))
    time("artifacts only", 3) {
      toks.indices.foreach(i => Artifacts.all(toks(i), labels(i)))
    }
    time("boundary only", 3) {
      toks.indices.foreach(i => Boundary.find(toks(i), labels(i)))
    }
    time("gen only", 3) { (0 until n).foreach(i => FixtureGen.fixture(i.toLong)) }
    println("note: per-stage numbers are total-batch ms divided by reps, ÷n for per-doc")
    val bytes = pages.map(_.html.length.toLong).sum
    println(f"corpus: $n docs, ${bytes / 1e6}%.1f MB html, avg ${bytes / n}%d B/doc")
  }
}
