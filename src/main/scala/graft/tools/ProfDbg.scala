package graft.tools
import graft.fixtures.FixtureGen
import graft.html.{Decode, HtmlTokenizer}
object ProfDbg {
  def main(args: Array[String]): Unit = {
    val n = 4000
    val pages = FixtureGen.fixtures(n).map(_.page).toArray
    pages.take(500).foreach(graft.pipeline.Extract(_))
    val decoded = pages.map(p => Decode(p.html).text)
    val toks = decoded.map(d => HtmlTokenizer(d))
    def time(label: String)(f: => Unit): Unit = {
      (1 to 2).foreach(_ => f)
      val t0 = System.nanoTime(); (1 to 3).foreach(_ => f)
      println(f"$label%-24s ${(System.nanoTime() - t0) / 1e6 / 3 / n * 1000}%8.2f us/doc")
    }
    time("garbageRatio") { decoded.foreach(graft.detect.Quality.garbageRatio) }
    time("parseability") { toks.indices.foreach(i => graft.detect.Quality.parseability(decoded(i), toks(i).blocks)) }
    time("findAngle") { toks.foreach(t => graft.detect.Deskew.findAngle(t.blocks)) }
    time("assemble") { toks.foreach { t =>
      val labels = graft.classify.Classifiers.classify(t.blocks)
      graft.pipeline.Extract.assemble(t.blocks, labels, "\n") } }
    time("tokenize") { decoded.foreach(d => HtmlTokenizer(d)) }
    time("decode") { pages.foreach(p => Decode(p.html)) }
    time("full") { pages.foreach(p => graft.pipeline.Extract(p)) }
  }
}
