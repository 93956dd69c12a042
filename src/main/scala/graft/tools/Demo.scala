package graft.tools

import graft.core.PageRow
import graft.pipeline.Extract
import java.sql.Timestamp
import java.nio.file.{Files, Paths}

/** CLI surface for the per-row extractor: feed it an html file (or nothing
  * for a built-in sample page) and see the extraction — status, kept/total
  * blocks, charset, spans, text.
  *
  * Usage: runMain graft.tools.Demo [path-to-html-file]
  */
object Demo {
  private val sample: String =
    """<!DOCTYPE html><html><head><meta charset="utf-8"><title>Quarterly results</title>
      |<script>window.dataLayer=[];</script><style>.nav{color:red}</style></head>
      |<body>
      |<header><nav><ul><li><a href="/">Home</a></li><li><a href="/news">News</a></li><li><a href="/about">About us</a></li></ul></nav></header>
      |<div class="cookie">We use cookies. <a href="/p">Learn more</a> <a href="#">OK</a></div>
      |<main><article>
      |<h1>Company reports strong quarter</h1>
      |<p>The company today announced quarterly earnings that exceeded analyst expectations by a wide margin, driven primarily by sustained growth in its cloud division and a rebound in advertising revenue that many observers had not anticipated this early in the fiscal year. Executives attributed the performance to disciplined cost control and renewed enterprise demand.</p>
      |<p>Analysts responded positively to the announcement, with several &amp; raising their price targets within hours of the release. The chief financial officer noted that operating margins expanded for the third consecutive quarter, a trend the company expects to continue as infrastructure investments made during the downturn begin to pay off across all business segments.</p>
      |<p>Looking ahead, management guided toward continued double-digit growth, while cautioning that currency headwinds and regulatory uncertainty in several key markets could weigh on results in the second half. The board also approved an expanded share repurchase program worth several billion dollars over the next three years.</p>
      |</article></main>
      |<aside><h3>Related</h3><ul><li><a href="/a">Previous quarter recap</a></li><li><a href="/b">Industry outlook</a></li></ul></aside>
      |<footer><ul><li><a href="/terms">Terms</a></li><li><a href="/privacy">Privacy</a></li></ul><p>© 2026 Example Inc.</p></footer>
      |</body></html>""".stripMargin

  def main(args: Array[String]): Unit = {
    val bytes =
      if (args.nonEmpty) Files.readAllBytes(Paths.get(args(0)))
      else sample.getBytes("UTF-8")
    val doc = Extract(PageRow("demo://page", new Timestamp(0), bytes, "", "en"))
    println(s"status=${doc.status} kept=${doc.stats.nKept}/${doc.stats.nBlocks} " +
      s"charset=${doc.stats.charset} quality=${f"${doc.stats.qualityScore}%.3f"} " +
      s"garbage=${f"${doc.stats.garbageRatio}%.3f"} truncated=${doc.stats.truncated}")
    println("spans=" + doc.spans.map(s => s"[${s.start},${s.end})").mkString(","))
    println("---- extracted ----")
    println(doc.extracted_text)
    println("---- end ----")
  }
}
