package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Block
import graft.classify.{Classifiers, Regions}
import graft.boundary.Boundary
import graft.detect.Orientation

/** Round-2 operator suites: region machinery (the contour-tree analogue),
  * the region classifiers (fbcitb / cococlust / localotsu), the
  * findOrientation doc-type gate, the separator-frame boundary finder, and
  * the nativeadaptive polarity auto-invert.
  */
class RegionsSpec extends AnyFunSuite {

  test("tagPathRegions: over-large runs descend to children (RETR_TREE analogue)") {
    val paths = Array(
      "html/body/header/nav/ul/li", "html/body/header/nav/ul/li", "html/body/header/nav/ul/li",
      "html/body/main/article/p", "html/body/main/article/p", "html/body/main/article/p", "html/body/main/article/p",
      "html/body/footer", "html/body/footer")
    val rs = Regions.tagPathRegions(paths)
    assert(rs == Vector(Regions.Region(0, 2, 2), Regions.Region(3, 6, 2), Regions.Region(7, 8, 2)))
  }

  test("tagPathRegions: indivisible whole-doc run emitted as one region") {
    val paths = Array.fill(6)("html/body/div/p")
    val rs = Regions.tagPathRegions(paths)
    assert(rs.length == 1 && rs.head.lo == 0 && rs.head.hi == 5)
  }

  test("tagPathRegions covers every block exactly once, in order") {
    val paths = Array(
      "html/body/nav/ul/li", "html/body/nav/ul/li",
      "html/body/div/article/p", "html/body/div/article/p", "html/body/div/aside",
      "html/body/footer/ul/li")
    val rs = Regions.tagPathRegions(paths)
    assert(rs.head.lo == 0 && rs.last.hi == paths.length - 1)
    rs.sliding(2).foreach {
      case Vector(a, b) => assert(b.lo == a.hi + 1)
      case _ =>
    }
  }

  test("edgeRegions cuts at signal steps (1-D Canny)") {
    val x = Array(0.0, 0.0, 0.0, 255.0, 255.0, 255.0, 0.0, 0.0)
    val rs = Regions.edgeRegions(x)
    assert(rs == Vector(Regions.Region(0, 2, 0), Regions.Region(3, 5, 0), Regions.Region(6, 7, 0)))
  }

  test("edgeRegions: uniform signal is a single region") {
    assert(Regions.edgeRegions(Array(7.0, 7.0, 7.0)) == Vector(Regions.Region(0, 2, 0)))
  }

  test("outsideMedian samples both sides, falls back when whole-doc") {
    val x = Array(1.0, 2.0, 100.0, 100.0, 3.0)
    // region [2,3]: outside = {1,2} left + {3} right -> median of [1,2,3] = 2
    assert(Regions.outsideMedian(x, 2, 3, reach = 3, fallback = -1.0) == 2.0)
    assert(Regions.outsideMedian(x, 0, 4, reach = 3, fallback = -1.0) == -1.0)
  }
}

class RegionClassifierSpec extends AnyFunSuite {

  private def block(path: String, nChars: Int, nLinkChars: Int, idx: Int): Block =
    Block(path, "x" * nChars, 0, nChars, nChars, math.max(1, nChars / 6),
      nLinkChars, 0, path.count(_ == '/') + 1, idx)

  /** nav-heavy page: big nav regions around one article region. */
  private def linkfarmBlocks: Array[Block] = {
    val nav1 = (0 until 8).map(i => block("html/body/nav/ul/li", 20, 20, i))
    val art = (8 until 12).map(i => block("html/body/article/p", 400, 0, i))
    val nav2 = (12 until 20).map(i => block("html/body/footer/ul/li", 18, 18, i))
    (nav1 ++ art ++ nav2).toArray
  }

  test("fbcitb: article region kept, nav sibling regions dropped") {
    val blocks = linkfarmBlocks
    val keep = Classifiers.classify(blocks, Classifiers.Config(kind = "fbcitb"))
    assert((8 until 12).forall(keep), "article blocks must be kept")
    assert((0 until 8).forall(!keep(_)), "nav blocks must be dropped")
    assert((12 until 20).forall(!keep(_)), "footer blocks must be dropped")
  }

  test("cococlust: edge-bounded content region kept against flat surroundings") {
    val blocks = linkfarmBlocks
    val keep = Classifiers.classify(blocks, Classifiers.Config(kind = "cococlust"))
    assert((8 until 12).forall(keep))
    assert((0 until 8).forall(!keep(_)))
  }

  test("localotsu: per-region threshold separates within-region contrast") {
    // one region with internal contrast (content 255 vs teaser 100) that a
    // document-global threshold would split differently
    val blocks = linkfarmBlocks
    val keep = Classifiers.classify(blocks, Classifiers.Config(kind = "localotsu"))
    assert((8 until 12).forall(keep))
    assert((0 until 8).forall(!keep(_)))
  }

  test("fbcitb: dark-polarity region (below surroundings) contributes nothing") {
    // a low-signal div sandwiched between two bright articles
    val a = (0 until 4).map(i => block("html/body/article/p", 300, 0, i))
    val mid = (4 until 6).map(i => block("html/body/div/span", 30, 0, i))
    val b = (6 until 10).map(i => block("html/body/section/p", 300, 0, i))
    val keep = Classifiers.classify((a ++ mid ++ b).toArray,
      Classifiers.Config(kind = "fbcitb", smoothing = "median", morphIters = 0))
    assert((0 until 4).forall(keep) && (6 until 10).forall(keep))
    assert(!keep(4) && !keep(5))
  }

  test("nativeadaptive auto-invert rescues an upside-down mask") {
    // majority of blocks are bright BUT half-link (a boilerplate-dominant
    // page); true content is the dimmer link-free minority. The raw
    // threshold keeps the bright linky side -> polarity check flips it.
    val linky = (0 until 9).map(i => block("html/body/div/ul/li", 600, 300, i))
    val content = (9 until 12).map(i => block("html/body/article/p", 150, 0, i))
    val blocks = (linky ++ content).toArray
    val keep = Classifiers.classify(blocks,
      Classifiers.Config(kind = "nativeadaptive", morphIters = 0))
    assert((9 until 12).forall(keep), "link-free content must be kept after inversion")
    assert((0 until 9).forall(!keep(_)), "linky majority must be dropped")
  }

  test("nativeadaptive does NOT invert a legitimate all-content page") {
    val content = (0 until 10).map(i => block("html/body/article/p", 300, 0, i))
    val keep = Classifiers.classify(content.toArray, Classifiers.Config(kind = "nativeadaptive"))
    assert(keep.forall(identity))
  }
}

class OrientationSpec extends AnyFunSuite {

  private def block(nChars: Int, nLinkChars: Int, idx: Int): Block =
    Block("html/body/div", "x" * nChars, 0, nChars, nChars, 1, nLinkChars, 0, 3, idx)

  test("article: text-rich, link-light") {
    val blocks = ((0 until 6).map(i => block(300, 0, i)) ++ (6 until 9).map(i => block(30, 30, i))).toArray
    assert(Orientation.detect(blocks).docType == "article")
  }

  test("listing: link-dominated, many blocks, no text-rich mass") {
    val blocks = (0 until 30).map(i => block(40, 36, i)).toArray
    assert(Orientation.detect(blocks).docType == "listing")
  }

  test("sparse: tiny pages") {
    assert(Orientation.detect(Array(block(50, 0, 0), block(40, 0, 1))).docType == "sparse")
    assert(Orientation.detect(Array.empty[Block]).docType == "sparse")
  }

  test("profiles: listing stricter, sparse looser, article identity") {
    val base = Classifiers.Default
    assert(Orientation.profileFor("article", base) == base)
    val listing = Orientation.profileFor("listing", base)
    assert(listing.maxLinkDensity < base.maxLinkDensity && listing.absMin > base.absMin)
    assert(Orientation.profileFor("sparse", base).absMin < base.absMin)
  }
}

class SeparatorFrameSpec extends AnyFunSuite {

  private def sep(idx: Int): Block =
    Block("html/body/div", "----------", 0, 10, 10, 1, 0, 0, 3, idx)
  private def content(idx: Int): Block =
    Block("html/body/article/p", "w" * 300, 0, 300, 300, 50, 0, 0, 4, idx)
  private def chrome(idx: Int): Block =
    Block("html/body/nav", "n" * 20, 0, 20, 20, 4, 18, 3, 3, idx)

  test("separator predicate") {
    assert(Boundary.isSeparator(sep(0)))
    assert(!Boundary.isSeparator(content(1)))
    assert(!Boundary.isSeparator(chrome(2)))
  }

  test("frame found when >= 4 separators bound the content") {
    val blocks = Array(
      chrome(0), sep(1), content(2), sep(3), content(4), sep(5), content(6), sep(7), chrome(8))
    val labels = blocks.map(b => b.nChars >= 300)
    val r = Boundary.findSeparatorFrame(blocks, labels)
    assert(r.contains(Boundary.Region(2, 6)))
  }

  test("fewer than 4 separators -> None (houghLine's < 4 lines -> false)") {
    val blocks = Array(chrome(0), sep(1), content(2), sep(3), chrome(4))
    val labels = blocks.map(b => b.nChars >= 300)
    assert(Boundary.findSeparatorFrame(blocks, labels).isEmpty)
  }

  test("a run of adjacent separators counts as ONE line (ADVICE r2)") {
    // a single 7-block divider run must NOT satisfy minSeparators=4 alone
    val blocks = (Array(content(0)) ++ (1 to 7).map(sep) ++ Array(content(8))).toArray
    val labels = blocks.map(b => b.nChars >= 300)
    assert(Boundary.findSeparatorFrame(blocks, labels).isEmpty,
      "one 7-block run is one line, not 4")
    // and when a run IS a border, the frame starts after the run's END
    val b2 = Array(chrome(0), sep(1), sep(2), sep(3), content(4), sep(5),
      content(6), sep(7), content(8), sep(9), chrome(10))
    val l2 = b2.map(b => b.nChars >= 300)
    assert(Boundary.findSeparatorFrame(b2, l2).contains(Boundary.Region(4, 8)))
  }

  test("pipeline composition: separators kind falls back to contour") {
    // a page with no separator blocks extracts identically under both kinds
    val para = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed " * 8).trim
    val html = s"<html><body><nav><a href='/'>Home</a></nav>" +
      s"<article><p>$para</p><p>$para</p></article>" +
      s"<footer><a href='/t'>Terms</a></footer></body></html>"
    val page = graft.core.PageRow("https://t.example/s", new java.sql.Timestamp(0L),
      html.getBytes(java.nio.charset.StandardCharsets.UTF_8), "", "en")
    val a = graft.pipeline.Extract(page)
    val b = graft.pipeline.Extract(page,
      graft.pipeline.Extract.Config(boundaryKind = "separators"))
    assert(a.extracted_text == b.extracted_text && a.extracted_text.nonEmpty)
  }
}
