package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.classify.Classifiers
import graft.core.Block

/** Round-3 behavior pins. */

/** binarizeByLocalVariances mask 3 — the gaussian noise model
  * (binarizeByLocalVariances.cpp:101-137, VERDICT r2 item 4): blocks whose
  * log-intensity is explainable by the page's own background process are
  * dropped even when they clear the global level (masks 1+2).
  */
class VariancesMask3Spec extends AnyFunSuite {

  private def block(tagPath: String, nChars: Int, nLinkChars: Int, idx: Int): Block =
    Block(tagPath, "x" * nChars, 0, nChars, nChars, math.max(1, nChars / 6),
      nLinkChars, nLinkChars / 6, 3, idx)

  // page: linky nav, link-free "crumbs" (40-60 chars — the sub-absMin noise
  // population), saturated article, then link-free ~85-char taglines whose
  // log-signal sits within the noise model's ~0.66-nat kill radius of the
  // crumb mean
  private def page(): (Array[Block], Range, Range) = {
    val bs = scala.collection.mutable.ArrayBuffer.empty[Block]
    def add(tp: String, n: Int, l: Int): Int = { bs += block(tp, n, l, bs.length); bs.length - 1 }
    (0 until 4).foreach(_ => add("html/body/header/nav/ul/li/a", 12, 12))
    add("html/body/header/div", 48, 0) // crumb
    add("html/body/header/div", 55, 0) // crumb
    add("html/body/header/div", 44, 0) // crumb
    val artLo = bs.length
    (0 until 6).foreach(_ => add("html/body/article/p", 380, 0))
    val artHi = bs.length - 1
    val tagLo = bs.length
    add("html/body/div", 85, 0) // tagline
    add("html/body/div", 90, 0) // tagline
    add("html/body/div", 82, 0) // tagline
    val tagHi = bs.length - 1
    (0 until 4).foreach(_ => add("html/body/footer/ul/li/a", 10, 10))
    (bs.toArray, artLo to artHi, tagLo to tagHi)
  }

  test("mask 3 drops quasi-chrome taglines that masks 1+2 alone would keep") {
    val (blocks, art, tags) = page()
    val cfg = Classifiers.Config(kind = "variances")
    val keep = Classifiers.classify(blocks, cfg)
    art.foreach(i => assert(keep(i), s"article block $i must stay kept"))
    tags.foreach(i => assert(!keep(i), s"tagline block $i must be noise-killed"))
    // and prove mask 3 is the DECIDING mask: the taglines clear the level
    // that masks 1+2 test against (level = 0.125*(max-min)/2 + min) and the
    // absMin floor, so without mask 3 they would be kept
    val x = Classifiers.signal(blocks)
    val level = 0.125 * (x.max - x.min) / 2.0 + x.min
    tags.foreach { i =>
      assert(x(i) > level && x(i) > cfg.absMin,
        s"tagline $i must pass masks 1+2 (x=${x(i)}, level=$level)")
    }
  }

  test("mask 3 is inert without a textured background population to model") {
    // same taglines, but the page has NO sub-absMin texture (only pure-link
    // zero-signal nav): noiseCnt == 0 → N ≡ 0 → the taglines survive — the
    // kill above is attributable to the noise model, nothing else
    val bs = scala.collection.mutable.ArrayBuffer.empty[Block]
    def add(tp: String, n: Int, l: Int): Unit = bs += block(tp, n, l, bs.length)
    (0 until 7).foreach(_ => add("html/body/header/nav/ul/li/a", 12, 12))
    (0 until 6).foreach(_ => add("html/body/article/p", 380, 0))
    add("html/body/div", 85, 0)
    add("html/body/div", 90, 0)
    add("html/body/div", 82, 0)
    val tagHi = bs.length - 1
    (0 until 4).foreach(_ => add("html/body/footer/ul/li/a", 10, 10))
    val blocks = bs.toArray
    val keep = Classifiers.classify(blocks, Classifiers.Config(kind = "variances"))
    ((tagHi - 2) to tagHi).foreach(i =>
      assert(keep(i), s"tagline $i must survive with no noise evidence"))
  }
}
