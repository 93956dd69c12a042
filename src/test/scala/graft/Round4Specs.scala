package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.classify.Classifiers
import graft.fixtures.FixtureGen
import graft.pipeline.Extract

/** Threshold-rule ground-truth corpora (VERDICT r3 item 3): each scalar
  * rule's distinctive term is THE deciding factor on its corpus — the rule
  * recovers generator ground truth on every page while a named rival rule
  * (usually the plain window-mean baseline) provably fails on (nearly)
  * every page. These five corpora join fbsect/cocoedge/overwrap/standard/
  * adversarial in GoldenParquet's double-entry refuse-gate (10 corpora
  * total), so the q_extract_<corpus> goldens are anchored to independent
  * truth, not self-frozen.
  */
class GroundTruthVariantsSpec extends AnyFunSuite {

  private val N = 60 // spec-time sample; the golden gate runs 140

  private def run(f: FixtureGen.Fixture, cfg: Classifiers.Config): String =
    Extract(f.page, Extract.Config(classifier = cfg)).extracted_text

  for ((corpus, gen, cfg) <- FixtureGen.ruleCorpora) {
    test(s"$corpus: ${cfg.kind} recovers ground truth on every page") {
      val bad = gen(N).count(f => run(f, cfg) != f.expected)
      assert(bad == 0, s"$corpus under ${cfg.kind}: $bad/$N mismatched")
    }
  }

  /** The discrimination matrix: for each corpus, the named rival kinds make
    * the OPPOSITE call on the probe blocks (margins derived in
    * FixtureGen's corpus comments), so they fail ground truth on >= 90% of
    * pages — the distinctive term is doing the work, not the shared
    * pipeline around it.
    */
  private val rivals: Map[String, Seq[Classifiers.Config]] = Map(
    "nibhi" -> Seq(Classifiers.Config(kind = "meanadaptive"),
      Classifiers.Config(kind = "sauvola")),
    "nickdim" -> Seq(Classifiers.Config(kind = "sauvola"),
      Classifiers.Config(kind = "feng")),
    "wolfglob" -> Seq(Classifiers.Config(kind = "meanadaptive"),
      Classifiers.Config(kind = "sauvola")),
    "fengpoly" -> Seq(Classifiers.Config(kind = "sauvola"),
      Classifiers.Config(kind = "meanadaptive"),
      Classifiers.Config(kind = "wolfjolion")),
    "kuwedge" -> Seq(Classifiers.Config(kind = "meanadaptive"),
      Classifiers.Config(kind = "sauvola"),
      Classifiers.Config(kind = "niblack")),
  )

  for ((corpus, gen, _) <- FixtureGen.ruleCorpora; rival <- rivals(corpus)) {
    test(s"$corpus: rival ${rival.kind} fails ground truth on >= 90% of pages") {
      val bad = gen(N).count(f => run(f, rival) != f.expected)
      assert(bad >= (N * 9) / 10, s"$corpus under rival ${rival.kind}: " +
        s"only $bad/$N mismatched — the corpus does not discriminate")
    }
  }
}

/** rotate wired into the pipeline (VERDICT r3 item 4; rotate.cpp:35-72 via
  * Rotate.tableRuns): on the colflow corpus — column-flow layout tables
  * emitted row-major by the DOM — extraction is WRONG on every page
  * without the 90° grid linearization and byte-identical to generator
  * ground truth with it (the q_extract_overwrap discrimination pattern).
  */
class RotatePipelineSpec extends AnyFunSuite {

  private val N = 60
  private val on = Extract.Config(rotate = 90, rotateCols = 3)

  test("colflow: rotate=90/cols=3 recovers ground truth on every page") {
    val bad = FixtureGen.colflow(N)
      .count(f => Extract(f.page, on).extracted_text != f.expected)
    assert(bad == 0, s"$bad/$N mismatched with rotate on")
  }

  test("colflow: WITHOUT rotate the row-major interleaving is wrong on every page") {
    val bad = FixtureGen.colflow(N)
      .count(f => Extract(f.page).extracted_text != f.expected)
    assert(bad == N, s"only $bad/$N mismatched without rotate — corpus too easy")
  }

  test("rotate touches ONLY table-cell runs; non-table pages are byte-identical under it") {
    val bad = FixtureGen.fixtures(40)
      .count(f => Extract(f.page, on).extracted_text != Extract(f.page).extracted_text)
    assert(bad == 0, s"$bad/40 standard (table-free) pages changed under rotate config")
  }

  test("ragged colflow grids keep every cell exactly once") {
    // ~1/3 of pages have a ragged last row; rotate must never drop or pad
    FixtureGen.colflow(N).foreach { f =>
      val got = Extract(f.page, on).extracted_text
      assert(got.split('\n').sorted.toSeq == f.expected.split('\n').sorted.toSeq,
        s"cell multiset mismatch for ${f.page.url}")
    }
  }
}
