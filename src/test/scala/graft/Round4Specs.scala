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
