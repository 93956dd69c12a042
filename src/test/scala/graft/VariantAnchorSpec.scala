package graft

import graft.fixtures.VariantAnchor
import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r4 item 5: the standard-corpus variant goldens are anchored —
  * every classifier kind is checked against generator ground truth on the
  * full 400-page standard corpus, with the 5 legitimate borderline-delta
  * kinds pinned to exact match counts, exact delta-url sets, and per-line
  * block integrity on the delta pages. GoldenParquet's refuse-gate runs the
  * same checks, so a re-freeze cannot drift from what this suite asserts.
  */
class VariantAnchorSpec extends AnyFunSuite {

  VariantAnchor.allKinds.foreach { kind =>
    test(s"standard-corpus anchor: $kind") {
      val err = VariantAnchor.check(kind)
      assert(err == null, String.valueOf(err))
    }
  }

  test("delta kinds cover all five, and only five") {
    assert(VariantAnchor.deltas.keySet ==
      Set("niblack", "wolfjolion", "mokji", "variances", "cococlust"))
    assert(VariantAnchor.fullMatch.size == 11)
    assert(VariantAnchor.fullMatch.intersect(VariantAnchor.deltas.keys.toSeq).isEmpty)
  }
}
