package graft.boundary

import graft.core.Block

/** Main-content boundary finder — the autoCrop transplant (SURVEY.md §2.4).
  * The reference finds the document quadrilateral and discards surrounding
  * clutter (documentContour, autoCrop.cpp:43-131); we find the contiguous
  * index range of the block sequence holding the main content and discard
  * labels outside it.
  *
  * Algorithm: maximum-sum contiguous region over a per-block score
  * (kept blocks contribute +nonLinkChars, dropped blocks a proportional
  * negative penalty) — Kadane's scan, the 1-D analogue of max-area contour
  * selection (findDocumentContour keeps the max-area valid quad,
  * autoCropUtils.cpp:239-246).
  *
  * Sanity predicate before accepting the crop (mirrors the quad validity
  * checks: area >= 5% of image, autoCropUtils.cpp:177): the region must hold
  * >= minContentFraction of the document's kept signal; otherwise the crop is
  * rejected and labels pass through unchanged — the same give-up-and-return
  * behavior as autoCrop's bounded retry (autoCrop.cpp:105-128).
  */
object Boundary {

  final case class Region(lo: Int, hi: Int) // inclusive block-index range

  def find(
      blocks: Array[Block],
      labels: Array[Boolean],
      penaltyFactor: Double = 0.25,
      minContentFraction: Double = 0.05): Option[Region] = {
    val n = blocks.length
    if (n == 0) return None
    // mean kept signal → penalty scale
    var keptSum = 0.0; var keptCnt = 0
    var i = 0
    while (i < n) {
      if (labels(i)) { keptSum += blocks(i).nChars - blocks(i).nLinkChars; keptCnt += 1 }
      i += 1
    }
    if (keptCnt == 0) return None
    val penalty = -penaltyFactor * (keptSum / keptCnt)
    // Kadane over score
    var best = Double.MinValue; var bestLo = 0; var bestHi = -1
    var cur = 0.0; var curLo = 0
    i = 0
    while (i < n) {
      val s = if (labels(i)) (blocks(i).nChars - blocks(i).nLinkChars).toDouble else penalty
      if (cur <= 0) { cur = s; curLo = i } else cur += s
      if (cur > best) { best = cur; bestLo = curLo; bestHi = i }
      i += 1
    }
    if (bestHi < bestLo) return None
    // trim to kept endpoints
    var lo = bestLo; var hi = bestHi
    while (lo <= hi && !labels(lo)) lo += 1
    while (hi >= lo && !labels(hi)) hi -= 1
    if (hi < lo) return None
    // sanity: region must hold enough of the kept signal
    var regionSum = 0.0
    i = lo
    while (i <= hi) {
      if (labels(i)) regionSum += blocks(i).nChars - blocks(i).nLinkChars
      i += 1
    }
    if (regionSum < minContentFraction * keptSum) None
    else Some(Region(lo, hi))
  }

  /** Apply a found region: clear labels outside it (warpCrop analogue —
    * everything outside the quad is discarded, warp.cpp:32-73).
    */
  def apply(labels: Array[Boolean], region: Option[Region]): Array[Boolean] =
    region match {
      case None => labels
      case Some(r) =>
        val out = labels.clone()
        var i = 0
        while (i < out.length) {
          if (i < r.lo || i > r.hi) out(i) = false
          i += 1
        }
        out
    }
}
