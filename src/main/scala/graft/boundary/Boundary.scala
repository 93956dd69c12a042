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

  /** Alternative boundary finder — the findHoughLineContour transplant
    * (houghLine.cpp:177-256), the reference's only second border-detection
    * strategy behind the same interface. The reference median-blurs, finds
    * straight LINES (Hough), requires at least 4, dedupes similar lines
    * (deleteSimilarLines, :238), and keeps the largest valid quad they
    * bound. 1-D: candidate "lines" are SEPARATOR blocks (rule lines:
    * punctuation-dominated low-signal blocks — the <hr>-ish "-----" /
    * "· · ·" dividers); adjacent separators collapse to one; with fewer
    * than `minSeparators` the finder reports failure (houghLine.cpp:232-235
    * `lines.size() < 4 → false`) and the caller falls back to the contour
    * finder — exactly the reference's strategy composition. The accepted
    * frame is the smallest separator-bounded span holding >= minKeptFraction
    * of the kept signal (the largest-valid-quad criterion :160-168 — any
    * WIDER frame is also valid, so the smallest valid one excludes the most
    * outside clutter, which is the quad's purpose).
    */
  def findSeparatorFrame(
      blocks: Array[Block],
      labels: Array[Boolean],
      minSeparators: Int = 4,
      minKeptFraction: Double = 0.8): Option[Region] = {
    val n = blocks.length
    if (n == 0) return None
    // candidate lines: one entry per RUN of adjacent separator blocks (a
    // k-block divider is ONE rule line, not ceil(k/2) — deleteSimilarLines
    // intent; ADVICE r2). Each run is kept as its (start, end) span: as a
    // lower border the frame begins after the run END, as an upper border it
    // ends before the run START.
    val sepRuns = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var i = 0
    while (i < n) {
      if (isSeparator(blocks(i))) {
        if (sepRuns.nonEmpty && sepRuns.last._2 == i - 1)
          sepRuns(sepRuns.length - 1) = (sepRuns.last._1, i)
        else sepRuns += ((i, i))
      }
      i += 1
    }
    if (sepRuns.length < minSeparators) return None
    // kept-signal prefix sums
    val prefix = new Array[Double](n + 1)
    i = 0
    while (i < n) {
      prefix(i + 1) = prefix(i) +
        (if (labels(i)) (blocks(i).nChars - blocks(i).nLinkChars).toDouble else 0.0)
      i += 1
    }
    val total = prefix(n)
    if (total <= 0) return None
    // borders: the last separator run with <= (1-minKeptFraction)/2 of the
    // signal before its end, and the first run with as little after its start
    val slack = (1.0 - minKeptFraction) / 2.0 * total
    var loEnd = -1
    var hiStart = n
    sepRuns.foreach { case (start, end) =>
      if (prefix(end + 1) <= slack) loEnd = end
      if (total - prefix(start) <= slack && hiStart == n) hiStart = start
    }
    val lo = loEnd + 1
    val hi = hiStart - 1
    if (hi < lo) return None
    val inside = prefix(hi + 1) - prefix(lo)
    if (inside < minKeptFraction * total) None
    else Some(Region(lo, hi))
  }

  /** Separator-block predicate: short, link-free, and dominated by
    * non-alphanumeric chars (the pixel pattern of a rule line).
    */
  def isSeparator(b: Block): Boolean = {
    if (b.nChars == 0 || b.nChars > 64 || b.nLinkChars > 0) return false
    var punct = 0
    var i = 0
    val t = b.text
    while (i < t.length) {
      val c = t.charAt(i)
      val alnum = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c > 127
      if (!alnum && c != ' ') punct += 1
      i += 1
    }
    punct * 5 >= t.length * 4 // >= 80% punctuation
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
