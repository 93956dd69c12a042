package graft.detect

import graft.core.Block

/** findAngle as a real operator (VERDICT r2 item 10; deskew.cpp:139-206).
  *
  * The reference finds the page's systematic rotation: Hough line segments
  * (minLineLength = width/8), per-line angle, delta-clustered histogram
  * (eq_d, delta = 0.01 rad), mode wins with ties to the first-encountered
  * cluster (std::max_element keeps the earliest strict maximum), and
  * deskew() rotates by −angle.
  *
  * Webtext transplant — the skew axis is SYSTEMATIC WRAPPER NESTING.
  * Template generators wrap each section in variable-depth runs of
  * identical elements (`<div><div><div>…`), tilting every block's tagPath
  * by a structural angle the way a scanner tilts every text line:
  *
  *  - a "line" is a block long enough to be structure evidence:
  *    nChars >= maxChars/8, the HoughLinesP minLineLength = width/8 gate;
  *  - a line's "angle" is its wrapper-nesting excess: tagPath depth minus
  *    the depth after collapsing runs of consecutive identical segments
  *    (an integer, so the reference's delta < 1-degree clustering becomes
  *    exact equality);
  *  - findAngle is the first-encountered mode of line angles — 0 for a
  *    clean document;
  *  - deskew "rotates by −angle": collapse the duplicate-segment runs in
  *    every tagPath, restoring a uniform structural depth so the tagPath
  *    region tree (binarizeFBCITB's contour hierarchy) sees real section
  *    boundaries instead of wrapper noise. angle == 0 short-circuits to a
  *    no-op — the rotate() exact fast path.
  */
object Deskew {

  /** Collapse runs of consecutive identical tagPath segments:
    * "html/body/div/div/div/article/p" → "html/body/div/article/p".
    */
  def collapse(path: String): String = {
    if (path.isEmpty) return path
    val segs = path.split('/')
    val sb = new java.lang.StringBuilder(path.length)
    var prev: String = null
    var i = 0
    while (i < segs.length) {
      if (segs(i) != prev) {
        if (sb.length > 0) sb.append('/')
        sb.append(segs(i))
        prev = segs(i)
      }
      i += 1
    }
    sb.toString
  }

  /** Wrapper-nesting excess of one path — the per-line "angle". */
  def angleOf(path: String): Int = {
    if (path.isEmpty) return 0
    var excess = 0
    var segStart = 0
    var prevStart = -1
    var prevLen = -1
    var i = 0
    val n = path.length
    while (i <= n) {
      if (i == n || path.charAt(i) == '/') {
        val len = i - segStart
        if (prevLen == len && path.regionMatches(prevStart, path, segStart, len))
          excess += 1
        prevStart = segStart
        prevLen = len
        segStart = i + 1
      }
      i += 1
    }
    excess
  }

  /** The document's structural skew: first-encountered mode of the
    * wrapper-excess angles of long blocks (nChars * 8 >= maxChars — the
    * minLineLength = width/8 gate in exact multiply form, matching the
    * q_angle oracle's `n_chars * 8 >= mx` so the two sides agree even when
    * maxChars is not divisible by 8; ADVICE r3). Returns 0 for an empty
    * document or one with no long blocks — the reference's
    * `if (!nb_lines) return 0.0`.
    */
  def findAngle(blocks: Array[Block]): Int = {
    if (blocks.isEmpty) return 0
    var maxChars = 0
    var i = 0
    while (i < blocks.length) {
      if (blocks(i).nChars > maxChars) maxChars = blocks(i).nChars
      i += 1
    }
    // clusters in first-encountered order (the reference's t_diff list)
    val order = scala.collection.mutable.ArrayBuffer.empty[Int]
    val counts = scala.collection.mutable.HashMap.empty[Int, Int]
    i = 0
    while (i < blocks.length) {
      if (blocks(i).nChars.toLong * 8 >= maxChars) {
        val a = angleOf(blocks(i).tagPath)
        if (!counts.contains(a)) order += a
        counts(a) = counts.getOrElse(a, 0) + 1
      }
      i += 1
    }
    if (order.isEmpty) return 0
    var best = order(0); var bestCnt = counts(best)
    var j = 1
    while (j < order.length) {
      val a = order(j)
      if (counts(a) > bestCnt) { best = a; bestCnt = counts(a) } // strict > = first wins
      j += 1
    }
    best
  }

  /** Rotate by −angle: collapse wrapper runs in every block's tagPath.
    * No-op when angle == 0 (rotate's exact fast path).
    */
  def deskew(blocks: Array[Block], angle: Int): Array[Block] =
    if (angle == 0) blocks
    else blocks.map(b => b.copy(tagPath = collapse(b.tagPath)))
}
