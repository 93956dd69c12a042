package graft.classify

import scala.collection.mutable.ArrayBuffer

/** Region structure over the block sequence — the transplant of the
  * reference's contour machinery (cv::findContours RETR_TREE/RETR_EXTERNAL +
  * RemoveChildrenContours, imageLibCommon.cpp:468-681) to the 1-D block
  * domain. Two region sources, matching the two ways the reference finds
  * contours:
  *
  *  - [[tagPathRegions]]: the DOM tree IS the contour hierarchy. A region is
  *    a maximal run of consecutive blocks sharing the same leading tagPath
  *    segments — the exact analogue of a contour's pixel set, with parent /
  *    child / sibling structure given by path depth. Used by binarizeFBCITB
  *    (region polarity needs siblings, binarizeFBCITB.cpp:228-356).
  *
  *  - [[edgeRegions]]: regions bounded by signal EDGES — the Canny →
  *    findContours path of binarizeCOCOCLUST.cpp:96-125 and
  *    binarizeLocalOtsu.cpp:88-112. A 1-D Canny: gradient = |x(i)-x(i-1)|,
  *    hysteresis thresholds derived from Otsu over the gradient
  *    distribution (CannyEdgeDetection's Otsu-derived thresholds,
  *    imageLibCommon.cpp:1200-1239; upper/lower coeff 0.6/0.4 as in
  *    binarizeFBCITB.cpp:54-58 defaults).
  */
object Regions {

  /** Inclusive block-index range. `depth` = tagPath segment depth at which
    * the region was emitted (tagPathRegions) or 0 (edgeRegions).
    */
  final case class Region(lo: Int, hi: Int, depth: Int) {
    def size: Int = hi - lo + 1
  }

  /** Segment `k` of a '/'-separated path, or "" past the end. Allocation-free
    * compare is done via (start,end) offsets in [[segmentBounds]].
    */
  private def segmentBounds(path: String, k: Int): (Int, Int) = {
    var start = 0
    var seg = 0
    val n = path.length
    while (seg < k) {
      val slash = path.indexOf('/', start)
      if (slash < 0) return (n, n) // past the end → empty segment
      start = slash + 1
      seg += 1
    }
    val end = path.indexOf('/', start)
    ((start, if (end < 0) n else end))
  }

  private def sameSegment(a: String, b: String, k: Int): Boolean = {
    val (as, ae) = segmentBounds(a, k)
    val (bs, be) = segmentBounds(b, k)
    if (ae - as != be - bs) return false
    var i = 0
    val len = ae - as
    while (i < len) {
      if (a.charAt(as + i) != b.charAt(bs + i)) return false
      i += 1
    }
    true
  }

  /** DOM-tree regions: recursively split the block sequence into maximal
    * runs sharing tagPath segment `depth`; a run covering more than
    * `maxAreaCoeff` of the document is replaced by its children at the next
    * depth (the reference's bounding-rect max-area filter,
    * binarizeFBCITB.cpp:224-250 — an over-large contour is skipped and its
    * inner contours carry the decision). A run that cannot be subdivided
    * further (no deeper segments, or a single child identical to itself) is
    * emitted as-is.
    */
  def tagPathRegions(
      paths: Array[String],
      maxAreaCoeff: Double = 0.8,
      maxDepth: Int = 16): Vector[Region] = {
    val n = paths.length
    if (n == 0) return Vector.empty
    val out = Vector.newBuilder[Region]
    val maxSize = math.max(1.0, maxAreaCoeff * n)

    def emitRuns(lo: Int, hi: Int, depth: Int): Unit = {
      var i = lo
      while (i <= hi) {
        var j = i
        while (j < hi && sameSegment(paths(j), paths(j + 1), depth)) j += 1
        val runSize = j - i + 1
        // descend while the run's FULL paths still differ somewhere deeper
        // (guard against infinite descent on identical paths)
        val subdividable = depth < maxDepth && canSplit(i, j)
        if (runSize > maxSize && subdividable) emitRuns(i, j, depth + 1)
        else out += Region(i, j, depth)
        i = j + 1
      }
    }

    def canSplit(lo: Int, hi: Int): Boolean = {
      var i = lo
      while (i < hi) {
        if (paths(i) != paths(i + 1)) return true
        i += 1
      }
      false
    }

    emitRuns(0, n - 1, 0)
    out.result()
  }

  /** Signal-edge regions: 1-D Canny over the block signal. Gradient
    * g(i) = |x(i) - x(i-1)|; Otsu over the nonzero gradients gives the base
    * threshold; hysteresis accepts strong edges (g >= 0.6·base is a cut) and
    * weak edges (g >= 0.4·base) only when adjacent to a strong one
    * (CannyEdgeDetection coefficients, binarizeFBCITB.cpp:54-58). Cuts
    * partition [0, n) into regions.
    */
  def edgeRegions(x: Array[Double], upperCoeff: Double = 0.6, lowerCoeff: Double = 0.4): Vector[Region] = {
    val n = x.length
    if (n == 0) return Vector.empty
    if (n == 1) return Vector(Region(0, 0, 0))
    val g = new Array[Double](n) // g(i) = |x(i) - x(i-1)|, g(0) = 0
    var i = 1
    while (i < n) { g(i) = math.abs(x(i) - x(i - 1)); i += 1 }
    // Otsu over nonzero gradients (zero gradients are known non-edges and
    // would swamp the histogram on mostly-uniform docs)
    val nz = g.filter(_ > 0.0)
    if (nz.isEmpty) return Vector(Region(0, n - 1, 0))
    val base = Otsu.threshold(nz, bins = 64)
    val upper = upperCoeff * base
    val lower = lowerCoeff * base
    val strong = new Array[Boolean](n)
    i = 1
    while (i < n) { strong(i) = g(i) >= upper && g(i) > 0.0; i += 1 }
    val cut = new Array[Boolean](n)
    i = 1
    while (i < n) {
      cut(i) = strong(i) ||
        (g(i) >= lower && g(i) > 0.0 &&
          ((i > 1 && strong(i - 1)) || (i < n - 1 && strong(i + 1))))
      i += 1
    }
    val out = Vector.newBuilder[Region]
    var lo = 0
    i = 1
    while (i < n) {
      if (cut(i)) { out += Region(lo, i - 1, 0); lo = i }
      i += 1
    }
    out += Region(lo, n - 1, 0)
    out.result()
  }

  /** Median of the up-to-`reach` signal values on each side just OUTSIDE
    * [lo, hi] — the background sample of binarizeFBCITB.cpp:279-356 (medians
    * of the points ringing the bounding rect) and the external-normal-vector
    * sample of binarizeCOCOCLUST.cpp:262-401 (nVectorLength = 5 points along
    * the outward normal). Returns `fallback` when the region spans the whole
    * document (no outside exists).
    */
  def outsideMedian(x: Array[Double], lo: Int, hi: Int, reach: Int, fallback: Double): Double = {
    val buf = new ArrayBuffer[Double](2 * reach)
    var i = lo - 1
    while (i >= 0 && i >= lo - reach) { buf += x(i); i -= 1 }
    i = hi + 1
    while (i < x.length && i <= hi + reach) { buf += x(i); i += 1 }
    if (buf.isEmpty) return fallback
    val arr = buf.toArray
    java.util.Arrays.sort(arr)
    arr((arr.length - 1) / 2)
  }
}
