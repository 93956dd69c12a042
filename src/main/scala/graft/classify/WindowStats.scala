package graft.classify

/** Per-row sliding-window statistics over the block sequence via prefix sums —
  * the 1-D transplant of the reference's integral-image scaffold
  * (binarizeSauvola.cpp:64-110: `cv::integral` + 4-corner kernel for O(1)
  * window mean, squared integral for stddev; same scaffold in
  * Niblack/NICK/WolfJolion/Feng). Window bounds are CLAMPED at array edges —
  * the analogue of `copyMakeBorder(..., BORDER_REPLICATE)`
  * (binarizeSauvola.cpp:65). All math in Double, mirroring the reference's
  * widening to CV_64FC1 (binarizeSauvola.cpp:54).
  */
final class WindowStats(x: Array[Double]) {
  val n: Int = x.length
  // prefix(i) = sum of x(0..i-1); prefixSq likewise for x^2; prefixNz counts
  // nonzero entries (for background-masked stats, see maskedMean)
  private val prefix = new Array[Double](n + 1)
  private val prefixSq = new Array[Double](n + 1)
  private val prefixNz = new Array[Int](n + 1)
  locally {
    var i = 0
    while (i < n) {
      prefix(i + 1) = prefix(i) + x(i)
      prefixSq(i + 1) = prefixSq(i) + x(i) * x(i)
      prefixNz(i + 1) = prefixNz(i) + (if (x(i) != 0.0) 1 else 0)
      i += 1
    }
  }

  @inline private def lo(i: Int, half: Int): Int = math.max(0, i - half)
  @inline private def hi(i: Int, half: Int): Int = math.min(n - 1, i + half)

  /** Window mean centered at i, half-width = window/2, clamped. */
  def mean(i: Int, window: Int): Double = {
    val half = window / 2
    val l = lo(i, half); val h = hi(i, half)
    (prefix(h + 1) - prefix(l)) / (h - l + 1)
  }

  /** Population stddev over the clamped window: sqrt(E[x^2] - E[x]^2),
    * floored at 0 (binarizeSauvola.cpp:93-110; the variance floor mirrors
    * MatToLocalVarianceMap's 0.01 floor, imageLibCommon.cpp:397-466).
    */
  def std(i: Int, window: Int): Double = {
    val half = window / 2
    val l = lo(i, half); val h = hi(i, half)
    val cnt = (h - l + 1).toDouble
    val m = (prefix(h + 1) - prefix(l)) / cnt
    val v = (prefixSq(h + 1) - prefixSq(l)) / cnt - m * m
    if (v <= 0) 0.0 else math.sqrt(v)
  }

  /** Background-masked window mean: stats over NONZERO entries only — the
    * backgroundNormalization transplant (backgroundNormalization.cpp:36-61,
    * correctNUIL.cpp:55-90: remove the slowly-varying known background so the
    * local threshold reflects local CONTENT). Zero-signal blocks (pure link
    * lists, empty chrome) are known background; including them drags the
    * window mean toward zero and destroys the content/teaser separation.
    * Returns 0 when the window holds no nonzero entry.
    */
  def maskedMean(i: Int, window: Int): Double = {
    val half = window / 2
    val l = lo(i, half); val h = hi(i, half)
    val nz = prefixNz(h + 1) - prefixNz(l)
    if (nz == 0) 0.0 else (prefix(h + 1) - prefix(l)) / nz
  }

  /** Masked companion of [[std]]. */
  def maskedStd(i: Int, window: Int): Double = {
    val half = window / 2
    val l = lo(i, half); val h = hi(i, half)
    val nz = prefixNz(h + 1) - prefixNz(l)
    if (nz == 0) return 0.0
    val m = (prefix(h + 1) - prefix(l)) / nz
    val v = (prefixSq(h + 1) - prefixSq(l)) / nz - m * m
    if (v <= 0) 0.0 else math.sqrt(v)
  }

  /** Explicit-range mean over [l, h] inclusive (clamped). */
  def rangeMean(l0: Int, h0: Int): Double = {
    val l = math.max(0, l0); val h = math.min(n - 1, h0)
    if (h < l) return 0.0
    (prefix(h + 1) - prefix(l)) / (h - l + 1)
  }

  /** Explicit-range population stddev over [l, h] inclusive (clamped). */
  def rangeStd(l0: Int, h0: Int): Double = {
    val l = math.max(0, l0); val h = math.min(n - 1, h0)
    if (h < l) return 0.0
    val cnt = (h - l + 1).toDouble
    val m = (prefix(h + 1) - prefix(l)) / cnt
    val v = (prefixSq(h + 1) - prefixSq(l)) / cnt - m * m
    if (v <= 0) 0.0 else math.sqrt(v)
  }

  /** Exact window min/max (no prefix trick; windows are small). */
  def minMax(i: Int, window: Int): (Double, Double) = {
    val half = window / 2
    var l = lo(i, half); val h = hi(i, half)
    var mn = x(l); var mx = x(l)
    l += 1
    while (l <= h) {
      if (x(l) < mn) mn = x(l)
      if (x(l) > mx) mx = x(l)
      l += 1
    }
    (mn, mx)
  }

  /** Exact window median (binarizeAT's medianBlur analogue,
    * binarizeAT.cpp:33-68). Lower-median for even counts (deterministic).
    */
  def median(i: Int, window: Int): Double = {
    val half = window / 2
    val l = lo(i, half); val h = hi(i, half)
    val buf = java.util.Arrays.copyOfRange(x, l, h + 1)
    java.util.Arrays.sort(buf)
    buf((buf.length - 1) / 2)
  }

  /** Gaussian-weighted window mean (binarizeGAT/PureAdaptiveGaussian
    * analogue; weight vector from the classic binomial-ish gaussian,
    * getGaussianKernel2D analogue imageLibCommon.cpp:898). Weights are
    * renormalized over the clamped support (deterministic at edges).
    */
  def gaussMean(i: Int, window: Int, sigma: Double): Double = {
    val half = window / 2
    val l = lo(i, half); val h = hi(i, half)
    var num = 0.0; var den = 0.0
    var j = l
    while (j <= h) {
      val d = (j - i).toDouble
      val w = math.exp(-d * d / (2 * sigma * sigma))
      num += w * x(j); den += w
      j += 1
    }
    num / den
  }

  /** Whole-row aggregates (per-row analogue of image-global `minMaxLoc`,
    * binarizeWolfJolion.cpp:115-119).
    */
  def globalMin: Double = { var m = Double.MaxValue; var i = 0; while (i < n) { if (x(i) < m) m = x(i); i += 1 }; if (n == 0) 0.0 else m }
  def globalMax: Double = { var m = Double.MinValue; var i = 0; while (i < n) { if (x(i) > m) m = x(i); i += 1 }; if (n == 0) 0.0 else m }
  def globalMaxStd(window: Int): Double = {
    var m = 0.0; var i = 0
    while (i < n) { val s = std(i, window); if (s > m) m = s; i += 1 }
    m
  }

  /** Masked companion of [[globalMaxStd]]: max over the SAME masked std map
    * the per-block thresholds use. The reference normalizes by the max of
    * the std map it thresholds with (binarizeWolfJolion.cpp:114-130); mixing
    * a raw max into a masked map deflates s/sMax ~40x on link-chrome-heavy
    * pages and collapses Wolf-Jolion into a Sauvola look-alike (caught by
    * the wolfglob ground-truth corpus, r4).
    */
  def maskedGlobalMaxStd(window: Int): Double = {
    var m = 0.0; var i = 0
    while (i < n) { val s = maskedStd(i, window); if (s > m) m = s; i += 1 }
    m
  }
  def value(i: Int): Double = x(i)
}
