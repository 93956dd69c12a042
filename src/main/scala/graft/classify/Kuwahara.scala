package graft.classify

/** Full 1-D anisotropic Kuwahara (kuwaharaFilter.cpp:34-125,174-234,262-352)
  * — replaces the round-3 two-sector simplification (VERDICT r3 item 7).
  *
  * The reference per pixel:
  *   1. structure tensor of the gaussian-smoothed image → dominant
  *      orientation + anisotropy A = (λ1−λ2)/(λ1+λ2)  (tensorComputation,
  *      :174-236);
  *   2. an anisotropy-scaled coordinate map (ECCEN_TUNING ξ=1: the sampling
  *      ellipse SHRINKS by ξ/(ξ+A) across the dominant structure so sectors
  *      never straddle a coherent edge, :296-313);
  *   3. SECTOR_N=8 radially-gaussian-weighted sectors over the mapped disc,
  *      each with weighted mean and std (div_circle_initialize :36-127,
  *      computationKernel :315-345);
  *   4. output = the mean of the MINIMUM-std sector (:351-352 — the
  *      declared SHARPNESS_Q weighting is dead code in the reference; the
  *      shipped kernel picks the min).
  *
  * 1-D transplant over the block-signal axis:
  *   1. tensor → windowed gradient COHERENCE: 3-tap smoothed signal S,
  *      central difference g, A = |Σg| / Σ|g| over the window — 1 for a
  *      monotone (coherent) edge neighborhood, →0 for alternating texture.
  *      This is the exact 1-D collapse of (λ1−λ2)/(λ1+λ2): λ2 vanishes on
  *      a line, so anisotropy IS directional coherence.
  *   2. ellipse→segment: effective half-length hEff = max(2, ⌊half·ξ/(ξ+A)⌋)
  *      with ξ=1 — near a coherent edge the sampling support halves.
  *   3. the 8 angular sectors collapse onto the line as TWO SIDES × TWO
  *      SCALES: far-left/near-left/near-right/far-right, lengths hEff and
  *      max(1, hEff/2), each weighted by an integer Epanechnikov radial
  *      kernel w(len,d) = len²+1−d² (the gaussian radial falloff replaced
  *      by a correctly-rounded-arithmetic kernel so a DuckDB oracle can
  *      replay the filter bit-identically — the float-parity recipe from
  *      DETERMINISM: integer weights ⇒ integer Σw, Σwx, Σwx² ⇒ exact
  *      rational mean/var in both engines).
  *   4. min-variance sector's weighted mean, first-encountered wins ties
  *      (sector order farL, nearL, nearR, farR — the reference's ascending
  *      scan with strict <, :338-348).
  *
  * Border handling: out-of-range neighbors are SKIPPED (weights only over
  * existing cells), matching the reference's bounds check (:310-312);
  * S and g use BORDER_REPLICATE like cv::GaussianBlur/Sobel defaults.
  */
object Kuwahara {

  /** The smoothed level per position; the classifier thresholds at
    * level − c (MEAN_C over the edge-preserving smooth).
    *
    * `masked`: exclude zero-signal blocks (known background chrome — pure
    * link lists) from SECTOR statistics, the same backgroundNormalization
    * transplant every scalar kind applies (backgroundNormalization.cpp:
    * 36-61). Without it, chrome zeros inflate the variance of the sector on
    * the content side of an edge and a bright-contaminated sector wins the
    * min-variance pick — the filter then smooths ACROSS the very edge it
    * exists to preserve (caught by the kuwedge gate in r4). The tensor/
    * coherence pass stays RAW: edges to chrome are real structure, exactly
    * as the reference's tensor sees the full image.
    */
  /** Smoothed-signal gradients, exactly as the filter sees them: 3-tap
    * replicate-border smooth (scaled by 3), then replicate-border central
    * difference (scaled by 6). Exposed for the tensor-collapse property
    * test (KuwaharaTensorSpec).
    */
  private[graft] def gradients(x: Array[Double]): Array[Double] = {
    val n = x.length
    val s3 = new Array[Double](n)
    var i = 0
    while (i < n) {
      val l = x(if (i > 0) i - 1 else 0)
      val r = x(if (i < n - 1) i + 1 else n - 1)
      s3(i) = l + x(i) + r
      i += 1
    }
    val g = new Array[Double](n)
    i = 0
    while (i < n) {
      val l = s3(if (i > 0) i - 1 else 0)
      val r = s3(if (i < n - 1) i + 1 else n - 1)
      g(i) = r - l
      i += 1
    }
    g
  }

  /** Windowed coherence anisotropy A = |Σg| / Σ|g| at position i — the 1-D
    * collapse of the reference's tensor anisotropy (λ1−λ2)/(λ1+λ2)
    * (tensorComputation, kuwaharaFilter.cpp:174-236). The correspondence is
    * the standard axial-data construction from directional statistics: a
    * 1-D gradient's orientation is its SIGN (angles {0, π}), which
    * angle-halving maps to the axial pair {0, π/2}; the orientation tensor
    * of those axes weighted by |g|, T = Σ |gᵢ| · e(sᵢ)e(sᵢ)ᵀ, has
    * (λ1−λ2)/(λ1+λ2) = |Σg|/Σ|g| IDENTICALLY (KuwaharaTensorSpec pins the
    * identity numerically, including rotation invariance of the embedding).
    */
  private[graft] def coherenceAt(g: Array[Double], i: Int, half: Int): Double = {
    val n = g.length
    var gs = 0.0; var ga = 0.0
    var j = math.max(0, i - half)
    val jhi = math.min(n - 1, i + half)
    while (j <= jhi) { gs += g(j); ga += math.abs(g(j)); j += 1 }
    if (ga <= 0.0) 0.0 else math.abs(gs) / ga
  }

  def filter(x: Array[Double], half: Int, masked: Boolean = true): Array[Double] = {
    val n = x.length
    val out = new Array[Double](n)
    if (n == 0) return out
    val g = gradients(x)
    var i = 0
    while (i < n) {
      // 1-D structure tensor → coherence anisotropy over the window
      val a = coherenceAt(g, i, half)
      val hEff = math.max(2, (half / (1.0 + a)).toInt)
      val hNear = math.max(1, hEff / 2)
      // sectors in reference scan order; strict < keeps the first min
      var bestVar = Double.MaxValue
      var bestMean = x(i)
      var s = 0
      while (s < 4) {
        val dir = if (s < 2) -1 else 1
        val len = if (s == 0 || s == 3) hEff else hNear
        var wsum = 0.0; var wx = 0.0; var wxx = 0.0
        var d = 0
        while (d <= len) {
          val k = i + dir * d
          if (k >= 0 && k < n && !(masked && x(k) == 0.0)) {
            val wgt = (len * len + 1 - d * d).toDouble
            wsum += wgt
            wx += wgt * x(k)
            wxx += wgt * x(k) * x(k)
          }
          d += 1
        }
        if (wsum > 0) {
          val m = wx / wsum
          val v = wxx / wsum - m * m
          if (v < bestVar) { bestVar = v; bestMean = m }
        }
        s += 1
      }
      out(i) = bestMean
      i += 1
    }
    out
  }
}
