package graft

import graft.classify.Kuwahara
import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r4 item 6: pin the documented 1-D collapse of the reference's
  * structure-tensor anisotropy (kuwaharaFilter.cpp:174-236) numerically.
  *
  * The correspondence (Kuwahara.coherenceAt doc): a 1-D gradient's only
  * orientation information is its sign — axial angles {0, π}. The standard
  * directional-statistics treatment of axial data halves angles onto
  * {0, π/2}; the orientation tensor of those embedded axes weighted by the
  * gradient magnitude,
  *
  *   T = Σᵢ |gᵢ| · R(θ) e(sign gᵢ) e(sign gᵢ)ᵀ R(θ)ᵀ,
  *
  * (R an arbitrary rotation — the embedding has no preferred frame) has
  * eigenvalues λ1 = Σ_{g>0}|g|, λ2 = Σ_{g<0}|g| up to rotation, so
  *
  *   (λ1−λ2)/(λ1+λ2) = |Σ g| / Σ |g| = A  identically.
  */
class KuwaharaTensorSpec extends AnyFunSuite {

  /** (λ1−λ2)/(λ1+λ2) of the axial embedding of gradient window g(lo..hi),
    * rotated by theta, via the closed-form symmetric 2×2 eigenvalues.
    */
  private def tensorCoherence(g: Array[Double], lo: Int, hi: Int, theta: Double): Double = {
    val c = math.cos(theta); val s = math.sin(theta)
    // axis for positive sign: (c, s); for negative: (-s, c) (orthogonal)
    var a11 = 0.0; var a12 = 0.0; var a22 = 0.0
    var j = lo
    while (j <= hi) {
      val w = math.abs(g(j))
      if (w > 0) {
        val (ex, ey) = if (g(j) > 0) (c, s) else (-s, c)
        a11 += w * ex * ex
        a12 += w * ex * ey
        a22 += w * ey * ey
      }
      j += 1
    }
    val tr = a11 + a22
    if (tr <= 0.0) return 0.0
    val d = math.sqrt((a11 - a22) * (a11 - a22) + 4 * a12 * a12)
    d / tr // (λ1−λ2)/(λ1+λ2) with λ1,2 = (tr ± d)/2
  }

  private def checkSignal(x: Array[Double], half: Int, rnd: scala.util.Random): Unit = {
    val g = Kuwahara.gradients(x)
    var i = 0
    while (i < x.length) {
      val a = Kuwahara.coherenceAt(g, i, half)
      val lo = math.max(0, i - half)
      val hi = math.min(x.length - 1, i + half)
      val theta = rnd.nextDouble() * math.Pi
      val t = tensorCoherence(g, lo, hi, theta)
      assert(math.abs(a - t) < 1e-12,
        s"i=$i A=$a tensor=$t theta=$theta signal=${x.take(12).mkString(",")}")
      i += 1
    }
  }

  test("A = |Σg|/Σ|g| equals the axial tensor's (λ1−λ2)/(λ1+λ2) on random signals") {
    val rnd = new scala.util.Random(42)
    (0 until 60).foreach { t =>
      val n = 8 + rnd.nextInt(40)
      val x = Array.fill(n)(rnd.nextDouble() * 200 - 100)
      checkSignal(x, half = 1 + rnd.nextInt(6), rnd)
      val _ = t
    }
  }

  test("monotone (coherent-edge) neighborhoods have A = 1, alternating texture A ≈ 0") {
    val rnd = new scala.util.Random(7)
    (0 until 20).foreach { _ =>
      val n = 24
      // strictly increasing → every smoothed gradient positive → A = 1
      var acc = 0.0
      val mono = Array.fill(n) { acc += 1.0 + rnd.nextDouble() * 5; acc }
      val gm = Kuwahara.gradients(mono)
      (0 until n).foreach { i =>
        assert(Kuwahara.coherenceAt(gm, i, 4) == 1.0, s"monotone i=$i")
      }
      // equal-amplitude alternation → interior window sums cancel
      val alt = Array.tabulate(n)(i => if (i % 2 == 0) 10.0 else -10.0)
      val ga = Kuwahara.gradients(alt)
      (6 until n - 6).foreach { i =>
        assert(Kuwahara.coherenceAt(ga, i, 4) < 0.2, s"alternating i=$i")
      }
    }
  }

  test("rotation invariance of the embedding (same window, many frames)") {
    val rnd = new scala.util.Random(99)
    val x = Array.fill(32)(rnd.nextDouble() * 50 - 25)
    val g = Kuwahara.gradients(x)
    val i = 16; val half = 5
    val ref = tensorCoherence(g, i - half, i + half, 0.0)
    (0 until 32).foreach { k =>
      val t = tensorCoherence(g, i - half, i + half, k * math.Pi / 16)
      assert(math.abs(t - ref) < 1e-12)
    }
    assert(math.abs(ref - Kuwahara.coherenceAt(g, i, half)) < 1e-12)
  }
}
