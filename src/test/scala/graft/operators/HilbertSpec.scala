package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The Hilbert curve's defining contracts, pinned exhaustively over
  * the full 256x256 grid the layout eval uses: xy2d/d2xy are inverse
  * bijections, and every consecutive curve step is grid-adjacent
  * (manhattan distance exactly 1) — the locality property Morton
  * provably lacks (its quadrant-seam teleports measured here too).
  * Driver-side integer math only; no Spark session needed.
  */
class HilbertSpec extends AnyFunSuite {

  private val N = 256
  private val xy2d = Profile.hilbertXY2D(N) _
  private val d2xy = Profile.hilbertD2XY(N) _

  test("xy2d is a bijection onto [0, 65536) and d2xy inverts it") {
    val seen = new Array[Boolean](N * N)
    for (x <- 0 until N; y <- 0 until N) {
      val d = xy2d(x, y)
      assert(d >= 0 && d < N * N, s"($x,$y) -> $d out of range")
      assert(!seen(d), s"duplicate index $d at ($x,$y)")
      seen(d) = true
      assert(d2xy(d) == ((x, y)), s"roundtrip broke at ($x,$y) -> $d")
    }
  }

  test("every consecutive Hilbert step is grid-adjacent; Morton teleports") {
    var maxStep = 0
    var prev = d2xy(0)
    (1 until N * N).foreach { d =>
      val cur = d2xy(d)
      val step = math.abs(cur._1 - prev._1) + math.abs(cur._2 - prev._2)
      maxStep = math.max(maxStep, step)
      prev = cur
    }
    assert(maxStep == 1, s"hilbert max consecutive step = $maxStep")

    // Morton (z-order) over the same grid: invert z -> (x, y) by bit
    // deinterleave and measure the same consecutive-step distance
    def unZ(z: Int): (Int, Int) = {
      var (x, y) = (0, 0)
      (0 until 8).foreach { b =>
        x |= ((z >> (2 * b)) & 1) << b
        y |= ((z >> (2 * b + 1)) & 1) << b
      }
      (x, y)
    }
    var mortonMax = 0
    var mPrev = unZ(0)
    (1 until N * N).foreach { z =>
      val cur = unZ(z)
      val step = math.abs(cur._1 - mPrev._1) + math.abs(cur._2 - mPrev._2)
      mortonMax = math.max(mortonMax, step)
      mPrev = cur
    }
    assert(mortonMax > 100,
      s"morton's seam teleports should dwarf hilbert's unit steps, got $mortonMax")
  }
}
