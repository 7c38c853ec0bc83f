package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The planted-parity tool's statistics, pinned: the recall gate is a
  * one-sided binomial tail test against the banding envelope's
  * per-pair miss bound, not a hard recall floor (a floor at
  * 1 − missBound sits AT the expected miss count and rejects a
  * correct implementation with ~40% probability — the round-10
  * motivating run: 6 misses observed, 5.0 expected at n = 500).
  */
class AnnHiPlantedSpec extends AnyFunSuite {

  test("binomUpperTail matches closed forms and known values") {
    // P[X >= 1] = 1 - (1-p)^n
    val n = 100L; val p = 0.02
    val exact = 1.0 - math.pow(1 - p, n.toDouble)
    assert(math.abs(AnnHiPlanted.binomUpperTail(n, 1, p) - exact) < 1e-12)
    // P[X >= n] = p^n
    assert(math.abs(AnnHiPlanted.binomUpperTail(5, 5, 0.3)
      - math.pow(0.3, 5)) < 1e-15)
    // degenerate bounds
    assert(AnnHiPlanted.binomUpperTail(50, 0, 0.1) == 1.0)
    assert(AnnHiPlanted.binomUpperTail(50, 51, 0.1) == 0.0)
    // Binomial(10, 0.5): P[X >= 6] = 193/512
    assert(math.abs(AnnHiPlanted.binomUpperTail(10, 6, 0.5)
      - 193.0 / 512.0) < 1e-12)
  }

  test("the motivating run passes; a gross miss rate fails") {
    // 6 misses of 500 at the 1e-2 envelope: tail ~0.384 — healthy
    val tail6 = AnnHiPlanted.binomUpperTail(500, 6, AnnHiPlanted.MissBound)
    assert(tail6 > AnnHiPlanted.Alpha, s"tail=$tail6")
    assert(tail6 > 0.3 && tail6 < 0.5)
    // 15 misses of 500 (3x the bound): tail < 1e-3 — the gate fires
    val tail15 = AnnHiPlanted.binomUpperTail(500, 15, AnnHiPlanted.MissBound)
    assert(tail15 < AnnHiPlanted.Alpha, s"tail=$tail15")
    // large-n behavior stays finite and monotone
    val a = AnnHiPlanted.binomUpperTail(100000, 1000, AnnHiPlanted.MissBound)
    val b = AnnHiPlanted.binomUpperTail(100000, 1100, AnnHiPlanted.MissBound)
    assert(a > b && b >= 0.0 && a <= 1.0)
  }
}
