package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-9 keyed-alphabet-permutation transform that lifted
  * the ScaleUp factor cap from 10 (Caesar: letter images repeat mod
  * 26, digits mod 10) to 100. Two consumers must agree bit-for-bit:
  * this generator and the Python replica oracles
  * (scripts/scaleup_perm.py) — the literal rows below were produced
  * by the Python twin, so a pass here IS the cross-language
  * determinism proof.
  */
class ScaleUpSpec extends AnyFunSuite {

  test("permutation tables match the Python twin's literals") {
    val letters = ScaleUp.permTable(26, 100, 0x5CA1E7L, ScaleUp.MaxLetterAgree)
    val digits = ScaleUp.permTable(10, 100, 0xD1617L, ScaleUp.MaxDigitAgree)
    assert(letters(0).toSeq == (0 until 26))
    assert(digits(0).toSeq == (0 until 10))
    assert(letters(1).toSeq == Seq(17, 21, 2, 23, 1, 24, 5, 20, 22, 16, 4, 8,
      7, 3, 12, 18, 25, 13, 0, 14, 10, 19, 9, 11, 6, 15))
    assert(digits(1).toSeq == Seq(7, 2, 5, 0, 9, 8, 3, 4, 6, 1))
    assert(letters(99).toSeq == Seq(12, 19, 14, 17, 18, 3, 20, 9, 25, 8, 24,
      4, 7, 15, 5, 11, 6, 16, 1, 13, 21, 2, 0, 23, 10, 22))
    assert(digits(99).toSeq == Seq(4, 8, 0, 7, 5, 2, 6, 3, 1, 9))
  }

  test("every replica pair agrees on <= 6 letters and <= 3 digits") {
    val letters = ScaleUp.permTable(26, 100, 0x5CA1E7L, ScaleUp.MaxLetterAgree)
    val digits = ScaleUp.permTable(10, 100, 0xD1617L, ScaleUp.MaxDigitAgree)
    def worst(t: Array[Array[Int]]): Int =
      (for (i <- t.indices; j <- i + 1 until t.length)
        yield t(i).zip(t(j)).count { case (a, b) => a == b }).max
    // The bound is what makes cross-replica shingle self-collision
    // vanish (a shingle survives sigma = pi_k'^-1 . pi_k identically
    // only if ALL its letters sit in the <= 6 agreeing set); the
    // Python twin measured the worst pair AT the bound, so these are
    // tight, not slack.
    assert(worst(letters) == ScaleUp.MaxLetterAgree)
    assert(worst(digits) == ScaleUp.MaxDigitAgree)
  }

  test("permuteText is a structure-preserving bijection") {
    val s = "Hello World 42 -- chunk/boundary.chars stay;\nfixed\t!"
    assert(ScaleUp.permuteText(s, 0) eq s)
    assert(ScaleUp.permuteText("Hello World 42", 1) == "Ubiim Jmnix 95")
    for (k <- Seq(1, 7, 50, 99)) {
      val t = ScaleUp.permuteText(s, k)
      assert(t.length == s.length)
      // separators / punctuation / whitespace are fixed points, so
      // the recursive splitter's boundaries are replica-invariant
      for (i <- s.indices if !s(i).isLetterOrDigit)
        assert(t(i) == s(i), s"non-alnum moved at $i under k=$k")
      // bijection: same image iff same char (per character class)
      for (i <- s.indices; j <- s.indices)
        assert((s(i) == s(j)) == (t(i) == t(j)),
          s"collision/split at ($i,$j) under k=$k")
      assert(t != s, s"k=$k left the text unchanged")
    }
    // distinct replicas give distinct images (the factor-100 property)
    val images = (0 until 100).map(k => ScaleUp.permuteText(s, k))
    assert(images.distinct.size == 100)
  }

  test("factor-1000 table rows: prefix-stable past 100, pinned to the " +
    "Python twin, schedule bounds hold") {
    // Round 13 (VERDICT r12 #6): the audit cap lifts to 1000 via a
    // row-indexed agreement schedule. Rows < 100 must be bit-identical
    // to the shipped r9 table (factor-<=100 corpora unchanged); high
    // rows are pinned to literals produced by scripts/scaleup_perm.py.
    val letters = ScaleUp.permTable(26, 1000, 0x5CA1E7L, ScaleUp.letterAgreeFor _)
    val digits = ScaleUp.permTable(10, 1000, 0xD1617L, ScaleUp.digitAgreeFor _)
    val l100 = ScaleUp.permTable(26, 100, 0x5CA1E7L, ScaleUp.MaxLetterAgree)
    val d100 = ScaleUp.permTable(10, 100, 0xD1617L, ScaleUp.MaxDigitAgree)
    for (k <- 0 until 100) {
      assert(letters(k).sameElements(l100(k)), s"letter row $k drifted")
      assert(digits(k).sameElements(d100(k)), s"digit row $k drifted")
    }
    assert(letters(100).toSeq == Seq(17, 16, 5, 20, 14, 23, 18, 2, 7, 1, 22,
      24, 15, 4, 21, 11, 8, 9, 12, 25, 10, 6, 13, 0, 3, 19))
    assert(digits(100).toSeq == Seq(5, 6, 4, 8, 2, 9, 7, 1, 3, 0))
    assert(letters(999).toSeq == Seq(15, 19, 8, 9, 10, 25, 0, 22, 20, 17, 23,
      1, 3, 6, 24, 21, 4, 13, 14, 7, 12, 5, 2, 18, 16, 11))
    assert(digits(999).toSeq == Seq(2, 9, 4, 1, 3, 7, 5, 0, 8, 6))
    assert(ScaleUp.permuteText("Hello World 42", 500) == "Pjnnd Qdfnz 25")
    assert(ScaleUp.permuteText("Hello World 42", 999) == "Wkbby Cynbj 34")
    // schedule bounds over a deterministic pair sample (the full
    // 1000x999/2 check costs ~2.6e8 compares — the twin ran it once;
    // here a fixed stride sample guards regressions cheaply)
    def worstSampled(t: Array[Array[Int]]): Int =
      (for (i <- t.indices by 7; j <- i + 1 until t.length by 13)
        yield t(i).zip(t(j)).count { case (a, b) => a == b }).max
    assert(worstSampled(letters) <= ScaleUp.MaxLetterAgree)
    assert(worstSampled(digits) <= ScaleUp.MaxDigitAgreeHigh)
  }

  test("mix64 matches splitmix64 reference vectors") {
    // seed 0 -> 0xe220a8397b1dcdaf is the published splitmix64 first
    // output; pins the PRNG against both twins drifting together
    assert(ScaleUp.mix64(0L) == 0xe220a8397b1dcdafL)
    assert(ScaleUp.mix64(1234567L) == 0x599ed017fb08fc85L)
  }
}
