package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench artifact's hot-coverage schema (round 11, VERDICT
  * r10 ask #2): `hot_total` must be JSON `null` — not a partial sum —
  * whenever any completed query has zero hot reps, and
  * `n_hot_covered` is always emitted so a reader can see the coverage
  * either way. The r10 degraded-box artifact published hot_total 42.8
  * over the 95 cheapest queries (87 expensive ones at 0 reps), which
  * read as a 2× improvement over r9's full-coverage 79.7; this schema
  * makes that misread impossible.
  */
class BenchArtifactSpec extends AnyFunSuite {

  test("full hot coverage publishes the numeric total") {
    val j = Bench.hotCoverageJson(nCompleted = 182, nHotCovered = 182,
      hotTotal = 79.671)
    assert(j == """"hot_total":79.671,"n_hot_covered":182""")
  }

  test("partial hot coverage nulls hot_total and keeps the count") {
    val j = Bench.hotCoverageJson(nCompleted = 182, nHotCovered = 95,
      hotTotal = 42.84)
    assert(j == """"hot_total":null,"n_hot_covered":95""")
  }

  test("zero completed queries is full (vacuous) coverage, total 0") {
    val j = Bench.hotCoverageJson(nCompleted = 0, nHotCovered = 0,
      hotTotal = 0.0)
    assert(j == """"hot_total":0.000,"n_hot_covered":0""")
  }
}
