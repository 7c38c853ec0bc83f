package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** KMV sketch unit behavior: exactness below K, estimation accuracy
  * above K, set semantics, bounded state, and merge associativity
  * (the property partial aggregation relies on).
  */
class KmvSketchSpec extends AnyFunSuite {

  private def sketchOf(values: Seq[Long]): Array[Long] =
    values.foldLeft(KmvSketch.zero)((b, v) =>
      KmvSketch.reduce(b, KmvSketch.hash(v.toString)))

  test("exact when distinct count is below K") {
    val s = sketchOf((1L to 100L) ++ (1L to 100L)) // duplicates collapse
    assert(KmvSketch.finish(s) == 100L)
    assert(s.length == 100)
  }

  test("estimates within 15% for 50k distinct values, state stays bounded") {
    val s = sketchOf(1L to 50000L)
    assert(s.length == KmvSketch.K) // bounded buffer
    val est = KmvSketch.finish(s).toDouble
    assert(math.abs(est - 50000.0) / 50000.0 < 0.15, s"estimate $est")
  }

  test("merge is order-insensitive and equals the single-pass sketch") {
    val all = (1L to 20000L).map(v => KmvSketch.hash(v.toString))
    val (l, r) = all.splitAt(7777)
    val left = l.foldLeft(KmvSketch.zero)(KmvSketch.reduce)
    val right = r.foldLeft(KmvSketch.zero)(KmvSketch.reduce)
    val ab = KmvSketch.merge(left.clone(), right)
    val ba = KmvSketch.merge(right.clone(), left)
    val single = all.foldLeft(KmvSketch.zero)(KmvSketch.reduce)
    assert(ab.toSeq == ba.toSeq)
    assert(ab.toSeq == single.toSeq)
  }

  test("estimate branch: independently computed kth-order-statistic estimate matches") {
    // the gate's sf0.01 corpus has <256 distinct users per type, so
    // the >=K estimate branch must be pinned here: full sort of all
    // hashes (no sketch code) -> same (K-1)*2^64 // kth arithmetic
    val n = 10000
    val hashes = (1 to n).map(v => KmvSketch.hash(v.toString))
    val sorted = hashes.sortWith((a, b) => java.lang.Long.compareUnsigned(a, b) < 0)
    val mask = (BigInt(1) << 64) - 1
    val expected = ((BigInt(KmvSketch.K - 1) << 64) / (BigInt(sorted(KmvSketch.K - 1)) & mask)).toLong
    val viaSketch = KmvSketch.finish(hashes.foldLeft(KmvSketch.zero)(KmvSketch.reduce))
    assert(viaSketch == expected)
    assert(math.abs(viaSketch.toDouble - n) / n < 0.15)
  }

  test("buffer stays sorted in unsigned order") {
    val s = sketchOf(1L to 5000L)
    s.sliding(2).foreach {
      case Array(a, b) => assert(java.lang.Long.compareUnsigned(a, b) < 0)
      case _ =>
    }
  }
}
