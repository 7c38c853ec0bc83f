package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Round-15 operators: crafted pins + independent local replays. */
class Round15OpsSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  // the KMV replay runs at sf0.01: the estimator (seen >= K) branch
  // needs a corpus whose daily actives exceed K = 64 (non-vacuity)
  private val dirMid = "/root/testdata/sf0.01"

  test("eventStickinessKmv: estimator branch engages; independent KmvSketch replay") {
    val K = Relational.StickinessKmvK
    val du = graft.sources.Tables.events(spark, dirMid)
      .select(expr("ts_ns div 86400000000000").as("d"), col("user_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDay = du.groupBy(_._1).map { case (d, rs) => d -> rs.map(_._2).toSet }
    def est(users: Set[Long]): Long = {
      // independent replay: same hash, unsigned order via sign-flip,
      // same (K-1)*2^64 / kth floor
      val hs = users.map(u => graft.functions.KmvSketch.hash(u.toString))
        .toArray.map(_ ^ Long.MinValue).sorted
      if (hs.length < K) hs.length.toLong
      else {
        val kthU = BigInt(hs(K - 1)) + (BigInt(1) << 63)
        ((BigInt(K - 1) << 64) / kthU).toLong
      }
    }
    val expect = byDay.keySet.map { d =>
      val week = (d - 6L to d).flatMap(x =>
        byDay.getOrElse(x, Set.empty[Long])).toSet
      val dauE = est(byDay(d)); val wauE = est(week)
      (d, dauE, wauE, dauE * 1000000L / wauE)
    }
    val got = Relational.eventStickinessKmv(spark, dirMid).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
    // non-vacuity pin: the k-th-min estimator must actually fire in
    // the gate corpus (the dedup_embedding_ann_hi lesson)
    assert(byDay.values.exists(_.size >= K),
      s"gate corpus never exceeds K=$K — the estimator branch is vacuous")
    // and it estimates: within 4x the KMV error law of the exact count
    for ((d, dauE, _, _) <- got; exact = byDay(d).size; if exact >= K)
      assert(math.abs(dauE - exact).toDouble / exact <= 4.0 / math.sqrt(K - 2.0),
        s"day $d: estimate $dauE too far from exact $exact")
  }

  test("eventStickinessKmv: per-day k-smallest runs through TopKPerKey, not a sort") {
    val plan = Relational.eventStickinessKmv(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
