package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Round-13 fixes and operators. The oracle gate carries the
  * hash-equality check; these pin semantics on crafted corpora and
  * independent local replays.
  */
class Round13OpsSpec extends AnyFunSuite with SparkTestBase {

  test("joinAnti: non-vacuous at every SF and matches a set-difference replay") {
    // VERDICT r12 #1: the unfiltered anti-join was vacuously empty at
    // sf0.01. The reformulated query (customers with no URGENT order)
    // must return rows at the smallest SF, so the oracle gate verifies
    // real values — and must equal the obvious set-difference replay.
    val dir = "/root/testdata/sf0.001"
    val got = Relational.joinAnti(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.nonEmpty, "anti relation is empty — the vacuity bug is back")

    val custs = spark.read.parquet(s"$dir/customer.parquet")
      .select("c_custkey", "c_name", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val urgent = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val expect = custs.filterNot(c => urgent(c._1)).sortBy(_._1)
    assert(got.toSeq == expect.toSeq)
    // sanity: the filter actually excludes someone (anti != all customers)
    assert(got.length < custs.length)
  }

  /** Events fixture at NANOSECOND precision: `ts` ships as a raw Long
    * nanos column, the shape Tables.events normalizes via its
    * LongType branch — the only way to plant 1ns-adjacent intervals.
    */
  private def eventsNsDir(rows: Seq[(Long, Long, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r13-eventsns").toString
    rows.toDF("event_id", "ts", "user_id")
      .selectExpr("event_id", "ts", "user_id",
        "'x' AS event_type", "CAST(1.0 AS DOUBLE) AS value", "'{}' AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("intervalSweep: 1ns-adjacent spans do NOT count as concurrent " +
    "(half-open sweep, ends before starts at equal t)") {
    // ADVICE r12: ends are exclusive (e = max+1), so an interval
    // starting at exactly another's e shares ZERO nanoseconds with it.
    // User 1 spans [1000, 2001); user 2 is a point at 2001 = e_1 —
    // adjacent, not overlapping. The old start-first tie order counted
    // the pair (peak 2, 1 overlap); the half-open order must not.
    val dir = eventsNsDir(Seq(
      (1L, 1000L, 1L), (2L, 2000L, 1L), (3L, 2001L, 2L)))
    val r = TimeSeries.intervalSweep(spark, dir).collect()
    assert(r.length == 1)
    assert((r.head.getLong(1), r.head.getLong(2), r.head.getLong(3)) ==
      ((2L, 1L, 0L)),
      s"adjacent spans must not overlap: ${r.head}")
    // a genuinely overlapping pair one ns earlier still counts
    val dir2 = eventsNsDir(Seq(
      (1L, 1000L, 1L), (2L, 2000L, 1L), (3L, 2000L, 2L)))
    val r2 = TimeSeries.intervalSweep(spark, dir2).collect()
    assert((r2.head.getLong(1), r2.head.getLong(2), r2.head.getLong(3)) ==
      ((2L, 2L, 1L)), s"overlap at the last ns must count: ${r2.head}")
  }
}
