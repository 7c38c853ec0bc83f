package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Semantics pins for the time-series family (the oracle gate carries
  * the hash-equality check; these fix the behavior on crafted data
  * where the interesting cases — gaps, run boundaries, open tails —
  * are constructed, not sampled).
  */
class TimeSeriesSpec extends AnyFunSuite with SparkTestBase {

  /** Crafted orders table: one row per (day offset from 1995-01-01,
    * price).
    */
  private def ordersAt(rows: Seq[(Int, Double)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ts-orders").toString
    rows.zipWithIndex.map { case ((d, p), i) => (i.toLong, d, p) }
      .toDF("o_orderkey", "d", "p")
      .selectExpr(
        "o_orderkey", "o_orderkey AS o_custkey", "'O' AS o_orderstatus",
        "p AS o_totalprice",
        "CAST(date_add(DATE '1995-01-01', d) AS TIMESTAMP) AS o_orderdate",
        "'1-URGENT' AS o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  /** Crafted events table: (event_id, µs offset, user, type). */
  private def eventsAt(rows: Seq[(Long, Long, Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ts-events").toString
    rows.toDF("event_id", "us", "user_id", "event_type")
      .selectExpr("event_id", "timestamp_micros(us) AS ts", "user_id",
        "event_type", "CAST(1.0 AS DOUBLE) AS value", "'{}' AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("tsEwma: integer fold matches the hand recurrence; first day passes through") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ts-ewma").toString
    val rows = Seq(
      (1L, 0L, "a", 10.00), (2L, 1L, "a", 20.00), (3L, 1L, "a", 10.00),
      (4L, 2L, "a", 5.00), (5L, 4L, "a", 80.01),
      (6L, 0L, "b", 7.77))
    rows.toDF("event_id", "day", "event_type", "v")
      .selectExpr("event_id", "timestamp_micros(day * 86400000000) AS ts",
        "event_id AS user_id", "event_type", "CAST(v AS DOUBLE) AS value",
        "'{}' AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = TimeSeries.tsEwma(spark, dir).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    // daily cents: a -> 1000, 3000, 500, 8001 (day 3 unobserved); b -> 777
    // fold: 1000; (3000+1000)/2=2000; (500+2000)/2=1250; (8001+1250)/2=4625
    assert(out(("a", 0L)) == (1000L, 1000L))
    assert(out(("a", 1L)) == (3000L, 2000L))
    assert(out(("a", 2L)) == (500L, 1250L))
    assert(out(("a", 4L)) == (8001L, 4625L))
    assert(out(("b", 0L)) == (777L, 777L))
    assert(out.size == 5)
  }

  test("ewma_fold: null array elements from arbitrary SQL yield null, not an NPE") {
    // the fold's own inputs are built non-null, but the expression is
    // reachable from user SQL — totality is part of its contract
    val col = graft.functions.NativeFunctions.ewmaFold(
      org.apache.spark.sql.functions.expr(
        "CAST(array(named_struct('day_idx', CAST(NULL AS BIGINT), " +
          "'cents', 1L)) AS ARRAY<STRUCT<day_idx: BIGINT, cents: BIGINT>>)"))
    val row = spark.range(1).select(col.as("out")).collect().head
    assert(row.isNullAt(0), "null element must fold to a null result")
  }

  test("tsGapfill: gap days appear zero-filled, flagged, and LOCF-carried") {
    // days 0, 1, 4 have orders; 2-3 are gaps the calendar must invent
    val dir = ordersAt(Seq((0, 10.00), (1, 20.00), (1, 5.00), (4, 7.50)))
    val out = TimeSeries.tsGapfill(spark, dir).collect()
    assert(out.length == 5, "calendar must span min..max inclusive")
    val byDay = out.map(r => (r.getLong(0) - out.head.getLong(0)) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(byDay(0L) == ((1L, 1000L, 0L, 1000L)))
    assert(byDay(1L) == ((2L, 2500L, 0L, 2500L)))
    // the two gap days: zero orders, zero revenue, flagged, LOCF=day1
    assert(byDay(2L) == ((0L, 0L, 1L, 2500L)))
    assert(byDay(3L) == ((0L, 0L, 1L, 2500L)))
    assert(byDay(4L) == ((1L, 750L, 0L, 750L)))
  }

  test("tsGapfill: dense series has no gaps and LOCF equals the raw series") {
    val dir = ordersAt(Seq((0, 1.00), (1, 2.00), (2, 3.00)))
    val out = TimeSeries.tsGapfill(spark, dir).collect()
    assert(out.forall(_.getLong(3) == 0L))
    assert(out.forall(r => r.getLong(2) == r.getLong(4)))
  }

  test("tsInterp: gap days interpolate linearly in integer arithmetic") {
    // days 0 and 4 observed at 1000 and 5000 cents; days 1-3 must
    // interpolate to exactly 2000/3000/4000 (slope 1000/day)
    val dir = ordersAt(Seq((0, 10.00), (4, 50.00)))
    val out = TimeSeries.tsInterp(spark, dir).collect()
    assert(out.length == 5)
    assert(out.map(_.getLong(3)).toSeq ==
      Seq(1000L, 2000L, 3000L, 4000L, 5000L))
    assert(out.map(_.getLong(2)).toSeq == Seq(0L, 1L, 1L, 1L, 0L))
    // observed days pass through untouched
    assert(out.head.getLong(1) == 1000L && out.last.getLong(1) == 5000L)
  }

  test("tsInterp: downward gaps floor toward zero identically") {
    // 5000 -> 1000 over 3 days: exact slope -4000/3 -> floors
    // 5000, 3667 (5000-1334), 2334, 1000? No: pv + (nv-pv)*(d-pd)//span
    // = 5000 + (-4000)*1//3 = 5000-1333 = 3667; d=2: 5000-2666=2334
    val dir = ordersAt(Seq((0, 50.00), (3, 10.00)))
    val out = TimeSeries.tsInterp(spark, dir).collect()
    assert(out.map(_.getLong(3)).toSeq == Seq(5000L, 3667L, 2334L, 1000L))
  }

  test("scd2Build: runs collapse, intervals chain gaplessly, tail is open") {
    // user 7: A A B A  -> versions 1(A,2 events), 2(B), 3(A, current)
    val dir = eventsAt(Seq(
      (1L, 1000L, 7L, "A"), (2L, 2000L, 7L, "A"),
      (3L, 3000L, 7L, "B"), (4L, 4000L, 7L, "A")))
    val out = TimeSeries.scd2Build(spark, dir).collect()
    assert(out.length == 3)
    val v = out.map(r => (r.getLong(1), r.getString(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(v(0) == ((1L, "A", 1000L, 3000L, 0L, 2L)))
    assert(v(1) == ((2L, "B", 3000L, 4000L, 0L, 1L)))
    assert(v(2) == ((3L, "A", 4000L, Long.MaxValue, 1L, 1L)))
    // intervals tile: each valid_to equals the next valid_from
    assert(v.sliding(2).forall(w => w.length < 2 || w(0)._4 == w(1)._3))
  }

  test("scd2Lookup: purchases read the state AS OF their time, never later") {
    // user 1: browsing A (t=1000), purchase (t=1500) -> state A v1;
    //         browsing B (t=2000), purchase (t=2500) -> state B v2;
    // purchase BEFORE any state (t=500) -> unknown v0
    val dir = eventsAt(Seq(
      (1L, 500L, 1L, "purchase"),
      (2L, 1000L, 1L, "A"), (3L, 1500L, 1L, "purchase"),
      (4L, 2000L, 1L, "B"), (5L, 2500L, 1L, "purchase")))
    val out = TimeSeries.scd2Lookup(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(3), r.getLong(4))).toMap
    assert(out.size == 3, "exactly one row per purchase")
    assert(out(1L) == (("unknown", 0L)))
    assert(out(3L) == (("A", 1L)))
    assert(out(5L) == (("B", 2L)))
  }

  test("eventHopping: every event lands in exactly size/slide overlapping windows") {
    val dir = eventsAt(Seq((1L, 3600000000L, 1L, "view"))) // t = exactly 1h
    val out = Relational.eventHopping(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    // 1h window / 15min hop: starts s with s ≤ t < s+1h on the 15-min
    // grid -> {0:15, 0:30, 0:45, 1:00}, one event each
    assert(out.toSeq == Seq(900000000L, 1800000000L, 2700000000L, 3600000000L)
      .map(s => (s, 1L)), s"unexpected windows: ${out.toSeq}")
  }

  test("aggMode: most frequent value wins, count ties break lexicographically") {
    // user 1: view x2 beats click x1; user 2: click/view tie -> click
    val dir = eventsAt(Seq(
      (1L, 1000L, 1L, "view"), (2L, 2000L, 1L, "view"), (3L, 3000L, 1L, "click"),
      (4L, 1000L, 2L, "view"), (5L, 2000L, 2L, "click")))
    val out = Relational.aggMode(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (("view", 2L, 2L)))
    assert(out(2L) == (("click", 1L, 2L)))
  }

  test("aggDecay: one halving per elapsed half-life, exact integer floors") {
    val day = 86400000000L // µs
    // user 1: events at day 20 (k=0), day 13 (k=1), day 5 (k=2):
    // 100 + 50 + 25 decayed cents; user 2 anchors only itself
    val dir = eventsAt(Seq(
      (1L, 20 * day, 1L, "view"), (2L, 13 * day, 1L, "view"),
      (3L, 5 * day, 1L, "view"), (4L, 20 * day, 2L, "click")))
    val out = TimeSeries.aggDecay(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((3L, 300L, 175L)))
    assert(out(2L) == ((1L, 100L, 100L)))
  }

  test("cdcApply: last-writer-wins with tombstones; same-µs ties break on event_id") {
    // user 1: upsert then tombstone -> absent from the snapshot;
    // user 2: tombstone then upsert -> present (delete must not win
    //         the race against a LATER upsert);
    // user 3: two ops at the SAME µs -> the higher event_id wins
    val dir = eventsAt(Seq(
      (1L, 1000L, 1L, "view"), (2L, 2000L, 1L, "error"),
      (3L, 1000L, 2L, "error"), (4L, 2000L, 2L, "signup"),
      (5L, 3000L, 3L, "click"), (6L, 3000L, 3L, "view")))
    val out = TimeSeries.cdcApply(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(3), r.getLong(4))).toMap
    assert(!out.contains(1L), "tombstone-last user must be absent")
    assert(out(2L) == (("signup", 2000L, 2L)))
    assert(out(3L) == (("view", 3000L, 2L)))
  }

  test("scd2Build: same-timestamp ties break on event_id; users independent") {
    // user 1 has two events at the SAME µs: event_id order decides the
    // run sequence (A then B -> two versions, not a collapsed run)
    val dir = eventsAt(Seq(
      (10L, 5000L, 1L, "A"), (11L, 5000L, 1L, "B"),
      (12L, 1000L, 2L, "X")))
    val out = TimeSeries.scd2Build(spark, dir).collect()
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getString(2)).toSeq == Seq("A", "B"))
    val u2 = out.filter(_.getLong(0) == 2L)
    assert(u2.length == 1 && u2.head.getLong(5) == 1L)
  }
}
