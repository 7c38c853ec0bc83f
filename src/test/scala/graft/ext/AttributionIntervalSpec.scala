package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Semantics pins for interval coalescing and last-touch attribution
  * on constructed event streams.
  */
class AttributionIntervalSpec extends AnyFunSuite with SparkTestBase {

  /** Events fixture: (event_id, µs ts, user, type, value). */
  private def eventsOf(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ai-events").toString
    rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .selectExpr("event_id", "timestamp_micros(us) AS ts", "user_id",
        "event_type", "value", "'{}' AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val Min = 60000000L // one minute in µs

  test("intervalMerge: overlapping spans collapse, disjoint spans stay apart") {
    // user 1: [0, 10min), [5min, 15min) overlap -> one island
    //         [30min, 31min) stands alone
    val dir = eventsOf(Seq(
      (1L, 0L, 1L, "view", 10.0),
      (2L, 5L * Min, 1L, "view", 10.0),
      (3L, 30L * Min, 1L, "view", 1.0)))
    val out = TimeSeries.intervalMerge(spark, dir).collect()
    assert(out.length == 2)
    assert(out(0).getLong(2) == 0L && out(0).getLong(3) == 15L * Min)
    assert(out(0).getLong(4) == 15L * Min && out(0).getLong(5) == 2L)
    assert(out(1).getLong(2) == 30L * Min && out(1).getLong(5) == 1L)
  }

  test("intervalMerge: touching endpoints merge (closed-open adjacency)") {
    // [0, 5min) then start == previous end -> s > pmax is false -> merge
    val dir = eventsOf(Seq(
      (1L, 0L, 1L, "view", 5.0),
      (2L, 5L * Min, 1L, "view", 5.0)))
    val out = TimeSeries.intervalMerge(spark, dir).collect()
    assert(out.length == 1 && out.head.getLong(3) == 10L * Min)
  }

  test("eventAttribution: last preceding touch wins; stale touches fall to none") {
    val day = 24L * 3600L * 1000000L
    val dir = eventsOf(Seq(
      // user 1: view then click then purchase -> credited to click
      (1L, 1L * Min, 1L, "view", 0.0),
      (2L, 2L * Min, 1L, "click", 0.0),
      (3L, 3L * Min, 1L, "purchase", 10.0),
      // user 2: touch 8 days before purchase -> none
      (4L, 0L, 2L, "view", 0.0),
      (5L, 8L * day, 2L, "purchase", 5.0),
      // user 3: purchase with no history at all -> none
      (6L, 1L * Min, 3L, "purchase", 2.5)))
    val out = Relational.eventAttribution(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("click") == ((1L, 10.0)))
    assert(out("none") == ((2L, 7.5)))
    assert(!out.contains("view"), "older touch must not be credited")
  }

  test("eventRfm: monotone inputs score the full 1..5 ladder; segment concatenates") {
    // five users with frequencies 1..5, recencies 5..1 days ago and
    // monetary 1..5 -> every dimension's scores are the identity
    val day = 24L * 3600L * 1000000L
    val rows = (1 to 5).flatMap { u =>
      (0 until u).map { k =>
        ((u * 10 + k).toLong, u * day + k * Min, u.toLong, "view",
          u.toDouble)
      }
    }
    val dir = eventsOf(rows)
    val out = Relational.eventRfm(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7))).toMap
    for (u <- 1 to 5) {
      val (rs, fs, ms, seg) = out(u.toLong)
      assert(rs == u && fs == u && ms == u, s"user $u scored ($rs,$fs,$ms)")
      assert(seg == s"$u$u$u")
    }
  }

  test("eventAttribution: a purchase between touches credits only backwards") {
    val dir = eventsOf(Seq(
      (1L, 1L * Min, 1L, "click", 0.0),
      (2L, 2L * Min, 1L, "purchase", 1.0),
      (3L, 3L * Min, 1L, "view", 0.0))) // AFTER the purchase: irrelevant
    val out = Relational.eventAttribution(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("click" -> 1L))
  }
}
