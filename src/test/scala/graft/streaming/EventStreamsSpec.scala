package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.Tables

/** Streaming twins vs their batch counterparts: replay the events
  * table as a file stream (AvailableNow) and compare aggregates with
  * the same computation done in batch.
  */
class EventStreamsSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private lazy val streamDir: String = {
    // file-stream sources want a directory of files
    val tmp = java.nio.file.Files.createTempDirectory("evstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      tmp.resolve("events.parquet"))
    tmp.toString
  }

  test("tumbling window counts match the batch computation") {
    val streamed = EventStreams.runToMemory(
      spark, streamDir, "t_tumbling", EventStreams.tumblingCounts, "complete")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

    val batch = Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")), col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

    assert(streamed == batch)
  }

  test("hopping windows: streaming state converges to the batch event_hopping relation") {
    val streamed = EventStreams.runToMemory(
      spark, streamDir, "t_hopping", EventStreams.hoppingCounts, "complete")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val batch = graft.ext.Relational.eventHopping(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch)
    // every tumbling hour appears as 4 hopping window instances' worth
    // of coverage: hopping row count = 4x events' distinct (hour, type)
    // is NOT an invariant (edge windows), but each event contributes
    // to exactly 4 windows, so total n across windows = 4x event count
    val totalN = streamed.toSeq.map(_._3).sum
    val nEvents = Tables.events(spark, dir).count()
    assert(totalN == 4 * nEvents, s"$totalN != 4 * $nEvents")
  }

  test("stream-static join: enriched tumbling agg equals the batch join+group") {
    val streamed = EventStreams.runToMemory(
      spark, streamDir, "t_enrich", EventStreams.enrichedTumbling(spark, dir), "complete")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

    val dim = Tables.table(spark, dir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
    val batch = Tables.events(spark, dir)
      .join(dim, "user_id")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("segment"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(unix_timestamp(col("w.start")), col("segment"), col("n"), col("sum_value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

    assert(streamed == batch)
    // no event lost to the inner join: ids are drawn from the key space
    val nEvents = Tables.events(spark, dir).count()
    assert(streamed.toSeq.map(_._3).sum == nEvents)
  }

  test("parquet sink: distributed foreachBatch overwrite converges to the memory-sink result") {
    val out = java.nio.file.Files.createTempDirectory("evsink").toString
    val viaParquet = EventStreams.runToParquet(
      spark, streamDir, out, EventStreams.tumblingCounts, "complete")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val viaMemory = EventStreams.runToMemory(
      spark, streamDir, "t_tumbling_pq_ref", EventStreams.tumblingCounts, "complete")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(viaParquet == viaMemory)
    assert(viaParquet.nonEmpty)
  }

  test("parquet sink append mode: native file sink keeps every batch's rows") {
    val out = java.nio.file.Files.createTempDirectory("evsinkapp").toString
    val viaParquet = EventStreams.runToParquet(
      spark, streamDir, out, EventStreams.dedupWithinWatermark, "append")
    // unique event ids: every event must survive the appended run
    assert(viaParquet.count() == Tables.events(spark, dir).count())
    assert(viaParquet.select("event_id").distinct().count() == viaParquet.count())
  }

  test("session windows: per-user session event counts cover all events") {
    val sessions = EventStreams.runToMemory(
      spark, streamDir, "t_sessions", EventStreams.sessionWindows, "complete")
    val total = sessions.agg(sum(col("n_events"))).collect()(0).getLong(0)
    val nEvents = Tables.events(spark, dir).count()
    assert(total == nEvents)
    // session bounds are ordered and non-overlapping per user
    val rows = sessions.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    for ((_, ss) <- rows) {
      val sorted = ss.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, e1), (_, s2, _)) => assert(e1 <= s2)
        case _ =>
      }
    }
  }

  test("fixture guard: no inter-event gap sits near the 30-minute session boundary") {
    // stream_sessionize (session_window, half-open at µs precision)
    // and batch sessionize (strict > gap at ns precision) agree only
    // when no gap lands within the truncation window of exactly 30
    // minutes. This must hold for every corpus the gate runs on — a
    // regenerated fixture that violates it should fail HERE, loudly,
    // not as a silent oracle mismatch.
    import org.apache.spark.sql.expressions.Window
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val gapW = Window.partitionBy("user_id").orderBy("ts_ns")
      val offending = Tables.events(spark, sf)
        .withColumn("gap", col("ts_ns") - lag(col("ts_ns"), 1).over(gapW))
        .filter(abs(col("gap") - lit(1800L * 1000000000L)) < lit(1000000L)) // within 1 ms
        .count()
      assert(offending == 0, s"$sf has $offending near-boundary gaps")
    }
  }

  test("dropDuplicatesWithinWatermark keeps each event_id once") {
    val out = EventStreams.runToMemory(
      spark, streamDir, "t_dedup", EventStreams.dedupWithinWatermark, "append")
    assert(out.count() == out.select("event_id").distinct().count())
    assert(out.count() == Tables.events(spark, dir).count()) // ids unique in data
  }

  test("stream-stream interval join equals the batch interval join") {
    val streamed = EventStreams.streamJoin(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val batch = e.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("us").as("v_us"))
      .join(
        e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id").as("pu"),
            col("us").as("p_us")),
        col("pu") === col("user_id") && col("p_us") >= col("v_us") &&
          col("p_us") <= col("v_us") + 3600000000L)
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        (col("p_us") - col("v_us")).as("lag_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty, "testdata should contain view->purchase pairs")
  }

  test("flatMapGroupsWithState profiles converge to batch per-user totals") {
    val out = EventStreams.runToMemory(
      spark, streamDir, "t_profiles",
      EventStreams.userProfiles, "append")
    // last emitted row per user (highest n_events) == batch totals
    val streamed = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (u, rs) => u -> rs.maxBy(_._2) }
    val batch = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(streamed.keySet == batch.keySet)
    for ((u, (_, n, sv)) <- streamed) {
      assert(n == batch(u)._1, s"user $u count")
      assert(math.abs(sv - batch(u)._2) < 1e-6, s"user $u sum")
    }
  }

  test("stream_session_stats: timeout-emitted sessions converge to batch " +
    "gap-sessionization (VERDICT r13 #5)") {
    val streamed = EventStreams.streamSessionStats(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
    // the gate pins uniqueness too: one row per (user, session ordinal)
    assert(streamed.map(t => (t._1, t._2)).distinct.length == streamed.length)
    // batch twin: same µs gaps, same tie order, same cents rails
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts_ns div 1000").as("ts_us"),
        col("value").cast("decimal(18,2)").as("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_us", "event_id")
    val batch = ev
      .withColumn("new_sess",
        when(lag(col("ts_us"), 1).over(w).isNull ||
          col("ts_us") - lag(col("ts_us"), 1).over(w) > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        (sum(col("v")) * 100).cast("long").as("cents"),
        expr("min(ts_us) div 1000000").as("start_s"),
        expr("max(ts_us) div 1000000").as("end_s"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
    assert(streamed.toSet == batch.toSet)
    // the TIMEOUT path is load-bearing: every user's LAST session can
    // only emit via event-time timeout (no later event closes it) —
    // so per-user max ordinals must all be present, not just closed
    // sessions
    val lastByUser = batch.groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).max }
    val streamedSet = streamed.map(t => (t._1, t._2)).toSet
    for ((u, last) <- lastByUser)
      assert(streamedSet.contains((u, last)),
        s"user $u trailing session $last missing — timeout never fired")
    // sentinel hygiene: the flush row never reaches the output
    assert(streamed.forall(_._1 >= 0L))
  }
}
