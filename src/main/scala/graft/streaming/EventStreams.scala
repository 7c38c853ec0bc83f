package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Structured Streaming surface (SURVEY.md §2.10 — absent in the
  * batch-only reference; extension per the north star): the same
  * event-time operators as the batch queries, expressed over an
  * unbounded source. Micro-batch file source -> watermarked windowed
  * aggregations -> any sink; at cluster scale the file source swaps
  * for Kafka without touching the transforms.
  *
  * Each transform here is the streaming twin of a batch query in
  * [[graft.ext.Relational]] (`event_tumbling`, `sessionize`,
  * dedup-by-id), so correctness is asserted by replaying the events
  * table as a stream and comparing with the batch result
  * (`EventStreamsSpec`).
  */
object EventStreams {

  /** Events-shaped streaming source over a parquet directory, with
    * the same ns->timestamp normalization as the batch loader.
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    // schema must be known up front for streaming reads; reuse the
    // batch loader's raw schema (ts read as nanos Long).
    scala.util.Try(spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true"))
    val schema = spark.read.parquet(dir).schema
    val raw = spark.readStream.schema(schema).parquet(dir)
    // same three-flavor normalization as Tables.events: nanos-as-Long,
    // TIMESTAMP_NTZ micros (current generation; wall time = UTC under
    // the pinned session timezone), or instant micros
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw
          .withColumn("ts_ns",
            unix_micros(col("ts").cast("timestamp")) * 1000L)
          .withColumn("ts", col("ts").cast("timestamp"))
      case _ =>
        raw.withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
    }
  }

  /** Tumbling 1-hour counts + value sums per event type with a
    * 10-minute watermark for late data — streaming twin of
    * `event_tumbling` (same output shape, so the two share an oracle).
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(
        unix_timestamp(col("w.start")).as("hour_s"),
        col("event_type"), col("n"), col("sum_value"))

  /** SLIDING (hopping) windows with state — streaming twin of the
    * batch `event_hopping` and its oracle: 1-hour windows every 15
    * minutes, each event updating 4 window states; complete-mode
    * convergence makes the result the batch relation exactly
    * (integer-µs starts, DECIMAL cents — the batch twin's rails).
    */
  def hoppingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(
        window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        (sum(col("value").cast("decimal(18,2)")) * 100).cast("long").as("cents"))
      .select(
        unix_micros(col("w.start")).as("win_start_us"),
        col("event_type"), col("n"), col("cents"))

  def streamHopping(spark: SparkSession, dir: String): DataFrame =
    runToMemory(spark, stagedEventsDir(dir), "graft_stream_hopping",
        hoppingCounts, "complete")
      .orderBy("win_start_us", "event_type")

  /** Driver-gate streaming query (`stream_tumbling`): the events
    * table replayed as a micro-batch file-directory stream ->
    * [[tumblingCounts]] -> memory sink, run to completion
    * (AvailableNow) and returned as the materialized result. Complete
    * output mode means the watermark drops nothing once the replay
    * finishes, so the converged result equals the batch
    * `event_tumbling` — whose DuckDB oracle it shares in the driver's
    * correctness gate (VERDICT r1 task 6).
    */
  // staged stream-source dirs, one per source dir per JVM (repeated
  // bench/verify invocations must not accumulate copies in /tmp)
  private val stagedDirs = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Stage `dir`'s events file into a directory usable as a
    * file-stream source (the source wants a directory of files).
    * Reused across invocations; cleaned up on JVM exit.
    *
    * Exactly ONE file is staged, and [[streamDedup]]'s oracle
    * equality depends on it: a single file is a single micro-batch
    * (AvailableNow's per-trigger file cap is far above 1), so the
    * watermark only advances AFTER all rows are processed and
    * `dropDuplicatesWithinWatermark` can never discard a late
    * arrival. A multi-file replay of out-of-order data would drop
    * rows older than the advancing watermark — correct streaming
    * semantics, but no longer the batch projection. The staging
    * helper is private precisely so no caller can feed a multi-file
    * directory into the gate queries.
    */
  /** Recursive staging-dir cleanup at JVM exit (ADVICE r14):
    * `File.deleteOnExit` cannot remove a non-empty directory, so the
    * flush staging dir (two parquet files) leaked one dir per corpus
    * per JVM. One shutdown hook, quiet recursive delete.
    */
  private def deleteRecursivelyOnExit(tmp: java.nio.file.Path): Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile): Unit))

  private def stagedEventsDir(dir: String): String =
    stagedDirs.getOrElseUpdate(dir, {
      val tmp = java.nio.file.Files.createTempDirectory("graft_stream_events")
      val file = tmp.resolve("events.parquet")
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"), file)
      deleteRecursivelyOnExit(tmp)
      tmp.toString
    })

  def streamTumbling(spark: SparkSession, dir: String): DataFrame =
    runToMemory(spark, stagedEventsDir(dir), "graft_stream_tumbling",
        tumblingCounts, "complete")
      .orderBy("hour_s", "event_type")

  /** Driver-gate streaming query (`stream_topk`, round 15): per-hour
    * top-3 users by event count — the "trending entities per window"
    * leaderboard every streaming analytics stack serves. The STREAM
    * maintains (hour-window, user) counts (watermarked tumbling
    * state, complete-mode convergence makes it the batch relation
    * exactly); the top-3 rank is a BATCH window over the converged
    * COMPACT state (hours × active users, never raw events) — the
    * stream-the-state / batch-finish convention the memory-sink
    * protocol prescribes (no self-join of the sink view). Ties pin
    * on user_id. At cluster scale the rank step reads a
    * state-store-sized relation; a true low-latency leaderboard
    * would move the top-k into per-window keyed state
    * ([[graft.plans.TopKPerKey]]'s heap shape inside
    * flatMapGroupsWithState) — the converged result is identical,
    * which is what the gate proves.
    */
  def streamTopk(spark: SparkSession, dir: String): DataFrame = {
    val counts = runToMemory(spark, stagedEventsDir(dir),
      "graft_stream_topk",
      ev => ev.withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(unix_timestamp(col("w.start")).as("hour_s"),
          col("user_id"), col("n")),
      "complete")
    val byHour = org.apache.spark.sql.expressions.Window
      .partitionBy("hour_s").orderBy(col("n").desc, col("user_id").asc)
    counts
      .withColumn("rk", row_number().over(byHour).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("hour_s"), col("rk"), col("user_id"), col("n"))
      .orderBy("hour_s", "rk")
  }

  /** Batch twin oracle for [[streamTopk]]. */
  val streamTopkSql: String =
    """WITH c AS (
      |  SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT)
      |    AS hour_s, user_id, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT hour_s, user_id, n,
      |    row_number() OVER (PARTITION BY hour_s
      |                       ORDER BY n DESC, user_id ASC) AS rk
      |  FROM c)
      |SELECT hour_s, CAST(rk AS BIGINT) AS rk, user_id, n
      |FROM r WHERE rk <= 3 ORDER BY hour_s, rk""".stripMargin

  /** Driver-gate streaming query (`stream_sessionize`): session
    * windows over the replayed events, converged (complete mode) and
    * reshaped to the batch `sessionize` contract, whose oracle it
    * shares: `session_window.end` is last-event-time + gap, so
    * subtracting the 30-minute gap recovers the batch max(ts) end;
    * session ordinals are ranks over session starts per user
    * (sessions are ≥ gap apart, so starts cannot collide). Verified
    * edge-free on this data: no inter-event gap within 10 µs of the
    * 30-minute boundary, so µs truncation cannot flip a session
    * split.
    */
  def streamSessionize(spark: SparkSession, dir: String): DataFrame = {
    val raw = runToMemory(spark, stagedEventsDir(dir), "graft_stream_sessionize",
      sessionWindows, "complete")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("start_s")
    raw
      .withColumn("session_id", row_number().over(w).cast("long"))
      .select(
        col("user_id"), col("session_id"), col("n_events"),
        col("start_s"), (col("end_s") - 1800L).as("end_s"))
      .withColumn("duration_s", col("end_s") - col("start_s"))
      .orderBy("user_id", "session_id")
  }

  /** 30-minute-gap session windows per user (`session_window` keeps
    * per-key state and emits on watermark close) — streaming twin of
    * `sessionize`.
    */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_timestamp(col("w.start")).as("start_s"),
        unix_timestamp(col("w.end")).as("end_s"),
        col("n_events"))

  /** Exactly-once-by-key within the watermark horizon: state-bounded
    * streaming dedup on event_id.
    */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("user_id"), col("event_type"))

  /** Driver-gate streaming query (`stream_dedup`): the replayed
    * events through [[dedupWithinWatermark]]. Event ids are unique in
    * the data, so no row is a duplicate; and because the staged
    * replay is a SINGLE file — i.e. a single micro-batch, see
    * [[stagedEventsDir]] — the watermark cannot advance mid-replay
    * and drop out-of-order rows. Under those two preconditions the
    * appended result deterministically equals the batch projection
    * and shares its oracle (unlike the stateful profile emitter,
    * whose per-batch emissions depend on batching and stay
    * spec-verified only).
    */
  /** Daily counts per event type — the streaming STATE behind
    * [[streamAnomaly]]: one watermarked tumbling-day aggregation
    * (window('1 day') aligns to epoch days, which equals the batch
    * `date_trunc('day')` under the pinned UTC session).
    */
  def dailyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_timestamp(col("w.start")).as("day_s"),
        col("event_type"), col("cnt"))

  /** Driver-gate streaming query (`stream_anomaly`): the z² daily
    * outlier detector as a LIVE monitor — the stream maintains the
    * per-(type, day) count state; the anomaly flag needs the
    * series-wide moments, which no single watermarked aggregation can
    * also hold, so it is a BATCH finisher over the converged state
    * (integer z² over count/sum/sum-of-squares, the
    * [[graft.ext.Relational.eventAnomaly]] rails — shared threshold
    * [[graft.ext.Relational.AnomalyZ]], shared oracle). At scale the
    * finisher runs per micro-batch via foreachBatch over the compact
    * (type, day) state — day-grain cardinality, never fact-scale.
    */
  def streamAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val daily = runToMemory(spark, stagedEventsDir(dir),
      "graft_stream_anomaly", dailyCounts, "complete")
    val z = graft.ext.Relational.AnomalyZ
    // the batch twin joins a broadcast stats agg (map-side combine at
    // fact scale); here the input is ALREADY the compact day-grain
    // state, so per-type windows over it are the simpler same-result
    // plan (and sidestep self-joining the memory-sink view)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
    val withStats = daily
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("cnt")).over(w))
      .withColumn("q", sum(col("cnt") * col("cnt")).over(w))
    val dev = col("cnt") * col("n") - col("s")
    withStats
      .filter(dev * dev * (col("n") - 1) >
        lit(z * z) * col("n") * (col("n") * col("q") - col("s") * col("s")))
      .select(col("event_type"), col("day_s"), col("cnt"),
        when(dev > 0, lit("high")).otherwise(lit("low")).as("side"))
      .orderBy("event_type", "day_s")
  }

  /** Daily OHLC bar state per event type — streaming twin of
    * [[graft.ext.TimeSeries.tsOhlc]] and its oracle: the open/close
    * pins ride INSIDE min/max(struct) aggregation state keyed on the
    * unique (ts_ns, event_id), exactly like the batch plan, so the
    * converged complete-mode table IS the batch relation.
    */
  def ohlcBars(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        min(struct(col("ts_ns"), col("event_id"),
          (col("value").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))).as("o"),
        max(struct(col("ts_ns"), col("event_id"),
          (col("value").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))).as("c"),
        max((col("value").cast("decimal(18,2)") * 100).cast("long"))
          .as("high_cents"),
        min((col("value").cast("decimal(18,2)") * 100).cast("long"))
          .as("low_cents"))
      .select(col("event_type"),
        (unix_micros(col("w.start")) * 1000L)
          .as("start_ns"),
        col("n"), col("o.cents").as("open_cents"), col("high_cents"),
        col("low_cents"), col("c.cents").as("close_cents"))

  /** Driver-gate streaming query (`stream_ohlc`): converged daily
    * bars reshaped to the batch `ts_ohlc` contract (epoch-day index
    * from the window start), sharing its oracle.
    */
  def streamOhlc(spark: SparkSession, dir: String): DataFrame = {
    runToMemory(spark, stagedEventsDir(dir), "graft_stream_ohlc",
      ohlcBars, "complete")
      .select(col("event_type"),
        expr("start_ns div 86400000000000").as("day_idx"),
        col("n"), col("open_cents"), col("high_cents"), col("low_cents"),
        col("close_cents"))
      .orderBy("event_type", "day_idx")
  }

  def streamDedup(spark: SparkSession, dir: String): DataFrame =
    runToMemory(spark, stagedEventsDir(dir), "graft_stream_dedup",
        dedupWithinWatermark, "append")
      .orderBy("event_id")

  val streamDedupSql: String =
    """SELECT event_id, user_id, event_type
      |FROM events ORDER BY event_id""".stripMargin

  /** Stream-static enrichment: the event stream joined to a STATIC
    * dimension (customer market segment keyed by user id), then the
    * watermarked tumbling aggregate per (hour, segment). The static
    * side is broadcast per micro-batch (stream-static joins are
    * stateless — no join state store; at cluster scale the dim
    * re-broadcasts on updates, the standard enrich shape before any
    * windowed rollup). Every event's user_id resolves (ids are drawn
    * from the customer key space), so inner-join semantics lose no
    * rows and the converged complete-mode result equals the batch
    * join+group — its DuckDB oracle.
    */
  def enrichedTumbling(spark: SparkSession, dir: String)(events: DataFrame): DataFrame = {
    val dim = Tables.table(spark, dir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
    events
      .withWatermark("ts", "10 minutes")
      .join(broadcast(dim), "user_id")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("segment"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(
        unix_timestamp(col("w.start")).as("hour_s"),
        col("segment"), col("n"), col("sum_value"))
  }

  /** Driver-gate streaming query (`stream_enrich`): replayed events
    * through [[enrichedTumbling]], converged in complete mode.
    */
  def streamEnrich(spark: SparkSession, dir: String): DataFrame =
    runToMemory(spark, stagedEventsDir(dir), "graft_stream_enrich",
        enrichedTumbling(spark, dir), "complete")
      .orderBy("hour_s", "segment")

  val streamEnrichSql: String =
    """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_s,
      |       c.c_mktsegment AS segment, count(*) AS n,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events e JOIN customer c ON c.c_custkey = e.user_id
      |GROUP BY hour_s, segment
      |ORDER BY hour_s, segment""".stripMargin

  /** Gate-scale STATE sizing: stateful streaming operators pay
    * per-partition-per-batch state-store overhead (provision, commit,
    * snapshot), so a replay whose whole state is tens of thousands of
    * rows wants few state partitions — 32 buys no parallelism there
    * and quadruples the machinery. Production sizes this by
    * throughput per the usual guidance; the override is scoped to
    * the streaming query's planning and restored after.
    */
  private def withStatePartitions[T](spark: SparkSession, n: Int)(f: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try f finally spark.conf.set(key, prev)
  }

  /** Stream-STREAM interval join: views joined to the purchases that
    * follow them within one hour for the same user — the
    * attribution-window primitive. Both sides carry watermarks and
    * the join condition bounds purchase time to [view, view + 1 h],
    * so Spark can size the join state store and evict rows older
    * than watermark − 1 h on each side; at cluster scale this is the
    * canonical bounded-state two-stream join (one shuffle per side
    * on user_id, RocksDB-backed state).
    *
    * Gate determinism: inner stream-stream joins emit each matched
    * pair exactly once regardless of micro-batch boundaries (state
    * eviction only FORGETS rows below the watermark; the
    * single-file staged replay — see [[stagedEventsDir]] — means
    * nothing is ever below it mid-run), so the appended result
    * equals the batch join and shares its oracle. Timestamps compare
    * at µs precision on both sides (the ns→µs truncation happens at
    * the source), and the lag is emitted as µs BIGINT.
    */
  def streamJoin(spark: SparkSession, dir: String): DataFrame = withStatePartitions(spark, 8) {
    val staged = stagedEventsDir(dir)
    val views = readEventStream(spark, staged)
      .filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "10 minutes")
    val purchases = readEventStream(spark, staged)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "10 minutes")
    val joined = views.join(purchases,
        col("p_user") === col("user_id") &&
          col("purchase_ts") >= col("view_ts") &&
          col("purchase_ts") <= col("view_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("view_ts")))
          .as("lag_us"))
    val q = joined.writeStream
      .format("memory")
      .queryName("graft_stream_join")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table("graft_stream_join")
      .orderBy("user_id", "view_id", "purchase_id")
  }

  /** Oracle: the batch interval join at the same µs precision. */
  val streamJoinSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type,
      |    epoch_ns(ts) // 1000 AS us
      |  FROM events)
      |SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
      |  CAST(p.us - v.us AS BIGINT) AS lag_us
      |FROM e v JOIN e p ON p.user_id = v.user_id
      |WHERE v.event_type = 'view' AND p.event_type = 'purchase'
      |  AND p.us >= v.us AND p.us <= v.us + 3600000000
      |ORDER BY v.user_id, view_id, purchase_id""".stripMargin

  /** Convenience for tests and the driver gate: run a streaming
    * transform over the events table replayed as a file stream, into
    * a memory sink, to completion (AvailableNow), returning the
    * materialized result. The memory sink materializes on the driver
    * BY DESIGN (the gate harness compares the converged table);
    * library callers at scale use [[runToParquet]], which keeps every
    * row on the executors.
    */
  def runToMemory(
      spark: SparkSession,
      dir: String,
      name: String,
      transform: DataFrame => DataFrame,
      outputMode: String = "append"): DataFrame = withStatePartitions(spark, 8) {
    val q = transform(readEventStream(spark, s"$dir"))
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Library-facing sink: the same transform surface writing to
    * parquet with no row ever reaching the driver. Two shapes by
    * output mode:
    *
    *   - `complete` (windowed aggregations): each micro-batch is the
    *     full converged result, written as a DISTRIBUTED per-batch
    *     overwrite via `foreachBatch` (native file sinks are
    *     append-only; an append+watermark run would also hold back
    *     unclosed windows at end-of-replay). Swapping parquet for a
    *     Kafka/Delta writer inside the batch function is a one-line
    *     change.
    *   - `append` (e.g. streaming dedup): the NATIVE parquet file
    *     sink, whose commit log makes the appends exactly-once — a
    *     per-batch overwrite here would discard every batch but the
    *     last, and a blind per-batch append would double rows on
    *     retry.
    *
    * Returns a reader over the written result for convenience.
    */
  def runToParquet(
      spark: SparkSession,
      dir: String,
      outPath: String,
      transform: DataFrame => DataFrame,
      outputMode: String = "complete"): DataFrame = {
    val resultPath = s"$outPath/result"
    val base = transform(readEventStream(spark, s"$dir"))
      .writeStream
      .outputMode(outputMode)
      .option("checkpointLocation", s"$outPath/_checkpoint")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    val q =
      if (outputMode == "append")
        base.format("parquet").option("path", resultPath).start()
      else
        base.foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("overwrite").parquet(resultPath)
        }.start()
    q.awaitTermination()
    spark.read.parquet(resultPath)
  }

  /** Staging for the state-timeout gate query ([[streamSessionStats]]):
    * the events file PLUS a one-row watermark-flush sentinel (user_id
    * −1, event time 2 hours past the corpus max). The sentinel's only
    * job is to advance the end-of-replay watermark beyond every
    * trailing session's `last event + gap`, so the event-time TIMEOUT
    * path actually fires (in the engine's no-data micro-batch after
    * the replay) and emits each user's final open session — the
    * flush-record idiom production pipelines use to drain session
    * state at stream end. Kept separate from [[stagedEventsDir]]: the
    * other eight gate queries depend on a SINGLE staged file.
    */
  private val stagedFlushDirs = scala.collection.concurrent.TrieMap.empty[String, String]

  private def stagedEventsWithFlushDir(spark: SparkSession, dir: String): String =
    stagedFlushDirs.getOrElseUpdate(dir, {
      val tmp = java.nio.file.Files.createTempDirectory("graft_stream_flush")
      val file = tmp.resolve("00-events.parquet")
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"), file)
      // one sentinel row in the SOURCE schema (ts flavor varies by
      // generation): sample a row, rewrite user_id/event_id/ts.
      // Save/restore the legacy-nanos conf around the build (ADVICE
      // r14 — staging must not mutate session state as a side effect)
      val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
      val nanosPrev = scala.util.Try(spark.conf.get(nanosKey)).toOption
      scala.util.Try(spark.conf.set(nanosKey, "true"))
      try {
      val raw = spark.read.parquet(file.toString)
      val marginNs = 2L * 3600L * 1000000000L
      val sentinel = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          val maxNs = raw.agg(max(col("ts"))).head().getLong(0)
          raw.limit(1).withColumn("ts", lit(maxNs + marginNs))
        case org.apache.spark.sql.types.TimestampNTZType =>
          val maxUs = raw.agg(max(unix_micros(col("ts").cast("timestamp"))))
            .head().getLong(0)
          raw.limit(1).withColumn("ts",
            timestamp_micros(lit(maxUs + marginNs / 1000L)).cast("timestamp_ntz"))
        case _ =>
          val maxUs = raw.agg(max(unix_micros(col("ts")))).head().getLong(0)
          raw.limit(1).withColumn("ts", timestamp_micros(lit(maxUs + marginNs / 1000L)))
      }
      val flushTmp = tmp.resolve("_flush_build")
      sentinel
        .withColumn("user_id", lit(-1L))
        .withColumn("event_id", lit(-1L))
        .coalesce(1).write.mode("overwrite").parquet(flushTmp.toString)
      val part = flushTmp.toFile.listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, tmp.resolve("01-flush.parquet"))
      org.apache.commons.io.FileUtils.deleteDirectory(flushTmp.toFile)
      } finally {
        nanosPrev match {
          case Some(v) => scala.util.Try(spark.conf.set(nanosKey, v))
          case None => scala.util.Try(spark.conf.unset(nanosKey))
        }
      }
      deleteRecursivelyOnExit(tmp)
      tmp.toString
    })

  /** Per-session gap timeout shared by [[sessionStats]] and the batch
    * rails: 30 minutes, compared in µs (the ns/µs discipline — both
    * engines compare at µs, and the corpus is verified edge-free
    * within 10 µs of the boundary).
    */
  private val SessionGapUs = 1800L * 1000000L

  /** Driver-gate streaming query (`stream_session_stats`) — the
    * arbitrary-state operator, oracle-gated (round 14, VERDICT r13
    * ask #5): gap-sessionization with PER-SESSION custom state that
    * `session_window` + aggregates cannot express in one pass —
    * per-session event count, DISTINCT event-type count, and
    * DECIMAL-cents value sum. `flatMapGroupsWithState` holds each
    * user's open session (bounded: one session's rows) plus its
    * session ordinal; closed sessions emit as soon as a later event
    * proves the gap, and the FINAL open session emits on event-time
    * timeout when the watermark passes `last event + gap` — driven at
    * end-of-replay by the flush sentinel
    * ([[stagedEventsWithFlushDir]]). Converged output equals the
    * batch gap-sessionization and shares its DuckDB oracle.
    *
    * Determinism rails: rows sort by (ts_us, event_id) inside the
    * group (shuffle arrival order is not a contract), cents are
    * per-row HALF_UP DECIMAL(18,2)×100 BIGINTs (summation-order-free),
    * and session ids are ordinals over that pinned order. At cluster
    * scale this is RocksDB-backed keyed state behind one user_id
    * shuffle; state per key is one OPEN session, not the user's
    * history.
    */
  def streamSessionStats(spark: SparkSession, dir: String): DataFrame =
    runToMemory(spark, stagedEventsWithFlushDir(spark, dir),
        "graft_stream_session_stats", sessionStats, "append")
      .orderBy("user_id", "session_id")

  /** The stateful transform behind [[streamSessionStats]]. */
  def sessionStats(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._

    val typed = events
      .select(col("user_id"), col("ts"),
        expr("ts_ns div 1000").as("ts_us"), col("event_id"),
        col("event_type"), col("value"))
      .withWatermark("ts", "10 minutes")
      .as[(Long, java.sql.Timestamp, Long, Long, String, Double)]

    def cents(v: Double): Long =
      java.math.BigDecimal.valueOf(v)
        .setScale(2, java.math.RoundingMode.HALF_UP)
        .movePointRight(2).longValueExact()

    def emit(userId: Long, sid: Long, rows: Seq[SessionEventRow])
        : (Long, Long, Long, Long, Long, Long, Long) = (
      userId, sid, rows.length.toLong,
      rows.map(_.eventType).distinct.length.toLong,
      rows.map(_.cents).sum,
      rows.head.tsUs / 1000000L, rows.last.tsUs / 1000000L)

    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionStatsState,
        (Long, Long, Long, Long, Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long,
         rows: Iterator[(Long, java.sql.Timestamp, Long, Long, String, Double)],
         state: GroupState[SessionStatsState]) =>
          if (userId < 0L) {
            // the watermark-flush sentinel: advances event time only
            Iterator.empty
          } else if (state.hasTimedOut) {
            // watermark passed last event + gap: the open session is
            // final — emit and clear
            val s = state.get
            state.remove()
            Iterator.single(emit(userId, s.nextSessionId, s.open))
          } else {
            // merge new rows into the open session under the pinned
            // (ts_us, event_id) order, emitting every session a later
            // event closes (gap > 30 min)
            val incoming = rows
              .map(r => SessionEventRow(r._3, r._4, r._5, cents(r._6))).toArray
            val prior = state.getOption
            val all = (prior.map(_.open).getOrElse(Vector.empty) ++ incoming)
              .sortBy(r => (r.tsUs, r.eventId))
            var sid = prior.map(_.nextSessionId).getOrElse(1L)
            val out = scala.collection.mutable.ArrayBuffer
              .empty[(Long, Long, Long, Long, Long, Long, Long)]
            var open = Vector.empty[SessionEventRow]
            for (r <- all) {
              if (open.nonEmpty && r.tsUs - open.last.tsUs > SessionGapUs) {
                out += emit(userId, sid, open)
                sid += 1
                open = Vector.empty
              }
              open = open :+ r
            }
            state.update(SessionStatsState(sid, open))
            state.setTimeoutTimestamp(open.last.tsUs / 1000L + SessionGapUs / 1000L)
            out.iterator
          }
      }
      .toDF("user_id", "session_id", "n_events", "n_types", "cents",
        "start_s", "end_s")
  }

  /** Oracle for `stream_session_stats`: batch gap-sessionization with
    * the same µs gaps, (ts_us, event_id) tie order, and DECIMAL-cents
    * rails.
    */
  val streamSessionStatsSql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(value AS DECIMAL(18,2)) AS v,
      |    epoch_ns(ts) // 1000 AS ts_us,
      |    CASE WHEN lag(epoch_ns(ts) // 1000, 1)
      |           OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id)
      |           IS NULL
      |         OR epoch_ns(ts) // 1000 - lag(epoch_ns(ts) // 1000, 1)
      |           OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id)
      |           > 1800000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events),
      |numbered AS (
      |  SELECT user_id, event_type, v, ts_us,
      |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM flagged)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |  count(*) AS n_events,
      |  CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
      |  CAST(sum(v) * 100 AS BIGINT) AS cents,
      |  min(ts_us) // 1000000 AS start_s,
      |  max(ts_us) // 1000000 AS end_s
      |FROM numbered GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** Custom keyed state via `flatMapGroupsWithState` — the surface for
    * stateful logic `session_window`/aggregates can't express: a
    * per-user running profile (event count, value sum, distinct event
    * types seen) emitted on every update, with event-time timeout
    * clearing idle users' state. State is bounded per key; at cluster
    * scale this is RocksDB-backed keyed state behind one shuffle on
    * user_id.
    */
  def userProfiles(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._

    // watermark applied on a retained event-time column — projecting
    // it away before the stateful operator would drop the watermark
    val typed = events
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .withWatermark("ts", "10 minutes")
      .as[(Long, java.sql.Timestamp, String, Double)]

    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserProfileState, (Long, Long, Double, Int)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[(Long, java.sql.Timestamp, String, Double)],
         state: GroupState[UserProfileState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator((userId, s.n, s.sum, s.types.size))
          } else {
            var s = state.getOption.getOrElse(UserProfileState(0L, 0.0, Set.empty))
            var maxTs = 0L
            rows.foreach { case (_, ts, tpe, v) =>
              s = UserProfileState(s.n + 1, s.sum + v, s.types + tpe)
              if (ts.getTime > maxTs) maxTs = ts.getTime
            }
            state.update(s)
            state.setTimeoutTimestamp(maxTs + 30 * 60 * 1000L) // 30 min idle
            Iterator((userId, s.n, s.sum, s.types.size))
          }
      }
      .toDF("user_id", "n_events", "sum_value", "n_types")
  }

  /** Driver-gate streaming query (`stream_kmv_distinct`, the 11th
    * gated streaming op, round 15): per-day DISTINCT-user estimates
    * via the portable [[graft.functions.KmvSketch]] bottom-k
    * Aggregator running AS STREAMING STATE — the operator class
    * `count(DISTINCT ...)` cannot provide in Structured Streaming
    * (distinct aggregates are unsupported there; the sketch's
    * mergeable K-slot buffer is exactly the bounded keyed state the
    * restriction exists to force). The registered `kmv_distinct`
    * UDAF rides a watermarked tumbling-day aggregation in complete
    * mode (convergence = the batch relation, the memory-sink
    * convention); state per day-window is ≤ K = 256 longs however
    * many events arrive. The oracle replays the full sketch — digit
    * fold, splitmix64 finalizer via 32-bit-split HUGEINT multiplies,
    * unsigned bottom-k, (K−1)·2⁶⁴ // kth — bit-for-bit per day, the
    * [[graft.ext.Relational.aggKmvDistinct]] chain keyed by day.
    */
  def streamKmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.NativeFunctions.register(spark)
    runToMemory(spark, stagedEventsDir(dir), "graft_stream_kmv",
      ev => ev.withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 day").as("w"))
        .agg(
          count(lit(1)).as("n_events"),
          expr("kmv_distinct(CAST(user_id AS STRING))").as("kmv_users")),
      "complete")
      .select(unix_timestamp(col("w.start")).as("day_s"),
        col("n_events"), col("kmv_users"))
      .orderBy("day_s")
  }

  /** Batch-twin oracle: the aggKmvDistinct HUGEINT sketch replay
    * keyed by epoch day.
    */
  val streamKmvDistinctSql: String =
    """WITH u AS (
      |  SELECT DISTINCT CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT)
      |    AS day_s, CAST(user_id AS VARCHAR) AS s
      |  FROM events),
      |h0 AS (
      |  SELECT day_s,
      |    list_reduce(list_prepend(CAST(0 AS HUGEINT),
      |      [CAST(unicode(substr(s, CAST(i AS INT), 1)) AS HUGEINT)
      |       for i in generate_series(1, length(s))]),
      |      (a, b) -> (a*31 + b) % 18446744073709551616) AS x
      |  FROM u),
      |m1 AS (SELECT day_s,
      |  ((x % 4294967296) * (18397679294719823053 % 4294967296)
      |   + 4294967296 * ((x % 4294967296) * (18397679294719823053 // 4294967296)
      |                 + (x // 4294967296) * (18397679294719823053 % 4294967296))
      |  ) % 18446744073709551616 AS x FROM h0),
      |a1 AS (SELECT day_s,
      |  (x + (x // 8589934592)) % 18446744073709551616 AS x FROM m1),
      |m2 AS (SELECT day_s,
      |  ((x % 4294967296) * (14181476777654086739 % 4294967296)
      |   + 4294967296 * ((x % 4294967296) * (14181476777654086739 // 4294967296)
      |                 + (x // 4294967296) * (14181476777654086739 % 4294967296))
      |  ) % 18446744073709551616 AS x FROM a1),
      |h AS (SELECT day_s,
      |  (x + (x // 8589934592)) % 18446744073709551616 AS hu FROM m2),
      |hd AS (SELECT DISTINCT day_s, hu FROM h),
      |r AS (SELECT day_s, hu,
      |        row_number() OVER (PARTITION BY day_s ORDER BY hu) AS rn
      |      FROM hd),
      |k AS (SELECT day_s, count(*) AS seen,
      |        max(hu) FILTER (WHERE rn <= 256) AS kth
      |      FROM r GROUP BY day_s),
      |n AS (SELECT CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT)
      |        AS day_s, count(*) AS n_events
      |      FROM events GROUP BY 1)
      |SELECT k.day_s, CAST(n.n_events AS BIGINT) AS n_events,
      |  CASE WHEN k.seen < 256 THEN CAST(k.seen AS BIGINT)
      |       ELSE CAST((CAST(255 AS HUGEINT) * 18446744073709551616) // k.kth
      |            AS BIGINT)
      |  END AS kmv_users
      |FROM k JOIN n ON n.day_s = k.day_s
      |ORDER BY k.day_s""".stripMargin
}

/** Keyed state for [[EventStreams.userProfiles]]. */
final case class UserProfileState(n: Long, sum: Double, types: Set[String])

/** One buffered event of the OPEN session ([[EventStreams.sessionStats]]):
  * µs event time, id tie-break, type for the distinct count, value
  * pre-quantized to DECIMAL(18,2) cents so emission order can never
  * touch a float.
  */
final case class SessionEventRow(
    tsUs: Long, eventId: Long, eventType: String, cents: Long)

/** Keyed state for [[EventStreams.sessionStats]]: the next session
  * ordinal and the open session's rows (bounded by one session, not
  * the user's history).
  */
final case class SessionStatsState(
    nextSessionId: Long, open: Vector[SessionEventRow])
