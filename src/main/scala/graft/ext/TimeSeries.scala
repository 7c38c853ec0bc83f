package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Time-series shaping operators — the resample/gap-fill and
  * slowly-changing-dimension families every warehouse pipeline needs
  * and no single built-in spells (SURVEY.md §2 extension surface;
  * the reference — a file-statistics CLI — has no temporal axis at
  * all, cf. /root/reference/README.md).
  *
  * Determinism discipline matches [[Relational]]: money in
  * DECIMAL(18,2) surfaced as BIGINT cents, timestamps surfaced as
  * epoch-ns BIGINT, ties pinned on (ts_ns, event_id), results fully
  * ordered.
  */
object TimeSeries {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  // ----------------------------------------------------------------
  // Calendar gap-fill + LOCF: the resample primitive
  // ----------------------------------------------------------------

  /** Daily-revenue series RESAMPLED onto the complete calendar: every
    * day between the corpus min and max order date appears exactly
    * once, order-free days zero-filled and flagged, plus the
    * last-observation-carried-forward revenue (the "latest known
    * value" series dashboards and feature pipelines join against).
    *
    * Scale shape: the daily pre-aggregation is one map-side-combinable
    * hash agg over the fact table — the only pass that touches
    * fact-scale data. The calendar derives from a ONE-ROW bounds agg
    * via `sequence`/`explode` (no driver round-trip, no
    * `spark.range` guesswork), so the left join and the LOCF window
    * run at CALENDAR scale — rows = span days, bounded (a century is
    * ~37k rows) regardless of fact size. The unpartitioned LOCF
    * window is therefore safe: it walks the calendar, never the
    * facts. At 100 TB nothing changes — the fact table still meets
    * exactly one hash agg.
    *
    * LOCF = `last(..., ignoreNulls)` over an unbounded-preceding row
    * frame; the first calendar day carries data by construction
    * (it IS the min order date), so the LOCF column is never null.
    */
  def tsGapfill(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.table(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(
        (sum(dec(col("o_totalprice"))) * 100).cast("long").as("raw_rev"),
        count(lit(1)).as("n_orders"))
    val cal = daily
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    // unpartitioned BY DESIGN: the frame walks the day-grain calendar
    // spine (one row per day — bounded by elapsed time, not data size)
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(daily, Seq("day"), "left")
      .select(
        // epoch-DAY index, not a raw DATE: BIGINT is the one date
        // surface every engine formats identically (house rule —
        // cf. window_growth's week_s)
        datediff(col("day"), lit("1970-01-01")).cast("long").as("day_idx"),
        coalesce(col("n_orders"), lit(0L)).cast("long").as("n_orders"),
        coalesce(col("raw_rev"), lit(0L)).as("rev_cents"),
        when(col("raw_rev").isNull, 1L).otherwise(0L).as("is_gap"),
        last(col("raw_rev"), ignoreNulls = true).over(w).as("locf_rev_cents"))
      .orderBy("day_idx")
  }

  val tsGapfillSql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
      |      AS raw_rev,
      |    count(*) AS n_orders
      |  FROM orders GROUP BY 1),
      |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
      |cal AS (
      |  SELECT CAST(day_ts AS DATE) AS day FROM (
      |    SELECT unnest(generate_series(CAST(d0 AS TIMESTAMP),
      |      CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS day_ts FROM b)),
      |j AS (
      |  SELECT cal.day, daily.raw_rev, coalesce(daily.n_orders, 0) AS n_orders
      |  FROM cal LEFT JOIN daily USING (day))
      |SELECT CAST(day - DATE '1970-01-01' AS BIGINT) AS day_idx,
      |  CAST(n_orders AS BIGINT) AS n_orders,
      |  coalesce(raw_rev, 0) AS rev_cents,
      |  CAST(CASE WHEN raw_rev IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap,
      |  last_value(raw_rev IGNORE NULLS)
      |    OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS locf_rev_cents
      |FROM j ORDER BY day_idx""".stripMargin

  /** Linear INTERPOLATION across calendar gaps — the smooth
    * complement of [[tsGapfill]]'s LOCF: each gap day takes
    * `prev + (next − prev)·(d − d_prev) ÷ (d_next − d_prev)` in pure
    * BIGINT floor arithmetic (no float slope anywhere — both
    * engines floor identical integer products). Observed days pass
    * through untouched. The frame pair does the bracketing without
    * any self-join: `last(ignoreNulls)` over the preceding frame and
    * `first(ignoreNulls)` over the following frame find d_prev/d_next
    * in one calendar-scale window pass; the span endpoints always
    * exist because the calendar is bounded by observed days. Same
    * scale posture as [[tsGapfill]]: facts meet one hash agg, the
    * windows walk the bounded calendar.
    */
  def tsInterp(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.table(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg((sum(dec(col("o_totalprice"))) * 100).cast("long").as("raw_rev"))
    val cal = daily
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val joined = cal.join(daily, Seq("day"), "left")
      .select(datediff(col("day"), lit("1970-01-01")).cast("long").as("d"),
        col("raw_rev"))
    // unpartitioned BY DESIGN: day-grain calendar spine, one row per
    // day — bounded by elapsed time, not data size
    val ord = Window.orderBy("d")
    val back = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    joined
      .withColumn("pv", last(col("raw_rev"), ignoreNulls = true).over(back))
      .withColumn("pd", last(when(col("raw_rev").isNotNull, col("d")),
        ignoreNulls = true).over(back))
      .withColumn("nv", first(col("raw_rev"), ignoreNulls = true).over(fwd))
      .withColumn("nd", first(when(col("raw_rev").isNotNull, col("d")),
        ignoreNulls = true).over(fwd))
      .select(col("d").as("day_idx"),
        coalesce(col("raw_rev"), lit(0L)).as("rev_cents"),
        when(col("raw_rev").isNull, 1L).otherwise(0L).as("is_gap"),
        when(col("raw_rev").isNotNull, col("raw_rev"))
          .otherwise(col("pv") +
            expr("(nv - pv) * (d - pd) div (nd - pd)"))
          .as("interp_cents"))
      .orderBy("day_idx")
  }

  val tsInterpSql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
      |      AS raw_rev
      |  FROM orders GROUP BY 1),
      |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
      |cal AS (
      |  SELECT CAST(day_ts AS DATE) AS day FROM (
      |    SELECT unnest(generate_series(CAST(d0 AS TIMESTAMP),
      |      CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS day_ts FROM b)),
      |j AS (
      |  SELECT CAST(cal.day - DATE '1970-01-01' AS BIGINT) AS d,
      |    daily.raw_rev
      |  FROM cal LEFT JOIN daily USING (day)),
      |f AS (
      |  SELECT d, raw_rev,
      |    last_value(raw_rev IGNORE NULLS) OVER
      |      (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS pv,
      |    last_value(CASE WHEN raw_rev IS NOT NULL THEN d END IGNORE NULLS)
      |      OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS pd,
      |    first_value(raw_rev IGNORE NULLS) OVER
      |      (ORDER BY d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |      AS nv,
      |    first_value(CASE WHEN raw_rev IS NOT NULL THEN d END IGNORE NULLS)
      |      OVER (ORDER BY d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |      AS nd
      |  FROM j)
      |SELECT d AS day_idx, coalesce(raw_rev, 0) AS rev_cents,
      |  CAST(CASE WHEN raw_rev IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap,
      |  CASE WHEN raw_rev IS NOT NULL THEN raw_rev
      |       ELSE pv + (nv - pv) * (d - pd) // (nd - pd) END AS interp_cents
      |FROM f ORDER BY day_idx""".stripMargin

  // ----------------------------------------------------------------
  // SCD Type-2: validity intervals from a change log
  // ----------------------------------------------------------------

  /** Slowly-changing-dimension TYPE-2 build from the event change
    * log: per user, consecutive runs of the same event_type collapse
    * into one versioned row with [valid_from, valid_to) epoch-ns
    * bounds, `valid_to` null + `is_current` = 1 on the open tail —
    * the standard dimension-history layout `cdc_diff` classifies
    * single snapshots into, here constructed for the full history.
    *
    * Scale shape: two user-partitioned windows (lag for
    * change-points, running sum for version numbers), one hash agg
    * per (user, version) run, and a final user-partitioned lead for
    * the interval close — all partitioned by the natural key, no
    * global window, no self-join of the log against itself. State
    * per task is one partition's rows: the 100 TB layout is exactly
    * this plan with more partitions. Ties pinned on (ts_ns,
    * event_id) like every event-order operator in [[Relational]].
    *
    * Interval bounds surface as epoch MICROseconds (`ts_ns div
    * 1000`): DuckDB's parquet reader narrows ns timestamps to µs, so
    * µs is the exact cross-engine grain. The open tail carries
    * `Long.MaxValue` instead of NULL — "+infinity" makes
    * `valid_from <= t AND t < valid_to` point-in-time probes work
    * unconditionally, and a nullable BIGINT would degrade to float64
    * in pandas-style comparators, silently losing the low bits.
    */
  def scd2Build(spark: SparkSession, dir: String): DataFrame =
    scd2From(Tables.events(spark, dir))

  /** The interval build over any (user_id, event_id, ts_ns,
    * event_type) change log — shared by [[scd2Build]] (full log) and
    * [[scd2Lookup]] (non-purchase dimension states).
    */
  private def scd2From(events: DataFrame): DataFrame = {
    val ord = Window.partitionBy("user_id").orderBy(col("ts_ns"), col("event_id"))
    val run = Window.partitionBy("user_id").orderBy(col("ts_ns"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byVersion = Window.partitionBy("user_id").orderBy("version")
    events
      .select(col("user_id"), col("event_id"), col("ts_ns"),
        col("event_type").as("state"))
      .withColumn("prev", lag(col("state"), 1).over(ord))
      .withColumn("chg",
        when(col("prev").isNull || col("prev") =!= col("state"), 1L).otherwise(0L))
      .withColumn("version", sum(col("chg")).over(run))
      .groupBy(col("user_id"), col("version"))
      .agg(
        min(col("state")).as("state"),
        expr("min(ts_ns) div 1000").as("valid_from_us"),
        count(lit(1)).as("n_events"))
      .withColumn("next_from", lead(col("valid_from_us"), 1).over(byVersion))
      .select(
        col("user_id"), col("version").cast("long").as("version"),
        col("state"), col("valid_from_us"),
        coalesce(col("next_from"), lit(Long.MaxValue)).as("valid_to_us"),
        when(col("next_from").isNull, 1L).otherwise(0L).as("is_current"),
        col("n_events").cast("long").as("n_events"))
      .orderBy("user_id", "version")
  }

  val scd2BuildSql: String =
    s"""WITH ${scd2ChainSql("")}
       |SELECT user_id, CAST(version AS BIGINT) AS version, state,
       |  CAST(valid_from_us AS BIGINT) AS valid_from_us,
       |  CAST(valid_to_us AS BIGINT) AS valid_to_us,
       |  CAST(CASE WHEN valid_to_us = 9223372036854775807
       |       THEN 1 ELSE 0 END AS BIGINT) AS is_current,
       |  CAST(n_events AS BIGINT) AS n_events
       |FROM dim ORDER BY user_id, version""".stripMargin

  /** POINT-IN-TIME LOOKUP against the Type-2 dimension — the join
    * SCD2 exists to serve, and the backtest-correctness primitive
    * (a training pipeline joining features "as of" the example's
    * timestamp must never read a later state): each purchase fact
    * finds the user's browsing state at purchase time via
    * `valid_from <= t < valid_to`. The dimension here is built from
    * the NON-purchase events (the fact must not look itself up);
    * purchases before a user's first dimension state fall out of the
    * left join into an explicit `unknown` — the every-fact-accounted
    * discipline of `event_attribution`.
    *
    * Plan shape: the dimension build is [[scd2From]]'s keyed
    * windows; the lookup is a user_id EQUI-join with the interval
    * predicate as a residual filter (never a cartesian), and the
    * `Long.MaxValue` open tail means current-state probes need no
    * null branch. One row per purchase by the non-overlap of SCD2
    * intervals — asserted in `TimeSeriesSpec`.
    */
  def scd2Lookup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val dim = scd2From(ev.filter(col("event_type") =!= "purchase"))
      .select(col("user_id").as("d_user"), col("state"),
        col("version").as("state_version"),
        col("valid_from_us"), col("valid_to_us"))
    ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        expr("ts_ns div 1000").as("t_us"), dec(col("value")).as("v"))
      .join(dim,
        col("user_id") === col("d_user") &&
          col("t_us") >= col("valid_from_us") &&
          col("t_us") < col("valid_to_us"),
        "left")
      .select(col("event_id"), col("user_id"), col("t_us"),
        coalesce(col("state"), lit("unknown")).as("state_at"),
        coalesce(col("state_version"), lit(0L)).as("state_version"),
        col("v").cast("double").as("value"))
      .orderBy("event_id")
  }

  /** The interval-build CTE chain (o → r → g → dim) over events
    * matching `where` — the SQL twin of [[scd2From]], shared by both
    * oracle strings so the two sides cannot desynchronize.
    */
  private def scd2ChainSql(where: String): String =
    s"""o AS (
       |  SELECT user_id, event_id, epoch_ns(ts) AS ts_ns, event_type AS state,
       |    lag(event_type) OVER (PARTITION BY user_id
       |                          ORDER BY epoch_ns(ts), event_id) AS prev
       |  FROM events $where),
       |r AS (
       |  SELECT user_id, ts_ns, state,
       |    sum(CASE WHEN prev IS NULL OR prev != state THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
       |  FROM o),
       |g AS (
       |  SELECT user_id, version, min(state) AS state,
       |    min(ts_ns) // 1000 AS valid_from_us, count(*) AS n_events
       |  FROM r GROUP BY user_id, version),
       |dim AS (
       |  SELECT user_id, version, state, valid_from_us, n_events,
       |    coalesce(lead(valid_from_us) OVER (PARTITION BY user_id
       |                                       ORDER BY version),
       |             9223372036854775807) AS valid_to_us
       |  FROM g)""".stripMargin

  val scd2LookupSql: String =
    s"""WITH ${scd2ChainSql("WHERE event_type != 'purchase'")},
       |p AS (
       |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS t_us,
       |    CAST(value AS DECIMAL(18,2)) AS v
       |  FROM events WHERE event_type = 'purchase')
       |SELECT p.event_id, p.user_id, p.t_us,
       |  coalesce(dim.state, 'unknown') AS state_at,
       |  CAST(coalesce(dim.version, 0) AS BIGINT) AS state_version,
       |  CAST(p.v AS DOUBLE) AS value
       |FROM p LEFT JOIN dim
       |  ON dim.user_id = p.user_id
       |  AND p.t_us >= dim.valid_from_us AND p.t_us < dim.valid_to_us
       |ORDER BY p.event_id""".stripMargin

  // ----------------------------------------------------------------
  // Interval coalescing: merge overlapping spans per key
  // ----------------------------------------------------------------

  /** INTERVAL MERGE — the union of overlapping time spans per user
    * (the "stack-free interval coalescing" every calendar/booking/
    * session system needs and no built-in spells): each event opens
    * a span [ts, ts + value minutes); spans that overlap or touch
    * collapse into one island. The gaps-and-islands trick
    * generalized from `window_islands`' consecutive-integer days to
    * arbitrary RANGES: an island starts exactly where a span's start
    * exceeds the running maximum of all previous ends — cummax, not
    * a self-join, so the plan is two user-partitioned windows + one
    * hash agg regardless of overlap depth.
    *
    * Determinism: span ends are `floor(value·6e7)` µs offsets —
    * explicit `floor` because Spark's double→long cast truncates
    * while DuckDB's rounds, the one cast-semantics trap between the
    * engines; starts are µs BIGINT; window order pinned on
    * (s, e, event_id).
    */
  def intervalMerge(spark: SparkSession, dir: String): DataFrame = {
    val spans = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        expr("ts_ns div 1000").as("s"),
        (expr("ts_ns div 1000") +
          floor(col("value") * 60000000L).cast("long")).as("e"))
    val ord = Window.partitionBy("user_id").orderBy(col("s"), col("e"), col("event_id"))
    val prevMax = Window.partitionBy("user_id")
      .orderBy(col("s"), col("e"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val run = Window.partitionBy("user_id")
      .orderBy(col("s"), col("e"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spans
      .withColumn("pmax", max(col("e")).over(prevMax))
      .withColumn("new_island",
        when(col("pmax").isNull || col("s") > col("pmax"), 1L).otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(run))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("s")).as("start_us"), max(col("e")).as("end_us"),
        count(lit(1)).as("n_merged"))
      .select(col("user_id"), col("island").cast("long").as("island"),
        col("start_us"), col("end_us"),
        (col("end_us") - col("start_us")).as("span_us"),
        col("n_merged").cast("long").as("n_merged"))
      .orderBy("user_id", "island")
  }

  val intervalMergeSql: String =
    """WITH spans AS (
      |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS s,
      |    epoch_ns(ts) // 1000
      |      + CAST(floor(value * 60000000) AS BIGINT) AS e
      |  FROM events),
      |flags AS (
      |  SELECT user_id, s, e,
      |    max(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS pmax,
      |    event_id
      |  FROM spans),
      |isl AS (
      |  SELECT user_id, s, e,
      |    sum(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY s, e, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM flags)
      |SELECT user_id, CAST(island AS BIGINT) AS island,
      |  min(s) AS start_us, max(e) AS end_us,
      |  max(e) - min(s) AS span_us, count(*) AS n_merged
      |FROM isl GROUP BY user_id, island
      |ORDER BY user_id, island""".stripMargin

  // ----------------------------------------------------------------
  // CDC apply: changelog -> current snapshot (the MERGE primitive)
  // ----------------------------------------------------------------

  /** Apply a change log to produce the CURRENT snapshot — the MERGE /
    * upsert-apply primitive that pairs with `cdc_diff` (which goes
    * the other way: two snapshots → the log). The events table is
    * read as a per-user changelog in (ts_ns, event_id) order:
    * `error` rows are DELETE markers (tombstones), everything else
    * upserts the user's (state, value). A user whose LAST op is a
    * tombstone is absent from the snapshot — exactly Debezium-style
    * last-writer-wins compaction.
    *
    * Plan shape: ONE hash aggregation with `max_by` over the
    * (ts_ns, event_id) struct key — partial aggregation runs
    * map-side, so the shuffle carries one candidate row per
    * (partition, user), NOT the whole log; the keyed-window
    * formulation (row_number desc = 1) would shuffle and sort every
    * change row. The tombstone filter is applied AFTER the argmax —
    * a delete must win over earlier upserts, not vanish from the
    * race. Tie-safety: (ts_ns, event_id) is unique per row.
    *
    * Output: (user_id, state, value_cents, updated_us, n_ops) with
    * the family's fixed-point money and epoch-µs conventions.
    */
  def cdcApply(spark: SparkSession, dir: String): DataFrame = {
    val key = struct(col("ts_ns"), col("event_id"))
    Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(
        max_by(col("event_type"), key).as("state"),
        max_by(dec(col("value")), key).as("last_value"),
        max_by(col("ts_ns"), key).as("last_ts_ns"),
        count(lit(1)).as("n_ops"))
      .filter(col("state") =!= "error")
      .select(
        col("user_id"), col("state"),
        (col("last_value") * 100).cast("long").as("value_cents"),
        expr("last_ts_ns div 1000").as("updated_us"),
        col("n_ops").cast("long").as("n_ops"))
      .orderBy("user_id")
  }

  private val DecayHalfLifeDays = 7L
  private val DecayMaxShift = 50L // 2^50 fits double exactly; cents/2^50 = 0 anyway

  /** Recency-DECAYED per-user value rollup: each event contributes
    * its cents halved once per [[DecayHalfLifeDays]] elapsed since
    * the corpus's latest event — the recency-weighting primitive
    * behind decayed feature stores and trending-score rollups, where
    * last week's purchase must outweigh last year's.
    *
    * Decay is STEPWISE (2^-floor(age/H), not 2^(-age/H)) and the
    * whole computation is exact integer arithmetic: cents ride the
    * family's DECIMAL(18,2) rail, the shift count is integer-µs
    * division, and the decayed contribution is a floor-division by a
    * power of two — so partial sums are Longs, associative and
    * portable, immune to the FP-partial-sum nondeterminism that
    * plagues naive pow()-weighted SUMs across partitionings AND
    * engines (same discipline as the IVF fixed-point sums). The
    * smooth-decay variant differs only in weight shape and buys that
    * smoothness with a transcendental in the hot sum.
    *
    * Plan: the corpus max timestamp is a one-row broadcast; the
    * decay is rowwise; ONE hash aggregation with map-side partials.
    */
  def aggDecay(spark: SparkSession, dir: String): DataFrame = {
    val mx = Tables.events(spark, dir)
      .agg(max(expr("ts_ns div 1000")).as("mx_us"))
    Tables.events(spark, dir)
      .crossJoin(broadcast(mx))
      .withColumn("cents", (dec(col("value")) * 100).cast("long"))
      .withColumn("k",
        least(expr(s"(mx_us - ts_ns div 1000) div 86400000000 div $DecayHalfLifeDays"),
          lit(DecayMaxShift)))
      .withColumn("dcents", expr("cents div CAST(power(2, k) AS BIGINT)"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("cents")).as("sum_cents"),
        sum(col("dcents")).as("decayed_cents"))
      .select(col("user_id"), col("n_events").cast("long").as("n_events"),
        col("sum_cents").cast("long").as("sum_cents"),
        col("decayed_cents").cast("long").as("decayed_cents"))
      .orderBy("user_id")
  }

  val aggDecaySql: String =
    s"""WITH mx AS (SELECT max(epoch_ns(ts) // 1000) AS mx_us FROM events),
       |d AS (
       |  SELECT user_id,
       |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
       |    LEAST((mx.mx_us - epoch_ns(ts) // 1000) // 86400000000
       |      // $DecayHalfLifeDays, $DecayMaxShift) AS k
       |  FROM events, mx)
       |SELECT user_id, count(*) AS n_events,
       |  CAST(sum(cents) AS BIGINT) AS sum_cents,
       |  CAST(sum(cents // CAST(power(2, k) AS BIGINT)) AS BIGINT)
       |    AS decayed_cents
       |FROM d GROUP BY user_id ORDER BY user_id""".stripMargin

  val cdcApplySql: String =
    s"""WITH last AS (
       |  SELECT user_id, event_type AS state,
       |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS value_cents,
       |    epoch_ns(ts) // 1000 AS updated_us,
       |    count(*) OVER (PARTITION BY user_id) AS n_ops
       |  FROM events
       |  QUALIFY row_number() OVER (PARTITION BY user_id
       |    ORDER BY epoch_ns(ts) DESC, event_id DESC) = 1)
       |SELECT user_id, state, value_cents, updated_us,
       |  CAST(n_ops AS BIGINT) AS n_ops
       |FROM last WHERE state != 'error'
       |ORDER BY user_id""".stripMargin

  // ----------------------------------------------------------------
  // EWMA: integer-exact exponential smoothing per key
  // ----------------------------------------------------------------

  /** Exponentially weighted moving average over each event type's
    * daily revenue, in INTEGER-EXACT form: `s₁ = x₁;
    * sₜ = (xₜ + sₜ₋₁) div 2` — α = ½ makes every step one add and one
    * floor-halving on BIGINT cents, so the whole recursion is
    * portable (no compounding float powers, no partial-sum order
    * sensitivity; same discipline as [[aggDecay]]'s power-of-two
    * weights). Daily values are strictly positive (cents of positive
    * event values), where `div` and `//` agree.
    *
    * An EWMA is inherently a SEQUENTIAL fold, which Spark's window
    * frames cannot express; the scale-safe shape is: ONE map-side-
    * combinable hash agg reduces the fact table to (key, day) rows,
    * then each key's series — bounded by the CALENDAR span, never by
    * fact size (cf. [[tsGapfill]]) — folds inside the native
    * [[graft.functions.EwmaFold]] expression over its sorted point
    * array: one O(L) pass with a preallocated output (the earlier
    * SQL `aggregate` + `concat(acc, array(..))` fold was O(L²) in
    * span-days from per-step accumulator copies). No window over
    * fact rows, no driver loop, no UDF. The oracle replays the
    * identical recurrence as a recursive CTE stepping `rn → rn + 1`
    * per key.
    */
  def tsEwma(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        expr("ts_ns div 86400000000000").as("day_idx"))
      .agg((sum(dec(col("value"))) * 100).cast("long").as("cents"))
    daily
      .groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day_idx"), col("cents"))))
        .as("pts"))
      .select(col("event_type"),
        explode(graft.functions.NativeFunctions.ewmaFold(col("pts"))).as("e"))
      .select(col("event_type"), col("e.day_idx").as("day_idx"),
        col("e.cents").as("cents"), col("e.s").as("ewma_cents"))
      .orderBy("event_type", "day_idx")
  }

  val tsEwmaSql: String =
    """WITH RECURSIVE daily AS (
      |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day_idx,
      |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT event_type, day_idx, cents,
      |    row_number() OVER (PARTITION BY event_type ORDER BY day_idx) AS rn
      |  FROM daily),
      |e AS (
      |  SELECT event_type, day_idx, cents, rn, cents AS s
      |  FROM r WHERE rn = 1
      |  UNION ALL
      |  SELECT r.event_type, r.day_idx, r.cents, r.rn, (r.cents + e.s) // 2
      |  FROM e JOIN r ON r.event_type = e.event_type AND r.rn = e.rn + 1)
      |SELECT event_type, day_idx, cents, s AS ewma_cents
      |FROM e ORDER BY event_type, day_idx""".stripMargin

  // ----------------------------------------------------------------
  // CUSUM changepoint: where did the series' level shift?
  // ----------------------------------------------------------------

  /** CUSUM changepoint detection per event-type series (Page,
    * Biometrika 1954, public formula): the point maximizing the
    * cumulative deviation from the series mean — `argmax_i |Σ_{j≤i}
    * x_j − i·μ|` — which is the classic single-changepoint locator
    * for a level shift. Scaled by n to stay INTEGER-exact:
    * `s_i = n·cum_i − i·total` over BIGINT cents, so no float mean
    * ever enters the argmax and the oracle replays bit-for-bit
    * (headroom: |s| ≤ n²·max_cents ≈ 2e15 at the factor-100 audit
    * scale, 3 decimal orders inside BIGINT; a runtime guard fails
    * loudly past 2^62 — lift cum/total to DECIMAL(38,0) then, same
    * plan).
    *
    * Scale shape: series totals come from one map-side-combinable
    * hash agg broadcast-joined back (fact-scale data meets exactly
    * ONE window sort — the inherent per-series ordered scan CUSUM
    * is defined by); the argmax is NOT a second window but a
    * max(struct) hash agg with the tie pinned inside the key
    * (s_abs desc, then earliest (ts_ns, event_id) via negation), so
    * nothing re-sorts fact-scale rows. Ties replay identically in
    * DuckDB's QUALIFY formulation because (ts_ns, event_id) is
    * unique.
    */
  def tsChangepoint(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("ts_ns"), col("event_id"),
        (dec(col("value")) * 100).cast("long").as("cents"))
    val totals = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("total"))
    val run = Window.partitionBy("event_type")
      .orderBy(col("ts_ns"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pos = Window.partitionBy("event_type")
      .orderBy(col("ts_ns"), col("event_id"))
    // Loud-fail overflow guard (ADVICE r12): |s| = |n·cum − i·total|
    // ≤ n·|cum| + n·|total|; requiring each product below 2^62 bounds
    // |s| < 2^63, so a corpus past the documented ~3-orders headroom
    // errors instead of silently corrupting the argmax. assert_true
    // rides the row pipeline (no extra pass) and the filter keeps
    // Catalyst from pruning it; it never fires at gated scales.
    val bound = lit(1L << 62)
    ev.join(broadcast(totals), "event_type")
      .withColumn("i", row_number().over(pos).cast("long"))
      .withColumn("cum", sum(col("cents")).over(run))
      .filter(assert_true(
        abs(col("cum")) <= bound / col("n") &&
          abs(col("total")) <= bound / col("n"),
        lit("ts_changepoint: n*cum or n*total would overflow BIGINT — " +
          "lift cum/total to DECIMAL(38,0)")).isNull)
      .withColumn("s_abs", abs(col("n") * col("cum") - col("i") * col("total")))
      .groupBy(col("event_type"))
      .agg(max(struct(col("s_abs"), (-col("ts_ns")).as("nt"),
        (-col("event_id")).as("ne"), col("i"), col("n"), col("total")))
        .as("top"))
      .select(col("event_type"), col("top.n").as("n"),
        col("top.total").as("total_cents"),
        col("top.i").as("cp_pos"), (-col("top.nt")).as("cp_ts_ns"),
        col("top.s_abs").as("cusum_abs"))
      .orderBy("event_type")
  }

  val tsChangepointSql: String =
    """WITH ev AS (
      |  SELECT event_type, epoch_ns(ts) AS ts_ns, event_id,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |tot AS (
      |  SELECT event_type, count(*) AS n, sum(cents) AS total
      |  FROM ev GROUP BY 1),
      |cu AS (
      |  SELECT e.event_type, e.ts_ns, e.event_id, t.n, t.total,
      |    row_number() OVER w AS i,
      |    sum(e.cents) OVER w AS cum
      |  FROM ev e JOIN tot t USING (event_type)
      |  WINDOW w AS (PARTITION BY e.event_type
      |    ORDER BY e.ts_ns, e.event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT event_type, CAST(n AS BIGINT) AS n,
      |  CAST(total AS BIGINT) AS total_cents,
      |  CAST(i AS BIGINT) AS cp_pos, ts_ns AS cp_ts_ns,
      |  CAST(abs(n * cum - i * total) AS BIGINT) AS cusum_abs
      |FROM cu
      |QUALIFY row_number() OVER (PARTITION BY event_type
      |  ORDER BY abs(n * cum - i * total) DESC, ts_ns, event_id) = 1
      |ORDER BY event_type""".stripMargin

  // ----------------------------------------------------------------
  // Holt double exponential smoothing: level + trend forecast
  // ----------------------------------------------------------------

  /** Holt's linear-trend smoothing (Holt 1957 / Winters 1960, public
    * formulas) over each event type's daily revenue, α = β = ½ in
    * INTEGER-EXACT form (the [[tsEwma]] discipline extended to two
    * states):
    * {{{ l₁ = x₁, b₁ = 0
    *     lₜ = (xₜ + lₜ₋₁ + bₜ₋₁) div 2
    *     bₜ = ((lₜ − lₜ₋₁) + bₜ₋₁) div 2 }}}
    * Every step is adds and one integral halving on BIGINT cents —
    * `div` and DuckDB `//` both truncate toward zero, so the
    * recursion is portable even where the trend goes NEGATIVE
    * (tsEwma never needed that case). Output: final state + the
    * 7-day-ahead linear forecast `l + 7·b` per series.
    *
    * Scale shape: one map-side-combinable hash agg reduces the fact
    * table to (key, day) rows; each key's CALENDAR-BOUNDED series
    * folds in one `aggregate` HOF pass with a 2-field struct
    * accumulator — O(span) with no per-step array copies (only the
    * final state is kept, unlike the ewma series output), no window
    * over fact rows, no UDF. The oracle replays the recurrence as a
    * recursive CTE and keeps each key's last row.
    */
  def tsHolt(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        expr("ts_ns div 86400000000000").as("day_idx"))
      .agg((sum(dec(col("value"))) * 100).cast("long").as("cents"))
    daily
      .groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day_idx"), col("cents"))))
        .as("pts"))
      .select(col("event_type"),
        size(col("pts")).cast("long").as("n_days"),
        element_at(col("pts"), -1).getField("day_idx").as("last_day_idx"),
        expr(
          """aggregate(
            |  slice(pts, 2, size(pts) - 1),
            |  named_struct('l', pts[0].cents, 'b', CAST(0 AS BIGINT)),
            |  (acc, p) -> named_struct(
            |    'l', (p.cents + acc.l + acc.b) div 2,
            |    'b', (((p.cents + acc.l + acc.b) div 2) - acc.l + acc.b)
            |      div 2))""".stripMargin).as("st"))
      .select(col("event_type"), col("n_days"), col("last_day_idx"),
        col("st.l").as("level_cents"), col("st.b").as("trend_cents"),
        (col("st.l") + lit(7L) * col("st.b")).as("forecast7_cents"))
      .orderBy("event_type")
  }

  val tsHoltSql: String =
    """WITH RECURSIVE daily AS (
      |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day_idx,
      |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT event_type, day_idx, cents,
      |    row_number() OVER (PARTITION BY event_type ORDER BY day_idx) AS rn
      |  FROM daily),
      |h AS (
      |  SELECT event_type, day_idx, rn, cents AS l, CAST(0 AS BIGINT) AS b
      |  FROM r WHERE rn = 1
      |  UNION ALL
      |  SELECT r.event_type, r.day_idx, r.rn,
      |    (r.cents + h.l + h.b) // 2,
      |    (((r.cents + h.l + h.b) // 2) - h.l + h.b) // 2
      |  FROM h JOIN r ON r.event_type = h.event_type AND r.rn = h.rn + 1)
      |SELECT event_type, CAST(rn AS BIGINT) AS n_days, day_idx AS last_day_idx,
      |  l AS level_cents, b AS trend_cents, l + 7 * b AS forecast7_cents
      |FROM h
      |QUALIFY rn = max(rn) OVER (PARTITION BY event_type)
      |ORDER BY event_type""".stripMargin

  // ----------------------------------------------------------------
  // Theil-Sen: robust trend slope from pairwise medians
  // ----------------------------------------------------------------

  /** Theil-Sen robust trend estimator (Theil 1950 / Sen 1968, public
    * formula) per event-type day series: the median of all pairwise
    * slopes — the outlier-resistant complement of the least-squares
    * `agg_regression`. Slopes stay INTEGER: each pair (i < j)
    * contributes `(c_j − c_i)·1e6 div (d_j − d_i)` (truncating, both
    * engines identical), and the median is the discrete type-1 pick
    * at rank ⌈n/2⌉ over (slope, d_i, d_j) — unique-keyed, no float
    * anywhere. The pair relation is day-grain² (≤ ~n_days²/2 per
    * series — calendar-bounded, ~435 rows per series here, NEVER
    * fact-grain); the fact table meets one map-side-combinable day
    * agg and all windows ride the bounded pair relation.
    */
  def tsTheilSen(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        expr("ts_ns div 86400000000000").as("day_i"))
      .agg((sum(dec(col("value"))) * 100).cast("long").as("day_c"))
    val a = daily.toDF("event_type", "di", "ci")
    val b = daily.toDF("event_type", "dj", "cj")
    val pairs = a.join(b, "event_type").filter(col("di") < col("dj"))
      .select(col("event_type"), col("di"), col("dj"),
        expr("(cj - ci) * 1000000 div (dj - di)").as("slope_q6"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("slope_q6"), col("di"), col("dj"))
    pairs
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n_pairs",
        count(lit(1)).over(Window.partitionBy("event_type")))
      .filter(col("rk") === expr("(n_pairs + 1) div 2"))
      .select(col("event_type"), col("n_pairs"),
        col("slope_q6").as("median_slope_q6"))
      .orderBy("event_type")
  }

  val tsTheilSenSql: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day_i,
      |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS day_c
      |  FROM events GROUP BY 1, 2),
      |pairs AS (
      |  SELECT a.event_type, a.day_i AS di, b.day_i AS dj,
      |    (b.day_c - a.day_c) * 1000000 // (b.day_i - a.day_i) AS slope_q6
      |  FROM daily a JOIN daily b
      |    ON a.event_type = b.event_type AND a.day_i < b.day_i),
      |r AS (
      |  SELECT event_type, slope_q6,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY slope_q6, di, dj) AS rk,
      |    count(*) OVER (PARTITION BY event_type) AS n_pairs
      |  FROM pairs)
      |SELECT event_type, CAST(n_pairs AS BIGINT) AS n_pairs,
      |  slope_q6 AS median_slope_q6
      |FROM r WHERE rk = (n_pairs + 1) // 2
      |ORDER BY event_type""".stripMargin

  // ----------------------------------------------------------------
  // Holt-Winters: triple exponential smoothing with weekly season
  // ----------------------------------------------------------------

  /** Holt-Winters additive triple exponential smoothing (Winters
    * 1960, public recurrence) per event-type day series — the
    * seasonal extension of [[tsHolt]]: beside level `l` and trend
    * `b`, a 7-slot day-of-week seasonal state `s` (indexed by
    * `day_idx mod 7`, so calendar gaps can't misalign the season the
    * way a positional m-lag would). α = β = γ = 1/2 keeps every
    * update a bare integer average — `div 2` truncating toward zero
    * identically in both engines, the [[tsHolt]] discipline — with
    * the day-0 point seeding the level and zero-seeding trend and
    * season (documented cold-start: the first season cycle absorbs
    * the seasonal signal). Same plan shape as tsHolt: one
    * map-side-combinable day agg, then the per-series fold runs
    * inside ONE codegen `aggregate` over the sorted calendar-scale
    * point array — no fact window, no driver loop; the oracle steps
    * the identical recurrence rn → rn+1 as a recursive CTE carrying
    * the seven seasonal columns.
    */
  def tsHoltWinters(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        expr("ts_ns div 86400000000000").as("day_idx"))
      .agg((sum(dec(col("value"))) * 100).cast("long").as("cents"))
    daily
      .groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day_idx"), col("cents"))))
        .as("pts"))
      .select(col("event_type"),
        size(col("pts")).cast("long").as("n_days"),
        element_at(col("pts"), -1).getField("day_idx").as("last_day_idx"),
        expr(
          """aggregate(
            |  slice(pts, 2, size(pts) - 1),
            |  named_struct('l', pts[0].cents, 'b', CAST(0 AS BIGINT),
            |    's', array_repeat(CAST(0 AS BIGINT), 7)),
            |  (acc, p) -> named_struct(
            |    'l', (p.cents - element_at(acc.s,
            |        CAST(pmod(p.day_idx, 7) AS INT) + 1) + acc.l + acc.b)
            |      div 2,
            |    'b', (((p.cents - element_at(acc.s,
            |        CAST(pmod(p.day_idx, 7) AS INT) + 1) + acc.l + acc.b)
            |      div 2) - acc.l + acc.b) div 2,
            |    's', transform(acc.s, (v, i) ->
            |      IF(i = CAST(pmod(p.day_idx, 7) AS INT),
            |        (p.cents - ((p.cents - v + acc.l + acc.b) div 2) + v)
            |          div 2,
            |        v))))""".stripMargin).as("st"))
      .select((Seq(col("event_type"), col("n_days"), col("last_day_idx"),
        col("st.l").as("level_cents"), col("st.b").as("trend_cents")) ++
        (0 to 6).map(i =>
          element_at(col("st.s"), i + 1).as(s"s$i")) :+
        expr("st.l + st.b + element_at(st.s, " +
          "CAST(pmod(last_day_idx + 1, 7) AS INT) + 1)")
          .as("forecast1_cents")): _*)
      .orderBy("event_type")
  }

  val tsHoltWintersSql: String = {
    val sCols = (0 to 6).map(i => s"s$i")
    // shared sub-expressions spelled inline (recursive CTEs cannot
    // bind laterals): s_dow picks the active slot, lnew the level
    val sDow = (0 to 6).map(i => s"WHEN ${i} THEN h.s$i")
      .mkString("CASE r.day_idx % 7 ", " ", " END")
    val lnew = s"(r.cents - ($sDow) + h.l + h.b) // 2"
    val sUpd = (0 to 6).map(i =>
      s"CASE WHEN r.day_idx % 7 = $i THEN (r.cents - ($lnew) + h.s$i) // 2 " +
        s"ELSE h.s$i END").mkString(",\n    ")
    s"""WITH RECURSIVE daily AS (
       |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day_idx,
       |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
       |  FROM events GROUP BY 1, 2),
       |r AS (
       |  SELECT event_type, day_idx, cents,
       |    row_number() OVER (PARTITION BY event_type ORDER BY day_idx) AS rn
       |  FROM daily),
       |h AS (
       |  SELECT event_type, day_idx, rn, cents AS l, CAST(0 AS BIGINT) AS b,
       |    ${sCols.map(c => s"CAST(0 AS BIGINT) AS $c").mkString(", ")}
       |  FROM r WHERE rn = 1
       |  UNION ALL
       |  SELECT r.event_type, r.day_idx, r.rn,
       |    $lnew,
       |    (($lnew) - h.l + h.b) // 2,
       |    $sUpd
       |  FROM h JOIN r ON r.event_type = h.event_type AND r.rn = h.rn + 1)
       |SELECT event_type, CAST(rn AS BIGINT) AS n_days,
       |  day_idx AS last_day_idx, l AS level_cents, b AS trend_cents,
       |  ${sCols.mkString(", ")},
       |  l + b + (CASE (day_idx + 1) % 7
       |    ${(0 to 6).map(i => s"WHEN $i THEN s$i").mkString(" ")} END)
       |    AS forecast1_cents
       |FROM h
       |QUALIFY rn = max(rn) OVER (PARTITION BY event_type)
       |ORDER BY event_type""".stripMargin
  }

  // ----------------------------------------------------------------
  // OHLC bar resample: the candlestick primitive
  // ----------------------------------------------------------------

  /** Daily OHLC bars per event-type series — the candlestick /
    * bar-resample primitive every metrics warehouse spells: per
    * (series, day), the first value (open), last value (close),
    * extremes (high/low) and tick count. Open/close are pinned on
    * the UNIQUE (ts_ns, event_id) tuple INSIDE a min/max(struct)
    * hash-agg key — one map-side-combinable aggregation, no window
    * over fact rows, no row_number, so the plan is a plain two-key
    * hash agg whatever the fact size. Cents discipline as ever.
    */
  def tsOhlc(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("ts_ns div 86400000000000").as("day_idx"),
        col("ts_ns"), col("event_id"),
        (dec(col("value")) * 100).cast("long").as("cents"))
    ev.groupBy(col("event_type"), col("day_idx"))
      .agg(
        count(lit(1)).as("n"),
        min(struct(col("ts_ns"), col("event_id"), col("cents"))).as("o"),
        max(struct(col("ts_ns"), col("event_id"), col("cents"))).as("c"),
        max(col("cents")).as("high_cents"),
        min(col("cents")).as("low_cents"))
      .select(col("event_type"), col("day_idx"), col("n"),
        col("o.cents").as("open_cents"), col("high_cents"),
        col("low_cents"), col("c.cents").as("close_cents"))
      .orderBy("event_type", "day_idx")
  }

  val tsOhlcSql: String =
    """WITH ev AS (
      |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day_idx,
      |    epoch_ns(ts) AS ts_ns, event_id,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events)
      |SELECT event_type, day_idx, CAST(count(*) AS BIGINT) AS n,
      |  (min({'t': ts_ns, 'e': event_id, 'c': cents})).c AS open_cents,
      |  max(cents) AS high_cents, min(cents) AS low_cents,
      |  (max({'t': ts_ns, 'e': event_id, 'c': cents})).c AS close_cents
      |FROM ev GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ----------------------------------------------------------------
  // Interval sweep: concurrency + overlap census without all pairs
  // ----------------------------------------------------------------

  /** Interval concurrency census by the classic ±1 SWEEP — the
    * scalable formulation of interval-overlap analytics: an explicit
    * overlap JOIN has quadratic OUTPUT (every pair), but peak
    * concurrency and the overlap-pair COUNT are computable from one
    * sorted pass over interval endpoints. Intervals are per-user
    * daily activity spans [first event, last event + 1ns); per day
    * the sweep orders endpoints (t, starts-before-ends, user) and
    * running-sums +1/−1: `peak = max running`, and `n_overlap_pairs
    * = Σ over starts (running − 1)` — each overlapping pair counted
    * exactly once, at the later start (tie pinned by user id).
    * Half-open semantics (r13): the end is exclusive (+1ns past the
    * last event) and at equal t the sweep orders ends BEFORE starts,
    * so adjacent spans share zero nanoseconds and do NOT count as
    * overlapping; zero-length spans stay non-empty ([t, t+1ns)).
    *
    * Scale shape: the fact table meets ONE hash agg (interval
    * build); the sweep window runs over INTERVAL endpoints (2 rows
    * per user-day), partitioned by day. A day partition is bounded
    * by the active-user count; beyond that the prefix sum
    * hierarchizes (per-bucket partials + a carry pass), same as any
    * distributed scan primitive.
    */
  def intervalSweep(spark: SparkSession, dir: String): DataFrame = {
    val iv = Tables.events(spark, dir)
      .groupBy(col("user_id"),
        expr("ts_ns div 86400000000000").as("day_idx"))
      .agg(min(col("ts_ns")).as("s"), (max(col("ts_ns")) + 1).as("e"))
    val pts = iv.select(col("day_idx"), col("s").as("t"),
        lit(1L).as("d"), lit(0).as("k"), col("user_id"))
      .unionAll(iv.select(col("day_idx"), col("e").as("t"),
        lit(-1L).as("d"), lit(1).as("k"), col("user_id")))
    // Half-open sweep: ends (k=1, exclusive bound) sort BEFORE starts
    // (k=0) at equal t, so an interval starting at exactly another's
    // e = max+1 — sharing zero nanoseconds — is NOT counted as
    // overlapping (ADVICE r12: the old start-first order inflated
    // peak_concurrency and n_overlap_pairs for 1ns-adjacent spans).
    val sweep = Window.partitionBy("day_idx")
      .orderBy(col("t"), col("k").desc, col("user_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts
      .withColumn("running", sum(col("d")).over(sweep))
      .groupBy(col("day_idx"))
      .agg(
        sum(when(col("k") === 0, 1L).otherwise(0L)).as("n_intervals"),
        max(col("running")).as("peak_concurrency"),
        sum(when(col("k") === 0, col("running") - 1).otherwise(0L))
          .as("n_overlap_pairs"))
      .orderBy("day_idx")
  }

  val intervalSweepSql: String =
    """WITH iv AS (
      |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day_idx,
      |    min(epoch_ns(ts)) AS s, max(epoch_ns(ts)) + 1 AS e
      |  FROM events GROUP BY 1, 2),
      |pts AS (
      |  SELECT day_idx, s AS t, 1 AS d, 0 AS k, user_id FROM iv
      |  UNION ALL
      |  SELECT day_idx, e AS t, -1 AS d, 1 AS k, user_id FROM iv),
      |sw AS (
      |  SELECT day_idx, k,
      |    sum(d) OVER (PARTITION BY day_idx ORDER BY t, k DESC, user_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
      |  FROM pts)
      |SELECT day_idx,
      |  CAST(sum(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_intervals,
      |  CAST(max(running) AS BIGINT) AS peak_concurrency,
      |  CAST(sum(CASE WHEN k = 0 THEN running - 1 ELSE 0 END) AS BIGINT)
      |    AS n_overlap_pairs
      |FROM sw GROUP BY 1 ORDER BY 1""".stripMargin

  // ----------------------------------------------------------------
  // MAD outliers: the robust twin of the z² detector
  // ----------------------------------------------------------------

  /** Robust outlier days per event-type series via the median
    * absolute deviation (Hampel's rule, public statistics): flag
    * days where `|x − median| > 3 · MAD`. Unlike the z² detector
    * (`event_anomaly`), one extreme day cannot mask others by
    * inflating the variance — the breakdown point is 50%. Both
    * medians are DISCRETE picks (the lower median: the element at
    * row (m+1) div 2 under a (value, day) total order), never an
    * interpolated float, so the whole decision is BIGINT-exact and
    * replays in DuckDB via the identical row_number selection.
    *
    * 100 TB shape: one fact-scale hash agg to (type, day); the
    * median/MAD machinery is windows over the DAY-GRAIN relation
    * (calendar-bounded, cf. [[tsGapfill]]).
    */
  def tsMad(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        expr("ts_ns div 86400000000000").as("day_idx"))
      .agg((sum(dec(col("value"))) * 100).cast("long").as("cents"))
    def lowerMedian(df: DataFrame, value: String, out: String): DataFrame = {
      val byVal = Window.partitionBy("event_type")
        .orderBy(col(value), col("day_idx"))
      val all = Window.partitionBy("event_type")
      df.withColumn("rn", row_number().over(byVal))
        .withColumn("m", count(lit(1)).over(all))
        .withColumn(out,
          max(when(col("rn") === expr("(m + 1) div 2"), col(value)))
            .over(all))
        .drop("rn", "m")
    }
    val withMed = lowerMedian(daily, "cents", "med")
      .withColumn("dev", abs(col("cents") - col("med")))
    lowerMedian(withMed, "dev", "mad")
      .filter(col("dev") > lit(3L) * col("mad"))
      .select(col("event_type"), col("day_idx"), col("cents"), col("med"),
        col("mad"), col("dev"))
      .orderBy("event_type", "day_idx")
  }

  val tsMadSql: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day_idx,
      |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |m1 AS (
      |  SELECT event_type, day_idx, cents,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY cents, day_idx) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS m
      |  FROM daily),
      |m2 AS (
      |  SELECT event_type, day_idx, cents,
      |    max(CASE WHEN rn = (m + 1) // 2 THEN cents END)
      |      OVER (PARTITION BY event_type) AS med
      |  FROM m1),
      |d1 AS (
      |  SELECT event_type, day_idx, cents, med,
      |    abs(cents - med) AS dev,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY abs(cents - med), day_idx) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS m
      |  FROM m2),
      |d2 AS (
      |  SELECT event_type, day_idx, cents, med, dev,
      |    max(CASE WHEN rn = (m + 1) // 2 THEN dev END)
      |      OVER (PARTITION BY event_type) AS mad
      |  FROM d1)
      |SELECT event_type, day_idx, cents, med,
      |  CAST(mad AS BIGINT) AS mad, dev
      |FROM d2 WHERE dev > 3 * mad
      |ORDER BY event_type, day_idx""".stripMargin

  // ----------------------------------------------------------------
  // Autocorrelation: lag profile per series
  // ----------------------------------------------------------------

  /** Autocorrelation lags audited. */
  private val AcfMaxLag = 7

  /** Autocorrelation function at lags 1..[[AcfMaxLag]] per event-type
    * daily series (the standard sample ACF, public formula) in
    * INTEGER form: deviations are taken from the FLOOR mean —
    * `d = x − (S div n)` over floor-DOLLAR daily values — so
    * `r_k = Σᵢ dᵢ·dᵢ₊ₖ · 1e6 div Σᵢ dᵢ²` is all-BIGINT with ~7
    * orders of headroom at the factor-100 audit scale (the n-scaled
    * form `n·x − S` overflowed the final ppm multiply there — caught
    * by the sf1 gate). The ≤ 1-dollar centering bias of the floor
    * mean is deterministic and identical in both engines; documented
    * deviation from the real-mean ACF, same spirit as the floor-cent
    * EWMA. The lag join is a self-equi-join of the day-grain
    * relation on (type, day+k) — calendar-bounded, like every series
    * op here.
    */
  def tsAcf(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        expr("ts_ns div 86400000000000").as("day_idx"))
      .agg(expr("CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)" +
        " div 100").as("dollars"))
    val w = Window.partitionBy("event_type")
    val dev = daily
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("dollars")).over(w))
      .withColumn("d", col("dollars") - expr("s div n"))
    val denom = dev.groupBy(col("event_type"))
      .agg(sum(col("d") * col("d")).as("den"))
    val lags = spark.range(1, AcfMaxLag + 1).toDF("lag")
    val a = dev.select(col("event_type"), col("day_idx"), col("d"))
      .crossJoin(broadcast(lags))
      .select(col("event_type"), col("lag"),
        (col("day_idx") + col("lag")).as("day2"), col("d"))
    val b = dev.select(col("event_type"), col("day_idx").as("day2"),
      col("d").as("d2"))
    a.join(b, Seq("event_type", "day2"))
      .groupBy(col("event_type"), col("lag"))
      .agg(sum(col("d") * col("d2")).as("num"), count(lit(1)).as("n_pairs"))
      .join(broadcast(denom), "event_type")
      .select(col("event_type"), col("lag"), col("n_pairs"),
        expr("num * 1000000 div den").as("acf_ppm"))
      .orderBy("event_type", "lag")
  }

  val tsAcfSql: String =
    s"""WITH daily AS (
       |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day_idx,
       |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) // 100
       |      AS dollars
       |  FROM events GROUP BY 1, 2),
       |dev AS (
       |  SELECT event_type, day_idx,
       |    dollars - (sum(dollars) OVER (PARTITION BY event_type))
       |      // (count(*) OVER (PARTITION BY event_type)) AS d
       |  FROM daily),
       |den AS (
       |  SELECT event_type, sum(d * d) AS den FROM dev GROUP BY 1),
       |pairs AS (
       |  SELECT a.event_type, l.lag, a.d AS d, b.d AS d2
       |  FROM dev a
       |  CROSS JOIN (SELECT unnest(generate_series(1, $AcfMaxLag)) AS lag) l
       |  JOIN dev b ON b.event_type = a.event_type
       |    AND b.day_idx = a.day_idx + l.lag)
       |SELECT event_type, CAST(lag AS BIGINT) AS lag,
       |  CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(sum(d * d2) * 1000000 // max(den) AS BIGINT) AS acf_ppm
       |FROM pairs JOIN den USING (event_type)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ----------------------------------------------------------------
  // Cross-correlation: who leads whom?
  // ----------------------------------------------------------------

  /** Cross-correlation between every PAIR of event-type daily series
    * at lags −[[AcfMaxLag]]..[[AcfMaxLag]] — the lead/lag detector
    * ("do purchases follow clicks by k days?"), the two-series
    * extension of [[tsAcf]] on the same integer rails: floor-mean
    * deviations over floor-dollars, `ccf_k(a,b) = Σ dᵃᵢ·dᵇᵢ₊ₖ · 1e6
    * div (den_a + den_b) div 2`-style normalization avoided — the
    * standard denominator is √(den_a·den_b), a sqrt of integers; to
    * stay integer-exact the output is the RAW lagged covariance in
    * ppm of the geometric-mean-free bound `max(den_a, den_b)`, a
    * deterministic normalizer both engines compute identically (the
    * ranking and argmax-lag structure are what the diagnostic reads;
    * the absolute scale is documented). Per ordered pair: the lag
    * maximizing |ccf| and its value.
    *
    * Scale shape: day-grain self-join on (day+lag) like tsAcf; pair
    * count is #types², a catalog statistic, not data scale.
    */
  def tsCrosscorr(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        expr("ts_ns div 86400000000000").as("day_idx"))
      .agg(expr("CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)" +
        " div 100").as("dollars"))
    val w = Window.partitionBy("event_type")
    val dev = daily
      .withColumn("s", sum(col("dollars")).over(w))
      .withColumn("n", count(lit(1)).over(w))
      .select(col("event_type"), col("day_idx"),
        (col("dollars") - expr("s div n")).as("d"))
    val den = dev.groupBy(col("event_type"))
      .agg(sum(col("d") * col("d")).as("den"))
    val lags = spark.range(-AcfMaxLag, AcfMaxLag + 1).toDF("lag")
    val a = dev.select(col("event_type").as("type_a"), col("day_idx"),
        col("d").as("da"))
      .crossJoin(broadcast(lags))
      .select(col("type_a"), col("lag"),
        (col("day_idx") + col("lag")).as("day2"), col("da"))
    val b = dev.select(col("event_type").as("type_b"),
      col("day_idx").as("day2"), col("d").as("db"))
    val num = a.join(b, Seq("day2"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"), col("lag"))
      .agg(sum(col("da") * col("db")).as("num"))
    val best = num
      .join(broadcast(den.select(col("event_type").as("type_a"),
        col("den").as("den_a"))), "type_a")
      .join(broadcast(den.select(col("event_type").as("type_b"),
        col("den").as("den_b"))), "type_b")
      .withColumn("ccf_ppm",
        expr("num * 1000000 div greatest(den_a, den_b)"))
    best
      .groupBy(col("type_a"), col("type_b"))
      .agg(max(struct(abs(col("ccf_ppm")).as("a"),
        (-col("lag")).as("nl"), col("lag"), col("ccf_ppm"))).as("top"))
      .select(col("type_a"), col("type_b"),
        col("top.lag").as("best_lag"), col("top.ccf_ppm").as("ccf_ppm"))
      .orderBy("type_a", "type_b")
  }

  val tsCrosscorrSql: String =
    s"""WITH daily AS (
       |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day_idx,
       |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) // 100
       |      AS dollars
       |  FROM events GROUP BY 1, 2),
       |dev AS (
       |  SELECT event_type, day_idx,
       |    dollars - (sum(dollars) OVER (PARTITION BY event_type))
       |      // (count(*) OVER (PARTITION BY event_type)) AS d
       |  FROM daily),
       |den AS (SELECT event_type, sum(d * d) AS den FROM dev GROUP BY 1),
       |num AS (
       |  SELECT a.event_type AS type_a, b.event_type AS type_b, l.lag,
       |    sum(a.d * b.d) AS num
       |  FROM dev a
       |  CROSS JOIN (SELECT unnest(generate_series(-$AcfMaxLag,
       |    $AcfMaxLag)) AS lag) l
       |  JOIN dev b ON b.day_idx = a.day_idx + l.lag
       |    AND a.event_type < b.event_type
       |  GROUP BY 1, 2, 3),
       |cc AS (
       |  SELECT type_a, type_b, lag,
       |    num * 1000000 // greatest(da.den, db.den) AS ccf_ppm
       |  FROM num
       |  JOIN den da ON da.event_type = type_a
       |  JOIN den db ON db.event_type = type_b)
       |SELECT type_a, type_b, CAST(lag AS BIGINT) AS best_lag,
       |  CAST(ccf_ppm AS BIGINT) AS ccf_ppm
       |FROM cc
       |QUALIFY row_number() OVER (PARTITION BY type_a, type_b
       |  ORDER BY abs(ccf_ppm) DESC, lag ASC) = 1
       |ORDER BY type_a, type_b""".stripMargin

  // ----------------------------------------------------------------
  // Seasonal index: day-of-week profile per series
  // ----------------------------------------------------------------

  /** Day-of-week seasonal index per event-type series — the
    * ratio-to-mean seasonal profile (the classical decomposition's
    * seasonal factor at weekly period): `index = mean(day revenue |
    * dow) / mean(day revenue)`, in integer milli-units computed as
    * ONE division of cross-multiplied BIGINTs, `cents_dow ·
    * days_total · 1000 div (days_dow · cents_total)` — no float mean
    * ever materializes. dow 0 = Monday via the portable epoch-day
    * formula `(day_idx + 3) % 7` (day 0 = 1970-01-01, a Thursday),
    * identical arithmetic in both engines.
    *
    * Scale shape: one hash agg to (type, day) — the only fact-scale
    * pass — then a 7-row-per-type relation whose type totals are
    * window sums over THAT bounded relation (a day has one dow, so
    * Σ_dow days = distinct days and Σ_dow cents = total: the window
    * needs no second corpus scan).
    */
  def tsSeasonal(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        expr("ts_ns div 86400000000000").as("day_idx"))
      .agg((sum(dec(col("value"))) * 100).cast("long").as("cents"))
    daily
      .groupBy(col("event_type"), expr("(day_idx + 3) % 7").as("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("cents")).as("cents"))
      .select(col("event_type"), col("dow"), col("n_days"), col("cents"),
        expr("""cents * (sum(n_days) OVER (PARTITION BY event_type)) * 1000
          div (n_days * (sum(cents) OVER (PARTITION BY event_type)))""")
          .as("index_milli"))
      .orderBy("event_type", "dow")
  }

  val tsSeasonalSql: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day_idx,
      |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |dw AS (
      |  SELECT event_type, (day_idx + 3) % 7 AS dow,
      |    count(*) AS n_days, sum(cents) AS cents
      |  FROM daily GROUP BY 1, 2)
      |SELECT event_type, dow, CAST(n_days AS BIGINT) AS n_days,
      |  CAST(cents AS BIGINT) AS cents,
      |  CAST(cents * (sum(n_days) OVER (PARTITION BY event_type)) * 1000
      |    // (n_days * (sum(cents) OVER (PARTITION BY event_type)))
      |    AS BIGINT) AS index_milli
      |FROM dw ORDER BY 1, 2""".stripMargin

  // ----------------------------------------------------------------
  // RSI: bounded-momentum oscillator over daily revenue
  // ----------------------------------------------------------------

  /** Lookback window (observed days) for [[tsRsi]] — Wilder's
    * canonical 14. */
  private val RsiDays = 14

  /** Cutler's RSI (the SMA variant of Wilder 1978's relative strength
    * index — public formula; Cutler's is chosen over Wilder's
    * recursive smoothing because the SMA form is integer-exact and
    * windowed, where the 1/14-weighted recursion is float-only) per
    * event-type series over daily revenue cents:
    * {{{ gain_t = max(0, Δ_t), loss_t = max(0, −Δ_t)
    *     RSI_t  = 10⁶ · Σ₁₄gain ÷ (Σ₁₄gain + Σ₁₄loss)   (ppm) }}}
    * Deltas are vs the previous OBSERVED day (gaps documented:
    * `ts_gapfill` is the resample primitive for calendar-strict
    * feeds). The all-flat window (Σgain+Σloss = 0) pins RSI to the
    * neutral 500000 rather than dividing by zero.
    *
    * Scale shape: ONE map-side-combinable hash agg touches fact-scale
    * rows; the lag and the two rolling sums ride a single
    * day-grain exchange per event type (calendar-bounded relation).
    * Integer rails throughout — BIGINT cents, ppm floor division —
    * so DuckDB replays bit-exact.
    */
  def tsRsi(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        expr("ts_ns div 86400000000000").as("day_idx"))
      .agg((sum(dec(col("value"))) * 100).cast("long").as("cents"))
    val byDay = Window.partitionBy("event_type").orderBy("day_idx")
    val roll = byDay.rowsBetween(-(RsiDays - 1), 0)
    daily
      .withColumn("delta", col("cents") - lag(col("cents"), 1).over(byDay))
      .withColumn("gain", greatest(col("delta"), lit(0L)))
      .withColumn("loss", greatest(-col("delta"), lit(0L)))
      .withColumn("rn", row_number().over(byDay))
      .withColumn("gain14", sum(col("gain")).over(roll))
      .withColumn("loss14", sum(col("loss")).over(roll))
      // rows 1..RsiDays lack a full lookback (row 1 has no delta at
      // all) — emit only fully-windowed rows, the convention every
      // charting stack uses
      .filter(col("rn") > RsiDays)
      .select(col("event_type"), col("day_idx"), col("cents"),
        col("gain14"), col("loss14"),
        when(col("gain14") + col("loss14") === 0L, lit(500000L))
          .otherwise(expr("gain14 * 1000000L div (gain14 + loss14)"))
          .as("rsi_ppm"))
      .orderBy("event_type", "day_idx")
  }

  val tsRsiSql: String =
    s"""WITH daily AS (
       |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day_idx,
       |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
       |  FROM events GROUP BY 1, 2),
       |d AS (
       |  SELECT event_type, day_idx, cents,
       |    cents - lag(cents) OVER w AS delta,
       |    row_number() OVER w AS rn
       |  FROM daily
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day_idx)),
       |g AS (
       |  SELECT event_type, day_idx, cents, rn,
       |    sum(greatest(delta, 0)) OVER r AS gain14,
       |    sum(greatest(-delta, 0)) OVER r AS loss14
       |  FROM d
       |  WINDOW r AS (PARTITION BY event_type ORDER BY day_idx
       |    ROWS BETWEEN ${RsiDays - 1} PRECEDING AND CURRENT ROW))
       |SELECT event_type, day_idx, cents,
       |  CAST(gain14 AS BIGINT) AS gain14, CAST(loss14 AS BIGINT) AS loss14,
       |  CAST(CASE WHEN gain14 + loss14 = 0 THEN 500000
       |    ELSE gain14 * 1000000 // (gain14 + loss14) END AS BIGINT) AS rsi_ppm
       |FROM g WHERE rn > $RsiDays
       |ORDER BY event_type, day_idx""".stripMargin

  // ----------------------------------------------------------------
  // Interval gaps: the complement of interval_merge
  // ----------------------------------------------------------------

  /** Idle-gap analysis per user: the silent spans BETWEEN a user's
    * daily activity intervals (the complement of `interval_merge`'s
    * coverage view — capacity planning asks "how busy", retention
    * asks "how long silent"). One row per user with ≥ 2 active days:
    * gap count, total/max idle nanoseconds between consecutive
    * day-intervals, and the longest-gap start day.
    *
    * Scale shape: one map-side hash agg to day-interval grain, one
    * lag window per user over bounded calendar rows, one final agg.
    * Ties: the longest-gap pick is pinned via max(struct(gap, -day))
    * — equal gaps choose the EARLIEST end day; the oracle replays it
    * as a row_number pick over (gap DESC, day ASC). Both are total
    * orders over the same keys, so the result is identical.
    */
  def intervalGaps(spark: SparkSession, dir: String): DataFrame = {
    val iv = Tables.events(spark, dir)
      .groupBy(col("user_id"),
        expr("ts_ns div 86400000000000").as("day_idx"))
      .agg(min(col("ts_ns")).as("s"), (max(col("ts_ns")) + 1).as("e"))
    val byDay = Window.partitionBy("user_id").orderBy("day_idx")
    iv
      .withColumn("prev_e", lag(col("e"), 1).over(byDay))
      .filter(col("prev_e").isNotNull)
      .withColumn("gap_ns", col("s") - col("prev_e"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_gaps"),
        sum(col("gap_ns")).as("idle_ns"),
        max(col("gap_ns")).as("max_gap_ns"),
        (-max(struct(col("gap_ns"), (-col("day_idx")).as("nd")))
          .getField("nd")).as("max_gap_end_day"))
      .orderBy("user_id")
  }

  val intervalGapsSql: String =
    """WITH iv AS (
      |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day_idx,
      |    min(epoch_ns(ts)) AS s, max(epoch_ns(ts)) + 1 AS e
      |  FROM events GROUP BY 1, 2),
      |g AS (
      |  SELECT user_id, day_idx, s - lag(e) OVER w AS gap_ns
      |  FROM iv
      |  WINDOW w AS (PARTITION BY user_id ORDER BY day_idx)),
      |gg AS (SELECT * FROM g WHERE gap_ns IS NOT NULL),
      |pick AS (
      |  SELECT user_id, day_idx AS max_gap_end_day FROM (
      |    SELECT user_id, day_idx,
      |      row_number() OVER (PARTITION BY user_id
      |        ORDER BY gap_ns DESC, day_idx ASC) AS rn
      |    FROM gg) WHERE rn = 1)
      |SELECT a.user_id, a.n_gaps, a.idle_ns, a.max_gap_ns,
      |  p.max_gap_end_day
      |FROM (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
      |    CAST(sum(gap_ns) AS BIGINT) AS idle_ns,
      |    CAST(max(gap_ns) AS BIGINT) AS max_gap_ns
      |  FROM gg GROUP BY user_id) a
      |JOIN pick p USING (user_id)
      |ORDER BY user_id""".stripMargin

  // ----------------------------------------------------------------
  // Maximum drawdown (round 14, batch 2)
  // ----------------------------------------------------------------

  /** Maximum drawdown of the cumulative daily-revenue series per
    * event type — the running-peak-to-trough statistic (standard
    * finance definition, here over operational revenue): with
    * C(d) = Σ_{d'≤d} revenue and P(d) = max_{d'≤d} C(d'), the
    * drawdown at d is P(d) − C(d); released are the peak cumulative
    * value, the maximum drawdown, and the trough day (earliest day on
    * ties), all BIGINT cents / day indexes.
    *
    * Scale shape: events meet ONE hash agg to (type, day) cells; the
    * cumulative sum, running max, and argmax-by-(drawdown desc, day
    * asc) run as windows over day-grain rows only.
    */
  def tsDrawdown(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("ts_ns div 86400000000000").as("day_i"),
        (dec(col("value")) * 100).cast("long").as("vc"))
      .groupBy(col("event_type"), col("day_i"))
      .agg(sum(col("vc")).as("day_c"))
    val walk = Window.partitionBy("event_type").orderBy("day_i")
      .rowsBetween(Window.unboundedPreceding, 0)
    val dd = daily
      .withColumn("cum", sum(col("day_c")).over(walk))
      .withColumn("peak", max(col("cum")).over(walk))
      .withColumn("dd", col("peak") - col("cum"))
    val pick = Window.partitionBy("event_type")
      .orderBy(col("dd").desc, col("day_i").asc)
    dd.withColumn("rn", row_number().over(pick))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_days"),
        max(col("peak")).as("peak_cum_c"),
        max(col("dd")).as("max_drawdown_c"),
        min(when(col("rn") === 1, col("day_i"))).as("trough_day"))
      .orderBy("event_type")
  }

  val tsDrawdownSql: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day_i,
      |    CAST(sum(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS day_c
      |  FROM events GROUP BY 1, 2),
      |cums AS (
      |  SELECT event_type, day_i,
      |    sum(day_c) OVER (PARTITION BY event_type ORDER BY day_i
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM daily),
      |walked AS (
      |  SELECT event_type, day_i, cum,
      |    max(cum) OVER (PARTITION BY event_type ORDER BY day_i
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      |  FROM cums),
      |dd AS (
      |  SELECT event_type, day_i, cum, peak, peak - cum AS dd,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY peak - cum DESC, day_i ASC) AS rn
      |  FROM walked)
      |SELECT event_type, count(*) AS n_days,
      |  CAST(max(peak) AS BIGINT) AS peak_cum_c,
      |  CAST(max(dd) AS BIGINT) AS max_drawdown_c,
      |  CAST(min(CASE WHEN rn = 1 THEN day_i END) AS BIGINT) AS trough_day
      |FROM dd GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ----------------------------------------------------------------
  // Winsorized daily means (round 14)
  // ----------------------------------------------------------------

  /** Winsorized daily-revenue mean per event type (Tukey/Dixon's
    * winsorization, the robust-mean preprocessing step reporting
    * stacks run before trend fits): per type the daily cents series
    * is clamped to its own DISCRETE p05/p95 picks — the element at
    * rank ⌈0.05·n⌉ / ⌈0.95·n⌉ under the cents order (SQL type-1
    * quantile, the `dq_iqr`/`ts_mad` convention — no interpolation
    * float) — and both the raw and winsorized means are released as
    * BIGINT floor divisions.
    *
    * Scale shape: events meet ONE map-side-combinable hash agg to
    * (type, day) cells; the cumulative rank walk and the clamped
    * rollup are windows/aggs over day-grain rows only (≤ types ×
    * days). No fact-scale sort.
    */
  def tsWinsorize(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("ts_ns div 86400000000000").as("day_i"),
        (dec(col("value")) * 100).cast("long").as("vc"))
      .groupBy(col("event_type"), col("day_i"))
      .agg(sum(col("vc")).as("day_c"))
      .localCheckpoint(true) // two consumers: rank walk + clamped rollup
    val walk = Window.partitionBy("event_type").orderBy("day_c", "day_i")
    val all = Window.partitionBy("event_type")
    val picks = daily
      .withColumn("rk", row_number().over(walk).cast("long"))
      .withColumn("n", count(lit(1)).over(all))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n_days"),
        min(when(col("rk") >= expr("(n * 5 + 99) div 100"), col("day_c")))
          .as("p05_c"),
        min(when(col("rk") >= expr("(n * 95 + 99) div 100"), col("day_c")))
          .as("p95_c"))
    daily.join(broadcast(picks), "event_type")
      .groupBy(col("event_type"))
      .agg(max(col("n_days")).as("n_days"),
        max(col("p05_c")).as("p05_c"), max(col("p95_c")).as("p95_c"),
        sum(col("day_c")).as("sum_c"),
        sum(greatest(least(col("day_c"), col("p95_c")), col("p05_c")))
          .as("wsum_c"))
      .select(col("event_type"), col("n_days"), col("p05_c"), col("p95_c"),
        expr("sum_c div n_days").as("mean_c"),
        expr("wsum_c div n_days").as("wmean_c"))
      .orderBy("event_type")
  }

  val tsWinsorizeSql: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day_i,
      |    CAST(sum(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS day_c
      |  FROM events GROUP BY 1, 2),
      |ranked AS (
      |  SELECT event_type, day_c,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY day_c, day_i) AS rk,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM daily),
      |picks AS (
      |  SELECT event_type, max(n) AS n_days,
      |    min(CASE WHEN rk >= (n * 5 + 99) // 100 THEN day_c END) AS p05_c,
      |    min(CASE WHEN rk >= (n * 95 + 99) // 100 THEN day_c END) AS p95_c
      |  FROM ranked GROUP BY 1)
      |SELECT d.event_type, CAST(max(n_days) AS BIGINT) AS n_days,
      |  CAST(max(p05_c) AS BIGINT) AS p05_c,
      |  CAST(max(p95_c) AS BIGINT) AS p95_c,
      |  CAST(sum(day_c) // max(n_days) AS BIGINT) AS mean_c,
      |  CAST(sum(greatest(least(day_c, p95_c), p05_c)) // max(n_days)
      |    AS BIGINT) AS wmean_c
      |FROM daily d JOIN picks USING (event_type)
      |GROUP BY d.event_type
      |ORDER BY d.event_type""".stripMargin

  // ----------------------------------------------------------------
  // Allen interval-algebra census
  // ----------------------------------------------------------------

  /** Allen interval-relation census (Allen, CACM 1983 — the 13-relation
    * temporal algebra) over the same per-user activity spans as
    * [[intervalMerge]]: every lexicographically-ordered pair of a
    * user's intervals classified into the 7 canonical relations
    * (precedes / meets / overlaps / finished_by / contains / starts /
    * equals — the other 6 are their inverses and the lex order
    * (s, e, id) makes them unreachable), summed corpus-wide against a
    * STATIC 7-row relation grid so the zero counts are visible,
    * asserted values, not missing rows. µs-grain boundaries make the
    * equality relations exact zeros in this corpus — the census
    * proves that, it doesn't hide it.
    *
    * Scale shape: one self-equi-join on user_id — quadratic per user
    * but events-per-user is corpus-invariant (the graph-edge
    * argument), so pair count grows linearly with users; the census
    * is a 7-cell map-side-combinable aggregate.
    */
  def intervalAllen(spark: SparkSession, dir: String): DataFrame = {
    val spans = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        expr("ts_ns div 1000").as("s"),
        (expr("ts_ns div 1000") +
          floor(col("value") * 60000000L).cast("long")).as("e"))
    val a = spans.toDF("user_id", "aid", "as_", "ae")
    val b = spans.toDF("user_id", "bid", "bs", "be")
    val pairs = a.join(b, "user_id")
      .filter(struct(col("as_"), col("ae"), col("aid")) <
        struct(col("bs"), col("be"), col("bid")))
    val rels = Seq("precedes", "meets", "equals", "starts",
      "finished_by", "contains", "overlaps")
    val classified = pairs.select(
      when(col("ae") < col("bs"), "precedes")
        .when(col("ae") === col("bs"), "meets")
        .when(col("as_") === col("bs") && col("ae") === col("be"), "equals")
        .when(col("as_") === col("bs") && col("ae") < col("be"), "starts")
        .when(col("as_") < col("bs") && col("ae") === col("be"), "finished_by")
        .when(col("as_") < col("bs") && col("be") < col("ae"), "contains")
        .otherwise("overlaps").as("rel"))
      .groupBy("rel").agg(count(lit(1)).as("n_pairs"))
    import spark.implicits._
    rels.toDF("rel").join(classified, Seq("rel"), "left")
      .select(col("rel"), coalesce(col("n_pairs"), lit(0L)).as("n_pairs"))
      .orderBy("rel")
  }

  val intervalAllenSql: String =
    """WITH spans AS (
      |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS s,
      |    epoch_ns(ts) // 1000
      |      + CAST(floor(value * 60000000) AS BIGINT) AS e
      |  FROM events),
      |pairs AS (
      |  SELECT a.s AS as_, a.e AS ae, b.s AS bs, b.e AS be
      |  FROM spans a JOIN spans b ON a.user_id = b.user_id
      |  WHERE (a.s, a.e, a.event_id) < (b.s, b.e, b.event_id)),
      |cls AS (
      |  SELECT CASE
      |    WHEN ae < bs THEN 'precedes'
      |    WHEN ae = bs THEN 'meets'
      |    WHEN as_ = bs AND ae = be THEN 'equals'
      |    WHEN as_ = bs AND ae < be THEN 'starts'
      |    WHEN as_ < bs AND ae = be THEN 'finished_by'
      |    WHEN as_ < bs AND be < ae THEN 'contains'
      |    ELSE 'overlaps' END AS rel, count(*) AS n_pairs
      |  FROM pairs GROUP BY 1),
      |grid AS (
      |  SELECT unnest(['precedes', 'meets', 'equals', 'starts',
      |    'finished_by', 'contains', 'overlaps']) AS rel)
      |SELECT grid.rel, CAST(coalesce(n_pairs, 0) AS BIGINT) AS n_pairs
      |FROM grid LEFT JOIN cls ON cls.rel = grid.rel
      |ORDER BY grid.rel""".stripMargin

  // ----------------------------------------------------------------
  // Bollinger bands: trailing mean ± 2σ envelope per day series
  // ----------------------------------------------------------------

  private val BollWindow = 7

  /** Bollinger bands (Bollinger 1980s, public formula) per event-type
    * day series: trailing [[BollWindow]]-day mean ± 2σ envelope with
    * a breach flag. The moments are EXACT until the final release —
    * window sums of cents (LONG) and of squared cents lifted to
    * DECIMAL(38,0) (`c² ≤ 4·10¹⁸` already brushes LONG at the f1000
    * audit scale; HUGEINT on the oracle side) — then
    * `σ = √(n·Σx² − (Σx)²)/n` is one correctly-rounded DECIMAL→DOUBLE
    * conversion, one IEEE sqrt, one IEEE divide, released at 6 dp
    * (the agg_moments convention). The breach compares exact cents
    * against the ROUNDED bands so both engines compare identical
    * values. The window is partitioned per series over the DAY-grain
    * relation — calendar-bounded rows, never fact-scale (the
    * sanctioned TimeSeries frame shape).
    */
  def tsBollinger(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        expr("ts_ns div 86400000000000").as("day_i"))
      .agg((sum(dec(col("value"))) * 100).cast("long").as("day_c"))
    val w = Window.partitionBy("event_type").orderBy("day_i")
      .rowsBetween(-(BollWindow - 1), 0)
    daily
      .withColumn("n_w", count(lit(1)).over(w))
      .withColumn("sum_c", sum(col("day_c")).over(w))
      .withColumn("sumsq",
        sum(col("day_c").cast(DecimalType(38, 0)) * col("day_c")).over(w))
      .withColumn("mean_c",
        round(col("sum_c").cast("double") / col("n_w"), 6))
      .withColumn("sd_c",
        round(sqrt((col("n_w") * col("sumsq")
          - col("sum_c").cast(DecimalType(38, 0)) * col("sum_c"))
          .cast("double")) / col("n_w"), 6))
      .withColumn("upper_c", round(col("mean_c") + col("sd_c") * 2, 6))
      .withColumn("lower_c", round(col("mean_c") - col("sd_c") * 2, 6))
      .withColumn("breach",
        when(col("day_c") > col("upper_c"), 1L)
          .when(col("day_c") < col("lower_c"), -1L).otherwise(0L))
      .select(col("event_type"), col("day_i"), col("day_c"), col("n_w"),
        col("mean_c"), col("sd_c"), col("upper_c"), col("lower_c"),
        col("breach"))
      .orderBy("event_type", "day_i")
  }

  val tsBollingerSql: String =
    s"""WITH daily AS (
       |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day_i,
       |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS day_c
       |  FROM events GROUP BY 1, 2),
       |win AS (
       |  SELECT event_type, day_i, day_c,
       |    count(*) OVER w AS n_w,
       |    sum(day_c) OVER w AS sum_c,
       |    sum(CAST(day_c AS HUGEINT) * day_c) OVER w AS sumsq
       |  FROM daily
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day_i
       |               ROWS BETWEEN ${BollWindow - 1} PRECEDING
       |               AND CURRENT ROW)),
       |bands AS (
       |  SELECT event_type, day_i, day_c, CAST(n_w AS BIGINT) AS n_w,
       |    round(CAST(sum_c AS DOUBLE) / n_w, 6) AS mean_c,
       |    round(sqrt(CAST(n_w * sumsq - CAST(sum_c AS HUGEINT) * sum_c
       |          AS DOUBLE)) / n_w, 6) AS sd_c
       |  FROM win)
       |SELECT event_type, day_i, day_c, n_w, mean_c, sd_c,
       |  round(mean_c + 2 * sd_c, 6) AS upper_c,
       |  round(mean_c - 2 * sd_c, 6) AS lower_c,
       |  CAST(CASE WHEN day_c > round(mean_c + 2 * sd_c, 6) THEN 1
       |       WHEN day_c < round(mean_c - 2 * sd_c, 6) THEN -1
       |       ELSE 0 END AS BIGINT) AS breach
       |FROM bands
       |ORDER BY event_type, day_i""".stripMargin
}
