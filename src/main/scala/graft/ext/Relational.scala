package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Extension operator surface: the relational categories the reference
  * lacks (SURVEY.md §2.5-§2.8 "absent" rows), built purely from Spark
  * built-ins over the TPC-H-ish testdata, each with a DuckDB oracle.
  *
  * Determinism discipline (driver hash-compares values):
  *   - money arithmetic in DECIMAL(18,2) (exact, order-independent
  *     sums), surfaced as DOUBLE via a final cast both sides;
  *   - `l_quantity` is integral-valued double -> plain sum is exact;
  *   - every result fully ordered; ints surfaced as BIGINT.
  *
  * Scale notes are on each operator: broadcast the dimension tables
  * (nation/region/customer at TPC-H proportions), shuffle-hash/sort-
  * merge the fact-fact joins, let AQE handle skew.
  */
object Relational {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(spark, dir, name)

  // ----------------------------------------------------------------
  // Aggregations (§2.5 extensions)
  // ----------------------------------------------------------------

  /** TPC-H Q1 pricing summary: the canonical partial+final hash-agg
    * (map-side combine -> single shuffle on the 6-row group key).
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val price = dec(col("l_extendedprice"))
    val disc = dec(col("l_discount"))
    val tax = dec(col("l_tax"))
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(price).cast("double").as("sum_base_price"),
        sum(price * (lit(1) - disc)).cast("double").as("sum_disc_price"),
        sum(price * (lit(1) - disc) * (lit(1) + tax)).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .withColumn("avg_price", col("sum_base_price") / col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      |  count(*) AS count_order,
      |  sum(l_quantity) / count(*) AS avg_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** ROLLUP over (orderstatus, orderpriority): hierarchical totals in
    * one pass (grouping-sets expansion, still a single shuffle).
    */
  def aggRollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("total_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("total_price"))
      .orderBy("status", "priority")

  val aggRollupSql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |       coalesce(o_orderpriority, 'ALL') AS priority,
      |       count(*) AS n_orders,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  /** CUBE over (returnflag, linestatus). */
  def aggCube(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("qty"))
      .orderBy("rf", "ls")

  val aggCubeSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |       coalesce(l_linestatus, 'ALL') AS ls,
      |       count(*) AS n, sum(l_quantity) AS qty
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin

  /** Exact distinct counting (the oracle-able twin of the HLL sketch
    * query, which estimates and therefore cannot hash-match DuckDB).
    */
  def aggDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")

  val aggDistinctSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_users,
      |       count(*) AS n_events
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** HLL++ approximate distinct, gated by its exact twin. The SKETCH
    * is the 100 TB scale path (no shuffle of raw values, fixed-size
    * register merge) — but this GATE query deliberately pairs it with
    * `countDistinct(user_id)`, an exact aggregation that shuffles raw
    * values and dominates the benchmarked cost (ADVICE r11 #1: the
    * timed number here measures gate-over-scale, not the sketch-only
    * path; `agg_kmv_distinct` is the benchmarked sketch-only
    * counterpart). The pairing exists because the raw HLL++ estimate
    * cannot hash-match any other engine (the register layout and bias
    * tables are Spark's own), so the gate is a BOUNDED check
    * (round 11, VERDICT r10 ask #3):
    * the query emits the exact per-group count plus a flag asserting
    * the HLL++ estimate landed within ±[[ApproxDistinctBand]] of it,
    * and the oracle demands every flag be true. A drifting estimator
    * flips a flag and hash-fails the driver compare — the published
    * HLL++ error bound as a falsifiable gate instead of `no_oracle`.
    *
    * Band: rsd=0.01 configures σ ≈ 1% (1.04/√2^p at the implied
    * precision); the band is 2σ. Deterministic per corpus, so the
    * flag is a fixed fact per SF, not a flaky statistic —
    * `ApproxDistinctBandSpec` pins it green at sf0.001/0.01/0.1 and
    * pins falsifiability (a 5%-off estimate flips the flag).
    */
  private val ApproxDistinctBand = 0.02

  def aggApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), 0.01).as("est"),
        countDistinct(col("user_id")).as("exact_users"))
      .select(
        col("event_type"),
        col("exact_users"),
        (abs(col("est") - col("exact_users")) <=
          col("exact_users") * ApproxDistinctBand).cast("long")
          .as("within_band"))
      .orderBy("event_type")

  val aggApproxDistinctSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS exact_users,
      |       CAST(1 AS BIGINT) AS within_band
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Distinct-count sketch that IS gate-verifiable: the
    * [[graft.functions.KmvSketch]] bottom-k estimator over the
    * portable polynomial hash, alongside the exact distinct count for
    * context. Unlike HLL++ (engine-specific, rows-only above), every
    * intermediate here — hash, k-th order statistic, integer-division
    * estimate — is reproduced bit-for-bit by the DuckDB oracle.
    */
  // ---- Count-Min sketch frequency estimation (Cormode &
  // Muthukrishnan 2005, public) ----

  private val CmsDepth = 4
  private val CmsWidth = 256
  private val CmsProbeKeys = 20

  /** Count-Min frequency estimates for a probe key set over
    * `events.user_id`, alongside exact counts: the heavy-hitter /
    * hot-key primitive (frequency capping, skew detection) in sketch
    * space — the depth×width counter table is ≤ d·w rows regardless
    * of corpus size, built in ONE pass with map-side-combinable
    * counts and mergeable across partitions/days by addition (the
    * property that makes it a 100 TB operator; the KMV twin covers
    * distinct-count space).
    *
    * Deterministic and fully DuckDB-replayable: row hashes are the
    * shared portable polynomial fold over "i:key" (row-salted), so
    * the oracle rebuilds the identical table and point-queries the
    * identical min — including the overestimate errors, which are
    * part of the contract (est ≥ true always; equality whenever no
    * collision). Probe keys absent from a row's bucket floor the min
    * at 0 via the left join.
    */
  def aggCmsFreq(spark: SparkSession, dir: String): DataFrame = {
    def buckets(key: Column): Column =
      array((0 until CmsDepth).map(i =>
        TextAnalysis.polyHashCol(
          concat(lit(s"$i:"), key.cast("string"))) % CmsWidth): _*)
    val ev = Tables.events(spark, dir).select(col("user_id"))
    val sketch = ev
      .select(posexplode(buckets(col("user_id"))).as(Seq("row_i", "bucket")))
      .groupBy("row_i", "bucket").agg(count(lit(1)).as("c"))
    val probes = spark.range(0, CmsProbeKeys)
      .select(col("id").as("user_id"))
      .select(col("user_id"),
        posexplode(buckets(col("user_id"))).as(Seq("row_i", "bucket")))
    val truth = ev.groupBy("user_id").agg(count(lit(1)).as("true_n"))
    probes
      .join(broadcast(sketch), Seq("row_i", "bucket"), "left")
      .groupBy("user_id").agg(min(coalesce(col("c"), lit(0L))).as("cms_est"))
      .join(truth, Seq("user_id"), "left")
      .select(col("user_id"), col("cms_est"),
        coalesce(col("true_n"), lit(0L)).as("true_n"))
      .orderBy("user_id")
  }

  val aggCmsFreqSql: String = {
    // the row-index column must NOT be named `i`: polyHashSql's list
    // comprehension binds `i` as its loop variable, which would
    // shadow the outer column inside the hashed expression
    val hash = TextAnalysis.polyHashSql(
      "CAST(ri AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)")
    s"""WITH d AS (SELECT unnest(generate_series(0, ${CmsDepth - 1})) AS ri),
       |b AS (
       |  SELECT ri, ($hash) % $CmsWidth AS bucket
       |  FROM events, d),
       |cms AS (SELECT ri, bucket, count(*) AS c FROM b GROUP BY ri, bucket),
       |probes AS (
       |  SELECT unnest(generate_series(0, ${CmsProbeKeys - 1})) AS user_id),
       |pb AS (
       |  SELECT user_id, ri, ($hash) % $CmsWidth AS bucket
       |  FROM probes, d),
       |est AS (
       |  SELECT user_id, min(coalesce(c, 0)) AS cms_est
       |  FROM pb LEFT JOIN cms ON cms.ri = pb.ri AND cms.bucket = pb.bucket
       |  GROUP BY user_id),
       |truth AS (SELECT user_id, count(*) AS true_n FROM events GROUP BY user_id)
       |SELECT est.user_id, CAST(cms_est AS BIGINT) AS cms_est,
       |  CAST(coalesce(true_n, 0) AS BIGINT) AS true_n
       |FROM est LEFT JOIN truth ON truth.user_id = est.user_id
       |ORDER BY est.user_id""".stripMargin
  }

  private val RetentionMaxWeeks = 4L

  /** Weekly cohort RETENTION: users cohort by their first-event week,
    * and each (cohort, week-offset) cell reports how many of them
    * were active offset weeks later and the retained fraction — the
    * canonical product-analytics triangle view. Three
    * map-side-combinable aggs (first week per user, distinct active
    * (user, week), cohort sizes) meeting in user- and cohort-keyed
    * equi-joins; weeks are epoch-second BIGINTs (date_trunc('week')
    * starts Monday in both engines) and offsets exact integer
    * division, so the relation replays bit-for-bit.
    */
  def eventRetention(spark: SparkSession, dir: String): DataFrame = {
    val weeks = Tables.events(spark, dir)
      .select(col("user_id"),
        unix_timestamp(date_trunc("week", col("ts"))).as("week_s"))
      .distinct()
    val cohorts = weeks.groupBy("user_id").agg(min(col("week_s")).as("cohort_s"))
    val sizes = cohorts.groupBy("cohort_s").agg(count(lit(1)).as("cohort_n"))
    weeks.join(cohorts, "user_id")
      .select(col("cohort_s"),
        ((col("week_s") - col("cohort_s")) / 604800L).cast("long").as("offset"))
      .filter(col("offset") <= RetentionMaxWeeks)
      .groupBy("cohort_s", "offset")
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, "cohort_s")
      .select(col("cohort_s"), col("offset"), col("n_active"),
        round(col("n_active").cast("double") / col("cohort_n"), 6)
          .as("retained_frac"))
      .orderBy("cohort_s", "offset")
  }

  val eventRetentionSql: String =
    s"""WITH weeks AS (
       |  SELECT DISTINCT user_id,
       |    CAST(floor(epoch(date_trunc('week', ts))) AS BIGINT) AS week_s
       |  FROM events),
       |cohorts AS (
       |  SELECT user_id, min(week_s) AS cohort_s FROM weeks GROUP BY user_id),
       |sizes AS (
       |  SELECT cohort_s, count(*) AS cohort_n FROM cohorts GROUP BY cohort_s),
       |cells AS (
       |  SELECT c.cohort_s, (w.week_s - c.cohort_s) // 604800 AS "offset",
       |    count(*) AS n_active
       |  FROM weeks w JOIN cohorts c ON c.user_id = w.user_id
       |  WHERE (w.week_s - c.cohort_s) // 604800 <= $RetentionMaxWeeks
       |  GROUP BY c.cohort_s, (w.week_s - c.cohort_s) // 604800)
       |SELECT cells.cohort_s, CAST("offset" AS BIGINT) AS "offset",
       |  CAST(n_active AS BIGINT) AS n_active,
       |  round(CAST(n_active AS DOUBLE) / sizes.cohort_n, 6) AS retained_frac
       |FROM cells JOIN sizes ON sizes.cohort_s = cells.cohort_s
       |ORDER BY cells.cohort_s, "offset"""".stripMargin

  // private[graft]: the streaming twin's batch finisher shares the
  // threshold instead of duplicating the literal
  private[graft] val AnomalyZ = 2L

  /** Daily-volume anomaly detection: days whose event count sits
    * more than [[AnomalyZ]] sample standard deviations from that
    * event type's mean — the monitoring primitive a pipeline runs
    * over ingest volumes before training on a day's data. The
    * |z| > Z test is evaluated ENTIRELY in BIGINT arithmetic
    * (z² > Z² rewritten with n·Σx and n·Σx² so no division or
    * sqrt appears): counts are integers, so the flag is exact and
    * order-independent — no float-accumulation drift between
    * engines, unlike a stddev_samp comparison. Plan: two
    * map-side-combinable hash aggs (daily counts, per-type moment
    * sums) + a broadcast join of the type-cardinality stats side —
    * the daily relation never re-shuffles and there is no window.
    */
  def eventAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("day", col("ts"))).as("day_s"))
      .agg(count(lit(1)).as("cnt"))
    val stats = daily.groupBy("event_type").agg(
      count(lit(1)).as("n"), sum(col("cnt")).as("s"),
      sum(col("cnt") * col("cnt")).as("q"))
    val dev = col("cnt") * col("n") - col("s")
    daily.join(broadcast(stats), "event_type")
      .filter(dev * dev * (col("n") - 1) >
        lit(AnomalyZ * AnomalyZ) * col("n") *
          (col("n") * col("q") - col("s") * col("s")))
      .select(col("event_type"), col("day_s"), col("cnt"),
        when(dev > 0, lit("high")).otherwise(lit("low")).as("side"))
      .orderBy("event_type", "day_s")
  }

  val eventAnomalySql: String =
    s"""WITH daily AS (
       |  SELECT event_type,
       |    CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_s,
       |    count(*) AS cnt
       |  FROM events GROUP BY 1, 2),
       |st AS (
       |  SELECT event_type, count(*) AS n, sum(cnt) AS s,
       |    sum(cnt * cnt) AS q
       |  FROM daily GROUP BY 1)
       |SELECT d.event_type, d.day_s, d.cnt,
       |  CASE WHEN d.cnt * st.n > st.s THEN 'high' ELSE 'low' END AS side
       |FROM daily d JOIN st USING (event_type)
       |WHERE (d.cnt * st.n - st.s) * (d.cnt * st.n - st.s) * (st.n - 1)
       |  > ${AnomalyZ * AnomalyZ} * st.n * (st.n * st.q - st.s * st.s)
       |ORDER BY event_type, day_s""".stripMargin

  /** GAPS-AND-ISLANDS: per-user activity streaks — consecutive
    * active days collapse to islands via the classic
    * `day − row_number()` constant-group trick (a streak's members
    * share the difference), then per-user streak statistics. One
    * distinct, one user-partitioned window, two hash aggs — all
    * BIGINT day indices, no floats anywhere.
    */
  def windowIslands(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .select(col("user_id"),
        expr("unix_timestamp(date_trunc('DAY', ts)) div 86400").as("day_i"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("day_i")
    days
      .withColumn("grp", col("day_i") - row_number().over(w))
      .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
      .groupBy("user_id").agg(
        sum(col("len")).as("n_active_days"),
        max(col("len")).as("longest_streak"),
        count(lit(1)).as("n_islands"))
      .orderBy("user_id")
  }

  val windowIslandsSql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id,
      |    CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS day_i
      |  FROM events),
      |g AS (
      |  SELECT user_id, day_i,
      |    day_i - row_number() OVER (PARTITION BY user_id ORDER BY day_i)
      |      AS grp
      |  FROM days),
      |i AS (SELECT user_id, grp, count(*) AS len FROM g GROUP BY 1, 2)
      |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
      |  CAST(max(len) AS BIGINT) AS longest_streak,
      |  CAST(count(*) AS BIGINT) AS n_islands
      |FROM i GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Least-squares TREND (REGR_SLOPE/REGR_INTERCEPT) of daily event
    * volume per type, computed from integer MOMENT SUMS (n, Σx, Σy,
    * Σxy, Σx²) instead of the engines' incremental float
    * aggregates: every moment is BIGINT-exact and
    * order-independent, and slope/intercept are each ONE IEEE
    * division of < 2⁵³ integers — bit-deterministic across engines
    * and partitionings, where a running-covariance implementation
    * drifts in the last ulp on every re-partition. Two
    * map-side-combinable hash aggs, no window.
    */
  def aggRegression(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        expr("unix_timestamp(date_trunc('DAY', ts)) div 86400").as("x"))
      .agg(count(lit(1)).as("y"))
    daily.groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("event_type"), col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 9)
          .as("slope"),
        round((col("sy") * (col("n") * col("sxx") - col("sx") * col("sx"))
          - (col("n") * col("sxy") - col("sx") * col("sy")) * col("sx"))
          .cast("double") /
          (col("n") * (col("n") * col("sxx") - col("sx") * col("sx")))
            .cast("double"), 9).as("intercept"))
      .orderBy("event_type")
  }

  val aggRegressionSql: String =
    """WITH daily AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS x,
      |    count(*) AS y
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |    sum(x * y) AS sxy, sum(x * x) AS sxx
      |  FROM daily GROUP BY 1)
      |SELECT event_type, CAST(n AS BIGINT) AS n,
      |  round(CAST(n * sxy - sx * sy AS DOUBLE)
      |    / CAST(n * sxx - sx * sx AS DOUBLE), 9) AS slope,
      |  round(CAST(sy * (n * sxx - sx * sx) - (n * sxy - sx * sy) * sx AS DOUBLE)
      |    / CAST(n * (n * sxx - sx * sx) AS DOUBLE), 9) AS intercept
      |FROM m ORDER BY event_type""".stripMargin

  /** Per-user event-TRACE assembly: the time-ordered event-type path
    * (first 10 hops, '>'-joined) plus the event count — the
    * interaction-sequence construction step a behavioral-training
    * pipeline runs before tokenizing traces. `collect_list` into
    * `array_sort` is THE sequence-assembly idiom: one hash agg keyed
    * by user, state bounded by that user's events (per-key sequence
    * scale — the operator's inherent memory contract; a pathological
    * single-key corpus would cap or sessionize first, which
    * `sessionize` demonstrates). Ordering is pinned by the unique
    * (ts_ns, event_id) prefix of the sorted struct, so the assembled
    * path is deterministic under any partitioning and replays in
    * DuckDB's ordered list aggregate.
    */
  def eventSequences(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"),
        struct(col("ts_ns"), col("event_id"), col("event_type")).as("e"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        concat_ws(">",
          slice(transform(array_sort(collect_list(col("e"))),
            x => x("event_type")), 1, 10)).as("path10"))
      .orderBy("user_id")

  val eventSequencesSql: String =
    """SELECT user_id, count(*) AS n_events,
      |  array_to_string(
      |    (list(event_type ORDER BY epoch_ns(ts), event_id))[1:10], '>')
      |    AS path10
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** First-order MARKOV transition matrix between event types — the
    * sequence-model statistic behind behavior modeling and anomaly
    * scoring (and the bigram counting shape `text_lm_score` applies
    * to tokens, here applied to event streams): per user, each
    * event's successor in (ts_ns, event_id) order via ONE
    * user-partitioned `lead` window, then transition counts and
    * integer ppm row-conditional probabilities — BIGINT floor
    * divisions, no float normalization to drift. Output is the
    * dense |types|² matrix: model-scale, safe to broadcast
    * downstream.
    */
  def eventMarkov(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts_ns"), col("event_id"))
    val tr = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts_ns"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("cnt"))
    val tot = tr.groupBy("from_type").agg(sum(col("cnt")).as("t"))
    tr.join(broadcast(tot), "from_type")
      .select(col("from_type"), col("to_type"), col("cnt"),
        expr("cnt * 1000000 div t").as("prob_ppm"))
      .orderBy("from_type", "to_type")
  }

  val eventMarkovSql: String =
    """WITH ordered AS (
      |  SELECT user_id, event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |                           ORDER BY epoch_ns(ts), event_id) AS to_type
      |  FROM events),
      |tr AS (
      |  SELECT from_type, to_type, count(*) AS cnt
      |  FROM ordered WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT from_type, sum(cnt) AS t FROM tr GROUP BY 1)
      |SELECT from_type, to_type, CAST(cnt AS BIGINT) AS cnt,
      |  CAST(cnt * 1000000 // t AS BIGINT) AS prob_ppm
      |FROM tr JOIN tot USING (from_type)
      |ORDER BY from_type, to_type""".stripMargin

  private val AttribWindowUs = 7L * 24 * 3600 * 1000000L // 7 days

  /** LAST-TOUCH ATTRIBUTION — each purchase credits the user's most
    * recent PRECEDING non-purchase event within a 7-day lookback
    * (the marketing-analytics workhorse; first/linear variants are
    * the same plan with a different pick): one user-partitioned
    * window whose frame ends at `-1 PRECEDING` picks the touch
    * without a self-join or an as-of join per purchase; too-old or
    * missing touches fall into the explicit `none` channel so the
    * report always accounts for every purchase. Revenue aggregates
    * in DECIMAL cents (order-independent), counts in BIGINT.
    *
    * Scale shape: one window partitioned by the natural key + one
    * channel-scale hash agg — the same cost as `sessionize`
    * regardless of purchase density.
    */
  def eventAttribution(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts_ns"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = struct(col("ts_ns"), col("event_type"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts_ns"),
        col("event_type"), col("value"))
      .withColumn("last_touch",
        last(when(col("event_type") =!= "purchase", touch),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        when(col("last_touch").isNotNull &&
          col("ts_ns") - col("last_touch.ts_ns") <= AttribWindowUs * 1000L,
          col("last_touch.event_type")).otherwise("none").as("channel"),
        dec(col("value")).as("v"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("v")).cast("double").as("revenue"))
      .orderBy("channel")
  }

  val eventAttributionSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_ns(ts) AS ts_ns, event_type, value,
       |    last_value(CASE WHEN event_type != 'purchase'
       |                    THEN struct_pack(t := epoch_ns(ts), c := event_type)
       |               END IGNORE NULLS)
       |      OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      AS last_touch
       |  FROM events),
       |p AS (
       |  SELECT CASE WHEN last_touch IS NOT NULL
       |                AND ts_ns - last_touch.t <= ${AttribWindowUs} * 1000
       |              THEN last_touch.c ELSE 'none' END AS channel,
       |    CAST(value AS DECIMAL(18,2)) AS v
       |  FROM e WHERE event_type = 'purchase')
       |SELECT channel, count(*) AS n_purchases,
       |  CAST(sum(v) AS DOUBLE) AS revenue
       |FROM p GROUP BY channel ORDER BY channel""".stripMargin

  /** RFM SEGMENTATION — the classic customer-value triage: per user,
    * Recency (days since last event vs the corpus max), Frequency
    * (event count) and Monetary (cents), each scored 1–5 against the
    * population's exact 20/40/60/80 quantile BOUNDARIES, concatenated
    * into the "555"-style segment label. Scoring against broadcast
    * boundary values (one row, four doubles per dimension) rather
    * than an `ntile` window keeps the fact-scale path to ONE hash agg
    * + a broadcast join — no global sort, no single-partition window.
    * The boundary agg itself uses Spark's exact `percentile` (shared
    * interpolation rule with DuckDB's `quantile_cont`, proven by
    * `agg_percentile`); its buffer is population-scale — at extreme
    * user counts swap in the mergeable `agg_histogram_quantile`
    * sketch boundaries, same plan otherwise.
    *
    * Determinism: R/F/M inputs are BIGINT (µs day floors, counts,
    * DECIMAL→cents), boundaries are exact rationals of integers, and
    * `v >= b` comparisons are exact — no float accumulation anywhere.
    */
  def eventRfm(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        expr("max(ts_ns div 1000)").as("last_us"),
        count(lit(1)).as("f"),
        (sum(dec(col("value"))) * 100).cast("long").as("m_cents"))
    val withR = perUser
      .crossJoin(broadcast(perUser.agg(max(col("last_us")).as("corpus_us"))))
      .withColumn("r_days",
        expr("(corpus_us - last_us) div 86400000000"))
      .select(col("user_id"), col("r_days"), col("f"), col("m_cents"))
    val bounds = withR.agg(
      expr("percentile(r_days, array(0.2, 0.4, 0.6, 0.8))").as("rb"),
      expr("percentile(f, array(0.2, 0.4, 0.6, 0.8))").as("fb"),
      expr("percentile(m_cents, array(0.2, 0.4, 0.6, 0.8))").as("mb"))
    def score(v: String, b: String, asc: Boolean): Column = {
      // asc: bigger value -> higher score (F, M); desc for recency
      val cmp = (i: Int) =>
        if (asc) when(col(v) >= element_at(col(b), i), 1L).otherwise(0L)
        else when(col(v) <= element_at(col(b), i), 1L).otherwise(0L)
      lit(1L) + cmp(1) + cmp(2) + cmp(3) + cmp(4)
    }
    withR.crossJoin(broadcast(bounds))
      .withColumn("r_score", score("r_days", "rb", asc = false))
      .withColumn("f_score", score("f", "fb", asc = true))
      .withColumn("m_score", score("m_cents", "mb", asc = true))
      .select(col("user_id"), col("r_days"), col("f"), col("m_cents"),
        col("r_score"), col("f_score"), col("m_score"),
        concat(col("r_score"), col("f_score"), col("m_score")).as("segment"))
      .orderBy("user_id")
  }

  val eventRfmSql: String =
    """WITH pu AS (
      |  SELECT user_id, max(epoch_ns(ts) // 1000) AS last_us,
      |    count(*) AS f,
      |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS m_cents
      |  FROM events GROUP BY user_id),
      |r AS (
      |  SELECT user_id,
      |    ((SELECT max(last_us) FROM pu) - last_us) // 86400000000 AS r_days,
      |    f, m_cents
      |  FROM pu),
      |b AS (
      |  SELECT quantile_cont(r_days, [0.2, 0.4, 0.6, 0.8]) AS rb,
      |    quantile_cont(f, [0.2, 0.4, 0.6, 0.8]) AS fb,
      |    quantile_cont(m_cents, [0.2, 0.4, 0.6, 0.8]) AS mb
      |  FROM r),
      |s AS (
      |  SELECT user_id, r_days, f, m_cents,
      |    1 + (CASE WHEN r_days <= rb[1] THEN 1 ELSE 0 END)
      |      + (CASE WHEN r_days <= rb[2] THEN 1 ELSE 0 END)
      |      + (CASE WHEN r_days <= rb[3] THEN 1 ELSE 0 END)
      |      + (CASE WHEN r_days <= rb[4] THEN 1 ELSE 0 END) AS r_score,
      |    1 + (CASE WHEN f >= fb[1] THEN 1 ELSE 0 END)
      |      + (CASE WHEN f >= fb[2] THEN 1 ELSE 0 END)
      |      + (CASE WHEN f >= fb[3] THEN 1 ELSE 0 END)
      |      + (CASE WHEN f >= fb[4] THEN 1 ELSE 0 END) AS f_score,
      |    1 + (CASE WHEN m_cents >= mb[1] THEN 1 ELSE 0 END)
      |      + (CASE WHEN m_cents >= mb[2] THEN 1 ELSE 0 END)
      |      + (CASE WHEN m_cents >= mb[3] THEN 1 ELSE 0 END)
      |      + (CASE WHEN m_cents >= mb[4] THEN 1 ELSE 0 END) AS m_score
      |  FROM r CROSS JOIN b)
      |SELECT user_id, r_days, CAST(f AS BIGINT) AS f, m_cents,
      |  CAST(r_score AS BIGINT) AS r_score, CAST(f_score AS BIGINT) AS f_score,
      |  CAST(m_score AS BIGINT) AS m_score,
      |  CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) ||
      |    CAST(m_score AS VARCHAR) AS segment
      |FROM s ORDER BY user_id""".stripMargin

  private val HistBins = 256
  private val HistQs = Seq(0.5, 0.9, 0.99)

  /** Mergeable HISTOGRAM quantile sketch: per event type, bin values
    * into [[HistBins]] equal-width buckets over the observed [min,
    * max] and answer quantiles from the cumulative bin counts (the
    * lower edge of the first bin whose running count reaches
    * ⌈q·n⌉). Completes the sketch family — KMV (distinct), CMS
    * (frequency), histogram (quantile) — and, unlike
    * `approx_percentile`'s engine-specific digest, the sketch is
    * exactly replayable, so the GATE covers an approximate-quantile
    * path: bin counts are integers (mergeable by addition across
    * partitions/days — the reaggregation property percentile_exact
    * lacks), and the only floats are the deterministic bin formula
    * and edge arithmetic, computed in the identical IEEE order on
    * both engines. Plan: two map-side-combinable aggs (range, bin
    * counts) + a window over ≤ [[HistBins]] rows per group —
    * sketch-scale state, no full sort of the data (exact
    * `agg_percentile` keeps the full-sort contract).
    */
  def aggHistogramQuantile(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_type"), col("value"))
    val rng = ev.groupBy("event_type").agg(
      min(col("value")).as("mn"), max(col("value")).as("mx"),
      count(lit(1)).as("n"))
    val binned = ev.join(broadcast(rng), "event_type")
      .select(col("event_type"),
        when(col("mx") === col("mn"), lit(0)).otherwise(
          least(lit(HistBins - 1),
            floor((col("value") - col("mn")) * HistBins / (col("mx") - col("mn")))
              .cast("int"))).as("bin"))
      .groupBy("event_type", "bin").agg(count(lit(1)).as("c"))
    val wcum = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("bin")
    val cum = binned.withColumn("cum", sum(col("c")).over(wcum))
    val probes = rng.select(col("event_type"), col("mn"), col("mx"), col("n"),
      explode(array(HistQs.map(lit(_)): _*)).as("q"))
    probes.join(cum, "event_type")
      .filter(col("cum") >= ceil(col("q") * col("n")))
      .groupBy(col("event_type"), col("q"), col("mn"), col("mx"))
      .agg(min(col("bin")).as("bin_sel"))
      .select(col("event_type"), col("q"),
        round(col("mn") + col("bin_sel") * (col("mx") - col("mn")) / HistBins, 6)
          .as("est"))
      .orderBy("event_type", "q")
  }

  val aggHistogramQuantileSql: String =
    s"""WITH rng AS (
       |  SELECT event_type, min(value) AS mn, max(value) AS mx,
       |    count(*) AS n
       |  FROM events GROUP BY event_type),
       |b AS (
       |  SELECT e.event_type,
       |    CASE WHEN r.mx = r.mn THEN 0
       |         ELSE least(${HistBins - 1},
       |           CAST(floor((e.value - r.mn) * $HistBins / (r.mx - r.mn))
       |                AS INT))
       |    END AS bin
       |  FROM events e JOIN rng r ON r.event_type = e.event_type),
       |bc AS (SELECT event_type, bin, count(*) AS c
       |       FROM b GROUP BY event_type, bin),
       |cum AS (
       |  SELECT event_type, bin,
       |    sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum
       |  FROM bc),
       |qs AS (SELECT unnest([${HistQs.map(q => s"CAST($q AS DOUBLE)").mkString(", ")}]) AS q),
       |sel AS (
       |  SELECT c.event_type, q.q, min(c.bin) AS bin_sel
       |  FROM cum c JOIN rng r ON r.event_type = c.event_type
       |  CROSS JOIN qs q
       |  WHERE c.cum >= ceil(q.q * r.n)
       |  GROUP BY c.event_type, q.q)
       |SELECT s.event_type, s.q,
       |  round(r.mn + s.bin_sel * (r.mx - r.mn) / $HistBins, 6) AS est
       |FROM sel s JOIN rng r ON r.event_type = s.event_type
       |ORDER BY s.event_type, s.q""".stripMargin

  def aggKmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, dir)
    val kmv = events
      .select(col("event_type"), col("user_id")).as[(String, Long)]
      .map { case (t, u) => (t, graft.functions.KmvSketch.hash(u.toString)) }
      .groupByKey(_._1).mapValues(_._2)
      .agg(graft.functions.KmvSketch.toColumn.name("kmv_users"))
      .toDF("event_type", "kmv_users")
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    kmv.join(exact, "event_type")
      .select(col("event_type"), col("exact_users"), col("kmv_users"))
      .orderBy("event_type")
  }

  /** SQL-surface twin of [[aggKmvDistinct]]: the SAME sketch called
    * as a registered UDAF from plain SQL (`kmv_distinct(...)` via
    * `NativeFunctions.register`) — a SQL-only user gets the typed
    * Aggregator ladder, not just the scalar/generator functions.
    * Shares [[aggKmvDistinctSql]] verbatim: both paths must land on
    * bit-identical estimates.
    */
  def sqlKmv(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.NativeFunctions.register(spark)
    Tables.events(spark, dir).createOrReplaceTempView("graft_events_sqlkmv")
    spark.sql(
      """SELECT event_type,
        |  count(DISTINCT user_id) AS exact_users,
        |  kmv_distinct(CAST(user_id AS STRING)) AS kmv_users
        |FROM graft_events_sqlkmv
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  /** Oracle: identical hash (HUGEINT fold mod 2⁶⁴ over the id's
    * decimal digits, then the same multiply/shift-add finalizer via a
    * 32-bit-split multiply — products stay under 2⁹⁸ < HUGEINT max),
    * k-th smallest distinct hash via a window, and the same
    * (K−1)·2⁶⁴ // kth integer estimate (255·2⁶⁴ < 2¹²⁷).
    */
  val aggKmvDistinctSql: String =
    """WITH u AS (
      |  SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS s FROM events),
      |h0 AS (
      |  SELECT event_type,
      |    list_reduce(list_prepend(CAST(0 AS HUGEINT),
      |      [CAST(unicode(substr(s, CAST(i AS INT), 1)) AS HUGEINT)
      |       for i in generate_series(1, length(s))]),
      |      (a, b) -> (a*31 + b) % 18446744073709551616) AS x
      |  FROM u),
      |m1 AS (SELECT event_type,
      |  ((x % 4294967296) * (18397679294719823053 % 4294967296)
      |   + 4294967296 * ((x % 4294967296) * (18397679294719823053 // 4294967296)
      |                 + (x // 4294967296) * (18397679294719823053 % 4294967296))
      |  ) % 18446744073709551616 AS x FROM h0),
      |a1 AS (SELECT event_type,
      |  (x + (x // 8589934592)) % 18446744073709551616 AS x FROM m1),
      |m2 AS (SELECT event_type,
      |  ((x % 4294967296) * (14181476777654086739 % 4294967296)
      |   + 4294967296 * ((x % 4294967296) * (14181476777654086739 // 4294967296)
      |                 + (x // 4294967296) * (14181476777654086739 % 4294967296))
      |  ) % 18446744073709551616 AS x FROM a1),
      |h AS (SELECT event_type,
      |  (x + (x // 8589934592)) % 18446744073709551616 AS hu FROM m2),
      |hd AS (SELECT DISTINCT event_type, hu FROM h),
      |r AS (SELECT event_type, hu,
      |        row_number() OVER (PARTITION BY event_type ORDER BY hu) AS rn
      |      FROM hd),
      |k AS (SELECT event_type, count(*) AS seen,
      |        max(hu) FILTER (WHERE rn <= 256) AS kth
      |      FROM r GROUP BY event_type),
      |x AS (SELECT event_type, count(DISTINCT user_id) AS exact_users
      |      FROM events GROUP BY event_type)
      |SELECT k.event_type, CAST(x.exact_users AS BIGINT) AS exact_users,
      |  CASE WHEN k.seen < 256 THEN CAST(k.seen AS BIGINT)
      |       ELSE CAST((CAST(255 AS HUGEINT) * 18446744073709551616) // k.kth
      |            AS BIGINT)
      |  END AS kmv_users
      |FROM k JOIN x ON k.event_type = x.event_type
      |ORDER BY k.event_type""".stripMargin

  // ----------------------------------------------------------------
  // Portable HyperLogLog: the oracled twin of agg_approx_distinct
  // ----------------------------------------------------------------

  private val HllM = 512       // registers (p = 9)
  private val HllRhoCap = 50   // keeps 2^(cap) register sums in exact Longs
  // α·m²·2⁵⁰ folded into ONE double constant: Scala's Double.toString
  // round-trips, so interpolating it into the SQL hands DuckDB the
  // bit-identical value
  private val HllScaledAlpha: Double =
    0.7213 / (1.0 + 1.079 / HllM) * HllM * HllM * math.pow(2.0, 50)

  /** HyperLogLog distinct-count (Flajolet et al. 2007) built
    * PORTABLY — the engine-verifiable twin of the built-in
    * [[aggApproxDistinct]] (whose HLL++ registers are
    * implementation-specific and therefore rows-only at the gate).
    * Every stage here is cross-engine exact, which makes this the
    * suite's only fully-oracled HLL: register index and leading-zero
    * rank come from [[Dedup.splitmix64]] over [[Dedup.polyHash64]]
    * (full avalanche — polyHash alone leaves low-bit structure that
    * skews ρ), the register table is a two-level hash agg (map-side
    * partial `max` — the sketch property itself), and the harmonic
    * sum Σ2^−M is computed as the INTEGER Σ2^(cap−M) so partial sums
    * are exact Longs in any order; the estimate then costs one
    * division, one branch (linear-counting small-range correction),
    * one optional `ln`, behind the family's rounding.
    *
    * 100 TB shape: state per group is ≤ m=512 register rows (the
    * shuffle after the first agg carries groups×occupied-registers,
    * nothing row-scale) and merge is elementwise max — associative,
    * commutative, partition-count-invariant. σ ≈ 1.04/√512 ≈ 4.6%.
    */
  def aggHll(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, dir)
    val regs = events
      .select(col("event_type"), col("user_id")).as[(String, Long)]
      .mapPartitions { it =>
        it.map { case (t, u) =>
          val z = graft.ext.Dedup.splitmix64(graft.ext.Dedup.polyHash64(u.toString))
          val idx = (z >>> 55).toInt
          val w = z & ((1L << 55) - 1L)
          // rho = leading zeros within the 55-bit suffix + 1 = nlz-8
          val rho =
            if (w == 0L) HllRhoCap
            else math.min(HllRhoCap, java.lang.Long.numberOfLeadingZeros(w) - 8)
          (t, idx, rho)
        }
      }.toDF("event_type", "idx", "rho")
    val est = regs
      .groupBy("event_type", "idx").agg(max(col("rho")).as("mreg"))
      .groupBy("event_type")
      .agg(
        sum(expr(s"CAST(power(2, $HllRhoCap - mreg) AS BIGINT)")).as("s_present"),
        count(lit(1)).as("n_present"))
      .withColumn("v_zero", lit(HllM.toLong) - col("n_present"))
      .withColumn("s_scaled",
        col("s_present") + col("v_zero") * lit(1L << HllRhoCap))
      .withColumn("e_raw", lit(HllScaledAlpha) / col("s_scaled").cast("double"))
      .withColumn("hll_est", round(
        when(col("e_raw") <= lit(2.5 * HllM) && col("v_zero") > 0,
          lit(HllM.toDouble) *
            log(lit(HllM.toDouble) / col("v_zero").cast("double")))
          .otherwise(col("e_raw")), 4))
    val exact = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    est.join(exact, "event_type")
      .select(col("event_type"), col("exact_users"), col("hll_est"),
        col("n_present").cast("long").as("n_present"),
        col("v_zero").cast("long").as("v_zero"))
      .orderBy("event_type")
  }

  /** Replays the ENTIRE sketch in DuckDB: the polynomial fold in
    * HUGEINT, splitmix64 via 32-bit-split modular multiplies +
    * BIGINT-bit-pattern xors (HUGEINT has no xor; the sign-domain
    * round-trip is exact), register extraction by integer division,
    * ρ from `bin()` digit length, and the integer harmonic sum.
    */
  val aggHllSql: String = {
    val two64 = "18446744073709551616"
    val two63 = "9223372036854775808"
    val two32 = "4294967296"
    def mulmod(x: String, c: BigInt): String = {
      val clo = c % BigInt(two32); val chi = c / BigInt(two32)
      s"""((($x % $two32) * $clo
         |   + $two32 * ((($x % $two32) * $chi) + (($x // $two32) * $clo)))
         |  % $two64)""".stripMargin
    }
    def xor64(x: String, y: String): String = {
      val sx = s"CASE WHEN $x >= $two63 THEN CAST($x - $two64 AS BIGINT) ELSE CAST($x AS BIGINT) END"
      val r = s"xor($sx, CAST($y AS BIGINT))"
      s"(CASE WHEN $r < 0 THEN CAST($r AS HUGEINT) + $two64 ELSE CAST($r AS HUGEINT) END)"
    }
    val c1 = BigInt("13787848793156543929") // 0xBF58476D1CE4E5B9
    val c2 = BigInt("10723151780598845931") // 0x94D049BB133111EB
    s"""WITH u AS (
       |  SELECT event_type, CAST(user_id AS VARCHAR) AS s FROM events),
       |h0 AS (
       |  SELECT event_type,
       |    list_reduce(list_prepend(CAST(0 AS HUGEINT),
       |      [CAST(unicode(substr(s, CAST(i AS INT), 1)) AS HUGEINT)
       |       for i in generate_series(1, length(s))]),
       |      (a, b) -> (a*31 + b) % $two64) AS v
       |  FROM u),
       |t1 AS (SELECT event_type,
       |  (v + 11400714819323198485) % $two64 AS v FROM h0),
       |x1 AS (SELECT event_type, ${xor64("v", "(v // 1073741824)")} AS v FROM t1),
       |t2 AS (SELECT event_type, ${mulmod("v", c1)} AS v FROM x1),
       |x2 AS (SELECT event_type, ${xor64("v", "(v // 134217728)")} AS v FROM t2),
       |t3 AS (SELECT event_type, ${mulmod("v", c2)} AS v FROM x2),
       |z AS (SELECT event_type, ${xor64("v", "(v // 2147483648)")} AS v FROM t3),
       |r AS (
       |  SELECT event_type,
       |    CAST(v // 36028797018963968 AS BIGINT) AS idx,
       |    CAST(v % 36028797018963968 AS BIGINT) AS w
       |  FROM z),
       |rr AS (
       |  SELECT event_type, idx,
       |    max(CASE WHEN w = 0 THEN $HllRhoCap
       |        ELSE LEAST($HllRhoCap, 56 - length(bin(w))) END) AS mreg
       |  FROM r GROUP BY 1, 2),
       |e AS (
       |  SELECT event_type,
       |    sum(CAST(power(2, $HllRhoCap - mreg) AS BIGINT)) AS s_present,
       |    count(*) AS n_present
       |  FROM rr GROUP BY 1),
       |f AS (
       |  SELECT event_type, n_present, $HllM - n_present AS v_zero,
       |    CAST(s_present + ($HllM - n_present) * ${1L << HllRhoCap} AS DOUBLE)
       |      AS s_scaled
       |  FROM e),
       |g AS (
       |  SELECT event_type, n_present, v_zero,
       |    $HllScaledAlpha / s_scaled AS e_raw
       |  FROM f),
       |x AS (SELECT event_type, count(DISTINCT user_id) AS exact_users
       |      FROM events GROUP BY event_type)
       |SELECT g.event_type, CAST(x.exact_users AS BIGINT) AS exact_users,
       |  round(CASE WHEN e_raw <= ${2.5 * HllM} AND v_zero > 0
       |        THEN ${HllM.toDouble} * ln(${HllM.toDouble} / v_zero)
       |        ELSE e_raw END, 4) AS hll_est,
       |  CAST(n_present AS BIGINT) AS n_present,
       |  CAST(v_zero AS BIGINT) AS v_zero
       |FROM g JOIN x ON g.event_type = x.event_type
       |ORDER BY g.event_type""".stripMargin
  }

  // ----------------------------------------------------------------
  // KMV sketch SET ALGEBRA: union / intersection between sketches
  // ----------------------------------------------------------------

  /** KMV sketch SET OPERATIONS (Beyer et al. 2007): for every pair
    * of event types, the distinct-user UNION and INTERSECTION sizes
    * estimated purely from the two bottom-k sketches — the algebra
    * that makes sketches composable ("how many users do A and B
    * share?" answered from k longs per side, never re-reading the
    * facts) — beside the exact tier. Merged-sketch math: bottom-k of
    * S_A ∪ S_B estimates |A∪B| (exact when the merge has < k
    * hashes, which implies both sketches were exhaustive); the
    * fraction of the union's bottom-k present in BOTH sketches
    * estimates Jaccard, and intersection = ρ̂·|A∪B|̂ in integer
    * floor arithmetic.
    *
    * Scale shape: one distinct over (type, user), the hash kernel,
    * then the bottom-k per type via the [[graft.plans.TopKPerKey]]
    * BOUNDED-HEAP operator (map-side partial heaps — no per-type
    * sort, no full shuffle of hashes; the same operator `topk_custom`
    * gates). Everything after runs at SKETCH scale (≤ 2k rows per
    * pair): pair tagging, merged rank window, and exact-BigInt final
    * estimates in a pair-scale kernel. The exact tier (distinct
    * self-join on user) is the verification twin.
    */
  def sketchSetops(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val K = graft.functions.KmvSketch.K
    val du = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id")).distinct()
    // flipped-sign hashes: signed ascending == unsigned ascending
    val hashed = du.as[(String, Long)].mapPartitions { it =>
      it.map { case (t, u) =>
        (t, graft.functions.KmvSketch.hash(u.toString) ^ Long.MinValue)
      }
    }.toDF("etype", "f").distinct()
    val sk = graft.plans.TopK.topKPerKey(
      hashed, keyNames = Seq("etype"), orderSpec = Seq("f" -> false), k = K)
    val types = sk.select(col("etype")).distinct()
    val pairs = types.as("a").join(types.as("b"),
        col("a.etype") < col("b.etype"))
      .select(col("a.etype").as("ta"), col("b.etype").as("tb"))
    val tagged = broadcast(pairs).join(sk,
        col("etype") === col("ta") || col("etype") === col("tb"))
      .groupBy(col("ta"), col("tb"), col("f"))
      .agg(max(when(col("etype") === col("ta"), 1L).otherwise(0L)).as("in_a"),
        max(when(col("etype") === col("tb"), 1L).otherwise(0L)).as("in_b"))
    val wm = Window.partitionBy("ta", "tb").orderBy("f")
    val sketchAgg = tagged
      .withColumn("rn", row_number().over(wm))
      .groupBy("ta", "tb")
      .agg(count(lit(1)).as("n_m"),
        max(when(col("rn") <= K, col("f"))).as("kth_f"),
        sum(when(col("rn") <= K && col("in_a") === 1L && col("in_b") === 1L,
          1L).otherwise(0L)).as("matches"))
    val cnt = du.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val inter = du.as("x").join(du.as("y"),
        col("x.user_id") === col("y.user_id") &&
          col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("ta"), col("y.event_type").as("tb"))
      .agg(count(lit(1)).as("inter"))
    val joined = sketchAgg
      .join(cnt.select(col("event_type").as("ta"), col("n").as("n_a")), "ta")
      .join(cnt.select(col("event_type").as("tb"), col("n").as("n_b")), "tb")
      .join(inter, Seq("ta", "tb"), "left")
      .select(col("ta"), col("tb"), col("n_a"), col("n_b"),
        coalesce(col("inter"), lit(0L)).as("inter"),
        col("n_m"), col("kth_f"), col("matches"))
    val mask = (BigInt(1) << 64) - 1
    joined.as[(String, String, Long, Long, Long, Long, Long, Long)]
      .map { case (ta, tb, nA, nB, inter0, nM, kthF, matches) =>
        val estUnion =
          if (nM < K) nM
          else {
            val theta = BigInt(kthF ^ Long.MinValue) & mask
            ((BigInt(K - 1) << 64) / theta).toLong
          }
        // Jaccard denominator is the number of union-bottom-k slots
        // actually inspected: K when the merge saturates, the full
        // merge size when both sketches were exhaustive (where the
        // ratio then yields matches exactly — the estimator
        // degrades to truth on small sets)
        val estInter = matches * estUnion / math.min(K.toLong, nM)
        (ta, tb, nA, nB, nA + nB - inter0, inter0, estUnion, estInter)
      }
      .toDF("type_a", "type_b", "exact_a", "exact_b", "exact_union",
        "exact_inter", "est_union", "est_inter")
      .orderBy("type_a", "type_b")
  }

  /** Oracle: the KMV oracle's split-multiply mix chain, per-type
    * bottom-k by rank, merged-pair rank window, and the identical
    * integer estimate arithmetic in HUGEINT.
    */
  val sketchSetopsSql: String =
    """WITH u AS (
      |  SELECT DISTINCT event_type, user_id,
      |    CAST(user_id AS VARCHAR) AS s FROM events),
      |h0 AS (
      |  SELECT event_type, user_id,
      |    list_reduce(list_prepend(CAST(0 AS HUGEINT),
      |      [CAST(unicode(substr(s, CAST(i AS INT), 1)) AS HUGEINT)
      |       for i in generate_series(1, length(s))]),
      |      (a, b) -> (a*31 + b) % 18446744073709551616) AS x
      |  FROM u),
      |m1 AS (SELECT event_type,
      |  ((x % 4294967296) * (18397679294719823053 % 4294967296)
      |   + 4294967296 * ((x % 4294967296) * (18397679294719823053 // 4294967296)
      |                 + (x // 4294967296) * (18397679294719823053 % 4294967296))
      |  ) % 18446744073709551616 AS x FROM h0),
      |a1 AS (SELECT event_type,
      |  (x + (x // 8589934592)) % 18446744073709551616 AS x FROM m1),
      |m2 AS (SELECT event_type,
      |  ((x % 4294967296) * (14181476777654086739 % 4294967296)
      |   + 4294967296 * ((x % 4294967296) * (14181476777654086739 // 4294967296)
      |                 + (x // 4294967296) * (14181476777654086739 % 4294967296))
      |  ) % 18446744073709551616 AS x FROM a1),
      |hd AS (SELECT DISTINCT event_type,
      |  (x + (x // 8589934592)) % 18446744073709551616 AS hu FROM m2),
      |r AS (SELECT event_type, hu,
      |        row_number() OVER (PARTITION BY event_type ORDER BY hu) AS rn
      |      FROM hd),
      |sk AS (SELECT event_type, hu FROM r WHERE rn <= 256),
      |ty AS (SELECT DISTINCT event_type FROM events),
      |pr AS (SELECT a.event_type AS ta, b.event_type AS tb
      |       FROM ty a JOIN ty b ON a.event_type < b.event_type),
      |tg AS (
      |  SELECT pr.ta, pr.tb, sk.hu,
      |    max(CASE WHEN sk.event_type = pr.ta THEN 1 ELSE 0 END) AS in_a,
      |    max(CASE WHEN sk.event_type = pr.tb THEN 1 ELSE 0 END) AS in_b
      |  FROM pr JOIN sk ON sk.event_type IN (pr.ta, pr.tb)
      |  GROUP BY pr.ta, pr.tb, sk.hu),
      |mr AS (SELECT ta, tb, hu, in_a, in_b,
      |         row_number() OVER (PARTITION BY ta, tb ORDER BY hu) AS rn
      |       FROM tg),
      |ag AS (
      |  SELECT ta, tb, count(*) AS n_m,
      |    max(CASE WHEN rn <= 256 THEN hu END) AS kth,
      |    sum(CASE WHEN rn <= 256 AND in_a = 1 AND in_b = 1
      |             THEN 1 ELSE 0 END) AS matches
      |  FROM mr GROUP BY ta, tb),
      |cnt AS (SELECT event_type, count(*) AS n FROM u GROUP BY event_type),
      |iv AS (
      |  SELECT x.event_type AS ta, y.event_type AS tb, count(*) AS inter
      |  FROM u x JOIN u y
      |    ON x.user_id = y.user_id AND x.event_type < y.event_type
      |  GROUP BY 1, 2),
      |est AS (
      |  SELECT ag.ta, ag.tb, ca.n AS n_a, cb.n AS n_b,
      |    coalesce(iv.inter, 0) AS inter, ag.n_m, ag.kth, ag.matches,
      |    CASE WHEN ag.n_m < 256 THEN ag.n_m
      |         ELSE (CAST(255 AS HUGEINT) * 18446744073709551616) // ag.kth
      |    END AS est_union
      |  FROM ag
      |  JOIN cnt ca ON ag.ta = ca.event_type
      |  JOIN cnt cb ON ag.tb = cb.event_type
      |  LEFT JOIN iv ON ag.ta = iv.ta AND ag.tb = iv.tb)
      |SELECT ta AS type_a, tb AS type_b,
      |  CAST(n_a AS BIGINT) AS exact_a, CAST(n_b AS BIGINT) AS exact_b,
      |  CAST(n_a + n_b - inter AS BIGINT) AS exact_union,
      |  CAST(inter AS BIGINT) AS exact_inter,
      |  CAST(est_union AS BIGINT) AS est_union,
      |  CAST((matches * est_union) // least(256, n_m) AS BIGINT) AS est_inter
      |FROM est ORDER BY type_a, type_b""".stripMargin

  // ----------------------------------------------------------------
  // Joins (§2.6 — absent in the reference)
  // ----------------------------------------------------------------

  /** Dimension join chain customer⋈nation⋈region with explicit
    * broadcast of the small sides: zero shuffle of the fact table.
    */
  def joinBroadcast(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    val r = t(spark, dir, "region")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(dec(col("c_acctbal"))).cast("double").as("total_acctbal"))
      .orderBy("r_name", "n_name")
  }

  val joinBroadcastSql: String =
    """SELECT r_name, n_name, count(*) AS n_customers,
      |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  /** Fact-fact equi-join orders⋈lineitem (shuffle join on orderkey;
    * at scale both sides hash-partition on the key, AQE picks
    * shuffle-hash vs sort-merge and handles skew).
    */
  def joinSortMerge(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val li = t(spark, dir, "lineitem")
    o.join(li, o("o_orderkey") === li("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"))
      .orderBy("o_orderpriority")
  }

  val joinSortMergeSql: String =
    """SELECT o_orderpriority, count(*) AS n_lines,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Left-semi: customers having at least one order (EXISTS). */
  def joinSemi(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_with_orders"))
      .orderBy("c_mktsegment")
  }

  val joinSemiSql: String =
    """SELECT c_mktsegment, count(*) AS n_with_orders
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Left-anti: customers with no URGENT order (NOT EXISTS against a
    * filtered subset). The filter keeps the anti relation non-empty at
    * every SF (the unfiltered variant is vacuously empty at sf0.01 —
    * every customer has an order there), so the oracle gate verifies
    * real rows rather than an empty-equals-empty match. Same left-anti
    * plan shape as the plain variant: the priority predicate pushes to
    * the orders scan, then LeftAnti hash join on the key.
    */
  def joinAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  val joinAntiSql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  /** Range (theta) join: parts priced within a band per size class —
    * a broadcast-able non-equi join (small build side broadcast, the
    * predicate evaluated stream-side; at scale, banding keys would
    * turn this into an equi-join on band id).
    */
  def joinRange(spark: SparkSession, dir: String): DataFrame = {
    val p = t(spark, dir, "part")
    val bands = p.sparkSession.range(0, 5).toDF("band")
      .withColumn("lo", col("band") * 500.0)
      .withColumn("hi", (col("band") + 1) * 500.0)
    p.join(broadcast(bands),
        p("p_retailprice") >= col("lo") && p("p_retailprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_parts"), sum(col("p_size").cast("long")).as("sum_size"))
      .orderBy("band")
  }

  val joinRangeSql: String =
    """SELECT band, count(*) AS n_parts, CAST(sum(p_size) AS BIGINT) AS sum_size
      |FROM part
      |JOIN (SELECT i AS band, i*500.0 AS lo, (i+1)*500.0 AS hi
      |      FROM generate_series(0, 4) s(i)) b
      |  ON p_retailprice >= lo AND p_retailprice < hi
      |GROUP BY band ORDER BY band""".stripMargin

  // ----------------------------------------------------------------
  // Windows (§2.7 extensions)
  // ----------------------------------------------------------------

  /** lag/lead analytics per user over the event stream: seconds since
    * the user's previous event. Timestamps surface as epoch seconds
    * (BIGINT) — parquet ns timestamps truncate to µs in Spark, so raw
    * timestamp output would diverge from DuckDB's ns view.
    */
  def windowLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    Tables.events(spark, dir)
      .withColumn("epoch_s", floor(unix_timestamp(col("ts"))).cast("long"))
      .select(
        col("event_id"), col("user_id"), col("event_type"), col("epoch_s"),
        (col("epoch_s") - lag(col("epoch_s"), 1).over(w)).as("gap_s"),
        lead(col("event_type"), 1).over(w).as("next_type"))
      .orderBy("event_id")
  }

  val windowLagSql: String =
    """SELECT event_id, user_id, event_type,
      |  CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
      |  CAST(floor(epoch(ts)) AS BIGINT)
      |    - lag(CAST(floor(epoch(ts)) AS BIGINT), 1)
      |        OVER (PARTITION BY user_id ORDER BY event_id) AS gap_s,
      |  lead(event_type, 1)
      |    OVER (PARTITION BY user_id ORDER BY event_id) AS next_type
      |FROM events ORDER BY event_id""".stripMargin

  /** Top-k per group via rank(): 3 priciest parts per brand
    * (deterministic tiebreak on partkey).
    */
  def windowTopk(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("p_brand")
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
    t(spark, dir, "part")
      .withColumn("rk", rank().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("p_brand"), col("rk"), col("p_partkey"), col("p_retailprice"))
      .orderBy("p_brand", "rk")
  }

  val windowTopkSql: String =
    """SELECT p_brand, rk, p_partkey, p_retailprice FROM (
      |  SELECT p_brand, p_partkey, p_retailprice,
      |         rank() OVER (PARTITION BY p_brand
      |                      ORDER BY p_retailprice DESC, p_partkey ASC) AS rk
      |  FROM part) WHERE rk <= 3
      |ORDER BY p_brand, rk""".stripMargin

  /** Running (prefix) sum of order totals per customer — the same
    * window shape as the chunk pipeline's offset_in_file (C3).
    */
  def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      .rowsBetween(Window.unboundedPreceding, 0)
    t(spark, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        sum(dec(col("o_totalprice"))).over(w).cast("double").as("running_total"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val windowRunningSql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS running_total
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  // ----------------------------------------------------------------
  // Set operations (§2.8 extensions)
  // ----------------------------------------------------------------

  /** UNION / INTERSECT / EXCEPT over key sets in one result (tagged). */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val buyers = t(spark, dir, "orders").select(col("o_custkey").as("k")).distinct()
    val custs = t(spark, dir, "customer").select(col("c_custkey").as("k")).distinct()
    val union = custs.union(buyers).distinct().withColumn("op", lit("union"))
    val inter = custs.intersect(buyers).withColumn("op", lit("intersect"))
    val exc = custs.except(buyers).withColumn("op", lit("except"))
    union.unionByName(inter).unionByName(exc)
      .groupBy(col("op")).agg(count(lit(1)).as("n"))
      .orderBy("op")
  }

  val setOpsSql: String =
    """WITH custs AS (SELECT DISTINCT c_custkey AS k FROM customer),
      |     buyers AS (SELECT DISTINCT o_custkey AS k FROM orders),
      |     tagged AS (
      |  SELECT 'union' AS op, k FROM (SELECT k FROM custs UNION SELECT k FROM buyers)
      |  UNION ALL
      |  SELECT 'intersect' AS op, k FROM (SELECT k FROM custs INTERSECT SELECT k FROM buyers)
      |  UNION ALL
      |  SELECT 'except' AS op, k FROM (SELECT k FROM custs EXCEPT SELECT k FROM buyers))
      |SELECT op, count(*) AS n FROM tagged GROUP BY op ORDER BY op""".stripMargin

  // ----------------------------------------------------------------
  // JSON / date scalar functions (§2.2 extensions)
  // ----------------------------------------------------------------

  /** JSON field extraction over `events.props` + per-type stats.
    * `try_cast` on both engines: a non-numeric `props.k` nulls out
    * instead of throwing (Spark ANSI cast) or erroring the oracle
    * (DuckDB strict CAST).
    */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").try_cast("long"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("k")).as("sum_k"),
        count(col("k")).as("n_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  val jsonExtractSql: String =
    """SELECT event_type, CAST(sum(k) AS BIGINT) AS sum_k, count(k) AS n_k,
      |       min(k) AS min_k, max(k) AS max_k
      |FROM (SELECT event_type, TRY_CAST(props->>'k' AS BIGINT) AS k FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Date extraction/truncation over order dates: monthly order
    * volume. Months surface as (year, month) BIGINT pairs.
    */
  def dateTrunc(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dec(col("o_totalprice")).as("p"))
      .groupBy(col("y"), col("m"))
      .agg(count(lit(1)).as("n_orders"), sum(col("p")).cast("double").as("total"))
      .orderBy("y", "m")

  val dateTruncSql: String =
    """SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS y,
      |       CAST(extract(month FROM o_orderdate) AS BIGINT) AS m,
      |       count(*) AS n_orders,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY y, m ORDER BY y, m""".stripMargin

  // ----------------------------------------------------------------
  // Event-time operators: as-of join, sessionization, tumbling window
  // ----------------------------------------------------------------

  /** As-of join: for each purchase, the user's latest click at or
    * before it. Spark lacks ASOF JOIN; the scalable formulation is a
    * tagged union + running `max` window — one shuffle on user_id,
    * no range self-join blowup (the classic trick for point-in-time
    * correctness at scale). Nanosecond arithmetic throughout (ts_ns),
    * so ordering matches the oracle's ns view exactly; epoch seconds
    * at the output boundary.
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("is_click", (col("event_type") === "click").cast("int"))
    // clicks sort before purchases at identical ts (<= semantics)
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_ns").asc, col("is_click").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    ev.withColumn("last_click_ns",
        max(when(col("is_click") === 1, col("ts_ns"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id"), col("user_id"),
        expr("ts_ns div 1000000000").as("purchase_s"),
        expr("last_click_ns div 1000000000").as("click_s"))
      .withColumn("gap_s", col("purchase_s") - col("click_s"))
      .orderBy("event_id")
  }

  val asofJoinSql: String =
    """SELECT event_id, user_id, purchase_s, click_s,
      |       purchase_s - click_s AS gap_s
      |FROM (
      |  SELECT p.event_id, p.user_id,
      |    CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_s,
      |    (SELECT CAST(floor(epoch(max(c.ts))) AS BIGINT) FROM events c
      |     WHERE c.user_id = p.user_id AND c.event_type = 'click'
      |       AND c.ts <= p.ts) AS click_s
      |  FROM events p WHERE p.event_type = 'purchase')
      |ORDER BY event_id""".stripMargin

  /** Max staleness for [[asofTolerance]]: 1 hour, in ns. */
  private val AsofToleranceNs = 3600L * 1000000000L

  /** As-of join WITH a tolerance bound (round 15) — the
    * `merge_asof(..., tolerance=...)` surface pandas/polars users
    * expect: each purchase joins its latest preceding click ONLY if
    * that click is within 1 hour; staler matches null out and the
    * row reports `matched = 0`. Same single-shuffle union-window
    * shape as [[asofJoin]] (partition by user, running max of click
    * timestamps) with the staleness predicate applied AFTER the pick
    * — semantically "match then validate", the tolerance contract
    * (a too-old click does NOT fall through to an even older one).
    */
  def asofTolerance(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("is_click", (col("event_type") === "click").cast("int"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_ns").asc, col("is_click").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    ev.withColumn("last_click_ns",
        max(when(col("is_click") === 1, col("ts_ns"))).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("fresh",
        col("last_click_ns").isNotNull &&
          col("ts_ns") - col("last_click_ns") <= AsofToleranceNs)
      .select(
        col("event_id"), col("user_id"),
        expr("ts_ns div 1000000000").as("purchase_s"),
        when(col("fresh"), expr("last_click_ns div 1000000000"))
          .as("click_s"),
        when(col("fresh"), expr("(ts_ns - last_click_ns) div 1000000000"))
          .as("gap_s"),
        col("fresh").cast("long").as("matched"))
      .orderBy("event_id")
  }

  val asofToleranceSql: String =
    s"""WITH m AS (
       |  SELECT p.event_id, p.user_id,
       |    epoch_ns(p.ts) AS p_ns,
       |    (SELECT max(epoch_ns(c.ts)) FROM events c
       |     WHERE c.user_id = p.user_id AND c.event_type = 'click'
       |       AND c.ts <= p.ts) AS c_ns
       |  FROM events p WHERE p.event_type = 'purchase')
       |SELECT event_id, user_id,
       |  p_ns // 1000000000 AS purchase_s,
       |  CASE WHEN c_ns IS NOT NULL AND p_ns - c_ns <= $AsofToleranceNs
       |       THEN c_ns // 1000000000 END AS click_s,
       |  CASE WHEN c_ns IS NOT NULL AND p_ns - c_ns <= $AsofToleranceNs
       |       THEN (p_ns - c_ns) // 1000000000 END AS gap_s,
       |  CAST(c_ns IS NOT NULL AND p_ns - c_ns <= $AsofToleranceNs
       |       AS BIGINT) AS matched
       |FROM m ORDER BY event_id""".stripMargin

  /** Gap-based sessionization (30-min inactivity): the classic
    * two-window formulation — lag to flag session starts, running sum
    * to number them, then per-session aggregation. Single shuffle on
    * user_id; the batch twin of Structured Streaming's
    * `session_window` (graft.streaming).
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val GapNs = 30L * 60 * 1000000000L
    val order = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    val running = order.rowsBetween(Window.unboundedPreceding, 0)
    Tables.events(spark, dir)
      .withColumn("prev_ns", lag(col("ts_ns"), 1).over(order))
      .withColumn("new_sess",
        when(col("prev_ns").isNull || col("ts_ns") - col("prev_ns") > GapNs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(running))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        expr("min(ts_ns) div 1000000000").as("start_s"),
        expr("max(ts_ns) div 1000000000").as("end_s"))
      .withColumn("duration_s", col("end_s") - col("start_s"))
      .orderBy("user_id", "session_id")
  }

  val sessionizeSql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, epoch_ns(ts) AS ts_ns,
      |    CASE WHEN lag(epoch_ns(ts), 1)
      |           OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
      |           IS NULL
      |         OR epoch_ns(ts) - lag(epoch_ns(ts), 1)
      |           OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
      |           > 1800000000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events),
      |numbered AS (
      |  SELECT user_id, ts_ns,
      |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM flagged)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |  count(*) AS n_events,
      |  min(ts_ns) // 1000000000 AS start_s,
      |  max(ts_ns) // 1000000000 AS end_s,
      |  max(ts_ns) // 1000000000 - min(ts_ns) // 1000000000 AS duration_s
      |FROM numbered GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** Ordered-sequence funnel (view → click → purchase): per user,
    * the first view, the first click strictly AFTER that view, the
    * first purchase strictly after that click — the product-analytics
    * conversion primitive (and the eval shape for agent-trajectory
    * "did step k follow step k-1" checks). Three filtered min-aggs
    * chained by equi-joins on user_id — each stage is one hash agg
    * over only its event type's rows (predicate pushed to the scan),
    * no window, no self-product; stage counts are monotone by
    * construction. Nanosecond longs throughout (never raw
    * timestamps — the ns/µs divergence discipline).
    */
  def eventFunnel(spark: SparkSession, dir: String): DataFrame = {
    // microsecond longs on BOTH sides (DuckDB TIMESTAMP is µs — raw
    // nanos would diverge in the last three digits), truncated BEFORE
    // every comparison so stage boundaries can never disagree
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr("ts_ns div 1000").as("ts_us"))
    val view = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts_us")).as("t_view_us"))
    val click = ev.filter(col("event_type") === "click")
      .join(view, "user_id")
      .filter(col("ts_us") > col("t_view_us"))
      .groupBy("user_id").agg(min(col("ts_us")).as("t_click_us"))
    val purchase = ev.filter(col("event_type") === "purchase")
      .join(click, "user_id")
      .filter(col("ts_us") > col("t_click_us"))
      .groupBy("user_id").agg(min(col("ts_us")).as("t_purchase_us"))
    view
      .join(click, Seq("user_id"), "left")
      .join(purchase, Seq("user_id"), "left")
      .withColumn("stage",
        (lit(1L) + when(col("t_click_us").isNotNull, 1L).otherwise(0L) +
          when(col("t_purchase_us").isNotNull, 1L).otherwise(0L)))
      .select(col("user_id"), col("stage"),
        col("t_view_us"), col("t_click_us"), col("t_purchase_us"))
      .orderBy("user_id")
  }

  val eventFunnelSql: String =
    """WITH v AS (
      |  SELECT user_id, min(epoch_us(ts)) AS t_view_us
      |  FROM events WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, min(epoch_us(e.ts)) AS t_click_us
      |  FROM events e JOIN v ON v.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t_view_us
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase_us
      |  FROM events e JOIN c ON c.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t_click_us
      |  GROUP BY e.user_id)
      |SELECT v.user_id,
      |  CAST(1 + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
      |    + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS stage,
      |  v.t_view_us, c.t_click_us, p.t_purchase_us
      |FROM v LEFT JOIN c ON c.user_id = v.user_id
      |       LEFT JOIN p ON p.user_id = v.user_id
      |ORDER BY v.user_id""".stripMargin

  /** Hourly tumbling-window aggregation via Spark's `window()` — the
    * exact construct Structured Streaming uses, here in batch.
    */
  def eventTumbling(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .select(
        unix_timestamp(col("w.start")).as("hour_s"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("hour_s", "event_type")

  val eventTumblingSql: String =
    """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_s,
      |       event_type, count(*) AS n,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY hour_s, event_type
      |ORDER BY hour_s, event_type""".stripMargin

  /** HOPPING (sliding) windows — the overlap member of the window
    * family beside [[eventTumbling]]: 1-hour windows every 15
    * minutes, so each event lands in exactly 4 overlapping windows
    * and a spike is visible at 15-minute resolution with a full
    * hour's context. Uses the native `window(ts, size, slide)`
    * surface (the same Structured Streaming would use); the
    * replication factor is size/slide — fixed and small, the
    * documented cost of hop resolution. Integer-µs window starts and
    * DECIMAL cents keep both engines bit-identical; the oracle
    * reconstructs the 4 epoch-aligned grid starts per event with
    * `generate_series`.
    */
  def eventHopping(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        (sum(dec(col("value"))) * 100).cast("long").as("cents"))
      .select(
        unix_micros(col("w.start")).as("win_start_us"),
        col("event_type"), col("n"), col("cents"))
      .orderBy("win_start_us", "event_type")

  val eventHoppingSql: String =
    """WITH e AS (
      |  SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v,
      |    (epoch_ns(ts) // 1000 // 900000000) * 900000000
      |      - u.k * 900000000 AS win_start_us
      |  FROM events, LATERAL (SELECT unnest(generate_series(0, 3)) AS k) u)
      |SELECT win_start_us, event_type, count(*) AS n,
      |  CAST(sum(v) * 100 AS BIGINT) AS cents
      |FROM e GROUP BY win_start_us, event_type
      |ORDER BY win_start_us, event_type""".stripMargin

  // ----------------------------------------------------------------
  // Skew handling: salted join (scale technique, oracle = plain join)
  // ----------------------------------------------------------------

  /** Salted shuffle join: the dimension side is replicated once per
    * salt bucket and the fact side picks a deterministic bucket, so a
    * hot key's rows spread over `SaltBuckets` reducers instead of one
    * straggler task. Result is identical to the unsalted join (the
    * oracle) — this registers the *technique* behind AQE's skew-join
    * for cases AQE can't see (e.g. pre-aggregation skew).
    */
  def joinSalted(spark: SparkSession, dir: String): DataFrame = {
    val SaltBuckets = 8
    val fact = t(spark, dir, "orders")
      .withColumn("salt", pmod(col("o_orderkey"), lit(SaltBuckets)).cast("int"))
    val dim = t(spark, dir, "customer")
      .withColumn("salt", explode(sequence(lit(0), lit(SaltBuckets - 1))))
    fact.join(dim,
        fact("o_custkey") === dim("c_custkey") && fact("salt") === dim("salt"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
      .orderBy("c_mktsegment")
  }

  val joinSaltedSql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Bloom-pruned fact join ([[graft.functions.BloomSketch]]): the
    * selective dim side (urgent 1996 orders, ~3% of the table) folds
    * its keys into ONE 8 KiB bit array via the distributed
    * Aggregator (partial buffers OR-merge map-side; the driver sees
    * a single row), and the fact side filters through the codegen'd
    * `bloom_might_contain` probe BEFORE the join — at 100 TB the
    * ~97% of lineitem that cannot join is dropped at the scan, never
    * shuffled. The exact equi-join that follows removes bloom false
    * positives, so the composition's result (and oracle) is the
    * plain join's — the explicit form of Spark's own injected
    * runtime bloom filter, with deterministic mix64 double hashing
    * instead of the engine-internal one.
    */
  def joinBloom(spark: SparkSession, dir: String): DataFrame = {
    val dim = t(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" &&
        year(col("o_orderdate")) === 1996)
    val bloom = dim.select(col("o_orderkey"))
      .as(org.apache.spark.sql.Encoders.scalaLong)
      .select(graft.functions.BloomSketch.toColumn)
      .head()
    val li = t(spark, dir, "lineitem")
      .filter(graft.functions.BloomSketch.mightContain(bloom, col("l_orderkey")))
    li.join(dim, li("l_orderkey") === dim("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"))
      .orderBy("l_returnflag")
  }

  /** Oracle: the plain join — the bloom stage is semantically
    * transparent by construction.
    */
  val joinBloomSql: String =
    """SELECT l_returnflag, count(*) AS n_lines,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT' AND extract(year FROM o_orderdate) = 1996
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ----------------------------------------------------------------
  // Exact percentiles (interpolated) per group
  // ----------------------------------------------------------------

  /** Exact linear-interpolated quartiles of order totals per status —
    * Spark `percentile` and DuckDB `quantile_cont` share the
    * interpolation rule, so values hash-match (integral cents input).
    */
  def aggPercentile(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("round(percentile(o_totalprice, 0.25), 4)").as("p25"),
        expr("round(percentile(o_totalprice, 0.5), 4)").as("p50"),
        expr("round(percentile(o_totalprice, 0.75), 4)").as("p75"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  val aggPercentileSql: String =
    """SELECT o_orderstatus,
      |  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
      |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      |  round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
      |  count(*) AS n
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Top-3 priciest parts per brand through the custom
    * [[graft.plans.TopKPerKey]] physical operator (map-side bounded
    * heaps -> shuffle only survivors) — same result set as the
    * window-rank formulation `window_topk` minus rank ties (row_number
    * semantics with a partkey tiebreak), which is what the oracle
    * expresses.
    */
  def topkCustom(spark: SparkSession, dir: String): DataFrame =
    graft.plans.TopK.topKPerKey(
      t(spark, dir, "part").select(
        col("p_brand"), col("p_partkey"), col("p_retailprice")),
      keyNames = Seq("p_brand"),
      orderSpec = Seq("p_retailprice" -> true, "p_partkey" -> false),
      k = 3)
      .orderBy("p_brand", "p_partkey")

  val topkCustomSql: String =
    """SELECT p_brand, p_partkey, p_retailprice FROM (
      |  SELECT p_brand, p_partkey, p_retailprice,
      |         row_number() OVER (PARTITION BY p_brand
      |                            ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
      |  FROM part) WHERE rn <= 3
      |ORDER BY p_brand, p_partkey""".stripMargin

  // ----------------------------------------------------------------
  // Pivot, scalar subquery, grouping sets (SQL-surface coverage)
  // ----------------------------------------------------------------

  /** Pivot event types into columns per user (relational pivot; the
    * oracle expresses the same thing with portable CASE aggregation).
    */
  def aggPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .pivot(col("event_type"), Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("user_id"), col("click"), col("view"), col("purchase"),
        col("signup"), col("error"))
      .orderBy("user_id")

  val aggPivotSql: String =
    """SELECT user_id,
      |  count(*) FILTER (event_type = 'click') AS click,
      |  count(*) FILTER (event_type = 'view') AS view,
      |  count(*) FILTER (event_type = 'purchase') AS purchase,
      |  count(*) FILTER (event_type = 'signup') AS signup,
      |  count(*) FILTER (event_type = 'error') AS error
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Exact per-key MODE (most frequent value, ties to the smallest) —
    * the categorical summary `pivot` can't give when the domain is
    * unbounded. Two-level aggregation: counts per (key, value), then
    * per key the lexicographic-min of (−count, value) — both levels
    * hash aggs with map-side partials, so the fact table is never
    * sorted per key and no value list is ever collected (the
    * `collect_list`-then-driver-mode anti-shape). The oracle replays
    * the pick as a QUALIFY rank over the same count relation.
    */
  def aggMode(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
      .groupBy("user_id")
      .agg(
        min_by(col("event_type"),
          struct((-col("cnt")).as("nc"), col("event_type"))).as("mode_type"),
        max(col("cnt")).as("mode_cnt"),
        count(lit(1)).as("n_types"))
      .select(col("user_id"), col("mode_type"),
        col("mode_cnt").cast("long").as("mode_cnt"),
        col("n_types").cast("long").as("n_types"))
      .orderBy("user_id")

  val aggModeSql: String =
    """WITH c AS (
      |  SELECT user_id, event_type, count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT user_id, event_type AS mode_type, cnt AS mode_cnt,
      |    count(*) OVER (PARTITION BY user_id) AS n_types
      |  FROM c
      |  QUALIFY row_number() OVER (PARTITION BY user_id
      |    ORDER BY cnt DESC, event_type ASC) = 1)
      |SELECT user_id, mode_type, CAST(mode_cnt AS BIGINT) AS mode_cnt,
      |  CAST(n_types AS BIGINT) AS n_types
      |FROM m ORDER BY user_id""".stripMargin

  /** UNPIVOT (wide → long melt), the inverse of [[aggPivot]]: the
    * per-source document summary flattened to (source, metric,
    * value) rows via `stack` — a Generator, so the reshape is
    * rowwise with zero extra shuffle beyond the summary agg itself.
    * The long form is what metric stores and plotting layers ingest.
    */
  def aggUnpivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        max(col("n_chars")).as("max_chars"),
        min(col("n_chars")).as("min_chars"))
      .select(col("source"), expr(
        """stack(4,
          |  'max_chars', max_chars,
          |  'min_chars', min_chars,
          |  'n_docs', n_docs,
          |  'total_chars', total_chars) AS (metric, value)""".stripMargin))
      .select(col("source"), col("metric"), col("value").cast("long").as("value"))
      .orderBy("source", "metric")

  val aggUnpivotSql: String =
    """WITH w AS (
      |  SELECT source, count(*) AS n_docs, sum(n_chars) AS total_chars,
      |    max(n_chars) AS max_chars, min(n_chars) AS min_chars
      |  FROM documents GROUP BY source)
      |SELECT source, u.metric, CAST(u.value AS BIGINT) AS value
      |FROM w, LATERAL (VALUES
      |  ('max_chars', max_chars), ('min_chars', min_chars),
      |  ('n_docs', n_docs), ('total_chars', total_chars)) AS u(metric, value)
      |ORDER BY source, metric""".stripMargin

  /** Scalar + correlated subqueries (Catalyst de-correlates to joins):
    * customers whose balance exceeds their nation's average.
    */
  def scalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "customer").createOrReplaceTempView("graft_customer")
    spark.sql(
      """SELECT c_custkey, c_name,
        |       CAST(round(c_acctbal, 2) AS DOUBLE) AS acctbal
        |FROM graft_customer c
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM graft_customer
        |                   WHERE c_nationkey = c.c_nationkey)
        |  AND c_acctbal > (SELECT avg(c_acctbal) FROM graft_customer)
        |ORDER BY c_custkey""".stripMargin)
  }

  val scalarSubquerySql: String =
    """SELECT c_custkey, c_name,
      |       CAST(round(c_acctbal, 2) AS DOUBLE) AS acctbal
      |FROM customer c
      |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
      |                   WHERE c_nationkey = c.c_nationkey)
      |  AND c_acctbal > (SELECT avg(c_acctbal) FROM customer)
      |ORDER BY c_custkey""".stripMargin

  /** Arbitrary GROUPING SETS (beyond rollup/cube): totals by status,
    * by priority, and overall — one shuffle via Expand.
    */
  def aggGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("graft_orders")
    spark.sql(
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM graft_orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin)
  }

  val aggGroupingSetsSql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |       coalesce(o_orderpriority, 'ALL') AS priority,
      |       count(*) AS n,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY status, priority""".stripMargin

  // ----------------------------------------------------------------
  // TPC-H-shape multi-join headliners (Q3 / Q5 adapted to the schema)
  // ----------------------------------------------------------------

  /** Q3 shape: top-10 highest-revenue BUILDING-segment orders shipped
    * after the cutoff — 3-way join, group, deterministic top-k.
    */
  def q3Shipping(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-01-01").cast("timestamp")
    val c = t(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(spark, dir, "orders").filter(col("o_orderdate") < cutoff)
    val li = t(spark, dir, "lineitem").filter(col("l_shipdate") > cutoff)
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(li, o("o_orderkey") === li("l_orderkey"))
      .groupBy(col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("order_epoch_s"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
  }

  val q3ShippingSql: String =
    """SELECT o_orderkey,
      |       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS order_epoch_s,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |         AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY o_orderkey, order_epoch_s
      |ORDER BY revenue DESC, o_orderkey ASC
      |LIMIT 10""".stripMargin

  /** Q5 shape: revenue by nation for ASIA customers in 1997 — 6-way
    * join; the three dimension tables broadcast, the fact-fact join
    * shuffles once on orderkey.
    */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = t(spark, dir, "lineitem")
    val sup = t(spark, dir, "supplier")
    val n = t(spark, dir, "nation")
    val r = t(spark, dir, "region").filter(col("r_name") === "ASIA")
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(li, o("o_orderkey") === li("l_orderkey"))
      .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey") &&
        c("c_nationkey") === sup("s_nationkey"))
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  val q5LocalSupplierSql: String =
    """SELECT n_name,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |         AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name ASC""".stripMargin

  /** Multiset set-ops (ALL variants): duplicate-preserving intersect
    * and except over per-order line counts.
    */
  def setOpsAll(spark: SparkSession, dir: String): DataFrame = {
    val a = t(spark, dir, "lineitem").select(col("l_orderkey").as("k"))
      .filter(col("l_orderkey") % 2 === 0)
    val b = t(spark, dir, "lineitem").select(col("l_orderkey").as("k"))
      .filter(col("l_orderkey") % 3 === 0)
    val inter = a.intersectAll(b).groupBy().agg(count(lit(1)).as("n"))
      .withColumn("op", lit("intersect_all"))
    val exc = a.exceptAll(b).groupBy().agg(count(lit(1)).as("n"))
      .withColumn("op", lit("except_all"))
    val union = a.unionAll(b).groupBy().agg(count(lit(1)).as("n"))
      .withColumn("op", lit("union_all"))
    inter.unionByName(exc).unionByName(union)
      .select(col("op"), col("n")).orderBy("op")
  }

  val setOpsAllSql: String =
    """WITH a AS (SELECT l_orderkey AS k FROM lineitem WHERE l_orderkey % 2 = 0),
      |     b AS (SELECT l_orderkey AS k FROM lineitem WHERE l_orderkey % 3 = 0),
      |     tagged AS (
      |  SELECT 'intersect_all' AS op, count(*) AS n
      |  FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
      |  UNION ALL
      |  SELECT 'except_all' AS op, count(*) AS n
      |  FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
      |  UNION ALL
      |  SELECT 'union_all' AS op, count(*) AS n
      |  FROM (SELECT k FROM a UNION ALL SELECT k FROM b))
      |SELECT op, n FROM tagged ORDER BY op""".stripMargin

  /** Ranking-function family: dense_rank / percent_rank / cume_dist /
    * ntile per market segment (fully deterministic ordering via the
    * custkey tiebreak).
    */
  def windowRankFamily(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    t(spark, dir, "customer")
      .select(
        col("c_mktsegment"), col("c_custkey"),
        dense_rank().over(w).cast("long").as("drank"),
        percent_rank().over(w).as("prank"),
        cume_dist().over(w).as("cdist"),
        ntile(4).over(w).cast("long").as("quartile"))
      .filter(col("c_custkey") % 10 === 0) // sample to keep output small
      .orderBy("c_mktsegment", "c_custkey")
  }

  val windowRankFamilySql: String =
    """SELECT c_mktsegment, c_custkey, drank, prank, cdist, quartile
      |FROM (
      |  SELECT c_mktsegment, c_custkey,
      |    CAST(dense_rank() OVER w AS BIGINT) AS drank,
      |    percent_rank() OVER w AS prank,
      |    cume_dist() OVER w AS cdist,
      |    CAST(ntile(4) OVER w AS BIGINT) AS quartile
      |  FROM customer
      |  WINDOW w AS (PARTITION BY c_mktsegment
      |               ORDER BY c_acctbal DESC, c_custkey ASC))
      |WHERE c_custkey % 10 = 0
      |ORDER BY c_mktsegment, c_custkey""".stripMargin

  /** TPC-H Q6 shape: the forecast-revenue-change scan-heavy filter
    * aggregate — predicate pushdown plus a single global agg.
    */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(
        sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))

  val q6ForecastSql: String =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |              * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |       count(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** Qty threshold for [[q18LargeOrders]]: TPC-H specifies 300–315,
    * but the gate corpora top out near 350 total units per order, so
    * 250 keeps the HAVING survivors non-vacuous at every SF (204
    * orders at sf0.01, 25 at sf0.001) while still selecting the
    * extreme tail TPC-H intends (~0.3% of orders).
    */
  private val Q18Qty = 250L

  /** TPC-H Q18 (large-volume customers, round 15): orders whose total
    * lineitem quantity exceeds [[Q18Qty]], with customer attribution,
    * top 100 by order value. The reference pattern for "HAVING over a
    * fact rollup feeds the join": the qualifying orderkey set is a
    * ~0.3% survivor relation, so after ONE map-side-combinable
    * lineitem aggregation it BROADCASTS into the orders and customer
    * probes — no fact-fact shuffle join anywhere — and the top-100 is
    * TakeOrderedAndProject, never a global sort. Money in integer
    * cents, dates as epoch seconds (the q3 rails).
    */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    // LONG aggregation buffer (round 16, guide §2.3 narrower types):
    // quantities sum in exact integer hundredths — Σ(100q) div 100 ==
    // trunc(Σq) for the non-negative sums here — so the fact-scale
    // hash agg runs on longs instead of the DECIMAL slow path.
    val big = t(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum((dec(col("l_quantity")) * 100).cast("long")).as("sum_qc"))
      .select(col("l_orderkey"), expr("sum_qc div 100").as("sum_qty"))
      .filter(col("sum_qty") > Q18Qty)
    val o = t(spark, dir, "orders").select(
      col("o_orderkey"), col("o_custkey"),
      unix_timestamp(col("o_orderdate")).as("order_epoch_s"),
      (dec(col("o_totalprice")) * 100).cast("long").as("totalprice_c"))
    val c = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"))
    o.join(broadcast(big), o("o_orderkey") === big("l_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("order_epoch_s"), col("totalprice_c"), col("sum_qty"))
      .orderBy(col("totalprice_c").desc, col("o_orderkey").asc)
      .limit(100)
  }

  val q18LargeOrdersSql: String =
    s"""SELECT c_name, c_custkey, o_orderkey,
       |  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS order_epoch_s,
       |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
       |    AS totalprice_c,
       |  big.sum_qty
       |FROM orders
       |JOIN (SELECT l_orderkey,
       |        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS BIGINT)
       |          AS sum_qty
       |      FROM lineitem GROUP BY 1
       |      HAVING sum_qty > $Q18Qty) big ON big.l_orderkey = o_orderkey
       |JOIN customer ON c_custkey = o_custkey
       |ORDER BY totalprice_c DESC, o_orderkey ASC
       |LIMIT 100""".stripMargin

  /** Late threshold for [[q21WaitingSuppliers]]: the corpus carries no
    * receipt/commit dates (TPC-H Q21's lateness columns), so "late"
    * is adapted to ship-lag > 60 days after the order date —
    * documented deviation, same query shape.
    */
  private val Q21LateDays = 60

  /** TPC-H Q21 (suppliers who kept orders waiting; adapted lateness
    * predicate, see [[Q21LateDays]]): suppliers who were the ONLY
    * late supplier on a multi-supplier order, counted per supplier,
    * top 100. The textbook formulation is EXISTS (another supplier on
    * the order) AND NOT EXISTS (another LATE supplier) — two
    * correlated self-joins of the fact table; the distributed rewrite
    * here is ONE aggregation: per order, count distinct suppliers,
    * count distinct late suppliers, and keep max(late supplier), then
    * an order qualifies for that supplier iff `n_supp ≥ 2 ∧ n_late =
    * 1` (when exactly one late supplier exists, the max IS it). Same
    * relation, zero self-joins — the fact table is read once into a
    * map-side-combinable hash agg, then order-grain rows roll up per
    * supplier and the top-100 is TakeOrderedAndProject.
    */
  def q21WaitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders").select(col("o_orderkey"), col("o_orderdate"))
    val li = t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        datediff(col("l_shipdate"), col("o_orderdate")) > Q21LateDays)
    // Two-stage distinct (round 16, guide §2.3): the twin
    // countDistincts planned an Expand — every joined lineitem row
    // multiplied per distinct child before the exchange. Grouping by
    // (order, supplier) first is map-side combinable and feeds the
    // per-order rollup with supplier-grain rows; n_supp/n_late/
    // late_supp fold out exactly (group keys are distinct suppliers;
    // any_late marks suppliers with ≥ 1 late line).
    val perSupp = li.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("late")).as("any_late"))
    val perOrder = perSupp.groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).as("n_supp"),
        sum(when(col("any_late"), 1L).otherwise(0L)).as("n_late"),
        max(when(col("any_late"), col("l_suppkey"))).as("late_supp"))
      .filter(col("n_supp") >= 2 && col("n_late") === 1)
    perOrder
      .groupBy(col("late_supp").as("s_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(t(spark, dir, "supplier").select(col("s_suppkey"), col("s_name")),
        "s_suppkey")
      .select(col("s_name"), col("s_suppkey"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(100)
  }

  val q21WaitingSuppliersSql: String =
    s"""WITH li AS (
       |  SELECT l_orderkey, l_suppkey,
       |    date_diff('day', CAST(o_orderdate AS DATE),
       |      CAST(l_shipdate AS DATE)) > $Q21LateDays AS late
       |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
       |per_order AS (
       |  SELECT l_orderkey,
       |    count(DISTINCT l_suppkey) AS n_supp,
       |    count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late,
       |    max(CASE WHEN late THEN l_suppkey END) AS late_supp
       |  FROM li GROUP BY 1)
       |SELECT s_name, s_suppkey, count(*) AS numwait
       |FROM per_order JOIN supplier ON s_suppkey = late_supp
       |WHERE n_supp >= 2 AND n_late = 1
       |GROUP BY 1, 2
       |ORDER BY numwait DESC, s_name ASC
       |LIMIT 100""".stripMargin

  /** Dormancy horizon for [[q22GlobalSales]], in days before the
    * corpus's max order date. Corpus-derived rather than a literal
    * date: this generator gives EVERY customer at least one order, so
    * Q22's textbook "never ordered" arm is empty at every SF — the
    * vacuous-green failure class — while "no order in the trailing
    * 180 days" selects a real dormant tail (30 customers at sf0.001,
    * 322 at sf0.01) and survives corpus regeneration.
    */
  private val Q22DormantDays = 180

  /** TPC-H Q22 (global sales opportunity; adapted — the corpus has no
    * c_phone, so the country grouping is c_nationkey, and "never
    * ordered" becomes "dormant for [[Q22DormantDays]] days", see
    * there): customers with ABOVE-AVERAGE positive account balance
    * and no recent order, rolled up per nation. The average
    * comparison is INTEGER-EXACT by cross-multiplying
    * (c_cents · n_pos > sum_pos_cents — no float average enters),
    * both 1-row aggregates broadcast (the sanctioned scalar-subquery
    * shape), and dormancy is one LEFT ANTI join against the
    * recent-orderer key set. One fact pass each over customer and
    * orders, nation-grain output.
    */
  def q22GlobalSales(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"),
        (dec(col("c_acctbal")) * 100).cast("long").as("bal_c"))
    val pos = c.filter(col("bal_c") > 0L)
      .agg(count(lit(1)).as("n_pos"),
        sum(col("bal_c")).cast("long").as("sum_pos_c"))
    val o = t(spark, dir, "orders").select(col("o_custkey"), col("o_orderdate"))
    val mx = o.agg(max(col("o_orderdate")).as("mx_date"))
    val recent = o.crossJoin(broadcast(mx)) // 1-row aggregate
      .filter(col("o_orderdate") >=
        expr(s"mx_date - INTERVAL $Q22DormantDays DAYS"))
      .select(col("o_custkey").as("c_custkey")).distinct()
    c.crossJoin(broadcast(pos)) // 1-row aggregate
      .filter(col("bal_c") > 0L &&
        col("bal_c") * col("n_pos") > col("sum_pos_c"))
      .join(recent, Seq("c_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), sum(col("bal_c")).as("totacctbal_c"))
      .orderBy("c_nationkey")
  }

  val q22GlobalSalesSql: String =
    s"""WITH c AS (
       |  SELECT c_custkey, c_nationkey,
       |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_c
       |  FROM customer),
       |pos AS (
       |  SELECT count(*) AS n_pos, CAST(sum(bal_c) AS BIGINT) AS sum_pos_c
       |  FROM c WHERE bal_c > 0),
       |mx AS (SELECT max(o_orderdate) AS mx_date FROM orders),
       |recent AS (
       |  SELECT DISTINCT o_custkey FROM orders, mx
       |  WHERE o_orderdate >= mx_date - INTERVAL $Q22DormantDays DAY)
       |SELECT c_nationkey, count(*) AS numcust,
       |  CAST(sum(bal_c) AS BIGINT) AS totacctbal_c
       |FROM c, pos
       |WHERE bal_c > 0 AND bal_c * n_pos > sum_pos_c
       |  AND NOT EXISTS (SELECT 1 FROM recent WHERE o_custkey = c_custkey)
       |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** RANGE-frame window: per part type, each part's price vs the
    * average over parts within +/-5 size units (value-range frame, the
    * ROWS-frame complement of window_running).
    */
  def windowRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("p_type").orderBy(col("p_size").cast("long"))
      .rangeBetween(-5L, 5L)
    t(spark, dir, "part")
      .select(
        col("p_type"), col("p_partkey"), col("p_size").cast("long").as("p_size"),
        dec(col("p_retailprice")).as("price"))
      .withColumn("n_near", count(lit(1)).over(w))
      .withColumn("sum_near", sum(col("price")).over(w).cast("double"))
      .select(col("p_type"), col("p_partkey"), col("p_size"),
        col("n_near"), col("sum_near"))
      .orderBy("p_type", "p_partkey")
  }

  val windowRangeFrameSql: String =
    """SELECT p_type, p_partkey, CAST(p_size AS BIGINT) AS p_size,
      |  count(*) OVER w AS n_near,
      |  CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
      |    AS sum_near
      |FROM part
      |WINDOW w AS (PARTITION BY p_type ORDER BY CAST(p_size AS BIGINT)
      |             RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING)
      |ORDER BY p_type, p_partkey""".stripMargin

  /** Schema-typed JSON parsing (`from_json` -> struct), the typed
    * complement of `get_json_object`: malformed/missing fields become
    * nulls, counted per event type.
    */
  def jsonStruct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("parsed", from_json(col("props"), lit("k INT")))
      .select(col("event_type"),
        col("parsed.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        count(col("k")).as("n_parsed"),
        sum(col("k")).as("sum_k"))
      .orderBy("event_type")

  val jsonStructSql: String =
    """SELECT event_type, count(*) AS n,
      |       count(k) AS n_parsed,
      |       CAST(sum(k) AS BIGINT) AS sum_k
      |FROM (SELECT event_type, TRY_CAST(props->>'k' AS BIGINT) AS k FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Sample variance/stddev from exact moments: quantities are
    * integral doubles, so Σx and Σx² are exact and the closed form
    * (nΣx² − (Σx)²) / (n(n−1)) is bit-deterministic on both engines —
    * unlike the built-in streaming stddev implementations, which
    * accumulate differently.
    */
  def aggVariance(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity")).as("s1"),
        sum(col("l_quantity") * col("l_quantity")).as("s2"))
      .withColumn("variance",
        (col("n") * col("s2") - col("s1") * col("s1")) /
          (col("n") * (col("n") - 1)))
      .withColumn("stddev", sqrt(col("variance")))
      .orderBy("l_returnflag")

  val aggVarianceSql: String =
    """SELECT l_returnflag, count(*) AS n,
      |       sum(l_quantity) AS s1,
      |       sum(l_quantity * l_quantity) AS s2,
      |       (count(*) * sum(l_quantity * l_quantity)
      |         - sum(l_quantity) * sum(l_quantity))
      |         / (count(*) * (count(*) - 1)) AS variance,
      |       sqrt((count(*) * sum(l_quantity * l_quantity)
      |         - sum(l_quantity) * sum(l_quantity))
      |         / (count(*) * (count(*) - 1))) AS stddev
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Date arithmetic: shipping latency in days (datediff) bucketed per
    * order priority — exact integer day counts, averaged as exact
    * sum/count.
    */
  def dateArith(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val li = t(spark, dir, "lineitem")
    o.join(li, o("o_orderkey") === li("l_orderkey"))
      .withColumn("lat_days",
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("lat_days")).as("sum_days"),
        min(col("lat_days")).as("min_days"),
        max(col("lat_days")).as("max_days"))
      .withColumn("avg_days", col("sum_days").cast("double") / col("n"))
      .orderBy("o_orderpriority")
  }

  val dateArithSql: String =
    """SELECT o_orderpriority, count(*) AS n,
      |       CAST(sum(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT)
      |         AS sum_days,
      |       CAST(min(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT)
      |         AS min_days,
      |       CAST(max(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT)
      |         AS max_days,
      |       CAST(sum(date_diff('day', o_orderdate, l_shipdate)) AS DOUBLE)
      |         / count(*) AS avg_days
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Period-over-period GROWTH (the WoW/MoM BI primitive): weekly
    * revenue deltas and growth rates vs the previous week. The
    * window runs over the AGGREGATED weekly relation (hundreds of
    * rows — reduce first, window the reduction; a single-partition
    * sort of week-grain rows is free at any corpus scale), and
    * growth is BIGINT cents with a ppm floor division — envelope:
    * weekly cents × 10⁶ must stay under 2⁶³, true through
    * petabyte-scale retail revenue.
    */
  def windowGrowth(spark: SparkSession, dir: String): DataFrame = {
    val weekly = t(spark, dir, "orders")
      .groupBy(unix_timestamp(date_trunc("week", col("o_orderdate")))
        .as("week_s"))
      .agg((sum(dec(col("o_totalprice"))) * 100).cast("long").as("rev_cents"))
    // unpartitioned BY DESIGN: the lag walks week-grain rows (one per
    // calendar week — bounded by elapsed time, not data size)
    val w = org.apache.spark.sql.expressions.Window.orderBy("week_s")
    weekly
      .withColumn("prev", lag(col("rev_cents"), 1).over(w))
      .filter(col("prev").isNotNull && col("prev") =!= 0L)
      // deltas go NEGATIVE here (unlike every other ppm query, whose
      // numerators are counts): both engines' integer division
      // truncates toward zero on BIGINT (Spark `div`, DuckDB `//` —
      // DuckDB floors only for FLOATs), verified by the gate on 172
      // down-weeks
      .select(col("week_s"), col("rev_cents"),
        (col("rev_cents") - col("prev")).as("delta_cents"),
        expr("(rev_cents - prev) * 1000000 div prev").as("growth_ppm"))
      .orderBy("week_s")
  }

  val windowGrowthSql: String =
    """WITH weekly AS (
      |  SELECT CAST(floor(epoch(date_trunc('week', o_orderdate))) AS BIGINT)
      |      AS week_s,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
      |      AS rev_cents
      |  FROM orders GROUP BY 1),
      |g AS (
      |  SELECT week_s, rev_cents,
      |    lag(rev_cents) OVER (ORDER BY week_s) AS prev
      |  FROM weekly)
      |SELECT week_s, rev_cents, rev_cents - prev AS delta_cents,
      |  CAST((rev_cents - prev) * 1000000 // prev AS BIGINT) AS growth_ppm
      |FROM g WHERE prev IS NOT NULL AND prev != 0
      |ORDER BY week_s""".stripMargin

  /** WEIGHTED median — the volume-weighted "typical price" no
    * built-in percentile gives (percentile weights rows equally;
    * here a 40-unit line counts 40×): smallest price whose
    * cumulative quantity covers half the group's total. Exact
    * DECIMAL arithmetic end-to-end (quantities and prices are
    * integral cents — no interpolation, no floats until the output
    * cast), and the scale shape pre-aggregates BY PRICE before the
    * window, so the cumulative sum walks distinct price points
    * (bounded domain), not raw lineitems.
    *
    * Plan shape (round-7 rework): NO window anywhere — the previous
    * formulation's cumulative sum ran under `partitionBy
    * (l_returnflag)`, i.e. 3 tasks however large the corpus, the one
    * serialization point the round-6 plan audit flagged. The
    * replacement is a partition-parallel two-phase bisection on
    * cumulative mass, all joins bounded (round 16 cut it from three
    * fact passes to TWO — see [[WmBinCents]]):
    *   1. one fact pass binning RAW rows into fixed
    *      [[WmBinCents]]-wide integer-cent bins (BIGINT floor
    *      division — deterministic on both engines, and needing NO
    *      data-derived range): shuffle state is flags × live-bins
    *      map-side-combined groups, NOT the price domain the old
    *      by-price pre-agg shuffled; per-flag total mass folds out
    *      of this same aggregate (3 rows);
    *   2. bin-level cumulative mass via a bounded self-join over the
    *      checkpointed flags×bins relation (≤ B² pairs per flag,
    *      partition-parallel, no sort — B bounded by the price
    *      domain, not the corpus);
    *   3. a second fact pass keeping only the selected bin (~1/B of
    *      rows), aggregated by price, then the exact walk as a
    *      bounded self-join over the ~domain/B in-bin price points.
    * Exact DECIMAL arithmetic end-to-end is unchanged (the round-5
    * measurement that killed an earlier bin rework was the
    * un-checkpointed by-price lineage re-running per branch — the
    * raw-row binning removes that relation entirely). At 100 TB
    * every stage is a pruned scan + tiny hash agg or a bins-bounded
    * join; nothing serializes onto a 3-partition window.
    * Plan-pinned window-free in `PlanQualitySpec`. Measured sf0.1:
    * hot 2.6 s vs the window shape's 2.1 — the ~0.5 s is the third
    * fact pass, the honest cost of exactness without a domain-wide
    * shuffle; at cluster scale the three passes are embarrassingly
    * parallel while the window shape pinned the whole cumulative
    * walk on 3 tasks.
    */
  private val WmBins = 1024L

  /** Fixed bin width for [[aggWeightedMedian]]'s bisection, in
    * CENTS (round 16, guide §1.2): binning by `pc div width` instead
    * of `(pc − mn) · B div (mx − mn)` deletes the min/max pre-pass —
    * the whole first fact scan — because the bin function no longer
    * depends on a data-derived range, and per-flag total mass folds
    * out of the bin aggregate itself. The bin COUNT is bounded by
    * the price DOMAIN (l_extendedprice ≤ ~$110k ⟹ ≤ ~700 live bins
    * at $163.84/bin), not by corpus size, so the bounded-self-join
    * argument is unchanged at 100 TB. The median value is exact
    * under ANY binning (bisect to the crossing bin, exact in-bin
    * walk), so the output is bit-identical to the 1024-equal-width
    * formulation and the oracle needs no lockstep change.
    */
  private val WmBinCents = 16384L

  def aggWeightedMedian(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_returnflag"), dec(col("l_extendedprice")).as("p"),
        dec(col("l_quantity")).as("q"))
      .withColumn("pc", (col("p") * 100).cast("long")) // exact cents
    // FIRST fact pass: bin RAW rows by fixed cent width — shuffle
    // state is flags × live-bins groups (map-side combined), NOT the
    // price domain; checkpointed so the cumulative self-join and the
    // per-flag totals read memory, not more fact scans
    val binAgg = li
      .select(col("l_returnflag"), col("q"),
        expr(s"pc div $WmBinCents").as("bin"))
      .groupBy(col("l_returnflag"), col("bin"))
      .agg(sum(col("q")).as("bq")).localCheckpoint(true)
    // per-flag total mass, derived from the bin aggregate (3 rows) —
    // the old separate min/max/total fact pass is gone
    val stats = binAgg.groupBy("l_returnflag")
      .agg(sum(col("bq")).as("tq")).localCheckpoint(true)
    // bin-level cumulative: b.bin <= a.bin self-join, ≤ B² pairs/flag
    val cumB = binAgg
      .join(binAgg.toDF("l_returnflag", "bin2", "bq2"), "l_returnflag")
      .filter(col("bin2") <= col("bin"))
      .groupBy(col("l_returnflag"), col("bin"))
      .agg(sum(col("bq2")).as("cum"),
        sum(when(col("bin2") === col("bin"), col("bq2"))).as("obq"))
    val selBin = cumB.join(broadcast(stats), "l_returnflag")
      .filter(col("cum") * 2 >= col("tq"))
      .groupBy("l_returnflag").agg(min(col("bin")).as("bin_sel"))
    val sel = selBin.join(cumB.toDF("l_returnflag", "bin_sel", "cum", "obq"),
        Seq("l_returnflag", "bin_sel"))
      .select(col("l_returnflag"), col("bin_sel"),
        (col("cum") - col("obq")).as("prior")) // mass strictly below the bin
    // SECOND (final) fact pass keeps only the selected bin (~1/B of
    // rows), aggregated by price; checkpointed for the walk branches
    val inBin = li.join(broadcast(sel), "l_returnflag")
      .filter(expr(s"pc div $WmBinCents") === col("bin_sel"))
      .groupBy(col("l_returnflag"), col("p"), col("prior"))
      .agg(sum(col("q")).as("pq")).localCheckpoint(true)
    // exact in-bin walk: p2 <= p self-join over ~domain/B rows/flag
    val walk = inBin
      .join(inBin.select(col("l_returnflag"), col("p").as("p2"),
        col("pq").as("pq2")), "l_returnflag")
      .filter(col("p2") <= col("p"))
      .groupBy(col("l_returnflag"), col("p"), col("prior"))
      .agg(sum(col("pq2")).as("cw"))
    walk.join(broadcast(stats.select(col("l_returnflag"), col("tq"))), "l_returnflag")
      .filter((col("prior") + col("cw")) * 2 >= col("tq"))
      .groupBy("l_returnflag")
      .agg(max(col("tq")).cast("long").as("total_qty"),
        min(col("p")).cast("double").as("wmedian_price"))
      .orderBy("l_returnflag")
  }

  val aggWeightedMedianSql: String =
    s"""WITH li AS (
       |  SELECT l_returnflag, CAST(l_extendedprice AS DECIMAL(18,2)) AS p,
       |    CAST(l_quantity AS DECIMAL(18,2)) AS q,
       |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pc
       |  FROM lineitem),
       |st AS (
       |  SELECT l_returnflag, min(pc) AS mn, max(pc) AS mx, sum(q) AS tq
       |  FROM li GROUP BY 1),
       |bp AS (
       |  SELECT b.l_returnflag, b.p, b.q,
       |    CASE WHEN s.mx = s.mn THEN 0
       |         ELSE least(${WmBins - 1}, (b.pc - s.mn) * $WmBins // (s.mx - s.mn))
       |    END AS bin
       |  FROM li b JOIN st s USING (l_returnflag)),
       |ba AS (SELECT l_returnflag, bin, sum(q) AS bq FROM bp GROUP BY 1, 2),
       |cumb AS (
       |  SELECT a.l_returnflag, a.bin, sum(b.bq) AS cum,
       |    sum(CASE WHEN b.bin = a.bin THEN b.bq END) AS obq
       |  FROM ba a JOIN ba b
       |    ON b.l_returnflag = a.l_returnflag AND b.bin <= a.bin
       |  GROUP BY 1, 2),
       |selb AS (
       |  SELECT c.l_returnflag, min(c.bin) AS bin_sel
       |  FROM cumb c JOIN st USING (l_returnflag)
       |  WHERE c.cum * 2 >= st.tq GROUP BY 1),
       |sel AS (
       |  SELECT s.l_returnflag, s.bin_sel, c.cum - c.obq AS prior
       |  FROM selb s JOIN cumb c
       |    ON c.l_returnflag = s.l_returnflag AND c.bin = s.bin_sel),
       |ib AS (
       |  SELECT bp.l_returnflag, bp.p, sel.prior, sum(bp.q) AS pq
       |  FROM bp JOIN sel
       |    ON sel.l_returnflag = bp.l_returnflag AND bp.bin = sel.bin_sel
       |  GROUP BY 1, 2, 3),
       |wk AS (
       |  SELECT x.l_returnflag, x.p, x.prior, sum(y.pq) AS cw
       |  FROM ib x JOIN ib y
       |    ON y.l_returnflag = x.l_returnflag AND y.p <= x.p
       |  GROUP BY 1, 2, 3)
       |SELECT wk.l_returnflag, CAST(max(st.tq) AS BIGINT) AS total_qty,
       |  CAST(min(wk.p) AS DOUBLE) AS wmedian_price
       |FROM wk JOIN st USING (l_returnflag)
       |WHERE (wk.prior + wk.cw) * 2 >= st.tq
       |GROUP BY 1 ORDER BY 1""".stripMargin

  private val SkewTopK = 10

  /** JOIN-KEY SKEW diagnostic — the relation you read to DECIDE
    * salting (`join_salted` is the cure; this is the diagnosis):
    * the [[SkewTopK]] heaviest join keys with their exact integer
    * load shares (parts-per-million of all rows) and
    * multiple-of-mean ratios (×1000). At 100 TB this is one hash
    * agg (map-side combinable), a one-row broadcast of the totals,
    * and a TakeOrdered top-k — the full key histogram never
    * reaches the driver. All-BIGINT arithmetic: shares and ratios
    * are integer floor divisions, not float percentages.
    */
  def diagSkew(spark: SparkSession, dir: String): DataFrame = {
    val freq = t(spark, dir, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
    val tot = freq.agg(sum(col("cnt")).as("total"),
      count(lit(1)).as("n_keys"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("o_custkey").asc)
    freq.crossJoin(broadcast(tot))
      .orderBy(col("cnt").desc, col("o_custkey").asc).limit(SkewTopK)
      .withColumn("rn", row_number().over(w).cast("long"))
      .select(col("rn"), col("o_custkey").as("key"), col("cnt"),
        expr("cnt * 1000000 div total").as("share_ppm"),
        expr("cnt * n_keys * 1000 div total").as("xmean_x1000"))
      .orderBy("rn")
  }

  val diagSkewSql: String =
    s"""WITH f AS (
       |  SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey),
       |t AS (SELECT sum(cnt) AS total, count(*) AS n_keys FROM f),
       |r AS (
       |  SELECT o_custkey, cnt,
       |    row_number() OVER (ORDER BY cnt DESC, o_custkey ASC) AS rn
       |  FROM f)
       |SELECT CAST(rn AS BIGINT) AS rn, o_custkey AS key,
       |  CAST(cnt AS BIGINT) AS cnt,
       |  CAST(cnt * 1000000 // total AS BIGINT) AS share_ppm,
       |  CAST(cnt * n_keys * 1000 // total AS BIGINT) AS xmean_x1000
       |FROM r, t WHERE rn <= $SkewTopK ORDER BY rn""".stripMargin

  /** Relational DIVISION (Codd's ÷ — the "for ALL" join no built-in
    * operator spells): customers with orders in EVERY active order
    * year. The textbook double-NOT-EXISTS formulation nests two
    * correlated anti-joins; the scale shape used here is the
    * count-matching reduction — distinct (customer, year) pairs
    * (one hash agg), per-customer year counts (second agg, same
    * key: Catalyst reuses the exchange), and a broadcast one-row
    * divisor cardinality — because `distinct + count == |divisor|`
    * is division exactly when the pairs are a subset of the
    * divisor, which holds by construction. No per-divisor-element
    * probing, no anti-join cascade, nothing driver-side.
    */
  def joinDivision(spark: SparkSession, dir: String): DataFrame = {
    val cy = t(spark, dir, "orders")
      .select(col("o_custkey"), year(col("o_orderdate")).as("y"))
      .distinct()
    val divisor = cy.select(countDistinct(col("y")).as("t"))
    cy.groupBy("o_custkey").agg(count(lit(1)).as("n_years"))
      .crossJoin(broadcast(divisor))
      .filter(col("n_years") === col("t"))
      .select(col("o_custkey"), col("n_years"))
      .orderBy("o_custkey")
  }

  val joinDivisionSql: String =
    """WITH d AS (
      |  SELECT DISTINCT o_custkey, extract(year FROM o_orderdate) AS y
      |  FROM orders),
      |n AS (SELECT count(DISTINCT y) AS t FROM d)
      |SELECT o_custkey, count(*) AS n_years
      |FROM d GROUP BY o_custkey
      |HAVING count(*) = (SELECT t FROM n)
      |ORDER BY o_custkey""".stripMargin

  /** DATA-QUALITY CONTRACT report (the dbt-tests / deequ-shape
    * operator): declared constraints — primary-key uniqueness,
    * referential integrity, domain ranges, non-null/non-empty —
    * evaluated as ONE conditional-aggregation pass per table plus
    * one outer join for the foreign key, unpivoted to a
    * (check_name, n_violations, n_checked) report. This is the gate
    * a training pipeline runs before trusting a snapshot: at 100 TB
    * each check rides the same scan (conditional sums fuse into a
    * single hash agg per table, map-side combinable), never one
    * scan per assertion, and the FK probe is an equi-join, not a
    * per-row lookup. The one-row per-table aggregates cross-join
    * (broadcast, 1×1) into the stacked report.
    */
  def dqChecks(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val li = t(spark, dir, "lineitem")
    val oAgg = o.agg(
      count(lit(1)).as("o_n"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("o_pk_dup"),
      sum(when(dec(col("o_totalprice")) <= 0, 1L).otherwise(0L))
        .as("o_price_bad"),
      sum(when(col("o_orderdate").isNull ||
        year(col("o_orderdate")) < 1995 || year(col("o_orderdate")) > 2001,
        1L).otherwise(0L)).as("o_date_bad"))
    val fkAgg = o.join(broadcast(c.select(col("c_custkey"))),
        o("o_custkey") === col("c_custkey"), "left_outer")
      .agg(sum(when(col("c_custkey").isNull, 1L).otherwise(0L))
        .as("o_orphans"))
    val liAgg = li.agg(
      count(lit(1)).as("li_n"),
      sum(when(dec(col("l_quantity")) < 1 || dec(col("l_quantity")) > 50,
        1L).otherwise(0L)).as("li_qty_bad"))
    val cAgg = c.agg(
      count(lit(1)).as("c_n"),
      sum(when(col("c_name").isNull || length(col("c_name")) === 0,
        1L).otherwise(0L)).as("c_name_bad"))
    oAgg.crossJoin(fkAgg).crossJoin(liAgg).crossJoin(cAgg)
      .selectExpr(
        """stack(6,
          |  'customer.name_nonempty', c_name_bad, c_n,
          |  'lineitem.qty_in_1_50', li_qty_bad, li_n,
          |  'orders.date_in_range', o_date_bad, o_n,
          |  'orders.fk_customer', o_orphans, o_n,
          |  'orders.pk_unique', o_pk_dup, o_n,
          |  'orders.price_positive', o_price_bad, o_n
          |) as (check_name, n_violations, n_checked)""".stripMargin)
      .orderBy("check_name")
  }

  val dqChecksSql: String =
    """WITH o AS (
      |  SELECT count(*) AS n,
      |    count(*) - count(DISTINCT o_orderkey) AS pk_dup,
      |    sum(CASE WHEN CAST(o_totalprice AS DECIMAL(18,2)) <= 0
      |             THEN 1 ELSE 0 END) AS price_bad,
      |    sum(CASE WHEN o_orderdate IS NULL
      |             OR extract(year FROM o_orderdate) < 1995
      |             OR extract(year FROM o_orderdate) > 2001
      |             THEN 1 ELSE 0 END) AS date_bad
      |  FROM orders),
      |fk AS (
      |  SELECT sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS orphans
      |  FROM orders LEFT JOIN customer ON o_custkey = c_custkey),
      |l AS (
      |  SELECT count(*) AS n,
      |    sum(CASE WHEN CAST(l_quantity AS DECIMAL(18,2)) < 1
      |             OR CAST(l_quantity AS DECIMAL(18,2)) > 50
      |             THEN 1 ELSE 0 END) AS qty_bad
      |  FROM lineitem),
      |c AS (
      |  SELECT count(*) AS n,
      |    sum(CASE WHEN c_name IS NULL OR length(c_name) = 0
      |             THEN 1 ELSE 0 END) AS name_bad
      |  FROM customer)
      |SELECT * FROM (VALUES
      |  ('customer.name_nonempty', (SELECT CAST(name_bad AS BIGINT) FROM c),
      |    (SELECT CAST(n AS BIGINT) FROM c)),
      |  ('lineitem.qty_in_1_50', (SELECT CAST(qty_bad AS BIGINT) FROM l),
      |    (SELECT CAST(n AS BIGINT) FROM l)),
      |  ('orders.date_in_range', (SELECT CAST(date_bad AS BIGINT) FROM o),
      |    (SELECT CAST(n AS BIGINT) FROM o)),
      |  ('orders.fk_customer', (SELECT CAST(orphans AS BIGINT) FROM fk),
      |    (SELECT CAST(n AS BIGINT) FROM o)),
      |  ('orders.pk_unique', (SELECT CAST(pk_dup AS BIGINT) FROM o),
      |    (SELECT CAST(n AS BIGINT) FROM o)),
      |  ('orders.price_positive', (SELECT CAST(price_bad AS BIGINT) FROM o),
      |    (SELECT CAST(n AS BIGINT) FROM o)))
      |  t(check_name, n_violations, n_checked)
      |ORDER BY check_name""".stripMargin

  /** Columns profiled by [[dqProfile]] — the metadata columns of the
    * document corpus. `text` is deliberately absent: profiling the
    * content column lexicographically would ship megabyte min/max
    * strings to the report; its distribution is covered by the
    * length column and the dedicated text-analysis operators.
    */
  private val ProfileCols = Seq("doc_id", "lang", "source", "n_chars")

  /** Column PROFILING (the Deequ-analyzer shape beside [[dqChecks]]'
    * contract assertions): per column, the completeness, exact
    * cardinality, and value bounds a pipeline reads before writing
    * contracts at all. ONE scan — every per-column aggregate fuses
    * into a single agg (Spark plans the multi-column distincts via
    * one Expand pass, map-side combinable), then `stack` pivots the
    * one-row wide result to the long report. At 100 TB the exact
    * distinct counts are the costly cell — the approximate tier is
    * `agg_hll`'s mergeable registers, same scan shape. Bounds
    * stringify through BIGINT/VARCHAR casts that render identically
    * in both engines.
    */
  def dqProfile(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
    val aggs = ProfileCols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}_filled"),
        (count(lit(1)) - count(col(c))).as(s"${c}_nulls"),
        countDistinct(col(c)).as(s"${c}_distinct"),
        min(col(c)).cast("string").as(s"${c}_min"),
        max(col(c)).cast("string").as(s"${c}_max"))
    }
    val stackArgs = ProfileCols.map { c =>
      s"'$c', ${c}_filled, ${c}_nulls, ${c}_distinct, ${c}_min, ${c}_max"
    }.mkString(", ")
    d.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${ProfileCols.size}, $stackArgs) AS " +
        "(column_name, n_filled, n_null, n_distinct, min_val, max_val)")
      .orderBy("column_name")
  }

  val dqProfileSql: String = {
    val perCol = ProfileCols.map { c =>
      s"""SELECT '$c' AS column_name,
         |  CAST(count($c) AS BIGINT) AS n_filled,
         |  CAST(count(*) - count($c) AS BIGINT) AS n_null,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_val,
         |  CAST(max($c) AS VARCHAR) AS max_val
         |FROM documents""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""SELECT * FROM (
       |$perCol)
       |ORDER BY column_name""".stripMargin
  }

  // ----------------------------------------------------------------
  // CDC snapshot reconciliation
  // ----------------------------------------------------------------

  /** Snapshot DIFF / change-data-capture classification — the
    * reconciliation a warehouse runs between two loads of the same
    * table: a keyed FULL OUTER join of the old and new snapshot,
    * each row classified insert (key only in new) / delete (key
    * only in old) / update (both sides, payload differs) /
    * unchanged, rolled up with the new snapshot's value mass per
    * class. The two snapshots are carved deterministically from
    * `orders` by the portable key hash (bucket 0 deleted, bucket 9
    * inserted, bucket 5's price bumped), so the oracle replays the
    * exact same history. Scale shape: ONE hash equi-join on the
    * key — both sides partition by o_orderkey, payload comparison
    * is a rowwise expression, and the class rollup partial-aggregates;
    * nothing driver-side.
    */
  def cdcDiff(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders").withColumn("hb",
      TextAnalysis.polyHashCol(col("o_orderkey").cast("string")) % 10)
    val v1 = o.filter(col("hb") < 9)
      .select(col("o_orderkey").as("k1"), dec(col("o_totalprice")).as("p1"))
    val v2 = o.filter(col("hb") >= 1)
      .select(col("o_orderkey").as("k2"),
        when(col("hb") === 5, dec(col("o_totalprice")) + lit(1))
          .otherwise(dec(col("o_totalprice"))).as("p2"))
    v1.join(v2, col("k1") === col("k2"), "full_outer")
      .select(
        when(col("k1").isNull, lit("insert"))
          .when(col("k2").isNull, lit("delete"))
          .when(col("p1") =!= col("p2"), lit("update"))
          .otherwise(lit("unchanged")).as("change"),
        col("p2"))
      .groupBy("change")
      .agg(
        count(lit(1)).as("n_rows"),
        coalesce(sum(col("p2")), lit(0).cast(DecimalType(18, 2)))
          .cast("double").as("new_total"))
      .orderBy("change")
  }

  val cdcDiffSql: String = {
    val hb = s"${TextAnalysis.polyHashSql("CAST(o_orderkey AS VARCHAR)")} % 10"
    s"""WITH o AS (
       |  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS p, $hb AS hb
       |  FROM orders),
       |v1 AS (SELECT o_orderkey AS k1, p AS p1 FROM o WHERE hb < 9),
       |v2 AS (SELECT o_orderkey AS k2,
       |         CASE WHEN hb = 5 THEN p + 1 ELSE p END AS p2
       |       FROM o WHERE hb >= 1),
       |d AS (
       |  SELECT CASE WHEN k1 IS NULL THEN 'insert'
       |              WHEN k2 IS NULL THEN 'delete'
       |              WHEN p1 <> p2 THEN 'update'
       |              ELSE 'unchanged' END AS change, p2
       |  FROM v1 FULL OUTER JOIN v2 ON k1 = k2)
       |SELECT change, count(*) AS n_rows,
       |  CAST(coalesce(sum(p2), 0) AS DOUBLE) AS new_total
       |FROM d GROUP BY change ORDER BY change""".stripMargin
  }

  // ----------------------------------------------------------------
  // Benford first-digit audit
  // ----------------------------------------------------------------

  /** Benford's-law expected first-digit shares in integer ppm —
    * round(log10(1 + 1/d) · 1e6), the public constants, pinned as
    * literals so no engine ever evaluates a log.
    */
  private val BenfordPpm =
    Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L, 57992L,
      51153L, 45757L)

  /** Benford's-law first-digit audit per event-type (Newcomb 1881 /
    * Benford 1938; the standard fabricated-data / data-quality screen
    * for magnitude-spanning positive amounts): the first significant
    * digit of the cents amount — extracted as `substr(cast(cents),
    * 1, 1)`, pure integer-to-string, no float log anywhere — against
    * the expected log10(1+1/d) share. Output per (type, digit):
    * count, observed share (ppm), expected share (ppm, pinned
    * literals), absolute deviation (ppm). The per-type total rides a
    * window over the 9-row-per-type digit relation.
    *
    * (On this synthetic uniform-ish corpus the law is expected NOT to
    * hold — the audit's job is to REPORT the deviation, and the gate
    * pins the arithmetic, not conformance.)
    *
    * 100 TB shape: one scan → one (type, digit) hash agg (map-side
    * combinable, ≤ 9 groups per type); everything downstream is
    * digit-cardinality.
    */
  def dqBenford(spark: SparkSession, dir: String): DataFrame = {
    val expected = BenfordPpm.zipWithIndex
      .map { case (p, i) => s"WHEN ${i + 1} THEN ${p}L" }
      .mkString("CASE digit ", " ", " END")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
    Tables.events(spark, dir)
      .select(col("event_type"),
        (dec(col("value")) * 100).cast("long").as("cents"))
      .filter(col("cents") > 0)
      .withColumn("digit",
        substring(col("cents").cast("string"), 1, 1).cast("long"))
      .groupBy(col("event_type"), col("digit"))
      .agg(count(lit(1)).as("n"))
      .withColumn("total", sum(col("n")).over(w))
      .withColumn("share_ppm", expr("n * 1000000 div total"))
      .withColumn("expected_ppm", expr(expected))
      .withColumn("dev_ppm", abs(col("share_ppm") - col("expected_ppm")))
      .select(col("event_type"), col("digit"), col("n"), col("share_ppm"),
        col("expected_ppm"), col("dev_ppm"))
      .orderBy("event_type", "digit")
  }

  val dqBenfordSql: String = {
    val expected = BenfordPpm.zipWithIndex
      .map { case (p, i) => s"WHEN ${i + 1} THEN $p" }
      .mkString("CASE digit ", " ", " END")
    s"""WITH ev AS (
       |  SELECT event_type,
       |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
       |  FROM events),
       |dg AS (
       |  SELECT event_type,
       |    CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
       |    count(*) AS n
       |  FROM ev WHERE cents > 0 GROUP BY 1, 2)
       |SELECT event_type, digit, CAST(n AS BIGINT) AS n,
       |  CAST(n * 1000000 // (sum(n) OVER (PARTITION BY event_type))
       |    AS BIGINT) AS share_ppm,
       |  CAST($expected AS BIGINT) AS expected_ppm,
       |  CAST(abs(n * 1000000 // (sum(n) OVER (PARTITION BY event_type))
       |    - ($expected)) AS BIGINT) AS dev_ppm
       |FROM dg ORDER BY 1, 2""".stripMargin
  }

  // ----------------------------------------------------------------
  // Inter-arrival distribution
  // ----------------------------------------------------------------

  /** Log₂-binned inter-arrival-time histogram per event type — the
    * burstiness profile capacity planning and anomaly baselining
    * read (Poisson traffic shows a geometric bin profile; heavy
    * bins at both ends mean bursts + dead air). Gaps are per USER
    * (the stream each user emits), binned by
    * `length(bin(gap_seconds)) − 1` — the same integer log₂ as
    * `graph_degree_dist`, zero-gap (same-second) events in bucket
    * −1.
    *
    * Scale shape: one lag window per (user) stream — the sessionize
    * exchange, reused convention — then ONE map-side-combinable agg
    * into type × ~40 buckets. Nothing else shuffles.
    */
  def eventLagDist(spark: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy("user_id", "event_type")
      .orderBy("ts_ns", "event_id")
    Tables.events(spark, dir)
      .withColumn("prev_ns", lag(col("ts_ns"), 1).over(order))
      .filter(col("prev_ns").isNotNull)
      .withColumn("gap_s", expr("(ts_ns - prev_ns) div 1000000000"))
      .withColumn("gap_bucket",
        when(col("gap_s") === 0L, lit(-1L))
          .otherwise((length(bin(col("gap_s"))) - 1).cast("long")))
      .groupBy(col("event_type"), col("gap_bucket"))
      .agg(count(lit(1)).as("n_gaps"),
        min(col("gap_s")).as("min_gap_s"),
        max(col("gap_s")).as("max_gap_s"),
        sum(col("gap_s")).as("sum_gap_s"))
      .orderBy("event_type", "gap_bucket")
  }

  val eventLagDistSql: String =
    """WITH g AS (
      |  SELECT user_id, event_type,
      |    (epoch_ns(ts) - lag(epoch_ns(ts), 1) OVER
      |      (PARTITION BY user_id, event_type
      |       ORDER BY epoch_ns(ts), event_id)) // 1000000000 AS gap_s
      |  FROM events),
      |b AS (
      |  SELECT event_type, gap_s,
      |    CASE WHEN gap_s = 0 THEN -1
      |         ELSE length(bin(gap_s)) - 1 END AS gap_bucket
      |  FROM g WHERE gap_s IS NOT NULL)
      |SELECT event_type, CAST(gap_bucket AS BIGINT) AS gap_bucket,
      |  CAST(count(*) AS BIGINT) AS n_gaps,
      |  CAST(min(gap_s) AS BIGINT) AS min_gap_s,
      |  CAST(max(gap_s) AS BIGINT) AS max_gap_s,
      |  CAST(sum(gap_s) AS BIGINT) AS sum_gap_s
      |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ----------------------------------------------------------------
  // IQR outlier fences
  // ----------------------------------------------------------------

  /** Tukey-fence outlier audit of lineitem prices per return flag
    * (Tukey 1977's boxplot rule: fences at quartile ± 1.5·IQR,
    * public convention), INTEGER-EXACT:
    * quartiles are DISCRETE picks — the element at rank ⌈n/4⌉ /
    * ⌈3n/4⌉ under the total (cents) order (SQL type-1 quantile), so
    * no interpolation float enters; fences are
    * `q1 − (3·iqr) div 2` / `q3 + (3·iqr) div 2` on BIGINT cents.
    *
    * Scale shape (round 16 — the fixed-bin bisection the
    * `agg_weighted_median` rework proved out, see [[WmBinCents]]):
    * the 594k-row (flag, price) relation used to flow through a
    * cumulative window partitioned by the THREE return flags — a
    * 3-task fact-domain sort at any scale. Now: one fact pass bins
    * raw prices into fixed [[WmBinCents]]-wide cent bins (flags ×
    * ~650 live-bin groups, map-side combined); the q1/q3 crossing
    * bins come from a bounded bin-level cumulative self-join; one
    * second fact pass aggregates by price INSIDE the two selected
    * bins only, where a bounded in-bin self-join walks to the exact
    * rank-⌈n/4⌉ / ⌈3n/4⌉ picks; the outlier tally is a third
    * column-pruned fact pass against the broadcast 3-row fences. No
    * window, no fact-scale sort, every join bounded by the price
    * DOMAIN — and the quantile picks are bit-identical (bisection +
    * exact in-bin walk is binning-independent), so the oracle is
    * unchanged.
    */
  def dqIqr(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        (dec(col("l_extendedprice")) * 100).cast("long").as("pc"))
    val binAgg = li
      .select(col("l_returnflag"), expr(s"pc div $WmBinCents").as("bin"),
        col("pc"))
      .groupBy(col("l_returnflag"), col("bin"))
      .agg(count(lit(1)).as("c")).localCheckpoint(true)
    val stats = binAgg.groupBy("l_returnflag")
      .agg(sum(col("c")).as("n")).localCheckpoint(true) // 3 rows
    val cumB = binAgg
      .join(binAgg.toDF("l_returnflag", "bin2", "c2"), "l_returnflag")
      .filter(col("bin2") <= col("bin"))
      .groupBy(col("l_returnflag"), col("bin"))
      .agg(sum(col("c2")).as("cum"),
        sum(when(col("bin2") === col("bin"), col("c2"))).as("obc"))
    // two rank targets per flag: q1 at ⌈n/4⌉, q3 at ⌈3n/4⌉
    val targets = stats.select(col("l_returnflag"),
        explode(array(
          struct(lit(1L).as("qq"), expr("(n + 3) div 4").as("t")),
          struct(lit(3L).as("qq"), expr("(3 * n + 3) div 4").as("t"))))
          .as("qt"))
      .select(col("l_returnflag"), col("qt.qq").as("qq"), col("qt.t").as("t"))
    val selBin = cumB.join(broadcast(targets), "l_returnflag")
      .filter(col("cum") >= col("t"))
      .groupBy(col("l_returnflag"), col("qq"), col("t"))
      .agg(min(col("bin")).as("bin_sel"))
    val sel = selBin
      .join(cumB.toDF("l_returnflag", "bin_sel", "cum", "obc"),
        Seq("l_returnflag", "bin_sel"))
      .select(col("l_returnflag"), col("qq"), col("t"), col("bin_sel"),
        (col("cum") - col("obc")).as("prior")) // ≤ 6 rows
    val inBin = li.join(broadcast(sel), Seq("l_returnflag"))
      .filter(expr(s"pc div $WmBinCents") === col("bin_sel"))
      .groupBy(col("l_returnflag"), col("qq"), col("t"), col("prior"),
        col("pc"))
      .agg(count(lit(1)).as("cb")).localCheckpoint(true)
    val walk = inBin
      .join(inBin.select(col("l_returnflag"), col("qq"),
        col("pc").as("pc2"), col("cb").as("cb2")), Seq("l_returnflag", "qq"))
      .filter(col("pc2") <= col("pc"))
      .groupBy(col("l_returnflag"), col("qq"), col("t"), col("prior"),
        col("pc"))
      .agg(sum(col("cb2")).as("cw"))
    val quants = walk.filter(col("prior") + col("cw") >= col("t"))
      .groupBy(col("l_returnflag"), col("qq")).agg(min(col("pc")).as("qc"))
    val fences = quants.groupBy(col("l_returnflag"))
      .agg(max(when(col("qq") === 1L, col("qc"))).as("q1_c"),
        max(when(col("qq") === 3L, col("qc"))).as("q3_c"))
      .join(broadcast(stats), "l_returnflag")
      .withColumn("iqr_c", col("q3_c") - col("q1_c"))
      .withColumn("lo_c", col("q1_c") - expr("(3 * iqr_c) div 2"))
      .withColumn("hi_c", col("q3_c") + expr("(3 * iqr_c) div 2"))
      .localCheckpoint(true) // 3 rows
    li.join(broadcast(fences), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(
        max(col("n")).as("n"),
        max(col("q1_c")).as("q1_c"), max(col("q3_c")).as("q3_c"),
        max(col("iqr_c")).as("iqr_c"),
        max(col("lo_c")).as("lo_c"), max(col("hi_c")).as("hi_c"),
        sum(when(col("pc") < col("lo_c"), 1L).otherwise(0L)).as("n_out_lo"),
        sum(when(col("pc") > col("hi_c"), 1L).otherwise(0L)).as("n_out_hi"))
      .orderBy("l_returnflag")
  }

  val dqIqrSql: String =
    """WITH bp AS (
      |  SELECT l_returnflag,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pc,
      |    count(*) AS c
      |  FROM lineitem GROUP BY 1, 2),
      |cum AS (
      |  SELECT l_returnflag, pc, c,
      |    sum(c) OVER (PARTITION BY l_returnflag ORDER BY pc
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    sum(c) OVER (PARTITION BY l_returnflag) AS n
      |  FROM bp),
      |f AS (
      |  SELECT l_returnflag, max(n) AS n,
      |    min(CASE WHEN cum >= (n + 3) // 4 THEN pc END) AS q1_c,
      |    min(CASE WHEN cum >= (3 * n + 3) // 4 THEN pc END) AS q3_c
      |  FROM cum GROUP BY 1),
      |ff AS (
      |  SELECT *, q3_c - q1_c AS iqr_c,
      |    q1_c - (3 * (q3_c - q1_c)) // 2 AS lo_c,
      |    q3_c + (3 * (q3_c - q1_c)) // 2 AS hi_c
      |  FROM f)
      |SELECT b.l_returnflag, CAST(max(n) AS BIGINT) AS n,
      |  CAST(max(q1_c) AS BIGINT) AS q1_c, CAST(max(q3_c) AS BIGINT) AS q3_c,
      |  CAST(max(iqr_c) AS BIGINT) AS iqr_c,
      |  CAST(max(lo_c) AS BIGINT) AS lo_c, CAST(max(hi_c) AS BIGINT) AS hi_c,
      |  CAST(sum(CASE WHEN pc < lo_c THEN c ELSE 0 END) AS BIGINT) AS n_out_lo,
      |  CAST(sum(CASE WHEN pc > hi_c THEN c ELSE 0 END) AS BIGINT) AS n_out_hi
      |FROM bp b JOIN ff USING (l_returnflag)
      |GROUP BY b.l_returnflag
      |ORDER BY b.l_returnflag""".stripMargin

  // ----------------------------------------------------------------
  // Two-proportion A/B test
  // ----------------------------------------------------------------

  /** Two-proportion z-test per event type (the standard pooled test,
    * public formula), INTEGER-EXACT: cohorts are the even/odd user-id
    * halves; per type, `c/n` is the share of each cohort's users
    * that emitted the type at least once, and the significance
    * decision `z² > AnomalyZ²` is evaluated as the cross-multiplied
    * inequality `(c_a·n_b − c_b·n_a)² · (n_a+n_b) > z² · n_a·n_b ·
    * (c_a+c_b) · (n_a+n_b−c_a−c_b)` over DECIMAL(38,0) — no float
    * proportion or sqrt anywhere, so the verdict replays bit-for-bit
    * (HUGEINT on the oracle side). Headroom: at the factor-100 audit
    * scale the largest product is ~6e26, eleven orders inside
    * DECIMAL(38).
    *
    * 100 TB shape: one distinct-users-per-cohort agg + one
    * (type, cohort, user) distinct → (type, cohort) count — all
    * map-side-combinable hash aggs; the test algebra runs at type
    * cardinality with the two cohort totals broadcast.
    */
  def eventAbtest(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"),
        (pmod(col("user_id"), lit(2))).as("cohort"))
    val cohortUsers = ev.select(col("cohort"), col("user_id")).distinct()
      .groupBy("cohort").agg(count(lit(1)).as("n"))
    val conv = ev.select(col("event_type"), col("cohort"), col("user_id"))
      .distinct()
      .groupBy(col("event_type"), col("cohort"))
      .agg(count(lit(1)).as("c"))
    val wide = conv.join(broadcast(cohortUsers), "cohort")
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("cohort") === 0, col("c")).otherwise(0L)).as("c_a"),
        sum(when(col("cohort") === 0, col("n")).otherwise(0L)).as("n_a"),
        sum(when(col("cohort") === 1, col("c")).otherwise(0L)).as("c_b"),
        sum(when(col("cohort") === 1, col("n")).otherwise(0L)).as("n_b"))
    wide
      .withColumn("significant", expr(
        s"""CAST(c_a * n_b - c_b * n_a AS DECIMAL(19,0))
           |  * CAST(c_a * n_b - c_b * n_a AS DECIMAL(19,0))
           |  * CAST(n_a + n_b AS DECIMAL(19,0))
           |  > CAST(${AnomalyZ * AnomalyZ} AS DECIMAL(19,0))
           |    * CAST(n_a AS DECIMAL(19,0)) * CAST(n_b AS DECIMAL(19,0))
           |    * CAST(c_a + c_b AS DECIMAL(19,0))
           |    * CAST(n_a + n_b - c_a - c_b AS DECIMAL(19,0))"""
          .stripMargin))
      .select(col("event_type"), col("c_a"), col("n_a"), col("c_b"),
        col("n_b"),
        expr("c_a * 1000000 div n_a").as("rate_a_ppm"),
        expr("c_b * 1000000 div n_b").as("rate_b_ppm"),
        col("significant"))
      .orderBy("event_type")
  }

  val eventAbtestSql: String =
    s"""WITH ev AS (
       |  SELECT event_type, user_id, user_id % 2 AS cohort FROM events),
       |cu AS (
       |  SELECT cohort, count(*) AS n FROM (
       |    SELECT DISTINCT cohort, user_id FROM ev) GROUP BY 1),
       |conv AS (
       |  SELECT event_type, cohort, count(*) AS c FROM (
       |    SELECT DISTINCT event_type, cohort, user_id FROM ev)
       |  GROUP BY 1, 2),
       |wide AS (
       |  SELECT event_type,
       |    sum(CASE WHEN cohort = 0 THEN c ELSE 0 END) AS c_a,
       |    sum(CASE WHEN cohort = 0 THEN n ELSE 0 END) AS n_a,
       |    sum(CASE WHEN cohort = 1 THEN c ELSE 0 END) AS c_b,
       |    sum(CASE WHEN cohort = 1 THEN n ELSE 0 END) AS n_b
       |  FROM conv JOIN cu USING (cohort) GROUP BY 1)
       |SELECT event_type, CAST(c_a AS BIGINT) AS c_a,
       |  CAST(n_a AS BIGINT) AS n_a, CAST(c_b AS BIGINT) AS c_b,
       |  CAST(n_b AS BIGINT) AS n_b,
       |  CAST(c_a * 1000000 // n_a AS BIGINT) AS rate_a_ppm,
       |  CAST(c_b * 1000000 // n_b AS BIGINT) AS rate_b_ppm,
       |  (c_a * n_b - c_b * n_a) * (c_a * n_b - c_b * n_a) * (n_a + n_b)
       |    > ${AnomalyZ * AnomalyZ} * n_a * n_b * (c_a + c_b)
       |      * (n_a + n_b - c_a - c_b) AS significant
       |FROM wide ORDER BY event_type""".stripMargin

  // ----------------------------------------------------------------
  // Pearson correlation: exact integer moments (round 14)
  // ----------------------------------------------------------------

  /** Pearson correlation of daily order volume vs daily revenue per
    * priority class, INTEGER-EXACT (the `agg_regression` /
    * `event_abtest` moment discipline): x = orders per day, y = the
    * day's revenue floor-divided to whole k$ (both exact BIGINTs),
    * five moment sums accumulated as DECIMAL(38,0) (HUGEINT on the
    * oracle side — the recurring BIGINT-overflow class the factor-100
    * audit keeps catching), and the square of Pearson's r released in
    * ppm as the cross-multiplied integral quotient
    *
    *   r²_ppm = (cov²·10⁶) div (varx·vary),  cov = n·Σxy − Σx·Σy
    *
    * with the sign released separately — no float division or sqrt
    * anywhere (Spark's `div` on decimals is BigDecimal
    * divideToIntegralValue: EXACT, probe-verified at knife edges), so
    * the gate replays every bit. The division must be the SINGLE
    * outer div: an inner `x div 10⁶` materializes its quotient as
    * LONG and a ≥ 2⁶³ intermediate wraps silently — the factor-100
    * gate caught exactly that in this operator's first cut (r14).
    * Headroom at the audit scales with y in 10k$ units: at sf10,
    * cov²·10⁶ ≤ ~2e36 and varx·vary ≤ ~2e30, inside DECIMAL(38,0)/
    * HUGEINT; one more decade needs a unit bump (documented rail).
    *
    * Scale shape: the fact table meets ONE map-side-combinable hash
    * agg to (priority, day) cells; the moment rollup and the quotient
    * run at 5-row cardinality. No window, no sort, no fact-scale
    * state.
    */
  def aggCorr(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "orders")
      .select(col("o_orderpriority").as("prio"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("day_i"),
        (dec(col("o_totalprice")) * 100).cast("long").as("pc"))
      .groupBy(col("prio"), col("day_i"))
      .agg(count(lit(1)).as("x"),
        expr("CAST(sum(pc) AS BIGINT) div 1000000").as("y"))
    daily
      .groupBy(col("prio"))
      .agg(
        count(lit(1)).as("n_days"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
        sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"))
      .withColumn("cov", expr("n_days * sxy - sx * sy"))
      .withColumn("varx", expr("n_days * sxx - sx * sx"))
      .withColumn("vary", expr("n_days * syy - sy * sy"))
      .select(col("prio"), col("n_days"),
        signum(col("cov")).cast("long").as("sign_r"),
        expr("(CAST(cov * cov AS DECIMAL(38,0)) * 1000000L) div " +
          "greatest(CAST(varx * vary AS DECIMAL(38,0)), " +
          "CAST(1 AS DECIMAL(38,0)))").as("r2_ppm"))
      .orderBy("prio")
  }

  /** Skewness and excess kurtosis of the daily-revenue distribution
    * per order priority (round 15) — the third- and fourth-moment
    * shape statistics every distribution report carries beside
    * `agg_variance`. Standard population formulas (public):
    * g₁ = m₃/m₂^1.5, g₂ = m₄/m₂² − 3, computed WITHOUT floats until
    * the final release: with yᵢ the daily revenues, S_k = Σyᵏ exact,
    * the substitution zᵢ = n·yᵢ − S₁ (an exact integer) gives
    *
    *   A₂ = Σz² = n(nS₂ − S₁²),   A₃ = Σz³ = n(n²S₃ − 3nS₁S₂ + 2S₁³),
    *   A₄ = Σz⁴ = n(n³S₄ − 4n²S₁S₃ + 6nS₁²S₂ − 3S₁⁴)
    *
    * (dividing the common n out keeps magnitudes a decade lower:
    * a₂ = A₂/n etc. are still exact integers, and the n-powers
    * cancel entirely), so g₁ = a₃ / √(a₂³), g₂ = a₄/a₂² − 3 —
    * algebra: m₂ = A₂/n³ = a₂/n², m₃ = a₃/n³, m₄ = a₄/n⁴, hence
    * m₃/m₂^1.5 = (a₃/n³)/(a₂^1.5/n³) and m₄/m₂² = (a₄/n⁴)/(a₂²/n⁴).
    * The DAY-GRAIN input is
    * the scale rail (the `agg_corr` discipline): n is calendar-
    * bounded (~2.4k days), y is cents div 10⁶. Headroom is bounded
    * by the 3S₁⁴ term, which grows as (Σy)⁴: at the audited
    * factor-100 scale Σy per priority stays ≲ 10⁵·n so every exact
    * term is ≤ ~10³², but the DECIMAL(38,0)/HUGEINT ceiling is
    * crossed near sf≈1000, where per-priority daily y reaches
    * ~10⁶–10⁷ and S₁⁴ passes 10³⁸ (ADVICE r15 #2 corrected an
    * earlier "any corpus size" claim) — beyond that the y
    * quantization divisor must rise in BOTH engines in lockstep.
    * The one lossy step is the final cast of each exact term
    * to DOUBLE; every release-side operation (mul/div/sqrt) is
    * IEEE-exactly-rounded, so both engines land bit-identical
    * doubles — `pow(x, 1.5)` is deliberately avoided (libm pow is
    * not correctly rounded and may differ across engines; two sqrts
    * and a multiply are).
    */
  def aggMoments(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "orders")
      .select(col("o_orderpriority").as("prio"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("day_i"),
        (dec(col("o_totalprice")) * 100).cast("long").as("pc"))
      .groupBy(col("prio"), col("day_i"))
      .agg(expr("CAST(sum(pc) AS BIGINT) div 1000000").as("y"))
    daily
      .groupBy(col("prio"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("y").cast("decimal(38,0)")).as("s1"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("s2"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y * y")).as("s3"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y * y * y")).as("s4"))
      .withColumn("a2", expr("n * s2 - s1 * s1"))
      .withColumn("a3", expr("n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1"))
      .withColumn("a4", expr("CAST(n AS DECIMAL(38,0)) * n * n * s4 " +
        "- 4 * n * n * s1 * s3 + 6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1"))
      .select(col("prio"), col("n"),
        col("s1").cast("long").as("sum_y"),
        expr("CAST(a3 AS DOUBLE) / " +
          "sqrt(CAST(a2 AS DOUBLE) * CAST(a2 AS DOUBLE) * CAST(a2 AS DOUBLE))")
          .as("skewness"),
        expr("CAST(a4 AS DOUBLE) / " +
          "(CAST(a2 AS DOUBLE) * CAST(a2 AS DOUBLE)) - 3.0D")
          .as("kurtosis_excess"))
      .orderBy("prio")
  }

  val aggMomentsSql: String =
    """WITH daily AS (
      |  SELECT o_orderpriority AS prio,
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
      |      AS BIGINT) AS day_i,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) // 1000000 AS y
      |  FROM orders GROUP BY 1, 2),
      |m AS (
      |  SELECT prio, count(*) AS n,
      |    sum(CAST(y AS HUGEINT)) AS s1,
      |    sum(CAST(y AS HUGEINT) * y) AS s2,
      |    sum(CAST(y AS HUGEINT) * y * y) AS s3,
      |    sum(CAST(y AS HUGEINT) * y * y * y) AS s4
      |  FROM daily GROUP BY 1),
      |a AS (
      |  SELECT prio, n, s1,
      |    n * s2 - s1 * s1 AS a2,
      |    n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1 AS a3,
      |    CAST(n AS HUGEINT) * n * n * s4 - 4 * n * n * s1 * s3
      |      + 6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1 AS a4
      |  FROM m)
      |SELECT prio, CAST(n AS BIGINT) AS n, CAST(s1 AS BIGINT) AS sum_y,
      |  CAST(a3 AS DOUBLE)
      |    / sqrt(CAST(a2 AS DOUBLE) * CAST(a2 AS DOUBLE)
      |           * CAST(a2 AS DOUBLE)) AS skewness,
      |  CAST(a4 AS DOUBLE)
      |    / (CAST(a2 AS DOUBLE) * CAST(a2 AS DOUBLE)) - 3.0 AS kurtosis_excess
      |FROM a ORDER BY prio""".stripMargin

  val aggCorrSql: String =
    """WITH daily AS (
      |  SELECT o_orderpriority AS prio,
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
      |      AS BIGINT) AS day_i,
      |    count(*) AS x,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) // 1000000 AS y
      |  FROM orders GROUP BY 1, 2),
      |m AS (
      |  SELECT prio, count(*) AS n_days,
      |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx,
      |    sum(CAST(y AS HUGEINT) * y) AS syy,
      |    sum(CAST(x AS HUGEINT) * y) AS sxy
      |  FROM daily GROUP BY 1),
      |c AS (
      |  SELECT prio, n_days,
      |    n_days * sxy - sx * sy AS cov,
      |    n_days * sxx - sx * sx AS varx,
      |    n_days * syy - sy * sy AS vary
      |  FROM m)
      |SELECT prio, CAST(n_days AS BIGINT) AS n_days,
      |  CAST(sign(cov) AS BIGINT) AS sign_r,
      |  CAST(cov * cov * 1000000 // greatest(varx * vary, 1)
      |    AS BIGINT) AS r2_ppm
      |FROM c ORDER BY prio""".stripMargin

  // ----------------------------------------------------------------
  // ntile quartiles (round 14): the window-rank bucketing surface
  // ----------------------------------------------------------------

  /** Per-segment account-balance quartiles via `ntile(4)` (ANSI
    * semantics in both engines: earlier buckets take the remainder
    * row each), ties pinned on c_custkey, reduced to per-(segment,
    * quartile) cardinality — count plus min/max/sum of BIGINT cents.
    *
    * Scale note: ntile needs each partition's global rank, so this
    * plans as a per-segment sort (5 partitions here). At fact scale
    * the same quartile assignment is computable sort-free from the
    * cents-DOMAIN cumulative walk (`dqIqr`'s shape) when the value
    * domain is bounded; `ntile` is registered as the §2.7 window
    * surface itself, with that swap documented as the 100 TB path.
    */
  def windowNtile(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
      .select(col("c_mktsegment").as("segment"),
        (dec(col("c_acctbal")) * 100).cast("long").as("bal_c"),
        col("c_custkey"))
    val w = Window.partitionBy("segment").orderBy(col("bal_c"), col("c_custkey"))
    c.withColumn("quartile", ntile(4).over(w).cast("long"))
      .groupBy(col("segment"), col("quartile"))
      .agg(count(lit(1)).as("n"),
        min(col("bal_c")).as("min_c"), max(col("bal_c")).as("max_c"),
        sum(col("bal_c")).as("sum_c"))
      .orderBy("segment", "quartile")
  }

  val windowNtileSql: String =
    """WITH q AS (
      |  SELECT c_mktsegment AS segment,
      |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_c,
      |    ntile(4) OVER (PARTITION BY c_mktsegment
      |      ORDER BY CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT),
      |        c_custkey) AS quartile
      |  FROM customer)
      |SELECT segment, CAST(quartile AS BIGINT) AS quartile,
      |  count(*) AS n, CAST(min(bal_c) AS BIGINT) AS min_c,
      |  CAST(max(bal_c) AS BIGINT) AS max_c,
      |  CAST(sum(bal_c) AS BIGINT) AS sum_c
      |FROM q GROUP BY segment, quartile
      |ORDER BY segment, quartile""".stripMargin

  // ----------------------------------------------------------------
  // Event-type path analysis (round 14)
  // ----------------------------------------------------------------

  /** 3-step event-type path distribution: every consecutive triple of
    * one user's events (µs order, event_id tie pin) counted into the
    * (step1, step2, step3) histogram with a ppm share of all triples
    * — the product-analytics "common journeys" primitive and the
    * trajectory-n-gram shape agent-log analysis uses.
    *
    * Scale shape: two `lead` windows per user partition (bounded
    * per-user rows) feed one map-side-combinable hash agg at
    * |types|³ ≤ 125 cardinality; the share denominator is a 1-row
    * broadcast. No global sort, no self-join.
    */
  def eventPaths(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr("ts_ns div 1000").as("ts_us"), col("event_id"))
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val tri = ev
      .withColumn("step2", lead(col("event_type"), 1).over(w))
      .withColumn("step3", lead(col("event_type"), 2).over(w))
      .filter(col("step2").isNotNull && col("step3").isNotNull)
      .groupBy(col("event_type").as("step1"), col("step2"), col("step3"))
      .agg(count(lit(1)).as("n"))
    val total = tri.agg(sum(col("n")).as("total"))
    tri.crossJoin(broadcast(total))
      .select(col("step1"), col("step2"), col("step3"), col("n"),
        expr("n * 1000000L div total").as("share_ppm"))
      .orderBy("step1", "step2", "step3")
  }

  val eventPathsSql: String =
    """WITH tri AS (
      |  SELECT event_type AS step1,
      |    lead(event_type, 1) OVER w AS step2,
      |    lead(event_type, 2) OVER w AS step3
      |  FROM (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts_us,
      |          event_id FROM events)
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |paths AS (
      |  SELECT step1, step2, step3, count(*) AS n
      |  FROM tri WHERE step2 IS NOT NULL AND step3 IS NOT NULL
      |  GROUP BY 1, 2, 3),
      |tot AS (SELECT sum(n) AS total FROM paths)
      |SELECT step1, step2, step3, CAST(n AS BIGINT) AS n,
      |  CAST(n * 1000000 // total AS BIGINT) AS share_ppm
      |FROM paths, tot ORDER BY step1, step2, step3""".stripMargin

  // ----------------------------------------------------------------
  // DAU / WAU stickiness (round 14)
  // ----------------------------------------------------------------

  /** Daily active users, trailing-7-day weekly actives, and the
    * DAU/WAU "stickiness" ratio in ppm — the engagement statistic
    * every product-analytics stack publishes. Exact distinct counts
    * (no sketch): the fact table first collapses to DISTINCT
    * (day, user) pairs — the one fact-scale aggregation — then each
    * pair is EXPLODED to the ≤ 7 trailing grid days it covers
    * (`explode(sequence(day_i, day_i+6))`) and distinct-counted at
    * day grain. Round 15 (ADVICE r14): the previous shape joined
    * pairs BETWEEN a broadcast day grid, which plans as a
    * BroadcastNestedLoopJoin costing |pairs| × |days| predicate
    * evaluations — quadratic-ish in calendar length at audit scale;
    * the explode is exactly 7 rows per pair (linear), and the final
    * inner join against `dau` discards the ≤ 6 trailing phantom days
    * past the corpus max, so no grid relation is needed at all.
    * State is day×user pairs ×7, never raw events; the ppm ratio is
    * integer floor division. Unbounded-user caveat: the exact
    * distinct state grows with the user population — the sketch twin
    * `event_stickiness_kmv` bounds it (KMV, ≤ K hashes per day).
    */
  def eventStickiness(spark: SparkSession, dir: String): DataFrame = {
    val du = Tables.events(spark, dir)
      .select(expr("ts_ns div 86400000000000").as("day_i"), col("user_id"))
      .distinct()
    val dau = du.groupBy(col("day_i")).agg(count(lit(1)).as("dau"))
    val wau = du
      .select(explode(expr("sequence(day_i, day_i + 6)")).as("d"),
        col("user_id"))
      .distinct()
      .groupBy(col("d")).agg(count(lit(1)).as("wau"))
    dau.join(wau, dau("day_i") === wau("d"))
      .select(col("day_i"), col("dau"), col("wau"),
        expr("dau * 1000000L div wau").as("stickiness_ppm"))
      .orderBy("day_i")
  }

  // ----------------------------------------------------------------
  // Gini concentration of per-user activity (round 14, batch 2)
  // ----------------------------------------------------------------

  /** Gini coefficient of events-per-user, per event type, in ppm —
    * the inequality statistic engagement analyses report ("how
    * concentrated is this activity in a few heavy users"). Exact
    * integer rank-sum formula (the standard discrete Gini, public):
    * with per-user counts x sorted ascending at ranks i = 1..n,
    *
    *   G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx)
    *
    * released as `gini_ppm` by one DECIMAL(38)/HUGEINT floor
    * division. Computed WITHOUT a user-grain sort: users sharing a
    * count value x occupy a contiguous rank block [cum−c+1, cum]
    * whose rank-sum is closed-form (block midpoint × c), so the walk
    * runs over the (type, x) COUNT DOMAIN — the `dq_iqr` discipline —
    * and the rank tie order cannot matter (equal x contribute
    * identically under any permutation of their block).
    *
    * Scale shape: events meet one map-side-combinable hash agg to
    * (type, user) then (type, x) counts; the cumulative walk and the
    * final rollup run at count-domain cardinality.
    */
  def eventGini(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("x"))
      .groupBy(col("event_type"), col("x"))
      .agg(count(lit(1)).as("c"))
    val walk = Window.partitionBy("event_type").orderBy("x")
    perUser
      .withColumn("cum", sum(col("c")).over(walk))
      // Σ i over the block [cum−c+1, cum] = c·(2·cum − c + 1)/2. The
      // halving happens on the even LONG factor BEFORE the DECIMAL
      // multiply: exactly one of c and (2cum−c+1) is even, each
      // factor is ≤ 2n+1 (no LONG overflow), and an inner `div` on
      // the DECIMAL product would materialize LONG and silently wrap
      // past 2⁶³ (the agg_corr lesson — ADVICE r14)
      .withColumn("block_ranks",
        expr("CASE WHEN c % 2 = 0 " +
          "THEN CAST(c div 2 AS DECIMAL(38,0)) * (2 * cum - c + 1) " +
          "ELSE CAST(c AS DECIMAL(38,0)) * ((2 * cum - c + 1) div 2) END"))
      .withColumn("block_mass",
        expr("CAST(x AS DECIMAL(38,0)) * block_ranks"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("c")).as("n_users"),
        sum(col("x") * col("c")).as("total_events"),
        sum(col("block_mass")).as("rank_mass"))
      .select(col("event_type"), col("n_users"), col("total_events"),
        expr("(2L * rank_mass - (CAST(n_users AS DECIMAL(38,0)) + 1) " +
          "* total_events) * 1000000L div " +
          "(CAST(n_users AS DECIMAL(38,0)) * total_events)").as("gini_ppm"))
      .orderBy("event_type")
  }

  /** Referential-integrity audit over the star schema's four FK edges
    * (round 15) — the dq check every warehouse runs before trusting a
    * join: per edge, distinct child keys, distinct parent keys,
    * ORPHANS (child keys with no parent — broken FK) and CHILDLESS
    * parents (parents no fact row references — coverage holes), with
    * the childless share in ppm. On this corpus orphans are zero by
    * construction (that IS the expected clean-audit result) and the
    * childless arm is non-vacuous (257 orders carry no lineitem at
    * sf0.01), so the gate proves both directions of the key
    * reconciliation, not an empty intersection.
    *
    * Scale shape: each edge is two key-grain DISTINCT aggregates
    * (map-side combinable) and two LEFT ANTI joins at key grain —
    * never a fact×fact join; the four 1-row edge summaries union.
    */
  def dqReferential(spark: SparkSession, dir: String): DataFrame = {
    // ONE full-outer join per edge (round 16, guide §1.2): the old
    // shape consumed each distinct key set three times — two
    // anti-joins plus a count — re-running the fact-table distinct
    // for every consumer. All four stats (child keys, parent keys,
    // orphans, childless) fold out of a single pass over the
    // full-outer join of the two distinct'd key sets.
    def edge(name: String, child: DataFrame, parent: DataFrame): DataFrame = {
      val cd = child.toDF("k").distinct().withColumn("c1", lit(1))
      val pd = parent.toDF("k").distinct().withColumn("p1", lit(1))
      cd.join(pd, Seq("k"), "full_outer")
        .agg(
          count(col("c1")).as("n_child_keys"),
          count(col("p1")).as("n_parent_keys"),
          coalesce(sum(when(col("p1").isNull, 1L).otherwise(0L)), lit(0L))
            .as("n_orphans"),
          coalesce(sum(when(col("c1").isNull, 1L).otherwise(0L)), lit(0L))
            .as("n_childless"))
        .select(lit(name).as("edge"), col("n_child_keys"),
          col("n_parent_keys"), col("n_orphans"), col("n_childless"),
          expr("n_childless * 1000000L div n_parent_keys")
            .as("childless_ppm"))
    }
    val li = t(spark, dir, "lineitem")
    edge("lineitem->orders", li.select(col("l_orderkey")),
        t(spark, dir, "orders").select(col("o_orderkey")))
      .unionByName(edge("lineitem->part", li.select(col("l_partkey")),
        t(spark, dir, "part").select(col("p_partkey"))))
      .unionByName(edge("lineitem->supplier", li.select(col("l_suppkey")),
        t(spark, dir, "supplier").select(col("s_suppkey"))))
      .unionByName(edge("orders->customer",
        t(spark, dir, "orders").select(col("o_custkey")),
        t(spark, dir, "customer").select(col("c_custkey"))))
      .orderBy("edge")
  }

  val dqReferentialSql: String = {
    def edge(name: String, ck: String, ct: String, pk: String,
        pt: String): String =
      s"""SELECT '$name' AS edge,
         |  (SELECT count(DISTINCT $ck) FROM $ct) AS n_child_keys,
         |  (SELECT count(DISTINCT $pk) FROM $pt) AS n_parent_keys,
         |  (SELECT count(*) FROM (SELECT DISTINCT $ck AS k FROM $ct) c
         |    WHERE NOT EXISTS (SELECT 1 FROM $pt WHERE $pk = c.k))
         |    AS n_orphans,
         |  (SELECT count(*) FROM (SELECT DISTINCT $pk AS k FROM $pt) p
         |    WHERE NOT EXISTS (SELECT 1 FROM $ct WHERE $ck = p.k))
         |    AS n_childless""".stripMargin
    s"""WITH edges AS (
       |${edge("lineitem->orders", "l_orderkey", "lineitem",
                "o_orderkey", "orders")}
       |UNION ALL
       |${edge("lineitem->part", "l_partkey", "lineitem",
                "p_partkey", "part")}
       |UNION ALL
       |${edge("lineitem->supplier", "l_suppkey", "lineitem",
                "s_suppkey", "supplier")}
       |UNION ALL
       |${edge("orders->customer", "o_custkey", "orders",
                "c_custkey", "customer")})
       |SELECT edge, CAST(n_child_keys AS BIGINT) AS n_child_keys,
       |  CAST(n_parent_keys AS BIGINT) AS n_parent_keys,
       |  CAST(n_orphans AS BIGINT) AS n_orphans,
       |  CAST(n_childless AS BIGINT) AS n_childless,
       |  CAST(n_childless * 1000000 // n_parent_keys AS BIGINT)
       |    AS childless_ppm
       |FROM edges ORDER BY edge""".stripMargin
  }

  /** Theil T and Theil L (mean log deviation) of events-per-user, per
    * event type — the decomposable inequality indices that accompany
    * [[eventGini]] in concentration reports (Theil 1967, public):
    * T = (1/n)·Σ (xᵢ/μ)·ln(xᵢ/μ),  L = (1/n)·Σ ln(μ/xᵢ).
    * Computed over the same (type, x) COUNT DOMAIN as the Gini — a
    * user with count x contributes c(x) identical terms, so the sums
    * run at domain cardinality and no user-grain relation survives
    * the first hash agg. Float rails (the text_entropy discipline):
    * the per-domain-value terms are summed in a PINNED order
    * (collect_list sorted by x, sequential fold) and released at 6dp,
    * so cross-engine libm/summation drift cannot reach the gate.
    */
  def aggTheil(spark: SparkSession, dir: String): DataFrame = {
    val dom = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("x"))
      .groupBy(col("event_type"), col("x"))
      .agg(count(lit(1)).as("c"))
    val tot = dom.groupBy(col("event_type"))
      .agg(sum(col("c")).as("n"), sum(col("x") * col("c")).as("tot"))
    dom.join(tot, "event_type")
      .withColumn("r", col("x").cast("double") * col("n") / col("tot"))
      .withColumn("t_term", col("c") * col("r") * log(col("r")))
      .withColumn("l_term", -col("c").cast("double") * log(col("r")))
      .groupBy(col("event_type"))
      .agg(
        max(col("n")).as("n_users"),
        max(col("tot")).as("total_events"),
        sort_array(collect_list(struct(col("x"), col("t_term"),
          col("l_term")))).as("parts"))
      .select(col("event_type"), col("n_users"), col("total_events"),
        round(aggregate(col("parts"), lit(0.0),
          (acc, p) => acc + p.getField("t_term")) /
          col("n_users"), 6).as("theil_t"),
        round(aggregate(col("parts"), lit(0.0),
          (acc, p) => acc + p.getField("l_term")) /
          col("n_users"), 6).as("theil_l"))
      .orderBy("event_type")
  }

  val aggTheilSql: String =
    """WITH pu AS (
      |  SELECT event_type, user_id, count(*) AS x
      |  FROM events GROUP BY 1, 2),
      |dom AS (
      |  SELECT event_type, x, count(*) AS c FROM pu GROUP BY 1, 2),
      |tot AS (
      |  SELECT event_type, sum(c) AS n, sum(x * c) AS tot
      |  FROM dom GROUP BY 1),
      |p AS (
      |  SELECT dom.event_type, dom.x, tot.n, tot.tot,
      |    dom.c * (CAST(dom.x AS DOUBLE) * tot.n / tot.tot)
      |      * ln(CAST(dom.x AS DOUBLE) * tot.n / tot.tot) AS t_term,
      |    -CAST(dom.c AS DOUBLE)
      |      * ln(CAST(dom.x AS DOUBLE) * tot.n / tot.tot) AS l_term
      |  FROM dom JOIN tot USING (event_type))
      |SELECT event_type, CAST(max(n) AS BIGINT) AS n_users,
      |  CAST(max(tot) AS BIGINT) AS total_events,
      |  round(list_sum(list(t_term ORDER BY x)) / max(n), 6) AS theil_t,
      |  round(list_sum(list(l_term ORDER BY x)) / max(n), 6) AS theil_l
      |FROM p GROUP BY event_type ORDER BY event_type""".stripMargin

  val eventGiniSql: String =
    """WITH pu AS (
      |  SELECT event_type, user_id, count(*) AS x
      |  FROM events GROUP BY 1, 2),
      |dom AS (
      |  SELECT event_type, x, count(*) AS c FROM pu GROUP BY 1, 2),
      |walked AS (
      |  SELECT event_type, x, c,
      |    sum(c) OVER (PARTITION BY event_type ORDER BY x
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM dom),
      |rolled AS (
      |  SELECT event_type, sum(c) AS n_users,
      |    sum(CAST(x AS HUGEINT) * c) AS total_events,
      |    sum(CAST(x AS HUGEINT) * c * (2 * cum - c + 1) // 2) AS rank_mass
      |  FROM walked GROUP BY 1)
      |SELECT event_type, CAST(n_users AS BIGINT) AS n_users,
      |  CAST(total_events AS BIGINT) AS total_events,
      |  CAST((2 * rank_mass - (n_users + 1) * total_events) * 1000000
      |    // (n_users * total_events) AS BIGINT) AS gini_ppm
      |FROM rolled ORDER BY event_type""".stripMargin

  // ----------------------------------------------------------------
  // Herfindahl–Hirschman concentration (round 14, batch 2)
  // ----------------------------------------------------------------

  /** HHI of order revenue across customers, per nation, in ppm — the
    * market-concentration index (Σ share²; public antitrust formula),
    * INTEGER-EXACT: customer revenue in DECIMAL cents, and
    *
    *   hhi_ppm = (Σ x_i²)·10⁶ div (Σx)²
    *
    * over DECIMAL(38)/HUGEINT (one exact outer integral divide — the
    * `agg_corr` lesson). `top_share_ppm` (the largest single
    * customer's share) rides along from the same aggregate. Scale
    * shape: orders→customer is one equi-join (customer side carries
    * only (custkey, nationkey)); then a (nation, cust) hash agg and a
    * nation-grain rollup — no window, no sort.
    */
  def aggHhi(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val byCust = t(spark, dir, "orders")
      .select(col("o_custkey").as("c_custkey"),
        (dec(col("o_totalprice")) * 100).cast("long").as("pc"))
      .join(cust, "c_custkey")
      .groupBy(col("c_nationkey"), col("c_custkey"))
      .agg(sum(col("pc")).as("x"))
    byCust
      .groupBy(col("c_nationkey"))
      .agg(
        count(lit(1)).as("n_cust"),
        sum(col("x").cast("decimal(38,0)")).as("tot"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sq"),
        max(col("x")).as("mx"))
      .select(col("c_nationkey").cast("long").as("nation"), col("n_cust"),
        col("tot").cast("long").as("total_c"),
        expr("(sq * 1000000L) div (tot * tot)").as("hhi_ppm"),
        expr("(CAST(mx AS DECIMAL(38,0)) * 1000000L) div tot")
          .as("top_share_ppm"))
      .orderBy("nation")
  }

  val aggHhiSql: String =
    """WITH bc AS (
      |  SELECT c.c_nationkey, o.o_custkey,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS x
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |  GROUP BY 1, 2)
      |SELECT CAST(c_nationkey AS BIGINT) AS nation, count(*) AS n_cust,
      |  CAST(sum(CAST(x AS HUGEINT)) AS BIGINT) AS total_c,
      |  CAST(sum(CAST(x AS HUGEINT) * x) * 1000000
      |    // (sum(CAST(x AS HUGEINT)) * sum(CAST(x AS HUGEINT)))
      |    AS BIGINT) AS hhi_ppm,
      |  CAST(CAST(max(x) AS HUGEINT) * 1000000
      |    // sum(CAST(x AS HUGEINT)) AS BIGINT) AS top_share_ppm
      |FROM bc GROUP BY 1 ORDER BY 1""".stripMargin

  // ----------------------------------------------------------------
  // Funnel conversion-time distribution (round 14, batch 2)
  // ----------------------------------------------------------------

  /** Time-to-convert distribution for the registered funnel's two
    * transitions (view→click, click→purchase): converted-user count,
    * the log₂ bucket containing the discrete type-1 median delta (and
    * that bucket's smallest observed delta, a deterministic lower
    * envelope of the true median), and the exact floor mean — the
    * "how long does conversion take" companion every funnel report
    * carries. Deltas come from [[eventFunnel]]'s own relation (the
    * operator composes, it cannot drift).
    *
    * Median domain bound (round 15, VERDICT r14 ask #1): the round-14
    * shape walked the raw `delta_us` count domain, but µs-grain
    * conversion deltas are near-unique per user, so that "domain" had
    * ~n_converted cardinality and the rank walk's 2-value
    * `partitionBy(transition)` window was a skewed near-global sort of
    * user-grain rows at 100×. The walk now runs over the log₂-bucketed
    * delta domain — the [[eventLagDist]] pattern — which is VALUE-
    * bounded: deltas are µs in (0, 2⁶³), so ≤ 63 buckets per
    * transition ever exist, however many users convert. The rank walk
    * and both full-partition sums see ≤ 2 × 63 rows; the one
    * fact-grain operation left is the map-side-combinable hash agg
    * into (transition, bucket) cells. The bucket pick is exact for the
    * bucketed statistic (the DuckDB oracle buckets identically);
    * `p50_floor_us` is a data value (each bucket's min delta is
    * strictly increasing across buckets, so the first rank-covering
    * bucket's min is well-defined under `min(when...)`).
    */
  def eventFunnelTime(spark: SparkSession, dir: String): DataFrame = {
    val f = eventFunnel(spark, dir)
    // stack() unpivots both transitions in ONE pass over the funnel
    // relation — a union of two selects re-evaluates the funnel's
    // 3-join lineage per branch (measured 3.5 s -> ~1.3 s cold)
    val deltas = f
      .select(expr(
        "stack(2, '1_view_to_click', t_click_us - t_view_us, " +
          "'2_click_to_purchase', t_purchase_us - t_click_us) " +
          "AS (transition, delta_us)"))
      .filter(col("delta_us").isNotNull)
      // deltas are strictly positive (the funnel's step inequalities
      // are strict), but keep the zero guard: bucket −1, the
      // event_lag_dist convention
      .withColumn("bucket",
        when(col("delta_us") === 0L, lit(-1L))
          .otherwise((length(bin(col("delta_us"))) - 1).cast("long")))
      .groupBy(col("transition"), col("bucket"))
      .agg(count(lit(1)).as("c"), min(col("delta_us")).as("mn"),
        sum(col("delta_us")).as("sd"))
    val walk = Window.partitionBy("transition").orderBy("bucket")
    val all = Window.partitionBy("transition")
    deltas
      .withColumn("cum", sum(col("c")).over(walk))
      .withColumn("n", sum(col("c")).over(all))
      .withColumn("sum_d", sum(col("sd")).over(all))
      .groupBy(col("transition"))
      .agg(
        max(col("n")).as("n_converted"),
        min(when(col("cum") >= expr("(n + 1) div 2"), col("bucket")))
          .as("p50_bucket"),
        min(when(col("cum") >= expr("(n + 1) div 2"), col("mn")))
          .as("p50_floor_us"),
        expr("max(sum_d) div max(n)").as("mean_us"))
      .orderBy("transition")
  }

  val eventFunnelTimeSql: String =
    """WITH v AS (
      |  SELECT user_id, min(epoch_us(ts)) AS t_view_us
      |  FROM events WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, min(epoch_us(e.ts)) AS t_click_us
      |  FROM events e JOIN v ON v.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t_view_us
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase_us
      |  FROM events e JOIN c ON c.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t_click_us
      |  GROUP BY e.user_id),
      |d AS (
      |  SELECT '1_view_to_click' AS transition,
      |    c.t_click_us - v.t_view_us AS delta_us
      |  FROM c JOIN v USING (user_id)
      |  UNION ALL
      |  SELECT '2_click_to_purchase' AS transition,
      |    p.t_purchase_us - c.t_click_us AS delta_us
      |  FROM p JOIN c USING (user_id)),
      |dom AS (
      |  SELECT transition,
      |    CASE WHEN delta_us = 0 THEN -1
      |         ELSE length(bin(delta_us)) - 1 END AS bucket,
      |    count(*) AS c, min(delta_us) AS mn, sum(delta_us) AS sd
      |  FROM d GROUP BY 1, 2),
      |walked AS (
      |  SELECT transition, bucket, c, mn,
      |    sum(c) OVER (PARTITION BY transition ORDER BY bucket
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    sum(c) OVER (PARTITION BY transition) AS n,
      |    sum(sd) OVER (PARTITION BY transition) AS sum_d
      |  FROM dom)
      |SELECT transition, CAST(max(n) AS BIGINT) AS n_converted,
      |  CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN bucket END)
      |    AS BIGINT) AS p50_bucket,
      |  CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN mn END)
      |    AS BIGINT) AS p50_floor_us,
      |  CAST(max(sum_d) // max(n) AS BIGINT) AS mean_us
      |FROM walked GROUP BY transition
      |ORDER BY transition""".stripMargin

  /** New-vs-returning daily split (round 14, the acquisition
    * companion of [[eventStickiness]]): per day, how many active
    * users are seen for the FIRST time vs returning, plus the new
    * share in ppm — the growth-accounting statistic every activation
    * dashboard carries. Exact: first-seen day is one min-agg over the
    * distinct (day, user) pairs; both rollups are day-grain.
    */
  def eventNewUsers(spark: SparkSession, dir: String): DataFrame = {
    val du = Tables.events(spark, dir)
      .select(expr("ts_ns div 86400000000000").as("day_i"), col("user_id"))
      .distinct()
    val dau = du.groupBy(col("day_i")).agg(count(lit(1)).as("dau"))
    val fresh = du.groupBy(col("user_id")).agg(min(col("day_i")).as("fd"))
      .groupBy(col("fd").as("day_i")).agg(count(lit(1)).as("new_users"))
    dau.join(fresh, Seq("day_i"), "left")
      .select(col("day_i"), col("dau"),
        coalesce(col("new_users"), lit(0L)).as("new_users"),
        (col("dau") - coalesce(col("new_users"), lit(0L))).as("returning"),
        expr("coalesce(new_users, 0L) * 1000000L div dau").as("new_share_ppm"))
      .orderBy("day_i")
  }

  val eventNewUsersSql: String =
    """WITH du AS (
      |  SELECT DISTINCT epoch_ns(ts) // 86400000000000 AS day_i, user_id
      |  FROM events),
      |dau AS (SELECT day_i, count(*) AS dau FROM du GROUP BY 1),
      |fresh AS (
      |  SELECT fd AS day_i, count(*) AS new_users FROM (
      |    SELECT user_id, min(day_i) AS fd FROM du GROUP BY 1)
      |  GROUP BY 1)
      |SELECT day_i, CAST(dau AS BIGINT) AS dau,
      |  CAST(coalesce(new_users, 0) AS BIGINT) AS new_users,
      |  CAST(dau - coalesce(new_users, 0) AS BIGINT) AS returning,
      |  CAST(coalesce(new_users, 0) * 1000000 // dau AS BIGINT)
      |    AS new_share_ppm
      |FROM dau LEFT JOIN fresh USING (day_i)
      |ORDER BY day_i""".stripMargin

  /** Sketch twin of [[eventStickiness]] (round 15, VERDICT r14 ask
    * #5): the exact query's distinct (day, user) state is honest but
    * grows with the user population; this twin bounds per-day state
    * to the KMV sketch's K = 256 smallest hashes — the swap a 100 TB
    * deployment makes. Both DAU and WAU come from the SAME portable
    * KMV estimator as `agg_kmv_distinct` (identical
    * [[graft.functions.KmvSketch]] hash chain, k-th-min order
    * statistic, (K−1)·2⁶⁴ // kth floor estimate — bit-exact in the
    * DuckDB oracle), so dau ≈ exact within the sketch's ~1/√(K−2)
    * relative error and the day-over-day ratio stays comparable.
    *
    * Scale shape: one fact-scale distinct to (day, user), one typed
    * map to (day, signed-flipped hash), then the per-key k-smallest
    * runs through the [[graft.plans.TopKPerKey]] custom physical
    * operator — partial heaps map-side, one K-bounded row set per
    * day after the exchange; NO per-day sort of WAU-grain rows ever
    * materializes. The sign-bit flip maps KMV's unsigned hash order
    * onto LONG order so the operator's comparator applies; the
    * estimate flips it back. The 7-day cover is the exact query's
    * explode(sequence) — linear, ≤ 7 rows per pair.
    *
    * K is 64 HERE (not the library's 256) so the ESTIMATOR branch is
    * the one under the gate: the sf0.01 corpus peaks at ~150 weekly
    * actives, and with K = 256 every day would take the `seen < K`
    * exact branch — a green that proves nothing about the k-th-min
    * estimate (the `dedup_embedding_ann_hi` vacuity lesson, r12–r14).
    * The non-vacuity is pinned by `Round15OpsSpec` (at least one day
    * must exceed K) and the estimator error bound rides the same
    * 1/√(K−2) law — production at 100 TB would raise K back to 256+,
    * a one-constant change that alters no plan shape.
    */
  private[graft] val StickinessKmvK = 64

  def eventStickinessKmv(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val K = StickinessKmvK
    val du = Tables.events(spark, dir)
      .select(expr("ts_ns div 86400000000000").as("day_i"), col("user_id"))
      .distinct()
    val dh = du.as[(Long, Long)]
      .map { case (d, u) =>
        (d, graft.functions.KmvSketch.hash(u.toString) ^ Long.MinValue) }
      .toDF("day_i", "hs")
      // two consumers (day sketch + 7-day cover) — don't re-run the
      // fact-scale distinct+hash per branch
      .localCheckpoint(true)
    // KMV estimate from (seen, kth): exact count below K, else
    // (K-1)*2^64 // kth_unsigned — the kth_hs sign-flip undone by
    // +2^63; DECIMAL(38,0) keeps the 2^72-magnitude numerator exact
    // and `div` releases the same BIGINT truncation KmvSketch.finish
    // applies
    val numerator = (BigInt(K - 1) << 64).toString
    def est(seen: String, kth: String): String =
      s"CASE WHEN $seen < $K THEN $seen ELSE " +
        s"CAST('$numerator' AS DECIMAL(38,0)) div " +
        s"(CAST($kth AS DECIMAL(38,0)) + 9223372036854775808) END"
    val dayTop = graft.plans.TopK
      .topKPerKey(dh, Seq("day_i"), Seq("hs" -> false), K)
      .groupBy(col("day_i"))
      .agg(count(lit(1)).as("seen_d"), max(col("hs")).as("kth_d"))
    val weekTop = graft.plans.TopK.topKPerKey(
        dh.select(explode(expr("sequence(day_i, day_i + 6)")).as("d"),
          col("hs")).distinct(),
        Seq("d"), Seq("hs" -> false), K)
      .groupBy(col("d"))
      .agg(count(lit(1)).as("seen_w"), max(col("hs")).as("kth_w"))
    dayTop.join(weekTop, dayTop("day_i") === weekTop("d"))
      .select(col("day_i"),
        expr(est("seen_d", "kth_d")).as("dau_kmv"),
        expr(est("seen_w", "kth_w")).as("wau_kmv"))
      .withColumn("stickiness_ppm", expr("dau_kmv * 1000000L div wau_kmv"))
      .orderBy("day_i")
  }

  /** Oracle: the agg_kmv_distinct hash chain (base-31 fold mod 2⁶⁴ +
    * the 32-bit-split multiply/shift-add finalizer, all HUGEINT) run
    * once per distinct user, joined back to the (day, user) pairs,
    * the 7-day cover unnested, and the k-th smallest picked by a
    * row_number walk (user-grain is fine in the ORACLE — DuckDB at
    * sf0.01; the engine side is the one that must stay K-bounded).
    */
  val eventStickinessKmvSql: String = {
    val K = StickinessKmvK
    s"""WITH du AS (
       |  SELECT DISTINCT epoch_ns(ts) // 86400000000000 AS day_i, user_id
       |  FROM events),
       |uu AS (SELECT DISTINCT user_id, CAST(user_id AS VARCHAR) AS s FROM du),
       |h0 AS (
       |  SELECT user_id,
       |    list_reduce(list_prepend(CAST(0 AS HUGEINT),
       |      [CAST(unicode(substr(s, CAST(i AS INT), 1)) AS HUGEINT)
       |       for i in generate_series(1, length(s))]),
       |      (a, b) -> (a*31 + b) % 18446744073709551616) AS x
       |  FROM uu),
       |m1 AS (SELECT user_id,
       |  ((x % 4294967296) * (18397679294719823053 % 4294967296)
       |   + 4294967296 * ((x % 4294967296) * (18397679294719823053 // 4294967296)
       |                 + (x // 4294967296) * (18397679294719823053 % 4294967296))
       |  ) % 18446744073709551616 AS x FROM h0),
       |a1 AS (SELECT user_id,
       |  (x + (x // 8589934592)) % 18446744073709551616 AS x FROM m1),
       |m2 AS (SELECT user_id,
       |  ((x % 4294967296) * (14181476777654086739 % 4294967296)
       |   + 4294967296 * ((x % 4294967296) * (14181476777654086739 // 4294967296)
       |                 + (x // 4294967296) * (14181476777654086739 % 4294967296))
       |  ) % 18446744073709551616 AS x FROM a1),
       |uh AS (SELECT user_id,
       |  (x + (x // 8589934592)) % 18446744073709551616 AS hu FROM m2),
       |dayh AS (
       |  SELECT DISTINCT du.day_i AS d, uh.hu
       |  FROM du JOIN uh USING (user_id)),
       |coverh AS (
       |  SELECT DISTINCT unnest(generate_series(du.day_i, du.day_i + 6)) AS d,
       |    uh.hu
       |  FROM du JOIN uh USING (user_id)),
       |rd AS (SELECT d, hu,
       |    row_number() OVER (PARTITION BY d ORDER BY hu) AS rn FROM dayh),
       |kd AS (SELECT d, count(*) AS seen,
       |    max(hu) FILTER (WHERE rn <= $K) AS kth FROM rd GROUP BY d),
       |rw AS (SELECT d, hu,
       |    row_number() OVER (PARTITION BY d ORDER BY hu) AS rn FROM coverh),
       |kw AS (SELECT d, count(*) AS seen,
       |    max(hu) FILTER (WHERE rn <= $K) AS kth FROM rw GROUP BY d),
       |est AS (
       |  SELECT kd.d AS day_i,
       |    CASE WHEN kd.seen < $K THEN CAST(kd.seen AS BIGINT)
       |         ELSE CAST((CAST(${K - 1} AS HUGEINT) * 18446744073709551616)
       |              // kd.kth AS BIGINT) END AS dau_kmv,
       |    CASE WHEN kw.seen < $K THEN CAST(kw.seen AS BIGINT)
       |         ELSE CAST((CAST(${K - 1} AS HUGEINT) * 18446744073709551616)
       |              // kw.kth AS BIGINT) END AS wau_kmv
       |  FROM kd JOIN kw ON kd.d = kw.d)
       |SELECT day_i, dau_kmv, wau_kmv,
       |  CAST(dau_kmv * 1000000 // wau_kmv AS BIGINT) AS stickiness_ppm
       |FROM est ORDER BY day_i""".stripMargin
  }

  val eventStickinessSql: String =
    """WITH du AS (
      |  SELECT DISTINCT epoch_ns(ts) // 86400000000000 AS day_i, user_id
      |  FROM events),
      |dau AS (SELECT day_i, count(*) AS dau FROM du GROUP BY 1),
      |grid AS (SELECT DISTINCT day_i AS d FROM du),
      |wau AS (
      |  SELECT d, count(*) AS wau FROM (
      |    SELECT DISTINCT g.d, du.user_id
      |    FROM du JOIN grid g ON du.day_i BETWEEN g.d - 6 AND g.d)
      |  GROUP BY 1)
      |SELECT day_i, CAST(dau AS BIGINT) AS dau,
      |  CAST(wau AS BIGINT) AS wau,
      |  CAST(dau * 1000000 // wau AS BIGINT) AS stickiness_ppm
      |FROM dau JOIN wau ON day_i = d
      |ORDER BY day_i""".stripMargin

  // ----------------------------------------------------------------
  // Key-uniqueness audit: the PK contract across every table
  // ----------------------------------------------------------------

  /** Primary-key uniqueness audit across the whole star schema — the
    * DQ contract [[dqReferential]] (FK edges) presupposes: for each
    * table, row count vs distinct declared-key count and the
    * duplicate rate in ppm (lineitem's key is the COMPOSITE
    * (l_orderkey, l_linenumber) — audited as a true multi-column
    * DISTINCT, `countDistinct(k1, k2)` vs DuckDB's row-value
    * `count(DISTINCT (k1, k2))`, so no packing arithmetic can alias
    * at any corpus size — ADVICE r15 #1 retired the 2²⁰-packed
    * variant whose overflow guard was documented but absent). Each
    * arm is one two-stage distinct aggregate,
    * map-side-combinable; the 8-row result unions the per-table
    * audits. Both verdict arms are live in this corpus: the seven
    * dimension/fact ids are clean, while lineitem's NOMINAL composite
    * key is genuinely violated by the generator (~23% duplicate pairs
    * at sf0.01 — the same collision quirk that forced full window
    * tiebreaks at sf1 in round 15). The audit DETECTS that instead of
    * assuming the textbook schema — exactly what a PK contract check
    * is for.
    */
  def dqUniqueness(spark: SparkSession, dir: String): DataFrame = {
    def audit(name: String, df: DataFrame, key: Column*): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
          countDistinct(key.head, key.tail: _*).as("n_keys"))
        .select(lit(name).as("tbl"), col("n_rows"), col("n_keys"),
          expr("(n_rows - n_keys) * 1000000 div n_rows").as("dup_ppm"))
    val li = t(spark, dir, "lineitem")
    Seq(
      audit("customer", t(spark, dir, "customer"), col("c_custkey")),
      audit("documents", Tables.table(spark, dir, "documents"), col("doc_id")),
      audit("embeddings", Tables.table(spark, dir, "embeddings"), col("vec_id")),
      audit("events", Tables.events(spark, dir), col("event_id")),
      audit("lineitem", li, col("l_orderkey"), col("l_linenumber")),
      audit("orders", t(spark, dir, "orders"), col("o_orderkey")),
      audit("part", t(spark, dir, "part"), col("p_partkey")),
      audit("supplier", t(spark, dir, "supplier"), col("s_suppkey")))
      .reduce(_ unionAll _)
      .orderBy("tbl")
  }

  val dqUniquenessSql: String =
    """WITH u AS (
      |  SELECT 'customer' AS tbl, count(*) AS n_rows,
      |    count(DISTINCT c_custkey) AS n_keys FROM customer
      |  UNION ALL SELECT 'documents', count(*),
      |    count(DISTINCT doc_id) FROM documents
      |  UNION ALL SELECT 'embeddings', count(*),
      |    count(DISTINCT vec_id) FROM embeddings
      |  UNION ALL SELECT 'events', count(*),
      |    count(DISTINCT event_id) FROM events
      |  UNION ALL SELECT 'lineitem', count(*),
      |    count(DISTINCT (l_orderkey, l_linenumber)) FROM lineitem
      |  UNION ALL SELECT 'orders', count(*),
      |    count(DISTINCT o_orderkey) FROM orders
      |  UNION ALL SELECT 'part', count(*),
      |    count(DISTINCT p_partkey) FROM part
      |  UNION ALL SELECT 'supplier', count(*),
      |    count(DISTINCT s_suppkey) FROM supplier)
      |SELECT tbl, CAST(n_rows AS BIGINT) AS n_rows,
      |  CAST(n_keys AS BIGINT) AS n_keys,
      |  CAST((n_rows - n_keys) * 1000000 // n_rows AS BIGINT) AS dup_ppm
      |FROM u ORDER BY tbl""".stripMargin

  // ----------------------------------------------------------------
  // Data freshness audit: per-stream staleness + hour coverage
  // ----------------------------------------------------------------

  /** Stream freshness audit per event type — the pipeline-monitoring
    * complement of the value-drift audits (dq_psi) and the volume
    * audits (event_anomaly): how stale is each stream vs the corpus
    * watermark, and what fraction of the corpus's hour grid did it
    * cover? Staleness is `corpus_max − stream_max` in exact epoch
    * seconds (µs floors, the eventRfm rail); coverage is a DISTINCT
    * hour-bucket count against the corpus hour span — a hash agg at
    * calendar-bounded (type × hour) grain with map-side partials,
    * deliberately NOT a per-stream ordered gap scan (a max-intra-gap
    * variant would sort fact-scale rows per (type, day) partition,
    * which GROWS with corpus size — the event_funnel_time lesson).
    * Both ppm divides truncate identically in both engines.
    */
  def dqFreshness(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("ts_ns div 1000000000").as("s"),
        expr("ts_ns div 3600000000000").as("hour_i"))
    val per = ev.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        min(col("s")).as("first_s"),
        max(col("s")).as("last_s"),
        countDistinct(col("hour_i")).as("hours_covered"))
    val corpus = ev.agg(
      max(col("s")).as("corpus_last_s"),
      (max(col("hour_i")) - min(col("hour_i")) + 1).as("corpus_hours"))
    per.crossJoin(broadcast(corpus)) // 1-row aggregate
      .select(col("event_type"), col("n"),
        col("first_s"), col("last_s"),
        (col("corpus_last_s") - col("last_s")).as("staleness_s"),
        col("hours_covered"),
        expr("hours_covered * 1000000 div corpus_hours")
          .as("coverage_ppm"))
      .orderBy("event_type")
  }

  val dqFreshnessSql: String =
    """WITH ev AS (
      |  SELECT event_type, epoch_ns(ts) // 1000000000 AS s,
      |    epoch_ns(ts) // 3600000000000 AS hour_i
      |  FROM events),
      |per AS (
      |  SELECT event_type, count(*) AS n,
      |    min(s) AS first_s, max(s) AS last_s,
      |    count(DISTINCT hour_i) AS hours_covered
      |  FROM ev GROUP BY 1),
      |corpus AS (
      |  SELECT max(s) AS corpus_last_s,
      |    max(hour_i) - min(hour_i) + 1 AS corpus_hours
      |  FROM ev)
      |SELECT event_type, n, first_s, last_s,
      |  corpus_last_s - last_s AS staleness_s,
      |  CAST(hours_covered AS BIGINT) AS hours_covered,
      |  CAST(hours_covered * 1000000 // corpus_hours AS BIGINT)
      |    AS coverage_ppm
      |FROM per, corpus
      |ORDER BY event_type""".stripMargin

  // ----------------------------------------------------------------
  // Cohort LTV: week cohorts x age, cumulative revenue per user
  // ----------------------------------------------------------------

  /** Cohort lifetime value — the revenue companion of the retention
    * matrix (event_retention): users cohorted by their FIRST purchase
    * week, purchase revenue accumulated per cohort-age week, released
    * as cumulative LTV per cohort user in exact integer cents and a
    * per-user trunc-div. Shapes: the first-purchase relation is one
    * user-grain map-side-combinable min; it joins back at user key
    * grain; the (cohort, age) cell agg is calendar²-bounded; the
    * cumulative sum is a window over the CELL relation (≤ weeks² rows
    * — value-bounded, never entity-grain). Ages are ≥ 0 by
    * construction (only purchase events, cohort = their min week).
    */
  def eventCohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        expr("ts_ns div 604800000000000").as("week_i"),
        (dec(col("value")) * 100).cast("long").as("cents"))
    val cohort = p.groupBy(col("user_id"))
      .agg(min(col("week_i")).as("cohort_w"))
    val sized = cohort.groupBy(col("cohort_w"))
      .agg(countDistinct(col("user_id")).as("cohort_users"))
    val cells = p.join(cohort, "user_id")
      .groupBy(col("cohort_w"), (col("week_i") - col("cohort_w")).as("age_w"))
      .agg(countDistinct(col("user_id")).as("active_users"),
        sum(col("cents")).as("rev_c"))
    val w = Window.partitionBy("cohort_w").orderBy("age_w")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.join(broadcast(sized), "cohort_w")
      .withColumn("cum_ltv_c", sum(col("rev_c")).over(w))
      .select(col("cohort_w"), col("age_w"), col("cohort_users"),
        col("active_users"), col("rev_c"), col("cum_ltv_c"),
        expr("cum_ltv_c div cohort_users").as("ltv_per_user_c"))
      .orderBy("cohort_w", "age_w")
  }

  val eventCohortLtvSql: String =
    """WITH p AS (
      |  SELECT user_id, epoch_ns(ts) // 604800000000000 AS week_i,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |cohort AS (
      |  SELECT user_id, min(week_i) AS cohort_w FROM p GROUP BY 1),
      |sized AS (
      |  SELECT cohort_w, count(DISTINCT user_id) AS cohort_users
      |  FROM cohort GROUP BY 1),
      |cells AS (
      |  SELECT c.cohort_w, p.week_i - c.cohort_w AS age_w,
      |    count(DISTINCT p.user_id) AS active_users,
      |    CAST(sum(cents) AS BIGINT) AS rev_c
      |  FROM p JOIN cohort c USING (user_id)
      |  GROUP BY 1, 2)
      |SELECT cohort_w, age_w,
      |  CAST(cohort_users AS BIGINT) AS cohort_users,
      |  CAST(active_users AS BIGINT) AS active_users, rev_c,
      |  CAST(sum(rev_c) OVER (PARTITION BY cohort_w ORDER BY age_w
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_ltv_c,
      |  CAST(CAST(sum(rev_c) OVER (PARTITION BY cohort_w ORDER BY age_w
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) // cohort_users
      |    AS BIGINT) AS ltv_per_user_c
      |FROM cells JOIN sized USING (cohort_w)
      |ORDER BY cohort_w, age_w""".stripMargin

  // ----------------------------------------------------------------
  // Week-over-week churn: the growth-accounting ledger
  // ----------------------------------------------------------------

  /** Week-over-week growth accounting (the public "growth
    * accounting" decomposition every product-analytics stack runs):
    * per activity week, active users split into NEW (first-ever
    * week), RETAINED (also active the previous week) and
    * RESURRECTED (seen before, but not last week), plus the forward
    * churn rate — the share of this week's actives absent next week.
    * Weeks with no successor in the corpus are excluded (their
    * forward churn is right-censored, not zero — emitting a fake 0
    * is the classic churn-dashboard bug).
    *
    * Scale shape: one fact scan into a distinct (user, week) set
    * (map-side combinable), a user-grain min for first weeks, and
    * three self-equi-joins of the user-week set on (user, week±1) —
    * all key-partitioned hash joins; no window touches user grain.
    */
  def eventChurn(spark: SparkSession, dir: String): DataFrame = {
    val uw = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts_ns div 604800000000000").as("w"))
      .distinct()
    val firstW = uw.groupBy("user_id").agg(min(col("w")).as("fw"))
    val prev = uw.select(col("user_id"), (col("w") + 1).as("w"),
      lit(1L).as("had_prev"))
    val next = uw.select(col("user_id"), (col("w") - 1).as("w"),
      lit(1L).as("has_next"))
    val flagged = uw
      .join(firstW, "user_id")
      .join(prev, Seq("user_id", "w"), "left")
      .join(next, Seq("user_id", "w"), "left")
    val maxW = uw.agg(max(col("w")).as("max_w"))
    flagged.crossJoin(broadcast(maxW)) // 1-row aggregate
      .filter(col("w") < col("max_w"))
      .groupBy(col("w").as("week_i"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("fw") === col("w"), 1L).otherwise(0L)).as("n_new"),
        sum(coalesce(col("had_prev"), lit(0L))).as("n_retained"),
        sum(when(col("fw") < col("w") && col("had_prev").isNull, 1L)
          .otherwise(0L)).as("n_resurrected"),
        sum(when(col("has_next").isNull, 1L).otherwise(0L)).as("n_churned"))
      .withColumn("churn_ppm", expr("n_churned * 1000000 div n_active"))
      .orderBy("week_i")
  }

  val eventChurnSql: String =
    """WITH uw AS (
      |  SELECT DISTINCT user_id, epoch_ns(ts) // 604800000000000 AS w
      |  FROM events),
      |fw AS (SELECT user_id, min(w) AS fw FROM uw GROUP BY 1),
      |flagged AS (
      |  SELECT uw.user_id, uw.w, fw.fw,
      |    (p.user_id IS NOT NULL) AS had_prev,
      |    (n.user_id IS NOT NULL) AS has_next
      |  FROM uw
      |  JOIN fw USING (user_id)
      |  LEFT JOIN uw p ON p.user_id = uw.user_id AND p.w = uw.w - 1
      |  LEFT JOIN uw n ON n.user_id = uw.user_id AND n.w = uw.w + 1)
      |SELECT w AS week_i, CAST(count(*) AS BIGINT) AS n_active,
      |  CAST(sum(CASE WHEN fw = w THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
      |  CAST(sum(CASE WHEN had_prev THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_retained,
      |  CAST(sum(CASE WHEN fw < w AND NOT had_prev THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_resurrected,
      |  CAST(sum(CASE WHEN NOT has_next THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_churned,
      |  CAST(sum(CASE WHEN NOT has_next THEN 1 ELSE 0 END) * 1000000
      |    // count(*) AS BIGINT) AS churn_ppm
      |FROM flagged
      |WHERE w < (SELECT max(w) FROM uw)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ----------------------------------------------------------------
  // Pareto concentration: how few users generate the traffic?
  // ----------------------------------------------------------------

  private val ParetoCuts = Seq(1L, 5L, 10L, 20L, 50L)

  /** Activity-concentration (Pareto) curve — "what share of events
    * do the top p% of users generate?" for p ∈ {1, 5, 10, 20, 50} —
    * the whale-dependence number next to [[eventGini]]'s scalar.
    * EXACT at every cutoff: the cumulative walk runs over the
    * count-of-counts domain (x = events-per-user, c = users with
    * that x — the [[eventGini]] input shape, value-bounded with
    * witness x, never user grain), the top-p user count is the
    * ceiling ⌈p·U/100⌉, and the crossing bucket is the unique row
    * with cum_prev < k ≤ cum, whose partial block contributes
    * (k − cum_prev)·x events exactly. Truncating-integer ppm
    * release; products stay far inside BIGINT (≤ E·10⁶).
    */
  def eventPareto(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val coc = Tables.events(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("x"))
      .groupBy(col("x")).agg(count(lit(1)).as("c"))
    val walk = org.apache.spark.sql.expressions.Window.orderBy(col("x").desc)
    val walked = coc
      .withColumn("cum_u", sum(col("c")).over(walk))
      .withColumn("cum_e", sum(col("x") * col("c")).over(walk))
    val tot = coc.agg(sum(col("c")).as("tot_u"),
      sum(col("x") * col("c")).as("tot_e"))
    val cuts = ParetoCuts.toDF("pct")
    walked.crossJoin(broadcast(tot)) // bounded: |distinct x| rows
      .crossJoin(broadcast(cuts))
      .withColumn("k", expr("(pct * tot_u + 99) div 100"))
      .filter(col("cum_u") - col("c") < col("k") && col("k") <= col("cum_u"))
      .select(col("pct"), col("k").as("top_users"),
        (col("cum_e") - (col("cum_u") - col("k")) * col("x"))
          .as("top_events"),
        expr("(cum_e - (cum_u - k) * x) * 1000000 div tot_e")
          .as("share_ppm"))
      .orderBy("pct")
  }

  val eventParetoSql: String = {
    val cuts = ParetoCuts.mkString(", ")
    s"""WITH cnt AS (
       |  SELECT user_id, count(*) AS x FROM events GROUP BY 1),
       |coc AS (SELECT x, count(*) AS c FROM cnt GROUP BY 1),
       |walked AS (
       |  SELECT x, c,
       |    sum(c) OVER (ORDER BY x DESC) AS cum_u,
       |    sum(x * c) OVER (ORDER BY x DESC) AS cum_e
       |  FROM coc),
       |tot AS (
       |  SELECT sum(c) AS tot_u, sum(x * c) AS tot_e FROM coc),
       |cuts AS (SELECT unnest(ARRAY[$cuts]) AS pct)
       |SELECT CAST(pct AS BIGINT) AS pct,
       |  CAST((pct * tot_u + 99) // 100 AS BIGINT) AS top_users,
       |  CAST(cum_e - (cum_u - (pct * tot_u + 99) // 100) * x AS BIGINT)
       |    AS top_events,
       |  CAST((cum_e - (cum_u - (pct * tot_u + 99) // 100) * x) * 1000000
       |    // tot_e AS BIGINT) AS share_ppm
       |FROM walked, tot, cuts
       |WHERE cum_u - c < (pct * tot_u + 99) // 100
       |  AND (pct * tot_u + 99) // 100 <= cum_u
       |ORDER BY pct""".stripMargin
  }

  // ----------------------------------------------------------------
  // Event-type audience overlap: the co-usage matrix
  // ----------------------------------------------------------------

  /** Pairwise event-type HEAVY-AUDIENCE overlap — which behaviors
    * share their power users? The raw any-activity audience is
    * degenerate on this generator (every user touches every type —
    * Jaccard 1.0 everywhere, the q22 corpus lesson), so the audited
    * set is each type's ABOVE-MEAN users: count(user, type) strictly
    * above the type's mean, an exact integer cross-multiply
    * (n·k > Σn — no float mean). For each unordered type pair:
    * intersection size, Jaccard and overlap-coefficient
    * (Szymkiewicz–Simpson) in exact ppm — the co-usage matrix
    * segmentation and funnel design start from, with all 10 pairs
    * live in-gate (Jaccard 0.22–0.41 at sf0.01). Scale shape: one
    * (user, type) hash agg, a broadcast per-type mean join, a
    * user-keyed self-equi-join fanning out to ≤ |types|² per user
    * (types are a bounded domain), and a pair-grain hash agg.
    */
  def eventOverlap(spark: SparkSession, dir: String): DataFrame = {
    val cnt = Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val means = cnt.groupBy(col("event_type"))
      .agg(sum(col("n")).as("s"), count(lit(1)).as("k"))
    val ut = cnt.join(broadcast(means), "event_type")
      .filter(col("n") * col("k") > col("s"))
      .select(col("user_id"), col("event_type"))
    val perType = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val a = ut.toDF("user_id", "type_a")
    val b = ut.toDF("user_id", "type_b")
    a.join(b, "user_id")
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_both"))
      .join(broadcast(perType.toDF("type_a", "na")), "type_a")
      .join(broadcast(perType.toDF("type_b", "nb")), "type_b")
      .select(col("type_a"), col("type_b"), col("na"), col("nb"),
        col("n_both"),
        expr("n_both * 1000000 div (na + nb - n_both)").as("jaccard_ppm"),
        expr("n_both * 1000000 div least(na, nb)").as("overlap_ppm"))
      .orderBy("type_a", "type_b")
  }

  val eventOverlapSql: String =
    """WITH cnt AS (
      |  SELECT user_id, event_type, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, sum(n) AS s, count(*) AS k
      |  FROM cnt GROUP BY 1),
      |ut AS (
      |  SELECT cnt.user_id, cnt.event_type
      |  FROM cnt JOIN m USING (event_type) WHERE cnt.n * m.k > m.s),
      |pt AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1),
      |pairs AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    count(*) AS n_both
      |  FROM ut a JOIN ut b ON a.user_id = b.user_id
      |    AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT type_a, type_b,
      |  CAST(pa.n AS BIGINT) AS na, CAST(pb.n AS BIGINT) AS nb,
      |  CAST(n_both AS BIGINT) AS n_both,
      |  CAST(n_both * 1000000 // (pa.n + pb.n - n_both) AS BIGINT)
      |    AS jaccard_ppm,
      |  CAST(n_both * 1000000 // least(pa.n, pb.n) AS BIGINT)
      |    AS overlap_ppm
      |FROM pairs
      |JOIN pt pa ON pa.event_type = type_a
      |JOIN pt pb ON pb.event_type = type_b
      |ORDER BY type_a, type_b""".stripMargin
}
