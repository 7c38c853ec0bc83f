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

  /** Events fixture at second precision (the Round12bOpsSpec shape). */
  private def eventsDir(rows: Seq[(Long, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r13-events").toString
    rows.toDF("event_id", "sec", "event_type", "value")
      .selectExpr("event_id", "timestamp_seconds(sec) AS ts",
        "event_id % 7 AS user_id", "event_type", "value", "'{}' AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def corpus(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r13-corpus").toString
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s1' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("tsRsi: monotone ramp pins RSI to 1e6, flat to neutral 500000, " +
    "and a crafted mix replays by hand") {
    // 20 days rising by $1/day -> every delta +100c -> RSI 1000000
    val up = (1 to 20).map(i => (i.toLong, i.toLong * 86400 + 60, "up", i * 1.0))
    // 20 flat days -> all deltas 0 -> gain14+loss14 = 0 -> neutral pin
    val flat = (1 to 20).map(i =>
      (100L + i, i.toLong * 86400 + 120, "flat", 5.0))
    val rows = TimeSeries.tsRsi(spark, eventsDir(up ++ flat)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(5)))
    val byType = rows.groupBy(_._1)
    assert(byType("up").forall(_._3 == 1000000L))
    assert(byType("flat").forall(_._3 == 500000L))
    // rows emitted only past the full lookback: 20 days - 14 = 6 rows
    assert(byType("up").length == 6 && byType("flat").length == 6)
  }

  test("tsRsi: hand-computed value on an alternating series") {
    // days 1..20 alternate +200c, -100c around a base: deltas for the
    // 14-day window are 7 gains of 300 and 7 losses of 300 shifted by
    // the alternation; compute the expectation straight from the data
    val vals = (1 to 20).map(i => if (i % 2 == 0) 7.0 else 4.0)
    val ev = vals.zipWithIndex.map { case (v, i) =>
      ((i + 1).toLong, (i + 1).toLong * 86400 + 60, "x", v) }
    val got = TimeSeries.tsRsi(spark, eventsDir(ev)).collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))
    val cents = vals.map(v => math.round(v * 100))
    val deltas = cents.zip(cents.drop(1)).map { case (a, b) => b - a }
    for ((day, g14, l14, rsi) <- got) {
      val idx = day.toInt - 1 // day_idx is 1-based day number here
      val win = deltas.slice(idx - 14, idx) // deltas for days idx-13..idx
      val g = win.filter(_ > 0).sum
      val l = -win.filter(_ < 0).sum
      assert((g14, l14) == ((g, l)), s"day $day")
      assert(rsi == (if (g + l == 0) 500000L else g * 1000000L / (g + l)))
    }
    assert(got.nonEmpty)
  }

  test("intervalGaps: crafted gaps, earliest-day tie pin, real-corpus replay") {
    // user 1: days 0, 2, 5 -> gaps of (2 days-ish) and (3 days-ish)
    val dir = eventsNsDir(Seq(
      (1L, 1000L, 1L), (2L, 86400000000000L * 2 + 500, 1L),
      (3L, 86400000000000L * 5, 1L),
      (4L, 7L, 2L))) // single-day user: no gaps, absent from output
    val r = TimeSeries.intervalGaps(spark, dir).collect()
    assert(r.length == 1 && r.head.getLong(0) == 1L)
    val g1 = 86400000000000L * 2 + 500 - 1001L
    val g2 = 86400000000000L * 5 - (86400000000000L * 2 + 501L)
    assert(r.head.getLong(1) == 2L)
    assert(r.head.getLong(2) == g1 + g2)
    assert(r.head.getLong(3) == math.max(g1, g2))
    assert(r.head.getLong(4) == (if (g2 >= g1) 5L else 2L))
    // real corpus: totals replay from a collected brute force
    val real = "/root/testdata/sf0.001"
    val iv = graft.sources.Tables.events(spark, real)
      .groupBy(col("user_id"), expr("ts_ns div 86400000000000").as("d"))
      .agg(min(col("ts_ns")).as("s"), (max(col("ts_ns")) + 1).as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = iv.groupBy(_._1).view.mapValues { xs =>
      val a = xs.sortBy(_._2)
      a.sliding(2).collect { case Array(p, c) => c._3 - p._4 }.toSeq
    }.filter(_._2.nonEmpty).toMap
    val got = TimeSeries.intervalGaps(spark, real).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == want.keySet && got.nonEmpty)
    for ((u, gaps) <- want)
      assert(got(u) == ((gaps.length.toLong, gaps.sum, gaps.max)), s"user $u")
  }

  test("textTtr: hand-computed diversity and hapax") {
    val dir = corpus(Seq(
      (0L, "a a a"),            // 3 tokens, 1 type, 0 hapax
      (1L, "a b c"),            // 3/3/3
      (2L, "x y x z  w"),       // run of spaces; 5 tokens 4 types 3 hapax
      (3L, "solo")))            // 1/1/1
    val got = TextAnalysis.textTtr(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      (0L, 3L, 1L, 0L, 333333L),
      (1L, 3L, 3L, 3L, 1000000L),
      (2L, 5L, 4L, 3L, 800000L),
      (3L, 1L, 1L, 1L, 1000000L)))
  }

  test("textPredictability: fully-predictable loop scores 1e6; novel " +
    "transitions score the exact corpus-conditional ppm") {
    // doc 0 is a pure ab-loop; doc 1 introduces one novel transition.
    // corpus bigrams: ab x3 (2 from d0, 1 from d1), ba x3, ac x1
    // prefixes: a -> 4 (ab+ac), b -> 3 (ba)
    val dir = corpus(Seq((0L, "a b a b a"), (1L, "a b a c")))
    val got = TextAnalysis.textPredictability(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // d0: ab(3e6/4=750000) ba(2e6/2=1e6) ab ba -> (750000*2+1000000*2)/4
    val d0 = (750000L * 2 + 1000000L * 2) / 4
    // d1: ab 750000, ba 1000000, ac 1e6/4=250000 -> sum/3
    val d1 = (750000L + 1000000L + 250000L) / 3
    assert(got.toSeq == Seq((0L, 4L, d0), (1L, 3L, d1)))
  }

  test("graphDegreeDist: buckets partition nodes and conserve mass") {
    val dir = "/root/testdata/sf0.001"
    val rows = Graph.graphDegreeDist(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    // every bucket's [min,max] sits inside [2^b, 2^(b+1))
    for ((b, _, mn, mx, _) <- rows) {
      assert(mn >= (1L << b) && mx < (1L << (b + 1)), s"bucket $b [$mn,$mx]")
    }
    // independent replay of degrees from lineitem
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_orderkey") % 8 === 0)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val deg = scala.collection.mutable.Map.empty[Long, Set[Long]]
    for ((_, parts) <- byOrder; a <- parts; b <- parts if a != b)
      deg(a) = deg.getOrElse(a, Set.empty) + b
    assert(rows.map(_._2).sum == deg.size)
    assert(rows.map(_._5).sum == deg.values.map(_.size.toLong).sum)
  }

  test("graphCommunity: matches a plain-Scala sync LP replay") {
    val dir = "/root/testdata/sf0.001"
    val got = Graph.graphCommunity(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    // replay: 4 sync rounds, mode label, ties -> smallest label
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_orderkey") % 8 === 0)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = scala.collection.mutable.Map.empty[Long, Set[Long]]
    for ((_, parts) <- li.groupBy(_._1).view.mapValues(_.map(_._2).toSet);
         a <- parts; b <- parts if a != b)
      nbrs(a) = nbrs.getOrElse(a, Set.empty) + b
    var lab = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to 4) {
      lab = nbrs.map { case (n, ns) =>
        val freq = ns.toSeq.map(lab).groupBy(identity).view.mapValues(_.size)
        n -> freq.toSeq.minBy { case (l, c) => (-c, l) }._1
      }.toMap
    }
    val want = lab.groupBy(_._2).view
      .mapValues(m => (m.size.toLong, m.keys.min, m.keys.max))
      .filter(_._2._1 >= 2)
      .toMap
    assert(got.length == want.size)
    for ((l, n, mn, mx) <- got) assert(want(l) == ((n, mn, mx)), s"label $l")
  }

  test("privacyDpHist: noise replays the exact inverse-CDF sampler and " +
    "dp_n = max(0, n + noise)") {
    val dir = "/root/testdata/sf0.001"
    val got = Privacy.privacyDpHist(spark, dir).collect()
    assert(got.nonEmpty)
    def poly(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    for (r <- got) {
      val h = poly(s"${r.getString(0)}|${r.getString(1)}|dp1")
      val u3 = h % 786432L
      val mag =
        if (u3 < 262144L) 0L
        else (1 to 19).find(j => u3 < 786432L - (1L << (19 - j))).getOrElse(19).toLong
      val noise =
        if (mag == 0) 0L else if ((h / 2097152L) % 2 == 0) mag else -mag
      assert(r.getLong(3) == noise, s"cell ${r.getString(0)}/${r.getString(1)}")
      assert(r.getLong(4) == math.max(0L, r.getLong(2) + noise))
    }
    // the mechanism must actually perturb something on this corpus
    assert(got.exists(_.getLong(3) != 0L), "all-zero noise is suspicious")
  }

  test("dqIqr: quartile picks and fence counts replay from a local sort") {
    val dir = "/root/testdata/sf0.001"
    val got = Relational.dqIqr(spark, dir).collect()
    assert(got.nonEmpty)
    val cents = spark.read.parquet(s"$dir/lineitem.parquet")
      .selectExpr("l_returnflag",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pc")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    for (r <- got) {
      val xs = cents.filter(_._1 == r.getString(0)).map(_._2).sorted
      val n = xs.length.toLong
      val q1 = xs(((n + 3) / 4 - 1).toInt)
      val q3 = xs(((3 * n + 3) / 4 - 1).toInt)
      val iqr = q3 - q1
      val lo = q1 - 3 * iqr / 2
      val hi = q3 + 3 * iqr / 2
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((n, q1, q3)))
      assert((r.getLong(5), r.getLong(6)) == ((lo, hi)))
      assert(r.getLong(7) == xs.count(_ < lo))
      assert(r.getLong(8) == xs.count(_ > hi))
    }
  }

  test("graphFoaf: exact 2-hop reach replays from a local BFS") {
    val dir = "/root/testdata/sf0.001"
    val got = Graph.graphFoaf(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.nonEmpty)
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_orderkey") % 8 === 0)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = scala.collection.mutable.Map.empty[Long, Set[Long]]
    for ((_, parts) <- li.groupBy(_._1).view.mapValues(_.map(_._2).toSet);
         a <- parts; b <- parts if a != b)
      nbrs(a) = nbrs.getOrElse(a, Set.empty) + b
    assert(got.keySet == nbrs.keySet)
    for ((v, ns) <- nbrs) {
      val two = ns.flatMap(nbrs) -- ns - v
      assert(got(v) == ((ns.size.toLong, two.size.toLong)), s"node $v")
    }
  }

  test("eventLagDist: buckets replay from a local lag pass") {
    val dir = "/root/testdata/sf0.001"
    val got = Relational.eventLagDist(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got.nonEmpty)
    val ev = graft.sources.Tables.events(spark, dir)
      .select("user_id", "event_type", "ts_ns", "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val gaps = ev.groupBy(e => (e._1, e._2)).values.flatMap { xs =>
      val s = xs.sortBy(e => (e._3, e._4))
      s.sliding(2).collect { case Array(a, b) =>
        (a._2, (b._3 - a._3) / 1000000000L) }
    }.toSeq
    def bucket(g: Long): Long =
      if (g == 0) -1L else 63L - java.lang.Long.numberOfLeadingZeros(g)
    val want = gaps.groupBy { case (t, g) => (t, bucket(g)) }.view
      .mapValues(xs => (xs.length.toLong, xs.map(_._2).min,
        xs.map(_._2).max, xs.map(_._2).sum))
      .toMap
    assert(got == want)
  }

  test("retrievalNdcg: discounts are the pinned literals and the grade " +
    "replays from the two registered relations") {
    // integer-exact anchors of round(1e6/log2(i+1))
    assert(Similarity.NdcgDiscountsMicro(0) == 1000000L)
    assert(Similarity.NdcgDiscountsMicro(2) == 500000L)
    assert(Similarity.NdcgDiscountsMicro(6) == 333333L)
    assert(Similarity.NdcgIdealMicro ==
      (1 to 10).map(i => (11 - i) * Similarity.NdcgDiscountsMicro(i - 1)).sum)
    val dir = "/root/testdata/sf0.001"
    val exact = Similarity.simTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> (11L - r.getLong(1))).toMap
    val approx = Similarity.simIvf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = approx.groupBy(_._1).view.mapValues { rs =>
      val dcg = rs.map { case (q, rn, c) =>
        exact.getOrElse((q, c), 0L) * Similarity.NdcgDiscountsMicro(rn.toInt - 1)
      }.sum
      (rs.length.toLong,
        rs.count { case (q, _, c) => exact.contains((q, c)) }.toLong,
        dcg, dcg * 1000000L / Similarity.NdcgIdealMicro)
    }.toMap
    val got = Similarity.retrievalNdcg(spark, dir).collect()
    assert(got.nonEmpty)
    for (r <- got) {
      assert(want(r.getLong(0)) ==
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5))),
        s"q ${r.getLong(0)}")
      assert(r.getLong(4) == Similarity.NdcgIdealMicro)
      assert(r.getLong(5) <= 1000000L)
    }
  }

  test("pipelineEpochOrder: endpoints and shard masses replay from the hash") {
    val dir = "/root/testdata/sf0.001"
    val got = PipelineOps.pipelineEpochOrder(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got.nonEmpty)
    def poly(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val want = (for (id <- ids; e <- 0 until 3) yield {
      val h = poly(s"$id:$e")
      (e.toLong, h % 8) -> (id, h)
    }).groupBy(_._1).view.mapValues { xs =>
      val vs = xs.map(_._2)
      val first = vs.minBy(v => (v._2, v._1))._1
      val last = vs.maxBy(v => (v._2, v._1))._1
      (vs.length.toLong, first, last, vs.map(_._2).sum)
    }.toMap
    assert(got == want)
    // epochs genuinely reshuffle: shard assignment differs across epochs
    val e0 = ids.map(id => poly(s"$id:0") % 8).toSeq
    val e1 = ids.map(id => poly(s"$id:1") % 8).toSeq
    assert(e0 != e1)
  }
}
