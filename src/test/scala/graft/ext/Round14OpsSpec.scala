package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Round-14 operators. The oracle gate carries the hash-equality
  * check; these pin semantics on independent local replays and
  * crafted invariants.
  */
class Round14OpsSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("retrievalMrr: reciprocal ranks replay from the two registered relations") {
    val exact = Similarity.simTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet // (q_id, c_id)
    val approx = Similarity.simIvf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) // (q, rn, c)
    val expect = approx.groupBy(_._1).map { case (q, rows) =>
      val hits = rows.filter(r => exact((q, r._3))).map(_._2)
      val first = if (hits.isEmpty) 0L else hits.min
      (q, first, if (first == 0L) 0L else 1000000L / first)
    }.toSet
    val got = Similarity.retrievalMrr(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
    assert(got.nonEmpty && got.exists(_._3 > 0L), "MRR must be non-vacuous")
  }

  test("privacyDpMean: hash-seeded noise and clamped sums replay exactly") {
    val P = 1000000007L
    def polyHash(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % P)
    val DpRange = 786432L
    def mag(u3: Long): Long = {
      if (u3 < 262144L) 0L
      else (1 to 19).find(j => u3 < DpRange - (1L << (19 - j)))
        .getOrElse(19).toLong
    }
    def noise(key: String): Long = {
      val h = polyHash(key)
      val m = mag(h % DpRange)
      if (m == 0L) 0L else if ((h / 2097152) % 2 == 0) m else -m
    }
    val rows = Privacy.privacyDpMean(spark, dir).collect()
    assert(rows.length == 5)
    for (r <- rows) {
      val (prio, n, sumC) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(r.getLong(3) == noise(s"$prio|dpm-n"), s"noise_n of $prio")
      assert(r.getLong(4) == noise(s"$prio|dpm-s"), s"noise_s of $prio")
      assert(sumC <= n * 10000000L, "clamp bound")
      val dpN = math.max(n + r.getLong(3), 0L)
      val dpS = math.max(sumC + r.getLong(4) * 10000000L, 0L)
      assert(r.getLong(5) == dpN && r.getLong(6) == dpS)
      assert(r.getLong(7) == dpS / math.max(dpN, 1L))
    }
  }

  test("aggCorr: BigInt replay of the day-grain moments") {
    val daily = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderpriority").as("prio"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("d"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("pc"))
      .groupBy("prio", "d")
      .agg(count(lit(1)).as("x"), expr("CAST(sum(pc) AS BIGINT) div 1000000").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    val expect = daily.groupBy(_._1).map { case (prio, rs) =>
      val n = BigInt(rs.length)
      val sx = rs.map(r => BigInt(r._2)).sum; val sy = rs.map(r => BigInt(r._3)).sum
      val sxx = rs.map(r => BigInt(r._2) * r._2).sum
      val syy = rs.map(r => BigInt(r._3) * r._3).sum
      val sxy = rs.map(r => BigInt(r._2) * r._3).sum
      val cov = n * sxy - sx * sy
      val vxy = (n * sxx - sx * sx) * (n * syy - sy * sy)
      (prio, n.toLong, cov.signum.toLong,
        ((cov * cov * 1000000L) / (vxy max BigInt(1))).toLong)
    }.toSet
    val got = Relational.aggCorr(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
    assert(got.forall(_._4 <= 1000000L + 1L), "r^2 bounded by 1 (ppm)")
  }

  test("windowNtile: bucket-size law and monotone boundaries") {
    val got = Relational.windowNtile(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val segTotals = spark.read.parquet(s"$dir/customer.parquet")
      .groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((seg, total) <- segTotals) {
      val qs = got.filter(_._1 == seg).sortBy(_._2)
      assert(qs.map(_._2).toSeq == Seq(1L, 2L, 3L, 4L))
      assert(qs.map(_._3).sum == total)
      // ANSI ntile: first (total mod 4) buckets carry one extra row
      val base = total / 4; val extra = total % 4
      assert(qs.map(_._3).toSeq ==
        (1 to 4).map(k => base + (if (k <= extra) 1L else 0L)))
      // quartile boundaries are monotone in cents (ties may share a
      // value across adjacent buckets, so min_k >= min_{k-1} and
      // max_k >= max_{k-1} are the exact invariants)
      for (k <- 1 until 4) {
        assert(qs(k)._4 >= qs(k - 1)._4, s"$seg q${k + 1} min regressed")
        assert(qs(k)._5 >= qs(k - 1)._5, s"$seg q${k + 1} max regressed")
      }
    }
  }

  test("eventPaths: local triple replay") {
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr("ts_ns div 1000").as("ts_us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val triples = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val s = rows.sortBy(r => (r._3, r._4)).map(_._2)
      s.sliding(3).filter(_.length == 3).map(t => (t(0), t(1), t(2)))
    }
    val counts = triples.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val total = counts.values.sum
    val expect = counts.map { case ((a, b, c), n) =>
      (a, b, c, n, n * 1000000L / total) }.toSet
    val got = Relational.eventPaths(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == expect)
    // toSeq first: mapping the SET would dedupe equal counts
    assert(got.toSeq.map(_._4).sum == total)
  }

  test("eventStickiness: set replay of DAU/WAU; WAU dominates DAU") {
    val pairs = graft.sources.Tables.events(spark, dir)
      .select(expr("ts_ns div 86400000000000").as("d"), col("user_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDay = pairs.groupBy(_._1).map { case (d, ps) => d -> ps.map(_._2).toSet }
    val expect = byDay.map { case (d, users) =>
      val wau = (d - 6L to d).flatMap(byDay.get).flatten.toSet.size.toLong
      (d, users.size.toLong, wau, users.size.toLong * 1000000L / wau)
    }.toSet
    val got = Relational.eventStickiness(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
    assert(got.forall(r => r._3 >= r._2), "WAU >= DAU")
  }

  test("eventNewUsers: first-seen split replays locally; totals reconcile") {
    val pairs = graft.sources.Tables.events(spark, dir)
      .select(expr("ts_ns div 86400000000000").as("d"), col("user_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val firstDay = pairs.groupBy(_._2).map { case (u, ps) => u -> ps.map(_._1).min }
    val expect = pairs.groupBy(_._1).map { case (d, ps) =>
      val dau = ps.size.toLong
      val nu = ps.count(p => firstDay(p._2) == d).toLong
      (d, dau, nu, dau - nu, nu * 1000000L / dau)
    }.toSet
    val got = Relational.eventNewUsers(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expect)
    // every user is new exactly once: Σ new_users == distinct users
    assert(got.toSeq.map(_._3).sum == firstDay.size.toLong)
  }

  test("eventGini: rank-sum Gini replays against a sorted local computation") {
    val perUser = graft.sources.Tables.events(spark, dir)
      .groupBy("event_type", "user_id").count()
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val expect = perUser.groupBy(_._1).map { case (t, rs) =>
      val xs = rs.map(_._2).sorted // ascending ranks 1..n
      val n = BigInt(xs.length)
      val tot = xs.map(BigInt(_)).sum
      val rankMass = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
      val gini = (2 * rankMass - (n + 1) * tot) * 1000000 / (n * tot)
      (t, n.toLong, tot.toLong, gini.toLong)
    }.toSet
    val got = Relational.eventGini(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
    assert(got.forall(r => r._4 >= 0L && r._4 < 1000000L), "0 <= G < 1")
  }

  test("aggHhi: sum-of-squared-shares replays in BigInt; bounds hold") {
    val byCust = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_custkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("pc"))
      .join(spark.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey")), "o_custkey")
      .groupBy("c_nationkey", "o_custkey").agg(sum("pc").as("x"))
      .selectExpr("CAST(c_nationkey AS BIGINT) AS nat", "x")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = byCust.groupBy(_._1).map { case (nat, rs) =>
      val xs = rs.map(r => BigInt(r._2))
      val tot = xs.sum
      (nat, rs.length.toLong, tot.toLong,
        (xs.map(x => x * x).sum * 1000000 / (tot * tot)).toLong,
        (xs.max * 1000000 / tot).toLong)
    }.toSet
    val got = Relational.aggHhi(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expect)
    // 1/n <= HHI <= 1: the lower bound in ppm, with floor slack
    for (r <- got.toSeq)
      assert(r._4 >= 1000000L / r._2 - 1 && r._4 <= 1000000L)
  }

  test("tsDrawdown: running-peak drawdown replays locally") {
    val daily = graft.sources.Tables.events(spark, dir)
      .select(col("event_type"), expr("ts_ns div 86400000000000").as("d"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("vc"))
      .groupBy("event_type", "d").agg(sum("vc").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = daily.groupBy(_._1).map { case (t, rs) =>
      val s = rs.sortBy(_._2)
      var cum = 0L; var peak = Long.MinValue
      var bestDd = Long.MinValue; var trough = 0L; var peakMax = Long.MinValue
      for ((_, d, c) <- s) {
        cum += c; peak = math.max(peak, cum); peakMax = math.max(peakMax, peak)
        val dd = peak - cum
        if (dd > bestDd) { bestDd = dd; trough = d }
      }
      (t, s.length.toLong, peakMax, bestDd, trough)
    }.toSet
    val got = TimeSeries.tsDrawdown(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expect)
  }

  test("eventFunnelTime: deltas compose from the funnel relation; " +
    "log2-bucketed median (round-15 domain bound) replays locally") {
    val f = Relational.eventFunnel(spark, dir).collect()
    def bk(d: Long): Long =
      if (d == 0L) -1L else (63 - java.lang.Long.numberOfLeadingZeros(d)).toLong
    def stats(ds: Seq[Long]): (Long, Long, Long, Long) = {
      val s = ds.sorted
      // bucket ordering refines delta ordering (log2 is monotone), so
      // the rank-(n+1)/2 element's bucket IS the first cum-covering
      // bucket, and p50_floor is that bucket's smallest delta
      val med = s(((s.length + 1) / 2 - 1).toInt)
      val b = bk(med)
      (s.length.toLong, b, s.filter(bk(_) == b).min, s.sum / s.length)
    }
    val vToC = f.filter(!_.isNullAt(3)).map(r => r.getLong(3) - r.getLong(2))
    val cToP = f.filter(!_.isNullAt(4)).map(r => r.getLong(4) - r.getLong(3))
    val expect = Set(
      ("1_view_to_click", stats(vToC.toSeq)),
      ("2_click_to_purchase", stats(cToP.toSeq)))
    val got = Relational.eventFunnelTime(spark, dir).collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toSet
    assert(got == expect)
    assert(got.forall(_._2._2 >= 0L), "conversion takes positive time")
    assert(got.forall(t => bk(t._2._3) == t._2._2),
      "p50_floor_us lies inside the median bucket")
  }

  test("tsWinsorize: discrete picks and clamped means replay locally") {
    val daily = graft.sources.Tables.events(spark, dir)
      .select(col("event_type"), expr("ts_ns div 86400000000000").as("d"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("vc"))
      .groupBy("event_type", "d").agg(sum("vc").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = daily.groupBy(_._1).map { case (t, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._2)).map(_._3)
      val n = sorted.length.toLong
      def pick(p: Long) = sorted(((n * p + 99) / 100 - 1).toInt)
      val (p05, p95) = (pick(5), pick(95))
      val wsum = sorted.map(v => math.max(math.min(v, p95), p05)).sum
      (t, n, p05, p95, sorted.sum / n, wsum / n)
    }.toSet
    val got = TimeSeries.tsWinsorize(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expect)
    for (r <- got) {
      assert(r._3 <= r._4, "p05 <= p95")
      assert(r._6 >= r._3 && r._6 <= r._4, "winsorized mean inside the fences")
    }
  }
}
