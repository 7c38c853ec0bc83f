package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Round-16 operators, batch 1 (text diversity trio + event
  * analytics trio): independent local replays in BigInt/Double +
  * non-vacuity pins.
  */
class Round16OpsSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  /** (source, term) -> count, replayed independently. */
  private def termCounts(d: String): Map[(String, String), Long] = {
    val rows = graft.sources.Tables.table(spark, d, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    rows.flatMap { case (s, t) =>
      t.split(" +").filter(_.nonEmpty).map(w => (s, w))
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
  }

  test("textSimpson: exact-rational diversity replays; dominance < 1") {
    val tc = termCounts(dir)
    val expect = tc.groupBy(_._1._1).map { case (src, m) =>
      val cs = m.values.toSeq
      val n = cs.sum
      val ss = cs.map(c => BigInt(c) * (c - 1)).sum
      (src, cs.size.toLong, n,
        (ss * 1000000 / (BigInt(n) * (n - 1))).toLong,
        cs.max * 1000000L / n)
    }.toSet
    val got = TextAnalysis.textSimpson(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == expect)
    // non-vacuity: repeated tokens exist (simpson > 0) and no source
    // is single-token dominated
    assert(got.forall(r => r._4 > 0 && r._5 < 1000000L))
  }

  test("textHapax: Good-Turing tail census replays; both f1 and f2 live") {
    val tc = termCounts(dir)
    val expect = tc.groupBy(_._1._1).map { case (src, m) =>
      val cs = m.values.toSeq
      val f1 = cs.count(_ == 1L).toLong; val f2 = cs.count(_ == 2L).toLong
      (src, cs.size.toLong, cs.sum, f1, f2,
        f1 * 1000000L / cs.size, f1 * 1000000L / cs.sum)
    }.toSet
    val got = TextAnalysis.textHapax(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == expect)
    assert(got.exists(_._4 > 0) && got.exists(_._5 > 0),
      "hapax census vacuous on this corpus")
  }

  test("textJsd: pairwise divergence replays in Double; bounded by ln 2") {
    val Ln2 = 0.6931471805599453
    val tc = termCounts(dir)
    val tot = tc.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    val bySrc = tc.groupBy(_._1._1)
      .map { case (s, m) => s -> m.map { case ((_, w), c) => w -> c } }
    val sources = tot.keySet.toSeq.sorted
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = (for {
      i <- sources.indices; j <- (i + 1) until sources.size
    } yield {
      val (sa, sb) = (sources(i), sources(j))
      val (ma, mb) = (bySrc(sa), bySrc(sb))
      val shared = (ma.keySet & mb.keySet).toSeq.sorted
      val ps = shared.map(w => ma(w).toDouble / tot(sa))
      val qs = shared.map(w => mb(w).toDouble / tot(sb))
      val contribs = shared.map { w =>
        val p = ma(w).toDouble / tot(sa); val q = mb(w).toDouble / tot(sb)
        p * math.log(2 * p / (p + q)) + q * math.log(2 * q / (p + q))
      }
      (sa, sb, shared.size.toLong,
        r6(0.5 * contribs.foldLeft(0.0)(_ + _) +
          0.5 * Ln2 * (2.0 - ps.foldLeft(0.0)(_ + _) -
            qs.foldLeft(0.0)(_ + _))))
    }).toSet
    val got = TextAnalysis.textJsd(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == expect)
    // JSD ∈ [0, ln 2]; the corpus sources genuinely differ (no 0s)
    assert(got.forall(r => r._4 > 0.0 && r._4 <= Ln2))
  }

  /** Distinct (user, week) activity set, replayed independently. */
  private def userWeeks(d: String): Set[(Long, Long)] =
    graft.sources.Tables.events(spark, d)
      .select(col("user_id"), expr("ts_ns div 604800000000000").as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("eventChurn: growth-accounting ledger replays; identity holds") {
    val uw = userWeeks(dir)
    val firstW = uw.groupBy(_._1).map { case (u, s) => u -> s.map(_._2).min }
    val maxW = uw.map(_._2).max
    val weeks = uw.map(_._2).filter(_ < maxW)
    val expect = weeks.map { w =>
      val act = uw.filter(_._2 == w).map(_._1)
      val nNew = act.count(u => firstW(u) == w).toLong
      val ret = act.count(u => uw((u, w - 1))).toLong
      val res = act.count(u => firstW(u) < w && !uw((u, w - 1))).toLong
      val churn = act.count(u => !uw((u, w + 1))).toLong
      (w, act.size.toLong, nNew, ret, res, churn,
        churn * 1000000L / act.size)
    }
    val got = Relational.eventChurn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == expect)
    // the ledger identity: active = new + retained + resurrected
    assert(got.forall(r => r._2 == r._3 + r._4 + r._5))
    // censoring: the corpus max week is excluded
    assert(!got.exists(_._1 == maxW))
  }

  test("eventPareto: exact crossing-bucket shares replay; curve is concave") {
    val ev = graft.sources.Tables.events(spark, dir)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(1))
    val totU = ev.length.toLong; val totE = ev.sum
    val sorted = ev.sorted(Ordering[Long].reverse)
    val expect = Seq(1L, 5L, 10L, 20L, 50L).map { pct =>
      val k = (pct * totU + 99) / 100
      val topE = sorted.take(k.toInt).sum
      (pct, k, topE, topE * 1000000L / totE)
    }.toSet
    val got = Relational.eventPareto(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expect)
    // concavity in shares; top-50% strictly exceeds 50% of events
    val byPct = got.toSeq.sortBy(_._1)
    assert(byPct.map(_._4) == byPct.map(_._4).sorted)
    assert(byPct.last._4 > 500000L)
  }

  test("eventOverlap: heavy-audience Jaccard/overlap replay; both arms live") {
    // the HEAVY audience: per-type count strictly above the type mean
    // (exact cross-multiply) — the any-activity audience is Jaccard-1
    // degenerate on this generator
    val cnt = graft.sources.Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type")).count().collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    val types = cnt.keySet.map(_._2).toSeq.sorted
    val byType = types.map { t =>
      val m = cnt.filter(_._1._2 == t)
      val (s, k) = (m.values.sum, m.size.toLong)
      t -> m.filter { case (_, n) => n * k > s }.keySet.map(_._1)
    }.toMap
    val expect = (for {
      i <- types.indices; j <- (i + 1) until types.size
    } yield {
      val (a, b) = (types(i), types(j))
      val inter = (byType(a) & byType(b)).size.toLong
      val (na, nb) = (byType(a).size.toLong, byType(b).size.toLong)
      (a, b, na, nb, inter, inter * 1000000L / (na + nb - inter),
        inter * 1000000L / math.min(na, nb))
    }).toSet
    val got = Relational.eventOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == expect)
    assert(got.forall(r => r._5 > 0 && r._6 < 1000000L),
      "overlap matrix degenerate (disjoint or identical audiences)")
  }
}
