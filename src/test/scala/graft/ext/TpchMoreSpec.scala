package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** TPC-H Q4/Q10/Q12/Q13/Q14/Q15/Q17/Q19 shapes: independent local
  * replays (BigInt/BigDecimal arithmetic over collected base rows,
  * never the operator's own plan) + non-vacuity and plan-shape pins.
  */
class TpchMoreSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  // q17's qualifying-line set is empty at sf0.001 (35 lines at sf0.01)
  private val dirMid = "/root/testdata/sf0.01"

  /** (orderkey, epoch-day, priority) for orders; NTZ-safe (day number
    * via datediff, never Row.getTimestamp).
    */
  private def orderRows(d: String) =
    graft.sources.Tables.table(spark, d, "orders")
      .select(col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long"),
        col("o_orderpriority"), col("o_custkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))

  private def lineRows(d: String) =
    graft.sources.Tables.table(spark, d, "lineitem")
      .select(col("l_orderkey"),
        datediff(col("l_shipdate"), lit("1970-01-01")).cast("long"),
        col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"),
        (col("l_discount").cast("decimal(18,2)") * 100).cast("long"),
        col("l_quantity").cast("decimal(18,2)").cast("long"),
        col("l_partkey"), col("l_suppkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))

  private def day(s: String): Long = java.time.LocalDate.parse(s).toEpochDay

  /** rev_e4 = price_c * (100 - disc_c), exact in Long (price_c ≤ ~1e7). */
  private def revE4(priceC: Long, discC: Long): Long = priceC * (100L - discC)

  test("q4OrderPriority: late-order distinct counts replay; quarter slice broadcasts") {
    val owin = orderRows(dir).filter(o =>
      o._2 >= day("1996-01-01") && o._2 < day("1996-04-01"))
      .map(o => o._1 -> (o._2, o._3)).toMap
    val late = lineRows(dir)
      .filter(l => owin.contains(l._1) && l._2 - owin(l._1)._1 > 60)
      .map(l => (owin(l._1)._2, l._1)).distinct
    val expect = late.groupBy(_._1).map { case (p, rs) => (p, rs.length.toLong) }
    val got = TpchMore.q4OrderPriority(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == expect)
    assert(got.size == 5, s"all five priorities must survive at sf0.001: $got")
    val plan = TpchMore.q4OrderPriority(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q10ReturnedItems: per-customer returned revenue replays; top-20 order pinned") {
    val owin = orderRows(dir).filter(o =>
      o._2 >= day("1996-01-01") && o._2 < day("1996-07-01"))
      .map(o => o._1 -> o._4).toMap
    val byCust = lineRows(dir)
      .filter(l => l._3 == "R" && owin.contains(l._1))
      .groupBy(l => owin(l._1))
      .map { case (c, rs) => c -> rs.map(l => BigInt(revE4(l._4, l._5))).sum }
    val expect20 = byCust.toSeq.sortBy { case (c, r) => (-r, c) }.take(20)
      .map { case (c, r) => c -> (r.toDouble / 10000.0) }.toMap
    val got = TpchMore.q10ReturnedItems(spark, dir).collect()
    assert(got.length == math.min(byCust.size, 20))
    for (r <- got)
      assert(math.abs(r.getDouble(3) - expect20(r.getLong(0))) < 1e-6,
        s"revenue of ${r.getLong(0)}")
    val ord = got.map(r => (r.getDouble(3), r.getLong(0)))
    assert(ord.sameElements(ord.sortBy(t => (-t._1, t._2))))
  }

  test("q12ShipPriority: LATE/ONTIME x high/low line counts replay exactly") {
    val o = orderRows(dir).map(r => r._1 -> (r._2, r._3)).toMap
    val rows = lineRows(dir)
      .filter(l => l._2 >= day("1996-01-01") && l._2 < day("1997-01-01"))
      .map { l =>
        val (odate, pri) = o(l._1)
        val b = if (l._2 - odate > 60) "LATE" else "ONTIME"
        val hi = pri == "1-URGENT" || pri == "2-HIGH"
        (b, hi)
      }
    val expect = rows.groupBy(_._1).map { case (b, rs) =>
      (b, rs.count(_._2).toLong, rs.count(!_._2).toLong)
    }.toSet
    val got = TpchMore.q12ShipPriority(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
    // both buckets and both priority classes populated (non-vacuity)
    assert(got.map(_._1) == Set("LATE", "ONTIME"))
    assert(got.forall(r => r._2 > 0 && r._3 > 0), got.toString)
  }

  test("q13CustomerDist: zero-order bucket is real; distribution replays") {
    val urgent = orderRows(dir).filter(_._3 == "1-URGENT")
      .groupBy(_._4).map { case (c, rs) => c -> rs.length.toLong }
    val custs = graft.sources.Tables.table(spark, dir, "customer")
      .select(col("c_custkey")).collect().map(_.getLong(0))
    val counts = custs.map(c => urgent.getOrElse(c, 0L))
    val expect = counts.groupBy(identity)
      .map { case (k, rs) => (k, rs.length.toLong) }.toSet
    val got = TpchMore.q13CustomerDist(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect)
    // the adapted exclusion keeps the zero bucket non-vacuous (the
    // textbook NOT-LIKE arm would be empty: every customer orders)
    assert(got.exists(_._1 == 0L), s"zero-order bucket missing: $got")
  }

  test("q14PromoShare: e4 sums and truncating ppm replay in BigInt") {
    val ptype = graft.sources.Tables.table(spark, dir, "part")
      .select(col("p_partkey"), col("p_type"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val win = lineRows(dir).filter(l =>
      l._2 >= day("1996-01-01") && l._2 < day("1997-01-01"))
    val total = win.map(l => BigInt(revE4(l._4, l._5))).sum
    val promo = win.filter(l => ptype(l._7) == "PROMO")
      .map(l => BigInt(revE4(l._4, l._5))).sum
    val r = TpchMore.q14PromoShare(spark, dir).collect().head
    assert(BigInt(r.getLong(0)) == promo && BigInt(r.getLong(1)) == total)
    assert(r.getLong(2) == (promo * 1000000 / total).toLong)
    assert(promo > 0 && promo < total, "both arms must carry revenue")
  }

  test("q15TopSupplier: the max-revenue tie set replays exactly") {
    val rev = lineRows(dir)
      .filter(l => l._2 >= day("1996-01-01") && l._2 < day("1996-04-01"))
      .groupBy(_._8)
      .map { case (s, rs) => s -> rs.map(l => BigInt(revE4(l._4, l._5))).sum }
    val mx = rev.values.max
    val expect = rev.filter(_._2 == mx).map { case (s, r) => (s, r.toLong) }.toSet
    val got = TpchMore.q15TopSupplier(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got == expect)
    val plan = TpchMore.q15TopSupplier(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("window"), plan)
  }

  test("q17SmallQuantity: cross-multiplied 20%-of-avg predicate replays (sf0.01)") {
    val pf = graft.sources.Tables.table(spark, dirMid, "part")
      .filter(col("p_brand") === "Brand#5" && col("p_size") < 10)
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val li2 = lineRows(dirMid).filter(l => pf.contains(l._7))
    val st = li2.groupBy(_._7).map { case (p, rs) =>
      p -> (rs.map(_._6).sum, rs.length.toLong)
    }
    val qual = li2.filter { l =>
      val (sumQty, n) = st(l._7); 5L * l._6 * n < sumQty
    }
    val expectN = qual.length.toLong
    val expectAvg = qual.map(l => BigInt(l._4)).sum / 7
    val r = TpchMore.q17SmallQuantity(spark, dirMid).collect().head
    assert(r.getLong(1) == expectN && expectN > 0L, "qualifying lines (non-vacuity)")
    assert(BigInt(r.getLong(0)) == expectAvg)
  }

  test("q2MinCostSupplier: truncating unit-price min + suppkey tiebreak replay") {
    val ps = graft.sources.Tables.table(spark, dir, "part")
      .filter(col("p_type") === "SMALL" && col("p_size") < 6)
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val up = lineRows(dir).filter(l => ps(l._7))
      .map(l => ((l._7, l._8), l._4 * 10000L / l._6)) // positive: / == div
      .groupBy(_._1).map { case (k, rs) => (k._1, k._2, rs.map(_._2).min) }
    val expect = up.groupBy(_._1).map { case (p, rs) =>
      val mn = rs.map(_._3).min
      val win = rs.filter(_._3 == mn).map(_._2).min
      (p, win, mn)
    }.toSet
    val got = TpchMore.q2MinCostSupplier(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(got == expect)
    assert(got.nonEmpty && got.map(_._1).size == got.size,
      "exactly one winner row per part")
  }

  test("q11ImportantStock: DECIMAL(38) cross-multiplied threshold replays") {
    val nat = graft.sources.Tables.table(spark, dir, "nation")
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val sup3 = graft.sources.Tables.table(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey").cast("long"))
      .collect().filter(r => nat(r.getLong(1)) == "NATION_3")
      .map(_.getLong(0)).toSet
    val retail = graft.sources.Tables.table(spark, dir, "part")
      .select(col("p_partkey"),
        (col("p_retailprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val v = lineRows(dir).filter(l => sup3(l._8))
      .groupBy(_._7).map { case (p, rs) =>
        p -> rs.map(l => BigInt(l._6) * retail(p)).sum
      }
    val tot = v.values.sum
    val expect = v.filter { case (_, vc) => vc * 1000 > tot }
      .map { case (p, vc) => (p, vc.toLong) }.toSet
    val got = TpchMore.q11ImportantStock(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect)
    assert(got.nonEmpty && got.size < v.size,
      "threshold must prune some parts and keep some")
  }

  test("q16PartsSuppliers: observed distinct-supplier counts replay") {
    val sizes = Set(1L, 4L, 9L, 16L, 25L, 36L, 49L)
    val pf = graft.sources.Tables.table(spark, dir, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_type"),
        col("p_size").cast("long"))
      .collect()
      .filter(r => r.getString(1) != "Brand#9" && r.getString(2) != "PROMO" &&
        sizes(r.getLong(3)))
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getLong(3)))
      .toMap
    val expect = lineRows(dir).filter(l => pf.contains(l._7))
      .map(l => (pf(l._7), l._8)).distinct
      .groupBy(_._1).map { case ((b, t2, s), rs) => (b, t2, s, rs.length.toLong) }
      .toSet
    val got = TpchMore.q16PartsSuppliers(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
    // ordering pin: supplier_cnt desc then the three-way group key asc
    val rows = TpchMore.q16PartsSuppliers(spark, dir).collect()
      .map(r => (r.getLong(3), r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.sameElements(rows.sortBy(t => (-t._1, t._2, t._3, t._4))))
  }

  test("q20DominantSuppliers: 2*sqty > tqty dominance on multi-supplier parts replays") {
    val pp = graft.sources.Tables.table(spark, dir, "part")
      .filter(col("p_type") === "PROMO")
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val sq = lineRows(dir)
      .filter(l => pp(l._7) &&
        l._2 >= day("1996-01-01") && l._2 < day("1997-01-01"))
      .groupBy(l => (l._7, l._8))
      .map { case ((p, s), rs) => (p, s, rs.map(_._6).sum) }
    val tq = sq.groupBy(_._1).map { case (p, rs) =>
      p -> (rs.map(_._3).sum, rs.size.toLong)
    }
    val expect = sq.filter { case (p, _, q) =>
      val (tot, nsup) = tq(p); 2 * q > tot && nsup >= 2
    }.groupBy(_._2).map { case (s, rs) => (s, rs.size.toLong) }.toSet
    val got = TpchMore.q20DominantSuppliers(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got == expect)
    assert(got.nonEmpty, "dominance arm must be non-vacuous at sf0.001")
    // single-supplier parts must never qualify (the nsup >= 2 floor)
    val single = tq.filter(_._2._2 == 1).keySet
    val qualParts = sq.filter { case (p, _, q) =>
      val (tot, nsup) = tq(p); 2 * q > tot && nsup >= 2
    }.map(_._1).toSet
    assert(qualParts.intersect(single).isEmpty)
  }

  test("q7VolumeShipping: bilateral nation-pair revenue replays (sf0.01)") {
    // sf0.001 has zero NATION_1<->NATION_2 trade in the window — the
    // replay runs at sf0.01 where all 4 (pair, year) cells are real
    val nat = graft.sources.Tables.table(spark, dirMid, "nation")
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val supN = graft.sources.Tables.table(spark, dirMid, "supplier")
      .select(col("s_suppkey"), col("s_nationkey").cast("long"))
      .collect().map(r => r.getLong(0) -> nat(r.getLong(1))).toMap
    val custN = graft.sources.Tables.table(spark, dirMid, "customer")
      .select(col("c_custkey"), col("c_nationkey").cast("long"))
      .collect().map(r => r.getLong(0) -> nat(r.getLong(1))).toMap
    val ordCust = orderRows(dirMid).map(o => o._1 -> o._4).toMap
    val pair = Set("NATION_1", "NATION_2")
    val expect = lineRows(dirMid)
      .filter(l => l._2 >= day("1996-01-01") && l._2 < day("1998-01-01"))
      .map { l =>
        val sn = supN(l._8); val cn = custN(ordCust(l._1))
        (sn, cn, 1970 + java.time.LocalDate.ofEpochDay(l._2).getYear - 1970,
          l)
      }
      .collect { case (sn, cn, _, l) if pair(sn) && pair(cn) && sn != cn =>
        ((sn, cn, java.time.LocalDate.ofEpochDay(l._2).getYear.toLong),
          BigInt(revE4(l._4, l._5)))
      }
      .groupBy(_._1).map { case (k, rs) => (k._1, k._2, k._3, rs.map(_._2).sum.toLong) }
      .toSet
    val got = TpchMore.q7VolumeShipping(spark, dirMid).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
    assert(got.map(t => (t._1, t._2)).size == 2, s"both directions: $got")
  }

  test("q8MarketShare: conditional e4 sums + truncating ppm replay (sf0.01)") {
    val nat = graft.sources.Tables.table(spark, dirMid, "nation")
      .select(col("n_nationkey").cast("long"), col("n_name"), col("n_regionkey").cast("long"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val asiaKey = graft.sources.Tables.table(spark, dirMid, "region")
      .filter(col("r_name") === "ASIA").select(col("r_regionkey").cast("long"))
      .collect().head.getLong(0)
    val supN = graft.sources.Tables.table(spark, dirMid, "supplier")
      .select(col("s_suppkey"), col("s_nationkey").cast("long"))
      .collect().map(r => r.getLong(0) -> nat(r.getLong(1))._1).toMap
    val custAsia = graft.sources.Tables.table(spark, dirMid, "customer")
      .select(col("c_custkey"), col("c_nationkey").cast("long"))
      .collect().filter(r => nat(r.getLong(1))._2 == asiaKey)
      .map(_.getLong(0)).toSet
    val std = graft.sources.Tables.table(spark, dirMid, "part")
      .filter(col("p_type") === "STANDARD").select(col("p_partkey"))
      .collect().map(_.getLong(0)).toSet
    val ord = orderRows(dirMid)
      .filter(o => o._2 >= day("1996-01-01") && o._2 < day("1998-01-01"))
      .map(o => o._1 -> (java.time.LocalDate.ofEpochDay(o._2).getYear.toLong, o._4))
      .toMap
    val byYear = lineRows(dirMid)
      .filter(l => std(l._7) && ord.contains(l._1) && custAsia(ord(l._1)._2))
      .groupBy(l => ord(l._1)._1)
    val expect = byYear.map { case (y, rs) =>
      val tot = rs.map(l => BigInt(revE4(l._4, l._5))).sum
      val n5 = rs.filter(l => supN(l._8) == "NATION_5")
        .map(l => BigInt(revE4(l._4, l._5))).sum
      (y, n5.toLong, tot.toLong, (n5 * 1000000 / tot).toLong)
    }.toSet
    val got = TpchMore.q8MarketShare(spark, dirMid).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
    assert(got.forall(r => r._2 > 0 && r._2 < r._3),
      s"the NATION_5 arm must be real and partial: $got")
  }

  test("q9ProductProfit: adapted 60%-retail cost algebra replays in BigInt") {
    val bolt = graft.sources.Tables.table(spark, dir, "part")
      .filter(col("p_name").like("%bolt%"))
      .select(col("p_partkey"),
        (col("p_retailprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nat = graft.sources.Tables.table(spark, dir, "nation")
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val supN = graft.sources.Tables.table(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey").cast("long"))
      .collect().map(r => r.getLong(0) -> nat(r.getLong(1))).toMap
    val expect = lineRows(dir).filter(l => bolt.contains(l._7))
      .map { l =>
        val y = java.time.LocalDate.ofEpochDay(l._2).getYear.toLong
        ((supN(l._8), y),
          BigInt(revE4(l._4, l._5)) - BigInt(bolt(l._7)) * 60 * l._6)
      }
      .groupBy(_._1)
      .map { case ((n, y), rs) => (n, y, rs.map(_._2).sum.toLong) }.toSet
    val got = TpchMore.q9ProductProfit(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
    assert(got.size >= 50, s"nation x year grid too sparse: ${got.size}")
  }

  test("q19Discounted: all three OR arms contribute; revenue replays") {
    val part = graft.sources.Tables.table(spark, dir, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_size").cast("long"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    def arm(l: (Long, Long, String, Long, Long, Long, Long, Long),
        brand: String, szHi: Long, qLo: Long, qHi: Long): Boolean = {
      val (b, sz) = part(l._7)
      b == brand && sz >= 1 && sz <= szHi && l._6 >= qLo && l._6 <= qHi
    }
    val qual = lineRows(dir).filter(l =>
      arm(l, "Brand#1", 5, 1, 11) || arm(l, "Brand#2", 10, 10, 20) ||
        arm(l, "Brand#3", 15, 20, 30))
    val expectRev = qual.map(l => BigInt(revE4(l._4, l._5))).sum
    val r = TpchMore.q19Discounted(spark, dir).collect().head
    assert(math.abs(r.getDouble(0) - expectRev.toDouble / 10000.0) < 1e-6)
    assert(r.getLong(1) == qual.length.toLong)
    for (b <- Seq("Brand#1", "Brand#2", "Brand#3"))
      assert(qual.exists(l => part(l._7)._1 == b), s"arm $b is vacuous")
  }
}
