package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** The rest of the TPC-H dashboard (Q4/Q10/Q12/Q13/Q14/Q15/Q17/Q19
  * shapes), adapted to this corpus's star schema the same way
  * Q18/Q21/Q22 were (`Relational.scala`): no `partsupp`, no
  * receipt/commit dates (lateness = ship-lag > 60 days, the
  * [[Relational]] Q21 convention), no `l_shipmode`/`p_container`
  * (bucketed or size-based substitutes, documented per query).
  *
  * Same determinism rails as the rest of the relational surface:
  * money through DECIMAL(18,2) (exact order-independent sums) surfaced
  * as DOUBLE or as integer cents/e4 fixed-point, quantities integral,
  * every result fully ordered, BIGINT ints, and integer-exact
  * average comparisons by cross-multiplication (never a float
  * average in a predicate).
  */
object TpchMore {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(spark, dir, name)

  /** Lateness threshold shared with [[Relational.q21WaitingSuppliers]]:
    * the corpus has no receipt/commit dates, so "late" is ship-lag >
    * 60 days after the order date.
    */
  private val LateDays = 60

  // ----------------------------------------------------------------
  // Q4 — order-priority checking
  // ----------------------------------------------------------------

  /** TPC-H Q4 (order priority checking; lateness adapted, see
    * [[LateDays]]): orders placed in 1996-Q1 with at least one late
    * lineitem, counted per priority. The quarter slice of `orders` is
    * ~1.5% of the table, so it BROADCASTS into the single fact scan
    * (no fact-fact shuffle); the EXISTS becomes `count(DISTINCT
    * o_orderkey)` — the two-stage distinct aggregate at (priority,
    * orderkey) grain, map-side-combinable, never a correlated
    * subquery per order. At 100 TB the quarter slice stays ~1.5% of
    * orders ⟹ still the broadcast side under AQE's size threshold at
    * any SF where orders itself fits a warehouse dimension budget;
    * past that it degrades to one shuffle-hash equi-join, same plan
    * otherwise.
    */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val li = t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
    li.join(broadcast(o), col("l_orderkey") === col("o_orderkey"))
      .filter(datediff(col("l_shipdate"), col("o_orderdate")) > LateDays)
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_orderkey")).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val q4OrderPrioritySql: String =
    s"""SELECT o_orderpriority,
       |  count(DISTINCT o_orderkey) AS order_count
       |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
       |  AND date_diff('day', CAST(o_orderdate AS DATE),
       |      CAST(l_shipdate AS DATE)) > $LateDays
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ----------------------------------------------------------------
  // Q2 — minimum-cost supplier (observed unit price)
  // ----------------------------------------------------------------

  /** TPC-H Q2 (minimum-cost supplier; adapted — the corpus has no
    * `partsupp.ps_supplycost`, so "cost" is the minimum OBSERVED unit
    * price a supplier ever sold the part at: `unit_e6 = price_c ·
    * 10000 div qty`, a truncating integer both engines compute
    * identically): for SMALL parts of size < 6, the cheapest supplier
    * per part (min-suppkey tiebreak ⟹ exactly one row per part). The
    * part slice (~1.7% of parts) broadcasts into the fact scan; the
    * (part, supplier) unit-price agg is map-side-combinable at
    * slice-pruned grain; the per-part min joins back BROADCAST (one
    * row per slice part). No window, no correlated subquery — the
    * textbook Q2 min-cost rewrite.
    */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val ps = t(spark, dir, "part")
      .filter(col("p_type") === "SMALL" && col("p_size") < 6)
      .select(col("p_partkey"))
    val up = t(spark, dir, "lineitem")
      .join(broadcast(ps), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_suppkey"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)" +
          " * 10000 div CAST(l_quantity AS BIGINT)").as("u"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("u")).as("unit_e6"))
    val pm = up.groupBy(col("l_partkey").as("pm_partkey"))
      .agg(min(col("unit_e6")).as("mn"))
    up.join(broadcast(pm),
        col("l_partkey") === col("pm_partkey") && col("unit_e6") === col("mn"))
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(min(col("l_suppkey")).as("s_suppkey"), min(col("unit_e6")).as("unit_e6"))
      .join(broadcast(t(spark, dir, "supplier")
        .select(col("s_suppkey").as("sup_key"), col("s_name"))),
        col("s_suppkey") === col("sup_key"))
      .select(col("p_partkey"), col("s_suppkey"), col("s_name"), col("unit_e6"))
      .orderBy("p_partkey")
  }

  val q2MinCostSupplierSql: String =
    """WITH up AS (
      |  SELECT l_partkey, l_suppkey,
      |    min(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |        * 10000 // CAST(l_quantity AS BIGINT)) AS unit_e6
      |  FROM lineitem JOIN part ON p_partkey = l_partkey
      |  WHERE p_type = 'SMALL' AND p_size < 6
      |  GROUP BY 1, 2),
      |pm AS (SELECT l_partkey, min(unit_e6) AS mn FROM up GROUP BY 1),
      |win AS (
      |  SELECT l_partkey AS p_partkey, min(l_suppkey) AS s_suppkey,
      |    min(unit_e6) AS unit_e6
      |  FROM up JOIN pm USING (l_partkey)
      |  WHERE unit_e6 = mn GROUP BY 1)
      |SELECT p_partkey, s_suppkey, s_name, unit_e6
      |FROM win JOIN supplier USING (s_suppkey)
      |ORDER BY p_partkey""".stripMargin

  // ----------------------------------------------------------------
  // Q11 — important stock identification
  // ----------------------------------------------------------------

  /** TPC-H Q11 (important stock; adapted — no `partsupp.ps_availqty`,
    * so "stock value" is the shipped-quantity value `qty · retail_c`
    * from NATION_3's suppliers): parts whose value exceeds 0.1% of
    * the national total. The threshold comparison is integer-exact
    * by cross-multiplying in DECIMAL(38) (`value_c · 1000 > total` —
    * never a float fraction), with the total as the sanctioned 1-row
    * broadcast aggregate. One fact pass, part-grain hash agg,
    * value-ordered output.
    */
  def q11ImportantStock(spark: SparkSession, dir: String): DataFrame = {
    val sup = t(spark, dir, "supplier")
      .join(broadcast(t(spark, dir, "nation")
        .filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val p = t(spark, dir, "part").select(col("p_partkey"),
      (dec(col("p_retailprice")) * 100).cast("long").as("retail_c"))
    val v = t(spark, dir, "lineitem")
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"))
      .agg(sum(dec(col("l_quantity")).cast("long") * col("retail_c"))
        .cast("long").as("value_c"))
    val tot = v.agg(sum(col("value_c")).cast("long").as("t"))
    v.crossJoin(broadcast(tot)) // 1-row aggregate
      .filter(expr("CAST(value_c AS DECIMAL(38,0)) * 1000 > t"))
      .select(col("p_partkey"), col("value_c"))
      .orderBy(col("value_c").desc, col("p_partkey").asc)
  }

  val q11ImportantStockSql: String =
    """WITH v AS (
      |  SELECT l_partkey AS p_partkey,
      |    CAST(sum(CAST(l_quantity AS BIGINT)
      |         * CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS value_c
      |  FROM lineitem
      |  JOIN part ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation ON n_nationkey = s_nationkey
      |  WHERE n_name = 'NATION_3' GROUP BY 1),
      |tot AS (SELECT CAST(sum(value_c) AS BIGINT) AS t FROM v)
      |SELECT p_partkey, value_c
      |FROM v, tot
      |WHERE CAST(value_c AS HUGEINT) * 1000 > CAST(t AS HUGEINT)
      |ORDER BY value_c DESC, p_partkey ASC""".stripMargin

  // ----------------------------------------------------------------
  // Q16 — parts/supplier relationship count
  // ----------------------------------------------------------------

  /** TPC-H Q16 (parts/supplier relationships; adapted — no `partsupp`
    * relation, so the relationship is OBSERVED in the fact: a
    * supplier relates to a part iff a lineitem links them): distinct
    * supplier counts per (brand, type, size) over the Q16-style
    * slice (one brand excluded, one type excluded, seven sizes). The
    * part dim broadcasts; the distinct count is the two-stage
    * aggregate at (group, suppkey) grain — map-side partials at the
    * (brand,type,size,supp) key, never a global distinct.
    */
  def q16PartsSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val sizes = Seq(1, 4, 9, 16, 25, 36, 49)
    val p = t(spark, dir, "part")
      .filter(col("p_brand") =!= "Brand#9" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(sizes: _*))
      .select(col("p_partkey"), col("p_brand"), col("p_type"),
        col("p_size").cast("long").as("p_size"))
    t(spark, dir, "lineitem").select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
        col("p_type").asc, col("p_size").asc)
  }

  val q16PartsSuppliersSql: String =
    """SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
      |  count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM part JOIN lineitem ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#9' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC""".stripMargin

  // ----------------------------------------------------------------
  // Q20 — dominant promo suppliers
  // ----------------------------------------------------------------

  /** TPC-H Q20 (potential part promotion; adapted — no
    * `ps_availqty`, so the "excess" predicate becomes DOMINANCE: a
    * supplier qualifies if, on some multi-supplier PROMO part, they
    * shipped MORE THAN HALF of its 1996 quantity — `2·sqty > tqty`,
    * integer-exact, with the ≥2-supplier floor keeping single-source
    * parts from qualifying trivially, the Q21 `n_supp ≥ 2`
    * convention): qualifying suppliers with their dominated-part
    * counts. PROMO slice broadcast into one window-pruned fact pass;
    * (part, supplier) then part-grain aggs, both map-side-
    * combinable; the part-totals relation re-joins at key grain.
    */
  def q20DominantSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val pp = t(spark, dir, "part").filter(col("p_type") === "PROMO")
      .select(col("p_partkey"))
    val sq = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(broadcast(pp), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(dec(col("l_quantity")).cast("long")).as("sqty"))
    val tq = sq.groupBy(col("l_partkey").as("tq_partkey"))
      .agg(sum(col("sqty")).as("tqty"), count(lit(1)).as("nsup"))
    sq.join(broadcast(tq), col("l_partkey") === col("tq_partkey"))
      .filter(lit(2L) * col("sqty") > col("tqty") && col("nsup") >= 2L)
      .groupBy(col("l_suppkey").as("s_suppkey"))
      .agg(count(lit(1)).as("n_parts"))
      .join(broadcast(t(spark, dir, "supplier")
        .select(col("s_suppkey").as("sup_key"), col("s_name"))),
        col("s_suppkey") === col("sup_key"))
      .select(col("s_suppkey"), col("s_name"), col("n_parts"))
      .orderBy("s_suppkey")
  }

  val q20DominantSuppliersSql: String =
    """WITH pp AS (SELECT p_partkey FROM part WHERE p_type = 'PROMO'),
      |sq AS (
      |  SELECT l_partkey, l_suppkey,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sqty
      |  FROM lineitem JOIN pp ON p_partkey = l_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  GROUP BY 1, 2),
      |tq AS (
      |  SELECT l_partkey, CAST(sum(sqty) AS BIGINT) AS tqty,
      |    count(*) AS nsup
      |  FROM sq GROUP BY 1)
      |SELECT l_suppkey AS s_suppkey, s_name, count(*) AS n_parts
      |FROM sq JOIN tq USING (l_partkey)
      |JOIN supplier ON supplier.s_suppkey = sq.l_suppkey
      |WHERE 2 * sqty > tqty AND nsup >= 2
      |GROUP BY 1, 2 ORDER BY 1""".stripMargin

  // ----------------------------------------------------------------
  // Q7 — volume shipping between two nations
  // ----------------------------------------------------------------

  /** TPC-H Q7 (volume shipping): bilateral 1996–1997 trade revenue
    * between NATION_1 and NATION_2, by (supplier nation, customer
    * nation, ship year). Both dimension paths are nation-PRUNED
    * before they touch the fact: the supplier and customer slices
    * carry only the two nations (~8% of each), so they broadcast at
    * gate SFs — at warehouse scale the customer path degrades to one
    * key-grain shuffle join, the fact-orders join is the single
    * fact-fact shuffle either way. Revenue in e4 fixed-point (exact;
    * per-group sums ≤ ~1e17 at sf1000), 4-row output.
    */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val nations = Seq("NATION_1", "NATION_2")
    val n = t(spark, dir, "nation").select(col("n_nationkey"), col("n_name"))
    val sup = t(spark, dir, "supplier")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name").isin(nations: _*))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = t(spark, dir, "customer")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .filter(col("n_name").isin(nations: _*))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val o = t(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum((dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
        * 10000).cast("long")).as("revenue_e4"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q7VolumeShippingSql: String =
    """SELECT supp_nation, cust_nation, l_year,
      |  CAST(sum(rev_e4) AS BIGINT) AS revenue_e4
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |         * (1 - CAST(l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT)
      |      AS rev_e4
      |  FROM lineitem
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation n1 ON n1.n_nationkey = s_nationkey
      |  JOIN nation n2 ON n2.n_nationkey = c_nationkey
      |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // ----------------------------------------------------------------
  // Q8 — national market share
  // ----------------------------------------------------------------

  /** TPC-H Q8 (national market share): NATION_5's share of STANDARD-
    * part revenue sold into ASIA-region customers, by order year
    * (1996–1997). The deepest join tree in the dashboard (7 tables);
    * every dimension path is pruned before joining — part to one type
    * (~1/6), customer to one region (~1/5), nation/region broadcast —
    * and the share is a TRUNCATING integer ppm from the conditional
    * e4 sums (the Q14 rail: DECIMAL(38) cross-multiply `div`,
    * quotient ≤ 1e6). 2-row output.
    */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val n = t(spark, dir, "nation")
    val cust = t(spark, dir, "customer")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, dir, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val sup = t(spark, dir, "supplier")
      .join(broadcast(n.select(col("n_nationkey"),
        col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("supp_nation"))
    val p = t(spark, dir, "part").filter(col("p_type") === "STANDARD")
      .select(col("p_partkey"))
    val o = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("long").as("o_year"))
    t(spark, dir, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("o_year"), col("supp_nation"),
        (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
          * 10000).cast("long").as("rev_e4"))
      .groupBy(col("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_5", col("rev_e4"))
          .otherwise(0L)).as("nation_e4"),
        sum(col("rev_e4")).as("total_e4"))
      .select(col("o_year"), col("nation_e4"), col("total_e4"),
        expr("CAST(nation_e4 AS DECIMAL(38,0)) * 1000000 div total_e4")
          .cast("long").as("share_ppm"))
      .orderBy("o_year")
  }

  val q8MarketShareSql: String =
    """WITH rev AS (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |         * (1 - CAST(l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT)
      |      AS rev_e4,
      |    n1.n_name AS supp_nation
      |  FROM lineitem
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation n2 ON n2.n_nationkey = c_nationkey
      |  JOIN region ON r_regionkey = n2.n_regionkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation n1 ON n1.n_nationkey = s_nationkey
      |  JOIN part ON p_partkey = l_partkey
      |  WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
      |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
      |SELECT o_year,
      |  CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN rev_e4 ELSE 0 END)
      |    AS BIGINT) AS nation_e4,
      |  CAST(sum(rev_e4) AS BIGINT) AS total_e4,
      |  CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN rev_e4
      |            ELSE 0 END) AS HUGEINT) * 1000000
      |       // CAST(sum(rev_e4) AS HUGEINT) AS BIGINT) AS share_ppm
      |FROM rev GROUP BY 1 ORDER BY 1""".stripMargin

  // ----------------------------------------------------------------
  // Q9 — product-type profit
  // ----------------------------------------------------------------

  /** TPC-H Q9 (product-type profit; adapted — the corpus has no
    * `partsupp`, so supply cost is defined as 60% of the part's
    * retail price: `cost_e4 = retail_c · 60 · qty`, exact in e4
    * fixed-point with zero division): profit on '%bolt%' parts by
    * supplier nation and ship year. The name-filtered part slice
    * (~1/8) and the supplier/nation dims broadcast into one fact
    * pass; per-(nation, year) BIGINT sums stay ≤ ~1e17 at sf1000
    * (per-row |profit_e4| < 1e10, group width ~n/175).
    */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val p = t(spark, dir, "part").filter(col("p_name").like("%bolt%"))
      .select(col("p_partkey"),
        (dec(col("p_retailprice")) * 100).cast("long").as("retail_c"))
    val sup = t(spark, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val n = t(spark, dir, "nation").select(col("n_nationkey"), col("n_name"))
    t(spark, dir, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"),
        year(col("l_shipdate")).cast("long").as("o_year"),
        ((dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
          * 10000).cast("long")
          - col("retail_c") * 60L * dec(col("l_quantity")).cast("long"))
          .as("profit_e4"))
      .groupBy(col("nation"), col("o_year"))
      .agg(sum(col("profit_e4")).as("profit_e4"))
      .orderBy("nation", "o_year")
  }

  val q9ProductProfitSql: String =
    """SELECT n_name AS nation,
      |  CAST(year(l_shipdate) AS BIGINT) AS o_year,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |           * (1 - CAST(l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT)
      |       - CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |         * 60 * CAST(l_quantity AS BIGINT)) AS BIGINT) AS profit_e4
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON n_nationkey = s_nationkey
      |WHERE p_name LIKE '%bolt%'
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ----------------------------------------------------------------
  // Q10 — returned items report
  // ----------------------------------------------------------------

  /** TPC-H Q10 (returned-item reporting): top-20 customers by revenue
    * lost to returns (`l_returnflag = 'R'`) on orders placed in
    * 1996-H1, with nation attribution. The returnflag filter prunes
    * the fact scan to ~1/3 before the orderkey shuffle join against
    * the half-year order slice; customer joins at key grain and
    * nation broadcasts; the top-20 is TakeOrderedAndProject (never a
    * global sort). Revenue through the exact DECIMAL sum, DOUBLE at
    * the surface (the q3 rails), custkey tiebreak pins boundary ties.
    */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val o = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val c = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
    val n = t(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  val q10ReturnedItemsSql: String =
    """SELECT c_custkey, c_name, n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |    AS revenue
      |FROM lineitem
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN nation ON n_nationkey = c_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      |GROUP BY 1, 2, 3
      |ORDER BY revenue DESC, c_custkey ASC
      |LIMIT 20""".stripMargin

  // ----------------------------------------------------------------
  // Q12 — shipping-lag vs order priority
  // ----------------------------------------------------------------

  /** TPC-H Q12 (shipping modes and order priority; adapted — the
    * corpus has no `l_shipmode` or receipt dates, so the grouping
    * "mode" becomes the ship-lag bucket LATE/ONTIME at the
    * [[LateDays]] threshold): for 1996 shipments, line counts of
    * high-priority (1-URGENT/2-HIGH) vs lower-priority orders per
    * bucket. One fact pass, one equi-join against orders at orderkey
    * grain (the textbook Q12 fact-dim shuffle; orders is ~1/4 the
    * fact's rows, sort-merge/shuffle-hash under AQE), 2-row output
    * from a map-side-combinable CASE-sum aggregate.
    */
  def q12ShipPriority(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_shipdate"))
    val o = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("bucket",
        when(datediff(col("l_shipdate"), col("o_orderdate")) > LateDays,
          lit("LATE")).otherwise(lit("ONTIME")))
      .groupBy(col("bucket"))
      .agg(
        sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("bucket")
  }

  val q12ShipPrioritySql: String =
    s"""SELECT
       |  CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
       |       CAST(l_shipdate AS DATE)) > $LateDays
       |       THEN 'LATE' ELSE 'ONTIME' END AS bucket,
       |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
       |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
       |           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
       |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ----------------------------------------------------------------
  // Q13 — customer order-count distribution
  // ----------------------------------------------------------------

  /** TPC-H Q13 (customer distribution; adapted — there is no
    * `o_comment` to exclude, and this generator gives EVERY customer
    * orders, so the textbook NOT-LIKE exclusion would leave the
    * zero-order bucket vacuous at every SF. Counting only 1-URGENT
    * orders keeps it real: 203 customers at sf0.01 have none): order
    * count per customer including zeros (LEFT join), then the
    * count-of-counts distribution. Two hash aggregates — customer
    * grain then count-domain grain (value-bounded: orders-per-customer
    * tops out near 20 in this corpus and grows like fact/dim, not
    * like n) — with the join at custkey grain; no window anywhere.
    */
  def q13CustomerDist(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer").select(col("c_custkey"))
    val o = t(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"), col("o_orderkey"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13CustomerDistSql: String =
    """WITH pc AS (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
      |  GROUP BY 1)
      |SELECT c_count, count(*) AS custdist
      |FROM pc GROUP BY 1
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ----------------------------------------------------------------
  // Q14 — promotion revenue share
  // ----------------------------------------------------------------

  /** TPC-H Q14 (promotion effect): share of 1996 shipment revenue from
    * PROMO-type parts. Revenue is exact per line in e4 fixed-point
    * (DECIMAL(18,2)² products have scale 4; ×10000 is integral, cast
    * LONG — sums fit BIGINT to sf1000 at ~1e17), and the share is a
    * TRUNCATING integer ppm via DECIMAL(38,0) cross-multiply `div`
    * (quotient ≤ 1e6, so the IntegralDivide LONG materialization is
    * safe — the aggCorr wrap rail). The part join is key-grain:
    * broadcast at gate SFs, shuffle-hash at warehouse scale; the
    * final is a 1-row aggregate.
    */
  def q14PromoShare(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("l_partkey"),
        (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
          * 10000).cast("long").as("rev_e4"))
    val p = t(spark, dir, "part").select(col("p_partkey"), col("p_type"))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", col("rev_e4")).otherwise(0L))
          .as("promo_e4"),
        sum(col("rev_e4")).as("total_e4"))
      .select(col("promo_e4"), col("total_e4"),
        expr("CAST(promo_e4 AS DECIMAL(38,0)) * 1000000 div total_e4")
          .cast("long").as("promo_ppm"))
  }

  val q14PromoShareSql: String =
    """WITH li AS (
      |  SELECT l_partkey,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |         * (1 - CAST(l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT)
      |      AS rev_e4
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00')
      |SELECT
      |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_e4 ELSE 0 END)
      |    AS BIGINT) AS promo_e4,
      |  CAST(sum(rev_e4) AS BIGINT) AS total_e4,
      |  CAST(CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_e4 ELSE 0 END)
      |       AS HUGEINT) * 1000000 // CAST(sum(rev_e4) AS HUGEINT)
      |    AS BIGINT) AS promo_ppm
      |FROM li JOIN part ON p_partkey = l_partkey""".stripMargin

  // ----------------------------------------------------------------
  // Q15 — top supplier
  // ----------------------------------------------------------------

  /** TPC-H Q15 (top supplier): supplier(s) whose 1996-Q1 shipment
    * revenue equals the maximum. One fact pass into a supplier-grain
    * hash agg (e4 fixed-point, exact), the max as a 1-row broadcast
    * aggregate (the sanctioned scalar-subquery shape — ties ALL
    * surface, no arbitrary pick), then supplier attribution on the
    * ≤tie-width survivor set. No window, no second fact pass.
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum((dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
        * 10000).cast("long")).as("total_rev_e4"))
    val mx = rev.agg(max(col("total_rev_e4")).as("mx_rev"))
    rev.crossJoin(broadcast(mx)) // 1-row aggregate
      .filter(col("total_rev_e4") === col("mx_rev"))
      .join(t(spark, dir, "supplier").select(col("s_suppkey"), col("s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev_e4"))
      .orderBy("s_suppkey")
  }

  val q15TopSupplierSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |         * (1 - CAST(l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT))
      |      AS BIGINT) AS total_rev_e4
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, total_rev_e4
      |FROM rev JOIN supplier ON s_suppkey = l_suppkey
      |WHERE total_rev_e4 = (SELECT max(total_rev_e4) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  // ----------------------------------------------------------------
  // Q17 — small-quantity-order revenue
  // ----------------------------------------------------------------

  /** TPC-H Q17 (small-quantity-order revenue; `p_container` adapted to
    * `p_size < 10`): average yearly revenue lost if Brand#5 small-size
    * parts stopped filling orders below 20% of the part's average
    * quantity. The per-part average never materializes as a float:
    * the predicate `qty < 0.2·avg` is the integer cross-multiply
    * `5·qty·n < sum_qty` (quantities integral). The filtered part dim
    * (~2% of parts) broadcasts into both fact passes; the per-part
    * stats relation — one row per qualifying part — broadcasts back
    * into the second. Two pruned fact scans, zero windows, the
    * textbook distributed Q17 plan.
    */
  def q17SmallQuantity(spark: SparkSession, dir: String): DataFrame = {
    val pf = t(spark, dir, "part")
      .filter(col("p_brand") === "Brand#5" && col("p_size") < 10)
      .select(col("p_partkey"))
    val li2 = t(spark, dir, "lineitem")
      .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"),
        dec(col("l_quantity")).cast("long").as("qty"),
        (dec(col("l_extendedprice")) * 100).cast("long").as("price_c"))
    val stats = li2.groupBy(col("l_partkey").as("sp_partkey"))
      .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("n"))
    li2.join(broadcast(stats), col("l_partkey") === col("sp_partkey"))
      .filter(lit(5L) * col("qty") * col("n") < col("sum_qty"))
      .agg(
        expr("sum(price_c) div 7").as("avg_yearly_c"),
        count(lit(1)).as("n_lines"))
  }

  val q17SmallQuantitySql: String =
    """WITH pf AS (
      |  SELECT p_partkey FROM part
      |  WHERE p_brand = 'Brand#5' AND p_size < 10),
      |li2 AS (
      |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS price_c
      |  FROM lineitem JOIN pf ON p_partkey = l_partkey),
      |st AS (
      |  SELECT l_partkey AS sp_partkey, sum(qty) AS sum_qty, count(*) AS n
      |  FROM li2 GROUP BY 1)
      |SELECT CAST(sum(price_c) // 7 AS BIGINT) AS avg_yearly_c,
      |       count(*) AS n_lines
      |FROM li2 JOIN st ON sp_partkey = l_partkey
      |WHERE 5 * qty * n < sum_qty""".stripMargin

  // ----------------------------------------------------------------
  // Q19 — discounted revenue (disjunctive predicate)
  // ----------------------------------------------------------------

  /** TPC-H Q19 (discounted revenue; `p_container` arms adapted to
    * `p_size` ranges): revenue from three OR'd brand/size/quantity
    * windows — the canonical disjunctive-pushdown probe. The part
    * join is key-grain (broadcast at gate SFs); the OR-of-ANDs stays
    * one codegen'd predicate over the joined row — Catalyst pushes
    * the common `p_size <= 15` upper bound and the quantity bound
    * `l_quantity <= 30` to the scans as a derived conjunct. 1-row
    * output.
    */
  def q19Discounted(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
    val p = t(spark, dir, "part").select(
      col("p_partkey"), col("p_brand"), col("p_size"))
    def arm(brand: String, szHi: Int, qLo: Int, qHi: Int): Column =
      col("p_brand") === brand &&
        col("p_size").between(1, szHi) &&
        col("l_quantity").between(qLo, qHi)
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(arm("Brand#1", 5, 1, 11) || arm("Brand#2", 10, 10, 20) ||
        arm("Brand#3", 15, 20, 30))
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val q19DiscountedSql: String =
    """SELECT
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |    AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
      |       AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
      |       AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin
}
