package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Data-LAYOUT operators: how rows are arranged on storage is a
  * first-class 100 TB concern — it decides what a scan can SKIP.
  * `layout_zorder` demonstrates multi-dimensional clustering via the
  * Z-order (Morton) space-filling curve (Morton 1966; the technique
  * behind Delta/Iceberg `ZORDER BY`): interleaving the bits of two
  * clustering keys gives a 1-D sort order whose contiguous ranges
  * are small RECTANGLES in key space, so per-file min/max statistics
  * prune scans on EITHER dimension — a plain 1-D sort bounds only
  * its own column.
  */
object Layout {

  private val ZBits = 12 // per-dimension grid resolution (4096 cells)
  private val CellShift = 18 // keep top 24-18 = 6 z-bits => 8x8 grid cells

  /** Morton interleave of the low [[ZBits]] bits of x and y — pure
    * shift/mask/add column arithmetic (whole-stage codegen'd, no
    * UDF): bit i of x lands at position 2i, bit i of y at 2i+1.
    */
  private[ext] def zValue(x: Column, y: Column): Column =
    (0 until ZBits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** DuckDB twin of [[zValue]] over SQL expressions `x`, `y`. */
  private def zValueSql(x: String, y: String): String =
    (0 until ZBits).map { i =>
      s"(($x // ${1L << i}) % 2) * ${1L << (2 * i)}" +
        s" + (($y // ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString("(", " + ", ")")

  /** Orders clustered on (order day, customer): each output row is
    * one Z-curve cell with its row count and the min/max of BOTH
    * clustering keys — the exact statistics a file-skipping reader
    * consults. The per-cell spans are what the layout buys: every
    * cell bounds day AND customer to a 512-wide slice (vs the
    * ~2400-day / full-customer global range), so predicates on
    * either column prune most cells. The relation is one rowwise
    * projection + one hash agg; writing the layout is
    * `repartitionByRange(z).sortWithinPartitions(z)` on the same
    * column (exercised in `LayoutSpec`, kept out of the read-only
    * gate query).
    */
  def layoutZorder(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.table(spark, dir, "orders")
      .select(
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
          .cast("long").as("day_x"),
        col("o_custkey").as("cust_y"))
      .withColumn("z",
        zValue(col("day_x").bitwiseAND(lit(4095L)),
          col("cust_y").bitwiseAND(lit(4095L))))
    o.groupBy(expr(s"z div ${1L << CellShift}").as("cell"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("day_x")).as("min_day"), max(col("day_x")).as("max_day"),
        min(col("cust_y")).as("min_cust"), max(col("cust_y")).as("max_cust"))
      .orderBy("cell")
  }

  val layoutZorderSql: String = {
    val z = zValueSql("(day_x % 4096)", "(cust_y % 4096)")
    s"""WITH k AS (
       |  SELECT date_diff('day', DATE '1995-01-01',
       |      CAST(o_orderdate AS DATE)) AS day_x,
       |    o_custkey AS cust_y
       |  FROM orders),
       |zc AS (SELECT day_x, cust_y, $z // ${1L << CellShift} AS cell FROM k)
       |SELECT cell, count(*) AS n_rows,
       |  CAST(min(day_x) AS BIGINT) AS min_day,
       |  CAST(max(day_x) AS BIGINT) AS max_day,
       |  CAST(min(cust_y) AS BIGINT) AS min_cust,
       |  CAST(max(cust_y) AS BIGINT) AS max_cust
       |FROM zc GROUP BY cell ORDER BY cell""".stripMargin
  }
}
