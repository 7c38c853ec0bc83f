package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Evidence for the co-located-join scale claim (SURVEY.md §4 /
  * README scale design): bucketing both fact tables on the join key
  * removes the shuffle from the join entirely.
  */
class BucketedJoinSpec extends AnyFunSuite with SparkTestBase {

  test("bucketed-by-key tables join with zero exchanges") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a fresh in-memory catalog does not know about files a previous
    // JVM's managed tables left behind — clear the locations too
    val wh = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
    for (t <- Seq("b_orders", "b_lineitem")) {
      val loc = wh.resolve(t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq
          .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }

    spark.read.parquet(s"$dir/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val joined = spark.table("b_orders")
      .join(spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    // the join itself needs no shuffle: both sides pre-clustered
    val exchangesBeforeAgg = "Exchange hashpartitioning\\((o|l)_orderkey".r
      .findAllIn(plan).size
    assert(exchangesBeforeAgg == 0, s"join should not shuffle:\n$plan")

    // and the result matches the plain shuffle join
    val plain = spark.read.parquet(s"$dir/orders.parquet")
      .join(spark.read.parquet(s"$dir/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bucketed = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bucketed == plain)
  }
}
