package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class BloomSketchSpec extends AnyFunSuite with SparkTestBase {

  test("no false negatives, bounded false-positive rate at design load") {
    val keys = (1L to 5000L).map(_ * 7919L)
    val bits = keys.foldLeft(BloomSketch.zero)(BloomSketch.reduce)
    assert(keys.forall(BloomSketch.contains(bits, _)), "false negative")
    val probes = (1L to 20000L).map(_ * 7919L + 3L) // disjoint from keys
    val fp = probes.count(BloomSketch.contains(bits, _))
    assert(fp < 400, s"fp rate ${fp / 20000.0} above 2% at m/n=13")
  }

  test("merge of split builds equals the single-pass build") {
    val keys = (1L to 1000L).map(KmvSketch.mix64)
    val single = keys.foldLeft(BloomSketch.zero)(BloomSketch.reduce)
    val (l, r) = keys.splitAt(300)
    val merged = BloomSketch.merge(
      l.foldLeft(BloomSketch.zero)(BloomSketch.reduce),
      r.foldLeft(BloomSketch.zero)(BloomSketch.reduce))
    assert(java.util.Arrays.equals(single, merged))
  }

  test("codegen probe agrees with the JVM kernel on a DataFrame") {
    import spark.implicits._
    val keys = Seq(10L, 20L, 30L)
    val bits = keys.foldLeft(BloomSketch.zero)(BloomSketch.reduce)
    val out = (1L to 40L).toDF("k")
      .filter(BloomSketch.mightContain(bits, org.apache.spark.sql.functions.col("k")))
      .collect().map(_.getLong(0)).toSet
    assert(keys.toSet.subsetOf(out), "codegen path lost an inserted key")
    assert(out.forall(k => BloomSketch.contains(bits, k)), "codegen != kernel")
  }

  test("join_bloom equals the unbloomd join and the probe prunes the fact side") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val spark2 = spark
    val bloomed = graft.ext.Relational.joinBloom(spark2, dir).collect()
    val o = graft.sources.Tables.table(spark2, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" &&
        year(col("o_orderdate")) === 1996)
    val li = graft.sources.Tables.table(spark2, dir, "lineitem")
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("revenue"))
      .orderBy("l_returnflag").collect()
    assert(bloomed.nonEmpty)
    assert(bloomed.map(_.toString).toSeq == plain.map(_.toString).toSeq)
    // the probe really prunes: far fewer fact rows survive the filter
    val keys = o.select(col("o_orderkey"))
      .as(org.apache.spark.sql.Encoders.scalaLong)
      .select(BloomSketch.toColumn).head()
    val total = li.count()
    val kept = li.filter(BloomSketch.mightContain(keys, col("l_orderkey"))).count()
    assert(kept < total / 5, s"bloom kept $kept of $total")
  }
}
