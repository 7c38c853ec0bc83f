package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.ChunkPipeline
import graft.split.SplitConfig

/** Native Catalyst expressions: SQL surface parity with the
  * typed/higher-order formulations.
  */
class SqlSurfaceSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("cosine_sim expression is bit-identical to the higher-order formulation") {
    import spark.implicits._
    val e = spark.read.parquet(s"$dir/embeddings.parquet").limit(50)
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val pairs = a.join(b, col("ia") < col("ib"))
    val native = pairs.select(NativeFunctions.cosineSim(col("ea"), col("eb"))).as[Double].collect()
    val hof = pairs.select(VectorOps.cosine(col("ea"), col("eb"))).as[Double].collect()
    assert(native.length == hof.length)
    native.zip(hof).foreach { case (n, h) => assert(n == h) } // exact, not approx
  }

  test("cosine_sim is callable from SQL") {
    NativeFunctions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))").collect()(0).getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("chunk_split generator matches the typed flatMap path exactly") {
    val viaSql = graft.ops.CoreQueries.sqlChunkSplit(spark, dir)
      .select(col("doc_id"), col("chunk_idx").cast("int"), col("chunk"), col("start_index").cast("int"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3))).toSet
    val cfg = SplitConfig(chunkSize = 100, chunkOverlap = 0)
    val viaFlatMap = ChunkPipeline.chunk(ChunkPipeline.pagesFromDocuments(spark, dir), cfg)
      .collect().map(c => (c.path.toLong, c.chunkIdx, c.rawText, c.offsetInPage)).toSet
    assert(viaSql.nonEmpty)
    assert(viaSql == viaFlatMap)
  }

  test("chunk_split rejects non-constant sizes") {
    NativeFunctions.register(spark)
    spark.range(1).selectExpr("CAST(id AS STRING) AS s", "CAST(id AS INT) AS n")
      .createOrReplaceTempView("chunk_split_bad")
    val err = intercept[Exception] {
      spark.sql("SELECT chunk_split(s, n, 0) FROM chunk_split_bad").collect()
    }
    val msg = err.getMessage.toLowerCase
    assert(msg.contains("constant") || msg.contains("foldable") || msg.contains("mismatch"))
  }

  test("chunk_split rejects non-integral size arguments at analysis time") {
    NativeFunctions.register(spark)
    val err = intercept[Exception] {
      spark.sql("SELECT chunk_split('abc def', '100', 0)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("integral"))
  }

  test("cosine_sim yields null for mismatched dimensions (matches HOF nulling)") {
    import spark.implicits._
    val df = Seq((Array(1f, 2f, 3f), Array(1f, 2f))).toDF("a", "b")
    val native = df.select(NativeFunctions.cosineSim(col("a"), col("b"))).collect()(0)
    assert(native.isNullAt(0))
    val hof = df.select(VectorOps.cosine(col("a"), col("b"))).collect()(0)
    assert(hof.isNullAt(0))
  }

  test("kmv_distinct UDAF from SQL equals the typed-Aggregator path bit-for-bit") {
    val typed = graft.ext.Relational
      .aggKmvDistinct(spark, dir).collect().map(_.toString).toSeq
    val viaSql = graft.ext.Relational
      .sqlKmv(spark, dir).collect().map(_.toString).toSeq
    assert(viaSql.nonEmpty)
    assert(viaSql == typed)
  }

  test("ratio_of_sums UDAF is SQL-callable and exact") {
    import spark.implicits._
    NativeFunctions.register(spark)
    Seq((6L, 2L), (4L, 3L)).toDF("num", "den")
      .createOrReplaceTempView("graft_ratios_v")
    val r = spark.sql(
      "SELECT ratio_of_sums(num, den) AS r FROM graft_ratios_v")
      .collect()(0).getDouble(0)
    assert(r == 2.0) // (6+4)/(2+3): ratio of sums, not mean of ratios
  }
}
