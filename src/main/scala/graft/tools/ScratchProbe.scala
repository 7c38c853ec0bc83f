package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.head
    def time[A](label: String)(f: => A): Unit = {
      val ts = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"$label min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val es = spark.read.parquet("/tmp/graft-artifacts/graph-edges-v1/bc40925d76df2fe9")
    es.count()
    time("scan")(es.count())
    val nbrs = es.groupBy(col("src")).agg(sort_array(collect_list(col("dst"))).as("ns"))
    time("collect_list agg")(nbrs.write.format("noop").mode("overwrite").save())
    val pairs = nbrs.filter(size(col("ns")) > 1)
      .select(col("ns"), posexplode(col("ns")).as(Seq("i", "a")))
      .select(col("a"), explode(slice(col("ns"), col("i") + lit(2), size(col("ns")))).as("b"))
    time("pairs gen")(pairs.write.format("noop").mode("overwrite").save())
    val common = pairs.groupBy("a", "b").agg(count(lit(1)).as("c"))
    time("common agg")(common.write.format("noop").mode("overwrite").save())
    val deg = es.groupBy("src").agg(count(lit(1)).as("deg"))
    val scored = common.join(deg.toDF("a", "da"), "a").join(deg.toDF("b", "db"), "b")
      .select(col("a"), col("b"), col("c"),
        (col("c").cast("double") / (col("da") + col("db") - col("c"))).as("j"))
    time("scored topk")(scored.orderBy(col("j").desc, col("a").asc, col("b").asc).limit(20).collect())
    // old shape
    val commonOld = es.toDF("n", "a").join(es.toDF("n", "b"), "n")
      .filter(col("a") < col("b")).groupBy("a", "b").agg(count(lit(1)).as("c"))
    time("old wedge join common")(commonOld.write.format("noop").mode("overwrite").save())
    time("full graph_jaccard")(graft.SparkEntry.queries("graph_jaccard")(spark, dir).count())
    spark.stop()
  }
}
