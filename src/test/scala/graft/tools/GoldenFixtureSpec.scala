package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Fixture-freshness guard: `fixtures/golden_chunks.parquet` (the
  * DuckDB oracle source for the real-splitter queries) must equal the
  * live splitter's output at every committed scale. If the splitter
  * or the pipeline changes, this fails until the fixture is
  * regenerated with `runMain graft.tools.GoldenChunks`.
  */
class GoldenFixtureSpec extends AnyFunSuite with SparkTestBase {

  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  private def checkFixture(path: String, cfg: graft.split.SplitConfig): Unit = {
    val fixture = spark.read.parquet(path).cache()
    val keys = fixture.select("corpus_docs", "corpus_chars").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keys.size == sfDirs.size, s"expected ${sfDirs.size} distinct slices, got $keys")
    for (dir <- sfDirs) {
      val live = GoldenChunks.slice(spark, dir, cfg)
      val key = live.select("corpus_docs", "corpus_chars").head()
      assert(keys.contains((key.getLong(0), key.getLong(1))), s"no slice for $dir")
      val committed = fixture
        .filter(col("corpus_docs") === key.getLong(0) &&
          col("corpus_chars") === key.getLong(1))
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("doc_id", "chunk_idx", "start_index", "raw_text",
            "norm_text", "chunk_len", "offset_in_file", "file_size")
          .collect().map(_.toSeq).toSet
      assert(rows(committed) == rows(live), s"fixture drift at $dir")
    }
    fixture.unpersist()
  }

  test("committed fixture equals live splitter output at every scale") {
    checkFixture(GoldenChunks.FixturePath,
      graft.split.SplitConfig(chunkSize = 100, chunkOverlap = 0))
  }

  test("committed overlap=20 fixture equals live splitter output at every scale") {
    checkFixture(GoldenChunks.OverlapFixturePath, GoldenChunks.OverlapCfg)
  }
}
