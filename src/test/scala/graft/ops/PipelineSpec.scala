package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.{Page, SparkTestBase}
import graft.split.{RecursiveCharacterSplitter, SplitConfig}

/** End-to-end chunk pipeline semantics: C2-C4 offsets (scanLeft
  * oracle), A1 per-file agg, A2 rollup with SUM-TOTAL-last invariant,
  * P11 null ratio on zero text (documented deviation from the
  * reference's ZeroDivisionError, SURVEY.md §7.4).
  */
class PipelineSpec extends AnyFunSuite with SparkTestBase {

  private val cfg = SplitConfig(chunkSize = 30, chunkOverlap = 0)

  private def pages = Seq(
    Page("doc1", 0, "alpha beta gamma delta epsilon zeta eta theta", 100),
    Page("doc1", 1, "iota kappa lambda mu nu xi omicron pi rho sigma", 100),
    Page("doc2", 0, "short text", 40),
    Page("doc3", 0, "", 7) // zero-text file
  )

  test("chunk offsets: offset_in_file is the scanLeft prefix sum in (page, chunk) order") {
    import spark.implicits._
    val ds = spark.createDataset(pages)
    val metrics = ChunkPipeline.chunkMetrics(ChunkPipeline.chunk(ds, cfg))
      .select("path", "page", "chunkIdx", "chunk_len", "offset_in_file")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2, t._3))

    for ((path, group) <- metrics.groupBy(_._1)) {
      val ordered = group.sortBy(t => (t._2, t._3))
      val expectedOffsets = ordered.map(_._4).scanLeft(0L)(_ + _).init
      assert(ordered.map(_._5).toSeq == expectedOffsets.toSeq, s"path=$path")
    }
  }

  test("chunks never span pages; per-page indices restart at 0") {
    import spark.implicits._
    val ds = spark.createDataset(pages)
    val chunks = ChunkPipeline.chunk(ds, cfg).collect()
    for (c <- chunks) {
      val raw = pages.find(p => p.path == c.path && p.page == c.page).get.text
      assert(raw.substring(c.offsetInPage, c.offsetInPage + c.rawText.length) == c.rawText)
    }
    assert(chunks.filter(c => c.path == "doc1" && c.page == 1).map(_.chunkIdx).min == 0)
  }

  test("fileStats: pages, chunks, textSize, null-safe ratio") {
    import spark.implicits._
    val ds = spark.createDataset(pages)
    val stats = ChunkPipeline.fileStats(ChunkPipeline.chunkMetrics(ChunkPipeline.chunk(ds, cfg)))
      .collect().map(s => s.path -> s).toMap

    assert(stats("doc1").pages == 2)
    val expectedChunks1 =
      RecursiveCharacterSplitter.splitText(pages(0).text, cfg).size +
        RecursiveCharacterSplitter.splitText(pages(1).text, cfg).size
    assert(stats("doc1").chunks == expectedChunks1)
    assert(stats("doc2").ratio.get == 40.0 / stats("doc2").textSize)
    // zero-text file: flatMap yields no chunks at all -> absent from stats
    assert(!stats.contains("doc3"))
  }

  test("statsWithTotal: SUM TOTAL row last, ratio of sums not mean of ratios") {
    import spark.implicits._
    val ds = spark.createDataset(pages.take(3))
    val rows = ChunkPipeline.statsWithTotal(
      ChunkPipeline.fileStats(ChunkPipeline.chunkMetrics(ChunkPipeline.chunk(ds, cfg))))
      .collect()
    assert(rows.last.getString(0) == "SUM TOTAL")
    val details = rows.init
    val total = rows.last
    assert(total.getAs[Long]("chunks") == details.map(_.getAs[Long]("chunks")).sum)
    val fs = details.map(_.getAs[Long]("file_size")).sum
    val txt = details.map(_.getAs[Long]("text_size")).sum
    assert(total.getAs[Double]("ratio") == fs.toDouble / txt)
  }

  test("report formatting matches the reference README sample (P8/P9, A2)") {
    import spark.implicits._
    // README.md:20-26 values re-typed as FileStats
    val stats = Seq(
      graft.FileStats("bedrock-meetups.pdf", 1652, 2921, 12318934L, 2427921L, Some(12318934.0 / 2427921)),
      graft.FileStats("bedrock-features.pdf", 15, 25, 463254L, 20982L, Some(463254.0 / 20982)),
      graft.FileStats("Bedrock Models.pdf", 24, 32, 314167L, 21298L, Some(314167.0 / 21298)))
    val report = ChunkPipeline.report(
      ChunkPipeline.statsWithTotal(spark.createDataset(stats)))
      .collect().map(r => (0 until 6).map(r.getString))

    val byName = report.map(r => r.head -> r).toMap
    assert(byName("bedrock-meetups.pdf") ==
      Seq("bedrock-meetups.pdf", "1,652", "2,921", "12,318,934", "2,427,921", "5.07"))
    assert(byName("bedrock-features.pdf")(5) == "22.08")
    assert(byName("Bedrock Models.pdf")(5) == "14.75")
    val totalRow = report.last
    assert(totalRow.head == "SUM TOTAL")
    assert(totalRow(1) == "1,691" && totalRow(2) == "2,978")
    assert(totalRow(3) == "13,096,355" && totalRow(4) == "2,470,201")
    assert(totalRow(5) == "5.30") // ratio of sums (pdf_reader.py:148)
  }
}
