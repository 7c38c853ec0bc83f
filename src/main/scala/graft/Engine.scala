package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.ops.ChunkPipeline
import graft.sources.{FileSources, PageExtractor, PlainTextExtractor}
import graft.split.SplitConfig

/** The engine's public API — the Spark-first equivalent of the
  * reference's entry points (SURVEY.md §3):
  *
  *   - `File_Reader().process_files(dir, n, file_type, chunk_size,
  *     chunk_overlap)` (`/root/reference/pdf_reader.py:505-546`)
  *     -> [[fileStats]] (the un-aggregated per-file Dataset);
  *   - `_read_pdf_file(..., b_get_content=True)`
  *     (`pdf_reader.py:405-503`) -> [[chunks]] (with content; callers
  *     that don't select `rawText` get it column-pruned — the
  *     reference's manual `b_get_content` flag is subsumed by
  *     Catalyst, SURVEY.md §2.2 P12);
  *   - the CLI per-root loop + CSV naming
  *     (`pdf_reader.py:653-666`, `:195-215`) -> [[processRoots]].
  */
object Engine {

  final case class Options(
      glob: String = "*.txt",
      split: SplitConfig = SplitConfig(),
      extractor: PageExtractor = PlainTextExtractor)

  /** Chunks with content retained (the vector-db ingestion shape). */
  def chunks(spark: SparkSession, root: String, opts: Options = Options()): Dataset[Chunk] =
    ChunkPipeline.chunk(
      FileSources.pages(FileSources.binaryFiles(spark, root, opts.glob), opts.extractor),
      opts.split)

  /** Per-file statistics (pages, chunks, sizes, ratio). Pages are
    * counted from the page source, not from chunks, so chunkless pages
    * and files are represented (reference semantics: `pages =
    * len(documents)`, `pdf_reader.py:498`).
    */
  def fileStats(spark: SparkSession, root: String, opts: Options = Options()): Dataset[FileStats] = {
    val pages = FileSources.pages(
      FileSources.binaryFiles(spark, root, opts.glob), opts.extractor)
    ChunkPipeline.fileStats(pages,
      ChunkPipeline.chunkMetrics(ChunkPipeline.chunk(pages, opts.split)))
  }

  /** Formatted report with the SUM TOTAL row last
    * (`pdf_reader.py:151-171`).
    */
  def report(spark: SparkSession, root: String, opts: Options = Options()): DataFrame =
    ChunkPipeline.report(ChunkPipeline.statsWithTotal(fileStats(spark, root, opts)))

  /** S4 + S8: per-root loop with sanitized per-root CSV names — the
    * reference writes one CSV per input folder
    * (`pdf_reader.py:653-666`). Returns root -> written CSV dir.
    */
  def processRoots(
      spark: SparkSession,
      roots: Seq[String],
      outDir: String,
      opts: Options = Options()): Map[String, String] =
    roots.map { root =>
      val out = s"$outDir/${sanitizeFolderPath(root)}"
      ChunkPipeline.writeCsv(report(spark, root, opts), out)
      root -> out
    }.toMap

  /** P10: path -> filename sanitization, exactly the reference's
    * `_folder_path_to_filename` (`pdf_reader.py:195-215`): non-word,
    * non-hyphen chars -> `_`, strip leading hyphens/underscores,
    * empty -> "folder".
    */
  def sanitizeFolderPath(path: String): String = {
    val cleaned = path.replaceAll("[^\\w\\-]", "_").replaceAll("^[-_]+", "")
    if (cleaned.isEmpty) "folder" else cleaned
  }
}
