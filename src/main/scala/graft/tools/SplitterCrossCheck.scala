package graft.tools

import scala.io.Source

import graft.split.{RecursiveCharacterSplitter, SplitConfig}

/** Dev-time splitter cross-validation (no Spark): compares the Scala
  * splitter chunk-exactly — text AND start index — against a TSV of
  * expected chunks produced by an independent Python reimplementation
  * of langchain-text-splitters 0.3.0 (the reference's pinned lib,
  * `/root/reference/requirements.txt:20`). Round 2 ran it over both
  * sf0.001 and sf0.01 documents at four chunk_overlap > 0 configs
  * plus four keep_separator=false configs (107k chunks, exact
  * match) — the overlap window-slide (with its separator-length
  * terms) is the fiddliest splitter branch.
  *
  * TSV columns: corpus, doc_id, chunk_size, overlap, keep(1/0),
  * chunk_idx, start_index, chunk (\\n/\\t/\\\\-escaped). For
  * keep=0 rows start_index is -1 and only chunk text is compared
  * (upstream's find-based indexing is only contractual with kept
  * separators).
  *
  * Usage: `runMain graft.tools.SplitterCrossCheck <expected.tsv> <docsParquetDir>...`
  */
object SplitterCrossCheck {

  private def unescape(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => b += '\n'; i += 2
          case 't' => b += '\t'; i += 2
          case '\\' => b += '\\'; i += 2
          case c => b += '\\'; b += c; i += 2
        }
      } else { b += s.charAt(i); i += 1 }
    }
    b.toString
  }

  def main(args: Array[String]): Unit = {
    val tsv = args.head
    // texts come via a tiny local parquet read (Spark just as a reader)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val texts: Map[(String, Long), String] = args.tail.flatMap { dir =>
      val corpus = dir.split('/').last
      spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text").collect()
        .map(r => ((corpus, r.getLong(0)), r.getString(1)))
    }.toMap

    // expected chunks grouped per (corpus, doc, config)
    val expected = Source.fromFile(tsv).getLines().map { line =>
      val Array(corpus, did, cs, ov, keep, idx, start, chunk) = line.split("\t", -1)
      ((corpus, did.toLong, cs.toInt, ov.toInt, keep == "1"),
        (idx.toInt, unescape(chunk), start.toInt))
    }.toSeq.groupBy(_._1).view
      .mapValues(_.map(_._2).sortBy(_._1).map(t => (t._2, t._3)).toList).toMap

    var checked = 0
    var failed = 0
    for (((corpus, did, cs, ov, keep), exp) <- expected) {
      val cfg = SplitConfig(chunkSize = cs, chunkOverlap = ov, keepSeparator = keep)
      val actual: List[(String, Int)] =
        if (keep) RecursiveCharacterSplitter.splitWithStartIndex(texts((corpus, did)), cfg)
        else RecursiveCharacterSplitter.splitText(texts((corpus, did)), cfg).map((_, -1))
      checked += exp.length
      if (actual != exp) {
        failed += 1
        if (failed <= 5)
          println(s"MISMATCH $corpus/$did cs=$cs ov=$ov keep=$keep\n  exp=${exp.take(3)}\n  got=${actual.take(3)}")
      }
    }
    println(s"[crosscheck] $checked chunks over ${expected.size} (doc, config) cases; " +
      s"${if (failed == 0) "ALL MATCH" else s"$failed MISMATCHED"}")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
