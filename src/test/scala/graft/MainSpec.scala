package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** CLI surface: per-root CSVs, arg validation (reference semantics,
  * pdf_reader.py:218-293).
  */
class MainSpec extends AnyFunSuite with SparkTestBase {

  private def mkRoot(): String = {
    val tmp = Files.createTempDirectory("mainroot")
    Files.writeString(tmp.resolve("x.txt"), "one two three four five six seven eight")
    Files.writeString(tmp.resolve("y.txt"), "alpha beta\fgamma delta")
    tmp.toString
  }

  test("CLI run writes one CSV per root with SUM TOTAL last") {
    val r1 = mkRoot(); val r2 = mkRoot()
    val out = Files.createTempDirectory("mainout").toString
    Main.runWith(spark, Array(r1, r2, "4",
      "--chunk_size", "10", "--output_dir", out, "--print_metadata"))
    for (r <- Seq(r1, r2)) {
      val dir = Paths.get(s"$out/${Engine.sanitizeFolderPath(r)}")
      val csv = Files.list(dir).toArray.map(_.toString).filter(_.endsWith(".csv"))
      assert(csv.length == 1)
      val lines = Files.readAllLines(Paths.get(csv.head))
      assert(lines.get(lines.size - 1).startsWith("SUM TOTAL"))
    }
  }

  test("--file_type .pdf routes through the PDF codec end to end") {
    val root = Files.createTempDirectory("mainpdf")
    Files.write(root.resolve("doc.pdf"),
      graft.sources.pdf.PdfFixtures.classicPdf(
        Seq("first page words here", "second page"), compress = true))
    Files.writeString(root.resolve("ignored.txt"), "must not be scanned")
    val out = Files.createTempDirectory("mainpdfout").toString
    Main.runWith(spark, Array(root.toString, "4",
      "--file_type", ".pdf", "--chunk_size", "10", "--output_dir", out))
    val dir = Paths.get(s"$out/${Engine.sanitizeFolderPath(root.toString)}")
    val csv = Files.list(dir).toArray.map(_.toString).filter(_.endsWith(".csv"))
    assert(csv.length == 1)
    val lines = Files.readAllLines(Paths.get(csv.head))
    // header + doc.pdf row + SUM TOTAL; the txt file is excluded
    assert(lines.size == 3)
    assert(lines.get(1).startsWith("doc.pdf"))
    assert(lines.get(1).split(",")(1) == "2") // pages through the codec
    assert(lines.get(2).startsWith("SUM TOTAL"))
  }

  test("validation: missing dir and bad parallelism fail fast") {
    intercept[IllegalArgumentException] {
      Main.runWith(spark, Array("/no/such/dir", "4"))
    }
    intercept[IllegalArgumentException] {
      Main.runWith(spark, Array(mkRoot(), "0"))
    }
    intercept[IllegalArgumentException] {
      Main.runWith(spark, Array("justonearg"))
    }
  }
}
