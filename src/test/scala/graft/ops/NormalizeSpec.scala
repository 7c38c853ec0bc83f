package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** P3-P6 normalization semantics (`/root/reference/pdf_reader.py:390-403`),
  * pure and Column forms (must agree).
  */
class NormalizeSpec extends AnyFunSuite with SparkTestBase {

  private val cases = Seq(
    // blank-line runs collapse to one newline, then newlines -> space
    "a\n\n\nb" -> "a b",
    "a\nb" -> "a b",
    "a\n\nb\nc" -> "a b c",
    // literal \uXXXX escape TEXT removed (not decoded) — pdf_reader.py:399
    "pre\\u0041post" -> "prepost",
    "keep \\u12 short" -> "keep \\u12 short", // not 4 hex digits -> kept
    "hex\\uBEEFtail" -> "hextail",
    // lowercase last
    "MiXeD Case" -> "mixed case",
    // order matters: \n inside a would-be escape is normalized first
    "A\n\nB\n\nC" -> "a b c",
    "" -> "",
    "   " -> "   " // whitespace is NOT stripped by normalize
  )

  test("pure normalize matches pinned pairs") {
    for ((in, want) <- cases)
      assert(Normalize.normalize(in) == want, s"input=${in.replace("\n", "\\n")}")
  }

  test("Column normalize agrees with pure form") {
    import spark.implicits._
    val ins = cases.map(_._1) ++ Seq("\n\n\n", "x\\u00GGy", "A\\u0061\n\nB")
    val df = ins.toDF("s")
    val got = df.select(Normalize.normalizeCol($"s")).as[String].collect()
    assert(got.toSeq == ins.map(Normalize.normalize))
  }
}
