package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.split.{RecursiveCharacterSplitter, SplitConfig}

/** Native Catalyst expressions (SURVEY.md §2.11 extension surface):
  * preference order is built-ins > native `Expression` > UDF — these
  * are the two places the built-ins genuinely can't express the
  * semantics efficiently.
  */

/** `cosine_sim(array<float>, array<float>) -> double` with full
  * whole-stage codegen: a primitive fused loop (dot + both norms in
  * one pass), replacing the interpreted higher-order
  * `aggregate`/`zip_with` formulation. FP note: each accumulator
  * folds left-to-right, so results are bit-identical to
  * [[VectorOps.cosine]] and to the DuckDB `list_sum(list_transform)`
  * oracle.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          "cosine_sim: both arguments must be ARRAY<FLOAT>")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // mismatched dimensions have no defined cosine -> null (matches
    // the zip_with/aggregate formulation, which null-poisons)
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xv = (double) $a.getFloat($i);
         |    double $yv = (double) $b.getFloat($i);
         |    $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** The C1 recursive character splitter as a Catalyst `Generator`
  * (UDTF): `chunk_split(text, chunk_size, overlap)` explodes a text
  * column into `(chunk, start_index, chunk_idx)` rows — the SQL
  * surface of the typed-flatMap chunker (same pure splitter
  * underneath, so the two paths cannot diverge).
  */
case class ChunkSplit(child: Expression, chunkSize: Expression, overlap: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, chunkSize, overlap)

  override def checkInputDataTypes(): TypeCheckResult = {
    def integral(e: Expression): Boolean = e.dataType match {
      case IntegerType | LongType | ShortType | ByteType => true
      case _ => false
    }
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("chunk_split: first argument must be STRING")
    else if (!integral(chunkSize) || !integral(overlap))
      TypeCheckResult.TypeCheckFailure(
        "chunk_split: chunk_size and overlap must be integral types")
    else if (!chunkSize.foldable || !overlap.foldable)
      TypeCheckResult.TypeCheckFailure(
        "chunk_split: chunk_size and overlap must be constants")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val cfg = SplitConfig(
    chunkSize = chunkSize.eval().asInstanceOf[Number].intValue(),
    chunkOverlap = overlap.eval().asInstanceOf[Number].intValue())

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk", StringType, nullable = false),
    StructField("start_index", IntegerType, nullable = false),
    StructField("chunk_idx", IntegerType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else {
      RecursiveCharacterSplitter
        .splitWithStartIndex(t.asInstanceOf[UTF8String].toString, cfg)
        .iterator.zipWithIndex.map { case ((chunk, start), idx) =>
          InternalRow(UTF8String.fromString(chunk), start, idx)
        }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), chunkSize = newChildren(1), overlap = newChildren(2))
}

/** `ewma_fold(array<struct<day_idx,cents>>) ->
  * array<struct<day_idx,cents,s>>` — the integer-exact α = ½ EWMA
  * recursion (`s₁ = x₁; sₜ = (xₜ + sₜ₋₁) div 2`, floor division) as
  * ONE linear pass with a preallocated output array. Replaces the
  * SQL `aggregate` fold whose `concat(acc, array(..))` step copied
  * the accumulator every iteration — O(L²) work/allocations in
  * L = span-days (calendar-bounded, so never a corpus scale-killer,
  * but a 30-year span is ~11k days → ~60M element copies per key).
  * This expression is O(L) time and allocation, bit-identical
  * results. CodegenFallback is deliberate: it evaluates once per
  * GROUP row (one per key), not per fact row — nothing here sits in
  * a whole-stage-codegen hot path.
  */
case class EwmaFold(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {

  private val outStruct = StructType(Seq(
    StructField("day_idx", LongType, nullable = false),
    StructField("cents", LongType, nullable = false),
    StructField("s", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fs), _)
        if fs.length == 2 && fs.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "ewma_fold: argument must be ARRAY<STRUCT<BIGINT, BIGINT>>")
  }
  override def dataType: DataType = ArrayType(outStruct, containsNull = false)
  // null-element inputs (possible from arbitrary SQL) yield a null result
  override def nullable: Boolean = true
  override def prettyName: String = "ewma_fold"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var s = 0L
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      // the fold's inputs are built non-null by ts_ewma, but the
      // function is SQL-registered: a null element (or null field)
      // from arbitrary SQL must yield a null RESULT, not an NPE
      if (row == null || row.isNullAt(0) || row.isNullAt(1)) return null
      val day = row.getLong(0)
      val cents = row.getLong(1)
      // Math.floorDiv, not /: daily cents are positive by
      // construction here, but the recurrence is DEFINED as floor
      // division (matches the DuckDB `//` oracle) — keep the
      // expression total over any input.
      s = if (i == 0) cents else Math.floorDiv(cents + s, 2L)
      out(i) = InternalRow(day, cents, s)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NativeFunctions {

  import org.apache.spark.sql.graft.ColumnBridge

  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def ewmaFold(pts: Column): Column =
    ColumnBridge.column(EwmaFold(ColumnBridge.expression(pts)))

  def chunkSplit(text: Column, chunkSize: Int, overlap: Int): Column =
    ColumnBridge.column(ChunkSplit(
      ColumnBridge.expression(text),
      org.apache.spark.sql.catalyst.expressions.Literal(chunkSize),
      org.apache.spark.sql.catalyst.expressions.Literal(overlap)))

  /** Register both for SQL (`SELECT cosine_sim(a,b)`,
    * `SELECT chunk_split(text, 100, 0) ...`). Idempotent.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "chunk_split", exprs => ChunkSplit(exprs(0), exprs(1), exprs(2)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ewma_fold", exprs => EwmaFold(exprs(0)), "built-in")
    // the typed Aggregators as SQL-callable UDAFs — a SQL-only user
    // gets the full ladder, not just the scalar/generator surface
    spark.udf.register("kmv_distinct",
      org.apache.spark.sql.functions.udaf(KmvStringSketch))
    spark.udf.register("ratio_of_sums",
      org.apache.spark.sql.functions.udaf(RatioOfSums))
  }
}

/** String-input adapter of [[KmvSketch]] for the SQL surface
  * (`SELECT kmv_distinct(col)`): SQL callers pass the raw column,
  * the adapter applies the sketch's own portable hash. Same buffer,
  * same merges, same estimate.
  */
object KmvStringSketch
    extends org.apache.spark.sql.expressions.Aggregator[String, Array[Long], Long] {
  def zero: Array[Long] = KmvSketch.zero
  def reduce(b: Array[Long], s: String): Array[Long] =
    if (s == null) b else KmvSketch.reduce(b, KmvSketch.hash(s))
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = KmvSketch.merge(a, b)
  def finish(b: Array[Long]): Long = KmvSketch.finish(b)
  def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    KmvSketch.bufferEncoder
  def outputEncoder: org.apache.spark.sql.Encoder[Long] =
    org.apache.spark.sql.Encoders.scalaLong
}
