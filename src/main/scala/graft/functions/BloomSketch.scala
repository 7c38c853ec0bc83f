package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Bloom-filter runtime join pruning, built explicitly as a library
  * surface (the technique behind Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter.enabled` injected
  * filters — Bloom 1970, Kirsch–Mitzenmacher 2006 double hashing):
  *
  *   - the BUILD side is this typed `Aggregator`: each partition
  *     folds its join keys into a fixed [[NumBits]]-bit array,
  *     partial buffers OR-merge associatively (map-side combine), so
  *     the driver receives exactly ONE 8 KiB array no matter how
  *     many build rows — model-scale traffic, the same contract as
  *     the IVF centroid memo;
  *   - the PROBE side is [[BloomMightContain]], a codegen'd native
  *     expression embedding the bits by reference: the big fact
  *     relation is pruned BEFORE its shuffle/join, which is where
  *     the 100 TB win lives (rows that cannot join never hit the
  *     wire). False positives are removed by the exact join that
  *     follows, so the composed operator's result — and its oracle —
  *     is the plain join's.
  *
  * Hashing is [[KmvSketch.mix64]] double hashing with a
  * power-of-two bit count: h_i = h1 + i·h2 (h2 forced odd), masked —
  * deterministic across partitionings, no engine RNG.
  */
object BloomSketch extends Aggregator[Long, Array[Long], Array[Long]] {

  /** 2^16 bits = 8 KiB; with [[NumHashes]] = 4 the false-positive
    * rate stays under ~1% up to ~6k build keys (m/n ≥ 11). A
    * production wrapper would size m from a build-side count the
    * way `Similarity.ivfKFor` scales K; the demo keys (one order
    * month) are well inside the envelope.
    */
  val NumBits: Int = 1 << 16
  val NumHashes: Int = 4
  private val Mask: Long = (NumBits - 1).toLong

  private def h1(key: Long): Long = KmvSketch.mix64(key)
  private def h2(key: Long): Long =
    KmvSketch.mix64(key ^ 0x9e3779b97f4a7c15L) | 1L

  def zero: Array[Long] = new Array[Long](NumBits / 64)

  override def reduce(buf: Array[Long], key: Long): Array[Long] = {
    val a = h1(key); val b = h2(key)
    var i = 0
    while (i < NumHashes) {
      val pos = ((a + i * b) & Mask).toInt
      buf(pos >> 6) |= 1L << (pos & 63)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  /** Membership probe — shared by interpreted eval and the generated
    * code (Scala objects emit static forwarders, so codegen calls
    * this directly).
    */
  def contains(bits: Array[Long], key: Long): Boolean = {
    val a = h1(key); val b = h2(key)
    var i = 0
    while (i < NumHashes) {
      val pos = ((a + i * b) & Mask).toInt
      if ((bits(pos >> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  /** Probe column: `mightContain(bits, $"l_orderkey")`. */
  def mightContain(bits: Array[Long], key: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(BloomMightContain(bits, ColumnBridge.expression(key)))
  }
}

/** `bloom_might_contain(bigint) -> boolean` against a plan-embedded
  * bit array (the array rides the node like a `Literal`, registered
  * as a codegen reference object — no per-row serialization).
  */
case class BloomMightContain(bits: Array[Long], child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain: key must be BIGINT, got $t")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(k: Any): Any =
    BloomSketch.contains(bits, k.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBits", bits, "long[]")
    nullSafeCodeGen(ctx, ev, k =>
      s"${ev.value} = graft.functions.BloomSketch.contains($ref, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
