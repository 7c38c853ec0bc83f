package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch as a typed
  * `Aggregator` — the classic bottom-k estimator: keep the K smallest
  * distinct 64-bit hashes seen; if fewer than K exist the count is
  * exact, otherwise n̂ = (K−1)·2⁶⁴ / kth-smallest-hash (unsigned).
  *
  * Why this exists alongside `approx_count_distinct`: Spark's HLL++
  * sketch is engine-specific, so it can never hash-match an external
  * oracle. KMV over the portable polynomial hash
  * ([[graft.ext.Dedup.polyHash64]]) is fully deterministic — the
  * DuckDB oracle recomputes the identical estimate with HUGEINT
  * integer arithmetic, bit-for-bit, making the sketch itself
  * gate-verifiable (SURVEY.md §2.5 count-distinct-sketch extension).
  *
  * Scale shape: bounded state (K longs) per group, associative and
  * commutative merges — exactly what map-side partial aggregation
  * needs; no shuffle of raw values, only K-long buffers.
  */
object KmvSketch extends Aggregator[Long, Array[Long], Long] {

  val K = 256

  /** Portable 64-bit finalizer over the polynomial hash: the raw
    * base-31 polynomial of a short decimal string occupies only the
    * low bits, which would wreck KMV's order statistics (the k-th min
    * must look uniform on [0, 2⁶⁴)). Murmur3-style multiply +
    * shift-ADD rounds (add, not xor — DuckDB reproduces the whole
    * chain in HUGEINT with a 32-bit-split multiply, where xor has no
    * portable equivalent). Verified bit-for-bit against the oracle's
    * SQL formulation.
    */
  private[graft] def mix64(x0: Long): Long = {
    var x = x0 * 0xff51afd7ed558ccdL
    x = x + (x >>> 33)
    x = x * 0xc4ceb9fe1a85ec53L
    x + (x >>> 33)
  }

  /** The sketch's input hash for a value's string form. */
  private[graft] def hash(s: String): Long =
    mix64(graft.ext.Dedup.polyHash64(s))

  /** Buffer: sorted (unsigned ascending) distinct hashes, ≤ K. */
  def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], h: Long): Array[Long] = insert(buf, h)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    b.foldLeft(a)(insert)

  override def finish(buf: Array[Long]): Long =
    if (buf.length < K) buf.length.toLong
    else {
      val mask = (BigInt(1) << 64) - 1
      val kth = BigInt(buf.last) & mask
      ((BigInt(K - 1) << 64) / kth).toLong
    }

  private def insert(buf: Array[Long], h: Long): Array[Long] = {
    // unsigned binary search
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val c = java.lang.Long.compareUnsigned(buf(mid), h)
      if (c < 0) lo = mid + 1
      else if (c > 0) hi = mid
      else return buf // already present (set semantics)
    }
    if (buf.length >= K && lo >= K) buf // larger than the current kth
    else {
      val keep = math.min(buf.length + 1, K)
      val out = new Array[Long](keep)
      System.arraycopy(buf, 0, out, 0, lo)
      out(lo) = h
      System.arraycopy(buf, lo, out, lo + 1, keep - lo - 1)
      out
    }
  }

  def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
