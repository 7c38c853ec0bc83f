package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.11): ratio-of-sums as an
  * `Aggregator[IN, BUF, OUT]` — the reference's corpus ratio semantics
  * (`Σ file_size / Σ text_size`, ratio of sums NOT mean of ratios,
  * `/root/reference/pdf_reader.py:148`) as a reusable, mergeable
  * aggregate. The buffer is a pair of exact Long sums, so partial
  * (map-side) aggregation and merge order cannot perturb the result.
  */
object RatioOfSums extends Aggregator[(Long, Long), (Long, Long), Double] {

  override def zero: (Long, Long) = (0L, 0L)

  override def reduce(b: (Long, Long), in: (Long, Long)): (Long, Long) =
    (b._1 + in._1, b._2 + in._2)

  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(b: (Long, Long)): Double =
    if (b._2 == 0) Double.NaN else b._1.toDouble / b._2

  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
