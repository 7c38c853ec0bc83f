package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * Spark's higher-order array functions (`zip_with`, `aggregate`,
  * `transform`) — codegen'd expressions, no UDFs, so similarity
  * scans stay inside WholeStageCodegen at cluster scale.
  *
  * Floats are widened to double *before* multiplication; folds are
  * left-to-right, matching DuckDB's `list_sum` order so results are
  * reproducible across engines (rounded at the comparison boundary).
  */
object VectorOps {

  /** Σ aᵢ·bᵢ with double accumulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ */
  def norm(a: Column): Column =
    sqrt(aggregate(
      transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  /** cosine(a, b) = a·b / (‖a‖‖b‖); null-safe only via upstream
    * filtering (zero vectors yield NaN, as in the oracle).
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** cosine given precomputed norms (avoids recomputing the candidate
    * norm once per query in a top-k cross join).
    */
  def cosineWithNorms(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)
}
