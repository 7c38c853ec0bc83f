package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom plan (SURVEY.md §2 ladder rung (c)): top-k
  * rows per key — the `row_number().over(window) <= k` pattern — as a
  * first-class physical operator.
  *
  * Why a custom operator: the window formulation shuffles EVERY row to
  * its key's partition and fully sorts each partition, even though all
  * but k rows per key are discarded. [[TopKPerKeyExec]] instead runs
  * map-side with a bounded k-heap per key (like partial aggregation),
  * shuffles only the per-partition survivors (≤ k·|keys| rows), and
  * re-selects on the reduce side. At 100 TB the shuffle shrinks from
  * |rows| to |partitions|·k·|keys| and no full sort ever happens.
  */
final case class TopKPerKey(
    groupKeys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan)
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Physical top-k-per-key. `partial = true` runs map-side with no
  * distribution requirement; `partial = false` demands clustering on
  * the keys (EnsureRequirements inserts the single exchange between
  * the two).
  */
final case class TopKPerKeyExec(
    groupKeys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupKeys))

  /** Max distinct keys held per partial-phase task before flushing.
    * Flushing emits the current heaps and starts fresh — safe for the
    * partial phase because the union of segment-wise top-k supersets
    * the partition top-k (the final phase re-selects exactly); it
    * bounds memory at ~MaxKeys * k rows where the Window formulation
    * would instead full-sort. The final phase never flushes (its
    * per-key input is already <= numPartitions * k rows).
    */
  private val MaxPartialKeys = 1 << 17

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keys = groupKeys
    val sortOrder = order
    val limit = k
    val isPartial = partial
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keys, childOutput)
      // ascending "rank" ordering; the heap keeps the k smallest with
      // the current worst on top
      val ord = RowOrdering.create(sortOrder, childOutput)
      var heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      val flushed = mutable.ArrayBuffer.empty[Iterator[InternalRow]]
      it.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            if (isPartial && heaps.size >= MaxPartialKeys) {
              flushed += heaps.valuesIterator.flatMap(_.iterator)
              heaps = mutable.LinkedHashMap.empty
            }
            val h = mutable.PriorityQueue.empty[InternalRow](ord)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < limit) heap += row.copy()
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap += row.copy()
        }
      }
      flushed.iterator.flatten ++ heaps.valuesIterator.flatMap(_.iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"
}

/** Planner strategy: logical TopKPerKey -> partial + final exec pair. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopK {

  /** `topKPerKey(df, keys, Seq(col -> desc?), k)`: rows ranking in the
    * first k of their key group under the given order (ties resolved
    * by the order itself — pass a tiebreak column for determinism).
    * Registers [[TopKStrategy]] on the session's experimental
    * strategies (idempotent).
    */
  def topKPerKey(
      df: DataFrame,
      keyNames: Seq[String],
      orderSpec: Seq[(String, Boolean)], // (column, descending?)
      k: Int): DataFrame = {
    require(k > 0, s"topKPerKey: k must be positive, got $k")
    require(keyNames.nonEmpty, "topKPerKey: at least one key column required")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"topKPerKey: no column '$name' in ${analyzed.output.map(_.name)}"))
    val order = orderSpec.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    org.apache.spark.sql.graft.ColumnBridge.ofRows(spark,
      TopKPerKey(keyNames.map(attr), order, k, analyzed))
  }
}
