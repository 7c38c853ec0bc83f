package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{ChunkSplit, CosineSimilarity}

/** Optimizer rule completing the custom-operator ladder: rewrite the
  * `row_number().over(partitionBy/orderBy) <= k` filter pattern into
  * the [[TopKPerKey]] operator — but only when the rank column itself
  * is projected away (its value is unobservable, so the rewrite is
  * semantics-preserving). The window formulation shuffles all rows
  * and sorts every key group; the rewrite keeps map-side k-heaps and
  * shuffles only survivors. (Spark's own InferWindowGroupLimit also
  * targets this pattern but still runs the full Window after its
  * group-limit prefilter; this rule removes the Window entirely.)
  */
object RewriteRankFilterToTopK extends Rule[LogicalPlan] {

  private object RankLimit {
    def unapply(e: Expression): Option[(Attribute, Int)] = e match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(v)) => Some((a, v))
      case LessThan(a: Attribute, IntegerLiteral(v)) => Some((a, v - 1))
      case GreaterThanOrEqual(IntegerLiteral(v), a: Attribute) => Some((a, v))
      case GreaterThan(IntegerLiteral(v), a: Attribute) => Some((a, v - 1))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Project(projList,
        Filter(RankLimit(rnAttr, k),
          Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
            partSpec, orderSpec, child, _)))
        if k > 0 && partSpec.nonEmpty && // global top-k must keep the
          // Window path: ClusteredDistribution(Nil) is rejected by Spark
          rnAttr.semanticEquals(alias.toAttribute) &&
          projList.forall(_.references.subsetOf(child.outputSet)) =>
      Project(projList, TopKPerKey(partSpec, orderSpec, k, child))
  }
}

/** Session extensions: planner strategy + optimizer rule + native SQL
  * functions, enabled with
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => TopKStrategy)
    e.injectOptimizerRule(_ => RewriteRankFilterToTopK)
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("chunk_split"),
      new ExpressionInfo(classOf[ChunkSplit].getName, "chunk_split"),
      (exprs: Seq[Expression]) => ChunkSplit(exprs(0), exprs(1), exprs(2))))
  }
}
