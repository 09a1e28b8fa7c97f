package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** A ZERO-COST optimizer barrier — the custom-LogicalPlan tier of the
  * extension ladder (compose > Expression > LogicalPlan+Strategy >
  * mapPartitions), used where the built-in operators genuinely cannot
  * express the semantics: "do not move predicates or collapse
  * projections across this point".
  *
  * Why a custom node: every Catalyst rewrite rule pattern-matches on
  * KNOWN operators, so an unknown UnaryNode is a natural fixed point —
  * `PushDownPredicates`' `canPushThrough` whitelist doesn't include
  * it, `CollapseProject` can't see through it, and
  * `InferFiltersFromGenerate`'s synthesized filters stop above it.
  * Unlike the `localCheckpoint` lineage fence it replaces in
  * single-consumer pipelines, the barrier MATERIALIZES NOTHING and
  * keeps the full recompute path — on a real cluster an executor loss
  * re-derives the partition from source, where a local checkpoint's
  * blocks would simply be gone. (Multi-consumer compute-once staging
  * still wants `persist`/checkpoint — a pure barrier cannot dedupe
  * work across two consumers.)
  *
  * The physical node is pass-through (`child.execute()`), preserves
  * the child's partitioning and ordering so no spurious exchange is
  * planned above it, and — like any non-codegen operator — splits the
  * whole-stage-codegen span exactly where the fence sits, which is
  * the documented intent (the expensive fenced projection compiles in
  * its own stage, referenced downstream as a bound attribute). */
case class OptimizationFence(child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): OptimizationFence =
    copy(child = newChild)
}

case class OptimizationFenceExec(child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override protected def doExecute(): RDD[InternalRow] = child.execute()
  override protected def withNewChildInternal(newChild: SparkPlan): OptimizationFenceExec =
    copy(child = newChild)
}

/** Planner rule for [[OptimizationFence]] — registered per-session via
  * `spark.experimental.extraStrategies` (public API, no session
  * builder changes), consulted before the built-in strategies. */
object FenceStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case OptimizationFence(child) => OptimizationFenceExec(planLater(child)) :: Nil
    case _ => Nil
  }
}
