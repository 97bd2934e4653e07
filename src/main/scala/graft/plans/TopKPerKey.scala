package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Grouped top-k as a first-class operator: for each group key keep
  * the k best rows under an ordering, emitting a 1-based `rank`.
  *
  * Spark has no physical operator for this — the idiomatic
  * `row_number().over(Window.partitionBy(...).orderBy(...))` FULLY
  * SORTS every partition's rows (O(n log n) per key, all rows through
  * the sort) before discarding everything past k. This operator keeps
  * a size-k heap per key (O(n log k)), and its partial phase runs
  * map-side BEFORE the exchange, so at most `k · distinct-keys` rows
  * per input partition cross the shuffle — at 100 TB with k=5 that is
  * the difference between shuffling the corpus and shuffling the
  * answer.
  *
  * Full custom-operator stack: [[TopKPerKeyPlan]] (logical) →
  * [[TopKPerKeyStrategy]] (planning: partial → shuffle → final) →
  * [[TopKPerKeyExec]] (physical, heap-based). Injected by
  * GraftExtensions; constructed from the public API via
  * `graft.plans.TopKPerKey(df, keys, order, k)`.
  */
case class TopKPerKeyPlan(groupKeys: Seq[Expression],
    ordering: Seq[SortOrder], k: Int, child: LogicalPlan,
    rankAttr: AttributeReference =
      AttributeReference("rank", IntegerType, nullable = false)())
  extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(Seq(rankAttr))

  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case t @ TopKPerKeyPlan(keys, ordering, k, child, _) =>
      val partial = TopKPerKeyExec(keys, ordering, k, partial = true,
        rankAttr = None, planLater(child))
      TopKPerKeyExec(keys, ordering, k, partial = false,
        rankAttr = Some(t.rankAttr), partial) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(groupKeys: Seq[Expression],
    ordering: Seq[SortOrder], k: Int, partial: Boolean,
    rankAttr: Option[AttributeReference], child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] =
    rankAttr.map(child.output :+ _).getOrElse(child.output)

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr.toSeq)

  // partial phase consumes raw input partitions map-side; the final
  // phase requires co-location of each key's survivors
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupKeys))

  override protected def doExecute(): RDD[InternalRow] = {
    // capture only serializable expression trees; codegen'd projection
    // and ordering instantiate per partition on the executor
    val keys = groupKeys
    val sortExprs = ordering
    val childOutput = child.output
    val outAttrs = output
    val emitRank = rankAttr.isDefined
    val kk = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keys, childOutput)
      val ord = new LazilyGeneratedOrdering(sortExprs, childOutput)
      // downstream consumers (getByteArrayRdd in collect(), exchanges)
      // require UnsafeRow; the rank-joined rows below are Generic, so
      // the final phase converts on emit
      val toUnsafe = UnsafeProjection.create(outAttrs, outAttrs)
      // per-key bounded heap; heap head = worst currently-kept row
      val heaps = mutable.LinkedHashMap.empty[InternalRow, mutable.PriorityQueue[InternalRow]]
      val heapOrd: Ordering[InternalRow] = ord // max-heap on "worst first"
      iter.foreach { row =>
        val key = keyProj(row).copy()
        val heap = heaps.getOrElseUpdate(key,
          mutable.PriorityQueue.empty[InternalRow](heapOrd))
        if (heap.size < kk) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) { // row ranks before worst
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      heaps.iterator.flatMap { case (_, heap) =>
        val rows = heap.dequeueAll.reverse // best → worst
        if (!emitRank) rows.iterator
        else rows.iterator.zipWithIndex.map { case (r, i) =>
          val joined = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            r.numFields + 1)
          var j = 0
          val fields = childOutput
          while (j < r.numFields) {
            joined.update(j, r.get(j, fields(j).dataType)); j += 1
          }
          joined.update(r.numFields, i + 1)
          toUnsafe(joined).copy(): InternalRow
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Public constructor: `TopKPerKey(df, Seq("user_id"), Seq(desc("value")), 5)`. */
object TopKPerKey {
  import org.apache.spark.sql.{Column, DataFrame}

  def apply(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    val plan = df.queryExecution.analyzed
    val keyExprs: Seq[Expression] = keys.map { name =>
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no such column: $name"))
    }
    val sortOrders: Seq[SortOrder] = order.map { c =>
      org.apache.spark.sql.GraftPlanBridge.expression(c) match {
        case so: SortOrder =>
          so.copy(child = resolve(so.child, plan))
        case e => SortOrder(resolve(e, plan), org.apache.spark.sql.catalyst.expressions.Ascending)
      }
    }
    org.apache.spark.sql.GraftPlanBridge.ofRows(spark, TopKPerKeyPlan(keyExprs, sortOrders, k, plan))
  }

  private def resolve(e: Expression, plan: LogicalPlan): Expression = e.transformUp {
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
      plan.output.find(_.name == u.name).getOrElse(
        throw new IllegalArgumentException(s"no such column: ${u.name}"))
  }
}
