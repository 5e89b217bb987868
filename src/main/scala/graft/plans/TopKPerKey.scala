package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge

/** Whole-operator top-k-per-key: the engine's own LogicalPlan + Strategy +
  * physical operator, registered through the planner extension point.
  *
  * WHY A CUSTOM OPERATOR: the DataFrame formulation —
  * `row_number().over(Window.partitionBy(keys).orderBy(ord)) <= k` — plans
  * as Exchange(ALL rows) + Sort(ALL rows) + Window. The reduction is
  * k-bounded, so almost all of that shuffle and sort is wasted: with a
  * per-partition bounded heap the map side emits at most k rows per (key,
  * partition), the shuffle carries survivors only, and no full sort ever
  * happens. At 100 TB ("latest record per patient key" over billions of
  * rows, k=1) that's the difference between shuffling ~everything and
  * shuffling ~one row per key per partition. Two-phase shape mirrors
  * partial/final aggregation.
  *
  * Ties: callers must make `order` a total order within key (append a
  * unique tiebreaker) for deterministic results — same contract as
  * `Dedup.latestPerKey`.
  *
  * Memory: one k-row heap per distinct key per task. The PARTIAL phase is
  * hard-capped at `maxPartialKeys` tracked keys — beyond the cap, rows of
  * new keys pass through unfiltered, which is CORRECT (the partial output
  * only needs to be a superset; the final phase re-filters) and bounds
  * map-side state on adversarial key cardinality, exactly like hash
  * aggregation's partial-skip fallback. The FINAL phase holds
  * k · (distinctKeys / shufflePartitions) rows per task — size
  * `spark.sql.shuffle.partitions` accordingly, or use the window
  * formulation when k·distinctKeys ≫ cluster memory (sort spills, heaps
  * don't).
  */
case class TopKPerKeyPlan(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan,
    maxPartialKeys: Int = TopKPerKey.DefaultMaxPartialKeys) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

/** Planner rule: logical node → partial (narrow) + final (clustered). */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child, maxPartialKeys) =>
      val partial = TopKPerKeyExec(keys, order, k, planLater(child),
        partial = true, maxPartialKeys)
      TopKPerKeyExec(keys, order, k, partial, partial = false, maxPartialKeys) :: Nil
    case _ => Nil
  }
}

/** Bounded per-key heaps over each partition. `partial = true` runs narrow
  * (any input distribution); the final phase demands clustering on `keys`,
  * so EnsureRequirements inserts exactly one hash exchange carrying only
  * the partial survivors (≤ k·keys·partitions rows).
  */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: SparkPlan, partial: Boolean,
    maxPartialKeys: Int = TopKPerKey.DefaultMaxPartialKeys) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution) else Seq(ClusteredDistribution(keys))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val orderExprs = order
    val attrs = output
    val isPartial = partial
    val keyCap = maxPartialKeys
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, attrs)
      val ord = RowOrdering.create(orderExprs, attrs)
      // Java PQ head = smallest per comparator; reversed() puts the WORST
      // retained row (last in sort order) at the head for O(log k) eviction
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      def absorb(heap: java.util.PriorityQueue[InternalRow], row: InternalRow): Unit =
        if (heap.size < kLocal) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      // Absorbing pass, lazily interleaved with the cap's pass-throughs:
      // a row of an untracked key past the cap is emitted immediately
      // (never buffered), so state stays bounded whatever the cardinality.
      val absorbed = iter.flatMap { row =>
        val key = keyProj(row)
        val heap = heaps.get(key)
        if (heap != null) { absorb(heap, row); Iterator.empty }
        else if (isPartial && heaps.size() >= keyCap) Iterator.single(row)
        else {
          val h = new java.util.PriorityQueue[InternalRow](kLocal + 1, ord.reversed())
          heaps.put(key.copy(), h)
          absorb(h, row)
          Iterator.empty
        }
      }
      import scala.jdk.CollectionConverters._
      // ++ is by-name: the heap flush below reads final state only after
      // `absorbed` is exhausted
      absorbed ++ heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKey {

  /** Partial-phase tracked-key cap: ~1M keys × (k+1) rows of state per
    * task before new keys flow through unfiltered to the final phase.
    */
  val DefaultMaxPartialKeys: Int = 1 << 20

  /** Column-API entry: top-k rows per key by `order` (give a TOTAL order
    * within key for determinism). Registers the planner strategy on the
    * session if absent (idempotent).
    */
  def apply(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int,
      maxPartialKeys: Int = DefaultMaxPartialKeys): DataFrame = {
    val exp = df.sparkSession.experimental
    if (!exp.extraStrategies.contains(TopKPerKeyStrategy))
      exp.extraStrategies = exp.extraStrategies :+ TopKPerKeyStrategy
    val sortOrders = order.map(c => Bridge.catalystExpression(c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    val plan = TopKPerKeyPlan(keys.map(Bridge.catalystExpression), sortOrders, k,
      df.queryExecution.analyzed, maxPartialKeys)
    Bridge.ofRows(df.sparkSession, plan)
  }
}
