/** Custom whole-operator plan: bounded top-k per group.
  *
  * This file lives in an `org.apache.spark.sql` subpackage on purpose —
  * the standard technique for Spark extension libraries that need the
  * `private[sql]`/`private[spark]` planner seams (`Dataset.ofRows`, the
  * codegen'd `RowOrdering`, `BoundedPriorityQueue`). Everything used is
  * the public-source Spark 4 API surface.
  *
  * WHY a custom operator (SURVEY §2.2's preference ladder, step (c)):
  * "top-k rows per group" is the one hot-path shape where the composed
  * plan (`row_number().over(window).filter(rn <= k)` — b10) does
  * strictly more work than the semantics need. Spark 4 already pushes a
  * partial `WindowGroupLimit` below the exchange, but both the partial
  * and final stages still SORT each partition's rows per group
  * (O(n log n) per partition, sort buffers in memory/spill), then run
  * the full Window machinery to compute a rank that a top-k consumer
  * immediately filters away. The heap formulation does O(n log k) with
  * O(groups·k) memory and shuffles at most `partitions·groups·k` rows —
  * the same partial/final contract as a hash aggregate, with a
  * bounded-priority-queue buffer instead of a running value.
  *
  * Scale shape: identical to partial aggregation — map-side heaps bound
  * the exchange at k rows per (group, partition) regardless of skew (a
  * hot group ships k rows per upstream partition, never its full row
  * set), and the final stage merges ≤ partitions·k rows per group.
  *
  * SPILL SAFETY (round 8): the heap map is O(groups-per-partition · k)
  * rows, which for high-cardinality groups or large k can outgrow task
  * memory. Both stages bound it at `spark.graft.topk.maxBufferedRows`
  * buffered rows (ObjectHashAggregate's fallback discipline):
  *   - the PARTIAL stage flushes its heaps downstream and resets — always
  *     sound (it is a pruning combiner; the final stage re-merges), worst
  *     case the exchange degrades toward the unpruned input, never OOM;
  *   - the FINAL stage (all rows of a group co-located by the exchange)
  *     switches to sort-based: buffered heaps + remaining input drain
  *     into an [[org.apache.spark.sql.execution.UnsafeKVExternalSorter]]
  *     keyed on the group columns (Tungsten-managed memory, disk spill),
  *     then equal-key runs stream through ONE k-bounded heap at a time —
  *     peak state after fallback is a single group's k rows.
  *
  * Reference seam: the reference has no query engine (its only "top" is
  * the row-at-a-time pull loop, /root/reference/src/CSVProvider.cs:563) —
  * this operator is part of the beyond-reference analytics surface, built
  * on the documented extension points (`SparkStrategy`,
  * `SparkSessionExtensions.injectPlannerStrategy`,
  * `experimental.extraStrategies`).
  */
package org.apache.spark.sql.graft

import org.apache.spark.{SparkEnv, TaskContext}
import org.apache.spark.internal.config
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, Descending, EqualTo, Expression, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, RowNumber, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, UnaryNode, Window}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode, UnsafeKVExternalSorter}
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import org.apache.spark.util.BoundedPriorityQueue

/** Logical marker: keep the first `k` rows of each group under `orders`.
  * Output = child output (no rank column — a top-k consumer that needs
  * ranks can window over the ≤ groups·k surviving rows for pennies).
  */
case class TopKPerGroupNode(
    groupExprs: Seq[Expression],
    orders: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

/** Planner rule: partial heap (any distribution) feeding a final heap
  * that requires clustering on the group keys — EnsureRequirements
  * inserts the single hash exchange between them, exactly like a
  * two-phase aggregate.
  */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(groupExprs, orders, k, child) =>
      val partial =
        TopKPerGroupExec(groupExprs, orders, k, partial = true, planLater(child))
      TopKPerGroupExec(groupExprs, orders, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** Physical heap top-k. Each partition keeps one bounded priority queue
  * per group key (the queue's ordering is the REVERSE of the requested
  * sort, so the retained k are the sort-first rows); emission order
  * within a group is unspecified, as with any aggregate — callers
  * needing a total order sort the (already k-bounded) result.
  */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    orders: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil
  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val groupLocal = groupExprs
    val ordersLocal = orders
    val outputLocal = child.output
    val kLocal = k
    val partialLocal = partial
    val budget = conf.getConfString(TopKPerGroup.MaxBufferedRowsKey,
      TopKPerGroup.MaxBufferedRowsDefault.toString).toLong
    child.execute().mapPartitionsInternal { rows =>
      new TopKPartitionIterator(
        rows, groupLocal, ordersLocal, outputLocal, kLocal, partialLocal, budget)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Per-partition heap top-k with a hard buffered-row budget (docs on
  * [[TopKPerGroupExec]]): hash-of-heaps while the map fits; at the budget
  * the partial stage flushes-and-resets, the final stage drains into a
  * spillable group-keyed external sort and streams one group at a time.
  */
private[graft] final class TopKPartitionIterator(
    rows: Iterator[InternalRow],
    groupExprs: Seq[Expression],
    orders: Seq[SortOrder],
    output: Seq[Attribute],
    k: Int,
    partial: Boolean,
    maxBufferedRows: Long) extends Iterator[InternalRow] {
  require(maxBufferedRows >= k,
    s"${TopKPerGroup.MaxBufferedRowsKey} ($maxBufferedRows) must cover one group's k ($k)")

  private val keyProj = UnsafeProjection.create(groupExprs, output)
  // codegen'd comparator, built executor-side from the serialized
  // SortOrder trees; reversed so the queue evicts the sort-LAST row
  private implicit val keepFirst: Ordering[InternalRow] =
    RowOrdering.create(orders, output).reverse
  private val heaps =
    scala.collection.mutable.HashMap.empty[UnsafeRow, BoundedPriorityQueue[InternalRow]]
  private var bufferedCnt = 0L
  private var out: Iterator[InternalRow] = Iterator.empty
  // non-null once the final stage has fallen back to sort-based
  private var sorted: UnsafeKVExternalSorter#KVSorterIterator = _
  private var sortedHasRow = false
  private var inputDone = false

  override def hasNext: Boolean = {
    while (!out.hasNext && !inputDone) refill()
    out.hasNext
  }
  override def next(): InternalRow = {
    if (!hasNext) throw new NoSuchElementException("empty iterator")
    out.next()
  }

  /** Advance one phase: consume input up to the budget, then emit either
    * a partial flush, the sort-fallback stream, or the end-of-input drain.
    */
  private def refill(): Unit = {
    if (sorted != null) { out = nextSortedGroup(); return }
    var over = false
    while (rows.hasNext && !over) {
      val row = rows.next()
      val heap = heaps.getOrElseUpdate(keyProj(row).copy(),
        new BoundedPriorityQueue[InternalRow](k))
      val before = heap.size
      heap += row.copy()
      if (heap.size > before) bufferedCnt += 1
      over = bufferedCnt >= maxBufferedRows
    }
    if (!over) {
      out = snapshotAndClear()
      inputDone = true
    } else if (partial) {
      // pruning combiner: emitting early is always sound, the final
      // stage re-merges; worst case the exchange carries unpruned rows
      out = snapshotAndClear()
    } else {
      sortFallback()
      out = nextSortedGroup()
    }
  }

  /** Emit everything buffered and reset the map (snapshot first — the
    * values iterator must not race the clear).
    */
  private def snapshotAndClear(): Iterator[InternalRow] = {
    val flushed = heaps.values.toArray
    heaps.clear()
    bufferedCnt = 0L
    flushed.iterator.flatMap(_.iterator)
  }

  /** Final-stage fallback: heaps + remaining input drain into a
    * Tungsten-managed, disk-spilling sort keyed on the group columns
    * (the exchange already co-located each group in this partition, so a
    * local sort suffices); equal keys come out adjacent.
    */
  private def sortFallback(): Unit = {
    val keySchema = StructType(groupExprs.zipWithIndex.map { case (e, i) =>
      StructField(s"k$i", e.dataType, e.nullable)
    })
    val valueSchema = StructType(output.map(a => StructField(a.name, a.dataType, a.nullable)))
    val env = SparkEnv.get
    val sorter = new UnsafeKVExternalSorter(
      keySchema, valueSchema, env.blockManager, env.serializerManager,
      TaskContext.get().taskMemoryManager().pageSizeBytes(),
      env.conf.get(config.SHUFFLE_SPILL_NUM_ELEMENTS_FORCE_SPILL_THRESHOLD),
      env.conf.get(config.SHUFFLE_SPILL_MAX_SIZE_FORCE_SPILL_THRESHOLD))
    // register cleanup BEFORE inserting: an exception while draining input
    // (spill IO failure) must still release the sorter's spill files/pages
    Option(TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ => sorter.cleanupResources()))
    val toUnsafe = UnsafeProjection.create(output.map(_.dataType).toArray)
    heaps.foreach { case (key, heap) =>
      heap.iterator.foreach(r => sorter.insertKV(key, toUnsafe(r)))
    }
    heaps.clear()
    bufferedCnt = 0L
    while (rows.hasNext) {
      val r = rows.next()
      sorter.insertKV(keyProj(r), toUnsafe(r))
    }
    sorted = sorter.sortedIterator()
    sortedHasRow = sorted.next()
  }

  /** One equal-key run of the sorted stream through a single k-bounded
    * heap — peak state after fallback is one group's k rows.
    */
  private def nextSortedGroup(): Iterator[InternalRow] = {
    if (!sortedHasRow) {
      inputDone = true
      return Iterator.empty
    }
    val groupKey = sorted.getKey.copy()
    val heap = new BoundedPriorityQueue[InternalRow](k)
    heap += sorted.getValue.copy()
    sortedHasRow = sorted.next()
    while (sortedHasRow && sorted.getKey == groupKey) {
      heap += sorted.getValue.copy()
      sortedHasRow = sorted.next()
    }
    heap.iterator
  }
}

/** Optimizer rewrite: the canonical DataFrame top-k idiom
  *
  *   `withColumn("rn", row_number().over(w)).filter(rn <= k).drop("rn")`
  *
  * optimizes into [[TopKPerGroupNode]] — users keep writing the idiom and
  * get the heap plan for free. Fires ONLY when the rewrite is provably
  * transparent: the window computes exactly one expression (the
  * row_number), the filter is a plain rank bound, the rank column is NOT
  * in the output (a kept rank needs the window), the partition spec is
  * non-empty (a global top-k is Spark's TakeOrderedAndProject territory),
  * and the projection reads only the window child's columns. Everything
  * else keeps its window plan — the rule is an optimization, never a
  * semantics change. Opt-in via [[TopKPerGroup.registerRewrite]] or the
  * builder-time [[GraftSparkExtensions]]; deliberately NOT bundled into
  * [[TopKPerGroup.register]] so declared queries' plans don't depend on
  * which query ran first in a shared session.
  */
object TopKWindowRewrite extends Rule[LogicalPlan] {
  /** The k of a `rank <= k`-shaped predicate on `rn`, if that is what
    * `cond` is.
    */
  private def rankBound(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
      if a.exprId == rn.exprId => Some(k)
    // k > MinValue: `rn < Int.MinValue` must stay an (always-false)
    // filter, not wrap to top-Int.MaxValue
    case LessThan(a: Attribute, Literal(k: Int, IntegerType))
      if a.exprId == rn.exprId && k > Int.MinValue => Some(k - 1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute)
      if a.exprId == rn.exprId => Some(k)
    // rn = 1 <=> rn <= 1 (row_number is 1-based and unique per group)
    case EqualTo(a: Attribute, Literal(1, IntegerType))
      if a.exprId == rn.exprId => Some(1)
    case EqualTo(Literal(1, IntegerType), a: Attribute)
      if a.exprId == rn.exprId => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // the heap plan's win region is small k (O(log k) inserts, k rows per
    // group buffered); past this ceiling keep the window-sort plan, whose
    // sort machinery is the better fit as k approaches the group size
    val maxK = conf.getConfString(TopKPerGroup.RewriteMaxKKey,
      TopKPerGroup.RewriteMaxKDefault.toString).toInt
    plan.transformUp {
      case Project(projectList, Filter(cond,
          Window(Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)),
            partitionSpec, orderSpec, child, _)))
        if partitionSpec.nonEmpty && orderSpec.nonEmpty &&
          rankBound(cond, alias.toAttribute).exists(b => b > 0 && b <= maxK) &&
          projectList.forall(_.references.subsetOf(child.outputSet)) =>
        Project(projectList, TopKPerGroupNode(partitionSpec, orderSpec,
          rankBound(cond, alias.toAttribute).get, child))
    }
  }
}

/** User-facing construction + registration. */
object TopKPerGroup {
  /** Per-task buffered-row budget before the exec leaves pure hash-of-
    * heaps mode (partial: flush downstream; final: spillable sort).
    */
  val MaxBufferedRowsKey = "spark.graft.topk.maxBufferedRows"
  val MaxBufferedRowsDefault: Long = 1L << 20

  /** Largest k [[TopKWindowRewrite]] converts — larger bounds keep the
    * window-sort plan (review finding: an unbounded rewrite turned a
    * spill-tested plan into a heap plan for any k a filter names).
    */
  val RewriteMaxKKey = "spark.graft.topk.rewriteMaxK"
  val RewriteMaxKDefault: Int = 65536

  /** Logical-node constructor: resolves the named columns against `df`'s
    * analyzed output and wraps it in [[TopKPerGroupNode]]. `orderBy` is
    * (column, descending?) pairs evaluated in sequence — include a
    * unique tie-break column for deterministic results.
    */
  def apply(df: DataFrame, groupCols: Seq[String],
            orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(groupCols.nonEmpty,
      "top-k per group needs group columns — a GLOBAL top-k is orderBy(...).limit(k), " +
        "which Spark plans as TakeOrderedAndProject")
    require(orderBy.nonEmpty, "top-k needs an ordering")
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    // a node the planner can't translate is an internal error at plan
    // time — constructing one implies wanting the strategy (idempotent)
    register(ds.sparkSession)
    val plan = ds.queryExecution.analyzed
    // resolve like the analyzer: a duplicated name is an error, not a
    // silent bind to whichever attribute happens to come first
    def attr(name: String): Attribute =
      plan.output.filter(_.name == name) match {
        case Seq(a) => a
        case Seq() => throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(", ")}")
        case many => throw new IllegalArgumentException(
          s"column $name is ambiguous: ${many.size} attributes match " +
            "(disambiguate with aliases before TopKPerGroup)")
      }
    val orders = orderBy.map { case (c, desc) =>
      SortOrder(attr(c), if (desc) Descending else Ascending)
    }
    classic.Dataset.ofRows(ds.sparkSession,
      TopKPerGroupNode(groupCols.map(attr), orders, k, plan))
  }

  /** Same-session registration via the experimental strategy hook. */
  def register(spark: SparkSession): Unit = {
    val strategies = spark.experimental.extraStrategies
    if (!strategies.contains(TopKPerGroupStrategy)) {
      spark.experimental.extraStrategies = TopKPerGroupStrategy +: strategies
    }
  }

  /** Opt-in window→heap rewrite (see [[TopKWindowRewrite]]); implies
    * [[register]] — a rewritten node needs the strategy to plan.
    */
  def registerRewrite(spark: SparkSession): Unit = {
    register(spark)
    val opts = spark.experimental.extraOptimizations
    if (!opts.contains(TopKWindowRewrite)) {
      spark.experimental.extraOptimizations = TopKWindowRewrite +: opts
    }
  }

  /** Undo [[registerRewrite]] — session-shared test harnesses restore the
    * optimizer so other suites' plan pins stay deterministic.
    */
  def unregisterRewrite(spark: SparkSession): Unit = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == TopKWindowRewrite)
  }
}

/** Builder-time injection for cluster deployments:
  * `--conf spark.sql.extensions=org.apache.spark.sql.graft.GraftSparkExtensions`.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => TopKPerGroupStrategy)
    ext.injectOptimizerRule(_ => TopKWindowRewrite)
  }
}

object GraftSparkExtensions {
  /** Test seam: the strategies an extensions instance would contribute
    * (`buildPlannerStrategies` is `private[sql]`, so specs outside this
    * package can't call it directly).
    */
  def plannedStrategies(ext: SparkSessionExtensions,
                        spark: SparkSession): Seq[SparkStrategy] =
    ext.buildPlannerStrategies(spark)
}
