package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, LessThan, LessThanOrEqual, Literal, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow, WindowExpression}
import org.apache.spark.sql.catalyst.expressions.RowNumber
import org.apache.spark.sql.catalyst.expressions.NamedExpression
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, UnaryNode, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

import scala.collection.mutable

/**
 * Whole-operator Catalyst extension (preference order (c) of the build
 * brief): top-k-per-group as a first-class `LogicalPlan` + `SparkStrategy`
 * + `SparkPlan`, replacing the `row_number() OVER (PARTITION BY …) <= k`
 * idiom.
 *
 * Why Spark's built-ins genuinely can't express this: the Window path
 * plans Exchange → **full in-partition Sort** → Window → Filter — every
 * row of every group is sorted (O(n log n) per partition, sort buffers
 * sized to the whole partition, spill under pressure) only for all but k
 * rows per group to be discarded. Spark 3.5's `WindowGroupLimit`
 * pre-filters but still keeps the Sort + Window pair. [[TopKPerGroupExec]]
 * keeps one bounded heap per group (O(n log k), memory ∝ groups × k) and
 * never sorts the partition — the same reason `TakeOrderedAndProject`
 * exists for global top-k. At 100 TB this is the difference between
 * spilling every partition of a skewed fact table and streaming it.
 *
 * Three entry points:
 *  - programmatic: `graft.operators.TopK.perGroup` (installs the strategy
 *    via `spark.experimental.extraStrategies`);
 *  - SQL/DataFrame users: [[RankLimitRewrite]], an optimizer rule that
 *    spots `Filter(rn <= k, Window(row_number, …))` and swaps this node
 *    in — registered with the strategy by `graft.GraftExtensions`;
 *  - both produce bit-identical results to the Window form (row_number
 *    semantics, ties broken by the order columns only — give the order a
 *    unique tiebreak for determinism, exactly as with Window).
 */
case class TopKPerGroupNode(
    groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"k must be >= 1, got $k")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

/** Plans [[TopKPerGroupNode]]; a no-op on every other node. */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, o, k, rank, child) =>
      TopKPerGroupExec(g, o, k, rank, planLater(child)) :: Nil
    case _ => Nil
  }
}

/**
 * Per-partition bounded-heap top-k: requires clustering on the group
 * keys (EnsureRequirements inserts the single hash exchange), then one
 * streaming pass keeping a size-k max-heap per group — no partition
 * sort, state bounded by (#groups in partition) × k rows.
 */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLoc = k
    val childOutput = child.output
    val gExprs = groupExprs
    val oExprs = orderExprs
    val outAttrs = output
    val rank = rankAttr
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(gExprs, childOutput)
      // compare(a,b) < 0 ⇔ a ranks before b; heap head = worst kept row
      val ord = RowOrdering.create(oExprs, childOutput)
        .asInstanceOf[Ordering[InternalRow]]
      // buffered state (groups × k rows) is ACCOUNTED with the task
      // memory manager (round-2 advice): Spark asks other consumers to
      // spill before granting, and refusal surfaces as a clean error
      // naming the escape hatch instead of a silent executor OOM.
      val acct = TopKMemoryAccounting.forCurrentTask()
      val heaps = new java.util.LinkedHashMap[UnsafeRow, mutable.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = mutable.PriorityQueue.empty[InternalRow](ord)
          val keyCopy = key.copy()
          acct.acquireFor(TopKMemoryAccounting.sizeOf(keyCopy) + 96L)
          heaps.put(keyCopy, heap)
        }
        if (heap.size < kLoc) {
          val copy = row.copy()
          acct.acquireFor(TopKMemoryAccounting.sizeOf(copy) + 48L)
          heap.enqueue(copy)
        } else if (ord.compare(row, heap.head) < 0) {
          val evicted = heap.dequeue()
          val copy = row.copy()
          acct.exchangeFor(TopKMemoryAccounting.sizeOf(evicted),
            TopKMemoryAccounting.sizeOf(copy))
          heap.enqueue(copy)
        }
      }
      val rankRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(outAttrs, childOutput :+ rank)
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { heap =>
        // dequeueAll = worst-first; reverse ⇒ rank 1 first
        val worstFirst: Seq[InternalRow] = heap.dequeueAll
        worstFirst.reverseIterator.zipWithIndex.map { case (r, i) =>
          rankRow.setInt(0, i + 1)
          resultProj(joined(r, rankRow))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/**
 * Execution-memory accounting for [[TopKPerGroupExec]]'s per-group
 * heaps: a [[org.apache.spark.memory.MemoryConsumer]] that acquires
 * from the task memory manager as rows are retained. It cannot spill
 * (the heaps must stay addressable), so under pressure the manager
 * spills OTHER consumers first; if the grant is still refused, the
 * task fails with a message naming the conf escape hatch — the honest
 * failure mode, vs. the silent heap OOM the round-2 advice flagged.
 */
private[plans] final class TopKMemoryAccounting(
    tmm: org.apache.spark.memory.TaskMemoryManager)
  extends org.apache.spark.memory.MemoryConsumer(
    tmm, tmm.pageSizeBytes(), org.apache.spark.memory.MemoryMode.ON_HEAP) {

  override def spill(size: Long, trigger: org.apache.spark.memory.MemoryConsumer): Long = 0L

  // CHUNKED reservation (review finding): acquireMemory synchronizes on
  // the shared TaskMemoryManager, so a per-retained-row call would put
  // a cross-task lock in the hot loop. Track usage locally and go to
  // the manager only when the current reservation runs out — accounting
  // accuracy stays within one chunk of truth.
  private[this] var usedLocal = 0L
  private[this] var reservedLocal = 0L
  private val chunk = 1L << 20

  def acquireFor(bytes: Long): Unit = {
    usedLocal += bytes
    if (usedLocal > reservedLocal) {
      val want = math.max(usedLocal - reservedLocal, chunk)
      val got = acquireMemory(want)
      reservedLocal += got
      if (usedLocal > reservedLocal) {
        throw new org.apache.spark.SparkException(
          "TopKPerGroup buffered state (groups × k rows) exhausted execution " +
            "memory in this task. Reduce group cardinality per partition, or set " +
            s"${TopKMemoryAccounting.rewriteConfKey}=false to keep Spark's " +
            "spillable Sort+Window path for row_number()<=k queries.")
      }
    }
  }

  /** Net accounting for a replace: evicted bytes return to the local
    * reservation (never to the manager mid-stream — bounded by peak). */
  def exchangeFor(oldBytes: Long, newBytes: Long): Unit = {
    usedLocal -= oldBytes
    acquireFor(newBytes)
  }

  def releaseAll(): Unit = if (getUsed > 0) freeMemory(getUsed)
}

private[plans] object TopKMemoryAccounting {
  val rewriteConfKey = "spark.graft.topk.rewrite.enabled"

  def sizeOf(row: InternalRow): Long = row match {
    case u: UnsafeRow => u.getSizeInBytes.toLong
    case r => 64L + 16L * r.numFields
  }

  /** Accounting bound to the running task, released on task completion
    * (covers early-terminated iterators, e.g. a downstream LIMIT). */
  def forCurrentTask(): TopKMemoryAccounting = {
    val tc = org.apache.spark.TaskContext.get()
    val acct = new TopKMemoryAccounting(
      org.apache.spark.graft.TaskMemoryBridge.taskMemoryManager(tc))
    tc.addTaskCompletionListener[Unit](_ => acct.releaseAll())
    acct
  }
}

/**
 * Optimizer rewrite: `Filter(rn <= k [AND rest], Window(row_number()
 * OVER (PARTITION BY g ORDER BY o), …))` → `Filter(rest,
 * TopKPerGroupNode(g, o, k))`. Fires only when row_number is the
 * window's ONLY expression and the rank attribute survives with the
 * same exprId (bit-identical semantics). A `WindowGroupLimit` Spark
 * already inserted below the Window is dropped — this node subsumes it.
 */
object RankLimitRewrite extends Rule[LogicalPlan] {

  /** Extract k from a rank predicate over `rankAttr`, if that's what it is. */
  private def rankLimit(cond: Expression, rankAttr: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType))
      if a.semanticEquals(rankAttr) => Some(v)
    case LessThan(a: Attribute, Literal(v: Int, IntegerType))
      if a.semanticEquals(rankAttr) =>
      // rn < Int.MinValue selects nothing: v-1 would WRAP to
      // Int.MaxValue and the rewrite would return every row — emit 0
      // so the k<1 guard declines and the Window path's empty result
      // stands
      Some(if (v == Int.MinValue) 0 else v - 1)
    case _ => None
  }

  /** Peel a chain of attribute-only (pass-through/reorder/subset)
    * Projects, returning the core plan and the outermost projection to
    * re-apply — each list is a subset of the one below, so only the
    * outermost matters. */
  private def stripAttrProjects(plan: LogicalPlan): (LogicalPlan, Option[Seq[NamedExpression]]) = {
    var cur = plan
    var outer: Option[Seq[NamedExpression]] = None
    var continue = true
    while (continue) cur match {
      case p: Project if p.projectList.forall(_.isInstanceOf[Attribute]) =>
        if (outer.isEmpty) outer = Some(p.projectList)
        cur = p.child
      case _ => continue = false
    }
    (cur, outer)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // session-level gate (round-2 advice): the rewrite trades Spark's
    // spillable Sort+Window for bounded-heap state, which is the wrong
    // trade when per-partition group cardinality is extreme — let users
    // keep the built-in path without uninstalling the extension.
    if (!conf.getConfString(TopKMemoryAccounting.rewriteConfKey, "true").toBoolean) plan
    else applyRewrite(plan)
  }

  private def applyRewrite(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, fChild) =>
      val (core, outerProj) = stripAttrProjects(fChild)
      core match {
        case Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
            partitionSpec, orderSpec, wChild, _) if orderSpec.nonEmpty =>
          val rankAttr = alias.toAttribute
          val conjuncts = splitConjuncts(cond)
          val (rankConds, rest) = conjuncts.partition(c => rankLimit(c, rankAttr).isDefined)
          val ks = rankConds.flatMap(rankLimit(_, rankAttr))
          if (ks.isEmpty || ks.min < 1) f
          else {
            val child = wChild match {
              case WindowGroupLimit(_, _, _, _, grandChild) => grandChild
              case other => other
            }
            val topk = TopKPerGroupNode(partitionSpec, orderSpec, ks.min, rankAttr, child)
            val filtered = if (rest.isEmpty) topk else Filter(rest.reduce(And), topk)
            outerProj match {
              case Some(projList) => Project(projList, filtered)
              case None => filtered
            }
          }
        case _ => f
      }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}

/** Builder helper shared by the programmatic API and tests. */
object TopKPerGroupNode {
  def rankAttribute(name: String): AttributeReference =
    AttributeReference(name, IntegerType, nullable = false)()
}
