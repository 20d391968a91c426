package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LocalLimit, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer-level fix for THE canonical fact-table scale bug: a window
  * with no PARTITION BY (`SUM(x) OVER (ORDER BY k)`, `ROW_NUMBER() OVER
  * (ORDER BY k)`, `NTILE(n) OVER (ORDER BY k)`, ...) plans as a
  * single-partition WindowExec — the entire input serializes through ONE
  * task, which melts at 100 TB no matter what the query around it does.
  *
  * Spark's own answer for global ORDER BY is two-phase: sample → range
  * exchange → per-partition sort. Running aggregates decompose the same
  * way (the `pack.PrefixSum` discipline, here executed natively instead
  * of composed):
  *
  *   1. range-repartition + sort on the window order — Spark's planner
  *      inserts the exchange because [[GlobalRunningWindowExec]] declares
  *      `OrderedDistribution`; equal keys land in ONE partition (range
  *      bounds compare deterministically), so tie groups never straddle a
  *      boundary;
  *   2. a first pass over the sorted shuffle output computes one tiny
  *      summary per partition (row count, tie-group count, per-aggregate
  *      totals) — collected to the driver: O(partitions) scalars;
  *   3. prefix-combine the summaries into per-partition start offsets;
  *   4. a second pass streams each partition once, seeding every
  *      accumulator with its partition's offset — fully parallel, one
  *      task per partition, and the shuffle files are read twice but
  *      written once.
  *
  * Results are BIT-IDENTICAL to the single-partition WindowExec for every
  * rewritten shape: integral/decimal SUM reassociates exactly (double /
  * float sums are deliberately NOT matched — reassociation changes their
  * last bits), COUNT/MIN/MAX are order-free, and the rank family depends
  * only on global row/group indexes, which pass 2 knows exactly.
  *
  * The strategy only fires when the window's input is NOT already bounded
  * by an aggregation or limit below it (the same test
  * `PlanGuardSpec`'s partitionless-window sweep applies): a cumulative
  * sum over per-bucket totals or a top-K shortlist is already the right
  * plan, and the range exchange would only add latency there.
  *
  * Activation: sessions built by [[graft.GraftSession]] get it through
  * [[graft.functions.GraftExtensions]]; foreign sessions (the driver
  * harness, a shared notebook) call [[RunningWindow.install]], the
  * planner-strategy twin of `GraftExtensions.registerAll`.
  */
object RunningWindow {

  /** Idempotently attach the strategy to a live session the library did
    * not build (`spark.experimental.extraStrategies` is session state).
    */
  def install(spark: SparkSession): Unit = synchronized {
    // synchronized: Verify runs gates concurrently; an unguarded
    // check-then-act here could register the strategy twice
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(GlobalRunningWindowStrategy))
      spark.experimental.extraStrategies = cur :+ GlobalRunningWindowStrategy
  }

  /** Kill switch: `SET spark.graft.runningWindow.enabled=false` restores
    * the built-in single-partition WindowExec plan.
    */
  val EnabledKey = "spark.graft.runningWindow.enabled"

  /** A window input that is already bounded — an aggregation (one row per
    * group over a bounded domain) or a limit — keeps the built-in plan.
    * Mirrors PlanGuardSpec's partitionless-window sweep exactly.
    */
  def boundedInput(plan: LogicalPlan): Boolean = plan.exists {
    case _: Aggregate => true
    case _: GlobalLimit => true
    case _: LocalLimit => true
    case _ => false
  }

  // ---- supported running shapes -------------------------------------

  /** One materialized window expression. `kind`: 0 SUM, 1 COUNT, 2 MIN,
    * 3 MAX (agg over the running frame), 10 ROW_NUMBER, 11 RANK,
    * 12 DENSE_RANK, 13 NTILE.
    */
  case class Spec(kind: Int, value: Expression, resultType: DataType,
                  rowsFrame: Boolean, ntileBuckets: Int,
                  out: Attribute, offset: Int = 0,
                  default: Expression = Literal(null)) extends Serializable {
    def isAgg: Boolean = kind < 10
    // cume_dist = (rows with key <= current)/N — the RANGE-frame count,
    // so it rides the same tie-group machinery as RANGE aggregates
    def needsGroupTotal: Boolean = (isAgg && !rowsFrame) || kind == 15
    def isOffset: Boolean = kind == 20 || kind == 21
  }

  /** Values read from reused UnsafeRows must be detached before they
    * outlive the row (min/max carry them across rows; offset specs carry
    * them across partitions to the driver).
    */
  def copyVal(v: Any): Any = v match {
    case s: UTF8String => s.clone()
    case b: Array[Byte] => b.clone()
    case other => other
  }

  private def runningFrame(frame: Expression): Option[Boolean] =
    frame match {
      case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) =>
        Some(true)
      case SpecifiedWindowFrame(RangeFrame, UnboundedPreceding, CurrentRow) =>
        Some(false)
      case _ => None
    }

  /** SUM result types we can reproduce bit-exactly (double/float sums
    * reassociate — excluded on purpose).
    */
  private def exactSumType(dt: DataType): Boolean = dt match {
    case LongType | _: DecimalType => true
    case _ => false
  }

  private def orderableAtomic(dt: DataType): Boolean =
    RowOrdering.isOrderable(dt) &&
      !dt.isInstanceOf[StructType] && !dt.isInstanceOf[ArrayType]

  def toSpec(ne: NamedExpression): Option[Spec] = ne match {
    case a @ Alias(WindowExpression(fn, WindowSpecDefinition(Nil, _, frame)),
        _) =>
      fn match {
        case AggregateExpression(s: Sum, Complete, false, None, _)
            if exactSumType(s.dataType) && s.child.deterministic =>
          runningFrame(frame).map { rows =>
            val value = s.dataType match {
              case LongType => Cast(s.child, LongType)
              case _ => s.child // decimal: accumulated as BigDecimal
            }
            Spec(0, value, s.dataType, rows, 0, a.toAttribute)
          }
        case AggregateExpression(c: Count, Complete, false, None, _)
            if c.children.size == 1 && c.children.head.deterministic =>
          runningFrame(frame).map(rows =>
            Spec(1, c.children.head, LongType, rows, 0, a.toAttribute))
        case AggregateExpression(m: Min, Complete, false, None, _)
            if orderableAtomic(m.dataType) && m.child.deterministic =>
          runningFrame(frame).map(rows =>
            Spec(2, m.child, m.dataType, rows, 0, a.toAttribute))
        case AggregateExpression(m: Max, Complete, false, None, _)
            if orderableAtomic(m.dataType) && m.child.deterministic =>
          runningFrame(frame).map(rows =>
            Spec(3, m.child, m.dataType, rows, 0, a.toAttribute))
        // rank family: value is a pure function of global row/group index
        // — frame irrelevant (the analyzer pins their frames anyway)
        case _: RowNumber =>
          Some(Spec(10, Literal(1), IntegerType, true, 0, a.toAttribute))
        case _: Rank =>
          Some(Spec(11, Literal(1), IntegerType, true, 0, a.toAttribute))
        case _: DenseRank =>
          Some(Spec(12, Literal(1), IntegerType, true, 0, a.toAttribute))
        case NTile(Literal(b: Int, IntegerType)) if b > 0 =>
          Some(Spec(13, Literal(1), IntegerType, true, b, a.toAttribute))
        // percent_rank = (rank-1)/(N-1), cume_dist = rangeCount/N: pure
        // functions of exact global quantities (one IEEE division each,
        // matching Spark's own Divide(Cast,Cast) form bit-for-bit)
        case _: PercentRank =>
          Some(Spec(14, Literal(1), DoubleType, true, 0, a.toAttribute))
        case _: CumeDist =>
          Some(Spec(15, Literal(1), DoubleType, false, 0, a.toAttribute))
        // offset functions: value is the expr at a FIXED global row
        // offset — pass 1 ships each partition's boundary heads/tails
        // (O(offset) values, the joins.RangeLead discipline) so pass 2
        // never needs another partition's rows. RESPECT NULLS only;
        // defaults must be foldable (evaluated once at the boundary).
        case Lead(e, Literal(o: Int, IntegerType), d, false)
            if o >= 0 && e.deterministic && d.foldable =>
          Some(Spec(20, e, fn.dataType, true, 0, a.toAttribute, o, d))
        case Lag(e, Literal(o: Int, IntegerType), d, false)
            if o >= 0 && e.deterministic && d.foldable =>
          Some(Spec(21, e, fn.dataType, true, 0, a.toAttribute, o, d))
        case _ => None
      }
    case _ => None
  }

  // ---- runtime accumulator (pass 1 totals, driver merge, pass 2) ----

  /** Mutable accumulator for one agg spec. The SAME class runs pass 1
    * (partition totals), the driver prefix-combine, and pass 2 (seeded
    * running state), so the three stages cannot disagree on null/overflow
    * semantics.
    */
  final class Acc(kind: Int, dt: DataType, ansi: Boolean)
      extends Serializable {
    private val ord: Ordering[Any] =
      if (kind == 2 || kind == 3) TypeUtils.getInterpretedOrdering(dt)
      else null
    private val isDecimal = dt.isInstanceOf[DecimalType]
    private var hasVal = false
    private var l = 0L
    private var bd = java.math.BigDecimal.ZERO
    private var mm: Any = null

    def add(v: Any): Unit = {
      if (v == null) return
      kind match {
        case 0 =>
          if (isDecimal) bd = bd.add(v.asInstanceOf[Decimal].toJavaBigDecimal)
          // ANSI mode: overflow fails LOUDLY like WindowExec's Sum would
          // (wrap-around here would silently break the bit-identical
          // contract on any session left at Spark 4's ANSI default)
          else if (ansi) l = Math.addExact(l, v.asInstanceOf[Long])
          else l += v.asInstanceOf[Long]
          hasVal = true
        case 1 => l += 1L
        case 2 =>
          if (!hasVal || ord.compare(v, mm) < 0) mm = copyVal(v)
          hasVal = true
        case 3 =>
          if (!hasVal || ord.compare(v, mm) > 0) mm = copyVal(v)
          hasVal = true
      }
    }

    private def copyVal(v: Any): Any = RunningWindow.copyVal(v)

    /** Pass-1 output / driver state: a small serializable snapshot. */
    def total: Any = kind match {
      case 0 => if (!hasVal) null else if (isDecimal) bd else l
      case 1 => l
      case _ => if (hasVal) mm else null
    }

    /** Seed this accumulator with an earlier partition's `total`. */
    def addTotal(t: Any): Unit = {
      if (t == null) return
      kind match {
        case 0 =>
          if (isDecimal) bd = bd.add(t.asInstanceOf[java.math.BigDecimal])
          else if (ansi) l = Math.addExact(l, t.asInstanceOf[Long])
          else l += t.asInstanceOf[Long]
          hasVal = true
        case 1 => l += t.asInstanceOf[Long]
        case _ =>
          add(t) // min/max merge IS add
      }
    }

    /** Current running value in catalyst-internal form (null while the
      * frame has seen no value — matching WindowExec's SUM/MIN/MAX).
      */
    def current: Any = kind match {
      case 0 =>
        if (!hasVal) null
        else if (isDecimal) {
          val d = dt.asInstanceOf[DecimalType]
          val out = Decimal(bd)
          // overflow: ANSI throws (like aggregate.Sum under ANSI),
          // non-ANSI returns null (like aggregate.Sum without it)
          if (out.changePrecision(d.precision, d.scale)) out
          else if (ansi) throw new ArithmeticException(
            s"running SUM overflowed ${d.simpleString} under ANSI mode " +
              s"(value $bd); disable spark.sql.ansi.enabled for " +
              "null-on-overflow semantics")
          else null
        } else java.lang.Long.valueOf(l)
      case 1 => java.lang.Long.valueOf(l)
      case _ => if (hasVal) mm else null
    }
  }
}

/** Plans a partitionless logical Window whose every expression is a
  * supported running shape (and whose input is not already bounded) as
  * [[GlobalRunningWindowExec]]. Unmatched windows fall through to the
  * built-in strategy unchanged.
  */
object GlobalRunningWindowStrategy extends SparkStrategy {
  import RunningWindow._

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case w: logical.Window
        if w.partitionSpec.isEmpty && w.orderSpec.nonEmpty &&
          w.windowExpressions.nonEmpty && !boundedInput(w.child) &&
          org.apache.spark.sql.internal.SQLConf.get
            .getConfString(EnabledKey, "true") == "true" =>
      val specs = w.windowExpressions.map(toSpec)
      // offset functions share an exec with the running shapes, but not
      // with RANGE-frame aggregates (the buffered tie-group path and the
      // lookahead queue would have to interleave) — that mix falls back
      val plannable = specs.forall(_.isDefined) && {
        val ss = specs.flatten
        !(ss.exists(_.isOffset) && ss.exists(_.needsGroupTotal))
      }
      if (plannable)
        // ANSI captured at PLANNING time: the exec's accumulators must
        // overflow the way the WindowExec it replaces would have
        GlobalRunningWindowExec(specs.flatten.toSeq, w.orderSpec,
          planLater(w.child),
          org.apache.spark.sql.internal.SQLConf.get.ansiEnabled) :: Nil
      else Nil
    case _ => Nil
  }
}
/** Per-partition pass-1 summary. Top-level on purpose — an inner class
  * would capture the exec node (and through it the whole non-serializable
  * physical plan) as `$outer`.
  *
  * `firstKey`/`lastKey` are copies of the projected order key of the
  * partition's first/last row (null when the partition is empty, or when
  * no spec needs tie groups). They exist because the required
  * `OrderedDistribution(orderSpec)` can legally be satisfied by a range
  * partitioning on a LONGER ordering whose prefix is `orderSpec` (Spark's
  * prefix rule — exactly what happens when two running windows with
  * nested orders stack), and then one tie group of THIS window's order
  * can straddle partition boundaries. Every tie-dependent value
  * (RANGE-frame aggregates, RANK/DENSE_RANK) is boundary-merged at the
  * driver from these summaries; row-positional values (ROWS frames,
  * ROW_NUMBER, NTILE) never care.
  *
  * Per agg spec, `totals` holds `Array(total)` for a ROWS frame and
  * `Array(exclTail, tail, lead)` for a RANGE frame (aggregates of: all
  * groups but the last, the last group, the first group).
  *
  * Per OFFSET spec (LEAD/LAG), `heads`/`tails` hold the partition's first/
  * last `offset` projected values — O(offset) scalars per partition, the
  * `joins.RangeLead` boundary discipline — so pass 2 resolves every
  * cross-partition offset from driver state, never another partition's
  * rows.
  */
private[plans] case class PartSummary(rows: Long, groups: Long,
    tailRows: Long, firstKey: UnsafeRow, lastKey: UnsafeRow,
    totals: Array[Array[Any]], heads: Array[Array[Any]],
    tails: Array[Array[Any]])

/** Distributed running-window execution: range exchange (declared, the
  * planner inserts it unless a compatible one exists) → per-partition
  * summaries → driver boundary-merge (O(partitions) scalars) → seeded
  * second pass. See [[RunningWindow]].
  */
case class GlobalRunningWindowExec(specs: Seq[RunningWindow.Spec],
    orderSpec: Seq[SortOrder], child: SparkPlan,
    ansi: Boolean) extends UnaryExecNode {
  import RunningWindow._

  override def output: Seq[Attribute] = child.output ++ specs.map(_.out)

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(OrderedDistribution(orderSpec))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(orderSpec)

  override def outputOrdering: Seq[SortOrder] = orderSpec

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def withNewChildInternal(
      newChild: SparkPlan): GlobalRunningWindowExec = copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val childRdd = child.execute()
    // cume_dist piggybacks on a HIDDEN RANGE-frame COUNT aggregate —
    // the (rows with key <= current) numerator, boundary-chain-correct
    // through the same machinery as any RANGE aggregate
    val cumePresent = specs.exists(_.kind == 15)
    val aggSpecs = (specs.filter(_.isAgg) ++ (if (cumePresent)
      Seq(RunningWindow.Spec(1, Literal(1), LongType, rowsFrame = false, 0,
        AttributeReference("__cume_count", LongType)())) else Nil)).toArray
    val cumeCountIdx = aggSpecs.length - 1 // valid iff cumePresent
    val allSpecs = specs.toArray
    val boundValues: Array[Expression] = aggSpecs
      .map(s => BindReferences.bindReference(s.value, childOutput))
    val aggKinds = aggSpecs.map(_.kind)
    val aggTypes = aggSpecs.map(_.resultType)
    val aggRangeFlags: Array[Boolean] = aggSpecs.map(_.needsGroupTotal)
    val rankPresent = allSpecs.exists(s =>
      s.kind == 11 || s.kind == 12 || s.kind == 14)
    val anyRange = aggRangeFlags.exists(identity)
    // tie groups matter iff some value depends on them
    val needGroups = anyRange || rankPresent
    // offset (LEAD/LAG) specs: boundary heads/tails + a lookahead queue
    val offSpecs = specs.filter(_.isOffset).toArray
    val anyOffset = offSpecs.nonEmpty
    require(!(anyOffset && anyRange),
      "offset specs cannot share an exec with RANGE-frame aggregates " +
        "(the strategy never plans that mix)")
    val boundOffVals: Array[Expression] = offSpecs
      .map(s => BindReferences.bindReference(s.value, childOutput))
    val offIsLead = offSpecs.map(_.kind == 20)
    val offOffsets = offSpecs.map(_.offset)
    val offDefaults: Array[Any] = offSpecs.map(_.default.eval(null))
    val maxLead = offSpecs.filter(_.kind == 20).map(_.offset)
      .foldLeft(0)(math.max)
    val boundOrder = orderSpec
      .map(so => so.copy(child =
        BindReferences.bindReference(so.child, childOutput)))
    val keyExprs: Seq[Expression] = boundOrder.map(_.child)

    val ansiMode = ansi
    def newAccs() = aggSpecs.map(s => new Acc(s.kind, s.resultType, ansiMode))

    // ---- pass 1: one tiny summary per partition ---------------------
    val summaries = childRdd.mapPartitionsWithIndex { (idx, it) =>
      val ordering: Ordering[InternalRow] =
        if (needGroups) new LazilyGeneratedOrdering(boundOrder) else null
      val keyProj =
        if (needGroups) UnsafeProjection.create(keyExprs) else null
      // per agg: ROWS → one running acc; RANGE → closed-groups acc +
      // current-group acc (+ the first group snapshotted when it closes)
      val accAll = newAccs()
      val accClosed = newAccs()
      var accCur = newAccs()
      var accLead: Array[Acc] = null
      var rows = 0L
      var groups = 0L
      var tailStartRow = 0L
      var firstKey: UnsafeRow = null
      var lastKeyRow: InternalRow = null
      var prev: InternalRow = null
      val headBufs = offSpecs.map(s =>
        new scala.collection.mutable.ArrayBuffer[Any](s.offset))
      val tailBufs = offSpecs.map(_ =>
        new scala.collection.mutable.ArrayDeque[Any]())
      while (it.hasNext) {
        val row = it.next()
        var o = 0
        while (o < offSpecs.length) {
          val lim = offOffsets(o)
          if (lim > 0) {
            // LEAD needs only the first `offset` values, LAG only the
            // last `offset` — never both for one spec
            if (offIsLead(o)) {
              if (headBufs(o).size < lim)
                headBufs(o) += copyVal(boundOffVals(o).eval(row))
            } else {
              tailBufs(o).append(copyVal(boundOffVals(o).eval(row)))
              if (tailBufs(o).size > lim) tailBufs(o).removeHead()
            }
          }
          o += 1
        }
        if (needGroups &&
            (prev == null || ordering.compare(prev, row) != 0)) {
          if (prev != null) { // close the current group
            if (accLead == null) accLead = accCur
            var i = 0
            while (i < accClosed.length) {
              accClosed(i).addTotal(accCur(i).total); i += 1
            }
            accCur = newAccs()
          }
          groups += 1L
          tailStartRow = rows
        }
        if (needGroups) {
          if (firstKey == null) firstKey = keyProj(row).copy()
          prev = row.copy()
        }
        rows += 1L
        var i = 0
        while (i < accAll.length) {
          val v = boundValues(i).eval(row)
          if (aggRangeFlags(i)) accCur(i).add(v) else accAll(i).add(v)
          i += 1
        }
      }
      if (needGroups && prev != null) lastKeyRow = keyProj(prev).copy()
      if (accLead == null) accLead = accCur // single (or zero) group
      val totals: Array[Array[Any]] = Array.tabulate(aggSpecs.length) { i =>
        if (aggRangeFlags(i))
          Array(accClosed(i).total, accCur(i).total, accLead(i).total)
        else Array(accAll(i).total)
      }
      Iterator.single((idx, PartSummary(rows, groups, rows - tailStartRow,
        firstKey, lastKeyRow.asInstanceOf[UnsafeRow], totals,
        headBufs.map(_.toArray), tailBufs.map(_.toArray))))
    }.collect().sortBy(_._1).map(_._2)

    // ---- driver boundary-merge --------------------------------------
    // Chains: a global tie group that spans partitions appears as a run
    // of adjacent nonempty partitions whose lastKey(prev) == firstKey(cur)
    // — the left end contributes its TAIL group, interior members are
    // single-group partitions contributing everything, the right end
    // contributes its LEAD group. All combines below are ⊕ (the agg's own
    // merge) — never subtraction, so MIN/MAX chain exactly like SUM.
    val n = summaries.length
    val keyOrd: Ordering[InternalRow] = if (needGroups) {
      val keyOrders = orderSpec.zipWithIndex.map { case (so, i) =>
        so.copy(child = BoundReference(i, so.child.dataType,
          so.child.nullable))
      }
      new LazilyGeneratedOrdering(keyOrders)
    } else null
    def nonempty(i: Int) = summaries(i).rows > 0L
    def prevNonempty(i: Int): Int = {
      var j = i - 1
      while (j >= 0 && !nonempty(j)) j -= 1
      j
    }
    def nextNonempty(i: Int): Int = {
      var j = i + 1
      while (j < n && !nonempty(j)) j += 1
      if (j < n) j else -1
    }
    val mergesLeft = Array.tabulate(n) { i =>
      needGroups && nonempty(i) && {
        val p = prevNonempty(i)
        p >= 0 && keyOrd.compare(summaries(p).lastKey,
          summaries(i).firstKey) == 0
      }
    }

    val startRows = new Array[Long](n)
    val startGroups = new Array[Long](n) // CG: global groups started < i
    val chainStartRow = new Array[Long](n) // global row idx of lead chain
    val rowsOffsetTotals = Array.ofDim[Any](n, aggSpecs.length) // ROWS aggs
    val rangeSeeds = Array.ofDim[Any](n, aggSpecs.length) // B ⊕ F_others
    val rangeTailExtra = Array.ofDim[Any](n, aggSpecs.length) // right chain

    // ROWS-frame offsets + row/group counters (single left-to-right scan)
    {
      val run = newAccs()
      var racc = 0L; var gacc = 0L; var lastChainStart = 0L
      var p = 0
      while (p < n) {
        val s = summaries(p)
        startRows(p) = racc
        // CG(p) = global groups started before p; a merged first local
        // group keeps this value in pass 2 (onGroupChange skips the
        // increment), a fresh group increments to CG(p)+1
        startGroups(p) = gacc
        chainStartRow(p) =
          if (mergesLeft(p)) lastChainStart else racc
        var i = 0
        while (i < aggSpecs.length) {
          if (!aggRangeFlags(i)) {
            rowsOffsetTotals(p)(i) = run(i).total
            run(i).addTotal(s.totals(i)(0))
          }
          i += 1
        }
        if (nonempty(p)) {
          lastChainStart =
            if (s.groups == 1L && mergesLeft(p)) lastChainStart
            else racc + s.rows - s.tailRows
        }
        racc += s.rows
        gacc += s.groups - (if (mergesLeft(p)) 1L else 0L)
        p += 1
      }
    }
    val totalRows = summaries.map(_.rows).sum

    // per partition, per offset spec: the `offset` values immediately
    // AFTER its last row (from later partitions' heads) and immediately
    // BEFORE its first row (from earlier partitions' tails) — O(n·offset)
    // driver scalars
    val nextVals = Array.ofDim[Array[Any]](n, offSpecs.length)
    val prevVals = Array.ofDim[Array[Any]](n, offSpecs.length)
    if (anyOffset) {
      var p = 0
      while (p < n) {
        var k = 0
        while (k < offSpecs.length) {
          val o = offOffsets(k)
          if (offIsLead(k)) {
            val buf = new scala.collection.mutable.ArrayBuffer[Any](o)
            var j = p + 1
            while (j < n && buf.size < o) {
              val h = summaries(j).heads(k)
              var i = 0
              while (i < h.length && buf.size < o) { buf += h(i); i += 1 }
              j += 1
            }
            nextVals(p)(k) = buf.toArray
          } else {
            // last o values before partition p, ascending
            val buf = new scala.collection.mutable.ArrayBuffer[Any](o)
            var j = p - 1
            while (j >= 0 && buf.size < o) {
              val t = summaries(j).tails(k)
              var i = t.length - 1
              while (i >= 0 && buf.size < o) { buf += t(i); i -= 1 }
              j -= 1
            }
            prevVals(p)(k) = buf.reverse.toArray
          }
          k += 1
        }
        p += 1
      }
    }

    // RANGE-frame seeds: for each partition, B (all rows in groups closed
    // strictly before its lead key) ⊕ the OTHER partitions' portions of
    // its lead chain; plus the right-side portions of its tail chain.
    if (anyRange) {
      val nAgg = aggSpecs.length
      // whole-partition total of a RANGE agg = exclTail ⊕ tail
      def combinedTotal(k: Int, s: PartSummary): Any = {
        val a = new Acc(aggKinds(k), aggTypes(k), ansiMode)
        a.addTotal(s.totals(k)(0)); a.addTotal(s.totals(k)(1))
        a.total
      }
      // prefixTotals(k)(p) = ⊕ over partitions t<p of whole totals
      // (snapshots are safe: totals are immutable boxed values)
      val prefixTotals = Array.ofDim[Any](nAgg, n + 1)
      locally {
        var k = 0
        while (k < nAgg) {
          if (aggRangeFlags(k)) {
            val a = new Acc(aggKinds(k), aggTypes(k), ansiMode)
            prefixTotals(k)(0) = a.total
            var p = 0
            while (p < n) {
              a.addTotal(combinedTotal(k, summaries(p)))
              p += 1
              prefixTotals(k)(p) = a.total
            }
          }
          k += 1
        }
      }
      // helpers over the chain structure (all walks are O(chain length);
      // total work across partitions is O(n) per direction)
      def leftPortions(i: Int, acc: Array[Acc]): Int = {
        // walk left through the chain, ⊕ members' portions; returns the
        // leftmost member
        var cur = i
        var p = prevNonempty(cur)
        while (mergesLeft(cur) && p >= 0) {
          val sp = summaries(p)
          var k = 0
          while (k < aggSpecs.length) {
            if (aggRangeFlags(k))
              acc(k).addTotal(
                if (sp.groups > 1L) sp.totals(k)(1) // tail only
                else combinedTotal(k, sp)) // whole partition
            k += 1
          }
          if (sp.groups > 1L) return p // chain starts inside p
          cur = p
          p = prevNonempty(cur)
        }
        cur
      }
      def rightPortions(i: Int, acc: Array[Acc]): Unit = {
        var cur = i
        var q = nextNonempty(cur)
        while (q >= 0 && mergesLeft(q)) {
          val sq = summaries(q)
          var k = 0
          while (k < aggSpecs.length) {
            if (aggRangeFlags(k))
              acc(k).addTotal(
                if (sq.groups == 1L) combinedTotal(k, sq)
                else sq.totals(k)(2)) // lead only
            k += 1
          }
          if (sq.groups > 1L) return // chain ends inside q
          cur = q
          q = nextNonempty(cur)
        }
      }
      var p = 0
      while (p < n) {
        val s = summaries(p)
        if (nonempty(p)) {
          // B ⊕ F_leadOthers, assembled without subtraction: walk to the
          // chain's leftmost member L; B = prefixTotals(<L) ⊕ exclTail(L
          // if the chain is L's tail); F_leadOthers = the walked portions
          val seedAcc = newAccs()
          val leftmost = leftPortions(p, seedAcc)
          var k = 0
          while (k < aggSpecs.length) {
            if (aggRangeFlags(k)) {
              seedAcc(k).addTotal(prefixTotals(k)(leftmost))
              if (leftmost != p && summaries(leftmost).groups > 1L)
                seedAcc(k).addTotal(summaries(leftmost).totals(k)(0))
            }
            k += 1
          }
          // right-side portions: part of the SEED when the partition is
          // one single group (its lead chain == tail chain), otherwise
          // a separate tail-extra applied to the final local group
          if (s.groups == 1L) rightPortions(p, seedAcc)
          else {
            val tailAcc = newAccs()
            rightPortions(p, tailAcc)
            var k2 = 0
            while (k2 < aggSpecs.length) {
              if (aggRangeFlags(k2)) rangeTailExtra(p)(k2) = tailAcc(k2).total
              k2 += 1
            }
          }
          var k3 = 0
          while (k3 < aggSpecs.length) {
            if (aggRangeFlags(k3)) rangeSeeds(p)(k3) = seedAcc(k3).total
            k3 += 1
          }
        }
        p += 1
      }
    }

    // ---- pass 2: seeded streaming emit -------------------------------
    val specKinds = allSpecs.map(_.kind)
    val specNtile = allSpecs.map(_.ntileBuckets)
    val aggIndexOf: Array[Int] = { // position of each agg spec in accs
      var j = -1
      allSpecs.map(s => if (s.isAgg) { j += 1; j } else -1)
    }
    val offIndexOf: Array[Int] = { // position of each offset spec
      var j = -1
      allSpecs.map(s => if (s.isOffset) { j += 1; j } else -1)
    }
    val nSpecs = allSpecs.length
    val outAttrs = specs.map(_.out)
    val outSchema = output
    val mergesLeftB = mergesLeft

    childRdd.mapPartitionsWithIndex { (idx, it) =>
      val accs = newAccs()
      var i = 0
      while (i < accs.length) {
        accs(i).addTotal(
          if (aggRangeFlags(i)) rangeSeeds(idx)(i)
          else rowsOffsetTotals(idx)(i))
        i += 1
      }
      val ordering: Ordering[InternalRow] =
        if (needGroups) new LazilyGeneratedOrdering(boundOrder) else null
      val extra = new GenericInternalRow(nSpecs)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outSchema, childOutput ++ outAttrs)
      var rowIdx = startRows(idx) // 0-based global index of next row
      var groupIdx = startGroups(idx) // global groups started so far
      var groupStart = chainStartRow(idx)
      var firstLocalGroup = true
      val leftMerged = mergesLeftB(idx)
      val tailExtra = rangeTailExtra(idx)

      def ntileOf(r0: Long, k: Int): Int = {
        val base = totalRows / k
        val rem = totalRows % k
        val cut = (base + 1L) * rem
        (if (r0 < cut) r0 / (base + 1L)
         else rem + (r0 - cut) / base).toInt + 1
      }

      def onGroupChange(): Unit = {
        if (firstLocalGroup && leftMerged) {
          // continuing the straddled chain: groupIdx/groupStart already
          // seeded to the chain's values — do not re-open the group
        } else {
          groupIdx += 1L
          groupStart = rowIdx
        }
        firstLocalGroup = false
      }

      // offset values for the row being emitted, filled by the queue path
      val offsetOut = new Array[Any](offSpecs.length)

      def emit(row: InternalRow): UnsafeRow = {
        var s = 0
        while (s < nSpecs) {
          specKinds(s) match {
            case 10 => extra.update(s, (rowIdx + 1L).toInt)
            case 11 => extra.update(s, (groupStart + 1L).toInt)
            case 12 => extra.update(s, groupIdx.toInt)
            case 13 => extra.update(s, ntileOf(rowIdx, specNtile(s)))
            case 14 => extra.update(s,
              if (totalRows > 1L)
                groupStart.toDouble / (totalRows - 1L).toDouble
              else 0.0)
            case 15 => extra.update(s,
              accs(cumeCountIdx).current.asInstanceOf[Long].toDouble /
                totalRows.toDouble)
            case 20 | 21 => extra.update(s, offsetOut(offIndexOf(s)))
            case _ => extra.update(s, accs(aggIndexOf(s)).current)
          }
          s += 1
        }
        val out = proj(joined(row, extra))
        rowIdx += 1L
        out
      }

      if (!anyRange && !anyOffset) {
        // streaming path: ROWS frames advance per row; rank/dense only
        // need the group START, known on first sight of a new key
        var prev: InternalRow = null
        it.map { row =>
          if (needGroups &&
              (prev == null || ordering.compare(prev, row) != 0)) {
            onGroupChange()
            prev = row.copy()
          }
          var i = 0
          while (i < accs.length) {
            accs(i).add(boundValues(i).eval(row)); i += 1
          }
          emit(row)
        }
      } else if (!anyRange) {
        // LOOKAHEAD-QUEUE path (offset specs present): rows are emitted
        // `maxLead` behind the read cursor so every LEAD resolves from
        // buffered copies; the partition tail drains against the driver's
        // nextVals, partition heads LAG against prevVals. All other
        // bookkeeping (accs, rank family) runs at EMIT time, so it sees
        // rows in order exactly as the streaming path does.
        val pNext = nextVals(idx)
        val pPrev = prevVals(idx)
        new Iterator[UnsafeRow] {
          private val buf = new scala.collection.mutable.ArrayDeque[InternalRow]
          // per LAG spec: values of recently-emitted rows (≤ offset)
          private val lagPast = offSpecs.map(s =>
            new scala.collection.mutable.ArrayDeque[Any]())
          private var emittedLocal = 0L // local index of next emit
          private var prev: InternalRow = null

          override def hasNext: Boolean = buf.nonEmpty || it.hasNext

          override def next(): UnsafeRow = {
            while (it.hasNext && buf.size <= maxLead)
              buf.append(it.next().copy())
            val head = buf.removeHead()
            var k = 0
            while (k < offSpecs.length) {
              val o = offOffsets(k)
              offsetOut(k) =
                if (o == 0) boundOffVals(k).eval(head)
                else if (offIsLead(k)) {
                  if (o <= buf.size) boundOffVals(k).eval(buf(o - 1))
                  else {
                    val i2 = o - buf.size - 1
                    if (i2 < pNext(k).length) pNext(k)(i2)
                    else offDefaults(k)
                  }
                } else {
                  val past = lagPast(k)
                  if (past.size >= o) past(past.size - o)
                  else {
                    val pos = pPrev(k).length - (o - emittedLocal).toInt
                    if (emittedLocal < o && pos >= 0) pPrev(k)(pos)
                    else offDefaults(k)
                  }
                }
              k += 1
            }
            if (needGroups &&
                (prev == null || ordering.compare(prev, head) != 0)) {
              onGroupChange()
              prev = head // already a detached copy
            }
            var i = 0
            while (i < accs.length) {
              accs(i).add(boundValues(i).eval(head)); i += 1
            }
            val out = emit(head)
            emittedLocal += 1L
            var k2 = 0
            while (k2 < offSpecs.length) {
              if (!offIsLead(k2) && offOffsets(k2) > 0) {
                lagPast(k2).append(copyVal(boundOffVals(k2).eval(head)))
                if (lagPast(k2).size > offOffsets(k2))
                  lagPast(k2).removeHead()
              }
              k2 += 1
            }
            out
          }
        }
      } else {
        // RANGE frames: every row of a tie group reports the whole
        // group's aggregate — buffer one group at a time (ties are
        // contiguous in the global order; an all-ties input degrades to
        // one buffer, the same degenerate case the single-partition plan
        // already was)
        new Iterator[UnsafeRow] {
          private val buf = new scala.collection.mutable.ArrayBuffer[InternalRow]
          private var pending: InternalRow = null
          private var pos = 0

          private def fillGroup(): Unit = {
            buf.clear(); pos = 0
            if (pending == null && it.hasNext) pending = it.next().copy()
            if (pending == null) return
            buf += pending
            pending = null
            var done = false
            while (!done && it.hasNext) {
              val row = it.next()
              if (ordering.compare(buf.head, row) == 0) buf += row.copy()
              else { pending = row.copy(); done = true }
            }
            onGroupChange()
            // group-complete values for RANGE accs; ROWS accs advance in
            // next()
            var r = 0
            while (r < buf.length) {
              var i = 0
              while (i < accs.length) {
                if (aggRangeFlags(i))
                  accs(i).add(boundValues(i).eval(buf(r)))
                i += 1
              }
              r += 1
            }
            // final local group of a right-straddled tail chain: fold in
            // the later partitions' portions so every row of the group
            // reports the FULL group aggregate
            if (pending == null && !it.hasNext) {
              var i = 0
              while (i < accs.length) {
                if (aggRangeFlags(i) && tailExtra(i) != null)
                  accs(i).addTotal(tailExtra(i))
                i += 1
              }
            }
          }

          override def hasNext: Boolean =
            pos < buf.length || pending != null || it.hasNext

          override def next(): UnsafeRow = {
            if (pos >= buf.length) fillGroup()
            val row = buf(pos); pos += 1
            var i = 0
            while (i < accs.length) {
              if (!aggRangeFlags(i))
                accs(i).add(boundValues(i).eval(row))
              i += 1
            }
            emit(row)
          }
        }
      }
    }
  }
}
