package graft.expr

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Per-step candidate frontier for greedy first-after chain matching.
  *
  * Sufficient statistic: for each step k the sorted set of event times that
  * could still be the final matched time `m_k`. The final chain is
  *   m_0 = min(step-0 times),  m_k = min(step-k times strictly after m_(k-1))
  * and every m_k is NON-INCREASING as more data accumulates (a new step-j
  * event can only lower m_j, and lowering m_(k-1) only loosens step k's
  * "strictly after" constraint). That monotonicity is what makes the state
  * prunable: the chain computed on the data seen SO FAR is an upper bound
  * M_k of the final m_k, so any step-k candidate strictly above
  * cap_k = min{ s in S_k : s > M_(k-1) } can never win — it is dominated by
  * cap_k for every possible final m_(k-1) <= M_(k-1). S_0 needs only its
  * minimum.
  *
  * Size: O(steps) when groups match early (the common case — everything
  * after the frontier is dropped on arrival); degrades toward the set of
  * distinct candidate times only when a step's predecessor has not matched
  * yet (e.g. a partial aggregate holding millions of step-1 events and no
  * step-0 event). That residual is the information-theoretic floor for ANY
  * commutative-merge formulation: a later partial may reveal a step-0 event
  * at any time x, and the answer must then be each step's successor of x.
  */
private[graft] final class ChainState(val sets: Array[java.util.TreeSet[java.lang.Long]]) {

  def add(k: Int, t: Long): Unit =
    if (k == 0) {
      val s0 = sets(0)
      if (s0.isEmpty || t < s0.first) { s0.clear(); s0.add(t) }
    } else sets(k).add(t)

  /** Re-derive the upper-bound chain and drop dominated candidates. Caps
    * only move down over time, so pruning is monotone-safe. */
  def prune(): Unit = {
    var prev: java.lang.Long = if (sets(0).isEmpty) null else sets(0).first
    var k = 1
    while (k < sets.length && prev != null) {
      val cap = sets(k).higher(prev)
      if (cap != null) sets(k).tailSet(cap, false).clear()
      prev = cap
      k += 1
    }
    // prev == null: steps at and beyond k have no matched upper bound yet,
    // so their candidate sets cannot be pruned (any of them may become the
    // successor of a yet-unseen earlier match)
  }

  def mergeFrom(other: ChainState): Unit = {
    var k = 0
    while (k < sets.length) {
      if (k == 0) { if (!other.sets(0).isEmpty) add(0, other.sets(0).first) }
      else sets(k).addAll(other.sets(k))
      k += 1
    }
    prune()
  }

  /** Final chain walk: m_0 = min S_0, m_k = least step-k time > m_(k-1). */
  def chain(): Array[Any] = {
    val out = new Array[Any](sets.length)
    var prev: java.lang.Long = if (sets(0).isEmpty) null else sets(0).first
    out(0) = prev
    var k = 1
    while (k < sets.length) {
      prev = if (prev == null) null else sets(k).higher(prev)
      out(k) = prev
      k += 1
    }
    out
  }
}

/** `greedy_chain(t, mask, numSteps)` — aggregate computing the greedy
  * first-strictly-after step chain over a group's events in ONE pass with
  * bounded (frontier-sized) state: the match_steps journey without the
  * journey string. Input `t` is the event timestamp, `mask` a bitmask of
  * which steps the event satisfies (bit k = step k). Returns
  * `array<timestamp>` of length `numSteps` with the matched time per step
  * (null once the chain breaks).
  *
  * Replaces both the reference's per-group journey-hash STRING_AGG (whose
  * Redshift LISTAGG 64KB failure, reference match_steps.py:682-693, shows
  * the unbounded-state wall) and the earlier chain of K dependent window
  * aggregates, each of which buffered every group's full event list K
  * times through WindowExec's spill array. As a hash aggregate it combines
  * map-side, so the shuffle moves frontier-sized state, not events.
  */
case class GreedyChain(
    timeChild: Expression,
    maskChild: Expression,
    numSteps: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ChainState] {

  require(numSteps >= 1 && numSteps <= 62,
    s"greedy_chain supports 1..62 steps, got $numSteps")

  override def children: Seq[Expression] = Seq(timeChild, maskChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(TimestampType, containsNull = true)
  override def prettyName: String = "greedy_chain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (timeChild.dataType != TimestampType)
      TypeCheckResult.TypeCheckFailure(
        s"greedy_chain time argument must be timestamp, got ${timeChild.dataType.simpleString}")
    else if (maskChild.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"greedy_chain mask argument must be bigint, got ${maskChild.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): ChainState =
    new ChainState(Array.fill(numSteps)(new java.util.TreeSet[java.lang.Long]()))

  override def update(buffer: ChainState, input: InternalRow): ChainState = {
    val tv = timeChild.eval(input)
    val mv = maskChild.eval(input)
    if (tv != null && mv != null) {
      val t = tv.asInstanceOf[Long]
      val mask = mv.asInstanceOf[Long]
      if (mask != 0L) {
        var k = 0
        while (k < numSteps) {
          if ((mask & (1L << k)) != 0L) buffer.add(k, t)
          k += 1
        }
        buffer.prune()
      }
    }
    buffer
  }

  override def merge(buffer: ChainState, input: ChainState): ChainState = {
    buffer.mergeFrom(input)
    buffer
  }

  override def eval(buffer: ChainState): Any = new GenericArrayData(buffer.chain())

  override def serialize(buffer: ChainState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.sets.length)
    buffer.sets.foreach { s =>
      out.writeInt(s.size)
      val it = s.iterator()
      while (it.hasNext) out.writeLong(it.next())
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ChainState = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val sets = Array.fill(n)(new java.util.TreeSet[java.lang.Long]())
    var k = 0
    while (k < n) {
      var c = in.readInt()
      while (c > 0) { sets(k).add(in.readLong()); c -= 1 }
      k += 1
    }
    new ChainState(sets)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GreedyChain =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GreedyChain =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(timeChild = newChildren(0), maskChild = newChildren(1))
}
