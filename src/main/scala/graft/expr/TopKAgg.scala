package graft.expr

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k state: a TreeSet under the exact window order
  * (score desc NULLS LAST, id asc), trimmed to k after every insert.
  *
  * Entries carry an explicit null-score flag so NULL scores order after
  * every real score (the window's `DESC NULLS LAST`) yet still emit as
  * NULL — they matter only when a group holds fewer than k real-scored
  * rows, and faithfulness there is what lets [[TopKBy]] replace a
  * row_number window VALUE-IDENTICALLY. Score comparison is
  * `java.lang.Double.compare` (Spark's total order: NaN greatest, so a
  * NaN score ranks FIRST under desc — identical to the window sort).
  * Ids must be unique within a group (the serving tails guarantee it: a
  * posting appears in exactly one cell); a duplicate (score, id) insert
  * collapses, keeping the deterministic tag winner (non-null, then
  * larger) so a broken-invariant caller still gets merge-order-stable
  * output.
  *
  * Top-k is a semilattice: merging two k-bounded states loses nothing
  * (any row outside a partial's top-k is outside the union's), so ANY
  * merge tree + serialize round-trip yields the same final set — the
  * property PropertySpec drives with random merge orders. */
private[graft] final case class TopKEntry(score: Double, scoreNull: Boolean,
    id: Long, tag: Long, tagNull: Boolean)

private[graft] object TopKEntry {
  /** The exact window order: score desc NULLS LAST (Double.compare total
    * order: NaN greatest ⇒ first under desc), then id asc. */
  val ord: java.util.Comparator[TopKEntry] = new java.util.Comparator[TopKEntry] {
    override def compare(a: TopKEntry, b: TopKEntry): Int = {
      if (a.scoreNull != b.scoreNull) { if (a.scoreNull) 1 else -1 }
      else {
        val c = if (a.scoreNull) 0 else java.lang.Double.compare(b.score, a.score)
        if (c != 0) c else java.lang.Long.compare(a.id, b.id)
      }
    }
  }
}

private[graft] final class TopKState(val k: Int) {

  val set = new java.util.TreeSet[TopKEntry](TopKEntry.ord)

  def add(e: TopKEntry): Unit = {
    if (!set.add(e)) {
      // (score, id) collision: callers guarantee ids unique per group, so
      // this should only be an exact re-insert — but if that invariant is
      // ever broken with DIFFERING tags, pick the winner deterministically
      // (non-null beats null, then larger tag) instead of letting merge
      // order decide which tag survives across retries/partitionings
      val ex = set.floor(e)
      val replace = (ex.tagNull && !e.tagNull) ||
        (!ex.tagNull && !e.tagNull && e.tag > ex.tag)
      if (replace) { set.remove(ex); set.add(e) }
    }
    if (set.size > k) set.pollLast()
  }

  def mergeFrom(other: TopKState): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) add(it.next())
  }
}

/** `topk_by(score, id, tag, k)` — the group's top-k rows by
  * (score desc NULLS LAST, id asc) as `array<struct<score double,
  * id bigint, tag bigint>>` in rank order, computed with k-bounded state.
  *
  * The row_number-window formulation (`rank <= k` after
  * `row_number over (partition by g order by score desc, id)`) buffers
  * and SORTS every group's full candidate set on the reducer — at IVF
  * serving scale that is the probed cells' postings per query. As a hash
  * aggregate this combines map-side: each mapper ships at most k entries
  * per group, the reducer merges k-bounded states, nothing sorts more
  * than 2k rows at a time. Value-identity with the window cut is
  * spec-pinned (including NULL scores, NaN, and the k boundary), which
  * is what lets the serving tails swap formulations without touching
  * their oracles. Ids must be unique per group; `tag` carries one
  * payload column (a label, a cell id) through the cut — NULL-able. */
case class TopKBy(
    scoreChild: Expression,
    idChild: Expression,
    tagChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKState] {

  require(k >= 1 && k <= 1000000, s"topk_by supports k in [1, 1e6], got $k")

  override def children: Seq[Expression] = Seq(scoreChild, idChild, tagChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = true),
    StructField("id", LongType, nullable = false),
    StructField("tag", LongType, nullable = true))), containsNull = false)
  override def prettyName: String = "topk_by"

  override def checkInputDataTypes(): TypeCheckResult =
    if (scoreChild.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_by score must be double, got ${scoreChild.dataType.simpleString}")
    else if (idChild.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_by id must be bigint, got ${idChild.dataType.simpleString}")
    else if (tagChild.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_by tag must be bigint, got ${tagChild.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): TopKState = new TopKState(k)

  override def update(buffer: TopKState, input: InternalRow): TopKState = {
    val idv = idChild.eval(input)
    // a NULL id cannot rank (the window's id tie-break is NULL-hostile
    // and the serving tails never produce one) — dropped
    if (idv != null) {
      val sv = scoreChild.eval(input)
      val tv = tagChild.eval(input)
      buffer.add(TopKEntry(
        if (sv == null) 0.0 else sv.asInstanceOf[Double], sv == null,
        idv.asInstanceOf[Long],
        if (tv == null) 0L else tv.asInstanceOf[Long], tv == null))
    }
    buffer
  }

  override def merge(buffer: TopKState, input: TopKState): TopKState = {
    buffer.mergeFrom(input)
    buffer
  }

  override def eval(buffer: TopKState): Any = {
    val out = new Array[Any](buffer.set.size)
    val it = buffer.set.iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = InternalRow(
        if (e.scoreNull) null else e.score,
        e.id,
        if (e.tagNull) null else e.tag)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: TopKState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.k)
    out.writeInt(buffer.set.size)
    val it = buffer.set.iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeBoolean(e.scoreNull)
      out.writeDouble(e.score)
      out.writeLong(e.id)
      out.writeBoolean(e.tagNull)
      out.writeLong(e.tag)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKState = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val st = new TopKState(in.readInt())
    var c = in.readInt()
    while (c > 0) {
      val sn = in.readBoolean()
      val s = in.readDouble()
      val id = in.readLong()
      val tn = in.readBoolean()
      val t = in.readLong()
      st.add(TopKEntry(s, sn, id, t, tn))
      c -= 1
    }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreChild = newChildren(0), idChild = newChildren(1),
      tagChild = newChildren(2))
}
