package graft.expr

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary over whitespace tokens.
  *
  * Classic guarantee (Misra & Gries 1982; merge rule from Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): a summary of `width` counters,
  * updated per token and merged across partitions in ANY order, retains
  * EVERY token whose true corpus frequency exceeds n/(width+1), where n is
  * the total token count. Each surviving counter is a lower bound on the
  * true count, undercounting by at most n/(width+1).
  *
  * State is O(width) regardless of corpus size — this is the pass-1
  * candidate generator for exact distributed top-k ([[graft.llm.Search
  * .heavyHitters]]): at 100 TB the alternative (groupBy every distinct
  * token) shuffles a vocabulary-sized table; this aggregate ships
  * `width` counters per partition and no token row ever crosses the wire.
  *
  * Update rule per token: present → +1; room → insert at 1; full →
  * decrement ALL counters by 1, dropping zeros (the O(width) sweep is
  * amortized: each sweep pays one decrement per counter and removes at
  * least one, so total work is O(tokens + sweeps*width) with
  * sweeps <= tokens/(width+1)). Merge rule: sum counts pairwise, then if
  * more than `width` survive, subtract the (width+1)-th largest count
  * from all and drop non-positives — the error bounds ADD across merges,
  * preserving the n/(width+1) global guarantee under any merge tree.
  *
  * Tokenization matches [[graft.llm.TextOps.tokens]] (trim + split on
  * `\s+`, empty string -> no tokens); candidate-set membership only needs
  * to be a SUPERSET of the true heavy hitters, so pass-2 recount defines
  * all user-visible values (PropertySpec drives MgState directly with
  * random merge trees, the ChainState pattern).
  */
private[graft] final class MgState(val width: Int) {
  val counts = new mutable.HashMap[String, Long]()

  def addToken(tok: String): Unit = {
    counts.get(tok) match {
      case Some(c) => counts.update(tok, c + 1L)
      case None =>
        if (counts.size < width) counts.update(tok, 1L)
        else {
          // decrement-all sweep: the classic MG eviction
          val dead = mutable.ArrayBuffer[String]()
          val it = counts.iterator
          while (it.hasNext) {
            val (k, c) = it.next()
            if (c <= 1L) dead += k else counts.update(k, c - 1L)
          }
          dead.foreach(counts.remove)
        }
    }
  }

  def addText(text: String): Unit = {
    val t = text.trim
    if (t.nonEmpty) {
      var i = 0
      val n = t.length
      while (i < n) {
        var j = i
        while (j < n && !Character.isWhitespace(t.charAt(j))) j += 1
        if (j > i) addToken(t.substring(i, j))
        i = j
        while (i < n && Character.isWhitespace(t.charAt(i))) i += 1
      }
    }
  }

  def mergeFrom(other: MgState): Unit = {
    other.counts.foreach { case (k, c) =>
      counts.update(k, counts.getOrElse(k, 0L) + c)
    }
    if (counts.size > width) {
      // subtract the (width+1)-th largest count from everything
      val vals = counts.values.toArray
      java.util.Arrays.sort(vals)
      val thresh = vals(vals.length - width - 1)
      val dead = mutable.ArrayBuffer[String]()
      val it = counts.iterator
      while (it.hasNext) {
        val (k, c) = it.next()
        if (c <= thresh) dead += k else counts.update(k, c - thresh)
      }
      dead.foreach(counts.remove)
    }
  }
}

/** `mg_summary(text, width)` — aggregate returning `map<string,bigint>` of
  * Misra-Gries candidate tokens with lower-bound counts. See [[MgState]].
  */
case class MgSummary(
    textChild: Expression,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgState] {

  require(width >= 1 && width <= (1 << 20),
    s"mg_summary width must be in [1, 2^20], got $width")

  override def children: Seq[Expression] = Seq(textChild)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "mg_summary"

  override def checkInputDataTypes(): TypeCheckResult =
    if (textChild.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"mg_summary text argument must be string, got ${textChild.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): MgState = new MgState(width)

  override def update(buffer: MgState, input: InternalRow): MgState = {
    val tv = textChild.eval(input)
    if (tv != null) buffer.addText(tv.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: MgState, input: MgState): MgState = {
    buffer.mergeFrom(input)
    buffer
  }

  override def eval(buffer: MgState): Any = {
    // deterministic key order so repeated evals are stable
    val entries = buffer.counts.toArray.sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._1): Any)),
      new GenericArrayData(entries.map(e => e._2: Any)))
  }

  override def serialize(buffer: MgState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.width)
    out.writeInt(buffer.counts.size)
    buffer.counts.foreach { case (k, c) =>
      val b = k.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgState = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val st = new MgState(in.readInt())
    var n = in.readInt()
    while (n > 0) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      st.counts.update(new String(b, StandardCharsets.UTF_8), in.readLong())
      n -= 1
    }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgSummary =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgSummary =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(textChild = newChildren(0))
}
