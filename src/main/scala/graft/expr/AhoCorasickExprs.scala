package graft.expr

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Classic Aho–Corasick automaton (goto/fail with aggregated output
  * counts): matches EVERY dictionary phrase at every position of one text
  * scan — O(text + matches) regardless of dictionary size, where the
  * regex-chain alternative pays one pass PER phrase. The blocklist /
  * keyword-hit primitive of web-corpus filtering at 10k+ phrase scale.
  *
  * Counting semantics: one hit per (position, dictionary entry) —
  * overlapping matches all count, duplicate entries count separately
  * (callers pass distinct dictionaries). The DuckDB oracle replays the
  * identical value as Σ_kw |{ i : substr(text, i, len(kw)) = kw }|.
  */
final class AcAutomaton(phrases: Seq[String]) {
  // nodes as growable parallel arrays; children in per-node hash maps
  private val children = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
  private val fail = mutable.ArrayBuffer(0)
  private val ends = mutable.ArrayBuffer(0L) // dict entries ending here
  private val out = mutable.ArrayBuffer(0L)  // ends + out(fail), after build

  phrases.foreach { p =>
    require(p.nonEmpty, "ac dictionary entries must be non-empty")
    var n = 0
    p.foreach { ch =>
      n = children(n).getOrElseUpdate(ch, {
        children += mutable.Map.empty[Char, Int]
        fail += 0; ends += 0L; out += 0L
        children.size - 1
      })
    }
    ends(n) += 1L
  }
  // BFS fail links; out(n) = ends(n) + out(fail(n))
  private val queue = mutable.Queue.empty[Int]
  children(0).values.foreach { c => fail(c) = 0; queue += c }
  while (queue.nonEmpty) {
    val n = queue.dequeue()
    out(n) = ends(n) + out(fail(n))
    children(n).foreach { case (ch, c) =>
      var f = fail(n)
      while (f != 0 && !children(f).contains(ch)) f = fail(f)
      fail(c) = if (children(f).contains(ch) && children(f)(ch) != c)
        children(f)(ch) else 0
      queue += c
    }
  }
  out(0) = ends(0)

  /** Total matches of any phrase in `text` (one scan). */
  def count(text: String): Long = {
    var state = 0
    var total = 0L
    var i = 0
    val n = text.length
    while (i < n) {
      val ch = text.charAt(i)
      while (state != 0 && !children(state).contains(ch)) state = fail(state)
      state = children(state).getOrElse(ch, 0)
      total += out(state)
      i += 1
    }
    total
  }
}

/** `ac_count(text, dict)` — total Aho–Corasick matches of the literal
  * string-array dictionary in `text`. The automaton builds once per task
  * from the plan literal (the LmBits pattern); the scan is one pass. */
case class AcCount(text: Expression, dict: Expression)
    extends BinaryExpression {
  override def left: Expression = text
  override def right: Expression = dict
  override def dataType: DataType = LongType
  override def prettyName: String = "ac_count"

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"ac_count text argument must be string, got ${text.dataType.simpleString}")
    else if (!dict.dataType.isInstanceOf[ArrayType] ||
      dict.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"ac_count dict argument must be array<string>, got ${dict.dataType.simpleString}")
    else if (!dict.foldable)
      TypeCheckResult.TypeCheckFailure(
        "ac_count dict argument must be a literal array (the dictionary)")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val automaton: AcAutomaton = {
    val arr = dict.eval(null).asInstanceOf[ArrayData]
    new AcAutomaton((0 until arr.numElements())
      .map(i => arr.getUTF8String(i).toString))
  }

  def score(t: UTF8String): Long = automaton.count(t.toString)

  override def nullSafeEval(t: Any, d: Any): Any =
    score(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("acCount", this, classOf[AcCount].getName)
    nullSafeCodeGen(ctx, ev, (t, _) => s"${ev.value} = $self.score($t);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AcCount =
    copy(text = newLeft, dict = newRight)
}
