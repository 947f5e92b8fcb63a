package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Character-bigram language model over the 27-symbol alphabet
  * (space, a..z) — the model behind the CCNet-style perplexity quality
  * filter (graft.llm.LangModel). Text is expected PRE-NORMALIZED
  * (`lower` + `[^a-z]+`→single space + trim), so every adjacent character
  * pair is a model bigram.
  *
  * Layout discipline shared by training, serving, and the DuckDB oracle:
  * slot(c1, c2) = idx(c1)·27 + idx(c2) with idx(' ') = 0, idx('a') = 1 …
  * idx('z') = 26. Ascending slot order IS ascending binary order of the
  * 2-char bigram strings (0x20 < 0x61..0x7a), so a fold over slots
  * replays bit-for-bit as a fold over `ORDER BY bigram` — the same
  * sorted-fold determinism contract as [[TextEntropy]].
  */
object BigramLm {
  val V = 27
  val Slots: Int = V * V

  def charIdx(c: Char): Int =
    if (c == ' ') 0
    else if (c >= 'a' && c <= 'z') c - 'a' + 1
    else -1

  def bigramOf(slot: Int): String = {
    def ch(i: Int): Char = if (i == 0) ' ' else ('a' + (i - 1)).toChar
    new String(Array(ch(slot / V), ch(slot % V)))
  }

  def slotOf(b: String): Int = {
    val a = charIdx(b.charAt(0)); val c = charIdx(b.charAt(1))
    require(a >= 0 && c >= 0, s"not an alphabet bigram: '$b'")
    a * V + c
  }

  /** Dense 729-double model → big-endian bytes (a foldable plan literal,
    * ~5.7 KB — broadcast with the plan like the PQ lookup tables). */
  def encode(model: Array[Double]): Array[Byte] = {
    require(model.length == Slots, s"model must have $Slots slots")
    val buf = java.nio.ByteBuffer.allocate(Slots * 8)
    model.foreach(buf.putDouble)
    buf.array()
  }

  def decode(bytes: Array[Byte]): Array[Double] = {
    require(bytes.length == Slots * 8, "corrupt bigram-LM model literal")
    val buf = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(Slots)(buf.getDouble)
  }

  /** Per-document bigram histogram as map<bigram, count>. Bounded at 729
    * entries regardless of document length — the property that makes the
    * TRAINING explode vocabulary-sized, never corpus-character-sized. */
  def bigramCounts(text: UTF8String): MapData = {
    val s = text.toString
    val counts = new Array[Int](Slots)
    var i = 0
    while (i < s.length - 1) {
      val a = charIdx(s.charAt(i)); val b = charIdx(s.charAt(i + 1))
      if (a >= 0 && b >= 0) counts(a * V + b) += 1
      i += 1
    }
    val keys = Array.newBuilder[Any]
    val vals = Array.newBuilder[Any]
    var slot = 0
    while (slot < Slots) {
      if (counts(slot) > 0) {
        keys += UTF8String.fromString(bigramOf(slot))
        vals += counts(slot)
      }
      slot += 1
    }
    new ArrayBasedMapData(
      new GenericArrayData(keys.result()), new GenericArrayData(vals.result()))
  }

  /** Average negative log2 model probability per bigram ("bits per
    * bigram"): count the document's bigrams, then fold
    * count·log2(p) terms in ascending slot (= sorted bigram) order with a
    * 0.0 seed — every term is strictly negative (p < 1 always under
    * add-α smoothing), so the oracle's first-element-seeded fold is
    * IEEE-identical. Documents with no bigram (len < 2) score 0.0. */
  def bits(text: UTF8String, model: Array[Double]): Double = {
    val s = text.toString
    val counts = new Array[Int](Slots)
    var n = 0
    var i = 0
    while (i < s.length - 1) {
      val a = charIdx(s.charAt(i)); val b = charIdx(s.charAt(i + 1))
      if (a >= 0 && b >= 0) { counts(a * V + b) += 1; n += 1 }
      i += 1
    }
    if (n == 0) return 0.0
    var acc = 0.0
    var slot = 0
    while (slot < Slots) {
      if (counts(slot) > 0) acc += counts(slot) * model(slot)
      slot += 1
    }
    java.math.BigDecimal.valueOf(-acc / n + 0.0)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }
}

/** `char_bigram_counts(text)` → map<string,int> — see
  * [[BigramLm.bigramCounts]]. */
case class CharBigramCounts(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_bigram_counts expects a string, got ${child.dataType.simpleString}")
  override def dataType: DataType =
    MapType(StringType, IntegerType, valueContainsNull = false)
  override def prettyName: String = "char_bigram_counts"

  override def nullSafeEval(input: Any): Any =
    BigramLm.bigramCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.BigramLm.bigramCounts($c)")

  override protected def withNewChildInternal(newChild: Expression): CharBigramCounts =
    copy(child = newChild)
}

/** `lm_bits(text, model_bytes)` — per-row bigram-LM scoring against a
  * dense model frozen into the plan as a binary literal (the same
  * freeze-tiny-model-into-the-plan shape as `bloom_any_contain` and the
  * PQ codebook lookups: zero serve-time joins or shuffles). */
case class LmBits(text: Expression, model: Expression)
    extends BinaryExpression {
  override def left: Expression = text
  override def right: Expression = model
  override def dataType: DataType = DoubleType
  override def prettyName: String = "lm_bits"

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"lm_bits text argument must be string, got ${text.dataType.simpleString}")
    else if (model.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"lm_bits model argument must be binary, got ${model.dataType.simpleString}")
    else if (!model.foldable)
      TypeCheckResult.TypeCheckFailure(
        "lm_bits model argument must be a literal (the encoded model)")
    else TypeCheckResult.TypeCheckSuccess

  /** Decoded once per task from the plan literal. */
  @transient private lazy val table: Array[Double] = {
    val bytes = model.eval(null).asInstanceOf[Array[Byte]]
    BigramLm.decode(bytes)
  }

  def score(t: UTF8String): Double = BigramLm.bits(t, table)

  override def nullSafeEval(t: Any, m: Any): Any =
    score(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("lmBits", this, classOf[LmBits].getName)
    nullSafeCodeGen(ctx, ev, (t, _) => s"${ev.value} = $self.score($t);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LmBits =
    copy(text = newLeft, model = newRight)
}
