package graft.expr

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Encoded jusText-lite parameters: knobs + the stopword set, frozen into
  * the plan as a binary literal (the UnigramModel/WordpieceModel
  * plan-literal pattern — zero joins at classification time). */
object BoilerplateModel {
  def encode(
      stopwords: Seq[String],
      minWords: Int,
      minStopPct: Int,
      longLineChars: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(minWords)
    out.writeInt(minStopPct)
    out.writeInt(longLineChars)
    out.writeInt(stopwords.size)
    stopwords.foreach { w =>
      val b = w.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  final class Decoded(
      val stopwords: java.util.HashSet[String],
      val minWords: Int,
      val minStopPct: Int,
      val longLineChars: Int)

  def decode(bytes: Array[Byte]): Decoded = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val mw = in.readInt(); val pct = in.readInt(); val llc = in.readInt()
    val n = in.readInt()
    val set = new java.util.HashSet[String](n * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      set.add(new String(b, StandardCharsets.UTF_8))
      i += 1
    }
    new Decoded(set, mw, pct, llc)
  }

  /** Strip leading/trailing SPACES only — Spark `trim` semantics
    * (0x20; Java's String.trim also eats control chars and would
    * diverge). */
  private def trimSpaces(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s.substring(a, b)
  }

  /** One pass of the jusText-lite classification — value-identical to
    * the HOF formulation (TextOps.boilerplateLinesHof, the spec-pinned
    * anchor) but each line tokenizes ONCE instead of three times, in
    * plain JVM code instead of interpreted CodegenFallback lambdas. */
  def strip(text: UTF8String, m: Decoded): InternalRow = {
    val lines = text.toString.split("\n", -1) // -1: keep trailing empties
    val keep = new java.lang.StringBuilder
    var nContent = 0
    var li = 0
    while (li < lines.length) {
      val trimmed = trimSpaces(lines(li))
      // tokens of the lowercased trimmed line, empty tokens dropped —
      // the split('\s+') + filter(t <> '') HOF chain in one pass
      // Locale.ROOT pins the mapping: Spark's lower() is locale-independent
      // (UTF8String), and a default-locale toLowerCase would diverge on e.g.
      // a Turkish JVM ('I' -> dotless ı), breaking native≡HOF≡oracle identity
      val toks = trimmed.toLowerCase(java.util.Locale.ROOT).split("\\s+")
      var nw = 0
      var stops = 0
      var t = 0
      while (t < toks.length) {
        if (toks(t).nonEmpty) {
          nw += 1
          if (m.stopwords.contains(toks(t))) stops += 1
        }
        t += 1
      }
      val lineChars = trimmed.codePointCount(0, trimmed.length)
      val content = nw >= m.minWords &&
        (100 * stops >= m.minStopPct * nw || lineChars >= m.longLineChars)
      if (content) {
        if (nContent > 0) keep.append('\n')
        keep.append(lines(li))
        nContent += 1
      }
      li += 1
    }
    val nLines = lines.length
    val frac = java.math.BigDecimal
      .valueOf(1.0 - nContent.toDouble / nLines.toDouble)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(keep.toString), nLines.toLong, nContent.toLong,
      frac))
  }
}

/** `boilerplate_strip(text, model)` — the codegen'd jusText-lite line
  * classifier (see [[BoilerplateModel.strip]]); `model` must be a
  * LITERAL binary. Returns the (clean, n_lines, n_content,
  * boilerplate_frac) struct. */
case class BoilerplateStripExpr(text: Expression, model: Expression)
    extends BinaryExpression {
  override def left: Expression = text
  override def right: Expression = model
  override def dataType: DataType = StructType(Seq(
    StructField("clean", StringType, nullable = false),
    StructField("n_lines", LongType, nullable = false),
    StructField("n_content", LongType, nullable = false),
    StructField("boilerplate_frac", DoubleType, nullable = false)))
  override def prettyName: String = "boilerplate_strip"

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"boilerplate_strip text argument must be string, got ${text.dataType.simpleString}")
    else if (model.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"boilerplate_strip model argument must be binary, got ${model.dataType.simpleString}")
    else if (!model.foldable)
      TypeCheckResult.TypeCheckFailure(
        "boilerplate_strip model argument must be a literal")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val decoded: BoilerplateModel.Decoded =
    BoilerplateModel.decode(model.eval(null).asInstanceOf[Array[Byte]])

  def strip(t: UTF8String): InternalRow = BoilerplateModel.strip(t, decoded)

  override def nullSafeEval(t: Any, m: Any): Any =
    strip(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("boilerplateStrip", this,
      classOf[BoilerplateStripExpr].getName)
    nullSafeCodeGen(ctx, ev, (t, _) => s"${ev.value} = $self.strip($t);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoilerplateStripExpr =
    copy(text = newLeft, model = newRight)
}
