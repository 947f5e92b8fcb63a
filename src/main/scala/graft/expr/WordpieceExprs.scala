package graft.expr

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Encoded WordPiece vocabulary: the piece set (continuation pieces carry
  * their literal `##` prefix) plus the serving knobs. Greedy
  * longest-match-first needs only set MEMBERSHIP — no costs — so the
  * model is a length-prefixed string list; `maxBodyLen` (longest piece
  * net of the `##` marker) bounds the match loop per position. */
object WordpieceModel {
  def encode(
      pieces: Seq[String],
      maxWordLen: Int,
      byteFallback: Boolean = false): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(pieces.size)
    pieces.foreach { p =>
      val b = p.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
    }
    out.writeInt(maxWordLen)
    out.writeBoolean(byteFallback)
    out.flush()
    bos.toByteArray
  }

  final class Decoded(
      val vocab: java.util.HashSet[String],
      val maxBodyLen: Int,
      val maxWordLen: Int,
      val byteFallback: Boolean)

  def decode(bytes: Array[Byte]): Decoded = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val set = new java.util.HashSet[String](n * 2)
    var maxBody = 1
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val p = new String(b, StandardCharsets.UTF_8)
      set.add(p)
      val body = if (p.startsWith("##")) p.length - 2 else p.length
      if (body > maxBody) maxBody = body
      i += 1
    }
    new Decoded(set, maxBody, in.readInt(), in.readBoolean())
  }

  private val Unk = UTF8String.fromString("[UNK]")
  private val HexDigits = "0123456789ABCDEF"

  /** The word's UTF-8 bytes as `<0xAB>` pieces (the SentencePiece
    * byte-fallback rendering, applied word-wise under the BERT
    * all-or-nothing rule). */
  private def bytePieces(word: String): UTF8String = {
    val bs = word.getBytes(StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bs.length * 7)
    var i = 0
    while (i < bs.length) {
      if (i > 0) sb.append(' ')
      val v = bs(i) & 0xff
      sb.append("<0x").append(HexDigits.charAt(v >> 4))
        .append(HexDigits.charAt(v & 0xf)).append('>')
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Greedy longest-match-first WordPiece inference (the BERT tokenizer's
    * serving rule): at each position take the LONGEST vocabulary piece
    * matching the remaining suffix (continuation positions probe with the
    * `##` prefix); any position with no match — or a word longer than
    * `maxWordLen` — makes the WHOLE word `[UNK]` (the published
    * all-or-nothing rule), or, with `byteFallback`, the word's UTF-8
    * byte pieces `<0xAB>…` (the SentencePiece byte-fallback rule applied
    * at word granularity: in-alphabet words keep their exact greedy
    * tokenization, only failing words decompose — and nothing is ever
    * `[UNK]`, the no-UNK property). Returns the space-joined piece
    * string. O(len × maxBodyLen) set probes per word. */
  def greedy(word: String, m: Decoded): UTF8String = {
    val len = word.length
    if (len == 0) return Unk
    if (len > m.maxWordLen)
      return if (m.byteFallback) bytePieces(word) else Unk
    val sb = new java.lang.StringBuilder(len + 8)
    var pos = 0
    while (pos < len) {
      var l = math.min(m.maxBodyLen, len - pos)
      var found = -1
      while (l >= 1 && found < 0) {
        val cand =
          if (pos == 0) word.substring(0, l)
          else "##" + word.substring(pos, pos + l)
        if (m.vocab.contains(cand)) found = l else l -= 1
      }
      if (found < 0)
        return if (m.byteFallback) bytePieces(word) else Unk
      if (pos > 0) sb.append(" ##")
      sb.append(word, pos, pos + found)
      pos += found
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `wordpiece_encode(word, model)` — greedy longest-match-first WordPiece
  * tokenization as one codegen'd loop per word. `model` must be a LITERAL
  * binary ([[WordpieceModel]]), decoded once per task (the LmBits
  * plan-literal pattern: zero joins at tokenization time). Returns the
  * space-joined piece string (continuation pieces keep their `##`
  * marker), or `[UNK]` when any position fails to match. */
case class WordpieceEncode(word: Expression, model: Expression)
    extends BinaryExpression {
  override def left: Expression = word
  override def right: Expression = model
  override def dataType: DataType = StringType
  override def prettyName: String = "wordpiece_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    if (word.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"wordpiece_encode word argument must be string, got ${word.dataType.simpleString}")
    else if (model.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"wordpiece_encode model argument must be binary, got ${model.dataType.simpleString}")
    else if (!model.foldable)
      TypeCheckResult.TypeCheckFailure(
        "wordpiece_encode model argument must be a literal (the encoded vocabulary)")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val decoded: WordpieceModel.Decoded =
    WordpieceModel.decode(model.eval(null).asInstanceOf[Array[Byte]])

  def encodeWord(w: UTF8String): UTF8String =
    WordpieceModel.greedy(w.toString, decoded)

  override def nullSafeEval(w: Any, m: Any): Any =
    encodeWord(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("wordpieceEncode", this,
      classOf[WordpieceEncode].getName)
    nullSafeCodeGen(ctx, ev, (w, _) => s"${ev.value} = $self.encodeWord($w);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordpieceEncode =
    copy(word = newLeft, model = newRight)
}
