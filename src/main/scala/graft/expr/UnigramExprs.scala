package graft.expr

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Encoded unigram-LM segmentation model: piece → composite cost, plus the
  * DP knobs. Composite = cost_microbits * 64 + 1 per piece, so an integer
  * Viterbi minimizing the composite SUM minimizes (total cost, piece
  * count) lexicographically — ties in cost break to fewer pieces, and
  * because only the (cost, count) PAIR is ever surfaced, equal-pair paths
  * are indistinguishable: the result is deterministic without any
  * path-level tie-break to replicate in the oracle. */
object UnigramModel {
  def encode(
      pieces: Seq[(String, Long)], // (piece, cost_microbits)
      maxPieceLen: Int,
      maxWordLen: Int,
      unkCostMicrobits: Long): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(pieces.size)
    pieces.foreach { case (p, c) =>
      val b = p.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c * 64L + 1L)
    }
    out.writeInt(maxPieceLen)
    out.writeInt(maxWordLen)
    out.writeLong(unkCostMicrobits * 64L + 1L)
    out.flush()
    bos.toByteArray
  }

  final class Decoded(
      // BOXED values: java.util.HashMap#get on a miss must return null,
      // not a silently-unboxed 0 (which would hand absent pieces a free
      // zero cost — the bug class Scala's primitive Long invites here)
      val table: java.util.HashMap[String, java.lang.Long],
      val maxPieceLen: Int,
      val maxWordLen: Int,
      val unkComposite: Long)

  def decode(bytes: Array[Byte]): Decoded = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val map = new java.util.HashMap[String, java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      map.put(new String(b, StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    new Decoded(map, in.readInt(), in.readInt(), in.readLong())
  }

  /** Composite-cost Viterbi over one word: dp[i] = min over piece ending
    * at i of dp[start] + composite(piece). Returns the composite at the
    * word end; unreachable ends and words longer than maxWordLen return
    * the unk composite (one "piece"). O(len × maxPieceLen) table probes. */
  def viterbi(word: String, m: Decoded): Long = {
    val len = word.length
    if (len == 0 || len > m.maxWordLen) return m.unkComposite
    val dp = new Array[Long](len + 1)
    java.util.Arrays.fill(dp, Long.MaxValue)
    dp(0) = 0L
    var i = 1
    while (i <= len) {
      var l = 1
      val lMax = math.min(m.maxPieceLen, i)
      while (l <= lMax) {
        val j = i - l
        if (dp(j) != Long.MaxValue) {
          val cc: java.lang.Long = m.table.get(word.substring(j, i))
          if ((cc ne null) && dp(j) + cc.longValue < dp(i))
            dp(i) = dp(j) + cc.longValue
        }
        l += 1
      }
      i += 1
    }
    if (dp(len) == Long.MaxValue) m.unkComposite else dp(len)
  }

  /** Backpointer Viterbi: the SAME composite DP as [[viterbi]], but
    * returning the best path's space-joined pieces (for EM expected
    * counts) instead of the composite. Equal-composite paths need a
    * deterministic tie-break here (unlike [[viterbi]], where they are
    * indistinguishable): at every position the recorded backpointer is
    * the SHORTEST last piece achieving the position's final minimum —
    * the strict-`<`, l-ascending update order makes that automatic, and
    * the DuckDB oracle replays it as a row_number over piece length
    * ascending. Empty/overlong/unreachable words return "[UNK]". */
  def viterbiPieces(word: String, m: Decoded): String = {
    val len = word.length
    if (len == 0 || len > m.maxWordLen) return "[UNK]"
    val dp = new Array[Long](len + 1)
    val bp = new Array[Int](len + 1)
    java.util.Arrays.fill(dp, Long.MaxValue)
    dp(0) = 0L
    var i = 1
    while (i <= len) {
      var l = 1
      val lMax = math.min(m.maxPieceLen, i)
      while (l <= lMax) {
        val j = i - l
        if (dp(j) != Long.MaxValue) {
          val cc: java.lang.Long = m.table.get(word.substring(j, i))
          if ((cc ne null) && dp(j) + cc.longValue < dp(i)) {
            dp(i) = dp(j) + cc.longValue
            bp(i) = l
          }
        }
        l += 1
      }
      i += 1
    }
    if (dp(len) == Long.MaxValue) return "[UNK]"
    val pieces = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = len
    while (p > 0) {
      pieces += word.substring(p - bp(p), p)
      p -= bp(p)
    }
    pieces.reverse.mkString(" ")
  }

  /** EXCLUSION Viterbi — [[viterbi]] with one piece removed from the
    * inventory: the likelihood-loss primitive of Kudo 2018's vocabulary
    * pruning (loss of dropping piece x = Σ_w f_w · (cost_without_x −
    * best_cost) over words whose best path uses x). Identical DP,
    * identical composite; transitions whose piece equals `excl` are
    * skipped. With the single-character alphabet always retained,
    * excluding a multi-char piece can never strand a word that was
    * reachable — but the unk composite stays the honest fallback. */
  def viterbiExcl(word: String, m: Decoded, excl: String): Long = {
    val len = word.length
    if (len == 0 || len > m.maxWordLen) return m.unkComposite
    val dp = new Array[Long](len + 1)
    java.util.Arrays.fill(dp, Long.MaxValue)
    dp(0) = 0L
    var i = 1
    while (i <= len) {
      var l = 1
      val lMax = math.min(m.maxPieceLen, i)
      while (l <= lMax) {
        val j = i - l
        if (dp(j) != Long.MaxValue) {
          val piece = word.substring(j, i)
          if (piece != excl) {
            val cc: java.lang.Long = m.table.get(piece)
            if ((cc ne null) && dp(j) + cc.longValue < dp(i))
              dp(i) = dp(j) + cc.longValue
          }
        }
        l += 1
      }
      i += 1
    }
    if (dp(len) == Long.MaxValue) m.unkComposite else dp(len)
  }
}

/** `unigram_viterbi(word, model)` — minimal-cost unigram-LM segmentation
  * (SentencePiece's inference rule, Kudo 2018) as one codegen'd integer
  * DP per word. `model` must be a LITERAL binary ([[UnigramModel]]),
  * decoded once per task — the LmBits plan-literal pattern: zero joins at
  * segmentation time. Returns the composite `cost_microbits * 64 +
  * n_pieces`; callers decompose with `div 64` / `% 64`. */
case class UnigramViterbi(word: Expression, model: Expression)
    extends BinaryExpression {
  override def left: Expression = word
  override def right: Expression = model
  override def dataType: DataType = LongType
  override def prettyName: String = "unigram_viterbi"

  override def checkInputDataTypes(): TypeCheckResult =
    if (word.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"unigram_viterbi word argument must be string, got ${word.dataType.simpleString}")
    else if (model.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"unigram_viterbi model argument must be binary, got ${model.dataType.simpleString}")
    else if (!model.foldable)
      TypeCheckResult.TypeCheckFailure(
        "unigram_viterbi model argument must be a literal (the encoded model)")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val decoded: UnigramModel.Decoded =
    UnigramModel.decode(model.eval(null).asInstanceOf[Array[Byte]])

  def score(w: UTF8String): Long = UnigramModel.viterbi(w.toString, decoded)

  override def nullSafeEval(w: Any, m: Any): Any =
    score(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("unigramViterbi", this,
      classOf[UnigramViterbi].getName)
    nullSafeCodeGen(ctx, ev, (w, _) => s"${ev.value} = $self.score($w);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UnigramViterbi =
    copy(word = newLeft, model = newRight)
}

/** `unigram_viterbi_pieces(word, model)` — the best segmentation's
  * space-joined PIECES (shortest-last-piece tie-break; see
  * [[UnigramModel.viterbiPieces]]), the E-step primitive for hard-EM
  * re-estimation. Same plan-literal model contract as `unigram_viterbi`. */
case class UnigramViterbiPieces(word: Expression, model: Expression)
    extends BinaryExpression {
  override def left: Expression = word
  override def right: Expression = model
  override def dataType: DataType = StringType
  override def prettyName: String = "unigram_viterbi_pieces"

  override def checkInputDataTypes(): TypeCheckResult =
    if (word.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"unigram_viterbi_pieces word argument must be string, got ${word.dataType.simpleString}")
    else if (model.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"unigram_viterbi_pieces model argument must be binary, got ${model.dataType.simpleString}")
    else if (!model.foldable)
      TypeCheckResult.TypeCheckFailure(
        "unigram_viterbi_pieces model argument must be a literal (the encoded model)")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val decoded: UnigramModel.Decoded =
    UnigramModel.decode(model.eval(null).asInstanceOf[Array[Byte]])

  def pieces(w: UTF8String): UTF8String =
    UTF8String.fromString(UnigramModel.viterbiPieces(w.toString, decoded))

  override def nullSafeEval(w: Any, m: Any): Any =
    pieces(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("unigramViterbiPieces", this,
      classOf[UnigramViterbiPieces].getName)
    nullSafeCodeGen(ctx, ev, (w, _) => s"${ev.value} = $self.pieces($w);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UnigramViterbiPieces =
    copy(word = newLeft, model = newRight)
}

/** `unigram_viterbi_excl(word, model, piece)` — the best segmentation
  * composite with ONE piece excluded from the inventory
  * ([[UnigramModel.viterbiExcl]]): the per-(word, piece) primitive of
  * Kudo 2018's likelihood-loss vocabulary pruning. Same plan-literal
  * model contract as `unigram_viterbi`; `piece` is a per-row column
  * (each word probes only the pieces on its own best path). */
case class UnigramViterbiExcl(
    first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "unigram_viterbi_excl"

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"unigram_viterbi_excl word argument must be string, got ${first.dataType.simpleString}")
    else if (second.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"unigram_viterbi_excl model argument must be binary, got ${second.dataType.simpleString}")
    else if (!second.foldable)
      TypeCheckResult.TypeCheckFailure(
        "unigram_viterbi_excl model argument must be a literal (the encoded model)")
    else if (third.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"unigram_viterbi_excl piece argument must be string, got ${third.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val decoded: UnigramModel.Decoded =
    UnigramModel.decode(second.eval(null).asInstanceOf[Array[Byte]])

  def score(w: UTF8String, x: UTF8String): Long =
    UnigramModel.viterbiExcl(w.toString, decoded, x.toString)

  override def nullSafeEval(w: Any, m: Any, x: Any): Any =
    score(w.asInstanceOf[UTF8String], x.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("unigramViterbiExcl", this,
      classOf[UnigramViterbiExcl].getName)
    nullSafeCodeGen(ctx, ev, (w, _, x) => s"${ev.value} = $self.score($w, $x);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression)
      : UnigramViterbiExcl =
    copy(first = newFirst, second = newSecond, third = newThird)
}
