package graft.expr

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper target for codegen. */
object DeflateLenImpl {
  /** DEFLATE-compressed byte length of the UTF-8 text at level 6 (zlib
    * default). One Deflater per call — Deflater is not thread-safe and
    * codegen'd expressions evaluate on many executor threads; `end()` is
    * called eagerly so native zlib buffers never wait for finalizers.
    * Output length (not bytes) is the only thing consumed, so zlib
    * version drift across JVMs can only nudge the ratio, never break
    * determinism within a run. */
  def deflateLen(s: UTF8String): Int = {
    val bytes = s.getBytes
    val d = new Deflater(6)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}

/** `deflate_len(text)` — compressed size of the row's text, codegen'd.
  *
  * The compression-ratio quality signal (deflate_len / octet_length):
  * template/boilerplate/keyword-stuffed pages compress far below natural
  * prose, and near-random or encrypted blobs compress above it — the
  * model-free complement to LM perplexity used by the published web-corpus
  * pipelines (Gopher's repetition family, RedPajama-v2's ccnet signals).
  * Per-row, zero shuffle; no DuckDB oracle exists for DEFLATE, so the op
  * is spec-gated with closed-form orderings (repetition compresses below
  * prose, prose below hash noise) — the approxPercentile precedent for
  * non-replayable ops.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_len expects a string, got ${child.dataType.simpleString}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_len"

  override def nullSafeEval(input: Any): Any =
    DeflateLenImpl.deflateLen(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.DeflateLenImpl.deflateLen($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}
