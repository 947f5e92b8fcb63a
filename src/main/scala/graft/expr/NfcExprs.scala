package graft.expr

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper target for codegen (the TextEntropy pattern). */
object NfcNormalizeImpl {
  /** Unicode NFC (canonical composition) via java.text.Normalizer — the
    * same normalization DuckDB's `nfc_normalize` applies, so oracles
    * replay it directly. Fast path: Normalizer.isNormalized avoids the
    * allocation for the (overwhelmingly common in web text) already-NFC
    * case. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** `nfc_normalize(text)` — Unicode canonical composition, codegen'd.
  *
  * Web-corpus pipelines normalize BEFORE hashing/dedup (a decomposed
  * "é" = e+U+0301 and the precomposed U+00E9 must dedup together, and
  * every downstream md5/minhash/simhash key changes with the byte form).
  * Per-row, zero shuffle; the isNormalized fast path makes the common
  * all-ASCII row cost one scan with no allocation.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects a string, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalizeImpl.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.NfcNormalizeImpl.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
