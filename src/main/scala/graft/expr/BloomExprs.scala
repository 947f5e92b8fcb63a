package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_any_contain(bloom_bytes, array<string>)` — true when ANY element
  * of the array might be in the Bloom filter (serialized
  * `org.apache.spark.util.sketch.BloomFilter` bytes, a foldable literal).
  * One native call per row — no higher-order `exists` (CodegenFallback)
  * wrapping a per-element probe.
  *
  * No false negatives: an element that was put into the filter always
  * reports true, so a decontamination predicate built on this can
  * over-drop (bounded by the filter's fpp) but never leak a contaminated
  * document through. Element bytes are probed as UTF-8, matching what
  * `DataFrameStatFunctions.bloomFilter` puts for string columns.
  */
case class BloomAnyContain(bloom: Expression, arr: Expression)
    extends BinaryExpression {
  override def left: Expression = bloom
  override def right: Expression = arr
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_any_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (bloom.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_any_contain filter argument must be binary, got ${bloom.dataType.simpleString}")
    else if (!bloom.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bloom_any_contain filter argument must be a literal (the serialized filter)")
    else arr.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_any_contain values argument must be array<string>, got ${other.simpleString}")
    }

  /** Deserialized once per task from the plan literal. */
  @transient private lazy val filter: BloomFilter = {
    val bytes = bloom.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  def anyContain(a: ArrayData): Boolean = {
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (!a.isNullAt(i) &&
        filter.mightContainBinary(a.getUTF8String(i).getBytes)) return true
      i += 1
    }
    false
  }

  override def nullSafeEval(b: Any, a: Any): Any =
    anyContain(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference this expression instance so the generated code probes the
    // same lazily-deserialized filter
    val self = ctx.addReferenceObj("bloomAnyContain", this,
      classOf[BloomAnyContain].getName)
    nullSafeCodeGen(ctx, ev, (_, a) => s"${ev.value} = $self.anyContain($a);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomAnyContain =
    copy(bloom = newLeft, arr = newRight)
}
