package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product of two `array<float>` columns in double precision.
  *
  * The built-in formulation `aggregate(zip_with(a, b, (x,y) -> ...))` is
  * semantically fine but higher-order functions are CodegenFallback in
  * Spark — every element goes through an interpreted lambda call. This is
  * the one hot loop in the similarity-search operators (64 multiply-adds
  * per candidate pair), so it earns a real Catalyst `Expression` with
  * `doGenCode`: a primitive float loop inside whole-stage codegen.
  *
  * Summation is an ascending-index left fold starting at 0.0 — EXACTLY the
  * order of the HOF formulation and of the DuckDB oracle's `list_reduce`
  * fold, so scores stay bit-identical across all three.
  *
  * Registered as SQL function `float_vec_dot` via
  * [[graft.GraftExtensions]] (`spark.sql.extensions`) or imperatively via
  * `GraftExtensions.install(spark)`.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // each side may independently be array<float> (raw embeddings) or
  // array<double> (e.g. k-means centroids = per-dimension means)
  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = elemType(left).isDefined && elemType(right).isDefined
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"float_vec_dot expects (array<float|double>, array<float|double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot"

  // fixed per instance; hoisted so the interpreted path (one eval per
  // row×centroid inside HOF folds) pays no per-call type dispatch
  @transient private lazy val leftIsFloat = elemType(left).contains(FloatType)
  @transient private lazy val rightIsFloat = elemType(right).contains(FloatType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xf = leftIsFloat
    val yf = rightIsFloat
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def get(arr: String, e: Expression): String =
        if (elemType(e).contains(FloatType)) s"(double) $arr.getFloat($i)"
        else s"$arr.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${get(a, left)} * ${get(b, right)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}
