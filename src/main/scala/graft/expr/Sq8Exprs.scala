package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** SQ8 scalar quantization natives (the FAISS `ScalarQuantizer QT_8bit`
  * practice: per-dimension min/max affine 8-bit codes — 4× smaller than
  * float32 at near-brute recall, the standard contrast point to PQ's
  * 32×-compression/lower-recall regime).
  *
  * Three expressions share one quantization rule, which is ALSO published
  * as a SQL formula string ([[graft.llm.Embeddings.sq8CodeSql]]) so the
  * DuckDB oracle and the Spark HOF value-identity anchor replay it
  * verbatim:
  *
  *   code_i = CASE WHEN sc_i <= 0.0 THEN 0
  *            ELSE CAST(least(255.0, greatest(0.0,
  *                   floor((x_i - mn_i) / sc_i + 0.5))) AS INT) END
  *   dq_i   = mn_i + code_i * sc_i
  *
  * with sc_i = (max_i - min_i) / 255.0 fitted in one corpus pass. All
  * arithmetic is double; `/ * + -` and `floor` are correctly rounded in
  * IEEE-754, so the two engines agree bit-for-bit. NaN anywhere (value or
  * params) clamps to 255 — pinned EXPLICITLY by an isnan branch in the
  * shared formula, because least/greatest NaN handling differs across
  * engines. Per-element NULLs mirror SQL: a NULL element yields a NULL
  * code, and a NULL term poisons a dot/norm fold to NULL overall —
  * exactly what the `aggregate(zip_with(...))` HOF formulation computes
  * (LlmSpec pins the identity).
  *
  * Why natives: the higher-order-function formulation is CodegenFallback
  * in Spark — the serving scan pays dim interpreted lambda dispatches per
  * candidate. These run the per-dimension loop as plain JVM code inside
  * whole-stage codegen (one helper call per row, same discipline as
  * [[VecArgmaxCell]]).
  */
private[expr] class Sq8Helper(vecIsFloat: Boolean, otherIsFloat: Boolean)
    extends Serializable {

  /** vec_sq8_code(vec, mins, scales) → array<int> codes. */
  def code(vecO: Any, minsO: Any, scalesO: Any): ArrayData = {
    val v = vecO.asInstanceOf[ArrayData]
    val mn = minsO.asInstanceOf[ArrayData]
    val sc = scalesO.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), math.min(mn.numElements(), sc.numElements()))
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i) || mn.isNullAt(i) || sc.isNullAt(i)) out(i) = null
      else {
        val x = if (vecIsFloat) v.getFloat(i).toDouble else v.getDouble(i)
        val m = mn.getDouble(i)
        val s = sc.getDouble(i)
        out(i) =
          if (s <= 0.0) 0 // constant dimension: code 0, dq = mn exactly
          else {
            val d = math.floor((x - m) / s + 0.5)
            // NaN (value or params) → top bound, matching the shared
            // formula's explicit isnan branch; else clamp to [0, 255]
            if (java.lang.Double.isNaN(d)) 255
            else if (d < 0.0) 0
            else if (d > 255.0) 255
            else d.toInt
          }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** vec_sq8_dot(codes, mins, scales, other): ascending-index left fold
    * from 0.0 of other_i * (mn_i + code_i * sc_i); NULL element → NULL
    * (fold poisoning, like the SQL aggregate). */
  def dot(codesO: Any, minsO: Any, scalesO: Any, otherO: Any): java.lang.Double = {
    val c = codesO.asInstanceOf[ArrayData]
    val mn = minsO.asInstanceOf[ArrayData]
    val sc = scalesO.asInstanceOf[ArrayData]
    val o = otherO.asInstanceOf[ArrayData]
    val n = math.min(math.min(c.numElements(), o.numElements()),
      math.min(mn.numElements(), sc.numElements()))
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (c.isNullAt(i) || mn.isNullAt(i) || sc.isNullAt(i) || o.isNullAt(i))
        return null
      val dq = mn.getDouble(i) + c.getInt(i).toDouble * sc.getDouble(i)
      val ov = if (otherIsFloat) o.getFloat(i).toDouble else o.getDouble(i)
      acc += ov * dq
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** vec_sq8_norm2(codes, mins, scales): Σ dq_i², same fold discipline. */
  def norm2(codesO: Any, minsO: Any, scalesO: Any): java.lang.Double = {
    val c = codesO.asInstanceOf[ArrayData]
    val mn = minsO.asInstanceOf[ArrayData]
    val sc = scalesO.asInstanceOf[ArrayData]
    val n = math.min(c.numElements(),
      math.min(mn.numElements(), sc.numElements()))
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (c.isNullAt(i) || mn.isNullAt(i) || sc.isNullAt(i)) return null
      val dq = mn.getDouble(i) + c.getInt(i).toDouble * sc.getDouble(i)
      acc += dq * dq
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

private[expr] object Sq8Types {
  def vecElem(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }
  def isIntArray(t: DataType): Boolean = t match {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }
  def isDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
}

/** `vec_sq8_code(vec, mins, scales)` → array<int> 8-bit codes. */
case class Sq8Code(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  import Sq8Types._

  override def checkInputDataTypes(): TypeCheckResult =
    if (vecElem(first.dataType).isDefined && isDoubleArray(second.dataType) &&
      isDoubleArray(third.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "vec_sq8_code expects (array<float|double>, array<double>, array<double>), " +
        s"got (${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  override def prettyName: String = "vec_sq8_code"

  @transient private lazy val helper =
    new Sq8Helper(vecElem(first.dataType).contains(FloatType), otherIsFloat = false)

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = helper.code(a, b, c)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("sq8Helper", helper, classOf[Sq8Helper].getName)
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"${ev.value} = (${classOf[ArrayData].getName}) $h.code($a, $b, $c);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Sq8Code =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `vec_sq8_dot(codes, mins, scales, other)` → double (NULL on poisoned
  * fold). */
case class Sq8Dot(first: Expression, second: Expression, third: Expression,
    fourth: Expression)
    extends QuaternaryExpression {
  import Sq8Types._

  override def checkInputDataTypes(): TypeCheckResult =
    if (isIntArray(first.dataType) && isDoubleArray(second.dataType) &&
      isDoubleArray(third.dataType) && vecElem(fourth.dataType).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "vec_sq8_dot expects (array<int>, array<double>, array<double>, " +
        s"array<float|double>), got (${first.dataType.simpleString}, " +
        s"${second.dataType.simpleString}, ${third.dataType.simpleString}, " +
        s"${fourth.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sq8_dot"

  @transient private lazy val helper =
    new Sq8Helper(vecIsFloat = false,
      otherIsFloat = vecElem(fourth.dataType).contains(FloatType))

  override def eval(input: InternalRow): Any = {
    val a = first.eval(input); val b = second.eval(input)
    val c = third.eval(input); val d = fourth.eval(input)
    if (a == null || b == null || c == null || d == null) null
    else helper.dot(a, b, c, d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aG = first.genCode(ctx); val bG = second.genCode(ctx)
    val cG = third.genCode(ctx); val dG = fourth.genCode(ctx)
    val h = ctx.addReferenceObj("sq8Helper", helper, classOf[Sq8Helper].getName)
    val res = ctx.freshName("sq8Dot")
    ev.copy(code = code"""
      ${aG.code}
      ${bG.code}
      ${cG.code}
      ${dG.code}
      java.lang.Double $res =
        (${aG.isNull} || ${bG.isNull} || ${cG.isNull} || ${dG.isNull})
          ? null
          : $h.dot(${aG.value}, ${bG.value}, ${cG.value}, ${dG.value});
      boolean ${ev.isNull} = ($res == null);
      double ${ev.value} = ${ev.isNull} ? 0.0 : $res.doubleValue();
    """)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression,
      newFourth: Expression): Sq8Dot =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

/** `vec_sq8_norm2(codes, mins, scales)` → double ‖dq‖² (NULL on poisoned
  * fold). */
case class Sq8Norm2(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  import Sq8Types._

  override def checkInputDataTypes(): TypeCheckResult =
    if (isIntArray(first.dataType) && isDoubleArray(second.dataType) &&
      isDoubleArray(third.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "vec_sq8_norm2 expects (array<int>, array<double>, array<double>), " +
        s"got (${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sq8_norm2"

  @transient private lazy val helper =
    new Sq8Helper(vecIsFloat = false, otherIsFloat = false)

  override def eval(input: InternalRow): Any = {
    val a = first.eval(input); val b = second.eval(input)
    val c = third.eval(input)
    if (a == null || b == null || c == null) null
    else helper.norm2(a, b, c)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aG = first.genCode(ctx); val bG = second.genCode(ctx)
    val cG = third.genCode(ctx)
    val h = ctx.addReferenceObj("sq8Helper", helper, classOf[Sq8Helper].getName)
    val res = ctx.freshName("sq8N2")
    ev.copy(code = code"""
      ${aG.code}
      ${bG.code}
      ${cG.code}
      java.lang.Double $res =
        (${aG.isNull} || ${bG.isNull} || ${cG.isNull})
          ? null
          : $h.norm2(${aG.value}, ${bG.value}, ${cG.value});
      boolean ${ev.isNull} = ($res == null);
      double ${ev.value} = ${ev.isNull} ? 0.0 : $res.doubleValue();
    """)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Sq8Norm2 =
    copy(first = newFirst, second = newSecond, third = newThird)
}
