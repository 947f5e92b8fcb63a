package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `vec_argmax_cell(vec, norm, cents)` — nearest-centroid assignment as a
  * single codegen'd JVM loop.
  *
  * `cents` is the broadcast `array<struct<cid, cv array<float|double>,
  * cn double>>` the k-means / PQ paths build with `collect_list` (fields
  * read by ORDINAL, so the `__cid__`/`__cv__`/`__cn__` aliases don't
  * matter). For each centroid the cosine of `vec` against `cv` is
  * `round(float_vec_dot(vec, cv) / (norm * cn), 6)`, pinned to -2 when
  * either norm is zero or anything is NULL; the winner is the (sim desc,
  * cid asc) argmax. This is bit-for-bit the higher-order-function
  * formulation in [[graft.llm.Embeddings.argmaxCellHof]] (the
  * value-identity anchor LlmSpec pins), but HOFs are CodegenFallback in
  * Spark — per centroid they pay two interpreted lambda dispatches plus a
  * named_struct allocation, and this argmax is the hottest CPU path in
  * the ANN suite (per candidate × per segment in ADC scoring). Here the
  * k-way loop and its dot products run as one method call per row inside
  * whole-stage codegen.
  *
  * Null semantics match the HOF exactly (not nullSafeEval):
  *   - NULL or empty `cents` → NULL (an empty centroid set must yield a
  *     NULL cell so later equi-joins match nothing);
  *   - NULL `vec`/`norm`, zero norms, or NULL cv/cn entries pin that sim
  *     to -2, so a fully-degenerate row deterministically lands in the
  *     MINIMUM centroid id's cell via the cid tie-break;
  *   - a NULL cid never wins a tie (SQL `<` is NULL-propagating);
  *   - NaN (reachable through NaN values in user embedding data) follows
  *     Spark's comparison semantics exactly — NaN is GREATEST and
  *     NaN = NaN is true — via `java.lang.Double.compare`, whose total
  *     order is precisely Spark's; a NaN sim therefore beats every
  *     finite sim and ties among NaNs break to the minimum cid, matching
  *     the HOF fold bit-for-bit (LlmSpec pins the NaN cases).
  */
case class VecArgmaxCell(first: Expression, second: Expression, third: Expression,
    l2: Boolean = false)
    extends TernaryExpression {

  private def vecElem(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  private def centsStruct: Option[StructType] = third.dataType match {
    case ArrayType(st: StructType, _) if st.length == 3 => Some(st)
    case _ => None
  }

  private def cidOrderable(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | StringType | DateType | TimestampType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val centsOk = centsStruct.exists { st =>
      cidOrderable(st.fields(0).dataType) &&
        vecElem(st.fields(1).dataType).isDefined &&
        st.fields(2).dataType == DoubleType
    }
    if (vecElem(first.dataType).isDefined && second.dataType == DoubleType && centsOk)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "vec_argmax_cell expects (array<float|double>, double, " +
        "array<struct<cid orderable, cv array<float|double>, cn double>>), got (" +
        s"${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }

  override def dataType: DataType = centsStruct.get.fields(0).dataType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (l2) "vec_argmax_cell_l2" else "vec_argmax_cell"

  @transient private lazy val helper = new ArgmaxCellHelper(
    vecElem(first.dataType).contains(FloatType),
    vecElem(centsStruct.get.fields(1).dataType).contains(FloatType),
    dataType, l2)

  override def eval(input: InternalRow): Any =
    helper.best(first.eval(input), second.eval(input), third.eval(input))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vecGen = first.genCode(ctx)
    val normGen = second.genCode(ctx)
    val centsGen = third.genCode(ctx)
    val h = ctx.addReferenceObj("argmaxCellHelper", helper,
      classOf[ArgmaxCellHelper].getName)
    val res = ctx.freshName("argmaxRes")
    val javaType = CodeGenerator.javaType(dataType)
    val boxed = CodeGenerator.boxedType(dataType)
    ev.copy(code = code"""
      ${vecGen.code}
      ${normGen.code}
      ${centsGen.code}
      Object $res = $h.best(
        ${vecGen.isNull} ? null : (Object) ${vecGen.value},
        ${normGen.isNull} ? null : (Object) ${normGen.value},
        ${centsGen.isNull} ? null : (Object) ${centsGen.value});
      boolean ${ev.isNull} = ($res == null);
      $javaType ${ev.value} = ${ev.isNull}
        ? ${CodeGenerator.defaultValue(dataType)} : (($boxed) $res);
    """)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): VecArgmaxCell =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** The per-row loop behind [[VecArgmaxCell]] — one instance per expression,
  * referenced from both the interpreted and codegen paths so they cannot
  * diverge. Type flags are resolved once at analysis time.
  *
  * `l2 = true` switches the score to the L2-argmin equivalent
  * `round(vec·cv − cn/2, 6)` where the BUILDER puts ‖cv‖² in the struct's
  * third field (argmin ‖vec−cv‖² ≡ argmax (vec·cv − ‖cv‖²/2) after
  * dropping the constant ‖vec‖² — the magnitude-aware metric residual
  * quantizers need; cosine would quantize noise-like residuals by
  * direction only and measurably lose recall). L2 mode never divides, so
  * a zero-norm vector is legitimately encodable; the degenerate pin is
  * −∞ (the cosine mode's −2 would beat real L2 scores, which are
  * unbounded below), and the `norm` operand is ignored. */
class ArgmaxCellHelper(vecFloat: Boolean, cvFloat: Boolean, cidType: DataType,
    l2: Boolean = false)
    extends Serializable {

  // same ascending left fold from 0.0 as FloatVecDot / the DuckDB oracle
  private def dot(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (vecFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (cvFloat) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  // Spark Round(double, 6): HALF_UP via BigDecimal.valueOf, NaN/Inf pass through
  private def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def lt(a: Any, b: Any): Boolean = cidType match {
    case ByteType    => a.asInstanceOf[Byte] < b.asInstanceOf[Byte]
    case ShortType   => a.asInstanceOf[Short] < b.asInstanceOf[Short]
    case IntegerType | DateType => a.asInstanceOf[Int] < b.asInstanceOf[Int]
    case LongType | TimestampType => a.asInstanceOf[Long] < b.asInstanceOf[Long]
    case FloatType   => a.asInstanceOf[Float] < b.asInstanceOf[Float]
    case DoubleType  => a.asInstanceOf[Double] < b.asInstanceOf[Double]
    case StringType  =>
      a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String]) < 0
    case other => throw new IllegalStateException(
      s"unreachable: cid type $other passed checkInputDataTypes")
  }

  /** Returns the winning cid (boxed / UTF8String), or null for a NULL or
    * empty centroid array. Inputs arrive as nullable boxed objects. */
  def best(vecAny: Any, normAny: Any, centsAny: Any): Any = {
    if (centsAny == null) return null
    val cents = centsAny.asInstanceOf[ArrayData]
    val k = cents.numElements()
    if (k == 0) return null
    val vec = if (vecAny == null) null else vecAny.asInstanceOf[ArrayData]
    val normNull = normAny == null
    val norm = if (normNull) 0.0 else normAny.asInstanceOf[java.lang.Double].doubleValue()
    val pin = if (l2) Double.NegativeInfinity else -2.0
    // init = (pin, cid of the first centroid), exactly the HOF's seed
    var bestSim = pin
    var bestCid: Any =
      if (cents.isNullAt(0)) null
      else {
        val r0 = cents.getStruct(0, 3)
        if (r0.isNullAt(0)) null else r0.get(0, cidType)
      }
    var i = 0
    while (i < k) {
      // a NULL struct element folds to (pin, cid NULL) in the HOF and
      // can never win (NULL cid loses every tie) — skip it
      if (!cents.isNullAt(i)) {
        val row = cents.getStruct(i, 3)
        var sim = pin
        if (l2) {
          if (vec != null && !row.isNullAt(1) && !row.isNullAt(2))
            sim = round6(dot(vec, row.getArray(1)) - row.getDouble(2) / 2.0)
        } else if (vec != null && !normNull && norm != 0.0 &&
            !row.isNullAt(1) && !row.isNullAt(2)) {
          val cn = row.getDouble(2)
          if (cn != 0.0) sim = round6(dot(vec, row.getArray(1)) / (norm * cn))
        }
        // Double.compare, not primitive >: Spark orders NaN GREATEST and
        // NaN = NaN true — exactly Double.compare's total order. A NaN
        // sim (NaN values in user embedding data) must pick the same
        // winner as the HOF: NaN beats every finite sim, ties among NaNs
        // break to the minimum cid.
        val cmp = java.lang.Double.compare(sim, bestSim)
        if (cmp > 0 || (cmp == 0 && !row.isNullAt(0) &&
            bestCid != null && lt(row.get(0, cidType), bestCid))) {
          bestSim = sim
          bestCid = if (row.isNullAt(0)) null else row.get(0, cidType)
        }
      }
      i += 1
    }
    bestCid
  }
}
