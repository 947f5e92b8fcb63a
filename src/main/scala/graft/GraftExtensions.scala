package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expr.FloatVecDot

/** Session extension registering graft's native Catalyst expressions —
  * currently `float_vec_dot` (codegen'd array<float> dot product; see
  * FloatVecDot for why the HOF formulation isn't enough). Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * imperatively via `GraftExtensions.install(spark)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.floatVecDot)
}

object GraftExtensions {
  private val floatVecDot: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("float_vec_dot"),
    new ExpressionInfo(classOf[FloatVecDot].getName, "float_vec_dot"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "float_vec_dot takes exactly 2 arguments")
      FloatVecDot(args.head, args(1))
    },
  )

  /** Imperative registration for sessions built without the extensions
    * config (e.g. a caller-provided SparkSession). Idempotent. */
  def install(spark: SparkSession): Unit =
    org.apache.spark.sql.GraftFunctionBridge.register(spark,
      floatVecDot._1, floatVecDot._2, floatVecDot._3)

  /** True when `float_vec_dot` resolves in this session. */
  def installed(spark: SparkSession): Boolean =
    spark.catalog.functionExists("float_vec_dot")
}
