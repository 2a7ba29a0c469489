package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native vector arithmetic over embedding columns.
  *
  * `zip_with`/`aggregate` higher-order functions are codegen-fallback and
  * box every element — at millions of candidate pairs × 64 dims that
  * interpretation overhead dominates similarity search. These expressions
  * run the same left-to-right double-precision accumulation (bit-identical
  * results, including against a DuckDB oracle widening FLOAT[]→DOUBLE[])
  * in a primitive loop, and `doGenCode` keeps them inside whole-stage
  * codegen via static helper calls.
  */
object VecFns {

  def dot(a: ArrayData, b: ArrayData, isFloat: Boolean): Double =
    dot2(a, b, isFloat, isFloat)

  /** Mixed-element-type dot: each side reads as its own declared type
    * (float widens to double exactly — same arithmetic as a cast-then-
    * multiply). Lets a float embedding column probe a double literal
    * hyperplane/centroid without a per-row `transform` cast. */
  def dot2(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  def norm(a: ArrayData, isFloat: Boolean): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      s += x * x
      i += 1
    }
    math.sqrt(s)
  }

  private[functions] def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"expected array<float|double>, got $other")
  }
}

/** `vec_dot(a, b)` — Σ a_i·b_i in double precision. */
case class VecDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  private lazy val lFloat = VecFns.isFloatArray(left.dataType)
  private lazy val rFloat = VecFns.isFloatArray(right.dataType)
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecFns.dot2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      lFloat, rFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecFns.dot2($a, $b, $lFloat, $rFloat);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

/** `vec_norm(a)` — √(Σ a_i²) in double precision. */
case class VecNormExpr(child: Expression) extends UnaryExpression {
  private lazy val isFloat = VecFns.isFloatArray(child.dataType)
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any): Any =
    VecFns.norm(a.asInstanceOf[ArrayData], isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VecFns.norm($a, $isFloat);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "vec_norm"
}

object VecExpressions {
  def vec_dot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDotExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def vec_norm(a: Column): Column =
    ColumnBridge.column(VecNormExpr(ColumnBridge.expression(a)))
}
