package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen dot product over `array<double>` columns.
  *
  * The composed-HOF form `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * allocates an intermediate array per row and evaluates the lambda
  * interpreted per element; this expression generates a tight fused loop
  * (no allocation, stays inside whole-stage codegen), ~10x faster on the
  * 64-dim embedding corpus while producing the BIT-IDENTICAL sequential
  * left-to-right double fold (so DuckDB-oracle hash equality is
  * preserved).
  *
  * This is the "custom Catalyst Expression beats UDF" path of SURVEY §7
  * step 10: at 100 TB the similarity kernels are the hot loop of every
  * ANN/near-dup job.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  // Reads array<float> natively (widened per element — float->double is
  // exact, so the fold is bit-identical to casting the array first) and
  // array<double> directly. Reading floats in place matters: a
  // Cast(array<float> -> array<double>) allocates a fresh 64-double array
  // per evaluation, and the LSH bucketing evaluates ~84 dots per row —
  // the casts were the top allocation site of the ANN pipeline.
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"vec_dot expects array<float> or array<double>, got $t")
  }

  @transient private lazy val leftIsFloat = isFloat(left)
  @transient private lazy val rightIsFloat = isFloat(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lf, rf) = (leftIsFloat, rightIsFloat)
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val xv = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val yv = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $xv * $yv;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column builders for the vector kernels. */
object vector {

  /** dot(a, b) over array<float> or array<double> columns (each side may
    * be either; floats are widened in-register, never via an array cast).
    * Other element types must be cast by the caller.
    */
  def vec_dot(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  /** Squared L2 norm, dot(a, a). */
  def vec_norm_sq(a: Column): Column = vec_dot(a, a)
}
