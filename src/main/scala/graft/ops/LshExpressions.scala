package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Fused random-hyperplane LSH bucketing: ONE codegen'd pass over the
  * embedding computes every (table, plane) sign bit and packs each
  * table's bucket into a compact int join key `(table << numPlanes) |
  * bits`.
  *
  * The composed form this replaces — `numTables * numPlanes` separate
  * [[DotProduct]] expressions feeding `when`/`concat` string buckets and
  * a struct-array explode — re-read the embedding array and re-entered
  * the expression interpreter 84 times per row at s03's configuration
  * (12 tables x 7 planes). Here the plane matrix lives in one flat
  * `double[]` reference object and the inner loop is three nested
  * counters over primitives, so the bucketing projection stays a narrow
  * shuffle-free scan at any corpus size (SURVEY §7 step 10's
  * "custom Expression beats composition" path).
  */
case class LshBucketKeys(
    child: Expression,
    planes: Array[Double],
    numTables: Int,
    numPlanes: Int,
    dims: Int)
  extends UnaryExpression {

  require(planes.length == numTables * numPlanes * dims,
    s"plane matrix must be numTables*numPlanes*dims flat, got ${planes.length}")
  require(numPlanes < 24, "bucket bits must fit an int key alongside the table id")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lsh_bucket_keys"

  @transient private lazy val childIsFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"lsh_bucket_keys expects array<float> or array<double>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(dims, v.numElements())
    val keys = new Array[Int](numTables)
    var t = 0
    while (t < numTables) {
      var bits = 0
      var p = 0
      while (p < numPlanes) {
        val base = (t * numPlanes + p) * dims
        var s = 0.0
        var d = 0
        while (d < n) {
          val x = if (childIsFloat) v.getFloat(d).toDouble else v.getDouble(d)
          s += x * planes(base + d)
          d += 1
        }
        if (s > 0) bits |= 1 << p
        p += 1
      }
      keys(t) = (t << numPlanes) | bits
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[]")
      val n = ctx.freshName("n")
      val keys = ctx.freshName("keys")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val bits = ctx.freshName("bits")
      val base = ctx.freshName("base")
      val xv = if (childIsFloat) s"(double) $v.getFloat($d)" else s"$v.getDouble($d)"
      s"""
         |int $n = java.lang.Math.min($dims, $v.numElements());
         |int[] $keys = new int[$numTables];
         |for (int $t = 0; $t < $numTables; $t++) {
         |  int $bits = 0;
         |  for (int $p = 0; $p < $numPlanes; $p++) {
         |    int $base = ($t * $numPlanes + $p) * $dims;
         |    double $s = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      $s += $xv * $planesRef[$base + $d];
         |    }
         |    if ($s > 0) $bits |= 1 << $p;
         |  }
         |  $keys[$t] = ($t << $numPlanes) | $bits;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($keys);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBucketKeys {
  def apply(emb: Column, planes: Array[Double],
      numTables: Int, numPlanes: Int, dims: Int): Column =
    column(LshBucketKeys(expression(emb), planes, numTables, numPlanes, dims))
}
