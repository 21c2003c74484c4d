package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid assignment (the IVF coarse quantizer): returns the index
  * of the centroid with minimum squared L2 distance to the input vector.
  * The centroid matrix is a broadcast-style constant baked into the
  * expression (`ctx.addReferenceObj`), so assignment is one codegen'd loop
  * per row — exactly the shape a 100 TB IVF build wants (narrow compute at
  * scan speed; the k×d matrix is kilobytes).
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid requires ARRAY<FLOAT|DOUBLE>, got ${t.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var best = 0; var bestDist = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var dist = 0.0
      val n = math.min(arr.numElements(), cent.length)
      var d = 0
      while (d < n) {
        // skip null elements (containsNull inputs are accepted): unboxing
        // a null slot would NPE here while UnsafeArrayData reads it as
        // 0.0 — both wrong; a missing dimension contributes no distance
        if (!arr.isNullAt(d)) {
          val x = (if (isFloat) arr.getFloat(d).toDouble
            else arr.getDouble(d)) - cent(d)
          dist += x * x
        }
        d += 1
      }
      if (dist < bestDist) { bestDist = dist; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
      val c = ctx.freshName("c"); val d = ctx.freshName("d")
      val n = ctx.freshName("n"); val dist = ctx.freshName("dist")
      val x = ctx.freshName("x"); val best = ctx.freshName("best")
      val bestDist = ctx.freshName("bestDist")
      val get = if (isFloat) s"(double) $arr.getFloat($d)" else s"$arr.getDouble($d)"
      s"""
         |int $best = 0; double $bestDist = Double.MAX_VALUE;
         |for (int $c = 0; $c < $cents.length; $c++) {
         |  double $dist = 0.0;
         |  int $n = java.lang.Math.min($arr.numElements(), $cents[$c].length);
         |  for (int $d = 0; $d < $n; $d++) {
         |    if (!$arr.isNullAt($d)) {
         |      double $x = ($get) - $cents[$c][$d];
         |      $dist += $x * $x;
         |    }
         |  }
         |  if ($dist < $bestDist) { $bestDist = $dist; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)

  override def prettyName: String = "nearest_centroid"
}

object NearestCentroid {
  def nearest_centroid(v: Column, centroids: Array[Array[Double]]): Column =
    GraftBridge.toColumn(
      NearestCentroid(GraftBridge.toExpression(v), centroids))
}
