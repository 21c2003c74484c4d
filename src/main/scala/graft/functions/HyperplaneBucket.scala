package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Random-hyperplane LSH bucket id: bit j of the result is the sign of
  * ⟨v, h_j⟩, with hyperplane components derived deterministically from
  * xxhash64(j, dim, seed) in [-0.5, 0.5). The hyperplane matrix is
  * materialized ONCE at expression construction and referenced from
  * generated code — the declarative formulation re-derived every component
  * per row through an 8-deep zip_with/aggregate tree.
  *
  * Accepts array<float> or array<double>; nulls elements count as 0.
  */
case class HyperplaneBucket(child: Expression, nBits: Int, dims: Int,
    seed: Long) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  // lazy: child.dataType is only valid after analysis resolves the tree
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
          s"hyperplane_bucket requires ARRAY<FLOAT|DOUBLE>, got ${t.catalogString}")
    }

  /** nBits × dims hyperplane components, same SHAPE of derivation as
    * [[VectorFunctions.hyperplaneBucket]] (hash→uniform[0,1)→shift) but a
    * DIFFERENT hash chaining — the two families produce different planes
    * and therefore different bucket ids. Never mix them within one
    * build/probe pipeline: every production path (Similarity.scala) uses
    * THIS codegen form; the declarative form exists for spec
    * cross-checking of the shape only.
    */
  @transient lazy val planes: Array[Array[Double]] =
    Array.tabulate(nBits, dims) { (j, d) =>
      val h = XXH64.hashLong(d.toLong, XXH64.hashLong(j.toLong, seed))
      (java.lang.Math.floorMod(h, 1000000L).toDouble / 1000000.0) - 0.5
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dims)
    var bucket = 0
    var j = 0
    while (j < nBits) {
      var acc = 0.0
      var d = 0
      while (d < n) {
        if (!arr.isNullAt(d)) {
          val x = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
          acc += x * planes(j)(d)
        }
        d += 1
      }
      if (acc >= 0) bucket |= (1 << j)
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
      val j = ctx.freshName("j"); val d = ctx.freshName("d")
      val acc = ctx.freshName("acc"); val n = ctx.freshName("n")
      val bucket = ctx.freshName("bucket")
      val get = if (isFloat) s"(double) $arr.getFloat($d)" else s"$arr.getDouble($d)"
      s"""
         |int $n = java.lang.Math.min($arr.numElements(), $dims);
         |int $bucket = 0;
         |for (int $j = 0; $j < $nBits; $j++) {
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    if (!$arr.isNullAt($d)) $acc += ($get) * $planesRef[$j][$d];
         |  }
         |  if ($acc >= 0) $bucket |= (1 << $j);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_bucket"
}

object HyperplaneBucket {
  def hyperplane_bucket(v: Column, nBits: Int, dims: Int = 64,
      seed: Long = 42L): Column =
    GraftBridge.toColumn(
      HyperplaneBucket(GraftBridge.toExpression(v), nBits, dims, seed))
}
