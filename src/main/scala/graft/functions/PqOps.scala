package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Whole-vector product-quantization ENCODE: one expression for all `m`
  * subspaces — per subspace the nearest-centroid index over the vector's
  * dims `[s·sub, (s+1)·sub)`, answer-identical to composing `m`
  * [[NearestCentroid]]s over `slice`s (min squared-L2, first index on
  * ties, null dims contribute no distance).
  *
  * Exists for CODE SHAPE, not semantics: `m` separate slice+centroid
  * trees inline `m` unrolled loops into the fused whole-stage method,
  * pushing it past HotSpot's 8 KB `DontCompileHugeMethods` bytecode
  * limit — Spark accepts the method (its own bailout is 64 KB) but the
  * JIT refuses it, and the hot loop runs in the bytecode interpreter
  * forever (measured ~10× on the sf0.1 encode scan). This form
  * generates ONE compact triple loop regardless of `m`, and skips the
  * per-subspace slice allocations besides.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_encode needs at least one non-empty codebook per subspace")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

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
          s"pq_encode requires ARRAY<FLOAT|DOUBLE>, got ${t.catalogString}")
    }

  private lazy val sub: Int = codebooks(0)(0).length

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = codebooks.length
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val base = s * sub
      var best = 0
      var bestDist = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var dist = 0.0
        val n = math.min(math.max(arr.numElements() - base, 0), cent.length)
        var d = 0
        while (d < n) {
          if (!arr.isNullAt(base + d)) {
            val x = (if (isFloat) arr.getFloat(base + d).toDouble
              else arr.getDouble(base + d)) - cent(d)
            dist += x * x
          }
          d += 1
        }
        if (dist < bestDist) { bestDist = dist; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cbs = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
      val out = ctx.freshName("out"); val s = ctx.freshName("s")
      val cb = ctx.freshName("cb"); val base = ctx.freshName("base")
      val best = ctx.freshName("best"); val bestDist = ctx.freshName("bestDist")
      val c = ctx.freshName("c"); val cent = ctx.freshName("cent")
      val dist = ctx.freshName("dist"); val n = ctx.freshName("n")
      val d = ctx.freshName("d"); val x = ctx.freshName("x")
      val get = if (isFloat) s"(double) $arr.getFloat($base + $d)"
        else s"$arr.getDouble($base + $d)"
      s"""
         |int[] $out = new int[$cbs.length];
         |for (int $s = 0; $s < $cbs.length; $s++) {
         |  double[][] $cb = $cbs[$s];
         |  int $base = $s * $sub;
         |  int $best = 0; double $bestDist = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $cb.length; $c++) {
         |    double[] $cent = $cb[$c];
         |    double $dist = 0.0;
         |    int $n = java.lang.Math.min(
         |      java.lang.Math.max($arr.numElements() - $base, 0), $cent.length);
         |    for (int $d = 0; $d < $n; $d++) {
         |      if (!$arr.isNullAt($base + $d)) {
         |        double $x = ($get) - $cent[$d];
         |        $dist += $x * $x;
         |      }
         |    }
         |    if ($dist < $bestDist) { $bestDist = $dist; $best = $c; }
         |  }
         |  $out[$s] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)

  override def prettyName: String = "pq_encode"
}

/** Asymmetric-distance cosine over a PQ `codes` column: per subspace one
  * lookup into the query's precomputed dot/norm tables, folded in
  * subspace order — answer-identical to the chain of `m` dot and `m`
  * norm `element_at(literal-table, codes[s] + 1)` columns it replaces
  * (same left-to-right summation order, so the float result is
  * bit-equal). Same rationale as [[PqEncode]]: 2·m inlined lookup trees
  * push the fused method past the JIT's 8 KB bytecode limit; this form
  * is one short loop over two references tables.
  */
case class PqAdcCosine(child: Expression, dotTab: Array[Array[Double]],
    normTab: Array[Array[Double]], qNorm: Double) extends UnaryExpression {

  require(dotTab.length == normTab.length && dotTab.nonEmpty,
    "pq_adc_cosine needs matching per-subspace dot/norm tables")

  override def dataType: DataType = DoubleType

  // the persisted index layouts byte-pack codes (<= 256 entries per
  // codebook), the in-flight encode keeps ints — accept both
  private lazy val isByte: Boolean = child.dataType match {
    case ArrayType(ByteType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) | ArrayType(ByteType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc_cosine requires ARRAY<INT|TINYINT> codes, got ${t.catalogString}")
    }

  // NULL semantics match the element_at chain this replaces: a null code
  // element or a code outside the table yields NULL (element_at returns
  // null out of bounds), never garbage or an exception. Byte codes are
  // unsigned-packed (up to 256 entries per codebook), so mask the signed
  // JVM byte read with & 0xFF.
  override def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[ArrayData]
    val m = math.min(dotTab.length, codes.numElements())
    var dot = 0.0
    var norm2 = 0.0
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val c = if (isByte) codes.getByte(s) & 0xFF else codes.getInt(s)
      if (c < 0 || c >= dotTab(s).length) return null
      dot += dotTab(s)(c)
      norm2 += normTab(s)(c)
      s += 1
    }
    dot / (qNorm * math.sqrt(norm2))
  }

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, codes => {
      val dt = ctx.addReferenceObj("dotTab", dotTab, "double[][]")
      val nt = ctx.addReferenceObj("normTab", normTab, "double[][]")
      val m = ctx.freshName("m"); val s = ctx.freshName("s")
      val c = ctx.freshName("c"); val dot = ctx.freshName("dot")
      val norm2 = ctx.freshName("norm2"); val bad = ctx.freshName("bad")
      val getCode =
        if (isByte) s"$codes.getByte($s) & 0xFF" else s"$codes.getInt($s)"
      s"""
         |double $dot = 0.0; double $norm2 = 0.0; boolean $bad = false;
         |int $m = java.lang.Math.min($dt.length, $codes.numElements());
         |for (int $s = 0; $s < $m; $s++) {
         |  if ($codes.isNullAt($s)) { $bad = true; break; }
         |  int $c = $getCode;
         |  if ($c < 0 || $c >= $dt[$s].length) { $bad = true; break; }
         |  $dot += $dt[$s][$c];
         |  $norm2 += $nt[$s][$c];
         |}
         |if ($bad) { ${ev.isNull} = true; }
         |else { ${ev.value} = $dot / ($qNorm * java.lang.Math.sqrt($norm2)); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqAdcCosine =
    copy(child = newChild)

  override def prettyName: String = "pq_adc_cosine"
}

object PqOps {
  def pq_encode(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftBridge.toColumn(PqEncode(GraftBridge.toExpression(v), codebooks))

  def pq_adc_cosine(codes: Column, dotTab: Array[Array[Double]],
      normTab: Array[Array[Double]], qNorm: Double): Column =
    GraftBridge.toColumn(PqAdcCosine(GraftBridge.toExpression(codes),
      dotTab, normTab, qNorm))
}
