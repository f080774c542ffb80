package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization encoder: all M subspace codeword ids of an
  * array<double> vector in ONE codegen'd expression.
  *
  * Engine rationale: the composed formulation (per subspace, an
  * array_min over K struct literals each carrying an unrolled dot
  * product) generates M·K struct expressions — at M=16, K=16 the
  * generated processNext() exceeds janino's 64 KB method limit and
  * the hottest scan in the PQ path silently falls back to interpreted
  * execution. Here the codebooks ride along as one reference object
  * (constant-pool entry, not code), and the encode is three nested
  * primitive loops — small generated code, no per-row allocation
  * beyond the output array.
  *
  * Semantics are bit-identical to the composed form (pinned in
  * VectorExprSpec): per subspace m, code = argmin_j of
  * (c_mj·c_mj − 2·dot(sub_m, c_mj)) with first-minimum tie-break,
  * sequential left-to-right accumulation in every dot product.
  */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with ExpectsInputTypes {

  private val m: Int = codebooks.length
  private val k: Int = codebooks.head.length
  private val subDim: Int = codebooks.head.head.length

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  // [m*k + j] -> codeword array / its self-dot, flattened once
  @transient private lazy val cbFlat: Array[Array[Double]] =
    codebooks.flatMap(_.map(_.toArray)).toArray
  @transient private lazy val ccFlat: Array[Double] = cbFlat.map { c =>
    var s = 0.0; var t = 0
    while (t < c.length) { s += c(t) * c(t); t += 1 }
    s
  }

  private def encode(a: ArrayData): Array[Int] = {
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val base = mi * subDim
      var best = Double.PositiveInfinity
      var bestJ = 0
      var j = 0
      while (j < k) {
        val c = cbFlat(mi * k + j)
        var dt = 0.0
        var t = 0
        while (t < subDim) { dt += a.getDouble(base + t) * c(t); t += 1 }
        val dist = ccFlat(mi * k + j) - 2.0 * dt
        if (dist < best) { best = dist; bestJ = j }
        j += 1
      }
      codes(mi) = bestJ
      mi += 1
    }
    codes
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(encode(input.asInstanceOf[ArrayData]))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cb = ctx.addReferenceObj("cbFlat", cbFlat, "double[][]")
      val cc = ctx.addReferenceObj("ccFlat", ccFlat, "double[]")
      val codes = ctx.freshName("codes")
      val mi = ctx.freshName("mi")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val c = ctx.freshName("c")
      val dt = ctx.freshName("dt")
      val dist = ctx.freshName("dist")
      val best = ctx.freshName("best")
      val bestJ = ctx.freshName("bestJ")
      s"""
         |int[] $codes = new int[$m];
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  double $best = Double.POSITIVE_INFINITY;
         |  int $bestJ = 0;
         |  for (int $j = 0; $j < $k; $j++) {
         |    double[] $c = $cb[$mi * $k + $j];
         |    double $dt = 0.0;
         |    for (int $t = 0; $t < $subDim; $t++) {
         |      $dt += $a.getDouble($mi * $subDim + $t) * $c[$t];
         |    }
         |    double $dist = $cc[$mi * $k + $j] - 2.0 * $dt;
         |    if ($dist < $best) { $best = $dist; $bestJ = $j; }
         |  }
         |  $codes[$mi] = $bestJ;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
