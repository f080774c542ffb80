package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** Hilbert-curve index of a 2-D point — the space-filling key behind
  * Hilbert-ordered data layouts (the curve every neighboring cell
  * pair of which is also adjacent in key space, unlike the Morton/
  * z-order interleave whose quadrant seams "jump" across the plane
  * and stretch file bounding boxes).
  *
  * Engine rationale: the standard xy→d walk rotates/reflects the
  * frame at every one of the `bits` levels — as a composed Column
  * expression the rotated (x, y) feed the next level SYMBOLICALLY,
  * so the expression tree doubles per level (2^bits nodes at
  * bits=16); as generated code it is one flat 16-iteration loop of
  * primitive long arithmetic. Same native-loop argument as PqEncode.
  *
  * Algorithm: the classical bit-interleaving Hilbert walk (Warren,
  * Hacker's Delight §16-2 shape): per level s = 2^(bits-1)..1, add
  * s²·((3·rx) xor ry) and rotate the lower quadrant into place.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ExpectsInputTypes {

  require(bits >= 1 && bits <= 31, s"bits out of range: $bits")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_hilbert"

  def xy2d(xi: Long, yi: Long): Long = {
    var x = xi
    var y = yi
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override def nullSafeEval(xv: Any, yv: Any): Any =
    xy2d(xv.asInstanceOf[Long], yv.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xa, ya) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      s"""
         |long $x = $xa;
         |long $y = $ya;
         |long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) {
         |      $x = $s - 1 - $x;
         |      $y = $s - 1 - $y;
         |    }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
