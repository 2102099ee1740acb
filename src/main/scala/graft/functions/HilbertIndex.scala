package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen'd Hilbert-curve index over two 16-bit coordinates — the
  * locality-preserving alternative to the Morton interleave
  * ([[graft.operators.Layout]]): the Hilbert curve never takes the long
  * diagonal jumps the Z curve takes at bit boundaries, so range buckets of
  * the index have tighter per-bucket x/y envelopes (measured in q196).
  *
  * WHY a custom Expression and not column arithmetic: the standard xy→d
  * transform (Wikipedia's public-domain formulation) mutates (x, y, d)
  * across 16 rotation steps. Unrolled as nested CASE column expressions the
  * tree TRIPLES per step — rx/ry feed d, x and y — and Catalyst's
  * CollapseProject happily inlines it into a 3¹⁶-node projection; 16
  * chained materializations would instead rewrite the table per step. A
  * generated Java loop is O(16) per row inside whole-stage codegen — the
  * textbook case for dropping to `doGenCode` (SURVEY §4.3 preference (b)).
  *
  * Coordinates are masked to 16 bits; the index covers 0 .. 2³² − 1, the
  * same domain as the Morton interleave it's compared against.
  */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two BIGINT arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def nullSafeEval(l: Any, r: Any): Any = {
    var x = l.asInstanceOf[Long] & 0xFFFFL
    var y = r.asInstanceOf[Long] & 0xFFFFL
    var d = 0L
    var s = 32768L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the quadrant so the sub-curve enters/exits correctly
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $l & 0xFFFFL;
         |long $y = $r & 0xFFFFL;
         |long $d = 0L;
         |for (long $s = 32768L; $s > 0L; $s >>= 1) {
         |  long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) {
         |      $x = $s - 1L - $x;
         |      $y = $s - 1L - $y;
         |    }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_hilbert"
}
