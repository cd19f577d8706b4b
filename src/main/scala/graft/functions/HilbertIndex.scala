package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** 2-D HILBERT-CURVE index: maps (x, y) on the 2^bits × 2^bits grid to
  * the point's position d along the Hilbert space-filling curve
  * (Hilbert 1891; the iterative quadrant-rotation form is the standard
  * published xy→d conversion). The Hilbert curve is the layout twin of
  * z1's Morton interleave with strictly better locality: CONSECUTIVE
  * index values are always Manhattan-adjacent cells (|Δx|+|Δy| = 1 —
  * the property z-order lacks at every power-of-two boundary, where
  * the Z jumps across the grid), so contiguous index ranges cover
  * tighter bounding boxes and file-level min-max stats prune more.
  *
  * Algorithm (top-down, one quadrant bit per level): at scale s the
  * quadrant (rx, ry) contributes s²·((3·rx) XOR ry) curve cells, then
  * the coordinate frame rotates/reflects so the sub-quadrant recursion
  * sees the canonical orientation — the standard loop:
  *
  *   for (s = 2^(bits-1); s > 0; s >>= 1) {
  *     rx = (x & s) > 0; ry = (y & s) > 0;
  *     d += s·s·((3·rx) ^ ry);
  *     if (ry == 0) { if (rx == 1) { x = s-1-x; y = s-1-y }; swap(x,y) }
  *   }
  *
  * Like jl_project, a HOF/unrolled-column formulation either falls out
  * of codegen or blows up the expression tree (each level reads the
  * previous level's x AND y several times — the composed tree is
  * exponential); this expression is one generated loop, compiled with
  * the surrounding stage, identical arithmetic to the oracle's
  * unrolled CTE replay (Layout.hilbertStepSql).
  *
  * Domain is guarded LOUDLY: a coordinate outside [0, 2^bits) would
  * silently fold distant cells onto the same curve position — a wrong
  * layout, not an error you can see — so out-of-range inputs throw.
  * `bits` ≤ 31 keeps s² and d (< 4^bits) inside int64.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31,
    s"hilbert_xy2d: bits must be in [1, 31], got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_xy2d requires (bigint, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType

  override def prettyName: String = "hilbert_xy2d"

  private def checkDomain(x: Long, y: Long): Unit =
    if (((x | y) >>> bits) != 0L || x < 0L || y < 0L)
      throw new IllegalArgumentException(
        s"hilbert_xy2d: coordinate ($x, $y) outside [0, 2^$bits) — " +
          "a silent fold would corrupt the layout")

  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long]
    var y = b.asInstanceOf[Long]
    checkDomain(x, y)
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0L) {
      val rx = if ((x & s) > 0L) 1L else 0L
      val ry = if ((y & s) > 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $a;
         |long $y = $b;
         |if ((($x | $y) >>> $bits) != 0L || $x < 0L || $y < 0L) {
         |  throw new IllegalArgumentException(
         |    "hilbert_xy2d: coordinate (" + $x + ", " + $y +
         |    ") outside [0, 2^$bits) - a silent fold would corrupt the layout");
         |}
         |long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0L; $s >>= 1) {
         |  long $rx = ($x & $s) > 0L ? 1L : 0L;
         |  long $ry = ($y & $s) > 0L ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}
