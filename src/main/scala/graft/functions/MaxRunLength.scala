package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Length of the longest run of equal adjacent elements in an
  * `array<string>` — over a SORTED array, the multiplicity of its most
  * frequent element (the per-document top-n-gram count repetition
  * metrics need).
  *
  * A higher-order `aggregate` fold with a struct accumulator computes
  * the same number, but HOFs are CodegenFallback: every element
  * evaluates an interpreted expression tree and allocates a struct,
  * and the first pass over a large corpus runs tens of seconds of
  * interpreter warm-up. This expression is one generated loop of
  * UTF8String equality checks — no allocation, compiled with the
  * surrounding stage. Empty arrays yield 0.
  */
case class MaxRunLength(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"max_run_length requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "max_run_length"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n == 0) return 0L
    var best = 1L
    var run = 1L
    var i = 1
    while (i < n) {
      if (x.getUTF8String(i).equals(x.getUTF8String(i - 1))) run += 1
      else run = 1
      if (run > best) best = run
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val run = ctx.freshName("run")
      val best = ctx.freshName("best")
      s"""
         |int $n = $a.numElements();
         |long $best = $n == 0 ? 0L : 1L;
         |long $run = 1L;
         |for (int $i = 1; $i < $n; $i++) {
         |  if ($a.getUTF8String($i).equals($a.getUTF8String($i - 1))) { $run++; }
         |  else { $run = 1L; }
         |  if ($run > $best) { $best = $run; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MaxRunLength =
    copy(child = newChild)
}
