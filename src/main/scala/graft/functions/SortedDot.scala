package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Sparse-vector dot product Σ va·vb over matching keys, for two
  * (keys, values) parallel-array pairs with keys sorted ascending and
  * duplicate-free: `sorted_dot(ka, va, kb, vb)` → bigint.
  *
  * The exact-verify kernel for weighted similarity joins (t13's
  * TF-IDF cosine): candidates carry each document's dictionary-id
  * array and its integer milli-unit weight array; the true dot
  * product is a two-pointer merge — O(|A|+|B|), zero allocation,
  * whole-stage-codegen — against which the alternative (re-exploding
  * both vectors and re-aggregating per pair) would pay a shuffle of
  * candidate×length rows. Integer weights make the sum exact in any
  * traversal order (the cross-engine-determinism requirement).
  *
  * Inputs MUST be pre-sorted by key, distinct, with values parallel
  * to keys (the caller sorts once per document, not once per pair).
  * Unsorted keys undercount; length mismatch between a key array and
  * its value array raises at evaluation.
  */
case class SortedDot(first: Expression, second: Expression,
                     third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(first, second, third, fourth).map(_.dataType) match {
      case Seq(ArrayType(LongType, _), ArrayType(LongType, _),
               ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sorted_dot requires four array<bigint> columns, got " +
          other.map(_.simpleString).mkString(", "))
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "sorted_dot"

  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable || fourth.nullable

  override def nullSafeEval(ka: Any, va: Any, kb: Any, vb: Any): Any = {
    val xk = ka.asInstanceOf[ArrayData]
    val xv = va.asInstanceOf[ArrayData]
    val yk = kb.asInstanceOf[ArrayData]
    val yv = vb.asInstanceOf[ArrayData]
    require(xk.numElements() == xv.numElements() &&
      yk.numElements() == yv.numElements(),
      "sorted_dot: keys and values must be parallel arrays")
    var i = 0
    var j = 0
    var acc = 0L
    while (i < xk.numElements() && j < yk.numElements()) {
      val cmp = java.lang.Long.compare(xk.getLong(i), yk.getLong(j))
      if (cmp == 0) { acc += xv.getLong(i) * yv.getLong(j); i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ka, va, kb, vb) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val cmp = ctx.freshName("cmp")
      s"""
         |int $nx = $ka.numElements();
         |int $ny = $kb.numElements();
         |if ($nx != $va.numElements() || $ny != $vb.numElements()) {
         |  throw new IllegalArgumentException(
         |    "sorted_dot: keys and values must be parallel arrays");
         |}
         |int $i = 0, $j = 0;
         |long $acc = 0L;
         |while ($i < $nx && $j < $ny) {
         |  int $cmp = Long.compare($ka.getLong($i), $kb.getLong($j));
         |  if ($cmp == 0) { $acc += $va.getLong($i) * $vb.getLong($j); $i++; $j++; }
         |  else if ($cmp < 0) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): SortedDot =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)
}
