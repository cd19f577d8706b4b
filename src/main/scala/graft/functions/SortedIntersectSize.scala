package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType,
  StringType}

/** |A ∩ B| for two array columns (`array<int>`, `array<long>` or
  * `array<string>`, both sides the same type) that are each sorted
  * ascending and duplicate-free.
  *
  * The natural composition — `size(array_intersect(a, b))` — builds a
  * hash set of one side and materializes the intersection array for
  * every row PAIR; on a similarity-join verify step (PPJoin's exact
  * check, millions of candidate pairs) that per-pair allocation and
  * hashing dominates the operator. Over pre-sorted inputs the same
  * number is a two-pointer merge scan: O(|A|+|B|) comparisons, zero
  * allocation, inside whole-stage codegen.
  *
  * Inputs MUST be sorted ascending and distinct (the caller sorts once
  * per document, not once per pair — that is the point); on unsorted
  * input the result undercounts. Nulls inside the arrays are not
  * supported (dedup shingle/id arrays never carry them).
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType: DataType = left.dataType match {
    case ArrayType(t, _) => t
    case other => other
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _)) if a == b &&
          (a == StringType || a == IntegerType || a == LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_size requires two arrays of the same element " +
          s"type (int, bigint or string), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sorted_intersect_size"

  override def nullable: Boolean =
    left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    val t = elemType
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      val cmp = t match {
        case IntegerType => Integer.compare(x.getInt(i), y.getInt(j))
        case LongType => java.lang.Long.compare(x.getLong(i), y.getLong(j))
        case _ => x.getUTF8String(i).compareTo(y.getUTF8String(j))
      }
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val cmp = ctx.freshName("cmp")
      val cmpExpr = elemType match {
        case IntegerType =>
          s"Integer.compare($a.getInt($i), $b.getInt($j))"
        case LongType =>
          s"Long.compare($a.getLong($i), $b.getLong($j))"
        case _ =>
          s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
      }
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  int $cmp = $cmpExpr;
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}
