package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Top-k inner products of a query vector against a PACKED candidate
  * block: `dot_topk(q, ids, flat, k)` where `flat` holds the block's
  * candidate vectors concatenated (`flat.length == ids.length * q.length`)
  * and returns `array<struct<score double, id>>` — the block's top `k`
  * candidates by (score desc, id asc).
  *
  * This is the IVF-Flat serving kernel (Johnson et al. 2017 keep each
  * inverted list as one contiguous vector block for exactly this scan):
  * scoring a probed cluster becomes ONE expression evaluation running a
  * branch-free multiply-add loop over a flat double array, instead of a
  * join that materializes |cluster| candidate rows per probe and pushes
  * each through a per-row aggregate update. The row count entering the
  * final per-user combine drops from users × probes × |cluster| to
  * users × probes × k.
  *
  * Ordering matches `topk_agg` exactly: score desc with -0.0
  * canonicalized (NaN greatest, as in Spark's descending sort), id asc
  * on ties. Scores are RAW dots — quantize/round after selection
  * (rounding is monotonic, so display rounding never reorders).
  */
case class DotTopK(first: Expression, second: Expression, third: Expression, k: Int)
    extends TernaryExpression {

  require(k > 0, s"dot_topk requires k > 0, got $k")

  private def idsType: DataType = second.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val qOk = first.dataType match {
      case ArrayType(DoubleType, _) => true; case _ => false
    }
    val idOk = idsType == IntegerType || idsType == LongType
    val fOk = third.dataType match {
      case ArrayType(DoubleType, _) => true; case _ => false
    }
    if (qOk && idOk && fOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "dot_topk requires (array<double>, array<int|long>, array<double>), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", idsType))),
    containsNull = false)

  override def prettyName: String = "dot_topk"

  override protected def nullSafeEval(q: Any, ids: Any, flat: Any): Any =
    DotTopK.compute(q.asInstanceOf[ArrayData], ids.asInstanceOf[ArrayData],
      flat.asInstanceOf[ArrayData], k, idsType == IntegerType)

  // one static call per row — the scan loop lives in compute(), so the
  // surrounding projection stays inside whole-stage codegen
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, ids, flat) => {
      val intId = idsType == IntegerType
      s"${ev.value} = graft.functions.DotTopK.compute($q, $ids, $flat, $k, $intId);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): DotTopK =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object DotTopK {

  /** Scan the packed block and keep the top `k` by (score desc, id asc).
    * Insertion sort into k-bounded arrays — k is single-digit, same
    * trade as TopKAgg. Candidates with a null id or any null vector
    * slot are skipped (they cannot be ranked). */
  def compute(q: ArrayData, ids: ArrayData, flat: ArrayData,
      k: Int, intId: Boolean): ArrayData = {
    val d = q.numElements()
    val n = ids.numElements()
    if (flat.numElements() != n * d)
      throw new IllegalArgumentException(
        s"dot_topk: flat block has ${flat.numElements()} values, expected " +
          s"$n candidates x $d dims")
    val qd = q.toDoubleArray() // d is small (embedding/factor rank)
    val scores = new Array[Double](k)
    val out = new Array[Long](k)
    var m = 0
    var i = 0
    while (i < n) {
      if (!ids.isNullAt(i)) {
        var s = 0.0
        var ok = true
        var j = 0
        val base = i * d
        while (j < d) {
          if (flat.isNullAt(base + j)) { ok = false; j = d }
          else { s += qd(j) * flat.getDouble(base + j); j += 1 }
        }
        if (ok) {
          val id = if (intId) ids.getInt(i).toLong else ids.getLong(i)
          // canonicalize -0.0 like topk_agg so ties break by id, not sign
          val sc = s + 0.0
          if (m < k || beats(sc, id, scores(k - 1), out(k - 1))) {
            var pos = math.min(m, k - 1)
            while (pos > 0 && beats(sc, id, scores(pos - 1), out(pos - 1))) {
              scores(pos) = scores(pos - 1); out(pos) = out(pos - 1)
              pos -= 1
            }
            scores(pos) = sc; out(pos) = id
            if (m < k) m += 1
          }
        }
      }
      i += 1
    }
    new GenericArrayData((0 until m).map { r =>
      val idOut: Any = if (intId) out(r).toInt else out(r)
      new GenericInternalRow(Array[Any](scores(r), idOut))
    }.toArray[Any])
  }

  private def beats(s: Double, i: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s, s2 + 0.0)
    c > 0 || (c == 0 && i < i2)
  }
}
