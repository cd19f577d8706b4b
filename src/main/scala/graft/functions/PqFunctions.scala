package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou et al., "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011) — the memory-compression
  * layer of the ANN index: a d-dim vector becomes `m` small codes
  * (one per d/m-dim subspace, each the id of the nearest of `k`
  * per-subspace centroids), so a 64-dim float vector (256 bytes)
  * serves from m=8 codes (8 bytes, 32×) plus one shared codebook of
  * m·k·(d/m) doubles — the layout that lets a 100 TB embedding corpus
  * keep its whole index in cluster memory.
  *
  * Both kernels follow the DotTopK pattern: one static call per row so
  * the surrounding projection stays inside whole-stage codegen, with
  * the tight loops living in compiled Scala.
  */

/** `pq_encode(v, codebook, m, k)` → `array<int>` of `m` codes.
  * `codebook` is flat, sub-major: centroid `j` of subspace `s` spans
  * `codebook[((s*k)+j)*dsub ... +dsub)`. Each code is the L2-nearest
  * centroid of that subspace's slice of `v` (ties → lowest id, so
  * encoding is deterministic). Null slots read as 0.0. */
case class PqEncode(left: Expression, right: Expression, m: Int, k: Int)
    extends BinaryExpression {

  require(m > 0 && k > 0, s"pq_encode requires m,k > 0, got ($m,$k)")

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires (array<double>, array<double>), got (${l.simpleString}, ${r.simpleString})")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(v: Any, cb: Any): Any =
    PqFunctions.encode(v.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData], m, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb) =>
      s"${ev.value} = graft.functions.PqFunctions.encode($v, $cb, $m, $k);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}

/** `pq_adc_topk(q, ids, codes, codebook, m, k, topk)` — asymmetric
  * distance computation over a PACKED code block: build the per-query
  * lookup table `lut[s][j] = <q_s, c_sj>` once (m·k small dots), then
  * score candidate `i` as `Σ_s lut[s][codes[i*m+s]]` — m table adds
  * per candidate instead of d multiply-adds, on codes 32× smaller than
  * the vectors. Returns the block's top `topk` by (score desc, id asc),
  * same ordering contract as `dot_topk`/`topk_agg` (-0.0 canonicalized).
  * The score approximates `<q, v̂_i>` (= cosine when codes encode unit
  * vectors and `q` is unit). */
case class PqAdcTopK(first: Expression, second: Expression, third: Expression,
    fourth: Expression, m: Int, k: Int, topk: Int)
    extends QuaternaryExpression {

  require(m > 0 && k > 0 && topk > 0,
    s"pq_adc_topk requires m,k,topk > 0, got ($m,$k,$topk)")

  private def idsType: DataType = second.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val qOk = first.dataType match { case ArrayType(DoubleType, _) => true; case _ => false }
    val idOk = idsType == IntegerType || idsType == LongType
    val cOk = third.dataType match { case ArrayType(IntegerType, _) => true; case _ => false }
    val cbOk = fourth.dataType match { case ArrayType(DoubleType, _) => true; case _ => false }
    if (qOk && idOk && cOk && cbOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "pq_adc_topk requires (array<double>, array<int|long>, array<int>, array<double>), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString}, ${fourth.dataType.simpleString})")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", idsType))),
    containsNull = false)

  override def prettyName: String = "pq_adc_topk"

  override protected def nullSafeEval(q: Any, ids: Any, codes: Any, cb: Any): Any =
    PqFunctions.adcTopK(q.asInstanceOf[ArrayData], ids.asInstanceOf[ArrayData],
      codes.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData],
      m, k, topk, idsType == IntegerType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, ids, codes, cb) => {
      val intId = idsType == IntegerType
      s"${ev.value} = graft.functions.PqFunctions.adcTopK($q, $ids, $codes, $cb, $m, $k, $topk, $intId);"
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression, newFourth: Expression): PqAdcTopK =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object PqFunctions {

  /** Encode one vector: per subspace, the L2-nearest codebook centroid. */
  def encode(v: ArrayData, cb: ArrayData, m: Int, k: Int): ArrayData = {
    val d = v.numElements()
    require(d % m == 0, s"pq_encode: dim $d not divisible by m=$m")
    val dsub = d / m
    require(cb.numElements() == m * k * dsub,
      s"pq_encode: codebook has ${cb.numElements()} values, expected ${m * k * dsub}")
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < k) {
        var dd = 0.0
        var t = 0
        val vBase = s * dsub
        val cBase = ((s * k) + j) * dsub
        while (t < dsub) {
          val x = (if (v.isNullAt(vBase + t)) 0.0 else v.getDouble(vBase + t)) -
            cb.getDouble(cBase + t)
          dd += x * x
          t += 1
        }
        if (dd < bestD) { bestD = dd; best = j }
        j += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  /** LUT-based scan of a packed code block, keeping the top `topk` by
    * (score desc, id asc). Insertion sort into topk-bounded arrays —
    * same trade as DotTopK/TopKAgg at small k. */
  def adcTopK(q: ArrayData, ids: ArrayData, codes: ArrayData, cb: ArrayData,
      m: Int, k: Int, topk: Int, intId: Boolean): ArrayData = {
    val d = q.numElements()
    require(d % m == 0, s"pq_adc_topk: dim $d not divisible by m=$m")
    val dsub = d / m
    require(cb.numElements() == m * k * dsub,
      s"pq_adc_topk: codebook has ${cb.numElements()} values, expected ${m * k * dsub}")
    val n = ids.numElements()
    require(codes.numElements() == n.toLong * m,
      s"pq_adc_topk: code block has ${codes.numElements()} codes, expected $n x $m")
    val qd = q.toDoubleArray()
    // per-query lookup table: lut(s*k + j) = <q_s, c_sj>
    val lut = new Array[Double](m * k)
    var s = 0
    while (s < m) {
      var j = 0
      while (j < k) {
        var acc = 0.0
        var t = 0
        val cBase = ((s * k) + j) * dsub
        while (t < dsub) { acc += qd(s * dsub + t) * cb.getDouble(cBase + t); t += 1 }
        lut(s * k + j) = acc
        j += 1
      }
      s += 1
    }
    val scores = new Array[Double](topk)
    val out = new Array[Long](topk)
    var cnt = 0
    var i = 0
    while (i < n) {
      if (!ids.isNullAt(i)) {
        var sc = 0.0
        var sub = 0
        val base = i * m
        while (sub < m) { sc += lut(sub * k + codes.getInt(base + sub)); sub += 1 }
        sc += 0.0 // canonicalize -0.0 like topk_agg
        val id = if (intId) ids.getInt(i).toLong else ids.getLong(i)
        if (cnt < topk || beats(sc, id, scores(topk - 1), out(topk - 1))) {
          var pos = math.min(cnt, topk - 1)
          while (pos > 0 && beats(sc, id, scores(pos - 1), out(pos - 1))) {
            scores(pos) = scores(pos - 1); out(pos) = out(pos - 1)
            pos -= 1
          }
          scores(pos) = sc; out(pos) = id
          if (cnt < topk) cnt += 1
        }
      }
      i += 1
    }
    new GenericArrayData((0 until cnt).map { r =>
      val idOut: Any = if (intId) out(r).toInt else out(r)
      new GenericInternalRow(Array[Any](scores(r), idOut))
    }.toArray[Any])
  }

  private def beats(s: Double, i: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s, s2 + 0.0)
    c > 0 || (c == 0 && i < i2)
  }
}
