package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k by score as a single-pass custom aggregate.
  *
  * Input: (score double, id long) per row; `k` a literal. Buffer: at
  * most k (score, id) entries kept in (score desc, id asc) order by
  * linear insertion — k is single-digit, so insertion beats a heap.
  * Result: array<struct<score,id>> in rank order.
  *
  * This is the serving-path replacement for `row_number().over(...)
  * <= k`: a window rank materializes and SORTS every candidate row
  * (the dominant cost when candidates ≫ k·groups), while this
  * aggregate partial-aggregates map-side, so each partition ships at
  * most k rows per group to the shuffle — the same reduction MLlib's
  * blocked recommendForAll uses internally, expressed as a reusable
  * Catalyst aggregate. Registered as `topk_agg` by GraftExtensions.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buf] {

  private lazy val k: Int = kExpr.eval(null).asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(score, id, kExpr)
  override def nullable: Boolean = false
  // the id field keeps the child's integral type (int item ids from
  // MLlib factors, long doc/vec ids from the lake tables)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", id.dataType))),
    containsNull = false)
  override def prettyName: String = "topk_agg"

  override def createAggregationBuffer(): TopKAgg.Buf =
    new TopKAgg.Buf(new Array[Double](k), new Array[Long](k), 0)

  // rank order: score desc, id asc (deterministic ties).
  // Double.compare gives the same total order Spark's descending sort
  // uses (NaN greatest) — a plain `>` would rank NaN scores LAST and
  // diverge from the row_number formulation this aggregate replaces.
  // One divergence remains in raw Double.compare: it orders -0.0 < 0.0
  // while Spark's nanSafeCompareDoubles treats them equal (tie-break by
  // id). `+ 0.0` canonicalizes -0.0 to 0.0 (NaN stays NaN), restoring
  // exact parity with the window formulation.
  private def beats(s: Double, i: Long, buf: TopKAgg.Buf, pos: Int): Boolean = {
    val c = java.lang.Double.compare(s + 0.0, buf.scores(pos) + 0.0)
    c > 0 || (c == 0 && i < buf.ids(pos))
  }

  private def insert(buf: TopKAgg.Buf, s: Double, i: Long): Unit = {
    if (buf.n == k && !beats(s, i, buf, k - 1)) return
    var pos = math.min(buf.n, k - 1)
    while (pos > 0 && beats(s, i, buf, pos - 1)) {
      buf.scores(pos) = buf.scores(pos - 1); buf.ids(pos) = buf.ids(pos - 1)
      pos -= 1
    }
    buf.scores(pos) = s; buf.ids(pos) = i
    if (buf.n < k) buf.n += 1
  }

  override def update(buf: TopKAgg.Buf, input: InternalRow): TopKAgg.Buf = {
    val sv = score.eval(input)
    val iv = id.eval(input)
    if (sv != null && iv != null)
      insert(buf, sv.asInstanceOf[Double], iv.asInstanceOf[Number].longValue())
    buf
  }

  override def merge(a: TopKAgg.Buf, b: TopKAgg.Buf): TopKAgg.Buf = {
    var i = 0
    while (i < b.n) { insert(a, b.scores(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buf: TopKAgg.Buf): Any = {
    val intId = id.dataType == IntegerType
    new GenericArrayData((0 until buf.n).map { i =>
      val idOut: Any = if (intId) buf.ids(i).toInt else buf.ids(i)
      new GenericInternalRow(Array[Any](buf.scores(i), idOut))
    }.toArray[Any])
  }

  override def serialize(buf: TopKAgg.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val s = bb.getDouble(); val id0 = bb.getLong()
      buf.scores(i) = s; buf.ids(i) = id0; i += 1
    }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
}

object TopKAgg {
  /** k-bounded (score, id) entries, rank-ordered. */
  final class Buf(val scores: Array[Double], val ids: Array[Long], var n: Int)
}
