package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Upper-triangular Gram matrix Σ q·qᵀ over quantized integer vectors
  * as ONE single-pass custom aggregate — the distributed-PCA shape
  * (one scan, one d(d+1)/2-long buffer that partial-aggregates
  * map-side, zero row blow-up).
  *
  * Input: a length-`d` array<long> per row (fixed-point quantized
  * embedding). Buffer: the running sums g[i][j] = Σ q_i·q_j for
  * i ≤ j, row-major triangle. The naive SQL formulation (posexplode
  * i × posexplode j → groupBy) materializes d(d+1)/2 rows per input
  * row — 2,080× the corpus at d=64 — where this buffer does the same
  * FLOPs in place; the shuffled state is ONE 16 KB buffer per
  * partition.
  *
  * Overflow discipline: sums stay Long (a DECIMAL(38,0) buffer
  * measured 2.6× slower in the q86 experiments); the CALLER proves
  * no wrap with the q86-style bound n·max(q)² ≤ Long.MaxValue from
  * the same aggregation job (count + max|q| ride along) and RAISES
  * loudly past it — at that corpus scale the remedy is a coarser
  * quantization (smaller QScale), never silent wraparound.
  *
  * Registered as `gram_agg(qv, d)` by GraftExtensions (d an INT
  * literal — it sizes the buffer at plan time, the jl_project
  * discipline).
  */
case class GramAgg(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val len = d * (d + 1) / 2

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](len)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == d,
        s"gram_agg: expected a length-$d vector, got ${arr.numElements()}")
      val q = arr.toLongArray()
      var k = 0
      var i = 0
      while (i < d) {
        val qi = q(i)
        var j = i
        while (j < d) {
          buf(k) += qi * q(j)
          k += 1
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var k = 0
    while (k < len) { a(k) += b(k); k += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(len * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(len)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramAgg =
    copy(child = newChildren.head)
}
