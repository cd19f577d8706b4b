package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 64-slot MinHash signature as a single-pass custom aggregate.
  *
  * Input: one reduced shingle hash per row (`x < 2^31`). Buffer: the
  * running minimum of each of the 64 fixed permutations
  * `(a_i·x + b_i) mod p` over the field p = 2^31−1 (x, a_i, b_i < p,
  * so the product stays below 2^62 — no Long overflow). Result: the
  * 64-long signature array — bit-identical to composing 64 separate
  * `min(pmod(...))` aggregate columns, but ONE buffer update per row
  * instead of 64 aggregate columns each re-evaluating its permutation
  * expression, and a 512-byte buffer that partial-aggregates map-side.
  *
  * The modulus must be SMALLER than the product range or the family
  * degenerates: the first build used M = 2^61−1 with a_i < 2^30 and
  * x < 2^31, so a_i·x + b_i < 2^61 never wrapped — every "permutation"
  * was order-preserving, argmin h_i = argmin x for all 64 slots, and
  * the whole signature collapsed to a function of min(x): estimated
  * Jaccard read 0.0 or 1.0 and nothing between (found by the q62-LSH
  * recall spec; p = 2^31−1 wraps on essentially every product).
  *
  * Registered as `minhash_agg` by GraftExtensions.
  */
case class MinHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  import MinHashAgg._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(NumHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var i = 0
      while (i < NumHashes) {
        val h = (x * PermA(i) + PermB(i)) % MersennePrime
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < NumHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(NumHashes * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(NumHashes)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}

object MinHashAgg {
  val NumHashes = 64
  val MersennePrime: Long = (1L << 31) - 1

  /** Fixed seeded permutation coefficients in [1, p−1] / [0, p−1],
    * shared with the composed 64-column reference formulation so the
    * two are bit-comparable. */
  val Perms: Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(NumHashes)((rnd.nextInt(Int.MaxValue - 1).toLong + 1,
      rnd.nextInt(Int.MaxValue).toLong))
  }
  private val PermA: Array[Long] = Perms.map(_._1).toArray
  private val PermB: Array[Long] = Perms.map(_._2).toArray
}
