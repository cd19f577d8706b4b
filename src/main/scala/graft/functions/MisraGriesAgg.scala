package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary as a mergeable custom aggregate
  * (Misra & Gries 1982; merge rule from Agarwal et al., "Mergeable
  * Summaries", PODS'12).
  *
  * Input: one item per row; `capacity` a literal. Buffer: at most
  * `capacity` (item, counter) pairs — a new item over capacity
  * decrements EVERY counter by 1 and drops zeros (amortized O(1):
  * each decrement event retires capacity+1 units of total count, so
  * there are at most N/(capacity+1) events across N updates). Merge:
  * sum counters pointwise, then if over capacity subtract the
  * (capacity+1)-th largest counter from all and drop non-positives —
  * the PODS'12 rule that keeps the summary's guarantee closed under
  * merging, which is what makes it a Spark aggregate: partials build
  * map-side, combine at every exchange, and the wire cost is the
  * FIXED buffer, never the distinct-item cardinality.
  *
  * Guarantee (both directions, spec-pinned): for every item,
  * true − N/(capacity+1) ≤ estimate ≤ true, and any item with
  * frequency > N/(capacity+1) is guaranteed present. This is t6's
  * 100 TB twin: the exact heavy-hitter table shuffles every distinct
  * token; this ships ≤ capacity entries per partition, full stop.
  *
  * Result: array<struct<token,est>> in (est desc, token asc) order.
  * Registered as `misra_gries_agg` by GraftExtensions.
  */
case class MisraGriesAgg(
    child: Expression,
    capExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.HashMap[String, Long]] {

  private lazy val cap: Int = capExpr.eval(null).asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, capExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("token", StringType), StructField("est", LongType))),
    containsNull = false)
  override def prettyName: String = "misra_gries_agg"

  override def createAggregationBuffer(): scala.collection.mutable.HashMap[String, Long] =
    scala.collection.mutable.HashMap.empty[String, Long]

  override def update(buf: scala.collection.mutable.HashMap[String, Long],
      input: InternalRow): scala.collection.mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.toString
      val cur = buf.getOrElse(item, 0L)
      if (cur > 0L || buf.size < cap) buf.update(item, cur + 1L)
      else {
        // decrement-all: retire one unit from every tracked counter
        val dead = scala.collection.mutable.ArrayBuffer.empty[String]
        buf.mapValuesInPlace { (_, c) => c - 1L }
        buf.foreach { case (k, c) => if (c <= 0L) dead += k }
        dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: scala.collection.mutable.HashMap[String, Long],
      b: scala.collection.mutable.HashMap[String, Long])
      : scala.collection.mutable.HashMap[String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > cap) {
      // subtract the (cap+1)-th largest counter, drop non-positives
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - cap - 1)
      val dead = scala.collection.mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace { (_, c) => c - sub }
      a.foreach { case (k, c) => if (c <= 0L) dead += k }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: scala.collection.mutable.HashMap[String, Long]): Any = {
    val entries = buf.toArray.sortBy { case (k, c) => (-c, k) }
    new GenericArrayData(entries.map { case (k, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(k), c))
    })
  }

  override def serialize(buf: scala.collection.mutable.HashMap[String, Long])
      : Array[Byte] = {
    val items = buf.toArray
    val bytes = items.map { case (k, _) => k.getBytes(StandardCharsets.UTF_8) }
    val bb = ByteBuffer.allocate(4 + bytes.map(_.length + 12).sum)
    bb.putInt(items.length)
    items.indices.foreach { i =>
      bb.putInt(bytes(i).length); bb.put(bytes(i)); bb.putLong(items(i)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : scala.collection.mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = bb.getInt(); val b = new Array[Byte](len); bb.get(b)
      m.update(new String(b, StandardCharsets.UTF_8), bb.getLong())
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren(0), capExpr = newChildren(1))
}
