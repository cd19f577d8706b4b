package graft

import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union}
import org.apache.datasketches.memory.Memory

/** Round-15 scratch probe: is a DataSketches HLL union's estimate
  * sensitive to fold structure/order (flat vs two-level, forward vs
  * reverse)? Decides whether q97's local replay can be bit-identical. */
object HllProbe {
  def sk(xs: Seq[Long]): Array[Byte] = {
    val h = new HllSketch(10, TgtHllType.HLL_8)
    xs.foreach(h.update)
    h.toUpdatableByteArray
  }
  def est(b: Array[Byte]): Long =
    Math.round(HllSketch.heapify(Memory.wrap(b)).getEstimate)

  def main(args: Array[String]): Unit = {
    val items = (1L to 600L)
    val singles = items.map(x => sk(Seq(x)))
    def flatU(bs: Seq[Array[Byte]]): Array[Byte] = {
      val u = new Union(10)
      bs.foreach(b => u.update(HllSketch.wrap(Memory.wrap(b))))
      u.toUpdatableByteArray
    }
    val flat = flatU(singles)
    val parts = singles.grouped(150).map(flatU).toSeq
    val twoLevel = flatU(parts)
    println(s"direct=${est(sk(items))} flat=${est(flat)} twoLevel=${est(twoLevel)} flatRev=${est(flatU(singles.reverse))}")
    val a = sk(1L to 400L)
    val b2 = sk(300L to 700L)
    println(s"dense ab=${est(flatU(Seq(a, b2)))} ba=${est(flatU(Seq(b2, a)))} direct=${est(sk(1L to 700L))}")
    // merge path: Union deserialized from gadget bytes then merged
    val m1 = new Union(10); m1.update(HllSketch.wrap(Memory.wrap(a)))
    val m2 = new Union(10); m2.update(HllSketch.wrap(Memory.wrap(b2)))
    val mm = new Union(10)
    mm.update(HllSketch.wrap(Memory.wrap(m1.toUpdatableByteArray)))
    mm.update(HllSketch.wrap(Memory.wrap(m2.toUpdatableByteArray)))
    println(s"mergePath=${est(mm.toUpdatableByteArray)}")
  }
}
