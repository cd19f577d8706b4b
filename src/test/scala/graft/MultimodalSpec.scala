package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends GraftSpecBase {

  test("payload byte length matches source text utf-8 length") {
    import spark.implicits._
    val bad = Multimodal.mm1BinaryMeta(spark, sf)
      .join(Tables.documents(spark, sf), "doc_id")
      .filter($"n_bytes" =!= octet_length($"text"))
    assert(bad.count() == 0)
  }

  test("frame sampling keeps every 4th frame with correct checksums") {
    import spark.implicits._
    val frames = Multimodal.mm2FrameSample(spark, sf).collect()
    assert(frames.nonEmpty)
    frames.foreach(r => assert(r.getAs[Int]("frame_idx") % Multimodal.SampleEvery == 0))
    // recompute one doc's frames locally against the fake codec
    val doc = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].head()
    val expect = Multimodal.FakeCodec.decodeFrames(doc._2.getBytes("UTF-8"))
      .filter(_._1 % Multimodal.SampleEvery == 0).toSeq
    val got = frames.filter(_.getAs[Long]("doc_id") == doc._1)
      .map(r => (r.getAs[Int]("frame_idx"), r.getAs[Long]("frame_crc"))).toSeq
    assert(got == expect)
  }

  test("cdc chunks reassemble the payload exactly") {
    import spark.implicits._
    val chunks = Multimodal.mm3CdcChunks(spark, sf).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val lens = Tables.documents(spark, sf)
      .select($"doc_id", octet_length($"text")).as[(Long, Int)].collect().toMap
    chunks.foreach { case (id, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("chunk_idx"))
      var expectOff = 0
      sorted.foreach { r =>
        assert(r.getAs[Int]("offset") == expectOff)
        expectOff += r.getAs[Int]("len")
      }
      assert(expectOff == lens(id), s"doc $id reassembles to $expectOff != ${lens(id)}")
    }
  }

  test("cdc boundaries resynchronize after a prefix insertion") {
    val base = Tables.documents(spark, sf)
      .orderBy(org.apache.spark.sql.functions.col("doc_id"))
      .select("text").as[String](spark.implicits.newStringEncoder).head()
      .getBytes("UTF-8")
    val shifted = ("INSERTED PREFIX " .getBytes("UTF-8")) ++ base
    val a = Multimodal.Cdc.chunks(base).map(_._3).toSet
    val b = Multimodal.Cdc.chunks(shifted).map(_._3).toSet
    val overlap = a.intersect(b).size.toDouble / a.size
    assert(overlap >= 0.5, s"only ${a.intersect(b).size}/${a.size} chunks survived the shift")
  }

  test("frame count scales with payload size") {
    import spark.implicits._
    val counts = Multimodal.mm2FrameSample(spark, sf)
      .groupBy($"doc_id").agg(count(lit(1)).as("n_frames"))
      .join(Tables.documents(spark, sf), "doc_id")
      .filter($"n_frames" =!=
        ceil(ceil(octet_length($"text") / lit(Multimodal.FrameBytes.toDouble))
          / lit(Multimodal.SampleEvery.toDouble)))
    assert(counts.count() == 0)
  }

  test("perceptual hash: deterministic, edit-tolerant, zero for exact copies") {
    val base = Array.tabulate(520)(i => ((i * 31 + 7) % 251).toByte)
    val h = Multimodal.perceptualHash(base)
    assert(h == Multimodal.perceptualHash(base.clone()))
    assert(java.lang.Long.bitCount(h ^ Multimodal.perceptualHash(base)) == 0)
    // a 3-byte insertion shifts every downstream bucket slightly; the
    // coarse averages keep the hash hamming-close
    val edited = base.take(100) ++ Array[Byte](1, 2, 3) ++ base.drop(100)
    val d = java.lang.Long.bitCount(h ^ Multimodal.perceptualHash(edited))
    assert(d <= 12, s"insertion moved $d bits")
  }

  test("mm4 phash index covers every payload deterministically") {
    import spark.implicits._
    val a = Multimodal.mm4Phash(spark, sf).as[(Long, Long)].collect().toSeq
    val b = Multimodal.mm4Phash(spark, sf).as[(Long, Long)].collect().toSeq
    assert(a == b)
    assert(a.size == Tables.documents(spark, sf).count())
  }

  test("mm5: byte-local-edit corpus — pair recall/precision and real hash movement") {
    import spark.implicits._
    val ids = Tables.documents(spark, sf).select($"doc_id").as[Long]
      .collect().toSet
    val truth = (for {
      a <- ids; b <- ids
      if a < b && a / Multimodal.Mm5GroupSize == b / Multimodal.Mm5GroupSize
    } yield (a, b)).toSet
    val rows = Multimodal.mm5PhashPairs(spark, sf)
      .select($"id_a", $"id_b", $"hamming", $"same_group")
      .as[(Long, Long, Int, Boolean)].collect().toSeq
    val found = rows.map(r => (r._1, r._2)).toSet
    // every detected pair is a true near-duplicate (the seeded base
    // rasters of different groups are hamming-far by construction)
    assert(rows.forall(_._4), s"cross-group pairs: ${rows.filterNot(_._4)}")
    // recall band (measured 1.000 at sf0.001/sf0.01 — the 3-byte +64
    // local edit moves ≤ 2 bucket averages, ≤ 3 comparator bits)
    val recall = found.intersect(truth).size.toDouble / truth.size
    assert(recall >= 0.95, s"pair recall $recall")
    // the corpus genuinely exercises the tolerance: a good share of
    // true pairs differ in ≥ 1 hash bit yet are still caught
    assert(rows.count(_._3 >= 1) >= truth.size / 10,
      s"only ${rows.count(_._3 >= 1)} caught pairs moved any hash bit")
    // determinism
    val again = Multimodal.mm5PhashPairs(spark, sf)
      .select($"id_a", $"id_b", $"hamming", $"same_group")
      .as[(Long, Long, Int, Boolean)].collect().toSeq
    assert(rows.sorted == again.sorted)
  }

  test("phash pigeonhole pairs equal brute-force hamming<=3 (constructed hashes)") {
    import spark.implicits._
    // copies and k-bit variants of a base hash — exactly what decoded
    // near-identical images produce
    val base = 0x5a5a_1234_9abc_def0L
    val hashes = Seq[(Long, Long)](
      (1L, base), (2L, base),                       // exact copy: hamming 0
      (3L, base ^ 1L), (4L, base ^ ((1L << 5) | (1L << 63))), // 1-,2-bit variants
      (5L, base ^ ((1L << 7) | (1L << 23) | (1L << 41) | (1L << 59))), // 4 bits: out
      (6L, ~base))                                  // far away
    val got = Multimodal.phashPairs(hashes.toDF("doc_id", "phash"))
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val want = (for {
      (a, ha) <- hashes; (b, hb) <- hashes
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    assert(got == want)
    assert(want.contains((1L, 2L)) && want.contains((1L, 3L)) && !want.contains((1L, 5L)))
  }
}
