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
}
