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
