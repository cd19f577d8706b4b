package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata alongside; decode/feature-extract runs
  * batched per partition so a real codec would amortize init cost.
  *
  * No media libraries exist in this environment, so `FakeCodec` is a
  * clearly-marked deterministic stand-in: it "decodes" a payload into
  * fixed-size frames and per-frame checksums. The Spark-side contract
  * — schema, batching, partition-local decode, explode shape — is the
  * real, tested part; swap `FakeCodec.decodeFrames` for an actual
  * codec binding and nothing else changes.
  */
object Multimodal {

  /** The documents table with its text re-materialized as a binary
    * payload column + typed metadata — the multimodal row layout. */
  def withPayload(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id",
        encode($"text", "UTF-8").as("payload"),
        $"source".as("media_source"),
        $"n_chars")
  }

  /** MM1: payload metadata extraction — byte length + content digest,
    * all codegen expressions over the binary column. */
  def mm1BinaryMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    withPayload(s, dir)
      .select($"doc_id",
        length($"payload").as("n_bytes"),
        md5($"payload").as("digest"))
      .orderBy($"doc_id")
  }

  val FrameBytes = 16
  val SampleEvery = 4 // keep every 4th frame

  /** STUB boundary: a real implementation binds an image/audio/video
    * codec here (e.g. via JNI); this deterministic fake slices the
    * payload into FrameBytes-sized frames and fingerprints each. The
    * signature — bytes in, iterator of (frameIdx, checksum) out — is
    * what a real codec would satisfy. */
  object FakeCodec {
    def decodeFrames(payload: Array[Byte]): Iterator[(Int, Long)] = {
      val crc = new java.util.zip.CRC32()
      payload.grouped(FrameBytes).zipWithIndex.map { case (chunk, i) =>
        crc.reset(); crc.update(chunk)
        (i, crc.getValue)
      }
    }
  }

  final case class FrameRow(doc_id: Long, frame_idx: Int, frame_crc: Long)

  /** MM2: partition-batched decode + every-Nth frame sampling. The
    * mapPartitions boundary is where codec init amortizes; everything
    * before/after stays columnar. */
  def mm2FrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    withPayload(s, dir)
      .select($"doc_id", $"payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // codec init would happen once per partition, here:
        rows.flatMap { case (id, payload) =>
          FakeCodec.decodeFrames(payload)
            .filter { case (i, _) => i % SampleEvery == 0 }
            .map { case (i, c) => FrameRow(id, i, c) }
        }
      }
      .toDF()
      .orderBy($"doc_id", $"frame_idx")
  }
}
