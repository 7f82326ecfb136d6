package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked DETERMINISTIC STUB ([[StubDecoder.decode]]) — what is
  * real and tested is the Spark-side shape a 100 TB media pipeline needs:
  * binary payload column + metadata, `mapPartitions` over batches (the
  * Scala analogue of `mapInPandas` — one decoder init per partition, not
  * per row), a schema that survives columnar scan pruning, and partition
  * sizing driven by payload bytes rather than row count.
  */
object MultimodalOps {

  /** Input row: payload + metadata (what a real media table stores). */
  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted features (what a real decoder emits). */
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Long,
      height: Long,
      n_frames: Long,
      first_byte: Long)

  /** STUB: stands in for an image/audio decoder (libs absent in this
    * container). Deterministic pure function of the payload + id so the
    * pipeline is testable end-to-end; swap with a real codec on a cluster
    * (one decoder instance per partition — see mapPartitions below). */
  object StubDecoder {
    def decode(r: MediaRow): MediaFeatures = {
      val n = r.payload.length.toLong
      MediaFeatures(
        doc_id = r.doc_id,
        media_type = r.media_type,
        n_bytes = n,
        width = (r.doc_id * 37) % 640 + 16,
        height = (r.doc_id * 23) % 480 + 16,
        n_frames = n / 64 + 1,
        first_byte = if (n > 0) r.payload(0) & 0xffL else -1L)
    }
  }

  /** Synthesize a media table from `documents` (text bytes as payload),
    * then run the decode-features pipeline. The synthesis is arithmetic,
    * so a DuckDB oracle can replay it exactly (octet_length / ascii). */
  def q40Multimodal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media: Dataset[MediaRow] = Tables.load(s, dir, "documents")
      .select($"doc_id",
        expr("element_at(array('image','audio','video'), CAST(doc_id % 3 AS INT) + 1)").as("media_type"),
        encode($"text", "UTF-8").as("payload"))
      .as[MediaRow]
    // one decoder init per partition; rows stream through in batches
    val feats = media.mapPartitions { rows =>
      val decoder = StubDecoder // real codec: init once here, per partition
      rows.map(decoder.decode)
    }
    feats.toDF().orderBy($"doc_id")
  }
}
