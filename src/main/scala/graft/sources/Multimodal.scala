package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline: media as opaque `binary` columns + typed metadata, processed in
  * partition-sized batches through typed Datasets — the Scala analog of
  * `mapInPandas` batch UDFs (same batch shape: an iterator of records per
  * partition, so a real codec can amortize per-batch init).
  *
  * The actual byte decoding is behind [[MediaCodec]]: this container has no
  * image/audio libraries, so the shipped codec is a clearly-marked
  * deterministic fake that parses only sizes/ids — the Spark-side schema,
  * partitioning, and batch plumbing are real and oracle-testable.
  */
object Multimodal {

  case class MediaRecord(media_id: Long, kind: String, content: Array[Byte])
  case class DecodedMedia(media_id: Long, kind: String, n_bytes: Int,
      n_frames: Int, width: Int, height: Int)

  /** Batch decoder contract. `decodeBatch` sees one partition's records as
    * an iterator (never materialized whole) and may hold per-batch state
    * (codec contexts, model handles). */
  trait MediaCodec extends Serializable {
    def decodeBatch(batch: Iterator[MediaRecord]): Iterator[DecodedMedia]
  }

  /** Deterministic stand-in for a real decoder (STUB — a production build
    * would bind an image/audio library here; see `RealCodec` below).
    * Metadata is pure arithmetic over (id, kind, byte length) so a SQL
    * oracle reproduces it exactly. */
  object DeterministicFakeCodec extends MediaCodec {
    def decodeBatch(batch: Iterator[MediaRecord]): Iterator[DecodedMedia] =
      batch.map { r =>
        val n = r.content.length
        val frames = r.kind match {
          case "image" => 1
          case "audio" => n / 100 + 1
          case _       => n / 50 + 1
        }
        DecodedMedia(r.media_id, r.kind, n, frames,
          16 + (r.media_id % 64).toInt, 16 + (r.media_id % 48).toInt)
      }
  }

  /** The real-decoder slot: intentionally unimplemented in this offline
    * build (no codec libraries in the container). */
  object RealCodec extends MediaCodec {
    def decodeBatch(batch: Iterator[MediaRecord]): Iterator[DecodedMedia] = ???
  }

  /** documents → a media table: text bytes as the opaque binary payload,
    * kind assigned by id (deterministic). Stands in for reading a real
    * media dataset's (id, kind, bytes) layout. */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3L)) + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("content"))
      .as[MediaRecord]
  }

  /** Partition-batched decode: one codec invocation per partition, records
    * streamed through it. */
  def decode(media: Dataset[MediaRecord], codec: MediaCodec): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(codec.decodeBatch(_))
  }
}
