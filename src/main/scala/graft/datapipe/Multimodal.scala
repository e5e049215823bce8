package graft.datapipe

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus decode / feature-extract / frame-sample operators.
  *
  * The Spark-side plumbing — schema, partition-preserving typed
  * mapPartitions (the Scala analog of mapInPandas batch UDFs), batch shape,
  * explode of sampled frames — is real and tested. The actual codec step is
  * STUBBED (no image/audio libraries ship in this container): `decodeStub`
  * produces deterministic pseudo-features from the payload bytes, clearly
  * marked, with the exact signature a real decoder would slot into.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte],
                      mime: String, width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Int,
                           feature: Array[Float])
  case class Frame(doc_id: Long, frame_idx: Int, offset_ms: Int)

  /** Synthesize a media table from a docs table (payload = utf8 bytes of the
    * text — an opaque stand-in with realistic size distribution). */
  def mediaFromDocs(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      when(col(idCol) % 3 === 0, "image")
        .when(col(idCol) % 3 === 1, "audio").otherwise("video").as("kind"),
      col(textCol).cast("binary").as("payload"),
      when(col(idCol) % 3 === 0, "image/jpeg")
        .when(col(idCol) % 3 === 1, "audio/wav").otherwise("video/mp4").as("mime"),
      (pmod(xxhash64(col(idCol)), lit(1920)) + 1).cast("int").as("width"),
      (pmod(xxhash64(col(idCol) + 1), lit(1080)) + 1).cast("int").as("height"))

  /** === STUB ===  Real implementation would decode payload with an image /
    * audio codec and run a feature extractor. Deterministic fake: 8 floats
    * derived from byte sums over 8 strides — the sums are exact integers
    * (< 2^24, exactly representable in Float), so any external engine can
    * reproduce them bit-for-bit (the DuckDB oracle recomputes them from
    * hex(payload)). The partitioning/batching contract (one pass, no
    * shuffle, arrow-friendly batch shape) is what's under test. */
  def decodeStub(bytes: Array[Byte], dims: Int = 8): Array[Float] = {
    val out = new Array[Float](dims)
    var i = 0
    while (i < bytes.length) { out(i % dims) += (bytes(i) & 0xff); i += 1 }
    out
  }

  /** Feature extraction as a typed per-partition batch op. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        MediaFeatures(m.doc_id, m.kind,
          if (m.payload == null) 0 else m.payload.length,
          decodeStub(if (m.payload == null) Array.emptyByteArray else m.payload))
      }
    }
  }

  /** Frame sampling for video rows: every `everyMs` ms up to n_frames
    * derived from payload size (deterministic stand-in for container
    * metadata). Pure explode — no driver loop. */
  def sampleFrames(media: DataFrame, everyMs: Int = 1000): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("doc_id"),
        explode(sequence(lit(0),
          least(floor(octet_length(col("payload")) / 100).cast("int"), lit(30))))
          .as("i"))
      .select(col("doc_id"), col("i").cast("int").as("frame_idx"),
        (col("i") * everyMs).cast("int").as("offset_ms"))
}
