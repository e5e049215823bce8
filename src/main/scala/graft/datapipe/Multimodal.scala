package graft.datapipe

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus decode / feature-extract / frame-sample operators.
  *
  * The Spark-side plumbing — schema, partition-preserving typed
  * mapPartitions (the Scala analog of mapInPandas batch UDFs), batch shape,
  * explode of sampled frames — is real and tested. The IMAGE leg decodes
  * for real: payloads are PNG bytes and [[extractFeatures]] runs them
  * through `javax.imageio.ImageIO` (ships with the JDK — no new
  * dependency), emitting decoded dimensions + per-channel means. Audio and
  * video remain STUBBED (`decodeStub` — genuinely no codecs in this
  * container): deterministic pseudo-features from the payload bytes,
  * clearly marked, with the exact signature a real decoder would slot into.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte],
                      mime: String, width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Int,
                           feature: Array[Float],
                           img_w: Option[Int], img_h: Option[Int],
                           mean_r: Option[Double], mean_g: Option[Double],
                           mean_b: Option[Double])
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

  /** === STUB (audio/video only) ===  Real implementation would decode the
    * payload with an audio/video codec and run a feature extractor.
    * Deterministic fake: 8 floats derived from byte sums over 8 strides —
    * the sums are exact integers (< 2^24, exactly representable in Float),
    * so any external engine can reproduce them bit-for-bit (the DuckDB
    * oracle recomputes them from hex(payload)). The partitioning/batching
    * contract (one pass, no shuffle, arrow-friendly batch shape) is what's
    * under test. The image leg does NOT go through this — see
    * [[decodeImage]]. */
  def decodeStub(bytes: Array[Byte], dims: Int = 8): Array[Float] = {
    val out = new Array[Float](dims)
    var i = 0
    while (i < bytes.length) { out(i % dims) += (bytes(i) & 0xff); i += 1 }
    out
  }

  // ---- real image leg (JDK ImageIO — no external dependency) --------------

  /** Deterministic tiny-RGB pixel function for synthetic image payloads:
    * closed-form in (id, x, y), so an external engine can verify the REAL
    * decode output analytically (the DuckDB oracle recomputes the means
    * over the same (x, y) grid without any codec). */
  private[graft] def pixel(id: Long, x: Int, y: Int): (Int, Int, Int) = (
    ((id * 37 + x * 11) % 256).toInt,
    ((id * 59 + y * 17) % 256).toInt,
    ((id * 83 + (x + y) * 29) % 256).toInt)

  private[graft] def imgDims(id: Long): (Int, Int) =
    (4 + (id % 5).toInt, 3 + (id % 4).toInt)

  /** Render the deterministic test image for `id` as REAL PNG bytes. */
  def renderPng(id: Long): Array[Byte] = {
    val (w, h) = imgDims(id)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = pixel(id, x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image decode: PNG/JPEG/… payload → (width, height, per-channel
    * means). Returns None for undecodable payloads (the malformed-media
    * dead-letter path — never an executor crash). */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Double, Double, Double)] = {
    if (bytes == null || bytes.isEmpty) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    Some((w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
  }

  /** Media table whose IMAGE rows carry real PNG payloads (rendered
    * per partition — generation scales with the cluster); audio/video rows
    * keep the opaque byte stand-ins from [[mediaFromDocs]]. */
  def mediaWithRealImages(spark: SparkSession, docs: DataFrame,
                          idCol: String = "doc_id",
                          textCol: String = "text"): DataFrame = {
    import spark.implicits._
    val base = mediaFromDocs(docs, idCol, textCol)
    val img = base.filter(col("kind") === "image").as[MediaRow]
      .mapPartitions(_.map { m =>
        val (w, h) = imgDims(m.doc_id)
        MediaRow(m.doc_id, "image", renderPng(m.doc_id), "image/png", w, h)
      })
    img.toDF().unionByName(base.filter(col("kind") =!= "image"))
  }

  /** Feature extraction as a typed per-partition batch op: REAL ImageIO
    * decode for image rows (dims + channel means, rounded 6 so the values
    * are engine-portable), stride-sum stub features for audio/video. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    def r6(d: Double): Double = BigDecimal(d)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        val payload = if (m.payload == null) Array.emptyByteArray else m.payload
        if (m.kind == "image") {
          val d = decodeImage(payload)
          MediaFeatures(m.doc_id, m.kind, payload.length,
            Array.emptyFloatArray,
            d.map(_._1), d.map(_._2),
            d.map(x => r6(x._3)), d.map(x => r6(x._4)), d.map(x => r6(x._5)))
        } else
          MediaFeatures(m.doc_id, m.kind, payload.length, decodeStub(payload),
            None, None, None, None, None)
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
