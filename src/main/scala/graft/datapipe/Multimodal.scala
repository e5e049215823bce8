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
  * through `javax.imageio.ImageIO`; the AUDIO leg decodes for real too:
  * payloads are PCM WAV bytes decoded through `javax.sound.sampled
  * .AudioSystem` (both ship with the JDK — no new dependency), emitting
  * sample rate, frame count and channel RMS. Only VIDEO remains STUBBED
  * (`decodeStub` — genuinely no video codecs in this container):
  * deterministic pseudo-features from the payload bytes, clearly marked,
  * with the exact signature a real decoder would slot into. An audio
  * payload that is NOT decodable WAV also falls back to the stub leg —
  * the malformed-media dead-letter path, never an executor crash.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte],
                      mime: String, width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Int,
                           feature: Array[Float],
                           img_w: Option[Int], img_h: Option[Int],
                           mean_r: Option[Double], mean_g: Option[Double],
                           mean_b: Option[Double],
                           audio_sr: Option[Int], audio_frames: Option[Long],
                           audio_rms: Option[Double])
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

  /** === STUB (video only; audio falls back here ONLY for undecodable
    * payloads) ===  Real implementation would decode the
    * payload with a video codec and run a feature extractor.
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

  // ---- real audio leg (JDK javax.sound.sampled — no external dependency) ---

  /** Deterministic closed-form 8-bit unsigned PCM sample function for
    * synthetic audio payloads — like [[pixel]], an external engine can
    * verify the REAL decode output analytically (the DuckDB oracle
    * recomputes the RMS over the same sample sequence without any codec). */
  private[graft] def audioSample(id: Long, i: Int): Int =
    ((id * 31 + i.toLong * 7) % 256).toInt

  private[graft] def audioFrames(id: Long): Int = 80 + (id % 41).toInt

  private val wavFormat = new javax.sound.sampled.AudioFormat(
    javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
    8000f, 8, 1, 1, 8000f, false)

  /** Render the deterministic test clip for `id` as REAL WAV bytes
    * (8 kHz, 8-bit unsigned PCM, mono). */
  def renderWav(id: Long): Array[Byte] = {
    val n = audioFrames(id)
    val data = Array.tabulate[Byte](n)(i => audioSample(id, i).toByte)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), wavFormat, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio decode: WAV payload → (sample rate, n_frames, RMS of the
    * centered 8-bit samples). Returns None for undecodable payloads or
    * formats beyond 8-bit mono PCM (the malformed-media dead-letter path —
    * never an executor crash). */
  def decodeAudio(bytes: Array[Byte]): Option[(Int, Long, Double)] = {
    if (bytes == null || bytes.isEmpty) return None
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => null
        case _: java.io.IOException => null
      }
    if (ais == null) return None
    try {
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 8 || fmt.getChannels != 1) return None
      val data = ais.readAllBytes()
      if (data.isEmpty) return None
      var ss = 0L
      var i = 0
      while (i < data.length) {
        val s = (data(i) & 0xff) - 128
        ss += s.toLong * s
        i += 1
      }
      Some((fmt.getSampleRate.toInt, data.length.toLong,
        math.sqrt(ss.toDouble / data.length)))
    } finally ais.close()
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

  /** Media table with real payloads for BOTH decodable modalities: PNG
    * images and PCM-WAV audio, rendered per partition; video rows keep the
    * opaque stand-ins (no video codec in the JDK). */
  def mediaWithRealMedia(spark: SparkSession, docs: DataFrame,
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    import spark.implicits._
    val base = mediaWithRealImages(spark, docs, idCol, textCol)
    val audio = base.filter(col("kind") === "audio").as[MediaRow]
      .mapPartitions(_.map { m =>
        MediaRow(m.doc_id, "audio", renderWav(m.doc_id), "audio/wav",
          m.width, m.height)
      })
    audio.toDF().unionByName(base.filter(col("kind") =!= "audio"))
  }

  /** Feature extraction as a typed per-partition batch op: REAL ImageIO
    * decode for image rows (dims + channel means), REAL AudioSystem decode
    * for audio rows (sample rate, frame count, channel RMS) — doubles
    * rounded to 6 so the values are engine-portable — and stride-sum stub
    * features for video rows (plus any undecodable audio payload, the
    * dead-letter fallback). */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    def r6(d: Double): Double = BigDecimal(d)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        val payload = if (m.payload == null) Array.emptyByteArray else m.payload
        def stub = MediaFeatures(m.doc_id, m.kind, payload.length,
          decodeStub(payload), None, None, None, None, None, None, None, None)
        m.kind match {
          case "image" =>
            val d = decodeImage(payload)
            MediaFeatures(m.doc_id, m.kind, payload.length,
              Array.emptyFloatArray,
              d.map(_._1), d.map(_._2),
              d.map(x => r6(x._3)), d.map(x => r6(x._4)), d.map(x => r6(x._5)),
              None, None, None)
          case "audio" =>
            decodeAudio(payload) match {
              case Some((sr, nf, rms)) =>
                MediaFeatures(m.doc_id, m.kind, payload.length,
                  Array.emptyFloatArray, None, None, None, None, None,
                  Some(sr), Some(nf), Some(r6(rms)))
              case None => stub // undecodable audio → dead-letter stub leg
            }
          case _ => stub
        }
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
