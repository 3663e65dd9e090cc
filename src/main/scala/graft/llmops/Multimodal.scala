package graft.llmops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.11 ★): media as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The Spark-side plumbing — schema, partitioning, batch shape, typed
  * per-partition processing — is real and tested. The IMAGE decode is
  * real ([[decodeImage]] via the JDK's ImageIO; PNG/BMP/GIF need no
  * codec jars) and so is WAV/PCM audio ([[decodeWav]] via the JDK's
  * `javax.sound.sampled`). Only COMPRESSED audio (mp3/aac/opus) and
  * video container demux remain stubbed ([[decodeStub]],
  * [[sampleFrames]]) — those genuinely need codec jars this container
  * lacks; a real demuxer drops into the same per-partition batch shape
  * with an identical execution plan.
  */
object Multimodal {

  final case class MediaBlob(
      doc_id: Long,
      blob: Array[Byte],
      mime_type: String)

  final case class MediaFeatures(
      doc_id: Long,
      byte_len: Int,
      digest: String,
      width: Int,
      height: Int,
      mean_byte: Double)

  /** Wrap a text corpus as binary media rows — stands in for reading
    * image/audio bytes; demonstrates the opaque-binary column pattern. */
  def asBlobs(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
      encode(col(textCol), "UTF-8").as("blob"),
      lit("application/octet-stream").as("mime_type"))

  /** Render each text row as a REAL tiny PNG (deterministic dimensions
    * and pixels derived from the UTF-8 bytes) — produces genuine image
    * blobs the decode path must actually parse. Encoding runs
    * per-partition on executors through the JDK's ImageIO (PNG needs no
    * codec jars). */
  def asPngBlobs(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) => (id, encodePng(text)) })
      .toDF("doc_id", "blob")
      .withColumn("mime_type", lit("image/png"))
  }

  /** Deterministic PNG render: dimensions from the byte length, RGB
    * pixels cycling through the text bytes. Real ImageIO encode. */
  def encodePng(text: String): Array[Byte] = {
    val bytes = text.getBytes("UTF-8")
    val n = math.max(1, bytes.length)
    val w = 8 + (bytes.length % 24)
    val h = 8 + ((bytes.length * 7) % 24)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = if (bytes.isEmpty) 0 else bytes(i % n) & 0xff
        val g = if (bytes.isEmpty) 0 else bytes((i + 1) % n) & 0xff
        val b = if (bytes.isEmpty) 0 else bytes((i + 2) % n) & 0xff
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        i += 3
        x += 1
      }
      y += 1
    }
    javax.imageio.ImageIO.setUseCache(false) // in-memory, no temp files
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image decode (JDK ImageIO — PNG/BMP/GIF need no codec jars):
    * genuine pixel dimensions plus the mean over all RGB channel values.
    * This is the production path for image-typed blobs; only audio/video
    * container demux remains stubbed ([[sampleFrames]]). */
  def decodeImage(blob: Array[Byte]): (Int, Int, Double) = {
    javax.imageio.ImageIO.setUseCache(false)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
    require(img != null, "undecodable image blob")
    val w = img.getWidth
    val h = img.getHeight
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    (w, h, sum.toDouble / (w.toLong * h * 3))
  }

  /** ===== STUB ===== deterministic fake decode: derives "image"
    * dimensions and a byte-mean "signal" from the blob alone. A real
    * implementation would decode pixels/samples here; everything around
    * it (batching, schema, distribution) is production-shaped. */
  def decodeStub(blob: Array[Byte]): (Int, Int, Double) = {
    val w = 64 + (blob.length % 577)
    val h = 64 + ((blob.length * 31) % 577)
    val mean = if (blob.isEmpty) 0.0
      else blob.foldLeft(0L)((acc, b) => acc + (b & 0xff)).toDouble / blob.length
    (w, h, mean)
  }

  final case class AudioFeatures(
      doc_id: Long,
      sample_rate: Int,
      channels: Int,
      n_frames: Int,
      rms: Double)

  /** Deterministic square-wave PCM16 mono WAV encode through the JDK's
    * `javax.sound.sampled` (WAV/PCM needs no codec jars — the same move
    * that made image decode real via ImageIO). Every sample is exactly
    * ±amp, so the decoded RMS equals amp exactly — an
    * independently-computable oracle property; frame count and amplitude
    * are deterministic functions of the doc id. */
  def encodeWav(docId: Long): Array[Byte] = {
    val sr = 8000
    val frames = 400 + math.floorMod(docId, 97L).toInt * 8
    val amp = 1000 + math.floorMod(docId, 29L).toInt * 500
    val pcm = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      val v = if ((i / 4) % 2 == 0) amp else -amp
      pcm(2 * i) = (v & 0xff).toByte // little-endian PCM16
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sr.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL WAV decode (JDK `javax.sound.sampled.AudioSystem`): parse the
    * RIFF container, report (sampleRate, channels, frames, RMS amplitude)
    * over the PCM16 sample stream. Only COMPRESSED audio (mp3/aac/opus)
    * and video container demux remain stubbed — those genuinely need
    * codec jars this container lacks. */
  def decodeWav(blob: Array[Byte]): (Int, Int, Int, Double) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(blob))
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
        s"expected little-endian PCM16, got $fmt")
      val bytes = ais.readAllBytes()
      val samples = bytes.length / 2
      var sumSq = 0.0
      var i = 0
      while (i + 1 < bytes.length) {
        val v = (((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort).toDouble
        sumSq += v * v
        i += 2
      }
      val frames = samples / fmt.getChannels
      (fmt.getSampleRate.toInt, fmt.getChannels, frames,
        if (samples == 0) 0.0 else math.sqrt(sumSq / samples))
    } finally ais.close()
  }

  private def sha256Hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(b).map("%02x".format(_)).mkString

  /** Per-partition batch feature extraction over binary blobs — the Scala
    * analogue of a `mapInPandas` media pipeline: one iterator per
    * partition, arbitrary native work per batch, typed output Encoder.
    * image-typed blobs go through the REAL ImageIO decode
    * ([[decodeImage]]); other mime types fall back to the deterministic
    * stub (audio/video demux has no codec in this container). */
  def extractFeatures(blobs: DataFrame): Dataset[MediaFeatures] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("blob"), col("mime_type")).as[MediaBlob]
      .mapPartitions { it =>
        it.map { m =>
          val (w, h, mean) =
            if (m.mime_type.startsWith("image/")) decodeImage(m.blob)
            else decodeStub(m.blob)
          MediaFeatures(m.doc_id, m.blob.length, sha256Hex(m.blob), w, h,
            math.rint(mean * 10000) / 10000)
        }
      }
  }

  /** End-to-end: corpus → blobs → per-partition decode (stubbed) →
    * feature table, repartitioned for balanced media batches. */
  def mediaFeatures(docs: DataFrame, partitions: Int = 0): DataFrame = {
    val blobs0 = asBlobs(docs)
    val blobs = if (partitions > 0) blobs0.repartition(partitions) else blobs0
    extractFeatures(blobs).toDF()
  }

  /** Ingest raw media files as opaque binary rows via Spark's built-in
    * `binaryFile` source — the on-ramp for image/audio/video corpora:
    * distributed listing and reads, pushdown-capable `pathGlobFilter`,
    * no driver materialization. Output matches [[asBlobs]]'s shape so
    * the whole feature/sampling pipeline composes unchanged. */
  def readMediaDir(spark: SparkSession, glob: String,
      mimeType: String = "application/octet-stream"): DataFrame =
    spark.read.format("binaryFile").load(glob)
      .select(
        regexp_extract(col("path"), "([^/]+)$", 1).as("file_name"),
        col("length").cast("long").as("byte_len"),
        col("content").as("blob"),
        lit(mimeType).as("mime_type"))

  final case class FrameSample(
      doc_id: Long,
      frame_idx: Int,
      n_frames: Int,
      frame_digest: String)

  /** Uniform frame sampling over "video" blobs: derive the frame count
    * (STUB for container demux — deterministic in the blob length), pick
    * `k` uniformly spaced frame indices, emit one row per sampled frame
    * with a per-frame digest (STUB for the frame decode). The fan-out is
    * bounded at `k` rows per media row and runs in the same
    * per-partition batch shape as [[extractFeatures]] — the plumbing a
    * real demuxer drops into unchanged. */
  def sampleFrames(blobs: DataFrame, k: Int = 4): Dataset[FrameSample] = {
    require(k >= 2, "need at least 2 sample points")
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("blob"), col("mime_type")).as[MediaBlob]
      .mapPartitions { it =>
        it.flatMap { m =>
          val nFrames = 8 + (m.blob.length % 120) // stub demux: >= 8 frames
          (0 until k).map { i =>
            val fi = (i.toLong * (nFrames - 1) / (k - 1)).toInt
            FrameSample(m.doc_id, fi, nFrames,
              sha256Hex(m.blob ++ s"#$fi".getBytes("UTF-8")))
          }
        }
      }
  }
}
