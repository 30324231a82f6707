package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column processing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches
  * (reference pipeline treats media as blob + metadata side-table).
  *
  * Decode kernels are REAL for image and audio using only JDK-public codecs:
  *   - image: `javax.imageio.ImageIO` (PNG/JPEG/BMP/GIF readers ship with
  *     every JDK) → width/height + mean-pooled grayscale grid features.
  *   - audio: `javax.sound.sampled.AudioSystem` (WAV/PCM) → duration + RMS
  *     window features.
  * Video remains the one STUBBED kind ([[decodeStub]]): the JDK has no video
  * codec and this container has no external media libraries, so the video
  * path keeps a clearly-marked deterministic stand-in while the batching,
  * schema, partitioning and output contract stay production-real.
  */
object Multimodal {

  // ImageIO's default ImageInputStream spools through a per-call temp FILE
  // cache — a disk write per decoded row. Payloads here are already in
  // memory, so force the heap-backed stream (once per JVM, on first use of
  // this object in an executor).
  ImageIO.setUseCache(false)

  /** Typed media row: opaque payload + structured metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("mime", StringType, nullable = true)
    )), nullable = true)
  ))

  final case class MediaFeature(media_id: Long, kind: String, n_bytes: Int, feature: Array[Float])

  /** Decoded per-row media attributes — integer-exact so the whole decode
    * path is DuckDB-oracle-checkable (q57): unused attributes are 0, never
    * NULL, keeping every column a plain int64 through parquet→pandas.
    */
  final case class MediaDecode(media_id: Long, kind: String, width: Int, height: Int,
                               gray: Int, amp: Int, duration_ms: Long)

  /** === STUB (video only) === deterministic fake decoder keyed on the
    * payload hash. Image and audio use the real JDK codecs below; video has
    * no JDK codec, so its feature path keeps this stand-in.
    */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val h = java.util.Arrays.hashCode(payload)
    val rnd = new java.util.SplittableRandom(h.toLong)
    Array.fill(dim)(rnd.nextDouble().toFloat)
  }

  /** Real image decode via ImageIO: (width, height, rounded mean gray level,
    * grid x grid mean-pooled grayscale feature in [0,1]). None if the payload
    * is not a decodable image.
    */
  def decodeImage(payload: Array[Byte], grid: Int = 4): Option[(Int, Int, Int, Array[Float])] = {
    if (payload == null || payload.isEmpty) return None
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    if (img == null) return None
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    val bands = raster.getNumBands
    // mean-pool into a grid×grid grayscale feature + global mean in one pass
    val cellSum = new Array[Double](grid * grid)
    val cellN = new Array[Long](grid * grid)
    var total = 0.0
    var y = 0
    while (y < h) {
      val cy = math.min(grid - 1, y * grid / h)
      var x = 0
      while (x < w) {
        var s = 0.0
        var b = 0
        while (b < bands) { s += raster.getSampleDouble(x, y, b); b += 1 }
        val g = s / bands
        val c = cy * grid + math.min(grid - 1, x * grid / w)
        cellSum(c) += g; cellN(c) += 1; total += g
        x += 1
      }
      y += 1
    }
    val feat = Array.tabulate(grid * grid) { c =>
      if (cellN(c) == 0) 0f else (cellSum(c) / cellN(c) / 255.0).toFloat
    }
    Some((w, h, math.round(total / (w.toLong * h)).toInt, feat))
  }

  /** Real audio decode via javax.sound (WAV/PCM 16-bit): (duration ms,
    * rounded global RMS amplitude, per-window RMS feature in [0,1]).
    * None if the payload is not decodable audio.
    */
  def decodeWav(payload: Array[Byte], windows: Int = 16): Option[(Long, Int, Array[Float])] = {
    if (payload == null || payload.isEmpty) return None
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      val fmt = in.getFormat
      if (fmt.getSampleSizeInBits != 16) return None
      val bytes = in.readAllBytes()
      val channels = fmt.getChannels
      val frames = bytes.length / (2 * channels)
      if (frames == 0) return None
      val big = fmt.isBigEndian
      def sample(i: Int): Int = { // first channel of frame i
        val o = i * 2 * channels
        if (big) (bytes(o) << 8) | (bytes(o + 1) & 0xff)
        else (bytes(o + 1) << 8) | (bytes(o) & 0xff)
      }
      var sumsq = 0L
      val winSumsq = new Array[Long](windows)
      val winN = new Array[Long](windows)
      var i = 0
      while (i < frames) {
        val v = sample(i).toLong
        sumsq += v * v
        val wdx = math.min(windows - 1, i * windows / frames)
        winSumsq(wdx) += v * v; winN(wdx) += 1
        i += 1
      }
      val feat = Array.tabulate(windows) { w =>
        if (winN(w) == 0) 0f else (math.sqrt(winSumsq(w).toDouble / winN(w)) / 32768.0).toFloat
      }
      val durationMs = frames.toLong * 1000L / fmt.getSampleRate.toLong
      Some((durationMs, math.round(math.sqrt(sumsq.toDouble / frames)).toInt, feat))
    } catch { case _: Exception => None }
  }

  private def fitDim(src: Array[Float], dim: Int): Array[Float] =
    if (src.length == dim) src
    else if (src.length > dim) src.take(dim)
    else src ++ Array.fill(dim - src.length)(0f)

  /** Feature extraction over media batches: `mapPartitions` on a typed
    * Dataset — one decoder init per partition (the expensive part for real
    * decoders), rows streamed through it. Image and audio features come from
    * the REAL decode kernels; video falls through to the documented stub.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    val grid = math.max(1, math.sqrt(dim.toDouble).toInt)
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // ImageIO scans its reader registry on first use: per-partition init
        rows.map { case (id, kind, payload) =>
          val bytes = if (payload == null) Array.empty[Byte] else payload
          val feature = kind match {
            case "image" => decodeImage(bytes, grid).map(r => fitDim(r._4, dim))
              .getOrElse(Array.fill(dim)(0f))
            case "audio" => decodeWav(bytes, dim).map(r => fitDim(r._3, dim))
              .getOrElse(Array.fill(dim)(0f))
            case _ => decodeStub(bytes, dim) // video: no JDK codec (stub)
          }
          MediaFeature(id, kind, bytes.length, feature)
        }
      }
  }

  /** Oracle-checkable decode surface (q57): runs the real codecs and emits
    * integer-exact attributes — image width/height/mean-gray, audio RMS
    * amplitude/duration — with 0 (not NULL) where a field does not apply to
    * the row's kind, so every column stays int64 end-to-end.
    */
  def decodeMedia(media: DataFrame): Dataset[MediaDecode] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, kind, payload) =>
          kind match {
            case "image" =>
              val (w, h, g, _) = decodeImage(payload).getOrElse((0, 0, 0, Array.empty[Float]))
              MediaDecode(id, kind, w, h, g, 0, 0L)
            case "audio" =>
              val (d, a, _) = decodeWav(payload).getOrElse((0L, 0, Array.empty[Float]))
              MediaDecode(id, kind, 0, 0, 0, a, d)
            case _ =>
              MediaDecode(id, kind, 0, 0, 0, 0, 0L)
          }
        }
      }
  }

  /** Encode a solid-gray PNG (lossless: decode recovers every attribute
    * exactly — the closed-form contract q57's oracle relies on).
    */
  def encodeGrayPng(width: Int, height: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, gray); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Encode a 16-bit mono PCM WAV square wave (4 samples +amp, 4 samples
    * −amp): every sample is exactly ±amp, so global RMS == amp exactly and
    * nSamples % 8 == 0 keeps whole periods.
    */
  def encodeSquareWav(nSamples: Int, amp: Int, sampleRate: Float = 8000f): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = (if ((i / 4) % 2 == 0) amp else -amp).toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(pcm), fmt, nSamples.toLong),
      AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Deterministic synthetic media table for tests/benchmarks: REAL payload
    * bytes — PNG images and WAV audio the decode kernels round-trip exactly —
    * plus opaque pseudo-random bytes for the video (stub) kind. Attribute
    * formulas are closed-form in `media_id` so a SQL oracle can recompute
    * them (q57):
    *   image: width 16+id%17, height 16+id%13, solid gray (id*37)%256
    *   audio: amp 1000+(id%50)*100, 800+(id%5)*80 samples @8kHz = 100+(id%5)*10 ms
    */
  def syntheticMedia(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val rows = spark.range(n).map { id =>
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      kind match {
        case "image" =>
          val (w, h) = (16 + (id % 17).toInt, 16 + (id % 13).toInt)
          (id, kind, encodeGrayPng(w, h, ((id * 37) % 256).toInt),
            (Some(w), Some(h), None: Option[Long], Some("image/png")))
        case "audio" =>
          val samples = 800 + (id % 5).toInt * 80
          val durMs = samples.toLong * 1000L / 8000L
          (id, kind, encodeSquareWav(samples, 1000 + (id % 50).toInt * 100),
            (None: Option[Int], None: Option[Int], Some(durMs), Some("audio/wav")))
        case _ =>
          val rnd = new java.util.SplittableRandom(seed ^ id)
          val payload = new Array[Byte](64 + rnd.nextInt(192))
          rnd.nextBytes(payload)
          (id, kind, payload,
            (None: Option[Int], None: Option[Int], Some(rnd.nextLong(1000, 600000)), Some("video/bin")))
      }
    }.toDF("media_id", "kind", "payload", "m")
    rows.select(col("media_id"), col("kind"), col("payload"),
      struct(col("m._1").as("width"), col("m._2").as("height"),
        col("m._3").as("duration_ms"), col("m._4").as("mime")).as("meta"))
  }
}
