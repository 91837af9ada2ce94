package graft.operators

import graft.functions.GraftExpressions
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal (image/audio/video) column plumbing: media travel as opaque
 * `binary` columns with a typed metadata struct; decode / feature-extract /
 * resize / frame-sample run partition-wise over the binary batches.
 *
 * Codec reality, two tiers:
 *  - PNG and WAV are REAL here — the JDK ships `javax.imageio` and
 *    `javax.sound.sampled`, so [[realMediaFromDocs]] encodes genuine PNG
 *    rasters / PCM WAVs and [[mediaFeatures]] decodes them back through
 *    the actual codecs (q62's encode→decode roundtrip is what the oracle
 *    verifies: both sides derive expected pixel/sample statistics from
 *    the same seeded integer formula, but only the Spark side ever
 *    touches bytes).
 *  - JPEG-with-exif / video remain outside this container; their path is
 *    the clearly-marked deterministic STUB tier (`decodeStub`,
 *    `frameSampleStub`) that keeps the real batch shape, signature and
 *    schema. Swapping a stub for a JNI/javacv decoder changes one
 *    function.
 *
 * Scale notes: binary payloads dominate row size → media tables must
 * repartition by a size-balanced key before wide ops (`repartitionForMedia`),
 * and feature extraction is a narrow mapPartitions (no shuffle). Feature
 * vectors then feed [[Similarity]] unchanged.
 */
object Multimodal {

  /** Synthetic-media sizing shared with the q32 oracle (SparkEntry
    * interpolates BOTH the md5-block count and avg_bytes from these — the
    * round-2 oracle hardcoded 264/16 with no link to this default). */
  val defaultBytesPerDoc: Int = 256
  /** Magic-byte header length (PNG and RIFF stubs are both 8 bytes). */
  val headerBytes: Int = 8

  case class MediaMeta(width: Int, height: Int, duration_ms: Long, sample_rate: Int)
  case class MediaRow(media_id: String, kind: String, bytes: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: String, kind: String, features: Array[Float])

  /** Deterministic synthetic media corpus derived from a docs table:
    * media bytes = magic header (png/wav alternating by seed parity) + a
    * byte-stream seeded by the doc fingerprint. Exercises the real binary
    * column path end to end without codecs.
    *
    * The seed and byte-stream are md5-derived (NOT a JVM-private hash) so
    * the driver's DuckDB oracle recomputes the exact same bytes in SQL
    * (the q28/q31 technique): `seedhex = md5(doc_id || '|' || text[:64])`,
    * body block j = the raw 16 digest bytes of `md5(seedhex || ':' || j)`. */
  def mediaFromDocs(docs: DataFrame,
      bytesPerDoc: Int = Multimodal.defaultBytesPerDoc): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("string"), col("text")).as[(String, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val ascii = java.nio.charset.StandardCharsets.US_ASCII
        def hex(b: Array[Byte]): String = {
          val sb = new java.lang.StringBuilder(b.length * 2)
          b.foreach(x => sb.append(f"${x & 0xff}%02x"))
          sb.toString
        }
        it.map { case (id, text) =>
          val seedDigest = md.digest((id + "|" + text.take(64)).getBytes(ascii))
          val seedHex = hex(seedDigest)
          val seed = java.lang.Long.parseUnsignedLong(seedHex.substring(0, 16), 16)
          val isPng = (seed & 1L) == 0L
          val header: Array[Byte] =
            if (isPng) Array(0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
            else Array('R', 'I', 'F', 'F', 0x24, 0x00, 0x00, 0x00)
          val body = new Array[Byte](bytesPerDoc)
          var off = 0
          var j = 0
          while (off < bytesPerDoc) {
            val block = md.digest((seedHex + ":" + j).getBytes(ascii))
            val n = math.min(block.length, bytesPerDoc - off)
            System.arraycopy(block, 0, body, off, n)
            off += n
            j += 1
          }
          val meta =
            if (isPng) MediaMeta(64 + (seed % 1920).toInt.abs, 64 + (seed % 1080).toInt.abs, 0L, 0)
            else MediaMeta(0, 0, 1000L + (seed % 60000L).abs, 16000)
          MediaRow(id, if (isPng) "image" else "audio", header ++ body, meta)
        }
      }
  }

  /** Sniffed mime per media row — the binary-column scalar path (custom
    * codegen'd expression, no UDF). */
  def withSniffedMime(media: DataFrame): DataFrame = {
    GraftExpressions.register(media.sparkSession)
    media.withColumn("sniffed_mime", GraftExpressions.sniff_mime(col("bytes")))
      .withColumn("byte_size", length(col("bytes")))
      .withColumn("sha256", sha2(col("bytes"), 256))
  }

  /** Size-balanced repartition for fat binary rows: key on a hash of the id
    * so no partition accumulates the big blobs of one source. */
  def repartitionForMedia(media: DataFrame, partitions: Int): DataFrame =
    media.repartition(partitions, xxhash64(col("media_id")))

  // ==================== REAL JDK CODECS (q62) =====================
  // PNG via javax.imageio, WAV via javax.sound.sampled — both in the
  // bare JDK, no external tools. The generation formulas are integer
  // arithmetic a SQL oracle replays exactly; the ONLY thing the oracle
  // cannot do is decode, so a hash match proves the Spark side's
  // encode→codec→decode roundtrip preserved every pixel/sample.
  // ================================================================

  /** Audio sample rate for synthetic WAVs (hertz; also the oracle's d2). */
  val wavSampleRate: Int = 16000

  /** The seeded-media recipe shared by [[realMediaFromDocs]] and the q62
    * oracle SQL. seed32 = first 8 hex chars of md5(doc_id || '|' ||
    * text.take(64)) — 32 bits so BIGINT arithmetic is exact on both
    * sides; s = seed32 % 1000003 keeps every product far from overflow. */
  case class MediaRecipe(seed32: Long, s: Long, isPng: Boolean,
      width: Int, height: Int, nSamples: Int)

  def recipeOf(docId: String, text: String): MediaRecipe = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest((docId + "|" + text.take(64))
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val sb = new java.lang.StringBuilder(8)
    (0 until 4).foreach(i => sb.append(f"${digest(i) & 0xff}%02x"))
    val seed32 = java.lang.Long.parseLong(sb.toString, 16)
    MediaRecipe(
      seed32 = seed32,
      s = seed32 % 1000003L,
      isPng = seed32 % 2 == 0,
      width = (8 + seed32 % 9).toInt,
      height = (8 + (seed32 / 16) % 9).toInt,
      nSamples = (64 + seed32 % 129).toInt)
  }

  /** Pixel (x, y) of a seeded raster — packed 0xRRGGBB. Pure integer
    * formula (mirrored in the q62 oracle SQL); PNG truecolor is lossless
    * so the decode returns these exact channel values. */
  def pixelRgb(s: Long, x: Int, y: Int): Int = {
    val r = ((s * 31 + x * 7 + y * 13) % 256).toInt
    val g = ((s * 17 + x * 11 + y * 5) % 256).toInt
    val b = ((s * 13 + x * 3 + y * 29) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  /** Sample i of a seeded PCM stream — signed 16-bit. 16-bit PCM WAV is
    * lossless, so the decode returns these exact values. */
  def sampleAt(s: Long, i: Int): Int =
    (((s * 131 + i * 7919L) % 65536L) - 32768L).toInt

  /** Encode one seeded raster as a REAL PNG (javax.imageio). */
  def encodePng(rec: MediaRecipe): Array[Byte] = {
    // ImageIO defaults to a DISK-backed stream cache: without this, every
    // encode/decode call creates (and deletes) a temp file — measured
    // per-row overhead on the q62 codec path (round 6). Memory-backed
    // streams are strictly better for these KB-sized in-memory payloads.
    javax.imageio.ImageIO.setUseCache(false)
    val img = new java.awt.image.BufferedImage(
      rec.width, rec.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < rec.height) {
      var x = 0
      while (x < rec.width) { img.setRGB(x, y, pixelRgb(rec.s, x, y)); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream(1024)
    if (!javax.imageio.ImageIO.write(img, "png", out))
      throw new IllegalStateException("JDK PNG writer missing")
    out.toByteArray
  }

  /** Encode one seeded PCM stream as a REAL 16-bit mono WAV
    * (javax.sound.sampled). */
  def encodeWav(rec: MediaRecipe): Array[Byte] = {
    val pcm = new Array[Byte](rec.nSamples * 2)
    var i = 0
    while (i < rec.nSamples) {
      val v = sampleAt(rec.s, i)
      pcm(2 * i) = (v & 0xff).toByte            // little-endian
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      wavSampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, rec.nSamples.toLong)
    val out = new java.io.ByteArrayOutputStream(1024)
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Deterministic REAL-media corpus from a docs table: genuine PNGs for
    * even seeds, genuine WAVs for odd — same narrow per-row shape as
    * [[mediaFromDocs]], but the bytes go through actual JDK encoders. */
  def realMediaFromDocs(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("string"), col("text")).as[(String, String)]
      .map { case (id, text) =>
        val rec = recipeOf(id, text)
        if (rec.isPng)
          MediaRow(id, "image", encodePng(rec),
            MediaMeta(rec.width, rec.height, 0L, 0))
        else
          MediaRow(id, "audio", encodeWav(rec),
            MediaMeta(0, 0, rec.nSamples * 1000L / wavSampleRate, wavSampleRate))
      }
  }

  /** One decoded media row: unified integer feature columns so image and
    * audio share a schema the oracle can reproduce —
    * image: d1/d2 = width/height, s1/s2/s3 = channel sums (R, G, B);
    * audio: d1/d2 = n_samples/sample_rate, s1 = Σ sample, s2 = Σ |sample|,
    * s3 = 0. All BIGINT-exact: no floats anywhere near the hash. */
  case class DecodedFeatures(media_id: String, kind: String,
      d1: Long, d2: Long, s1: Long, s2: Long, s3: Long)

  /** REAL decode → integer feature statistics. `kind` is derived from the
    * DECODE (magic sniff chooses the codec; the codec must then succeed),
    * not copied from the input — the codec path is load-bearing.
    * Narrow mapPartitions, zero shuffle, decoder state per partition. */
  def mediaFeatures(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // no disk-backed stream cache (see encodePng)
      it.map { m =>
        val bytes = m.bytes
        val isPng = bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 &&
          bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G'
        if (isPng) {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          if (img == null) throw new IllegalStateException(
            s"media ${m.media_id}: PNG magic but ImageIO could not decode")
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          DecodedFeatures(m.media_id, "image",
            img.getWidth.toLong, img.getHeight.toLong, sr, sg, sb)
        } else {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val fmt = ais.getFormat
            if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1)
              throw new IllegalStateException(
                s"media ${m.media_id}: expected 16-bit mono PCM, got $fmt")
            val pcm = ais.readAllBytes()
            val n = pcm.length / 2
            var sum = 0L; var sabs = 0L
            var i = 0
            while (i < n) {
              val lo = pcm(2 * i) & 0xff
              val hi = pcm(2 * i + 1).toInt // sign-extends the high byte
              val v = (hi << 8) | lo
              sum += v; sabs += math.abs(v)
              i += 1
            }
            DecodedFeatures(m.media_id, "audio",
              n.toLong, fmt.getSampleRate.toLong, sum, sabs, 0L)
          } finally ais.close()
        }
      }
    }.toDF()
  }

  /** REAL image resize: decode, area-average rescale so the longer edge is
    * ≤ `maxDim`, re-encode as PNG with updated meta. Audio rows pass
    * through. Feature-preservation is NOT promised (resampling mixes
    * pixels) — the contract is that the output is itself a valid PNG with
    * the requested geometry, which the spec re-decodes to prove. */
  def resizeImages(media: Dataset[MediaRow], maxDim: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { m =>
      if (m.kind != "image") m
      else {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.bytes))
        if (img == null) throw new IllegalStateException(
          s"media ${m.media_id}: cannot decode for resize")
        if (img.getWidth <= maxDim && img.getHeight <= maxDim) m
        else {
          val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
          val w = math.max(1, math.round(img.getWidth * scale).toInt)
          val h = math.max(1, math.round(img.getHeight * scale).toInt)
          val scaled = img.getScaledInstance(w, h, java.awt.Image.SCALE_AREA_AVERAGING)
          val out = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g2 = out.createGraphics()
          try g2.drawImage(scaled, 0, 0, null) finally g2.dispose()
          val bos = new java.io.ByteArrayOutputStream(1024)
          javax.imageio.ImageIO.write(out, "png", bos)
          m.copy(bytes = bos.toByteArray, meta = m.meta.copy(width = w, height = h))
        }
      }
    }
  }

  // ======================== STUB BOUNDARY =========================
  // The tier for formats the JDK does NOT ship (jpeg-exif, video):
  // decodeStub produces a DETERMINISTIC FAKE "decode" — a 64-bin byte
  // histogram — preserving the exact batch shape, signature, and output
  // schema a real (libjpeg/ffmpeg-JNI) decoder would have. The PNG/WAV
  // path above decodes for real; q32 keeps exercising this stub tier so
  // both contracts stay verified.
  // =================================================================

  /** STUB: fake decode → fixed-size float feature vector (byte histogram,
    * L2-normalized). Signature and per-partition batching are the real
    * contract; only the math inside is fake. */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](64)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) >> 2) += 1f; i += 1 }
    var ss = 0.0
    i = 0
    while (i < 64) { ss += hist(i).toDouble * hist(i); i += 1 }
    val inv = if (ss == 0) 0f else (1.0 / math.sqrt(ss)).toFloat
    i = 0
    while (i < 64) { hist(i) *= inv; i += 1 }
    hist
  }

  /** Feature extraction over media batches: narrow mapPartitions, one
    * preallocated decoder context per partition (the real-codec pattern). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition decoder context would be created HERE (once, reused)
      it.map(m => MediaFeatures(m.media_id, m.kind, decodeStub(m.bytes)))
    }
  }

  /** STUB: frame sampling — emits `n` evenly-spaced byte-window "frames"
    * per media row (a Generator-shaped flatMap, like real video sampling). */
  def frameSampleStub(media: Dataset[MediaRow], n: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      val step = math.max(1, m.bytes.length / math.max(n, 1))
      (0 until n).iterator.map { i =>
        val off = math.min(i * step, math.max(m.bytes.length - 16, 0))
        (m.media_id, i, m.bytes.slice(off, math.min(off + 16, m.bytes.length)))
      }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }
}
