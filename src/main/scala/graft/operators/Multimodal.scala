package graft.operators

import graft.functions.GraftExpressions
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal (image/audio/video) column plumbing: media travel as opaque
 * `binary` columns with a typed metadata struct; decode / feature-extract /
 * resize / frame-sample run partition-wise over the binary batches.
 *
 * The image/audio codecs are NOT in this container, so the byte-level
 * decode is a clearly-marked deterministic STUB (`decodeStub`); everything
 * Spark-side — schema, binary column handling, mime sniffing (magic
 * bytes), partitioning, the mapPartitions batch shape, output feature
 * vectors — is real and tested. Swapping `decodeStub` for a JNI/javacv
 * decoder changes one function.
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

  // ======================== STUB BOUNDARY =========================
  // A real deployment decodes here (libjpeg/ffmpeg via JNI). This sandbox
  // has no codecs: decodeStub produces a DETERMINISTIC FAKE "decode" — a
  // 64-bin byte histogram — preserving the exact batch shape, signature,
  // and output schema a real decoder would have.
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

  /** STUB: resize — a real impl rescales pixels; the stub re-headers and
    * truncates deterministically, keeping the binary-in/binary-out shape. */
  def resizeStub(media: Dataset[MediaRow], maxBytes: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map(m => m.copy(bytes = m.bytes.take(maxBytes),
      meta = m.meta.copy(width = math.min(m.meta.width, 256),
        height = math.min(m.meta.height, 256))))
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
