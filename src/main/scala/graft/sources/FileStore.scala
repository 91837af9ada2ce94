package graft.sources

import graft.functions.UrlFns
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/**
 * Physical content-addressed file store — the reference's `FileStore` /
 * `ScreenshotStore` (/root/reference/store/file.go:97-179, 208-251) with
 * the SAME observable semantics, exercised by its TestFileStore /
 * TestScreenshotStore (store/file_test.go:16-157):
 *
 *  - body key = sha256 of the RAW bytes (file.go:124); mime sniffed from
 *    magic bytes (file.go:125, our [[UrlFns.sniffMime]]);
 *  - mime allowlist: only `text/`-prefixed bodies are persisted (the crawler's
 *    default, store/store.go:36-38; file.go:113-121) — disallowed bodies
 *    return metadata but NO path;
 *  - dedup: a hash already stored is NOT rewritten (file.go:141-143) — two
 *    stores of the same bytes yield one file;
 *  - bodies are gzip'd at best compression (file.go:39-44) and both sizes
 *    recorded (file.go:130, 174);
 *  - layout: `bodies/<2-hex>/<sha256>` — hash-prefix sharding instead of
 *    the reference's flat dir (10^9 files in one directory doesn't scale);
 *    the path is exactly what [[graft.fetch.Correlate.bodyRef]] writes into
 *    the `body` span's media_ref, so `stored_bodies.path` dereferences;
 *  - screenshots at `screenshots/<etld1>/<name>` (file.go:216-251 layout),
 *    content-derived name (rand16 would break round replay).
 *
 * Concurrency & scale: executors write independently (the store root is a
 * shared filesystem locally; an object store on a real cluster — the
 * content-addressed key makes blind PUTs idempotent). Racing writers of the
 * SAME hash write identical bytes via temp-file + atomic rename, so the
 * last rename wins harmlessly. Writes are append-only and idempotent →
 * torn-round replay just re-stores the same keys.
 */
class FileStore(val root: String) extends Serializable {

  private def abs(rel: String): Path = Paths.get(root, rel)

  /** Store result: `path` is None when the mime allowlist skipped the write
    * (reference returns NotAllowedMimeErr with metadata, file.go:137-139). */
  case class Stored(hash: String, mime: String, orgSize: Long,
      compSize: Long, path: Option[String])

  /** Store one response body (FileStore.Store, file.go:122-179). */
  def storeBody(raw: Array[Byte]): Stored = {
    val hash = UrlFns.sha256Hex(raw)
    val mime = UrlFns.sniffMime(raw)
    if (!graft.fetch.Correlate.mimeAllowed(mime))
      return Stored(hash, mime, raw.length.toLong, 0L, None)
    val rel = s"bodies/${hash.substring(0, 2)}/$hash"
    val target = abs(rel)
    if (Files.exists(target)) // dedup skip-if-known (file.go:141-143)
      return Stored(hash, mime, raw.length.toLong, Files.size(target), Some(rel))
    val gz = UrlFns.gzipBytes(raw)
    writeAtomic(target, gz)
    Stored(hash, mime, raw.length.toLong, gz.length.toLong, Some(rel))
  }

  /** Store screenshot bytes under the ref the fetch stage already stamped
    * into the media span (ScreenshotStore.Store, file.go:208-251 — ours is
    * write-if-absent because the name is content-derived, not rand16). */
  def storeScreenshot(ref: String, bytes: Array[Byte]): String = {
    val target = abs(ref)
    if (!Files.exists(target)) writeAtomic(target, bytes)
    ref
  }

  /** Dereference a stored body path: read + gunzip (what the reference's
    * consumer does with the gzip'd file). */
  def readBody(rel: String): Array[Byte] =
    UrlFns.gunzipBytes(Files.readAllBytes(abs(rel)))

  def readScreenshot(rel: String): Array[Byte] = Files.readAllBytes(abs(rel))

  def exists(rel: String): Boolean = Files.exists(abs(rel))

  private def writeAtomic(target: Path, bytes: Array[Byte]): Unit = {
    Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(
      target.getFileName.toString + "." + java.util.UUID.randomUUID().toString.take(8) + ".tmp")
    Files.write(tmp, bytes)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
