package graft.frontier

import graft.sources.IcebergishTable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Partition-local EXACT pool-membership index — the delta-pool counterpart
 * of [[SeenIndex]].
 *
 * Why it exists: with the LSM-style delta pool ([[graft.sources
 * .IcebergishTable.appendDelta]]) the round no longer rewrites (and
 * therefore no longer re-aggregates) the live pool, so candidate first-seen
 * dedup can't ride the merge aggregation's `min(src)` rule
 * (store/url.go:168-170 semantics — an existing row always wins). Instead a
 * candidate is dropped iff its url is ALREADY IN THE POOL FILES (base +
 * live deltas) — this index — or in the seen archive ([[SeenIndex]]; a
 * popped url's stale base row stays on disk until compaction, but it is
 * archived, so the pair of probes covers every ever-seen url exactly.
 *
 * Design mirrors [[SeenIndex]]: bucket b's pool files are the manifest's
 * base file for b plus the per-round delta slices `delta/round=d/
 * host_bucket=b`; the candidate filter runs on the 1:1 token-partitioned
 * candidate aggregation output, so the task's partitionIndex IS the bucket.
 * The set loads once per JVM per bucket and maintains itself incrementally
 * (one delta slice per round); a compaction changes the bucket's base path,
 * which resets the entry (one O(pool_bucket) reload per compaction —
 * amortized over `poolDeltaRounds` rounds).
 *
 * Replay safety: probes pass `snapRound = round − 1`; the manifest at that
 * round and delta rounds ≤ snapRound are immutable (a torn round r only
 * ever rewrites `delta/round=r`, which no probe with cutoff r−1 reads).
 */
object PoolIndex {

  private final class Entry {
    var baseKey: String = null
    var maxDeltaRound: Int = Int.MinValue
    // concurrent set for the same reason as SeenIndex.Entry: peek() may
    // read while a loader appends; compaction resets go through clear()
    // under e.synchronized, and a racing peek across a reset can only see
    // a subset — advisory-safe by the peek contract.
    val set: java.util.Set[UTF8String] =
      java.util.concurrent.ConcurrentHashMap.newKeySet[UTF8String]()
  }

  private val cache = new java.util.concurrent.ConcurrentHashMap[(String, Int), Entry]()
  private val manifests =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), IcebergishTable.Snapshot]()
  private val currentRoot = new java.util.concurrent.atomic.AtomicReference[String]()

  /** Test/maintenance hook: drop all cached bucket sets. */
  def invalidate(): Unit = { cache.clear(); manifests.clear(); currentRoot.set(null) }

  /** The (immutable once written) manifest of `root` at `snapRound` —
    * cached per JVM; loud failure if the on-disk manifest moved past the
    * expected round (a probe constructed against a stale snapshot). */
  private def snapshotAt(root: String, snapRound: Int): IcebergishTable.Snapshot = {
    val cached = manifests.get((root, snapRound))
    if (cached != null) return cached
    val s = IcebergishTable.parseManifest(
      java.nio.file.Files.readString(java.nio.file.Paths.get(root, "manifest.json")))
    if (s.round != snapRound)
      throw new IllegalStateException(
        s"pool index expected manifest round $snapRound at $root, found ${s.round}")
    // bounded retention: keep only snapRound and snapRound-1 per root (a
    // round's probes use snapRound = round-1; round-2 can still be in
    // flight on a straggler task). Without this a long crawl accumulates
    // one O(numBuckets) Snapshot per round per JVM — unbounded creep at
    // the 10^4-5 bucket design point.
    val it = manifests.keySet.iterator()
    while (it.hasNext) {
      val k = it.next()
      if (k._1 == root && k._2 < snapRound - 1) it.remove()
    }
    manifests.put((root, snapRound), s)
    s
  }

  def contains(root: String, snapRound: Int, bucket: Int, url: UTF8String): Boolean =
    entryFor(root, snapRound, bucket).set.contains(url)

  /** Peek-only probe (see [[SeenIndex.peek]]): true iff the bucket's set
    * is already resident and contains `url`. A hit is exact evidence the
    * url was EVER pooled (even across a stale base: ever-seen is
    * monotone — pool members either stay pooled or move to the archive),
    * so advisory early dropping is safe wherever the authoritative
    * PoolIndexContains/SeenIndexContains pair still runs downstream. */
  def peek(root: String, bucket: Int, url: UTF8String): Boolean = {
    val e = cache.get((root, bucket))
    e != null && e.set.contains(url)
  }

  private def entryFor(root: String, snapRound: Int, bucket: Int): Entry = {
    val cur = currentRoot.get()
    if (cur != root) synchronized {
      if (currentRoot.get() != root) {
        cache.clear(); manifests.clear(); currentRoot.set(root)
      }
    }
    val s = snapshotAt(root, snapRound)
    val baseKey = s.buckets.get(bucket)
      .map(e => s"$root/${e.dir}/hb=$bucket").getOrElse("")
    val e = cache.computeIfAbsent((root, bucket), _ => new Entry)
    e.synchronized {
      if (e.baseKey != baseKey) {
        e.set.clear()
        if (baseKey.nonEmpty) {
          // loud, not silent: a missing base dir means this probe was built
          // against a STALE manifest (e.g. a mid-crawl re-seed rewrote the
          // snapshot at the same round and pruned the old base) — loading
          // nothing would silently drop pool membership and re-admit
          // duplicate urls
          if (!java.nio.file.Files.exists(java.nio.file.Paths.get(baseKey)))
            throw new IllegalStateException(
              s"pool index base dir missing: $baseKey (stale manifest snapshot? " +
                "re-seeding mid-crawl requires PoolIndex.invalidate() per JVM)")
          SeenIndex.loadUrlDir(baseKey, e.set)
        }
        e.baseKey = baseKey
        e.maxDeltaRound = s.compactRound
      }
      while (e.maxDeltaRound < snapRound) {
        SeenIndex.loadUrlDir(
          s"$root/delta/round=${e.maxDeltaRound + 1}/host_bucket=$bucket", e.set)
        e.maxDeltaRound += 1
      }
    }
    e
  }
}

/**
 * `pool_index_contains(url)` — true iff `url` is in the pool files (base +
 * deltas) of the snapshot at `snapRound`, for THIS task's bucket.
 * Nondeterministic for the same two reasons as [[SeenIndexContains]]: the
 * partitionIndex→bucket binding (only valid on 1:1 token-partitioned
 * output) and pushdown protection.
 */
case class PoolIndexContains(child: Expression, root: String, snapRound: Int)
  extends UnaryExpression with Nondeterministic with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "pool_index_contains"

  @transient private var bucket: Int = _

  override protected def initializeInternal(partitionIndex: Int): Unit =
    bucket = partitionIndex

  override protected def evalInternal(input: InternalRow): Any = {
    val u = child.eval(input)
    if (u == null) false
    else PoolIndex.contains(root, snapRound, bucket, u.asInstanceOf[UTF8String])
  }

  override protected def withNewChildInternal(newChild: Expression): PoolIndexContains =
    copy(child = newChild)
}
