package graft.frontier

/**
 * A compact cuckoo filter (Fan et al., CoNEXT'14): approximate set
 * membership with NO false negatives, tunable false-positive rate, and —
 * unlike Bloom — support for deletion and bounded-size incremental
 * inserts. Used as the PER-PARTITION seen-set refinement the north rule
 * names: each frontier host-bucket owns one filter, checkpointed per
 * round (see [[SeenFilterStore]]); candidates that miss the filter are
 * provably new and skip the exact merge join.
 *
 * Layout: `numBuckets` buckets × 4 slots × 16-bit fingerprints in one
 * short array. Standard partial-key cuckoo hashing: bucket2 =
 * bucket1 XOR hash(fingerprint), ≤500 kicks before declaring full.
 * ~0.0003 false-positive rate at 95% load with 16-bit fingerprints.
 */
final class CuckooFilter private (val numBuckets: Int, val table: Array[Short])
    extends Serializable {

  import CuckooFilter._

  /** Homeless-fingerprint stash: when the kick loop exhausts, the evicted
    * fingerprint lands HERE instead of being dropped — otherwise a
    * previously-added key could report mightContain=false, breaking the
    * documented no-false-negatives contract. Normally empty; a growing
    * stash is the resize signal. */
  private val stash = scala.collection.mutable.ArrayBuffer.empty[Short]

  def stashSize: Int = stash.length

  def this(capacity: Int) = this(
    CuckooFilter.bucketsFor(capacity),
    new Array[Short](CuckooFilter.bucketsFor(capacity) * CuckooFilter.SLOTS))

  private def idx(h: Long): Int = (h & (numBuckets - 1)).toInt

  private def altIndex(i: Int, fp: Short): Int =
    idx(i.toLong ^ (mix(fp & 0xffffL) & 0x7fffffffL))

  private def insertAt(i: Int, fp: Short): Boolean = {
    var s = 0
    while (s < SLOTS) {
      if (table(i * SLOTS + s) == 0) { table(i * SLOTS + s) = fp; return true }
      s += 1
    }
    false
  }

  private def containsAt(i: Int, fp: Short): Boolean = {
    var s = 0
    while (s < SLOTS) {
      if (table(i * SLOTS + s) == fp) return true
      s += 1
    }
    false
  }

  /** Insert; returns false only when the filter is saturated (caller
    * should resize). Membership stays correct even then: an exhausted kick
    * loop stashes the homeless fingerprint rather than dropping it, so
    * `mightContain` NEVER returns false for an added key. Idempotent-ish:
    * a pre-`contains` check keeps duplicates from eating slots. */
  def add(key: String): Boolean = {
    val h = hash(key)
    val fp = fingerprint(h)
    val i1 = idx(h >>> 16)
    val i2 = altIndex(i1, fp)
    if (containsAt(i1, fp) || containsAt(i2, fp)) return true
    if (insertAt(i1, fp) || insertAt(i2, fp)) return true
    // kick loop
    var i = if (((h >>> 60) & 1L) == 0L) i1 else i2
    var f = fp
    var n = 0
    val rnd = new java.util.Random(h)
    while (n < 500) {
      val slot = rnd.nextInt(SLOTS)
      val evicted = table(i * SLOTS + slot)
      table(i * SLOTS + slot) = f
      f = evicted
      i = altIndex(i, f)
      if (insertAt(i, f)) return true
      n += 1
    }
    // table saturated: keep the evicted fingerprint queryable in the stash
    // (checked by mightContain) and report saturation so the caller resizes
    stash += f
    stash.length <= 4
  }

  /** No false negatives: returns true for every added key. */
  def mightContain(key: String): Boolean = {
    val h = hash(key)
    val fp = fingerprint(h)
    val i1 = idx(h >>> 16)
    containsAt(i1, fp) || containsAt(altIndex(i1, fp), fp) || stash.contains(fp)
  }

  /** Remove one copy of the key's fingerprint (cuckoo's edge over Bloom —
    * e.g. frontier compaction when a host is retired). */
  def remove(key: String): Boolean = {
    val h = hash(key)
    val fp = fingerprint(h)
    def removeAt(i: Int): Boolean = {
      var s = 0
      while (s < SLOTS) {
        if (table(i * SLOTS + s) == fp) { table(i * SLOTS + s) = 0; return true }
        s += 1
      }
      false
    }
    val i1 = idx(h >>> 16)
    removeAt(i1) || removeAt(altIndex(i1, fp))
  }

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + table.length * 2 + stash.length * 2)
    bb.putInt(numBuckets)
    table.foreach(bb.putShort)
    stash.foreach(bb.putShort) // trailing shorts = stash (usually none)
    bb.array()
  }

  private[frontier] def restoreStash(fps: Seq[Short]): Unit = stash ++= fps
}

object CuckooFilter {
  val SLOTS = 4

  /** Power-of-two bucket count for `capacity` keys at ≤95% load. */
  def bucketsFor(capacity: Int): Int =
    Integer.highestOneBit(math.max(4, (capacity / 0.95 / SLOTS).toInt * 2 - 1))

  def hash(s: String): Long = {
    // FNV-1a then avalanche — fast, dependency-free, stable across JVMs
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    mix(h)
  }

  def mix(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  /** Non-zero 16-bit fingerprint (0 marks an empty slot). */
  def fingerprint(h: Long): Short = {
    val fp = (h & 0xffffL).toShort
    if (fp == 0) 1.toShort else fp
  }

  def deserialize(bytes: Array[Byte]): CuckooFilter = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val nb = bb.getInt
    val table = new Array[Short](nb * SLOTS)
    var i = 0
    while (i < table.length) { table(i) = bb.getShort; i += 1 }
    val cf = new CuckooFilter(nb, table)
    val stash = scala.collection.mutable.ArrayBuffer.empty[Short]
    while (bb.remaining() >= 2) stash += bb.getShort
    cf.restoreStash(stash.toSeq)
    cf
  }
}
