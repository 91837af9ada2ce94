package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for training-data pipelines, over a corpus
 * `(doc_id, text)`:
 *
 *  - exact dedup (hash-groupBy on a normalized fingerprint);
 *  - n-gram Jaccard near-dup pairs (length-band blocked exact join);
 *  - MinHash + LSH near-dup pairs (shingle → minhash → band → bucket-join
 *    → exact-Jaccard verify — candidates only, never trusts the sketch);
 *  - SimHash near-dup pairs (64-bit sign-sketch, pigeonhole block join →
 *    exact Hamming verify).
 *
 * Scale design: every near-dup variant is candidate-generation-by-equi-join
 * (shuffle on a small blocking key) + per-pair verification — never a cross
 * join. MinHash bands and SimHash blocks bound candidate fan-out
 * independently of corpus size; skewed buckets (boilerplate shingles) are
 * the known hot spot — cap bucket width upstream if a real corpus needs it.
 */
object Dedup {

  /** Exact dedup: keep the lowest doc_id per normalized-text fingerprint
    * (one shuffle on the 16-byte hash, map-side combinable). */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(TextOps.normFingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dupes"))

  /** Distinct SORTED token n-gram shingle array of a text column (sorted
    * so the pairwise Jaccard below is a zero-alloc two-pointer merge). */
  def shingleArr(textCol: Column, n: Int): Column =
    array_sort(array_distinct(TextOps.shingles(TextOps.tokens(textCol), n)))

  /** Exact Jaccard over two sorted-distinct arrays — custom merge
    * expression ([[graft.functions.GraftExpressions.JaccardSorted]]);
    * ~10x the array_intersect/array_union composition at corpus scale. */
  def jaccard(a: Column, b: Column): Column =
    graft.functions.GraftExpressions.jaccard_sorted(a, b)

  /**
   * Exact n-gram Jaccard near-dup pairs, blocked by token-count band
   * (near-dups at threshold t have token counts within factor ~1/t, so a
   * coarse length band plus its neighbor covers them; band join keeps the
   * self-join linear-ish instead of quadratic).
   */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.8,
      bandWidth: Int = 16): DataFrame = {
    graft.functions.GraftExpressions.register(docs.sparkSession)
    val prep = docs.select(col("doc_id"), shingleArr(col("text"), n).as("sh"),
      (TextOps.tokenCount(col("text")) / bandWidth).cast("int").as("band"))
      .persist()
    // candidate generation ships IDs ONLY — the ~KB shingle arrays never
    // enter the band shuffle (they'd multiply the exchange by pair fan-out);
    // arrays re-attach afterwards via two joins against the slim prep table.
    // The a-side probes all adjacent bands, so matched pairs are exactly
    // those with |band(a)-band(b)| <= 1 regardless of id order.
    val left = prep.select(col("doc_id").as("a_id"),
      explode(array(col("band") - 1, col("band"), col("band") + 1)).as("band"))
    val right = prep.select(col("doc_id").as("b_id"), col("band"))
    // No dedup needed: for any pair with |Δband| ≤ 1, exactly one of the
    // two orientations matches exactly one probe band AND passes a<b —
    // the 3-band probe plus the inequality is already duplicate-free
    // (dropDuplicates here cost a 17M-row exchange at sf0.1).
    val candIds = left.join(right, Seq("band"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
    attachAndVerify(candIds, prep.select(col("doc_id"), col("sh")), threshold)
  }

  /** Two-pointer Jaccard over two sorted-distinct arrays, rounded 6dp
    * HALF_UP (matches Spark/DuckDB `round`). */
  def jaccardSortedArrays(a: IndexedSeq[String], b: IndexedSeq[String]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      val c = a(i).compareTo(b(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val jac = inter.toDouble / (a.length + b.length - inter).toDouble
    BigDecimal(jac).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /**
   * Verify id-only candidate pairs against exact Jaccard ≥ threshold.
   * The shingle dictionary is broadcast and each pair computes ONE
   * zero-alloc merge in mapPartitions — joining the ~KB arrays onto
   * millions of candidate rows would materialize pairs×arrays (measured
   * ~50 GB at 5.7M candidates) and dominate wall time. Requires the
   * dictionary to fit an executor (fine to ~10^6 docs per verify shard;
   * beyond that, shard candIds by a_id range and verify per shard).
   */
  private def attachAndVerify(candIds: DataFrame, sh: DataFrame,
      threshold: Double): DataFrame = {
    val spark = candIds.sparkSession
    import spark.implicits._
    val dict = sh.select(col("doc_id").cast("long"), col("sh"))
      .as[(Long, Seq[String])].collect()
      .map { case (id, s) => id -> s.toIndexedSeq }.toMap
    val bDict = spark.sparkContext.broadcast(dict)
    candIds.select(col("a_id").cast("long"), col("b_id").cast("long"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val m = bDict.value
        it.flatMap { case (a, b) =>
          val j = jaccardSortedArrays(m(a), m(b))
          if (j >= threshold) Some((a, b, j)) else None
        }
      }
      .toDF("a_id", "b_id", "jaccard")
  }

  /** MinHash signature. Each shingle string is hashed ONCE to a long;
    * the `numHashes` family then mixes (h, seed) over 8-byte longs —
    * ~4x cheaper than re-hashing the string bytes per seed. */
  def minhashSignature(sh: Column, numHashes: Int): Column = {
    val sh64 = transform(sh, x => xxhash64(x))
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(sh64, h => xxhash64(h, i))))
  }

  /**
   * MinHash-LSH near-dup pairs: signature → `bands` bands of `rows` hashes
   * → bucket equi-join on (band_idx, band_hash) → exact-Jaccard verify.
   * Detection probability 1-(1-J^rows)^bands; defaults give ~1.0 recall at
   * J ≥ 0.8. The verify step makes precision exact, so output ⊆ the true
   * Jaccard-threshold pairs.
   */
  def minhashLshPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.8,
      bands: Int = 32, rows: Int = 4): DataFrame = {
    graft.functions.GraftExpressions.register(docs.sparkSession)
    val numHashes = bands * rows
    val prep = docs
      .select(col("doc_id"), shingleArr(col("text"), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
      .persist() // scanned 3x (banding + both array re-attach joins)
    // bucket join on ids only (see ngramJaccardPairs — arrays stay out of
    // the candidate shuffle), then exact-Jaccard verify
    val banded = prep.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows)), b)))
        .as(Seq("band_idx", "band_hash")))
    val l = banded.select(col("band_idx"), col("band_hash"), col("doc_id").as("a_id"))
    val r = banded.select(col("band_idx"), col("band_hash"), col("doc_id").as("b_id"))
    val candIds = l.join(r, Seq("band_idx", "band_hash"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").dropDuplicates("a_id", "b_id")
    attachAndVerify(candIds, prep.select(col("doc_id"), col("sh")), threshold)
  }

  /** 64-bit SimHash of the token multiset: bit j = sign of the sum over
    * tokens of (bit j of xxhash64(token) ? +1 : -1). Pure column algebra —
    * aggregate + zip_with, no UDF. */
  def simhash(textCol: Column): Column = {
    val toks = TextOps.tokens(textCol)
    val signs = aggregate(
      toks,
      transform(sequence(lit(0), lit(63)), _ => lit(0L)),
      (acc, t) => zip_with(acc,
        transform(sequence(lit(0), lit(63)),
          j => call_function("shiftright", xxhash64(t), j).bitwiseAND(lit(1L)) * 2 - 1),
        (a, b) => a + b))
    aggregate(
      zip_with(signs, sequence(lit(0), lit(63)),
        (s, j) => when(s > 0, call_function("shiftleft", lit(1L), j.cast("int"))).otherwise(lit(0L))),
      lit(0L), (a, x) => a.bitwiseOR(x))
  }

  /**
   * SimHash near-dup pairs with Hamming distance ≤ maxHamming. Candidates
   * by pigeonhole blocking: split the 64-bit sketch into `maxHamming+1`
   * 16-bit-ish blocks — any pair within distance k agrees on ≥1 of k+1
   * blocks → recall 1.0 (requires maxHamming ≤ 3 with 4 blocks). Verify =
   * exact bit_count(xor).
   */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-block pigeonhole covers hamming <= 3")
    val prep = docs.select(col("doc_id"), simhash(col("text")).as("sh64"))
    val blocked = prep.select(col("doc_id"), col("sh64"),
      posexplode(transform(sequence(lit(0), lit(3)),
        b => call_function("shiftright", col("sh64"), (b * 16).cast("int")).bitwiseAND(lit(0xffffL))))
        .as(Seq("block_idx", "block_val")))
    val l = blocked.select(col("block_idx"), col("block_val"),
      col("doc_id").as("a_id"), col("sh64").as("a_sh"))
    val r = blocked.select(col("block_idx"), col("block_val"),
      col("doc_id").as("b_id"), col("sh64").as("b_sh"))
    l.join(r, Seq("block_idx", "block_val"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_sh", "b_sh").dropDuplicates("a_id", "b_id")
      .withColumn("hamming", bit_count(col("a_sh").bitwiseXOR(col("b_sh"))))
      .filter(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
  }

  /** Survivor view after near-dup clustering: drop the higher doc_id of
    * every verified pair (greedy, deterministic). */
  def survivors(docs: DataFrame, pairs: DataFrame): DataFrame =
    docs.join(pairs.select(col("b_id").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
}
