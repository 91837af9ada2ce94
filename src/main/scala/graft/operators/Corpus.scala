package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-level curation operators for a large-scale training-data
 * pipeline — the cross-document statistics a 100 TB pretraining corpus
 * needs beyond the per-doc projections in [[TextOps]] and the near-dup
 * family in [[Dedup]]:
 *
 *  - Gopher-style repetition statistics (Rae et al. 2021 §A1.1: documents
 *    dominated by a few repeated n-grams are boilerplate/spam);
 *  - train/eval n-gram decontamination (the GPT-3 appendix-C style
 *    13-gram overlap check, here parameterized);
 *  - deterministic stratified sampling (fixed quota per stratum, seeded
 *    hash order — reproducible corpus mixes without a global sort);
 *  - TF-IDF keyword extraction (document-frequency dim + per-doc top-k).
 *
 * Every operator is DataFrame-declarative (Catalyst plans the shuffles)
 * and engine-portable: the same formula is expressible in DuckDB SQL, so
 * each has a full hash-verified oracle (SparkEntry q34-q37).
 */
object Corpus {

  /**
   * Per-document n-gram repetition statistics (Gopher repetition rules):
   *
   *  - `top2_frac`: occurrences of the single most frequent 2-gram over
   *    total 2-grams — high ⇒ a phrase loops through the doc;
   *  - `dup5_frac`: fraction of 5-gram OCCURRENCES whose gram appears
   *    more than once — high ⇒ long spans are copy-pasted;
   *  - `repetitive`: either fraction above `maxFrac`.
   *
   * Shape at 100 TB: ONE explode (both gram sizes ride the same shuffle,
   * tagged by `n`) → groupBy(doc_id, n, gram) with map-side partial
   * aggregation (gram repeats are combined before the exchange — exactly
   * the rows this operator exists to find), then two tiny per-doc
   * reductions that reuse the same (doc_id ⊂ key) clustering. No window,
   * no per-row quadratic array scans (an `array_max(transform(distinct…))`
   * form would be O(tokens²) per row — wrong for 10k-token docs).
   */
  def repetitionStats(docs: DataFrame, maxFrac: Double = 0.2): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val tagged = (n: Int) =>
      transform(TextOps.shingles(toks, n),
        g => struct(lit(n).as("n"), g.as("gram")))
    val grams = docs
      .select(col("doc_id"),
        explode(concat(tagged(2), tagged(5))).as("g"))
      .select(col("doc_id"), col("g.n"), col("g.gram"))
    val counts = grams.groupBy("doc_id", "n", "gram")
      .agg(count(lit(1)).as("cnt"))
    val perSize = counts.groupBy("doc_id", "n").agg(
      sum("cnt").as("total"),
      max("cnt").as("top"),
      sum(when(col("cnt") > 1, col("cnt")).otherwise(lit(0L))).as("dup"))
    perSize.groupBy("doc_id").agg(
      max(when(col("n") === 2,
        round(col("top").cast("double") / col("total"), 6))).as("top2_frac"),
      max(when(col("n") === 5,
        round(col("dup").cast("double") / col("total"), 6))).as("dup5_frac"))
      .withColumn("repetitive",
        col("top2_frac") > maxFrac || col("dup5_frac") > maxFrac)
  }

  /**
   * Train/eval decontamination: for every training document, the number
   * of DISTINCT token n-grams it shares with the eval corpus (GPT-3's
   * 13-gram check; n is a parameter because short sandbox docs need
   * n=8 to be meaningful). Docs with `n_overlap > 0` are contamination
   * candidates a pipeline would drop or scrub.
   *
   * Shape at 100 TB: the eval side is a benchmark suite — thousands of
   * docs, ~10⁶ distinct grams — so its distinct gram set is BROADCAST
   * and the 100 TB train side streams through a map-side hash semi-join:
   * no shuffle of train grams at all. The per-doc distinct is array-local
   * (`array_distinct` inside the row) before the explode, so the join
   * probes each doc's gram once. If the eval side ever outgrows
   * broadcast, drop the hint and Catalyst falls back to a shuffled
   * semi-join keyed on the gram.
   */
  def decontaminate(train: DataFrame, eval: DataFrame, n: Int): DataFrame = {
    def grams(df: DataFrame): DataFrame = df.select(col("doc_id"),
      explode(array_distinct(TextOps.shingles(TextOps.tokens(col("text")), n)))
        .as("gram"))
    val evalGrams = grams(eval).select("gram").distinct()
    grams(train)
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_overlap"))
  }

  /**
   * Deterministic stratified sample: exactly `k` documents per stratum
   * (fewer if the stratum is smaller), chosen by seeded-hash order —
   * md5 over (seed, doc_id) so the draw is uniform, reproducible, and
   * portable (DuckDB's md5 produces the identical hex, so the oracle
   * replays the exact draw).
   *
   * Shape at 100 TB: the window partitions by the stratum key — rank is
   * computed inside each stratum's partitions after one exchange on
   * `stratum`, never a global sort. Skewed strata (one language = 40% of
   * the corpus) make that partition's sort big but still O(stratum);
   * for heavy skew with tiny k, a two-phase per-partition top-k (the
   * [[graft.frontier.Frontier.popSortedFifo]] pattern) drops the sort to
   * O(stratum) scan + O(k) heap — not needed at bench scale.
   */
  def stratifiedSample(docs: DataFrame, stratum: String, k: Int,
      seed: Long = 42L): DataFrame = {
    val key = md5(concat(lit(s"strat:$seed:"), col("doc_id").cast("string")))
    val w = Window.partitionBy(col("stratum")).orderBy(col("draw"), col("doc_id"))
    docs.select(col(stratum).as("stratum"), col("doc_id"), key.as("draw"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .drop("draw")
  }

  /**
   * TF-IDF keyword extraction: per document, the top-`k` tokens by
   * `tf · ln(N/df)` (rounded to 6 decimals for cross-engine determinism,
   * ties broken by token — the same round-then-rank discipline as the
   * cosine re-ranks in [[Similarity]]). Tokens appearing in every
   * document score 0 and are dropped.
   *
   * Shape at 100 TB: term frequencies are ONE groupBy(doc_id, token)
   * with map-side combine; the document-frequency dim re-aggregates
   * those rows by token — a vocabulary-sized table (Zipf-bounded, ≪
   * corpus) that BROADCASTS back onto the tf rows; the top-k window
   * partitions by doc_id (clustering the tf aggregation already
   * produced — no extra exchange). `nDocs` arrives as a parameter so
   * callers reuse a known cardinality instead of paying a count scan.
   */
  def tfidfTopK(docs: DataFrame, k: Int, nDocs: Long): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfDim = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfDim), Seq("token"))
      .withColumn("score",
        round(col("tf") * log(lit(nDocs.toDouble) / col("df")), 6))
      .filter(col("score") > 0)
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("token"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("doc_id", "token", "tf", "df", "score", "rk")
  }
}
