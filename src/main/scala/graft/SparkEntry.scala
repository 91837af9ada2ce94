package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftExpressions
import graft.operators.{Clean, Corpus, Dedup, Graphs, Recrawl, Similarity, Sketches, TextOps}

/**
 * Driver contract (SURVEY.md §7.0): `entry` is the flagship query;
 * `queries` maps operator names (SURVEY.md §2 + training-data ops) to
 * DataFrame builders over a testdata sf dir; `oracleSql` gives
 * DuckDB-equivalent SQL per query. Column names are aliased identically on
 * both sides (the driver hash-compares by sorted column name); float
 * results are rounded to 6 decimals on both sides.
 *
 * Queries q03-q10 express the crawl-engine operator semantics (anti-join
 * seen-set, top-k pop, fairness weights, dictionary encode, JSON feed
 * decode, chain self-join, union fan-in, URL decomposition) over the
 * TPC-H-ish tables so DuckDB can verify them; q20+ are the training-data
 * pipeline operators (dedup family, text analysis, similarity search).
 * EVERY query here is hash-verified end to end — including the
 * recall<1-by-design approximate pipelines: SimHash (q28) and winnowing
 * (q31) recompute the full sketch in DuckDB (md5-derived / mod-2^61
 * hashes chosen for exactly that portability); the sign-LSH paths (q27,
 * q29) rebuild the exact md5-derived hyperplane matrix, buckets, and
 * candidate set in SQL; q30 unrolls all 4 Lloyd iterations as CTE layers
 * with float32-emulated centroid means; q32 rebuilds the synthetic media
 * bytes byte-for-byte. OperatorsSpec additionally asserts measured recall
 * floors for the approximate variants vs their exact baselines.
 */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Scan with SCALE-ADAPTIVE map-side parallelism (optimization guide
    * §2.5 "input skew" / §6 input-split sizing): the testdata tables are
    * single parquet files, and under the bench session's 16 MB split
    * heuristics a single file is ONE scan partition — so a per-row
    * CPU-heavy map stage (shingling, md5 hashing, regex scans, codecs)
    * that precedes the first exchange runs on ONE core regardless of
    * `local[N]`. A round-robin repartition to the session's default
    * parallelism right after the read fans that work out. The gate is
    * derived from the scan's actual split count vs the session's core
    * count — NOT a constant: at production scale a 100 TB table scans as
    * thousands of splits, the gate holds and this is a no-op, so no extra
    * exchange is ever paid where the scan is already parallel. Applied
    * SELECTIVELY (round-6 INTERLEAVED A/B, tools/AbProbe — separate-run
    * A/B is invalid on this host, see OPTIMIZATION_r06.md): only where
    * the pre-exchange per-row work dominates AND the scan subtree is
    * effectively derived once — a repartition costs a fixed exchange per
    * scan-subtree re-derivation and measured as a LOSS on every
    * multi-derivation query (q24/q27/q29/q33/q48/q60 pairs in the doc). */
  private def tpar(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = t(spark, dir, name)
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }


  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.5 aggregates: classic scan→filter→agg (TPC-H Q1 shape).
    "q01_pricing_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // O5 host-dim normalization: custom Catalyst `etld1` expression
    // (store/store.go:339-344 semantics, FULL PSL rule matching). The
    // fixture exercises every rule class — two-level suffix, deep
    // subdomain, case normalization, IP → NULL, bare suffix → NULL,
    // dotless → NULL, private registry (github.io), wildcard (`*.ck`),
    // exception (`!www.ck`), three-level wildcard (`*.sch.uk`), bare
    // wildcard match → NULL — and the oracle encodes the EXPECTED output
    // per branch (it does not re-implement etld1, so a wrong rule
    // precedence diverges).
    "q02_etld1_hosts" -> ((s, dir) => {
      GraftExpressions.register(s)
      val k = col("c_custkey")
      val host = when(k % 11 === 0, concat(lit("WWW.Sub.cust"), k, lit(".co.uk")))
        .when(k % 11 === 1, concat(lit("a.b.cust"), k, lit(".com.au")))
        .when(k % 11 === 2, concat(lit("www.Cust"), k, lit(".COM")))
        .when(k % 11 === 3, concat(lit("10.0."), k % 256, lit(".1")))
        .when(k % 11 === 4, lit("co.uk"))
        .when(k % 11 === 5, lit("localhost"))
        .when(k % 11 === 6, concat(lit("cust"), k, lit(".github.io")))
        .when(k % 11 === 7, concat(lit("deep.x.cust"), k, lit(".ck")))
        .when(k % 11 === 8, lit("WWW.CK"))
        .when(k % 11 === 9, concat(lit("b.a.cust"), k, lit(".sch.uk")))
        .otherwise(concat(lit("cust"), k, lit(".ck")))
      t(s, dir, "customer")
        .select(col("c_custkey"),
          GraftExpressions.etld1(host).as("registrable"))
        .orderBy(col("c_custkey"))
    }),

    // F1/F8 seen-set anti-join (urlStore.Add / FilterKnown).
    "q03_frontier_antijoin" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders").select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .select("c_custkey").orderBy("c_custkey")
    }),

    // F3 frontier pop: per-host top-k by (depth, discovered_at) →
    // per-custkey top-2 orders by (o_orderdate, o_orderkey).
    "q04_pop_topk_per_group" -> ((s, dir) => {
      t(s, dir, "orders")
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_orderdate"), col("o_orderkey"))))
        .filter(col("rk") <= 2)
        .withColumn("rk", col("rk").cast("long"))
        .select("o_custkey", "o_orderkey", "rk")
        .orderBy("o_custkey", "rk")
    }),

    // F5 PairSampler fairness weights: base/(visits+1), base=2000 iff
    // exactly one visit (store/url.go:297-333).
    "q05_pair_sampler_weights" -> ((s, dir) => {
      t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("visits"))
        .withColumn("weight", round(
          when(col("visits") === 1, lit(2000.0)).otherwise(lit(1.0)) /
            (col("visits") + lit(1.0)), 6))
        .orderBy("o_custkey")
    }),

    // O2 dictionary encoding: first-seen-order dense ids over a dim.
    "q06_dict_encode" -> ((s, dir) => {
      t(s, dir, "orders").select("o_orderpriority").distinct()
        .withColumn("id", dense_rank().over(
          Window.partitionBy(lit(1)).orderBy(col("o_orderpriority"))).cast("long"))
        .orderBy("id")
    }),

    // S4 feed decode: JSON payload extraction + per-key aggregation
    // (PhishTank provider, provider.go:219-266).
    "q07_events_json" -> ((s, dir) => {
      tpar(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("cnt"),
          max(col("event_id")).as("hwm"))
        .orderBy("event_type")
    }),

    // W7 chain self-join: consecutive-sequence linkage (redirect chains).
    // Round 6 (guide §2.3/§2.4): the self-join form scanned lineitem twice
    // and shuffled the full table on both sides of a (l_orderkey,
    // l_linenumber) join. Equivalent single-scan form: aggregate per
    // (order, line) FIRST — cnt rows and qty sum, map-side combinable —
    // then a window `lead` links consecutive line numbers and the products
    // replay the join's duplicate semantics exactly (the testdata has
    // duplicate (order, line) pairs, so a plain per-row lead would NOT be
    // equivalent): pairs(o) = Σ cnt(ln)·cnt(ln+1), next_qty(o) =
    // Σ cnt(ln)·qsum(ln+1); q_quantity values are integer-valued doubles,
    // so the regrouped sum is exact. One scan, aggregated rows through the
    // window, and the final per-order aggregate reuses the window's
    // partitioning (oracle-verified identical).
    "q08_chain_selfjoin" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
      t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(count(lit(1)).as("c"), sum(col("l_quantity")).as("q"))
        .withColumn("nxt_ln", lead(col("l_linenumber"), 1).over(w))
        .withColumn("nxt_c", lead(col("c"), 1).over(w))
        .withColumn("nxt_q", lead(col("q"), 1).over(w))
        .filter(col("nxt_ln") === col("l_linenumber") + 1)
        .groupBy("l_orderkey")
        .agg(sum(col("c") * col("nxt_c")).as("chain_pairs"),
          round(sum(col("c") * col("nxt_q")), 2).as("next_qty_sum"))
        .orderBy("l_orderkey")
    }),

    // S6 union fan-in + S4 high-watermark.
    "q09_union_watermark" -> ((s, dir) => {
      val e = t(s, dir, "events")
      e.filter(col("event_type") === "click")
        .unionByName(e.filter(col("event_type") === "error"))
        .groupBy("event_type")
        .agg(max(col("event_id")).as("hwm"), count(lit(1)).as("cnt"))
        .orderBy("event_type")
    }),

    // O6 URL decomposition: parse_url components + custom etld1 over hosts
    // that hit two-level-suffix, normal, and wildcard-fallback branches
    // (oracle states the expected registrable per branch).
    "q10_url_parts" -> ((s, dir) => {
      GraftExpressions.register(s)
      val k = col("s_suppkey")
      val domain = when(k % 3 === 0, lit(".co.uk"))
        .when(k % 3 === 1, lit(".example.com"))
        .otherwise(lit(".com.au"))
      t(s, dir, "supplier")
        .withColumn("url", concat(lit("https://www.s"), k, domain,
          lit("/cat/"), col("s_nationkey"),
          lit("?id="), col("s_suppkey")))
        .select(col("s_suppkey"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY")).as("query"),
          GraftExpressions.etld1(parse_url(col("url"), lit("HOST"))).as("registrable"))
        .orderBy("s_suppkey")
    }),

    // ---- training-data ops over documents/embeddings ----

    // Exact dedup: hash-groupBy on normalized fingerprint.
    "q20_dedup_exact" -> ((s, dir) => {
      Dedup.exactDedup(t(s, dir, "documents")).orderBy("doc_id")
    }),

    // Token counting: whitespace + BPE-ish boundary tokens.
    "q21_token_stats" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tok"),
        TextOps.bpeTokenCount(col("text")).cast("long").as("n_bpe"))
        .orderBy("doc_id")
    }),

    // Language ID heuristic, aggregated.
    "q22_langid" -> ((s, dir) => {
      tpar(s, dir, "documents")
        .select(TextOps.langId(col("text")).as("lang"))
        .groupBy("lang").agg(count(lit(1)).as("cnt"))
        .orderBy("lang")
    }),

    // Quality scoring.
    "q23_quality" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        TextOps.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    }),

    // n-gram Jaccard near-dup pairs — prefix-filtered exact set-similarity
    // join with COMPLETE recall, so the oracle is pure brute force (no
    // blocking replicated on the DuckDB side: a recall loss would diverge).
    "q24_jaccard_pairs" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), n = 3, threshold = 0.5)
        .orderBy("a_id", "b_id")
    }),

    // MinHash+LSH near-dup pairs, exact-verified: output must equal the
    // full exact-Jaccard pair set at the threshold (recall ~1 at J≥0.8 with
    // 32 bands × 4 rows; verify step makes precision exact).
    "q25_minhash_pairs" -> ((s, dir) => {
      Dedup.minhashLshPairs(tpar(s, dir, "documents"), n = 3, threshold = 0.8)
        .orderBy("a_id", "b_id")
    }),

    // Brute-force cosine top-k (exact ANN baseline).
    "q26_cosine_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 20), 5)
        .orderBy("q_id", "rk")
    }),

    // Embedding-cosine near-dup pairs, sign-LSH blocked + exact verify.
    // Planes are md5-derived (the q29 technique), evaluated by the one-pass
    // sign_buckets_md5 expression — bit-identical to the literal-matrix
    // column algebra (property-tested), so the oracle still rebuilds the
    // exact blocked pipeline in SQL (full hash-verified even at recall < 1).
    "q27_embed_neardup" -> ((s, dir) => {
      Similarity.cosineNearDupPairs(t(s, dir, "embeddings"), threshold = 0.8,
        tables = 12, planesPerTable = 10, md5Planes = true)
        .orderBy("a_id", "b_id")
    }),

    // SimHash near-dup pairs. The sketch's token hash is md5-derived
    // (Dedup.md5Hash60) precisely so DuckDB can recompute the full 60-bit
    // SimHash per doc; pigeonhole blocking has recall 1.0 at hamming ≤ 3,
    // so the oracle brute-forces all pairs — a full hash-verified check.
    "q28_simhash_pairs" -> ((s, dir) => {
      Dedup.simhashPairs(tpar(s, dir, "documents"), maxHamming = 3)
        .withColumn("hamming", col("hamming").cast("long"))
        .orderBy("a_id", "b_id")
    }),

    // Sign-LSH ANN top-k. Recall<1 by design, but the PLANES are
    // md5-derived (sign_buckets_md5 — bit-identical to the literal-matrix
    // form, property-tested), so the DuckDB oracle rebuilds the exact same
    // hyperplanes, buckets, candidate set, and cosine re-rank — a full
    // hash-verified check of the approximate pipeline itself (recall floor
    // vs brute force still in OperatorsSpec).
    "q29_ann_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.annTopK(emb, emb.filter(col("vec_id") < 20), 5,
        tables = 32, planesPerTable = 5, md5Planes = true)
        .orderBy("q_id", "rk")
    }),

    // IVF coarse ANN over seeded Lloyd's k-means centroids. Hash-verified:
    // the k-means init orders by md5 (cross-engine hash) and the oracle
    // unrolls all 4 Lloyd iterations in SQL — init sample, per-cell
    // float32 centroid means, argmax-cosine assignment, nprobe probing,
    // and the exact re-rank (recall floor vs brute force in OperatorsSpec).
    // Round 6: each Lloyd iteration is ONE distributed aggregate over a
    // per-row literal-matrix assignment (no broadcast build, no argmax
    // exchange — see Similarity.nearestCell); an entry-level repartition+
    // pin of the corpus was A/B-probed interleaved and REJECTED (the pin
    // barrier cost more than the re-derived single-split scans).
    "q30_ivf_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val centroids = Similarity.kmeansCentroids(emb, cells = 16, iters = 4)
      val assigned = Similarity.ivfAssign(emb, centroids)
      Similarity.ivfTopK(assigned, centroids, emb.filter(col("vec_id") < 20),
        k = 5, nprobe = 4)
        .orderBy("q_id", "rk")
    }),

    // Winnowing rolling-hash document fingerprints (Schleimer et al.,
    // SIGMOD'03). Hash arithmetic is mod 2^61 so DuckDB reproduces every
    // k-gram hash in 128-bit SQL — the oracle recomputes the FULL distinct
    // fingerprint set per doc, not just sketch stats.
    "q31_winnow_fingerprint" -> ((s, dir) => {
      import s.implicits._
      tpar(s, dir, "documents").select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .flatMap { case (id, text) => TextOps.winnow(text).map(fp => (id, fp)) }
        .toDF("doc_id", "fp")
        .orderBy("doc_id", "fp")
    }),

    // Multimodal pipeline plumbing: synthetic binary media from docs →
    // magic-byte mime sniff (custom expression) → stubbed decode →
    // per-kind feature stats. Hash-verified end to end: the media bytes
    // are md5-derived so DuckDB rebuilds them byte-for-byte (see oracleSql).
    "q32_media_features" -> ((s, dir) => {
      import graft.operators.Multimodal
      val media = Multimodal.mediaFromDocs(tpar(s, dir, "documents"))
      val sniffed = Multimodal.withSniffedMime(media.toDF())
      val feats = Multimodal.extractFeatures(media).toDF()
      sniffed.select(col("media_id"), col("kind"), col("sniffed_mime"),
          col("byte_size"))
        .join(feats.select(col("media_id"),
          round(element_at(col("features"), 1).cast("double"), 6).as("f0")),
          Seq("media_id"))
        .groupBy("kind", "sniffed_mime")
        .agg(count(lit(1)).as("cnt"),
          round(avg(col("byte_size")), 2).as("avg_bytes"),
          round(avg(col("f0")), 6).as("avg_f0"))
        .orderBy("kind")
    }),

    // Dedup GROUPS: connected components (alternating large-star /
    // small-star) over the complete-recall Jaccard pair set — every doc
    // labeled with its component-min representative and a one-per-group
    // keep flag. The oracle replays the transitive closure with a
    // recursive CTE over the same brute-force pair set.
    "q33_dedup_groups" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5)
      Dedup.dedupGroups(docs, pairs).orderBy("doc_id")
    }),

    // Gopher-style repetition statistics: top-2-gram occupancy +
    // duplicate-5-gram occupancy per doc, with the boilerplate flag.
    // One tagged explode → two-level aggregation (map-side combine eats
    // the repeats the operator exists to find).
    "q34_repetition_stats" -> ((s, dir) => {
      Corpus.repetitionStats(tpar(s, dir, "documents"), maxFrac = 0.2)
        .orderBy("doc_id")
    }),

    // Train/eval n-gram decontamination (GPT-3 appendix-C style): docs
    // with doc_id ≡ 7 (mod 10) stand in for the eval benchmark; every
    // other doc reports its distinct 8-gram overlap with that set. The
    // eval gram dim broadcasts; the train side streams (no train-gram
    // shuffle at 100 TB).
    "q35_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Corpus.decontaminate(
        docs.filter(col("doc_id") % 10 =!= 7),
        docs.filter(col("doc_id") % 10 === 7), n = 8)
        .orderBy("doc_id")
    }),

    // Deterministic stratified sample: 20 docs per language by seeded
    // md5 draw — the reproducible corpus-mix primitive (the oracle
    // replays the identical draw, so the sample itself is hash-verified).
    "q36_stratified_sample" -> ((s, dir) => {
      Corpus.stratifiedSample(t(s, dir, "documents"), "lang", k = 20)
        .withColumn("rk", col("rk").cast("long"))
        .orderBy("stratum", "rk")
    }),

    // TF-IDF keywords: top-3 tokens per doc by tf·ln(N/df), rounded to 6
    // decimals then ranked (the round-then-rank discipline every
    // cross-engine float ranking here uses), ties by token.
    "q37_tfidf_topk" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Corpus.tfidfTopK(docs, k = 3, nDocs = docs.count())
        .withColumn("rk", col("rk").cast("long"))
        .orderBy("doc_id", "rk")
    }),

    // Interleaved-span pipeline (the north rule's input shape + per-row
    // invariant): deterministic text/media span docs built from the
    // documents table (md5-derived media refs, the q32 technique), then
    // per-doc span-sequence statistics and the SEQUENCE FINGERPRINT —
    // md5 over the in-order span identities, i.e. span-sequence equality
    // (kind, text, media_ref, order) as a hashable column. Pure per-row
    // array algebra: no explode, no shuffle, no collect_list ordering
    // hazards.
    "q38_span_seq" -> ((s, dir) => {
      import graft.operators.Spans
      Spans.spanSeqStats(Spans.spansFromDocs(t(s, dir, "documents")))
        .orderBy("doc_id")
    }),

    // C4-style line filter over derived 12-token lines: per-doc audit
    // counts plus the md5 of the reconstructed cleaned text (the oracle
    // verifies the surviving text itself). Pure per-row array algebra —
    // rides the scan stage at 100 TB.
    "q39_line_filter" -> ((s, dir) => {
      Clean.lineFilter(tpar(s, dir, "documents"), chunk = 12, minWords = 5)
        .orderBy("doc_id")
    }),

    // PII scrub over deterministically injected synthetic PII (the q32
    // replay-in-SQL technique): match counts per class + md5/length of
    // the scrubbed text. Per-row regex projection, no shuffle.
    "q40_pii_scrub" -> ((s, dir) => {
      Clean.piiScrub(Clean.withSyntheticPii(tpar(s, dir, "documents")))
        .orderBy("doc_id")
    }),

    // RefinedWeb-style cross-corpus sentence dedup: globally-first
    // occurrence survives (packed (doc,pos) min per sentence hash — one
    // hash-keyed groupBy + one join-back, both O(sentences)).
    "q41_sentence_dedup" -> ((s, dir) => {
      Clean.sentenceDedup(t(s, dir, "documents"), chunk = 10)
        .orderBy("doc_id")
    }),

    // GPT-style sequence packing manifest: global token prefix-sum over
    // the seeded shuffle order via the two-phase range-partition form
    // (never a no-partition window), cut into 512-token sequences. The
    // result is P-independent; the oracle replays the same prefix sum as
    // a window over the same total order.
    "q42_seq_packing" -> ((s, dir) => {
      Corpus.packSequences(t(s, dir, "documents"), cap = 512)
        .orderBy("doc_id")
    }),

    // Corpus-frequency quality: per-doc mean corpus unigram count +
    // rare-token fraction — integer-exact by construction (the only
    // float is one final rounded division).
    "q43_term_freq_quality" -> ((s, dir) => {
      Corpus.termFreqQuality(t(s, dir, "documents"), minCount = 2L)
        .orderBy("doc_id")
    }),

    // DSIR importance resampling: 200 raw-corpus docs drawn toward the
    // src0 target distribution (hashed unigram+bigram multinomials,
    // micro-quantized log ratios so every sum is integer-exact, seeded
    // Gumbel top-k). The oracle rebuilds buckets, both multinomials, the
    // quantized ratios, and the Gumbel draw from the same md5 stream.
    "q44_dsir_sample" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Corpus.dsirSample(
        raw = docs.filter(col("source") =!= "src0"),
        target = docs.filter(col("source") === "src0"),
        k = 200)
        .orderBy("doc_id")
    }),

    // SemDeDup: k-means the embedding space (the q30 seeded Lloyd), prune
    // near-dup pairs inside each cluster, keep the member furthest from
    // its centroid. Removed rows + evidence; the oracle replays k-means
    // AND the prune rule.
    "q45_semdedup" -> ((s, dir) => {
      Similarity.semDeDup(t(s, dir, "embeddings"),
        cells = 16, iters = 4, threshold = 0.35)
        .orderBy("vec_id")
    }),

    // Exact-substring duplication (Lee et al. 2021): 8-token windows
    // occurring in >= 2 docs; per doc the duplicated-window count, the
    // union of duplicated token positions, and the merged-span count
    "q46_substring_dup" -> ((s, dir) => {
      Dedup.substringDupSpans(tpar(s, dir, "documents"), w = 8)
        .orderBy("doc_id")
    }),

    // CCNet-style bigram-LM perplexity (Wenzek et al. 2020): self-trained
    // add-1-smoothed bigram model, per-distinct-bigram log-probs micro-
    // quantized at the dim so per-doc log-likelihoods are integer sums
    // (the q44 discipline); the oracle refits the identical model.
    "q47_lm_perplexity" -> ((s, dir) => {
      Corpus.lmPerplexity(t(s, dir, "documents"))
        .orderBy("doc_id")
    }),

    // Canonical-doc selection — the fuzzy-dedup END-STEP: within each q33
    // connected component keep the highest-QUALITY member (micro-quantized
    // q23 score, ties → min doc_id), not the arbitrary component-min. The
    // oracle replays the closure, the quality formula, and the argmax.
    "q48_canonical_docs" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5)
      Dedup.canonicalDocs(docs, Dedup.dedupGroups(docs, pairs))
        .orderBy("doc_id")
    }),

    // Domain-mixture reweighting (DoReMi/FineWeb-style α = 1/2 temperature
    // flattening) over the `source` dim: integer-quantized shares and
    // weights so normalization never float-sums in engine order.
    "q49_domain_mixture" -> ((s, dir) => {
      Corpus.domainMixture(t(s, dir, "documents")).orderBy("domain")
    }),

    // Integer PageRank over the deterministic md5 link graph — the
    // frontier-prioritization signal (rank + in-degree per page) in
    // micro-units, every iteration replayed by the oracle as an
    // unrolled CTE layer (no float ever accumulates in engine order).
    "q50_pagerank" -> ((s, dir) => {
      Graphs.pageRank(t(s, dir, "documents"), iters = 3, fanout = 4)
        .orderBy("doc_id")
    }),

    // Deterministic HyperLogLog distinct-user sketch per event class:
    // md5-derived registers, exact integer harmonic sum, one final
    // correctly-rounded division — the sketch ITSELF is hash-verified,
    // not just close-to-exact (plus the exact count and err_ppm).
    "q51_hll_distinct" -> ((s, dir) => {
      Sketches.hllDistinct(t(s, dir, "events"), col("user_id"),
        Seq("event_type")).orderBy("event_type")
    }),

    // Count-Min Sketch heavy hitters: md5-derived d×w counter grid (the
    // grid build's shuffle is capped at d·w rows per mapper), estimate =
    // min over the d cells — the sketch AND its one-sided error
    // (overcount ≥ 0) are hash-verified; exact counts ground the check.
    "q52_cms_heavy_hitters" -> ((s, dir) => {
      Sketches.countMinHeavyHitters(tpar(s, dir, "documents"))
    }),

    // int8 symmetric scalar quantization (FAISS SQ8-style) + integer
    // inner-product top-k: per-dim amax is one dim-bounded broadcast
    // array, codes are a narrow projection, and the entire ranking is
    // integer arithmetic — bit-exact cross-engine, no float anywhere
    // after the two-IEEE-op quantize step.
    "q53_quantized_topk" -> ((s, dir) => {
      val emb = tpar(s, dir, "embeddings")
      Similarity.quantizedTopK(emb, emb.filter(col("vec_id") < 20), 5)
        .orderBy("q_id", "rk")
    }),

    // Histogram quantiles: per-source token-count p50/p90/p99 from a
    // fixed-width integer histogram (shuffle carries <= buckets rows per
    // group per mapper); integer interpolation makes the estimate
    // hash-exact; the exact type-1 quantile grounds the error.
    "q54_hist_quantiles" -> ((s, dir) => {
      Sketches.histogramQuantiles(t(s, dir, "documents"))
    }),

    // Model-based quality-filter inference (fastText/DCLM/FineWeb-Edu
    // style): hashing-trick unigram+bigram features, md5-derived
    // stand-in weight table (the trained artifact's seat), integer
    // micro-unit logit — a pure per-row projection that rides the scan.
    "q55_quality_classifier" -> ((s, dir) => {
      Corpus.qualityClassifier(t(s, dir, "documents"))
        .orderBy("doc_id")
    }),

    // Product quantization ANN (FAISS PQ-style) entirely in the integer
    // domain: the q53 int8 codes split into 8 subspaces, each quantized
    // against a 16-entry md5-sampled codebook; search is asymmetric
    // distance computation — per query one 8×16 integer LUT, corpus
    // vectors score as 8 table lookups over their byte codes. Integer
    // distances end-to-end = engine-exact; exact_l2 grounds the ADC
    // estimate per reported pair.
    "q56_pq_topk" -> ((s, dir) => {
      val emb = tpar(s, dir, "embeddings")
      Similarity.pqTopK(emb, emb.filter(col("vec_id") < 10), 5)
        .orderBy("q_id", "rk")
    }),

    // BPE tokenizer-training core (Sennrich 2016): adjacent-char pair
    // counts weighted by word frequency — the word-dict aggregate eats
    // the Zipf repeats map-side, every later stage is vocab-bounded,
    // top-k plans as a distributed take. Integer counts = hash-exact.
    "q57_bpe_pairs" -> ((s, dir) => {
      Corpus.bpePairCounts(t(s, dir, "documents"), 20)
        .orderBy("rk")
    }),

    // Context-window chunking: fixed-size token windows with stride
    // (embedding/RAG prep, the inverse of q42's packing) — pure per-row
    // array algebra, zero shuffle; md5 chunk hash feeds chunk-level
    // exact dedup without re-reading text.
    "q58_chunking" -> ((s, dir) => {
      Corpus.chunkSequences(tpar(s, dir, "documents"), size = 24, stride = 16)
        .orderBy("doc_id", "chunk_idx")
    }),

    // Recrawl scheduling (Cho & Garcia-Molina 2003): lag-compare
    // successive content hashes per URL, bias-reduced Poisson
    // change-rate λ̂ = -ln((n-X+.5)/(n+.5)) in micro-nats (ONE ln of ONE
    // integer division = engine-exact), top-k recrawl batch as a
    // distributed take. Visit history is the md5-planted fixture.
    "q59_recrawl" -> ((s, dir) => {
      Recrawl.changeRatePriorities(
        Recrawl.syntheticVisits(t(s, dir, "documents"), visits = 8), k = 100)
        .orderBy("rk")
    }),

    // Incremental cross-snapshot dedup: today's slice (md5 'snap:' 20%
    // split) vs the standing archive — exact tier broadcasts the
    // INCOMING fingerprint dim so the archive streams map-side (the
    // PB-vs-TB inversion); near tier probes a PREBUILT archive prefix
    // index (frozen rarest-first order, hash-partitioned postings —
    // per-slice work O(slice + probed postings), the archive is never
    // re-shingled/re-ranked; round-5 form, VERDICT r4 #3). Recall stays
    // complete, so the oracle is still pure brute force, and the
    // recompute path is pinned row-identical by the OperatorsSpec
    // equivalence test.
    "q60_incremental_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val snap = conv(substring(md5(concat(lit("snap:"),
        col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long") % 5
      val index = Dedup.buildArchiveIndex(docs.filter(snap =!= 0))
      Dedup.incrementalDedupIndexed(index, incoming = docs.filter(snap === 0))
        .orderBy("doc_id")
    }),

    // Mixture materialization: q49's √-flattened domain weights turned
    // into an actual k-doc draw — integer largest-remainder quotas on
    // the domain dim, seeded md5 rank fills each quota after ONE
    // exchange on the domain key.
    "q61_mixture_sample" -> ((s, dir) => {
      Corpus.mixtureSample(t(s, dir, "documents"), k = 100)
        .orderBy("domain", "rk")
    }),

    // REAL-codec media roundtrip: seeded rasters/PCM → genuine PNG/WAV
    // bytes (javax.imageio / javax.sound.sampled) → real decode →
    // integer pixel/sample statistics. The oracle never decodes: it
    // derives the SAME statistics from the seeded integer formula, so a
    // hash match proves the Spark side's encode→codec→decode roundtrip
    // preserved every pixel and sample (the q32 stub tier stays for
    // non-JDK formats).
    // Round 6: the codec stage keeps the plain single-split scan — both a
    // scan fan-out and an eager feature pin were interleaved-A/B-probed
    // and REJECTED (the exchange + pin barrier serialized the critical
    // path; the orderBy sampling pass's duplicated codec work races on
    // idle cores and costs less than the barrier).
    "q62_real_media_features" -> ((s, dir) => {
      import graft.operators.Multimodal
      Multimodal.mediaFeatures(Multimodal.realMediaFromDocs(t(s, dir, "documents")))
        .orderBy("media_id")
    }))

  /** q30's oracle: the full IVF pipeline — seeded k-means (4 Lloyd
    * iterations UNROLLED as CTE layers c0..c4), assignment, nprobe
    * probing, exact re-rank — rebuilt in DuckDB SQL. Reproducibility
    * hinges on (a) md5-ordered init (same sample both engines), (b)
    * centroid means truncated to float32 each iteration (CAST(avg AS
    * FLOAT) = Spark's .cast("float") on the double avg), (c)
    * deterministic argmax ties (ORDER BY d DESC, cell_id), with d rounded
    * to 12 decimals on BOTH engines — Spark's avg() partial-sum order is
    * not bit-deterministic, so full-precision ranking could flake
    * (ADVICE r2; mirrors Similarity.nearestCell). */
  /** Shared k-means CTE layers (md5-ordered init `c0`, Lloyd iterations
    * `c1..cN` with float32-truncated means, final `assign`) replayed by
    * every oracle that rides the seeded k-means (q30, q45). */
  private def kmeansOracleCtes(iters: Int): String = {
    val init =
      """c0 AS (
        |  SELECT (rk - 1)::INT AS cell_id, embedding AS cell FROM (
        |    SELECT vec_id, embedding,
        |      row_number() OVER (ORDER BY md5('km:42:' || vec_id::VARCHAR), vec_id) AS rk
        |    FROM embeddings) WHERE rk <= 16)""".stripMargin
    val iterCtes = (1 to iters).map { i =>
      s"""a$i AS (
         |  SELECT vec_id, embedding, cell_id FROM (
         |    SELECT e.vec_id, e.embedding, c.cell_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[],
         |                                              c.cell::DOUBLE[]), 12) DESC,
         |                 c.cell_id) AS rk
         |    FROM embeddings e, c${i - 1} c) WHERE rk = 1),
         |n$i AS (
         |  SELECT cell_id, list(m ORDER BY pos) AS cell FROM (
         |    SELECT cell_id, pos, CAST(avg(v::DOUBLE) AS FLOAT) AS m FROM (
         |      SELECT cell_id, unnest(embedding) AS v, unnest(range(1, 65)) AS pos
         |      FROM a$i)
         |    GROUP BY cell_id, pos)
         |  GROUP BY cell_id),
         |c$i AS (
         |  SELECT p.cell_id, coalesce(n.cell, p.cell) AS cell
         |  FROM c${i - 1} p LEFT JOIN n$i n USING (cell_id))""".stripMargin
    }
    val assign =
      s"""assign AS (
         |  SELECT vec_id, embedding, cell_id FROM (
         |    SELECT e.vec_id, e.embedding, c.cell_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[],
         |                                              c.cell::DOUBLE[]), 12) DESC,
         |                 c.cell_id) AS rk
         |    FROM embeddings e, c$iters c) WHERE rk = 1)""".stripMargin
    (Seq("WITH " + init) ++ iterCtes ++ Seq(assign)).mkString(",\n")
  }

  private def q30OracleSql: String = {
    val iters = 4
    val tail =
      s"""probes AS (
         |  SELECT q_id, q_emb, cell_id FROM (
         |    SELECT e.vec_id AS q_id, e.embedding AS q_emb, c.cell_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[],
         |                                              c.cell::DOUBLE[]), 12) DESC,
         |                 c.cell_id) AS rk
         |    FROM embeddings e, c$iters c WHERE e.vec_id < 20) WHERE rk <= 4),
         |rer AS (
         |  SELECT p.q_id, a.vec_id AS n_id,
         |    round(list_cosine_similarity(p.q_emb::DOUBLE[],
         |                                 a.embedding::DOUBLE[]), 6) AS cos
         |  FROM probes p JOIN assign a USING (cell_id)
         |  WHERE p.q_id <> a.vec_id)
         |SELECT q_id, n_id, cos, rk FROM (
         |  SELECT q_id, n_id, cos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk
         |  FROM rer) WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin
    kmeansOracleCtes(iters) + ",\n" + tail
  }

  /** q45's oracle: the same k-means layers, then SemDeDup's intra-cluster
    * pairwise prune — centroid-cosine `cc` and pair cosine both rounded to
    * 6 decimals before ANY comparison, the keep-rule (lower cc wins, ties
    * to lower id) replayed verbatim. */
  private def q45OracleSql: String =
    kmeansOracleCtes(4) + ",\n" +
      """wc AS (
        |  SELECT a.cell_id, a.vec_id, a.embedding,
        |    round(list_cosine_similarity(a.embedding::DOUBLE[],
        |                                 c.cell::DOUBLE[]), 6) AS cc
        |  FROM assign a JOIN c4 c USING (cell_id)),
        |dup AS (
        |  SELECT x.cell_id, x.vec_id,
        |    round(list_cosine_similarity(x.embedding::DOUBLE[],
        |                                 y.embedding::DOUBLE[]), 6) AS cos
        |  FROM wc x JOIN wc y ON x.cell_id = y.cell_id
        |                     AND x.vec_id <> y.vec_id
        |  WHERE round(list_cosine_similarity(x.embedding::DOUBLE[],
        |                                     y.embedding::DOUBLE[]), 6) >= 0.35
        |    AND (y.cc < x.cc OR (y.cc = x.cc AND y.vec_id < x.vec_id)))
        |SELECT vec_id, cell_id, max(cos) AS max_cos,
        |  count(*)::BIGINT AS n_dups
        |FROM dup GROUP BY vec_id, cell_id ORDER BY vec_id""".stripMargin

  // Shared SQL fragments for the oracle side.
  private val toksSql =
    """list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '')"""
  private val shingleSql =
    """CASE WHEN len(t) >= 3
      |     THEN list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t)-1)])
      |     ELSE [array_to_string(t, ' ')] END""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_etld1_hosts" ->
      """SELECT c_custkey,
        |  CASE c_custkey % 11
        |    WHEN 0 THEN 'cust' || c_custkey || '.co.uk'
        |    WHEN 1 THEN 'cust' || c_custkey || '.com.au'
        |    WHEN 2 THEN 'cust' || c_custkey || '.com'
        |    WHEN 3 THEN NULL
        |    WHEN 4 THEN NULL
        |    WHEN 5 THEN NULL
        |    WHEN 6 THEN 'cust' || c_custkey || '.github.io'
        |    WHEN 7 THEN 'x.cust' || c_custkey || '.ck'
        |    WHEN 8 THEN 'www.ck'
        |    WHEN 9 THEN 'a.cust' || c_custkey || '.sch.uk'
        |    WHEN 10 THEN NULL
        |  END AS registrable
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q03_frontier_antijoin" ->
      """SELECT c_custkey FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q04_pop_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, rk FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_orderdate, o_orderkey) AS rk
        |  FROM orders) WHERE rk <= 2 ORDER BY o_custkey, rk""".stripMargin,
    "q05_pair_sampler_weights" ->
      """SELECT o_custkey, count(*) AS visits,
        |  round((CASE WHEN count(*) = 1 THEN 2000.0 ELSE 1.0 END)
        |        / (count(*) + 1.0), 6) AS weight
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q06_dict_encode" ->
      """SELECT o_orderpriority,
        |  dense_rank() OVER (ORDER BY o_orderpriority) AS id
        |FROM (SELECT DISTINCT o_orderpriority FROM orders) ORDER BY id""".stripMargin,
    "q07_events_json" ->
      """SELECT event_type,
        |  CAST(sum(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(*) AS cnt, max(event_id) AS hwm
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q08_chain_selfjoin" ->
      """SELECT a.l_orderkey, count(*) AS chain_pairs,
        |  round(sum(b.l_quantity), 2) AS next_qty_sum
        |FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1
        |GROUP BY a.l_orderkey ORDER BY a.l_orderkey""".stripMargin,
    "q09_union_watermark" ->
      """SELECT event_type, max(event_id) AS hwm, count(*) AS cnt FROM (
        |  SELECT * FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT * FROM events WHERE event_type = 'error')
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q10_url_parts" ->
      """SELECT s_suppkey,
        |  'www.s' || s_suppkey ||
        |    (CASE s_suppkey % 3 WHEN 0 THEN '.co.uk'
        |                        WHEN 1 THEN '.example.com'
        |                        ELSE '.com.au' END) AS host,
        |  '/cat/' || s_nationkey AS path,
        |  'id=' || s_suppkey AS query,
        |  CASE s_suppkey % 3
        |    WHEN 0 THEN 's' || s_suppkey || '.co.uk'
        |    WHEN 1 THEN 'example.com'
        |    ELSE 's' || s_suppkey || '.com.au'
        |  END AS registrable
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "q20_dedup_exact" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |  min(doc_id) AS doc_id, count(*) AS dupes
        |FROM documents GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "q21_token_stats" ->
      s"""SELECT doc_id, len($toksSql) AS n_tok,
        |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+')) AS n_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q22_langid" -> {
      val profiles = TextOps.langProfiles.map { case (l, ws) =>
        l -> ws.map(w => s"'$w'").mkString("[", ",", "]")
      }
      val hitExprs = profiles.map { case (l, arr) =>
        s"len(list_filter(t, x -> list_contains($arr, x))) AS ${l}_hits"
      }.mkString(", ")
      val best = profiles.map { case (l, _) => s"${l}_hits" }.mkString("greatest(", ",", ")")
      val caseExpr = profiles.map { case (l, _) =>
        s"WHEN ${l}_hits = g AND g > 0 THEN '$l'"
      }.mkString("CASE ", " ", " ELSE 'und' END")
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |hits AS (SELECT doc_id, $hitExprs FROM toks),
         |sel AS (SELECT doc_id, $best AS g, * FROM hits)
         |SELECT $caseExpr AS lang, count(*) AS cnt FROM sel
         |GROUP BY 1 ORDER BY lang""".stripMargin
    },
    "q23_quality" -> {
      val stops = TextOps.stopwords.map(w => s"'$w'").mkString("[", ",", "]")
      s"""WITH toks AS (SELECT doc_id, text, $toksSql AS t FROM documents)
         |SELECT doc_id, round(
         |  0.3 * least(len(t) / 100.0, 1.0) +
         |  0.4 * (len(list_filter(t, x -> list_contains($stops, x)))
         |         / greatest(len(t)::DOUBLE, 1.0)) +
         |  0.3 * (1.0 - least(len(regexp_extract_all(text, '[,.!?;:]'))
         |                     / greatest(length(text)::DOUBLE, 1.0) * 10.0, 1.0)),
         |  6) AS quality
         |FROM toks ORDER BY doc_id""".stripMargin
    },
    "q24_jaccard_pairs" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
        |sh AS (SELECT doc_id, $shingleSql AS s FROM toks)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  round(len(list_intersect(a.s, b.s))::DOUBLE
        |        / len(list_distinct(a.s || b.s))::DOUBLE, 6) AS jaccard
        |FROM sh a, sh b
        |WHERE a.doc_id < b.doc_id
        |  AND round(len(list_intersect(a.s, b.s))::DOUBLE
        |            / len(list_distinct(a.s || b.s))::DOUBLE, 6) >= 0.5
        |ORDER BY a_id, b_id""".stripMargin,
    "q25_minhash_pairs" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
        |sh AS (SELECT doc_id, $shingleSql AS s FROM toks)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  round(len(list_intersect(a.s, b.s))::DOUBLE
        |        / len(list_distinct(a.s || b.s))::DOUBLE, 6) AS jaccard
        |FROM sh a, sh b
        |WHERE a.doc_id < b.doc_id
        |  AND round(len(list_intersect(a.s, b.s))::DOUBLE
        |            / len(list_distinct(a.s || b.s))::DOUBLE, 6) >= 0.8
        |ORDER BY a_id, b_id""".stripMargin,
    "q26_cosine_topk" ->
      """SELECT * FROM (
        |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
        |    round(list_cosine_similarity(q.embedding::DOUBLE[],
        |                                 n.embedding::DOUBLE[]), 6) AS cos,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[],
        |                     n.embedding::DOUBLE[]), 6) DESC, n.vec_id) AS rk
        |  FROM embeddings q, embeddings n
        |  WHERE q.vec_id < 20 AND q.vec_id <> n.vec_id)
        |WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    // the exact sign-LSH blocked pipeline rebuilt in SQL (q29 technique):
    // 120 md5-derived ±1 planes in 12 tables of 10, candidate pairs from
    // bucket equi-joins, exact cosine verify at the threshold — verifies
    // the BLOCKING too, not just the final filter (recall < 1 by design,
    // so a brute-force oracle would only coincidentally match)
    "q27_embed_neardup" ->
      """WITH planes AS (
        |  SELECT p,
        |    [CASE WHEN (strpos('0123456789abcdef',
        |                       substr(md5('plane:' || p || ':' || j), 2, 1)) - 1) % 2 = 0
        |          THEN 1.0 ELSE -1.0 END for j in range(0, 64)] AS w
        |  FROM range(0, 120) t(p)),
        |proj AS (
        |  SELECT e.vec_id, pl.p,
        |    list_reduce(list_transform(range(1, 65),
        |      i -> e.embedding[i]::DOUBLE * pl.w[i]), (a, b) -> a + b) AS pr
        |  FROM embeddings e, planes pl),
        |vb AS (
        |  SELECT vec_id, p // 10 AS table_idx,
        |    sum(CASE WHEN pr > 0 THEN 1::BIGINT << (p % 10) ELSE 0 END)::BIGINT AS bucket
        |  FROM proj GROUP BY 1, 2),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
        |  FROM vb a JOIN vb b USING (table_idx, bucket)
        |  WHERE a.vec_id < b.vec_id)
        |SELECT c.a_id, c.b_id,
        |  round(list_cosine_similarity(ea.embedding::DOUBLE[],
        |                               eb.embedding::DOUBLE[]), 6) AS cos
        |FROM cand c
        |JOIN embeddings ea ON ea.vec_id = c.a_id
        |JOIN embeddings eb ON eb.vec_id = c.b_id
        |WHERE round(list_cosine_similarity(ea.embedding::DOUBLE[],
        |                                   eb.embedding::DOUBLE[]), 6) >= 0.8
        |ORDER BY a_id, b_id""".stripMargin,
    // full 60-bit SimHash recomputed in SQL (md5-derived token hash — the
    // reason Dedup.md5Hash60 exists), then brute-force Hamming pairs: the
    // Spark side's pigeonhole blocking must lose nothing (recall 1.0)
    "q28_simhash_pairs" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents),
        |hs AS (SELECT doc_id,
        |  [('0x' || substr(md5(x), 1, 15))::BIGINT for x in tk] AS h FROM t),
        |sk AS (SELECT doc_id,
        |  list_sum([CASE WHEN list_sum([CASE WHEN (x >> j) & 1 = 1
        |                                THEN 1 ELSE -1 END for x in h]) > 0
        |            THEN (1::BIGINT << j) ELSE 0 END for j in range(60)]) AS sh
        |FROM hs)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  bit_count(xor(a.sh, b.sh))::BIGINT AS hamming
        |FROM sk a, sk b
        |WHERE a.doc_id < b.doc_id AND bit_count(xor(a.sh, b.sh)) <= 3
        |ORDER BY a_id, b_id""".stripMargin,
    // every k-gram Karp-Rabin hash (mod 2^61, computed in HUGEINT), window
    // mins, distinct sketch — the full winnow semantics, per doc
    "q31_winnow_fingerprint" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS s
        |  FROM documents),
        |hs AS (
        |  SELECT doc_id,
        |    CASE WHEN length(s) = 0 THEN []
        |         WHEN length(s) < 5 THEN
        |           [list_reduce([ord(s[i])::HUGEINT for i in range(1, length(s)+1)],
        |                        (a, c) -> (a * 1000000007 + c) % (1::HUGEINT << 61))]
        |         ELSE [
        |           ((((((((ord(s[i])::HUGEINT * 1000000007 + ord(s[i+1])) % (1::HUGEINT << 61))
        |              * 1000000007 + ord(s[i+2])) % (1::HUGEINT << 61))
        |              * 1000000007 + ord(s[i+3])) % (1::HUGEINT << 61))
        |              * 1000000007 + ord(s[i+4])) % (1::HUGEINT << 61))
        |           for i in range(1, length(s) - 3)]
        |    END AS h
        |  FROM norm),
        |mins AS (
        |  SELECT doc_id,
        |    CASE WHEN len(h) = 0 THEN []
        |         WHEN len(h) < 4 THEN [list_min(h)]
        |         ELSE list_distinct([least(h[i], h[i+1], h[i+2], h[i+3])
        |                             for i in range(1, len(h) - 2)])
        |    END AS fps
        |  FROM hs)
        |SELECT doc_id, unnest(fps)::BIGINT AS fp FROM mins
        |ORDER BY doc_id, fp""".stripMargin,
    // the exact sign-LSH pipeline rebuilt in SQL: md5-derived ±1 planes
    // (same matrix as Similarity.md5PlaneMatrix), sequential-fold
    // projections (list_reduce = Spark's aggregate fold), bucket packing,
    // candidate equi-join in any of 32 tables, dedup, cosine re-rank
    "q29_ann_topk" ->
      """WITH planes AS (
        |  SELECT p,
        |    [CASE WHEN (strpos('0123456789abcdef',
        |                       substr(md5('plane:' || p || ':' || j), 2, 1)) - 1) % 2 = 0
        |          THEN 1.0 ELSE -1.0 END for j in range(0, 64)] AS w
        |  FROM range(0, 160) t(p)),
        |proj AS (
        |  SELECT e.vec_id, pl.p,
        |    list_reduce(list_transform(range(1, 65),
        |      i -> e.embedding[i]::DOUBLE * pl.w[i]), (a, b) -> a + b) AS pr
        |  FROM embeddings e, planes pl),
        |vb AS (
        |  SELECT vec_id, p // 5 AS table_idx,
        |    sum(CASE WHEN pr > 0 THEN 1::BIGINT << (p % 5) ELSE 0 END)::BIGINT AS bucket
        |  FROM proj GROUP BY 1, 2),
        |cand AS (
        |  SELECT DISTINCT q.vec_id AS q_id, n.vec_id AS n_id
        |  FROM vb q JOIN vb n USING (table_idx, bucket)
        |  WHERE q.vec_id < 20 AND q.vec_id <> n.vec_id),
        |rer AS (
        |  SELECT c.q_id, c.n_id,
        |    round(list_cosine_similarity(eq.embedding::DOUBLE[],
        |                                 en.embedding::DOUBLE[]), 6) AS cos
        |  FROM cand c
        |  JOIN embeddings eq ON eq.vec_id = c.q_id
        |  JOIN embeddings en ON en.vec_id = c.n_id)
        |SELECT q_id, n_id, cos, rk FROM (
        |  SELECT q_id, n_id, cos,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk
        |  FROM rer)
        |WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    // full IVF pipeline unrolled in SQL (see q30OracleSql scaladoc)
    "q30_ivf_topk" -> q30OracleSql,
    // the synthetic media BYTES are md5-derived (Multimodal.mediaFromDocs)
    // precisely so this oracle rebuilds every byte in SQL: header by seed
    // parity, body block j = raw digest bytes of md5(seedhex||':'||j); then
    // the 64-bin histogram, float32-emulated L2 norm, and the same rollup.
    // Block count and avg_bytes are INTERPOLATED from the same constants
    // mediaFromDocs uses (ADVICE r2: the round-2 literal 16/264 silently
    // coupled to the default and broke if it moved).
    "q32_media_features" -> q32OracleSql,
    // transitive closure of the q24 brute-force pair set (threshold 0.5):
    // reach(id, lbl) walks edges from each doc's reachable labels under
    // UNION set semantics (terminates — finite node set), min reachable
    // label = the component representative the star contraction converges
    // to on the Spark side
    "q33_dedup_groups" ->
      s"""WITH RECURSIVE toks AS (SELECT doc_id, $toksSql AS t FROM documents),
        |sh AS (SELECT doc_id, $shingleSql AS s FROM toks),
        |pairs AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM sh a, sh b
        |  WHERE a.doc_id < b.doc_id
        |    AND round(len(list_intersect(a.s, b.s))::DOUBLE
        |              / len(list_distinct(a.s || b.s))::DOUBLE, 6) >= 0.5),
        |edges AS (SELECT a_id AS u, b_id AS v FROM pairs
        |          UNION SELECT b_id, a_id FROM pairs),
        |reach(id, lbl) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT r.id, e.v FROM reach r JOIN edges e ON e.u = r.lbl)
        |SELECT id AS doc_id, min(lbl) AS group_id, (min(lbl) = id) AS keep
        |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,

    // Gopher repetition stats: 2-gram and 5-gram generation mirrors
    // TextOps.shingles exactly (sequence(1, len-n+1) ≡ range(1, len-n+2)
    // exclusive; <n-token docs fall back to the whole-doc single gram)
    "q34_repetition_stats" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(t) >= 2
        |       THEN [('0x' || substr(md5('sub:' || array_to_string(t[i:i+1], ' ')), 1, 15))::BIGINT for i in range(1, len(t))]
        |       ELSE [('0x' || substr(md5('sub:' || array_to_string(t, ' ')), 1, 15))::BIGINT] END AS g2,
        |  CASE WHEN len(t) >= 5
        |       THEN [('0x' || substr(md5('sub:' || array_to_string(t[i:i+4], ' ')), 1, 15))::BIGINT for i in range(1, len(t)-3)]
        |       ELSE [('0x' || substr(md5('sub:' || array_to_string(t, ' ')), 1, 15))::BIGINT] END AS g5
        |FROM toks),
        |g AS (
        |  SELECT doc_id, 2 AS n, unnest(g2) AS gram FROM sh
        |  UNION ALL
        |  SELECT doc_id, 5 AS n, unnest(g5) AS gram FROM sh),
        |c AS (SELECT doc_id, n, gram, count(*) AS cnt FROM g GROUP BY doc_id, n, gram),
        |s AS (SELECT doc_id, n, sum(cnt) AS total, max(cnt) AS top,
        |             sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup
        |      FROM c GROUP BY doc_id, n)
        |SELECT doc_id,
        |  max(CASE WHEN n = 2 THEN round(top::DOUBLE / total, 6) END) AS top2_frac,
        |  max(CASE WHEN n = 5 THEN round(dup::DOUBLE / total, 6) END) AS dup5_frac,
        |  (max(CASE WHEN n = 2 THEN round(top::DOUBLE / total, 6) END) > 0.2
        |   OR max(CASE WHEN n = 5 THEN round(dup::DOUBLE / total, 6) END) > 0.2)
        |    AS repetitive
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // decontamination: distinct 8-gram overlap of each train doc
    // (doc_id % 10 <> 7) with the eval split's distinct gram set
    "q35_decontaminate" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(t) >= 8
        |       THEN list_distinct([('0x' || substr(md5('sub:' || array_to_string(t[i:i+7], ' ')), 1, 15))::BIGINT
        |                           for i in range(1, len(t)-6)])
        |       ELSE [('0x' || substr(md5('sub:' || array_to_string(t, ' ')), 1, 15))::BIGINT] END AS s
        |FROM toks),
        |g AS (SELECT doc_id, unnest(s) AS gram FROM sh),
        |ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 7)
        |SELECT doc_id, count(*) AS n_overlap
        |FROM (SELECT doc_id, gram FROM g WHERE doc_id % 10 <> 7) tr
        |JOIN ev USING (gram)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // stratified sample: the identical seeded md5 draw replayed in SQL
    "q36_stratified_sample" ->
      """SELECT stratum, doc_id, rk FROM (
        |  SELECT lang AS stratum, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5('strat:42:' || doc_id::VARCHAR), doc_id) AS rk
        |  FROM documents) WHERE rk <= 20 ORDER BY stratum, rk""".stripMargin,

    // TF-IDF top-3 keywords per doc: round(tf·ln(N/df), 6) then rank,
    // ties by token — identical round-then-rank on both engines
    "q37_tfidf_topk" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
        |tfc AS (SELECT doc_id, token, count(*) AS tf
        |        FROM (SELECT doc_id, unnest(t) AS token FROM toks)
        |        GROUP BY doc_id, token),
        |dfc AS (SELECT token, count(*) AS df FROM tfc GROUP BY token),
        |nd AS (SELECT count(*) AS n FROM documents),
        |scored AS (
        |  SELECT doc_id, token, tf, df,
        |         round(tf * ln(n::DOUBLE / df), 6) AS score
        |  FROM tfc JOIN dfc USING (token), nd
        |  WHERE round(tf * ln(n::DOUBLE / df), 6) > 0)
        |SELECT doc_id, token, tf, df, score, rk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, token) AS rk FROM scored)
        |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    // span-sequence fingerprint: the identical chunking (8 tokens/span,
    // every 3rd span media with an md5-derived ref) and the identical
    // in-order identity fold rebuilt in SQL — the fold acc||ident||'|'
    // equals array_to_string(idents,'|')||'|' for the ≥1 spans every doc
    // has
    "q38_span_seq" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
        |ch AS (SELECT doc_id, t,
        |  greatest((len(t) + 7) // 8, 1) AS nc FROM toks),
        |spans AS (SELECT doc_id,
        |  [CASE WHEN i % 3 = 2
        |        THEN 'media:m/' || md5(doc_id::VARCHAR || ':' || i)
        |        ELSE 'text:' || array_to_string(t[i*8+1:i*8+8], ' ') END
        |   for i in range(0, nc)] AS idents,
        |  [CASE WHEN i % 3 = 2 THEN 0
        |        ELSE length(array_to_string(t[i*8+1:i*8+8], ' ')) END
        |   for i in range(0, nc)] AS chars
        |  FROM ch)
        |SELECT doc_id,
        |  len(idents)::BIGINT AS n_spans,
        |  len(list_filter(idents, x -> x LIKE 'media:%'))::BIGINT AS n_media,
        |  list_sum(chars)::BIGINT AS text_chars,
        |  md5(array_to_string(idents, '|') || '|') AS seq_hash
        |FROM spans ORDER BY doc_id""".stripMargin,

    // C4-style line filter: identical 12-token chunking, keep rule
    // (≥5 tokens AND ≥1 stopword), and cleaned-text reconstruction
    "q39_line_filter" -> {
      val stops = TextOps.stopwords.map(w => s"'$w'").mkString("[", ",", "]")
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
        |lines AS (SELECT doc_id,
        |  CASE WHEN len(t) > 0
        |       THEN [t[i*12+1:i*12+12] for i in range(0, (len(t)+11)//12)]
        |       ELSE []::VARCHAR[][] END AS ls
        |  FROM toks),
        |k AS (SELECT doc_id, ls,
        |  list_filter(ls, l -> len(l) >= 5 AND
        |    len(list_filter(l, w -> list_contains($stops, w))) > 0) AS kept
        |  FROM lines),
        |-- DuckDB's array_to_string of an EMPTY list is NULL where Spark's
        |-- concat_ws is '' — coalesce pins the zero-kept-lines branch
        |c AS (SELECT doc_id, ls, kept,
        |  coalesce(array_to_string(flatten(kept), ' '), '') AS cleaned FROM k)
        |SELECT doc_id,
        |  len(ls)::BIGINT AS lines_total,
        |  len(kept)::BIGINT AS lines_kept,
        |  round(len(kept)::DOUBLE / greatest(len(ls), 1), 6) AS kept_frac,
        |  length(cleaned)::BIGINT AS cleaned_chars,
        |  md5(cleaned) AS cleaned_md5
        |FROM c ORDER BY doc_id""".stripMargin
    },

    // PII scrub: identical synthetic injection from doc_id, identical
    // patterns (the regex subset where Java regex ≡ RE2), counts via
    // regexp_extract_all, replacement with the 'g' flag, email→ip→phone
    // order preserved
    "q40_pii_scrub" ->
      s"""WITH raw AS (SELECT doc_id, text ||
        |  CASE WHEN doc_id % 5 = 0
        |       THEN ' contact u' || doc_id::VARCHAR || '@example.com'
        |       ELSE '' END ||
        |  CASE WHEN doc_id % 7 = 0
        |       THEN ' from 10.' || (doc_id % 200)::VARCHAR || '.0.' ||
        |            (doc_id % 250)::VARCHAR
        |       ELSE '' END ||
        |  CASE WHEN doc_id % 11 = 0
        |       THEN ' call 555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
        |       ELSE '' END AS r
        |  FROM documents),
        |s AS (SELECT doc_id,
        |  len(regexp_extract_all(r, '${Clean.emailPat}')) AS n_email,
        |  len(regexp_extract_all(r, '${Clean.ipv4Pat}')) AS n_ip,
        |  len(regexp_extract_all(r, '${Clean.phonePat}')) AS n_phone,
        |  regexp_replace(regexp_replace(regexp_replace(r,
        |    '${Clean.emailPat}', '<EMAIL>', 'g'),
        |    '${Clean.ipv4Pat}', '<IP>', 'g'),
        |    '${Clean.phonePat}', '<PHONE>', 'g') AS sc
        |  FROM raw)
        |SELECT doc_id, n_email::BIGINT AS n_email, n_ip::BIGINT AS n_ip,
        |  n_phone::BIGINT AS n_phone, length(sc)::BIGINT AS scrub_len,
        |  md5(sc) AS scrub_md5
        |FROM s ORDER BY doc_id""".stripMargin,

    // sentence dedup: identical 10-token chunking, md5 sentence hash,
    // packed (doc_id·2^20 + pos) first-occurrence min, copy counting
    "q41_sentence_dedup" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
        |ch AS (SELECT doc_id,
        |  [array_to_string(t[i*10+1:i*10+10], ' ')
        |   for i in range(0, (len(t)+9)//10)] AS sents
        |  FROM toks WHERE len(t) > 0),
        |s AS (SELECT doc_id, unnest(sents) AS sent,
        |             unnest(range(0, len(sents))) AS pos FROM ch),
        |p AS (SELECT doc_id, pos, md5(sent) AS h,
        |             doc_id * 1048576 + pos AS packed FROM s),
        |f AS (SELECT h, min(packed) AS fp FROM p GROUP BY h)
        |SELECT doc_id, count(*)::BIGINT AS n_sent,
        |  sum(CASE WHEN packed <> fp THEN 1 ELSE 0 END)::BIGINT AS n_dup,
        |  round(sum(CASE WHEN packed <> fp THEN 1 ELSE 0 END)::DOUBLE
        |        / count(*), 6) AS dup_frac
        |FROM p JOIN f USING (h) GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // sequence packing: same seeded md5 shuffle order, same exclusive
    // prefix sum (here a window — fine for DuckDB single-node; Spark's
    // two-phase form is the distributed equivalent), same integer DIV
    "q42_seq_packing" ->
      s"""WITH toks AS (SELECT doc_id, len($toksSql)::BIGINT AS len,
        |  md5('pack:42:' || doc_id::VARCHAR) AS draw FROM documents),
        |s AS (SELECT doc_id, len,
        |  coalesce(sum(len) OVER (ORDER BY draw, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS start
        |  FROM toks)
        |SELECT doc_id, len AS n_tokens,
        |  start // 512 AS first_seq,
        |  CASE WHEN len > 0 THEN (start + len - 1) // 512
        |       ELSE start // 512 END AS last_seq,
        |  CASE WHEN len > 0
        |       THEN (start + len - 1) // 512 - start // 512 + 1
        |       ELSE 0 END AS n_seqs,
        |  start % 512 AS seq_offset
        |FROM s ORDER BY doc_id""".stripMargin,

    // corpus-frequency quality: identical unigram counts, integer sums,
    // one rounded division; empty docs keep NULL ratios on both engines
    "q43_term_freq_quality" ->
      s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS token
        |  FROM documents),
        |vocab AS (SELECT token, count(*)::BIGINT AS cnt FROM toks GROUP BY token),
        |per_doc AS (SELECT doc_id, count(*)::BIGINT AS n_toks,
        |    sum(cnt)::BIGINT AS sum_freq,
        |    sum(CASE WHEN cnt < 2 THEN 1 ELSE 0 END)::BIGINT AS n_oov
        |  FROM toks JOIN vocab USING (token) GROUP BY doc_id)
        |SELECT d.doc_id,
        |  coalesce(p.n_toks, 0) AS n_toks,
        |  coalesce(p.sum_freq, 0) AS sum_freq,
        |  round(p.sum_freq::DOUBLE / p.n_toks, 6) AS avg_freq,
        |  round(p.n_oov::DOUBLE / p.n_toks, 6) AS oov_frac
        |FROM documents d LEFT JOIN per_doc p USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // DSIR: same featurization (unigrams + bigrams per occurrence), same
    // add-1-smoothed multinomials, same micro-quantized log ratios (the
    // only ln calls take identical IEEE-division arguments on both
    // engines, then quantize — partial-sum order cannot flake an integer
    // sum), same 52-bit md5 Gumbel draw, same top-200 total order
    "q44_dsir_sample" ->
      s"""WITH toks AS (SELECT doc_id, source, $toksSql AS t FROM documents),
        |grams AS (SELECT doc_id, source = 'src0' AS is_t,
        |    ('0x' || substr(md5('dsir:' || gram), 1, 15))::BIGINT % 4096 AS bucket
        |  FROM (SELECT doc_id, source, unnest(list_concat(t,
        |      CASE WHEN len(t) >= 2
        |           THEN [array_to_string(t[i:i+1], ' ') for i in range(1, len(t))]
        |           ELSE [] END)) AS gram FROM toks)),
        |dim AS (SELECT bucket,
        |    sum(CASE WHEN is_t THEN 1 ELSE 0 END)::BIGINT AS tc,
        |    sum(CASE WHEN is_t THEN 0 ELSE 1 END)::BIGINT AS rc
        |  FROM grams GROUP BY bucket),
        |lr AS (SELECT bucket,
        |    CAST(round(1e6 * (ln((tc + 1)::DOUBLE / ((SELECT sum(tc) FROM dim) + 4096))
        |                    - ln((rc + 1)::DOUBLE / ((SELECT sum(rc) FROM dim) + 4096))))
        |      AS BIGINT) AS lr_micro
        |  FROM dim),
        |db AS (SELECT doc_id, bucket, count(*)::BIGINT AS cnt
        |  FROM grams WHERE NOT is_t GROUP BY doc_id, bucket),
        |w AS (SELECT doc_id, sum(cnt)::BIGINT AS n_grams,
        |    sum(cnt * lr_micro)::BIGINT AS w_micro
        |  FROM db JOIN lr USING (bucket) GROUP BY doc_id),
        |g AS (SELECT doc_id, n_grams, w_micro,
        |    CAST(round(-1e6 * ln(-ln(
        |      (('0x' || substr(md5('gum:42:' || doc_id::VARCHAR), 1, 13))::BIGINT + 0.5)
        |      / 4503599627370496.0))) AS BIGINT) AS g_micro
        |  FROM w)
        |SELECT doc_id, n_grams, w_micro, g_micro,
        |  w_micro + g_micro AS score_micro
        |FROM g ORDER BY score_micro DESC, doc_id LIMIT 200""".stripMargin,

    // SemDeDup: full k-means replay (shared CTE layers with q30) + the
    // intra-cluster prune under the same rounded-cosine discipline
    "q45_semdedup" -> q45OracleSql,

    // Exact-substring duplication: same 60-bit md5 window hashes, same
    // >= 2-distinct-docs rule; covered positions via start+offset unnest,
    // span count = positions whose predecessor is uncovered (left join)
    "q46_substring_dup" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
        |wins AS (SELECT doc_id, s,
        |    ('0x' || substr(md5('sub:' || array_to_string(t[s:s+7], ' ')), 1, 15))::BIGINT AS wh
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS s
        |        FROM toks WHERE len(t) >= 8)),
        |dup AS (SELECT wh FROM wins GROUP BY wh HAVING count(DISTINCT doc_id) >= 2),
        |dw AS (SELECT doc_id, s FROM wins JOIN dup USING (wh)),
        |pos AS (SELECT DISTINCT doc_id, s + i AS p
        |  FROM (SELECT doc_id, s, unnest(range(0, 8)) AS i FROM dw)),
        |spans AS (SELECT a.doc_id, count(*) AS dup_tokens,
        |    count(*) FILTER (WHERE b.p IS NULL) AS n_spans
        |  FROM pos a LEFT JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p - 1
        |  GROUP BY a.doc_id),
        |nw AS (SELECT doc_id, count(DISTINCT s) AS n_dup_wins
        |  FROM dw GROUP BY doc_id)
        |SELECT doc_id, n_dup_wins, dup_tokens, n_spans
        |FROM nw JOIN spans USING (doc_id) ORDER BY doc_id""".stripMargin,

    // bigram-LM perplexity: the oracle refits the identical add-1 bigram
    // model — same bigram/context/vocab counts, same micro-quantized
    // dim-level ln (identical IEEE-divided integer arguments on both
    // engines, then round — partial-sum order cannot flake an integer
    // sum), one final rounded exp; <2-token docs keep 0/0/NULL
    "q47_lm_perplexity" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
        |bg AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 2
        |    THEN [array_to_string(t[i:i+1], ' ') for i in range(1, len(t))]
        |    ELSE [] END) AS bg FROM toks),
        |bgdim AS (SELECT bg, count(*)::BIGINT AS c FROM bg GROUP BY bg),
        |ctx AS (SELECT split_part(bg, ' ', 1) AS prev, sum(c)::BIGINT AS ctx
        |  FROM bgdim GROUP BY prev),
        |vocab AS (SELECT count(DISTINCT token)::BIGINT AS v
        |  FROM (SELECT unnest(t) AS token FROM toks)),
        |lp AS (SELECT bg,
        |    CAST(round(1e6 * ln((c + 1)::DOUBLE / (ctx + (SELECT v FROM vocab))))
        |      AS BIGINT) AS lp_micro
        |  FROM bgdim JOIN ctx ON split_part(bg, ' ', 1) = prev),
        |db AS (SELECT doc_id, bg, count(*)::BIGINT AS cnt
        |  FROM bg GROUP BY doc_id, bg),
        |w AS (SELECT doc_id, sum(cnt)::BIGINT AS n_bigrams,
        |    sum(cnt * lp_micro)::BIGINT AS ll_micro
        |  FROM db JOIN lp USING (bg) GROUP BY doc_id)
        |SELECT d.doc_id,
        |  coalesce(w.n_bigrams, 0) AS n_bigrams,
        |  coalesce(w.ll_micro, 0) AS ll_micro,
        |  round(exp(-w.ll_micro::DOUBLE / 1e6 / w.n_bigrams), 6) AS ppl
        |FROM documents d LEFT JOIN w USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // canonical-doc selection: q33's transitive closure + q23's quality
    // formula (round(…,6) FIRST, then micro-quantize — mirroring the
    // Spark side exactly so both engines compare the same integers), then
    // the per-group argmax as an explicit (q DESC, doc_id) row_number —
    // arg_max's tie rule is left unspecified, the window's isn't
    "q48_canonical_docs" -> {
      val stops = TextOps.stopwords.map(w => s"'$w'").mkString("[", ",", "]")
      s"""WITH RECURSIVE toks AS (SELECT doc_id, text, $toksSql AS t FROM documents),
        |sh AS (SELECT doc_id, $shingleSql AS s FROM toks),
        |pairs AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM sh a, sh b
        |  WHERE a.doc_id < b.doc_id
        |    AND round(len(list_intersect(a.s, b.s))::DOUBLE
        |              / len(list_distinct(a.s || b.s))::DOUBLE, 6) >= 0.5),
        |edges AS (SELECT a_id AS u, b_id AS v FROM pairs
        |          UNION SELECT b_id, a_id FROM pairs),
        |reach(id, lbl) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT r.id, e.v FROM reach r JOIN edges e ON e.u = r.lbl),
        |grp AS (SELECT id AS doc_id, min(lbl) AS group_id FROM reach GROUP BY id),
        |q AS (SELECT doc_id, CAST(round(1e6 * round(
        |    0.3 * least(len(t) / 100.0, 1.0) +
        |    0.4 * (len(list_filter(t, x -> list_contains($stops, x)))
        |           / greatest(len(t)::DOUBLE, 1.0)) +
        |    0.3 * (1.0 - least(len(regexp_extract_all(text, '[,.!?;:]'))
        |                       / greatest(length(text)::DOUBLE, 1.0) * 10.0, 1.0)),
        |    6)) AS BIGINT) AS q_micro FROM toks),
        |m AS (SELECT g.doc_id, g.group_id, q.q_micro
        |      FROM grp g JOIN q USING (doc_id)),
        |best AS (SELECT group_id, doc_id AS canon_doc_id, n_members FROM (
        |  SELECT group_id, doc_id,
        |    count(*) OVER (PARTITION BY group_id) AS n_members,
        |    row_number() OVER (PARTITION BY group_id
        |      ORDER BY q_micro DESC, doc_id) AS rk
        |  FROM m) WHERE rk = 1)
        |SELECT m.doc_id, m.group_id, m.q_micro, b.canon_doc_id,
        |  b.n_members::BIGINT AS n_members,
        |  (m.doc_id = b.canon_doc_id) AS canon
        |FROM m JOIN best b USING (group_id) ORDER BY m.doc_id""".stripMargin
    },

    // domain mixture: exact integer token sums per domain, single-division
    // shares, micro-quantized √share BEFORE the (integer) normalization
    // sum — no accumulation-order float drift anywhere
    "q49_domain_mixture" ->
      s"""WITH toks AS (SELECT doc_id, source, $toksSql AS t FROM documents),
        |d AS (SELECT source AS domain, count(*)::BIGINT AS n_docs,
        |      sum(len(t))::BIGINT AS tokens FROM toks GROUP BY source),
        |tt AS (SELECT *, sum(tokens) OVER () AS total FROM d),
        |s AS (SELECT domain, n_docs, tokens,
        |    CAST(round(tokens::DOUBLE / total * 1e6) AS BIGINT) AS share_micro,
        |    CAST(round(sqrt(tokens::DOUBLE / total) * 1e6) AS BIGINT) AS s_micro
        |  FROM tt)
        |SELECT domain, n_docs, tokens, share_micro,
        |  CAST(round(s_micro * 1e6 / sum(s_micro) OVER ()) AS BIGINT) AS weight_micro
        |FROM s ORDER BY domain""".stripMargin,

    // integer PageRank: the identical md5 edge list, then every iteration
    // unrolled as a CTE layer — contributions are integer `pr // 4`, the
    // damping step is `150000 + (85·s) // 100`; bit-exact, no float
    "q50_pagerank" -> {
      val iterCtes = (1 to 3).map { i =>
        s"""s$i AS (SELECT e.dst AS id, sum(r.pr // 4) AS s
           |  FROM e JOIN r${i - 1} r ON e.src = r.id GROUP BY e.dst),
           |r$i AS (SELECT d.doc_id AS id,
           |    (150000 + ((coalesce(s.s, 0) * 85) // 100))::BIGINT AS pr
           |  FROM documents d LEFT JOIN s$i s ON d.doc_id = s.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (
        |  SELECT d.doc_id AS src,
        |    ('0x' || substr(md5('pr:' || d.doc_id::VARCHAR || ':' || j::VARCHAR),
        |                    1, 15))::BIGINT
        |      % (SELECT count(*) FROM documents) AS dst
        |  FROM documents d, range(0, 4) r(j)),
        |r0 AS (SELECT doc_id AS id, 1000000::BIGINT AS pr FROM documents),
        |$iterCtes,
        |ind AS (SELECT dst AS id, count(*)::BIGINT AS indeg FROM e GROUP BY dst)
        |SELECT r3.id AS doc_id, r3.pr AS pr_micro,
        |  coalesce(ind.indeg, 0)::BIGINT AS indeg
        |FROM r3 LEFT JOIN ind ON r3.id = ind.id
        |ORDER BY doc_id""".stripMargin
    },

    // deterministic HLL: identical 40-bit md5 registers, exact integer
    // harmonic sum (Σ2^(31-ρ), empty registers at 2^31), and ONE
    // correctly-rounded division for the estimate — every factor of the
    // numerator 720541·2^51 is an exact double on both engines
    "q51_hll_distinct" ->
      """WITH h AS (
        |  SELECT event_type,
        |    ('0x' || substr(md5('hll:' || user_id::VARCHAR), 1, 10))::BIGINT AS h40
        |  FROM events),
        |r AS (
        |  SELECT event_type, h40 // 1073741824 AS register,
        |    CASE WHEN (h40 % 1073741824) = 0 THEN 31
        |         ELSE 31 - length(bin(h40 % 1073741824)) END AS rho
        |  FROM h),
        |mx AS (SELECT event_type, register, max(rho) AS rho FROM r GROUP BY 1, 2),
        |agg AS (
        |  SELECT event_type, count(*)::BIGINT AS nonzero_registers,
        |    (sum(1::BIGINT << (31 - rho))
        |      + (1024 - count(*)) * 2147483648)::BIGINT AS sum_inv
        |  FROM mx GROUP BY event_type),
        |ex AS (SELECT event_type, count(DISTINCT user_id)::BIGINT AS exact_distinct
        |       FROM events GROUP BY event_type)
        |SELECT a.event_type, 1024 AS m, a.nonzero_registers, a.sum_inv,
        |  round(720541.0 * 1048576 * 2147483648 / a.sum_inv)::BIGINT AS est_micro,
        |  ex.exact_distinct,
        |  (abs(round(720541.0 * 1048576 * 2147483648 / a.sum_inv)::BIGINT
        |       - ex.exact_distinct * 1000000) // ex.exact_distinct)::BIGINT AS err_ppm
        |FROM agg a JOIN ex USING (event_type)
        |ORDER BY event_type""".stripMargin,

    // Count-Min Sketch: ONE md5 per token; row r's cell is the digest's
    // r-th disjoint 32-bit segment mod w — the same d=4 × w=1024 grid in
    // both engines; estimate = min over the token's 4 cells; the exact
    // top-20 (count desc, token) grounds the one-sided error
    "q52_cms_heavy_hitters" ->
      s"""WITH toks AS (SELECT unnest($toksSql) AS token FROM documents),
        |cells AS (
        |  SELECT t.r,
        |    ('0x' || substr(md5('cms:' || token),
        |                    t.r * 8 + 1, 8))::BIGINT % 1024 AS c,
        |    count(*)::BIGINT AS cnt
        |  FROM toks, range(0, 4) t(r) GROUP BY 1, 2),
        |top AS (SELECT token, count(*)::BIGINT AS exact_cnt FROM toks
        |        GROUP BY token ORDER BY exact_cnt DESC, token LIMIT 20),
        |probes AS (
        |  SELECT token, exact_cnt, t.r,
        |    ('0x' || substr(md5('cms:' || token),
        |                    t.r * 8 + 1, 8))::BIGINT % 1024 AS c
        |  FROM top, range(0, 4) t(r))
        |SELECT p.token, p.exact_cnt, min(g.cnt)::BIGINT AS cms_est,
        |  (min(g.cnt) - p.exact_cnt)::BIGINT AS overcount
        |FROM probes p JOIN cells g ON p.r = g.r AND p.c = g.c
        |GROUP BY p.token, p.exact_cnt
        |ORDER BY exact_cnt DESC, token""".stripMargin,

    // int8 quantization: identical per-dim float32 amax, the same
    // (x·127)/amax double quantize step, then PURE INTEGER dot products —
    // the ranking is bit-exact by construction
    "q53_quantized_topk" ->
      """WITH d AS (
        |  SELECT unnest(embedding) AS x,
        |         unnest(range(0, len(embedding))) AS pos FROM embeddings),
        |am AS (SELECT pos, max(abs(x)) AS am FROM d GROUP BY pos),
        |ams AS (SELECT list(am ORDER BY pos) AS a FROM am),
        |qz AS (
        |  SELECT vec_id,
        |    [CASE WHEN a[i+1] = 0 THEN 0
        |          ELSE round(embedding[i+1]::DOUBLE * 127.0
        |                     / a[i+1]::DOUBLE)::INT END
        |     for i in range(0, len(embedding))] AS code
        |  FROM embeddings, ams)
        |SELECT * FROM (
        |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
        |    list_sum([(q.code[i+1]::BIGINT * n.code[i+1]::BIGINT)
        |              for i in range(0, len(q.code))])::BIGINT AS dot_q,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_sum([(q.code[i+1]::BIGINT * n.code[i+1]::BIGINT)
        |                         for i in range(0, len(q.code))]) DESC,
        |        n.vec_id) AS rk
        |  FROM qz q, qz n WHERE q.vec_id < 20 AND q.vec_id <> n.vec_id)
        |WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,

    // histogram quantiles: same integer bucket (n div 4 clamped), same
    // cumulative frame, same integer interpolation; exact type-1 quantile
    // = value at sorted position ceil(p*N/100) with doc_id ties
    "q54_hist_quantiles" ->
      s"""WITH base AS (
        |  SELECT source AS grp, doc_id, len($toksSql)::BIGINT AS n
        |  FROM documents),
        |tot AS (SELECT grp, count(*)::BIGINT AS n_docs FROM base GROUP BY grp),
        |hist AS (SELECT grp, least(n // 4, 1023)::BIGINT AS b,
        |           count(*)::BIGINT AS cnt FROM base GROUP BY 1, 2),
        |cum AS (SELECT grp, b, cnt,
        |          sum(cnt) OVER (PARTITION BY grp ORDER BY b)::BIGINT AS cum
        |        FROM hist),
        |probes AS (SELECT grp, n_docs, p.pct,
        |             ((p.pct * n_docs + 99) // 100)::BIGINT AS need
        |           FROM tot, (VALUES (50), (90), (99)) p(pct)),
        |tgt AS (SELECT grp, pct, n_docs, need, b, cnt, cum,
        |          row_number() OVER (PARTITION BY grp, pct ORDER BY b) AS rk
        |        FROM probes JOIN cum USING (grp) WHERE cum >= need),
        |est AS (SELECT grp, pct, n_docs, need,
        |          (b * 4 + ((need - (cum - cnt) - 1) * 4) // cnt)::BIGINT AS est_tok
        |        FROM tgt WHERE rk = 1),
        |ranked AS (SELECT grp, n,
        |             row_number() OVER (PARTITION BY grp ORDER BY n, doc_id) AS r
        |           FROM base)
        |SELECT e.grp AS source, e.pct, e.n_docs, e.est_tok,
        |  ranked.n::BIGINT AS exact_tok, (e.est_tok - ranked.n)::BIGINT AS err
        |FROM est e JOIN ranked ON e.grp = ranked.grp AND ranked.r = e.need
        |ORDER BY source, pct""".stripMargin,

    // quality-classifier inference: identical hashed unigram+bigram
    // feature buckets (md5 'qf:'), identical md5-derived weight table
    // ('qw:' per BUCKET INDEX, mod 2001 - 1000 micro-units), integer
    // logit sum — the left join restores empty-feature docs at logit 0
    "q55_quality_classifier" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
        |feats AS (SELECT doc_id,
        |    ('0x' || substr(md5('qf:' || gram), 1, 15))::BIGINT % 4096 AS b
        |  FROM (SELECT doc_id, unnest(list_concat(t,
        |      CASE WHEN len(t) >= 2
        |           THEN [array_to_string(t[i:i+1], ' ') for i in range(1, len(t))]
        |           ELSE [] END)) AS gram FROM toks)),
        |w AS (SELECT doc_id, count(*)::BIGINT AS n_feats,
        |    sum(('0x' || substr(md5('qw:' || b::VARCHAR), 1, 15))::BIGINT
        |        % 2001 - 1000)::BIGINT AS logit
        |  FROM feats GROUP BY doc_id)
        |SELECT t.doc_id, coalesce(w.n_feats, 0)::BIGINT AS n_feats,
        |  coalesce(w.logit, 0)::BIGINT AS logit_micro,
        |  (CASE WHEN coalesce(w.logit, 0) >= 0 THEN 1 ELSE 0 END)::BIGINT AS keep
        |FROM toks t LEFT JOIN w USING (doc_id) ORDER BY doc_id""".stripMargin,

    // PQ ANN: same int8 codes as q53, codebook = the 16 md5-smallest
    // ids' codes (codebook index = rank in (md5, vec_id) order), encode
    // = per-subspace argmin integer L2 with first-index ties, ADC = sum
    // of the per-(j, code) distances — every distance integer, so the
    // whole pipeline replays engine-exact
    "q56_pq_topk" ->
      """WITH d AS (
        |  SELECT unnest(embedding) AS x,
        |         unnest(range(0, len(embedding))) AS pos FROM embeddings),
        |am AS (SELECT pos, max(abs(x)) AS am FROM d GROUP BY pos),
        |ams AS (SELECT list(am ORDER BY pos) AS a FROM am),
        |qz AS (
        |  SELECT vec_id,
        |    [CASE WHEN a[i+1] = 0 THEN 0
        |          ELSE round(embedding[i+1]::DOUBLE * 127.0
        |                     / a[i+1]::DOUBLE)::INT END
        |     for i in range(0, len(embedding))] AS code
        |  FROM embeddings, ams),
        |cbrows AS (
        |  SELECT c, code FROM (
        |    SELECT code, row_number() OVER (ORDER BY
        |        ('0x' || substr(md5('pqcb:' || vec_id::VARCHAR), 1, 15))::BIGINT,
        |        vec_id) - 1 AS c
        |    FROM qz) WHERE c < 16),
        |sub AS (
        |  SELECT t.j, cb.c, cb.code[t.j*8+1 : t.j*8+8] AS sv
        |  FROM cbrows cb, range(0, 8) t(j)),
        |vd AS (
        |  SELECT v.vec_id, s.j, s.c,
        |    list_sum([ (v.code[s.j*8+i+1]::BIGINT - s.sv[i+1]::BIGINT)
        |             * (v.code[s.j*8+i+1]::BIGINT - s.sv[i+1]::BIGINT)
        |               for i in range(0, 8)])::BIGINT AS dist
        |  FROM qz v, sub s),
        |enc AS (
        |  SELECT vec_id, j, c AS pq FROM (
        |    SELECT vec_id, j, c,
        |      row_number() OVER (PARTITION BY vec_id, j
        |        ORDER BY dist, c) AS rk
        |    FROM vd) WHERE rk = 1),
        |adc AS (
        |  SELECT qv.vec_id AS q_id, en.vec_id AS n_id,
        |    sum(qv.dist)::BIGINT AS adc_dist
        |  FROM vd qv JOIN enc en ON qv.j = en.j AND qv.c = en.pq
        |  WHERE qv.vec_id < 10 AND qv.vec_id <> en.vec_id
        |  GROUP BY 1, 2),
        |ex AS (
        |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
        |    list_sum([ (q.code[i+1]::BIGINT - n.code[i+1]::BIGINT)
        |             * (q.code[i+1]::BIGINT - n.code[i+1]::BIGINT)
        |               for i in range(0, len(q.code))])::BIGINT AS exact_l2
        |  FROM qz q, qz n WHERE q.vec_id < 10 AND q.vec_id <> n.vec_id)
        |SELECT * FROM (
        |  SELECT a.q_id, a.n_id, a.adc_dist, ex.exact_l2,
        |    row_number() OVER (PARTITION BY a.q_id
        |      ORDER BY a.adc_dist, a.n_id)::BIGINT AS rk
        |  FROM adc a JOIN ex USING (q_id, n_id))
        |WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,

    // BPE pair counts: same whitespace words, same per-word adjacent
    // char pairs weighted by word count, same (cnt desc, pair) rank —
    // all integer, so the merge-candidate table is engine-exact
    "q57_bpe_pairs" ->
      s"""WITH toks AS (SELECT $toksSql AS t FROM documents),
        |wc AS (SELECT w, count(*)::BIGINT AS cnt
        |       FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
        |pr AS (SELECT unnest([w[i:i] || ' ' || w[i+1:i+1]
        |                      for i in range(1, len(w))]) AS pair, cnt
        |       FROM wc WHERE len(w) >= 2),
        |agg AS (SELECT pair, sum(cnt)::BIGINT AS pair_cnt
        |        FROM pr GROUP BY pair),
        |top AS (SELECT pair, pair_cnt FROM agg
        |        ORDER BY pair_cnt DESC, pair LIMIT 20)
        |SELECT pair, pair_cnt,
        |  row_number() OVER (ORDER BY pair_cnt DESC, pair)::BIGINT AS rk
        |FROM top ORDER BY rk""".stripMargin,

    // chunking: same stride-24/16 windows over the whitespace tokens,
    // same md5 of the space-joined window — chunk boundaries and hashes
    // replay exactly
    "q58_chunking" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
        |ix AS (SELECT doc_id, t,
        |         unnest(range(0, (len(t) + 15) // 16)) AS ci
        |       FROM toks WHERE len(t) >= 1),
        |ch AS (SELECT doc_id, ci,
        |         t[ci*16+1 : least(ci*16+24, len(t))] AS c
        |       FROM ix)
        |SELECT doc_id, ci::BIGINT AS chunk_idx, (ci*16)::BIGINT AS start_tok,
        |  len(c)::BIGINT AS n_tok, md5(array_to_string(c, ' ')) AS chunk_hash
        |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin,

    // recrawl: replay the planted visit fixture (rate + change draws,
    // version running sum, body hash), the lag-compare, the micro-nat
    // λ̂ (ln of the same IEEE integer division), and the (λ̂ desc,
    // doc_id) rank — integer end-to-end around the single ln
    "q59_recrawl" ->
      """WITH v AS (SELECT doc_id, unnest(range(0, 8)) AS r FROM documents),
        |d AS (SELECT doc_id, r,
        |        CASE WHEN r = 0 THEN 0
        |             WHEN ('0x' || substr(md5('chg:' || doc_id::VARCHAR
        |                    || ':' || r::VARCHAR), 1, 15))::BIGINT % 100
        |                  < 5 + (('0x' || substr(md5('rate:'
        |                    || doc_id::VARCHAR), 1, 15))::BIGINT % 60)
        |             THEN 1 ELSE 0 END AS chg
        |      FROM v),
        |ver AS (SELECT doc_id, r,
        |          sum(chg) OVER (PARTITION BY doc_id ORDER BY r) AS version
        |        FROM d),
        |vis AS (SELECT doc_id, r,
        |          md5('body:' || doc_id::VARCHAR || ':'
        |              || version::VARCHAR) AS h
        |        FROM ver),
        |lagd AS (SELECT doc_id, h,
        |           lag(h) OVER (PARTITION BY doc_id ORDER BY r) AS p
        |         FROM vis),
        |obs AS (SELECT doc_id, count(*)::BIGINT AS n_obs,
        |          sum((h <> p)::INT)::BIGINT AS n_changed
        |        FROM lagd WHERE p IS NOT NULL GROUP BY doc_id),
        |est AS (SELECT doc_id, n_obs, n_changed,
        |          round(-ln(((n_obs - n_changed)*2 + 1)::DOUBLE
        |                    / (n_obs*2 + 1)::DOUBLE) * 1e6)::BIGINT
        |            AS lambda_micro
        |        FROM obs),
        |top AS (SELECT * FROM est
        |        ORDER BY lambda_micro DESC, doc_id LIMIT 100)
        |SELECT doc_id, n_obs, n_changed, lambda_micro,
        |  row_number() OVER (ORDER BY lambda_micro DESC, doc_id)::BIGINT AS rk
        |FROM top ORDER BY rk""".stripMargin,

    // incremental dedup: same md5 snapshot split, same normalized
    // fingerprint, brute-force Jaccard over the cross product (the Spark
    // side's prefix filter has complete recall — blocking NOT replicated;
    // the size-ratio WHERE is the J >= t ⇒ min >= t·max implication, a
    // pure speedup), same (J desc, id) best-match rank
    "q60_incremental_dedup" ->
      s"""WITH inc AS (SELECT * FROM documents
        |        WHERE ('0x' || substr(md5('snap:' || doc_id::VARCHAR),
        |                              1, 15))::BIGINT % 5 = 0),
        |arc AS (SELECT * FROM documents
        |        WHERE ('0x' || substr(md5('snap:' || doc_id::VARCHAR),
        |                              1, 15))::BIGINT % 5 <> 0),
        |fpi AS (SELECT doc_id, md5(regexp_replace(lower(trim(text)),
        |                           '\\s+', ' ', 'g')) AS fp FROM inc),
        |fpa AS (SELECT doc_id, md5(regexp_replace(lower(trim(text)),
        |                           '\\s+', ' ', 'g')) AS fp FROM arc),
        |ex AS (SELECT i.doc_id, min(a.doc_id) AS exact_id
        |       FROM fpi i JOIN fpa a USING (fp) GROUP BY 1),
        |si AS (SELECT doc_id, $shingleSql AS s
        |       FROM (SELECT doc_id, $toksSql AS t FROM inc)),
        |sa AS (SELECT doc_id, $shingleSql AS s
        |       FROM (SELECT doc_id, $toksSql AS t FROM arc)),
        |pairs AS (
        |  SELECT i.doc_id AS i_id, a.doc_id AS a_id,
        |    round(len(list_intersect(i.s, a.s))::DOUBLE
        |          / len(list_distinct(i.s || a.s))::DOUBLE, 6) AS j
        |  FROM si i, sa a
        |  WHERE len(a.s) >= 0.8 * len(i.s)
        |    AND len(i.s) >= 0.8 * len(a.s)),
        |best AS (
        |  SELECT i_id, a_id AS near_id, j FROM (
        |    SELECT i_id, a_id, j,
        |      row_number() OVER (PARTITION BY i_id
        |        ORDER BY j DESC, a_id) AS rk
        |    FROM pairs WHERE j >= 0.8) WHERE rk = 1)
        |SELECT i.doc_id,
        |  CASE WHEN ex.exact_id IS NOT NULL THEN 'exact'
        |       WHEN best.near_id IS NOT NULL THEN 'near'
        |       ELSE 'new' END AS status,
        |  coalesce(ex.exact_id, best.near_id)::BIGINT AS match_id,
        |  CASE WHEN ex.exact_id IS NULL THEN best.j END AS jaccard
        |FROM inc i
        |LEFT JOIN ex ON ex.doc_id = i.doc_id
        |LEFT JOIN best ON best.i_id = i.doc_id
        |ORDER BY i.doc_id""".stripMargin,

    // mixture sample: same q49 weight replay, same integer
    // largest-remainder apportionment (ties → domain order), same seeded
    // md5 per-domain rank — integer end-to-end around q49's two IEEE ops
    "q61_mixture_sample" ->
      s"""WITH toks AS (SELECT doc_id, source, $toksSql AS t FROM documents),
        |d AS (SELECT source AS domain, count(*)::BIGINT AS n_docs,
        |      sum(len(t))::BIGINT AS tokens FROM toks GROUP BY source),
        |tt AS (SELECT *, sum(tokens) OVER () AS total FROM d),
        |s AS (SELECT domain, n_docs,
        |    CAST(round(sqrt(tokens::DOUBLE / total) * 1e6) AS BIGINT) AS s_micro
        |  FROM tt),
        |wts AS (SELECT domain, n_docs,
        |    CAST(round(s_micro * 1e6 / sum(s_micro) OVER ()) AS BIGINT) AS w
        |  FROM s),
        |alloc AS (SELECT domain, n_docs, (w * 100) // 1000000 AS base,
        |                 (w * 100) % 1000000 AS rem FROM wts),
        |defi AS (SELECT *, 100 - sum(base) OVER () AS deficit,
        |           row_number() OVER (ORDER BY rem DESC, domain) AS er
        |         FROM alloc),
        |quota AS (SELECT domain,
        |    least(base + CASE WHEN er <= deficit THEN 1 ELSE 0 END,
        |          n_docs) AS quota
        |  FROM defi),
        |drawn AS (SELECT doc.doc_id, doc.source AS domain, q.quota,
        |    row_number() OVER (PARTITION BY doc.source
        |      ORDER BY md5('mix:42:' || doc.doc_id::VARCHAR), doc.doc_id) AS rk
        |  FROM documents doc JOIN quota q ON q.domain = doc.source
        |  WHERE q.quota > 0)
        |SELECT doc_id, domain, rk::BIGINT AS rk, quota::BIGINT AS quota
        |FROM drawn WHERE rk <= quota ORDER BY domain, rk""".stripMargin,

    "q62_real_media_features" -> q62OracleSql)

  /** q62's oracle: expected pixel/channel and PCM-sample statistics from
    * the SAME seeded integer formula [[graft.operators.Multimodal
    * .recipeOf]]/pixelRgb/sampleAt use — the oracle never decodes a byte;
    * the Spark side's ImageIO/AudioSystem encode→decode roundtrip is
    * exactly what a hash match proves. seed32 = first 8 md5 hex chars
    * (32-bit, so BIGINT arithmetic is exact on both engines); all outputs
    * BIGINT — no floats near the hash. */
  private def q62OracleSql: String = {
    val hexdig = "0123456789abcdef"
    // Σ_{i=1..8} digit(seedhex[i]) · 16^(8-i) — unrolled like q32's bytes
    val seedTerms = (1 to 8).map { i =>
      val pow = 1L << (4 * (8 - i))
      s"(strpos('$hexdig', seedhex[$i]) - 1) * $pow"
    }.mkString("\n        + ")
    val rate = graft.operators.Multimodal.wavSampleRate
    s"""WITH m AS (
        |  SELECT doc_id::VARCHAR AS media_id,
        |         md5(doc_id::VARCHAR || '|' || substr(text, 1, 64)) AS seedhex
        |  FROM documents),
        |sd AS (
        |  SELECT media_id,
        |    ( $seedTerms ) AS seed32
        |  FROM m),
        |rec AS (
        |  SELECT media_id, seed32 % 1000003 AS s,
        |    seed32 % 2 = 0 AS is_png,
        |    8 + seed32 % 9 AS w, 8 + (seed32 // 16) % 9 AS hgt,
        |    64 + seed32 % 129 AS n
        |  FROM sd),
        |img AS (
        |  SELECT media_id, 'image' AS kind, w AS d1, hgt AS d2,
        |    SUM((s * 31 + x.j * 7  + y.j * 13) % 256)::BIGINT AS s1,
        |    SUM((s * 17 + x.j * 11 + y.j * 5)  % 256)::BIGINT AS s2,
        |    SUM((s * 13 + x.j * 3  + y.j * 29) % 256)::BIGINT AS s3
        |  FROM rec, range(0, 16) x(j), range(0, 16) y(j)
        |  WHERE is_png AND x.j < w AND y.j < hgt
        |  GROUP BY 1, 2, 3, 4),
        |aud AS (
        |  SELECT media_id, 'audio' AS kind, n AS d1, $rate AS d2,
        |    SUM(((s * 131 + i.j * 7919) % 65536) - 32768)::BIGINT AS s1,
        |    SUM(abs(((s * 131 + i.j * 7919) % 65536) - 32768))::BIGINT AS s2,
        |    SUM(0)::BIGINT AS s3
        |  FROM rec, range(0, 193) i(j)
        |  WHERE NOT is_png AND i.j < n
        |  GROUP BY 1, 2, 3, 4)
        |SELECT media_id, kind, d1::BIGINT AS d1, d2::BIGINT AS d2, s1, s2, s3
        |FROM (SELECT * FROM img UNION ALL SELECT * FROM aud)
        |ORDER BY media_id""".stripMargin
  }

  private def q32OracleSql: String = {
    import graft.operators.Multimodal.{defaultBytesPerDoc, headerBytes}
    require(defaultBytesPerDoc % 16 == 0,
      "q32 oracle unrolls whole 16-byte md5 blocks")
    val numBlocks = defaultBytesPerDoc / 16
    val avgBytes = defaultBytesPerDoc + headerBytes
    s"""WITH m AS (
        |  SELECT doc_id::VARCHAR AS id,
        |         md5(doc_id::VARCHAR || '|' || substr(text, 1, 64)) AS seedhex
        |  FROM documents),
        |s AS (
        |  SELECT id, seedhex,
        |    (strpos('0123456789abcdef', seedhex[16]) - 1) % 2 = 0 AS is_png
        |  FROM m),
        |blocks AS (
        |  SELECT id, is_png, md5(seedhex || ':' || j::VARCHAR) AS bh
        |  FROM s, range(0, $numBlocks) r(j)),
        |bodybytes AS (
        |  SELECT id, is_png,
        |    (strpos('0123456789abcdef', bh[2*i-1]) - 1) * 16 +
        |    (strpos('0123456789abcdef', bh[2*i]) - 1) AS b
        |  FROM blocks, range(1, 17) ri(i)),
        |hdrbytes AS (
        |  SELECT id, is_png,
        |    unnest(CASE WHEN is_png THEN [137,80,78,71,13,10,26,10]
        |                ELSE [82,73,70,70,36,0,0,0] END) AS b
        |  FROM s),
        |hist AS (
        |  SELECT id, is_png, b // 4 AS bin, count(*)::DOUBLE AS c
        |  FROM (SELECT * FROM hdrbytes UNION ALL SELECT * FROM bodybytes)
        |  GROUP BY 1, 2, 3),
        |norm AS (
        |  SELECT id, is_png,
        |    coalesce(sum(c) FILTER (bin = 0), 0) AS h0, sum(c * c) AS ss
        |  FROM hist GROUP BY 1, 2),
        |perdoc AS (
        |  SELECT id, is_png,
        |    round(CAST(CAST(h0 AS FLOAT) * CAST(1.0 / sqrt(ss) AS FLOAT)
        |               AS FLOAT)::DOUBLE, 6) AS f0
        |  FROM norm)
        |SELECT CASE WHEN is_png THEN 'image' ELSE 'audio' END AS kind,
        |       CASE WHEN is_png THEN 'image/png' ELSE 'audio/wave' END AS sniffed_mime,
        |       count(*) AS cnt,
        |       round(avg($avgBytes.0), 2) AS avg_bytes,
        |       round(avg(f0), 6) AS avg_f0
        |FROM perdoc
        |GROUP BY 1, 2
        |ORDER BY kind""".stripMargin
  }
}
