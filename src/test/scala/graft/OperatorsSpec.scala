package graft

import graft.operators.{Dedup, Multimodal, Similarity, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Training-data pipeline operators: dedup (exact / MinHash-LSH / SimHash /
  * n-gram Jaccard), embedding similarity (brute-force, sign-LSH ANN, IVF),
  * text analysis, and the multimodal binary plumbing. */
class OperatorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Corpus with known structure: 0/1 exact dupes, 2 a near-dup of 0 (one
  // word swapped), 3..n random word salads.
  def corpus(): DataFrame = {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val near = base.replace("sigma", "digamma") // 1 token of 20 differs
    val salads = (3 until 40).map { i =>
      val ws = Array("table", "scan", "query", "join", "sort", "merge",
        "hash", "agg", "key", "row", "batch", "window")
      i.toString + " " + (0 until 25).map(j => ws((i * 7 + j * 5) % ws.length)).mkString(" ")
    }
    (Seq(0L -> base, 1L -> ("  " + base + " "), 2L -> near) ++
      salads.zipWithIndex.map { case (t, i) => (i + 3).toLong -> t })
      .toDF("doc_id", "text")
  }

  test("exactDedup: whitespace-normalized dupes collapse, lowest id survives") {
    val d = Dedup.exactDedup(corpus())
    val row = d.filter(col("dupes") > 1).collect()
    assert(row.length == 1)
    assert(row.head.getAs[Long]("doc_id") == 0L && row.head.getAs[Long]("dupes") == 2L)
  }

  test("ngramJaccardPairs finds the constructed near-dup pair") {
    val pairs = Dedup.ngramJaccardPairs(corpus(), n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // exact dup, J=1
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L))) // near dup
  }

  test("minhash_sig expression is bit-identical to the HOF column-algebra reference") {
    // bucket assignments (and so recall) depend on EXACT signature bits:
    // the custom one-pass expression must reproduce the xxhash64
    // composition of the higher-order-function form on arbitrary shingle
    // arrays, including empty and unicode-bearing ones
    graft.functions.GraftExpressions.register(spark)
    val docs = corpus().unionByName(Seq(
      100L -> "", 101L -> "ünïcode tökens über all",
      102L -> "a b a b a").toDF("doc_id", "text"))
    val sh = docs.select(col("doc_id"), Dedup.shingleArr(col("text"), 3).as("sh"))
    val both = sh.select(col("doc_id"),
      Dedup.minhashSignature(col("sh"), 128).as("fast"),
      Dedup.minhashSignatureHof(col("sh"), 128).as("ref"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"signature mismatch for doc ${r.getLong(0)}")
    }
  }

  test("simhash60 expression is bit-identical to the HOF column-algebra reference") {
    // block assignments (and so pigeonhole recall) depend on EXACT sketch
    // bits: the one-pass expression must reproduce the md5-derived 60-bit
    // composition of the higher-order-function form — including empty
    // texts (0L), unicode tokens, heavy repetition (sign saturation), and
    // a single-token doc (every sign ±1, sketch = the token hash)
    graft.functions.GraftExpressions.register(spark)
    val docs = corpus().unionByName(Seq(
      100L -> "", 101L -> "ünïcode tökens über all",
      102L -> "a b a b a", 103L -> "solo").toDF("doc_id", "text"))
    val both = docs.select(col("doc_id"),
      Dedup.simhash(col("text")).as("fast"),
      Dedup.simhashHof(col("text")).as("ref"))
      .collect()
    both.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"simhash mismatch for doc ${r.getLong(0)}: ${r.getLong(1)} vs ${r.getLong(2)}")
    }
  }

  test("shingles_sorted expression is bit-identical to the column-algebra reference") {
    // every downstream blocking/verify structure (prefix filter, MinHash
    // signature, exact Jaccard) consumes this array: the one-pass
    // TreeSet form must reproduce array_sort(array_distinct(transform))
    // exactly — order (UTF8 binary), dedup, the short-doc whole-gram
    // branch, empty text, unicode, and heavy repetition
    graft.functions.GraftExpressions.register(spark)
    val docs = corpus().unionByName(Seq(
      100L -> "", 101L -> "ünïcode tökens über all und darüber",
      102L -> "a b a b a b a b", 103L -> "zz yy xx ww vv",
      104L -> "two toks", 105L -> "exactly three tokens").toDF("doc_id", "text"))
    for (n <- Seq(2, 3, 5)) {
      val both = docs.select(col("doc_id"),
        Dedup.shingleArr(col("text"), n).as("fast"),
        Dedup.shingleArrSpec(col("text"), n).as("ref"))
        .collect()
      both.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"shingle mismatch for doc ${r.getLong(0)} at n=$n")
      }
    }
  }

  test("md5_window_hashes expression is bit-identical to the column-algebra reference") {
    // q46's window identities (and so its dup-hash groups) depend on the
    // EXACT md5 bytes: the one-pass expression must reproduce the
    // conv(substring(md5(concat('sub:', concat_ws(' ', slice(tk,s,w)))),1,15),16,10)
    // composition — including unicode tokens, docs shorter than w (empty
    // array), exactly-w docs (one window), and heavy repetition
    graft.functions.GraftExpressions.register(spark)
    val docs = corpus().unionByName(Seq(
      100L -> "", 101L -> "ünïcode tökens über all und darüber hinaus mehr",
      102L -> "a b a b a b a b a b", 103L -> "one two three four five six seven eight",
      104L -> "short doc").toDF("doc_id", "text"))
    for (w <- Seq(3, 8)) {
      val both = docs.select(col("doc_id"),
        graft.functions.GraftExpressions
          .md5_window_hashes(graft.operators.TextOps.tokens(col("text")), w).as("fast"),
        Dedup.windowHashesSpec(graft.operators.TextOps.tokens(col("text")), w).as("ref"))
        .collect()
      both.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"window-hash mismatch for doc ${r.getLong(0)} at w=$w")
      }
    }
  }

  test("md5_gram_buckets expression is bit-identical to the column-algebra reference") {
    // q55's classifier features and q44's DSIR buckets depend on the
    // EXACT md5 bytes per unigram/bigram: the one-pass expression must
    // reproduce conv(substring(md5(prefix || gram),1,15),16,10) % buckets
    // in the HOF form's order (all unigrams, then all bigrams) —
    // including unicode, empty text (empty array), and single-token docs
    // (no bigrams)
    graft.functions.GraftExpressions.register(spark)
    val docs = corpus().unionByName(Seq(
      100L -> "", 101L -> "ünïcode tökens über all",
      102L -> "solo", 103L -> "a b a b a b",
      104L -> "exactly two").toDF("doc_id", "text"))
    for ((buckets, pfx) <- Seq((4096, "qf:"), (64, "dsir:"))) {
      val toks = graft.operators.TextOps.tokens(col("text"))
      val both = docs.select(col("doc_id"),
        graft.functions.GraftExpressions
          .md5_gram_buckets(toks, buckets, pfx).as("fast"),
        graft.operators.Corpus.hashedGramsSpec(toks, buckets, pfx).as("ref"))
        .collect()
      both.foreach { r =>
        assert(r.getSeq[Int](1) == r.getSeq[Int](2),
          s"gram-bucket mismatch for doc ${r.getLong(0)} at ($buckets, $pfx)")
      }
    }
  }

  test("bpe_apply: merge priority, left-to-right non-overlap, independent replay") {
    graft.functions.GraftExpressions.register(spark)
    import graft.functions.GraftExpressions.bpe_apply
    val merges = Seq("e s", "es t", "l o", "lo w")
    def enc(text: String, m: Seq[String]): Seq[String] =
      Seq(1L -> text).toDF("doc_id", "text")
        .select(bpe_apply(graft.operators.TextOps.tokens(col("text")), m).as("s"))
        .collect().head.getSeq[String](0)
    // the canonical Sennrich example: lowest → low + est, lower → low e r
    assert(enc("lowest lower", merges) ==
      Seq("low", "est", "low", "e", "r"))
    // empty merge table = characters
    assert(enc("ab c", Nil) == Seq("a", "b", "c"))
    // left-to-right within one rule: a merged pair cannot overlap itself
    assert(enc("aaa", Seq("a a")) == Seq("aa", "a"))
    assert(enc("aaaa", Seq("a a", "aa aa")) == Seq("aaaa"))
    // independent replay of the priority loop on a distinct merge table
    val m2 = Seq("t h", "th e", "i n", "a n", "an d")
    def replay(w: String): Seq[String] = {
      var s = w.map(_.toString).toVector
      var go = true
      while (go && s.length > 1) {
        val cands = s.zip(s.tail).flatMap { case (a, b) =>
          val i = m2.indexOf(s"$a $b"); if (i >= 0) Some(i) else None }
        if (cands.isEmpty) go = false
        else {
          val Array(a, b) = m2(cands.min).split(" ")
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < s.length) {
            if (j < s.length - 1 && s(j) == a && s(j + 1) == b) { out += a + b; j += 2 }
            else { out += s(j); j += 1 }
          }
          s = out.result()
        }
      }
      s
    }
    val words = Seq("the", "then", "thin", "and", "anthem", "banana", "x")
    assert(enc(words.mkString(" "), m2) == words.flatMap(replay))
    // per-row projection: no shuffle
    val plan = Seq(1L -> "a b").toDF("doc_id", "text")
      .select(bpe_apply(graft.operators.TextOps.tokens(col("text")), m2))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bpe_apply must ride the scan:\n$plan")
  }

  test("sign_buckets_md5 expression is bit-identical to the literal-matrix HOF reference") {
    // LSH bucket keys (and so q27/q29 candidate sets) depend on EXACT
    // projection signs: the one-pass expression recomputes the md5 plane
    // matrix internally and must reproduce signBucketsLit's left-to-right
    // double fold bit for bit — including all-zero vectors (proj 0 → bit
    // 0, strict >) and sign-boundary values — at both the q27 (12×10) and
    // q29 (32×5) shapes
    graft.functions.GraftExpressions.register(spark)
    val vecs = ((0 until 49).map { i =>
      (i.toLong, Array.tabulate(64)(j => ((i * 131 + j * 17) % 97 - 48) / 7.0f))
    } :+ (99L, Array.fill(64)(0.0f))).toDF("vec_id", "embedding")
    for ((tables, ppt) <- Seq((12, 10), (32, 5))) {
      val m = Similarity.md5PlaneMatrix(tables * ppt, 64)
      val both = vecs.select(col("vec_id"),
        graft.functions.GraftExpressions
          .sign_buckets_md5(col("embedding"), tables, ppt).as("fast"),
        Similarity.signBucketsLit(col("embedding"), m, ppt).as("ref"))
        .collect()
      both.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"bucket mismatch for vec ${r.getLong(0)} at $tables x $ppt")
      }
    }
  }

  test("cosine_sim expression is bit-identical to the HOF column-algebra reference") {
    graft.functions.GraftExpressions.register(spark)
    // deterministic pseudo-random float vectors — exact double equality
    // required, the expression must reproduce the HOF fold's op order bit
    // for bit
    val vecs = (0 until 49).map { i =>
      (i.toLong, Array.tabulate(64)(j => ((i * 131 + j * 17) % 97 - 48) / 7.0f))
    }.toDF("vec_id", "embedding")
    val pairs = vecs.as("a").crossJoin(vecs.as("b")).limit(500)
      .select(
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("fast"),
        Similarity.cosineHof(col("a.embedding"), col("b.embedding")).as("ref"))
      .collect()
    pairs.foreach { r =>
      val f = r.getDouble(0)
      val e = r.getDouble(1)
      assert(java.lang.Double.doubleToRawLongBits(f) ==
        java.lang.Double.doubleToRawLongBits(e),
        s"cosine mismatch: $f vs $e")
    }
    // the ONE documented divergence: zero-norm → NULL (the ANSI HOF form
    // raises DIVIDE_BY_ZERO; a degenerate embedding must not kill the job,
    // and NaN would TOP-rank in descending cosine order)
    val z = Seq((0L, Array.fill(64)(0.0f)), (1L, Array.fill(64)(1.0f)))
      .toDF("vec_id", "embedding")
    val zr = z.as("a").crossJoin(z.as("b"))
      .select(Similarity.cosine(col("a.embedding"), col("b.embedding")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(zr.count(_.isEmpty) == 3, s"zero-vector pairs must be null: ${zr.toSeq}")
  }

  test("minhashLshPairs: finds near-dups, never reports below-threshold pairs (precision exact)") {
    val got = Dedup.minhashLshPairs(corpus(), n = 3, threshold = 0.5)
    val pairs = got.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L && p._3 == 1.0))
    assert(pairs.exists(p => p._1 == 0L && p._2 == 2L))
    assert(pairs.forall(_._3 >= 0.5), "verify step must enforce the threshold")
  }

  test("simhash: near-identical texts land within small hamming; pairs found by pigeonhole blocks") {
    graft.functions.GraftExpressions.register(spark)
    val sh = corpus().select(col("doc_id"), Dedup.simhash(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(1L), "normalization-identical docs must hash equal")
    val ham02 = java.lang.Long.bitCount(sh(0L) ^ sh(2L))
    assert(ham02 <= 3, s"1-of-20-token swap should stay within hamming 3, got $ham02")
    val pairs = Dedup.simhashPairs(corpus(), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 2L)))
  }

  test("survivors drops the b-side of each pair") {
    val pairs = Seq((0L, 1L), (0L, 2L)).toDF("a_id", "b_id")
    val s = Dedup.survivors(corpus(), pairs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(!s.contains(1L) && !s.contains(2L) && s.contains(0L) && s.contains(3L))
  }

  // ---- embeddings ----

  def embeddings(): DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("bruteForceTopK: k rows per query, cosine descending, deterministic ties") {
    val emb = embeddings()
    val queries = emb.filter(col("vec_id") < 3)
    val tk = Similarity.bruteForceTopK(emb, queries, 5).collect()
    assert(tk.length == 15)
    val byQ = tk.groupBy(_.getAs[Long]("q_id"))
    byQ.values.foreach { rows =>
      val cs = rows.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("cos")).toSeq
      assert(cs == cs.sorted.reverse)
    }
  }

  test("annTopK recall vs brute force >= 0.6 on sf0.001 (LSH trade-off, measured)") {
    val emb = embeddings()
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, 5).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    // random 64-dim embeddings are a worst case for sign-LSH (neighbors are
    // barely closer than the bulk); measured recall at (32 tables, 5
    // planes) is 0.94 on this fixture
    val ann = Similarity.annTopK(emb, queries, 5, tables = 32, planesPerTable = 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val recall = (exact intersect ann).size.toDouble / exact.size
    assert(recall >= 0.8, s"ANN recall $recall")
  }

  test("ivf: k-means centroids converge, assignment is total, probing returns k true-cosine neighbors") {
    val emb = embeddings()
    val centroids = Similarity.kmeansCentroids(emb, cells = 8, iters = 4)
    assert(centroids.count() == 8)
    // centroids are means, not corpus rows: cell ids are 0..7
    assert(centroids.select("cell_id").collect().map(_.getInt(0)).sorted.toSeq ==
      (0 until 8))
    val assigned = Similarity.ivfAssign(emb, centroids)
    assert(assigned.count() == emb.count())
    val queries = emb.filter(col("vec_id") < 3)
    val tk = Similarity.ivfTopK(assigned, centroids, queries, k = 5, nprobe = 4)
    val rows = tk.collect()
    assert(rows.groupBy(_.getAs[Long]("q_id")).forall(_._2.length == 5))
    // recall floor vs brute force — k-means cells must beat random probing
    val exact = Similarity.bruteForceTopK(emb, queries, 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val got = rows.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val recall = (exact intersect got).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall $recall below floor")
  }

  test("embedding cosineNearDupPairs: planted duplicate vector is found") {
    val emb = embeddings().limit(50)
    val dup = emb.filter(col("vec_id") === 0)
      .select(lit(9999L).as("vec_id"), col("embedding"), col("label"))
    val withDup = emb.unionByName(dup)
    val pairs = Similarity.cosineNearDupPairs(withDup, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 9999L)))
  }

  test("substringDupSpans: shared 8-token run is found, spans merge, short docs silent") {
    // docs 0/1 share a 10-token run ("one".."ten") embedded in different
    // contexts → 3 duplicated windows each (starts offset by the prefix),
    // covering 10 positions in 1 merged span; doc 2 is unrelated; doc 3 is
    // shorter than w and must emit nothing even if its text repeats.
    val run = "one two three four five six seven eight nine ten"
    val docs = Seq(
      0L -> s"intro words here $run trailing tail words x",
      1L -> s"$run completely different ending tokens a b c d",
      2L -> "nothing shared with anyone at all in this doc whatsoever truly",
      3L -> "one two three four five"
    ).toDF("doc_id", "text")
    val out = Dedup.substringDupSpans(docs, w = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet == Set(0L, 1L))
    // 10-token run → 3 windows of 8, union = 10 tokens, 1 span, both docs
    assert(out(0L) == ((3L, 10L, 1L)))
    assert(out(1L) == ((3L, 10L, 1L)))
  }

  test("substringDupSpans counts disjoint spans separately") {
    val a = "alpha beta gamma delta epsilon zeta eta theta"   // 8 tokens
    val b = "uno dos tres cuatro cinco seis siete ocho"        // 8 tokens
    val docs = Seq(
      0L -> s"$a filler1 filler2 filler3 $b",
      1L -> s"$a unrelated middle tokens go here now ok $b pad"
    ).toDF("doc_id", "text")
    val out = Dedup.substringDupSpans(docs, w = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // each doc: two exact 8-token windows duplicated, 16 covered, 2 spans
    assert(out(0L) == ((2L, 16L, 2L)) && out(1L) == ((2L, 16L, 2L)))
  }

  test("substringDupSpans: gap == w merges (adjacent coverage), gap == w+1 splits") {
    // pins the interval-arithmetic boundary: consecutive starts at gap w
    // produce ADJACENT coverage (one merged span), gap w+1 leaves a
    // one-token hole (two spans); covered tokens are 16 either way
    val r1 = "a1 a2 a3 a4 a5 a6 a7 a8"
    val r2 = "b1 b2 b3 b4 b5 b6 b7 b8"
    val docs = Seq(
      0L -> s"$r1 $r2",       // starts 1, 9  → gap 8 = w
      1L -> s"$r1 pad $r2"    // starts 1, 10 → gap 9 = w+1
    ).toDF("doc_id", "text")
    val out = Dedup.substringDupSpans(docs, w = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(0L) == ((2L, 16L, 1L)))
    assert(out(1L) == ((2L, 16L, 2L)))
  }

  test("substringDupSpans: 10k-token fully-duplicated doc stays linear and exact") {
    // the old covered-set algebra was O(dup_tokens²) per row — ~10⁸ ops
    // for exactly this shape; the interval form must handle it instantly.
    // All tokens distinct → every one of the 9993 windows is duplicated
    // across the pair, covering all 10000 positions in one merged span.
    val text = (1 to 10000).map(i => s"w$i").mkString(" ")
    val docs = Seq(0L -> text, 1L -> text).toDF("doc_id", "text")
    val out = Dedup.substringDupSpans(docs, w = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(0L) == ((9993L, 10000L, 1L)))
    assert(out(1L) == ((9993L, 10000L, 1L)))
  }

  test("semDeDup removes the prototypical copy, keeps the outlier (tie → lower id)") {
    val emb = embeddings().limit(50)
    val dup = emb.filter(col("vec_id") === 0)
      .select(lit(9999L).as("vec_id"), col("embedding"), col("label"))
    val withDup = emb.unionByName(dup)
    // τ=0.99: only the planted identical pair clears the bar, so exactly
    // one row comes back — the tie on centroid-cosine breaks to keep the
    // lower id, removing 9999
    val removed = Similarity.semDeDup(withDup, cells = 4, iters = 2,
      threshold = 0.99).collect()
    assert(removed.map(_.getLong(0)).toSeq == Seq(9999L))
    assert(removed.head.getDouble(2) == 1.0 && removed.head.getLong(3) == 1L)
  }

  // ---- text analysis ----

  test("langId picks profile languages, 'und' when nothing matches") {
    val df = Seq(
      ("the cat is on the mat and it is happy", "en"),
      ("der hund ist nicht mit der katze", "de"),
      ("le chat est pour la table et je", "fr"),
      ("el perro no es una mesa por su casa", "es"),
      ("zzz qqq www", "und")).toDF("text", "want")
    val got = df.select(TextOps.langId(col("text")).as("got"), col("want")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("tokenCount / bpeTokenCount / qualityScore behave on edges") {
    val df = Seq("", "   ", "one", "a b  c", "hi, there! x9y").toDF("text")
    val rows = df.select(TextOps.tokenCount(col("text")).as("n"),
      TextOps.bpeTokenCount(col("text")).as("b"),
      TextOps.qualityScore(col("text")).as("q")).collect()
    assert(rows.map(_.getAs[Int]("n")).toSeq == Seq(0, 0, 1, 3, 3))
    // "hi, there! x9y" → hi | , | there | ! | x | 9 | y = 7 bpe-ish tokens
    assert(rows.last.getAs[Int]("b") == 7)
    rows.foreach(r => assert(r.getAs[Double]("q") >= 0.0 && r.getAs[Double]("q") <= 1.0))
  }

  test("winnow fingerprint: shared sketch hashes iff overlapping content") {
    val a = TextOps.winnow("the quick brown fox jumps over the lazy dog again and again")
    val b = TextOps.winnow("the quick brown fox jumps over the lazy dog again and again")
    val c = TextOps.winnow("completely different words live here entirely unrelated")
    assert(a == b)
    assert(a.toSet.intersect(c.toSet).isEmpty)
    assert(TextOps.winnow("") == Seq.empty)
  }

  // ---- multimodal ----

  test("multimodal: synthetic media sniff correctly as png/riff, features are unit vectors") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    val media = Multimodal.mediaFromDocs(docs)
    val sniffed = Multimodal.withSniffedMime(media.toDF()).collect()
    sniffed.foreach { r =>
      val kind = r.getAs[String]("kind")
      val mime = r.getAs[String]("sniffed_mime")
      assert(if (kind == "image") mime == "image/png" else mime == "audio/wave",
        s"$kind sniffed as $mime")
    }
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 20)
    feats.foreach { f =>
      assert(f.features.length == 64)
      val n = math.sqrt(f.features.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-4)
    }
  }

  test("multimodal: frame sampling emits n frames per row") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(5)
    val media = Multimodal.mediaFromDocs(docs)
    val frames = Multimodal.frameSampleStub(media, 4)
    assert(frames.count() == 20)
  }

  test("multimodal: REAL PNG/WAV roundtrip — decoded stats equal the seeded formula") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    val media = Multimodal.realMediaFromDocs(docs)
    // real containers: PNG magic / RIFF..WAVE, not our synthetic stubs
    media.collect().foreach { m =>
      if (m.kind == "image")
        assert((m.bytes(0) & 0xff) == 0x89 && m.bytes(1) == 'P')
      else {
        assert(new String(m.bytes.slice(0, 4), "ASCII") == "RIFF")
        assert(new String(m.bytes.slice(8, 12), "ASCII") == "WAVE")
      }
    }
    val feats = Multimodal.mediaFeatures(media).collect()
      .map(r => r.getAs[String]("media_id") -> r).toMap
    val idText = docs.select("doc_id", "text").collect()
      .map(r => (r.get(0).toString, r.getAs[String]("text")))
    assert(feats.size == idText.length)
    idText.foreach { case (id, text) =>
      val rec = Multimodal.recipeOf(id, text)
      val f = feats(id)
      if (rec.isPng) {
        assert(f.getAs[String]("kind") == "image")
        assert(f.getAs[Long]("d1") == rec.width && f.getAs[Long]("d2") == rec.height)
        var sr = 0L; var sg = 0L; var sb = 0L
        for (y <- 0 until rec.height; x <- 0 until rec.width) {
          val rgb = Multimodal.pixelRgb(rec.s, x, y)
          sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
        }
        assert(f.getAs[Long]("s1") == sr && f.getAs[Long]("s2") == sg &&
          f.getAs[Long]("s3") == sb, s"pixel sums diverged for $id")
      } else {
        assert(f.getAs[String]("kind") == "audio")
        assert(f.getAs[Long]("d1") == rec.nSamples)
        assert(f.getAs[Long]("d2") == Multimodal.wavSampleRate)
        val samples = (0 until rec.nSamples).map(Multimodal.sampleAt(rec.s, _))
        assert(f.getAs[Long]("s1") == samples.map(_.toLong).sum)
        assert(f.getAs[Long]("s2") == samples.map(v => math.abs(v).toLong).sum)
        assert(f.getAs[Long]("s3") == 0L)
      }
    }
  }

  test("multimodal: real resize caps the longer edge and stays decodable") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(30)
    val media = Multimodal.realMediaFromDocs(docs)
    val resized = Multimodal.resizeImages(media, maxDim = 10).collect()
    assert(resized.exists(_.kind == "image"))
    resized.filter(_.kind == "image").foreach { m =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.bytes))
      assert(img != null, s"${m.media_id} not decodable after resize")
      assert(math.max(img.getWidth, img.getHeight) <= 10)
      assert(img.getWidth == m.meta.width && img.getHeight == m.meta.height)
    }
    // audio passes through untouched
    val before = media.collect().filter(_.kind == "audio").map(m => m.media_id -> m.bytes.toSeq).toMap
    resized.filter(_.kind == "audio").foreach(m =>
      assert(m.bytes.toSeq == before(m.media_id)))
  }

  // ---- dedup groups (connected components) ----

  /** Driver-side union-find oracle: component-min label per node. */
  private def unionFindLabels(edges: Seq[(String, String)]): Map[String, String] = {
    val parent = scala.collection.mutable.Map.empty[String, String]
    def find(x: String): String = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(if (ra < rb) rb else ra) = if (ra < rb) ra else rb
    }
    parent.keys.map(n => n -> find(n)).toMap
  }

  test("connectedComponents ≡ union-find on seeded random graphs") {
    for ((n, m, seed) <- Seq((40, 25, 1L), (60, 80, 2L), (30, 60, 3L))) {
      val rnd = new scala.util.Random(seed)
      val edges = (0 until m).map { _ =>
        (f"n${rnd.nextInt(n)}%03d", f"n${rnd.nextInt(n)}%03d")
      }.filter(e => e._1 != e._2)
      val want = unionFindLabels(edges)
      val got = Dedup.connectedComponents(
        edges.toDF("a_id", "b_id")).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got == want, s"cc mismatch at n=$n m=$m seed=$seed")
    }
  }

  test("connectedComponents: worst-case chain converges in O(log n) iterations") {
    // a 64-node path is the adversarial diameter case for naive label
    // propagation (64 rounds); the star alternation must finish well
    // inside maxIter=10 ≈ log2(64)+slack and label everything with n000
    val chain = (0 until 63).map(i => (f"n$i%03d", f"n${i + 1}%03d"))
    val got = Dedup.connectedComponents(chain.toDF("a_id", "b_id"), maxIter = 10)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got.size == 64 && got.values.forall(_ == "n000"))
  }

  test("dedupGroups: transitive near-dup cluster keeps one representative, singletons keep themselves") {
    val docs = corpus().select(format_string("d%02d", col("doc_id")).as("doc_id"),
      col("text"))
    val pairs = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5)
    val g = Dedup.dedupGroups(docs, pairs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
    val byId = g.map(t => t._1 -> t).toMap
    // docs 0/1 are exact dupes, 2 a near-dup of 0 ⇒ one group under d00
    assert(byId("d00") == (("d00", "d00", true)))
    assert(byId("d01") == (("d01", "d00", false)))
    assert(byId("d02") == (("d02", "d00", false)))
    // every doc appears exactly once; keep ⇔ own group representative
    assert(g.length == docs.count())
    assert(g.forall { case (id, grp, keep) => keep == (id == grp) })
    // exactly one keeper per group
    g.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.count(_._3) == 1)
    }
  }

  test("canonicalDocs keeps the highest-quality group member, ties to min doc_id") {
    // one 3-doc group where the LAST member has the best quality (longer,
    // stopword-rich, unpunctuated) — the component-min rule would keep a,
    // the canonical rule must keep c; d is a singleton and keeps itself
    val base = "the cat sat on the mat and looked at the dog"
    val docs = Seq(
      ("a", s"$base!!!???;;;,,,..."), // punct-penalized copy
      ("b", s"$base!!!???;;;,,,..."), // exact dup of a
      ("c", s"$base with a friend"), // near-dup, no punct penalty
      ("d", "unrelated text entirely different words zebra quark")
    ).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.3)
    val groups = Dedup.dedupGroups(docs, pairs)
    val got = Dedup.canonicalDocs(docs, groups).collect()
      .map(r => r.getString(0) ->
        ((r.getString(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(got("a")._1 == "c" && !got("a")._3)
    assert(got("b") == (("c", 3L, false)))
    assert(got("c") == (("c", 3L, true)))
    assert(got("d") == (("d", 1L, true)))
    // exact-dup TIE inside a group resolves to the min doc_id
    val tied = Seq("x" -> "same words here", "y" -> "same words here")
      .toDF("doc_id", "text")
    val tp = Dedup.ngramJaccardPairs(tied, n = 3, threshold = 0.5)
    val tg = Dedup.canonicalDocs(tied, Dedup.dedupGroups(tied, tp)).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(tg == Map("x" -> "x", "y" -> "x"))
  }

  test("incrementalDedup: planted exact/near/new classify correctly; exact wins precedence") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val archive = Seq(
      (10L, base),                      // exact+near anchor
      (11L, s"$base " + base),          // another archive doc
      (12L, "completely different archive content about ships and sails"),
      (13L, base)                       // second exact anchor — min id must win
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (100L, base),                       // exact dup of 10 AND 13 → exact, match 10
      (101L, s"THE  quick brown fox jumps over the lazy dog again and again "), // normalizes to base → exact
      (102L, s"$base also"),              // near dup (high shingle overlap)
      (103L, "totally novel incoming text with fresh tokens zebra")
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalDedup(archive, incoming, n = 3, threshold = 0.5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3)))).toMap
    assert(got(100L)._1 == "exact" && got(100L)._2 == 10L && got(100L)._3 == -1.0,
      s"exact tier must pick the MIN archive id with null jaccard: ${got(100L)}")
    assert(got(101L)._1 == "exact" && got(101L)._2 == 10L,
      "whitespace/case differences normalize into the same fingerprint")
    assert(got(102L)._1 == "near" && got(102L)._2 == 10L && got(102L)._3 >= 0.5,
      s"near tier must report the best archive match + jaccard: ${got(102L)}")
    assert(got(103L) == (("new", -1L, -1.0)))
    // scale shape: the incoming fingerprint dim broadcasts (the archive
    // streams); nothing broadcasts the archive side
    val plan = Dedup.incrementalDedup(archive, incoming)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"exact tier lost its map-side broadcast join:\n$plan")
    // size-gated fallback: broadcastIncoming=false returns identical
    // rows through a shuffled exact tier (the Corpus maybeBroadcast
    // discipline — a 10^9-doc slice must not be forced into a broadcast)
    val gotShuffled = Dedup.incrementalDedup(archive, incoming, n = 3,
        threshold = 0.5, broadcastIncoming = false)
      .collect().map(_.toString).sorted.toSeq
    val gotHinted = Dedup.incrementalDedup(archive, incoming, n = 3,
        threshold = 0.5)
      .collect().map(_.toString).sorted.toSeq
    assert(gotShuffled == gotHinted)
  }

  test("jaccard pairs: COMPLETE recall vs brute force on randomized skewed corpora") {
    // regression for the round-5 count-filter bug (caught by the sf0.1
    // sweep): a candidate-filter bound must hold when a shared token is
    // prefix-side in one doc and suffix-side in the other. Randomized
    // docs over a Zipf-ish vocabulary at two thresholds, pair sets
    // compared against an exact driver-side brute force.
    for ((seed, t) <- Seq((11L, 0.5), (12L, 0.8), (13L, 0.7))) {
      val rnd = new scala.util.Random(seed)
      val vocab = (0 until 120).map(v => s"w$v")
      def draw(): String = { // Zipf-ish: low ids much likelier
        val z = math.min(vocab.size - 1, (math.pow(rnd.nextDouble(), 2.5) * vocab.size).toInt)
        vocab(z)
      }
      val docs = (0 until 60).map { i =>
        val base = (0 until 12 + rnd.nextInt(20)).map(_ => draw())
        (f"d$i%03d", base.mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val got = Dedup.ngramJaccardPairs(df, n = 2, threshold = t)
        .select("a_id", "b_id").collect().map(r => (r.getString(0), r.getString(1))).toSet
      // brute force over the same shingle definition
      def shingles(s: String): Set[String] =
        s.split(" ").filter(_.nonEmpty).sliding(2).filter(_.length == 2)
          .map(_.mkString(" ")).toSet
      val sh = docs.map { case (id, s) => id -> shingles(s) }.toMap
      val want = (for {
        (a, i) <- docs.map(_._1).zipWithIndex
        b <- docs.map(_._1).drop(i + 1)
        inter = sh(a).intersect(sh(b)).size
        uni = sh(a).union(sh(b)).size
        if uni > 0 && BigDecimal(inter.toDouble / uni)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble >= t
      } yield (a, b)).toSet
      assert(got == want,
        s"seed=$seed t=$t missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
  }

  test("incremental dedup: indexed path ≡ recompute path, and the index reuses across slices") {
    // real corpus + the q60 snapshot split so the equivalence covers the
    // graded query's exact shape (archive 80% / slice 20%)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("string").as("doc_id"), col("text"))
    val snap = conv(substring(md5(concat(lit("snap:"), col("doc_id"))), 1, 15), 16, 10)
      .cast("long") % 5
    val archive = docs.filter(snap =!= 0)
    val index = Dedup.buildArchiveIndex(archive, n = 3, threshold = 0.8)
    try {
      for (sliceId <- Seq(0L, 1L)) { // second slice re-probes the SAME index
        val incoming = docs.filter(snap === sliceId)
        val viaIndex = Dedup.incrementalDedupIndexed(index, incoming)
          .collect().map(_.toString).sorted.toSeq
        val recompute = Dedup.incrementalDedup(archive, incoming)
          .collect().map(_.toString).sorted.toSeq
        assert(viaIndex == recompute, s"paths diverged on slice $sliceId")
        assert(viaIndex.nonEmpty)
      }
      // frozen-order recall edge: an incoming doc whose tokens are all
      // ABSENT from the archive (f=0 everywhere) must still classify (new)
      // and a near-dup of an archive doc must still be found at t=0.5
      val idx2 = Dedup.buildArchiveIndex(
        Seq(("a1", "the quick brown fox jumps over the lazy dog again and again"))
          .toDF("doc_id", "text"), n = 3, threshold = 0.5)
      try {
        val got = Dedup.incrementalDedupIndexed(idx2,
          Seq(("i1", "the quick brown fox jumps over the lazy dog again and again also"),
              ("i2", "entirely novel vocabulary zebra quartz umbrella nimbus")
          ).toDF("doc_id", "text"))
          .collect().map(r => r.getString(0) -> r.getString(1)).toMap
        assert(got == Map("i1" -> "near", "i2" -> "new"), got.toString)
      } finally idx2.unpersist()
    } finally index.unpersist()
  }
}
