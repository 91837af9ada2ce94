package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 interleaved A/B probe (guide §1): the sandbox host's
  * throughput swings 2-4x between minutes, so separate-run A/B is
  * unusable — this main times variant pairs ALTERNATELY in one JVM
  * (A,B,A,B,...) so both see the same noise windows, and reports
  * per-pair minima. Variant A is the SHIPPED query builder
  * (SparkEntry.queries); variant B is the candidate/reference shape
  * built inline. Session config mirrors Bench.session exactly
  * (see BenchExtra).
  *
  * Usage: runMain graft.tools.AbProbe <sfDir> <case1,case2,...|all> [reps=4]
  */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 2) args(2).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-ab-probe-$cpus")
      .config("spark.sql.shuffle.partitions", (4 * cpus).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (16 * 1024 * 1024).toString)
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.hadoop.parquet.compression.codec.zstd.level", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String): DataFrame = spark.read.parquet(s"$sfDir/$name.parquet")

    // variant B builders: the pre-round-6 reference shape per query
    val refs: Map[String, () => DataFrame] = Map(
      "q35_decontaminate" -> (() => {
        val docs = t("documents")
        graft.operators.Corpus.decontaminate(
          docs.filter(col("doc_id") % 10 =!= 7),
          docs.filter(col("doc_id") % 10 === 7), n = 8).orderBy("doc_id")
      }),
      "q37_tfidf_topk" -> (() => {
        val docs = t("documents")
        graft.operators.Corpus.tfidfTopK(docs, k = 3, nDocs = docs.count())
          .withColumn("rk", col("rk").cast("long"))
          .orderBy("doc_id", "rk")
      }),
      "q41_sentence_dedup" -> (() =>
        graft.operators.Clean.sentenceDedup(t("documents"), chunk = 10)
          .orderBy("doc_id")),
      "q44_dsir_sample" -> (() => {
        val docs = t("documents")
        graft.operators.Corpus.dsirSample(
          raw = docs.filter(col("source") =!= "src0"),
          target = docs.filter(col("source") === "src0"),
          k = 200).orderBy("doc_id")
      }),
      "q47_lm_perplexity" -> (() =>
        graft.operators.Corpus.lmPerplexity(t("documents")).orderBy("doc_id")),
      "q51_hll_distinct" -> (() =>
        graft.operators.Sketches.hllDistinct(t("events"), col("user_id"),
          Seq("event_type")).orderBy("event_type")),
      "q21_token_stats" -> (() =>
        t("documents").select(col("doc_id"),
          graft.operators.TextOps.tokenCount(col("text")).cast("long").as("n_tok"),
          graft.operators.TextOps.bpeTokenCount(col("text")).cast("long").as("n_bpe"))
          .orderBy("doc_id")),
      "q23_quality" -> (() =>
        t("documents").select(col("doc_id"),
          graft.operators.TextOps.qualityScore(col("text")).as("quality"))
          .orderBy("doc_id")),
      "q38_span_seq" -> (() =>
        graft.operators.Spans.spanSeqStats(
          graft.operators.Spans.spansFromDocs(t("documents"))).orderBy("doc_id")),
      "q42_seq_packing" -> (() =>
        graft.operators.Corpus.packSequences(t("documents"), cap = 512)
          .orderBy("doc_id")),
      "q55_quality_classifier" -> (() =>
        graft.operators.Corpus.qualityClassifier(t("documents")).orderBy("doc_id")),
      "q08_chain_selfjoin" -> (() => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
        t("lineitem")
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
      // ---- the un-fanned (plain t) reference shapes for every tpar/pin
      // decision still open: the shingle family, the 13 round-6 winners,
      // and the q30/q45/q62 entry pins ----
      "q24_jaccard_pairs" -> (() =>
        graft.operators.Dedup.ngramJaccardPairs(t("documents"), n = 3,
          threshold = 0.5).orderBy("a_id", "b_id")),
      "q33_dedup_groups" -> (() => {
        val docs = t("documents")
        val pairs = graft.operators.Dedup.ngramJaccardPairs(docs, n = 3,
          threshold = 0.5)
        graft.operators.Dedup.dedupGroups(docs, pairs).orderBy("doc_id")
      }),
      "q48_canonical_docs" -> (() => {
        val docs = t("documents")
        val pairs = graft.operators.Dedup.ngramJaccardPairs(docs, n = 3,
          threshold = 0.5)
        graft.operators.Dedup.canonicalDocs(docs,
          graft.operators.Dedup.dedupGroups(docs, pairs)).orderBy("doc_id")
      }),
      "q46_substring_dup" -> (() =>
        graft.operators.Dedup.substringDupSpans(t("documents"), w = 8)
          .orderBy("doc_id")),
      "q60_incremental_dedup" -> (() => {
        val docs = t("documents")
        val snap = conv(substring(md5(concat(lit("snap:"),
          col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long") % 5
        val index = graft.operators.Dedup.buildArchiveIndex(docs.filter(snap =!= 0))
        graft.operators.Dedup.incrementalDedupIndexed(index,
          incoming = docs.filter(snap === 0)).orderBy("doc_id")
      }),
      "q07_events_json" -> (() =>
        t("events")
          .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
          .groupBy("event_type")
          .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("cnt"),
            max(col("event_id")).as("hwm"))
          .orderBy("event_type")),
      "q22_langid" -> (() =>
        t("documents")
          .select(graft.operators.TextOps.langId(col("text")).as("lang"))
          .groupBy("lang").agg(count(lit(1)).as("cnt"))
          .orderBy("lang")),
      "q25_minhash_pairs" -> (() =>
        graft.operators.Dedup.minhashLshPairs(t("documents"), n = 3,
          threshold = 0.8).orderBy("a_id", "b_id")),
      "q28_simhash_pairs" -> (() =>
        graft.operators.Dedup.simhashPairs(t("documents"), maxHamming = 3)
          .withColumn("hamming", col("hamming").cast("long"))
          .orderBy("a_id", "b_id")),
      "q31_winnow_fingerprint" -> (() => {
        import spark.implicits._
        t("documents").select(col("doc_id"), col("text"))
          .as[(Long, String)]
          .flatMap { case (id, text) =>
            graft.operators.TextOps.winnow(text).map(fp => (id, fp)) }
          .toDF("doc_id", "fp")
          .orderBy("doc_id", "fp")
      }),
      "q32_media_features" -> (() => {
        import graft.operators.Multimodal
        val media = Multimodal.mediaFromDocs(t("documents"))
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
      "q34_repetition_stats" -> (() =>
        graft.operators.Corpus.repetitionStats(t("documents"), maxFrac = 0.2)
          .orderBy("doc_id")),
      "q39_line_filter" -> (() =>
        graft.operators.Clean.lineFilter(t("documents"), chunk = 12,
          minWords = 5).orderBy("doc_id")),
      "q40_pii_scrub" -> (() =>
        graft.operators.Clean.piiScrub(
          graft.operators.Clean.withSyntheticPii(t("documents")))
          .orderBy("doc_id")),
      "q52_cms_heavy_hitters" -> (() =>
        graft.operators.Sketches.countMinHeavyHitters(t("documents"))),
      "q53_quantized_topk" -> (() => {
        val emb = t("embeddings")
        graft.operators.Similarity.quantizedTopK(emb,
          emb.filter(col("vec_id") < 20), 5).orderBy("q_id", "rk")
      }),
      "q56_pq_topk" -> (() => {
        val emb = t("embeddings")
        graft.operators.Similarity.pqTopK(emb,
          emb.filter(col("vec_id") < 10), 5).orderBy("q_id", "rk")
      }),
      "q58_chunking" -> (() =>
        graft.operators.Corpus.chunkSequences(t("documents"), size = 24,
          stride = 16).orderBy("doc_id", "chunk_idx")),
      "q62_real_media_features" -> (() =>
        graft.operators.Multimodal.mediaFeatures(
          graft.operators.Multimodal.realMediaFromDocs(t("documents")))
          .orderBy("media_id")),
      "q30_ivf_topk" -> (() => {
        val emb = t("embeddings")
        val centroids = graft.operators.Similarity.kmeansCentroids(emb,
          cells = 16, iters = 4)
        val assigned = graft.operators.Similarity.ivfAssign(emb, centroids)
        graft.operators.Similarity.ivfTopK(assigned, centroids,
          emb.filter(col("vec_id") < 20), k = 5, nprobe = 4)
          .orderBy("q_id", "rk")
      }),
      "q45_semdedup" -> (() =>
        graft.operators.Similarity.semDeDup(t("embeddings"),
          cells = 16, iters = 4, threshold = 0.35).orderBy("vec_id")),
      // faithful reconstruction of the ROUND-5 k-means assignment
      // (crossJoin(broadcast) + packed-argmax groupBy per Lloyd iteration
      // + broadcast re-join in ivfTopK's probe feed) so the round-6
      // literal-matrix form can be interleave-A/B'd against it
      "q30_ivf_topk#oldassign" -> (() => {
        graft.functions.GraftExpressions.register(spark)
        import spark.implicits._
        val emb = t("embeddings")
        val K = 1L << 21
        def cos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
          call_function("cosine_sim", a, b)
        def oldNearest(points: DataFrame, cDf: DataFrame): DataFrame =
          points.crossJoin(broadcast(cDf))
            .withColumn("d", round(cos(col("embedding"), col("cell_emb")), 12))
            .withColumn("mk",
              round(col("d") * lit(1e12)).cast("long") * lit(K) - col("cell_id"))
            .groupBy(col("vec_id"), col("embedding"))
            .agg(max(col("mk")).as("mk"))
            .select(col("vec_id"), col("embedding"),
              pmod(-col("mk"), lit(K)).cast("int").as("cell_id"))
        var centers: Map[Int, Seq[Float]] =
          graft.operators.Similarity.kmeansInit(emb, 16, 42L)
            .as[(Int, Seq[Float])].collect().toMap
        (1 to 4).foreach { _ =>
          val cDf = centers.toSeq.sortBy(_._1).toDF("cell_id", "cell_emb")
          val updated = oldNearest(emb, cDf)
            .select(col("cell_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
            .groupBy(col("cell_id"), col("pos")).agg(avg(col("v").cast("double")).as("m"))
            .collect()
            .groupBy(_.getInt(0))
            .map { case (cid, rs) =>
              cid -> rs.sortBy(_.getInt(1)).map(_.getDouble(2).toFloat).toSeq }
          centers = centers.map { case (id, e) => id -> updated.getOrElse(id, e) }
        }
        val cDf = centers.toSeq.sortBy(_._1).toDF("cell_id", "cell_emb")
        val assigned = oldNearest(emb, cDf)
        graft.operators.Similarity.ivfTopK(assigned, cDf,
          emb.filter(col("vec_id") < 20), k = 5, nprobe = 4)
          .orderBy("q_id", "rk")
      }),
      // CANDIDATE (B): LAZY persist of the doubly-derived intermediate
      // streams (no barrier — unlike the rejected eager pins); inline
      // copies of the operator bodies with one .persist() added
      "q47_lm_perplexity#bgpersist" -> (() => {
        import graft.operators.TextOps
        val docs = t("documents")
        val bg = docs.select(col("doc_id"),
          explode(element_at(transform(array(TextOps.tokens(col("text"))), tk =>
            when(size(tk) >= 2,
              transform(sequence(lit(1), size(tk) - 1),
                i => concat_ws(" ", slice(tk, i, lit(2)))))
              .otherwise(expr("array()").cast("array<string>"))), 1)).as("bg"))
          .persist()
        val bgDim = bg.groupBy("bg").agg(count(lit(1)).as("c"))
          .withColumn("prev", element_at(split(col("bg"), " ", 2), 1))
        val ctxDim = bgDim.groupBy("prev").agg(sum("c").as("ctx"))
        val vocab = docs
          .select(explode(TextOps.tokens(col("text"))).as("token"))
          .agg(countDistinct(col("token")).as("v"))
        val lpDim = bgDim.join(ctxDim, Seq("prev")).crossJoin(broadcast(vocab))
          .select(col("bg"),
            round(lit(1e6) *
              log((col("c") + 1).cast("double") / (col("ctx") + col("v"))))
              .cast("long").as("lp_micro"))
        val perDoc = bg.groupBy("doc_id", "bg").agg(count(lit(1)).as("cnt"))
          .join(broadcast(lpDim), Seq("bg"))
          .groupBy("doc_id").agg(
            sum("cnt").as("n_bigrams"),
            sum(col("cnt") * col("lp_micro")).as("ll_micro"))
        docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
            coalesce(col("ll_micro"), lit(0L)).as("ll_micro"),
            round(exp(-col("ll_micro").cast("double") / lit(1e6) /
              col("n_bigrams")), 6).as("ppl"))
          .orderBy("doc_id")
      }),
      "q37_tfidf_topk#tfpersist" -> (() => {
        import org.apache.spark.sql.expressions.Window
        import graft.operators.TextOps
        val docs = t("documents")
        val nDocs = docs.count()
        val tf = docs
          .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
          .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
          .persist()
        val dfDim = tf.groupBy("token").agg(count(lit(1)).as("df"))
        val scored = tf.join(broadcast(dfDim), Seq("token"))
          .withColumn("score",
            round(col("tf") * log(lit(nDocs.toDouble) / col("df")), 6))
          .filter(col("score") > 0)
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("token"))
        scored.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select("doc_id", "token", "tf", "df", "score", "rk")
          .withColumn("rk", col("rk").cast("long"))
          .orderBy("doc_id", "rk")
      }),
      // CANDIDATE (B): ngramJaccardPairs WITHOUT the prep persist — the
      // q37 probe showed an intermediate persist can cost 3x at this
      // scale; check whether the PPJoin's cached shingle table still
      // earns its keep (it feeds 4 subtrees)
      "q24_jaccard_pairs#nopersist" -> (() => {
        graft.functions.GraftExpressions.register(spark)
        import graft.operators.{Dedup, TextOps}
        val threshold = 0.5
        val prep = t("documents").select(col("doc_id"),
          Dedup.shingleArr(col("text"), 3).as("sh"))
        val toks = prep
          .select(col("doc_id"), size(col("sh")).as("sz"), explode(col("sh")).as("s"))
          .withColumn("h", xxhash64(col("s")))
        val freq = toks.groupBy("h").agg(count(lit(1)).as("f"))
        val prefixToks = toks
          .join(freq, Seq("h"))
          .withColumn("r", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
              .orderBy(col("f"), col("h"), col("s"))))
          .filter(col("r") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
          .select("doc_id", "sz", "h", "r")
        val l = prefixToks.select(col("h"), col("doc_id").as("a_id"),
          col("sz").as("a_sz"), col("r").as("ra"))
        val r = prefixToks.select(col("h"), col("doc_id").as("b_id"),
          col("sz").as("b_sz"), col("r").as("rb"))
        val candIds = l.join(r, Seq("h"))
          .filter(col("a_id") < col("b_id") &&
            col("b_sz") >= lit(threshold) * col("a_sz") &&
            col("a_sz") >= lit(threshold) * col("b_sz"))
          .groupBy("a_id", "b_id", "a_sz", "b_sz")
          .agg(min(col("ra")).as("mra"), min(col("rb")).as("mrb"))
          .filter(least(col("a_sz") - col("mra"), col("b_sz") - col("mrb")) + 1 >=
            ceil(lit(threshold / (1 + threshold)) * (col("a_sz") + col("b_sz")) - lit(1e-6)))
          .select("a_id", "b_id")
        val aArr = prep.select(col("doc_id").as("a_id"), col("sh").as("sh_a"))
        val bArr = prep.select(col("doc_id").as("b_id"), col("sh").as("sh_b"))
        candIds
          .join(aArr, Seq("a_id"))
          .join(bArr, Seq("b_id"))
          .withColumn("jaccard", round(Dedup.jaccard(col("sh_a"), col("sh_b")), 6))
          .filter(col("jaccard") >= threshold)
          .select("a_id", "b_id", "jaccard")
          .orderBy("a_id", "b_id")
      }),
      // CANDIDATE (B = fanned scan) probes for the two sign-LSH queries
      // that never got the tpar treatment — per-row bucket hashing is
      // tables×planes×dim heavy, but the corpus derives 2x (l/r sides)
      "q27_embed_neardup#tpar" -> (() =>
        graft.operators.Similarity.cosineNearDupPairs(
          t("embeddings").repartition(spark.sparkContext.defaultParallelism),
          threshold = 0.8, tables = 12, planesPerTable = 10, md5Planes = true)
          .orderBy("a_id", "b_id")),
      "q29_ann_topk#tpar" -> (() => {
        val emb = t("embeddings").repartition(spark.sparkContext.defaultParallelism)
        graft.operators.Similarity.annTopK(emb, emb.filter(col("vec_id") < 20), 5,
          tables = 32, planesPerTable = 5, md5Planes = true)
          .orderBy("q_id", "rk")
      }),
      // reconstruction of the ROUND-5 q08 self-join shape (two scans,
      // both sides shuffled on the join key, then a per-order aggregate)
      "q08_chain_selfjoin#oldselfjoin" -> (() => {
        val a = t("lineitem").select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"))
        val b = t("lineitem").select(col("l_orderkey").as("o2"),
          col("l_linenumber").as("ln2"), col("l_quantity").as("q2"))
        a.join(b, col("l_orderkey") === col("o2") &&
            col("ln2") === col("l_linenumber") + 1)
          .groupBy("l_orderkey")
          .agg(count(lit(1)).as("chain_pairs"),
            round(sum(col("q2")), 2).as("next_qty_sum"))
          .orderBy("l_orderkey")
      }))

    val names: Seq[String] =
      if (args.length < 2 || args(1) == "all") refs.keys.toSeq.sorted
      else args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    // GRAFT_AB_EXPLAIN_DIR: dump <case>_A.txt / <case>_B.txt formatted
    // plans (A = shipped, B = reference/old shape) instead of timing —
    // the source for plans/r06 *_after / *_before captures
    val explainDir = sys.env.get("GRAFT_AB_EXPLAIN_DIR")
    explainDir.foreach(d => new java.io.File(d).mkdirs())
    names.foreach { name =>
      // "qNN_name#variant" cases pit the SHIPPED qNN builder (A) against a
      // named reconstruction (B); plain cases use the same key for both
      val aName = name.split('#').head
      val a = graft.SparkEntry.queries.getOrElse(aName, sys.error(s"unknown $aName"))
      val b = refs.getOrElse(name, sys.error(s"no reference shape for $name"))
      if (explainDir.isDefined) {
        val d = explainDir.get
        val base = name.replace('#', '_')
        Seq("A" -> (() => a(spark, sfDir)), "B" -> (() => b())).foreach {
          case (tag, build) =>
            spark.catalog.clearCache()
            val plan = build().queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(s"$d/${base}_$tag.txt"), plan)
        }
        spark.catalog.clearCache()
      } else {
      // call-by-name: the BUILDER runs inside the timed window (several
      // query builders run driver-loop actions eagerly — CC iterations,
      // Lloyd collects, eager pins — exactly like the frozen Bench, which
      // also invokes the builder after t0)
      def time(build: => DataFrame): Double = {
        val t0 = System.nanoTime()
        build.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val as = collection.mutable.ArrayBuffer.empty[Double]
      val bs = collection.mutable.ArrayBuffer.empty[Double]
      (1 to reps).foreach { i =>
        // alternate order per rep so JIT/window drift hits both sides
        val order: Seq[(String, () => Double)] =
          if (i % 2 == 1) Seq("A" -> (() => time(a(spark, sfDir))), "B" -> (() => time(b())))
          else Seq("B" -> (() => time(b())), "A" -> (() => time(a(spark, sfDir))))
        order.foreach { case (tag, run) =>
          spark.catalog.clearCache()
          spark.sparkContext.setJobDescription(s"$name:$tag")
          val v = run()
          if (tag == "A") as += v else bs += v
        }
      }
      spark.sparkContext.setJobDescription(null)
      val wins = as.zip(bs).count { case (x, y) => x < y }
      println(f"[ab] $name A_min=${as.min}%.2f B_min=${bs.min}%.2f " +
        f"pairwins=$wins/${reps} A=[${as.map(x => f"$x%.2f").mkString(",")}] " +
        f"B=[${bs.map(x => f"$x%.2f").mkString(",")}]")
      }
    }
    spark.stop()
  }
}
