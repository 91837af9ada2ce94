package graft.streaming

import graft.functions.UrlFns
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Per-host politeness token buckets + robots allow-list, as a stateful
 * streaming stage (`groupByKey(host).flatMapGroupsWithState`) — the north
 * rule's generalization of kraaler's 1-in-flight ready-token loop
 * (/root/reference/worker.go:1238-1253). kraaler has no robots.txt handling
 * (the Chromium fetch just navigates, worker.go:580-584); the rule set here
 * is the engine's own, fed by the deterministic synthetic web.
 *
 * State is keyed by HOST (not host-bucket) because a token bucket is a
 * per-host invariant; memory stays bounded because only hosts seen in the
 * current stream epoch hold state, and [[PolitenessState]] is ~32 bytes.
 * At 10^8 hosts, key-state shards across executors by the groupByKey
 * shuffle — the same exchange the frontier already pays.
 */
object Politeness {

  /** Candidate URL entering the throttle, with its round and priority. */
  case class Candidate(url: String, host: String, round: Long, prio: Long)

  /** Token bucket per host: `tokens` available, `lastRound` of refill. */
  case class PolitenessState(tokens: Double, lastRound: Long)

  /**
   * Token-bucket throttle: each host earns `ratePerRound` fetch slots per
   * round (capped at `burst`); candidates beyond the budget are dropped
   * this epoch (they stay in the frontier — pop re-offers them next round).
   * Deterministic: candidates are admitted in (prio, url) order.
   */
  def throttle(ds: Dataset[Candidate], ratePerRound: Double, burst: Double)(
      implicit dummy: DummyImplicit): Dataset[Candidate] = {
    implicit val stateEnc = Encoders.product[PolitenessState]
    implicit val candEnc = Encoders.product[Candidate]
    implicit val strEnc = Encoders.STRING
    ds.groupByKey(_.host)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (host: String, it: Iterator[Candidate], state: GroupState[PolitenessState]) =>
          val cands = it.toArray.sortBy(c => (c.prio, c.url))
          if (cands.isEmpty) Iterator.empty
          else {
            val round = cands.map(_.round).max
            val st = state.getOption.getOrElse(PolitenessState(burst, round - 1))
            val refilled = math.min(burst,
              st.tokens + math.max(0L, round - st.lastRound) * ratePerRound)
            val admit = math.floor(refilled).toInt
            val out = cands.take(admit)
            state.update(PolitenessState(refilled - out.length, round))
            out.iterator
          }
      }
  }

  /** Robots pre-filter: drop candidates whose path matches a disallowed
    * prefix for their host (rules from [[UrlFns.robotsDisallow]]). Pure
    * narrow filter — composes before the throttle. */
  def robotsFilter(ds: Dataset[Candidate]): Dataset[Candidate] =
    ds.filter((c: Candidate) => UrlFns.robotsAllowed(c.url))

  /**
   * Per-host admitted counts collected AS A SIDE OUTPUT of the fused pop
   * walker (an accumulator keyed by partitionId), replacing the separate
   * `cached.groupBy(host).agg(...)` job the gated round used to pay at
   * the round head's shadow — a full scan of the popped cache plus a
   * shuffle, measured 5-7 s/round at local[32] once the delta-pool commit
   * stopped masking it. Keyed by partition so cache rebuilds, task
   * retries, and speculative attempts stay idempotent: a partition's map
   * is deterministic, and re-adding it OVERWRITES rather than
   * double-counts. Every host with a heap-surviving row appears (count 0
   * if all its offers were rejected) — exactly the host set the groupBy
   * produced, so the downstream refill algebra writes identical state.
   */
  /** The accumulator's value holder. The cheap [[toString]] is
    * LOAD-BEARING: Spark's AppStatusListener stringifies every named
    * accumulator's merged value ON EVERY TASK END and retains the string
    * per task — a raw 60k-host map of maps OOM'd the driver through
    * `LiveEntityHelpers.accuValuetoString` (measured). */
  final class AdmittedCounts extends Serializable {
    val byPartition =
      new java.util.HashMap[Integer, java.util.HashMap[String, java.lang.Long]]()
    override def toString: String = s"admitted-counts(${byPartition.size} partitions)"
    /** Flatten across partitions (each host lives in exactly one bucket
      * partition; summing is robustness, not semantics). */
    def flattened: java.util.HashMap[String, java.lang.Long] = {
      val flat = new java.util.HashMap[String, java.lang.Long]()
      byPartition.values.forEach(pm => pm.forEach((h, c) =>
        flat.merge(h, c, (a, b) => java.lang.Long.valueOf(a.longValue() + b.longValue()))))
      flat
    }
  }

  final class AdmittedCountsAcc extends org.apache.spark.util.AccumulatorV2[
      (Int, java.util.HashMap[String, java.lang.Long]), AdmittedCounts] {
    private val v = new AdmittedCounts
    override def isZero: Boolean = v.byPartition.isEmpty
    override def copy(): AdmittedCountsAcc = {
      val c = new AdmittedCountsAcc
      v.byPartition.forEach((k, m) => c.v.byPartition.put(k, new java.util.HashMap(m)))
      c
    }
    override def reset(): Unit = v.byPartition.clear()
    override def add(x: (Int, java.util.HashMap[String, java.lang.Long])): Unit =
      v.byPartition.put(x._1, x._2)
    override def merge(other: org.apache.spark.util.AccumulatorV2[
        (Int, java.util.HashMap[String, java.lang.Long]), AdmittedCounts]): Unit =
      other.value.byPartition.forEach((k, m) => v.byPartition.put(k, m))
    override def value: AdmittedCounts = v
    def flattened: java.util.HashMap[String, java.lang.Long] = v.flattened
  }

  /**
   * Driver-side politeness-state parquet writer (schema host/tokens/
   * last_round, one file, uncompressed, fixed name): the state table is
   * O(hosts) rows the DRIVER already holds, and writing it through a
   * 1-task Spark job queued the task behind whatever stage was running —
   * seconds of wall for ~2 MB of bytes. Deterministic bytes (host-sorted
   * input, fixed writer config) keep torn-round replay byte-identical.
   *
   * Filesystem note: the dir clear uses java.nio (local/NFS paths only —
   * the same assumption IcebergishTable's manifest writes make), but the
   * parquet writer resolves through the active session's Hadoop conf so
   * spark.hadoop.* tuning applies like every other writer's.
   */
  def writeStateParquet(dir: String, rows: Array[(String, Double, Long)]): Unit = {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.hadoop.metadata.CompressionCodecName
    import org.apache.parquet.schema.MessageTypeParser
    val d = java.nio.file.Paths.get(dir)
    // overwrite semantics: clear any previous (possibly torn) round dir
    if (java.nio.file.Files.exists(d)) {
      val s = java.nio.file.Files.walk(d)
      try {
        val files = s.sorted(java.util.Comparator.reverseOrder())
          .toArray(new Array[java.nio.file.Path](_))
        files.foreach(java.nio.file.Files.deleteIfExists(_))
      } finally s.close()
    }
    java.nio.file.Files.createDirectories(d)
    val schema = MessageTypeParser.parseMessageType(
      "message politeness { required binary host (UTF8); " +
        "required double tokens; required int64 last_round; }")
    val w = ExampleParquetWriter.builder(
        new org.apache.hadoop.fs.Path(s"$dir/part-00000.parquet"))
      .withConf(org.apache.spark.sql.SparkSession.getActiveSession
        .map(_.sessionState.newHadoopConf())
        .getOrElse(new org.apache.hadoop.conf.Configuration()))
      .withType(schema)
      .withCompressionCodec(CompressionCodecName.UNCOMPRESSED)
      .build()
    val f = new SimpleGroupFactory(schema)
    try rows.foreach { case (h, t, lr) =>
      val g = f.newGroup()
      g.append("host", h); g.append("tokens", t); g.append("last_round", lr)
      w.write(g)
    } finally w.close()
  }

  /** Empty (host, tokens, last_round) state frame for [[throttleRound]]. */
  def emptyState(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("host", StringType, nullable = false),
        StructField("tokens", DoubleType, nullable = false),
        StructField("last_round", LongType, nullable = false))))
  }

  /**
   * The SAME token-bucket semantics as [[throttle]], for the micro-batch
   * crawler: state rides a tiny `(host, tokens, last_round)` table instead
   * of GroupState (so it survives round replay and resume — the batch
   * analogue of a streaming checkpoint). Per round each host refills
   * `ratePerRound` (capped at `burst`) lazily since its last appearance,
   * admits `floor(tokens)` of its popped rows in deterministic
   * (depth, discovered_at, url) priority order, and keeps the remainder
   * queued in the frontier (they were never marked visited).
   *
   * Scale: `popped` is budget-bounded (O(round), not O(frontier)) and the
   * state table holds only hosts ever popped — both shuffle on `host`, the
   * key the pop stage already clustered by.
   *
   * @return (admitted rows of `popped`, next round's full state table)
   */
  /** A popped row entering the batch throttle (the pop stage's schema). */
  case class PopEntry(url: String, host: String, host_bucket: Int,
      depth: Int, discovered_at: Long)

  /** [[PopEntry]] plus its admission verdict — the one-pass flag form. */
  case class FlaggedEntry(url: String, host: String, host_bucket: Int,
      depth: Int, discovered_at: Long, admit: Boolean)

  /**
   * Flag every popped row with its admission verdict — ONE pass, no row
   * dropped. The caller caches THIS frame once and derives everything
   * from it: `admitted = flagged.filter('admit)`, offered/admitted counts
   * in one aggregate job, and [[nextState]]. (The round-2 tuple form made
   * the crawler materialize popped AND admitted as two ~round-sized
   * caches plus a separate offered-count job.)
   *
   * Admission is a PER-HOST decision and the pop output is already
   * host-clustered (bucket files cluster by hash(host)) — so the verdict
   * is computed PARTITION-LOCALLY against a broadcast state map instead
   * of the round-2 window form, which shuffled and sorted the ENTIRE
   * popped set on host every round (measured: the window + its
   * re-execution by the state-write job added ~+75% round wall at
   * local[32], collapsing the politeness-gated scaling pairs to
   * 0.27-0.41 vs 0.51-0.61 ungated). The state is O(hosts-ever-popped)
   * (~32 B/host); beyond `broadcastStateMax` hosts it falls back to
   * [[flagAdmissionsWindow]] — at that scale the popped set is enormous
   * too and the relative window cost shrinks.
   */
  /** Collect the per-host state table into a driver map, or None past
    * `max` hosts (callers fall back to [[flagAdmissionsWindow]] — at that
    * scale the popped set is enormous too and the window's relative cost
    * shrinks). Shared by [[flagAdmissions]] and the fused sorted-pop path
    * ([[graft.frontier.Frontier.popSortedFifoFlagged]]) so the state
    * parquet is read and collected exactly once per round. */
  def stateMapOf(state: org.apache.spark.sql.DataFrame,
      max: Int): Option[java.util.HashMap[String, (Double, Long)]] = {
    val stateRows = state.select("host", "tokens", "last_round")
      .limit(max + 1).collect()
    if (stateRows.length > max) None
    else {
      val m = new java.util.HashMap[String, (Double, Long)](stateRows.length * 2)
      stateRows.foreach(r => m.put(r.getString(0), (r.getDouble(1), r.getLong(2))))
      Some(m)
    }
  }

  /** The refilled token balance for one host at `roundId` — the ONE
    * refill formula every politeness form shares. Bit-identical to the
    * column form in [[nextState]] (same IEEE op order: long round gap ×
    * rate, + tokens, min against burst), so the driver-resident state
    * path writes byte-equal tables to the distributed one. */
  def refillAmount(st: (Double, Long), roundId: Long,
      ratePerRound: Double, burst: Double): Double = {
    val (tok, last) = if (st == null) (burst, roundId - 1) else st
    math.min(burst, tok + math.max(0L, roundId - last) * ratePerRound)
  }

  /** The floor(tokens) admission limit for one host this round. */
  def admitLimit(st: (Double, Long), roundId: Long,
      ratePerRound: Double, burst: Double): Int =
    math.floor(refillAmount(st, roundId, ratePerRound, burst)).toInt

  def flagAdmissions(popped: org.apache.spark.sql.DataFrame,
      state: org.apache.spark.sql.DataFrame, roundId: Long,
      ratePerRound: Double, burst: Double,
      broadcastStateMax: Int = 20000000): org.apache.spark.sql.DataFrame = {
    val m = stateMapOf(state, broadcastStateMax).getOrElse(
      return flagAdmissionsWindow(popped, state, roundId, ratePerRound, burst))
    flagAdmissionsWithMap(popped, m, roundId, ratePerRound, burst)
  }

  /** [[flagAdmissions]] over an ALREADY-collected state map (the crawler
    * collects once per round and feeds either this or the fused sorted
    * pop). */
  def flagAdmissionsWithMap(popped: org.apache.spark.sql.DataFrame,
      m: java.util.HashMap[String, (Double, Long)], roundId: Long,
      ratePerRound: Double, burst: Double): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val bc = popped.sparkSession.sparkContext.broadcast(m)
    implicit val enc = Encoders.product[FlaggedEntry]
    implicit val inEnc = Encoders.product[PopEntry]
    val cols = Seq("url", "host", "host_bucket", "depth", "discovered_at")
    popped.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .as[PopEntry]
      .mapPartitions { it =>
        // rows of a host live in ONE partition; group, then admit the
        // per-host floor(tokens) in (depth, discovered_at, url) priority
        // order — identical verdicts to the window form's rn <= floor(...)
        val byHost = new java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[PopEntry]]()
        it.foreach { e =>
          var b = byHost.get(e.host)
          if (b == null) { b = new scala.collection.mutable.ArrayBuffer[PopEntry](); byHost.put(e.host, b) }
          b += e
        }
        import scala.jdk.CollectionConverters._
        byHost.entrySet().iterator().asScala.flatMap { en =>
          val admit = admitLimit(bc.value.get(en.getKey), roundId, ratePerRound, burst)
          val buf = en.getValue
          val flags: Iterator[(PopEntry, Boolean)] =
            if (admit >= buf.length) buf.iterator.map(_ -> true)
            else if (admit <= 0) buf.iterator.map(_ -> false)
            else buf.sortInPlace()(
              Ordering.by((e: PopEntry) => (e.depth, e.discovered_at, e.url)))
              .iterator.zipWithIndex.map { case (e, i) => e -> (i < admit) }
          flags.map { case (e, a) =>
            FlaggedEntry(e.url, e.host, e.host_bucket, e.depth, e.discovered_at, a) }
        }
      }
      .toDF()
      .select((popped.columns.toIndexedSeq :+ "admit").map(col): _*)
  }

  /** The round-2 window formulation of the verdicts — the fallback when
    * the state exceeds the broadcast budget, and the equivalence reference
    * for the partition-local form (StreamingSpec). Shuffles + sorts the
    * whole popped set on host; correct at any state size, ~2× round cost
    * at local[32]. */
  def flagAdmissionsWindow(popped: org.apache.spark.sql.DataFrame,
      state: org.apache.spark.sql.DataFrame, roundId: Long,
      ratePerRound: Double, burst: Double): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    popped
      .join(state, Seq("host"), "left")
      .withColumn("refilled", least(lit(burst),
        coalesce(col("tokens"), lit(burst)) +
          greatest(lit(0L), lit(roundId) - coalesce(col("last_round"), lit(roundId - 1)))
            * ratePerRound))
      .withColumn("rn", row_number().over(Window.partitionBy(col("host"))
        .orderBy(col("depth"), col("discovered_at"), col("url"))))
      .withColumn("admit", col("rn") <= floor(col("refilled")))
      .select((popped.columns.toIndexedSeq :+ "admit").map(col): _*)
  }

  /** Next round's full state table from a [[flagAdmissions]] frame: one
    * TINY per-host aggregate (map-side combined over the caller's cache —
    * never a second row-data pass) joined against the previous state.
    * Hosts not popped this round carry their state; they refill lazily on
    * next appearance (rate × rounds-since-last is exactly the missed
    * refill). */
  def nextState(flagged: org.apache.spark.sql.DataFrame,
      state: org.apache.spark.sql.DataFrame, roundId: Long,
      ratePerRound: Double, burst: Double): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val perHost = flagged.groupBy(col("host")).agg(
      sum(when(col("admit"), 1L).otherwise(0L)).as("adm_n"))
    val touched = perHost
      .join(state, Seq("host"), "left")
      .withColumn("refilled", least(lit(burst),
        coalesce(col("tokens"), lit(burst)) +
          greatest(lit(0L), lit(roundId) - coalesce(col("last_round"), lit(roundId - 1)))
            * ratePerRound))
      .select(col("host"),
        (col("refilled") - col("adm_n")).as("tokens"),
        lit(roundId).as("last_round"))
    val carried = state.join(perHost.select("host"), Seq("host"), "left_anti")
    touched.unionByName(carried)
  }

  /** Tuple-form compatibility wrapper over [[flagAdmissions]] +
    * [[nextState]] (the crawler uses the flag form directly so ONE cache
    * serves admitted rows, counts, and the state update). */
  def throttleRound(popped: org.apache.spark.sql.DataFrame,
      state: org.apache.spark.sql.DataFrame, roundId: Long,
      ratePerRound: Double, burst: Double,
      broadcastStateMax: Int = 20000000):
      (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.functions.col
    val flagged = flagAdmissions(popped, state, roundId, ratePerRound, burst,
      broadcastStateMax)
    (flagged.filter(col("admit")).drop("admit"),
      nextState(flagged, state, roundId, ratePerRound, burst))
  }

  /** Window-form tuple wrapper — the StreamingSpec equivalence reference. */
  def throttleRoundWindow(popped: org.apache.spark.sql.DataFrame,
      state: org.apache.spark.sql.DataFrame, roundId: Long,
      ratePerRound: Double, burst: Double):
      (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.functions.col
    val flagged = flagAdmissionsWindow(popped, state, roundId, ratePerRound, burst)
    (flagged.filter(col("admit")).drop("admit"),
      nextState(flagged, state, roundId, ratePerRound, burst))
  }
}
