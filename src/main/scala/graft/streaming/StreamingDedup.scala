package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.operators.TextOps

/**
 * Streaming first-occurrence exact dedup — the CONTINUOUS form of
 * [[graft.operators.Dedup.exactDedup]] and the stream-side mirror of
 * q60's incremental exact tier: a document stream deduplicated across
 * micro-batches by normalized-text fingerprint. Each fingerprint's
 * first occurrence (earliest batch; min doc_id within that batch —
 * deterministic under batch-internal reordering) is emitted once;
 * every later occurrence, in any batch, is dropped.
 *
 * State design: `flatMapGroupsWithState` keyed on the 32-hex md5
 * fingerprint with ONE boolean per group — the smallest possible
 * per-key state (the [[graft.sources.Providers.feedStreamHwm]]
 * discipline: keyed state holds a watermark-sized fact, never a
 * growing collection). The state store partitions by fingerprint
 * across executors, so a 10^10-doc stream shards like any keyed agg;
 * at that scale the store is RocksDB-backed (a Spark config, not a
 * code change), or the standing archive moves to the q60 BATCH tier
 * (broadcast/shuffled fingerprint join per slice) with this layer
 * deduping only the hot in-flight window.
 */
object StreamingDedup {

  /** Append-mode stream of (doc_id, fp) — one row per first-seen
    * fingerprint. Input columns: `doc_id` (long), `text` (string). */
  def firstSeen(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"),
        TextOps.normFingerprint(col("text")).as("fp"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (fp: String, rows: Iterator[(Long, String)],
         state: org.apache.spark.sql.streaming.GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single((rows.minBy(_._1)._1, fp))
          }
      }
      .toDF("doc_id", "fp")
  }
}
