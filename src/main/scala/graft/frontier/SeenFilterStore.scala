package graft.frontier

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Per-partition (host-bucket) cuckoo-filter seen-set state, checkpointed
 * per round — the north rule's "broadcast Bloom + per-partition cuckoo
 * refinement" and "checkpoints frontier + seen-set state per partition".
 *
 * One [[CuckooFilter]] per host_bucket, stored as a (host_bucket, filter
 * bytes, complete) parquet per round. Incremental: round N's filters =
 * round N-1's plus that round's fresh URLs (cuckoo insert — no rebuild).
 * A bucket whose filter ever saturates is marked incomplete and treated
 * conservatively (all its candidates take the exact path) — a false
 * negative would re-insert a seen URL, so completeness is load-bearing
 * and tracked explicitly.
 *
 * Split semantics (`split`): candidates whose bucket filter is COMPLETE
 * and reports miss are PROVABLY NEW (cuckoo has no false negatives) and
 * can skip the exact merge join entirely; everything else (filter hit —
 * maybe a false positive — or missing/incomplete filter) takes the exact
 * path. Correctness never rests on the filter; only join volume does.
 */
case class FilterRow(host_bucket: Int, filter: Array[Byte], complete: Boolean)

class SeenFilterStore(root: String) extends Serializable {

  private def dir(round: Int) = s"$root/seenfilter/round=$round"

  def load(spark: SparkSession, round: Int): Option[Dataset[FilterRow]] = {
    import spark.implicits._
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(dir(round)))) None
    else Some(spark.read.parquet(dir(round)).as[FilterRow])
  }

  /** Build round `round`'s filters = previous filters + `freshUrls`
    * (columns url, host_bucket), then checkpoint them. If the previous
    * round's filter file is missing (torn round: table committed, filter
    * save crashed), fall back to a FULL rebuild from `allUrls` — an
    * incremental build on a broken chain would create false negatives,
    * which corrupt the frontier. */
  def updateAndSave(spark: SparkSession, round: Int, prevRound: Int,
      freshUrls: DataFrame, allUrls: => DataFrame,
      capacityPerBucket: Int = 1 << 16): Unit = {
    import spark.implicits._
    // materialize the base filters driver-side (≤ numBuckets small rows):
    // the overwrite below may target the same path we are reading
    // (mid-crawl re-seeding updates the current round's file in place)
    val base: Option[Array[FilterRow]] = load(spark, prevRound).map(_.collect())
    val prev: Dataset[FilterRow] =
      base.map(rows => spark.createDataset(rows.toSeq))
        .getOrElse(spark.emptyDataset[FilterRow])
    val source = if (base.isDefined || round == 0) freshUrls else allUrls
    val fresh = source.select(col("host_bucket").cast("int"), col("url"))
      .as[(Int, String)]
    val updated = fresh.groupByKey(_._1).cogroup(prev.groupByKey(_.host_bucket)) {
      (bucket, urls, filters) =>
        val f0 = filters.toSeq.headOption
        val filter = f0.map(r => CuckooFilter.deserialize(r.filter))
          .getOrElse(new CuckooFilter(capacityPerBucket))
        var complete = f0.forall(_.complete)
        urls.foreach { case (_, u) => if (!filter.add(u)) complete = false }
        Iterator.single(FilterRow(bucket, filter.serialize(), complete))
    }
    updated.write.mode("overwrite").parquet(dir(round))
  }

  /** Split candidates (url, host_bucket, …) into (provablyNew, maybeSeen)
    * against round `round`'s filters via a co-grouped per-bucket pass. */
  def split(spark: SparkSession, round: Int, cands: DataFrame): (DataFrame, DataFrame) = {
    load(spark, round) match {
      case None => (cands.limit(0), cands) // no state → everything exact
      case Some(filters) =>
        import spark.implicits._
        val schema = cands.schema
        val withTag = cands.withColumn("__b", col("host_bucket").cast("int"))
        implicit val rowEnc = org.apache.spark.sql.Encoders.row(
          withTag.schema.add("__new", "boolean"))
        val tagged = withTag
          .groupByKey(r => r.getAs[Int]("__b"))(org.apache.spark.sql.Encoders.scalaInt)
          .cogroup(filters.groupByKey(_.host_bucket)) { (bucket, rows, fs) =>
            val f = fs.toSeq.headOption.filter(_.complete)
              .map(r => CuckooFilter.deserialize(r.filter))
            rows.map { r =>
              val isNew = f.exists(!_.mightContain(r.getAs[String]("url")))
              org.apache.spark.sql.Row.fromSeq(r.toSeq :+ isNew)
            }
          }
        val cols = schema.fieldNames.map(col)
        (tagged.filter(col("__new")).select(cols: _*),
          tagged.filter(!col("__new")).select(cols: _*))
    }
  }
}
