package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import java.nio.file.{Files, Paths, StandardCopyOption}

/**
 * Minimal Iceberg-style table facade: snapshot isolation + atomic commit
 * over plain partitioned Parquet.
 *
 * No Iceberg runtime jar exists in this container (SURVEY.md §7.0), so the
 * north rule's "Iceberg tables" are emulated with the same *semantics* the
 * pipeline needs — atomic snapshot swap, round-id lineage, torn-round
 * replay — behind a one-file facade so a real Iceberg catalog is a drop-in
 * swap later:
 *
 *  - every commit writes a fresh `data-r<round>-<nonce>` directory, then
 *    atomically renames `manifest.json.tmp` → `manifest.json` (POSIX rename
 *    atomicity = the commit point, like an Iceberg metadata pointer swap;
 *    the reference's analogue is the single SQLite transaction,
 *    store/store.go:69-105);
 *  - readers only ever see the directory named by the manifest, so a crash
 *    mid-write leaves a stale-but-consistent snapshot (torn rounds are
 *    replayed idempotently by the crawler);
 *  - old snapshot dirs are pruned on commit (keep latest 2 for debugging).
 *
 * Scale note (100 TB design point): full-snapshot rewrite is only used for
 * the FRONTIER table, whose working set is ~1% of crawled bytes; the DOCS
 * table is append-only (one new partition dir per round, never rewritten).
 * With real Iceberg the frontier rewrite becomes MERGE INTO + positional
 * deletes; the facade isolates exactly that call site.
 */
class IcebergishTable(val root: String, schema: StructType) extends Serializable {

  private def manifestPath = Paths.get(root, "manifest.json")

  case class Snapshot(round: Int, dataDir: String, rows: Long)

  def currentSnapshot(): Option[Snapshot] = {
    if (!Files.exists(manifestPath)) return None
    val txt = Files.readString(manifestPath)
    def field(k: String): String =
      txt.split("\"" + k + "\":").last.split("[,}]").head.trim.stripPrefix("\"").stripSuffix("\"")
    Some(Snapshot(field("round").toInt, field("data_dir"), field("rows").toLong))
  }

  def read(spark: SparkSession): DataFrame =
    currentSnapshot() match {
      case Some(s) => spark.read.schema(schema).parquet(s"$root/${s.dataDir}")
      case None =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

  /** Atomically replace the table contents with `df` as snapshot `round`. */
  def commit(df: DataFrame, round: Int, partitionCols: Seq[String] = Nil): Long = {
    Files.createDirectories(Paths.get(root))
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val dataDir = s"data-r$round-$nonce"
    // cluster rows by the partition columns first: without this every
    // upstream task writes a file into every partition dir (tasks × dirs
    // small files); with it, one exchange → one file per partition dir
    val clustered =
      if (partitionCols.nonEmpty)
        df.repartition(partitionCols.map(org.apache.spark.sql.functions.col): _*)
      else df
    val w0 = clustered.write.mode("overwrite")
    val w = if (partitionCols.nonEmpty) w0.partitionBy(partitionCols: _*) else w0
    w.parquet(s"$root/$dataDir")
    val rows = df.sparkSession.read.schema(schema).parquet(s"$root/$dataDir").count()
    val tmp = Paths.get(root, "manifest.json.tmp")
    Files.writeString(tmp,
      s"""{"round":$round,"data_dir":"$dataDir","rows":$rows}""")
    val prev = currentSnapshot()
    Files.move(tmp, manifestPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    prune(keep = Set(dataDir) ++ prev.map(_.dataDir))
    rows
  }

  private def prune(keep: Set[String]): Unit = {
    val dir = Paths.get(root)
    if (!Files.exists(dir)) return
    val it = Files.list(dir).iterator()
    while (it.hasNext) {
      val p = it.next()
      val name = p.getFileName.toString
      if (name.startsWith("data-r") && !keep.contains(name))
        deleteRecursively(p)
    }
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) {
      val it = Files.list(p).iterator()
      while (it.hasNext) deleteRecursively(it.next())
    }
    Files.deleteIfExists(p)
  }
}
