package graft.data

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-STYLE table layout (no Iceberg jar exists in this sandbox —
  * SURVEY.md §8 M3): partitioned Parquet + a snapshot manifest chain with
  * per-partition row counts and content checksums. Gives the pieces the
  * north_rule asks for without the dependency:
  *
  *  - snapshot isolation-ish reads: readers take the partition list from the
  *    last committed manifest, so partially-written partitions from a crash
  *    are invisible;
  *  - resumable writes: a restarted job diffs the manifest against its input
  *    partitions and (re)writes only the missing ones, using dynamic
  *    partition overwrite so a partially-written partition is replaced, not
  *    doubled;
  *  - per-partition lineage + metrics: every snapshot records
  *    (partition, rows, checksum, snapshot that introduced it).
  *
  * Checksums are order-independent (bit_xor of xxhash64 over all columns), so
  * they are stable across parallelism levels — the resume test asserts
  * byte-equivalent content, not file layout.
  */
object IcebergLite {
  final case class PartitionEntry(partition: String, rows: Long, checksum: Long, snapshotId: Long)
  final case class Manifest(snapshotId: Long, parentSnapshotId: Long,
                            partitionCol: String, entries: Seq[PartitionEntry])

  private def manifestDir(table: String) = Paths.get(table, "_manifests")
  private def currentPtr(table: String) = Paths.get(table, "_manifests", "CURRENT")

  def readManifest(table: String): Option[Manifest] = {
    val ptr = currentPtr(table)
    if (!Files.exists(ptr)) return None
    val snap = Files.readString(ptr).trim.toLong
    val lines = Files.readAllLines(manifestDir(table).resolve(s"snap-$snap.tsv")).asScala.toSeq
    val header = lines.head.split("\t") // snapshotId parentSnapshotId partitionCol
    val entries = lines.tail.map { l =>
      val f = l.split("\t")
      PartitionEntry(f(0), f(1).toLong, f(2).toLong, f(3).toLong)
    }
    Some(Manifest(header(0).toLong, header(1).toLong, header(2), entries))
  }

  private def commitManifest(table: String, m: Manifest): Unit = {
    Files.createDirectories(manifestDir(table))
    val body = (s"${m.snapshotId}\t${m.parentSnapshotId}\t${m.partitionCol}" +:
      m.entries.sortBy(_.partition).map(e => s"${e.partition}\t${e.rows}\t${e.checksum}\t${e.snapshotId}"))
      .mkString("\n")
    val tmp = manifestDir(table).resolve(s".snap-${m.snapshotId}.tsv.tmp")
    Files.writeString(tmp, body)
    Files.move(tmp, manifestDir(table).resolve(s"snap-${m.snapshotId}.tsv"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    val ptrTmp = manifestDir(table).resolve(".CURRENT.tmp")
    Files.writeString(ptrTmp, m.snapshotId.toString)
    Files.move(ptrTmp, currentPtr(table),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING) // atomic commit
  }

  /** Per-partition (rows, checksum) of a DataFrame. */
  private def stats(df: DataFrame, partitionCol: String): Map[String, (Long, Long)] = {
    val dataCols = df.columns.filter(_ != partitionCol).map(col).toSeq
    df.groupBy(col(partitionCol).cast("string"))
      .agg(count(lit(1)).as("rows"), bit_xor(xxhash64(dataCols: _*)).as("chk"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
  }

  /** Write (or resume writing) `df` partitioned by `partitionCol`.
    * Returns the committed manifest. Idempotent: rerunning after any crash
    * converges to the same committed state. `failAfterPartitions` injects a
    * crash for the resume test (kills the job after K partitions committed).
    */
  def write(df: DataFrame, table: String, partitionCol: String,
            failAfterPartitions: Int = Int.MaxValue): Manifest = {
    val spark = df.sparkSession
    val prior = readManifest(table)
    val done = prior.map(_.entries.map(_.partition).toSet).getOrElse(Set.empty)
    val snapshotId = prior.map(_.snapshotId + 1).getOrElse(0L)

    val all = stats(df, partitionCol)
    var todo = all.keys.filterNot(done).toSeq.sorted
    val injected = todo.size > failAfterPartitions
    if (injected) todo = todo.take(failAfterPartitions)
    if (todo.isEmpty) return prior.get

    val part = col(partitionCol).cast("string")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.where(part.isin(todo: _*))
      .write.mode("overwrite")
      .partitionBy(partitionCol)
      .parquet(s"$table/data")

    val newEntries = todo.map(p => PartitionEntry(p, all(p)._1, all(p)._2, snapshotId))
    val m = Manifest(snapshotId, prior.map(_.snapshotId).getOrElse(-1L), partitionCol,
      prior.map(_.entries).getOrElse(Nil) ++ newEntries)
    commitManifest(table, m)
    if (injected) throw new RuntimeException(
      s"[injected] crashed after $failAfterPartitions partitions (snapshot $snapshotId committed)")
    m
  }

  /** Reference `GeoHash.update` (SURVEY.md §3.2 #16): REPLACE the contents
    * of every partition present in `df` (other partitions untouched), as a
    * new snapshot. */
  def update(df: DataFrame, table: String, partitionCol: String): Manifest = {
    val spark = df.sparkSession
    val prior = readManifest(table).getOrElse(
      throw new IllegalStateException(s"update on uninitialized table $table"))
    val snapshotId = prior.snapshotId + 1
    val incoming = stats(df, partitionCol)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(s"$table/data")
    val kept = prior.entries.filterNot(e => incoming.contains(e.partition))
    val m = Manifest(snapshotId, prior.snapshotId, partitionCol,
      kept ++ incoming.map { case (p, (r, c)) => PartitionEntry(p, r, c, snapshotId) })
    commitManifest(table, m)
    m
  }

  /** Reference `GeoHash.extend` (#17): APPEND rows to their partitions.
    * Implemented as read-union-overwrite of only the touched partitions, so
    * the commit stays atomic at partition granularity and a crashed extend
    * is invisible until its manifest lands. */
  def extend(df: DataFrame, table: String, partitionCol: String): Manifest = {
    val spark = df.sparkSession
    val prior = readManifest(table).getOrElse(
      throw new IllegalStateException(s"extend on uninitialized table $table"))
    val touched = stats(df, partitionCol).keySet
    val existingTouched = read(spark, table)
      .where(col(partitionCol).cast("string").isin(touched.toSeq: _*))
      .select(df.columns.map(col): _*)
    // localCheckpoint: materialize before overwriting the files being read
    // (at real scale this is a file-level append; partition rewrite is the
    // partition-granularity emulation)
    update(existingTouched.unionAll(df).localCheckpoint(true), table, partitionCol)
  }

  /** Read through the manifest: only committed partitions are visible. */
  def read(spark: SparkSession, table: String): DataFrame = {
    val m = readManifest(table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $table"))
    val committed = m.entries.map(_.partition)
    spark.read.parquet(s"$table/data")
      .where(col(m.partitionCol).cast("string").isin(committed: _*))
  }

  /** Per-tile metrics/lineage emission (north_rule): one JSON line per
    * partition with rows, checksum and introducing snapshot. */
  def lineageJson(table: String): Seq[String] = {
    val m = readManifest(table).getOrElse(return Nil)
    m.entries.sortBy(_.partition).map(e =>
      s"""{"table":"$table","partition":"${e.partition}","rows":${e.rows},"checksum":${e.checksum},"snapshot":${e.snapshotId}}""")
  }
}
