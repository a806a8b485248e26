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
  *  - FILE-LEVEL appends: every snapshot writes its data files under its own
  *    `data/snapid=<id>/` directory, so `extend` ADDS files and never
  *    rewrites an existing partition (at 100 TB an append that re-reads and
  *    rewrites a whole partition is a non-starter). A partition's content is
  *    the union of all committed (snapshot, partition) pairs;
  *  - snapshot-isolated reads: readers build the visible (snapshot,
  *    partition) set from the last committed manifest, so files from a
  *    crashed or in-flight write are invisible, and an older manifest still
  *    describes a fully consistent older table (time travel);
  *  - resumable writes: a restarted job diffs the manifest against its input
  *    partitions and (re)writes only the missing ones, using dynamic
  *    partition overwrite inside its own snapshot dir so a partially-written
  *    partition is replaced, not doubled;
  *  - per-partition lineage + metrics: every snapshot records
  *    (partition, rows, checksum, snapshot that introduced it);
  *  - table properties in the manifest header (tile precision, lon/lat
  *    column names) drive the [[graft.sql.DeriveCoveringPrune]] optimizer
  *    rule: a bare box / point-in-polygon filter over a manifest-backed
  *    table is rewritten into a partition-prefix IN-list automatically.
  *
  * Checksums are order-independent (bit_xor of xxhash64 over all columns), so
  * they are stable across parallelism levels; a partition touched by several
  * snapshots has one manifest entry per snapshot and its cumulative checksum
  * is the XOR of the entries (bit_xor is associative).
  *
  * The `snapid` directory column name is reserved; user schemas must not
  * contain it.
  */
object IcebergLite {
  final case class PartitionEntry(partition: String, rows: Long, checksum: Long, snapshotId: Long)
  final case class Manifest(snapshotId: Long, parentSnapshotId: Long,
                            partitionCol: String, properties: Map[String, String],
                            entries: Seq[PartitionEntry])

  /** Property keys consumed by the optimizer rule. */
  val PropPrefixBits = "tile.prefix.bits"
  val PropLonCol = "tile.lon.col"
  val PropLatCol = "tile.lat.col"
  /** "gh" (Morton geohash, default) or "h3u" (Uber-H3-compatible cells);
    * selects which covering DeriveCoveringPrune derives. */
  val PropIndexType = "tile.index"
  /** Streaming-ingest hygiene: compact (+ expire) whenever the manifest
    * references this many distinct snapshots. Absent/0 = manual only. */
  val PropAutoCompact = "compact.auto.snapshots"

  private def manifestDir(table: String) = Paths.get(table, "_manifests")
  private def currentPtr(table: String) = Paths.get(table, "_manifests", "CURRENT")

  def readManifest(table: String): Option[Manifest] = {
    val ptr = currentPtr(table)
    if (!Files.exists(ptr)) return None
    val snap = Files.readString(ptr).trim.toLong
    readSnapshot(table, snap)
  }

  /** Any committed snapshot by id (time travel). */
  def readSnapshot(table: String, snap: Long): Option[Manifest] = {
    val p = manifestDir(table).resolve(s"snap-$snap.tsv")
    if (!Files.exists(p)) return None
    val lines = Files.readAllLines(p).asScala.toSeq
    val header = lines.head.split("\t", -1) // id parentId partitionCol props
    val props =
      if (header.length < 4 || header(3).isEmpty) Map.empty[String, String]
      else header(3).split(";").map { kv =>
        val Array(k, v) = kv.split("=", 2); k -> v
      }.toMap
    val entries = lines.tail.map { l =>
      val f = l.split("\t")
      PartitionEntry(f(0), f(1).toLong, f(2).toLong, f(3).toLong)
    }
    Some(Manifest(header(0).toLong, header(1).toLong, header(2), props, entries))
  }

  private def commitManifest(table: String, m: Manifest): Unit = {
    Files.createDirectories(manifestDir(table))
    val props = m.properties.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(";")
    val body = (s"${m.snapshotId}\t${m.parentSnapshotId}\t${m.partitionCol}\t$props" +:
      m.entries.sortBy(e => (e.partition, e.snapshotId))
        .map(e => s"${e.partition}\t${e.rows}\t${e.checksum}\t${e.snapshotId}"))
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

  /** Per-partition (rows, checksum) of a DataFrame. Collects ONE row per
    * partition to the driver — bounded by partition count, guarded. */
  private def stats(df: DataFrame, partitionCol: String): Map[String, (Long, Long)] = {
    val dataCols = df.columns.filter(_ != partitionCol).map(col).toSeq
    val rows = df.groupBy(col(partitionCol).cast("string"))
      .agg(count(lit(1)).as("rows"), bit_xor(xxhash64(dataCols: _*)).as("chk"))
      .collect()
    require(rows.length <= (1 << 20),
      s"${rows.length} partitions exceed the manifest guard (2^20); use a coarser prefix")
    rows.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  private def snapDir(table: String, snapshotId: Long) = s"$table/data/snapid=$snapshotId"

  private def writeSnapshotFiles(df: DataFrame, table: String, partitionCol: String,
                                 snapshotId: Long, partitions: Seq[String]): Unit = {
    // dynamic overwrite INSIDE the new snapshot dir: a re-attempt after a
    // crash (same snapshot id) replaces its own partial files and never
    // touches a committed snapshot's files. Per-write option, not a session
    // conf mutation — the session's overwrite semantics outside IcebergLite
    // must stay whatever the user set.
    df.where(col(partitionCol).cast("string").isin(partitions: _*))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(snapDir(table, snapshotId))
  }

  /** Write (or resume writing) `df` partitioned by `partitionCol`.
    * Returns the committed manifest. Idempotent: rerunning after any crash
    * converges to the same committed state. `failAfterPartitions` injects a
    * crash for the resume test (kills the job after K partitions committed).
    * `properties` become table properties in the manifest header (see
    * [[writeTiled]] for the tile-aware convenience form). */
  def write(df: DataFrame, table: String, partitionCol: String,
            failAfterPartitions: Int = Int.MaxValue,
            properties: Map[String, String] = Map.empty): Manifest = {
    val prior = readManifest(table)
    val done = prior.map(_.entries.map(_.partition).toSet).getOrElse(Set.empty)
    val snapshotId = prior.map(_.snapshotId + 1).getOrElse(0L)

    val all = stats(df, partitionCol)
    var todo = all.keys.filterNot(done).toSeq.sorted
    val injected = todo.size > failAfterPartitions
    if (injected) todo = todo.take(failAfterPartitions)
    if (todo.isEmpty) {
      return prior match {
        // no data to write, but NEW table properties must still land (e.g.
        // writeTiled registering the tiling on an already-written table)
        case Some(p) if properties.nonEmpty && (p.properties ++ properties) != p.properties =>
          val m = p.copy(snapshotId = p.snapshotId + 1, parentSnapshotId = p.snapshotId,
            properties = p.properties ++ properties)
          commitManifest(table, m); m
        case Some(p) => p
        case None =>
          // brand-new table from an empty DataFrame: commit an explicit empty
          // snapshot-0 (with properties) instead of NoSuchElementException
          val m = Manifest(snapshotId, -1L, partitionCol, properties, Nil)
          commitManifest(table, m); m
      }
    }

    writeSnapshotFiles(df, table, partitionCol, snapshotId, todo)

    val newEntries = todo.map(p => PartitionEntry(p, all(p)._1, all(p)._2, snapshotId))
    val m = Manifest(snapshotId, prior.map(_.snapshotId).getOrElse(-1L), partitionCol,
      prior.map(_.properties).getOrElse(Map.empty) ++ properties,
      prior.map(_.entries).getOrElse(Nil) ++ newEntries)
    commitManifest(table, m)
    if (injected) throw new RuntimeException(
      s"[injected] crashed after $failAfterPartitions partitions (snapshot $snapshotId committed)")
    m
  }

  /** Tile-aware write: assigns `tile` (at tileBits) and the partition prefix
    * column (at prefixBits) from lon/lat, records the tiling as table
    * properties so [[graft.sql.DeriveCoveringPrune]] can rewrite box/PIP
    * filters into partition predicates. Rows are tile-sorted WITHIN each
    * task before writing (no repartition — a hot prefix must not collapse
    * into one task): locally clustered tile/lon/lat values give every
    * parquet row group tight min/max stats, so refine predicates skip row
    * groups inside the surviving partitions at 100 TB — a second pruning
    * level under the partition IN-list. XOR checksums are order-
    * insensitive, so manifests are unaffected. */
  def writeTiled(df: DataFrame, table: String, lonCol: String, latCol: String,
                 tileBits: Int, prefixBits: Int,
                 prefixCol: String = "tile_p"): Manifest = {
    val tiled = df
      .withColumn("tile", graft.sql.functions.gh_encode(col(lonCol), col(latCol), tileBits))
      .withColumn(prefixCol, graft.sql.functions.gh_parent(col("tile"), tileBits, prefixBits))
      .sortWithinPartitions(prefixCol, "tile")
    write(tiled, table, prefixCol, properties = Map(
      PropPrefixBits -> prefixBits.toString, PropLonCol -> lonCol, PropLatCol -> latCol,
      PropIndexType -> "gh"))
  }

  /** [[writeTiled]] on the Uber-H3-compatible index: `tile` =
    * h3u_cell(lon, lat, tileRes), partition prefix = its ancestor at
    * prefixRes. DeriveCoveringPrune reads the recorded index type and
    * derives an H3 polyfill IN-list for bare box / PIP filters, exactly as
    * it derives a Morton covering for "gh" tables. */
  def writeTiledH3(df: DataFrame, table: String, lonCol: String, latCol: String,
                   tileRes: Int, prefixRes: Int,
                   prefixCol: String = "tile_p"): Manifest = {
    val tiled = df
      .withColumn("tile", graft.sql.functions.h3u_cell(col(lonCol), col(latCol), tileRes))
      .withColumn(prefixCol, graft.sql.functions.h3u_parent(col("tile"), prefixRes))
      .sortWithinPartitions(prefixCol, "tile")
    write(tiled, table, prefixCol, properties = Map(
      PropPrefixBits -> prefixRes.toString, PropLonCol -> lonCol, PropLatCol -> latCol,
      PropIndexType -> "h3u"))
  }

  /** [[writeTiled]] on the published-layout S2 index: `tile` =
    * s2u_cell(lon, lat, tileLevel), partition prefix = its ancestor at
    * prefixLevel. DeriveCoveringPrune's "s2u" arm derives a coverBox
    * IN-list for bare box filters over the table. */
  def writeTiledS2(df: DataFrame, table: String, lonCol: String, latCol: String,
                   tileLevel: Int, prefixLevel: Int,
                   prefixCol: String = "tile_p"): Manifest = {
    val tiled = df
      .withColumn("tile", graft.sql.functions.s2u_cell(col(lonCol), col(latCol), tileLevel))
      .withColumn(prefixCol, graft.sql.functions.s2u_parent(col("tile"), prefixLevel))
      .sortWithinPartitions(prefixCol, "tile")
    write(tiled, table, prefixCol, properties = Map(
      PropPrefixBits -> prefixLevel.toString, PropLonCol -> lonCol, PropLatCol -> latCol,
      PropIndexType -> "s2u"))
  }

  /** Reference `GeoHash.update` (SURVEY.md §3.2 #16): REPLACE the contents
    * of every partition present in `df` (other partitions untouched), as a
    * new snapshot. Old files are not deleted — they stay reachable through
    * the parent manifest (snapshot isolation) and merely invisible here. */
  def update(df: DataFrame, table: String, partitionCol: String): Manifest = {
    val prior = readManifest(table).getOrElse(
      throw new IllegalStateException(s"update on uninitialized table $table"))
    val snapshotId = prior.snapshotId + 1
    val incoming = stats(df, partitionCol)
    writeSnapshotFiles(df, table, partitionCol, snapshotId, incoming.keys.toSeq)
    val kept = prior.entries.filterNot(e => incoming.contains(e.partition))
    val m = Manifest(snapshotId, prior.snapshotId, partitionCol, prior.properties,
      kept ++ incoming.map { case (p, (r, c)) => PartitionEntry(p, r, c, snapshotId) })
    commitManifest(table, m)
    m
  }

  /** Reference `GeoHash.extend` (#17): APPEND rows to their partitions.
    * FILE-LEVEL: the batch lands as new files under the new snapshot's own
    * directory and the manifest gains one entry per touched partition; no
    * existing file is read or rewritten, which is the only append shape that
    * works at 100 TB. */
  def extend(df: DataFrame, table: String, partitionCol: String): Manifest = {
    val prior = readManifest(table).getOrElse(
      throw new IllegalStateException(s"extend on uninitialized table $table"))
    val snapshotId = prior.snapshotId + 1
    val incoming = stats(df, partitionCol)
    writeSnapshotFiles(df, table, partitionCol, snapshotId, incoming.keys.toSeq)
    val m = Manifest(snapshotId, prior.snapshotId, partitionCol, prior.properties,
      prior.entries ++ incoming.map { case (p, (r, c)) => PartitionEntry(p, r, c, snapshotId) })
    commitManifest(table, m)
    m
  }

  /** Read through a manifest: only committed (snapshot, partition) pairs are
    * visible. Visibility is enforced by LISTING exactly the visible
    * `data/snapid=<sid>/<partitionCol>=<value>` directories as the load
    * paths — no predicate at all, so the plan stays CONSTANT-SIZE no matter
    * how many micro-batch snapshots a long-lived stream has committed
    * (an OR-per-snapshot predicate grew O(#batches) and was re-walked by
    * every optimizer pass). basePath keeps snapid + the partition column
    * recoverable as partition columns; uncommitted / superseded / in-flight
    * snapshot dirs are simply never listed. */
  def read(spark: SparkSession, table: String, asOfSnapshot: Long = -1L): DataFrame = {
    val m = (if (asOfSnapshot >= 0) readSnapshot(table, asOfSnapshot) else readManifest(table))
      .getOrElse(throw new IllegalStateException(s"no committed snapshot at $table"))
    if (m.entries.isEmpty) throw new IllegalStateException(
      s"table $table snapshot ${m.snapshotId} has no data partitions")
    val esc = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName _
    val dirs = m.entries.map(e =>
      s"$table/data/snapid=${e.snapshotId}/${esc(m.partitionCol)}=${esc(e.partition)}")
      .distinct
    spark.read.option("basePath", s"$table/data").parquet(dirs: _*).drop("snapid")
  }

  /** Compact: rewrite the table's visible content as ONE new snapshot (one
    * entry and one file set per partition). Streaming ingest creates a
    * snapshot per micro-batch; unbounded manifests and small files are the
    * classic cost, and compaction is the standard rewrite-by-design answer.
    * Old snapshots stay readable until [[expireSnapshots]]. */
  def compact(spark: SparkSession, table: String): Manifest = {
    val prior = readManifest(table).getOrElse(
      throw new IllegalStateException(s"compact on uninitialized table $table"))
    val snapshotId = prior.snapshotId + 1
    // materialize before writing: the new snapshot dir is separate, but the
    // plan must not lazily re-list data/ mid-write
    val current0 = read(spark, table).localCheckpoint(true)
    // restore tile clustering lost to micro-batch appends: tiled tables get
    // tight per-row-group min/max stats back after compaction (see
    // writeTiled; XOR checksums are order-insensitive)
    val current =
      if (current0.columns.contains("tile"))
        current0.sortWithinPartitions(col(prior.partitionCol), col("tile"))
      else current0
    val incoming = stats(current, prior.partitionCol)
    writeSnapshotFiles(current, table, prior.partitionCol, snapshotId, incoming.keys.toSeq)
    val m = Manifest(snapshotId, prior.snapshotId, prior.partitionCol, prior.properties,
      incoming.toSeq.map { case (p, (r, c)) => PartitionEntry(p, r, c, snapshotId) })
    commitManifest(table, m)
    m
  }

  /** Delete data directories of snapshots no longer referenced by the
    * CURRENT manifest (e.g. everything superseded by a [[compact]] or
    * [[update]]). Time travel to expired snapshots stops working; the
    * current snapshot is untouched. Returns the deleted snapshot ids. */
  def expireSnapshots(table: String): Seq[Long] = {
    val m = readManifest(table).getOrElse(return Nil)
    val live = m.entries.map(_.snapshotId).toSet
    val dataDir = Paths.get(table, "data")
    if (!Files.exists(dataDir)) return Nil
    val victims = scala.util.Using.resource(Files.list(dataDir)) { s =>
      s.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("snapid="))
        .map(p => (p, p.getFileName.toString.stripPrefix("snapid=").toLong))
        .filterNot { case (_, sid) => live(sid) }
        .toSeq
    }
    victims.foreach { case (dir, _) =>
      scala.util.Using.resource(Files.walk(dir)) { s =>
        s.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.delete)
      }
    }
    victims.map(_._2).sorted
  }

  /** Total committed rows per partition (summing across snapshots). */
  def rowsByPartition(m: Manifest): Map[String, Long] =
    m.entries.groupBy(_.partition).map { case (p, es) => p -> es.map(_.rows).sum }

  /** Per-tile metrics/lineage emission (north_rule): one JSON line per
    * manifest entry with rows, checksum and introducing snapshot. */
  def lineageJson(table: String): Seq[String] = {
    val m = readManifest(table).getOrElse(return Nil)
    m.entries.sortBy(e => (e.partition, e.snapshotId)).map(e =>
      s"""{"table":"$table","partition":"${e.partition}","rows":${e.rows},"checksum":${e.checksum},"snapshot":${e.snapshotId}}""")
  }
}
