package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators. The reference is a batch library
  * (SURVEY.md §3.3: streaming absent); this is the engine extension that
  * makes the tiling pipeline incremental: the same tumbling-window
  * aggregation shape that per-tile metrics use, fed by a file stream.
  *
  * For verification the stream is driven to completion over a static
  * parquet directory (processAllAvailable) and the result must equal the
  * batch GROUP BY — exactly the incremental-view guarantee Structured
  * Streaming makes.
  */
object StreamOps {
  /** Scale-adaptive stateful-shuffle sizing: a streaming query's state /
    * aggregation partition count is pinned at query start from
    * `spark.sql.shuffle.partitions` (AQE is disabled in streaming), so a
    * constant tuned for either local mode or the cluster is wrong at the
    * other scale. Derive it from the INPUT volume — ≈64 MB of source per
    * partition, floored at 1, capped at the session's parallelism: a
    * 100 TB stream saturates to cluster parallelism (production behavior
    * unchanged), while a small micro-batch stops paying one state-store
    * commit + task per configured partition per trigger (guide §2.2).
    * These one-shot queries use fresh checkpoints, so the per-run choice
    * never conflicts with a prior run's pinned partitioning. */
  /** Source schema with a per-JVM (path, mtime) cache: six streaming
    * operators each re-read the same static source's parquet footers just
    * to declare the stream schema — metadata only, invalidated on file
    * change, never persisted across processes. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), org.apache.spark.sql.types.StructType]()

  private def sourceSchema(spark: SparkSession, path: String): org.apache.spark.sql.types.StructType = {
    val mtime = try java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(path)).toMillis catch { case _: java.io.IOException => -1L }
    schemaCache.computeIfAbsent((path, mtime), _ => spark.read.parquet(path).schema)
  }

  private def withInputSizedShuffle[T](spark: SparkSession, path: String)(body: => T): T = {
    def sizeOf(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(sizeOf).sum else f.length()
    val bytes = sizeOf(new java.io.File(path))
    val parts = math.max(1L, math.min(spark.sparkContext.defaultParallelism.toLong,
      bytes / (64L << 20) + 1))
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Tumbling-window event aggregation, streaming end-to-end, returned as a
    * finished DataFrame. Decimal sums keep parity with the DuckDB oracle. */
  def streamedWindowAgg(spark: SparkSession, parquetPath: String): DataFrame = {
    val schema = sourceSchema(spark, parquetPath)
    val name = s"q50_out_${System.nanoTime()}"
    // the file source needs a directory: stream the parent dir, filtered to
    // this one file (works for both a file and a directory input)
    val f = new java.io.File(parquetPath)
    val (dir, glob) = if (f.isDirectory) (parquetPath, "*") else (f.getParent, f.getName)
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", glob).parquet(dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           expr("CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)").as("sum_val"))
    withInputSizedShuffle(spark, parquetPath) {
      val q = stream.writeStream
        .format("memory").queryName(name).outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
    }
    // materialize, then drop the memory-sink view: repeated invocations
    // (bench loops, verify reruns) must not accumulate result tables in
    // driver memory for the session's lifetime
    val out = spark.table(name)
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sum_val"))
      .localCheckpoint(true)
    spark.catalog.dropTempView(name)
    out
  }

  /** Watermarked tumbling-window aggregation in APPEND mode: a window's row
    * is emitted exactly once, when the watermark (max event time − delay)
    * passes its end — the late-data-bounded streaming shape. Deterministic
    * over a static input: the final emitted set is every window whose end
    * ≤ max(ts) − delay (later windows stay open in state), which the DuckDB
    * oracle reproduces with a HAVING clause. */
  def streamedWatermarkAgg(spark: SparkSession, parquetPath: String,
                           delay: String = "2 hours"): DataFrame = {
    val schema = sourceSchema(spark, parquetPath)
    val name = s"q53_out_${System.nanoTime()}"
    val f = new java.io.File(parquetPath)
    val (dir, glob) = if (f.isDirectory) (parquetPath, "*") else (f.getParent, f.getName)
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", glob).parquet(dir)
      // watermark requires TIMESTAMP; the session runs UTC so NTZ↔TZ casts
      // preserve wall-clock values (output window start is cast back)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           expr("CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)").as("sum_val"))
    withInputSizedShuffle(spark, parquetPath) {
      val q = stream.writeStream
        .format("memory").queryName(name).outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    val out = spark.table(name)
      .select(col("w.start").cast("timestamp_ntz").as("ws"),
        col("event_type"), col("n"), col("sum_val"))
      .localCheckpoint(true) // see streamedWindowAgg: drop the sink view
    spark.catalog.dropTempView(name)
    out
  }

  /** Incremental tiling ingest (round-2 roadmap #10): a file stream is
    * tile-assigned batch-by-batch and APPENDED to an IcebergLite table via
    * foreachBatch → [[graft.data.IcebergLite.extend]] (file-level appends:
    * each micro-batch adds a snapshot, no partition rewrite). Because the
    * per-partition checksums are XOR-accumulative, the stream-fed table's
    * cumulative manifest state equals a one-shot batch write's — asserted in
    * EngineOpsSpec. Returns the final per-tile counts read through the
    * manifest. */
  def streamedTileIngest(spark: SparkSession, parquetPath: String, table: String,
                         keyCol: String, bits: Int, prefixBits: Int,
                         maxFilesPerTrigger: Int = 0,
                         autoCompactEvery: Int = 0): DataFrame =
    streamedIngest(spark, parquetPath, table, keyCol, maxFilesPerTrigger,
      tile = pos => SpatialOps.withTile(pos, "lon", "lat", bits)
        .withColumn("tile_p", graft.sql.functions.gh_parent(col("tile"), bits, prefixBits)),
      properties = Map(
        graft.data.IcebergLite.PropPrefixBits -> prefixBits.toString,
        graft.data.IcebergLite.PropLonCol -> "lon",
        graft.data.IcebergLite.PropLatCol -> "lat",
        graft.data.IcebergLite.PropIndexType -> "gh"),
      autoCompactEvery = autoCompactEvery)

  /** [[streamedTileIngest]] on the Uber-H3-compatible index: tiles are
    * h3u_cell at tileRes, partitions their ancestor at prefixRes; the first
    * commit records the h3u tiling properties so DeriveCoveringPrune
    * rewrites bare box/PIP filters over the STREAMED table too. */
  def streamedTileIngestH3(spark: SparkSession, parquetPath: String, table: String,
                           keyCol: String, tileRes: Int, prefixRes: Int,
                           maxFilesPerTrigger: Int = 0,
                           autoCompactEvery: Int = 0): DataFrame =
    streamedIngest(spark, parquetPath, table, keyCol, maxFilesPerTrigger,
      tile = pos => pos
        .withColumn("tile", graft.sql.functions.h3u_cell(col("lon"), col("lat"), tileRes))
        .withColumn("tile_p", graft.sql.functions.h3u_parent(col("tile"), prefixRes)),
      properties = Map(
        graft.data.IcebergLite.PropPrefixBits -> prefixRes.toString,
        graft.data.IcebergLite.PropLonCol -> "lon",
        graft.data.IcebergLite.PropLatCol -> "lat",
        graft.data.IcebergLite.PropIndexType -> "h3u"),
      autoCompactEvery = autoCompactEvery)

  /** [[streamedTileIngest]] on the published-layout S2 index: tiles are
    * s2u_cell at tileLevel, partitions their ancestor at prefixLevel; the
    * recorded `tile.index=s2u` makes the streamed table prune-aware via
    * DeriveCoveringPrune's coverBox arm. */
  def streamedTileIngestS2(spark: SparkSession, parquetPath: String, table: String,
                           keyCol: String, tileLevel: Int, prefixLevel: Int,
                           maxFilesPerTrigger: Int = 0,
                           autoCompactEvery: Int = 0): DataFrame =
    streamedIngest(spark, parquetPath, table, keyCol, maxFilesPerTrigger,
      tile = pos => pos
        .withColumn("tile", graft.sql.functions.s2u_cell(col("lon"), col("lat"), tileLevel))
        .withColumn("tile_p", graft.sql.functions.s2u_parent(col("tile"), prefixLevel)),
      properties = Map(
        graft.data.IcebergLite.PropPrefixBits -> prefixLevel.toString,
        graft.data.IcebergLite.PropLonCol -> "lon",
        graft.data.IcebergLite.PropLatCol -> "lat",
        graft.data.IcebergLite.PropIndexType -> "s2u"),
      autoCompactEvery = autoCompactEvery)

  /** Shared micro-batch ingest loop: stream → derive position → tile →
    * first batch CREATES the table (with the tiling properties — streamed
    * tables are prune-aware like batch-written ones), later batches are
    * FILE-LEVEL extends. Returns per-tile counts read through the manifest. */
  private def streamedIngest(spark: SparkSession, parquetPath: String, table: String,
                             keyCol: String, maxFilesPerTrigger: Int,
                             tile: DataFrame => DataFrame,
                             properties: Map[String, String],
                             autoCompactEvery: Int = 0): DataFrame = {
    import graft.data.IcebergLite
    val schema = sourceSchema(spark, parquetPath)
    val f = new java.io.File(parquetPath)
    val (dir, glob) = if (f.isDirectory) (parquetPath, "*") else (f.getParent, f.getName)
    var reader = spark.readStream.schema(schema).option("pathGlobFilter", glob)
    if (maxFilesPerTrigger > 0) reader = reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
    val props =
      if (autoCompactEvery > 0)
        properties + (IcebergLite.PropAutoCompact -> autoCompactEvery.toString)
      else properties
    val stream = reader.parquet(dir).select(col("event_id"), col(keyCol))
    val q = stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      if (!batch.isEmpty) {
        // materialize the tiled INCREMENT once: IcebergLite.write evaluates
        // its input twice (manifest stats pass + file write pass), which
        // re-scanned the batch and re-derived position+tile per pass. The
        // checkpoint is bounded by micro-batch size — the increment, never
        // the table — so this is safe at any corpus scale (guide §5:
        // localCheckpoint as the cheap lineage/materialization cut).
        val tiled = tile(SpatialOps.withDerivedPosition(batch, keyCol))
          .localCheckpoint(true)
        val m =
          if (IcebergLite.readManifest(table).isEmpty)
            IcebergLite.write(tiled, table, "tile_p", properties = props)
          else IcebergLite.extend(tiled, table, "tile_p")
        // snapshots-per-compact hygiene: a long-lived stream must not grow
        // one snapshot dir per micro-batch forever — when the manifest
        // references >= N distinct snapshots, fold them into one and drop
        // the superseded dirs (readers of the PRIOR manifest are unaffected:
        // compact writes a NEW snapshot, expire only removes unreferenced)
        if (autoCompactEvery > 0 &&
            m.entries.iterator.map(_.snapshotId).toSet.size >= autoCompactEvery) {
          IcebergLite.compact(spark, table)
          IcebergLite.expireSnapshots(table)
        }
      }
      ()
    }
    withInputSizedShuffle(spark, parquetPath) {
      val query = q.outputMode("append").start()
      try query.processAllAvailable() finally query.stop()
    }
    IcebergLite.read(spark, table)
      .groupBy("tile").agg(count(lit(1)).as("n")).select("tile", "n")
  }

  final case class DedupRow(fp: Long, doc_id: Long)

  /** Streaming exact dedup — the ingest-time form of the batch dedup
    * family (q30/q31): documents stream in, each gets the canonical
    * 60-bit fingerprint, and the FIRST batch to present a fingerprint
    * emits its minimal doc id; every later occurrence is swallowed by the
    * per-fingerprint state. At 100 TB this is the shape that avoids
    * re-scanning the corpus per increment: state is partitioned by
    * fingerprint (shuffle on the dedup key), so each micro-batch costs
    * O(batch), not O(corpus). Over a single static batch the result
    * equals `GROUP BY fp → min(doc_id)` — the DuckDB oracle (q64). */
  /** `stateTtl` (e.g. "30 minutes"): optional BOUNDED-STATE mode. The
    * default keeps one state entry per distinct fingerprint forever —
    * exact, but on a months-long 100 TB ingest that is unbounded state
    * store growth. With a TTL, a fingerprint's entry expires after that
    * long without a re-sighting, so memory is bounded by the TTL-window
    * throughput; a duplicate arriving later than the TTL re-emits (the
    * standard windowed-dedup tradeoff, stated rather than hidden).
    * Timeouts are processing-time (ingest wall clock). */
  def streamedDedup(spark: SparkSession, parquetPath: String,
                    idCol: String, textCol: String,
                    maxFilesPerTrigger: Int = 0,
                    stateTtl: String = ""): DataFrame = {
    val deduped = streamedDedupStream(spark, parquetPath, idCol, textCol,
      maxFilesPerTrigger, stateTtl)
    val name = s"q64_out_${System.nanoTime()}"
    withInputSizedShuffle(spark, parquetPath) {
      val q = deduped.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    val out = spark.table(name).localCheckpoint(true) // see streamedWindowAgg
    spark.catalog.dropTempView(name)
    out
  }

  /** The unsunk streaming Dataset behind [[streamedDedup]] — exposed so
    * tests (and callers with their own sinks) can drive micro-batches and
    * wall-clock gaps explicitly, which is the only way to observe
    * processing-time TTL expiry deterministically. */
  def streamedDedupStream(spark: SparkSession, parquetPath: String,
                          idCol: String, textCol: String,
                          maxFilesPerTrigger: Int = 0,
                          stateTtl: String = ""): Dataset[DedupRow] = {
    import spark.implicits._
    val schema = sourceSchema(spark, parquetPath)
    val f = new java.io.File(parquetPath)
    val (dir, glob) = if (f.isDirectory) (parquetPath, "*") else (f.getParent, f.getName)
    var reader = spark.readStream.schema(schema).option("pathGlobFilter", glob)
    if (maxFilesPerTrigger > 0) reader = reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
    val docs = reader.parquet(dir).select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val fps = TextOps.fingerprint(docs, "doc_id", "text").as[(Long, Long)]
    val timeout =
      if (stateTtl.isEmpty) GroupStateTimeout.NoTimeout
      else GroupStateTimeout.ProcessingTimeTimeout
    fps.groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(dedupHandler(stateTtl))
  }

  /** The per-fingerprint state handler behind [[streamedDedupStream]] —
    * a named function so the TTL branches are unit-testable with
    * TestGroupState (processing-time expiry cannot be driven
    * deterministically through a running query). */
  private[engine] def dedupHandler(stateTtl: String)(
      fp: Long, rows: Iterator[(Long, Long)], state: GroupState[Boolean]): Iterator[DedupRow] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else if (state.exists) {
      // re-sighting refreshes the TTL: hot duplicates never expire
      if (stateTtl.nonEmpty) state.setTimeoutDuration(stateTtl)
      Iterator.empty
    } else {
      state.update(true)
      if (stateTtl.nonEmpty) state.setTimeoutDuration(stateTtl)
      Iterator.single(DedupRow(fp, rows.map(_._1).min))
    }

  final case class NearDupCand(doc_a: Long, doc_b: Long)
  /** Per-band-bucket LSH state: `alive = false` marks a bucket that
    * overflowed the cap (boilerplate signal — permanently muted, matching
    * the batch BandBucketCap exclusion from the overflowing batch on). */
  final case class BucketState(alive: Boolean, members: List[Long])

  /** The per-(band, key) bucket handler behind
    * [[streamedNearDupCandidates]] — named for TestGroupState unit tests
    * of the TTL branches. Bounded-state mode: a bucket idle past the TTL
    * (incl. a muted one) is dropped; near-dups separated by more than the
    * TTL window stop pairing — the stated windowed tradeoff.
    * setTimeoutDuration follows each update (the state must be defined
    * when a timeout is armed). */
  private[engine] def nearDupHandler(bucketCap: Int, stateTtl: String)(
      key: (Int, String), rows: Iterator[(Int, String, Long)],
      state: GroupState[BucketState]): Iterator[NearDupCand] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val st = state.getOption.getOrElse(BucketState(alive = true, Nil))
      // a doc id re-arriving in a later micro-batch is NOT a new member:
      // without this filter it would be appended twice (inflating the cap
      // count) and emit a self-pair via the cross product — which the
      // batch lshCandidates op never produces (ADVICE r5)
      val seen = st.members.toSet
      val newIds = rows.map(_._3).filterNot(seen).toArray.distinct.sorted
      if (!st.alive) {
        if (stateTtl.nonEmpty) state.setTimeoutDuration(stateTtl)
        Iterator.empty
      } else if (st.members.size + newIds.length > bucketCap) {
        state.update(BucketState(alive = false, Nil)) // boilerplate bucket
        if (stateTtl.nonEmpty) state.setTimeoutDuration(stateTtl)
        Iterator.empty
      } else {
        state.update(BucketState(alive = true, st.members ++ newIds.toList))
        if (stateTtl.nonEmpty) state.setTimeoutDuration(stateTtl)
        val cross = for (o <- st.members.iterator; n <- newIds.iterator)
          yield NearDupCand(math.min(o, n), math.max(o, n))
        val within = for {
          i <- newIds.indices.iterator
          j <- (i + 1 until newIds.length).iterator
        } yield NearDupCand(newIds(i), newIds(j))
        cross ++ within
      }
    }


  /** Streaming NEAR-dup candidate detection — the ingest-time form of the
    * batch MinHash+LSH pipeline (q32): each arriving document's minhash
    * signature is computed PER ROW (array_min over the affine hash family
    * of its distinct shingles — no stateful aggregation), its band keys
    * are exploded, and a per-(band, key) state holds the bucket's earlier
    * members (capped at `bucketCap`, first-seen-wins). A new member emits
    * candidate pairs against the stored members plus its same-batch bucket
    * peers; a bucket that overflows the cap is muted permanently (the
    * batch op EXCLUDES over-cap buckets as boilerplate — the streaming
    * prefix keeps pairs already emitted, the honest incremental analogue).
    *
    * 100-TB posture: state is partitioned by (band, key) — each
    * micro-batch shuffles only its own band rows, costs O(batch · bands)
    * and holds ≤ cap ids per active bucket; no corpus re-scan, no
    * unbounded state. Over a SINGLE static batch the emitted pair set
    * equals [[TextOps.lshCandidates]] exactly (verified in
    * EngineOpsSpec); exact-jaccard verification is a downstream batch
    * join against the stored corpus (see q67). */
  def streamedNearDupCandidates(spark: SparkSession, parquetPath: String,
                                idCol: String, textCol: String,
                                bucketCap: Int = TextOps.BandBucketCap,
                                maxFilesPerTrigger: Int = 0,
                                stateTtl: String = ""): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.Column
    val schema = sourceSchema(spark, parquetPath)
    val f = new java.io.File(parquetPath)
    val (dir, glob) = if (f.isDirectory) (parquetPath, "*") else (f.getParent, f.getName)
    var reader = spark.readStream.schema(schema).option("pathGlobFilter", glob)
    if (maxFilesPerTrigger > 0) reader = reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
    val docs = reader.parquet(dir).select(col(idCol).as("doc_id"), col(textCol).as("text"))
    // per-row signature: the same affine family as minhashSignatures, but
    // computed per row instead of via a groupBy — the signature needs no
    // shuffle, only the band buckets do. Every s_i derives from the SINGLE
    // masked minimum (affineHash is strictly monotone in h & mask, see
    // TextOps.sigFromMaskedMin): one array pass per doc, not MinhashK.
    val withShingles = docs
      .withColumn("_w", TextOps.tokens(col("text")))
      .where(size(col("_w")) >= 3)
      .withColumn("_m", array_min(transform(array_distinct(TextOps.shingles3(col("_w"))),
        sh => TextOps.hash60(sh).bitwiseAND(lit(TextOps.AffineMask)))))
    val sigs: Seq[Column] = (0 until TextOps.MinhashK).map(i =>
      TextOps.sigFromMaskedMin(col("_m"), i).as(s"s$i"))
    val rowsPerBand = TextOps.MinhashK / TextOps.Bands
    val signed = withShingles.select(col("doc_id") +: sigs: _*)
    val bandKey = (b: Int) => concat_ws("_",
      (0 until rowsPerBand).map(r => col(s"s${b * rowsPerBand + r}").cast("string")): _*)
    val bands = signed.select(col("doc_id"),
      explode(array((0 until TextOps.Bands).map(b =>
        struct(lit(b).as("band"), bandKey(b).as("key"))): _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"), col("doc_id"))
      .as[(Int, String, Long)]
    val timeout =
      if (stateTtl.isEmpty) GroupStateTimeout.NoTimeout
      else GroupStateTimeout.ProcessingTimeTimeout
    val cands = bands.groupByKey { case (band, key, _) => (band, key) }
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        nearDupHandler(bucketCap, stateTtl))
    val name = s"q67_out_${System.nanoTime()}"
    withInputSizedShuffle(spark, parquetPath) {
      val q = cands.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    val out = spark.table(name).distinct() // a pair may surface from several bands
      .localCheckpoint(true) // see streamedWindowAgg: drop the sink view
    spark.catalog.dropTempView(name)
    out
  }

  // TIMESTAMP_NTZ columns (parquet timestamps without tz) map to
  // LocalDateTime in typed Datasets — keeping NTZ end-to-end matches the
  // naive timestamps the DuckDB oracle produces.
  final case class Ev(user_id: Long, ts: java.time.LocalDateTime)
  final case class OpenSession(startUs: Long, lastUs: Long, n: Long)
  final case class Session(user_id: Long, session_start: java.time.LocalDateTime,
                           session_end: java.time.LocalDateTime, n: Long)

  private def us(t: java.time.LocalDateTime): Long = {
    val i = t.toInstant(java.time.ZoneOffset.UTC)
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }
  private def tsOf(u: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(u / 1000000L, (u % 1000000L).toInt * 1000,
      java.time.ZoneOffset.UTC)

  /** Stateful sessionization via flatMapGroupsWithState: per-user event
    * sessions split on gaps > `gapUs`; CLOSED sessions are emitted, the
    * open tail lives in the state store across micro-batches. Events must
    * arrive in ts-nondecreasing batches per user (file order in tests). */
  def sessionize(spark: SparkSession, parquetPath: String,
                 gapUs: Long, maxFilesPerTrigger: Int = 0): Dataset[Session] = {
    import spark.implicits._
    val schema = sourceSchema(spark, parquetPath)
    val f = new java.io.File(parquetPath)
    val (dir, glob) = if (f.isDirectory) (parquetPath, "*") else (f.getParent, f.getName)
    var reader = spark.readStream.schema(schema).option("pathGlobFilter", glob)
    if (maxFilesPerTrigger > 0) reader = reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
    val events = reader.parquet(dir).select($"user_id", $"ts").as[Ev]

    val sessions = events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, evs: Iterator[Ev], state: GroupState[OpenSession]) => {
          val sorted = evs.map(e => us(e.ts)).toArray.sorted
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          var open = state.getOption
          sorted.foreach { t =>
            open match {
              case Some(s) if t - s.lastUs > gapUs =>
                out += Session(user, tsOf(s.startUs), tsOf(s.lastUs), s.n)
                open = Some(OpenSession(t, t, 1))
              case Some(s) =>
                open = Some(s.copy(lastUs = t, n = s.n + 1))
              case None =>
                open = Some(OpenSession(t, t, 1))
            }
          }
          open.foreach(state.update)
          out.iterator
        })

    val name = s"q51_out_${System.nanoTime()}"
    withInputSizedShuffle(spark, parquetPath) {
      val q = sessions.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    val out = spark.table(name).as[Session]
      .localCheckpoint(true) // see streamedWindowAgg: drop the sink view
    spark.catalog.dropTempView(name)
    out
  }
}
