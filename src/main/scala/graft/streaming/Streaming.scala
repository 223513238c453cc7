package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/**
 * Structured Streaming layer (north-star extension — the reference has no
 * streaming abstractions at all, SURVEY §1.1 "Streams/graphs/time-series").
 * The batch operators above all carry over: a streaming DataFrame accepts the
 * same `Clauses` predicates, projections and aggregations; this module adds the
 * stream-specific pieces — watermarked windowed aggregation and custom
 * per-key state (the streaming analogue of the reference's stateful reducers).
 *
 * Scale notes: windowed aggs are hash-partitioned by (window, key) with
 * watermark-driven state eviction — state size is bounded by
 * (#keys × windows-in-watermark), not by stream length. `sessionize` keeps one
 * small state object per user and times out idle users.
 */
object Streaming {

  /** Normalize an events frame's `ts` column to session-zoned TIMESTAMP,
    * whatever the corpus layout shipped: raw int64 nanos (TIMESTAMP(NANOS)
    * parquet read under `nanosAsLong` — converted with exact integer
    * division, since ns epoch values overflow double precision), or native
    * TIMESTAMP_NTZ (micros layout — a pure cast; the session runs UTC so
    * the instant is unchanged). Every events reader — batch, stream, spec
    * fixtures — goes through this one contract. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  /** Events stream over the driver corpus layout. `ts` arrives however the
    * layout encodes it (int64 nanos or TIMESTAMP_NTZ micros) and is
    * normalized by [[normalizeEventTs]]. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // The file-stream source wants a directory; the corpus ships events as a
    // single file. Expose it through a symlinked temp dir (harness-only shim —
    // production streams tail a real landing directory).
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream_")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Path.of(dir, "events.parquet"))
    streamDir.toFile.deleteOnExit()
    normalizeEventTs(spark.readStream.schema(schema)
      .parquet(streamDir.toString))
  }

  /**
   * Production-faithful replay: stage the events table as `nSplits` files in
   * event-time order and stream them one file per micro-batch. Unlike the
   * single-file replay (one batch — the watermark never advances mid-stream),
   * this drives the watermark forward between batches, so state eviction and
   * append-mode window finalization behave exactly as in a live deployment.
   * Time-sorted splits guarantee no record is ever late, so nothing is
   * dropped; batch k+1's minimum timestamp ≥ batch k's maximum.
   */
  def eventsReplay(spark: SparkSession, dir: String, nSplits: Int): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val schema = batch.schema
    val stageDir = java.nio.file.Files.createTempDirectory("graft_replay_")
    stageDir.toFile.deleteOnExit()
    // one sorted file per split, named in replay order (file-stream sources
    // process discovered files in path order within a batch; one per trigger).
    // repartitionByRange gives contiguous time ranges ordered by partition
    // index — part-NNNNN file numbers ARE the range order — so the whole
    // staging is one distributed range-sort pass, no single-partition global
    // sort and no per-split re-scan.
    batch.repartitionByRange(nSplits, col("ts"), col("event_id"))
      .sortWithinPartitions(col("ts"), col("event_id"))
      .write.mode("overwrite").parquet(stageDir.toString)
    val staged = new java.io.File(stageDir.toString).listFiles().toSeq
    staged.filterNot(_.getName.startsWith("part-")).foreach(_.delete())
    val base = System.currentTimeMillis()
    staged.filter(_.getName.startsWith("part-")).foreach { f =>
      // part-00007-<uuid>.snappy.parquet -> 00007.parquet (stable replay name)
      val idx = f.getName.stripPrefix("part-").takeWhile(_.isDigit)
      val target = java.nio.file.Path.of(s"$stageDir/$idx.parquet")
      java.nio.file.Files.move(f.toPath, target)
      // the file-stream source orders discovered files by MODIFICATION TIME,
      // not name — the one-pass write stamps near-identical mtimes, so restamp
      // them in range order or batches would replay out of time order and the
      // watermark would drop earlier ranges as late
      target.toFile.setLastModified(base + idx.toLong * 1000L)
    }
    normalizeEventTs(spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stageDir.toString))
  }

  /** Watermarked tumbling-window rollup: counts + value sums per
    * (window, event_type). Late rows beyond `watermark` are dropped — the
    * documented completeness/latency tradeoff. */
  def hourlyRollup(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("total_value"))

  /**
   * Exact windowed COUNT(DISTINCT) in a stream, via CHAINED STATEFUL
   * AGGREGATIONS (Spark's multiple-stateful-operator support): the inner
   * aggregation collapses each (hour window, key) to one row; the outer
   * re-windows those rows on `window_time` (the window's inclusive event-time
   * point) and counts the surviving keys. Count-distinct is the one windowed
   * aggregate with no mergeable partial state — this two-stage plan is its
   * exact streaming form, with state bounded by DISTINCT KEYS PER IN-FLIGHT
   * WINDOW (not stream length: closed windows evict on watermark advance).
   * The approximate twin (HLL per window) replaces it only when
   * keys-per-window itself won't fit state.
   *
   * Chained stateful operators require Append output: a window emits when
   * the watermark passes its END. With `watermarkDelay` 0 over a finite
   * replay the watermark stops at max(ts), so the final in-flight window —
   * the one containing max(ts) — never finalizes and is withheld: the
   * completeness/latency contract made visible. A batch oracle replays the
   * exclusion as `HAVING window_end <= max(ts)`.
   */
  def windowDistinct(events: DataFrame, keyCol: String,
      watermarkDelay: String = "0 seconds"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour").as("w"), col(keyCol))
      .agg(count(lit(1)).as("n_rows"))
      .groupBy(window(window_time(col("w")), "1 hour").as("w2"))
      .agg(count(lit(1)).as("n_distinct"), sum(col("n_rows")).as("n_events"))
      .select(col("w2.start").as("hour"), col("n_distinct"), col("n_events"))

  /**
   * Incremental Count-Min sketch maintenance in-stream: the SKETCH IS THE
   * STATE. Each micro-batch's tokens expand to the same (r, bucket) cells
   * the batch sketch uses ([[graft.ops.TextOps.cmsCells]]) and a Complete-mode
   * streaming aggregation keeps the running counters — state is EXACTLY
   * depth × width rows no matter how long the stream runs (the rare
   * stateful operator whose state does not grow with keys, because the
   * sketch hashed the keys away). CM merge is counter-wise sum (linear), so
   * the maintained sketch equals the batch sketch over the same rows — an
   * exact identity, which is what lets a dashboard probe the LIVE sketch
   * with [[graft.ops.TextOps.cmsEstimate]] and get batch-identical answers.
   * No watermark: counters only grow; there is nothing to evict.
   */
  def cmsMaintainStream(docs: DataFrame, textCol: String, depth: Int = 4,
      width: Int = 512): DataFrame =
    graft.ops.TextOps.cmsCells(docs, textCol, depth, width)
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("n"))

  /** Drain a streaming DataFrame into an in-memory table and return it as a
    * batch DataFrame — the local test harness for streaming plans
    * (file-backed streams + AvailableNow = deterministic replay). */
  def runToTable(stream: DataFrame, queryName: String,
      mode: OutputMode = OutputMode.Complete(),
      statePartitions: Option[Int] = None,
      noDataBatch: Boolean = true): DataFrame = {
    val spark = stream.sparkSession
    // Stateful operators allocate one state store per shuffle partition, and
    // each store pays task + snapshot overhead every micro-batch. A streaming
    // query's state partitioning is fixed at first start, so size it to the
    // expected KEY CARDINALITY (not to the session default, which is sized for
    // batch shuffles): measured locally, a ~3.6k-key rollup runs 1.5× faster
    // on 8 partitions than 32. Restored after start — batch queries unaffected.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    statePartitions.foreach(p => spark.conf.set("spark.sql.shuffle.partitions", p))
    // The trailing no-data micro-batch exists to advance the watermark and
    // clean up state AFTER the last data batch. Operators whose OUTPUT needs
    // that advance (append-mode aggregations, session windows) must keep it;
    // ones that emit eagerly (inner stream-stream joins) can skip it in a
    // finite drain — the batch costs a full state-store maintenance round.
    val prevNoData = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    if (!noDataBatch)
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    // State-store provider knob (`graft.streaming.stateStore=rocksdb`, or
    // env GRAFT_STATE_STORE for bench triage): RocksDB keeps per-key state
    // in native memory + local disk with identical semantics (same state
    // encoders, same watermark cleanup) — at PRODUCTION state sizes
    // (millions of keys per partition; state that outgrows executor heaps)
    // it is the right provider, one conf away. It is NOT the default:
    // a matched-canary A/B at sf0.1 (round 17) measured RocksDB 11–36%
    // SLOWER on the stateful suite queries (q80 5.99 s vs 4.39, q140
    // 5.37 s vs 4.83 — native-call + snapshot overhead dominating at
    // thousands-of-keys state), and q140's mid-sweep amplification comes
    // from NEIGHBORING queries' heap garbage, which moving q140's own
    // (tiny) state off-heap cannot fix. Pinned at query start (the conf
    // rides the offset-log metadata), so the restore below cannot affect
    // a running query.
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    if (spark.conf.getOption("graft.streaming.stateStore")
        .orElse(sys.env.get("GRAFT_STATE_STORE"))
        .exists(_.equalsIgnoreCase("rocksdb")))
      spark.conf.set(providerKey, "org.apache.spark.sql.execution." +
        "streaming.state.RocksDBStateStoreProvider")
    try {
      val q = stream.writeStream
        .outputMode(mode)
        .format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prevNoData)
      prevProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
    // Dataset construction analyzes eagerly, so the returned frame's plan
    // already holds the memory sink's relation — the catalog name is no
    // longer needed. Dropping it here keeps repeated drains (bench reps,
    // re-invoked queries) from accumulating in-memory tables for the JVM's
    // lifetime: the sink's rows stay reachable only through the returned
    // DataFrame and are GC-reclaimed with it.
    val out = spark.table(queryName)
    spark.catalog.dropTempView(queryName)
    out
  }

  /**
   * Streaming write-back: merge each micro-batch into a keyed table with the
   * store's increment semantics — the streaming analogue of the reference's
   * reducer→table write path (`ToTableReducer`, SURVEY G8), e.g. a live
   * searchesByDay rollup. `foreachBatch` gives exactly-once-per-batch merge
   * over any sink the batch writer supports.
   */
  /**
   * EXACTLY-ONCE streaming ingest into a
   * [[graft.ops.Dedup.writeNearDupIndex]] layout: every micro-batch dedups
   * against the index and folds its survivors in
   * ([[graft.ops.Dedup.ingestBatch]]), tagged with the micro-batch's
   * epoch id — the composition Structured Streaming's `foreachBatch`
   * contract exists for. On failure the engine REPLAYS the same epoch id,
   * and the commit tag makes the replayed ingest an exact no-op (committed
   * batches short-circuit, partial attempts sweep by file prefix), so the
   * index never double-counts a batch however many times the query
   * restarts. `tagPrefix` namespaces the tags: restarting the stream from
   * a FRESH checkpoint re-issues epoch 0 — reuse the prefix to make the
   * rerun idempotent too (same data replayed), or change it when the new
   * run genuinely carries new data under recycled epoch ids.
   */
  def ingestIntoNearDupIndex(stream: DataFrame, path: String, idCol: String,
      textCol: String, shingleSize: Int = 3, numHashes: Int = 128,
      rowsPerBand: Int = 4, threshold: Double = 0.8,
      tagPrefix: String = "stream"):
      org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        graft.ops.Dedup.ingestBatch(batch.sparkSession, batch.toDF(), path,
          idCol, textCol, shingleSize, numHashes, rowsPerBand, threshold,
          batchId = Some(s"$tagPrefix-$id")): Unit
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /**
   * EXACTLY-ONCE streaming ingest into a
   * [[graft.ops.TextOps.writeBm25Index]] layout — the search-index twin of
   * [[ingestIntoNearDupIndex]]: each micro-batch of documents appends
   * through [[graft.ops.TextOps.appendBm25Index]] under its epoch-id tag
   * (postings + docs membership each tagged; the stats sidecar re-derives
   * from membership on every attempt), so a replayed epoch is an exact
   * no-op and the very next [[graft.ops.TextOps.bm25TopKFromIndex]] probe
   * scores old + new with from-scratch arithmetic however many times the
   * query restarted. The layout must exist ([[graft.ops.TextOps.writeBm25Index]]
   * the base corpus first); `tagPrefix` namespaces epochs as in
   * [[ingestIntoNearDupIndex]].
   *
   * `afterBatch` is the in-loop MAINTENANCE hook, invoked with the epoch id
   * after that epoch's append has fully committed — the natural place for
   * [[graft.store.Compaction.autoMaintain]] / `minorCompactPartitions`:
   * foreachBatch serializes epochs, so the single-maintainer contract holds
   * by construction, and the epoch's commit TAG lands before maintenance
   * folds its files (a later replay still no-ops on the tag — commit
   * markers live at the layout root, untouched by leaf rewrites). The hook
   * re-runs when an epoch replays, so it must be multiset-preserving (every
   * graft maintenance verb is).
   */
  def ingestIntoBm25Index(stream: DataFrame, path: String, idCol: String,
      textCol: String, nBuckets: Int = 64, tagPrefix: String = "stream",
      afterBatch: Long => Unit = _ => ()):
      org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        graft.ops.TextOps.appendBm25Index(batch.toDF(), idCol, textCol, path,
          nBuckets, batchId = Some(s"$tagPrefix-$id"))
        afterBatch(id)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /**
   * EXACTLY-ONCE streaming ingest into a
   * [[graft.ops.Similarity.writeIvfCorpus]] layout — the ANN twin: each
   * micro-batch of vectors routes through the PINNED centroids and appends
   * under its epoch-id tag ([[graft.ops.Similarity.appendIvfCorpus]] →
   * tagged partitioned append), so replayed epochs no-op and probes never
   * surface a vector twice. Centroid drift discipline is the caller's
   * (gate with [[graft.ops.Similarity.ivfLayoutHealth]] between streams);
   * the stream only ever APPENDS under the layout's pinned assignment.
   */
  def ingestIntoIvfCorpus(stream: DataFrame, path: String, idCol: String,
      vecCol: String, cents: Array[Array[Double]],
      tagPrefix: String = "stream"):
      org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        graft.ops.Similarity.appendIvfCorpus(batch.toDF(), idCol, vecCol,
          path, cents, batchId = Some(s"$tagPrefix-$id"))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** EXACTLY-ONCE streaming ingest into a
    * [[graft.ops.Similarity.writeBucketedCorpus]] SRP layout —
    * [[ingestIntoIvfCorpus]]'s twin for the hash-bucketed ANN index
    * (completing streaming-ingest parity across every persisted ANN
    * layout): each micro-batch routes through the pure bucket function
    * and lands under its epoch-id tag, so a replayed epoch is an exact
    * no-op and a crashed partial attempt sweeps on retry
    * ([[graft.store.Compaction.appendTaggedPartitions]] semantics).
    * Probes see old + new through the identical path-pruned scan the
    * moment a batch commits. The base layout must exist. */
  def ingestIntoBucketedCorpus(stream: DataFrame, path: String,
      idCol: String, vecCol: String, nBits: Int = 8,
      scheme: graft.ops.Similarity.SrpScheme = graft.ops.Similarity.SrpScheme.xxh,
      tagPrefix: String = "stream"):
      org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        graft.ops.Similarity.appendBucketedCorpus(batch.toDF(), idCol,
          vecCol, path, nBits, scheme, batchId = Some(s"$tagPrefix-$id"))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /**
   * EXACTLY-ONCE streaming ingest into a [[graft.ops.Dedup.writePairs]]
   * table — the pair-mining twin of [[ingestIntoNearDupIndex]]: each
   * micro-batch mines only its new×new and new×stored pairs through
   * [[graft.ops.Dedup.appendPairs]] under its epoch-id tag (the
   * pairs-first/postings-second two-tag discipline: a replayed epoch
   * no-ops, a crash between the two tables heals on replay, the
   * impossible inverse state rejects loudly), so with `maxDf = None`
   * [[graft.ops.Dedup.readPairs]] over the finished stream is
   * scratch-equal to a single mine of the union corpus however many
   * times the query restarted. The base layout must exist
   * ([[graft.ops.Dedup.writePairs]] first); floors/caps must match the
   * layout's. `tagPrefix` namespaces epochs as in
   * [[ingestIntoNearDupIndex]].
   */
  def ingestIntoPairs(stream: DataFrame, path: String, idCol: String,
      textCol: String, shingleSize: Int = 3, minJaccard: Double = 0.2,
      maxDf: Option[Int] = Some(1000), tagPrefix: String = "stream"):
      org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        graft.ops.Dedup.appendPairs(batch.toDF(), idCol, textCol, path,
          shingleSize, minJaccard, maxDf, batchId = Some(s"$tagPrefix-$id"))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /**
   * Streaming ingest into a PERSISTED CLUSTER layout — the production
   * near-dup loop end-to-end: each micro-batch mines its pairs into the
   * [[graft.ops.Dedup.writePairs]] table via [[ingestIntoPairs]]'
   * epoch-tagged discipline, then folds THIS epoch's pairs into the
   * [[graft.ops.Dedup.writeClusters]] table through
   * [[graft.ops.Dedup.appendToClusters]]' rep-contracted O(delta)
   * maintenance. The epoch's delta is re-derived as "surviving pairs that
   * name a batch id" rather than carried in memory, so replay semantics
   * compose from parts that are each idempotent: a replayed epoch's
   * appendPairs no-ops on its tag, the SAME delta re-reads, and
   * appendToClusters folds it as an exact no-op (all endpoints already
   * share representatives — q255's proven blind-retry contract). However
   * many times the stream restarts, the cluster table equals a
   * from-scratch clustering of the union corpus (the q257 oracle).
   *
   * Both base layouts must exist ([[graft.ops.Dedup.writePairs]] +
   * [[graft.ops.Dedup.writeClusters]] first); floors/caps must match the
   * pairs layout's, `threshold` the clusters'.
   */
  def ingestIntoClusters(stream: DataFrame, pairsPath: String,
      clustersPath: String, idCol: String, textCol: String,
      shingleSize: Int = 3, minJaccard: Double = 0.2,
      maxDf: Option[Int] = Some(1000), threshold: Double = 0.8,
      tagPrefix: String = "stream",
      afterBatch: Long => Unit = _ => ()):
      org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val spark = batch.sparkSession
        graft.ops.Dedup.appendPairs(batch.toDF(), idCol, textCol, pairsPath,
          shingleSize, minJaccard, maxDf, batchId = Some(s"$tagPrefix-$id"))
        val bids = broadcast(batch.toDF()
          .select(col(idCol).as("__bid")).distinct())
        val p = graft.ops.Dedup.readPairs(spark, pairsPath, threshold)
        // pairs naming a batch id on EITHER side; the union may list a
        // both-sides-new pair twice — appendToClusters' edge distinct
        // absorbs that
        val delta = p.join(bids, p("id_a") === col("__bid"), "left_semi")
          .unionByName(p.join(bids, p("id_b") === col("__bid"), "left_semi"))
          .select(col("id_a"), col("id_b"))
        graft.ops.Dedup.appendToClusters(spark, clustersPath, delta): Unit
        // in-loop maintenance hook ([[ingestIntoBm25Index]]'s contract):
        // runs AFTER the epoch's pair tags committed, so the
        // single-maintainer rule holds by construction; replay-safe
        // because every maintenance verb is multiset-preserving. NOTE:
        // compactPairs folds tagged append files into anonymous rows —
        // safe here exactly because it runs after this epoch's tags
        // committed and before any retry could need the sweep.
        afterBatch(id)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  def incrementIntoTable(deltas: DataFrame, tablePath: String,
      keyCol: String = "key"): org.apache.spark.sql.streaming.StreamingQuery =
    deltas.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val exists =
          try { spark.read.parquet(tablePath).schema; true }
          catch { case _: Exception => false }
        if (!exists)
          // bootstrap: increments against an empty table ARE the first values
          // (increment() also pre-sums duplicate keys within the batch), and
          // writeIndexed leaves a range index for every later micro-batch
          graft.store.KeyedStore.writeIndexed(
            graft.store.KeyedStore.increment(batch.limit(0).toDF(), batch.toDF(), keyCol),
            tablePath, keyCol)
        else
          // index-pruned merge: a micro-batch touching k of n key ranges
          // rewrites k files, not the table — the streaming write-back stays
          // O(batch) however large the standing table grows
          graft.store.KeyedStore.incrementIndexed(spark, tablePath, batch.toDF(), keyCol)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /**
   * Streaming exact dedup with BOUNDED state: drop every re-arrival of a key
   * seen within the watermark delay (`dropDuplicatesWithinWatermark`). The
   * streaming twin of `Dedup.exact` for at-least-once ingest pipelines —
   * upstream retries/replays land the same record twice and must not
   * double-count downstream. State holds one entry per distinct key seen in
   * the last `watermark` of event time and is evicted as the watermark
   * advances — O(recent keys), not O(stream length), which is what survives an
   * unbounded 100 TB/day feed (a plain `dropDuplicates` would pin every key
   * forever). The guarantee is exactly the at-least-once contract: duplicates
   * arriving within the delay are dropped, later ones are the upstream's SLA
   * breach to fix.
   */
  def dedupStream(events: DataFrame, keys: Seq[String], tsCol: String = "ts",
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /**
   * Stream-stream interval join: pair each left event with right events of the
   * same key inside `(left.ts, left.ts + window]`. Both sides carry watermarks
   * and the join condition bounds event time on both ends, so Spark can evict
   * join state once the watermark passes — state is O(keys × in-window events),
   * not stream length. The streaming analogue of `Joins.pointInWindow`.
   * Columns: left keeps all its columns; the right contributes `rightTsCol`.
   */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String, window: String): DataFrame = {
    val l = left.withWatermark(leftTsCol, window).alias("l")
    val r = right.withWatermark(rightTsCol, window).alias("r")
    l.join(r,
      expr(s"l.$keyCol = r.$keyCol AND " +
        s"r.$rightTsCol > l.$leftTsCol AND " +
        s"r.$rightTsCol <= l.$leftTsCol + INTERVAL $window"))
      .drop(col(s"r.$keyCol"))
  }

  /**
   * Documents replayed as an `nSplits`-micro-batch stream in doc_id order —
   * the harness twin of [[eventsReplay]] for the text-pipeline operators.
   * Batch assignment is `ntile(nSplits) OVER (ORDER BY doc_id)` — chosen
   * over `repartitionByRange` (whose sampled boundaries are data-dependent)
   * precisely because both engines implement SQL NTILE identically, so a
   * DuckDB oracle can reconstruct each document's micro-batch exactly.
   * Batches carry synthetic event times one hour apart, so the watermark
   * advances between micro-batches as it would on a live feed. The per-split
   * filtered writes are harness-only staging cost (the documents table is
   * tiny next to the corpus facts); production streams tail a real landing
   * directory.
   */
  def docsReplay(spark: SparkSession, dir: String, nSplits: Int): DataFrame =
    tableReplay(spark, dir, "documents", "doc_id", nSplits)

  /** Generic finite-replay source: any of the corpus parquet tables split
    * into `nSplits` micro-batches by ntile over `orderCol` — epoch
    * membership is a pure function of the id set, so a restarted stream
    * re-issues byte-identical epochs (what the exactly-once ingest queries
    * replay against). Staging is cached per (dir, table, nSplits) for the
    * JVM's life (bench warmup + reps reuse the files); a shutdown hook
    * deletes the staged copies. */
  def tableReplay(spark: SparkSession, dir: String, table: String,
      orderCol: String, nSplits: Int): DataFrame = {
    val stage = replayStageCache.computeIfAbsent((dir, table, nSplits), { _ =>
      stageTableReplay(spark, dir, table, orderCol, nSplits)
    })
    val schema = spark.read.parquet(s"$stage/00001.parquet").schema
    spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .parquet(stage)
  }

  private val replayStageCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Int), String]()

  private def stageTableReplay(spark: SparkSession, dir: String,
      table: String, orderCol: String, nSplits: Int): String = {
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet(s"$dir/$table.parquet")
    val stageDir = java.nio.file.Files.createTempDirectory("graft_replay_")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    Runtime.getRuntime.addShutdownHook(new Thread(() => rm(stageDir.toFile)))
    // persisted across the per-split writes: the ntile ranking is ONE
    // single-partition sort pass, not nSplits of them
    val staged = docs.withColumn("batch",
        ntile(nSplits).over(Window.orderBy(col(orderCol))))
      .withColumn("ts",
        timestamp_seconds(lit(1700000000L) + col("batch").cast("long") * 3600L))
      .persist()
    val base = System.currentTimeMillis()
    try {
      (1 to nSplits).foreach { i =>
        val tmp = stageDir.resolve(s"tmp_$i")
        staged.where(col("batch") === i).drop("batch")
          .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = new java.io.File(tmp.toString).listFiles()
          .find(_.getName.startsWith("part-")).get
        // stable replay name + mtime in batch order: the file-stream source
        // orders discovered files by MODIFICATION TIME (see eventsReplay)
        val target = stageDir.resolve(f"$i%05d.parquet")
        java.nio.file.Files.move(part.toPath, target)
        target.toFile.setLastModified(base + i.toLong * 1000L)
        rm(tmp.toFile)
      }
    } finally staged.unpersist(blocking = false)
    stageDir.toString
  }

  /** One (band, doc) row of the streaming LSH layer: `vd` is the doc's
    * verification data — hashed shingle set ([[NearDupVerify.Exact]]) or
    * fixed-size minhash signature ([[NearDupVerify.SignatureFraction]]). */
  final case class BandDoc(band: Int, bsig: Long, id: Long,
    ts: java.sql.Timestamp, vd: Seq[Long])
  final case class BandMember(id: Long, tsMs: Long, vd: Seq[Long])
  final case class BandState(members: List[BandMember])

  /** In-stream verification mode for [[nearDupDropStream]] — the
    * bandwidth/accuracy dial of the streaming near-dup layer. */
  sealed trait NearDupVerify
  object NearDupVerify {
    /** Verify EXACT Jaccard on the hashed shingle sets: zero false drops,
      * zero misses among band collisions, at the cost of the shingle array
      * (~8 B/token) riding to every band bucket. */
    case object Exact extends NearDupVerify
    /** Estimate Jaccard as the fraction of matching minhash slots: state is
      * one FIXED-SIZE signature per member (numHashes × 8 B — 1 KB at the
      * 128 default) regardless of document length, the bandwidth-bounded
      * deployment for long-document feeds. The estimator is unbiased with
      * stderr ≈ sqrt(j(1-j)/numHashes) (~0.035 at j=0.8, numHashes=128), so
      * borderline pairs can land on the wrong side of the threshold in
      * either direction. */
    case object SignatureFraction extends NearDupVerify
  }
  /** A near-dup drop event: `id` arrived with exact Jaccard ≥ threshold
    * against earlier-arriving `partner_id` (one record per colliding band —
    * consumers `distinct` on `id`). */
  final case class NearDupDrop(id: Long, partner_id: Long, ts: java.sql.Timestamp)

  private def exactJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    val sa = new java.util.HashSet[java.lang.Long](a.size * 2)
    a.foreach(x => sa.add(x))
    var inter = 0
    b.foreach(x => if (sa.contains(x)) inter += 1)
    inter.toDouble / (a.size + b.size - inter)
  }

  /** Jaccard estimate from two equal-length minhash signatures: the fraction
    * of matching slots (the classic unbiased minhash estimator). */
  private[graft] def signatureFraction(a: Seq[Long], b: Seq[Long]): Double = {
    require(a.size == b.size, "signatures must have equal length")
    var eq = 0
    var i = 0
    while (i < a.size) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.size
  }

  /**
   * Streaming MinHash near-dup detection with BOUNDED state — the streaming
   * twin of `Dedup.minHashLSH`, completing the streaming story for the
   * LLM-pipeline surface ([[dedupStream]] is exact-only): emit a
   * [[NearDupDrop]] for every arriving document whose EXACT Jaccard (verified
   * in-stream on hashed shingle sets, same contract as the batch operator)
   * reaches `threshold` against any document seen in an EARLIER micro-batch
   * within the watermark. Survivors = arriving docs minus distinct dropped
   * ids (an anti-join at the sink or downstream batch stage).
   *
   * Mechanics: minhash signatures band exactly as in the batch LSH; state
   * lives per (band, bsig) key and holds the members seen within the
   * watermark, so a collision compares the arrival against every earlier
   * bucket member — the "compare against all earlier docs" greedy rule
   * (same-batch arrivals never compare: ties admit both, which keeps the
   * rule deterministic under intra-batch ordering). Entries older than the
   * watermark are pruned on access and idle bands are REMOVED wholesale via
   * EventTimeTimeout — state is O(docs in the last `watermark` × bands), not
   * stream length.
   *
   * Scale notes for a 100 TB/day feed: with the default
   * [[NearDupVerify.Exact]] the shingle-hash array rides to every band
   * bucket (numHashes/rowsPerBand ≈ 32× fan-out of an ~8 B/shingle array) —
   * the price of exact in-stream verification; it buys zero false drops.
   * [[NearDupVerify.SignatureFraction]] caps the per-member payload at ONE
   * fixed-size signature (1 KB at the defaults) independent of document
   * length — the bandwidth-bounded deployment — estimating Jaccard as the
   * matching-minhash fraction, which can misjudge borderline pairs (stderr
   * ~0.035 at the defaults; see the spec's planted borderline pair). Use
   * this operator for ingest-rate dedup against the recent window;
   * corpus-scale historical dedup stays with the batch `minHashLSH` +
   * `clusterDuplicates` path.
   */
  def nearDupDropStream(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String = "ts", watermark: String = "1 hour",
      shingleSize: Int = 3, numHashes: Int = 128, rowsPerBand: Int = 4,
      threshold: Double = 0.8,
      verify: NearDupVerify = NearDupVerify.Exact): Dataset[NearDupDrop] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import graft.functions.GraftFunctions.{shingle_hashes, minhash_signature_from_hashes, minhash_bands}
    // the verification payload that rides to each band bucket: the shingle
    // set itself (exact) or the already-computed fixed-size signature
    val vdCol = verify match {
      case NearDupVerify.Exact             => col("th")
      case NearDupVerify.SignatureFraction => col("sig")
    }
    val similar: (Seq[Long], Seq[Long]) => Boolean = verify match {
      case NearDupVerify.Exact =>
        (a, b) => exactJaccard(a, b) >= threshold
      case NearDupVerify.SignatureFraction =>
        (a, b) => signatureFraction(a, b) >= threshold
    }
    val banded = docs
      .withWatermark(tsCol, watermark)
      .select(col(idCol).as("id"), col(tsCol).as("ts"),
        array_distinct(shingle_hashes(split(col(textCol), " "), shingleSize)).as("th"))
      .select(col("id"), col("ts"), col("th"),
        minhash_signature_from_hashes(col("th"), numHashes).as("sig"))
      .select(col("id"), col("ts"), vdCol.as("vd"),
        explode(minhash_bands(col("sig"), rowsPerBand)).as("b"))
      .select(col("b.band").as("band"), col("b.sig").as("bsig"),
        col("id"), col("ts"), col("vd"))
      .as[BandDoc]
    banded.groupByKey(r => (r.band, r.bsig))
      .flatMapGroupsWithState[BandState, NearDupDrop](OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        case (_, _, state: GroupState[BandState]) if state.hasTimedOut =>
          state.remove() // idle band past the watermark: evict wholesale
          Iterator.empty
        case (_, rows, state: GroupState[BandState]) =>
          val arriving = rows.toArray.sortBy(_.id)
          val wm = state.getCurrentWatermarkMs()
          // prune members older than the watermark (same eviction rule as
          // dropDuplicatesWithinWatermark): they can no longer be partners
          val live = state.getOption.map(_.members).getOrElse(Nil)
            .filter(_.tsMs >= wm)
          val drops = arriving.flatMap { d =>
            live.collectFirst {
              case m if similar(m.vd, d.vd) =>
                NearDupDrop(d.id, m.id, d.ts)
            }
          }
          // ALL arrivals join the bucket, dropped ones included — "earlier
          // doc" means any earlier arrival, matching the batch greedy rule
          // (and the oracle's earlier-batch-partner replay)
          state.update(BandState(
            live ++ arriving.map(d => BandMember(d.id, d.ts.getTime, d.vd)).toList))
          val newest = (wm :: live.map(_.tsMs) :::
            arriving.map(_.ts.getTime).toList).max
          state.setTimeoutTimestamp(newest, watermark)
          drops.iterator
      }
  }

  /**
   * Streaming windowed term counts — the trending-terms / vocabulary-drift
   * monitor of an ingest pipeline: explode tokens, count per (tumbling
   * window, token). Standard watermarked windowed aggregation, so state is
   * bounded by (windows-in-watermark × vocabulary) and append mode
   * finalizes a window when the watermark passes it; drain with Complete
   * when the monitor wants the still-open tail windows too (the q107
   * deployment). Downstream ranking (top-k per window) is a batch window
   * function over the drained table — rank is not a streaming operator.
   *
   * Scale shape: explode → map-side partial count → one shuffle keyed by
   * (window, token); text never shuffles, only (token, partial-count)
   * pairs. Vocabulary skew (the "the" problem) is absorbed by the partial
   * aggregation — each partition contributes one row per hot token.
   */
  def termTrends(docs: DataFrame, textCol: String, tsCol: String = "ts",
      windowDur: String = "1 hour", watermark: String = "10 minutes"): DataFrame = {
    import graft.functions.GraftFunctions.tokens
    docs.withWatermark(tsCol, watermark)
      .select(col(tsCol).as("ts"),
        explode(tokens(lower(col(textCol)))).as("tok"))
      .groupBy(window(col("ts"), windowDur), col("tok"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("tok"), col("n"))
  }

  /** An admission: `id` was admitted as the `rank`-th row of `group`
    * (1 ≤ rank ≤ quota). */
  final case class QuotaAdmit(group: String, id: Long, rank: Long)

  /**
   * Streaming per-group admission quota — ingest rate control: admit each
   * group's first `quota` rows over the stream's lifetime and drop the rest,
   * the "at most k pages per domain this crawl" gate applied AT INGEST (the
   * streaming twin of [[graft.ops.Sampling.capPerGroup]], which caps an
   * already-landed corpus). Emits one [[QuotaAdmit]] per admitted row;
   * everything else is dropped silently.
   *
   * Arrival order within a micro-batch is engine scheduling noise, so
   * admission within (group, batch) is by ascending id — under the resulting
   * total order (batch, id) the admitted set is a pure function of the batch
   * assignment and replays relationally: a row is admitted iff its
   * row_number over (PARTITION BY group ORDER BY batch, id) is ≤ quota, and
   * `rank` equals that row_number (the q105 oracle asserts both).
   *
   * Scale shape: state is ONE long counter per group — no payload, no
   * watermark, no eviction problem; at web scale that is O(#domains) longs
   * spread uniformly over the state-store partitions by group hash. The
   * quota check runs before any downstream work, so over-quota rows cost
   * one counter read at ingest bandwidth.
   */
  def quotaAdmitStream(docs: DataFrame, idCol: String, groupCol: String,
      quota: Int): Dataset[QuotaAdmit] = {
    require(quota >= 0, "quota must be non-negative")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(groupCol).cast("string").as("_1"),
        col(idCol).cast("long").as("_2"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, QuotaAdmit](OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        case (g, rows, state: GroupState[Long]) =>
          var n = state.getOption.getOrElse(0L)
          val admitted = rows.map(_._2).toArray.sorted.flatMap { id =>
            if (n < quota) { n += 1; Some(QuotaAdmit(g, id, n)) } else None
          }
          state.update(n)
          admitted.iterator
      }
  }

  final case class ReservoirMember(priority: Long, id: Long)
  final case class ReservoirState(version: Long, members: List[ReservoirMember])
  /** One row of a shard's current sample membership as of `version` (the
    * shard's update counter — the batch gate keeps each shard's latest). */
  final case class ReservoirEmit(shard: Int, version: Long, id: Long,
    priority: Long)

  /**
   * Deterministic streaming k-sample — a uniform "reservoir" over an
   * unbounded stream with ZERO RNG: every row's priority is its 60-bit md5
   * (a fixed uniform hash of the id), and the sample is simply the k
   * smallest priorities seen so far. Unlike the classic randomized
   * reservoir (Vitter's Algorithm R — state machine depends on arrival
   * order and a RNG stream), this sample is a PURE FUNCTION of the id SET:
   * any arrival order, any batch assignment, any engine produces the same
   * members — which is what makes it oracle-checkable and what makes a
   * re-run reproducible. It is the streaming twin of
   * [[graft.ops.Sampling]]'s md5 samplers.
   *
   * Mechanics: rows hash-shard by priority into `shards` state groups;
   * each shard keeps its k smallest (priority, id) members (the global
   * top-k is always contained in the union of per-shard top-k) and, on
   * every batch that touches it, emits its FULL current membership stamped
   * with a bumped `version` (Update-mode emission — membership can shrink
   * a previously emitted row out of the sample, which Append mode cannot
   * express). The finite-stream gate takes each shard's latest version,
   * then the global k smallest (priority, id) — see the q220 composition.
   *
   * Scale shape: state is `shards·k` (priority, id) pairs — bounded and
   * tunable, no watermark, no eviction problem; emission bandwidth is at
   * most `k` rows per touched shard per batch. Each batch row folds into a
   * k-capped ordered set — O(log k) per row, O(k) heap, the batch itself
   * never materializes.
   */
  def reservoirSampleStream(docs: DataFrame, idCol: String, k: Int,
      shards: Int = 16): Dataset[ReservoirEmit] = {
    require(k > 0, "k must be positive")
    require(shards > 0, "shards must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("_1"),
        graft.functions.GraftFunctions.md5_prefix60(col(idCol).cast("string"))
          .as("_2"))
      .as[(Long, Long)]
      .groupByKey { case (_, h) => (h % shards).toInt }
      .flatMapGroupsWithState[ReservoirState, ReservoirEmit](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (shard, rows, state: GroupState[ReservoirState]) =>
          val prev = state.getOption.getOrElse(ReservoirState(0L, Nil))
          // BOUNDED fold: the batch iterator streams through a k-capped
          // sorted set (O(n log k) time, O(k) heap — never materialize the
          // batch). An ordered set also collapses replayed duplicates for
          // free: the sample stays a pure function of the id set.
          val acc = scala.collection.mutable.TreeSet.empty[(Long, Long)]
          prev.members.foreach(m => acc += ((m.priority, m.id)))
          val ord = implicitly[Ordering[(Long, Long)]]
          rows.foreach { case (id, h) =>
            if (acc.size < k) acc += ((h, id))
            else if (ord.lt((h, id), acc.last)) { acc += ((h, id))
              if (acc.size > k) acc -= acc.last }
          }
          val merged = acc.toList.take(k)
            .map { case (h, id) => ReservoirMember(h, id) }
          val next = ReservoirState(prev.version + 1, merged)
          state.update(next)
          merged.iterator.map(m =>
            ReservoirEmit(shard, next.version, m.id, m.priority))
      }
  }

  /** An admission: `id` (carrying `tokens`) was admitted for `group`, whose
    * running admitted-token total is now `cum_tokens`. */
  final case class BudgetAdmit(group: String, id: Long, tokens: Long,
    cum_tokens: Long)

  /**
   * Streaming per-group TOKEN-BUDGET admission — the enforcement half of a
   * batch allocation plan ([[graft.ops.Sampling.waterFill]] computes "source
   * s gets B_s tokens"; this gate makes the live ingest OBEY it): each
   * group's documents are admitted FIRST-FIT — a doc enters iff its tokens
   * still fit under the group's remaining budget; an oversized doc is
   * dropped WITHOUT consuming budget, so later smaller docs can still fill
   * the gap (the greedy rule, strictly better than cutting the feed at the
   * first overflow). State is ONE long (admitted-token total) per group.
   *
   * Determinism: admission within (group, batch) is by ascending id — under
   * the (batch, id) total order the admitted set is a pure function of the
   * batch assignment and the budget map; the first-fit recursion replays
   * relationally as a per-group recursive fold (the q185 oracle). Zero-token
   * docs admit without consuming. Groups absent from `budgets` admit
   * nothing.
   *
   * Scale shape: the budget map is a driver broadcast (group-cardinality);
   * state is O(#groups) longs; over-budget rows cost one comparison at
   * ingest bandwidth.
   */
  def budgetAdmitStream(docs: DataFrame, idCol: String, groupCol: String,
      tokensCol: String, budgets: Map[String, Long]): Dataset[BudgetAdmit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bmap = spark.sparkContext.broadcast(budgets)
    docs.select(col(groupCol).cast("string").as("_1"),
        col(idCol).cast("long").as("_2"),
        col(tokensCol).cast("long").as("_3"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, BudgetAdmit](OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        case (g, rows, state: GroupState[Long]) =>
          val budget = bmap.value.getOrElse(g, 0L)
          var used = state.getOption.getOrElse(0L)
          val admitted = rows.toArray.sortBy(_._2).flatMap {
            case (_, id, t) =>
              if (t >= 0 && used + t <= budget) {
                used += t; Some(BudgetAdmit(g, id, t, used))
              } else None
          }
          state.update(used)
          admitted.iterator
      }
  }

  /**
   * Ingest-time decontamination: drop arriving documents whose shingle
   * overlap with a STATIC train/eval split exceeds the rational rate
   * `maxRateNum / maxRateDen` (default 1/5 = 0.2) — the streaming
   * deployment of [[graft.ops.TextOps.contaminationBloomFlags]] (one bloom
   * blob built at stream construction; per-row probe; STATELESS, so the
   * plan carries no watermark or state store and runs at ingest bandwidth).
   * The keep predicate is INTEGER arithmetic —
   * `n_contaminated · maxRateDen <= n_shingles · maxRateNum` — so the
   * shipped comparison is literally the contract q84's oracle asserts (no
   * float-division rounding at the boundary; the rate is a ratio of counts,
   * which a rational threshold compares exactly).
   * Bloom false positives only OVERCOUNT, so the stream drops a SUPERSET of
   * the exact rule — the safe direction for decontamination (an exact pass
   * downstream can rescue borderline docs; nothing contaminated slips by).
   * NULL-text rows are KEPT (nothing to match — without the explicit guard
   * the NULL rate would silently drop them); empty/short docs follow the
   * shingle contract (one whole-text shingle). Survivors keep their columns
   * plus (n_shingles, n_contaminated).
   */
  def decontaminateStream(docs: DataFrame, train: DataFrame, idCol: String,
      textCol: String, shingleSize: Int = 3, maxRateNum: Long = 1L,
      maxRateDen: Long = 5L, expectedItems: Long = 4000000L,
      fpp: Double = 0.01): DataFrame = {
    require(maxRateDen > 0 && maxRateNum >= 0 && maxRateNum <= maxRateDen,
      "maxRateNum/maxRateDen must be a rate in [0, 1]")
    // The keep predicate multiplies counts by den/num as Longs; with ANSI off
    // an overflow would wrap negative and silently INVERT the comparison.
    // n_shingles is an int (< 2^31), so den <= 10^9 bounds both products at
    // ~2.1e18 < Long.MaxValue. 10^9 is far finer than any meaningful
    // contamination-rate precision.
    require(maxRateDen <= 1000000000L,
      s"maxRateDen must be <= 1e9 (overflow-safe bound), got $maxRateDen")
    graft.ops.TextOps.contaminationBloomFlags(docs, train, idCol, textCol,
        shingleSize, expectedItems, fpp)
      .where(col(textCol).isNull ||
        col("n_contaminated") * maxRateDen <= col("n_shingles") * maxRateNum)
  }

  /**
   * Conformally-calibrated streaming admission — the [[decontaminateStream]]
   * discipline (all reference state built ONCE at construction, per-row
   * stateless probe) applied to the split-conformal gate
   * ([[graft.ops.Audit.conformalGate]]): the threshold is the
   * `⌈(n+1)(1000−α)/1000⌉`-th smallest calibration nonconformity, collected
   * driver-side ([[graft.ops.Audit.conformalThreshold]]) and applied as a
   * LITERAL comparison — so the stream plan has no state store, no
   * watermark, no shuffle, and the distribution-free ≥(1−α) admission
   * guarantee holds for every exchangeable batch the stream carries. A
   * too-small calibration set (k > n) yields a null threshold and admits
   * everything. Rows with a NULL score are dropped (no score, no
   * guarantee — unlike text-less rows in decontamination, which are
   * provably clean). Emits admitted rows only:
   * (id, score, n_calib, threshold).
   */
  def conformalAdmitStream(stream: DataFrame, calibration: DataFrame,
      idCol: String, scoreCol: String,
      alphaPermille: Int = 100): DataFrame = {
    val (n, thr) = graft.ops.Audit.conformalThreshold(
      calibration, scoreCol, alphaPermille)
    val keep = thr.map(t => col(scoreCol).cast("long") <= t)
      .getOrElse(lit(true))
    stream.where(col(scoreCol).isNotNull && keep)
      .select(col(idCol), col(scoreCol).cast("long").as("score"),
        lit(n).as("n_calib"),
        thr.map(lit(_)).getOrElse(lit(null)).cast("long").as("threshold"))
  }

  /** `ts` rides along (even though `ts_us` drives the logic) so the input's
    * watermark column survives the projection — EventTimeTimeout requires a
    * watermarked column to be visible at the stateful operator. */
  final case class SessionEvent(user_id: Long, ts_us: Long, ts: java.sql.Timestamp)
  final case class SessionCount(user_id: Long, n_sessions: Long, n_events: Long)
  final case class SessionState(lastTsUs: Long, nSessions: Long, nEvents: Long)

  /**
   * Stateful sessionization via `flatMapGroupsWithState` — the streaming
   * analogue of the batch window-lag sessionize (SparkEntry q13): a new session
   * starts after `gapSeconds` of inactivity. State per user is O(1).
   *
   * `idleTimeout` bounds state in continuous deployments: when set (and the
   * input carries a watermark — required by `EventTimeTimeout`), a user idle
   * past the timeout has their state REMOVED once the watermark passes
   * `lastEvent + idleTimeout` — total state is O(recently-active users), not
   * O(all users ever seen). A user returning after eviction restarts their
   * cumulative counts (by then the inactivity gap has started a new session
   * anyway — downstream consumers fold the per-emission counts). `None` keeps
   * unbounded state for finite replays (the oracle drain).
   */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800,
      idleTimeout: Option[String] = None): Dataset[SessionCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("ts"))
      .as[SessionEvent]
    val timeoutConf = if (idleTimeout.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionCount](
        OutputMode.Append(), timeoutConf) {
        case (_, _, state: GroupState[SessionState]) if state.hasTimedOut =>
          state.remove() // idle past the timeout: evict, emit nothing
          Iterator.empty
        case (uid, it, state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(_.ts_us)
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          sorted.foreach { e =>
            val gap = st.lastTsUs == Long.MinValue ||
              (e.ts_us / 1000000L - st.lastTsUs / 1000000L) > gapSeconds
            st = SessionState(e.ts_us, st.nSessions + (if (gap) 1 else 0), st.nEvents + 1)
          }
          state.update(st)
          idleTimeout.foreach { t =>
            state.setTimeoutTimestamp(st.lastTsUs / 1000L, t) // last event + idle
          }
          Iterator(SessionCount(uid, st.nSessions, st.nEvents))
      }
  }
}
