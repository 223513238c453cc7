package graft

import org.apache.spark.sql.functions._
import graft.streaming.Streaming

/**
 * Streaming layer: file-replay determinism of the windowed rollup vs its batch
 * equivalent, and stateful sessionization parity with the batch window-lag
 * formulation (q13).
 */
class StreamingSpec extends SparkSpec {
  _quiet

  test("hourlyRollup over a file stream equals the batch aggregation") {
    val streamed = Streaming.runToTable(
      Streaming.hourlyRollup(Streaming.eventsStream(spark, sf())),
      "t_stream_hourly")
    val batch = SparkEntry.queries("q31_stream_hourly") // same shape, own sink
    val expect = {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      Streaming.normalizeEventTs(
          spark.read.parquet(s"${sf()}/events.parquet"))
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
    }
    val a = streamed.orderBy("hour", "event_type").collect().map(_.toSeq)
    val b = expect.orderBy("hour", "event_type").collect().map(_.toSeq)
    assert(a.length == b.length && a.zip(b).forall { case (x, y) => x == y })
  }

  test("multi-batch replay: watermark advances, append finalizes exactly the " +
      "closed windows, state is evicted") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val stream = Streaming.eventsReplay(spark, sf(), nSplits = 4)
    val agg = Streaming.hourlyRollup(stream, watermark = "1 hour")
    val name = "t_replay_append"
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val progress = q.recentProgress
    assert(progress.count(_.numInputRows > 0) >= 4, "expected one batch per split")
    // append emits a window only once its end passes the watermark: the final
    // watermark is maxTs - 1h, so emitted windows = batch windows that closed
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = Streaming.normalizeEventTs(
      spark.read.parquet(s"${sf()}/events.parquet"))
    val maxTs = events.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val watermarkUs = maxTs - 3600L * 1000000L
    val closed = events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .where(unix_micros(col("hour")) + 3600L * 1000000L <= watermarkUs)
    val a = spark.table(name).orderBy("hour", "event_type").collect().map(_.toSeq)
    val b = closed.orderBy("hour", "event_type").collect().map(_.toSeq)
    assert(a.length == b.length && a.zip(b).forall { case (x, y) => x == y },
      s"append emitted ${a.length} windows, batch closed ${b.length}")
    // eviction: final state rows < total distinct windows (closed ones left)
    val lastState = progress.filter(_.stateOperators.nonEmpty)
      .last.stateOperators.head.numRowsTotal
    val totalWindows = events
      .select(date_trunc("hour", col("ts")), col("event_type")).distinct().count()
    assert(lastState < totalWindows,
      s"state rows $lastState should be below $totalWindows after eviction")
  }

  test("streaming write-back: micro-batch increments merge into a keyed table " +
      "(bootstrap then index-pruned merges)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_swb").resolve("t").toString
    // 4 single-file batches: batch 0 bootstraps the indexed table, batches
    // 1-3 go through the index-pruned incrementIndexed path
    val deltas = Streaming.eventsReplay(spark, sf(), nSplits = 4)
      .select(col("user_id").cast("string").as("key"), lit(1L).as("n_events"))
    val q = Streaming.incrementIntoTable(deltas, dir)
    q.awaitTermination()
    assert(new java.io.File(dir).listFiles.exists(_.getName.startsWith("_graft_index")),
      "write-back table should carry the range index")
    // read through the connector: post-merge the dir also holds the replaced
    // originals as keep-one-back strays (invisible to manifest-index readers)
    val merged = graft.store.KeyedStore.readKeyed(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = SparkEntry.queries("q13_sessionize")(spark, sf())
      .collect().map(r => r.getLong(0).toString -> r.getLong(2)).toMap
    assert(merged == expect) // per-user event counts match the batch world
  }

  test("sessionize with idleTimeout evicts idle users' state as the watermark passes") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType)))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // three single-file batches: user 1 appears only in the first; user 2 keeps
    // the stream alive, driving the watermark past user 1's idle timeout
    val dir = java.nio.file.Files.createTempDirectory("graft_evict_")
    Seq(
      Seq((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:00:05"))),
      Seq((2L, ts("2024-01-01 14:00:00"))),
      Seq((2L, ts("2024-01-01 18:00:00")))
    ).zipWithIndex.foreach { case (rows, i) =>
      import spark.implicits._
      val staged = s"$dir/stage_$i"
      rows.toDF("user_id", "ts").coalesce(1).write.parquet(staged)
      val part = new java.io.File(staged).listFiles().find(_.getName.startsWith("part-")).get
      java.nio.file.Files.move(part.toPath, java.nio.file.Path.of(s"$dir/" + f"$i%05d.parquet"))
    }
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.toString)
      .withWatermark("ts", "10 minutes")
    val q = Streaming.sessionize(stream, idleTimeout = Some("1 hour")).toDF()
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("t_evict")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // user 1's timeout (10:00 + 1h) is far below the final watermark
    // (18:00 - 10m): their state row must be gone; user 2 stays live
    val finalState = q.recentProgress.filter(_.stateOperators.nonEmpty)
      .last.stateOperators.head
    assert(finalState.numRowsTotal == 1,
      s"expected only user 2's state to survive, had ${finalState.numRowsTotal} rows")
    // and eviction changed no emitted counts: user 1 emitted once, with 1 session
    val u1 = spark.table("t_evict").where(col("user_id") === 1).collect()
    assert(u1.map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((1L, 1L)))
    // user 2's final emission saw all 3 events as 3 sessions (4h gaps)
    val u2 = spark.table("t_evict").where(col("user_id") === 2)
      .orderBy(col("n_events").desc).head()
    assert((u2.getLong(1), u2.getLong(2)) == (3L, 3L))
  }

  test("dedupStream drops re-arrivals across micro-batches, keeps first-seen row") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("ts", TimestampType),
      StructField("tag", StringType)))
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_").toString
    def write(name: String, mtime: Long, rows: Seq[(Long, String, String)]): Unit = {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (id, t, tag) =>
          org.apache.spark.sql.Row(id, java.sql.Timestamp.valueOf(t), tag)
        }), schema)
      val tmp = dir + "/_stage"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.startsWith("part-")).get
      val target = new java.io.File(dir, name)
      java.nio.file.Files.move(part.toPath, target.toPath)
      target.setLastModified(mtime) // file-stream source orders by mtime
    }
    val base = System.currentTimeMillis()
    write("00.parquet", base, Seq(
      (1L, "2024-01-01 10:00:00", "first"),
      (2L, "2024-01-01 10:01:00", "first"),
      (3L, "2024-01-01 10:02:00", "first")))
    write("01.parquet", base + 1000, Seq(
      (3L, "2024-01-01 10:20:00", "RETRY"), // re-arrival within 1h watermark
      (4L, "2024-01-01 10:21:00", "first")))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val out = Streaming.runToTable(
      Streaming.dedupStream(stream, Seq("id"), "ts", "1 hour"),
      "t_dedup", org.apache.spark.sql.streaming.OutputMode.Append())
      .orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    // id 3 survives with its FIRST occurrence, the later retry row is dropped
    assert(out.find(_.getLong(0) == 3L).get.getString(2) == "first")
  }

  test("termTrends: streaming windowed token counts equal the batch aggregation") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("text", StringType)))
    val dir = java.nio.file.Files.createTempDirectory("graft_trend_").toString
    val rows = Seq(
      ("2024-01-01 10:05:00", "alpha beta alpha"),
      ("2024-01-01 10:45:00", "beta gamma"),
      ("2024-01-01 11:10:00", "alpha alpha alpha"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (t, x) =>
        org.apache.spark.sql.Row(java.sql.Timestamp.valueOf(t), x)
      }), schema)
    df.coalesce(1).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(schema).parquet(dir)
    val out = Streaming.runToTable(
      Streaming.termTrends(stream, "text", "ts"), "t_trend")
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
      .toSet
    assert(out == Set(
      ("2024-01-01 10:00:00.0", "alpha", 2L),
      ("2024-01-01 10:00:00.0", "beta", 2L),
      ("2024-01-01 10:00:00.0", "gamma", 1L),
      ("2024-01-01 11:00:00.0", "alpha", 3L)))
  }

  test("quotaAdmitStream: counter persists across batches, within-batch order by id") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("source", StringType)))
    val dir = java.nio.file.Files.createTempDirectory("graft_quota_").toString
    def write(name: String, mtime: Long, rows: Seq[(Long, String)]): Unit = {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (id, s) =>
          org.apache.spark.sql.Row(id, s)
        }), schema)
      val tmp = dir + "/_stage"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.startsWith("part-")).get
      val target = new java.io.File(dir, name)
      java.nio.file.Files.move(part.toPath, target.toPath)
      target.setLastModified(mtime)
    }
    val base = System.currentTimeMillis()
    // batch 1: a fills 2 of 3 quota slots (ids out of order → admitted by id),
    // b fills 1
    write("00.parquet", base, Seq(
      (7L, "a"), (3L, "a"), (5L, "b")))
    // batch 2: a's remaining slot goes to id 2 (< 9); 9 is over quota; b fine
    write("01.parquet", base + 1000, Seq(
      (9L, "a"), (2L, "a"), (6L, "b")))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val out = Streaming.runToTable(
      Streaming.quotaAdmitStream(stream, "doc_id", "source", quota = 3).toDF(),
      "t_quota", org.apache.spark.sql.streaming.OutputMode.Append(),
      noDataBatch = false)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(
      ("a", 3L, 1L), ("a", 7L, 2L), // batch 1, ascending id
      ("a", 2L, 3L),                // batch 2 fills the last slot; 9 rejected
      ("b", 5L, 1L), ("b", 6L, 2L)))
  }

  test("budgetAdmitStream: first-fit across batches — oversize drops " +
      "without consuming, later smaller docs still fill the gap") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("source", StringType),
      StructField("t", LongType)))
    val dir = java.nio.file.Files.createTempDirectory("graft_budget_").toString
    def write(name: String, mtime: Long, rows: Seq[(Long, String, Long)]): Unit = {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (id, s, t) =>
          org.apache.spark.sql.Row(id, s, t)
        }), schema)
      val tmp = dir + "/_stage"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.startsWith("part-")).get
      val target = new java.io.File(dir, name)
      java.nio.file.Files.move(part.toPath, target.toPath)
      target.setLastModified(mtime)
    }
    val base = System.currentTimeMillis()
    // budget a = 10: batch 1 admits id1 (4, cum 4); id2 (20) is oversize and
    // must NOT consume; id3 (5, cum 9) still fits BECAUSE 20 didn't count
    write("00.parquet", base, Seq(
      (1L, "a", 4L), (2L, "a", 20L), (3L, "a", 5L), (9L, "c", 7L)))
    // batch 2: remaining budget 1 — id4 (1) exactly fills; id5 (2) drops;
    // zero-token id6 admits without consuming; unbudgeted group c drops all
    write("01.parquet", base + 1000, Seq(
      (4L, "a", 1L), (5L, "a", 2L), (6L, "a", 0L)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val out = Streaming.runToTable(
      Streaming.budgetAdmitStream(stream, "doc_id", "source", "t",
        Map("a" -> 10L)).toDF(),
      "t_budget", org.apache.spark.sql.streaming.OutputMode.Append(),
      noDataBatch = false)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(out == Set(
      ("a", 1L, 4L, 4L), ("a", 3L, 5L, 9L),
      ("a", 4L, 1L, 10L), ("a", 6L, 0L, 10L)), s"got $out")
  }

  test("reservoirSampleStream: sample is a pure function of the id set — " +
      "later batches evict earlier members, gate equals the batch top-k") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val schema = StructType(Seq(StructField("doc_id", LongType)))
    val dir = java.nio.file.Files.createTempDirectory("graft_resv_").toString
    def write(name: String, mtime: Long, ids: Seq[Long]): Unit = {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(
          ids.map(org.apache.spark.sql.Row(_))), schema)
      val tmp = dir + "/_stage"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.startsWith("part-")).get
      val target = new java.io.File(dir, name)
      java.nio.file.Files.move(part.toPath, target.toPath)
      target.setLastModified(mtime)
    }
    val base = System.currentTimeMillis()
    val b1 = (1L to 40L); val b2 = (41L to 120L)
    write("00.parquet", base, b1)
    write("01.parquet", base + 1000, b2) // includes a repeat-free new range
    val k = 10
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val sink = Streaming.runToTable(
      Streaming.reservoirSampleStream(stream, "doc_id", k, shards = 4).toDF(),
      "t_resv", org.apache.spark.sql.streaming.OutputMode.Update(),
      statePartitions = Some(2), noDataBatch = false)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("shard"))
    val got = sink.withColumn("__mv", max(col("version")).over(w))
      .where(col("version") === col("__mv"))
      .orderBy(col("priority"), col("id")).limit(k)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSeq
    // batch reference: k smallest md5 priorities over ALL ids
    val want = (b1 ++ b2).toSeq.toDF("doc_id")
      .select(col("doc_id"),
        graft.functions.GraftFunctions.md5_prefix60(
          col("doc_id").cast("string")).as("h"))
      .orderBy(col("h"), col("doc_id")).limit(k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want, s"stream sample ≠ batch top-k:\n$got\n$want")
    // eviction actually happened: batch-1's own top-k can't all survive an
    // id universe 3× larger (md5 uniformity makes full survival ~1e-5)
    val b1Top = b1.toSeq.toDF("doc_id")
      .select(col("doc_id"), graft.functions.GraftFunctions.md5_prefix60(
        col("doc_id").cast("string")).as("h"))
      .orderBy(col("h"), col("doc_id")).limit(k)
      .collect().map(_.getLong(0)).toSet
    assert(got.map(_._1).toSet != b1Top,
      "no eviction across batches — Update semantics broken")
  }

  test("nearDupDropStream: earlier-batch near-dups drop, same-batch ties both survive") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("ts", TimestampType),
      StructField("text", StringType)))
    val dir = java.nio.file.Files.createTempDirectory("graft_neardup_").toString
    def write(name: String, mtime: Long, rows: Seq[(Long, String, String)]): Unit = {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (id, t, text) =>
          org.apache.spark.sql.Row(id, java.sql.Timestamp.valueOf(t), text)
        }), schema)
      val tmp = dir + "/_stage"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.startsWith("part-")).get
      val target = new java.io.File(dir, name)
      java.nio.file.Files.move(part.toPath, target.toPath)
      target.setLastModified(mtime)
    }
    def doc(prefix: String, n: Int = 60): String =
      (0 until n).map(i => s"$prefix$i").mkString(" ")
    def mutate(text: String): String = { // one swapped token: jaccard ≈ 0.9
      val t = text.split(" "); t(30) = "MUTATED"; t.mkString(" ")
    }
    val base = System.currentTimeMillis()
    write("00.parquet", base, Seq(
      (1L, "2024-01-01 10:00:00", doc("a")),
      (2L, "2024-01-01 10:00:01", doc("b"))))
    write("01.parquet", base + 1000, Seq(
      (11L, "2024-01-01 10:10:00", mutate(doc("a"))), // near-dup of 1 -> drop
      (12L, "2024-01-01 10:10:01", doc("c")),          // unique
      (13L, "2024-01-01 10:10:02", doc("d")),          // same-batch near-dup pair:
      (14L, "2024-01-01 10:10:03", mutate(doc("d"))))) //   BOTH survive
    write("02.parquet", base + 2000, Seq(
      (21L, "2024-01-01 10:20:00", mutate(doc("d"))), // partner in batch 1 -> drop
      (22L, "2024-01-01 10:20:01", doc("b")),          // exact copy of 2 -> drop
      (23L, "2024-01-01 10:20:02", doc("e"))))         // unique
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val drops = Streaming.runToTable(
      Streaming.nearDupDropStream(stream, "doc_id", "text", "ts", "1 hour").toDF(),
      "t_neardup", org.apache.spark.sql.streaming.OutputMode.Append(),
      statePartitions = Some(2), noDataBatch = false)
    assert(drops.select("id").distinct().collect().map(_.getLong(0)).toSet ==
      Set(11L, 21L, 22L))
    // partner attribution: 11 dropped by 1, 22 by 2 (21's partner is 13 or 14)
    val partners = drops.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
    assert(partners(11L).map(_._2).toSet == Set(1L))
    assert(partners(22L).map(_._2).toSet == Set(2L))
    assert(partners(21L).map(_._2).toSet.subsetOf(Set(13L, 14L)))
  }

  test("nearDupDropStream: partners older than the watermark are evicted, not matched") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("ts", TimestampType),
      StructField("text", StringType)))
    val dir = java.nio.file.Files.createTempDirectory("graft_neardup_ev_").toString
    def write(name: String, mtime: Long, rows: Seq[(Long, String, String)]): Unit = {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (id, t, text) =>
          org.apache.spark.sql.Row(id, java.sql.Timestamp.valueOf(t), text)
        }), schema)
      val tmp = dir + "/_stage"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.startsWith("part-")).get
      val target = new java.io.File(dir, name)
      java.nio.file.Files.move(part.toPath, target.toPath)
      target.setLastModified(mtime)
    }
    def doc(prefix: String): String = (0 until 60).map(i => s"$prefix$i").mkString(" ")
    val base = System.currentTimeMillis()
    write("00.parquet", base, Seq((1L, "2024-01-01 10:00:00", doc("x"))))
    // filler two hours later pushes the watermark (12:00 - 10m) far past doc 1
    write("01.parquet", base + 1000, Seq((2L, "2024-01-01 12:00:00", doc("f"))))
    // doc 1's copy arrives after its entry aged out: MUST survive
    write("02.parquet", base + 2000, Seq((3L, "2024-01-01 12:05:00", doc("x"))))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val drops = Streaming.runToTable(
      Streaming.nearDupDropStream(stream, "doc_id", "text", "ts", "10 minutes").toDF(),
      "t_neardup_ev", org.apache.spark.sql.streaming.OutputMode.Append(),
      statePartitions = Some(2), noDataBatch = false)
    assert(drops.isEmpty, s"evicted partner still matched: ${drops.collect().toSeq}")
  }

  test("ingest composition: stratified mix -> decontaminate on one stream, stateless, equals batch replay") {
    import org.apache.spark.sql.types._
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
    val train = docs.where(col("doc_id") % 7 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest_").toString
    docs.coalesce(1).write.mode("overwrite").parquet(dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("text", StringType)))
    val mix = Map("en" -> 300, "de" -> 0)
    def composed(df: org.apache.spark.sql.DataFrame) =
      graft.streaming.Streaming.decontaminateStream(
        graft.ops.Sampling.stratifiedSample(df, "doc_id", "lang", mix),
        train, "doc_id", "text", shingleSize = 3,
        maxRateNum = 1, maxRateDen = 2, expectedItems = 100000L)
    val stream = composed(spark.readStream.schema(schema).parquet(dir))
    // the WHOLE ingest pre-filter chain must stay stateless — one scan, no
    // state store, no watermark, pure filters — or it stops being an
    // ingest-bandwidth plan
    val analyzed = stream.queryExecution.analyzed.toString
    Seq("Aggregate", "Deduplicate", "FlatMapGroupsWithState", "EventTimeWatermark")
      .foreach(op => assert(!analyzed.contains(op),
        s"ingest composition gained a stateful operator ($op)"))
    val streamed = Streaming.runToTable(stream, "t_ingest_comp",
        org.apache.spark.sql.streaming.OutputMode.Append())
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // operators are pure functions of content: the batch run of the same
    // composition is the ground truth the stream must reproduce
    val batch = composed(docs).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("nearDupDropStream SignatureFraction: exact copies drop, borderline pair quantified vs Exact") {
    import org.apache.spark.sql.types._
    import graft.functions.GraftFunctions.{shingle_hashes, minhash_signature_from_hashes}
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("ts", TimestampType),
      StructField("text", StringType)))
    val dir = java.nio.file.Files.createTempDirectory("graft_neardup_sf_").toString
    def write(name: String, mtime: Long, rows: Seq[(Long, String, String)]): Unit = {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (id, t, text) =>
          org.apache.spark.sql.Row(id, java.sql.Timestamp.valueOf(t), text)
        }), schema)
      val tmp = dir + "/_stage"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.startsWith("part-")).get
      val target = new java.io.File(dir, name)
      java.nio.file.Files.move(part.toPath, target.toPath)
      target.setLastModified(mtime)
    }
    def doc(prefix: String): String = (0 until 60).map(i => s"$prefix$i").mkString(" ")
    // three isolated interior mutations (spaced > shingleSize apart): each
    // removes 3 shingles from the intersection and widens the union by 3 —
    // true jaccard (58-9)/(58+9) = 49/67 ≈ 0.731, BELOW the 0.8 threshold
    def borderline(text: String): String = {
      val t = text.split(" ")
      Seq(10, 25, 40).zipWithIndex.foreach { case (p, i) => t(p) = s"MUT$i" }
      t.mkString(" ")
    }
    val base = System.currentTimeMillis()
    write("00.parquet", base, Seq((1L, "2024-01-01 10:00:00", doc("a"))))
    write("01.parquet", base + 1000, Seq(
      (11L, "2024-01-01 10:10:00", doc("a")),            // exact copy: sig identical
      (12L, "2024-01-01 10:10:01", borderline(doc("a"))))) // borderline vs doc 1
    def run(mode: Streaming.NearDupVerify, tbl: String): Set[Long] = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(dir)
      Streaming.runToTable(
        Streaming.nearDupDropStream(stream, "doc_id", "text", "ts", "1 hour",
          verify = mode).toDF(),
        tbl, org.apache.spark.sql.streaming.OutputMode.Append(),
        statePartitions = Some(2), noDataBatch = false)
        .select("id").distinct().collect().map(_.getLong(0)).toSet
    }
    val exactDrops = run(Streaming.NearDupVerify.Exact, "t_ndsf_exact")
    val sigDrops = run(Streaming.NearDupVerify.SignatureFraction, "t_ndsf_sig")
    // the exact mode is the truth: copy drops, borderline (0.731 < 0.8) survives
    assert(exactDrops == Set(11L), s"exact-mode drops: $exactDrops")
    // an identical signature always estimates 1.0: the copy drops in sig mode too
    assert(sigDrops.contains(11L), "sig mode missed an exact copy")
    // quantify the borderline verdict: the operator's decision must equal the
    // estimator's side of the threshold (computed here from the same minhash
    // signatures the stream builds), making the precision/recall delta vs
    // Exact a measured number, not an assumption
    val sigs = spark.createDataFrame(Seq(
        Tuple1(doc("a")), Tuple1(borderline(doc("a"))))).toDF("text")
      .select(minhash_signature_from_hashes(
        array_distinct(shingle_hashes(split(col("text"), " "), 3)), 128).as("sig"))
      .collect().map(_.getSeq[Long](0))
    val est = Streaming.signatureFraction(sigs(0), sigs(1))
    assert(est > 0.5 && est < 1.0, s"degenerate estimate $est")
    assert(sigDrops.contains(12L) == (est >= 0.8),
      s"sig-mode verdict for the borderline pair (dropped=${sigDrops.contains(12L)}) " +
        s"contradicts its own estimator (est=$est vs threshold 0.8; true j=49/67≈0.731)")
  }

  test("decontaminateStream: contaminated docs drop at ingest, clean pass, stateless plan") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    def words(n: Int, p: String) = (0 until n).map(i => s"$p$i").mkString(" ")
    val train = Seq((100L, words(60, "tr"))).toDF("doc_id", "text")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("ts", TimestampType),
      StructField("text", StringType)))
    val dir = java.nio.file.Files.createTempDirectory("graft_decon_").toString
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", words(60, "tr")),  // full train copy: drop
      (2L, "2024-01-01 10:00:01", words(60, "cl")),  // disjoint: keep
      // 10 train tokens spliced into 90 fresh ones: only windows fully
      // inside the run match = 8 contaminated of 98 shingles (rate ~0.08
      // < 0.2): keep
      (3L, "2024-01-01 10:00:02",
        words(45, "x") + " " + (0 until 10).map(i => s"tr$i").mkString(" ") +
          " " + words(45, "y")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, t, text) =>
        org.apache.spark.sql.Row(id, java.sql.Timestamp.valueOf(t), text)
      }), schema)
    df.coalesce(1).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(schema).parquet(dir)
    val out = Streaming.decontaminateStream(stream, train, "doc_id", "text",
      shingleSize = 3, maxRateNum = 1, maxRateDen = 5, expectedItems = 10000L)
    // STATELESS is the operator's headline property: the plan must carry no
    // stateful node (state store / watermark machinery) — pin it on the
    // analyzed plan, not just by the query happening to run
    val analyzed = out.queryExecution.analyzed.toString
    Seq("Aggregate", "Deduplicate", "FlatMapGroupsWithState", "EventTimeWatermark")
      .foreach(op => assert(!analyzed.contains(op),
        s"decontaminateStream plan gained a stateful operator ($op):\n$analyzed"))
    val survivors = Streaming.runToTable(out, "t_decon",
      org.apache.spark.sql.streaming.OutputMode.Append())
    assert(survivors.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(2L, 3L))
    // null text: nothing to match — the row must be KEPT, not null-dropped
    val withNull = Seq((9L, null.asInstanceOf[String]), (10L, words(60, "tr")))
      .toDF("doc_id", "text")
    val keptNull = Streaming.decontaminateStream(withNull, train, "doc_id",
      "text", shingleSize = 3, maxRateNum = 1, maxRateDen = 5, expectedItems = 10000L)
    assert(keptNull.select("doc_id").collect().map(_.getLong(0)).toSet == Set(9L))
    val d3 = survivors.where(col("doc_id") === 3L).head()
    assert(d3.getAs[Long]("n_contaminated") > 0, "planted overlap went undetected")
    // overcount-only vs the exact operator (bloom has no false negatives)
    val exact = graft.ops.TextOps.contamination(
        train, df.select("doc_id", "text"), "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val flags = graft.ops.TextOps.contaminationBloomFlags(
        df.select("doc_id", "text"), train, "doc_id", "text", 3,
        expectedItems = 10000L)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_contaminated")).toMap
    flags.foreach { case (id, nb) => assert(nb >= exact(id), s"doc $id undercounted") }
  }

  test("windowDistinct: chained stateful aggregations = exact windowed " +
      "count-distinct; final in-flight window withheld") {
    val stream = Streaming.eventsReplay(spark, sf(), nSplits = 4)
    val out = Streaming.runToTable(
      Streaming.windowDistinct(stream, "user_id"),
      "t_window_distinct",
      org.apache.spark.sql.streaming.OutputMode.Append(),
      statePartitions = Some(4))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = Streaming.normalizeEventTs(
      spark.read.parquet(s"${sf()}/events.parquet"))
    // delay-0 watermark ends at max(ts): every hour window whose END is at
    // or before it finalizes; the window containing max(ts) is withheld
    val maxUs = events.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val expect = events
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(countDistinct(col("user_id")).as("n_distinct"),
        count(lit(1)).as("n_events"))
      .where(unix_micros(col("hour")) + 3600L * 1000000L <= maxUs)
    val a = out.orderBy("hour").collect().map(_.toSeq)
    val b = expect.orderBy("hour").collect().map(_.toSeq)
    assert(a.nonEmpty, "replay should finalize at least one window")
    assert(a.length == b.length && a.zip(b).forall { case (x, y) => x == y },
      s"stream emitted ${a.length} windows, batch closed ${b.length}")
    // the production-scale state-store knob: the RocksDB provider (off-heap
    // state for key cardinalities that outgrow executor heaps) must engage
    // per-query, produce IDENTICAL results, and restore the session conf
    spark.conf.set("graft.streaming.stateStore", "rocksdb")
    try {
      val rocks = Streaming.runToTable(
        Streaming.windowDistinct(Streaming.eventsReplay(spark, sf(),
          nSplits = 4), "user_id"),
        "t_window_distinct_rocks",
        org.apache.spark.sql.streaming.OutputMode.Append(),
        statePartitions = Some(4))
      val c = rocks.orderBy("hour").collect().map(_.toSeq)
      assert(c.length == a.length && c.zip(a).forall { case (x, y) => x == y },
        "RocksDB state store must be result-identical to the default")
      // getOption reports the registered DEFAULT for unset SQLConf entries,
      // so "restored" reads as the default on-heap provider
      assert(spark.conf.getOption(
        "spark.sql.streaming.stateStore.providerClass")
        .forall(_.contains("HDFSBackedStateStoreProvider")),
        "the provider override must restore after the drain")
    } finally spark.conf.unset("graft.streaming.stateStore")
  }

  test("cmsMaintainStream: the streamed sketch equals the batch sketch " +
      "exactly (CM linearity), with bounded depth x width state") {
    val replay = Streaming.docsReplay(spark, sf(), nSplits = 4)
    val streamed = Streaming.runToTable(
      Streaming.cmsMaintainStream(replay, "text", depth = 4, width = 64),
      "t_stream_cms",
      org.apache.spark.sql.streaming.OutputMode.Complete(),
      statePartitions = Some(4))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val batch = graft.ops.TextOps.cmsCells(
        spark.read.parquet(s"${sf()}/documents.parquet"), "text",
        depth = 4, width = 64)
      .groupBy(col("r"), col("bucket")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(streamed == batch, "stream-maintained sketch must equal batch")
    // the sketch is the state: state rows never exceed depth x width
    assert(streamed.size <= 4 * 64)
  }

  test("stream-static enrichment: broadcast dim join in-stream equals the " +
      "batch join; stateless plan (no state store)") {
    val ev = Streaming.eventsStream(spark, sf())
    val cust = spark.read.parquet(s"${sf()}/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val joined = ev.join(broadcast(cust), ev("user_id") === cust("c_custkey"))
      .select(col("event_id"), col("c_mktsegment"))
    val name = "t_stream_enrich"
    val q = joined.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // stateless: a stream-static inner join keeps no state store
    assert(q.recentProgress.forall(_.stateOperators.isEmpty),
      "stream-static join must not allocate state")
    val got = spark.table(name)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val want = Streaming.normalizeEventTs(
        spark.read.parquet(s"${sf()}/events.parquet"))
      .join(cust, col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("c_mktsegment"))
    assert(got.count() == want.count())
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    spark.catalog.dropTempView(name)
  }

  test("stateful sessionize matches the batch window-lag sessionize") {
    val streamed = Streaming.runToTable(
      Streaming.sessionize(Streaming.eventsStream(spark, sf())).toDF(),
      "t_stream_sessions",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val batch = SparkEntry.queries("q13_sessionize")(spark, sf())
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(streamed.toSeq == batch.toSeq)
  }

  test("conformalAdmitStream: literal threshold from the calibration " +
      "quantile, stateless plan, null scores drop, tiny calibration " +
      "admits all") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    // calibration scores 1..20: n=20, k=⌈21·0.9⌉=19 → threshold = 19
    val calib = (1L to 20L).map(i => (i, i)).toDF("id", "score")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("score", LongType)))
    val dir = java.nio.file.Files.createTempDirectory("graft_conf_").toString
    val rows: Seq[(Long, java.lang.Long)] = Seq(
      (101L, java.lang.Long.valueOf(5L)), (102L, java.lang.Long.valueOf(19L)),
      (103L, java.lang.Long.valueOf(20L)), (104L, null))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, s) =>
        org.apache.spark.sql.Row(id, if (s == null) null else s.longValue())
      }), schema).coalesce(1).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(schema).parquet(dir)
    val out = Streaming.conformalAdmitStream(stream, calib, "id", "score",
      alphaPermille = 100)
    val analyzed = out.queryExecution.analyzed.toString
    Seq("Aggregate", "Deduplicate", "FlatMapGroupsWithState",
      "EventTimeWatermark").foreach(op => assert(!analyzed.contains(op),
        s"conformalAdmitStream plan gained a stateful operator ($op)"))
    val got = Streaming.runToTable(out, "t_conf",
        org.apache.spark.sql.streaming.OutputMode.Append())
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    // 5 and 19 admitted at threshold 19; 20 rejected; null dropped
    assert(got.keySet == Set(101L, 102L))
    assert(got(101L) == ((5L, 20L, 19L)) && got(102L) == ((19L, 20L, 19L)))
    // two-row calibration with α=1‰: k=⌈3·0.999⌉=3 > 2 → admit everything
    val tiny = Seq((1L, 50L), (2L, 60L)).toDF("id", "score")
    val all = Streaming.runToTable(
        Streaming.conformalAdmitStream(stream, tiny, "id", "score", 1),
        "t_conf_tiny", org.apache.spark.sql.streaming.OutputMode.Append())
      .collect()
    assert(all.map(_.getLong(0)).toSet == Set(101L, 102L, 103L))
    all.foreach(r => assert(r.isNullAt(3), "tiny calibration: null threshold"))
  }

  test("ingestIntoNearDupIndex: exactly-once across a FULL stream replay " +
      "(same epoch tags) — membership, band multiset, and drop verdicts " +
      "unchanged; a second epoch dedups against the first's survivors") {
    import graft.ops.Dedup
    import graft.store.ManifestTable
    import spark.implicits._
    def multiset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.toVector).groupBy(identity)
        .map { case (k, v) => k -> v.length }
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6"),  // corpus
      (11L, "w1 w2 w3 w4 w5 w6"), // epoch 0: copy of 1 -> drops
      (13L, "z1 z2 z3 z4 z5 z6"), // epoch 0: novel -> member
      (23L, "z1 z2 z3 z4 z5 z6")) // epoch 1: copy of 13 -> drops vs epoch 0
      .toDF("id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft_sing").toString
    val path = root + "/idx"
    Dedup.writeNearDupIndex(docs.where(col("id") === 1), "id", "text", path,
      shingleSize = 2)
    // stage two mtime-ordered files: the file-stream source reads them as
    // epochs 0 and 1 (the stageDocsReplay discipline)
    val stage = new java.io.File(root, "stage"); stage.mkdirs()
    val base = System.currentTimeMillis()
    Seq(Seq(11L, 13L), Seq(23L)).zipWithIndex.foreach { case (ids, i) =>
      val tmpDir = new java.io.File(root, s"tmp_$i")
      docs.where(col("id").isin(ids: _*)).coalesce(1)
        .write.mode("overwrite").parquet(tmpDir.toString)
      val part = tmpDir.listFiles().find(_.getName.startsWith("part-")).get
      val target = new java.io.File(stage, f"$i%05d.parquet")
      java.nio.file.Files.move(part.toPath, target.toPath)
      target.setLastModified(base + i * 1000L): Unit
    }
    val schema = spark.read.parquet(stage.toString + "/00000.parquet").schema
    def run(): Unit = Streaming.ingestIntoNearDupIndex(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(stage.toString),
      path, "id", "text", shingleSize = 2).awaitTermination()
    run()
    val bands = multiset(ManifestTable.read(spark, path + "/bands"))
    val members = multiset(
      graft.store.KeyedStore.readKeyed(spark, path + "/docs").select(col("key")))
    assert(members.keySet.map(_.head) == Set(1L, 13L),
      "11 drops vs corpus, 13 survives epoch 0, 23 drops vs 13 in epoch 1")
    run() // fresh checkpoint replays epochs 0..1 under the SAME tags
    assert(multiset(ManifestTable.read(spark, path + "/bands")) == bands,
      "replay must not append a single band row")
    assert(multiset(graft.store.KeyedStore.readKeyed(spark, path + "/docs")
      .select(col("key"))) == members, "replay must not touch membership")
  }

  /** Stage `epochs` as mtime-ordered single-file parquet batches and return
    * a file-stream over them (the stageDocsReplay discipline). */
  private def stagedStream(root: String,
      epochs: Seq[org.apache.spark.sql.DataFrame]): org.apache.spark.sql.DataFrame = {
    val stage = new java.io.File(root, "stage")
    if (!stage.exists()) { // stage once; replay runs reuse the same files
      stage.mkdirs()
      val base = System.currentTimeMillis()
      epochs.zipWithIndex.foreach { case (df, i) =>
        val tmpDir = new java.io.File(root, s"tmp_$i")
        df.coalesce(1).write.mode("overwrite").parquet(tmpDir.toString)
        val part = tmpDir.listFiles().find(_.getName.startsWith("part-")).get
        val target = new java.io.File(stage, f"$i%05d.parquet")
        java.nio.file.Files.move(part.toPath, target.toPath)
        target.setLastModified(base + i * 1000L): Unit
      }
    }
    val schema = spark.read.parquet(stage.toString + "/00000.parquet").schema
    spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .parquet(stage.toString)
  }

  test("ingestIntoBm25Index: exactly-once across a FULL stream replay — " +
      "probe equals the from-scratch index; postings/docs/stats unchanged " +
      "by the replay") {
    import graft.ops.TextOps
    import graft.store.{Compaction, ManifestTable}
    import spark.implicits._
    def multiset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.toVector).groupBy(identity)
        .map { case (k, v) => k -> v.length }
    val docs = Seq(
      (1L, "spark window merge spark"), (2L, "window table scan"),
      (3L, "merge join spark"), (4L, "filter scan batch window"))
      .toDF("id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft_sbm25").toString
    val path = root + "/bm25"
    TextOps.writeBm25Index(docs.where(col("id") <= 2), "id", "text", path,
      nBuckets = 4)
    def run(): Unit = Streaming.ingestIntoBm25Index(
      stagedStream(root, Seq(docs.where(col("id") === 3),
        docs.where(col("id") === 4))),
      path, "id", "text", nBuckets = 4).awaitTermination()
    run()
    val posts = multiset(Compaction.readPartitioned(spark,
      path + "/postings", "bucket").get)
    val stats = multiset(graft.store.ManifestTable.read(spark, path + "/stats"))
    val members = multiset(ManifestTable.read(spark, path + "/docs"))
    val q = Seq("spark", "window", "merge")
    val fresh = root + "/fresh"
    TextOps.writeBm25Index(docs, "id", "text", fresh, nBuckets = 4)
    assert(TextOps.bm25TopKFromIndex(spark, path, q, 10, nBuckets = 4)
        .collect().toSeq ==
      TextOps.bm25TopKFromIndex(spark, fresh, q, 10, nBuckets = 4)
        .collect().toSeq,
      "streamed index must score like the from-scratch build")
    run() // fresh checkpoint replays epochs 0..1 under the SAME tags
    assert(multiset(Compaction.readPartitioned(spark,
      path + "/postings", "bucket").get) == posts,
      "replay must not append a single posting")
    assert(multiset(graft.store.ManifestTable.read(spark, path + "/stats")) == stats)
    assert(multiset(ManifestTable.read(spark, path + "/docs")) == members)
  }

  test("ingestIntoBm25Index with IN-LOOP maintenance (afterBatch " +
      "autoMaintain): tags survive the folds, a full replay appends " +
      "nothing, probe equals the from-scratch build") {
    import graft.ops.TextOps
    import graft.store.{Compaction, ManifestTable}
    import spark.implicits._
    def multiset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.toVector).groupBy(identity)
        .map { case (k, v) => k -> v.length }
    val docs = Seq(
      (1L, "spark window merge spark"), (2L, "window table scan"),
      (3L, "merge join spark"), (4L, "filter scan batch window"))
      .toDF("id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft_smbm25").toString
    val path = root + "/bm25"
    TextOps.writeBm25Index(docs.where(col("id") <= 2), "id", "text", path,
      nBuckets = 4)
    val maintained = new java.util.concurrent.atomic.AtomicInteger(0)
    def run(): Unit = Streaming.ingestIntoBm25Index(
      stagedStream(root, Seq(docs.where(col("id") === 3),
        docs.where(col("id") === 4))),
      path, "id", "text", nBuckets = 4,
      afterBatch = _ => maintained.addAndGet(Compaction.autoMaintain(
        spark, path + "/postings", smallBytes = Long.MaxValue,
        minorAt = 2, majorAt = 64)._1): Unit).awaitTermination()
    run()
    assert(maintained.get() > 0, "in-loop maintenance never ran")
    val posts = multiset(Compaction.readPartitioned(spark,
      path + "/postings", "bucket").get)
    val members = multiset(ManifestTable.read(spark, path + "/docs"))
    val q = Seq("spark", "window", "merge")
    val fresh = root + "/fresh"
    TextOps.writeBm25Index(docs, "id", "text", fresh, nBuckets = 4)
    assert(TextOps.bm25TopKFromIndex(spark, path, q, 10, nBuckets = 4)
        .collect().toSeq ==
      TextOps.bm25TopKFromIndex(spark, fresh, q, 10, nBuckets = 4)
        .collect().toSeq,
      "maintained streamed index must score like the from-scratch build")
    // the replay's epochs were committed BEFORE maintenance folded their
    // tagged files into anonymous generations — the tags must still
    // short-circuit (this is the property a naive file-sweep check loses)
    run()
    assert(multiset(Compaction.readPartitioned(spark,
      path + "/postings", "bucket").get) == posts,
      "replay across the maintained layout appended postings")
    assert(multiset(ManifestTable.read(spark, path + "/docs")) == members)
  }

  test("ingestIntoPairs: exactly-once across a FULL stream replay — " +
      "pair table scratch-equal to a single mine of the union; replay " +
      "appends nothing to pairs or postings") {
    import graft.ops.Dedup
    import graft.store.ManifestTable
    import spark.implicits._
    def multiset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.toVector).groupBy(identity)
        .map { case (k, v) => k -> v.length }
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta zeta"),
      (3L, "alpha beta gamma eta theta"),
      (4L, "iota kappa lambda mu nu"),
      (5L, "alpha beta gamma delta epsilon xi"),
      (6L, "iota kappa lambda mu omicron")).toDF("id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft_spairs").toString
    val path = root + "/pairs"
    Dedup.writePairs(docs.where(col("id") <= 2), "id", "text", path,
      shingleSize = 3, minJaccard = 0.1, maxDf = None)
    def run(): Unit = Streaming.ingestIntoPairs(
      stagedStream(root, Seq(docs.where(col("id") === 3 || col("id") === 4),
        docs.where(col("id") >= 5))),
      path, "id", "text", shingleSize = 3, minJaccard = 0.1,
      maxDf = None).awaitTermination()
    run()
    val pairs = multiset(ManifestTable.read(spark, path + "/pairs"))
    val posts = multiset(ManifestTable.read(spark, path + "/postings"))
    val fresh = root + "/fresh"
    Dedup.writePairs(docs, "id", "text", fresh,
      shingleSize = 3, minJaccard = 0.1, maxDf = None)
    assert(multiset(Dedup.readPairs(spark, path, threshold = 0.1)) ==
      multiset(Dedup.readPairs(spark, fresh, threshold = 0.1)),
      "streamed pair table must equal a single mine of the union corpus")
    run() // fresh checkpoint replays epochs 0..1 under the SAME tags
    assert(multiset(ManifestTable.read(spark, path + "/pairs")) == pairs,
      "replay must not append a single pair row")
    assert(multiset(ManifestTable.read(spark, path + "/postings")) == posts,
      "replay must not append a single posting")
  }

  test("ingestIntoClusters: exactly-once across a FULL stream replay — " +
      "the persisted cluster table scratch-equal to clustering a single " +
      "mine of the union; replay leaves the table identical") {
    import graft.ops.Dedup
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta zeta"),
      (3L, "alpha beta gamma eta theta"),
      (4L, "iota kappa lambda mu nu"),
      (5L, "alpha beta gamma delta epsilon xi"),
      (6L, "iota kappa lambda mu omicron")).toDF("id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft_sclust").toString
    val pairsPath = root + "/pairs"
    val clustersPath = root + "/clusters"
    Dedup.writePairs(docs.where(col("id") <= 2), "id", "text", pairsPath,
      shingleSize = 3, minJaccard = 0.1, maxDf = None)
    Dedup.writeClusters(spark, pairsPath, clustersPath, threshold = 0.1)
    // in-loop maintenance after every epoch (the q242 discipline on this
    // layout pair): compact pairs+postings AND the cluster keyed store
    var maintained = 0
    def run(): Unit = Streaming.ingestIntoClusters(
      stagedStream(root, Seq(docs.where(col("id") === 3 || col("id") === 4),
        docs.where(col("id") >= 5))),
      pairsPath, clustersPath, "id", "text", shingleSize = 3,
      minJaccard = 0.1, maxDf = None, threshold = 0.1,
      afterBatch = { _ =>
        graft.ops.Dedup.compactPairs(spark, pairsPath, targetFiles = 2)
        graft.store.KeyedStore.compact(spark, clustersPath,
          keyCol = "doc_id")
        maintained += 1
      }).awaitTermination()
    run()
    assert(maintained == 2, "the maintenance hook must run once per epoch")
    def state(): Set[(Long, Long, Long)] =
      Dedup.readClusters(spark, clustersPath).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = state()
    // scratch twin: one mine of the union corpus, clustered from scratch
    val fresh = root + "/fresh"
    Dedup.writePairs(docs, "id", "text", fresh,
      shingleSize = 3, minJaccard = 0.1, maxDf = None)
    val scratch = Dedup.clusterDuplicates(
        Dedup.readPairs(spark, fresh, threshold = 0.1)
          .select(col("id_a"), col("id_b")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == scratch,
      s"streamed cluster table must equal the scratch clustering:\n" +
        s"streamed=$streamed\nscratch=$scratch")
    assert(streamed.nonEmpty, "the corpus plants near-dups — table non-empty")
    run() // fresh checkpoint replays epochs 0..1 under the SAME tags
    assert(state() == streamed,
      "replay must leave the cluster table identical")
  }

  test("ingestIntoIvfCorpus: exactly-once across a FULL stream replay — " +
      "every vector in exactly one cell row; probe sees the streamed batch") {
    import graft.ops.Similarity
    import graft.store.Compaction
    import spark.implicits._
    def multiset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.toVector).groupBy(identity)
        .map { case (k, v) => k -> v.length }
    val vecs = (0 until 30).map(i =>
      (i.toLong, Seq(math.cos(i % 3).toFloat, math.sin(i % 3).toFloat)))
      .toDF("id", "vec")
    val base = vecs.where(col("id") % 2 === 0)
    val cents = Similarity.ivfCentroids(base, "id", "vec", k = 3)
    val root = java.nio.file.Files.createTempDirectory("graft_sivf").toString
    val path = root + "/ivf"
    Similarity.writeIvfCorpus(base, "id", "vec", path, cents)
    def run(): Unit = Streaming.ingestIntoIvfCorpus(
      stagedStream(root, Seq(
        vecs.where(col("id") % 2 === 1 && col("id") < 15),
        vecs.where(col("id") % 2 === 1 && col("id") >= 15))),
      path, "id", "vec", cents).awaitTermination()
    run()
    val rows = multiset(Compaction.readPartitioned(spark, path, "cell").get)
    val counts = Compaction.readPartitioned(spark, path, "cell").get
      .groupBy(col("id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet == (0L until 30L).toSet &&
      counts.values.forall(_ == 1L),
      s"every vector exactly once after the stream: $counts")
    // a streamed vector is probe-visible through the pinned centroids
    val probe = Similarity.ivfTopKFromPartitioned(spark, path, "id", "vec",
      Seq(math.cos(1).toFloat, math.sin(1).toFloat), 30, cents, nProbe = 3)
      .collect().map(_.getLong(0)).toSet
    assert(probe.exists(id => id % 2 == 1), "streamed vectors must surface")
    run() // fresh checkpoint replays epochs 0..1 under the SAME tags
    assert(multiset(Compaction.readPartitioned(spark, path, "cell").get) ==
      rows, "replay must not append a single row")
  }
}
