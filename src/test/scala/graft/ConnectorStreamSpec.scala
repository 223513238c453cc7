package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.store.KeyedStore

/** Micro-batch reads through the graft connector: tailing a keyed table,
  * checkpointed restarts, and index pruning of streamed scans. */
class ConnectorStreamSpec extends SparkSpec {
  import spark.implicits._

  /** Drain to a parquet sink (fault-tolerant → checkpoint recovery works,
    * unlike the memory sink) and return rows processed by this run. */
  private def drain(stream: org.apache.spark.sql.DataFrame, out: String,
      checkpoint: String): Long = {
    val q = stream.writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q.recentProgress.map(_.numInputRows).sum
  }

  test("streamed read equals batch read; restart picks up only appended files") {
    _quiet
    val dir = java.nio.file.Files.createTempDirectory("graft_cstream_").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    val out = java.nio.file.Files.createTempDirectory("graft_sink_").toString
    val base = (0L until 100L).map(i => (i, s"v$i")).toDF("key", "value")
    KeyedStore.writeIndexed(base, dir, "key", numRanges = 4)

    val s1 = spark.readStream.format("graft").option("key", "key").load(dir)
    drain(s1, out, ckpt)
    assert(spark.read.parquet(out).collect().map(_.getLong(0)).sorted.toSeq
      == (0L until 100L))

    Thread.sleep(20) // appended file must get a fresh mtime past the offset
    (100L until 120L).map(i => (i, s"v$i")).toDF("key", "value")
      .coalesce(1).sortWithinPartitions("key")
      .write.format("graft").option("key", "key").mode("append").save(dir)

    val s2 = spark.readStream.format("graft").option("key", "key").load(dir)
    val rows2 = drain(s2, out, ckpt)
    // same checkpoint: ONLY the appended file's rows flow through run 2 —
    // a replay of the first 100 would land 220 rows in the sink
    assert(rows2 == 20, s"expected 20 new rows, processed $rows2")
    assert(spark.read.parquet(out).collect().map(_.getLong(0)).sorted.toSeq
      == (0L until 120L))
  }

  test("option-declared key range prunes non-intersecting files (stream scans get no filter pushdown)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cstream2_").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt2_").toString
    val out = java.nio.file.Files.createTempDirectory("graft_sink2_").toString
    KeyedStore.writeIndexed(
      (0L until 400L).map(i => (i, i % 7)).toDF("key", "tag"), dir, "key",
      numRanges = 4)
    val s = spark.readStream.format("graft").option("key", "key")
      .option("graft.keyEquals", "42")
      .load(dir)
      .where(col("key") === 42L) // the row-level filter the hint pairs with
    val input = drain(s, out, ckpt)
    assert(spark.read.parquet(out).collect().map(_.getLong(0)).toSeq == Seq(42L))
    // only the one intersecting range file (100 rows) was ever scheduled
    assert(input == 100, s"expected 100 scanned rows (1 of 4 files), got $input")
  }
}
