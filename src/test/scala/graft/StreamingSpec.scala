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
      spark.read.parquet(s"${sf()}/events.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
    }
    val a = streamed.orderBy("hour", "event_type").collect().map(_.toSeq)
    val b = expect.orderBy("hour", "event_type").collect().map(_.toSeq)
    assert(a.length == b.length && a.zip(b).forall { case (x, y) => x == y })
  }

  test("streaming write-back: micro-batch increments merge into a keyed table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_swb").resolve("t").toString
    val deltas = Streaming.eventsStream(spark, sf())
      .select(col("user_id").cast("string").as("key"), lit(1L).as("n_events"))
    val q = Streaming.incrementIntoTable(deltas, dir)
    q.awaitTermination()
    val merged = spark.read.parquet(dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = SparkEntry.queries("q13_sessionize")(spark, sf())
      .collect().map(r => r.getLong(0).toString -> r.getLong(2)).toMap
    assert(merged == expect) // per-user event counts match the batch world
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
}
