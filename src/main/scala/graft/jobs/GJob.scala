package graft.jobs

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/**
 * The analytics/dataflow layer — Spark-native analogue of the reference's
 * MapReduce framework (`HJob`/`HTask`/`HMapper`/`HReducer`,
 * reference: src/main/scala/com/gravity/hbase/mapreduce/mapreduce2.scala:277-419,
 * 990-1071; SURVEY §2.4).
 *
 * The deep difference (SURVEY §3.3): an HJob chains MR tasks through temp
 * sequence files; here a "job" is a chain of DataFrame transforms inside ONE
 * Catalyst plan — stages pipeline, the optimizer sees across "task" boundaries,
 * and intermediate materialization happens only where explicitly requested
 * (`checkpoint`, the analogue of `HRandomSequenceOutput` hand-offs).
 *
 *  - G1 Job DAG driver  → [[GJob]]: named stages, per-stage timing, dry-run plan
 *  - G2 map-only task   → `.stage(_.select/flatMap…)` — no shuffle
 *  - G3/G4 map+reduce   → `.stage(_.groupBy(..).agg(..))` — combiner = partial agg
 *  - G5 custom shuffle / secondary sort → [[GJob.secondarySort]]
 *  - G6 group-by-extractor → any Column expression as grouping key
 *  - G12 counters       → [[Counters]] over `LongAccumulator` / `observe`
 */
final case class StageResult(name: String, seconds: Double)

final class GJob(val name: String, priority: Int = 0) {
  private var stages = Vector.empty[(String, DataFrame => DataFrame)]
  private val timings = scala.collection.mutable.ArrayBuffer.empty[StageResult]

  /** Declare a named stage (HTask analogue). Stages chain: output of n feeds n+1
    * (reference mapreduce2.scala:316-322), but inside one Catalyst plan. */
  def stage(stageName: String)(f: DataFrame => DataFrame): GJob = {
    stages :+= (stageName, f); this
  }

  /** Materialization barrier — the explicit analogue of the reference's tmp
    * sequence-file hand-off between tasks, for when a stage must be reused. */
  def barrier(stageName: String): GJob =
    stage(stageName)(df => df.persist())

  /** Run the chain. `dryRun` prints the final plan without executing
    * (reference HJob.dryRun, mapreduce2.scala:373-407). */
  def run(input: DataFrame, dryRun: Boolean = false): DataFrame = {
    val out = stages.foldLeft(input) { case (df, (sName, f)) =>
      val t0 = System.nanoTime()
      val next = f(df)
      timings += StageResult(sName, (System.nanoTime() - t0) / 1e9)
      next
    }
    if (dryRun) out.explain("formatted")
    out
  }

  /** Per-stage (plan-construction) timings; execution time is the action's. */
  def stageTimings: Seq[StageResult] = timings.toSeq
}

object GJob {
  def apply(name: String): GJob = new GJob(name)

  /**
   * G5: the secondary-sort pattern (`HGroupingTask` with partitioner + sort +
   * grouping comparators, reference mapreduce2.scala:1087-1108): partition by
   * the group key, sort within partitions by (group, order), then run
   * partition-local logic that sees each group's rows in order.
   */
  def secondarySort(df: DataFrame, groupKey: Column, orderKey: Column,
      numPartitions: Int): DataFrame =
    df.repartition(numPartitions, groupKey).sortWithinPartitions(groupKey, orderKey)

  /**
   * G6: group-by-arbitrary-extractor (`GroupByRow`, reference
   * mapreduce2.scala:844-875): the extractor is just a Column expression; Spark's
   * partial aggregation plays the combiner role automatically.
   */
  def groupByExtractor(df: DataFrame, keyExpr: Column, aggs: Column*): DataFrame =
    df.groupBy(keyExpr.as("group_key")).agg(aggs.head, aggs.tail: _*)

  /**
   * Group-wise top-k: the rank-filter formulation, which Spark 4's
   * InferWindowGroupLimit rewrites into a group-limit physical operator
   * (bounded per-group state instead of a full per-partition sort) — the
   * reason this stays composed rather than a custom SparkPlan.
   */
  def topKPerKey(df: DataFrame, keyCols: Seq[Column], orderBy: Seq[Column],
      k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols: _*).orderBy(orderBy: _*)
    df.withColumn("__rank", row_number().over(w))
      .where(col("__rank") <= k)
      .drop("__rank")
  }

  /**
   * Skew-safe two-phase aggregation (the 100 TB hot-key path, SURVEY §7):
   * phase 1 groups by (key, random salt) so a hot key spreads over `numSalts`
   * reducers; phase 2 merges the partials per key. Correct for any commutative
   * mergeable aggregate — sums here; extend per-aggregate as needed. AQE's
   * skew handling covers sort-merge joins, but aggregation skew still needs
   * salting when one key dominates a partition.
   */
  def saltedSum(df: DataFrame, keyCols: Seq[String], sumCol: String,
      numSalts: Int): DataFrame = {
    val keyRefs = keyCols.map(col)
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(numSalts)))
      .groupBy(keyRefs :+ col("__salt"): _*)
      .agg(sum(col(sumCol)).as("__partial"))
      .groupBy(keyRefs: _*)
      .agg(sum(col("__partial")).as(s"sum_$sumCol"))
  }
}

/**
 * G12: counters (`ctr(msg)`, Hadoop counter group "Custom", reference
 * mapreduce2.scala:1014-1020). Two forms:
 *  - [[Counters.accumulator]]: driver-visible `LongAccumulator` for imperative code;
 *  - [[Counters.observed]]: `df.observe(...)` metrics that ride the plan — the
 *    declarative (and streaming-safe) form.
 */
object Counters {
  def accumulator(df: DataFrame, counterName: String): LongAccumulator =
    df.sparkSession.sparkContext.longAccumulator(counterName)

  def observed(df: DataFrame, observationName: String, metrics: Column*): DataFrame =
    df.observe(observationName, metrics.head, metrics.tail: _*)

  /** [[observed]] with a synchronous handle: the metrics land in `obs.get`
    * after the frame's next action — the driver-side counter READBACK the
    * reference's `job.getCounters` gives after a run
    * (reference mapreduce2.scala:1014-1020). */
  def observed(df: DataFrame, obs: org.apache.spark.sql.Observation,
      metrics: Column*): DataFrame =
    df.observe(obs, metrics.head, metrics.tail: _*)
}
