package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Sources & sinks — the Spark-native analogue of the reference's I/O surface
 * (SURVEY §2.1 S9-S15): HDFS text in/out, TSV helpers, inter-stage persistence
 * (the sequence-file role), table and multi-table sinks.
 *
 * The deep simplification vs the reference: HPaste's `HRandomSequenceOutput` →
 * `HRandomSequenceInput` temp-file plumbing between MR tasks
 * (mapreduce2.scala:316-322) disappears — Catalyst pipelines stages in one
 * plan, and explicit stage materialization is a single `stageWrite` where a
 * checkpoint is genuinely wanted (resume, reuse, or plan-size control).
 */
object Sources {

  /** S9: text source (`HPathInput` → `TextToBinaryMapper`,
    * reference mapreduce2.scala:559-568): one `value` column per line. */
  def readText(spark: SparkSession, paths: String*): DataFrame =
    spark.read.text(paths: _*)

  /** S15: per-line readers with merged part-files (`perHdfsDirectoryLine`,
    * `openParts`, reference hadoop/hdfs.scala:23-159) — Spark's directory scan
    * merges part files natively. */
  def readLines(spark: SparkSession, dir: String): DataFrame =
    spark.read.text(dir).select(col("value").as("line"))

  /** S13: TSV sink (`writetabs`, reference mapreduce2.scala:970-983).
    * Overwrites the target first, as `HPathOutput` does (:614). */
  def writeTsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("sep", "\t").csv(path)

  /** S13 companion: TSV source. */
  def readTsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "\t").csv(path)

  /**
   * S10/S14: inter-stage persistence — the role sequence files played between
   * MR tasks (`HSequenceInput`/`HSequenceOutput`, reference
   * mapreduce2.scala:623-708). Columnar Parquet replaces K/V sequence files:
   * self-describing schema, column pruning on re-read, splittable.
   */
  def stageWrite(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def stageRead(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** S11: table sink (`HTableOutput`/`GravityTableOutputFormat`, reference
    * mapreduce2.scala:592-603) — a keyed overwrite; merge semantics live in
    * [[graft.store.KeyedStore]]. */
  def writeTable(df: DataFrame, path: String): Unit =
    graft.store.KeyedStore.write(df, path)

  /**
   * S12: multi-table sink (`HMultiTableOutput`, reference
   * mapreduce2.scala:575-587): route each row to a table chosen by a column.
   * One partitioned write — a single job, no per-table filtered passes, and
   * downstream reads of one "table" prune to its partition directory.
   */
  def writeMultiTable(df: DataFrame, tableCol: String, basePath: String): Unit =
    df.write.mode("overwrite").partitionBy(tableCol).parquet(basePath)

  /** S12 companion: read one routed table back (partition-pruned scan). */
  def readFromMultiTable(spark: SparkSession, basePath: String,
      tableCol: String, table: String): DataFrame =
    spark.read.parquet(basePath).where(col(tableCol) === table)
}
