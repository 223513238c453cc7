package graft.store

import scala.collection.mutable
import org.apache.spark.sql.DataFrame

/**
 * Fluent, chainable mutation batch — analogue of the reference's `OpBase` chain
 * (`put(..).value(..).delete(..).increment(..)` … `execute()`,
 * reference: src/main/scala/com/gravity/hbase/schema/OpBase.scala:22-114; tests
 * ExampleSchema.scala:383-410, WebCrawlSchemaTest.scala:205-231).
 *
 * Ops accumulate as DataFrames; `execute(current)` applies them in the reference's
 * documented precedence **deletes → puts → increments** (README.markdown:299) and
 * returns the merged table plus an [[KeyedStore.OpsResult]] accounting. `++` merges
 * two batches (the reference's `+` combinator).
 *
 * Everything stays distributed: a batch is a set of DataFrames, the merge is a set
 * of key-partitioned joins. Empty puts are skipped, as in the reference
 * (OpBase.scala:69).
 */
final class MutationBatch private (
    private val deletes: mutable.Buffer[DataFrame],
    private val familyDeletes: mutable.Buffer[(DataFrame, String)],
    private val qualifierDeletes: mutable.Buffer[(DataFrame, String, Seq[Any])],
    private val puts: mutable.Buffer[DataFrame],
    private val increments: mutable.Buffer[DataFrame],
    val keyCol: String) {

  def put(rows: DataFrame): MutationBatch = {
    if (!rows.isEmpty) puts += rows // empty put skipped (reference OpBase.scala:69)
    this
  }

  def delete(keys: DataFrame): MutationBatch = { deletes += keys; this }

  def deleteFamily(keys: DataFrame, famCol: String): MutationBatch = {
    familyDeletes += ((keys, famCol)); this
  }

  def deleteQualifiers(keys: DataFrame, famCol: String, quals: Seq[Any]): MutationBatch = {
    qualifierDeletes += ((keys, famCol, quals)); this
  }

  def increment(deltas: DataFrame): MutationBatch = { increments += deltas; this }

  /** Combine two batches — the reference's `+` op-chain combinator (OpBase.scala:85-96). */
  def ++(other: MutationBatch): MutationBatch = {
    deletes ++= other.deletes
    familyDeletes ++= other.familyDeletes
    qualifierDeletes ++= other.qualifierDeletes
    puts ++= other.puts
    increments ++= other.increments
    this
  }

  /** Apply the batch: deletes → puts → increments. Returns (merged, accounting). */
  def execute(current: DataFrame): (DataFrame, KeyedStore.OpsResult) = {
    var df = current
    var nDel = 0L
    deletes.foreach { k => nDel += k.count(); df = KeyedStore.deleteRows(df, k, keyCol) }
    familyDeletes.foreach { case (k, fam) =>
      nDel += k.count(); df = KeyedStore.deleteFamily(df, k, fam, keyCol)
    }
    qualifierDeletes.foreach { case (k, fam, qs) =>
      nDel += k.count(); df = KeyedStore.deleteQualifiers(df, k, fam, qs, keyCol)
    }
    var nPut = 0L
    puts.foreach { p => nPut += p.count(); df = KeyedStore.upsert(df, p, keyCol) }
    var nInc = 0L
    increments.foreach { d => nInc += d.count(); df = KeyedStore.increment(df, d, keyCol) }
    (df, KeyedStore.OpsResult(nDel, nPut, nInc))
  }

  /**
   * Apply the batch against an INDEXED store path (written by
   * `KeyedStore.writeIndexed`) with index-pruned rewrites: each op in the
   * deletes → puts → increments precedence touches only the files whose key
   * range contains its batch keys — the region-routed form of [[execute]].
   * The table lives on disk, so only the accounting is returned.
   */
  def executeIndexed(spark: org.apache.spark.sql.SparkSession,
      path: String): KeyedStore.OpsResult = {
    var nDel = 0L
    deletes.foreach { k => nDel += k.count(); KeyedStore.deleteIndexed(spark, path, k, keyCol) }
    familyDeletes.foreach { case (k, fam) =>
      nDel += k.count()
      KeyedStore.mergeIndexed(spark, path, k, keyCol, outsideKeysInsert = false)(
        KeyedStore.deleteFamily(_, _, fam, keyCol))
    }
    qualifierDeletes.foreach { case (k, fam, qs) =>
      nDel += k.count()
      KeyedStore.mergeIndexed(spark, path, k, keyCol, outsideKeysInsert = false)(
        KeyedStore.deleteQualifiers(_, _, fam, qs, keyCol))
    }
    var nPut = 0L
    puts.foreach { p => nPut += p.count(); KeyedStore.upsertIndexed(spark, path, p, keyCol) }
    var nInc = 0L
    increments.foreach { d =>
      nInc += d.count(); KeyedStore.incrementIndexed(spark, path, d, keyCol)
    }
    KeyedStore.OpsResult(nDel, nPut, nInc)
  }
}

object MutationBatch {
  def apply(keyCol: String = "key"): MutationBatch =
    new MutationBatch(mutable.Buffer.empty, mutable.Buffer.empty, mutable.Buffer.empty,
      mutable.Buffer.empty, mutable.Buffer.empty, keyCol)
}
