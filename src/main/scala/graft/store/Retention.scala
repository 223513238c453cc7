package graft.store

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.schema.TableDef

/**
 * TTL retention — what HBase's region server does continuously (expired cells
 * vanish at read/compaction time once `now - cellTs > family.ttl`, the
 * `TTL => '...'` attribute the reference emits in its DDL,
 * HbaseTable.scala:288-291), expressed as a batch sweep over the keyed store.
 * Run it on a schedule (or piggy-backed on any rewrite of the table): it
 * CONSUMES the `ttlSeconds` declared in [[graft.schema.FamilyDef]] /
 * [[graft.schema.DynFamilyDef]].
 *
 *  - Dynamic family with `withCellTimestamps`: exact HBase cell semantics —
 *    a qualifier whose `<fam>_ts` entry is older than the TTL is dropped from
 *    both maps. Entries with no timestamp recorded are kept (no evidence of
 *    age — the conservative choice for a lossy-delete operation).
 *  - Fixed family: cells in one put share the row's write time, so the whole
 *    struct expires against `rowTsCol` (pass the column that records the row's
 *    last write, e.g. the `tsCol` fed to `upsertVersioned`). Families with a
 *    TTL but no `rowTsCol` are left untouched rather than guessed at.
 *  - `versions` needs no sweep in this engine: the store materializes exactly
 *    one value per (key, family, qualifier) — `maxVersions=1` semantics — and
 *    [[KeyedStore.upsertVersioned]] resolves writes by timestamp on the way in.
 *
 * Everything here is per-row expression work: no shuffle, no collect — a
 * 100 TB sweep is a map-only rewrite that parallelizes per file.
 */
object Retention {

  /**
   * Drop expired cells per the table's declared TTLs, as of `asOf`.
   * Returns the swept DataFrame (write it back with [[KeyedStore.write]] /
   * `writeIndexed` to make the reclaim durable, as a compaction would).
   */
  def applyTtl(df: DataFrame, table: TableDef, asOf: Timestamp,
      rowTsCol: Option[String] = None): DataFrame = {
    var out = df
    table.dynFamilies.filter(d => d.ttlSeconds != Int.MaxValue && d.withCellTimestamps)
      .foreach { d =>
        val cutoff = cutoffTs(asOf, d.ttlSeconds)
        val tsM = col(d.tsColName)
        val fresh: (Column, Column) => Column =
          (q, _) => coalesce(element_at(tsM, q) >= cutoff, lit(true))
        out = out
          .withColumn(d.name, map_filter(col(d.name), fresh))
          .withColumn(d.tsColName, map_filter(tsM, (_, v) => v >= cutoff))
      }
    rowTsCol.foreach { tsc =>
      table.families.filter(_.ttlSeconds != Int.MaxValue).foreach { f =>
        val cutoff = cutoffTs(asOf, f.ttlSeconds)
        out = out.withColumn(f.name,
          when(col(tsc) < cutoff, lit(null).cast(f.structType)).otherwise(col(f.name)))
      }
    }
    out
  }

  /** Rows whose every declared family has fully expired (all structs null /
    * maps empty) — candidates for physical deletion in the same sweep. */
  def fullyExpired(df: DataFrame, table: TableDef): Column = {
    val famsGone = table.families.map(f => col(f.name).isNull) ++
      table.dynFamilies.map(d => coalesce(map_keys(col(d.name)), array()) === array())
    famsGone.reduceOption(_ && _).getOrElse(lit(false))
  }

  private def cutoffTs(asOf: Timestamp, ttlSeconds: Int): Column =
    lit(new Timestamp(asOf.getTime - ttlSeconds * 1000L))
}
