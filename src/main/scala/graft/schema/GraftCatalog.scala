package graft.schema

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Table registry — the analogue of the reference's mutable `Schema` object
 * (`Schema.table(t)` registers + inits each table,
 * reference: src/main/scala/com/gravity/hbase/schema/Schema.scala:246-256).
 * Binds each [[TableDef]] to its storage path so application code addresses
 * tables by name, and DDL for the whole schema can be emitted at once.
 */
final class GraftCatalog {
  private val tables = mutable.LinkedHashMap.empty[String, (TableDef, String)]

  /** Register a table (the reference's `table(t)` call). Returns the def for
    * the reference's assign-while-registering idiom. */
  def register(tdef: TableDef, path: String): TableDef = {
    tables(tdef.name) = (tdef, path)
    tdef
  }

  def tableDef(name: String): TableDef = tables(name)._1
  def path(name: String): String = tables(name)._2
  def tableNames: Seq[String] = tables.keys.toSeq

  /** Read a registered table (empty frame with the declared schema when the
    * path does not exist yet — a just-registered, never-written table).
    * Layout-aware: a path under [[graft.store.ManifestTable]] management
    * resolves through its live snapshot (a flat read of such a table would
    * choke on the MANIFEST pointer or double-count two generations). */
  def table(spark: SparkSession, name: String): DataFrame = {
    val (tdef, p) = tables(name)
    try spark.read.schema(tdef.schema)
      .parquet(graft.store.ManifestTable.resolvePaths(spark, p): _*)
    catch { case _: Exception => tdef.empty(spark) }
  }

  /** DDL for every registered table (reference `createScript` per table,
    * HbaseTable.scala:234-290). */
  def createAllScript: String =
    tables.values.map { case (t, p) => t.createScript(p) }.mkString(";\n")

  /** Alter DDL for every registered table whose STORED schema has drifted from
    * its declaration (reference `alterScript`, HbaseTable.scala:270-285) —
    * tables that match (or don't exist yet) emit nothing. */
  def alterAllScript(spark: SparkSession): String =
    tables.values.flatMap { case (t, p) =>
      val stored = try Some(spark.read.parquet(
          graft.store.ManifestTable.resolvePaths(spark, p): _*).schema)
        catch { case _: Exception => None }
      stored.filter(_ != t.schema).map(t.alterScript)
    }.filter(_.nonEmpty).mkString(";\n")

  /** Drop DDL for the whole schema (reference `deleteScript` per table). */
  def deleteAllScript: String =
    tables.values.map(_._1.deleteScript).mkString(";\n")
}
