package org.apache.spark.sql.graft

import java.nio.charset.StandardCharsets.UTF_8

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.functions.{coalesce, col, lit, not}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * A real DataSource-V2 `TableCatalog` over the keyed-store layout — the named-
 * table surface the reference exposes through its schema registry
 * (reference: src/main/scala/com/gravity/hbase/schema/Schema.scala:24-43,
 * tables registered once and addressed by name everywhere). Registered as
 *
 * {{{
 *   spark.sql.catalog.gcat           = org.apache.spark.sql.graft.GraftTableCatalog
 *   spark.sql.catalog.gcat.warehouse = /path/to/warehouse
 * }}}
 *
 * it makes the keyed store addressable in PLAIN SQL:
 *
 * {{{
 *   CREATE TABLE gcat.db.users (key BIGINT, name STRING) TBLPROPERTIES ('key'='key')
 *   INSERT INTO gcat.db.users SELECT ...       -- graft write path (sidecar index
 *                                              --   assembled from task commits)
 *   SELECT * FROM gcat.db.users WHERE key = 7  -- key-range split pruning
 *   DELETE FROM gcat.db.users WHERE key < 100  -- index-pruned file rewrite
 *   TRUNCATE TABLE gcat.db.users
 * }}}
 *
 * Layout: `warehouse/<namespace>/<table>/` holds the data files + the
 * `_graft_index` sidecar + a small `_graft_meta` JSON (key column + schema),
 * so a table round-trips with its key declaration — readers never need to
 * re-state `.option("key", ...)`.
 *
 * DELETE is index-pruned (see [[GraftTable.deleteWhere]]): only files whose
 * key range can intersect the predicate are rewritten — a key-targeted DELETE
 * on a 100 TB table rewrites the affected ranges, not the table. UPDATE/MERGE
 * remain API-side ([[graft.store.KeyedStore.upsertIndexed]]) — Spark's
 * row-level-operation API would route them the same way.
 */
class GraftTableCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: String = _

  private def spark: SparkSession = SparkSession.active
  private def fs(p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = options.get("warehouse")
    require(warehouse != null,
      s"graft catalog '$name' requires spark.sql.catalog.$name.warehouse")
  }

  override def name(): String = catalogName

  private def tableDir(ident: Identifier): Path =
    new Path((warehouse +: ident.namespace() :+ ident.name()).mkString("/"))

  // ------------------------------- tables --------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val ns = new Path((warehouse +: namespace).mkString("/"))
    val f = fs(ns)
    if (!f.exists(ns)) Array.empty
    else f.listStatus(ns).filter(_.isDirectory)
      .map(st => Identifier.of(namespace, st.getPath.getName))
  }

  override def tableExists(ident: Identifier): Boolean = {
    val d = tableDir(ident)
    fs(d).exists(new Path(d, GraftTableMeta.FileName))
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = tableDir(ident)
    val meta = GraftTableMeta.read(dir, spark).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident))
    new GraftTable(meta.schema, new CaseInsensitiveStringMap(
      Map("path" -> dir.toString, "key" -> meta.keyCol).asJava))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft tables partition by key range (the sidecar index), not by transform")
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(ident)
    val keyCol = Option(properties.get("key")).getOrElse(schema.fieldNames.head)
    require(schema.fieldNames.contains(keyCol),
      s"key column '$keyCol' not in schema ${schema.fieldNames.mkString(",")}")
    val dir = tableDir(ident)
    fs(dir).mkdirs(dir)
    GraftTableMeta(keyCol, schema).write(dir, spark)
    new GraftTable(schema, new CaseInsensitiveStringMap(
      Map("path" -> dir.toString, "key" -> keyCol).asJava))
  }

  /**
   * Metadata-only schema evolution — the HBase add/drop-family analogue (a
   * new column family costs an alter, never a table rewrite). ADD COLUMN:
   * existing files simply lack the column and the parquet reader fills nulls;
   * DROP COLUMN: the declared schema stops requesting it, so scans prune it
   * at the reader (the bytes stay until the next compaction, exactly like
   * HBase cells awaiting a major compaction after a family delete). Renames
   * and type changes are rejected — they would silently orphan immutable
   * data files.
   */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = tableDir(ident)
    val meta = GraftTableMeta.read(dir, spark).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident))
    var schema = meta.schema
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames().length == 1,
          "graft tables support top-level column adds only")
        require(add.isNullable,
          "added columns must be nullable — existing rows have no value")
        schema = schema.add(add.fieldNames().head, add.dataType(), nullable = true)
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames().length == 1,
          "graft tables support top-level column drops only")
        val name = del.fieldNames().head
        require(name != meta.keyCol, s"cannot drop the key column '$name'")
        require(schema.fieldNames.contains(name), s"no such column '$name'")
        schema = StructType(schema.filterNot(_.name == name))
      case other =>
        throw new UnsupportedOperationException(
          s"unsupported alter for immutable graft data files: $other")
    }
    GraftTableMeta(meta.keyCol, schema).write(dir, spark)
    new GraftTable(schema, new CaseInsensitiveStringMap(
      Map("path" -> dir.toString, "key" -> meta.keyCol).asJava))
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    val f = fs(dir)
    f.exists(dir) && f.delete(dir, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    // `RENAME TO gcat.db.t` reaches the catalog with the catalog name still in
    // the target's namespace (Spark passes it verbatim) — strip our own name
    val target =
      if (newIdent.namespace().headOption.contains(catalogName))
        Identifier.of(newIdent.namespace().tail, newIdent.name())
      else newIdent
    val (from, to) = (tableDir(oldIdent), tableDir(target))
    val f = fs(from)
    f.mkdirs(to.getParent)
    if (!f.rename(from, to))
      throw new IllegalStateException(s"rename $from -> $to failed")
  }

  // ----------------------------- namespaces ------------------------------

  override def listNamespaces(): Array[Array[String]] = {
    val root = new Path(warehouse)
    val f = fs(root)
    if (!f.exists(root)) Array.empty
    else f.listStatus(root).filter(_.isDirectory).map(st => Array(st.getPath.getName))
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces() else Array.empty

  override def namespaceExists(namespace: Array[String]): Boolean =
    fs(new Path((warehouse +: namespace).mkString("/")))
      .exists(new Path((warehouse +: namespace).mkString("/")))

  override def loadNamespaceMetadata(namespace: Array[String]): java.util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(namespace)
    java.util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = {
    val p = new Path((warehouse +: namespace).mkString("/"))
    fs(p).mkdirs(p)
  }

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val p = new Path((warehouse +: namespace).mkString("/"))
    val f = fs(p)
    if (!f.exists(p)) false
    else {
      if (!cascade && f.listStatus(p).nonEmpty)
        throw new IllegalStateException(s"namespace ${namespace.mkString(".")} not empty")
      f.delete(p, true)
    }
  }
}

/** The `_graft_meta` sidecar: key column + schema JSON, so a catalog table
  * round-trips with its key declaration. */
final case class GraftTableMeta(keyCol: String, schema: StructType) {
  def write(dir: Path, spark: SparkSession): Unit = {
    val p = new Path(dir, GraftTableMeta.FileName)
    val out = p.getFileSystem(spark.sessionState.newHadoopConf()).create(p, true)
    val json = s"""{"key":${GraftTableMeta.q(keyCol)},"schema":${schema.json}}"""
    try out.write(json.getBytes(UTF_8)) finally out.close()
  }
}

object GraftTableMeta {
  val FileName = "_graft_meta"

  private def q(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  def read(dir: Path, spark: SparkSession): Option[GraftTableMeta] = {
    val p = new Path(dir, FileName)
    val f = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!f.exists(p)) return None
    val in = f.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    // minimal parse: {"key":<json string>,"schema":<schema json>}
    val keyStart = text.indexOf("\"key\":") + 6
    val keyEnd = text.indexOf(",\"schema\":")
    val key = text.substring(keyStart, keyEnd).trim.stripPrefix("\"").stripSuffix("\"")
      .replace("\\\"", "\"").replace("\\\\", "\\")
    val schemaJson = text.substring(keyEnd + 10, text.length - 1)
    Some(GraftTableMeta(key, DataType.fromJson(schemaJson).asInstanceOf[StructType]))
  }
}

/** v1 `Filter` → `Column` translation for DELETE predicates. `None` = a filter
  * shape we cannot faithfully evaluate (so `canDeleteWhere` refuses and Spark
  * reports the unsupported DELETE instead of silently mis-deleting). */
private[graft] object FilterToColumn {
  def apply(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, p) => Some(col(a).startsWith(p))
    case StringEndsWith(a, p) => Some(col(a).endsWith(p))
    case StringContains(a, p) => Some(col(a).contains(p))
    case And(l, r) => for { lc <- apply(l); rc <- apply(r) } yield lc && rc
    case Or(l, r) => for { lc <- apply(l); rc <- apply(r) } yield lc || rc
    case Not(c) => apply(c).map(not)
    case AlwaysTrue() => Some(lit(true))
    case AlwaysFalse() => Some(lit(false))
    case _ => None
  }

  def all(filters: Array[Filter]): Option[Column] =
    filters.foldLeft(Option(lit(true))) { (acc, f) =>
      for { a <- acc; c <- apply(f) } yield a && c
    }
}
