package graft.schema

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * Typed table-definition DSL — the Spark-native analogue of the reference's
 * schema system (HPaste `HbaseTable`/`ColumnFamily`/`Column`,
 * reference: src/main/scala/com/gravity/hbase/schema/HbaseTable.scala:51,469-515).
 *
 * Model (SURVEY §1.1): one top-level `key` column; every *fixed* family becomes a
 * struct column holding its declared typed columns; every *dynamic* family (a family
 * whose qualifiers are data, HbaseTable.scala:488-496) becomes a `MapType` column.
 * A dynamic family may opt into a sibling `<fam>_ts: map<K,timestamp>` column for
 * per-cell timestamps (reference: DeserializedResult.scala:120-135, PutOp.scala:28-50).
 *
 * Unlike the reference there are no ByteConverters: Spark's Catalyst types replace
 * the serialization-as-type-system (SURVEY §1.2); compile-time checking comes from
 * `Dataset[CaseClass]` when callers want it.
 */
final case class ColDef(family: String, name: String, dataType: DataType) {
  /** Qualified flat name used when a caller projects a single typed column. */
  def qualified: String = s"$family.$name"
}

final case class FamilyDef(
    name: String,
    cols: Seq[ColDef],
    compressed: Boolean = false,
    versions: Int = 1,
    ttlSeconds: Int = Int.MaxValue) {
  def structType: StructType =
    StructType(cols.map(c => StructField(c.name, c.dataType)))
}

final case class DynFamilyDef(
    name: String,
    keyType: DataType,
    valueType: DataType,
    withCellTimestamps: Boolean = false,
    compressed: Boolean = false,
    versions: Int = 1,
    ttlSeconds: Int = Int.MaxValue) {
  def mapType: MapType = MapType(keyType, valueType)
  def tsColName: String = s"${name}_ts"
}

/**
 * A table definition. Build with the fluent `col`/`family`/`dynFamily` calls, then
 * `schema` gives the StructType and `empty`/`fromRows` give DataFrames.
 *
 * {{{
 * val web = TableDef("web_table")                       // key: string
 *   .family("meta")
 *     .col("meta", "title", StringType)
 *     .col("meta", "lastCrawled", TimestampType)
 *   .dynFamily("searchesByDay", DateType, LongType)
 * }}}
 */
final class TableDef private (
    val name: String,
    val keyType: DataType,
    fams: mutable.LinkedHashMap[String, mutable.LinkedHashMap[String, ColDef]],
    famOpts: mutable.LinkedHashMap[String, (Boolean, Int, Int)],
    dynFams: mutable.LinkedHashMap[String, DynFamilyDef]) {

  def this(name: String, keyType: DataType) =
    this(name, keyType, mutable.LinkedHashMap.empty, mutable.LinkedHashMap.empty,
      mutable.LinkedHashMap.empty)

  /** Declare a (possibly empty) fixed family. Analogue of `family[...]` with declared
    * columns (reference HbaseTable.scala:333-361). */
  def family(fam: String, compressed: Boolean = false, versions: Int = 1,
      ttlSeconds: Int = Int.MaxValue): TableDef = {
    fams.getOrElseUpdate(fam, mutable.LinkedHashMap.empty)
    famOpts(fam) = (compressed, versions, ttlSeconds)
    this
  }

  /** Declare a typed column inside a fixed family (reference `column(...)`,
    * HbaseTable.scala:501-515). */
  def col(fam: String, colName: String, dt: DataType): TableDef = {
    fams.getOrElseUpdate(fam, mutable.LinkedHashMap.empty)
      .update(colName, ColDef(fam, colName, dt))
    famOpts.getOrElseUpdate(fam, (false, 1, Int.MaxValue))
    this
  }

  /** Declare a dynamic family: an open Map[K,V] whose qualifiers are data
    * (reference `family[DateMidnight, Long]("searchesByDay")`,
    * src/test/.../WebCrawlSchemaTest.scala:33). TTL requires
    * `withCellTimestamps` to be enforceable per cell (see [[graft.store.Retention]]). */
  def dynFamily(fam: String, keyType: DataType, valueType: DataType,
      withCellTimestamps: Boolean = false, compressed: Boolean = false,
      versions: Int = 1, ttlSeconds: Int = Int.MaxValue): TableDef = {
    dynFams(fam) = DynFamilyDef(fam, keyType, valueType, withCellTimestamps,
      compressed, versions, ttlSeconds)
    this
  }

  def families: Seq[FamilyDef] = fams.map { case (f, cs) =>
    val (c, v, t) = famOpts(f)
    FamilyDef(f, cs.values.toSeq, c, v, t)
  }.toSeq

  def dynFamilies: Seq[DynFamilyDef] = dynFams.values.toSeq

  /** The table's Spark schema: key + one struct per fixed family + one map per
    * dynamic family (+ optional `_ts` timestamp maps). */
  def schema: StructType = {
    val fields = mutable.ArrayBuffer[StructField](StructField("key", keyType, nullable = false))
    families.foreach { f => fields += StructField(f.name, f.structType) }
    dynFamilies.foreach { d =>
      fields += StructField(d.name, d.mapType)
      if (d.withCellTimestamps)
        fields += StructField(d.tsColName, MapType(d.keyType, TimestampType))
    }
    StructType(fields.toSeq)
  }

  def empty(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  def fromRows(spark: SparkSession, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, math.max(1, rows.size / 1000)), schema)

  /** Family attributes worth persisting — the analogue of the reference's
    * `familyDef` fragment (`{NAME => 'html', VERSIONS => 1, TTL => '...'}`,
    * HbaseTable.scala:288-291): non-default versions/ttl/compression become
    * `graft.family.<fam>.*` table properties, consumed by
    * [[graft.store.Retention]] (ttl) and documented for operators. */
  private def familyProperties: Seq[String] = {
    def props(fam: String, compressed: Boolean, versions: Int, ttl: Int): Seq[String] = {
      val p = Seq.newBuilder[String]
      if (compressed) p += s"'graft.family.$fam.compressed'='true'"
      if (versions != 1) p += s"'graft.family.$fam.versions'='$versions'"
      if (ttl != Int.MaxValue) p += s"'graft.family.$fam.ttlSeconds'='$ttl'"
      p.result()
    }
    families.flatMap(f => props(f.name, f.compressed, f.versions, f.ttlSeconds)) ++
      dynFamilies.flatMap(d => props(d.name, d.compressed, d.versions, d.ttlSeconds))
  }

  /**
   * DDL emission — analogue of the reference's `createScript`
   * (HbaseTable.scala:234-290), but ANSI `CREATE TABLE` over Parquet.
   * Compression is a Parquet codec concern; TTL/versions surface as table
   * properties and are enforced by the [[graft.store.Retention]] job.
   */
  def createScript(location: String): String = {
    val colsSql = schema.fields.map(f => s"  ${f.name} ${f.dataType.sql}").mkString(",\n")
    val tblProps =
      if (familyProperties.isEmpty) ""
      else familyProperties.mkString("\nTBLPROPERTIES (", ", ", ")")
    s"CREATE TABLE IF NOT EXISTS $name (\n$colsSql\n) USING parquet LOCATION '$location'" +
      tblProps
  }

  /**
   * Production-friendly alter script (reference `alterScript`,
   * HbaseTable.scala:270-285 — flush/disable/alter/enable): reconcile a stored
   * table's schema with this declaration. Declared-but-missing columns become
   * `ADD COLUMNS` (reads return null for old files — the same semantics
   * [[graft.store.KeyedStore.readAligned]] applies without a catalog);
   * stored-but-undeclared columns become `DROP COLUMN` (metadata-only over
   * parquet: files keep the bytes, readers stop seeing them). Family
   * attributes are re-asserted like the reference re-emits familyDefs.
   */
  def alterScript(current: StructType): String = {
    val declared = schema
    val have = current.fieldNames.toSet
    val want = declared.fieldNames.toSet
    val stmts = Seq.newBuilder[String]
    val adds = declared.fields.filterNot(f => have.contains(f.name))
    if (adds.nonEmpty)
      stmts += adds.map(f => s"${f.name} ${f.dataType.sql}")
        .mkString(s"ALTER TABLE $name ADD COLUMNS (", ", ", ")")
    current.fields.filterNot(f => want.contains(f.name))
      .foreach(f => stmts += s"ALTER TABLE $name DROP COLUMN ${f.name}")
    familyProperties.foreach(p => stmts += s"ALTER TABLE $name SET TBLPROPERTIES ($p)")
    stmts.result().mkString(";\n")
  }

  /** Reference `deleteScript` (HbaseTable.scala:262-266, disable + delete);
    * no disable phase exists over parquet. */
  def deleteScript: String = s"DROP TABLE IF EXISTS $name"
}

object TableDef {
  /** Row key defaults to String, as in most reference schemas. */
  def apply(name: String, keyType: DataType = StringType): TableDef =
    new TableDef(name, keyType)
}
