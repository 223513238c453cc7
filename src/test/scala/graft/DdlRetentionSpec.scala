package graft

import java.sql.Timestamp
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.schema.TableDef
import graft.store.Retention

/**
 * DDL lifecycle (create/alter/delete, reference HbaseTable.scala:234-290) and
 * the TTL retention sweep that consumes the declared ttlSeconds.
 */
class DdlRetentionSpec extends SparkSpec {
  _quiet

  private def tableWithTtl = TableDef("ttl_table")
    .family("meta", ttlSeconds = 86400)
    .col("meta", "title", StringType)
    .dynFamily("byDay", StringType, LongType, withCellTimestamps = true,
      ttlSeconds = 3600)

  test("createScript carries family attributes and is runnable ANSI DDL") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ddl").toString
    val ddl = tableWithTtl.createScript(s"$dir/t")
    assert(ddl.contains("'graft.family.meta.ttlSeconds'='86400'"))
    assert(ddl.contains("'graft.family.byDay.ttlSeconds'='3600'"))
    spark.sql(ddl) // must execute as-is
    assert(spark.table("ttl_table").schema.fieldNames.toSeq ==
      Seq("key", "meta", "byDay", "byDay_ts"))
    spark.sql(tableWithTtl.deleteScript)
    assert(!spark.catalog.tableExists("ttl_table"))
  }

  test("alterScript reconciles stored schema drift (adds declared, drops undeclared)") {
    val stored = StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("meta", tableWithTtl.families.head.structType),
      StructField("legacy_blob", BinaryType))) // undeclared leftover
    val alter = tableWithTtl.alterScript(stored)
    assert(alter.contains("ADD COLUMNS (byDay MAP<STRING, BIGINT>, byDay_ts MAP<STRING, TIMESTAMP>)"),
      alter)
    assert(alter.contains("DROP COLUMN legacy_blob"), alter)
    assert(alter.contains("SET TBLPROPERTIES ('graft.family.meta.ttlSeconds'='86400')"), alter)
    // the ADD COLUMNS statement must be executable against a real stored table
    val dir = java.nio.file.Files.createTempDirectory("graft_ddl").toString
    spark.sql(s"CREATE TABLE ttl_alter (key STRING, meta STRUCT<title: STRING>, legacy_blob BINARY) " +
      s"USING parquet LOCATION '$dir/t2'")
    try {
      alter.split(";\n").filter(_.contains("ADD COLUMNS"))
        .foreach(s => spark.sql(s.replace("ALTER TABLE ttl_table", "ALTER TABLE ttl_alter")))
      assert(spark.table("ttl_alter").schema.fieldNames.contains("byDay"))
    } finally spark.sql("DROP TABLE IF EXISTS ttl_alter")
  }

  test("catalog emits alter DDL only for drifted tables, and delete DDL for all") {
    import graft.schema.GraftCatalog
    import org.apache.spark.sql.functions.{col, lit}
    val dir = java.nio.file.Files.createTempDirectory("graft_cat").toString
    val cat = new GraftCatalog
    val a = cat.register(TableDef("cat_a").col("meta", "title", StringType), s"$dir/a")
    cat.register(TableDef("cat_b").col("meta", "title", StringType), s"$dir/b")
    // table a stored with an extra legacy column => drifted; b matches exactly
    a.empty(spark).withColumn("legacy", lit(1)).write.parquet(s"$dir/a")
    cat.table(spark, "cat_b") // b never written — must emit nothing
    val alter = cat.alterAllScript(spark)
    assert(alter.contains("ALTER TABLE cat_a DROP COLUMN legacy"), alter)
    assert(!alter.contains("cat_b"), alter)
    assert(cat.deleteAllScript ==
      "DROP TABLE IF EXISTS cat_a;\nDROP TABLE IF EXISTS cat_b")
  }

  test("catalog reads are layout-aware: a registered path under " +
      "ManifestTable management resolves to the live snapshot (never a " +
      "flat root scan over MANIFEST + two generations)") {
    import graft.schema.GraftCatalog
    import graft.store.ManifestTable
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cat_mani").toString
    val cat = new GraftCatalog
    cat.register(TableDef("cat_m").col("meta", "title", StringType), s"$dir/m")
    import org.apache.spark.sql.functions.{col, struct}
    def rowsOf(kv: (String, String)*) = kv.toSeq.toDF("key", "t")
      .select(col("key"), struct(col("t").as("title")).as("meta"))
    ManifestTable.write(rowsOf("r1" -> "t1", "r2" -> "t2"), s"$dir/m")
    ManifestTable.append(rowsOf("r3" -> "t3"), s"$dir/m")
    // force TWO coexisting generations (keep-one-back) + a MANIFEST pointer
    ManifestTable.compact(spark, s"$dir/m", targetFiles = 1)
    assert(ManifestTable.generations(spark, s"$dir/m").size == 2)
    val got = cat.table(spark, "cat_m").select("key").collect()
      .map(_.getString(0)).sorted.toSeq
    assert(got == Seq("r1", "r2", "r3"),
      s"catalog read must be the live snapshot, got $got")
    // minor compaction (retained reference) stays invisible too
    ManifestTable.append(rowsOf("r4" -> "t4"), s"$dir/m")
    ManifestTable.append(rowsOf("r5" -> "t5"), s"$dir/m")
    assert(ManifestTable.minorCompact(spark, s"$dir/m",
      smallBytes = 1L << 20) >= 2)
    val got2 = cat.table(spark, "cat_m").select("key").collect()
      .map(_.getString(0)).sorted.toSeq
    assert(got2 == Seq("r1", "r2", "r3", "r4", "r5"))
  }

  test("TTL sweep: cell-level expiry on timestamped dynamic families, row-level on fixed") {
    def ts(s: String) = Timestamp.valueOf(s)
    val t = tableWithTtl
    val rows = t.fromRows(spark, Seq(
      // fresh row: written 10 min before asOf, both cells inside their TTLs
      Row("fresh", Row("A"),
        Map("d1" -> 1L, "d2" -> 2L),
        Map("d1" -> ts("2024-01-02 11:50:00"), "d2" -> ts("2024-01-02 11:55:00"))),
      // mixed row: one dyn cell expired (>1h old), one with no recorded ts (kept)
      Row("mixed", Row("B"),
        Map("old" -> 3L, "unknown" -> 4L),
        Map("old" -> ts("2024-01-02 09:00:00"))),
      // stale row: meta written 2 days ago (>24h TTL), all dyn cells expired
      Row("stale", Row("C"),
        Map("old" -> 5L),
        Map("old" -> ts("2023-12-31 12:00:00")))))
      .withColumn("row_ts", org.apache.spark.sql.functions.expr(
        "CASE key WHEN 'stale' THEN TIMESTAMP '2023-12-31 12:00:00' " +
          "ELSE TIMESTAMP '2024-01-02 11:50:00' END"))

    val swept = Retention.applyTtl(rows, t, ts("2024-01-02 12:00:00"), Some("row_ts"))
      .collect().map(r => r.getString(0) -> r).toMap

    assert(swept("fresh").getAs[Row]("meta").getString(0) == "A")
    assert(swept("fresh").getMap[String, Long](2) == Map("d1" -> 1L, "d2" -> 2L))
    assert(swept("mixed").getMap[String, Long](2) == Map("unknown" -> 4L)) // no-ts kept
    assert(swept("mixed").getMap[String, Timestamp](3).isEmpty)
    assert(swept("stale").isNullAt(1), "24h family TTL should null the struct")
    assert(swept("stale").getMap[String, Long](2).isEmpty)

    val gone = Retention.applyTtl(rows, t, ts("2024-01-02 12:00:00"), Some("row_ts"))
      .where(Retention.fullyExpired(rows, t))
      .collect().map(_.getString(0)).toSeq
    assert(gone == Seq("stale"), s"only the stale row should be fully expired, got $gone")
  }
}
