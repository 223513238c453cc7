package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.schema.TableDef
import graft.store.{KeyedStore, MutationBatch}

/**
 * Mutation-merge semantics (SURVEY §2.3): put-last-wins, map merge with new
 * qualifiers winning, increment add + batch pre-sum, delete precedence
 * (deletes → puts → increments, reference README.markdown:299), OpsResult
 * accounting (reference ExampleSchema.scala:383-410).
 */
class StoreSpec extends SparkSpec {
  _quiet

  private val tdef = TableDef("web")
    .col("meta", "title", StringType)
    .col("meta", "views", LongType)
    .dynFamily("byDay", StringType, LongType)

  private def base = tdef.fromRows(spark, Seq(
    Row("a", Row("A", 1L), Map("d1" -> 10L, "d2" -> 20L)),
    Row("b", Row("B", 2L), Map("d1" -> 1L)),
    Row("c", Row("C", 3L), null)))

  test("upsert: last-write-wins on scalars, untouched fields survive") {
    val puts = tdef.fromRows(spark, Seq(
      Row("a", Row("A2", null), null),  // only title set
      Row("d", Row("D", 9L), Map("d9" -> 9L))))   // brand-new row
    val out = KeyedStore.upsert(base, puts).collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getStruct(1).getString(0) == "A2") // new title wins
    assert(out("a").getStruct(1).getLong(1) == 1L)     // views untouched
    assert(out("a").getMap[String, Long](2) == Map("d1" -> 10L, "d2" -> 20L))
    assert(out("d").getStruct(1).getString(0) == "D")
    assert(out.size == 4)
  }

  test("upsert: map family merges, new qualifiers win (valueMap semantics)") {
    val puts = tdef.fromRows(spark, Seq(
      Row("a", null, Map("d2" -> 99L, "d3" -> 30L))))
    val out = KeyedStore.upsert(base, puts).where(col("key") === "a").head()
    assert(out.getMap[String, Long](2) == Map("d1" -> 10L, "d2" -> 99L, "d3" -> 30L))
    assert(out.getStruct(1).getString(0) == "A") // struct untouched when put null
  }

  test("increment: scalar add with coalesce(old,0); batch rows pre-summed") {
    val deltaSchema = StructType(Seq(
      StructField("key", StringType), StructField("views", LongType)))
    val deltas = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("a", 5L), Row("a", 7L), Row("zz", 100L))), deltaSchema)
    val current = base.select(col("key"), col("meta.views").as("views"))
    val out = KeyedStore.increment(current, deltas)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("a") == 13L)   // 1 + 5 + 7 (batch summed)
    assert(out("b") == 2L)    // untouched
    assert(out("zz") == 100L) // new key, coalesce(old,0)
  }

  test("increment: map family union-merge adds per qualifier") {
    val deltaSchema = StructType(Seq(
      StructField("key", StringType),
      StructField("byDay", MapType(StringType, LongType))))
    val deltas = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("a", Map("d2" -> 5L, "d9" -> 1L)),
        Row("a", Map("d9" -> 2L)),
        Row("c", Map("x" -> 7L)))), deltaSchema)
    val current = base.select(col("key"), col("byDay"))
    val out = KeyedStore.increment(current, deltas)
      .collect().map(r => r.getString(0) -> Option(r.getMap[String, Long](1))).toMap
    assert(out("a").get == Map("d1" -> 10L, "d2" -> 25L, "d9" -> 3L))
    assert(out("c").get == Map("x" -> 7L)) // null family treated as empty
  }

  test("delete: rows, family, qualifiers") {
    import spark.implicits._
    val kA = Seq("a").toDF("key")
    assert(KeyedStore.deleteRows(base, kA).collect().map(_.getString(0)).toSet == Set("b", "c"))
    val famDel = KeyedStore.deleteFamily(base, kA, "meta")
      .where(col("key") === "a").head()
    assert(famDel.isNullAt(1))
    val qualDel = KeyedStore.deleteQualifiers(base, kA, "byDay", Seq("d1"))
      .where(col("key") === "a").head()
    assert(qualDel.getMap[String, Long](2) == Map("d2" -> 20L))
  }

  test("batch: deletes -> puts -> increments precedence + OpsResult accounting") {
    import spark.implicits._
    val deltaSchema = StructType(Seq(
      StructField("key", StringType), StructField("views", LongType)))
    val current = base.select(col("key"), col("meta.views").as("views"))
    val puts = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("a", 50L))), deltaSchema)
    val incs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("a", 1L), Row("b", 1L))), deltaSchema)
    val (out, res) = MutationBatch()
      .delete(Seq("a").toDF("key")) // delete row a FIRST
      .put(puts)                    // then put re-creates a with views=50
      .increment(incs)              // then increments apply on top
      .execute(current)
    val m = out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("a") == 51L) // deleted, re-put 50, +1 — proves delete ran before put
    assert(m("b") == 3L)  // 2 + 1
    assert(res == KeyedStore.OpsResult(1, 1, 2))
  }

  test("upsertVersioned: newer timestamp wins, older put is ignored (HBase cell semantics)") {
    val vSchema = StructType(Seq(
      StructField("key", StringType), StructField("v", StringType),
      StructField("ts", LongType)))
    def mk(rows: Seq[Row]) =
      spark.createDataFrame(spark.sparkContext.parallelize(rows), vSchema)
    val current = mk(Seq(Row("a", "old", 100L), Row("b", "keep", 200L)))
    val puts = mk(Seq(
      Row("a", "new", 150L),   // newer → wins
      Row("b", "stale", 50L),  // older → ignored, ts stays 200
      Row("c", "fresh", 10L))) // brand-new row
    val out = KeyedStore.upsertVersioned(current, puts, "ts")
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out("a") == (("new", 150L)))
    assert(out("b") == (("keep", 200L)))
    assert(out("c") == (("fresh", 10L)))
  }

  test("schema DSL: structure + DDL emission") {
    val s = tdef.schema
    assert(s.fieldNames.toSeq == Seq("key", "meta", "byDay"))
    assert(s("byDay").dataType == MapType(StringType, LongType))
    assert(tdef.createScript("/tmp/web").contains("CREATE TABLE IF NOT EXISTS web"))
    val withTs = TableDef("t").dynFamily("f", StringType, LongType, withCellTimestamps = true)
    assert(withTs.schema.fieldNames.toSeq == Seq("key", "f", "f_ts"))
    assert(withTs.schema("f_ts").dataType == MapType(StringType, TimestampType))
  }

  test("minor compaction merges adjacent small files, leaves big files untouched") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_").toString + "/t"
    // one big range file + a tail of small appended files
    KeyedStore.writeIndexed(
      (0L until 5000L).map(i => (i, s"v$i")).toDF("key", "value"), dir, "key",
      numRanges = 1)
    (0 until 4).foreach { g =>
      Thread.sleep(5)
      (5000L + g * 10 until 5010L + g * 10).map(i => (i, s"v$i")).toDF("key", "value")
        .coalesce(1).sortWithinPartitions("key")
        .write.format("graft").option("key", "key").mode("append").save(dir)
    }
    def files = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(f => f.getName -> f.lastModified()).toMap
    val before = files
    assert(before.size == 5)
    val big = before.keys.maxBy(n => new java.io.File(dir, n).length())
    val bigBefore = new java.io.File(dir, big).length()
    val merged = KeyedStore.compact(spark, dir, "key", smallFileBytes = 16384L)
    assert(merged == 1) // the 4 small tail files form one adjacent run
    // the merged originals survive on disk as keep-one-back strays (funding
    // readers that planned against the previous index version)...
    assert(files.size == 6, s"expected 5 originals + 1 compacted, got ${files.keys}")
    // ...and vacuum past the window leaves exactly the live snapshot
    KeyedStore.vacuumIndexed(spark, dir, "key", keepPrevious = false)
    val after = files
    assert(after.size == 2, s"expected big + 1 compacted, got ${after.keys}")
    assert(new java.io.File(dir, big).length() == bigBefore && after.contains(big))
    // data and pruning behavior unchanged through the connector
    val back = KeyedStore.readKeyed(spark, dir, "key")
    assert(back.count() == 5040)
    assert(back.where(col("key") === 5035L).head().getString(1) == "v5035")
    // idempotent: nothing left to merge
    assert(KeyedStore.compact(spark, dir, "key", smallFileBytes = 16384L) == 0)
  }

  test("catalog registers tables, reads by name, emits whole-schema DDL") {
    val cat = new graft.schema.GraftCatalog
    val dir = java.nio.file.Files.createTempDirectory("graft_cat")
    cat.register(tdef, dir.resolve("web").toString)
    cat.register(TableDef("sites").col("meta", "name", StringType),
      dir.resolve("sites").toString)
    assert(cat.tableNames == Seq("web", "sites"))
    // unwritten table → declared empty frame
    assert(cat.table(spark, "sites").schema.fieldNames.toSeq == Seq("key", "meta"))
    assert(cat.table(spark, "sites").count() == 0)
    // written table → read back through the catalog
    KeyedStore.write(base, cat.path("web"))
    assert(cat.table(spark, "web").count() == 3)
    assert(cat.createAllScript.split(";\n").length == 2)
  }
}
