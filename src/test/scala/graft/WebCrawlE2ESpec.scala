package graft

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.schema.TableDef
import graft.store.{KeyedStore, MutationBatch}
import graft.query.GQuery

/**
 * The reference's flagship showcase, end-to-end on this engine: the WebCrawl
 * schema + WebSearchAggregation job (reference
 * WebCrawlSchemaTest.scala:22-56, 82-130, 246-281; fixture values from
 * FIXTURES.md §2-3). Put pages with a dynamic searchesByDay family, run
 * scan → explode family → group by (domain, day) → sum → merge into the
 * site_metrics table, and check the reference's expected rollup:
 * mycrawledsite.com → {2011-06-04: 102, 2011-06-05: 9}.
 */
class WebCrawlE2ESpec extends SparkSpec {
  _quiet

  private val webTable = TableDef("web_table")
    .col("meta", "title", StringType)
    .col("meta", "lastCrawled", TimestampType)
    .col("text", "article", StringType)
    .dynFamily("searchesByDay", DateType, LongType)

  private val siteMetrics = TableDef("site_metrics")
    .col("meta", "name", StringType)
    .dynFamily("searchesByDay", DateType, LongType)

  private def day(s: String) = Date.valueOf(s)

  // 3 pages × 2 dates on one domain + 1 page on another (reference :246-267)
  private def pages = webTable.fromRows(spark, Seq(
    Row("http://mycrawledsite.com/pageA", Row("A", Timestamp.valueOf("2011-06-05 08:00:00")),
      Row("article a"), Map(day("2011-06-04") -> 34L, day("2011-06-05") -> 3L)),
    Row("http://mycrawledsite.com/pageB", Row("B", Timestamp.valueOf("2011-06-05 08:00:00")),
      Row("article b"), Map(day("2011-06-04") -> 34L, day("2011-06-05") -> 3L)),
    Row("http://mycrawledsite.com/pageC", Row("C", Timestamp.valueOf("2011-06-05 08:00:00")),
      Row("article c"), Map(day("2011-06-04") -> 34L, day("2011-06-05") -> 3L)),
    Row("http://othersite.com/page1", Row("O", Timestamp.valueOf("2011-06-05 08:00:00")),
      Row("article o"), Map(day("2011-06-04") -> 7L))))

  private val domain = regexp_extract(col("key"), "https?://([^/]+)/", 1)

  test("WebSearchAggregation: scan -> explode family -> agg -> merge into sites") {
    // the MR job (reference :82-130) as one Catalyst plan
    val rollup = pages
      .select(domain.as("key"), explode(col("searchesByDay")).as(Seq("day", "n")))
      .groupBy(col("key"), col("day")).agg(sum(col("n")).as("n"))
      .groupBy(col("key"))
      .agg(map_from_entries(collect_list(struct(col("day"), col("n")))).as("searchesByDay"))
      .withColumn("meta", struct(col("key").as("name")))
      .select(col("key"), col("meta"), col("searchesByDay"))

    val (merged, res) = MutationBatch()
      .put(rollup)
      .execute(siteMetrics.empty(spark))
    assert(res.numPuts == 2) // one put row per site (per-op accounting, OpBase style)

    val bySite = merged.collect().map(r => r.getString(0) -> r.getMap[Date, Long](2)).toMap
    assert(bySite("mycrawledsite.com") ==
      Map(day("2011-06-04") -> 102L, day("2011-06-05") -> 9L)) // FIXTURES.md §3 oracle
    assert(bySite("othersite.com") == Map(day("2011-06-04") -> 7L))

    // round-trip through the keyed store and read back with the query DSL
    val dir = java.nio.file.Files.createTempDirectory("graft_sites").resolve("t").toString
    KeyedStore.write(merged, dir)
    val row = GQuery(KeyedStore.read(spark, dir)).withKey("mycrawledsite.com").single()
    assert(row.getAs[Row]("meta").getString(0) == "mycrawledsite.com")
  }

  test("incremental re-crawl: increments merge into existing site metrics") {
    val base = siteMetrics.fromRows(spark, Seq(
      Row("mycrawledsite.com", Row("mycrawledsite.com"),
        Map(day("2011-06-04") -> 102L, day("2011-06-05") -> 9L))))
    val deltaSchema = StructType(Seq(
      StructField("key", StringType),
      StructField("searchesByDay", MapType(DateType, LongType))))
    val deltas = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("mycrawledsite.com", Map(day("2011-06-05") -> 1L, day("2011-06-06") -> 5L)))),
      deltaSchema)
    val out = KeyedStore.increment(base, deltas)
      .where(col("key") === "mycrawledsite.com").head()
    assert(out.getMap[Date, Long](2) ==
      Map(day("2011-06-04") -> 102L, day("2011-06-05") -> 10L, day("2011-06-06") -> 5L))
  }
}
