package graft

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schema.{DocTable, TypedTableDef}

/**
 * Compile-time-checked column references (reference HbaseTable.scala:333-361,
 * README.markdown:12): typos and type mismatches FAIL COMPILATION — pinned
 * here with assertTypeError — and the typed refs drive real Catalyst plans
 * identical to their stringly-typed twins.
 */
class TypedSchemaSpec extends SparkSpec {
  _quiet

  object web extends TypedTableDef[String]("web_table") {
    class Meta extends Family("meta") {
      val title = col[String]("title")
      val lastCrawled = col[Timestamp]("lastCrawled")
    }
    val meta = new Meta
    val searchesByDay = new DynFamily[Date, Long]("searchesByDay")
  }

  private def day(s: String) = Date.valueOf(s)

  private def pages = web.fromRows(spark, Seq(
    Row("http://mycrawledsite.com/pageA", Row("A", Timestamp.valueOf("2011-06-05 08:00:00")),
      Map(day("2011-06-04") -> 34L, day("2011-06-05") -> 3L)),
    Row("http://othersite.com/page1", Row("O", Timestamp.valueOf("2011-06-01 08:00:00")),
      Map(day("2011-06-04") -> 7L))))

  test("typos and wrong literal types fail compilation (the reference's headline guarantee)") {
    assertCompiles("""web.meta.title === "A"""")
    assertTypeError("""web.meta.titel === "A"""")        // misspelled column
    assertTypeError("""web.metaa.title === "A"""")       // misspelled family
    // NB: literal-type checks on === can't be asserted inside a ScalaTest
    // suite (TripleEquals injects a universal ===); the ordering operators
    // carry the same T-typed signature and prove the property:
    assertCompiles("""web.meta.lastCrawled > Timestamp.valueOf("2011-06-05 08:00:00")""")
    assertTypeError("""web.meta.lastCrawled > "2011-06-05"""") // wrong literal type
    assertTypeError("""web.meta.title.in(1, 2)""")             // wrong element type
    assertTypeError("""web.searchesByDay("2011-06-04")""")     // qualifier must be Date
    assertTypeError("""web.key.between(1, 9)""")               // key is String here
  }

  test("typed refs build the same plans as string refs") {
    val p = pages
    val typed = p.where(web.meta.title === "A")
      .select(web.key.column, web.meta.lastCrawled.as("ts"))
    val stringly = p.where(col("meta.title") === "A")
      .select(col("key"), col("meta.lastCrawled").as("ts"))
    assert(typed.queryExecution.optimizedPlan.sameResult(stringly.queryExecution.optimizedPlan))
    val row = typed.head()
    assert(row.getString(0) == "http://mycrawledsite.com/pageA")
  }

  test("dynamic-family qualifier access and qualifier ranges are typed") {
    val got = pages.select(web.key.column, web.searchesByDay(day("2011-06-04")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("http://othersite.com/page1") == 7L)

    val ranged = pages
      .select(web.key.column,
        map_keys(web.searchesByDay.betweenKeys(day("2011-06-05"), day("2011-06-30"))).as("ks"))
      .where(size(col("ks")) > 0)
    assert(ranged.count() == 1)
  }

  test("schema derives from the typed declaration (same TableDef model underneath)") {
    assert(web.schema == StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("meta", StructType(Seq(
        StructField("title", StringType),
        StructField("lastCrawled", TimestampType)))),
      StructField("searchesByDay", MapType(DateType, LongType)))))
    assert(web.tableDef.createScript("/tmp/x").contains("web_table"))
  }

  test("typed comparison operators cover the clause algebra") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id").as("key"),
        struct(col("lang"), col("source"), col("n_chars")).as("meta"))
    val a = docs.where(DocTable.meta.nChars.between(100L, 500L) &&
      DocTable.meta.lang.in("en", "de") && DocTable.meta.source.isNotNull).count()
    val b = docs.where(col("meta.n_chars").between(100, 500) &&
      col("meta.lang").isin("en", "de") && col("meta.source").isNotNull).count()
    assert(a == b && a > 0)
  }
}
