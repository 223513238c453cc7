package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.query.{Clauses, GQuery}

/**
 * Predicate-algebra semantics (SURVEY §2.2): the setFilterIfMissing(true)
 * null rule (missing column ⇒ row dropped — reference Query2.scala:134-140 note),
 * qualifier-range and pagination map ops vs a naive Scala oracle
 * (the off-by-one-prone P10/P13 flagged in SURVEY §7).
 */
class ClausesSpec extends SparkSpec {
  _quiet

  private val schema = StructType(Seq(
    StructField("key", StringType),
    StructField("v", StringType),
    StructField("fam", MapType(StringType, LongType))))

  private def df = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row("manny", "bc", Map("q1" -> 1L, "q3" -> 3L, "q5" -> 5L)),
      Row("moe", "ab", Map("q2" -> 2L)),
      Row("jack", null, null))), schema)

  test("null semantics: rows lacking the column are dropped (all clauses)") {
    // 'jack' has v = null → must never match, even for not-equals
    assert(df.where(Clauses.mustNotEqual(col("v"), "bc"))
      .collect().map(_.getString(0)).toSeq == Seq("moe"))
    assert(df.where(Clauses.mustEqual(col("v"), "bc")).count() == 1)
    assert(df.where(Clauses.mustBePresent(col("v"))).count() == 2)
    assert(df.where(Clauses.mustContain(col("v"), "b")).count() == 2)
    assert(df.where(Clauses.mustStartWith(col("v"), "a")).count() == 1)
  }

  test("filter vs filterOr composition (AND list, OR list)") {
    val q = GQuery(df)
      .filterOr(Clauses.mustEqual(col("v"), "bc"), Clauses.mustEqual(col("v"), "ab"))
      .filter(Clauses.mustContain(col("v"), "b"))
    assert(q.toDF.count() == 2)
    val q2 = GQuery(df).filter(
      Clauses.and(Clauses.mustContain(col("v"), "b"), Clauses.mustStartWith(col("v"), "b")))
    assert(q2.toDF.collect().map(_.getString(0)).toSeq == Seq("manny"))
  }

  test("P10 qualifier range: betweenColumnKeys filters map keys [lo, hi)") {
    val out = df.where(col("key") === "manny")
      .select(Clauses.betweenColumnKeys(col("fam"), "q1", "q5").as("m"))
      .head().getMap[String, Long](0)
    assert(out == Map("q1" -> 1L, "q3" -> 3L)) // q5 excluded (half-open)
  }

  test("P13 pagination matches naive oracle for all page/offset combos") {
    val entries = Map("q1" -> 1L, "q3" -> 3L, "q5" -> 5L)
    val sorted = entries.toSeq.sortBy(_._1)
    for (size <- 1 to 4; offset <- 0 to 4) {
      val expect = sorted.slice(offset, offset + size).toMap
      val got = df.where(col("key") === "manny")
        .select(Clauses.paginateFamily(col("fam"), size, offset).as("m"))
        .head().getMap[String, Long](0)
      assert(got == expect, s"pageSize=$size offset=$offset")
    }
  }

  test("P11 familyHasKeyGreaterThan row gate") {
    assert(df.where(Clauses.familyHasKeyGreaterThan(col("fam"), "q4"))
      .collect().map(_.getString(0)).toSeq == Seq("manny"))
  }

  test("multiget with returnEmptyRows synthesizes absent keys (S3)") {
    val q = GQuery(df).withKeys(Seq("manny", "ghost"))
    val m = q.multiMap(returnEmptyRows = true)
    assert(m("manny").isDefined && m("ghost").isEmpty && m.size == 2)
    assert(q.multiMap().size == 1)
  }

  test("multiMap maxKeys guard: an over-cap collect is refused LOUDLY " +
      "before the driver heap takes the hit — keyed fan-ins by key count, " +
      "open queries by a distributed count") {
    // keyed: the key list bounds the collect for free
    val keyed = GQuery(df).withKeys(Seq("manny", "ghost", "jack"))
    val ex1 = intercept[IllegalArgumentException] { keyed.multiMap(maxKeys = 2) }
    assert(ex1.getMessage.contains("distributed join"), ex1.getMessage)
    assert(keyed.multiMap(maxKeys = 3).size == 2) // at the cap: fine
    // open query: one count() gates the collect
    val open = GQuery(df)
    val ex2 = intercept[IllegalArgumentException] { open.multiMap(maxKeys = 2) }
    assert(ex2.getMessage.contains("maxKeys=2"), ex2.getMessage)
    assert(open.multiMap().size == 3) // default cap is generous
  }

  test("scan terminal forms: scan callback, scanToIterable, scanUntil, limit (S5, P14)") {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("scanned")
    GQuery(df).filter(Clauses.mustBePresent(col("v"))).scan(_ => acc.add(1))
    assert(acc.value == 2) // distributed handler saw both non-null-v rows
    val names = GQuery(df).scanToIterable(_.getString(0)).sorted
    assert(names == Seq("jack", "manny", "moe"))
    assert(GQuery(df).scanUntil(2).count() == 2)
    assert(GQuery(df).limit(1).toDF.count() == 1)
  }

  test("withAllColumns resets projection") {
    val q = GQuery(df).withColumns(col("v")).withAllColumns()
    assert(q.toDF.columns.toSeq == df.columns.toSeq)
  }

  test("point get singleOption / key range (S2, P17)") {
    assert(GQuery(df).withKey("moe").singleOption().map(_.getString(1)) == Some("ab"))
    assert(GQuery(df).withKey("nope").singleOption().isEmpty)
    assert(GQuery(df).withStartRow("m").withEndRow("mo").toDF
      .collect().map(_.getString(0)).toSeq == Seq("manny"))
  }
}
