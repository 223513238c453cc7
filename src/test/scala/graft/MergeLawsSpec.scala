package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.query.Clauses
import graft.store.KeyedStore

/**
 * Property tests for the merge laws and the off-by-one-prone dynamic-family
 * ops (FIXTURES.md §5, SURVEY §7 hard parts): put-last-wins, increment
 * associativity/commutativity, pagination + qualifier-range vs a naive Scala
 * oracle on randomized maps. Cases are generated with a fixed seed and
 * evaluated as ONE DataFrame per law (each row is a case) — distributed
 * property testing instead of a job per sample.
 */
class MergeLawsSpec extends SparkSpec {
  _quiet

  private val rnd = new scala.util.Random(42)
  private def genMap(): Map[String, Long] =
    (0 until rnd.nextInt(10)).map { _ =>
      f"q${rnd.nextInt(16)}%02d" -> (rnd.nextLong() % 100)
    }.toMap

  private val N = 60
  private val mapSchema = StructType(Seq(
    StructField("key", StringType),
    StructField("fam", MapType(StringType, LongType))))

  private def famDf(ms: Seq[(String, Map[String, Long])]) = spark.createDataFrame(
    spark.sparkContext.parallelize(ms.map { case (k, m) => Row(k, m) }, 4), mapSchema)

  private val casesA = (0 until N).map(i => s"c$i" -> genMap())
  private val casesB = (0 until N).map(i => s"c$i" -> genMap())

  test("upsert is put-last-wins per qualifier; old qualifiers survive (60 cases)") {
    val merged = KeyedStore.upsert(famDf(casesA), famDf(casesB))
      .collect().map(r => r.getString(0) -> r.getMap[String, Long](1)).toMap
    val a = casesA.toMap; val b = casesB.toMap
    a.keys.foreach { k =>
      assert(merged(k) == (a(k) ++ b(k)), s"case $k a=${a(k)} b=${b(k)}")
    }
  }

  test("increment == pointwise addition; commutative (60 cases)") {
    def add(x: Map[String, Long], y: Map[String, Long]) =
      (x.keySet ++ y.keySet).map(k => k -> (x.getOrElse(k, 0L) + y.getOrElse(k, 0L))).toMap
    val ab = KeyedStore.increment(famDf(casesA), famDf(casesB))
      .collect().map(r => r.getString(0) -> Option(r.getMap[String, Long](1)).getOrElse(Map.empty[String, Long])).toMap
    val ba = KeyedStore.increment(famDf(casesB), famDf(casesA))
      .collect().map(r => r.getString(0) -> Option(r.getMap[String, Long](1)).getOrElse(Map.empty[String, Long])).toMap
    val a = casesA.toMap; val b = casesB.toMap
    a.keys.foreach { k =>
      assert(ab(k) == add(a(k), b(k)), s"case $k")
      assert(ba(k) == ab(k), s"commutativity case $k")
    }
  }

  test("paginateFamily == sorted-slice oracle (60 cases x 12 page shapes)") {
    for (size <- Seq(1, 2, 3, 5); offset <- Seq(0, 1, 4)) {
      val got = famDf(casesA)
        .select(col("key"), Clauses.paginateFamily(col("fam"), size, offset).as("p"))
        .collect().map(r => r.getString(0) -> r.getMap[String, Long](1)).toMap
      casesA.foreach { case (k, m) =>
        val want = m.toSeq.sortBy(_._1).slice(offset, offset + size).toMap
        assert(got(k) == want, s"case $k m=$m size=$size offset=$offset")
      }
    }
  }

  test("betweenColumnKeys == half-open filter oracle (60 cases x 4 ranges)") {
    for ((lo, hi) <- Seq(("q00", "q08"), ("q04", "q12"), ("q08", "q08"), ("q12", "q99"))) {
      val got = famDf(casesA)
        .select(col("key"), Clauses.betweenColumnKeys(col("fam"), lo, hi).as("p"))
        .collect().map(r => r.getString(0) -> r.getMap[String, Long](1)).toMap
      casesA.foreach { case (k, m) =>
        assert(got(k) == m.filter { case (q, _) => q >= lo && q < hi },
          s"case $k range [$lo,$hi)")
      }
    }
  }

  test("rolling_hash: h(a+b) derivable from h(a) — Karp-Rabin composition (60 cases)") {
    import graft.functions.GraftFunctions._
    import spark.implicits._
    val strs = (0 until N).map { _ =>
      val a = rnd.alphanumeric.take(rnd.nextInt(30)).mkString
      val b = rnd.alphanumeric.take(rnd.nextInt(30)).mkString
      (a, b)
    }
    val rows = strs.map { case (a, b) => (a, b, a + b) }.toDF("a", "b", "ab")
      .select(rolling_hash(col("a")).as("ha"), col("b"), rolling_hash(col("ab")).as("hab"))
      .collect()
    val M = 2147483647L
    rows.foreach { r =>
      val expect = r.getString(1).foldLeft(r.getLong(0))(
        (acc, ch) => ((acc * 31 + ch.toLong) % M + M) % M)
      assert(r.getLong(2) == expect)
    }
  }
}
