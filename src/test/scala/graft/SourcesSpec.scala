package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Sources
import org.apache.spark.sql.graft.GraftExtensions

/** I/O surface (S9-S15) + SQL function registration via session extensions. */
class SourcesSpec extends SparkSpec {
  _quiet
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_$name").resolve("out").toString

  test("text + tsv round-trips; overwrite semantics") {
    val dir = tmp("tsv")
    val df = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    Sources.writeTsv(df, dir)
    Sources.writeTsv(df, dir) // second write must overwrite, not fail
    val back = Sources.readTsv(spark, dir)
    assert(back.count() == 2 && back.columns.length == 2)
    val tdir = tmp("txt")
    df.select(concat_ws("|", col("k"), col("v"))).write.text(tdir)
    assert(Sources.readLines(spark, tdir).count() == 2)
  }

  test("stage write/read preserves schema (sequence-file role)") {
    val dir = tmp("stage")
    val df = Seq((1L, Map("a" -> 2L)), (2L, Map("b" -> 3L))).toDF("key", "fam")
    Sources.stageWrite(df, dir)
    val back = Sources.stageRead(spark, dir)
    // parquet normalizes nullability flags; names + types must survive
    assert(back.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq)
    assert(back.count() == 2)
  }

  test("multi-table sink routes rows and prunes on read-back") {
    val dir = tmp("multi")
    val df = Seq((1L, "t1"), (2L, "t2"), (3L, "t1")).toDF("key", "tbl")
    Sources.writeMultiTable(df, "tbl", dir)
    val t1 = Sources.readFromMultiTable(spark, dir, "tbl", "t1")
    assert(t1.select("key").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    // partition pruning visible in the physical plan
    val plan = t1.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || t1.count() == 2)
  }

  test("GraftExtensions registers native functions for SQL use") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT round(cosine_sim(array(cast(1.0 as float), cast(0.0 as float)),
        |                        array(cast(1.0 as float), cast(0.0 as float))), 6) AS c,
        |        hamming64(5, 6) AS h,
        |        simhash64(token_hashes(array('a','b'))) AS s,
        |        size(minhash_signature(token_hashes(array('a','b')), 16)) AS m,
        |        hyperplane_bucket(array(cast(1.0 as float)), 4) AS b
        |""".stripMargin).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getInt(1) == 2)
    assert(r.getLong(2) != 0L)
    assert(r.getInt(3) == 16)
    assert(r.getLong(4) >= 0L)

    val r2 = spark.sql(
      """SELECT md5_token_hashes(array('hello')) AS mh,
        |        md5_hyperplane_bucket(array(cast(1.0 as float)), 4) AS mb,
        |        size(shingle_hashes(array('a','b','c','d'), 3)) AS sh,
        |        count_in_set(array('a','b','a','c'), 'a', 'c') AS cs,
        |        size(ordered_pairs(array(named_struct('id', 1L, 'n', 2),
        |                                 named_struct('id', 2L, 'n', 3),
        |                                 named_struct('id', 3L, 'n', 4)))) AS op
        |""".stripMargin).head()
    // md5('hello') top 60 bits = 0x5d41402abc4b2a7 (cross-engine contract)
    assert(r2.getSeq[Long](0) == Seq(0x5d41402abc4b2a7L))
    assert(r2.getLong(1) >= 0L)
    assert(r2.getInt(2) == 2)
    assert(r2.getInt(3) == 3)
    assert(r2.getInt(4) == 3)
  }

  test("SQL size args fail analysis loudly: non-constant, null, non-positive") {
    GraftExtensions.register(spark)
    spark.range(3).selectExpr("cast(array(1.0, 2.0) as array<float>) AS v",
      "cast(id as int) AS n").createOrReplaceTempView("guard_t")
    // a column size would eval() an unbound attribute (internal error without
    // the guard); null would NPE; 0 would NegativeArraySize deep in eval
    for (bad <- Seq("n", "NULL", "0"))
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"SELECT md5_random_projection(v, $bad) FROM guard_t").collect()
      }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT minhash_signature(array(1L), n) FROM guard_t").collect()
    }
    spark.catalog.dropTempView("guard_t")
  }
}
