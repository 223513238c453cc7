package graft

import org.apache.spark.sql.functions._
import graft.jobs.GJob
import graft.store.KeyedStore

/** The 100 TB design levers, proven at toy scale: salted aggregation
  * correctness and bucketed-join shuffle elimination. */
class ScaleSpec extends SparkSpec {
  _quiet

  test("saltedSum equals plain sum (hot-key safe two-phase aggregation)") {
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val salted = GJob.saltedSum(li, Seq("l_returnflag"), "l_quantity", 16)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val plain = li.groupBy(col("l_returnflag")).agg(sum(col("l_quantity")))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, v) => assert(math.abs(v - plain(k)) < 1e-6, k) }
  }

  test("bucketed tables join with zero shuffle exchange") {
    val c = spark.read.parquet(s"${sf()}/customer.parquet")
      .select(col("c_custkey").as("key"), col("c_name"))
    val o = spark.read.parquet(s"${sf()}/orders.parquet")
      .groupBy(col("o_custkey").as("key")).agg(count(lit(1)).as("n_orders"))
    KeyedStore.writeBucketed(c, "bt_customer", 4)
    KeyedStore.writeBucketed(o, "bt_orders", 4)
    val joined = KeyedStore.readTable(spark, "bt_customer")
      .join(KeyedStore.readTable(spark, "bt_orders"), "key")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() == o.count()) // every aggregated custkey has a customer row
  }

  test("readAligned tolerates schema drift: missing cols null, unknown dropped, casts applied") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_drift").resolve("t").toString
    spark.read.parquet(s"${sf()}/customer.parquet")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .write.parquet(dir) // "old" data: 3 columns
    val declared = StructType(Seq(
      StructField("c_custkey", LongType),          // same
      StructField("c_acctbal", StringType),        // type drift -> cast
      StructField("c_new_flag", BooleanType)))     // added later -> null
    val out = KeyedStore.readAligned(spark, dir, declared)
    assert(out.schema.fieldNames.toSeq == Seq("c_custkey", "c_acctbal", "c_new_flag"))
    assert(out.schema("c_acctbal").dataType == StringType)
    assert(out.where(col("c_new_flag").isNotNull).count() == 0)
    assert(out.count() == 150)
  }

  test("topKPerKey returns k ordered rows per key (group-limit plan)") {
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val top = GJob.topKPerKey(li, Seq(col("l_suppkey")),
      Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")), 2)
    val grouped = top.groupBy(col("l_suppkey")).count().collect()
    assert(grouped.forall(_.getLong(1) <= 2))
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), "expected group-limit physical op")
  }

  test("writePartitioned keeps key-grouped layout readable") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucket").resolve("t").toString
    val c = spark.read.parquet(s"${sf()}/customer.parquet")
      .select(col("c_custkey").as("key"), col("c_acctbal"))
    KeyedStore.writePartitioned(c, dir, 4)
    val back = KeyedStore.read(spark, dir)
    assert(back.count() == c.count())
    assert(back.rdd.getNumPartitions <= 8)
  }
}
