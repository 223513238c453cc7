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
