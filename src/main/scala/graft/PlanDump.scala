package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` of declared queries to files — the plan
  * evidence the optimization rounds commit under `plans/rNN/`. Usage:
  * `runMain graft.PlanDump <outDir> <suffix> q217,q232,...` (query-name
  * prefixes accepted). Lifecycle query bodies run their maintenance verbs
  * while building the returned DataFrame — the dump therefore executes
  * side effects exactly like one bench rep, then explains the returned
  * (declared) plan. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val wanted = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir)): Unit
    wanted.foreach { w =>
      SparkEntry.queries.find(_._1.startsWith(w)) match {
        case Some((name, fn)) =>
          try {
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            val p = java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt")
            java.nio.file.Files.write(p, plan.getBytes("UTF-8")): Unit
            System.err.println(s"[plandump] wrote $p")
          } catch { case t: Throwable =>
            System.err.println(s"[plandump] $name FAILED: $t")
          }
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
          spark.catalog.clearCache()
        case None => System.err.println(s"[plandump] no query matches $w")
      }
    }
    spark.stop()
  }
}
