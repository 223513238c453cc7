package graft

import org.apache.spark.sql.SparkSession

/** Prints plan-quality signals per query: pushed filters, join strategies,
  * codegen spans, exchange counts. Run: sbt "Test/runMain graft.PlanAudit". */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      // audit the STATIC plan: AQE wraps everything in AdaptiveSparkPlan whose
      // toString hides codegen spans until execution finalizes each stage
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    // streaming queries drain through runToTable — the returned frame is a
    // memory-table scan, so there is no batch plan to audit
    val skip = Set("q31_stream_hourly", "q48_stream_sessionize",
      "q49_stream_interval_join", "q67_stream_dedup", "q70_stream_keyed_read",
      "q80_stream_near_dedup")
    SparkEntry.queries.foreach { case (name, fn) =>
      if (!skip.contains(name)) {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val pushed = (plan.split("PushedFilters: \\[").length - 1) -
          (plan.split("PushedFilters: \\[\\]").length - 1)
        val bhj = plan.split("BroadcastHashJoin").length - 1
        val smj = plan.split("SortMergeJoin").length - 1
        val shj = plan.split("ShuffledHashJoin").length - 1
        val bnl = plan.split("BroadcastNestedLoopJoin").length - 1
        val ex = plan.split("Exchange").length - 1
        // codegen'd operators render as "*(spanId) Op"; count ops inside spans
        // and the number of distinct spans
        val codegenOps = plan.split("\\*\\(").length - 1
        val spans = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan).map(_.group(1)).toSet.size
        println(f"PLAN $name%-24s pushed=$pushed bhj=$bhj smj=$smj shj=$shj bnl=$bnl " +
          f"exchange=$ex codegenOps=$codegenOps spans=$spans")
      }
    }
    spark.stop()
  }
}
