package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional third arg (dev only): comma-separated query-name substrings
    val only: Option[Seq[String]] =
      if (args.length > 2) Some(args(2).split(",").toSeq) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      // collect_list-style aggregates fall back to sort-based aggregation
      // after 128 hash-map keys by default; posting-list builds (q24) group
      // millions of keys, so keep them in the hash path
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      // AQE coalescing honors the advisory SIZE (round 19, guide §2.1/§2.2):
      // same settings as Bench so the oracle validates the exact execution
      // config the bench measures — see the Bench.scala comment
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    TmpHygiene.sweep() // reclaim pid-salted index dirs from finished runs
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.exists(name.contains)) }
    // name -> exception message for every query that failed (after retry).
    // A failing query must be VISIBLE in the round artifact — silently
    // writing nothing made a broken query vanish from the correctness
    // record instead of appearing as `err`.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    selected.foreach { case (name, fn) =>
      def runOnce(): Unit = fn(spark, sfDir).coalesce(1).write
        .mode("overwrite").parquet(s"$outDir/$name")
      try runOnce()
      catch { case e1: Throwable =>
        // one retry: transient box pressure (tmp-dir races, executor OOM
        // recovery) shouldn't cost a query its correctness record
        System.err.println(s"[verify] $name failed (${e1.getMessage}); retrying once")
        try runOnce()
        catch { case e2: Throwable =>
          System.err.println(s"[verify] $name failed twice: ${e2.getMessage}")
          errors(name) = Option(e2.getMessage).getOrElse(e2.getClass.getName)
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // oracle_sql.json is filtered by the same `only` predicate as the parquet
    // dumps — otherwise a filtered dev run against a previously-used outDir
    // would pair fresh oracle SQL with stale parquet from the earlier full run.
    val json = SparkEntry.oracleSql
      .filter { case (name, _) => only.forall(_.exists(name.contains)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Soundness check: every selected query must have produced a result
    // directory. Diffing against what was ACTUALLY written (not just the
    // caught exceptions) also catches a result dir lost to any external
    // cause; errors.json names each missing query so the driver's gate can
    // record `err` for it rather than omitting it from the round artifact.
    val written = Option(new java.io.File(outDir).listFiles()).getOrElse(Array())
      .filter(_.isDirectory).map(_.getName).toSet
      .intersect(selected.keySet) // stale dirs from earlier dev runs don't count
    val missing = selected.keySet.toSeq.sorted.filterNot(written.contains)
    missing.filterNot(errors.contains).foreach { name =>
      errors(name) = "result directory missing after run (no exception captured)"
    }
    val errJson = errors.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    println(s"[verify] ${written.size}/${selected.size} result dirs written" +
      (if (missing.isEmpty) "; all queries accounted for"
       else s"; MISSING: ${missing.mkString(", ")}"))
    spark.stop()
  }
}
