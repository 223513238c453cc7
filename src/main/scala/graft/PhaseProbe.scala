package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only phase profiler for the heavy lifecycle queries: runs one query's
  * composing operator calls with wall-clock timing per phase, so optimization
  * work targets the phase that actually costs seconds (guide §1: measure
  * first). Usage: `runMain graft.PhaseProbe q217 [reps]`. Timing-only — no
  * oracle obligations ride on this main. */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("q217")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
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
    def phase[A](name: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[phase] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3fs")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    (1 to reps).foreach { rep =>
      System.err.println(s"=== $which rep $rep ===")
      which match {
        case "q217" =>
          val path = sys.props("java.io.tmpdir") + "/graft_probe_q217_" +
            java.lang.ProcessHandle.current().pid() + "_" + rep
          phase("write")(ops.TextOps.writeBm25Index(
            docs.where(col("doc_id") % 2 === 0), "doc_id", "text", path))
          phase("append1")(ops.TextOps.appendBm25Index(
            docs.where(col("doc_id") % 2 =!= 0), "doc_id", "text", path,
            batchId = Some("day-1")))
          phase("append2-noop")(ops.TextOps.appendBm25Index(
            docs.where(col("doc_id") % 2 =!= 0), "doc_id", "text", path,
            batchId = Some("day-1")))
          phase("compact")(ops.TextOps.compactBm25Index(spark, path,
            targetFiles = 1))
          phase("probe")(ops.TextOps.bm25TopKFromIndex(spark, path,
              Seq("spark", "window", "merge"), 15)
            .write.format("noop").mode("overwrite").save())
        case "q232" =>
          val path = sys.props("java.io.tmpdir") + "/graft_probe_q232_" +
            java.lang.ProcessHandle.current().pid() + "_" + rep
          phase("write")(ops.TextOps.writeBm25Index(
            docs.where(col("doc_id") % 4 === 0), "doc_id", "text", path))
          def day(n: Int, batch: org.apache.spark.sql.DataFrame): Unit = {
            phase(s"day$n-append")(ops.TextOps.appendBm25Index(batch,
              "doc_id", "text", path))
            phase(s"day$n-compact")(ops.TextOps.compactBm25Index(spark, path,
              targetFiles = 1))
            phase(s"day$n-vacuum")(graft.store.Compaction.vacuumPartitions(
              spark, path + "/postings", keepPrevious = false))
          }
          day(1, docs.where(col("doc_id") % 4 === 1))
          day(2, docs.where(col("doc_id") % 4 === 2 || col("doc_id") % 4 === 3))
          phase("probe")(ops.TextOps.bm25TopKFromIndex(spark, path,
              Seq("spark", "window", "merge"), 15)
            .write.format("noop").mode("overwrite").save())
        case "q231" =>
          val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
            .select(col("vec_id"), col("embedding"))
          val q = emb.where(col("vec_id") === 7).select(col("embedding"))
            .head().getSeq[Float](0)
          val planted = emb.where(col("vec_id") === 7)
            .select(explode(sequence(lit(0), lit(4))).as("i"), col("embedding"))
            .select((col("i") + 9500L).as("vec_id"), col("embedding"))
          val base = emb.where(col("vec_id") =!= 7 && col("vec_id") % 20 =!= 3 &&
            col("vec_id") % 20 =!= 9)
          val day1 = emb.where(col("vec_id") =!= 7 && col("vec_id") % 20 === 3)
          val day2 = emb.where(col("vec_id") =!= 7 && col("vec_id") % 20 === 9)
            .unionByName(planted)
          val path = sys.props("java.io.tmpdir") + "/graft_probe_q231_" +
            java.lang.ProcessHandle.current().pid() + "_" + rep
          phase("write")(ops.Similarity.writeBucketedCorpus(base, "vec_id",
            "embedding", path, nBits = 5))
          phase("append1")(ops.Similarity.appendBucketedCorpus(day1, "vec_id",
            "embedding", path, nBits = 5))
          phase("compact1")(ops.Similarity.compactBucketedCorpus(spark, path,
            targetFiles = 1))
          phase("append2")(ops.Similarity.appendBucketedCorpus(day2, "vec_id",
            "embedding", path, nBits = 5))
          phase("compact2")(ops.Similarity.compactBucketedCorpus(spark, path,
            targetFiles = 1))
          phase("probe")(ops.Similarity.annTopKFromBucketed(spark, path,
              "vec_id", "embedding", q, 5, nBits = 5)
            .write.format("noop").mode("overwrite").save())
        case "q217w" => // writeBm25Index decomposed (mirrors TextOps internals)
          val path = sys.props("java.io.tmpdir") + "/graft_probe_q217w_" +
            java.lang.ProcessHandle.current().pid() + "_" + rep
          val df = docs.where(col("doc_id") % 2 === 0)
          import graft.functions.GraftFunctions.{tokens, token_count}
          val toks = df.select(col("doc_id").as("id"),
              tokens(lower(col("text"))).as("tk"))
            .select(col("id"), size(col("tk")).cast("bigint").as("dl"),
              explode(col("tk")).as("term"))
          phase("postings-write")(
            toks.groupBy(col("id"), col("dl"), col("term"))
              .agg(count(lit(1)).as("tf"))
              .withColumn("bucket",
                pmod(graft.functions.GraftFunctions.md5_prefix60(col("term")),
                  lit(64L)))
              .repartition(col("bucket"), pmod(hash(col("id")), lit(4)))
              .write.partitionBy("bucket").mode("overwrite")
              .parquet(path + "/postings"))
          phase("migrateLeaves")(
            graft.store.Compaction.migrateLeaves(spark, path + "/postings"))
          phase("docs-write")(graft.store.ManifestTable.write(
            df.select(col("doc_id").as("id"),
              token_count(lower(col("text"))).cast("bigint").as("dl")),
            path + "/docs"))
          phase("stats-read-agg-write")(graft.store.ManifestTable.write(
            graft.store.ManifestTable.read(spark, path + "/docs")
              .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")),
            path + "/stats"))
          phase("stats-again")(graft.store.ManifestTable.write(
            graft.store.ManifestTable.read(spark, path + "/docs")
              .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")),
            path + "/stats"))
          phase("bare-noop-job")(
            spark.range(0L, 1000000L, 1L, 32).selectExpr("sum(id)")
              .write.format("noop").mode("overwrite").save())
        case "q257" =>
          val salt = java.lang.ProcessHandle.current().pid() + "_" + rep
          val pairsPath = sys.props("java.io.tmpdir") + s"/graft_probe_q257_pairs_$salt"
          val clustersPath =
            sys.props("java.io.tmpdir") + s"/graft_probe_q257_clusters_$salt"
          phase("writePairs")(ops.Dedup.writePairs(
            docs.where(col("doc_id") % 4 === 0), "doc_id", "text",
            pairsPath, shingleSize = 3, minJaccard = 0.2, maxDf = Some(1000)))
          phase("writeClusters")(ops.Dedup.writeClusters(spark, pairsPath,
            clustersPath, threshold = 0.8))
          def run(n: Int): Unit = phase(s"stream-run$n")(
            graft.streaming.Streaming.ingestIntoClusters(
              graft.streaming.Streaming.docsReplay(spark, sfDir, 2)
                .where(col("doc_id") % 4 === 1)
                .select(col("doc_id"), col("text")),
              pairsPath, clustersPath, "doc_id", "text", shingleSize = 3,
              minJaccard = 0.2, maxDf = Some(1000), threshold = 0.8)
              .awaitTermination())
          run(1)
          run(2)
          phase("readClusters")(ops.Dedup.readClusters(spark, clustersPath)
            .write.format("noop").mode("overwrite").save())
        case "floor" => // bare fixed costs: tiny jobs of each shape
          val base = sys.props("java.io.tmpdir") + "/graft_probe_floor_" +
            java.lang.ProcessHandle.current().pid() + "_" + rep
          val tiny = spark.range(0L, 50000L, 1L, 32)
            .selectExpr("id", "pmod(id, 24) as bucket")
          phase("noop-1stage")(
            spark.range(0L, 50000L, 1L, 32).selectExpr("sum(id)")
              .write.format("noop").mode("overwrite").save())
          phase("flat-write")(
            tiny.coalesce(1).write.mode("overwrite").parquet(base + "/flat"))
          phase("partitionBy-write")(
            tiny.repartition(col("bucket"))
              .write.partitionBy("bucket").mode("overwrite")
              .parquet(base + "/parted"))
          phase("read48-agg")(
            spark.read.parquet(base + "/parted").agg(count(lit(1)))
              .write.format("noop").mode("overwrite").save())
          phase("shuffle-agg")(
            tiny.groupBy("bucket").agg(count(lit(1)))
              .write.format("noop").mode("overwrite").save())
          phase("partitionBy-write-v2")(
            tiny.repartition(col("bucket"))
              .write.option(
                "mapreduce.fileoutputcommitter.algorithm.version", "2")
              .partitionBy("bucket").mode("overwrite")
              .parquet(base + "/parted2"))
          phase("partitionBy-64")(
            spark.range(0L, 50000L, 1L, 32)
              .selectExpr("id", "pmod(id, 64) as bucket")
              .repartition(col("bucket"))
              .write.partitionBy("bucket").mode("overwrite")
              .parquet(base + "/parted64"))
        case "expansion" => // postings bytes vs input estimate (O2 sizing)
          val path = sys.props("java.io.tmpdir") + "/graft_probe_exp_" +
            java.lang.ProcessHandle.current().pid() + "_" + rep
          val in = docs.select(col("doc_id"), col("text"))
          val est = in.queryExecution.optimizedPlan.stats.sizeInBytes
          phase("writeBm25")(ops.TextOps.writeBm25Index(
            docs, "doc_id", "text", path))
          def dirBytes(d: String): Long = {
            val p = new org.apache.hadoop.fs.Path(d)
            val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
            val it = fs.listFiles(p, true)
            var s = 0L
            while (it.hasNext) {
              val f = it.next()
              if (f.getPath.getName.endsWith(".parquet")) s += f.getLen
            }
            s
          }
          val posted = dirBytes(path + "/postings")
          System.err.println(s"[expansion] input_estimate=$est " +
            s"postings_bytes=$posted ratio=${posted.toDouble / est.toDouble}")
        case "epoch" => // one ingestIntoClusters epoch, decomposed (no stream)
          val salt = java.lang.ProcessHandle.current().pid() + "_" + rep
          val pairsPath = sys.props("java.io.tmpdir") + s"/graft_probe_ep_pairs_$salt"
          val clustersPath =
            sys.props("java.io.tmpdir") + s"/graft_probe_ep_clusters_$salt"
          phase("writePairs")(ops.Dedup.writePairs(
            docs.where(col("doc_id") % 4 === 0), "doc_id", "text",
            pairsPath, shingleSize = 3, minJaccard = 0.2, maxDf = Some(1000)))
          phase("writeClusters")(ops.Dedup.writeClusters(spark, pairsPath,
            clustersPath, threshold = 0.8))
          val batch = docs.where(col("doc_id") % 8 === 1)
            .select(col("doc_id"), col("text"))
          phase("appendPairs")(ops.Dedup.appendPairs(batch, "doc_id", "text",
            pairsPath, 3, 0.2, Some(1000), batchId = Some("probe-0")))
          val bids = org.apache.spark.sql.functions.broadcast(
            batch.select(col("doc_id").as("__bid")).distinct())
          val p = phase("readPairs-plan")(
            ops.Dedup.readPairs(spark, pairsPath, 0.8))
          val delta = p.join(bids, p("id_a") === col("__bid"), "left_semi")
            .unionByName(p.join(bids, p("id_b") === col("__bid"), "left_semi"))
            .select(col("id_a"), col("id_b"))
          phase("appendToClusters")(ops.Dedup.appendToClusters(spark,
            clustersPath, delta))
          phase("appendPairs-replay")(ops.Dedup.appendPairs(batch, "doc_id",
            "text", pairsPath, 3, 0.2, Some(1000), batchId = Some("probe-0")))
          phase("fold-replay")(ops.Dedup.appendToClusters(spark,
            clustersPath, delta))
        case other => sys.error(s"unknown probe target: $other")
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
