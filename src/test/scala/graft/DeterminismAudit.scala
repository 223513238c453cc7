package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Audit tool: empirical determinism checks for the rows-only queries before
  * promoting them to hash-checked oracles. Run: Test/runMain graft.DeterminismAudit */
object DeterminismAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (sf <- Seq("sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val docs = spark.read.parquet(s"$dir/documents.parquet")

      // q27: does LSH find exactly the exact-jaccard>=0.8 pair set?
      val lsh = graft.ops.Dedup.minHashLSH(docs, "doc_id", "text",
        shingleSize = 3, numHashes = 128, rowsPerBand = 4, threshold = 0.8)
        .select(col("id_a"), col("id_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // maxDf = None: the audit's reference side must be TRULY exact — the
      // capped default would silently weaken the lsh==exact claim on any
      // corpus with a >1000-df shingle
      val exact = graft.ops.Dedup.ngramJaccard(docs, "doc_id", "text",
        shingleSize = 3, threshold = 0.8, maxDf = None)
        .select(col("id_a"), col("id_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"[$sf] q27 lsh=${lsh.size} exact=${exact.size} equal=${lsh == exact} " +
        s"missed=${(exact -- lsh).take(5)} extra=${(lsh -- exact).take(5)}")

      // q29: does ANN return exactly the brute-force top-10?
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val q = emb.where(col("vec_id") === 0).select(col("embedding"))
        .head().getSeq[Float](0)
      val ann = graft.ops.Similarity.annTopK(emb.where(col("vec_id") =!= 0),
        "vec_id", "embedding", q, 10, nBits = 8)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
      val bf = graft.ops.Similarity.bruteForceTopK(emb.where(col("vec_id") =!= 0),
        "vec_id", "embedding", q, 10)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
      println(s"[$sf] q29 ann=$ann")
      println(s"[$sf] q29 bf =$bf equal=${ann == bf}")

      // q39: rolling_hash parity vs duckdb formula is checked in python; here
      // just dump a couple of values to compare.
      val rh = docs.where(col("doc_id") < 3)
        .select(col("doc_id"), graft.functions.GraftFunctions.rolling_hash(col("text")).as("rfp"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      println(s"[$sf] q39 sample=$rh")
    }
    spark.stop()
  }
}
