package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._
import graft.ops.{Dedup, Similarity, TextOps}

/**
 * Library robustness on degenerate input: null text, empty text, empty
 * tables. Operators must not throw; null text rows propagate null (standard
 * SQL semantics) or drop out of pair generation, and empty inputs yield empty
 * outputs.
 */
class NullSafetySpec extends SparkSpec {

  import spark.implicits._

  lazy val degenerate = Seq(
    (0L, "a normal document with several words"),
    (1L, ""),
    (2L, null.asInstanceOf[String]),
    (3L, "   "),
    (4L, "a normal document with several words")).toDF("doc_id", "text")

  test("text functions: null in, null out; empty in, defined out") {
    val r = degenerate.select(
      col("doc_id"),
      token_count(col("text")).as("tc"),
      TextOps.qualityScore(col("text")).as("q"),
      TextOps.langId(col("text")).as("lang"),
      fingerprint_md5(col("text")).as("fp")).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1).getInt(1) == 0 && r(3).getInt(1) == 0) // empty/blank: 0 tokens
    assert(r(2).isNullAt(1) && r(2).isNullAt(2) && r(2).isNullAt(3) && r(2).isNullAt(4))
    assert(r(1).getString(3) == "und")
  }

  test("dedup operators skip null-text rows instead of throwing") {
    val exact = Dedup.exact(degenerate, "doc_id", "text")
    // null text forms its own (null) group in groupBy — present, not fatal
    assert(exact.count() >= 3)
    val pairs = Dedup.ngramJaccard(degenerate, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // (0,4) is the planted duplicate; (1,3) is the documented collide-on-empty
    // behavior (empty token sets are jaccard-1 — filter empties upstream);
    // the null-text row 2 drops out of pair generation entirely
    assert(pairs.toSet == Set((0L, 4L), (1L, 3L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
    val sim = Dedup.simHash(degenerate, "doc_id", "text").collect()
    assert(sim.nonEmpty) // 0-4 identical, plus degenerate empties colliding is fine
    val mh = Dedup.minHashLSH(degenerate, "doc_id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(mh.contains((0L, 4L)))
  }

  test("empty table in, empty result out, schema intact") {
    val empty = degenerate.where(col("doc_id") < 0)
    assert(Dedup.exact(empty, "doc_id", "text").isEmpty)
    assert(Dedup.ngramJaccard(empty, "doc_id", "text", 3, 0.5).isEmpty)
    assert(Dedup.simHash(empty, "doc_id", "text").isEmpty)
    val emptyVec = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .where(col("vec_id") < 0)
    assert(Similarity.bruteForceTopK(emptyVec, "vec_id", "embedding",
      Seq.fill(64)(0.1f), 5).isEmpty)
    assert(Similarity.centroids(emptyVec, "label", "embedding").isEmpty)
  }

  test("session additions tolerate degenerate input: null text drops from " +
      "soft-dedup/sorted-neighborhood; empty frames stay empty") {
    val soft = Dedup.softDedupWeights(degenerate, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!soft.contains(2L), "null text has no fingerprint to weight")
    assert(soft(0L) == 2L && soft(4L) == 2L, "planted dup cluster counted")
    // null text -> null signature -> null hamming, filtered: the null row
    // sorts into the rank order but can never emit a pair
    val sn = Dedup.sortedNeighborhood(degenerate, "doc_id", "text",
      window = 4, maxHamming = 0).collect()
    assert(!sn.exists(r => r.getLong(0) == 2L || r.getLong(1) == 2L))
    assert(sn.exists(r => (r.getLong(0), r.getLong(1)) == ((0L, 4L))),
      "the planted exact dup still pairs")
    val empty = degenerate.where(col("doc_id") < 0)
    assert(Dedup.softDedupWeights(empty, "doc_id", "text").isEmpty)
    assert(Dedup.sortedNeighborhood(empty, "doc_id", "text").isEmpty)
    assert(Dedup.thresholdCurve(empty, "doc_id", "text").isEmpty)
    assert(graft.ops.Layout.globalRank(empty, Seq(col("doc_id"))).isEmpty)
    val emptyVec = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .where(col("vec_id") < 0)
    assert(Similarity.marginAlignment(emptyVec, emptyVec, "vec_id",
      "embedding").isEmpty)
    assert(Similarity.kCenterCoreset(emptyVec, "vec_id", "embedding", 3)
      .isEmpty)
    assert(Similarity.pairedBootstrap(
      empty.select(col("doc_id"), lit(1L).as("a"), lit(1L).as("b")),
      "doc_id", "a", "b", 10).isEmpty)
  }

  test("round-10 additions tolerate degenerate input: pair tables from " +
      "null/empty text, drift on null vectors, impact with null sources") {
    val path = java.nio.file.Files.createTempDirectory("graft_ns_pairs")
      .toString + "/p"
    Dedup.writePairs(degenerate, "doc_id", "text", path, shingleSize = 3,
      minJaccard = 0.5)
    val pairs = Dedup.readPairs(spark, path, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    // same contract as the inline mine: null text never pairs, the planted
    // dup does, empty-token rows collide by documented behavior
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
    assert(pairs.contains((0L, 4L)))
    Dedup.appendPairs(Seq((7L, "a normal document with several words"),
        (8L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      "doc_id", "text", path, shingleSize = 3, minJaccard = 0.5)
    val after = Dedup.readPairs(spark, path, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(after.contains((0L, 7L)) && after.contains((4L, 7L)),
      s"appended dup must cross-pair: ${after.toSeq}")
    assert(!after.exists(p => p._1 == 8L || p._2 == 8L),
      "appended null text must not pair")
    // dedupImpact: null source groups like SQL (its own group), null
    // weight rows count but contribute no mass
    val meta = Seq((0L, "s1", 10L), (4L, null.asInstanceOf[String], 20L),
      (7L, "s1", 30L)).toDF("doc_id", "src", "w")
    val imp = Dedup.dedupImpact(meta, "doc_id", "src", "w",
        Dedup.readPairs(spark, path, threshold = 0.5))
      .collect().map(r => (if (r.isNullAt(0)) "(null)" else r.getString(0)) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(imp("s1") == ((2L, 1L)) && imp("(null)") == ((1L, 1L)), s"$imp")
    // embeddingDrift: null vectors drop; both-empty yields empty
    val vecs = Seq((1L, Seq(1f, 2f)), (2L, null.asInstanceOf[Seq[Float]]))
      .toDF("id", "vec")
    val drift = Similarity.embeddingDrift(vecs, vecs, "vec").collect()
    assert(drift.length == 2 && drift.forall(_.getLong(5) == 0L))
    val noVecs = vecs.where(col("id") < 0)
    assert(Similarity.embeddingDrift(noVecs, noVecs, "vec").isEmpty)
  }
}
