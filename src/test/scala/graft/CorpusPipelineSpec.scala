package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextOps}

/**
 * The LLM-training-data pipeline composed end to end — the workload this
 * engine's extension surface exists for: near-dup CLUSTER dedup (q75's
 * shape) → span-cut of residual shared runs (q77) → repetition/quality
 * filtering → PII redaction → train/test contamination audit. Each stage's
 * contract is asserted on planted fixtures riding along with the real
 * sf0.001 corpus, so the stages are checked composed, not just in isolation.
 */
class CorpusPipelineSpec extends SparkSpec {
  _quiet
  import spark.implicits._

  private lazy val base = spark.read.parquet(s"${sf()}/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("dedup → span-cut → quality filter → redact → contamination audit") {
    val run = (0 until 30).map(i => s"shared$i").mkString(" ")
    val keeper = 6000000L // keeps the run (smaller id than the cut victim)
    val victim = 6000001L
    val planted = Seq(
      // exact duplicate of an existing doc: must fall to cluster dedup
      (5000000L, base.where(col("doc_id") === 0).head().getString(1)),
      // two docs sharing ONLY a 30-token run (Jaccard far below 0.8): both
      // survive dedup; the later one must lose exactly the run to span-cut
      (keeper, (0 until 80).map(i => s"ka$i").mkString(" ") + " " + run + " " +
        (0 until 60).map(i => s"kb$i").mkString(" ")),
      (victim, (0 until 40).map(i => s"va$i").mkString(" ") + " " + run + " " +
        (0 until 90).map(i => s"vb$i").mkString(" ") + " email me at a@b.co"))
      .toDF("doc_id", "text")
    val corpus = base.unionByName(planted)

    // -- stage 1: LSH pairs → transitive clusters → keep each cluster's rep
    val clusters = Dedup.clusterDuplicates(
      Dedup.minHashLSH(corpus, "doc_id", "text", threshold = 0.8))
    val survivors = corpus.join(
      clusters.where(col("id") =!= col("rep")).select(col("id").as("doc_id")),
      Seq("doc_id"), "left_anti")
    val survivorIds = survivors.select("doc_id").as[Long].collect().toSet
    assert(!survivorIds.contains(5000000L), "exact copy survived cluster dedup")
    assert(survivorIds.contains(0L), "keep-first must retain the min-id original")
    assert(survivorIds.contains(keeper) && survivorIds.contains(victim),
      "run-sharing docs are NOT near-dups and must survive whole-doc dedup")

    // -- stage 2: cut residual shared runs out of later docs
    val cut = Dedup.cutSharedSpans(survivors, "doc_id", "text", minTokens = 20)
    val byId = cut.collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(byId(keeper)._3 == false, "first occurrence must keep its run")
    assert(byId(keeper)._1.contains("shared0"))
    assert(byId(victim)._3 == true, "later doc must be cut")
    // exactly the 30-token run removed: 40 va + 90 vb + the 4 email tokens
    assert(byId(victim)._2 == 40 + 90 + 4,
      s"victim kept ${byId(victim)._2} tokens")
    assert(!byId(victim)._1.contains("shared0"))
    assert(byId(victim)._1.contains("va0") && byId(victim)._1.contains("vb89"),
      "content around the cut span must survive verbatim")

    // -- stage 3: repetition/quality filtering on the CLEANED text
    val scored = cut.select(col("doc_id"), col("text_clean"),
      TextOps.qualityScore(col("text_clean")).as("q"))
    val kept = scored.where(col("q") >= 0.1)
    assert(kept.count() > 0)
    assert(scored.where(col("q") < 0 || col("q") > 1).isEmpty)

    // -- stage 4: PII redaction (idempotent by construction on its output)
    val redacted = kept.select(col("doc_id"),
      TextOps.redactPII(col("text_clean")).as("text"))
    val victimText = redacted.where(col("doc_id") === victim).head().getString(1)
    assert(victimText.contains("<EMAIL>") && !victimText.contains("a@b.co"))
    val twice = redacted.select(col("doc_id"),
      TextOps.redactPII(col("text")).as("t2"))
      .join(redacted, "doc_id").where(col("t2") =!= col("text"))
    assert(twice.isEmpty, "redaction must be idempotent")

    // -- stage 5: contamination audit of the final corpus vs a train split
    val sp = graft.ops.Sampling.hashSplit(redacted, "doc_id", 80)
    val audit = TextOps.contamination(
      sp.where(col("split") === "train"), sp.where(col("split") === "test"),
      "doc_id", "text", 3).collect()
    assert(audit.nonEmpty)
    audit.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }

    // -- stage 6: sequence preparation — chunk the clean train split into
    //    context windows; chunking must be lossless over every document
    val train = sp.where(col("split") === "train")
    val chunks = TextOps.chunkDocuments(train, "doc_id", "text", 128)
    // collect_list order is NOT shuffle-stable — sort explicitly by chunk_idx
    val reassembled = chunks.groupBy(col("id")).agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text")))),
          s => s("chunk_text"))).as("rebuilt"),
        sum(col("n_tokens")).as("n"))
    val mismatch = reassembled.join(
        train.select(col("doc_id").as("id"),
          concat_ws(" ", graft.functions.GraftFunctions.tokens(col("text")))
            .as("orig")), "id")
      .where(col("rebuilt") =!= col("orig"))
    assert(mismatch.isEmpty, "chunking lost or reordered tokens")
    // token conservation: chunk token counts sum to the corpus token count
    val chunkTotal = chunks.agg(sum(col("n_tokens"))).head().getLong(0)
    val corpusTotal = train
      .agg(sum(size(graft.functions.GraftFunctions.tokens(col("text")))
        .cast("bigint"))).head().getLong(0)
    assert(chunkTotal == corpusTotal)
  }

  test("leakage-safe split: near-dup clusters stay on one side; a naive " +
      "per-doc split would leak") {
    import spark.implicits._
    // 40 near-dup pairs (i, i+1000) sharing identical long texts, plus
    // unique singleton docs
    val shared = (0 until 40).map(i =>
      (0 until 25).map(t => s"p${i}tok$t").mkString(" "))
    val docs = ((0 until 40).flatMap(i =>
        Seq((i.toLong, shared(i)), (i + 1000L, shared(i)))) ++
      (2000L until 2010L).map(id =>
        (id, (0 until 25).map(t => s"u${id}tok$t").mkString(" "))))
      .toDF("doc_id", "text")
    val pairs = Dedup.minHashLSH(docs, "doc_id", "text", threshold = 0.8)
    val clusters = Dedup.clusterDuplicates(pairs)
      .select(col("id").as("doc_id"), col("rep"))
    val assigned = docs.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        org.apache.spark.sql.functions.coalesce(col("rep"), col("doc_id"))
          .as("rep"))
      .withColumn("cluster_split",
        graft.ops.Sampling.hashBucket(col("rep")) < 80)
      .withColumn("naive_split",
        graft.ops.Sampling.hashBucket(col("doc_id")) < 80)
    val sp = assigned.select(col("doc_id"), col("cluster_split"),
      col("naive_split"))
    val joined = pairs
      .join(sp.select(col("doc_id").as("id_a"),
        col("cluster_split").as("ca"), col("naive_split").as("na")), Seq("id_a"))
      .join(sp.select(col("doc_id").as("id_b"),
        col("cluster_split").as("cb"), col("naive_split").as("nb")), Seq("id_b"))
    assert(joined.where(col("ca") =!= col("cb")).isEmpty,
      "cluster-aware split must never separate a near-dup pair")
    // the id-hash split DOES separate some pairs — the leak this exists for
    assert(joined.where(col("na") =!= col("nb")).count() > 0,
      "planted corpus should show naive-split leakage")
  }

  test("mergeClusterAssignments: incremental merge ≡ from-scratch " +
      "clustering, including delta edges that BRIDGE old clusters") {
    import spark.implicits._
    // old graph: clusters {1,2,3} and {10,11}; singleton-free by contract
    val oldPairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    // delta: extends {1,2,3} with 4, bridges the two old clusters via
    // (3,10), and introduces a brand-new cluster {20,21}
    val delta = Seq((3L, 4L), (3L, 10L), (20L, 21L)).toDF("id_a", "id_b")
    val assign = Dedup.clusterDuplicates(oldPairs)
    val merged = Dedup.mergeClusterAssignments(assign, delta)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val scratch = Dedup.clusterDuplicates(
        oldPairs.unionByName(delta))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(merged == scratch, s"merged $merged vs scratch $scratch")
    // the bridge collapsed everything reachable into rep 1, size 6
    assert(merged(11L) == ((1L, 6L)) && merged(4L) == ((1L, 6L)))
    assert(merged(21L) == ((20L, 2L)))
  }

  test("clusterProvenance: canonical sorted attribute list per rep, " +
      "distinct counting, accumulation-order free") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val meta = Seq((1L, "crawlB"), (2L, "crawlA"), (3L, "crawlB"),
      (10L, "crawlC"), (11L, "crawlC")).toDF("doc_id", "src")
    val assign = Dedup.clusterDuplicates(pairs)
    def run(m: org.apache.spark.sql.DataFrame) =
      Dedup.clusterProvenance(assign, m, "doc_id", "src")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getString(3)))).toMap
    val out = run(meta)
    assert(out == Map(1L -> ((3L, 2L, "crawlA,crawlB")),
      10L -> ((2L, 1L, "crawlC"))), s"$out")
    assert(run(meta.repartition(7)) == out)
  }

  test("clusterProvenance: a high-cardinality attribute column cannot " +
      "build unbounded strings — attrs caps at maxAttrs, n_attrs keeps " +
      "the true count") {
    import spark.implicits._
    // one 10k-member cluster where EVERY member carries a distinct attr
    val n = 10000
    val pairs = (1L until n.toLong).map(i => (0L, i)).toDF("id_a", "id_b")
    val meta = (0L until n.toLong).map(i => (i, f"https://host/$i%05d"))
      .toDF("doc_id", "url")
    val assign = Dedup.clusterDuplicates(pairs)
    val row = Dedup.clusterProvenance(assign, meta, "doc_id", "url",
      maxAttrs = 16).collect().head
    assert(row.getLong(0) == 0L && row.getLong(1) == n.toLong)
    assert(row.getLong(2) == n.toLong, "n_attrs must keep the TRUE count")
    val attrs = row.getString(3).split(',')
    assert(attrs.length == 16, s"attrs must cap at maxAttrs: ${attrs.length}")
    // sorted prefix: the cap elides the tail, never reorders
    assert(attrs.toSeq == (0 until 16).map(i => f"https://host/$i%05d"))
    // below the cap the capped form is byte-identical to the wide default
    val small = Dedup.clusterProvenance(assign,
      meta.withColumn("url", concat(lit("s"), col("doc_id") % 3)),
      "doc_id", "url", maxAttrs = 16).collect().head
    assert(small.getLong(2) == 3L && small.getString(3) == "s0,s1,s2")
  }
}
