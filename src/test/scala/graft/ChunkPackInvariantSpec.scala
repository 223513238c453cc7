package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

/**
 * Invariants of the sequence-preparation operators over a seeded random
 * corpus (property-style, but one Spark job per parameter choice — per-case
 * jobs would be prohibitive): chunking must tile the token stream exactly
 * for ANY (doc length, chunk size), and packing must equal the driver-side
 * prefix-sum replay for ANY (stratum layout, budget).
 */
class ChunkPackInvariantSpec extends SparkSpec {
  _quiet
  import spark.implicits._

  // seeded: the corpus is identical on every run (lengths 0..300 exercise
  // empty docs, sub-window docs, exact multiples, and remainder tails)
  private lazy val corpus = {
    val rnd = new scala.util.Random(42)
    (0L until 200L).map { i =>
      val n = rnd.nextInt(301)
      val stratum = s"s${rnd.nextInt(3)}"
      (i, stratum, (0 until n).map(j => s"t${i}_$j").mkString(" "))
    }
  }
  private lazy val df = corpus.toDF("doc_id", "stratum", "text")
  private lazy val nTokens = corpus.map { case (i, _, t) =>
    i -> t.split(" ").count(_.nonEmpty) }.toMap

  for (c <- Seq(1, 7, 128))
    test(s"chunkDocuments tiles every document exactly (chunkTokens=$c)") {
      val rows = TextOps.chunkDocuments(df, "doc_id", "text", c).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      val byDoc = rows.groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2) }
      corpus.foreach { case (id, _, text) =>
        val n = nTokens(id)
        if (n == 0) assert(!byDoc.contains(id), s"doc $id: empty doc emitted chunks")
        else {
          val chunks = byDoc(id)
          val expect = (n + c - 1) / c
          assert(chunks.length == expect, s"doc $id: ${chunks.length} != $expect chunks")
          assert(chunks.map(_._2).toSeq == (0L until expect.toLong), s"doc $id: idx gap")
          chunks.init.foreach(ch => assert(ch._3 == c, s"doc $id: non-full inner chunk"))
          assert(chunks.last._3 == n - (expect - 1) * c, s"doc $id: tail size")
          assert(chunks.map(_._4).mkString(" ") == text, s"doc $id: reassembly mismatch")
        }
      }
    }

  for (sh <- Seq(2, 5))
    test(s"packDocuments sharded replay: per-shard prefix sums, disjoint pack ids (shards=$sh)") {
      val b = 50
      val got = TextOps.packDocuments(df, "doc_id", "text", "stratum", b, shards = sh)
        .collect().map(r => r.getLong(1) -> (r.getString(0), r.getLong(2), r.getLong(3)))
        .toMap
      // the shard assignment is the same md5 bucket the operator uses —
      // recompute it relationally so the replay can't drift from the impl
      val shardOf = df.select(col("doc_id"),
          graft.ops.Sampling.hashBucket(col("doc_id"), sh).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // per-doc token counts are shard-invariant
      corpus.foreach { case (id, stratum, _) =>
        val (s, gn, _) = got(id)
        assert(s == stratum && gn == nTokens(id).toLong, s"doc $id: stratum/count mismatch")
      }
      // within each (stratum, shard): id-ordered prefix sum against the FULL
      // budget, emitted pack id = local * shards + shard
      corpus.groupBy(c => (c._2, shardOf(c._1))).foreach { case ((_, shard), docs) =>
        var prefix = 0L
        docs.sortBy(_._1).foreach { case (id, _, _) =>
          val local = prefix / b
          assert(got(id)._3 == local * sh + shard,
            s"doc $id: pack ${got(id)._3} != ${local * sh + shard}")
          prefix += nTokens(id).toLong
        }
      }
      // shard is recoverable from the pack id, and ids never collide across
      // shards within a stratum
      corpus.foreach { case (id, _, _) =>
        assert(got(id)._3 % sh == shardOf(id), s"doc $id: shard not recoverable")
      }
      // shards = 1 remains bit-identical to the unsharded rule
      val unsharded = TextOps.packDocuments(df, "doc_id", "text", "stratum", b)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val explicit1 = TextOps.packDocuments(df, "doc_id", "text", "stratum", b, shards = 1)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(unsharded == explicit1)
    }

  for (b <- Seq(1, 50, 2048))
    test(s"packDocuments equals the prefix-sum replay (budget=$b)") {
      val got = TextOps.packDocuments(df, "doc_id", "text", "stratum", b)
        .collect().map(r => r.getLong(1) -> (r.getString(0), r.getLong(2), r.getLong(3)))
        .toMap
      corpus.groupBy(_._2).foreach { case (stratum, docs) =>
        var prefix = 0L
        docs.sortBy(_._1).foreach { case (id, _, _) =>
          val n = nTokens(id).toLong
          val (s, gn, gp) = got(id)
          assert(s == stratum && gn == n, s"doc $id: stratum/count mismatch")
          assert(gp == prefix / b, s"doc $id: pack ${gp} != ${prefix / b}")
          prefix += n
        }
      }
    }
}
