package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Pins [[Dedup.clusterDuplicates]]'s round-15 small-graph fast path
  * (driver union-find) to the distributed pointer-jumping loop it
  * shortcuts: identical components, identical MIN-id representatives,
  * identical sizes — including the UTF-8-vs-UTF-16 ordering trap on
  * string ids with supplementary characters. */
class DedupClusterSpec extends SparkSpec {
  _quiet
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame): Set[(Any, Any, Long)] =
    df.collect().map(r => (r.get(0), r.get(1), r.getLong(2))).toSet

  private def bothPaths(edges: org.apache.spark.sql.DataFrame)
      : (Set[(Any, Any, Long)], Set[(Any, Any, Long)]) = {
    val fast = canon(Dedup.clusterDuplicates(edges))
    spark.conf.set("graft.cc.smallGraphEdges", "0") // force the loop
    val loop = try canon(Dedup.clusterDuplicates(edges))
    finally spark.conf.unset("graft.cc.smallGraphEdges")
    (fast, loop)
  }

  test("fast path == distributed loop on long ids: components, min reps, " +
      "sizes; chains, triangles, isolated pairs") {
    val edges = Seq((5L, 3L), (3L, 9L), (9L, 5L), (20L, 21L),
      (40L, 41L), (41L, 42L), (42L, 40L), (100L, 7L)).toDF("id_a", "id_b")
    val (fast, loop) = bothPaths(edges)
    assert(fast == loop, s"paths diverged:\nfast=$fast\nloop=$loop")
    assert(fast == Set[(Any, Any, Long)](
      (3L, 3L, 3L), (5L, 3L, 3L), (9L, 3L, 3L),
      (20L, 20L, 2L), (21L, 20L, 2L),
      (40L, 40L, 3L), (41L, 40L, 3L), (42L, 40L, 3L),
      (7L, 7L, 2L), (100L, 7L, 2L)))
  }

  test("fast path == distributed loop on string ids, including a " +
      "supplementary character where UTF-8 and UTF-16 order DISAGREE") {
    // U+1F600 is F0 9F 98 80 in UTF-8 (sorts ABOVE U+FFFD's EF BF BD) but
    // a D83D-led surrogate pair in UTF-16 (sorts BELOW U+FFFD) — a fast
    // path comparing Java strings would pick the wrong representative
    val smiley = new String(Character.toChars(0x1F600))
    val edges = Seq((smiley, "�"), ("b", "a"), ("a", "c"))
      .toDF("id_a", "id_b")
    val (fast, loop) = bothPaths(edges)
    assert(fast == loop, s"paths diverged:\nfast=$fast\nloop=$loop")
    assert(fast.contains((smiley, "�", 2L)),
      "the UTF-8-smaller id must be the representative")
    assert(fast.contains(("c", "a", 3L)))
  }

  test("byte-aware gate: wide string ids force the distributed loop " +
      "despite a small edge count, and both paths stay equivalent") {
    // 60 edges of ~240-char URL-ish ids: far under the 200k EDGE gate, but
    // ~4 B/char × ~480 chars/edge × 60 edges ≈ 115 KB estimated — over a
    // 50 KB byte budget, so the loop must run (round-16 byte gate)
    val pad = "x" * 230
    val wide = (0 until 60).map { i =>
      (f"https://host/$pad/${i / 2}%04d", f"https://host/$pad/${i / 2 + 30}%04d")
    }.toDF("id_a", "id_b")
    spark.conf.set("graft.cc.smallGraphBytes", "50000")
    val (viaLoop, fastRunsDuring) =
      try {
        val before = Dedup.smallGraphFastPathRuns.get()
        val out = canon(Dedup.clusterDuplicates(wide))
        (out, Dedup.smallGraphFastPathRuns.get() - before)
      } finally spark.conf.unset("graft.cc.smallGraphBytes")
    assert(fastRunsDuring == 0L,
      "wide ids under a tight byte budget must take the distributed loop")
    // equivalence pin unchanged: the default budget (64 MB) admits this
    // graph to the fast path, and the two paths agree exactly
    val before = Dedup.smallGraphFastPathRuns.get()
    val fast = canon(Dedup.clusterDuplicates(wide))
    assert(Dedup.smallGraphFastPathRuns.get() - before == 1L,
      "the default byte budget must admit a 60-edge graph")
    assert(fast == viaLoop, s"paths diverged:\nfast=$fast\nloop=$viaLoop")
  }

  test("the gate reads the session conf and large graphs still converge " +
      "through the loop (smoke: 3k-edge ring)") {
    val n = 3000L
    val ring = spark.range(n).select(col("id").as("id_a"),
      ((col("id") + 1L) % n).as("id_b"))
    spark.conf.set("graft.cc.smallGraphEdges", "10") // force the loop
    val labels = try Dedup.clusterDuplicates(ring)
    finally spark.conf.unset("graft.cc.smallGraphEdges")
    val rows = labels.collect()
    assert(rows.length == n && rows.forall(_.getLong(1) == 0L) &&
      rows.forall(_.getLong(2) == n),
      "one ring component with rep 0 expected")
  }
}
