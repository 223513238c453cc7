package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

/** Integer PageRank + transition-edge construction (q106). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("transitionEdges: per-user consecutive links, ordered by (ts, tie)") {
    val ev = Seq(
      (1L, 10L, 100L, "x"), (1L, 20L, 101L, "y"), (1L, 20L, 102L, "z"),
      (2L, 5L, 103L, "y"),
      (3L, 1L, 104L, "z"), (3L, 2L, 105L, "x"))
      .toDF("user", "ts", "eid", "page")
    val edges = Graph.transitionEdges(ev, "user", "ts", "eid", "page")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    // user 1: x→y (ts order), y→z (ts tie broken by eid); user 2: none;
    // user 3: z→x
    assert(edges == Seq(("x", "y"), ("y", "z"), ("z", "x")))
  }

  test("pageRank: cycle conserves near-uniform mass; hub outranks spokes") {
    // 3-cycle: every node has deg 1 and one in-edge — ranks stay equal
    val cycle = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val rc = Graph.pageRank(cycle, iterations = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rc.keySet == Set("a", "b", "c"))
    assert(rc.values.toSet.size == 1, s"cycle ranks diverged: $rc")
    // each round loses ≤ a few nano-units to integer truncation, never gains
    val init = 1000000000000L / 3
    assert(rc("a") <= init && rc("a") > init - 100, s"mass drifted: ${rc("a")}")
    // star: two spokes feed one dangling hub
    val star = Seq(("a", "b"), ("c", "b")).toDF("src", "dst")
    val rs = Graph.pageRank(star, iterations = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rs("b") > rs("a") && rs("a") == rs("c"), s"star ranks: $rs")
    // spokes get no inflow: exactly the jump mass
    val sInit = 1000000000000L / 3
    assert(rs("a") == 15L * sInit / 100L)
  }

  test("pageRank: multiplicity weighs, result invariant under repartition") {
    // b receives the a-edge twice, c once → b outranks c
    val e = Seq(("a", "b"), ("a", "b"), ("a", "c")).toDF("src", "dst")
    val r1 = Graph.pageRank(e, iterations = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r1("b") > r1("c"))
    val r2 = Graph.pageRank(e.repartition(13), iterations = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r1 == r2, "integer ranks must be partition-invariant")
    // empty edge set: empty result, no crash
    assert(Graph.pageRank(e.where(lit(false)), iterations = 3).isEmpty)
  }

  test("labelPropagation: synchronous hop-per-round spread, weighted votes, " +
      "smallest-label tie-break, seeds clamped, unreached stays null") {
    def run(edges: Seq[(Long, Long)], seeds: Seq[(Long, Long)], it: Int) =
      Graph.labelPropagation(edges.toDF("src", "dst"),
          seeds.toDF("node", "label"), iterations = it)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // path 1-2-3-4: label 10 seeded at node 1 moves one hop per round
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val one = run(path, Seq((1L, 10L)), 1)
    assert(one(2L) == Some(10L) && one(3L).isEmpty && one(4L).isEmpty)
    val two = run(path, Seq((1L, 10L)), 2)
    assert(two(3L) == Some(10L) && two(4L).isEmpty)
    // weighted vote: node 9 sees label 1 twice (edge multiplicity), label 2
    // once → majority wins even though 2 < 1 is false on the tie-break axis
    val wv = run(Seq((7L, 9L), (7L, 9L), (8L, 9L)),
      Seq((7L, 1L), (8L, 2L)), 1)
    assert(wv(9L) == Some(1L))
    // exact tie (one vote each for labels 5 and 3) → smallest label
    val tie = run(Seq((7L, 9L), (8L, 9L)), Seq((7L, 5L), (8L, 3L)), 1)
    assert(tie(9L) == Some(3L))
    // seeds clamp: node 1's label never flips even when outvoted
    val clamp = run(Seq((1L, 2L), (2L, 1L), (3L, 1L)),
      Seq((1L, 10L), (2L, 20L), (3L, 20L)), 3)
    assert(clamp(1L) == Some(10L) && clamp(2L) == Some(20L))
  }

  test("triangleCounts: K4 corners, paths empty, multi-edges/self-loops/" +
      "direction collapse, partition-invariant") {
    def run(edges: Seq[(Long, Long)], parts: Int = 1) = {
      val df = edges.toDF("src", "dst")
      Graph.triangleCounts(if (parts > 1) df.repartition(parts) else df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    // K4: 4 triangles, each node on exactly 3
    val k4 = for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b)
    assert(run(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // path graph: no triangles at all
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 4L))).isEmpty)
    // triangle seen through duplicates, reversed direction, and a self-loop:
    // still ONE triangle per corner
    val noisy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (2L, 3L), (3L, 1L), (1L, 1L))
    assert(run(noisy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // star + one closing rim edge: hub on 1 triangle despite max degree
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (1L, 2L))
    assert(run(star) == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
    assert(run(k4 ++ star, parts = 7) == run(k4 ++ star))
  }

  test("clusteringCoefficients: K4 fully transitive, paths 0, hub with one " +
      "closed wedge at 1/3, pendant nodes reported with coeff 0") {
    def run(edges: Seq[(Long, Long)]) =
      Graph.clusteringCoefficients(edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    run(k4).foreach { case (n, t) =>
      assert(t == ((3L, 3L, 3L, 1000000000L)), s"node $n: $t")
    }
    // path: middle node has one OPEN wedge, ends have none
    val path = run(Seq((1L, 2L), (2L, 3L)))
    assert(path(2L) == ((2L, 1L, 0L, 0L)))
    assert(path(1L) == ((1L, 0L, 0L, 0L)) && path(3L) == ((1L, 0L, 0L, 0L)))
    // triangle 0-1-2 plus pendant 0-3: hub 0 has 3 wedges, 1 closed
    val hub = run(Seq((0L, 1L), (0L, 2L), (1L, 2L), (0L, 3L)))
    assert(hub(0L) == ((3L, 3L, 1L, 333333333L)), s"hub: $hub")
    assert(hub(1L) == ((2L, 1L, 1L, 1000000000L)))
    assert(hub(3L) == ((1L, 0L, 0L, 0L)))
  }
}
