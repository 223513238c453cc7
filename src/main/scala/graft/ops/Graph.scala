package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Graph analytics over relational edge lists (north-star extension — the
 * reference has no graph layer; SURVEY §1.1 names graphs as an absent
 * capability class). Everything is expressed as joins + aggregations over an
 * (src, dst) edge table, so Catalyst plans, AQE re-plans, and the operators
 * inherit the engine's shuffle machinery instead of a bespoke runtime.
 *
 * Determinism contract (the family rule): ranks are INTEGER nano-units and
 * every per-iteration update is integer arithmetic (`div`, `*`, `+`) — sums
 * of longs are order-independent, so results replay bit-identically across
 * engines, partitionings, and cluster sizes, and the DuckDB oracle asserts
 * every node's rank exactly. A float PageRank cannot make that promise: its
 * per-node sum order is shuffle-dependent.
 */
object Graph {

  /**
   * Consecutive-event transition edges: order each `userCol` timeline by
   * (`tsCol`, `tieCol`) and emit an edge from every row's `nodeCol` to the
   * next row's — the click-graph / page-transition construction over an
   * event log. Edges keep multiplicity (the same transition observed twice
   * weighs twice downstream).
   *
   * Scale shape: one window pass partitioned by user — bounded by the
   * longest single timeline, the natural partitioning for event logs
   * (billions of users, each small). Only (user, ts, tie, node) moves.
   */
  def transitionEdges(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, nodeCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    events.select(col(userCol), col(tsCol), col(tieCol),
        col(nodeCol).as("src"))
      .withColumn("dst", lead(col("src"), 1).over(w))
      .where(col("dst").isNotNull)
      .select(col("src"), col("dst"))
  }

  /**
   * Integer PageRank with a fixed iteration count: rank lives in nano-units
   * of the total mass 10¹² — `r₀ = 10¹² div n` per node, and each round
   *
   *   r'(v) = jump + (85 · Σ_{u→v} w(u,v) · (r(u) div deg(u))) div 100 ,
   *   jump = (15 · r₀) div 100
   *
   * — the damping-0.85 update with every product/division on longs, so the
   * result is a pure function of the edge multiset (dangling nodes keep
   * their jump mass only; the integer `div` leaks ≤ deg(u) nano-units per
   * node per round — deterministic, identical on every engine). Returns
   * (node, rank_nano) for every node appearing as src or dst.
   *
   * Scale shape: the weighted edge table is built once and reused each
   * round; a round is one broadcast-size join pair (edges ⋈ ranks ⋈
   * degrees) plus a map-side-combined sum keyed by dst — the textbook
   * shuffle pattern that holds at billions of edges. Each round's frame is
   * materialized through [[graft.Eager]] (localCheckpoint, or reliable
   * files under `graft.checkpointDir` for cluster-survivable multi-hour
   * runs) and the previous round's blocks are released, so plan depth and
   * storage stay O(1) in the iteration count.
   */
  def pageRank(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", iterations: Int = 8): DataFrame = {
    require(iterations >= 0, "iterations must be non-negative")
    val weighted = edges
      .groupBy(col(srcCol).as("src"), col(dstCol).as("dst"))
      .agg(count(lit(1)).as("w"))
    val (ew, releaseEdges) = graft.Eager.checkpointed(weighted)
    try {
      val deg = ew.groupBy(col("src")).agg(sum(col("w")).as("deg"))
      val nodes = ew.select(col("src").as("node"))
        .unionByName(ew.select(col("dst").as("node"))).distinct()
      val n = nodes.count() // one driver scalar: the node count
      // materialize before the finally releases ew — a lazy frame over
      // released checkpoint blocks would fail on first evaluation
      if (n == 0)
        return graft.Eager.materialize(nodes.withColumn("rank_nano", lit(0L)))
      val init = 1000000000000L / n
      val jump = 15L * init / 100L
      var releaseR: () => Unit = () => ()
      try {
        var r = {
          val (r0, rel) = graft.Eager.checkpointed(
            nodes.withColumn("r", lit(init)))
          releaseR = rel
          r0
        }
        for (_ <- 1 to iterations) {
          val inflow = ew
            .join(r.select(col("node").as("src"), col("r")), Seq("src"))
            .join(deg, Seq("src"))
            .select(col("dst").as("node"),
              (col("w") * expr("r div deg")).as("c"))
            .groupBy(col("node")).agg(sum(col("c")).as("inflow"))
          val next = nodes.join(inflow, Seq("node"), "left")
            .na.fill(0L, Seq("inflow"))
            .select(col("node"),
              (lit(jump) + expr("85 * inflow div 100")).as("r"))
          val (cp, rel) = graft.Eager.checkpointed(next)
          releaseR()
          releaseR = rel
          r = cp
        }
        // the final round's blocks stay live inside the returned frame; make
        // the result independent first, then release (the clusterDuplicates
        // exit discipline)
        val out = graft.Eager.materialize(
          r.select(col("node"), col("r").as("rank_nano")))
        out
      } finally releaseR()
    } finally releaseEdges()
  }

  /**
   * Deterministic synchronous label propagation — the seed-spread /
   * community primitive (Raghavan et al. 2007, made engine-replayable):
   * `iterations` rounds; each round every non-seed node adopts the label
   * with the LARGEST incoming weighted vote from its neighbors'
   * previous-round labels (edge multiplicity = vote weight; every edge
   * votes in both directions), ties broken by the smallest label id; seed
   * nodes stay clamped to their seed label; unlabeled neighbors cast no
   * vote, and a node with no labeled neighbor stays unlabeled that round.
   * Pure integer votes — no float to diverge between engines. Returns
   * (node, label) for every node in the edge set, label null if never
   * reached.
   *
   * Scale shape: the symmetrized weighted edge table is built once and
   * reused; a round is one edges ⋈ labels join (labels are (node, label)
   * pairs — tiny) plus a map-side-combined vote sum keyed by (node,
   * label) and one per-node row_number window. Each round's frame is
   * materialized through [[graft.Eager]] and the previous round's blocks
   * released — plan depth and storage O(1) in the iteration count, the
   * [[pageRank]] discipline.
   */
  def labelPropagation(edges: DataFrame, seeds: DataFrame,
      srcCol: String = "src", dstCol: String = "dst",
      nodeCol: String = "node", labelCol: String = "label",
      iterations: Int = 3): DataFrame = {
    require(iterations >= 0, "iterations must be non-negative")
    import org.apache.spark.sql.expressions.Window
    val dir = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val sym = dir.unionByName(dir.select(col("dst").as("src"),
        col("src").as("dst")))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
    val (ew, releaseEdges) = graft.Eager.checkpointed(sym)
    // nodes and seeds are re-joined EVERY round: materialize both once, or
    // each round re-runs the node distinct-shuffle and the caller's whole
    // seed lineage (round-9 review finding — q171's seeds derive from a
    // full event-log scan)
    val (nodes, releaseNodes) = graft.Eager.checkpointed(
      ew.select(col("src").as("node")).distinct())
    val (sd, releaseSd) = graft.Eager.checkpointed(
      seeds.select(col(nodeCol).as("node"), col(labelCol).as("__seed")))
    try {
      var releaseL: () => Unit = () => ()
      try {
        var labels = {
          val l0 = nodes.join(sd, Seq("node"), "left")
            .select(col("node"), col("__seed").as("label"))
          val (cp, rel) = graft.Eager.checkpointed(l0)
          releaseL = rel
          cp
        }
        for (_ <- 1 to iterations) {
          val votes = ew
            .join(labels.where(col("label").isNotNull)
              .select(col("node").as("src"), col("label")), Seq("src"))
            .groupBy(col("dst").as("node"), col("label"))
            .agg(sum(col("w")).as("v"))
          val w = Window.partitionBy(col("node"))
            .orderBy(col("v").desc, col("label"))
          val winners = votes.withColumn("__rn", row_number().over(w))
            .where(col("__rn") === 1)
            .select(col("node"), col("label").as("__win"))
          val next = nodes.join(sd, Seq("node"), "left")
            .join(winners, Seq("node"), "left")
            .select(col("node"), coalesce(col("__seed"), col("__win")).as("label"))
          val (cp, rel) = graft.Eager.checkpointed(next)
          releaseL()
          releaseL = rel
          labels = cp
        }
        graft.Eager.materialize(labels)
      } finally releaseL()
    } finally {
      releaseNodes(); releaseSd(); releaseEdges()
    }
  }

  /** Canonical simple-graph edges: self-loops dropped, direction and
    * multiplicity collapsed to distinct (lo < hi) pairs. */
  private def simpleEdges(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame =
    edges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("lo"),
        greatest(col(srcCol), col(dstCol)).as("hi"))
      .distinct()

  /** Per-node simple degree over [[simpleEdges]] output. */
  private def simpleDegrees(se: DataFrame): DataFrame =
    se.select(explode(array(col("lo"), col("hi"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))

  /** Per-node triangle counts given persisted simple edges + degrees —
    * the degree-ordered-orientation core shared by [[triangleCounts]] and
    * [[clusteringCoefficients]]. */
  private def trianglesOf(se: DataFrame, deg: DataFrame): DataFrame = {
    val oriented = se
      .join(deg.select(col("node").as("lo"), col("deg").as("dlo")), Seq("lo"))
      .join(deg.select(col("node").as("hi"), col("deg").as("dhi")), Seq("hi"))
      .select(
        when(col("dlo") < col("dhi") ||
            (col("dlo") === col("dhi") && col("lo") < col("hi")),
          struct(col("lo").as("u"), col("hi").as("v")))
          .otherwise(struct(col("hi").as("u"), col("lo").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    graft.Eager.withPersisted(oriented) { or =>
      val tri = or.as("ab")
        .join(or.as("ac"),
          col("ab.u") === col("ac.u") && col("ab.v") =!= col("ac.v"))
        .join(or.as("bc"),
          col("bc.u") === col("ab.v") && col("bc.v") === col("ac.v"))
        .select(col("ab.u").as("na"), col("ab.v").as("nb"),
          col("ac.v").as("nc"))
      graft.Eager.materialize(
        tri.select(explode(array(col("na"), col("nb"), col("nc"))).as("node"))
          .groupBy(col("node")).agg(count(lit(1)).as("triangles")))
    }
  }

  /**
   * Per-node triangle counts over the simple undirected graph induced by an
   * edge list — the cohesion primitive behind clustering coefficients, spam
   * farm detection, and dup-graph transitivity audits. Self-loops drop,
   * multi-edges collapse (a triangle is a property of the simple graph).
   * Returns (node, triangles) for every node on at least one triangle;
   * pure integer counts — exact on any engine.
   *
   * Scale shape: the classic degree-ordered orientation (each undirected
   * edge points from its (degree, id)-smaller endpoint to the larger), so
   * every out-neighborhood is O(√m) on ANY graph — the wedge self-join's
   * fan-out is bounded even on power-law degree skew, which is exactly the
   * skew a naive neighbor self-join dies on. Three equi-joins total: two to
   * orient (edge ⋈ degree per endpoint), one wedge-closing join keyed on
   * the (b, c) edge pair; each triangle is found exactly once because only
   * one of a wedge's two (b, c) orderings exists as an oriented edge.
   */
  def triangleCounts(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame =
    graft.Eager.withPersisted(simpleEdges(edges, srcCol, dstCol)) { se =>
      trianglesOf(se, simpleDegrees(se))
    }

  /**
   * Per-node local clustering coefficients — [[triangleCounts]] normalized
   * by each node's wedge count: `coeff = 2·triangles / (deg·(deg−1))`,
   * reported in integer nano-units (floor division on non-negative
   * integers — identical on every engine). The transitivity audit for a
   * similarity/duplicate graph: a near-dup relation should be close to
   * transitive (high coefficients); a hub node with many open wedges
   * (coefficient near 0) is the classic false-positive signature — one
   * promiscuous document gluing unrelated clusters. Returns every node of
   * the simple graph: (node, deg, wedges, triangles, coeff_nano);
   * degree-1 nodes report zero wedges and coefficient 0.
   *
   * Scale shape: [[triangleCounts]]'s bounded wedge join plus one
   * degree-table left join — nothing beyond the triangle cost.
   */
  def clusteringCoefficients(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame =
    graft.Eager.withPersisted(simpleEdges(edges, srcCol, dstCol)) { se =>
      graft.Eager.withPersisted(simpleDegrees(se)) { deg =>
        val tri = trianglesOf(se, deg)
        deg.join(tri, Seq("node"), "left")
          .na.fill(0L, Seq("triangles"))
          .select(col("node"), col("deg"),
            expr("(deg * (deg - 1)) div 2").as("wedges"),
            col("triangles"),
            when(col("deg") >= 2,
                expr("(1000000000 * 2 * triangles) div (deg * (deg - 1))"))
              .otherwise(lit(0L)).as("coeff_nano"))
      }
    }
}
