package graft

import org.apache.spark.sql.functions._
import graft.ops.{Audit, Layout}

/** Z-order layout (pruned box queries) + declarative data-quality audit. */
class LayoutAuditSpec extends SparkSpec {
  _quiet
  import spark.implicits._

  test("interleave/deinterleave: exact inverse over the full bucket grid") {
    val bits = 4
    for (a <- 0L until 16L; b <- 0L until 16L) {
      val z = Seq((a, b)).toDF("a", "b")
        .select(Layout.interleaveBits(col("a"), col("b"), bits))
        .head().getLong(0)
      assert(Layout.deinterleave(z, bits) == (a, b), s"($a, $b) -> $z")
    }
    // (the roundtrip over all 256 pairs already proves interleave is
    // injective — every pair recovers from its own z-value)
  }

  test("zBoxQuery == naive filter, probes only intersecting partitions") {
    val df = spark.range(0, 4096).select(
      (col("id") % 64).as("a"), (col("id") / 64).cast("long").as("b"),
      col("id").as("v"))
    val path = java.nio.file.Files.createTempDirectory("graft_z").toString
    // buckets: a >> 3 (8 wide), b >> 3, bits=3 → 64 partitions
    Layout.writeZOrdered(df, path, "a", "b", 3, 3, 3)
    val got = Layout.zBoxQuery(spark, path, "a", "b", 5, 20, 10, 30, 3, 3, 3)
      .select(col("v")).collect().map(_.getLong(0)).sorted
    val want = df.where(col("a") >= 5 && col("a") <= 20 &&
        col("b") >= 10 && col("b") <= 30)
      .select(col("v")).collect().map(_.getLong(0)).sorted
    assert(got.toSeq == want.toSeq && got.nonEmpty)
    // pruning: the box spans a-buckets 0..2 and b-buckets 1..3 → 9 of 64
    // partitions; the scan must read fewer files than exist
    val probe = Layout.zBoxQuery(spark, path, "a", "b", 5, 20, 10, 30, 3, 3, 3)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(500))
    def allScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allScans(q.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(allScans)
    }
    probe.collect()
    val scan = allScans(probe.queryExecution.executedPlan).head
    val partsRead = scan.metrics.get("numPartitions").map(_.value)
      .getOrElse(-1L)
    assert(partsRead == 9, s"expected 9 of 64 partitions, read $partsRead")
  }

  test("writeZOrdered rejects values outside the bucket range") {
    val df = Seq((100L, 1L)).toDF("a", "b") // 100 > 2^(3+3)-1 = 63
    val path = java.nio.file.Files.createTempDirectory("graft_zr").toString
    val e = intercept[IllegalArgumentException] {
      Layout.writeZOrdered(df, path, "a", "b", 3, 3, 3)
    }
    assert(e.getMessage.contains("outside"))
  }

  test("auditRules: independent counts, NULL predicate is a violation") {
    val df = Seq(
      (1L, 10.0, "A"),
      (2L, -3.0, "A"),   // fails positive
      (3L, 5.0, "X"),    // fails domain
      (4L, Double.NaN, "A"),
      (5L, 7.0, null)    // null flag: domain rule is NULL → violation
    ).toDF("id", "q", "flag")
    val out = Audit.auditRules(df, Seq(
        "q_positive" -> (col("q") > 0),
        "flag_domain" -> col("flag").isin("A", "B")))
      .orderBy("rule").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    // NaN > 0 is false in Spark (NaN sorts above everything but > is false?)
    // — pin whatever the engine says by checking rows explicitly
    val nanPasses = Seq(Double.NaN).toDF("q").select(col("q") > 0)
      .head().getBoolean(0)
    val qViol = if (nanPasses) 1L else 2L
    assert(out.toSeq == Seq(
      ("q_positive", 5L, qViol),
      ("flag_domain", 5L, 2L))) // 'X' and NULL both violate
  }

  test("auditForeignKey: orphans vs null keys, parent reduced to distinct") {
    val child = Seq(Some(1L), Some(1L), Some(9L), None, Some(2L))
      .toDF("fk")
    val parent = Seq(1L, 1L, 2L, 3L).toDF("pk") // dup parent keys must not double
    val r = Audit.auditForeignKey(child, "fk", parent, "pk").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((5L, 1L, 1L)))
  }

  test("profileColumns: nulls, exact distincts, min/max per column in " +
      "listed order") {
    val df = Seq((Some(1L), Some(10L)), (Some(1L), None), (Some(7L), Some(3L)))
      .toDF("a", "b")
    val out = Audit.profileColumns(df, Seq("a", "b"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(out == Seq(("a", 3L, 0L, 2L, 1L, 7L), ("b", 3L, 1L, 2L, 3L, 10L)))
  }

  test("kAnonymityAudit: violating groups, rows at risk, and the table's " +
      "anonymity level — exact integers") {
    // quasi (g): sizes 6, 3, 1 → with k=5: 2 violating groups, 4 rows at risk
    val df = (Seq.fill(6)(("a", "x")) ++ Seq.fill(3)(("b", "x")) ++
      Seq(("c", "y"))).toDF("g", "h")
    val r = Audit.kAnonymityAudit(df, Seq("g", "h"), k = 5).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((3L, 2L, 4L, 1L)))
    // a fully k-anonymous table reports zero risk
    val ok = Seq.fill(5)(("a", "x")).toDF("g", "h")
    val r2 = Audit.kAnonymityAudit(ok, Seq("g", "h"), k = 5).head()
    assert((r2.getLong(1), r2.getLong(2), r2.getLong(3)) == ((0L, 0L, 5L)))
  }

  test("skewReport: heavy keys ranked with exact per-mille and ceil-div " +
      "salt factor; uniform keys recommend salt 1") {
    // key "a" x 6, "b" x 2, "c" x 2 → 10 rows, 3 keys, avg 10/3
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq.fill(2)("c"))
      .toDF("k")
    val out = Audit.skewReport(df, "k", topK = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    // permille: a = 6000 div 10 = 600; salt = ceil(6*3/10) = ceil(1.8) = 2
    // b before c on the tie (key asc): 200 permille, salt ceil(0.6) = 1
    assert(out == Seq(("a", 6L, 10L, 3L, 600L, 2L),
      ("b", 2L, 10L, 3L, 200L, 1L)))
    // perfectly uniform: every key salt factor 1
    val uni = (1 to 4).flatMap(k => Seq.fill(3)(k.toString)).toDF("k")
    assert(Audit.skewReport(uni, "k", topK = 4)
      .collect().forall(_.getLong(5) == 1L))
  }

  test("reliabilityReport: equi-width integer buckets, clamped edges, " +
      "floor-div rates; empty buckets absent") {
    val rows = Seq(
      (-50L, false),                  // clamps into bucket 0
      (10L, false), (20L, false),     // bucket 0: 0/3 positive
      (30L, false), (40L, false), (45L, true),  // bucket 1: 1/3
      (60L, true), (70L, true),       // bucket 2: 2/2
      (999L, true))                   // clamps into bucket 3: 1/1
    val out = Audit.reliabilityReport(rows.toDF("s", "y"), "s", "y",
        lo = 0L, hi = 100L, bins = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out(0L) == ((0L, 25L, 3L, 0L, 0L)))
    assert(out(1L) == ((25L, 50L, 3L, 1L, 333333333L)), "floor(1e9/3)")
    assert(out(2L) == ((50L, 75L, 2L, 2L, 1000000000L)))
    assert(out(3L) == ((75L, 100L, 1L, 1L, 1000000000L)))
    assert(out.size == 4)
    // range must divide evenly
    assertThrows[IllegalArgumentException](
      Audit.reliabilityReport(rows.toDF("s", "y"), "s", "y", 0L, 100L, 7))
  }

  test("precisionThresholds: deepest cut per target maximizes recall under " +
      "the floor; boundary equality admits; unmeetable targets yield no row") {
    // scores 10..1; positives at ranks 1,2,3,5 -> running precision
    // 1, 1, 1, .75, .8, .67, .57, .5, .44, .4
    val labels = Seq(true, true, true, false, true,
      false, false, false, false, false)
    val rows = labels.zipWithIndex.map { case (l, i) =>
      (i + 1L, 10L - i, l) }.toDF("id", "s", "y")
    val out = Audit.precisionThresholds(rows, "id", "s", "y",
        Seq(1000, 800, 500))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out(1000) == ((3L, 8L, 3L, 3L, 1000000000L)))
    assert(out(800) == ((5L, 6L, 5L, 4L, 800000000L)),
      "rank 5 meets 0.8 exactly — boundary admits")
    assert(out(500) == ((8L, 3L, 8L, 4L, 500000000L)))
    // a gate nobody passes: first-ranked row is negative -> precision can
    // never reach 1000 permille
    val hopeless = Seq((1L, 9L, false), (2L, 5L, true)).toDF("id", "s", "y")
    assert(Audit.precisionThresholds(hopeless, "id", "s", "y",
      Seq(1000)).isEmpty)
  }

  test("nbLogOdds: margin sign agrees with nbTrainScore's argmax " +
      "(posClass wins ties by class-name order)") {
    val docs = Seq(
      (1L, "alpha alpha beta", "aug"), (2L, "alpha beta beta", "aug"),
      (3L, "gamma delta gamma", "plain"), (4L, "delta delta", "plain"),
      (5L, "alpha gamma", "aug"), (6L, "beta delta", "plain"))
      .toDF("id", "text", "cls")
    val pred = graft.ops.TextOps.nbTrainScore(docs, "id", "text", "cls")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val marg = graft.ops.TextOps.nbLogOdds(docs, "id", "text", "cls", "aug")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(marg.keySet == pred.keySet)
    marg.foreach { case (id, m) =>
      // 'aug' < 'plain', so the argmax tie at m == 0 also goes to 'aug'
      assert((m >= 0) == (pred(id) == "aug"),
        s"doc $id: margin $m vs pred ${pred(id)}")
    }
  }

  test("conformalGate: threshold is the ⌈(n+1)(1-α)⌉-th smallest calibration " +
      "score; admitted ⇔ score ≤ threshold; tiny calibration admits all") {
    val df = (1L to 200L).map(i => (i, i)).toDF("id", "score")
    val out = graft.ops.Audit.conformalGate(df, "id", "score",
        calibPct = 50, alphaPermille = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
    // recompute the expected threshold from the same deterministic split
    val calib = (1L to 200L).filter { i =>
      org.apache.spark.sql.graft.Md5Prefix60.compute(i.toString) % 100 < 50
    }.sorted
    val n = calib.size
    val k = ((n + 1) * 900 + 999) / 1000
    val expectedThr = calib(k.toInt - 1) // scores == ids, already sorted
    assert(out.nonEmpty && out.length == 200 - n)
    out.foreach { case (id, s, nc, thr, adm) =>
      assert(nc == n && thr == Some(expectedThr) &&
        adm == (s <= expectedThr), s"row $id: ($s, $nc, $thr, $adm)")
    }
    // eval side only: no calibration id appears
    assert(out.map(_._1).toSet.intersect(calib.toSet).isEmpty)
    // calibration too small for alpha: k > n ⇒ null threshold, all admitted
    val tiny = Seq((1L, 5L), (2L, 7L)).toDF("id", "score")
    graft.ops.Audit.conformalGate(tiny, "id", "score",
        calibPct = 50, alphaPermille = 1)
      .collect().foreach(r => assert(r.isNullAt(3) && r.getBoolean(4)))
  }

  test("corpusChecksum: partition-invariant; xor blind to duplication but " +
      "sum/n catch it; any single-field mutation flips the signatures") {
    val rows = Seq((1L, "alpha", "g"), (2L, "beta", "g"), (3L, null, "g"),
      (4L, "", "g"), (5L, "delta", "h")).toDF("id", "text", "grp")
    def sig(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Audit.corpusChecksum(df, "grp", Seq("id", "text"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val base = sig(rows)
    assert(base.keySet == Set("g", "h") && base("g")._1 == 4)
    assert(sig(rows.repartition(7)) == base)
    // two extra copies of a row: the xor pair cancels — blind; sum and
    // n_rows still catch it
    val extra = rows.where(col("id") === 2)
    val dup = rows.unionByName(extra).unionByName(extra)
    val d = sig(dup)
    assert(d("g")._2 == base("g")._2 && d("g")._1 == 6 &&
      d("g")._3 != base("g")._3)
    // null vs empty text are DIFFERENT multisets
    val nulled = Seq((1L, "alpha", "g"), (2L, "beta", "g"), (3L, "", "g"),
      (4L, "", "g"), (5L, "delta", "h")).toDF("id", "text", "grp")
    assert(sig(nulled)("g") != base("g"))
    // single-char mutation flips xor
    val mut = Seq((1L, "alphA", "g"), (2L, "beta", "g"), (3L, null, "g"),
      (4L, "", "g"), (5L, "delta", "h")).toDF("id", "text", "grp")
    assert(sig(mut)("g")._2 != base("g")._2)
  }

  test("madOutliers: lower medians, 50% breakdown (the outlier doesn't move " +
      "the gate), mad=0 collapse flags any deviation") {
    val rows = Seq((1L, "g", 10L), (2L, "g", 12L), (3L, "g", 11L),
      (4L, "g", 10L), (5L, "g", 100L),
      (6L, "h", 5L), (7L, "h", 5L), (8L, "h", 5L), (9L, "h", 6L))
      .toDF("id", "grp", "v")
    val out = graft.ops.Audit.madOutliers(rows, "id", "grp", "v", k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    // g: sorted 10,10,11,12,100 → med 11; devs 0,1,1,1,89 → mad 1;
    // only the 100 (dev 89 > 3) flags — the outlier itself never shifts
    // the robust center the way it would a mean/σ gate
    assert(out(5L) == ((100L, 11L, 1L, true)), s"$out")
    Seq(1L, 2L, 3L, 4L).foreach(id =>
      assert(out(id)._2 == 11L && out(id)._3 == 1L && !out(id)._4))
    // h: med 5, mad 0 → the 6 flags on ANY deviation
    assert(out(9L) == ((6L, 5L, 0L, true)))
    assert(!out(6L)._4 && !out(7L)._4 && !out(8L)._4)
  }

  test("aucReport: perfect separation = 1, reversal = 0, all-tied = 1/2, " +
      "degenerate groups report null") {
    val rows = Seq(
      // g: positives strictly above negatives
      ("g", 10L, true), ("g", 9L, true), ("g", 5L, false), ("g", 4L, false),
      // r: positives strictly below negatives
      ("r", 1L, true), ("r", 9L, false),
      // t: everyone tied
      ("t", 7L, true), ("t", 7L, true), ("t", 7L, false), ("t", 7L, false),
      // z: no negatives
      ("z", 3L, true))
      .toDF("grp", "score", "label")
    val out = graft.ops.Audit.aucReport(rows, "grp", "score", "label")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(out("g") == ((2L, 2L, 8L, 1000000000L)), s"$out")
    assert(out("r") == ((1L, 1L, 0L, 0L)))
    assert(out("t") == ((2L, 2L, 4L, 500000000L)))
    assert(out("z") == ((1L, 0L, 0L, -1L)), "undefined AUC must be null")
  }

  test("joinExplosionReport: exact per-key products, keys absent on one " +
      "side contribute nothing, topK on the product order") {
    val left = Seq("a", "a", "a", "b", "c", "c").map(Tuple1(_)).toDF("k")
    val right = Seq("a", "a", "b", "b", "b", "b", "b", "x").map(Tuple1(_))
      .toDF("k")
    val out = graft.ops.Audit.joinExplosionReport(left, "k", right, "k",
        topK = 10)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))))
    // a: 3·2=6, b: 1·5=5; c and x never pair; total 11
    assert(out.toSeq == Seq(
      ("a", (3L, 2L, 6L, 11L, 545L)), ("b", (1L, 5L, 5L, 11L, 454L))),
      s"$out")
    // topK = 1 keeps the heaviest key only
    val top1 = graft.ops.Audit.joinExplosionReport(left, "k", right, "k", 1)
      .collect().map(_.getString(0))
    assert(top1.toSeq == Seq("a"))
  }
}
