package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling

/** Deterministic hash split/sample (q43): stability, partition laws, nesting. */
class SamplingSpec extends SparkSpec {

  test("quantileBand: integer rank cuts trim both tails per group, ties by id") {
    import spark.implicits._
    // group a: ranks 1..10 → keep (10*100//1000, 10*900//1000] = (1, 9]
    // group b: 3 rows, all TIED on v → keep (0, 2]: ids 1,2 stay, 3 drops
    val df = ((1 to 10).map(i => ("a", i.toLong, i * 10)) ++
      Seq(("b", 1L, 7), ("b", 2L, 7), ("b", 3L, 7))).toDF("g", "id", "v")
    val out = graft.ops.Sampling.quantileBand(df, "g", "v", "id", 100, 900)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == ((2 to 9).map(i => ("a", i.toLong)).toSet ++
      Set(("b", 1L), ("b", 2L))))
    // degenerate bands: [0,1000] keeps everything, [0,0] keeps nothing
    assert(graft.ops.Sampling.quantileBand(df, "g", "v", "id", 0, 1000)
      .count() == 13)
    assert(graft.ops.Sampling.quantileBand(df, "g", "v", "id", 0, 0)
      .count() == 0)
  }

  lazy val docs = spark.read.parquet(s"${sf()}/documents.parquet")

  test("hashSplit is a stable, exhaustive, disjoint partition") {
    val s1 = Sampling.hashSplit(docs, "doc_id", 80)
    val s2 = Sampling.hashSplit(docs, "doc_id", 80)
    // stable: the same id lands in the same split on every evaluation
    assert(s1.select("doc_id", "split").except(s2.select("doc_id", "split")).isEmpty)
    // exhaustive + disjoint: every row gets exactly one split
    val counts = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet.subsetOf(Set("train", "test")))
    assert(counts.values.sum == docs.count())
    // roughly the requested proportion (md5 buckets are near-uniform)
    val frac = counts("train").toDouble / docs.count()
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
  }

  test("hashSample(pct) nests: a 10% sample is a subset of the 20% sample") {
    val s10 = Sampling.hashSample(docs, "doc_id", 10).select("doc_id")
    val s20 = Sampling.hashSample(docs, "doc_id", 20).select("doc_id")
    assert(s10.except(s20).isEmpty)
    assert(s10.count() > 0 && s10.count() < s20.count())
  }

  test("minWiseSample: exact size, deterministic, plans as a top-k not a sort") {
    val s1 = Sampling.minWiseSample(docs, "doc_id", 50).select("doc_id")
    val s2 = Sampling.minWiseSample(docs, "doc_id", 50).select("doc_id")
    assert(s1.count() == 50)
    assert(s1.except(s2).isEmpty) // pure function of the id set
    // growing k keeps the previous sample (nested, like hashSample)
    val s80 = Sampling.minWiseSample(docs, "doc_id", 80).select("doc_id")
    assert(s1.except(s80).isEmpty)
    val plan = Sampling.minWiseSample(docs, "doc_id", 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$plan")
  }

  test("prioritySample: weighted top-k matches the brute-force priority " +
      "order, is deterministic, and plans as a top-k not a sort") {
    val s1 = Sampling.prioritySample(docs, "doc_id", "n_chars", 50)
    assert(s1.count() == 50)
    // brute-force replay of the w/u priority order on the driver
    val all = docs.select(col("doc_id"), col("n_chars"),
        (graft.functions.GraftFunctions.md5_prefix60(
          col("doc_id").cast("string")) + lit(1L)).as("u"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = all
      .sortBy { case (id, w, u) => (-(w.toDouble / u.toDouble), id) }
      .take(50).map(_._1).toSet
    assert(s1.select("doc_id").collect().map(_.getLong(0)).toSet == expect)
    // deterministic: a second evaluation draws the identical sample
    assert(s1.select("doc_id").except(
      Sampling.prioritySample(docs, "doc_id", "n_chars", 50)
        .select("doc_id")).isEmpty)
    // weighted: long docs are over-represented vs a uniform draw
    val sampleMean = s1.agg(avg(col("n_chars"))).head().getDouble(0)
    val corpusMean = docs.agg(avg(col("n_chars"))).head().getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean should exceed corpus mean $corpusMean")
    val plan = Sampling.prioritySample(docs, "doc_id", "n_chars", 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$plan")
  }

  test("coverageSplit: small cells are fully covered, large cells get the " +
      "forced min-wise prefix plus the hash remainder; deterministic") {
    import spark.implicits._
    // tiny cell (3 docs < minTest 5) and a large cell (40 docs)
    val df = ((1L to 3L).map(i => (i, "small")) ++
      (100L to 139L).map(i => (i, "big"))).toDF("id", "cell")
    val out = Sampling.coverageSplit(df, "id", "cell", minTest = 5,
      trainPermille = 900)
    val byCell = out.groupBy("cell", "split").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // the whole small cell is test; no train row exists for it
    assert(byCell(("small", "test")) == 3L && !byCell.contains(("small", "train")))
    // big cell: at least the 5 forced rows in test
    assert(byCell(("big", "test")) >= 5L)
    assert(byCell(("big", "test")) + byCell.getOrElse(("big", "train"), 0L) == 40L)
    // the forced prefix is exactly the cell's min-wise sample
    val forced = out.where(col("cell") === "big" && col("split") === "test")
      .select("id")
    val minwise = Sampling.minWiseSample(df.where(col("cell") === "big"),
      "id", 5).select("id")
    assert(minwise.except(forced).isEmpty,
      "the min-wise 5 must all be in test")
    // pure function of the id set
    val again = Sampling.coverageSplit(df, "id", "cell", 5, 900)
      .select("id", "split")
    assert(out.select("id", "split").except(again).isEmpty)
  }

  test("boundary percentages: 0 selects nothing, 100 selects everything") {
    assert(Sampling.hashSample(docs, "doc_id", 0).count() == 0)
    assert(Sampling.hashSample(docs, "doc_id", 100).count() == docs.count())
  }

  test("stratifiedSample: per-stratum rates, zero drops stratum, default keeps all") {
    val mixed = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 250, "zh" -> 500, "de" -> 0))
    val kept = mixed.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val all = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!kept.contains("de"), "zero-permille stratum must vanish")
    // unlisted strata keep every row (default 1000 permille)
    (all.keySet - "en" - "zh" - "de").foreach { l => assert(kept(l) == all(l)) }
    // listed rates land near target (small-corpus tolerance)
    assert(math.abs(kept("en").toDouble / all("en") - 0.25) < 0.12)
    assert(math.abs(kept("zh").toDouble / all("zh") - 0.50) < 0.15)
    // deterministic: re-evaluation draws the identical mix
    assert(mixed.select("doc_id").except(
      Sampling.stratifiedSample(docs, "doc_id", "lang",
        Map("en" -> 250, "zh" -> 500, "de" -> 0)).select("doc_id")).isEmpty)
    // nesting: a lower rate for the same stratum is a subset of a higher one
    val en10 = Sampling.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 100))
    val en25 = Sampling.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 250))
    assert(en10.where(col("lang") === "en").select("doc_id")
      .except(en25.select("doc_id")).isEmpty)
    // NULL stratum falls through the CASE chain to the default rate (both
    // engines: NULL equality is never true), so it keeps every row here
    val withNull = docs.select(col("doc_id"),
      when(col("doc_id") % 2 === 0, col("lang")).as("lang"))
    val m = Sampling.stratifiedSample(withNull, "doc_id", "lang", Map("en" -> 0))
    assert(m.where(col("lang").isNull).count() ==
      withNull.where(col("lang").isNull).count())
    assert(m.where(col("lang") === "en").count() == 0)
  }

  test("shuffleAssign: exhaustive deterministic permutation, dense per-shard positions, salt independence") {
    val n = docs.count()
    val a = Sampling.shuffleAssign(docs.select(col("doc_id")), "doc_id", 8, "epoch1")
    val rows = a.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // a permutation: every row present exactly once, shards in range
    assert(rows.length == n && rows.map(_._1).distinct.length == n)
    assert(rows.forall { case (_, s, _) => s >= 0 && s < 8 })
    // positions are dense 1..|shard| within each shard
    rows.groupBy(_._2).foreach { case (s, g) =>
      assert(g.map(_._3).sorted.toSeq == (1L to g.length.toLong),
        s"shard $s positions not dense")
    }
    // deterministic: a re-evaluation draws the identical permutation
    val b = Sampling.shuffleAssign(docs.select(col("doc_id")), "doc_id", 8, "epoch1")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.toSet == b.toSet)
    // a different salt draws a genuinely different permutation
    val c = Sampling.shuffleAssign(docs.select(col("doc_id")), "doc_id", 8, "epoch2")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.toSet != c.toSet, "salt did not change the permutation")
    // sequential reads: writeShuffled lays one directory per shard with rows
    // in pos order inside the files
    val dir = java.nio.file.Files.createTempDirectory("graft_shuf_").toString + "/s"
    Sampling.writeShuffled(docs.select(col("doc_id")), "doc_id", 4, dir, "epoch1")
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.length == 4)
    val back = spark.read.parquet(dir)
    assert(back.count() == n)
    val inOrder = back.where(col("shard") === 0).collect().map(_.getAs[Long]("pos"))
    assert(inOrder.toSeq == inOrder.sorted.toSeq, "shard files not in pos order")
  }

  test("projectedTopK recalls planted exact copies through the reduced space") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val q = emb.where(col("vec_id") === 5).head().getSeq[Float](1)
    // identical vectors project identically (integer arithmetic), so the
    // reduced-space prefilter ranks them at pcos = 1 ahead of the margin
    val planted = emb.where(col("vec_id") === 5)
      .select(explode(sequence(lit(0), lit(9))).as("i"), col("embedding"))
      .select((col("i") + 7000L).as("vec_id"), col("embedding"))
    val corpus = emb.where(col("vec_id") =!= 5).unionByName(planted)
    val got = graft.ops.Similarity.projectedTopK(corpus, "vec_id", "embedding",
        q, 10, outDim = 16, margin = 4)
      .collect().map(_.getLong(0)).toSet
    assert(got == (0 until 10).map(_ + 7000L).toSet, s"got $got")
    // expression eval == driver-side twin (the query projects as a literal)
    import graft.functions.GraftFunctions.md5_random_projection
    val exprProj = emb.where(col("vec_id") === 5)
      .select(md5_random_projection(col("embedding"), 16)).head().getSeq[Long](0)
    val twinProj = org.apache.spark.sql.graft.Md5RandomProjection
      .compute(q.toArray, 16)
    assert(exprProj.toSeq == twinProj.toSeq)
    // the materialized-layout probe returns the identical top-k: stage 1 over
    // the persisted narrow (id, proj) table, survivors joined back by id
    val projected = graft.ops.Similarity.projectCorpus(corpus, "vec_id", "embedding")
    val viaLayout = graft.ops.Similarity.projectedTopKFromProjected(
        projected, corpus, "vec_id", "embedding", q, 10, outDim = 16, margin = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val direct = graft.ops.Similarity.projectedTopK(corpus, "vec_id", "embedding",
        q, 10, outDim = 16, margin = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaLayout == direct, "layout probe diverged from the inline form")
  }

  test("temperatureSample: shares follow n^tau exactly; tau<1 upweights small strata") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("lang"))
    val counts = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def expected(budget: Long, tau: Double): Map[String, Long] = {
      val w = counts.map { case (k, n) =>
        k -> math.floor(math.pow(n.toDouble, tau) * 1000000.0).toLong }
      val tw = w.values.sum
      w.map { case (k, wi) =>
        k -> math.min(counts(k), math.floor(wi.toDouble / tw * budget).toLong) }
    }
    for (tau <- Seq(0.5, 1.0)) {
      val got = Sampling.temperatureSample(docs, "doc_id", "lang", 100L, tau)
        .groupBy("lang").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exp = expected(100L, tau).filter(_._2 > 0)
      assert(got == exp, s"tau=$tau: got $got expected $exp")
      assert(got.values.sum <= 100L)
    }
    // flattening: the smallest stratum's share of the sample is at least its
    // share under proportional (tau=1) sampling
    val smallest = counts.minBy(_._2)._1
    assert(expected(100L, 0.5)(smallest) >= expected(100L, 1.0)(smallest))
    // selection is the per-stratum min-wise prefix: re-running over a
    // repartitioned input draws the identical id set
    val a = Sampling.temperatureSample(docs, "doc_id", "lang", 100L)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val b = Sampling.temperatureSample(docs.repartition(7), "doc_id", "lang", 100L)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(a == b)
  }

  test("budgetSelect: maximal hash-order prefix under each stratum's budget") {
    import graft.functions.GraftFunctions.token_count
    val weighted = docs.withColumn("n_tokens", token_count(col("text")).cast("long"))
    val budgets = Map("en" -> 5000L, "de" -> 1000000L)
    val kept = Sampling.budgetSelect(weighted, "doc_id", "lang", "n_tokens",
        budgets, defaultBudget = 2000L)
      .select("doc_id", "lang", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // replicate the rule driver-side: hash-order prefix with running sum ≤ b
    val all = weighted.select(col("doc_id"), col("lang"), col("n_tokens"),
        graft.functions.GraftFunctions.md5_prefix60(col("doc_id").cast("string")).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expected = all.groupBy(_._2).flatMap { case (lang, rows) =>
      val b = budgets.getOrElse(lang, 2000L)
      var cum = 0L
      rows.sortBy(r => (r._4, r._1)).takeWhile { r => cum += r._3; cum <= b }
        .map(r => (r._1, r._2, r._3)).toSeq
    }.toSet
    assert(kept.toSet == expected && kept.nonEmpty)
    // the huge-budget stratum keeps every row
    assert(kept.count(_._2 == "de") == all.count(_._2 == "de"))
    // budget honored: per-stratum kept weight ≤ budget
    kept.groupBy(_._2).foreach { case (lang, rows) =>
      assert(rows.map(_._3).sum <= budgets.getOrElse(lang, 2000L), lang)
    }
  }

  test("repeatToBudget: ≤ target, short by less than one doc, dense epochs") {
    import graft.functions.GraftFunctions.token_count
    val weighted = docs.withColumn("n_tokens", token_count(col("text")).cast("long"))
    val targets = Map("en" -> 15000L, "zh" -> 10000L)
    val out = Sampling.repeatToBudget(weighted, "doc_id", "lang", "n_tokens",
        targets, defaultTarget = 4000L)
      .select("doc_id", "lang", "n_tokens", "epoch").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    val perLang = weighted.groupBy("lang")
      .agg(sum("n_tokens").as("tot"), max("n_tokens").as("mx")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    perLang.foreach { case (lang, (tot, mx)) =>
      val tgt = targets.getOrElse(lang, 4000L)
      val emitted = out.filter(_._2 == lang).map(_._3).sum
      assert(emitted <= tgt, s"$lang emitted $emitted > target $tgt")
      assert(tgt - emitted < mx, s"$lang left ${tgt - emitted} ≥ max doc $mx unused")
      assert(tot == 0 || emitted >= (tgt / tot) * tot, s"$lang full epochs missing")
    }
    // per-doc epochs are dense 1..rep
    out.groupBy(r => (r._1, r._2)).foreach { case (k, rows) =>
      val es = rows.map(_._4).sorted
      assert(es.head == 1L && es.last == es.length.toLong &&
        es.distinct.length == es.length, s"doc $k epochs ${es.toList}")
    }
  }

  test("capPerGroup: min(k, group size) kept, smallest hashes win, k=0 empty") {
    val kept = Sampling.capPerGroup(docs, "doc_id", "source", 10)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val all = docs.select(col("doc_id"), col("source"),
        graft.functions.GraftFunctions.md5_prefix60(col("doc_id").cast("string")).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = all.groupBy(_._2).flatMap { case (_, rows) =>
      rows.sortBy(r => (r._3, r._1)).take(10).map(r => (r._1, r._2)).toSeq
    }.toSet
    assert(kept.toSet == expected)
    kept.groupBy(_._2).foreach { case (src, rows) =>
      assert(rows.length == math.min(10, all.count(_._2 == src)), src)
    }
    assert(Sampling.capPerGroup(docs, "doc_id", "source", 0).isEmpty)
  }

  test("shuffleAssign refuses to overwrite caller columns (append contract)") {
    val df = spark.range(5).select(col("id"), lit(1).as("shard"))
    val e = intercept[IllegalArgumentException] {
      Sampling.shuffleAssign(df, "id", 4)
    }
    assert(e.getMessage.contains("shard"))
  }

  test("systematicResample: sum(copies) = n exactly; every count within 1 " +
      "of its expectation; non-positive weights never sample; " +
      "partition-invariant") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, i % 7 match {
      case 0 => 0L          // excluded
      case k => k * 10L
    })).toDF("id", "w")
    val n = 37L
    val out = Sampling.systematicResample(df, "id", "w", n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._3).sum == n, "slot count is exact, not approximate")
    assert(out.forall(_._3 >= 1))
    assert(out.forall { case (id, _, _) => id % 7 != 0 }, "zero weights out")
    val bigW = df.where(col("w") > 0).agg(sum("w")).head().getLong(0)
    out.foreach { case (id, w, c) =>
      val exp = w.toDouble * n / bigW
      assert(math.abs(c - exp) <= 1.0, s"id $id: copies $c vs E=$exp")
    }
    val out2 = Sampling.systematicResample(df.repartition(13), "id", "w", n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sortBy(_._1).toSeq == out2.sortBy(_._1).toSeq,
      "resampling must not depend on input partitioning")
  }

  test("quantileNormalize: rank permilles equate scales across groups; " +
      "ties break by id; top-permille selection is group-fair") {
    import spark.implicits._
    // group a scores 1..10; group b scores 1000..1040 by 10s (different
    // scale entirely): permille depends only on within-group rank
    val df = ((1L to 10L).map(i => (i, "a", i)) ++
      (11L to 15L).map(i => (i, "b", 1000L + 10 * (i - 10))))
      .toDF("id", "g", "s")
    val out = Sampling.quantileNormalize(df, "g", "s", "id")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(10L) == 1000L && out(15L) == 1000L, "each group's max is 1000")
    assert(out(1L) == 100L, "rank 1 of 10 -> 100 permille")
    assert(out(11L) == 200L, "rank 1 of 5 -> 200 permille")
    // "top 40%" picks proportionally from BOTH groups despite the scales
    val top = out.filter(_._2 > 600).keySet
    assert(top.count(_ <= 10L) == 4 && top.count(_ > 10L) == 2, s"got $top")
  }

  test("waterFill: max-min-fair allocation — small supplies fully taken, " +
      "surplus splits with deterministic remainder; budget conserved; " +
      "never over-allocates") {
    import spark.implicits._
    val rows = Seq(("s5", 5L), ("s10", 10L), ("x1", 100L), ("x2", 100L))
      .toDF("g", "v")
    val out = Sampling.waterFill(rows, "g", "v", budget = 30L)
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getBoolean(3))))
      .toMap
    // sorted [5,10,100,100]: only the 5 is fully fundable; R=25 over 3
    // capped groups -> share 8, one leftover unit to the smallest capped
    assert(out("s5") == ((5L, true)))
    assert(out("s10") == ((9L, false)), s"smallest capped takes the extra: $out")
    assert(out("x1") == ((8L, false)) && out("x2") == ((8L, false)))
    assert(out.values.map(_._1).sum == 30L, "budget conserved exactly")
    // budget above total supply: everyone fully funded at their supply
    val all = Sampling.waterFill(rows, "g", "v", budget = 1000L)
      .collect().map(r => (r.getLong(2), r.getBoolean(3)))
    assert(all.forall(_._2) && all.map(_._1).sum == 215L)
    // zero budget: zero allocations, nothing funded
    assert(Sampling.waterFill(rows, "g", "v", 0L)
      .collect().forall(r => r.getLong(2) == 0L && !r.getBoolean(3)))
    // equal supplies: remainder goes to the group-name order deterministically
    val eq = Seq(("a", 7L), ("b", 7L), ("c", 7L)).toDF("g", "v")
    val e = Sampling.waterFill(eq, "g", "v", 8L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(e == Map("a" -> 3L, "b" -> 3L, "c" -> 2L), s"got $e")
  }

  test("Layout.globalScan: inclusive prefix sums equal the sorted fold " +
      "across range partitions") {
    import spark.implicits._
    val df = (1L to 50L).map(i => (i, (i * 37) % 50)).map { case (v, k) =>
      (k, v) }.toDF("k", "v")
    val out = graft.ops.Layout.globalScan(df, Seq(col("k"), col("v")), "v",
        numPartitions = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._3)
    var run = 0L
    out.zipWithIndex.foreach { case ((k, v, rn, cum), i) =>
      run += v
      assert(rn == i + 1 && cum == run, s"row $i: ($k,$v,$rn,$cum) vs $run")
    }
    // sorted by (k, v): ranks follow that order
    assert(out.map(t => (t._1, t._2)).toSeq ==
      out.map(t => (t._1, t._2)).sortBy(identity).toSeq)
  }

  test("rendezvousShards: in-range, deterministic, minimal movement — " +
      "every n→n+1 move lands on the NEW shard") {
    import spark.implicits._
    val ids = (1L to 400L).toDF("id")
    val out = graft.ops.Sampling.rendezvousShards(ids, "id", 8, 9)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getBoolean(3)))
    assert(out.length == 400)
    out.foreach { case (id, so, sn, m) =>
      assert(so >= 0 && so < 8 && sn >= 0 && sn < 9)
      assert(m == (so != sn))
      // HRW invariant: adding shard 8 can only steal rows FOR shard 8 —
      // the argmax over 0..7 is unchanged otherwise
      if (m) assert(sn == 8, s"id $id moved to $sn, not the new shard")
    }
    val moved = out.count(_._4)
    // expected 1/9 of rows; generous band to stay seed-free and stable
    assert(moved > 10 && moved < 120, s"moved $moved of 400")
    // determinism across partitionings
    val again = graft.ops.Sampling.rendezvousShards(ids.repartition(13),
      "id", 8, 9).collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getBoolean(3))).sortBy(_._1)
    assert(again.toSeq == out.sortBy(_._1).toSeq)
  }

  test("paretoSkyline: matches brute-force dominance; coincident points " +
      "both survive; same-x dominated points drop") {
    import spark.implicits._
    val pts = Seq((1L, 1L, 5L), (2L, 2L, 4L), (3L, 3L, 3L), (4L, 2L, 5L),
      (5L, 0L, 9L), (6L, 3L, 1L), (7L, 2L, 5L), (8L, 3L, 3L), (9L, 4L, 0L))
    val out = graft.ops.Sampling.paretoSkyline(
        pts.toDF("id", "x", "y"), "id", "x", "y")
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val brute = pts.map { case (id, x, y) =>
      id -> !pts.exists { case (id2, x2, y2) =>
        id2 != id && x2 >= x && y2 >= y && (x2 > x || y2 > y) &&
          // coincident points never dominate each other
          !(x2 == x && y2 == y)
      }
    }.toMap
    assert(out == brute, s"skyline $out vs brute $brute")
    // spot meaning: (0,9) and (2,5)×2 and (3,3)×2 and (4,0) on the frontier;
    // (1,5) dominated by (2,5); (2,4) by (2,5); (3,1) by (3,3)
    assert(out(5L) && out(4L) && out(7L) && out(3L) && out(8L) && out(9L))
    assert(!out(1L) && !out(2L) && !out(6L))
  }

  test("matchedControls: nearest-in-value control, ties to the earlier, " +
      "with-replacement reuse, null match when a group has no control") {
    import spark.implicits._
    val rows = Seq(
      // group g: controls at 5 and 10
      (1L, "g", 5L, false), (2L, "g", 10L, false),
      (3L, "g", 7L, true),   // 2 vs 3 → control 5
      (4L, "g", 8L, true),   // 3 vs 2 → control 10
      (5L, "g", 5L, true),   // exact hit: diff 0 via the earlier candidate
      // group t: tie — controls at 4 and 8, treated at 6 → earlier (4)
      (6L, "t", 4L, false), (7L, "t", 8L, false), (8L, "t", 6L, true),
      // group z: no control at all
      (9L, "z", 3L, true))
      .toDF("id", "grp", "v", "tr")
    val out = graft.ops.Sampling.matchedControls(rows, "id", "grp", "v", "tr")
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(3)) -1L else r.getLong(3)),
          (if (r.isNullAt(5)) -1L else r.getLong(5)))).toMap
    assert(out(3L) == ((1L, 2L)), s"$out")
    assert(out(4L) == ((2L, 2L)))
    assert(out(5L) == ((1L, 0L)), "same-value control must give diff 0")
    assert(out(8L) == ((6L, 2L)), "equal diffs pick the at-or-before control")
    assert(out(9L) == ((-1L, -1L)), "controls absent: null match, not a drop")
    assert(out.keySet == Set(3L, 4L, 5L, 8L, 9L), "only treated rows report")
  }

  test("balancedShards: round-robin on the weight-descending total order; " +
      "loads within one max-weight of each other") {
    import spark.implicits._
    val rows = Seq((1L, 10L), (2L, 9L), (3L, 8L), (4L, 7L), (5L, 6L),
      (6L, 5L)).toDF("id", "w")
    val out = graft.ops.Sampling.balancedShards(rows, "id", "w", k = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    // ranks 1..6 desc by weight → shard 0 gets 10,8,6; shard 1 gets 9,7,5
    assert(out(0L) == ((3L, 24L, 10L)) && out(1L) == ((3L, 21L, 9L)), s"$out")
    // larger random-ish case: the LPT bound holds
    val big = (1L to 101L).map(i => (i, (i * 37) % 50 + 1)).toDF("id", "w")
    val loads = graft.ops.Sampling.balancedShards(big, "id", "w", k = 7)
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    val maxW = loads.map(_._2).max
    assert(loads.map(_._1).max - loads.map(_._1).min <= maxW,
      s"imbalance exceeds one max weight: $loads")
  }

  test("stratifiedFolds: exact per-stratum balance, stable against edits " +
      "in OTHER strata, deterministic across partitionings") {
    import spark.implicits._
    val rows = ((1L to 23L).map(i => (i, "en")) ++
      (100L to 109L).map(i => (i, "de"))).toDF("id", "lang")
    val out = graft.ops.Sampling.stratifiedFolds(rows, "id", "lang", k = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // en: 23 rows over 5 folds → sizes {5,5,5,4,4}; de: 10 → all exactly 2
    val en = out.filter(_._2 == "en").groupBy(_._3).map(_._2.size).toSeq
    assert(en.sorted == Seq(4, 4, 5, 5, 5), s"en fold sizes: $en")
    val de = out.filter(_._2 == "de").groupBy(_._3).map(_._2.size).toSeq
    assert(de == Seq.fill(5)(2), s"de fold sizes: $de")
    // adding rows to de must not move any en assignment
    val more = rows.unionByName(Seq((200L, "de"), (201L, "de"))
      .toDF("id", "lang"))
    val enAfter = graft.ops.Sampling.stratifiedFolds(more, "id", "lang", 5)
      .where(col("stratum") === "en")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out.filter(_._2 == "en").map(t => (t._1, t._3)).toMap == enAfter)
    val again = graft.ops.Sampling.stratifiedFolds(rows.repartition(7),
        "id", "lang", 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(again.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
  }

  test("matchedControlsGlobal ≡ matchedControls on one stratum across many " +
      "range partitions (boundary-stitched carry), sparse controls carry " +
      "across empty partitions") {
    import spark.implicits._
    // 400 rows, ~1 in 8 is a control — many range partitions will hold no
    // control at all, so the prev/next carries MUST cross partitions
    val rows = (1L to 400L).map { i =>
      (i, (i * 131) % 1000, i % 8 == 0)
    }.toDF("id", "v", "ctrl").withColumn("tr", !col("ctrl"))
    val grouped = graft.ops.Sampling.matchedControls(
        rows.withColumn("g", lit("all")), "id", "g", "v", "tr",
        global = Some(false)) // pin the per-group window plan explicitly
      .collect().map(r => r.getLong(0) -> ((
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(5)) -1L else r.getLong(5)))).toMap
    val global = graft.ops.Sampling.matchedControlsGlobal(
        rows, "id", "v", "tr", numPartitions = 13)
      .collect().map(r => r.getLong(0) -> ((
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(global == grouped,
      s"diff: ${(global.toSet diff grouped.toSet).take(5)} / " +
        s"${(grouped.toSet diff global.toSet).take(5)}")
    assert(global.nonEmpty && global.values.forall(_._1 != -1L),
      "with 50 controls spread over the range every treated row matches")
  }

  test("matchedControls routing: few strata auto-route to the range-shuffle " +
      "plan, results identical to the window plan row-for-row, cross-group " +
      "carry never leaks a control across a stratum boundary") {
    import spark.implicits._
    // 3 giant-ish strata (far fewer than shuffle partitions → auto-global);
    // group "b" has its controls clustered at the START of its value range
    // so b-treated rows near the end would match an a/c control if the
    // carry leaked across the group boundary
    val rows = (1L to 300L).map { i =>
      val g = if (i <= 120) "a" else if (i <= 220) "b" else "c"
      val ctrl = (g == "b" && i <= 140) || (g != "b" && i % 5 == 0)
      (i, g, (i * 97) % 500, !ctrl)
    }.toDF("id", "g", "v", "tr")
    def collectOut(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(5)) -1L else r.getLong(5))).toSet
    val routed = graft.ops.Sampling.matchedControls(rows, "id", "g", "v", "tr")
    val windowed = collectOut(graft.ops.Sampling.matchedControls(
      rows, "id", "g", "v", "tr", global = Some(false)))
    val out = collectOut(routed)
    assert(out == windowed, s"routed ≠ windowed: " +
      s"${(out diff windowed).take(5)} / ${(windowed diff out).take(5)}")
    // every match stays within its stratum (the leak check): match_id's
    // group must equal the treated row's group
    val grpOf = rows.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.filter(_._3 != -1L).foreach { case (id, g, mid, _) =>
      assert(grpOf(mid) == g, s"row $id ($g) matched cross-group $mid") }
    // the auto-routed plan is the carry one (no per-group Window operator —
    // the range shuffles run inside globalRunningLast's eager passes):
    // 3 groups << shuffle partitions must NOT pick the window plan
    val plan = routed.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"expected no per-group window:\n$plan")
    val wplan = graft.ops.Sampling.matchedControls(
      rows, "id", "g", "v", "tr", global = Some(false))
      .queryExecution.executedPlan.toString
    assert(wplan.contains("Window"), "the pinned window plan sanity check")
  }
}
