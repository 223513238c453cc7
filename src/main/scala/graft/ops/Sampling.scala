package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling / splitting for training-data pipelines (north-star
 * extension, BASELINE.json). Everything is keyed on a content-independent,
 * engine-portable hash of the row id — the split a row lands in never changes
 * across runs, engines, partitionings, or cluster sizes, which is the property
 * training pipelines need for train/test hygiene (a re-shuffled rerun must not
 * leak yesterday's test rows into today's train set).
 *
 * The hash is the top-60-bits-of-md5 scheme shared with the oracle-stable
 * signature expressions: DuckDB twin
 * `('0x' || substr(md5(cast(id as varchar)), 1, 15))::BIGINT`.
 */
object Sampling {

  /** Uniform bucket in [0, buckets) from the id's md5 — stable everywhere.
    * One md5 per row (native `md5_prefix60`, no hex-string round-trip), no
    * shuffle, prunes to a scan-level filter. */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    pmod(graft.functions.GraftFunctions.md5_prefix60(id.cast("string")),
      lit(buckets.toLong))

  /** Deterministic train/test split: `trainPct` percent of ids (by hash
    * bucket) get "train", the rest "test". */
  def hashSplit(df: DataFrame, idCol: String, trainPct: Int): DataFrame = {
    require(trainPct >= 0 && trainPct <= 100, "trainPct must be in [0, 100]")
    df.withColumn("split",
      when(hashBucket(col(idCol)) < trainPct, "train").otherwise("test"))
  }

  /** Deterministic ~`pct`% sample: rows whose hash bucket falls below `pct`.
    * Unlike `df.sample`, membership is a pure function of the id — stable
    * under re-runs and repartitioning, and the predicate pushes into the scan. */
  def hashSample(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.where(hashBucket(col(idCol)) < pct)

  /**
   * Stratified corpus reweighting — the "data mixing" stage of a training
   * pipeline: keep a deterministic per-stratum fraction of rows (down-sample
   * a dominant crawl source, cap an over-represented language, zero out a
   * stratum entirely). `permille` maps stratum value → keep rate in ‰
   * (integer per-mille, so thresholds are exact and engine-portable — no
   * float×bucket rounding ambiguity); strata absent from the map keep
   * `defaultPermille`. Membership is a pure function of the row id (same
   * md5-bucket scheme as [[hashSplit]], buckets = 1000): re-runs, engines,
   * and partitionings all draw the SAME mix, so a re-shuffled rerun cannot
   * silently change the training distribution. The whole operator is a
   * scan-level filter — the fractions fold into one literal CASE expression:
   * no shuffle, no state, composes with column pruning and pushdown.
   * DuckDB twin of the predicate:
   * `('0x'||substr(md5(cast(id as varchar)),1,15))::BIGINT % 1000 <
   *  CASE stratum WHEN ... END`.
   */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      permille: Map[String, Int], defaultPermille: Int = 1000): DataFrame = {
    require((defaultPermille +: permille.values.toSeq).forall(p => p >= 0 && p <= 1000),
      "per-mille rates must be in [0, 1000]")
    val threshold = permille.foldLeft(lit(defaultPermille.toLong)) {
      case (acc, (k, v)) => when(col(stratumCol) === k, lit(v.toLong)).otherwise(acc)
    }
    df.where(hashBucket(col(idCol), 1000) < threshold)
  }

  /**
   * Temperature-based mixture sampling (the multilingual-LM mixing rule,
   * mC4/XLM-R style): stratum i gets a share of the `budget` proportional to
   * n_i^tau — tau < 1 UP-weights low-resource strata relative to their raw
   * counts, tau = 1 is proportional sampling. Unlike [[stratifiedSample]]
   * (caller-fixed per-mille rates), the rates here are COMPUTED from the
   * corpus's own stratum sizes:
   *
   *   c_i = min(n_i, floor(budget · w_i / Σw)) ,  w_i = floor(n_i^tau · 10⁶)
   *
   * and each stratum keeps its c_i min-wise docs (smallest md5 id hashes —
   * the [[minWiseSample]] rule per stratum), so the draw is a pure function
   * of the id set and replays on any engine. Flooring the per-stratum shares
   * means up to (#strata − 1) budget rows go unused — deterministic, never
   * over budget.
   *
   * Cross-engine exactness: with tau = 0.5 the weight is sqrt — CORRECTLY
   * ROUNDED under IEEE 754 on every engine, so w_i (and every downstream
   * +,·,/ of exact integers through doubles) is bit-identical and the oracle
   * can assert the sample exactly. Other tau values go through pow(), whose
   * last-ulp behavior is library-specific — same sample in practice, but the
   * 1-ulp-at-a-floor-boundary case can't be ruled out (the [[lmScore]] ln
   * caveat, without a quantization grid to absorb it).
   *
   * Scale shape: stratum stats are one tiny agg (broadcast back); selection
   * is one rank window per stratum — bounded by the LARGEST stratum, the
   * [[graft.ops.TextOps.packDocuments]] skew caveat (a 90%-one-language
   * corpus serializes that stratum's rank into one sort partition).
   */
  def temperatureSample(df: DataFrame, idCol: String, stratumCol: String,
      budget: Long, tau: Double = 0.5): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    require(tau > 0 && tau <= 1, "tau must be in (0, 1]")
    require(!df.columns.contains("__graft_rk"),
      "temperatureSample uses a '__graft_rk' working column — rename the input's")
    import org.apache.spark.sql.expressions.Window
    val stats = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
    val wExpr = if (tau == 0.5) sqrt(col("n").cast("double"))
                else pow(col("n").cast("double"), tau)
    val weighted = stats.select(col(stratumCol), col("n"),
      floor(wExpr * 1000000.0).cast("long").as("w"))
    val targets = weighted
      .crossJoin(broadcast(weighted.agg(sum(col("w")).as("tw"))))
      .select(col(stratumCol),
        least(col("n"),
          floor((col("w").cast("double") / col("tw")) * budget).cast("long"))
          .as("__graft_c"))
    val rk = Window.partitionBy(col(stratumCol))
      .orderBy(graft.functions.GraftFunctions.md5_prefix60(
        col(idCol).cast("string")), col(idCol))
    df.withColumn("__graft_rk", row_number().over(rk))
      .join(broadcast(targets), Seq(stratumCol))
      .where(col("__graft_rk") <= col("__graft_c"))
      .drop("__graft_rk", "__graft_c")
  }

  /**
   * Deterministic training-data shuffle: every row gets a `shard` in
   * [0, shards) and a dense 1-based `pos` within its shard, both pure
   * functions of (salt, id) — the epoch-shuffle stage of a training
   * pipeline. Two engines, two runs, or two partitionings produce the SAME
   * order; changing `salt` (e.g. per epoch) draws a fresh independent
   * permutation. The order key is the md5 of "salt:id" (DuckDB twin:
   * `('0x' || substr(md5(salt || ':' || cast(id as varchar)), 1, 15))::BIGINT`),
   * so consumers can reproduce — or pre-compute — the permutation in SQL.
   *
   * Scale shape: one hash per row at scan bandwidth, then one sort per
   * shard partition — `shards` bounds every sort at corpus/shards rows
   * (pick shards ≈ output file count; there is NO global sort). Write with
   * [[writeShuffled]] for the partition-per-shard layout training readers
   * consume sequentially.
   */
  def shuffleAssign(df: DataFrame, idCol: String, shards: Int,
      salt: String = ""): DataFrame = {
    require(shards > 0, "shards must be positive")
    // Append contract (same rule as contaminationBloomFlags): refuse to
    // silently replace caller columns with the shuffle outputs.
    Seq("shard", "pos", "__graft_key").foreach { c =>
      require(!df.columns.contains(c),
        s"shuffleAssign appends column '$c' but the input already has one — rename it first")
    }
    import org.apache.spark.sql.expressions.Window
    val key = graft.functions.GraftFunctions.md5_prefix60(
      concat(lit(salt), lit(":"), col(idCol).cast("string")))
    df.withColumn("__graft_key", key)
      .withColumn("shard", pmod(col("__graft_key"), lit(shards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(
          Window.partitionBy(col("shard"))
            .orderBy(col("__graft_key"), col(idCol))).cast("bigint"))
      .drop("__graft_key")
  }

  /** Materialize a [[shuffleAssign]] permutation as the layout training
    * readers want: one directory per shard, rows inside each file in
    * shuffled (`pos`) order. */
  def writeShuffled(df: DataFrame, idCol: String, shards: Int, path: String,
      salt: String = ""): Unit =
    shuffleAssign(df, idCol, shards, salt)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.partitionBy("shard").mode("overwrite").parquet(path)

  /** Min-wise sample: the `k` rows with the smallest id hashes — an exact-size
    * uniform sample without replacement that is a pure function of the id set
    * (two engines, or two runs over different partitionings, draw the SAME
    * sample). Plans as `TakeOrderedAndProject`: a k-row heap per partition and
    * a k-row merge at the driver — no global sort, no full shuffle. */
  def minWiseSample(df: DataFrame, idCol: String, k: Int): DataFrame =
    df.orderBy(graft.functions.GraftFunctions.md5_prefix60(
        col(idCol).cast("string")), col(idCol))
      .limit(k)

  /**
   * Token-budget corpus selection: each stratum keeps its min-wise docs (md5
   * id-hash order — the [[minWiseSample]] rule) until that stratum's weight
   * budget fills. A row survives iff its RUNNING weight total, itself
   * included, is ≤ the stratum's budget — so the kept set is maximal under
   * the budget in hash order and a pure function of the input set (replays
   * on any engine; rerunning after a re-partition keeps the same docs).
   * This is the "select N tokens per language" curation stage that follows
   * rate-based mixing ([[stratifiedSample]]/[[temperatureSample]] pick
   * FRACTIONS; this picks an absolute weight amount).
   *
   * Strata absent from `budgets` get `defaultBudget`; a budget at or above
   * the stratum's total keeps the whole stratum. Weights must be
   * non-negative for the ≤-prefix rule to be meaningful (zero-weight rows
   * ride along for free, deterministically).
   *
   * Scale shape: the window moves (id, stratum, weight) only — text and
   * payload columns never shuffle (Spark rewrites the window's child to the
   * projected columns); one running-sum pass per stratum, bounded by the
   * largest stratum (the [[graft.ops.TextOps.packDocuments]] skew caveat).
   */
  def budgetSelect(df: DataFrame, idCol: String, stratumCol: String,
      weightCol: String, budgets: Map[String, Long],
      defaultBudget: Long = Long.MaxValue): DataFrame = {
    require((defaultBudget +: budgets.values.toSeq).forall(_ >= 0),
      "budgets must be non-negative")
    require(!df.columns.contains("__graft_cum"),
      "budgetSelect uses a '__graft_cum' working column — rename the input's")
    val budget = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (k, v)) => when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(stratumCol))
      .orderBy(graft.functions.GraftFunctions.md5_prefix60(
        col(idCol).cast("string")), col(idCol))
    df.withColumn("__graft_cum", sum(col(weightCol).cast("long")).over(w))
      .where(col("__graft_cum") <= budget)
      .drop("__graft_cum")
  }

  /**
   * Repeat-to-budget epoching (the up-sampling half of data mixing): every
   * stratum is replayed enough times to hit a target weight — `e = target
   * div total` FULL epochs of the whole stratum plus a min-wise prefix
   * (running weight ≤ `target mod total`) getting one extra epoch. Rows come
   * back exploded as (input columns…, epoch), epoch ∈ [1, repeats] — the
   * materialized "low-resource languages are repeated N× per training pass"
   * schedule (mC4/LLaMA-style mixing with repetition), deterministic and
   * engine-replayable like everything in this family.
   *
   * Total emitted weight per stratum is ≤ target, and short of it by less
   * than one document (the first doc NOT granted the extra epoch would
   * overshoot) — never over budget. A target below the smallest doc emits
   * zero epochs for that stratum; a zero-total stratum emits nothing (null
   * div guard).
   *
   * Scale shape: stratum totals are one tiny agg broadcast back; the
   * running sum moves (id, stratum, weight) only; the epoch fan-out is a
   * per-row explode at scan bandwidth — no shuffle grows with the repeat
   * factor.
   */
  def repeatToBudget(df: DataFrame, idCol: String, stratumCol: String,
      weightCol: String, targets: Map[String, Long],
      defaultTarget: Long = 0L): DataFrame = {
    require((defaultTarget +: targets.values.toSeq).forall(_ >= 0),
      "targets must be non-negative")
    Seq("__graft_cum", "__graft_tot", "__graft_t", "__graft_rep").foreach { c =>
      require(!df.columns.contains(c),
        s"repeatToBudget uses a '$c' working column — rename the input's")
    }
    val target = targets.foldLeft(lit(defaultTarget)) {
      case (acc, (k, v)) => when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    val stats = df.groupBy(col(stratumCol))
      .agg(sum(col(weightCol).cast("long")).as("__graft_tot"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(stratumCol))
      .orderBy(graft.functions.GraftFunctions.md5_prefix60(
        col(idCol).cast("string")), col(idCol))
    df.withColumn("__graft_cum", sum(col(weightCol).cast("long")).over(w))
      .join(broadcast(stats), Seq(stratumCol))
      .withColumn("__graft_t", target)
      // integer div/mod keep the arithmetic exact at any corpus size (no
      // double rounding at 100 TB token totals); div-by-zero → null → filtered
      .withColumn("__graft_rep",
        expr("__graft_t div __graft_tot") +
          when(col("__graft_cum") <= col("__graft_t") % col("__graft_tot"), 1L)
            .otherwise(0L))
      .where(col("__graft_rep") >= 1)
      .withColumn("epoch", explode(sequence(lit(1L), col("__graft_rep"))))
      .drop("__graft_cum", "__graft_tot", "__graft_t", "__graft_rep")
  }

  /**
   * Per-group cap (the C4/RefinedWeb "at most k pages per domain" stage):
   * keep each group's k min-wise rows (md5 id-hash order), drop the rest.
   * Equivalent to [[minWiseSample]] applied per group, as one window pass —
   * deterministic, engine-replayable, content-independent.
   *
   * Scale shape: one row_number window per group moving only (id, group);
   * at 100 TB with millions of domains the partitions are small and uniform
   * (domains are the archetypal many-small-groups key); a single mega-group
   * degrades to the packDocuments skew caveat.
   */
  def capPerGroup(df: DataFrame, idCol: String, groupCol: String,
      k: Int): DataFrame = {
    require(k >= 0, "cap must be non-negative")
    require(!df.columns.contains("__graft_rk"),
      "capPerGroup uses a '__graft_rk' working column — rename the input's")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
      .orderBy(graft.functions.GraftFunctions.md5_prefix60(
        col(idCol).cast("string")), col(idCol))
    df.withColumn("__graft_rk", row_number().over(w))
      .where(col("__graft_rk") <= k)
      .drop("__graft_rk")
  }

  /**
   * Per-group quantile band filter by RANK, not value: keep the rows of each
   * group whose (orderCol, idCol) rank lies in (⌊n·lo/1000⌋, ⌊n·hi/1000⌋] —
   * the robust "trim both tails" filter (drop the shortest 5% and longest 5%
   * of each language, etc.) without the cross-engine hazard of interpolated
   * percentile VALUES (every engine interpolates quantiles differently; a
   * rank cut is pure integer arithmetic, so the kept set replays exactly).
   * Ties are broken by id — the band is a pure function of the input set.
   *
   * Plan: one window pass per group (rank + count over the same partition —
   * Spark evaluates both in a single Window operator, one shuffle by
   * groupCol). Same bounded-strata caveat as packDocuments: a single
   * dominant group serializes into one partition's sort; at 100 TB with few
   * giant groups, pre-aggregate counts and cut by (orderCol-histogram) bins
   * instead, or shard the rank pass.
   */
  /**
   * Weighted sampling without replacement by PRIORITY SAMPLING (Duffield,
   * Lund & Thorup, JACM 2007): row i gets priority q_i = w_i / u_i with u_i
   * a uniform draw, and the sample is the k rows of largest priority — rows
   * are included with probability ∝ their weight (a long document is
   * proportionally more likely to be drawn than a short one), without the
   * with-replacement duplicates naive weighted draws produce.
   *
   * Determinism contract (the [[minWiseSample]] discipline, weighted): u_i
   * is the row id's md5 top-60-bits + 1 — a pure function of the id, so two
   * engines, two runs, or two partitionings draw the SAME sample. Both
   * operands are exact integers cast to double; IEEE 754 makes the cast and
   * the division correctly rounded on every engine, so the priority ORDER —
   * hence the selected set — replays bit-exactly (ties, if a double collision
   * ever happened, break by id). DuckDB twin of the priority:
   * `CAST(w AS DOUBLE) / CAST(('0x'||substr(md5(cast(id as varchar)),1,15))::BIGINT + 1 AS DOUBLE)`.
   *
   * Scale shape: one hash + one division per row at scan bandwidth, then
   * `TakeOrderedAndProject` — a k-row heap per partition and a k-row merge
   * at the driver. No global sort, no shuffle, no state; the weight column
   * is the only extra column read.
   */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k >= 0, "k must be non-negative")
    val u = graft.functions.GraftFunctions.md5_prefix60(
      col(idCol).cast("string")) + lit(1L)
    val priority = col(weightCol).cast("double") / u.cast("double")
    df.orderBy(priority.desc, col(idCol)).limit(k)
  }

  /**
   * Coverage-guaranteed train/eval split: every cell (language, domain,
   * quality band…) contributes AT LEAST `minTest` rows to the test side —
   * its min-wise members ([[minWiseSample]] order, forced to test) — and
   * the remainder splits by the plain id-hash rule. A pure hash split
   * starves small cells (a 50-row language at 10% test expects 5 eval
   * docs and sometimes draws 0 — an eval set that silently can't measure
   * that language); the forced min-wise prefix makes per-cell eval
   * coverage a GUARANTEE while staying a pure function of the id set.
   *
   * Cells smaller than `minTest` go entirely to test (coverage saturates
   * at the cell size). Scale shape: one rank window per cell moving
   * (id, cell) only, then a scan-level hash filter — the
   * [[capPerGroup]] cost.
   */
  def coverageSplit(df: DataFrame, idCol: String, cellCol: String,
      minTest: Int, trainPermille: Int): DataFrame = {
    require(minTest >= 0, "minTest must be non-negative")
    require(trainPermille >= 0 && trainPermille <= 1000,
      "trainPermille must be in [0, 1000]")
    require(!df.columns.contains("__graft_rk"),
      "coverageSplit uses a '__graft_rk' working column — rename the input's")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(cellCol))
      .orderBy(graft.functions.GraftFunctions.md5_prefix60(
        col(idCol).cast("string")), col(idCol))
    df.withColumn("__graft_rk", row_number().over(w))
      .withColumn("split",
        when(col("__graft_rk") <= minTest, "test")
          .when(hashBucket(col(idCol), 1000) < trainPermille, "train")
          .otherwise("test"))
      .drop("__graft_rk")
  }

  def quantileBand(df: DataFrame, groupCol: String, orderCol: String,
      idCol: String, loPermille: Int, hiPermille: Int): DataFrame = {
    require(0 <= loPermille && loPermille <= hiPermille && hiPermille <= 1000,
      "need 0 <= lo <= hi <= 1000 (per-mille)")
    val byGroup = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
    val w = byGroup.orderBy(col(orderCol), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(byGroup))
      .where(col("__rk") > expr(s"(__n * $loPermille) div 1000") &&
        col("__rk") <= expr(s"(__n * $hiPermille) div 1000"))
      .drop("__rk", "__n")
  }

  /**
   * Deterministic systematic resampling WITH replacement — the
   * importance-resampling step (draw `n` training slots ∝ integer weights:
   * DSIR-style importance sampling, particle-filter resampling, mixture
   * re-balancing), in its replayable low-variance form: rows are laid on the
   * cumulative-weight line in md5-hash order ([[graft.ops.Layout.globalScan]]
   * — no single-partition window), and `n` equally-spaced markers
   * `m_j = ⌊j·W/n⌋` (j = 0..n−1) are dropped on it; a row's copy count is
   * the number of markers inside its weight interval:
   *
   *   copies(i) = ⌈cum_i·n/W⌉ − ⌈cum_{i−1}·n/W⌉
   *
   * — pure integer ceil-divs, Σ copies = n EXACTLY, and every row's count is
   * within 1 of its real-valued expectation w_i·n/W (the classic systematic-
   * resampling guarantee — no multinomial variance, no RNG). Rows with
   * non-positive weight never sample. Returns (id, weight, copies ≥ 1).
   * Caller must keep `W·n < 2⁶³` (downscale weights first if needed).
   *
   * Scale shape: one globalScan range shuffle of (id, weight) pairs; the
   * marker arithmetic is per-row; the total-weight scalar broadcasts back.
   */
  /**
   * Quantile (rank) normalization of a score WITHIN each group — the score
   * equating every cross-source mixing step needs: a quality scorer drifts
   * in scale between sources (different languages, lengths, crawl eras),
   * so raw thresholds over-select whole sources; replacing the score by its
   * within-source rank permille `⌊1000·rank / n_group⌋` makes "top 20 % of
   * EACH source" one global predicate. rank is `row_number` over
   * (score asc, id) inside the group — deterministic, all integer.
   * Returns the input ids with (group, score, permille ∈ [0, 1000]).
   *
   * Scale shape: one window pass per group partition moving only
   * (id, group, score) — the natural partitioning; no global sort.
   */
  def quantileNormalize(df: DataFrame, groupCol: String, scoreCol: String,
      idCol: String): DataFrame = {
    val base = df.select(col(idCol), col(groupCol).as("group"),
      col(scoreCol).cast("long").as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("group")).orderBy(col("score"), col(idCol))
    val n = org.apache.spark.sql.expressions.Window.partitionBy(col("group"))
    base.withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(n))
      .select(col(idCol), col("group"), col("score"),
        expr("(1000 * __rk) div __n").as("permille"))
  }

  /**
   * Water-filling budget allocation — split a total token budget across
   * groups (sources, languages, domains) giving every group an EQUAL share
   * except where a group's whole supply is smaller (those are fully taken
   * and the surplus re-spreads): the unique max-min-fair allocation, the
   * standard answer to "how many tokens from each source" under a corpus
   * budget. Closed form on the supply-ascending order: with supplies
   * a₁ ≤ … ≤ aₙ and prefix sums c, group j is FULLY FUNDED iff
   * `c_j + a_j·(n−j) ≤ B`; past the largest such j*, the remaining
   * `R = B − c_j*` splits as `R div m` over the `m = n − j*` capped groups,
   * the `R mod m` leftover units going one each to the smallest-supply
   * capped groups (supply, then group-name order — deterministic). Pure
   * integer arithmetic; Σ allocated = min(B, Σ supply) EXACTLY, and no
   * group is ever allocated past its supply (maximality of j* guarantees
   * the share stays below the smallest capped supply). Returns
   * (group, supply, allocated, fully_funded).
   *
   * Scale shape: one count(*)-cost supply rollup; the ordering is a
   * [[graft.ops.Layout.globalScan]] over the GROUP table (group-cardinality
   * rows, not corpus rows); the two scalar thresholds broadcast back.
   */
  def waterFill(df: DataFrame, groupCol: String, valueCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val supply = df.groupBy(col(groupCol).cast("string").as("group"))
      .agg(sum(col(valueCol)).cast("long").as("supply"))
      .where(col("supply") > 0)
    val scanned = graft.ops.Layout.globalScan(supply,
      Seq(col("supply"), col("group")), "supply", "__rn", "__cum")
    graft.Eager.withPersisted(scanned) { p =>
      val n = p.count()
      if (n == 0) return graft.Eager.materialize(
        p.select(col("group"), col("supply"),
          lit(0L).as("allocated"), lit(true).as("fully_funded")).limit(0))
      val funded = p.where(
        col("__cum") + col("supply") * (lit(n) - col("__rn")) <= budget)
      val cutoff = funded.agg(
          coalesce(max(col("__rn")), lit(0L)).as("__jstar"),
          coalesce(max(col("__cum")), lit(0L)).as("__cstar"))
      p.crossJoin(broadcast(cutoff))
        .select(col("group"), col("supply"), col("__rn"),
          col("__jstar"),
          (lit(budget) - col("__cstar")).as("__r"),
          (lit(n) - col("__jstar")).as("__m"))
        .select(col("group"), col("supply"),
          when(col("__rn") <= col("__jstar"), col("supply"))
            .otherwise(expr("__r div __m") +
              when(col("__rn") <= col("__jstar") + expr("__r % __m"), 1L)
                .otherwise(0L)).as("allocated"),
          (col("__rn") <= col("__jstar")).as("fully_funded"))
    }
  }

  def systematicResample(df: DataFrame, idCol: String, weightCol: String,
      n: Long): DataFrame = {
    require(n > 0, "sample size must be positive")
    val base = df.select(col(idCol), col(weightCol).cast("long").as("__w"),
        graft.functions.GraftFunctions.md5_prefix60(
          col(idCol).cast("string")).as("__h"))
      .where(col("__w") > 0)
    val scanned = graft.ops.Layout.globalScan(base,
      Seq(col("__h"), col(idCol)), "__w", "__rn", "__cum")
    val total = scanned.agg(max(col("__cum")).as("__t"))
    scanned.crossJoin(broadcast(total))
      .select(col(idCol), col("__w").as("weight"),
        expr(s"((__cum * $n + __t - 1) div __t) - " +
          s"(((__cum - __w) * $n + __t - 1) div __t)").as("copies"))
      .where(col("copies") >= 1)
  }

  /**
   * Rendezvous (highest-random-weight) shard assignment: a row's shard
   * under an `n`-shard layout is `argmax over s∈[0,n) of
   * md5(id ++ ":" ++ s)` — Thaler–Ravishankar HRW, the assignment scheme
   * whose defining property is MINIMAL MOVEMENT under resharding: growing
   * from n to m > n shards moves exactly the rows whose argmax lands in a
   * new shard (expected (m−n)/m of them), where a `hash(id) mod n` layout
   * reshuffles almost everything. Ties broken by the smaller shard id
   * (md5 ties across two (id, shard) strings are a 2^-60 event, but the
   * rule keeps the operator total). Deterministic, engine-portable md5 —
   * the exact assignment replays anywhere.
   *
   * Returns every row as (id, shard_old, shard_new, moved) for the
   * `nOld` → `nNew` transition — the resharding COST PLAN: `sum(moved)`
   * is the bytes that must travel, per-shard counts are the post-move
   * balance, and the audit that the old assignment stays put for unmoved
   * rows is the correctness certificate for an incremental migration.
   *
   * Scale shape: one scan, no shuffle, no join — each row evaluates
   * max(nNew) md5s inline (the candidate structs fold in ONE greatest()
   * over codegen'd md5 expressions). At a million rows per partition and
   * n ≤ 64 shards that is the same order of work as one tokenize.
   */
  def rendezvousShards(df: DataFrame, idCol: String, nOld: Int,
      nNew: Int): DataFrame = {
    require(nOld > 0 && nNew > 0, "shard counts must be positive")
    def shardOf(n: Int): Column = {
      // argmax via one greatest() over (weight, -shard) pairs packed as
      // structs: struct comparison is lexicographic, so the max struct is
      // the max weight with the SMALLEST shard winning ties
      val cands = (0 until n).map { s =>
        struct(
          graft.functions.GraftFunctions.md5_prefix60(
            concat(col(idCol).cast("string"), lit(":"), lit(s.toString)))
            .as("w"),
          lit(-s).as("ns"))
      }
      val top = if (cands.size == 1) cands.head else greatest(cands: _*)
      (top.getField("ns") * -1).cast("int")
    }
    df.select(col(idCol),
        shardOf(nOld).as("shard_old"), shardOf(nNew).as("shard_new"))
      .withColumn("moved", col("shard_old") =!= col("shard_new"))
  }

  /**
   * Stratified k-fold assignment — cross-validation folds that are
   * EXACTLY balanced within every stratum (each stratum's rows spread
   * `⌈n/k⌉/⌊n/k⌋` across folds), not just in expectation the way a bare
   * md5-mod split is: rows rank within their stratum by (md5(id), id) —
   * a deterministic shuffle — and `fold = (rank − 1) mod k`. The
   * assignment is a pure function of (id, stratum, k): folds are stable
   * across runs, engines, partitionings, and unrelated corpus edits
   * within other strata. Returns (id, stratum, fold).
   *
   * Scale shape: one rank window per stratum partition (the
   * quantileNormalize discipline — no global sort); only
   * (id, stratum, 60-bit hash) moves.
   */
  def stratifiedFolds(df: DataFrame, idCol: String, stratumCol: String,
      k: Int): DataFrame = {
    require(k >= 2, "k must be at least 2")
    import org.apache.spark.sql.expressions.Window
    val h = graft.functions.GraftFunctions.md5_prefix60(
      col(idCol).cast("string"))
    val w = Window.partitionBy(col("stratum")).orderBy(col("__h"), col(idCol))
    df.select(col(idCol), col(stratumCol).as("stratum"), h.as("__h"))
      .withColumn("fold",
        pmod(row_number().over(w).cast("long") - 1, lit(k.toLong)))
      .select(col(idCol), col("stratum"), col("fold"))
  }

  /**
   * Size-balanced shard assignment — longest-processing-time-flavored
   * round-robin: rows sort by weight DESCENDING (ties by id — a total
   * order via [[graft.ops.Layout.globalRank]]'s two-pass range shuffle,
   * never a single-partition window) and the rank assigns
   * `shard = (rank − 1) mod k` — heavy rows spread first, so every shard's
   * load lands within one max-weight of the average (the classic
   * round-robin-on-sorted bound). Deterministic, join-free, and the
   * assignment replays in SQL. Returns the per-shard plan:
   * (shard, n_rows, load, max_row_weight) — the table a 100 TB
   * repartition job is sized from; the row-level assignment is the same
   * frame before the rollup if a writer needs it.
   */
  def balancedShards(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k > 0, "shard count must be positive")
    val base = df.select(col(idCol), col(weightCol).cast("long").as("__w"))
      .where(col(weightCol).isNotNull)
    graft.ops.Layout.globalRank(base,
        Seq(col("__w").desc, col(idCol)), "__rn")
      .select(col(idCol), col("__w"),
        pmod(col("__rn") - 1, lit(k.toLong)).as("shard"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"), sum(col("__w")).as("load"),
        max(col("__w")).as("max_row_weight"))
  }

  /**
   * Nearest-control matching (with replacement) on one integer covariate —
   * the observational-comparison primitive ("compare each treated doc to
   * its most similar untreated doc") behind corpus A/B attribution and
   * bias-corrected eval splits: within each group, every treated row pairs
   * with the control row minimizing `|value − control.value|`. In one
   * dimension the nearest control is always ADJACENT in the (value, id)
   * sort order, so matching is two ignore-null window passes — the
   * closest control at-or-before and the closest strictly-after — and a
   * deterministic pick: smaller absolute difference wins, exact ties go to
   * the earlier (at-or-before) candidate. Controls may match repeatedly
   * (with-replacement matching is order-free — a sequential
   * without-replacement greedy depends on processing order and cannot
   * replay). Treated rows in a group with NO control report a null match.
   * Returns treated rows: (id, group, value, match_id, match_value,
   * abs_diff).
   *
   * Scale shape — ROUTED by stratum cardinality, because the two correct
   * plans have opposite failure modes. With many strata, a per-group
   * window sort (one hash shuffle, sort bounded by the largest group) is
   * the cheap plan; with FEW strata that same plan serializes a giant
   * stratum into one task (measured 7× at a 10× scale-up over 20 groups).
   * So: when the distinct-group count is below the shuffle-partition
   * count (probed with a capped distinct — `global = None`), matching
   * runs instead on [[graft.ops.Layout.globalRunningLast]]'s two-pass
   * boundary-stitched carry over the (group, value, id) RANGE order —
   * partition-width parallelism regardless of group sizes, with a
   * cross-group carry invalidated by a group-equality check. Identical
   * results either way (the spec asserts it row-for-row). The probe is an
   * EXTRA capped-distinct pass over the (group) projection executed
   * eagerly — but its verdict is CACHED per (canonicalized input plan,
   * partition cap), so a report loop re-invoking this on the same frame
   * pays it once per session (spec-asserted); pin `global =
   * Some(true/false)` to skip even the first probe when group cardinality
   * is known. Only (id, group, value, flag) ever moves in either plan.
   */
  def matchedControls(df: DataFrame, idCol: String, groupCol: String,
      valueCol: String, treatedCol: String,
      global: Option[Boolean] = None): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(groupCol).as("group"),
        col(valueCol).cast("long").as("value"),
        col(treatedCol).cast("boolean").as("treated"))
      .where(col(valueCol).isNotNull && col(treatedCol).isNotNull)
    val useGlobal = global.getOrElse {
      // capped probe: "are there fewer groups than shuffle partitions?" —
      // the limit bounds the distinct work; the answer picks the plan
      val cap = df.sparkSession.sessionState.conf.numShufflePartitions
      val key = (base.queryExecution.logical.canonicalized.hashCode(), cap)
      Option(routeCache.get(key)).map(_.booleanValue()).getOrElse {
        routeProbeRuns.incrementAndGet()
        val verdict =
          base.select(col("group")).distinct().limit(cap + 1).count() <= cap
        routeCache.put(key, java.lang.Boolean.valueOf(verdict))
        verdict
      }
    }
    if (useGlobal) matchedControlsRanged(base)
    else matchedControlsWindowed(base)
  }

  /** Session-lifetime routing-verdict cache for [[matchedControls]], keyed
    * on (canonicalized logical plan hash, shuffle-partition cap): the probe
    * answers "how many strata does THIS frame have", which is a property of
    * the plan, not the call site. Canonicalization strips cosmetic ids, so
    * re-built identical frames hit too. Access-ordered, capped at 256
    * entries — a hash collision can only mis-route the PLAN choice, never
    * change results (both plans are row-identical by the spec). */
  private val routeCache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[(Int, Int), java.lang.Boolean](64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(Int, Int), java.lang.Boolean]): Boolean =
          size() > 256
      })

  /** Probe executions (not cache hits) — spec observability. */
  private[graft] val routeProbeRuns = new java.util.concurrent.atomic.AtomicLong(0)

  /** The many-strata plan: per-group window sort (see [[matchedControls]]). */
  private def matchedControlsWindowed(base: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy(col("group")).orderBy(col("value"), col("id"))
    val ctrl = when(!col("treated"), struct(col("value"), col("id")))
    val withNbr = base
      .withColumn("__prev", last(ctrl, ignoreNulls = true)
        .over(ord.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__next", first(ctrl, ignoreNulls = true)
        .over(ord.rowsBetween(1, Window.unboundedFollowing)))
      .where(col("treated"))
    // a control at the SAME value sorts before or after by id alone; both
    // windows exclude the current row, so self-match is impossible (treated
    // rows are never candidates anyway)
    val pickPrev = col("__next").isNull ||
      (col("__prev").isNotNull &&
        (col("value") - col("__prev.value")) <=
          (col("__next.value") - col("value")))
    withNbr.select(col("id"), col("group"), col("value"),
      when(pickPrev, col("__prev.id")).otherwise(col("__next.id"))
        .as("match_id"),
      when(pickPrev, col("__prev.value")).otherwise(col("__next.value"))
        .as("match_value"),
      abs(col("value") -
        when(pickPrev, col("__prev.value")).otherwise(col("__next.value")))
        .as("abs_diff"))
  }

  /** The giant-stratum plan: [[graft.ops.Layout.globalRunningLast]] carries
    * over the (group, value, id) range order, so parallelism is the shuffle
    * width however large any one stratum is. The carried control struct
    * includes its group; a carry that crossed a group boundary fails the
    * null-safe group-equality check and reads as "no candidate on this
    * side" — exactly the per-group window's boundary behavior. */
  private def matchedControlsRanged(base: DataFrame): DataFrame = {
    val b = base.withColumn("__ctrl",
      when(!col("treated"), struct(col("group"), col("value"), col("id"))))
    val carried = graft.ops.Layout.globalRunningLast(
      graft.ops.Layout.globalRunningLast(b,
        Seq(col("group"), col("value"), col("id")), "__ctrl", "__prevr"),
      Seq(col("group").desc, col("value").desc, col("id").desc),
      "__ctrl", "__nextr")
    val prev = when(col("__prevr.group") <=> col("group"), col("__prevr"))
    val next = when(col("__nextr.group") <=> col("group"), col("__nextr"))
    val pickPrev = next.isNull ||
      (prev.isNotNull &&
        (col("value") - prev.getField("value")) <=
          (next.getField("value") - col("value")))
    carried.where(col("treated"))
      .select(col("id"), col("group"), col("value"),
        when(pickPrev, prev.getField("id")).otherwise(next.getField("id"))
          .as("match_id"),
        when(pickPrev, prev.getField("value"))
          .otherwise(next.getField("value")).as("match_value"),
        abs(col("value") -
          when(pickPrev, prev.getField("value"))
            .otherwise(next.getField("value"))).as("abs_diff"))
  }

  /**
   * [[matchedControls]] for the GIANT-STRATUM regime — identical matching
   * semantics over ONE population (no group column: map this over strata
   * when each is huge), built on [[graft.ops.Layout.globalRunningLast]]'s
   * two-pass carry instead of per-group windows, so the sort spreads over
   * the full shuffle width however large the population. Two range
   * shuffles (ascending pass threads the at-or-before control, descending
   * pass the strictly-after control), then the same
   * smaller-diff/tie-to-earlier pick. Returns treated rows:
   * (id, value, match_id, match_value, abs_diff).
   */
  def matchedControlsGlobal(df: DataFrame, idCol: String, valueCol: String,
      treatedCol: String, numPartitions: Int = 0): DataFrame = {
    val base = df.select(col(idCol).as("id"),
        col(valueCol).cast("long").as("value"),
        col(treatedCol).cast("boolean").as("treated"))
      .where(col(valueCol).isNotNull && col(treatedCol).isNotNull)
      .withColumn("__ctrl",
        when(!col("treated"), struct(col("value"), col("id"))))
    val withPrev = graft.ops.Layout.globalRunningLast(base,
      Seq(col("value"), col("id")), "__ctrl", "__prev", numPartitions)
    val withNext = graft.ops.Layout.globalRunningLast(withPrev,
      Seq(col("value").desc, col("id").desc), "__ctrl", "__next",
      numPartitions)
    val pickPrev = col("__next").isNull ||
      (col("__prev").isNotNull &&
        (col("value") - col("__prev.value")) <=
          (col("__next.value") - col("value")))
    withNext.where(col("treated"))
      .select(col("id"), col("value"),
        when(pickPrev, col("__prev.id")).otherwise(col("__next.id"))
          .as("match_id"),
        when(pickPrev, col("__prev.value")).otherwise(col("__next.value"))
          .as("match_value"),
        abs(col("value") -
          when(pickPrev, col("__prev.value")).otherwise(col("__next.value")))
          .as("abs_diff"))
  }

  /**
   * Two-criteria Pareto skyline — the non-dominated frontier of rows
   * maximizing BOTH integer criteria (Börzsönyi et al. 2001's operator,
   * reduced to its scalable 2-D sort form): row a dominates row b iff
   * `a.x ≥ b.x ∧ a.y ≥ b.y` with at least one strict; the skyline is every
   * undominated row (coincident points all survive — neither dominates).
   * The curation use: "no doc on the frontier of (quality, length) may be
   * dropped" / "everything off the frontier has a strictly better
   * stand-in". Returns every input row plus a `skyline` boolean — the
   * decision column composes with downstream filters either way.
   *
   * Scale shape: dominance in 2-D collapses to per-x maxima — a row
   * survives iff its y equals its x-group's max AND strictly exceeds every
   * larger-x group's max. One map-side-combined groupBy to the x GRID, one
   * running-max window over the distinct-x table (grid-sized, not
   * row-sized — integer criteria live on bounded grids), one broadcast
   * join back. No self-join: the O(n²) dominance test never materializes.
   */
  def paretoSkyline(df: DataFrame, idCol: String, xCol: String,
      yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol), col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
    val perX = base.groupBy(col("x")).agg(max(col("y")).as("__my"))
    // exclusive running max over strictly-larger x (desc order, 1-row lag)
    val sufMax = perX.withColumn("__sfx",
      max(col("__my")).over(Window.orderBy(col("x").desc)
        .rowsBetween(Window.unboundedPreceding, -1)))
    base.join(broadcast(sufMax), Seq("x"))
      .select(col(idCol), col("x"), col("y"),
        (col("y") === col("__my") &&
          (col("__sfx").isNull || col("y") > col("__sfx"))).as("skyline"))
  }
}
