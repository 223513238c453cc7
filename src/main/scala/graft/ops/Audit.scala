package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative data-quality audit — the validation gate every ingest pipeline
 * runs before data reaches training (the Great-Expectations/Deequ role,
 * re-expressed as plain Catalyst aggregates): a rule list is checked in ONE
 * scan, referential integrity in one anti-join-shaped aggregate per
 * relationship.
 *
 * Unlike [[TextOps.filterFunnel]] (whose stages apply cumulatively — it
 * answers "how much survives my pipeline"), audit rules are INDEPENDENT:
 * each one is counted over all rows, because the report answers "which
 * invariants does this delivery violate and how often".
 */
object Audit {

  /**
   * Check `rules` (name → violation-is-false predicate, i.e. the predicate
   * states the INVARIANT) over every row in one scan: each rule's pass count
   * is a codegen'd boolean sum, partial-aggregated map-side — `rules.length`
   * longs shuffle, total cost one `count(*)` regardless of rule count. A
   * NULL predicate counts as a violation (an invariant that cannot be
   * decided is not satisfied — no three-valued reports).
   *
   * Returns one row per rule, in the given order: (rule [1-based], rule_name,
   * n_rows, n_violations).
   */
  def auditRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "auditRules needs at least one rule")
    val names = array(rules.map { case (n, _) => lit(n) }: _*)
    df.agg(count(lit(1)).as("n_rows"),
        array(rules.map { case (_, p) =>
          coalesce(sum(coalesce(p, lit(false)).cast("long")), lit(0L))
        }: _*).as("passed"))
      .select(col("n_rows"), posexplode(col("passed")).as(Seq("i", "n_passed")))
      .select((col("i") + 1).cast("bigint").as("rule"),
        element_at(names, (col("i") + 1).cast("int")).as("rule_name"),
        col("n_rows"),
        (col("n_rows") - col("n_passed")).as("n_violations"))
  }

  /**
   * Referential-integrity check: count child rows whose `childKey` has no
   * match in `parent.parentKey` (orphans). NULL child keys are reported
   * separately — they are not orphans (no reference was made) but usually
   * violate their own not-null rule.
   *
   * 100 TB shape: the parent side reduces to DISTINCT keys before the join
   * (key-width rows, map-side-combined); the join is then key-equi and
   * broadcastable whenever the parent key set fits — for a dimension table
   * it always does. The child is scanned once; only (key, flag) pairs reach
   * the aggregate. Returns one row: (n_child_rows, n_null_keys, n_orphans).
   */
  def auditForeignKey(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val keys = parent.select(col(parentKey).as("__pk")).distinct()
      .withColumn("__present", lit(1L))
    child.select(col(childKey).as("__ck"))
      .join(keys, col("__ck") === col("__pk"), "left")
      .agg(count(lit(1)).as("n_child_rows"),
        sum(when(col("__ck").isNull, 1L).otherwise(0L)).as("n_null_keys"),
        sum(when(col("__ck").isNotNull && col("__present").isNull, 1L)
          .otherwise(0L)).as("n_orphans"))
  }

  /**
   * k-anonymity audit — the privacy gate [[graft.ops.TextOps.redactPII]]'s
   * value-level redaction can't answer: does any COMBINATION of
   * quasi-identifier columns isolate fewer than `k` rows (re-identification
   * risk, Sweeney's model)? One groupBy over the quasi-identifier tuple,
   * then a 4-long rollup: group count, violating-group count (size < k),
   * rows at risk (members of violating groups), and the minimum group size
   * (the table's actual anonymity level). All exact integers.
   *
   * Scale shape: count(*) cost on the quasi-tuple (map-side combinable) —
   * the audit never touches non-quasi columns (column pruning).
   */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
      k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, "k must be >= 2 (k=1 is vacuous)")
    df.groupBy(quasiCols.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("n") < k, 1L).otherwise(0L)).as("n_violating_groups"),
        sum(when(col("n") < k, col("n")).otherwise(0L)).as("n_rows_at_risk"),
        min(col("n")).as("min_group_size"))
  }

  /**
   * Column profiling report (the ANALYZE/data-catalog stage): per listed
   * column, row count, null count, EXACT distinct count, and min/max — the
   * stats a warehouse catalog serves and an optimizer seeds from. Columns
   * must be integer-typed here (min/max surface as bigint, so the report is
   * one uniform, hash-checkable relation; string/decimal variants are a
   * projection away). One aggregate pass PER COLUMN over a pruned
   * single-column scan — at 100 TB run the columns you need, not the table;
   * the exact distinct is the deliberate choice (the approximate twin is
   * `approx_count_distinct`/[[graft.ops.TextOps.kmvSketchShards]]).
   */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    cols.map { c =>
      df.agg(count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("bigint").as("min_val"),
          max(col(c)).cast("bigint").as("max_val"))
        .select(lit(c).as("column"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }.reduce(_.unionByName(_))
  }

  /**
   * Join/shuffle-key skew diagnosis — the report you run BEFORE a 100 TB
   * join melts an executor: the topK heaviest key values with corpus
   * context and a per-key recommended SALT FACTOR (⌈key count / average
   * count⌉ — how many ways to split that key so its partitions shrink to
   * the average; 1 = no salting needed). All arithmetic is exact integer
   * (per-mille share and salt factor via integer ceil-div), so the report
   * replays byte-for-byte in SQL and across engines.
   *
   * Scale shape: one map-side-combinable count per key, one 2-long global
   * agg broadcast back, TakeOrderedAndProject for the topK — the
   * diagnosis costs count(*)-per-key, never the join it protects.
   * Follow-up is [[graft.jobs.GJob]]'s salted aggregation / AQE skew join.
   */
  def skewReport(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    require(topK > 0, "topK must be positive")
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n"))
    val stats = counts.agg(sum(col("n")).as("n_rows"),
      count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(stats))
      .orderBy(col("n").desc, col("key")).limit(topK)
      .select(col("key"), col("n"), col("n_rows"), col("n_keys"),
        expr("n * 1000 div n_rows").as("permille"),
        expr("(n * n_keys + n_rows - 1) div n_rows").as("salt_factor"))
  }

  /**
   * Precision-guaranteed threshold selection — the AUTO-TUNING twin of
   * [[reliabilityReport]]: instead of describing calibration, PICK the
   * operating point. Rows are laid out by score descending (ties → id — a
   * total order via [[graft.ops.Layout.globalScan]], no single-partition
   * window); for each precision target the DEEPEST cut whose running
   * precision `1e9·cum_positives/rank` still meets the target is reported:
   * (target_permille, cut_rank, threshold, kept, positives,
   * precision_nano). `threshold` is the score of the last admitted row —
   * "gate at score ≥ t and you keep `kept` rows at ≥ target precision,
   * measured on this labeled set". Targets nobody can meet produce no row
   * (an empty verdict IS the answer). All integer arithmetic.
   *
   * Note the deepest-cut rule: running precision is not monotone, so this
   * maximizes RECALL subject to the precision floor — the standard
   * operating-point choice for a corpus gate.
   *
   * Scale shape: one globalScan range shuffle of (score, flag, id); the
   * target fan-out is |targets|× a three-integer row; per-target verdicts
   * are max-aggregations joined back on the rank key.
   */
  def precisionThresholds(df: DataFrame, idCol: String, scoreCol: String,
      labelCol: String, targetsPermille: Seq[Int]): DataFrame = {
    require(targetsPermille.nonEmpty, "need at least one precision target")
    require(targetsPermille.forall(t => t > 0 && t <= 1000),
      "targets are permille values in (0, 1000]")
    // unlabeled (null) rows carry no evidence: exclude them BEFORE the scan
    // rather than hand globalScan a null weight (its getLong would NPE) or
    // silently count them as negatives in every precision denominator
    val base = df.select(col(idCol).as("__id"),
      col(scoreCol).cast("long").as("s"),
      col(labelCol).cast("boolean").cast("long").as("__p"))
      .where(col("s").isNotNull && col("__p").isNotNull)
    val scanned = graft.ops.Layout.globalScan(base,
        Seq(col("s").desc, col("__id")), "__p", "rank", "positives")
      .select(col("rank"), col("s"),
        col("positives"),
        expr("(1000000000 * positives) div rank").as("precision_nano"))
    graft.Eager.withPersisted(scanned) { p =>
      val fan = p.select(col("rank"), col("precision_nano"),
          explode(array(targetsPermille.distinct.sorted.map(lit(_)): _*))
            .as("target_permille"))
        .where(col("precision_nano") >=
          col("target_permille").cast("long") * lit(1000000L))
        .groupBy(col("target_permille")).agg(max(col("rank")).as("cut_rank"))
      fan.join(p, fan("cut_rank") === p("rank"))
        .select(col("target_permille"), col("cut_rank"),
          col("s").as("threshold"), col("cut_rank").as("kept"),
          col("positives"), col("precision_nano"))
    }
  }

  /**
   * Reliability (calibration) report over an integer score — the
   * reliability-diagram table that decides whether a learned score is
   * usable as a CONFIDENCE before it gates a corpus: clamp the score to
   * [lo, hi), cut the range into `bins` equal integer cells (everything
   * below `lo` lands in bucket 0, at/above `hi` in bucket bins−1 — the
   * clamp IS the edge-bucket semantics, not an error), and report each
   * occupied cell's population, positive count, and exact positive rate
   * `rate_nano = floor(1e9 · positives / n)`. A well-calibrated score shows
   * rate_nano rising monotonically across buckets; a cliff or plateau says
   * "threshold here" / "don't trust magnitudes". All arithmetic integer —
   * the report replays exactly. `(hi − lo)` must divide evenly by `bins`.
   * Returns (bucket, lo, hi, n, positives, rate_nano).
   *
   * Scale shape: one scan reducing each row to (bucket, isPositive); one
   * map-side-combinable groupBy on the ≤`bins`-value key — count(*) cost.
   */
  def reliabilityReport(df: DataFrame, scoreCol: String, labelCol: String,
      lo: Long, hi: Long, bins: Int): DataFrame = {
    require(bins > 0 && hi > lo, "need hi > lo and at least one bin")
    val width = (hi - lo) / bins
    require(width > 0 && lo + width * bins == hi,
      s"bins must divide the range evenly (range ${hi - lo}, bins $bins)")
    // (clamped − lo)/width on longs: both < 2^53, double division exact,
    // truncation ≡ floor on the non-negative difference
    val clamped = greatest(lit(lo), least(col(scoreCol), lit(hi - 1)))
    val bucket = ((clamped - lit(lo)) / lit(width)).cast("long")
    df.select(bucket.as("bucket"),
        col(labelCol).cast("boolean").cast("long").as("__pos"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("__pos")).as("positives"))
      .select(col("bucket"),
        (lit(lo) + col("bucket") * lit(width)).as("lo"),
        (lit(lo) + (col("bucket") + 1) * lit(width)).as("hi"),
        col("n"), col("positives"),
        expr("(1000000000 * positives) div n").as("rate_nano"))
  }

  /**
   * Driver-side conformal threshold from an explicit calibration frame —
   * the [[conformalGate]] quantile rule (`k = ⌈(n+1)(1000−α)/1000⌉`-th
   * smallest score) collected to a scalar, for gates that must apply it as
   * a LITERAL: a streaming admission filter ([[graft.streaming.Streaming
   * .conformalAdmitStream]]) cannot re-derive the quantile per micro-batch
   * without changing its guarantee. Returns (n_calib, Some(threshold)), or
   * None when k exceeds n — admit everything, the honest small-sample
   * answer. The collect is ONE row (grid aggregation runs distributed).
   */
  def conformalThreshold(calibration: DataFrame, scoreCol: String,
      alphaPermille: Int = 100): (Long, Option[Long]) = {
    require(alphaPermille > 0 && alphaPermille < 1000,
      "alphaPermille must be in (0, 1000)")
    import org.apache.spark.sql.expressions.Window
    val grid = calibration.where(col(scoreCol).isNotNull)
      .groupBy(col(scoreCol).cast("long").as("s"))
      .agg(count(lit(1)).as("c"))
    val cum = grid.withColumn("cumc",
      sum(col("c")).over(Window.orderBy(col("s"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val par = grid.agg(coalesce(sum(col("c")), lit(0L)).as("n"))
      .withColumn("k", expr(
        s"((n + 1) * ${1000 - alphaPermille} + 999) div 1000"))
    val row = par.crossJoin(
        cum.crossJoin(par).where(col("cumc") >= col("k"))
          .agg(min(col("s")).as("thr")))
      .select(col("n"), col("thr")).collect()(0)
    (row.getLong(0), if (row.isNullAt(1)) None else Some(row.getLong(1)))
  }

  /**
   * Split-conformal admission gate (Vovk et al.; Angelopoulos & Bates 2023
   * tutorial form): a distribution-free filter with a finite-sample
   * guarantee. A deterministic md5 split carves off `calibPct`% of rows as
   * the calibration set; the threshold is the k-th smallest calibration
   * NONCONFORMITY score with `k = ⌈(n+1)(1000−alphaPermille)/1000⌉`, and an
   * evaluation row is admitted iff its score ≤ threshold. Under
   * exchangeability the admitted fraction is ≥ 1−α in expectation — the
   * quantile is a provable coverage statement, not a tuned knob. `scoreCol`
   * must be LONG with higher = more anomalous. If k exceeds n (tiny
   * calibration set, or α too small for it) the threshold is NULL and
   * everything is admitted — the honest answer, not a silent clamp.
   * Returns every evaluation row as (id, score, n_calib, threshold,
   * admitted); all arithmetic integer.
   *
   * Scale shape: one scan splits calibration from evaluation with the
   * pushdown-friendly md5 bucket; the calibration quantile is a
   * map-side-combined groupBy on the score GRID (integer scores — permille
   * grids have ≤ thousands of distinct values; the running-count window
   * runs over that grid, not the rows) and the resulting single-row
   * (n, k, threshold) frame broadcasts back over the evaluation side.
   */
  def conformalGate(df: DataFrame, idCol: String, scoreCol: String,
      calibPct: Int = 50, alphaPermille: Int = 100): DataFrame = {
    require(calibPct > 0 && calibPct < 100, "calibPct must be in (0, 100)")
    require(alphaPermille > 0 && alphaPermille < 1000,
      "alphaPermille must be in (0, 1000)")
    import org.apache.spark.sql.expressions.Window
    val withB = df.where(col(scoreCol).isNotNull)
      .select(col(idCol), col(scoreCol).cast("long").as("score"))
      .withColumn("__b", Sampling.hashBucket(col(idCol), 100))
    val calScores = withB.where(col("__b") < calibPct)
      .groupBy(col("score").as("s")).agg(count(lit(1)).as("c"))
    val cum = calScores.withColumn("cumc",
      sum(col("c")).over(Window.orderBy(col("s"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val par = calScores.agg(coalesce(sum(col("c")), lit(0L)).as("n_calib"))
      .withColumn("k", expr(
        s"((n_calib + 1) * ${1000 - alphaPermille} + 999) div 1000"))
    val thr = cum.crossJoin(par).where(col("cumc") >= col("k"))
      .agg(min(col("s")).as("threshold"))
    withB.where(col("__b") >= calibPct)
      .crossJoin(broadcast(par.crossJoin(thr)))
      .select(col(idCol), col("score"), col("n_calib"), col("threshold"),
        (col("threshold").isNull || col("score") <= col("threshold"))
          .as("admitted"))
  }

  /**
   * Join-explosion preflight — the report you run BEFORE an equi-join, the
   * join-shaped twin of [[skewReport]]: per join-key value, both sides'
   * counts and the exact output-row product `n_left·n_right`; the topK
   * keys by product are the rows that will dominate (or melt) the join,
   * and `out_rows`/`total_out` is each one's exact share. The self-join
   * case (pair generation, sessionization joins) is where this matters
   * most — one hot user turns n rows into n². All integers; broadcastable
   * totals. Returns topK rows: (key, n_left, n_right, out_rows,
   * total_out, permille).
   *
   * Scale shape: one count-per-key pass per side (map-side combined), an
   * equi-join of the two count tables (key-width rows), a 1-row total
   * broadcast back, TakeOrderedAndProject for the topK — the preflight
   * costs two count(*)s, never the join it sizes.
   */
  def joinExplosionReport(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String, topK: Int = 10): DataFrame = {
    require(topK > 0, "topK must be positive")
    val lc = left.groupBy(col(leftKey).cast("string").as("key"))
      .agg(count(lit(1)).as("n_left"))
    val rc = right.groupBy(col(rightKey).cast("string").as("key"))
      .agg(count(lit(1)).as("n_right"))
    // products and their sum accumulate in decimal(38,0): a hot key of
    // ~96M×96M rows is out_rows ≈ 9.2e15, and 1000×that (the permille
    // numerator) — or the sum across keys — overflows Long and errors
    // under ANSI mode in exactly the pathological regime this preflight
    // exists to diagnose. Integer division happens in decimal; the output
    // columns stay bigint (the report's contract).
    val prod = lc.join(rc, Seq("key"))
      .withColumn("out_rows",
        col("n_left").cast("decimal(38,0)") * col("n_right"))
    graft.Eager.withPersisted(prod) { p =>
      val total = p.agg(
        coalesce(sum(col("out_rows")), lit(0).cast("decimal(38,0)"))
          .as("total_out"))
      // SATURATING cast back to the bigint contract: a value past
      // Long.MaxValue would otherwise null (non-ANSI) or throw (ANSI) for
      // exactly the dominant keys the preflight exists to surface. A
      // saturated 2^63−1 still ranks the key first and reads unambiguously
      // as "off the scale"; permille stays exact (computed in decimal).
      def sat(c: org.apache.spark.sql.Column) =
        least(c, lit(Long.MaxValue).cast("decimal(38,0)")).cast("long")
      p.crossJoin(broadcast(total))
        .orderBy(col("out_rows").desc, col("key")).limit(topK)
        .select(col("key"), col("n_left"), col("n_right"),
          sat(col("out_rows")).as("out_rows"),
          sat(col("total_out")).as("total_out"),
          expr("cast((1000 * out_rows) div total_out as long)")
            .as("permille"))
    }
  }

  /**
   * Exact per-group ROC-AUC via the Mann–Whitney U statistic — "does this
   * score actually rank good above bad", the one-number answer a quality /
   * contamination / LM score must clear before it gates a corpus. Ranks
   * use midrank tie handling DOUBLED to stay integer: a tie block of c
   * rows starting at 1-based rank r₀ contributes `p·(2r₀ + c − 1)` (p =
   * positives in the block) to `S2 = 2·Σ ranks⁺`; then
   * `U2 = S2 − n⁺(n⁺+1) = 2·U` and `auc_nano = 10⁹·U2 div (2·n⁺·n⁻)` —
   * every step integer, non-negative, engine-identical. Groups with no
   * positives or no negatives report a null AUC (undefined, not 0).
   * Returns (group, n_pos, n_neg, u2, auc_nano).
   *
   * Scale shape: one map-side-combined groupBy to the (group, score) GRID,
   * one running-count window over that grid per group (grid-sized, the
   * [[conformalGate]] discipline), one per-group rollup. Row count never
   * reaches a window.
   */
  def aucReport(df: DataFrame, groupCol: String, scoreCol: String,
      labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grid = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(groupCol).as("group"), col(scoreCol).cast("long").as("s"))
      .agg(count(lit(1)).as("c"),
        sum(col(labelCol).cast("boolean").cast("long")).as("p"))
    val w = Window.partitionBy(col("group")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    grid.withColumn("cumBefore", coalesce(sum(col("c")).over(w), lit(0L)))
      .groupBy(col("group"))
      .agg(sum(col("p")).as("n_pos"),
        (sum(col("c")) - sum(col("p"))).as("n_neg"),
        sum(col("p") * (lit(2L) * (col("cumBefore") + 1L) + col("c") - 1L))
          .as("s2"))
      .select(col("group"), col("n_pos"), col("n_neg"),
        (col("s2") - col("n_pos") * (col("n_pos") + 1L)).as("u2"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          expr("(1000000000 * (s2 - n_pos * (n_pos + 1))) div " +
            "(2 * n_pos * n_neg)")).as("auc_nano"))
  }

  /**
   * Robust per-group outlier gate via the median absolute deviation — the
   * cleaning rule that survives the outliers it hunts (a mean/σ gate moves
   * with every extreme value; the median and MAD do not, 50% breakdown
   * point). Per group: `median` = the ⌊(n+1)/2⌋-th smallest value (lower
   * median — a value FROM the data, deterministic, no float midpoint),
   * `mad` = the same median of |value − median|, and a row is an outlier
   * iff `|value − median| > k·mad`. All integer; ties in the rank order
   * break by id. A group where over half the values coincide has mad = 0 —
   * then ANY deviation flags, the strict-inequality contract. Returns
   * every row: (id, group, value, median, mad, outlier).
   *
   * Scale shape: two rank passes, each a window partitioned BY GROUP (the
   * event-log discipline — bounded by the largest group, range-partitioned
   * by the group key, never a global sort), plus two tiny per-group
   * median tables broadcast back.
   */
  def madOutliers(df: DataFrame, idCol: String, groupCol: String,
      valueCol: String, k: Int = 3): DataFrame = {
    require(k >= 1, "k must be at least 1")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol), col(groupCol).as("group"),
        col(valueCol).cast("long").as("value"))
      .where(col(valueCol).isNotNull)
    def medianOf(in: DataFrame, vCol: String): DataFrame = {
      val w = Window.partitionBy(col("group"))
        .orderBy(col(vCol), col(idCol))
      in.select(col("group"), col(vCol),
          row_number().over(w).as("__rn"),
          count(lit(1)).over(Window.partitionBy(col("group"))).as("__n"))
        .where(col("__rn") === expr("(__n + 1) div 2"))
        .select(col("group"), col(vCol).as("__med"))
    }
    val med = medianOf(base, "value")
    val withDev = base.join(med, Seq("group"))
      .withColumn("__dev", abs(col("value") - col("__med")))
    graft.Eager.withPersisted(withDev) { p =>
      val mad = medianOf(p.select(col("group"), col(idCol), col("__dev")),
        "__dev").select(col("group"), col("__med").as("__mad"))
      p.join(mad, Seq("group"))
        .select(col(idCol), col("group"), col("value"),
          col("__med").as("median"), col("__mad").as("mad"),
          (col("__dev") > lit(k.toLong) * col("__mad")).as("outlier"))
    }
  }

  /**
   * Order-independent corpus checksum per partition key — the
   * stage-boundary integrity certificate: after a copy, a migration, or a
   * re-shard, two checksum runs must agree cell-for-cell or rows were
   * lost, duplicated, or mutated in transit. Each row contributes one
   * md5-derived 60-bit digest of the concatenated `valueCols` (null
   * distinct from empty via a length prefix); per group the report is
   * (n_rows, xor_sig, sum_sig, min_sig, max_sig) — xor catches mutations
   * and even double-counts xor misses are caught by sum and n_rows, and
   * the min/max pair localizes WHICH digests diverge when two reports
   * disagree. All folds are commutative — the signature is a pure function
   * of the row multiset, never of partitioning or scan order.
   *
   * Scale shape: one codegen'd scan (md5 per row, no string round-trip via
   * the native md5_prefix60), one map-side-combined groupBy per group key.
   * The sum accumulates in decimal(38,0) and reports mod 2^60 — exact,
   * order-free, and immune to the ANSI long-overflow error a plain long
   * sum would hit past ~2^4 rows of near-max digests; collisions are the
   * md5 birthday bound.
   */
  def corpusChecksum(df: DataFrame, groupCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "corpusChecksum needs value columns")
    val packed = concat_ws("",
      valueCols.map(c => concat_ws("",
        length(coalesce(col(c).cast("string"), lit(""))).cast("string"),
        lit(":"), coalesce(col(c).cast("string"), lit(" ")))): _*)
    val sig = graft.functions.GraftFunctions.md5_prefix60(packed)
    df.select(col(groupCol).as("group"), sig.as("sig"))
      .groupBy(col("group"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(sig)").as("xor_sig"),
        (sum(col("sig").cast("decimal(38,0)")) % lit(1152921504606846976L))
          .cast("long").as("sum_sig"),
        min(col("sig")).as("min_sig"),
        max(col("sig")).as("max_sig"))
  }
}
