package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/**
 * Event-sequence analytics over the events stream table — the product-/
 * pipeline-telemetry queries (conversion funnels, retention cohorts) that
 * run next to every corpus dashboard.
 *
 * Both operators reduce the event volume to per-user scalars at the first
 * aggregation — event text/payload never travels further than the scan —
 * so the expensive stages work on (users × small) tables however large the
 * event log is.
 */
object EventOps {

  /**
   * Ordered conversion funnel: per user, step k counts only if an event of
   * `steps(k)` occurred STRICTLY AFTER that user's step-(k−1) time (first
   * qualifying occurrence, so each user contributes once per step). Returns
   * one row per step: (step [1-based], step_name, n_users).
   *
   * Shape: ONE declarative plan — step k is a `groupBy(user)` aggregate
   * joined on step k−1's per-user time, all over the reduced
   * (user, type, ts) projection; the k per-step counts union into one
   * result, so the whole funnel is a single job. Each step branch re-reads
   * the projection (filters push to the scan); at 100 TB, stage the
   * projection once (`Sources.stageWrite`) and feed every branch from it.
   */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val ev = events.select(col(userCol).as("u"), col(typeCol).as("t"),
      col(tsCol).as("ts"))
    val reached = steps.tail.scanLeft(
      ev.where(col("t") === steps.head)
        .groupBy(col("u")).agg(min(col("ts")).as("st"))) { (prev, s) =>
      ev.where(col("t") === s)
        .join(prev.select(col("u"), col("st").as("prev")), Seq("u"))
        .where(col("ts") > col("prev"))
        .groupBy(col("u")).agg(min(col("ts")).as("st"))
    }
    reached.zip(steps).zipWithIndex.map { case ((r, name), i) =>
      r.agg(coalesce(count(lit(1)), lit(0L)).as("n_users"))
        .select(lit(i + 1L).as("step"), lit(name).as("step_name"),
          col("n_users"))
    }.reduce(_.unionAll(_))
  }

  /**
   * Conversion-window funnel — [[funnel]] with the industry-standard time
   * bound: step k counts only if an event of `steps(k)` occurred strictly
   * after the user's step-(k−1) time AND within `windowSeconds` of their
   * STEP-1 time (the whole journey must fit the window, the usual "7-day
   * conversion" rule — a per-transition bound would let a funnel stretch
   * unboundedly). First qualifying occurrence per step, so each user
   * counts once. Returns (step [1-based], step_name, n_users).
   *
   * Shape: [[funnel]]'s single declarative plan; the anchor time rides
   * each per-user row, so the bound is one extra codegen'd comparison —
   * no new shuffle.
   */
  def funnelWithin(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], windowSeconds: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(windowSeconds > 0, "windowSeconds must be positive")
    val ev = events.select(col(userCol).as("u"), col(typeCol).as("t"),
      unix_micros(col(tsCol)).as("ts"))
    val first = ev.where(col("t") === steps.head)
      .groupBy(col("u")).agg(min(col("ts")).as("st"))
      .withColumn("anchor", col("st"))
    val reached = steps.tail.scanLeft(first) { (prev, s) =>
      ev.where(col("t") === s)
        .join(prev.select(col("u"), col("st").as("prev"), col("anchor")),
          Seq("u"))
        .where(col("ts") > col("prev") &&
          col("ts") <= col("anchor") + lit(windowSeconds * 1000000L))
        .groupBy(col("u"))
        .agg(min(col("ts")).as("st"), min(col("anchor")).as("anchor"))
    }
    reached.zip(steps).zipWithIndex.map { case ((r, name), i) =>
      r.agg(coalesce(count(lit(1)), lit(0L)).as("n_users"))
        .select(lit(i + 1L).as("step"), lit(name).as("step_name"),
          col("n_users"))
    }.reduce(_.unionAll(_))
  }

  /**
   * Retention cohort grid: users cohorted by their FIRST active day; for
   * every (cohort_day, day_offset) cell, how many of that cohort were
   * active `day_offset` days later. `n_users` at offset 0 is the cohort
   * size, so row-normalizing gives the classic retention matrix.
   *
   * Shape: events reduce to DISTINCT (user, day) pairs at the first
   * aggregate (the only event-volume pass); cohort assignment is a min
   * over those pairs; the grid is one groupBy over (user, day)-sized data.
   * Returns (cohort_day date, day_offset, n_users).
   */
  def retentionCohorts(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val days = events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("d"))
      .distinct()
    val cohorts = days.groupBy(col("u")).agg(min(col("d")).as("c"))
    days.join(cohorts, Seq("u"))
      .groupBy(col("c").as("cohort_day"),
        datediff(col("d"), col("c")).cast("bigint").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /**
   * Frequent item pairs (market-basket association mining, the A-Priori
   * k=2 pass): count baskets containing each unordered item pair, keep
   * pairs above a support floor, and rank by basket count with LIFT in
   * nano-units — lift = P(a,b) / (P(a)·P(b)) = c_ab·N / (c_a·c_b),
   * quantized once per pair (`round(ratio·1e9)` — the q73/q138 contract)
   * so the report replays exactly.
   *
   * Scale shape: baskets reduce to DISTINCT (basket, item) pairs at the
   * scan; the pair build is a self-equi-join ON THE BASKET KEY — work is
   * Σ C(basket size, 2), bounded by the largest basket, never corpus² (cap
   * giant baskets upstream with [[graft.ops.Sampling.capPerGroup]]); item
   * counts are a map-side-combinable rollup joined back on item keys.
   */
  def frequentPairs(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Int, topK: Int): DataFrame = {
    require(minSupport >= 1, "minSupport must be >= 1")
    require(topK > 0, "topK must be positive")
    val bi = df.select(col(basketCol).as("b"), col(itemCol).as("it"))
      .distinct()
    val nBaskets = bi.agg(countDistinct(col("b")).as("nb"))
    val itemN = bi.groupBy(col("it")).agg(count(lit(1)).as("ci"))
    val a = bi.select(col("b"), col("it").as("item_a"))
    val b = bi.select(col("b"), col("it").as("item_b"))
    a.join(b, Seq("b"))
      .where(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_baskets"))
      .where(col("n_baskets") >= minSupport)
      .join(itemN.select(col("it").as("item_a"), col("ci").as("ca")),
        Seq("item_a"))
      .join(itemN.select(col("it").as("item_b"), col("ci").as("cb")),
        Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_baskets"),
        round(col("n_baskets").cast("double") * col("nb") /
          (col("ca").cast("double") * col("cb")) * 1e9, 0).cast("long")
          .as("lift_nano"))
      .orderBy(col("n_baskets").desc, col("item_a"), col("item_b"))
      .limit(topK)
  }

  /**
   * Daily-volume anomaly detection with EXACT integer arithmetic — the
   * ingest-monitoring gate (a collapsed crawl day or a duplicate-feed spike
   * shows up as a volume outlier). A day is anomalous when its count is
   * more than `sigmaK` standard deviations from the mean — but instead of
   * floats, the test cross-multiplies to integers:
   *
   *   |x − μ| > kσ   ⟺   (n·x − Σx)² > k² · (n·Σx² − (Σx)²)
   *
   * (multiply both sides by n²; σ² = (nΣx² − (Σx)²)/n²). Every quantity is
   * an exact 64-bit integer, so the flag — the thing a pipeline gates on —
   * can NEVER flip on cross-engine float drift, unlike a z-score compare.
   * `direction` is sign(n·x − Σx): +1 spike, −1 collapse, 0 exactly at
   * the mean. Overflow bound: safe while n·Σx² < 2⁶³/k² — days × (peak
   * daily count)² ⪅ 10¹⁷ at k=2, far beyond any daily event volume that
   * fits one table.
   *
   * Scale shape: one count(*)-cost rollup to days, one 3-long global agg
   * broadcast back, then a per-row integer test — no sort, no window.
   */
  def volumeAnomalies(events: DataFrame, tsCol: String,
      sigmaK: Int = 2): DataFrame = {
    require(sigmaK >= 1, "sigmaK must be >= 1")
    val days = events.groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("x"))
    val stats = days.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("x") * col("x")).as("sxx"))
    val dev = col("n") * col("x") - col("sx")
    days.crossJoin(broadcast(stats))
      .select(col("day"), col("x").as("n_events"),
        signum(dev).cast("int").as("direction"),
        (dev * dev >
          lit(sigmaK.toLong * sigmaK) *
            (col("n") * col("sxx") - col("sx") * col("sx")))
          .as("is_anomaly"))
  }

  /**
   * Rolling-window distinct counts via MERGEABLE relational HyperLogLog —
   * the "distinct users, trailing 7 days, for every day" dashboard query
   * that exact distinct cannot serve at scale (each day would re-scan a
   * week of raw events): the event log collapses ONCE to per-day register
   * tables (day × ≤4096 rows — the q37 sketch, md5-register/binary-rho,
   * every value integer), each day's registers fan to the `windowDays`
   * window-ends they cover, and a window's sketch is the register-wise
   * MAX of its days — the mergeability that makes sketches composable
   * where exact counts are not. Emitted per OBSERVED day: the trailing
   * estimate and the exact (non-distinct) event count of the window. The
   * estimate is the q37 arithmetic — integer harmonic sum, one IEEE
   * multiply/divide — plus the small-range linear-counting correction
   * (`m·ln(m/V)` when the raw estimate ≤ 2.5m, nano-rounded per the q73
   * ln-parity contract) the dashboard regime needs; both replay
   * bit-identically in SQL. Returns (day, approx_distinct, n_events).
   *
   * Scale shape: the only event-volume pass is the first groupBy to
   * (day, bucket); everything after works on day-grid × 4096 rows; the
   * fan-out is ×windowDays of THAT, never of the log.
   */
  def rollingDistinct(events: DataFrame, tsCol: String, idCol: String,
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "windowDays must be positive")
    val h = graft.functions.GraftFunctions.md5_prefix60(
      col(idCol).cast("string"))
    val rho = least(
      when(col("w") === 0L, lit(49))
        .otherwise(lit(49) - length(bin(col("w")))), lit(40))
    val daily = events
      .select(to_date(col(tsCol)).as("day"),
        pmod(h, lit(4096L)).as("bucket"), shiftrightunsigned(h, 12).as("w"))
      .select(col("day"), col("bucket"), rho.as("rho"))
      .groupBy(col("day"), col("bucket"))
      .agg(max(col("rho")).as("m"), count(lit(1)).as("cnt"))
    graft.Eager.withPersisted(daily) { d =>
      val fan = d.select(col("bucket"), col("m"), col("cnt"),
        explode(sequence(col("day"), date_add(col("day"), windowDays - 1)))
          .as("wend"))
      val observed = d.select(col("day").as("wend")).distinct()
      fan.join(observed, Seq("wend"))
        .groupBy(col("wend"), col("bucket"))
        .agg(max(col("m")).as("m"), sum(col("cnt")).as("cnt"))
        .groupBy(col("wend"))
        .agg(count(lit(1)).as("nb"),
          sum(expr("shiftleft(cast(1 as bigint), 40 - m)")).as("sp"),
          sum(col("cnt")).as("n_events"))
        .withColumn("__raw",
          floor(lit(graft.SparkEntry.Hll.C) /
            (col("sp") + (lit(4096L) - col("nb")) * lit(1L << 40))
              .cast("double")).cast("bigint"))
        // small-range (linear counting) correction — the raw HLL estimator
        // overshoots badly below ~2.5m; with V empty registers the MLE is
        // m·ln(m/V), nano-rounded per the q73 ln-parity contract so both
        // engines land on the same integer
        .select(col("wend").as("day"),
          when(col("nb") < 4096 && col("__raw") <= lit(10240L),
            expr("(4096 * cast(round(ln(4096.0d / (4096 - nb)) * 1e9) " +
              "as bigint)) div 1000000000"))
            .otherwise(col("__raw")).as("approx_distinct"),
          col("n_events"))
    }
  }

  /**
   * CUSUM changepoint alarms over daily per-type event volumes — the
   * drift detector [[volumeAnomalies]]' single-day sigma test can't be:
   * CUSUM accumulates SUSTAINED excess over the mean, so a 20% uplift
   * invisible day-by-day still alarms once enough days compound (Page
   * 1954). Integer-exact via the [[volumeAnomalies]] scaling trick: with
   * per-type day count n and total S, a day's scaled deviation is
   * `n·x_t − S` (mean-centered, ×n); the classic recursion
   * `C_t = max(0, C_{t−1} + dev_t)` equals `P_t − min_{j≤t} P_j` for the
   * running prefix sum P — a cumsum plus a running min, two window
   * passes, no recursion. Alarm when the accumulated excess exceeds
   * `meanDays` days of mean volume: `cusum > meanDays·S` (both sides in
   * the same ×n units). Returns one row per (event_type, day):
   * (event_type, day, n_events, cusum_scaled, alarm).
   *
   * The per-type day grid is DENSE: each type covers every day from its
   * first event to the corpus-wide last day, with zero-count days filled
   * in. A day with no events contributes the full negative deviation
   * `−S` — without this, a type that stops emitting would retain its
   * accumulated CUSUM forever and a sustained drop could never drain or
   * be seen (observed-rows-only CUSUM silently skips the gap days).
   * Extending to the GLOBAL max day (not the type's own) is what makes
   * "this type went quiet" visible at all.
   *
   * Scale shape: the event volume collapses to (type, day) counts at the
   * first map-side-combined aggregate; the dense grid is a per-type
   * sequence() explode over a span of days (hundreds of rows per type)
   * joined back to the counts; windows run per type over that grid, and
   * the per-type (n, S) rollup broadcast-joins back.
   */
  def cusumAlarms(events: DataFrame, tsCol: String, typeCol: String,
      meanDays: Int = 3): DataFrame = {
    require(meanDays >= 1, "meanDays must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val observed = events
      .groupBy(col(typeCol).as("event_type"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("x"))
    val span = observed.groupBy(col("event_type"))
      .agg(min(col("day")).as("d0"))
    val gmax = observed.agg(max(col("day")).as("d1"))
    val days = span.crossJoin(broadcast(gmax))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(observed, Seq("event_type", "day"), "left")
      .withColumn("x", coalesce(col("x"), lit(0L)))
    val stats = days.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    days.join(broadcast(stats), Seq("event_type"))
      .withColumn("__p", sum(col("n") * col("x") - col("s")).over(w))
      .withColumn("__m", min(least(col("__p"), lit(0L))).over(w))
      .select(col("event_type"), col("day"), col("x").as("n_events"),
        (col("__p") - col("__m")).as("cusum_scaled"),
        (col("__p") - col("__m") > lit(meanDays.toLong) * col("s"))
          .as("alarm"))
  }

  /**
   * Event-time lateness audit — the measurement a WATERMARK must be sized
   * from (too short silently drops late events; too long holds streaming
   * state): replay the log in ARRIVAL order (`arrivalCols` — ingestion
   * offset, file sequence, whatever defines "seen before"), track the
   * event-time high-water mark ([[graft.ops.Layout.globalRunningMax]] — no
   * single-partition window), and histogram each event's lateness
   * `high_water − ts` by integer log2 buckets (the q148 bit-length rule —
   * no float log2). Returns (bucket, n, lo_us, hi_us, cum_permille):
   * bucket 0 = on-time/monotone, bucket b ≥ 1 covers [2^(b−1), 2^b−1] μs;
   * read the watermark off the first row with cum_permille ≥ your target
   * (999 ⇒ "this delay keeps 99.9 % of events"). All integer arithmetic.
   *
   * Scale shape: one globalRunningMax range shuffle moving (arrival, ts)
   * pairs; the histogram is a ≤64-key map-side-combined rollup; the
   * cumulative permilles fold over that tiny table.
   */
  def latenessAudit(events: DataFrame, tsCol: String,
      arrivalCols: Seq[Column]): DataFrame = {
    val base = events
      .select(unix_micros(col(tsCol)).as("__ts") +: arrivalCols: _*)
      .where(col("__ts").isNotNull)
    val marked = graft.ops.Layout.globalRunningMax(base, arrivalCols,
      "__ts", "__hw")
    val buckets = marked
      .select((col("__hw") - col("__ts")).as("late"))
      .withColumn("bucket",
        when(col("late") === 0L, lit(0))
          .otherwise(length(bin(col("late")))).cast("int"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // ≤64 rows: the global window over the bucket table is driver-trivial
    buckets
      .withColumn("__cum", sum(col("n")).over(w))
      .crossJoin(broadcast(buckets.agg(sum(col("n")).as("__tot"))))
      .select(col("bucket"), col("n"),
        when(col("bucket") === 0, lit(0L))
          .otherwise(expr("shiftleft(cast(1 as bigint), bucket - 1)"))
          .as("lo_us"),
        when(col("bucket") === 0, lit(0L))
          .otherwise(expr("shiftleft(cast(1 as bigint), bucket) - 1"))
          .as("hi_us"),
        expr("(1000 * __cum) div __tot").as("cum_permille"))
  }

  /**
   * Behavioral-sequence export — the event-log → training-sequence stage of
   * a behavior-model pipeline: each user's events in strict (ts, tie) order
   * collapse to one bounded sequence, fingerprinted (md5 of the joined
   * type tokens) so any ordering or truncation drift anywhere in the corpus
   * breaks the hash. Sequences are truncated to `maxLen` events (the
   * context-window cut — `truncated` flags the loss); first/last timestamps
   * ride along for recency features.
   *
   * Determinism: the sort key is (ts, tieCol, type) — total per-user order
   * when tieCol is unique — and the fingerprint replays in SQL
   * (`md5(array_to_string(list(type ORDER BY ...)[1:maxLen], ' '))`).
   *
   * Scale shape: one groupBy(user); the collect_list is bounded by
   * events-per-user (the sequence SEMANTICS require materializing it —
   * this is the rare legitimate collect_list), and only (user, ts, tie,
   * type) columns shuffle. A pathological mega-user is the packDocuments
   * skew caveat: pre-cap with [[graft.ops.Sampling.capPerGroup]].
   */
  def userSequences(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, maxLen: Int): DataFrame = {
    require(maxLen > 0, "maxLen must be positive")
    events.select(col(userCol).as("user_id"), col(tsCol).as("ts"),
        col(tieCol).as("tie"), col(typeCol).as("etype"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        md5(concat_ws(" ",
          slice(transform(
            array_sort(collect_list(struct(col("ts"), col("tie"),
              col("etype")))),
            x => x.getField("etype")), 1, maxLen)).cast("binary"))
          .as("seq_md5"),
        min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      .withColumn("truncated", col("n_events") > maxLen)
  }

  /**
   * Top click-paths of length three — the "how do users actually move"
   * mining query over the same (ts, tie)-ordered timelines as
   * [[graft.ops.Graph.transitionEdges]], two `lead`s deep: every window of
   * three consecutive events in one user's timeline is a path; paths count
   * with multiplicity across users, and the top `topK` report with exact
   * counts, ties broken by the path itself — a total order, so the cut is
   * deterministic. Returns (p1, p2, p3, n).
   *
   * Scale shape: one window pass partitioned by user (two leads in the
   * same window — one sort), one map-side-combined count on the path key,
   * TakeOrderedAndProject for the top-k — never a global sort of the
   * path table.
   */
  def pathTrigrams(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, nodeCol: String, topK: Int = 20): DataFrame = {
    require(topK > 0, "topK must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user")).orderBy(col("ts"), col("tie"))
    events.select(col(userCol).as("user"), col(tsCol).as("ts"),
        col(tieCol).as("tie"), col(nodeCol).as("p1"))
      .withColumn("p2", lead(col("p1"), 1).over(w))
      .withColumn("p3", lead(col("p1"), 2).over(w))
      .where(col("p3").isNotNull)
      .groupBy(col("p1"), col("p2"), col("p3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("p1"), col("p2"), col("p3"))
      .limit(topK)
  }

  /**
   * First-/last-touch conversion attribution — the marketing-analytics
   * answer to "which touchpoint gets credit for this conversion": for each
   * conversion event (type == `conversionType`), credit its integer-cents
   * value to the FIRST and to the LAST non-conversion event type strictly
   * earlier in that user's (ts, tie)-ordered timeline; a conversion with no
   * preceding touch credits the sentinel "(none)" (direct conversion). Both
   * models report side by side — one row per (model, touch_type) with the
   * conversion count and exact attributed cents (integer sums: any
   * accumulation order, any engine).
   *
   * Scale shape: two window passes over timelines partitioned by user (the
   * natural event-log partitioning — bounded by the longest single
   * timeline, never global), then one map-side-combined groupBy on the tiny
   * (model, touch_type) key. Only (user, ts, tie, type, cents) ever moves.
   */
  def touchAttribution(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, centsCol: String,
      conversionType: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user")).orderBy(col("ts"), col("tie"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touched = events.select(col(userCol).as("user"), col(tsCol).as("ts"),
        col(tieCol).as("tie"), col(typeCol).as("etype"),
        col(centsCol).cast("long").as("cents"))
      .withColumn("__touch",
        when(col("etype") =!= lit(conversionType), col("etype")))
      .withColumn("first_touch", first(col("__touch"), ignoreNulls = true).over(w))
      .withColumn("last_touch", last(col("__touch"), ignoreNulls = true).over(w))
      .where(col("etype") === lit(conversionType))
    touched.select(lit("first").as("model"),
        coalesce(col("first_touch"), lit("(none)")).as("touch_type"),
        col("cents"))
      .unionByName(touched.select(lit("last").as("model"),
        coalesce(col("last_touch"), lit("(none)")).as("touch_type"),
        col("cents")))
      .groupBy(col("model"), col("touch_type"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col("cents")).as("attributed_cents"))
  }
}
