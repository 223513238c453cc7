package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Join patterns Spark's planner can't derive on its own. A raw inequality
 * join (`a.ts BETWEEN b.ts AND b.ts + w`) plans as BroadcastNestedLoopJoin —
 * O(n·m) and a non-starter at scale. These helpers re-express the common
 * range shapes as equi-joins (compose-builtins first, per the build plan).
 */
object Joins {

  /**
   * Point-in-window range join: pair each left row with the right rows of the
   * same key whose timestamp falls in (leftTs, leftTs + windowUs]. Strategy:
   * bin both sides by `windowUs`; a qualifying right row lands either in the
   * left row's bin or the next one, so the left side explodes exactly two bin
   * keys and the join is a hash equi-join on (key, bin) + exact residual
   * filter — O(n + m + matches) instead of O(n·m).
   *
   * Timestamps are epoch-microsecond longs (exact integer math; ns-epoch
   * values overflow doubles, so no `/`). Column sets must be disjoint apart
   * from `keyCol`. `joinType` "left_outer" keeps zero-match left rows.
   */
  def pointInWindow(left: DataFrame, right: DataFrame, keyCol: String,
      leftTsUs: String, rightTsUs: String, windowUs: Long,
      joinType: String = "left_outer"): DataFrame = {
    // explicit aliases: both sides often derive from the SAME base scan
    // (e.g. two filters of one events table), and unaliased l(key) === r(key)
    // relies on dataset-id disambiguation (logs a trivially-true-predicate
    // warning while it untangles the self-join)
    val l = left
      .withColumn("__bin0", expr(s"$leftTsUs div $windowUs"))
      .withColumn("__bin", explode(array(col("__bin0"), col("__bin0") + 1)))
      .drop("__bin0")
      .alias("__pw_l")
    val r = right.withColumn("__bin", expr(s"$rightTsUs div $windowUs"))
      .alias("__pw_r")
    val residual = col(rightTsUs) > col(leftTsUs) &&
      col(rightTsUs) <= col(leftTsUs) + windowUs
    // each qualifying right row matches via exactly one of the two exploded
    // bins, so no post-join dedup is needed
    l.join(r,
      col(s"__pw_l.$keyCol") === col(s"__pw_r.$keyCol") &&
        col("__pw_l.__bin") === col("__pw_r.__bin") && residual,
      joinType)
      .drop(col(s"__pw_r.$keyCol"))
      .drop(col("__pw_l.__bin")).drop(col("__pw_r.__bin"))
  }

  /**
   * Backward as-of join with a max-staleness tolerance — the feature-store
   * point-in-time join ("the latest feature value at or before each
   * observation, but never staler than `toleranceUs`"; a plain as-of would
   * happily serve a year-old feature). Strategy: the q32 union trick —
   * interleave both sides on the time axis, carry the latest right-side
   * (time, value) forward with one window pass — then null out matches
   * older than the tolerance. One shuffle on `keyCol`, no inequality join,
   * no per-row probe; right rows sort before left rows on time ties, so
   * the join is INCLUSIVE (observation at t matches a feature stamped t).
   *
   * `valueCols` are the right-side columns to carry; they surface nulled
   * when no match exists or the match is stale (`asof_age_us` keeps the
   * raw staleness for auditing; it is nulled in lockstep). Timestamps are
   * epoch-microsecond longs (exact integer math).
   */
  def asOfBackward(left: DataFrame, right: DataFrame, keyCol: String,
      leftTsUs: String, rightTsUs: String, valueCols: Seq[String],
      toleranceUs: Long): DataFrame = {
    require(toleranceUs >= 0, "tolerance must be non-negative")
    val leftCols = left.columns.toSeq
    val lTagged = left.select(
      (col(keyCol).as("__k") +: col(leftTsUs).as("__t") +:
        lit(1).as("__is_l") +:
        leftCols.map(c => col(c)) ++:
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++:
        Seq(lit(null).cast("long").as("__rt"))): _*)
    val rTagged = right.select(
      (col(keyCol).as("__k") +: col(rightTsUs).as("__t") +:
        lit(0).as("__is_l") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++:
        valueCols.map(c => col(c)) ++:
        Seq(col(rightTsUs).cast("long").as("__rt"))): _*)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__is_l"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val carried = lTagged.unionByName(rTagged)
      .withColumn("__last_rt", last(col("__rt"), ignoreNulls = true).over(w))
      .withColumns(valueCols.map(c =>
        c -> last(col(c), ignoreNulls = true).over(w)).toMap)
      .where(col("__is_l") === 1)
    val fresh = col("__last_rt").isNotNull &&
      (col(leftTsUs).cast("long") - col("__last_rt")) <= toleranceUs
    carried.select(
      (leftCols.map(c => col(c)) ++
        valueCols.map(c => when(fresh, col(c)).otherwise(lit(null)).as(c)) ++
        Seq(when(fresh, col(leftTsUs).cast("long") - col("__last_rt"))
          .otherwise(lit(null)).as("asof_age_us"))): _*)
  }

  /**
   * Blocked fuzzy entity matching (record linkage): find pairs of DISTINCT
   * name strings within an edit distance, with the candidate generation
   * bounded by a blocking key — the classic two-stage resolve (block →
   * verify) that avoids the O(n²) all-pairs a naive similarity join implies.
   *
   * The input is first collapsed to its NAME DICTIONARY (distinct values of
   * `nameCol` with entity counts) — on a 100 TB catalog the dictionary is
   * orders of magnitude smaller than the entity table (here: 2 000 parts →
   * 64 names), so the quadratic-looking verify step runs on vocabulary-sized
   * data, the same collapse [[graft.ops.TextOps.bpeMerges]] uses for words.
   * Candidates are generated by a self-equi-join on `blockKey` (shuffle on
   * the block key only — never a cross join); each candidate pair is verified
   * with `levenshtein` (codegen'd in Spark; identical unit-cost edit-distance
   * semantics in DuckDB, so the oracle replays the verify exactly).
   *
   * Returns one row per matched name pair (name_a < name_b lexicographically):
   * the names, the distance, each name's entity count, and the implied
   * entity-pair count n_a·n_b a downstream merge would reconcile.
   *
   * Blocking-key design is the caller's recall/cost dial: a first-token key
   * (the default-style choice for multi-word names) bounds block sizes but
   * misses pairs differing in their first token; production linkage runs
   * multiple passes with complementary keys (first-token, last-token,
   * length-band) and unions the candidates — each pass is this same
   * operator. A skewed block (every row one key) degrades toward all-pairs;
   * cap it upstream with [[graft.ops.Sampling.capPerGroup]] on the dictionary
   * if the key distribution is untrusted.
   */
  def fuzzyNamePairs(df: DataFrame, idCol: String, nameCol: String,
      blockKey: Column, maxDist: Int): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1 (0 is exact dedup — use Dedup)")
    val dict = df.groupBy(col(nameCol))
      .agg(count(lit(1)).as("n"))
      .select(col(nameCol).as("name"), col("n"), blockKey.as("__bk"))
    val a = dict.select(col("__bk"), col("name").as("name_a"), col("n").as("n_a"))
    val b = dict.select(col("__bk"), col("name").as("name_b"), col("n").as("n_b"))
    a.join(b, Seq("__bk"))
      .where(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .where(col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("dist").cast("int").as("dist"),
        col("n_a"), col("n_b"), (col("n_a") * col("n_b")).as("entity_pairs"))
  }
}
