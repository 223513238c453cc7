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
}
