package graft.query

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * Fluent keyed-table reader — the Spark-native analogue of the reference's
 * `Query2` / `Query2Builder` (reference:
 * src/main/scala/com/gravity/hbase/schema/Query2.scala:41-44, Query2Builder.scala:20-62).
 *
 * The reference builder *is* its physical plan (raw byte buffers + an HBase Filter
 * tree, SURVEY §3.1); here the builder is purely logical — it accumulates `Column`
 * predicates and projections on a DataFrame and lets Catalyst plan the scan, push
 * filters into Parquet and prune columns. Get/multi-get/scan collapse into the one
 * declarative form, which is the point: `withKey` on a key-sorted Parquet table
 * becomes a partition-pruned point lookup, not a special code path.
 *
 * Filter combination matches the reference: `filter(...)` clauses AND together,
 * `filterOr(...)` clauses OR together, and the two compose conjunctively
 * (Query2.scala:63-88).
 */
final case class GQuery(
    df: DataFrame,
    keyCol: String = "key",
    keys: Option[Seq[Any]] = None,
    startRow: Option[Any] = None,
    endRow: Option[Any] = None,
    preds: Seq[Column] = Nil,
    projections: Option[Seq[Column]] = None,
    limitN: Option[Int] = None) {

  /** S2: point get — `withKey(k)` (Query2.scala:330-333). */
  def withKey(k: Any): GQuery = copy(keys = Some(Seq(k)))

  /** S3: multi-get — `withKeys(set)` (Query2.scala:336-341). */
  def withKeys(ks: Seq[Any]): GQuery = copy(keys = Some(ks))

  /** P17: scan bounds — `withStartRow`/`withEndRow`, half-open (Query2.scala:361-369). */
  def withStartRow(k: Any): GQuery = copy(startRow = Some(k))
  def withEndRow(k: Any): GQuery = copy(endRow = Some(k))

  /** AND filter list (Query2.scala:63-72). */
  def filter(clauses: Column*): GQuery = copy(preds = preds ++ clauses)

  /** OR filter list (Query2.scala:74-80). */
  def filterOr(clauses: Column*): GQuery = copy(preds = preds :+ Clauses.or(clauses: _*))

  /** P16: cell-timestamp range on an explicit ts column (Query2.scala:345-359). */
  def betweenDates(tsCol: String, fromIncl: Any, toExcl: Any): GQuery =
    filter(Clauses.betweenDates(col(tsCol), fromIncl, toExcl))

  /** P1: projection — `withColumns`. Families subsume their columns: projecting a
    * family column returns the whole struct/map (Query2.scala:382-394, 500-509). */
  def withColumns(cols: Column*): GQuery =
    copy(projections = Some(projections.getOrElse(Seq(col(keyCol))) ++ cols))

  /** P1 dynamic: project specific qualifiers of a dynamic family. */
  def withColumnsInFamily(fam: String, quals: Any*): GQuery =
    withColumns(Clauses.columnsInFamily(col(fam), quals: _*).as(fam))

  /** P12/P1: `withFamilies` — project whole family columns (Query2.scala:292-305). */
  def withFamilies(fams: String*): GQuery = withColumns(fams.map(col): _*)

  /** P1: `withAllColumns` — clear any projection, return every column
    * (Query2Builder.scala:24). */
  def withAllColumns(): GQuery = copy(projections = None)

  /** P13: per-family column pagination (Query2.scala:307-326). */
  def withPaginationForFamily(fam: String, pageSize: Int, pageOffset: Int): GQuery =
    withColumns(Clauses.paginateFamily(col(fam), pageSize, pageOffset).as(fam))

  /** P14: row limit — exact, strictly better than the reference's per-region
    * PageFilter approximation (Query2.scala:189-192). */
  def limit(n: Int): GQuery = copy(limitN = Some(n))

  /** Freeze into a DataFrame — the analogue of `toQuery2` + execute (lazily). */
  def toDF: DataFrame = {
    var out = df
    keys.foreach {
      case Seq(one) => out = out.where(col(keyCol) === lit(one))
      case ks => out = out.where(col(keyCol).isin(ks: _*))
    }
    startRow.foreach(s => out = out.where(col(keyCol) >= lit(s)))
    endRow.foreach(e => out = out.where(col(keyCol) < lit(e)))
    preds.foreach(p => out = out.where(p))
    projections.foreach(ps => out = out.select(ps: _*))
    limitN.foreach(n => out = out.limit(n))
    out
  }

  // ---- Execution forms mirroring the reference's terminal operations ----

  /** S2: `singleOption` — at most one row by key (Query2.scala:458, 487-671). */
  def singleOption(): Option[Row] = toDF.limit(1).collect().headOption

  /** S2: `single` — throws if absent, like the reference with noneOnEmpty=false. */
  def single(): Row =
    singleOption().getOrElse(throw new NoSuchElementException(s"no row for keys=$keys"))

  /** S3: `multiMap` — results keyed by row id (Query2.scala:680-825). If
    * `returnEmptyRows`, absent keys map to None (empty-row synthesis,
    * Query2.scala:831-886).
    *
    * CLIENT-SIDE collect, like the reference's `multiMap`: the result lands in
    * driver memory, so it is bounded by the key count — intended for
    * point-get/multi-get fan-ins (up to ~10^4-10^5 keys). A million-key lookup
    * belongs in a distributed join: `withKeys(...).toDF` or a join on the key
    * column keeps it on the executors. `maxKeys` makes that boundary LOUD
    * instead of an eventual driver OOM: the collect is capped by a cheap
    * distributed count and refused over the cap (default 1,000,000 — generous
    * for any fan-in the verb is meant for; raise it deliberately when the
    * driver is provisioned for more). */
  def multiMap(returnEmptyRows: Boolean = false,
      maxKeys: Long = 1000000L): Map[Any, Option[Row]] = {
    require(maxKeys > 0, "maxKeys must be positive")
    // keyed fan-ins are bounded by their DISTINCT key list for free (the
    // result is a Map — duplicates collapse); open queries pay one BOUNDED
    // probe before collecting: limit(maxKeys+1).count() stops scanning at
    // the cap instead of counting the whole source, and on a source that
    // grows between probe and collect the limit itself caps the check's
    // cost (the only way to refuse BEFORE the driver heap takes the hit)
    // past Int.MaxValue the limit() probe can no longer witness an
    // over-cap source (limit truncates below maxKeys) — fall back to the
    // full count there; any driver raising maxKeys that far is already
    // paying collect-scale costs, the probe must stay sound, not cheap
    val n = keys.map(_.distinct.length.toLong).getOrElse {
      if (maxKeys >= Int.MaxValue - 1L) toDF.count()
      else toDF.limit(maxKeys.toInt + 1).count()
    }
    if (n > maxKeys)
      throw new IllegalArgumentException(
        s"multiMap would collect over $maxKeys rows to the driver " +
          s"(maxKeys=$maxKeys): " +
          "a result this size belongs in a distributed join — use " +
          "withKeys(...).toDF or join on the key column; raise maxKeys " +
          "only when the driver is provisioned for it")
    val found = toDF.collect().map(r => r.getAs[Any](keyCol) -> Option(r)).toMap
    if (returnEmptyRows)
      keys.getOrElse(Nil).map(k => k -> found.getOrElse(k, None)).toMap
    else found
  }

  /** S5: `scan(handler)` — but distributed: the handler runs on executors,
    * not a single client thread (Query2.scala:931-976 → SURVEY §3.2). */
  def scan(handler: Row => Unit): Unit = toDF.foreach(handler)

  /** S5: `scanToIterable(map)` (Query2.scala:978-1014). CLIENT-SIDE collect
    * (the reference contract): result size must fit the driver — use `toDF`
    * with distributed transforms when the scan is unbounded. */
  def scanToIterable[T](f: Row => T)(implicit enc: org.apache.spark.sql.Encoder[T]): Seq[T] =
    toDF.map(f).collect().toSeq

  /** S5: `scanUntil` — early-stop scan ≈ exact LIMIT after an ordering column;
    * the reference's exception-based early exit becomes a real limit. */
  def scanUntil(n: Int): DataFrame = toDF.limit(n)
}

object GQuery {
  /** S1: `table.query2` entry point (HbaseTable.scala:400). */
  def apply(df: DataFrame): GQuery = new GQuery(df)
}
