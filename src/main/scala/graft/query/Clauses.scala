package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * The predicate algebra — Spark-native analogue of the reference's server-side
 * filter clause builder (`ClauseBuilder`, reference:
 * src/main/scala/com/gravity/hbase/schema/Query2.scala:130-327).
 *
 * Null semantics (SURVEY §2.2): the reference's `SingleColumnValueFilter`s are
 * built with `setFilterIfMissing(true)`, i.e. rows lacking the column are dropped.
 * That is exactly `col IS NOT NULL AND <pred>`, so every clause here conjoins
 * `isNotNull` — three-valued logic with nulls removed, matching reference behavior.
 *
 * All clauses are plain Catalyst `Column` expressions: they stay inside
 * whole-stage codegen and push down to the Parquet scan (the Spark analogue of the
 * reference shipping its filter tree to the region server, Query2.scala:511-513).
 */
object Clauses {

  /** P2: columnValueMustEqual (Query2.scala:194-200). */
  def mustEqual(c: Column, v: Any): Column = c.isNotNull && c === lit(v)

  /** P3: columnValueMustNotEqual — missing column ⇒ row dropped (Query2.scala:134-140). */
  def mustNotEqual(c: Column, v: Any): Column = c.isNotNull && c =!= lit(v)

  /** P4: columnValueMustBeIn (Query2.scala:202-213). */
  def mustBeIn(c: Column, vs: Any*): Column = c.isNotNull && c.isin(vs: _*)

  /** P5: columnValueMustBeGreaterThan / LessThan — strict (Query2.scala:215-229). */
  def mustBeGreaterThan(c: Column, v: Any): Column = c.isNotNull && c > lit(v)
  def mustBeLessThan(c: Column, v: Any): Column = c.isNotNull && c < lit(v)

  /** P6: columnValueMustStartWith (BinaryPrefixComparator, Query2.scala:142-147). */
  def mustStartWith(c: Column, prefix: String): Column = c.isNotNull && c.startsWith(prefix)

  /** P7: columnValueMustContain / MustNotContain (SubstringComparator,
    * Query2.scala:152-157, 181-186). */
  def mustContain(c: Column, s: String): Column = c.isNotNull && c.contains(s)
  def mustNotContain(c: Column, s: String): Column = c.isNotNull && !c.contains(s)

  /** P8: columnValueMustPassRegex (RegexStringComparator, Query2.scala:173-178). */
  def mustPassRegex(c: Column, re: String): Column = c.isNotNull && c.rlike(re)

  /** P9: columnValueMustBePresent (Query2.scala:231-237). */
  def mustBePresent(c: Column): Column = c.isNotNull

  /** P11: whereFamilyHasKeyGreaterThan — row kept iff the dynamic family has a
    * qualifier >= k (SkipFilter pattern, Query2.scala:162-171). */
  def familyHasKeyGreaterThan(fam: Column, k: Any): Column =
    fam.isNotNull && exists(map_keys(fam), q => q >= lit(k))

  /** P16: time-range on a timestamp column (betweenDates/afterDate/untilDate,
    * Query2.scala:345-359). Half-open [from, to) like HBase TimeRange. */
  def betweenDates(ts: Column, fromIncl: Any, toExcl: Any): Column =
    ts.isNotNull && ts >= lit(fromIncl) && ts < lit(toExcl)
  def afterDate(ts: Column, fromIncl: Any): Column = ts.isNotNull && ts >= lit(fromIncl)
  def untilDate(ts: Column, toExcl: Any): Column = ts.isNotNull && ts < lit(toExcl)

  /** P17: row-key range — scan withStartRow/withEndRow, half-open (Query2.scala:361-369). */
  def keyRange(key: Column, startIncl: Any, endExcl: Any): Column =
    key >= lit(startIncl) && key < lit(endExcl)

  /** AND / OR groups — the reference's nested and(...)/or(...) FilterBuilder
    * (Query2.scala:90-128). */
  def and(cs: Column*): Column = cs.reduce(_ && _)
  def or(cs: Column*): Column = cs.reduce(_ || _)

  /** P15: noClause no-op (Query2.scala:150). */
  val noClause: Column = lit(true)

  // ---- Dynamic-family (map column) qualifier operators ----

  /** P10: betweenColumnKeys — keep only map entries whose qualifier is in
    * [lo, hi) (Query2.scala:279-290). */
  def betweenColumnKeys(fam: Column, lo: Any, hi: Any): Column =
    map_filter(fam, (k, _) => k >= lit(lo) && k < lit(hi))

  /** P10: lessThanColumnKey / greaterThanColumnKey (Query2.scala:239-257). */
  def lessThanColumnKey(fam: Column, k: Any): Column =
    map_filter(fam, (q, _) => q < lit(k))
  def greaterThanColumnKey(fam: Column, k: Any): Column =
    map_filter(fam, (q, _) => q > lit(k))

  /** P1 (dynamic part): withColumnsInFamily — project specific qualifiers out of a
    * dynamic family (Query2Builder.scala:24-60). */
  def columnsInFamily(fam: Column, quals: Any*): Column = {
    val qs = array(quals.map(lit): _*)
    map_filter(fam, (k, _) => array_contains(qs, k))
  }

  /**
   * P13: withPaginationForFamily(pageSize, pageOffset) — HBase
   * `ColumnPaginationFilter` semantics: skip `pageOffset` cells, take `pageSize`,
   * in qualifier order (Query2.scala:307-326). Map entries are sorted by qualifier
   * first (HBase qualifiers are byte-sorted) then sliced.
   */
  def paginateFamily(fam: Column, pageSize: Int, pageOffset: Int): Column =
    map_from_entries(slice(array_sort(map_entries(fam)), pageOffset + 1, pageSize))
}
