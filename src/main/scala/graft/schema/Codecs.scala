package graft.schema

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * String-codec compatibility for the reference's special key types (SURVEY
 * §1.2). The byte-converter machinery itself is obsolete (Catalyst types +
 * Encoders replace it), but two reference codecs define *data formats* that a
 * migrating user's stored qualifiers may carry, so we keep them bidirectional:
 *
 *  - `YearDay(year, day)` ↔ `"yyyy_d"` (reference Schema.scala:258,
 *    schema.scala:147-159) — day is day-of-year, NOT zero-padded;
 *  - `CommaSet` = Set[String] ↔ CSV string (reference Schema.scala:260-272,
 *    schema.scala:134-140).
 */
object Codecs {

  /** date → "yyyy_d" string (reference YearDayConverter format). */
  def yearday_encode(date: Column): Column =
    concat(year(date).cast("string"), lit("_"), dayofyear(date).cast("string"))

  /** "yyyy_d" string → date. */
  def yearday_decode(s: Column): Column = {
    val parts = split(s, "_")
    to_date(date_add(
      to_date(concat(element_at(parts, 1), lit("-01-01"))),
      element_at(parts, 2).cast("int") - 1))
  }

  /** array<string> → comma-joined CommaSet string (distinct, sorted for
    * determinism — the reference's Set has no order to preserve). */
  def commaset_encode(arr: Column): Column =
    concat_ws(",", array_sort(array_distinct(arr)))

  /** CommaSet string → array<string> (set semantics). */
  def commaset_decode(s: Column): Column =
    when(s.isNull || s === "", array().cast("array<string>"))
      .otherwise(array_distinct(split(s, ",")))
}
