package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling

/** Deterministic hash split/sample (q43): stability, partition laws, nesting. */
class SamplingSpec extends SparkSpec {

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
}
