package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Native expression + signature-function correctness (codegen paths). */
class FunctionsSpec extends SparkSpec {
  _quiet
  import spark.implicits._

  test("cosine_sim matches hand-computed values, handles zero norm") {
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f), 1.0),
      (Array(1f, 0f), Array(0f, 1f), 0.0),
      (Array(1f, 2f), Array(2f, 4f), 1.0),
      (Array(0f, 0f), Array(1f, 1f), 0.0), // zero norm → 0.0 by contract
      (Array(1f, 1f), Array(1f, -1f), 0.0)
    ).toDF("a", "b", "want")
    val got = df.select(cosine_sim(col("a"), col("b")).as("got"), col("want")).collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }

  test("cosine_sim interpreted eval agrees with codegen") {
    val df = Seq((Array(0.3f, -1.2f, 2f), Array(1.5f, 0.2f, -0.7f))).toDF("a", "b")
    val fromCodegen = df.select(cosine_sim(col("a"), col("b"))).head().getDouble(0)
    // force interpreted path through a literal-free filter + collect on rows
    val rows = df.collect()
    val a = rows.head.getSeq[Float](0); val b = rows.head.getSeq[Float](1)
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val manual = dot / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    assert(math.abs(fromCodegen - manual) < 1e-12)
  }

  test("hamming64: popcount of xor") {
    val df = Seq((0L, 0L, 0), (-1L, 0L, 64), (5L, 6L, 2), (1L << 63, 0L, 1))
      .toDF("a", "b", "want")
    df.select(hamming64(col("a"), col("b")).as("got"), col("want")).collect()
      .foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("tokens/shingles: trailing spaces, short docs") {
    val df = Seq("a b c d ", "x", "").toDF("t")
    val toks = df.select(tokens(col("t"))).collect().map(_.getSeq[String](0))
    assert(toks(0) == Seq("a", "b", "c", "d") && toks(1) == Seq("x") && toks(2).isEmpty)
    val sh = df.select(shingles(col("t"), 3)).collect().map(_.getSeq[String](0))
    assert(sh(0) == Seq("a b c", "b c d"))
    assert(sh(1) == Seq("x")) // shorter than n → one whole-doc shingle
  }

  test("minhash: identical docs share full signature; signature is deterministic") {
    val df = Seq(("d1", "the quick brown fox"), ("d2", "the quick brown fox"),
      ("d3", "totally different words here")).toDF("id", "t")
    val sigs = df.select(col("id"), minhash_signature(tokens(col("t")), 32).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(sigs("d1") == sigs("d2"))
    assert(sigs("d1") != sigs("d3"))
    assert(sigs("d1").size == 32)
  }

  test("simhash: identical → hamming 0; near-identical close, disjoint far") {
    val df = Seq(
      ("a", "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      ("b", "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      ("c", "w1 w2 w3 w4 w5 w6 w7 w8 w9 zzz"),
      ("d", "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10")).toDF("id", "t")
    val sig = df.select(col("id"), simhash64(tokens(col("t"))).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(sig("a"), sig("b")) == 0)
    assert(ham(sig("a"), sig("c")) < ham(sig("a"), sig("d")))
  }

  test("jaccard + rolling_hash + fingerprint determinism") {
    val df = Seq(("a b c", "b c d"), ("a b", "a b")).toDF("x", "y")
    val j = df.select(jaccard(tokens(col("x")), tokens(col("y")))).collect().map(_.getDouble(0))
    assert(math.abs(j(0) - 2.0 / 4.0) < 1e-12 && j(1) == 1.0)
    val rh = Seq("abc", "abc", "abd").toDF("t")
      .select(rolling_hash(col("t"))).collect().map(_.getLong(0))
    assert(rh(0) == rh(1) && rh(0) != rh(2))
    assert(rh(0) == (((97L * 31 + 98) % 2147483647L) * 31 + 99) % 2147483647L)
  }

  test("hyperplane_bucket: deterministic, equal vectors share bucket") {
    val df = Seq(Array(1f, 2f, 3f, 4f), Array(1f, 2f, 3f, 4f), Array(-1f, -2f, -3f, -4f))
      .toDF("v")
    val b = df.select(hyperplane_bucket(col("v"), 8)).collect().map(_.getLong(0))
    assert(b(0) == b(1))
    assert(b(0) == (~b(2) & 0xFFL)) // antipodal vector flips every sign bit
  }
}
