package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/**
 * The native expressions exist for speed; these properties pin them to the
 * declarative formulations they replaced, on real corpus text — a regression
 * here means the "fast path" silently changed semantics.
 */
class NativeEquivalenceSpec extends SparkSpec {

  lazy val docs = spark.read.parquet(s"${sf()}/documents.parquet").limit(200)

  test("shingle_hashes(split) == token_hashes(shingles) byte-for-byte") {
    for (n <- Seq(1, 2, 3, 5)) {
      val diff = docs.select(
          shingle_hashes(split(col("text"), " "), n).as("fast"),
          token_hashes(shingles(col("text"), n)).as("ref"))
        .where(not(col("fast") === col("ref")))
      assert(diff.isEmpty, s"shingle size $n diverged")
    }
  }

  test("count_in_set == size(filter(isin)) on corpus tokens") {
    val markers = Seq("the", "of", "und", "la")
    val diff = docs
      .select(tokens(lower(col("text"))).as("tk"))
      .select(count_in_set(col("tk"), markers).as("fast"),
        size(filter(col("tk"), t => t.isin(markers.map(lit): _*))).as("ref"))
      .where(col("fast") =!= col("ref"))
    assert(diff.isEmpty)
  }

  test("cosine_sim_int8 == cosine_sim over the HOF-cast quantized vector") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet").limit(200)
    val q = graft.ops.Similarity.quantizeInt8(emb, "vec_id", "embedding")
    val query = (0 until 64).map(i => ((i * 37 % 11) - 5).toFloat)
    val qc = array(query.map(lit): _*)
    // identical arithmetic: both promote each int8 element to double before
    // the dot/norm loop, so the native path must match the cast path exactly
    val diff = q.select(
        cosine_sim_int8(col("qvec"), qc).as("fast"),
        cosine_sim(transform(col("qvec"), x => x.cast("float")), qc).as("ref"))
      .where(col("fast") =!= col("ref"))
    assert(diff.isEmpty, "native int8 cosine diverged from the cast form")
  }

  test("cosine_sim_int8_pair == cosine_sim_int8 over the float-cast side") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet").limit(100)
    val q = graft.ops.Similarity.quantizeInt8(emb, "vec_id", "embedding")
    val a = q.select(col("id").as("aid"), col("qvec").as("aq"))
    val b = q.select(col("id").as("bid"), col("qvec").as("bq"))
    // byte → double is exact through either a float hop or directly, so the
    // pair form must match the cast form bit-for-bit on every pair
    val diff = a.crossJoin(b).where(col("aid") < col("bid")).select(
        cosine_sim_int8_pair(col("aq"), col("bq")).as("fast"),
        cosine_sim_int8(col("aq"), col("bq").cast("array<float>")).as("ref"))
      .where(col("fast") =!= col("ref"))
    assert(diff.isEmpty, "int8 pair cosine diverged from the cast form")
  }

  test("count_in_bloom == size(filter(bloom_might_contain)) on corpus shingles") {
    // build a real filter over half the corpus's shingle hashes, then probe
    // every document with both formulations — same filter blob, so the
    // (deterministic) false positives land identically in both
    val train = docs.where(col("doc_id") % 2 === 0)
    val bloom = graft.ops.TextOps.trainBloom(train, "doc_id", "text",
      shingleSize = 3, expectedItems = 100000L, fpp = 0.01)
    val diff = docs
      .select(array_distinct(
        shingle_hashes(split(col("text"), " "), 3)).as("th"))
      .select(count_in_bloom(col("th"), bloom).as("fast"),
        size(filter(col("th"), s => bloom_might_contain(bloom, s))).as("ref"))
      .where(col("fast") =!= col("ref"))
    assert(diff.isEmpty)
  }

  test("md5_token_hashes matches md5-hex-prefix arithmetic per token") {
    val diff = docs
      .select(explode(tokens(col("text"))).as("t")).limit(500)
      .select(
        element_at(md5_token_hashes(array(col("t"))), 1).as("fast"),
        conv(substring(md5(col("t").cast("binary")), 1, 15), 16, 10)
          .cast("bigint").as("ref"))
      .where(col("fast") =!= col("ref"))
    assert(diff.isEmpty)
  }

  test("ordered_pairs == the self-join pair set, with sizes attached") {
    val posting = spark.range(6).select(
      lit(1).as("g"), col("id"), (col("id") * 10 + 1).cast("int").as("n"))
    val viaExpr = posting.groupBy("g")
      .agg(collect_list(struct(col("id"), col("n"))).as("docs"))
      .select(explode(ordered_pairs(col("docs"))).as("p"))
      .select(col("p.id_a"), col("p.n_a"), col("p.id_b"), col("p.n_b"))
    val viaJoin = posting.alias("a").join(posting.alias("b"),
        col("a.g") === col("b.g") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("a.n").as("n_a"),
        col("b.id").as("id_b"), col("b.n").as("n_b"))
    assert(viaExpr.except(viaJoin).isEmpty && viaJoin.except(viaExpr).isEmpty)
    assert(viaExpr.count() == 15) // C(6,2)
  }

  test("md5_prefix60 == the md5-hex-prefix conv chain") {
    val diff = spark.range(0, 5000)
      .select(col("id").cast("string").as("s"))
      .select(md5_prefix60(col("s")).as("fast"),
        conv(substring(md5(col("s").cast("binary")), 1, 15), 16, 10)
          .cast("bigint").as("ref"))
      .where(col("fast") =!= col("ref"))
    assert(diff.isEmpty)
  }

  test("count_in_bloom compares its blob by content, not reference") {
    val f = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    Seq(1L, 2L, 3L).foreach(f.putLong)
    def blob: Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream(); f.writeTo(bos); bos.toByteArray
    }
    val (b1, b2) = (blob, blob)
    assert(!(b1 eq b2))
    val child = org.apache.spark.sql.catalyst.expressions.Literal.create(
      Array(1L, 9L), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType))
    import org.apache.spark.sql.graft.CountInBloom
    // byte-identical blobs in distinct arrays: equal + same hash (so plan
    // canonicalization/CSE can merge two probes of the same filter)
    assert(CountInBloom(child, b1) == CountInBloom(child, b2))
    assert(CountInBloom(child, b1).hashCode == CountInBloom(child, b2).hashCode)
    assert(CountInBloom(child, b1).semanticEquals(CountInBloom(child, b2)))
    // and a different filter is NOT equal
    val g = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    g.putLong(42L)
    val gos = new java.io.ByteArrayOutputStream(); g.writeTo(gos)
    assert(CountInBloom(child, b1) != CountInBloom(child, gos.toByteArray))
  }

  test("md5_hyperplane_bucket: expression eval == driver-side compute twin") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet").limit(50)
    val rows = emb.select(col("vec_id"), col("embedding"),
        graft.functions.GraftFunctions.md5_hyperplane_bucket(col("embedding"), 8).as("b"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1).toArray
      assert(r.getLong(2) ==
        org.apache.spark.sql.graft.Md5HyperplaneBucket.compute(v, 8),
        s"vec ${r.getLong(0)} bucket mismatch")
    }
  }
}
