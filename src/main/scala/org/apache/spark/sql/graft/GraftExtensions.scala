package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * SQL surface for graft's native expressions. Two registration paths:
 *
 *  1. `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions` (or
 *     `SparkSession.builder.withExtensions(new GraftExtensions)`) — the
 *     standard deployment path, wired at session construction;
 *  2. [[GraftExtensions.register]] — imperative registration on a live session
 *     (tests, notebooks).
 *
 * After either, the functions work in plain SQL:
 * {{{ SELECT cosine_sim(a.embedding, b.embedding) FROM ... }}}
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def req(n: Int, name: String)(args: Seq[Expression]): Seq[Expression] = {
    require(args.length == n, s"$name expects $n arguments, got ${args.length}")
    args
  }

  private def analysisError(msg: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      "_LEGACY_ERROR_TEMP_1332", Map("errorMessage" -> msg))

  /** Validated constant-positive-int argument for SQL registration: a
    * non-foldable column would throw an internal UnsupportedOperationException
    * from eval() on an unbound attribute, a null literal would NPE, and a
    * non-positive size would surface as a runtime NegativeArraySizeException
    * deep inside the expression — fail analysis loudly instead, like
    * count_in_set/count_in_bloom (ADVICE r2). */
  private def constPosInt(name: String, e: Expression): Int = {
    if (!e.foldable)
      analysisError(s"$name: the size argument must be a foldable constant, got ${e.sql}")
    val v = e.eval()
    if (v == null) analysisError(s"$name: the size argument must be non-null")
    val i = v.asInstanceOf[Number].intValue()
    if (i < 1) analysisError(s"$name: the size argument must be >= 1, got $i")
    i
  }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim", info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float vectors"),
      args => { val a = req(2, "cosine_sim")(args); CosineSimilarity(a(0), a(1)) }),
    ("cosine_sim_int8", info("cosine_sim_int8",
      "cosine_sim_int8(qvec, query) - cosine of an int8-quantized vector vs a float query"),
      args => { val a = req(2, "cosine_sim_int8")(args); CosineSimilarityInt8(a(0), a(1)) }),
    ("cosine_sim_int8_pair", info("cosine_sim_int8_pair",
      "cosine_sim_int8_pair(a, b) - cosine of two int8-quantized vectors"),
      args => { val a = req(2, "cosine_sim_int8_pair")(args)
        CosineSimilarityInt8Pair(a(0), a(1)) }),
    ("hamming64", info("hamming64", "hamming64(a, b) - hamming distance of two int64 signatures"),
      args => { val a = req(2, "hamming64")(args); HammingDistance64(a(0), a(1)) }),
    ("token_hashes", info("token_hashes", "token_hashes(arr) - xxh64 of each string element"),
      args => TokenHashes(req(1, "token_hashes")(args).head)),
    ("simhash64", info("simhash64", "simhash64(hashArr) - 64-bit simhash over token hashes"),
      args => SimHash64(req(1, "simhash64")(args).head)),
    ("minhash_signature", info("minhash_signature",
      "minhash_signature(hashArr, n) - n-slot minhash signature over token hashes"),
      args => { val a = req(2, "minhash_signature")(args)
        MinHashSignature(a(0), constPosInt("minhash_signature", a(1))) }),
    ("minhash_bands", info("minhash_bands",
      "minhash_bands(sig, rowsPerBand) - LSH band keys from a minhash signature"),
      args => { val a = req(2, "minhash_bands")(args)
        MinHashBands(a(0), constPosInt("minhash_bands", a(1))) }),
    ("hyperplane_bucket", info("hyperplane_bucket",
      "hyperplane_bucket(vec, nBits) - signed-random-projection LSH bucket"),
      args => { val a = req(2, "hyperplane_bucket")(args)
        HyperplaneBucket(a(0), constPosInt("hyperplane_bucket", a(1))) }),
    ("md5_prefix60", info("md5_prefix60",
      "md5_prefix60(s) - top 60 md5 bits of a string (engine-portable register hash)"),
      args => Md5Prefix60(req(1, "md5_prefix60")(args).head)),
    ("md5_token_hashes", info("md5_token_hashes",
      "md5_token_hashes(arr) - top 60 md5 bits of each string element (engine-portable)"),
      args => Md5TokenHashes(req(1, "md5_token_hashes")(args).head)),
    ("md5_hyperplane_bucket", info("md5_hyperplane_bucket",
      "md5_hyperplane_bucket(vec, nBits) - SRP bucket with md5 integer weights (engine-portable)"),
      args => { val a = req(2, "md5_hyperplane_bucket")(args)
        Md5HyperplaneBucket(a(0), constPosInt("md5_hyperplane_bucket", a(1))) }),
    ("shingle_hashes", info("shingle_hashes",
      "shingle_hashes(rawTokens, n) - xxh64 of each word n-gram, one compiled pass"),
      args => { val a = req(2, "shingle_hashes")(args)
        ShingleHashes(a(0), constPosInt("shingle_hashes", a(1))) }),
    ("count_in_set", info("count_in_set",
      "count_in_set(arr, s1, s2, ...) - elements of arr contained in the constant set"),
      args => {
        require(args.length >= 2, s"count_in_set expects >=2 arguments, got ${args.length}")
        // The set members must be constants: a non-foldable column here would be
        // silently evaluated against no input row, and a null literal would NPE.
        // Fail analysis loudly instead (ADVICE r2).
        val bad = args.tail.filterNot(_.foldable)
        if (bad.nonEmpty)
          analysisError(
            s"count_in_set: set members must be foldable constants, got ${bad.map(_.sql).mkString(", ")}")
        val members = args.tail.map(_.eval())
        if (members.contains(null))
          analysisError("count_in_set: set members must be non-null constants")
        CountInSet(args.head, members.map(_.toString))
      }),
    ("md5_random_projection", info("md5_random_projection",
      "md5_random_projection(vec, outDim) - JL projection onto md5 signed planes (engine-portable integer coords)"),
      args => { val a = req(2, "md5_random_projection")(args)
        Md5RandomProjection(a(0), constPosInt("md5_random_projection", a(1))) }),
    ("count_in_bloom", info("count_in_bloom",
      "count_in_bloom(hashArr, blob) - elements of a long array probably in a serialized bloom filter"),
      args => {
        val a = req(2, "count_in_bloom")(args)
        if (!a(1).foldable || a(1).eval() == null)
          throw new org.apache.spark.sql.AnalysisException(
            "_LEGACY_ERROR_TEMP_1332", Map("errorMessage" ->
              "count_in_bloom: the filter blob must be a non-null constant"))
        CountInBloom(a(0), a(1).eval().asInstanceOf[Array[Byte]])
      }),
    ("ordered_pairs", info("ordered_pairs",
      "ordered_pairs(arr of struct<id,n>) - all id_a < id_b pairs from a posting list"),
      args => OrderedPairs(req(1, "ordered_pairs")(args).head)))

  /** Imperative registration on a live session (temp functions). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
