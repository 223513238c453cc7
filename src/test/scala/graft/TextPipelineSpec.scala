package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Contamination + repetition-quality operators (training-data hygiene). */
class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("filterFunnel: cumulative stage counts in one scan, NULL predicate fails") {
    val df = Seq(
      (1L, "aaaa bbbb cccc"), // passes len>=10 (14 chars), fails tok>=4 (3)
      (2L, "aa bb cc dd ee"), // passes both (14 chars, 5 tokens)
      (3L, "ab"),             // fails len>=10
      (4L, null.asInstanceOf[String])) // NULL text: fails stage 1, never 3-valued
      .toDF("id", "text")
    val out = TextOps.filterFunnel(df, Seq(
        "len" -> (length(col("text")) >= 10),
        "toks" -> (size(split(col("text"), " ")) >= 4)))
      .orderBy("stage").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq == Seq(
      (1L, "len", 4L, 2L, 2L),
      (2L, "toks", 2L, 1L, 1L)))
    // the funnel is chained, not independent: row 2 alone reaches stage 2
    // one scan, one aggregate: no more than one Exchange in the plan
    val plan = TextOps.filterFunnel(df, Seq("len" -> (length(col("text")) >= 10)))
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 <= 1, plan)
  }

  test("bpePairStats: word-frequency-weighted char pairs; 1-char words contribute nothing") {
    val df = Seq("ab ab abc a", "ab x").toDF("text")
    // dictionary: ab:3, abc:1, a:1, x:1 → pairs: ab = 3(from ab)+1(from abc)
    // = 4, bc = 1; 'a' and 'x' are sub-2-char (the sequence(1,0) guard)
    val out = TextOps.bpePairStats(df, "text", 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("ab", 4L), ("bc", 1L)))
  }

  test("importanceScores: target-like docs outrank background; exact under repartition") {
    val df = Seq(
      (1L, "alpha alpha beta", true),   // target
      (2L, "alpha beta beta", true),    // target
      (3L, "gamma gamma delta", false), // background-only vocabulary
      (4L, "alpha alpha alpha", false), // background row made of target vocab
      (5L, null.asInstanceOf[String], false)) // token-less: excluded
      .toDF("id", "text", "is_t")
    // fixture precondition: the four tokens hash to DISTINCT buckets (a
    // collision would merge their distributions and void the ranking claim)
    val buckets = Seq("alpha", "beta", "gamma", "delta").toDF("t")
      .select(pmod(graft.functions.GraftFunctions.md5_prefix60(col("t")),
        lit(4096L)))
      .collect().map(_.getLong(0)).toSet
    assert(buckets.size == 4, s"fixture tokens collide: $buckets")
    val out = TextOps.importanceScores(df, "id", "text", col("is_t"), 4096)
    val scores = out.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // 'alpha' is target-heavy, 'gamma'/'delta' never appear in target docs:
    // the all-alpha doc must outscore the all-background-vocab doc
    assert(scores(4L) > scores(3L), scores.toString)
    assert(!scores.contains(5L))
    // nano-quantized integer sums: bit-identical under any partitioning
    val out2 = TextOps.importanceScores(df.repartition(7), "id", "text",
      col("is_t"), 4096).collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out2 == scores)
  }

  test("max_multiplicity: native per-row mode count") {
    val r = Seq(
      (Seq(1L, 2L, 2L, 3L, 2L), 3),
      (Seq(7L), 1),
      (Seq.empty[Long], 0))
      .toDF("a", "exp")
      .select(graft.functions.GraftFunctions.max_multiplicity(col("a")), col("exp"))
      .collect()
    r.foreach(row => assert(row.getInt(0) == row.getInt(1)))
  }

  test("repetitionProfile: planted boilerplate scores high, diverse text low") {
    val docs = Seq(
      (1L, "buy now buy now buy now buy now buy now"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "a b")).toDF("doc_id", "text")
    val p = TextOps.repetitionProfile(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1: 9 bigrams, "buy now"×5 + "now buy"×4 → top = 5/9
    assert(p(1L).getLong(1) == 9)
    assert(math.abs(p(1L).getDouble(2) - 5.0 / 9) < 1e-6)
    assert(p(1L).getDouble(3) > 0.5) // 3-grams heavily repeated
    // doc 2: all bigrams distinct
    assert(p(2L).getDouble(2) < 0.2 && p(2L).getDouble(3) == 0.0)
    // doc 3: shorter than 3 tokens → single whole-text shingle contract
    assert(p(3L).getLong(1) == 1 && p(3L).getDouble(2) == 1.0)
  }

  test("repetitionProfile plans with ZERO exchanges (per-row only)") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val plan = TextOps.repetitionProfile(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("lmScore: in-distribution text outscores rare-token noise; exact under repartition") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the mat"),
      (3L, "the cat sat on the mat"),
      (4L, "zqx wvu kjh gfd"), // tokens seen nowhere else
      (5L, "the cat sat on the mat")).toDF("doc_id", "text")
    val scores = TextOps.lmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(scores.size == 5)
    // the repeated sentence's bigrams are 4x attested; the noise doc's are 1x
    assert(scores(1L)._2 > scores(4L)._2,
      s"common ${scores(1L)._2} should beat rare ${scores(4L)._2}")
    assert(scores(1L) == scores(2L)) // identical text, identical score
    // integer-quantized log-probs: bit-identical at any partitioning
    val repart = TextOps.lmScore(docs.repartition(7), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(repart == scores)
  }

  test("lmScore: docs with fewer than two tokens are unscoreable and excluded") {
    val docs = Seq((1L, "single"), (2L, ""), (3L, "two tokens")).toDF("doc_id", "text")
    val out = TextOps.lmScore(docs, "doc_id", "text").collect()
    assert(out.map(_.getLong(0)).toSet == Set(3L))
    assert(out.head.getLong(1) == 1) // one bigram
  }

  test("nbTrainScore: disjoint-vocab classes separate perfectly, ties break to smallest class") {
    val df = (
      (1L to 20L).map(i => (i, s"cat cat dog cat bird dog", "pets")) ++
      (21L to 40L).map(i => (i, s"car bus car train bus car", "transit"))).toDF("id", "text", "cls")
    val out = TextOps.nbTrainScore(df, "id", "text", "cls")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.length == 40)
    out.foreach { case (id, cls, pred, _) =>
      assert(pred == cls, s"doc $id: true $cls predicted $pred")
      assert(cls == (if (id <= 20) "pets" else "transit"))
    }
    // determinism + exactness: integer scores identical across evaluations
    val again = TextOps.nbTrainScore(df.repartition(7), "id", "text", "cls")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSet == again.toSet)
    // a doc whose tokens the model never bucketed differently: identical
    // class-conditional scores → the tie goes to the SMALLEST class value
    val tied = Seq((1L, "x y", "a"), (2L, "x y", "b")).toDF("id", "text", "cls")
    val t = TextOps.nbTrainScore(tied, "id", "text", "cls")
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    // both classes have one doc (equal priors) and identical token counts:
    // every score ties, so both docs predict class "a"
    assert(t == Map(1L -> "a", 2L -> "a"))
    // token-less docs are absent from the output
    val withEmpty = df.unionByName(Seq((99L, "", "pets")).toDF("id", "text", "cls"))
    assert(!TextOps.nbTrainScore(withEmpty, "id", "text", "cls")
      .collect().map(_.getLong(0)).contains(99L))
  }

  test("distributionDrift: 0 on identical corpora, ~2 on disjoint, partition-invariant") {
    val a = Seq((1L, "cat dog bird"), (2L, "cat cat fish")).toDF("id", "text")
    val same = TextOps.distributionDrift(a, a, "text")
      .agg(sum(col("contrib_nano"))).head().getLong(0)
    assert(same == 0L, s"identical corpora drifted: $same")
    // disjoint vocabularies: each bucket is one-sided — (p-0)²/(p+0) sums
    // p over A's buckets (=1) plus q over B's (=1) → exactly 2 (bar md5
    // bucket collisions between the two vocabularies, absent here)
    val b = Seq((1L, "car bus train")).toDF("id", "text")
    val disj = TextOps.distributionDrift(a, b, "text")
      .agg(sum(col("contrib_nano"))).head().getLong(0)
    assert(math.abs(disj - 2000000000L) < 10L, s"disjoint drift: $disj")
    val again = TextOps.distributionDrift(a.repartition(5), b.repartition(3), "text")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(again == TextOps.distributionDrift(a, b, "text")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet)
  }

  test("contamination: exact overlap counts, zero-hit docs included") {
    val train = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val test = Seq(
      (10L, "alpha beta gamma echo"), // shingles: {a b g, b g e? ...}
      (11L, "zz yy xx ww vv")).toDF("doc_id", "text")
    val c = TextOps.contamination(train, test, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    // test 10: shingles {alpha beta gamma, beta gamma echo} — first hits train
    assert(c(10L).getLong(1) == 2 && c(10L).getLong(2) == 1)
    assert(math.abs(c(10L).getDouble(3) - 0.5) < 1e-9)
    // test 11: no overlap — present with zero, not dropped by the join
    assert(c(11L).getLong(2) == 0 && c(11L).getDouble(3) == 0.0)
  }

  test("contaminationBloom: superset of exact hits, overcount within FPR bound") {
    val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    val sp = graft.ops.Sampling.hashSplit(docs, "doc_id", 80)
    val train = sp.where(col("split") === "train")
    val testSp = sp.where(col("split") === "test")
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val exact = toMap(TextOps.contamination(train, testSp, "doc_id", "text", 3))
    val bloom = toMap(TextOps.contaminationBloom(train, testSp, "doc_id", "text", 3,
      expectedItems = 200000L, fpp = 0.01))
    assert(bloom.keySet == exact.keySet)
    // no false negatives: per-doc bloom hits dominate exact hits; sizes agree
    exact.foreach { case (id, (n, hits)) =>
      assert(bloom(id)._1 == n)
      assert(bloom(id)._2 >= hits, s"doc $id: bloom ${bloom(id)._2} < exact $hits")
    }
    // bounded overcount: measured FP mass within 5x of the 1% design rate
    // (expectedItems is sized well above the train split's distinct shingles)
    val totalShingles = exact.values.map(_._1).sum
    val overcount = bloom.values.map(_._2).sum - exact.values.map(_._2).sum
    assert(overcount <= math.max(10L, totalShingles / 20),
      s"bloom overcounted $overcount of $totalShingles probes")
  }

  test("removeBoilerplateLines: corpus-df rule, verbatim passthrough, " +
      "within-doc repeats don't count, NULL text") {
    val boiler = "subscribe to our newsletter"
    val docs = Seq(
      // 3 docs share the boilerplate line (df=3 >= maxDf=3 -> dropped)
      (1L, s"alpha unique one\n$boiler\nomega unique one"),
      (2L, s"$boiler\nbeta unique two"),
      (3L, s"gamma unique three\n$boiler"),
      // repeats a PRIVATE line 4x: df=1, must NOT be treated as boilerplate
      (4L, "own header\nown header\nown header\nown header"),
      // untouched doc: must pass through byte-identical (incl. odd spacing)
      (5L, "  leading spaces\nand  double  spaces  "),
      (6L, null.asInstanceOf[String])).toDF("id", "text")
    val out = TextOps.removeBoilerplateLines(docs, "id", "text", maxDf = 3)
      .collect().map(r => (r.getLong(0),
        Option(r.getString(1)), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(out(0) == ((1L, Some("alpha unique one\nomega unique one"), 3L, 1L)))
    assert(out(1) == ((2L, Some("beta unique two"), 2L, 1L)))
    assert(out(2) == ((3L, Some("gamma unique three"), 2L, 1L)))
    assert(out(3) == ((4L, Some("own header\nown header\nown header\nown header"), 4L, 0L)))
    assert(out(4) == ((5L, Some("  leading spaces\nand  double  spaces  "), 2L, 0L)))
    assert(out(5) == ((6L, None, 0L, 0L)))
  }

  test("removeBoilerplateLines: all-lines-dropped doc becomes empty string; " +
      "custom separator with regex metachars is literal") {
    val docs = Seq(
      (1L, "dup|other"), (2L, "dup|other"), (3L, "dup|other"),
      (4L, "dup")) // every line of doc 4 is corpus boilerplate
    .toDF("id", "text")
    val out = TextOps.removeBoilerplateLines(docs, "id", "text",
        maxDf = 3, sep = "|")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).sortBy(_._1)
    // 'dup' df=4 dropped; 'other' df=3 dropped too -> all docs emptied
    assert(out.forall(_._2 == ""), s"got ${out.toSeq}")
    assert(out.map(_._3).toSeq == Seq(2L, 2L, 2L, 1L))
  }

  test("noveltyProfile: boilerplate copies score 0, unique docs score 1") {
    val boiler = "copy of the same template text repeated verbatim everywhere"
    val docs = Seq(
      (1L, boiler), (2L, boiler), (3L, boiler), // every shingle shared
      (4L, "entirely singular prose with words appearing nowhere else"),
      (5L, boiler + " except one unique closing sentence here"))
      .toDF("doc_id", "text")
    val p = TextOps.noveltyProfile(docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    Seq(1L, 2L, 3L).foreach(i => assert(p(i)._3 == 0.0, s"doc $i: ${p(i)}"))
    assert(p(4L)._3 == 1.0)
    // doc 5 shares the boilerplate prefix but owns its suffix shingles
    assert(p(5L)._2 > 0 && p(5L)._3 > 0.0 && p(5L)._3 < 1.0)
    assert(p.values.forall(v => v._2 <= v._1))
  }

  test("chunkDocuments: windows partition the token stream exactly") {
    def words(n: Int, p: String) = (0 until n).map(i => s"$p$i").mkString(" ")
    val docs = Seq(
      (1L, words(300, "a")), // 128 + 128 + 44
      (2L, words(256, "b")), // exact multiple: 128 + 128, no empty tail
      (3L, words(5, "c")),   // shorter than one window
      (4L, ""),              // zero tokens: no chunks at all
      (5L, "x")              // single token
    ).toDF("doc_id", "text")
    val chunks = TextOps.chunkDocuments(docs, "doc_id", "text", 128)
      .orderBy("id", "chunk_idx").collect()
    val byDoc = chunks.groupBy(_.getLong(0))
    assert(byDoc(1L).map(_.getLong(2)).toSeq == Seq(128L, 128L, 44L))
    assert(byDoc(2L).map(_.getLong(2)).toSeq == Seq(128L, 128L))
    assert(byDoc(3L).map(_.getLong(2)).toSeq == Seq(5L))
    assert(!byDoc.contains(4L))
    assert(byDoc(5L).map(_.getLong(2)).toSeq == Seq(1L))
    // lossless: chunks reassemble to the original token stream
    assert(byDoc(1L).map(_.getString(3)).mkString(" ") == words(300, "a"))
    // chunk_idx is dense from 0
    assert(byDoc(1L).map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L))
  }

  test("packDocuments: concat-then-cut assigns packs by start offset per stratum") {
    def words(n: Int) = (0 until n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, "x", words(1000)), // starts 0    -> pack 0
      (2L, "x", words(1500)), // starts 1000 -> pack 0
      (3L, "x", words(600)),  // starts 2500 -> pack 1
      (4L, "x", words(2000)), // starts 3100 -> pack 1
      (5L, "y", words(100))   // own stratum -> pack 0
    ).toDF("doc_id", "lang", "text")
    val packs = TextOps.packDocuments(docs, "doc_id", "text", "lang", 2048)
      .collect().map(r => r.getLong(1) -> (r.getString(0), r.getLong(3))).toMap
    assert(packs(1L) == ("x", 0L) && packs(2L) == ("x", 0L))
    assert(packs(3L) == ("x", 1L) && packs(4L) == ("x", 1L))
    assert(packs(5L) == ("y", 0L))
  }

  test("kmv shard sketches: merge == direct global sketch (exact identity); " +
      "estimate is exact below k") {
    import graft.functions.GraftFunctions.md5_prefix60
    val rows = (0L until 300L).map(i => (s"s${i % 3}", s"v${i % 97}"))
      .toDF("shard", "v")
    val sk = TextOps.kmvSketchShards(rows, "shard", "v", k = 16)
    val sketches = sk.collect().map(r => (r.getString(0), r.getSeq[Long](1)))
    assert(sketches.length == 3)
    sketches.foreach { case (_, a) =>
      assert(a.length == 16 && a == a.sorted, "sketch not ascending min-k")
    }
    // the law: min-k of the union of shard sketches == the global min-k
    val merged = TextOps.kmvMergeEstimate(sk, k = 16).head()
    val direct = rows.select(md5_prefix60(col("v")).as("h"))
      .distinct().orderBy(col("h")).limit(16)
      .collect().map(_.getLong(0)).toSeq
    assert(merged.getSeq[Long](0) == direct, "merge != direct global sketch")
    assert(merged.getLong(1) == 16L && merged.getLong(2) == direct.max)
    // k above the true NDV: the sketch holds everything, estimate is EXACT
    val m2 = TextOps.kmvMergeEstimate(
      TextOps.kmvSketchShards(rows, "shard", "v", k = 200), k = 200).head()
    assert(m2.getLong(1) == 97L && m2.getDouble(3) == 97.0)
  }

  test("overlapSketch: self-overlap is exactly 1, estimate tracks exact corpus Jaccard") {
    import graft.functions.GraftFunctions.{md5_token_hashes, shingles}
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("doc_id"), col("text"))
    // a corpus against itself: identical sketches, intersection == union
    val self = TextOps.overlapSketch(docs, docs, "text").head()
    assert(self.getLong(0) == self.getLong(1) && self.getDouble(2) == 1.0)
    // disjoint id spaces but SAME texts: still 1.0 (overlap is content-keyed)
    val renamed = docs.select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    assert(TextOps.overlapSketch(docs, renamed, "text").head().getDouble(2) == 1.0)
    // estimator accuracy: |est - exact| within ~3 stderr (1/sqrt(k)) of the
    // EXACT distinct-shingle-set Jaccard of a 50/50 split — deterministic,
    // so this is a fixed number per corpus, not a flaky sample
    val sp = graft.ops.Sampling.hashSplit(docs, "doc_id", 50)
    def shingleSet(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(md5_token_hashes(shingles(col("text"), 3))).as("h")).distinct()
    val a = shingleSet(sp.where(col("split") === "train"))
    val b = shingleSet(sp.where(col("split") === "test"))
    val inter = a.join(b, Seq("h"), "left_semi").count().toDouble
    val union = a.unionByName(b).distinct().count().toDouble
    val exact = inter / union
    val k = 1024
    val est = TextOps.overlapSketch(sp.where(col("split") === "train"),
      sp.where(col("split") === "test"), "text", 3, k).head().getDouble(2)
    val tol = 3.0 / math.sqrt(k.toDouble)
    assert(math.abs(est - exact) <= tol,
      s"KMV estimate $est vs exact $exact (tolerance $tol)")
  }

  test("contamination rate is monotone in planted overlap") {
    val docs = spark.read.parquet(sf() + "/documents.parquet").limit(200)
    val sp = graft.ops.Sampling.hashSplit(docs, "doc_id", 80)
    val out = TextOps.contamination(
      sp.where(col("split") === "train"), sp.where(col("split") === "test"),
      "doc_id", "text")
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // hits ≤ shingles
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("canonicalizeUrl: every normalization hazard collapses to one key; " +
      "path case and unknown params survive") {
    val variants = Seq(
      "HTTPS://WWW.Example.com:443/Pages/1/?utm_source=f&b=2&a=1#top",
      "https://example.com/Pages/1?a=1&b=2&gclid=xyz",
      "http://www.example.com:80/Pages/1/?b=2&a=1&fbclid=q&ref=hn",
      "example.com/Pages/1?a=1&b=2") // scheme-less
    val keys = variants.toDF("url")
      .select(TextOps.canonicalizeUrl(col("url")).as("k"))
      .collect().map(_.getString(0)).toSeq
    assert(keys.distinct == Seq("example.com/Pages/1?a=1&b=2"),
      s"variants did not collapse: $keys")
    // path case preserved; non-default port kept; no query -> no '?'
    val others = Seq(
      "https://Ex.com:8080/CaseSensitive/Path",
      "https://ex.com/p#only-frag").toDF("url")
      .select(TextOps.canonicalizeUrl(col("url")).as("k"))
      .collect().map(_.getString(0)).toSeq
    assert(others == Seq("ex.com:8080/CaseSensitive/Path", "ex.com/p"))
    // all-tracking query drops the '?' entirely
    val tracked = Seq("https://ex.com/p?utm_campaign=x&utm_medium=y")
      .toDF("url").select(TextOps.canonicalizeUrl(col("url")).as("k"))
      .collect().map(_.getString(0)).toSeq
    assert(tracked == Seq("ex.com/p"))
  }

  test("dedupParagraphs: global min-(doc,pos) wins, within-doc repeats " +
      "spliced, verbatim passthrough, NULL text") {
    val lede = "syndicated lede"
    val docs = Seq(
      (1L, s"$lede\nalpha body\n$lede"),          // repeats the lede itself
      (2L, s"beta body\n$lede"),                  // later doc loses the lede
      (3L, "own one\nown two"),                   // untouched: verbatim
      (4L, "  spacing  kept \nown three"),        // untouched incl. spacing
      (5L, null.asInstanceOf[String])).toDF("id", "text")
    val out = TextOps.dedupParagraphs(docs, "id", "text")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getLong(2), r.getLong(3))).sortBy(_._1)
    // doc 1 keeps its FIRST lede (global min (1,0)); pos-2 repeat dropped
    assert(out(0) == ((1L, Some(s"$lede\nalpha body"), 3L, 1L)))
    assert(out(1) == ((2L, Some("beta body"), 2L, 1L)))
    assert(out(2) == ((3L, Some("own one\nown two"), 2L, 0L)))
    assert(out(3) == ((4L, Some("  spacing  kept \nown three"), 2L, 0L)))
    assert(out(4) == ((5L, None, 0L, 0L)))
  }

  test("dedupParagraphs: custom separator with regex metachars is literal; " +
      "all-paras-dropped doc becomes empty") {
    val docs = Seq((1L, "dup|keep"), (2L, "dup"), (3L, "dup")).toDF("id", "text")
    val out = TextOps.dedupParagraphs(docs, "id", "text", sep = "|")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
      .sortBy(_._1)
    // doc 1 owns (1,0): keeps 'dup'; docs 2,3 lose their only paragraph
    assert(out(0) == ((1L, "dup|keep", 0L)))
    assert(out(1) == ((2L, "", 1L)))
    assert(out(2) == ((3L, "", 1L)))
  }

  test("bm25: planted term-dense doc ranks first; index path == direct path") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("doc_id"), col("text"))
    // a doc that is nothing but the query terms, repeated: near-saturated tf
    // on every term with a short dl — no natural doc beats it
    val planted = Seq((999999L, Seq.fill(20)("spark window merge").mkString(" ")))
      .toDF("doc_id", "text")
    val corpus = docs.unionByName(planted)
    val terms = Seq("spark", "window", "merge")
    val direct = TextOps.bm25TopK(corpus, "doc_id", "text", terms, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(direct.head._1 == 999999L, s"planted doc not first: $direct")
    assert(direct.head._2 == 3, "planted doc should match all three terms")
    assert(direct.forall(_._3 > 0.0))

    // the persisted-index probe returns the IDENTICAL ranking (this also
    // pins bucket routing: df is counted after pruning, which is only
    // correct because a term's postings all land in one bucket)
    val path = java.nio.file.Files.createTempDirectory("graft_bm25").toString + "/i"
    TextOps.writeBm25Index(corpus, "doc_id", "text", path, nBuckets = 16)
    val probe = TextOps.bm25TopKFromIndex(spark, path, terms, 10, nBuckets = 16)
    val viaIndex = probe.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(viaIndex == direct, "index probe diverged from the direct scan")

    // bucket IN-list prunes at the partition level: fewer files read than exist
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"bucket probe not pushed to partition pruning:\n${plan.take(800)}")
    def filesUnder(dir: java.io.File): Seq[java.io.File] = {
      val kids = Option(dir.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      kids.filter(_.isFile) ++ kids.filter(_.isDirectory).flatMap(filesUnder)
    }
    val totalFiles = filesUnder(new java.io.File(path + "/postings"))
      .count(_.getName.endsWith(".parquet"))
    // the Window's shuffle puts the plan under AQE — descend through the
    // adaptive wrapper to reach the postings FileSourceScanExec
    def allScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allScans(q.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(allScans)
    }
    val scan = allScans(probe.queryExecution.executedPlan)
      .find(_.relation.location.rootPaths.exists(_.toString.contains("postings")))
      .get
    val probedFiles = scan.metrics.get("numFiles").map(_.value).getOrElse(-1L)
    assert(probedFiles >= 1 && probedFiles < totalFiles,
      s"scan read $probedFiles of $totalFiles postings files — no pruning")

    // INCREMENTAL APPEND: build on an arbitrary half, append the rest —
    // the probe must still equal the direct scan bit-for-bit (stats merge
    // additively; per-term df recomputes from old+new postings at query
    // time, so idf sees the full corpus)
    val path2 = java.nio.file.Files.createTempDirectory("graft_bm25a")
      .toString + "/i"
    TextOps.writeBm25Index(corpus.where(col("doc_id") % 2 === 0),
      "doc_id", "text", path2, nBuckets = 16)
    TextOps.appendBm25Index(corpus.where(col("doc_id") % 2 =!= 0),
      "doc_id", "text", path2, nBuckets = 16)
    val viaAppend = TextOps.bm25TopKFromIndex(spark, path2, terms, 10,
        nBuckets = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(viaAppend == direct, "appended index diverged from direct scan")
    // the merged stats sidecar is exactly the full corpus's
    val st = graft.store.ManifestTable.read(spark, path2 + "/stats").head()
    assert(st.getLong(0) == corpus.count(), "n_docs must merge additively")
  }

  test("extractHtmlText: script/style/comment content drops, tags split " +
      "tokens, entities decode single-pass") {
    val html = "<p>a</p><p>b&amp;c</p>" +
      "<SCRIPT type=\"x\">\nvar y = 1 < 2;\ndrop me\n</SCRIPT>" +
      "<style media=\"s\">no { x: 1 }</style>" +
      "<!-- hidden\n<p>not text</p> -->" +
      "<div>d&nbsp;e &amp;lt; f &#39;g&#39; &quot;h&quot;</div>"
    val out = Seq(html).toDF("h")
      .select(TextOps.extractHtmlText(col("h")).as("t")).head().getString(0)
    // &amp;lt; decodes ONCE to the literal text "&lt;" (single-pass rule)
    assert(out == "a b&c d e &lt; f 'g' \"h\"")
    // null passes through null
    val nul = Seq[String](null).toDF("h")
      .select(TextOps.extractHtmlText(col("h"))).head()
    assert(nul.isNullAt(0))
  }

  test("gopherQuality: each rule decides on its own counter; null text fails all") {
    def report(text: String, minWords: Int = 3): Map[String, Any] = {
      val r = TextOps.gopherQuality(Seq((1L, text)).toDF("id", "text"),
        "id", "text", minWords = minWords).head()
      r.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> r.get(i) }.toMap
    }
    // mean word length: "aa bb cc" = 6 chars / 3 words = 2 < 3 → fails
    assert(report("aa bb cc")("r_mean_word_len") == false)
    assert(report("abcd efgh ijkl")("r_mean_word_len") == true)
    // bullets: 2 of 3 lines ≤ 0.9 passes; 2 of 2 fails
    assert(report("- aaa\n- bbb\nplain text here")("r_bullet_lines") == true)
    assert(report("- aaa\n* bbb")("r_bullet_lines") == false)
    // ellipsis lines: 1 of 2 > 0.3 fails; 1 of 4 ≤ 0.3 passes
    assert(report("xxx...\nyyy")("r_ellipsis_lines") == false)
    assert(report("xxx...\nyy\nzz\nww")("r_ellipsis_lines") == true)
    // symbols: 1 '#' in 5 words → 10 > 5 fails only when words < 10
    assert(report("aaa bbb # ccc ddd")("r_symbol_ratio") == false)
    assert(report("a1 b2 c3 d4 e5 f6 g7 h8 i9 j0 #")("r_symbol_ratio") == true)
    // alpha words: 1 alpha of 4 fails; all-alpha passes
    assert(report("1 2 3 abc")("r_alpha_words") == false)
    assert(report("abc def ghi")("r_alpha_words") == true)
    // stopwords with multiplicity: "the ... the" counts twice
    assert(report("the cat the hat")("r_stop_words") == true)
    assert(report("cat hat mat")("r_stop_words") == false)
    // word count bounds
    assert(report("aaa bbb", minWords = 3)("r_word_count") == false)
    assert(report("aaa bbb ccc", minWords = 3)("r_word_count") == true)
    // null text: every rule false, keep false (never three-valued)
    val nul = report(null)
    assert(Seq("r_word_count", "r_mean_word_len", "r_symbol_ratio",
      "r_bullet_lines", "r_ellipsis_lines", "r_alpha_words", "r_stop_words",
      "keep").forall(nul(_) == false))
  }

  test("registeredDomain: two-level public suffixes take three labels; " +
      "dotless hosts pass through") {
    val cases = Seq(
      "a.b.example.co.uk" -> "example.co.uk",
      "www.example.com" -> "example.com",
      "example.org" -> "example.org",
      "deep.sub.tree.site.com.au" -> "site.com.au",
      "x.co.uk" -> "x.co.uk",
      "co.uk" -> "co.uk", // degenerate: bare suffix has no registrable label
      "localhost" -> "localhost")
    val out = cases.map(_._1).toDF("host")
      .select(col("host"), TextOps.registeredDomain(col("host")).as("rd"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for ((h, want) <- cases) assert(out(h) == want, s"$h -> ${out(h)}")
  }

  test("perplexityBuckets: thirds by integer rank cuts per group, fluent docs head") {
    // 6 docs per group: floor rule gives 2 head, 2 middle, 2 tail
    val docs = (0 until 12).map { i =>
      val g = if (i < 6) "a" else "b"
      // lower i within group = more repetitive bigrams = higher LM score
      val rep = "x y " * (7 - (i % 6))
      (i.toLong, g, rep + ("w" + i + " z" + i + " q" + i))
    }.toDF("id", "grp", "text")
    val out = TextOps.perplexityBuckets(docs, "id", "text", "grp").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(3), r.getString(4)))
    assert(out.length == 12)
    for (g <- Seq("a", "b")) {
      val rows = out.filter(_._2 == g)
      assert(rows.count(_._4 == "head") == 2)
      assert(rows.count(_._4 == "middle") == 2)
      assert(rows.count(_._4 == "tail") == 2)
      // bucket boundaries respect score order
      val minHead = rows.filter(_._4 == "head").map(_._3).min
      val maxMid = rows.filter(_._4 == "middle").map(_._3).max
      val minMid = rows.filter(_._4 == "middle").map(_._3).min
      val maxTail = rows.filter(_._4 == "tail").map(_._3).max
      assert(minHead >= maxMid && minMid >= maxTail)
    }
  }

  test("kmvOverlapMatrix: identical shards estimate 1, disjoint shards 0, " +
      "counts exact vs sketch contents") {
    val rows = (0 until 300).flatMap { i =>
      Seq(("A", s"tok$i"), ("B", s"tok$i"), ("C", s"other$i"))
    }.toDF("shard", "v")
    val sk = TextOps.kmvSketchShards(rows, "shard", "v", k = 64)
    val m = TextOps.kmvOverlapMatrix(sk, k = 64).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val (uAB, iAB, jAB) = m(("A", "B"))
    assert(uAB == 64 && iAB == 64 && jAB == 1.0)
    val (uAC, iAC, jAC) = m(("A", "C"))
    assert(uAC == 64 && iAC == 0L && jAC == 0.0)
    assert(m.size == 3) // unordered pairs only: AB, AC, BC
  }

  test("phraseSearch: occurrence counts with overlap, absent docs dropped, " +
      "single-token phrases work") {
    val df = Seq(
      (1L, "a b c a b"),   // "a b" twice
      (2L, "a c b"),       // no adjacent "a b"
      (3L, "x a b y"),     // once
      (4L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = TextOps.phraseSearch(df, "id", "text", "a b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 2L, 3L -> 1L))
    val one = TextOps.phraseSearch(df, "id", "text", "c")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(one == Map(1L -> 1L, 2L -> 1L))
  }

  test("noveltyCurve: first-seen attribution by min day; repeats within a " +
      "day count once") {
    val df = Seq(
      (0L, "x y z"),       // day 0: {x y z} — all new
      (0L, "x y z"),       // same shingle again: distinct per (day, shingle)
      (1L, "x y z w"))     // day 1: {x y z, y z w} — one new of two
      .toDF("day", "text")
    val out = TextOps.noveltyCurve(df, "day", "text", shingleSize = 3)
      .orderBy("day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((0L, 1L, 1L, 1.0), (1L, 2L, 1L, 0.5)))
  }

  test("oovReport: boundary vocabulary is deterministic; OOV counted with " +
      "multiplicity") {
    val df = Seq(
      ("a", "aa aa bb cc"),   // aa x2 in vocab(2) = {aa, bb}? counts: aa 3, bb 2, cc 1, dd 1
      ("b", "aa bb dd"))
      .toDF("g", "text")
    // vocabSize 2 → vocab = {aa (3), bb (2)}; cc/dd OOV
    val out = TextOps.oovReport(df, "g", "text", 2)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(("a", 4L, 1L, 0.25), ("b", 3L, 1L, 0.333333)))
    // ties at the boundary break token-ascending: with counts dd=1, cc=1
    // and vocabSize 3, 'cc' enters, 'dd' stays out
    val t = TextOps.oovReport(df, "g", "text", 3)
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(2)))
    assert(t.toSeq == Seq(("a", 0L), ("b", 1L))) // dd is b's only OOV
  }

  test("encodingQuality: each rule decides at its integer boundary; null " +
      "text fails all") {
    val df = Seq(
      (1L, "x" * 2000),                         // clean: every rule passes
      (2L, "x" * 999 + "�"),               // 1000·1 <= 1000 → boundary PASS
      (3L, "x" * 998 + "�"),               // 1000·1 >  999  → FAIL
      (4L, "\u0007" + "x" * 499),               // 1000·1 <= 2·500 → boundary PASS
      (5L, "\u0007" + "x" * 498),               // 1000·1 >  2·499 → FAIL
      (6L, "cafÃ© " + "x" * 100),     // one mojibake artifact → FAIL
      (7L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextOps.encodingQuality(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(5), r.getBoolean(6), r.getBoolean(7), r.getBoolean(8))))
      .toMap
    assert(out(1L) == ((true, true, true, true)))
    assert(out(2L) == ((true, true, true, true)))
    assert(out(3L) == ((false, true, true, false)))
    assert(out(4L) == ((true, true, true, true)))
    assert(out(5L) == ((true, false, true, false)))
    assert(out(6L) == ((true, true, false, false)))
    assert(out(7L) == ((false, false, false, false))) // null text fails all
    // tab/newline/CR are NOT control-rule hits (legitimate text whitespace)
    val ws = TextOps.encodingQuality(
      Seq((1L, "a\tb\nc\rd")).toDF("doc_id", "text"), "doc_id", "text")
      .collect()(0)
    assert(ws.getLong(3) == 0L && ws.getBoolean(8))
  }

  test("lengthBatches: bands by token count, batches capped at batchSize, " +
      "padding accounting exact, partition-invariant, shards disjoint") {
    val docs = (1L to 97L).map(i => (i, (1L to (i % 13 + 1)).map(_ => "t")
      .mkString(" "))).toDF("doc_id", "text")
    val m = TextOps.lengthBatches(docs, "doc_id", "text",
      batchSize = 4, bandTokens = 5, shards = 2)
    val rows = m.collect()
    // every doc lands in exactly one batch
    assert(rows.map(_.getLong(2)).sum == 97L)
    // batches never exceed batchSize and waste is the exact padding identity
    assert(rows.forall(r => r.getLong(2) <= 4L))
    assert(rows.forall(r =>
      r.getLong(5) == r.getLong(2) * r.getLong(3) - r.getLong(4)))
    // band bound: max tokens inside a band stays inside the band's range
    assert(rows.forall(r => r.getLong(3) / 5 == r.getLong(0)))
    // shard-disjoint batch ids: parity of batch_id == shard it came from,
    // so two shards can never collide on an id
    // partition-invariance: a different input partitioning yields the SAME manifest
    val m2 = TextOps.lengthBatches(docs.repartition(7), "doc_id", "text",
      batchSize = 4, bandTokens = 5, shards = 2).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(t => (t._1, t._2)).toSeq ==
      m2.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(t => (t._1, t._2)).toSeq)
  }

  test("cmsSketchShards/cmsEstimate: shard merge is an exact identity, " +
      "estimates only overcount, collision-free width is exact") {
    val df = Seq(
      ("s1", "a a a b"), ("s1", "b c"),
      ("s2", "a b b"), ("s3", "c c d"))
      .toDF("src", "text")
    // exact counts: a=4, b=4, c=3, d=1, absent=0
    val probes = Seq("a", "b", "c", "d", "absent")
    val perShard = TextOps.cmsSketchShards(df, "src", "text",
      depth = 3, width = 1024)
    val global = TextOps.cmsSketchShards(df.withColumn("src", lit("g")),
      "src", "text", depth = 3, width = 1024)
    def ests(sk: org.apache.spark.sql.DataFrame, w: Int) =
      TextOps.cmsEstimate(sk, probes, depth = 3, width = w)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = ests(perShard, 1024)
    // merge linearity: per-shard sketches merged == one global sketch
    assert(merged == ests(global, 1024))
    // wide sketch, 4 tokens: no collisions → exact
    assert(merged == Map("a" -> 4L, "b" -> 4L, "c" -> 3L, "d" -> 1L,
      "absent" -> 0L))
    // width 2 forces collisions: still NEVER undercounts (CM guarantee)
    val tight = ests(TextOps.cmsSketchShards(df, "src", "text",
      depth = 3, width = 2), 2)
    val exact = Map("a" -> 4L, "b" -> 4L, "c" -> 3L, "d" -> 1L, "absent" -> 0L)
    exact.foreach { case (t, n) => assert(tight(t) >= n, s"$t: ${tight(t)} < $n") }
  }

  test("collocations: above-chance pairs rank by nano-quantized PMI with " +
      "deterministic ties; minCount floor excludes rare pairs") {
    val docs = (
      (1 to 10).map(_ => "new york") ++
      (1 to 10).map(_ => "new car") ++
      (1 to 10).map(_ => "old york") ++
      (1 to 4).map(_ => "rare pair")).toDF("text")
    val out = TextOps.collocations(docs, "text", minCount = 5, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    // n=68 tokens; (new,car): ln(10·68/(20·10)); (old,york): same value;
    // (new,york): ln(10·68/(20·20)) — tie breaks w1-ascending; the 4-count
    // pair is under the floor
    val n = 68.0
    def pmi(c12: Double, c1: Double, c2: Double): Long =
      math.round(math.log(c12 * n / (c1 * c2)) * 1e9)
    assert(out.toSeq == Seq(
      ("new", "car", 10L, pmi(10, 20, 10)),
      ("old", "york", 10L, pmi(10, 10, 20)),
      ("new", "york", 10L, pmi(10, 20, 20))))
  }

  test("bpeMerges: greedy argmax with deterministic tie-break; merged " +
      "symbols compose; repeated-run single-pass semantics pinned") {
    val docs = Seq("low low low", "lower lower", "newest").toDF("text")
    val out = TextOps.bpeMerges(docs, "text", rounds = 4)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // r1: (l,o)=5 ties (o,w)=5 → left-ascending picks (l,o)
    // r2: (lo,w)=5 dominates
    // r3: (low,e)=2 ties (e,r)=2 → 'e' < 'l@o@w' binary → (e,r)
    // r4: (low,er)=2 is the only pair left at 2
    assert(out.toSeq == Seq(
      (1, "l", "o", 5L), (2, "lo", "w", 5L),
      (3, "e", "r", 2L), (4, "low", "er", 2L)))
    // repeated-symbol runs: the documented leftmost-non-overlapping single
    // pass — "aaa" merges to (aa, a), and the leftover pair surfaces in the
    // NEXT round's counts
    val rep = Seq("aa aa aaa").toDF("text")
    val out2 = TextOps.bpeMerges(rep, "text", rounds = 2)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out2.toSeq == Seq((1, "a", "a", 4L), (2, "aa", "a", 1L)))
  }

  test("bpeFertility: trained merges applied back to the dictionary; " +
      "hand-computed fertility and compression per language") {
    // dictionary: the x3, cat x1. round-1 pairs: (t,h)=3, (h,e)=3,
    // (c,a)=1, (a,t)=1 → argmax tie (h,e) vs (t,h) → 'h' < 't' picks (h,e).
    // encode: the → |t|h@e| = 2 tokens; cat → |c|a|t| = 3 tokens
    val df = Seq((1L, "en", "the the the cat")).toDF("id", "lang", "text")
    val out = TextOps.bpeFertility(df, "lang", "text", rounds = 1).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getString(0) == "en")
    assert(r.getLong(1) == 4L, "n_words = 3 the + 1 cat")
    assert(r.getLong(2) == 9L, "n_tokens = 3x2 + 1x3")
    assert(r.getDouble(3) == 2.25, "fertility = 9/4")
    assert(r.getDouble(4) == 1.333333, "chars_per_token = 12/9 rounded")
    // two languages sharing the global merge table diverge in fertility:
    // a lang whose words the merges cover spends fewer tokens per word
    val two = Seq((1L, "en", "the the the the"), (2L, "de", "und und")
      ).toDF("id", "lang", "text")
    val o2 = TextOps.bpeFertility(two, "lang", "text", rounds = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    // merges (h,e) then (t,he) — or equivalent — fully cover "the" (1 token);
    // "und" stays 3 chars of which none merge
    assert(o2("en") == 1.0, s"en fully merged, got ${o2("en")}")
    assert(o2("de") == 3.0, s"de unmerged, got ${o2("de")}")
  }

  test("ngramDiversity: hand-computed totals, distincts, ratios and " +
      "entropy; short docs contribute whole-text n-grams") {
    val df = Seq((1L, "en", "a b a b"), (2L, "en", "a b"), (3L, "zh", "x"))
      .toDF("id", "lang", "text")
    val out = TextOps.ngramDiversity(df, "lang", "text")
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5)))).toMap
    // en unigrams: a,b,a,b,a,b → 6 total, 2 distinct
    assert(out(("en", 1)) == ((6L, 2L, 0.333333, 693147181L)))
    // en bigrams: "a b","b a","a b" + "a b" → 4 total, 2 distinct
    assert(out(("en", 2))._1 == 4L && out(("en", 2))._2 == 2L &&
      out(("en", 2))._3 == 0.5)
    // en trigrams: "a b a","b a b" + whole-doc "a b" → 3 total, 3 distinct
    assert(out(("en", 3))._1 == 3L && out(("en", 3))._2 == 3L &&
      out(("en", 3))._3 == 1.0)
    // zh single token: every n collapses to the whole text; entropy of a
    // one-token corpus is 0
    Seq(1, 2, 3).foreach { n =>
      assert(out(("zh", n)) == ((1L, 1L, 1.0, 0L)), s"zh n=$n")
    }
    // entropy_nano replay: ln6*1e9 rounded minus (2*round(3*ln3*1e9)) div 6
    val expected = math.rint(math.log(6) * 1e9).toLong -
      (2L * math.rint(3 * math.log(3) * 1e9).toLong) / 6L
    assert(out(("en", 1))._4 == expected)
  }

  test("encodingKeep: the column gate agrees with encodingQuality's keep " +
      "on every rule boundary and on null") {
    val df = Seq((1L, "clean text here"), (2L, "cafÃÂ©"),
      (3L, "x"), (4L, "ok �"), (5L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val report = TextOps.encodingQuality(df, "id", "text")
      .select(col("id"), col("keep")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val gate = df.select(col("id"),
        coalesce(TextOps.encodingKeep(col("text")), lit(false)).as("k"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(report == gate, s"report $report != gate $gate")
  }

  test("histogramShards/QuantileBounds: shard merge is an exact identity; " +
      "bounds contain the true nearest-rank quantiles") {
    val vals = Seq(1L, 2L, 3L, 5L, 6L, 9L, 13L)
    val df = vals.zipWithIndex
      .map { case (v, i) => (if (i % 2 == 0) "a" else "b", v) }
      .toDF("shard", "v")
    // merge law: per-shard histograms summed == single-shard histogram
    val sharded = TextOps.histogramShards(df, "shard", "v", 4L)
      .groupBy("bucket").agg(sum("n").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = TextOps.histogramShards(df.withColumn("shard", lit("x")),
        "shard", "v", 4L)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(sharded == direct)
    val bounds = TextOps.histogramQuantileBounds(
        TextOps.histogramShards(df, "shard", "v", 4L), 4L, Seq(500, 990))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    // total 7: p500 rank ceil(3.5)=4 → 4th value 5 ∈ bucket 1 = [4,7];
    // p990 rank 7 → 13 ∈ bucket 3 = [12,15]
    assert(bounds(500) == ((4L, 4L, 7L)))
    assert(bounds(990) == ((7L, 12L, 15L)))
    val sorted = vals.sorted
    assert(sorted(4 - 1) >= 4 && sorted(4 - 1) <= 7)
    assert(sorted(7 - 1) >= 12 && sorted(7 - 1) <= 15)
  }

  test("searchSnippets: first occurrence only, edge clamping both sides, " +
      "absent docs dropped") {
    val df = Seq(
      (1L, "merge at the very start of this longer document body"),
      (2L, "a b c d e f merge x y z w v"),
      (3L, "ending with a merge"),
      (4L, "no match here at all")).toDF("id", "text")
    val out = TextOps.searchSnippets(df, "id", "text", "merge", window = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(out(1L) == ((1L, "merge at the")))      // left edge clamps
    assert(out(2L) == ((7L, "e f merge x y")))     // full window both sides
    assert(out(3L) == ((4L, "with a merge")))      // right edge clamps
    assert(!out.contains(4L))
  }

  test("decayedTrendingTerms: power-of-two day weights, window cutoff, " +
      "deterministic tie-break") {
    // md = 2; weights: day 2 → 2, day 1 → 1, day 0 → outside maxAge=1
    val df = Seq((0L, "stale stale stale stale stale stale stale stale"),
      (1L, "old old old old"), (2L, "new new"))
      .toDF("day", "text")
    val out = TextOps.decayedTrendingTerms(df, "day", "text", maxAge = 1,
        topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // new: 2·2 = 4 ties old: 4·1 = 4 → term asc puts "new" first; "stale"
    // is outside the window entirely
    assert(out == Seq(("new", 4L, 2L), ("old", 4L, 4L)))
  }

  test("lengthHistogram: exact bit-length buckets; empty and null docs " +
      "land in bucket 0") {
    val df = Seq(
      (1L, "s1", "a"),                      // 1 token  → bucket 1
      (2L, "s1", "a b c"),                  // 3 tokens → bucket 2
      (3L, "s1", "a b c d"),                // 4 tokens → bucket 3
      (4L, "s1", ""),                       // 0 tokens → bucket 0
      (5L, "s2", null.asInstanceOf[String]) // null     → bucket 0
    ).toDF("id", "source", "text")
    val out = TextOps.lengthHistogram(df, "source", "text")
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out(("s1", 1)) == ((1L, 1L, 1L, 1L)))
    assert(out(("s1", 2)) == ((1L, 3L, 3L, 3L)))
    assert(out(("s1", 3)) == ((1L, 4L, 4L, 4L)))
    assert(out(("s1", 0)) == ((1L, 0L, 0L, 0L)))
    assert(out(("s2", 0)) == ((1L, 0L, 0L, 0L)))
    // power-of-two boundary: 7 → bucket 3, 8 → bucket 4 (bit length, not
    // a float log2 that could misround at the boundary)
    val p = Seq((1L, "s", (1 to 7).map(_ => "t").mkString(" ")),
      (2L, "s", (1 to 8).map(_ => "t").mkString(" "))).toDF("id", "source", "text")
    val pb = TextOps.lengthHistogram(p, "source", "text")
      .collect().map(r => r.getInt(1) -> r.getLong(3)).toMap
    assert(pb == Map(3 -> 7L, 4 -> 8L))
  }

  test("blocklistReport/Survivors: token-granular gate (no substring false " +
      "positives), per-source floor-permille rates") {
    val docs = Seq(
      (1L, "a", "clean text here"),
      (2L, "a", "contains BADWORD today"),        // case-folded hit
      (3L, "a", "notbadword embedded is fine"),   // substring must NOT trip
      (4L, "b", "badword badword twice"),
      (5L, "b", "all clear"),
      (6L, "b", "spotless"))
      .toDF("id", "source", "text")
    val rep = TextOps.blocklistReport(docs, "source", "text", Seq("badword"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(rep("a") == ((3L, 1L, 2L, 333L)), s"source a: $rep")
    assert(rep("b") == ((3L, 1L, 2L, 333L)), s"source b: $rep")
    val kept = TextOps.blocklistSurvivors(docs, "text", Seq("badword"))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 5L, 6L), "doc 3's substring must survive")
    // mixed-case blocklist entries fold to the token case before matching
    val mixed = TextOps.blocklistReport(docs, "source", "text", Seq("BadWord"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(mixed == Map("a" -> 1L, "b" -> 1L),
      "a mixed-case entry must still gate")
  }

  test("prefixCacheSavings: shared first-k tokens group, short docs use " +
      "their whole text, singletons and null text excluded") {
    val docs = Seq(
      (1L, "you are a helpful assistant answer briefly alpha"),
      (2L, "you are a helpful assistant answer briefly beta gamma"),
      (3L, "you are a helpful assistant but different tail"),
      (4L, "short doc"),          // 2-token prefix, shared with doc 5
      (5L, "short doc"),          // identical short doc
      (6L, "totally unrelated text nobody shares"),
      (7L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = graft.ops.TextOps.prefixCacheSavings(docs, "doc_id", "text",
        k = 5)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // "short doc": prefix len 2, 2 docs → 2 saved;
    // "you are a helpful assistant": prefix len 5, 3 docs → 10 saved
    assert(out.toSeq == Seq((2L, 2L, 2L), (5L, 3L, 10L)), s"$out")
  }

  test("crossDocNgramDupRatio: mirrored docs read fully duplicated, a " +
      "novel doc reads clean, shared spans count exactly (round 18)") {
    val docs = Seq(
      (1L, "a b c d e f"),         // mirrored in 2
      (2L, "a b c d e f"),         // exact copy
      (3L, "x y z w q r"),         // novel: zero overlap
      (4L, "a b c q q2 q3"))       // shares exactly the "a b c" 3-gram
      .toDF("id", "text")
    val out = TextOps.crossDocNgramDupRatio(docs, "id", "text", n = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // 6 tokens -> 4 distinct 3-grams per doc
    assert(out(0) == (1L, 4L, 4L, 1.0) && out(1) == (2L, 4L, 4L, 1.0),
      s"mirrored docs are 100% duplicated: ${out.toSeq}")
    assert(out(2) == (3L, 4L, 0L, 0.0), s"novel doc is clean: ${out.toSeq}")
    assert(out(3) == (4L, 4L, 1L, 0.25),
      s"exactly the shared 'a b c' 3-gram counts: ${out.toSeq}")
  }

  test("dedupeChunks: the FIRST corpus occurrence of a repeated chunk " +
      "survives, later ones drop, survivors reassemble in order, and a " +
      "fully-copied doc dedups to empty text (round 18)") {
    val w = (1 to 8).map(i => s"w$i").mkString(" ")   // one full 8-word chunk
    val docs = Seq(
      (1L, s"$w u1 u2 u3"),        // chunk0 = w (first), chunk1 = "u1 u2 u3"
      (2L, s"$w v1 v2 v3"),        // chunk0 duplicates doc 1's -> drops
      (3L, w))                     // the whole doc duplicates -> empty
      .toDF("id", "text")
    val out = TextOps.dedupeChunks(docs, "id", "text", chunkWords = 8)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) == (1L, 2L, 0L, s"$w u1 u2 u3"),
      s"the first occurrence keeps everything: ${out.toSeq}")
    assert(out(1) == (2L, 2L, 1L, "v1 v2 v3"),
      s"the repeated span drops, the novel tail survives: ${out.toSeq}")
    assert(out(2) == (3L, 1L, 1L, ""),
      s"a fully-copied doc dedups to empty text: ${out.toSeq}")
    // order-preservation under a repeated MIDDLE chunk
    val mid = Seq(
      (10L, s"$w"),
      (11L, s"p1 p2 p3 p4 p5 p6 p7 p8 $w t1 t2"))
      .toDF("id", "text")
    val r11 = TextOps.dedupeChunks(mid, "id", "text", chunkWords = 8)
      .where($"id" === 11L).collect().head
    assert(r11.getString(3) == "p1 p2 p3 p4 p5 p6 p7 p8 t1 t2",
      s"survivors must reassemble in position order: ${r11.getString(3)}")
  }
}
