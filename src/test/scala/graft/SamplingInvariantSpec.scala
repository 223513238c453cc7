package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Sampling, Similarity}

/**
 * Partition-invariance and algebraic laws for the round-9-continuation
 * sampling/fusion family, pinned on seeded random corpora (the
 * ChunkPackInvariantSpec discipline): every operator here claims its result
 * is a pure function of the input SET — so shuffling the physical layout
 * (repartition, input order) must never change a single output row.
 */
class SamplingInvariantSpec extends SparkSpec {
  _quiet
  import spark.implicits._

  private val rng = new scala.util.Random(20260814L)

  private def randomDocs(n: Int) = {
    val langs = Seq("en", "de", "fr", "zh")
    (0 until n).map { _ =>
      val id = rng.nextLong().abs % 1000000L
      val lang = langs(rng.nextInt(langs.length))
      val words = (0 until 1 + rng.nextInt(12))
        .map(_ => s"w${rng.nextInt(30)}").mkString(" ")
      (id, lang, words)
    }.distinctBy(_._1).toDF("id", "lang", "text")
  }

  test("prioritySample is partition- and order-invariant (5 seeded rounds)") {
    for (_ <- 1 to 5) {
      val df = randomDocs(300).withColumn("w", length(col("text")).cast("long"))
      val a = Sampling.prioritySample(df, "id", "w", 40)
        .select("id").collect().map(_.getLong(0)).toSet
      val b = Sampling.prioritySample(df.repartition(13).orderBy(rand(7)),
          "id", "w", 40)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(a == b, "weighted sample must be a pure function of the id set")
    }
  }

  test("coverageSplit: invariant under repartition; guarantee holds for " +
      "every cell at every random size (5 seeded rounds)") {
    for (_ <- 1 to 5) {
      val df = randomDocs(250)
      val s1 = Sampling.coverageSplit(df, "id", "lang", 10, 800)
        .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val s2 = Sampling.coverageSplit(df.repartition(11), "id", "lang", 10, 800)
        .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(s1 == s2)
      // guarantee: every cell has min(10, cell size) test rows
      val byCell = df.select("id", "lang").collect()
        .groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(0)).toSet)
      byCell.foreach { case (lang, ids) =>
        val nTest = ids.count(id => s1(id) == "test")
        assert(nTest >= math.min(10, ids.size), s"cell $lang under-covered")
      }
    }
  }

  test("dedupNormalized: exhaustive exclusive clustering, invariant under " +
      "repartition (5 seeded rounds)") {
    for (_ <- 1 to 5) {
      val df = randomDocs(200)
      val out = Dedup.dedupNormalized(df, "id", "text")
      val survivors = out.select("id").collect().map(_.getLong(0)).toSet
      // exhaustive: cluster sizes account for every input row
      assert(out.agg(sum("n_variants")).head().getLong(0) == df.count())
      // exclusive: survivors' normalized keys are unique
      val keys = df.where(col("id").isin(survivors.toSeq: _*))
        .select(Dedup.normalizeText(col("text"))).collect().map(_.getString(0))
      assert(keys.length == keys.distinct.length)
      val again = Dedup.dedupNormalized(df.repartition(9), "id", "text")
        .select("id").collect().map(_.getLong(0)).toSet
      assert(survivors == again)
    }
  }

  test("rrfFuse is commutative in its ranking lists and stable under " +
      "repartition (5 seeded rounds)") {
    for (_ <- 1 to 5) {
      val mk = () => (0 until 30)
        .map(i => (rng.nextLong().abs % 500L, (i + 1).toLong))
        .distinctBy(_._1).toDF("id", "rank")
      val (a, b, c) = (mk(), mk(), mk())
      def run(lists: Seq[org.apache.spark.sql.DataFrame]) =
        Similarity.rrfFuse(lists, "id", 60, 15)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(run(Seq(a, b, c)) == run(Seq(c, a, b)),
        "fusion must not depend on list order")
      assert(run(Seq(a.repartition(5), b, c)) == run(Seq(a, b, c)))
    }
  }

  test("pair-table increment law: write + chained appends ≡ the scratch " +
      "mine at every threshold, for any batch split (5 seeded rounds)") {
    for (round <- 1 to 5) {
      // heavy-overlap vocabulary so pairs actually form
      val docs = (0 until 60).map { i =>
        val base = rng.nextInt(5)
        val words = (0 until 6).map(j =>
          if (rng.nextInt(4) == 0) s"v${rng.nextInt(40)}"
          else s"c${base}_$j").mkString(" ")
        (i.toLong, words)
      }.toDF("id", "text")
      // random split into 1 + nAppends batches
      val nAppends = 1 + rng.nextInt(3)
      val tagged = docs.withColumn("b",
        pmod(col("id") * 2654435761L, lit(nAppends + 1)))
      val path = java.nio.file.Files.createTempDirectory(
        s"graft_pairlaw_$round").toString + "/p"
      Dedup.writePairs(tagged.where(col("b") === 0), "id", "text", path,
        shingleSize = 2, minJaccard = 0.2, maxDf = None)
      (1 to nAppends).foreach { b =>
        Dedup.appendPairs(tagged.where(col("b") === b), "id", "text", path,
          shingleSize = 2, minJaccard = 0.2, maxDf = None)
      }
      def canon(df: org.apache.spark.sql.DataFrame) = df
        .select(col("id_a"), col("id_b"), col("inter")).collect()
        .map(_.toSeq).toSet
      for (t <- Seq(0.2, 0.5, 0.8)) {
        val inc = canon(Dedup.readPairs(spark, path, threshold = t))
        val scratch = canon(Dedup.ngramJaccardPairs(docs, "id", "text",
          shingleSize = 2, threshold = t, maxDf = None))
        assert(inc == scratch,
          s"round $round t=$t split=$nAppends: " +
            s"${(inc diff scratch).take(3)} / ${(scratch diff inc).take(3)}")
      }
    }
  }

  test("pair-table LIFECYCLE law: any interleaving of TAGGED appends (with " +
      "random blind crash-retries, immediate or after later maintenance), " +
      "compactions, and deletions, closed by a retention prune, ≡ the " +
      "scratch mine of the surviving docs at the pruned floor (3 rounds)") {
    for (round <- 1 to 3) {
      val docs = (0 until 48).map { i =>
        val base = rng.nextInt(4)
        val words = (0 until 6).map(j =>
          if (rng.nextInt(4) == 0) s"v${rng.nextInt(30)}"
          else s"c${base}_$j").mkString(" ")
        (i.toLong, words)
      }.toDF("id", "text")
      val nAppends = 2 + rng.nextInt(2)
      val tagged = docs.withColumn("b",
        pmod(col("id") * 2654435761L, lit(nAppends + 1)))
      val path = java.nio.file.Files.createTempDirectory(
        s"graft_pairlife_$round").toString + "/p"
      Dedup.writePairs(tagged.where(col("b") === 0), "id", "text", path,
        shingleSize = 2, minJaccard = 0.2, maxDf = None)
      var ingested = tagged.where(col("b") === 0)
        .select(col("id")).collect().map(_.getLong(0)).toSet
      var removed = Set.empty[Long]
      (1 to nAppends).foreach { b =>
        def append(): Unit =
          Dedup.appendPairs(tagged.where(col("b") === b), "id", "text", path,
            shingleSize = 2, minJaccard = 0.2, maxDf = None,
            batchId = Some(s"law-$round-$b"))
        append()
        // blind crash-retry of the batch just committed: the tag makes it
        // an exact no-op wherever it lands
        if (rng.nextInt(2) == 0) append()
        ingested ++= tagged.where(col("b") === b)
          .select(col("id")).collect().map(_.getLong(0))
        // random maintenance after each append: compact, delete a couple
        // of already-ingested docs, or nothing — order must not matter
        rng.nextInt(4) match {
          case 0 => Dedup.compactPairs(spark, path, targetFiles = 2)
          case 1 =>
            val victims = rng.shuffle((ingested -- removed).toSeq).take(2)
            if (victims.nonEmpty) {
              Dedup.removeFromPairs(spark, path,
                victims.toDF("id"))
              removed ++= victims
            }
          case 2 => // size-tiered minor merges on the plain manifest tables
            graft.store.ManifestTable.minorCompact(spark, path + "/pairs",
              smallBytes = Seq(1500L, 1L << 20)(rng.nextInt(2))): Unit
            graft.store.ManifestTable.minorCompact(spark, path + "/postings",
              smallBytes = Seq(1500L, 1L << 20)(rng.nextInt(2))): Unit
          case _ => ()
        }
        // a LATE retry — after a compaction folded the tagged files into
        // anonymous rows, or after a deletion touched the batch's pairs —
        // must still no-op on the committed tag rather than re-append
        if (rng.nextInt(3) == 0) append()
      }
      Dedup.prunePairs(spark, path, newMinJaccard = 0.5, targetFiles = 2)
      def canon(df: org.apache.spark.sql.DataFrame) = df
        .select(col("id_a"), col("id_b"), col("inter")).collect()
        .map(_.toSeq).toSet
      val surviving = docs.where(!col("id").isin(removed.toSeq: _*))
      for (t <- Seq(0.5, 0.8)) {
        val life = canon(Dedup.readPairs(spark, path, threshold = t))
        val scratch = canon(Dedup.ngramJaccardPairs(surviving, "id", "text",
          shingleSize = 2, threshold = t, maxDf = None))
        assert(life == scratch,
          s"round $round t=$t removed=$removed: " +
            s"${(life diff scratch).take(3)} / ${(scratch diff life).take(3)}")
      }
    }
  }

  test("BM25 LIFECYCLE law: any interleaving of TAGGED appends (with blind " +
      "immediate/late retries), compactions, deletions, and drain-rule " +
      "VACUUMS ≡ the from-scratch index of the surviving docs (3 rounds)") {
    import graft.ops.TextOps
    import graft.store.Compaction
    for (round <- 1 to 3) {
      val docs = (0 until 40).map { i =>
        val words = (0 until 4 + rng.nextInt(5))
          .map(_ => s"w${rng.nextInt(12)}").mkString(" ")
        (i.toLong, words)
      }.toDF("id", "text")
      val nAppends = 2 + rng.nextInt(2)
      val tagged = docs.withColumn("b",
        pmod(col("id") * 2654435761L, lit(nAppends + 1)))
      val path = java.nio.file.Files.createTempDirectory(
        s"graft_bmlife_$round").toString + "/bm25"
      TextOps.writeBm25Index(tagged.where(col("b") === 0), "id", "text",
        path, nBuckets = 4)
      var ingested = tagged.where(col("b") === 0)
        .select(col("id")).collect().map(_.getLong(0)).toSet
      var removed = Set.empty[Long]
      (1 to nAppends).foreach { b =>
        def append(): Unit = TextOps.appendBm25Index(
          tagged.where(col("b") === b), "id", "text", path, nBuckets = 4,
          batchId = Some(s"bmlaw-$round-$b"))
        append()
        if (rng.nextInt(2) == 0) append() // blind immediate retry
        ingested ++= tagged.where(col("b") === b)
          .select(col("id")).collect().map(_.getLong(0))
        rng.nextInt(6) match {
          case 0 => TextOps.compactBm25Index(spark, path, targetFiles = 2): Unit
          case 1 =>
            val victims = rng.shuffle((ingested -- removed).toSeq).take(2)
            if (victims.nonEmpty) {
              TextOps.removeFromBm25Index(spark, path, victims.toDF("id"))
              removed ++= victims
            }
          case 2 => Compaction.vacuumPartitions(spark, path + "/postings",
            keepPrevious = false): Unit
          // size-tiered MINOR merge at a random threshold: sometimes a
          // partial merge that leaves retained references, sometimes a
          // full fold — either way the law must hold
          case 3 => Compaction.minorCompactPartitions(spark,
            path + "/postings",
            smallBytes = Seq(1200L, 2500L, 1L << 20)(rng.nextInt(3))): Unit
          case 4 => Compaction.autoMaintain(spark, path + "/postings",
            smallBytes = 2500L, minorAt = 2, majorAt = 6,
            targetFiles = 2): Unit
          case _ => ()
        }
        if (rng.nextInt(3) == 0) append() // late retry: must no-op on the tag
      }
      val fresh = java.nio.file.Files.createTempDirectory(
        s"graft_bmlife_f$round").toString + "/bm25"
      TextOps.writeBm25Index(docs.where(!col("id").isin(removed.toSeq: _*)),
        "id", "text", fresh, nBuckets = 4)
      // rows, membership, stats, and probe scores must ALL equal scratch
      def rows(p: String) = Compaction.readPartitioned(spark,
          p + "/postings", "bucket").get
        .select(col("id"), col("term"), col("tf"), col("dl"), col("bucket"))
        .collect().map(_.toSeq).toSet
      assert(rows(path) == rows(fresh), s"round $round removed=$removed")
      assert(graft.store.ManifestTable.read(spark, path + "/stats").collect().map(_.toSeq).toSet ==
        graft.store.ManifestTable.read(spark, fresh + "/stats").collect().map(_.toSeq).toSet)
      val terms = Seq("w1", "w5", "w9")
      assert(TextOps.bm25TopKFromIndex(spark, path, terms, 40, nBuckets = 4)
          .collect().map(_.toSeq).toSeq ==
        TextOps.bm25TopKFromIndex(spark, fresh, terms, 40, nBuckets = 4)
          .collect().map(_.toSeq).toSeq,
        s"round $round: probe must equal the from-scratch survivor index")
    }
  }

  test("IVF LIFECYCLE law: any interleaving of TAGGED appends (with blind " +
      "retries), compactions, deletions, and vacuums leaves the layout " +
      "row-identical to a from-scratch write of the survivors (3 rounds)") {
    import graft.store.Compaction
    for (round <- 1 to 3) {
      val vecs = (0 until 36).map { i =>
        val a = rng.nextDouble() * math.Pi * 2
        (i.toLong, Seq(math.cos(a).toFloat, math.sin(a).toFloat))
      }.toDF("id", "vec")
      val nAppends = 2 + rng.nextInt(2)
      val tagged = vecs.withColumn("b",
        pmod(col("id") * 2654435761L, lit(nAppends + 1)))
      val cents = Similarity.ivfCentroids(tagged.where(col("b") === 0),
        "id", "vec", k = 3)
      val path = java.nio.file.Files.createTempDirectory(
        s"graft_ivflife_$round").toString + "/ivf"
      Similarity.writeIvfCorpus(tagged.where(col("b") === 0), "id", "vec",
        path, cents)
      var ingested = tagged.where(col("b") === 0)
        .select(col("id")).collect().map(_.getLong(0)).toSet
      var removed = Set.empty[Long]
      (1 to nAppends).foreach { b =>
        def append(): Unit = Similarity.appendIvfCorpus(
          tagged.where(col("b") === b), "id", "vec", path, cents,
          batchId = Some(s"ivflaw-$round-$b"))
        append()
        if (rng.nextInt(2) == 0) append()
        ingested ++= tagged.where(col("b") === b)
          .select(col("id")).collect().map(_.getLong(0))
        rng.nextInt(6) match {
          case 0 => Similarity.compactIvfCorpus(spark, path, targetFiles = 2): Unit
          case 1 =>
            val victims = rng.shuffle((ingested -- removed).toSeq).take(2)
            if (victims.nonEmpty) {
              Similarity.removeFromIvfCorpus(spark, path,
                victims.toDF("id")): Unit
              removed ++= victims
            }
          case 2 => Compaction.vacuumPartitions(spark, path,
            keepPrevious = false): Unit
          case 3 => Compaction.minorCompactPartitions(spark, path,
            smallBytes = Seq(1200L, 2500L, 1L << 20)(rng.nextInt(3))): Unit
          case 4 => Compaction.autoMaintain(spark, path, smallBytes = 2500L,
            minorAt = 2, majorAt = 6, targetFiles = 2): Unit
          case _ => ()
        }
        if (rng.nextInt(3) == 0) append()
      }
      val fresh = java.nio.file.Files.createTempDirectory(
        s"graft_ivflife_f$round").toString + "/ivf"
      Similarity.writeIvfCorpus(
        vecs.where(!col("id").isin(removed.toSeq: _*)), "id", "vec", fresh,
        cents)
      def rows(p: String) = Compaction.readPartitioned(spark, p, "cell").get
        .collect().map(_.toSeq).toSet
      assert(rows(path) == rows(fresh),
        s"round $round removed=$removed: lifecycle layout must equal the " +
          "survivor scratch write (same rows, same pinned cells)")
    }
  }

  test("SRP LIFECYCLE law: tagged appends (blind retries), compactions, " +
      "deletions (removeFromBucketedCorpus), and vacuums leave the layout " +
      "row-identical to a from-scratch write of the survivors (3 rounds)") {
    import graft.store.Compaction
    for (round <- 1 to 3) {
      val vecs = (0 until 36).map { i =>
        val a = rng.nextDouble() * math.Pi * 2
        (i.toLong, Seq(math.cos(a).toFloat, math.sin(a).toFloat,
          (rng.nextDouble() - 0.5).toFloat))
      }.toDF("id", "vec")
      val nAppends = 2 + rng.nextInt(2)
      val tagged = vecs.withColumn("b",
        pmod(col("id") * 2654435761L, lit(nAppends + 1)))
      val path = java.nio.file.Files.createTempDirectory(
        s"graft_srplife_$round").toString + "/srp"
      Similarity.writeBucketedCorpus(tagged.where(col("b") === 0),
        "id", "vec", path, nBits = 4)
      var ingested = tagged.where(col("b") === 0)
        .select(col("id")).collect().map(_.getLong(0)).toSet
      var removed = Set.empty[Long]
      (1 to nAppends).foreach { b =>
        def append(): Unit = Similarity.appendBucketedCorpus(
          tagged.where(col("b") === b), "id", "vec", path, nBits = 4,
          batchId = Some(s"srplaw-$round-$b"))
        append()
        if (rng.nextInt(2) == 0) append()
        ingested ++= tagged.where(col("b") === b)
          .select(col("id")).collect().map(_.getLong(0))
        rng.nextInt(6) match {
          case 0 => Similarity.compactBucketedCorpus(spark, path,
            targetFiles = 2): Unit
          case 1 =>
            val victims = rng.shuffle((ingested -- removed).toSeq).take(2)
            if (victims.nonEmpty) {
              Similarity.removeFromBucketedCorpus(spark, path,
                victims.toDF("id")): Unit
              removed ++= victims
            }
          case 2 => Compaction.vacuumPartitions(spark, path,
            keepPrevious = false): Unit
          case 3 => Compaction.minorCompactPartitions(spark, path,
            smallBytes = Seq(1200L, 2500L, 1L << 20)(rng.nextInt(3))): Unit
          case 4 => Compaction.autoMaintain(spark, path, smallBytes = 2500L,
            minorAt = 2, majorAt = 6, targetFiles = 2): Unit
          case _ => ()
        }
        if (rng.nextInt(3) == 0) append()
      }
      val fresh = java.nio.file.Files.createTempDirectory(
        s"graft_srplife_f$round").toString + "/srp"
      Similarity.writeBucketedCorpus(
        vecs.where(!col("id").isin(removed.toSeq: _*)), "id", "vec", fresh,
        nBits = 4)
      def rows(p: String) = Compaction.readPartitioned(spark, p, "bucket").get
        .collect().map(_.toSeq).toSet
      assert(rows(path) == rows(fresh),
        s"round $round removed=$removed: lifecycle layout must equal the " +
          "survivor scratch write (same rows, same pure-hash buckets)")
      // and the probe surfaces only survivors, scored like scratch
      val q = Seq(1f, 0f, 0f)
      assert(Similarity.annTopKFromBucketed(spark, path, "id", "vec", q, 5,
          nBits = 4).collect().map(_.toSeq).toSeq ==
        Similarity.annTopKFromBucketed(spark, fresh, "id", "vec", q, 5,
          nBits = 4).collect().map(_.toSeq).toSeq)
    }
  }
}
