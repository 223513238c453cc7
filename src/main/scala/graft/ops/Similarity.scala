package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/**
 * Approximate-nearest-neighbor search over an embedding column (north-star
 * extension, BASELINE.json). Two tiers:
 *
 *  - **brute force**: score every row with the codegen'd `cosine_sim` and take
 *    top-k. Correct baseline; on a cluster this is a full scan + a tiny
 *    `TakeOrderedAndProject` (no shuffle of the data, only of k rows per
 *    partition) — viable even at 10^9 vectors when the scan is the bottleneck.
 *  - **LSH-bucketed (IVF-style)**: restrict scoring to rows whose hyperplane
 *    bucket matches one of the query's probe buckets (the bucket itself plus
 *    single-bit flips). At 100 TB the bucket column is a Parquet partition or
 *    Z-order key, so probing reads only matching row groups.
 */
object Similarity {

  /** Exact top-k by cosine against a constant query vector.
    * Returns (id, cos) ordered desc, ties broken by id. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int): DataFrame = {
    val q = array(query.map(v => lit(v)): _*)
    df.select(col(idCol), cosine_sim(col(vecCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /**
   * Embedding-distribution drift between two corpus snapshots — the
   * embedding-space twin of the token-level corpus-drift report: has the
   * encoder (or the data mix) MOVED between yesterday's corpus and
   * today's? Per dimension, both snapshots' counts and means plus the mean
   * shift — the signal that gates an IVF/PQ retrain ([[appendIvfCorpus]]'s
   * documented failure mode is exactly undetected drift) or flags a silent
   * encoder-version mix-up (dimension-level shifts dwarf any data-mix
   * effect when two checkpoint versions interleave).
   *
   * Engine-exact: each float promotes to double and quantizes ONCE to
   * integer micro-units (`round(x·1e6)` — the q88/lmScore rounding
   * contract), sums accumulate in decimal(38,0) (1e12 rows × 1e6 units
   * would overflow a long), and means are integer nano-unit `div`s. Means
   * go NEGATIVE (embedding dimensions center anywhere), so the div sign
   * rule matters: Spark's `div` and DuckDB's `//` both truncate toward
   * zero (verified: −7 div 2 = −3 in both, long and decimal alike) — the
   * one negative-dividend integer division in the library that is safe
   * cross-engine by measurement, where the MMR/margin operators instead
   * avoid division entirely. No float accumulation order anywhere, so the
   * report replays bit-for-bit in SQL. Returns one row per dimension
   * present in EITHER snapshot (full join): a dim only one side has — the
   * checkpoint-version mix-up case — reports with the missing side's
   * count 0 and null means/shift; the row's one-sidedness IS the signal.
   * Schema: (dim, n_old, n_new, mean_old_nano, mean_new_nano, shift_nano).
   *
   * Scale shape: one posexplode scan per snapshot collapsing immediately
   * to the ≤dim-key grid (map-side combined — only (dim, count, sum)
   * triples shuffle); the join is grid-sized. Cost ≈ one pass over each
   * snapshot's vector bytes.
   */
  def embeddingDrift(oldDf: DataFrame, newDf: DataFrame,
      vecCol: String): DataFrame = {
    def grid(df: DataFrame, tag: String) = df
      .where(col(vecCol).isNotNull)
      .select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("dim").cast("bigint").as("dim"),
        round(col("x").cast("double") * 1e6, 0).cast("long").as("xm"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as(s"n_$tag"),
        sum(col("xm").cast("decimal(38,0)")).as(s"s_$tag"))
    grid(oldDf, "old").join(grid(newDf, "new"), Seq("dim"), "full")
      .select(col("dim"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        expr("cast((1000 * s_old) div n_old as long)").as("mean_old_nano"),
        expr("cast((1000 * s_new) div n_new as long)").as("mean_new_nano"),
        (expr("cast((1000 * s_new) div n_new as long)") -
          expr("cast((1000 * s_old) div n_old as long)")).as("shift_nano"))
  }

  /** All-pairs top-k: for each row in `queries`, the k nearest in `corpus`.
    * Broadcast the query side (it is small by assumption) so the corpus never
    * shuffles; rank with a window per query id. */
  def crossTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("corpus_id")) // self-match excluded pre-rank
      .select(col("query_id"), col("corpus_id"), cosine_sim(col("cv"), col("qv")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cos"), col("rank"))
  }

  /**
   * Materialize the corpus partitioned by LSH bucket — the 100 TB layout for
   * [[annTopKFromBucketed]]: each probe becomes a partition-directory prune at
   * the scan, so a query reads ~(1+nBits)/2^nBits of the data instead of all
   * of it. Rewrite the corpus once, probe it millions of times.
   */
  def writeBucketedCorpus(df: DataFrame, idCol: String, vecCol: String,
      path: String, nBits: Int = 8,
      scheme: SrpScheme = SrpScheme.xxh, filesPerLeaf: Int = 0): Unit = {
    require(filesPerLeaf >= 0, "filesPerLeaf must be non-negative (0 = auto)")
    // 0 = size-adaptive (round-18 optimization, guide §2/§6): per-leaf
    // writer count derived from the input size estimate (~512 MB/file)
    // instead of a constant tuned for one scale.
    val fpl = if (filesPerLeaf > 0) filesPerLeaf
      else graft.store.Compaction.adaptiveFilesPerLeaf(df, 1 << nBits)
    df.select(col(idCol), col(vecCol),
        scheme.bucketCol(col(vecCol), nBits).as("bucket"))
      // born at the compaction target: ≤ fpl files per bucket dir
      // instead of tasks × buckets small ones
      .repartition(col("bucket"), pmod(hash(col(idCol)), lit(fpl)))
      .write.partitionBy("bucket").mode("overwrite").parquet(path)
    // each bucket leaf becomes its own manifest table (pure fs metadata) so
    // every later rewrite is reader-concurrent — see graft.store.Compaction
    graft.store.Compaction.migrateLeaves(df.sparkSession, path)
    // a rebuild starts a NEW incarnation: stale lazy-takedown tombstones
    // must not mask the fresh corpus. Drained LAST (a crash before the
    // overwrite starts leaves the old corpus readable with its GDPR
    // tombstones intact — the round-16 drain ordering).
    val tp = new org.apache.hadoop.fs.Path(srpTombstonesDir(path))
    tp.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
      .delete(tp, true): Unit
  }

  /** Incremental index maintenance for a [[writeBucketedCorpus]] layout —
    * the SRP twin of [[appendIvfCorpus]]: a NEW BATCH of vectors routes
    * through the pure bucket function and lands inside each touched leaf's
    * LIVE manifest generation
    * ([[graft.store.Compaction.appendPartitions]]); existing files are
    * untouched and the next [[annTopKFromBucketed]] probe sees old + new
    * through the identical path-pruned scan. This is the ingest half of a
    * live ANN index: the bucket function is a pure function of the vector,
    * so appends never require re-bucketing history (contrast IVF, where
    * drifting centroids eventually force a re-cluster). Run
    * [[compactBucketedCorpus]] when append counts grow the per-bucket file
    * population. With `batchId = Some(tag)` a blind re-run after a crash
    * is exact (committed tags no-op, partial attempts sweep by file
    * prefix); without one a blind retry double-appends. */
  def appendBucketedCorpus(df: DataFrame, idCol: String, vecCol: String,
      path: String, nBits: Int = 8,
      scheme: SrpScheme = SrpScheme.xxh,
      batchId: Option[String] = None): Unit = {
    // a tombstoned id re-arriving would hide its new vector behind its own
    // takedown — refuse loudly; compactBucketedCorpus (the drain) first
    srpTombstones(df.sparkSession, path).foreach { t =>
      val clash = df.select(col(idCol).as("__bid")).distinct()
        .join(t.select(col("id").as("__ts_id")),
          col("__bid") === col("__ts_id"), "left_semi").count()
      if (clash > 0) throw new IllegalStateException(
        s"appendBucketedCorpus($path): $clash batch id(s) are pending " +
          "tombstones — run compactBucketedCorpus to drain before re-ingesting")
    }
    val routed = df.select(col(idCol), col(vecCol),
      scheme.bucketCol(col(vecCol), nBits).as("bucket"))
    graft.store.Compaction.appendPartitions(routed, path, "bucket", batchId): Unit
  }

  private def srpTombstonesDir(path: String): String = path + "/_tombstones"

  /** The PENDING tombstone ids of a [[writeBucketedCorpus]] layout
    * ([[tombstoneBucketedCorpus]]): one `id` column, None when no lazy
    * takedown is outstanding. The `_tombstones` name keeps the sidecar
    * invisible to leaf discovery (leaves are `bucket=` dirs) and to
    * parquet scans. */
  private[graft] def srpTombstones(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(srpTombstonesDir(path))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    // a concurrent compaction's drain may delete the sidecar between the
    // probe above and the read — a drained sidecar means "nothing pending",
    // never a reader error (re-verified gone before mapping to None)
    else try Some(graft.store.ManifestTable.read(spark, srpTombstonesDir(path)))
    catch { case e: org.apache.spark.sql.AnalysisException =>
      if (!fs.exists(p)) None else throw e }
  }

  /**
   * LAZY takedown on a [[writeBucketedCorpus]] layout — the last heavy
   * persisted layout to gain the LSM tombstone discipline
   * ([[tombstoneIvfCorpus]] / [[graft.ops.Dedup.tombstonePairs]] /
   * [[graft.ops.TextOps.tombstoneBm25Index]]): where
   * [[removeFromBucketedCorpus]] rewrites EVERY bucket leaf eagerly (the
   * id list carries no vectors, so no leaf can be pruned — at 100 TB that
   * is a full-layout rewrite per GDPR request), this appends `ids` to the
   * `_tombstones` sidecar in O(|ids|) with ZERO leaf rewrites. The
   * takedown is PROBE-COMPLETE immediately — [[annTopKFromBucketed]]
   * excludes tombstoned ids before ranking — and becomes physical at the
   * next [[compactBucketedCorpus]], which (while tombstones are pending)
   * rewrites every leaf with the same anti-join and drains the sidecar.
   * [[appendBucketedCorpus]] refuses re-ingest of a pending id;
   * [[annTopKFromBucketedPrevious]] deliberately shows the pre-takedown
   * neighborhood (the audit view); [[writeBucketedCorpus]] (a rebuild)
   * drains the sidecar AFTER its fresh layout lands. Reference analogue:
   * the delete-op surface, `DeleteOp.scala:21-39`. Returns the number of
   * ids tombstoned.
   */
  def tombstoneBucketedCorpus(spark: org.apache.spark.sql.SparkSession,
      path: String, ids: DataFrame): Long = {
    val rm = graft.Eager.materialize(
      ids.select(col(ids.columns.head).as("id")).distinct())
    val n = rm.count()
    if (n > 0) graft.store.ManifestTable.append(rm, srpTombstonesDir(path))
    n
  }

  /** File-count compaction for a [[writeBucketedCorpus]] layout — the SRP
    * twin of [[compactIvfCorpus]], same reader-concurrent per-leaf
    * manifest swaps, same oblivious probe results. While
    * [[tombstoneBucketedCorpus]] ids are pending, the compaction applies
    * them PHYSICALLY (every leaf rewrites through the anti-join — exactly
    * the bill [[removeFromBucketedCorpus]] pays eagerly, amortized into
    * the rewrite) and drains the sidecar LAST: a crash leaves tombstones
    * in place, probes stay exact, a blind retry converges. Returns
    * buckets rewritten. */
  def compactBucketedCorpus(spark: org.apache.spark.sql.SparkSession,
      path: String, targetFiles: Int = 4): Int =
    srpTombstones(spark, path) match {
      case None =>
        graft.store.Compaction.compactPartitions(spark, path, targetFiles)
      case Some(ts) =>
        val t = broadcast(graft.Eager.materialize(
          ts.select(col("id").as("__ts_id"))))
        val tsType = ts.schema("id").dataType
        // the id column is structurally FIRST in every leaf
        // (writeBucketedCorpus and appendBucketedCorpus both select
        // (id, vec) before partitioning) — ASSERTED against the sidecar's
        // id type (round-18 advisory): a leaf from an external writer or a
        // reordered select must fail loudly, never anti-join the wrong
        // column and silently delete the wrong rows
        val n = graft.store.Compaction.rewritePartitions(spark, path,
          targetFiles,
          { p =>
            val head = p.schema.head
            require(head.dataType == tsType,
              s"compactBucketedCorpus($path): leaf head column " +
                s"'${head.name}: ${head.dataType.catalogString}' does not " +
                s"match the tombstone sidecar id type " +
                s"(${tsType.catalogString}) — the leaf was not written by " +
                "writeBucketedCorpus/appendBucketedCorpus; drain via " +
                "removeFromBucketedCorpus with an explicit idCol instead")
            p.join(t, col(head.name) === col("__ts_id"), "left_anti")
          })
        val tp = new org.apache.hadoop.fs.Path(srpTombstonesDir(path))
        tp.getFileSystem(spark.sessionState.newHadoopConf())
          .delete(tp, true): Unit
        n
    }

  /** EAGER delete from a [[writeBucketedCorpus]] layout — the SRP twin of
    * [[removeFromIvfCorpus]]: every bucket leaf rewrites through a
    * broadcast anti-join on the removed ids (no leaf skipped — re-deriving
    * the ids' buckets would need their VECTORS, which a takedown list does
    * not carry). That makes this a FULL-LAYOUT rewrite per call — at
    * 100 TB prefer [[tombstoneBucketedCorpus]] (O(|ids|), probe-complete
    * immediately) and let [[compactBucketedCorpus]] apply it physically.
    * Survivors keep their bucket (the pure hash pins it), so the next
    * [[annTopKFromBucketed]] probe equals one over a from-scratch
    * [[writeBucketedCorpus]] of the survivors. READER-CONCURRENT per leaf;
    * ids not present are no-ops; a removal too large to broadcast is a
    * rebuild, not a delete. Returns buckets rewritten. */
  def removeFromBucketedCorpus(spark: org.apache.spark.sql.SparkSession,
      path: String, ids: DataFrame, idCol: String = "id",
      targetFiles: Int = 4): Int = {
    // snapshot once: every concurrent per-leaf job must see one id list
    val rm = broadcast(graft.Eager.materialize(
      ids.select(col(ids.columns.head).as("__rm_id"))))
    graft.store.Compaction.rewritePartitions(spark, path, targetFiles,
      p => p.join(rm, p(idCol) === col("__rm_id"), "left_anti"))
  }

  /** ANN top-k over a [[writeBucketedCorpus]] layout: the probe set (own
    * bucket + every single-bit flip) resolves to the probed buckets' LIVE
    * manifest generations by PATH SELECTION at planning time
    * ([[graft.store.Compaction.resolveLeafDirs]]) — strictly stronger than
    * a partition filter (unprobed leaves are never even listed), and safe
    * under a concurrent [[compactBucketedCorpus]]. Probes into buckets no
    * vector ever hashed to simply resolve to no path; all-absent probes
    * return empty. */
  def annTopKFromBucketed(spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, vecCol: String, query: Seq[Float], k: Int, nBits: Int = 8,
      scheme: SrpScheme = SrpScheme.xxh): DataFrame =
    annTopKOverDirs(spark, path, idCol, vecCol, query, k, nBits, scheme,
      probes => graft.store.Compaction.resolveLeafDirs(
        spark, path, "bucket", probes), masked = true)

  /** The UNDO-WINDOW probe: [[annTopKFromBucketed]] against each probed
    * bucket's PREVIOUS generation — the SRP index as of just before the
    * last rewrite, retained through one keep-one-back cycle. The takedown
    * audit verb on the ANN index ([[ivfTopKFromPartitionedPrevious]]'s SRP
    * twin; reference analogue: HBase time-range reads,
    * Query2.scala:345-359), meaningful when the last maintenance op was
    * layout-wide ([[removeFromBucketedCorpus]] rewrites every bucket).
    * Buckets with no undo window are skipped — a never-rewritten layout
    * probes EMPTY here, not at its live state. */
  def annTopKFromBucketedPrevious(spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, vecCol: String, query: Seq[Float], k: Int,
      nBits: Int = 8, scheme: SrpScheme = SrpScheme.xxh): DataFrame =
    annTopKOverDirs(spark, path, idCol, vecCol, query, k, nBits, scheme,
      probes => graft.store.Compaction.resolveLeafDirsPrevious(
        spark, path, "bucket", probes),
      // the undo/audit view deliberately shows the pre-takedown
      // neighborhood — pending tombstones do not mask it
      masked = false)

  private def annTopKOverDirs(spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, vecCol: String, query: Seq[Float], k: Int,
      nBits: Int, scheme: SrpScheme,
      resolve: Seq[Long] => Seq[String], masked: Boolean): DataFrame = {
    val q = array(query.map(v => lit(v)): _*)
    val qBucket = scheme.compute(query.toArray, nBits)
    val probes = (qBucket +: (0 until nBits).map(b => qBucket ^ (1L << b))).distinct
    val dirs = resolve(probes)
    val corpus =
      if (dirs.nonEmpty) spark.read.parquet(dirs: _*)
      else {
        val leaves = graft.store.Compaction.resolveLeaves(spark, path)
        require(leaves.nonEmpty, s"annTopKFromBucketed: no bucket leaves at $path")
        spark.read.parquet(leaves.head._2).where(lit(false))
      }
    // pending lazy-takedown tombstones never surface in a LIVE probe.
    // EXPLICIT broadcast (round-18 advisory): a takedown list crossing the
    // auto-broadcast threshold must fail loudly, never silently flip the
    // probe to a sort-merge join that shuffles the whole corpus
    val visible = if (!masked) corpus
      else srpTombstones(spark, path) match {
        case None => corpus
        case Some(ts) => corpus.join(
          broadcast(ts.select(col("id").as("__ts_id"))),
          col(idCol) === col("__ts_id"), "left_anti")
      }
    visible
      .select(col(idCol), cosine_sim(col(vecCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Pluggable SRP bucket scheme for [[annTopK]]: the Column expression plus
    * its driver-side twin (the query vector's probe bucket is computed on the
    * driver so the probe set is a literal IN-list the scan filters on). */
  final case class SrpScheme(bucketCol: (Column, Int) => Column,
      compute: (Array[Float], Int) => Long)
  object SrpScheme {
    /** XXH64 planes + double dot — the fast default. */
    val xxh: SrpScheme =
      SrpScheme(hyperplane_bucket, org.apache.spark.sql.graft.HyperplaneBucket.compute)
    /** md5 integer planes + integer dot — exactly replayable in DuckDB SQL. */
    val md5: SrpScheme =
      SrpScheme(md5_hyperplane_bucket, org.apache.spark.sql.graft.Md5HyperplaneBucket.compute)
  }

  /**
   * Per-group centroid of an embedding column, over floor(v·10⁶) integer
   * quantization. The quantized sum is exact bigint arithmetic, so the result
   * is bit-identical under ANY partitioning, task retry, or cluster size —
   * float summation is not (its rounding depends on accumulation order, which
   * reshuffles between runs). Training pipelines want reproducible features;
   * the 1e-6 quantization error is far below embedding noise. Returns
   * (groupCol, dim [1-based], centroid).
   */
  def centroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .select(col(groupCol), (col("pos") + 1).cast("bigint").as("dim"),
        floor(col("v").cast("double") * 1000000.0).cast("bigint").as("q"))
      .groupBy(col(groupCol), col("dim"))
      .agg(sum(col("q")).as("sq"), count(lit(1)).as("n"))
      // no round(): the quotient of exact integers (sums < 2^53) through one
      // IEEE division is already bit-identical on every engine — rounding
      // would only reintroduce engine-specific half-way rules at tie points
      .select(col(groupCol), col("dim"),
        (col("sq") / (col("n") * lit(1000000.0))).as("centroid"))

  /**
   * Deterministic IVF coarse quantizer: k centroids trained by `iters` Lloyd
   * iterations. Every step is reproducible under any partitioning:
   * seeding is hash-ordered (the k vectors with smallest md5 of their id, not
   * a random sample), assignment ties break toward the lowest cell index, and
   * means are the quantized-exact centroids of [[centroids]] (bigint sums — no
   * float accumulation-order drift). Centroids are tiny (k × dim) and ride the
   * driver ↔ executors as literals; each iteration is one scan + one shuffle.
   */
  def ivfCentroids(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 2): Array[Array[Double]] = {
    var cents: Array[Array[Double]] = df
      .select(col(idCol), col(vecCol))
      .withColumn("__h", md5_prefix60(col(idCol).cast("string")))
      .orderBy(col("__h"), col(idCol))
      .limit(k)
      .collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    for (_ <- 1 to iters) {
      val assigned = df.select(col(vecCol).as("v"),
        cellOf(col(vecCol), cents).as("cell"))
      val means = centroids(assigned, "cell", "v")
        .collect()
        .map(r => (r.getInt(0), r.getLong(1).toInt, r.getDouble(2)))
      val next = cents.map(_.clone())
      means.foreach { case (cell, dim, v) => next(cell)(dim - 1) = v }
      cents = next // cells that lost all members keep their previous centroid
    }
    cents
  }

  /** Cell id (0-based) of a vector: argmax cosine against the centroid set,
    * first-listed centroid wins ties. A pure Column expression, so corpus
    * assignment and query-side probing run the SAME arithmetic. */
  def cellOf(vec: Column, cents: Array[Array[Double]]): Column = {
    val scores = array(cents.toIndexedSeq.map(c =>
      cosine_sim(vec, array(c.toIndexedSeq.map(x => lit(x.toFloat)): _*))): _*)
    (array_position(scores, array_max(scores)) - 1).cast("int")
  }

  /** The query's `nProbe` nearest cells, computed with the SAME Column
    * expressions as the corpus assignment (on a one-row frame), so no
    * driver-vs-executor float divergence can misroute the probe. Shared by
    * [[ivfTopK]] and [[ivfTopKFromPartitioned]] — both paths probe
    * identically by construction. */
  private def ivfProbeCells(spark: org.apache.spark.sql.SparkSession,
      query: Seq[Float], cents: Array[Array[Double]], nProbe: Int): Seq[Int] = {
    import spark.implicits._
    val qv = array(query.map(v => lit(v)): _*)
    val scores = Seq(1).toDF("one").select(qv.as("qv"))
      .select(array(cents.indices.map(i =>
        cosine_sim(col("qv"),
          array(cents(i).toIndexedSeq.map(x => lit(x.toFloat)): _*))): _*)
      .as("s")).head().getSeq[Double](0)
    scores.zipWithIndex.sortBy { case (s, i) => (-s, i) }
      .take(nProbe).map(_._2)
  }

  /**
   * IVF ANN top-k: score only the rows whose cell is among the query's
   * `nProbe` nearest cells. Assigns `cell` over the input frame per call —
   * right for ad-hoc corpora; a corpus probed repeatedly should be
   * materialized ONCE with [[writeIvfCorpus]] and queried through
   * [[ivfTopKFromPartitioned]], where the probe prunes partitions at the scan.
   */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, cents: Array[Array[Double]],
      nProbe: Int = 2): DataFrame = {
    val qv = array(query.map(v => lit(v)): _*)
    val probeCells = ivfProbeCells(df.sparkSession, query, cents, nProbe)
    df.select(col(idCol), col(vecCol), cellOf(col(vecCol), cents).as("cell"))
      .where(col("cell").isin(probeCells: _*))
      .select(col(idCol), cosine_sim(col(vecCol), qv).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /**
   * Materialize the corpus partitioned by IVF cell — the 100 TB layout for
   * [[ivfTopKFromPartitioned]] and the IVF twin of [[writeBucketedCorpus]]:
   * assign each vector's cell once at write time, so every later probe is a
   * partition-directory prune reading ~nProbe/k of the data. Rewrite the
   * corpus once (and whenever the centroids are retrained), probe it
   * millions of times.
   */
  private def ivfTombstonesDir(path: String): String = path + "/_tombstones"

  /** The PENDING tombstone ids of a [[writeIvfCorpus]] layout
    * ([[tombstoneIvfCorpus]]): one `id` column, None when no lazy takedown
    * is outstanding. The `_tombstones` name keeps the sidecar invisible to
    * leaf discovery (leaves are `cell=` dirs) and to parquet scans. */
  private[graft] def ivfTombstones(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(ivfTombstonesDir(path))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    // a concurrent compaction's drain may delete the sidecar between the
    // probe above and the read — a drained sidecar means "nothing pending",
    // never a reader error (re-verified gone before mapping to None)
    else try Some(graft.store.ManifestTable.read(spark, ivfTombstonesDir(path)))
    catch { case e: org.apache.spark.sql.AnalysisException =>
      if (!fs.exists(p)) None else throw e }
  }

  /**
   * LAZY takedown on a [[writeIvfCorpus]] layout — the LSM tombstone
   * discipline ([[graft.ops.Dedup.tombstonePairs]]' ANN twin) for the
   * 100 TB regime where [[removeFromIvfCorpus]]' every-cell rewrite is
   * unaffordable synchronously: append `ids` to the `_tombstones` sidecar
   * in O(|ids|) with ZERO cell rewrites. The takedown is PROBE-COMPLETE
   * immediately — [[ivfTopKFromPartitioned]] excludes tombstoned ids
   * before ranking — and becomes physical at the next
   * [[compactIvfCorpus]], which (while tombstones are pending) rewrites
   * every cell with the anti-join it would otherwise pay at takedown time
   * and drains the sidecar. [[appendIvfCorpus]] refuses re-ingest of a
   * pending id; [[retrainIvfCorpus]] excludes tombstoned rows from the
   * blue/green rebuild (the new layout is born clean);
   * [[ivfLayoutHealth]] and [[repairIvfCorpus]] stay PHYSICAL-layout
   * verbs (masked rows still occupy cells until the drain — that is what
   * they audit). The undo-window probe
   * ([[ivfTopKFromPartitionedPrevious]]) deliberately shows the
   * pre-takedown neighborhood — it is the audit view. Returns the number
   * of ids tombstoned.
   */
  def tombstoneIvfCorpus(spark: org.apache.spark.sql.SparkSession,
      path: String, ids: DataFrame): Long = {
    val rm = graft.Eager.materialize(
      ids.select(col(ids.columns.head).as("id")).distinct())
    val n = rm.count()
    if (n > 0) graft.store.ManifestTable.append(rm, ivfTombstonesDir(path))
    n
  }

  /** WITHDRAW a pending lazy takedown on the IVF layout —
    * [[tombstoneIvfCorpus]]' inverse ([[graft.ops.Dedup.untombstonePairs]]'
    * ANN twin): probes stop masking the ids immediately; only meaningful
    * before the next [[compactIvfCorpus]] drains (after it the rows are
    * physically gone). Returns ids un-tombstoned. */
  def untombstoneIvfCorpus(spark: org.apache.spark.sql.SparkSession,
      path: String, ids: DataFrame): Long =
    graft.ops.Dedup.withdrawTombstones(spark, ivfTombstonesDir(path),
      ivfTombstones(spark, path), ids)

  /** WITHDRAW a pending lazy takedown on the SRP layout —
    * [[tombstoneBucketedCorpus]]' inverse; same contract as
    * [[untombstoneIvfCorpus]]. */
  def untombstoneBucketedCorpus(spark: org.apache.spark.sql.SparkSession,
      path: String, ids: DataFrame): Long =
    graft.ops.Dedup.withdrawTombstones(spark, srpTombstonesDir(path),
      srpTombstones(spark, path), ids)

  def writeIvfCorpus(df: DataFrame, idCol: String, vecCol: String,
      path: String, cents: Array[Array[Double]],
      filesPerLeaf: Int = 0): Unit = {
    require(filesPerLeaf >= 0, "filesPerLeaf must be non-negative (0 = auto)")
    // 0 = size-adaptive (round-18 optimization, guide §2/§6): per-cell
    // writer count derived from the input size estimate (~512 MB/file).
    val fpl = if (filesPerLeaf > 0) filesPerLeaf
      else graft.store.Compaction.adaptiveFilesPerLeaf(df, cents.length)
    df.select(col(idCol), col(vecCol), cellOf(col(vecCol), cents).as("cell"))
      // born at the compaction target: ≤ fpl files per cell dir
      // instead of tasks × cells small ones
      .repartition(col("cell"), pmod(hash(col(idCol)), lit(fpl)))
      .write.partitionBy("cell").mode("overwrite").parquet(path)
    // each cell leaf becomes its own manifest table (pure fs metadata), so
    // every later rewrite is reader-concurrent — see graft.store.Compaction
    graft.store.Compaction.migrateLeaves(df.sparkSession, path)
    // a rebuild starts a NEW incarnation: stale tombstones must not mask
    // the fresh corpus. Drained LAST (round-16 advisory's ordering on the
    // manifest rebuilds, applied here for symmetry): a crash BEFORE the
    // overwrite starts leaves the old corpus readable with its GDPR
    // tombstones intact. (A static-mode overwrite wipes the sidecar with
    // the rest of the dir anyway — this delete makes the semantics
    // explicit rather than mode-dependent.)
    val tp = new org.apache.hadoop.fs.Path(ivfTombstonesDir(path))
    tp.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
      .delete(tp, true): Unit
  }

  /** Incremental index maintenance for a [[writeIvfCorpus]] layout — the
    * IVF twin of [[appendBucketedCorpus]]: a NEW batch routes through the
    * SAME pinned centroids (`cents` must be the ones the layout was written
    * with — the layout pins the assignment) and lands in the
    * cell-partitioned directory with `mode("append")`; existing files are
    * untouched and the next [[ivfTopKFromPartitioned]] probe sees old + new
    * through the identical partition-pruned scan. Unlike SRP buckets the
    * cell function is NOT a pure function of the vector — it depends on
    * trained centroids — so appended data drawn from a drifted distribution
    * degrades the layout silently (hot cells erode the nProbe/k pruning
    * ratio). Gate a live index with [[ivfLayoutHealth]] after each append
    * and retrain + rewrite when the occupancy report crosses your skew
    * budget. Run [[compactIvfCorpus]] when append counts grow each cell's
    * file population. The append routes through
    * [[graft.store.Compaction.appendPartitions]], so the files land in
    * each touched leaf's LIVE manifest generation (never as stray flat
    * files a later rewrite would orphan).
    *
    * Crash/retry contract: with `batchId = Some(tag)` the append goes
    * through [[graft.store.Compaction.appendTaggedPartitions]] — a blind
    * re-run after any crash is exact (committed tags no-op, partial
    * attempts are swept by their file prefix before re-appending). Without
    * one, a blind re-run double-appends the batch (duplicate ids in every
    * probe's top-k); recover via [[removeFromIvfCorpus]] on the batch ids
    * or a [[writeIvfCorpus]] rebuild. */
  def appendIvfCorpus(df: DataFrame, idCol: String, vecCol: String,
      path: String, cents: Array[Array[Double]],
      batchId: Option[String] = None): Unit = {
    // a tombstoned id re-arriving would hide its new vector behind its own
    // takedown — refuse loudly; compactIvfCorpus (the drain) first
    ivfTombstones(df.sparkSession, path).foreach { t =>
      val clash = df.select(col(idCol).as("__bid")).distinct()
        .join(t.select(col("id").as("__ts_id")),
          col("__bid") === col("__ts_id"), "left_semi").count()
      if (clash > 0) throw new IllegalStateException(
        s"appendIvfCorpus($path): $clash batch id(s) are pending " +
          "tombstones — run compactIvfCorpus to drain before re-ingesting")
    }
    val routed = df.select(col(idCol), col(vecCol),
      cellOf(col(vecCol), cents).as("cell"))
    graft.store.Compaction.appendPartitions(routed, path, "cell", batchId): Unit
  }

  /** File-count compaction for a [[writeIvfCorpus]] layout — every
    * [[appendIvfCorpus]] lands one more small file set inside each touched
    * `cell=` directory, and the probe's partition-pruned scan pays the
    * open storm. Each cell directory holding more than `targetFiles`
    * parquet files rewrites independently through its leaf MANIFEST
    * ([[graft.store.Compaction]] — concurrent per-leaf generation swaps,
    * keep-one-back retention): READER-CONCURRENT, a probe that resolved
    * its cell dirs just before a swap keeps every file it listed, and a
    * crash strands at most one uncommitted generation (retired by the
    * next rewrite). Rows and cell assignment are untouched — the
    * partition value lives in the directory name — so probe results are
    * oblivious to when this ran (q216 + spec). Returns cells rewritten. */
  def compactIvfCorpus(spark: org.apache.spark.sql.SparkSession, path: String,
      targetFiles: Int = 4): Int =
    ivfTombstones(spark, path) match {
      case None =>
        graft.store.Compaction.compactPartitions(spark, path, targetFiles)
      case Some(ts) =>
        // pending lazy takedowns: apply them PHYSICALLY while rewriting —
        // every cell rewrites (a tombstoned id can live anywhere; pruning
        // by cellOf would trust caller-passed centroids), which is exactly
        // the bill removeFromIvfCorpus pays eagerly, amortized here into
        // the compaction. Drain LAST: a crash leaves tombstones in place,
        // reads stay exact, a blind retry converges.
        val t = broadcast(graft.Eager.materialize(
          ts.select(col("id").as("__ts_id"))))
        val tsType = ts.schema("id").dataType
        // the id column is structurally FIRST in every leaf (writeIvfCorpus
        // and appendIvfCorpus both select (id, vec) before partitioning) —
        // asserted against the sidecar's id type like the SRP twin
        val n = graft.store.Compaction.rewritePartitions(spark, path,
          targetFiles,
          { p =>
            val head = p.schema.head
            require(head.dataType == tsType,
              s"compactIvfCorpus($path): leaf head column " +
                s"'${head.name}: ${head.dataType.catalogString}' does not " +
                s"match the tombstone sidecar id type " +
                s"(${tsType.catalogString}) — the leaf was not written by " +
                "writeIvfCorpus/appendIvfCorpus; drain via " +
                "removeFromIvfCorpus with an explicit idCol instead")
            p.join(t, col(head.name) === col("__ts_id"), "left_anti")
          })
        val tp = new org.apache.hadoop.fs.Path(ivfTombstonesDir(path))
        tp.getFileSystem(spark.sessionState.newHadoopConf())
          .delete(tp, true): Unit
        n
    }

  /** Delete vectors from a [[writeIvfCorpus]] layout — the takedown verb on
    * the ANN index ([[graft.ops.Dedup.removeFromNearDupIndex]]'s twin;
    * without it a removed doc's embedding keeps SURFACING in every future
    * probe). Every cell directory rewrites through an anti-join on the
    * removed ids — independent per-cell stage-and-swap jobs submitted
    * concurrently, and unlike compaction NO cell is skipped (a removed id
    * can live in any cell; routing the ids through `cellOf` to prune the
    * rewrite set would need the centroids and trusts the caller passed the
    * pinned ones — correctness here must not). Cell assignment of the
    * survivors is untouched, so the next [[ivfTopKFromPartitioned]] probe
    * equals one over a from-scratch [[writeIvfCorpus]] of the survivors
    * (oracle q226). READER-CONCURRENT per cell (each leaf is a
    * [[graft.store.ManifestTable]]); ids not present are no-ops.
    * The removal set broadcasts to every rewrite job — right for takedown
    * lists (small by nature); a removal so large it cannot broadcast is a
    * rebuild ([[writeIvfCorpus]] over the survivors), not a delete. */
  def removeFromIvfCorpus(spark: org.apache.spark.sql.SparkSession,
      path: String, ids: DataFrame, idCol: String = "id",
      targetFiles: Int = 4): Int = {
    // snapshot once: every concurrent per-cell job must see one id list,
    // even from a nondeterministic or layout-reading caller plan
    val rm = broadcast(graft.Eager.materialize(
      ids.select(col(ids.columns.head).as("__rm_id"))))
    graft.store.Compaction.rewritePartitions(spark, path, targetFiles,
      p => p.join(rm, p(idCol) === col("__rm_id"), "left_anti"))
  }

  /**
   * Consistency repair / fsck for a [[writeIvfCorpus]] layout — the ANN
   * twin of [[graft.ops.TextOps.repairBm25Index]] /
   * [[graft.ops.Dedup.repairNearDupIndex]]. The layout invariant is that
   * every row sits in the cell the PINNED centroids assign its vector to
   * ([[cellOf]]); an append routed through different centroids (the
   * documented contract violation) or a half-finished blue/green swap
   * leaves MISROUTED rows — silently invisible to every probe whose
   * `nProbe` cells don't happen to include the wrong one. Detection is one
   * full layout scan + argmin against the broadcast centroids; repair
   * rewrites ONLY the cells that hold misrouted rows (per-leaf manifest
   * swaps, reader-concurrent) and re-appends the re-routed rows to their
   * correct cells through the standard append path. Returns a one-row
   * report `(misrouted_rows, cells_rewritten)`; idempotent — a healthy
   * layout repairs to (0, 0) after one scan. Single-maintainer like every
   * other write verb; run pending tagged retries first.
   */
  def repairIvfCorpus(spark: org.apache.spark.sql.SparkSession, path: String,
      cents: Array[Array[Double]], idCol: String = "id",
      vecCol: String = "vec", targetFiles: Int = 4): DataFrame = {
    import graft.store.{Compaction, ManifestTable}
    val live = Compaction.readPartitioned(spark, path, "cell")
      .getOrElse(sys.error(s"repairIvfCorpus: no cell leaves at $path"))
    val mis = graft.Eager.materialize(
      live.withColumn("__correct", cellOf(col(vecCol), cents))
        .where(col("cell").cast("int") =!= col("__correct")))
    val n = mis.count()
    var cellsRewritten = 0L
    if (n > 0) {
      // purge each misrouted row from its WRONG cell only (bounded by the
      // cell count, not the layout) ...
      val wrongCells = mis.select(col("cell")).distinct()
        .collect().map(_.getString(0)).toSeq
      cellsRewritten = wrongCells.length.toLong
      val misIds = broadcast(mis.select(col(idCol).as("__rm_id")))
      wrongCells.foreach { c =>
        ManifestTable.compact(spark, s"$path/cell=$c", targetFiles,
          d => d.join(misIds, d(idCol) === col("__rm_id"), "left_anti"))
      }
      // ... then land the re-routed rows in their correct cells through
      // the standard append (files go into each leaf's live generation)
      Compaction.appendPartitions(
        mis.select(col(idCol), col(vecCol), col("__correct").as("cell")),
        path, "cell"): Unit
    }
    import spark.implicits._
    Seq((n, cellsRewritten)).toDF("misrouted_rows", "cells_rewritten")
  }

  /** Retrain-and-rebuild for a [[writeIvfCorpus]] layout — the verb the
    * drift discipline ends in: when [[ivfLayoutHealth]] /
    * [[embeddingDrift]] cross the caller's skew budget, re-cluster the
    * LIVE corpus (fresh deterministic k-means over every surviving row)
    * and write a fresh layout at `newPath` — BLUE/GREEN: the old layout
    * keeps serving probes untouched until the caller swaps its pointer,
    * because an in-place retrain cannot be reader-concurrent (rows MOVE
    * BETWEEN leaves under retrained centroids, which the per-leaf manifest
    * swaps cannot model). Returns the new pinned centroids — pass exactly
    * these to every probe/append of the new layout; retire the old path
    * once its in-flight scans drain. Row multiset is preserved exactly
    * (the rebuild is a projection of the live leaves). */
  def retrainIvfCorpus(spark: org.apache.spark.sql.SparkSession,
      path: String, newPath: String, idCol: String, vecCol: String,
      k: Int, iters: Int = 2): Array[Array[Double]] = {
    require(path != newPath,
      "retrainIvfCorpus is blue/green: newPath must differ from path")
    val physical = graft.store.Compaction.readPartitioned(spark, path, "cell")
      .getOrElse(sys.error(s"retrainIvfCorpus: no cell leaves at $path"))
      .select(col(idCol), col(vecCol))
    // the blue/green rebuild is a natural drain point: tombstoned rows are
    // logically deleted — the NEW layout is born without them (and without
    // a sidecar; the old path keeps masking until its own compaction)
    val live = ivfTombstones(spark, path) match {
      case None => physical
      case Some(ts) => physical.join(
        broadcast(ts.select(col("id").as("__ts_id"))),
        col(idCol) === col("__ts_id"), "left_anti")
    }
    val cents = ivfCentroids(live, idCol, vecCol, k, iters)
    writeIvfCorpus(live, idCol, vecCol, newPath, cents)
    cents
  }

  /** [[ivfIndexHealth]] over a PERSISTED [[writeIvfCorpus]] layout — the
    * post-append drift gate: no re-assignment runs (the layout's partition
    * column pins each vector's cell); the scan reads only the cell column
    * (pruned to partition metadata + row counts). Reports all `numCells`
    * cells, zero-filled. Returns (cell, n_vectors, permille). */
  def ivfLayoutHealth(spark: org.apache.spark.sql.SparkSession, path: String,
      numCells: Int): DataFrame = {
    require(numCells > 0, "numCells must be positive")
    val live = graft.store.Compaction.readPartitioned(spark, path, "cell")
      .getOrElse(sys.error(s"ivfLayoutHealth: no cell leaves at $path"))
    occupancyReport(spark,
      live.groupBy(col("cell").cast("int").as("cell"))
        .agg(count(lit(1)).as("n")), numCells)
  }

  /** IVF ANN top-k over a [[writeIvfCorpus]] layout: the probe set resolves
    * to the probed cells' LIVE directories by PATH SELECTION at planning
    * time — strictly stronger than a partition filter (unprobed leaves are
    * never even listed), and the per-leaf manifest indirection makes the
    * scan safe under a concurrent compaction. Pass the SAME `cents` the
    * corpus was written with — the layout pins the assignment. */
  def ivfTopKFromPartitioned(spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, vecCol: String, query: Seq[Float], k: Int,
      cents: Array[Array[Double]], nProbe: Int = 2): DataFrame =
    ivfTopKOverDirs(spark, path, idCol, vecCol, query, k,
      probeCells => graft.store.Compaction.resolveLeafDirs(
        spark, path, "cell", probeCells.map(_.toString)),
      cents, nProbe, masked = true)

  /** The UNDO-WINDOW probe: [[ivfTopKFromPartitioned]] against each probed
    * cell's PREVIOUS generation — the index as of just before the last
    * rewrite, which keep-one-back retains through one cycle. The audit
    * verb for a takedown ("what did the delete remove from this query's
    * neighborhood?") and the undo view after a mistaken
    * [[removeFromIvfCorpus]], meaningful when the last maintenance op was
    * layout-wide (deletion rewrites every cell). Cells with no undo window
    * are skipped ([[graft.store.Compaction.resolveLeafDirsPrevious]]) —
    * a never-rewritten layout probes empty here, not at its live state. */
  def ivfTopKFromPartitionedPrevious(spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, vecCol: String, query: Seq[Float], k: Int,
      cents: Array[Array[Double]], nProbe: Int = 2): DataFrame =
    ivfTopKOverDirs(spark, path, idCol, vecCol, query, k,
      probeCells => graft.store.Compaction.resolveLeafDirsPrevious(
        spark, path, "cell", probeCells.map(_.toString)),
      cents, nProbe,
      // the undo/audit view deliberately shows the pre-takedown
      // neighborhood — pending tombstones do not mask it
      masked = false)

  private def ivfTopKOverDirs(spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, vecCol: String, query: Seq[Float], k: Int,
      resolve: Seq[Int] => Seq[String],
      cents: Array[Array[Double]], nProbe: Int, masked: Boolean): DataFrame = {
    val qv = array(query.map(v => lit(v)): _*)
    val probeCells = ivfProbeCells(spark, query, cents, nProbe)
    val dirs = resolve(probeCells)
    val corpus =
      if (dirs.nonEmpty) spark.read.parquet(dirs: _*)
      else {
        // k-means can legally leave cells empty (no leaf dir is ever
        // written for them) — a probe landing only on such cells is a
        // valid empty result, not an error; only a leafless LAYOUT is one
        val leaves = graft.store.Compaction.resolveLeaves(spark, path)
        require(leaves.nonEmpty,
          s"ivfTopKFromPartitioned: no cell leaves at $path")
        spark.read.parquet(leaves.head._2).where(lit(false))
      }
    // pending lazy-takedown tombstones never surface in a LIVE probe.
    // EXPLICIT broadcast (round-18 advisory): a takedown list crossing the
    // auto-broadcast threshold must fail loudly, never silently flip the
    // probe to a sort-merge join that shuffles the probed cells
    val visible = if (!masked) corpus
      else ivfTombstones(spark, path) match {
        case None => corpus
        case Some(ts) => corpus.join(
          broadcast(ts.select(col("id").as("__ts_id"))),
          col(idCol) === col("__ts_id"), "left_anti")
      }
    visible
      .select(col(idCol), cosine_sim(col(vecCol), qv).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /**
   * ANN top-k: hyperplane-LSH bucketing with multi-probe. The corpus is bucketed
   * once (in practice: persisted partitioned by bucket); each query probes
   * 1 + nBits buckets — its own plus every single-bit flip (recovering most
   * near neighbors lost to one wrong sign bit) — and scores only those rows.
   * The query's bucket is computed driver-side (`scheme.compute`) so
   * the probe set is a literal IN-list the scan can filter on directly.
   */
  def annTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, nBits: Int = 8,
      scheme: SrpScheme = SrpScheme.xxh): DataFrame = {
    val q = array(query.map(v => lit(v)): _*)
    val qBucket = scheme.compute(query.toArray, nBits)
    val probes = (qBucket +: (0 until nBits).map(b => qBucket ^ (1L << b))).distinct
    val bucketed = df.select(col(idCol), col(vecCol),
      scheme.bucketCol(col(vecCol), nBits).as("bucket"))
    bucketed
      .where(col("bucket").isin(probes: _*))
      .select(col(idCol), cosine_sim(col(vecCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /**
   * Symmetric per-vector int8 quantization — the 4× storage/bandwidth cut a
   * 100 TB embedding store runs on (float32 → int8 + one scale per vector).
   * `q_i = floor(v_i · 127 / max|v|)`, `scale = max|v| / 127`; dequantized
   * error per element is bounded by `scale` (floor drift < 1 quantum). The
   * arithmetic is ENGINE-PORTABLE by construction: float→double promotion,
   * one multiply, one divide, and an explicit `floor` are identical IEEE
   * operations in any engine (no round-half mode ambiguity — the reason
   * `floor`, not `round`), so a SQL oracle replays the quantized values
   * exactly. Zero vectors quantize to zeros with scale 0. The per-element
   * HOFs are interpreted, not codegen'd — a storage transform touching each
   * vector once, not a hot scoring loop (score with [[quantizedTopK]] or
   * dequantize into the native `cosine_sim`).
   * Returns (id, scale: double, qvec: array&lt;tinyint&gt;).
   */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val maxabs = array_max(transform(col(vecCol), x => abs(x))).cast("double")
    df.select(col(idCol).as("id"), col(vecCol).as("v"),
        maxabs.as("maxabs"))
      .select(col("id"), (col("maxabs") / 127.0d).as("scale"),
        transform(col("v"), x =>
          when(col("maxabs") === 0.0d, lit(0))
            .otherwise(floor(x.cast("double") * 127.0d / col("maxabs"))
              .cast("int"))
            .cast("tinyint")).as("qvec"))
  }

  /** Dequantize [[quantizeInt8]] output back to float vectors:
    * `v'_i = q_i · scale`. */
  def dequantizeInt8(qvecCol: String = "qvec",
      scaleCol: String = "scale"): Column =
    transform(col(qvecCol), q =>
      (q.cast("double") * col(scaleCol)).cast("float"))

  /**
   * Johnson-Lindenstrauss reduction of the embedding column: project each
   * vector onto `outDim` md5-derived signed hyperplanes (integer arithmetic
   * end to end — every coordinate replays exactly in SQL). At 100 TB this is
   * the scan-bandwidth pre-filter of a two-stage ANN: score candidates in
   * the reduced space (outDim ≪ dim ⇒ proportionally fewer bytes and
   * multiplies per row), keep a candidate margin, re-rank the survivors with
   * full-dimension [[bruteForceTopK]]. Distance distortion follows the JL
   * lemma (ε ≈ sqrt(ln n / outDim)); identical vectors project identically,
   * so exact-duplicate recall is unaffected. Pure per-row computation — no
   * shuffle, composes with pushdown. Returns (id, proj: array&lt;bigint&gt;).
   */
  def projectCorpus(df: DataFrame, idCol: String, vecCol: String,
      outDim: Int = 16): DataFrame = {
    require(outDim > 0, "outDim must be positive")
    df.select(col(idCol).as("id"),
      md5_random_projection(col(vecCol), outDim).as("proj"))
  }

  /** Two-stage ANN computing the [[projectCorpus]] reduction inline: rank by
    * cosine in the projected integer space, keep the top `margin · k`
    * candidates, then re-rank ONLY those with full-dimension cosine. This
    * form scans the FULL-width corpus once (the projection is recomputed per
    * row), so it saves multiplies but not scan bytes — the one-table
    * convenience entry. At scale, materialize [[projectCorpus]] once and
    * probe it with [[projectedTopKFromProjected]], whose stage 1 reads only
    * the outDim-wide layout. The margin bounds the recall loss from JL
    * distortion; `margin × k` rows of full vectors move, not the corpus. */
  def projectedTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, outDim: Int = 16, margin: Int = 4): DataFrame = {
    val candidates = df
      .select(col(idCol), col(vecCol),
        projCosine(md5_random_projection(col(vecCol), outDim), query, outDim)
          .as("pcos"))
      .orderBy(col("pcos").desc, col(idCol))
      .limit(margin * k)
    rerank(candidates, idCol, vecCol, query, k)
  }

  /**
   * Stage-1-over-the-materialized-layout twin of [[projectedTopK]]: rank the
   * persisted (id, proj) output of [[projectCorpus]] — outDim·8 bytes per row
   * instead of the full embedding — then join the `margin · k` survivor ids
   * back to the full-dimension corpus for exact re-ranking. The survivor set
   * is tiny, so the join broadcasts it and the full-width read touches only
   * matching rows (through the graft keyed connector, only matching FILES).
   * This is the probe the scaladoc's 100 TB story prescribes: the wide corpus
   * is scanned zero times per query.
   */
  def projectedTopKFromProjected(projected: DataFrame, full: DataFrame,
      idCol: String, vecCol: String, query: Seq[Float], k: Int,
      outDim: Int = 16, margin: Int = 4): DataFrame = {
    val candidates = projected
      .select(col("id").as(idCol), projCosine(col("proj"), query, outDim).as("pcos"))
      .orderBy(col("pcos").desc, col(idCol))
      .limit(margin * k)
    rerank(broadcast(candidates).join(full, idCol), idCol, vecCol, query, k)
  }

  /** Projected-space cosine vs the query's own projection (driver twin keeps
    * the probe a literal). */
  private def projCosine(proj: Column, query: Seq[Float], outDim: Int): Column = {
    val qProj = org.apache.spark.sql.graft.Md5RandomProjection
      .compute(query.toArray, outDim)
    val qp = array(qProj.toIndexedSeq.map(x => lit(x.toDouble)): _*)
    cosine_sim(proj.cast("array<float>"), qp.cast("array<float>"))
  }

  private def rerank(candidates: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int): DataFrame = {
    val qv = array(query.map(v => lit(v)): _*)
    candidates
      .select(col(idCol), cosine_sim(col(vecCol), qv).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Top-k by cosine directly over a QUANTIZED corpus ([[quantizeInt8]]
    * output): cosine is scale-invariant, so the int8 vector scores as-is —
    * no dequantize multiply, no scale column read, and the scan touches a
    * quarter of the bytes the float32 corpus would. The scoring loop is the
    * native `cosine_sim_int8` expression (whole-stage codegen; a HOF cast
    * here would interpret per element in the hot path). */
  def quantizedTopK(df: DataFrame, idCol: String, qvecCol: String,
      query: Seq[Float], k: Int): DataFrame = {
    val q = array(query.map(v => lit(v)): _*)
    df.select(col(idCol), cosine_sim_int8(col(qvecCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /**
   * IVF-PQ two-stage ANN — the composition that is the de-facto default of
   * production vector indexes (faiss `IVFx,PQy`): IVF cells prune the
   * candidate set BEFORE any distance work (only `nProbe` cells' rows are
   * read), then PQ codes score the survivors by asymmetric distance
   * (m table lookups per row over m-byte codes — 32× less scan than float
   * vectors). Probe cells are computed with the SAME Column expressions as
   * the corpus assignment ([[ivfProbeCells]]' anti-divergence discipline),
   * so a query can never be misrouted relative to its own exact copies.
   *
   * This inline form recomputes cell assignment and codes per call — the
   * persisted deployment writes the corpus PARTITIONED BY CELL with codes
   * as a column ([[writeIvfCorpus]]'s layout + [[pqEncode]]), making the
   * probe a partition-pruned scan of code columns only; the scoring
   * arithmetic is identical through this same [[pqTopK]] path.
   */
  def ivfPqTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, cents: Array[Array[Double]],
      cb: PqCodebook, nProbe: Int = 2): DataFrame = {
    require(nProbe > 0, "nProbe must be positive")
    val probes = ivfProbeCells(df.sparkSession, query, cents, nProbe)
    val pruned = df
      .select(col(idCol), col(vecCol), cellOf(col(vecCol), cents).as("cell"))
      .where(col("cell").isin(probes: _*))
    pqTopK(pqEncode(pruned, idCol, vecCol, cb), idCol, "code", cb, query, k)
  }

  /**
   * nDCG@k — the graded-relevance retrieval metric ([[matryoshkaRecall]]
   * measures set overlap; nDCG weights POSITION and GRADE): DCG = Σ rel_i /
   * log2(i+1) over the ranking's top k, normalized by the ideal DCG (the
   * corpus's k best relevance grades in order). `ranking` carries
   * (idCol, rank) 1-based; `relevance` carries (idCol, rel) integer grades
   * for every document (absent docs grade 0).
   *
   * Exactness: each position's discount is nano-quantized ONCE
   * (`round(1e9 / log2(i+1))` — the q73 ln-parity contract) and multiplied
   * by the integer grade, so DCG/IDCG are exact integer sums and the
   * metric replays in SQL. The ideal ranking ties break by id.
   *
   * Scale shape: DCG is a k-row join; the ideal side is a
   * TakeOrderedAndProject over (id, rel) — never a global sort — with the
   * rank window applied to the k survivors only.
   */
  def ndcgAt(ranking: DataFrame, relevance: DataFrame, idCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    def disc(rank: Column) =
      round(lit(1e9) / log2(rank.cast("double") + 1), 0).cast("long")
    val dcg = ranking.where(col("rank") <= k)
      .join(relevance, Seq(idCol), "left")
      .select((coalesce(col("rel"), lit(0L)) * disc(col("rank"))).as("g"))
      .agg(coalesce(sum(col("g")), lit(0L)).as("dcg_nano"))
    val ideal = relevance.orderBy(col("rel").desc, col(idCol)).limit(k)
      .withColumn("irank",
        row_number().over(Window.orderBy(col("rel").desc, col(idCol))))
      .select((col("rel") * disc(col("irank"))).as("g"))
      .agg(coalesce(sum(col("g")), lit(0L)).as("idcg_nano"))
    dcg.crossJoin(ideal)
      .select(col("dcg_nano"), col("idcg_nano"),
        round(col("dcg_nano").cast("double") / col("idcg_nano"), 6)
          .as("ndcg"))
  }

  /**
   * IVF index-health report — [[srpIndexHealth]]'s twin for the
   * centroid-cell layout: per cell, its member count and exact permille
   * share, plus the imbalance diagnostics that decide whether the index
   * is worth probing — `max_share / ideal` tells you how much a hot cell
   * erodes the nProbe/k pruning ratio, and EMPTY cells (reported as
   * zero-count rows — the report covers all k cells, not just occupied
   * ones) are training failures that silently waste probe budget. All
   * integer; same deterministic assignment expression as [[ivfTopK]].
   * Returns one row per cell: (cell, n_vectors, permille).
   *
   * Scale shape: one cell-assignment scan (k cosines per row against
   * driver-literal centroids) + a map-side-combined count on the ≤k-value
   * key; the k-row cell universe is a local relation.
   */
  def ivfIndexHealth(df: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Double]]): DataFrame = {
    require(cents.nonEmpty, "need at least one centroid")
    occupancyReport(df.sparkSession,
      df.where(col(vecCol).isNotNull)
        .select(cellOf(col(vecCol), cents).as("cell"))
        .groupBy(col("cell")).agg(count(lit(1)).as("n")), cents.length)
  }

  /** Zero-filled per-cell occupancy + permille over a (cell, n) count table —
    * the report tail shared by [[ivfIndexHealth]] (assignment-side) and
    * [[ivfLayoutHealth]] (layout-side). */
  private def occupancyReport(spark: org.apache.spark.sql.SparkSession,
      counts: DataFrame, numCells: Int): DataFrame = {
    import spark.implicits._
    val cells = (0 until numCells).map(_.toLong).toDF("cell")
      .select(col("cell").cast("int").as("cell"))
    val total = counts.agg(coalesce(sum(col("n")), lit(0L)).as("t"))
    cells.join(counts, Seq("cell"), "left")
      .na.fill(0L, Seq("n"))
      .crossJoin(broadcast(total))
      .select(col("cell"), col("n").as("n_vectors"),
        when(col("t") > 0, expr("1000 * n div t")).otherwise(lit(0L))
          .as("permille"))
  }

  /**
   * Per-query binary retrieval metrics — [[ndcgAt]]'s multi-query,
   * ungraded siblings, the standard eval-suite table: for each query in
   * `qrels` (query_id, doc_id ground-truth pairs), MRR's reciprocal rank
   * `rr_nano = 10⁹ div first_rel_rank` (0 when nothing relevant was
   * retrieved at any rank), `hits_at_k` = relevant docs inside the top k,
   * `recall_permille = 1000·hits_at_k div n_rel`, and the raw
   * `first_rel_rank` (null if never retrieved). Queries with ZERO
   * retrieved relevant docs still report (that's the row you page on).
   * Results carry (query_id, doc_id, rank) 1-based; integer arithmetic
   * throughout.
   *
   * Scale shape: one equi-join of results to qrels on (query_id, doc_id) —
   * both sides key-partitioned — then a map-side-combined groupBy per
   * query; the qrels side aggregates once for n_rel and right-joins so
   * empty-retrieval queries survive. Metric cost is |results| + |qrels|,
   * never corpus-sized.
   */
  def retrievalMetrics(results: DataFrame, qrels: DataFrame,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val nRel = qrels.groupBy(col("query_id")).agg(count(lit(1)).as("n_rel"))
    val hits = results.join(qrels, Seq("query_id", "doc_id"))
      .groupBy(col("query_id"))
      .agg(min(col("rank")).as("first_rel_rank"),
        sum(when(col("rank") <= k, 1L).otherwise(0L)).as("hits_at_k"))
    nRel.join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("n_rel"),
        col("first_rel_rank").cast("long").as("first_rel_rank"),
        coalesce(expr("1000000000 div first_rel_rank"), lit(0L)).as("rr_nano"),
        coalesce(col("hits_at_k"), lit(0L)).as("hits_at_k"),
        expr("1000 * coalesce(hits_at_k, 0) div n_rel").as("recall_permille"))
  }

  /**
   * Matryoshka truncation evaluation (Kusupati et al., NeurIPS 2022 — MRL):
   * how much ANN quality survives scoring on only the FIRST `d` dimensions
   * of the embedding? For each candidate prefix width, recall@k = |top-k by
   * truncated cosine ∩ top-k by full cosine| / k. A high recall at d ≪ dim
   * licenses the two-stage deployment (score the d-dim prefix at ¼ the
   * bytes, re-rank survivors full-width) — this gauge is how that decision
   * gets made, continuously, as the corpus drifts.
   *
   * Exactness contract: vectors are int8-quantized ([[quantizeInt8]]) and
   * every score — full or truncated — is an integer dot/norm through one
   * IEEE sqrt/divide ([[graft.functions.GraftFunctions.cosine_sim_int8_pair]]
   * over array slices), so both rankings and hence the recall value replay
   * bit-exactly in SQL. Ties break by id. The query is quantized by the
   * caller with the same floor rule (see q143).
   *
   * Scale shape: one corpus scan per evaluated width (each a
   * TakeOrderedAndProject top-k); the recall join is k-row × k-row.
   * Returns (dims, n_common, recall) — one row per prefix width.
   */
  def matryoshkaRecall(df: DataFrame, idCol: String, qvecCol: String,
      queryQ: Seq[Byte], k: Int, dims: Seq[Int]): DataFrame = {
    require(k > 0, "k must be positive")
    require(dims.nonEmpty && dims.forall(d => d > 0 && d <= queryQ.length),
      "every prefix width must be in [1, query dims]")
    val spark = df.sparkSession
    def qlit(d: Int) = array(queryQ.take(d).map(b => lit(b)): _*)
    def topK(d: Option[Int]): DataFrame = {
      val v = d match {
        case Some(w) => slice(col(qvecCol), 1, w)
        case None => col(qvecCol)
      }
      val q = d.map(qlit).getOrElse(qlit(queryQ.length))
      df.select(col(idCol).as("id"),
          graft.functions.GraftFunctions.cosine_sim_int8_pair(v, q).as("cos"))
        .orderBy(col("cos").desc, col("id"))
        .limit(k)
    }
    val full = topK(None).select(col("id"))
    dims.map { d =>
      val common = topK(Some(d)).select(col("id"))
        .join(full, Seq("id"), "left_semi")
        .agg(count(lit(1)).as("n_common"))
      common.select(lit(d).as("dims"), col("n_common"),
        round(col("n_common").cast("double") / k, 6).as("recall"))
    }.reduce(_.unionByName(_))
  }

  /**
   * Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) — the
   * standard hybrid-retrieval combiner: each input ranking contributes
   * 1/(kConst + rank) per document, and documents are re-ranked by the sum.
   * RRF needs only RANKS, never scores, so it fuses rankers whose scores are
   * incomparable (BM25 log-units vs cosine in [-1,1]) with zero calibration —
   * the lexical+vector fusion every retrieval stack runs.
   *
   * Every input must carry (`idCol`, `rank`) with 1-based ranks. The
   * contribution is quantized to integer nano-units via FLOOR (not round:
   * floor has no half-way mode ambiguity across engines — 1e9/(k+rank) lands
   * exactly on .5 when k+rank = 2^10·5^b, e.g. 1024), so the fused score is
   * an exact integer sum in any accumulation order and the fused ORDER
   * replays exactly in SQL. Ties break by id.
   *
   * Scale shape: inputs are top-k lists (rows ≈ lists × k, corpus-free);
   * the fuse is one tiny groupBy + TakeOrderedAndProject. The expensive
   * part is the rankers, which prune BEFORE fusion — exactly how a
   * production hybrid stack stages its cost.
   */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, kConst: Int = 60,
      topK: Int = 20): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(kConst >= 1, "kConst must be >= 1")
    require(topK > 0, "topK must be positive")
    val union = rankings
      .map(r => r.select(col(idCol), col("rank").cast("long").as("rank")))
      .reduce(_.unionByName(_))
    union.groupBy(col(idCol))
      .agg(sum(floor(lit(1e9) / (lit(kConst.toDouble) + col("rank"))))
          .as("rrf_nano"),
        count(lit(1)).as("n_lists"),
        min(col("rank")).as("best_rank"))
      .orderBy(col("rrf_nano").desc, col(idCol))
      .limit(topK)
  }

  /**
   * Semantic deduplication (SemDeDup, Abbas et al. 2023): cluster the
   * embedding space, compare pairs only WITHIN a cluster, and for every
   * near-duplicate pair (cosine ≥ `tau`) drop the member closer to the
   * cluster centroid — keeping the more peripheral (more diverse) example,
   * the paper's selection rule. Ties (equal centroid cosine, e.g. exact
   * duplicate vectors) drop the higher id, so the result is a pure function
   * of the input set.
   *
   * Every arithmetic step is EXACT and engine-portable, which is what makes
   * the DuckDB oracle replay bit-identical: vectors are int8-quantized first
   * ([[quantizeInt8]] — floor arithmetic, exactly replayable per q85), and
   * cosine over int8 inputs is integer dot/norm sums held in doubles
   * (< 2^53, exact in any accumulation order) through one
   * `dot / (sqrt(na)·sqrt(nb))` — the same IEEE operation shape on every
   * engine. Cluster assignment is argmax over those exact scores (first
   * centroid wins ties), so no cross-engine float drift can misroute a row.
   *
   * Centroids are the k quantized vectors with the smallest (md5(id), id) —
   * the same hash-ordered deterministic seeding as [[ivfCentroids]], k×dim
   * ints riding as literals (the one bounded driver collect). Production
   * pipelines wanting Lloyd-refined cells can pre-assign with
   * [[ivfCentroids]]/[[cellOf]] and run the same within-cell pair pass.
   *
   * 100 TB shape: the quantized corpus is ¼ the float bytes; assignment is
   * whole-stage-codegen'd scan work against broadcast literals (no shuffle);
   * the pair pass shuffles (id, qvec) by cell once and compares O(c²) per
   * cell — SemDeDup's published cost model, bounded by growing k with the
   * corpus so cells stay ~constant-sized. Null vectors are excluded (no
   * similarity is defined for them); zero vectors score 0 against every
   * centroid and land deterministically in cell 0.
   *
   * Returns survivors as (idCol, cell, cent_cos).
   */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      k: Int, tau: Double): DataFrame = {
    require(k > 0, "k must be positive")
    val q = quantizeInt8(df.where(col(vecCol).isNotNull), idCol, vecCol)
      .select(col("id"), col("qvec"))
    val seeds: Array[Array[Int]] = q
      .withColumn("__h", md5_prefix60(col("id").cast("string")))
      .orderBy(col("__h"), col("id"))
      .limit(k)
      .collect()
      .map(_.getSeq[Byte](1).map(_.toInt).toArray)
    val seedCols = seeds.toIndexedSeq.map(s =>
      array(s.toIndexedSeq.map(x => lit(x.toFloat)): _*))
    val scores = array(seedCols.map(sc => cosine_sim_int8(col("qvec"), sc)): _*)
    val assignedRaw = q.select(col("id"), col("qvec"),
      (array_position(scores, array_max(scores)) - 1).cast("int").as("cell"),
      array_max(scores).as("cent_cos"))
    // Materialize the assignment ONCE before fanning out. The argmax
    // projection inlines k×dim seed literals and 3·k unrolled cosine loops;
    // replicated onto both sides of the pair join (plus the final
    // anti-join) the generated stage blows past the JIT's method limits and
    // the whole pair pass runs de-optimized — measured 5.2 s → 0.7 s at
    // sf0.1 from this persist alone. The cached form is (id, qvec, cell,
    // cent_cos) — corpus-row-sized, the thing the pair pass would shuffle
    // anyway.
    graft.Eager.withPersisted(assignedRaw) { assigned =>
      val a = assigned.select(col("id").as("aid"), col("qvec").as("aq"),
        col("cell"), col("cent_cos").as("ac"))
      val b = assigned.select(col("id").as("bid"), col("qvec").as("bq"),
        col("cell"), col("cent_cos").as("bc"))
      val victims = a.join(b, Seq("cell")).where(col("aid") < col("bid"))
        .where(cosine_sim_int8_pair(col("aq"), col("bq")) >= tau)
        .select(when(col("ac") > col("bc"), col("aid"))
          .otherwise(col("bid")).as("v"))
        .distinct()
      assigned.join(victims, assigned("id") === victims("v"), "left_anti")
        .select(col("id").as(idCol), col("cell"), col("cent_cos"))
    }
  }

  /**
   * Batch ANN k-NN join — [[annTopK]]'s multi-query form and [[crossTopK]]'s
   * approximate twin: each query probes its own hyperplane bucket plus every
   * single-bit flip, and only corpus rows in probed buckets are scored. The
   * probe table (queries × (1+nBits) rows, small by the [[crossTopK]]
   * broadcast contract) broadcasts; the corpus computes its bucket in the
   * scan and never shuffles — candidates fan in at (query, candidate)
   * granularity, then one rank window per query takes k. At 100 TB, read the
   * corpus from the [[writeBucketedCorpus]] layout so each micro-batch of
   * queries prunes partitions instead of re-hashing the corpus.
   * Returns (query_id, corpus_id, cos, rank), rank ≤ k.
   */
  def annCrossTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nBits: Int = 8,
      scheme: SrpScheme = SrpScheme.xxh): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("corpus_id"))
    annCandidates(corpus, queries, idCol, vecCol, nBits, scheme)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** The shared multi-probe candidate join of [[annCrossTopK]] and
    * [[hardNegatives]]: (query_id, corpus_id, cos), corpus rows only from
    * probed buckets, probe table broadcast. */
  private def annCandidates(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, nBits: Int,
      scheme: SrpScheme): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"),
      scheme.bucketCol(col(vecCol), nBits).as("cb"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      scheme.bucketCol(col(vecCol), nBits).as("qb"))
    // the 1+nBits probe values are pairwise distinct by construction, so no
    // candidate pair can arrive twice through different probes
    val probes = q.select(col("query_id"), col("qv"),
      explode(array((col("qb") +: (0 until nBits).map(b =>
        col("qb").bitwiseXOR(lit(1L << b)))): _*)).as("pb"))
    c.join(broadcast(probes), col("cb") === col("pb"))
      .select(col("query_id"), col("corpus_id"),
        cosine_sim(col("cv"), col("qv")).as("cos"))
  }

  /**
   * Hard-negative mining — the contrastive-training data stage (DPR/SBERT
   * recipe): per query, the highest-ranked ANN candidates BELOW the
   * positive band. Candidates with `cos >= posThreshold` are positives or
   * duplicates of the query (including the query itself when it lives in
   * the corpus) and are excluded BEFORE ranking, so the k survivors are
   * "near but not the answer" — similar enough to be hard, dissimilar
   * enough to be wrong.
   *
   * Same 100 TB shape as [[annCrossTopK]] (shared candidate join: probe
   * table broadcasts, corpus never shuffles, one rank window per query);
   * the positive-band filter is a scan-level predicate on the already-
   * computed cosine, so it prunes candidates before the window sees them.
   * Returns (query_id, corpus_id, cos, rank), rank ≤ k.
   */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, posThreshold: Double, nBits: Int = 8,
      scheme: SrpScheme = SrpScheme.xxh): DataFrame = {
    require(k > 0, "k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("corpus_id"))
    annCandidates(corpus, queries, idCol, vecCol, nBits, scheme)
      .where(col("cos") < posThreshold)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /**
   * Recall@k — the index-quality gauge every ANN deployment tracks: per
   * query, the fraction of the EXACT top-k an approximate result set
   * recovered. Inputs are two (queryCol, idCol) result tables (from e.g.
   * [[crossTopK]] and [[annCrossTopK]] / [[pqTopK]]); the join touches only
   * result rows (queries × k), never the corpus. `recall` is n_hit/n_exact —
   * a small-integer IEEE quotient, exact on every engine.
   * Returns (query_id, n_hit, n_exact, recall).
   */
  def recallAtK(exact: DataFrame, approx: DataFrame,
      queryCol: String, idCol: String): DataFrame =
    exact.select(col(queryCol).as("query_id"), col(idCol).as("corpus_id"))
      // dedup the approx side (result-table-sized): a repeated (query, id)
      // would otherwise multiply exact rows through the join and overcount
      .join(approx.select(col(queryCol).as("query_id"),
          col(idCol).as("corpus_id")).dropDuplicates("query_id", "corpus_id")
          .withColumn("__hit", lit(1L)),
        Seq("query_id", "corpus_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("__hit"), lit(0L))).as("n_hit"),
        count(lit(1)).as("n_exact"))
      .select(col("query_id"), col("n_hit"), col("n_exact"),
        (col("n_hit") / col("n_exact")).as("recall"))

  // ------------------------- product quantization -------------------------

  /** A PQ codebook: `cents(j)(c)` is centroid c of subspace j (each of
    * length `subDim`). m·ksub·subDim doubles — driver-resident, rides into
    * plans as literals like the IVF centroid set. */
  final case class PqCodebook(subDim: Int, cents: Array[Array[Array[Double]]]) {
    def m: Int = cents.length
    def ksub: Int = if (cents.isEmpty) 0 else cents(0).length
  }

  /** The native PQ encoder as a Column: argmin centroid per subspace in one
    * tight primitive loop (`org.apache.spark.sql.graft.PqEncode`). A
    * Column-arithmetic formulation of the same math builds an
    * m·ksub·subDim-term literal tree whose janino compilation alone cost
    * tens of seconds per stage (q110's round-9 regression). */
  private def pqEncodeCol(vec: Column,
      cents: Array[Array[Array[Double]]]): Column =
    org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.graft.PqEncode(
        org.apache.spark.sql.graft.Bridge.expression(vec), cents))

  /**
   * Deterministic product-quantization training — the codebook tier BELOW
   * int8 on the compression ladder (64 floats → `m` bytes: 32× here vs
   * int8's 4×): the vector splits into `m` subspaces of dim/m coordinates
   * and each subspace learns its own `ksub` centroids by Lloyd iterations
   * with the [[ivfCentroids]] determinism discipline — hash-ordered seeding,
   * lowest-cell tie-breaks, quantized-exact means ([[centroids]]) — so the
   * same corpus trains the same codebook on any partitioning/cluster.
   *
   * 100 TB shape: 1 + `iters` corpus scans TOTAL — not O(m·iters). The
   * hash-ordered seed rows are the same for every subspace (the hash ignores
   * the subspace index), so one TakeOrdered collect of full vectors seeds all
   * m codebooks; each Lloyd iteration is one scan whose rows fan out to m
   * (composite cell, subvector) pairs feeding a single quantized-exact
   * aggregation. The codebook (m·ksub·subDim doubles ≈ 8 KB at defaults)
   * collects to the driver and re-enters plans as literals — the k×dim
   * bounded-collect contract of the IVF trainer.
   */
  def pqTrain(df: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, ksub: Int = 16, iters: Int = 2): PqCodebook = {
    require(m > 0 && ksub > 0 && iters >= 0, "m, ksub positive; iters >= 0")
    val dim = df.select(col(vecCol)).head().getSeq[Float](0).size
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    val seeds: Array[Array[Double]] = df
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("__h", md5_prefix60(col("id").cast("string")))
      .orderBy(col("__h"), col("id"))
      .limit(ksub)
      .collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    var cents: Array[Array[Array[Double]]] = (0 until m).map(j =>
      seeds.map(_.slice(j * subDim, (j + 1) * subDim))).toArray
    for (_ <- 1 to iters) {
      val assigned = df
        .select(col(vecCol).as("__v"),
          posexplode(pqEncodeCol(col(vecCol), cents)).as(Seq("j", "cell")))
        .select((col("j") * lit(ksub) + col("cell")).as("g"),
          slice(col("__v"), col("j") * lit(subDim) + lit(1), lit(subDim)).as("v"))
      val means = centroids(assigned, "g", "v")
        .collect()
        .map(r => (r.getInt(0), r.getLong(1).toInt, r.getDouble(2)))
      val next = cents.map(_.map(_.clone()))
      means.foreach { case (g, d, v) => next(g / ksub)(g % ksub)(d - 1) = v }
      cents = next // empty cells keep their previous centroid (IVF rule)
    }
    PqCodebook(subDim, cents)
  }

  /** Encode vectors to PQ codes: (idCol, code array<int> of length m) — the
    * stored representation (m bytes worth of centroid ids per vector; the
    * int array is the engine-portable carrier). One codegen'd scan. */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      cb: PqCodebook): DataFrame =
    df.select(col(idCol), pqEncodeCol(col(vecCol), cb.cents).as("code"))

  /**
   * Asymmetric-distance (ADC) top-k over PQ codes: the query precomputes a
   * ksub-entry distance table per subspace — ON A ONE-ROW FRAME through
   * `PqDistTable`, the same native loop and fold order as the `PqEncode`
   * assignment (the [[ivfProbeCells]] anti-divergence discipline) — and
   * every corpus vector's score is m table lookups + adds over its code
   * (`PqAdc`); ties rank by id. The scan reads codes only (m ints/vector —
   * the 32× bandwidth win); the plan is TakeOrderedAndProject, no global
   * sort.
   *
   * An exact copy of the query achieves the global ADC minimum (its code IS
   * the per-subspace argmin), so planted-copy constructions are provably
   * top-ranked up to code collisions — the q110 oracle leans on that.
   */
  def pqTopK(encoded: DataFrame, idCol: String, codeCol: String,
      cb: PqCodebook, query: Seq[Float], k: Int): DataFrame = {
    require(query.size == cb.m * cb.subDim, "query dim != codebook dim")
    val spark = encoded.sparkSession
    import spark.implicits._
    val qv = array(query.map(v => lit(v)): _*)
    val tables: Array[Double] = Seq(1).toDF("one").select(qv.as("q"))
      .select(org.apache.spark.sql.graft.Bridge.column(
        org.apache.spark.sql.graft.PqDistTable(
          org.apache.spark.sql.graft.Bridge.expression(col("q")), cb.cents))
        .as("t"))
      .head().getSeq[Double](0).toArray
    val score = org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.graft.PqAdc(
        org.apache.spark.sql.graft.Bridge.expression(col(codeCol)),
        tables, cb.ksub))
    encoded.select(col(idCol), score.as("adc_dist"))
      .orderBy(col("adc_dist").asc, col(idCol))
      .limit(k)
  }

  /**
   * Margin-based mutual-nearest-neighbor alignment — the bitext-mining /
   * cross-view pairing criterion (ratio margin of Artetxe & Schwenk 2019),
   * in an integer-exact form: cosines are int8-quantized ([[quantizeInt8]])
   * and floored to nanos, each side's neighborhood statistic is the SUM of
   * its top-`k` pair nanos (integer — no order-dependent float average),
   * and the margin is the integer ratio
   *
   *   margin_nano(x, y) = c(x,y) · 2k · 10⁹ div (fwd(x) + bwd(y))
   *
   * (`div` on positives ≡ floor — both engines agree). A pair is emitted iff
   * each side is the other's margin-argmax (ties → higher cosine, then
   * smaller id) and `margin_nano ≥ minMarginNano`. Only positive-cosine
   * candidates participate (a margin over non-positive neighborhoods is
   * meaningless, and positivity keeps div ≡ floor). Returns
   * (id_a, id_b, cos_nano, margin_nano).
   *
   * Scale shape: exact cross-scoring here — the oracle-checkable core; at
   * corpus scale generate candidates with the ANN index ([[annTopK]] /
   * [[ivfTopK]]) and rescore only the candidate set: the margin arithmetic
   * is unchanged, and fwd/bwd become top-k over each side's candidate
   * list. The pair table is persisted once and reused for both direction
   * windows (k ≤ 4 keeps `c · 2k · 10⁹` inside long range).
   */
  def marginAlignment(a: DataFrame, b: DataFrame, idCol: String,
      vecCol: String, k: Int = 4,
      minMarginNano: Long = 1000000000L): DataFrame = {
    require(k >= 1 && k <= 4, "k in [1, 4] keeps margin_nano in long range")
    import org.apache.spark.sql.expressions.Window
    val qa = quantizeInt8(a.where(col(vecCol).isNotNull), idCol, vecCol)
      .select(col("id").as("ida"), col("qvec").as("qva"))
    val qb = quantizeInt8(b.where(col(vecCol).isNotNull), idCol, vecCol)
      .select(col("id").as("idb"), col("qvec").as("qvb"))
    val pairs = qa.crossJoin(qb)
      .select(col("ida"), col("idb"),
        floor(graft.functions.GraftFunctions
          .cosine_sim_int8_pair(col("qva"), col("qvb")) * 1e9d)
          .cast("long").as("c"))
      .where(col("c") > 0)
    graft.Eager.withPersisted(pairs) { p =>
      def topSum(key: String, other: String, out: String) = {
        val w = Window.partitionBy(col(key))
          .orderBy(col("c").desc, col(other))
        p.withColumn("__rn", row_number().over(w)).where(col("__rn") <= k)
          .groupBy(col(key)).agg(sum(col("c")).as(out))
      }
      val m = p
        .join(topSum("ida", "idb", "f"), Seq("ida"))
        .join(topSum("idb", "ida", "g"), Seq("idb"))
        .withColumn("margin_nano",
          expr(s"(c * ${2L * k} * cast(1000000000 as bigint)) div (f + g)"))
      val wa = Window.partitionBy(col("ida"))
        .orderBy(col("margin_nano").desc, col("c").desc, col("idb"))
      val wb = Window.partitionBy(col("idb"))
        .orderBy(col("margin_nano").desc, col("c").desc, col("ida"))
      m.withColumn("__ra", row_number().over(wa))
        .withColumn("__rb", row_number().over(wb))
        .where(col("__ra") === 1 && col("__rb") === 1 &&
          col("margin_nano") >= minMarginNano)
        .select(col("ida").as("id_a"), col("idb").as("id_b"),
          col("c").as("cos_nano"), col("margin_nano"))
    }
  }

  /**
   * Sparse cosine similarity JOIN over hashed-TF text vectors — the
   * all-pairs-similarity-search formulation (Bayardo et al. WWW'07) that
   * needs NO embedding model: tokens hash into `dim` count buckets
   * (feature hashing — md5, engine-replayable), and the cosine of two
   * docs' count vectors is computed from a POSTINGS join on the bucket
   * key: dot(a,b) = Σ_bucket cₐ·c_b — only co-occurring buckets ever
   * join, never the n² dense pair matrix. Integer dots and norms; the
   * final cosine is one IEEE division chain (identical on every engine).
   * Returns (id_a < id_b, dot, cos) with cos ≥ `threshold`.
   *
   * `maxDf` caps posting-list length exactly like
   * [[graft.ops.Dedup.ngramJaccardPairs]]: hub buckets (stopword hashes)
   * are dropped from DOT accumulation while norms keep all buckets, so a
   * capped cosine is a LOWER BOUND — pairs are missed or under-scored,
   * never inflated past the threshold.
   *
   * Scale shape: postings shuffle (id, bucket, count) triples keyed by
   * bucket; pair partial-products combine map-side keyed by (id_a, id_b);
   * norms are a doc-keyed rollup broadcast-joined onto the survivors.
   */
  def sparseCosinePairs(df: DataFrame, idCol: String, textCol: String,
      dim: Int = 512, threshold: Double = 0.8,
      maxDf: Option[Int] = Some(1000)): DataFrame = {
    require(dim >= 2, "dim must be at least 2")
    val counts = df
      .select(col(idCol).as("id"),
        explode(tokens(lower(col(textCol)))).as("tok"))
      .select(col("id"), pmod(md5_prefix60(col("tok")), lit(dim.toLong))
        .as("bucket"))
      .groupBy(col("id"), col("bucket")).agg(count(lit(1)).as("c"))
    graft.Eager.withPersisted(counts) { cts =>
      val norms = cts.groupBy(col("id"))
        .agg(sum(col("c") * col("c")).as("nrm"))
      val byBucket = cts.groupBy(col("bucket"))
        .agg(count(lit(1)).as("__df"))
      val kept = maxDf.map(cap =>
          cts.join(byBucket.where(col("__df") <= cap).select(col("bucket")),
            Seq("bucket")))
        .getOrElse(cts)
      val a = kept.select(col("bucket"), col("id").as("id_a"),
        col("c").as("ca"))
      val b = kept.select(col("bucket"), col("id").as("id_b"),
        col("c").as("cb"))
      val dots = a.join(b, Seq("bucket")).where(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(sum(col("ca") * col("cb")).as("dot"))
      dots
        .join(norms.select(col("id").as("id_a"), col("nrm").as("na")), "id_a")
        .join(norms.select(col("id").as("id_b"), col("nrm").as("nb")), "id_b")
        .withColumn("cos", col("dot").cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
        .where(col("cos") >= threshold)
        .select(col("id_a"), col("id_b"), col("dot"),
          round(col("cos"), 6).as("cos"))
    }
  }

  /**
   * SRP index-health audit — the "are my hyperplanes any good" check an
   * LSH deployment runs before trusting its buckets: for every pair of
   * plane bits i ≤ j, the CO-ACTIVATION count over the corpus (i = j rows
   * are each bit's ones-count). A healthy random-projection family shows
   * ones ≈ n/2 per bit (a skewed bit means the plane barely splits the
   * data — a wasted bit that halves nothing) and co-activation ≈ n/4 per
   * pair (correlated planes recount the same split — bucket occupancy
   * collapses toward 2^(effective bits)). All integer counts — replays
   * exactly under the md5 plane scheme. Returns (bit_a ≤ bit_b, n_both, n).
   *
   * Scale shape: one scan computing each vector's bucket (codegen'd native
   * expression), a ≤ C(nBits+1, 2)-way literal fan per row, one map-side-
   * combined rollup on a ≤ 36-key space (nBits = 8). Vectors never shuffle.
   */
  def srpIndexHealth(df: DataFrame, idCol: String, vecCol: String,
      nBits: Int = 8, scheme: SrpScheme = SrpScheme.md5): DataFrame = {
    require(nBits >= 1 && nBits <= 16, "nBits in [1, 16]")
    val buckets = df.where(col(vecCol).isNotNull)
      .select(scheme.bucketCol(col(vecCol), nBits).as("__bk"))
    def bit(i: Int) =
      shiftright(col("__bk"), i).bitwiseAND(lit(1L)).cast("long")
    val combos = for { i <- 0 until nBits; j <- i until nBits } yield
      struct(lit(i).as("bit_a"), lit(j).as("bit_b"),
        (bit(i) * bit(j)).as("hit"))
    buckets.select(explode(array(combos: _*)).as("p"))
      .groupBy(col("p.bit_a").as("bit_a"), col("p.bit_b").as("bit_b"))
      .agg(sum(col("p.hit")).as("n_both"), count(lit(1)).as("n"))
  }

  /**
   * Deterministic paired bootstrap test — "is system A really better than
   * system B, or did I get lucky with my query set?" (the significance
   * check behind every retrieval/eval comparison): given per-query PAIRED
   * integer metrics for the two systems, draw `resamples` bootstrap
   * replicas of the query set (each replica re-draws n queries WITH
   * replacement) and count how often each system wins the replica's summed
   * metric. Resample indices come from md5 of (replica, slot) — zero RNG,
   * engine-replayable; every comparison is on exact integer sums. Returns
   * ONE row: (n_queries, resamples, wins_a, wins_b, ties, win_a_permille,
   * delta_nano_observed) — `delta_nano_observed` is the full-set Σ(a−b);
   * read "A beats B in 983/1000 replicas" directly off win_a_permille.
   *
   * Scale shape: queries get a dense index from [[graft.ops.Layout.globalRank]]
   * (range shuffle, no single-partition window); the replica table is
   * (resamples × n) rows of three integers joined on the uniform index key;
   * the verdict is a resamples-key rollup then a single-row fold.
   */
  def pairedBootstrap(perQuery: DataFrame, qidCol: String, aCol: String,
      bCol: String, resamples: Int = 1000): DataFrame = {
    require(resamples > 0, "need at least one bootstrap replica")
    val base = perQuery.select(col(qidCol).cast("string").as("qid"),
      col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
    val indexed = graft.ops.Layout.globalRank(base, Seq(col("qid")), "__rn")
      .select((col("__rn") - 1).as("qidx"), (col("a") - col("b")).as("d"))
    graft.Eager.withPersisted(indexed) { p =>
      val nQ = p.count()
      if (nQ == 0)
        return graft.Eager.materialize(p.select(lit(0L).as("n_queries"),
          lit(resamples.toLong).as("resamples"), lit(0L).as("wins_a"),
          lit(0L).as("wins_b"), lit(0L).as("ties"),
          lit(0L).as("win_a_permille"),
          lit(0L).as("delta_nano_observed")).limit(0))
      val spark = p.sparkSession
      val slots = spark.range(1, resamples + 1L).toDF("rep")
        .crossJoin(spark.range(0, nQ).toDF("slot"))
        .select(col("rep"),
          pmod(md5_prefix60(concat_ws("_", col("rep"), col("slot"))),
            lit(nQ)).as("qidx"))
      val reps = slots.join(p, Seq("qidx"))
        .groupBy(col("rep")).agg(sum(col("d")).as("s"))
      val verdict = reps.agg(
        sum(when(col("s") > 0, 1L).otherwise(0L)).as("wins_a"),
        sum(when(col("s") < 0, 1L).otherwise(0L)).as("wins_b"),
        sum(when(col("s") === 0, 1L).otherwise(0L)).as("ties"))
      val observed = p.agg(coalesce(sum(col("d")), lit(0L))
        .as("delta_nano_observed"))
      verdict.crossJoin(observed)
        .select(lit(nQ).as("n_queries"),
          lit(resamples.toLong).as("resamples"),
          col("wins_a"), col("wins_b"), col("ties"),
          expr(s"(1000 * wins_a) div $resamples").as("win_a_permille"),
          col("delta_nano_observed"))
    }
  }

  /** Exact integer squared euclidean distance between two int8 vectors
    * (elements widened to long before the difference — Σ(aᵢ−bᵢ)² ≤
    * 65025·dim, overflow-free for any real dimension). */
  private def dist2Int8(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("long") - y.cast("long"); d * d
      }),
      lit(0L), (acc, v) => acc + v)

  /**
   * Greedy k-center coreset — diversity-based data SELECTION (pick the k
   * points that best cover the embedding space; farthest-point traversal is
   * a 2-approximation of the optimal k-center cover): start from a
   * deterministic seed (smallest md5-hash id — the [[semanticDedup]] seed
   * rule), then k−1 times select the point FARTHEST from the chosen set
   * (max over points of min over centers), ties → smallest id. Distances
   * are exact integer squared euclidean over int8-quantized vectors, so
   * every selection — and the reported covering-radius progression — is
   * engine-replayable. Returns (round 1..k, center_id, radius_sq): round
   * r's radius_sq is the selected point's distance² to the first r−1
   * centers (0 for the seed), a monotone non-increasing curve — THE
   * diagnostic for "how many exemplars until coverage plateaus".
   *
   * Scale shape: the quantized corpus is persisted once; each round is one
   * codegen'd scan updating the running min-distance column against the
   * newly chosen center (a driver-broadcast literal — centers are k rows)
   * plus one TakeOrdered(1) argmax; round frames go through [[graft.Eager]]
   * so plan depth stays O(1) in k. k driver round-trips of one row each —
   * the algorithm is inherently sequential in k, not in n.
   */
  def kCenterCoreset(df: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be at least 1")
    val spark = df.sparkSession
    val q0 = quantizeInt8(df.where(col(vecCol).isNotNull), idCol, vecCol)
      .select(col("id"), col("qvec"),
        md5_prefix60(col("id").cast("string")).as("__h"))
    graft.Eager.withPersisted(q0) { p =>
      val seed = p.orderBy(col("__h"), col("id")).limit(1)
        .select(col("id"), col("qvec")).collect()
      if (seed.isEmpty)
        return graft.Eager.materialize(
          p.select(lit(1L).as("round"), col("id").as("center_id"),
            lit(0L).as("radius_sq")).limit(0))
      def vecLit(r: org.apache.spark.sql.Row) =
        array(r.getSeq[Byte](1).toIndexedSeq.map(v => lit(v)): _*)
      val centers = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)](
        (1L, seed(0).getLong(0), 0L))
      var releaseM: () => Unit = () => ()
      try {
        var mind = {
          val m0 = p.select(col("id"), col("qvec"),
            dist2Int8(col("qvec"), vecLit(seed(0))).as("m"))
          val (cp, rel) = graft.Eager.checkpointed(m0)
          releaseM = rel
          cp
        }
        for (round <- 2 to k) {
          val next = mind.orderBy(col("m").desc, col("id")).limit(1).collect()(0)
          centers += ((round.toLong, next.getLong(0), next.getLong(2)))
          if (round < k) {
            val upd = mind.select(col("id"), col("qvec"),
              least(col("m"), dist2Int8(col("qvec"), vecLit(next))).as("m"))
            val (cp, rel) = graft.Eager.checkpointed(upd)
            releaseM()
            releaseM = rel
            mind = cp
          }
        }
      } finally releaseM()
      import spark.implicits._
      centers.toSeq.toDF("round", "center_id", "radius_sq")
    }
  }

  /**
   * Maximal Marginal Relevance selection (Carbonell & Goldstein 1998) — the
   * greedy diversified top-k behind few-shot example pickers, eval-set
   * curation, and de-redundant retrieval: round r selects the candidate
   * maximizing `λ·rel(c, query) − (1−λ)·max_{s∈selected} sim(c, s)` — high
   * relevance, penalized by similarity to what is already chosen. Scores
   * are integer "permille-nano" units, `lambdaPermille·rel_nano −
   * (1000−lambdaPermille)·maxsim_nano`, with NO division anywhere — a pure
   * product-sum argmax that replays exactly on any engine (a floor- vs
   * truncating-div would diverge on the negative scores anti-correlated
   * vectors produce). Cosines are int8-quantized nano floors (the
   * [[marginAlignment]] arithmetic); `maxsim` starts at −10⁹ (max
   * dissimilarity: an empty selected set penalizes nothing and shifts all
   * round-1 scores by the same constant). Ties break to the smaller id.
   * Returns one row per round: (round, id, rel_nano, maxsim_nano,
   * score_pm) — maxsim as of the moment of selection.
   *
   * Scale shape: the [[kCenterCoreset]] loop discipline — the candidate
   * frame keeps (id, qvec, rel, maxsim); each round is ONE
   * TakeOrderedAndProject (argmax) plus one scan updating maxsim against
   * the single picked vector (a k-long literal — no join), checkpointed
   * through [[graft.Eager]] with the previous round released. Driver state
   * is k rows; k is the output size, never the corpus.
   */
  def mmrSelect(df: DataFrame, idCol: String, vecCol: String, queryId: Long,
      k: Int, lambdaPermille: Int = 700): DataFrame = {
    require(k >= 1, "k must be at least 1")
    require(lambdaPermille >= 0 && lambdaPermille <= 1000,
      "lambdaPermille must be in [0, 1000]")
    val spark = df.sparkSession
    import spark.implicits._
    val lam = lambdaPermille.toLong
    val q0 = quantizeInt8(df.where(col(vecCol).isNotNull), idCol, vecCol)
      .select(col("id"), col("qvec"))
    graft.Eager.withPersisted(q0) { p =>
      val qrow = p.where(col("id") === queryId).collect()
      require(qrow.nonEmpty, s"query id $queryId not found or null vector")
      def vecLit(r: org.apache.spark.sql.Row) =
        array(r.getSeq[Byte](1).toIndexedSeq.map(v => lit(v)): _*)
      val cosNano = (v: Column, w: Column) =>
        floor(graft.functions.GraftFunctions.cosine_sim_int8_pair(v, w) * 1e9d)
          .cast("long")
      val picked = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long, Long)]()
      var releaseM: () => Unit = () => ()
      try {
        var state = {
          val m0 = p.where(col("id") =!= queryId)
            .select(col("id"), col("qvec"),
              cosNano(col("qvec"), vecLit(qrow(0))).as("rel"),
              lit(-1000000000L).as("maxsim"))
          val (cp, rel) = graft.Eager.checkpointed(m0)
          releaseM = rel
          cp
        }
        var round = 1
        var exhausted = false
        while (round <= k && !exhausted) {
          val scored = state.withColumn("score",
            lit(lam) * col("rel") - lit(1000L - lam) * col("maxsim"))
          val top = scored.orderBy(col("score").desc, col("id")).limit(1)
            .collect()
          if (top.isEmpty) exhausted = true
          else {
            val t = top(0)
            picked += ((round.toLong, t.getLong(0), t.getLong(2),
              t.getLong(3), t.getLong(4)))
            if (round < k) {
              val upd = state.where(col("id") =!= t.getLong(0))
                .select(col("id"), col("qvec"), col("rel"),
                  greatest(col("maxsim"),
                    cosNano(col("qvec"), vecLit(t))).as("maxsim"))
              val (cp, rel) = graft.Eager.checkpointed(upd)
              releaseM()
              releaseM = rel
              state = cp
            }
            round += 1
          }
        }
      } finally releaseM()
      picked.toSeq.toDF("round", "id", "rel_nano", "maxsim_nano", "score_pm")
    }
  }
}
