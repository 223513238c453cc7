package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The sf1 scale probe: synthesize a `factor`× corpus from sf0.1 (key-shifted
 * copies that preserve join integrity — fact-table ids shift per copy,
 * dimensions stay), then time a representative query subset at both scales and
 * report the runtime ratio. The point is the TREND: a plan that holds its
 * shape scales ~linearly in input (ratio ≈ factor for scan-bound work, below
 * it when fixed costs dominate); a broadcast flipping to a shuffle join, a
 * collect bottleneck, or a quadratic pair blowup shows up as a super-linear
 * ratio. Run: `sbt "runMain graft.ScaleProbe [factor]"`.
 *
 * Documents get a per-copy marker token appended, so copies are deliberate
 * NEAR-duplicates: the dedup probes (q27, and since round 7 the whole
 * dedup/clustering/substring family q72–q77) see a corpus where every doc
 * has `factor` planted near-dups — output (and work) grows with the planted
 * pair count (C(factor,2) pairs per original document), which is the
 * semantics, not a plan defect: expect their ratios to exceed `factor`
 * roughly by the pair multiplicity. The scan/agg/join probes are the ones
 * held to a ~linear bar.
 */
object ScaleProbe {

  // NOT probed — the media queries (q104/q191/q202/q211): their blobs are
  // SYNTHESIZED from fixed doc_id ranges (doc_id < 64..200), so the decode
  // work is identical at every corpus scale and a ratio would record ~1.0
  // while measuring nothing. Media scale claims rest on the mapPartitions
  // decode shape (blobs never shuffle), pinned by spec, not by this probe.
  val probeQueries: Seq[String] = Seq(
    "q01_pricing_summary", // scan + partial/final agg
    "q03_top_orders",      // 3-way join + top-k
    "q05_region_revenue",  // broadcast dim chain
    "q06_forecast_revenue",// pushdown-heavy filter agg
    "q07_rank_customers",  // window rank per group
    "q10_multiget",        // DSv2 connector point reads (footer-prune path)
    "q12_events_daily",    // time-bucketed agg
    "q13_sessionize",      // window lag sessionize
    "q04_exists_orders",   // semi join
    "q32_asof_join",       // as-of composition
    "q41_range_join",      // binned range join
    "q20_lang_id",         // text ops (native exprs)
    "q23_dedup_exact",     // hash-groupBy dedup
    "q25_cosine_topk",     // brute-force ANN baseline
    "q27_minhash_pairs",   // LSH near-dup (planted dups: output scales super-linearly by design)
    "q33_distinct_agg",    // distinct + HLL
    "q43_train_split",     // deterministic sampling
    "q51_percentiles",     // exact percentiles
    "q60_salted_agg",      // skew-safe two-phase agg
    // round-7 additions: the most expensive suite queries (round-6 verdict #5).
    // The dedup-family ones run over the planted-near-dup corpus, so their
    // output grows ~C(factor,2)× per original doc — see the scaladoc note.
    "q65_contamination",   // train/test shingle semi-join
    "q72_dup_clusters",    // CC loop over exact-Jaccard edges (planted pairs)
    "q73_lm_score",        // corpus-trained bigram LM score
    "q74_shared_substring",// capped postings pair stream (planted runs)
    "q75_dedup_pipeline",  // LSH -> CC -> survivors end to end (planted pairs)
    "q76_shared_spans",    // positional postings + islands (planted runs)
    "q77_span_cut",        // span-cut application (9/10 of corpus gets cut)
    // round-8 additions (round-7 verdict #6)
    "q78_novelty",         // corpus df table on hash keys (planted copies crush novelty)
    "q79_contamination_bloom", // one-blob bloom train side + codegen'd probe
    "q81_stratified_mix",  // scan-level literal-CASE mixing filter
    "q82_context_chunks",  // per-row window slices, zero shuffle
    "q83_sequence_packs",  // per-stratum cumsum, (id,count)-only shuffle
    // round-9 additions (round-8 verdict #5)
    "q80_stream_near_dedup", // banded stateful stream over the replay corpus
    "q84_stream_decontaminate", // bloom blob build + stateless per-row probe
    "q85_quantized_embeddings", // int8 quantization scan (HOF transform)
    "q86_ivf_partitioned",  // write-partitioned IVF corpus + pruned probe
    "q87_epoch_shuffle",    // md5 order key + per-shard sort (no global sort)
    "q88_jl_projection",    // native projection, scan bandwidth
    "q89_overlap_sketch",   // KMV min-k: distinct on 8-byte keys + k-row heap
    "q90_bm25_search",      // query-term filter inside the scan, tiny explode
    "q91_ingest_dedup",     // batch bands vs persisted index, pruned verify read
    "q92_temperature_mix",  // tiny stats agg broadcast + per-stratum rank window
    "q93_snapshot_delta",   // (id, md5) full-outer join — 24-byte rows, no text
    "q94_semantic_dedup",   // int8 cells + within-cell pair scan (O(c²)/cell)
    "q95_filter_funnel",    // k cumulative gates, ONE scan + k-long aggregate
    "q96_bpe_pairs",        // corpus→dictionary collapse, pairs over vocab only
    "q97_importance_scores",// 256-row broadcast weight table, (id,long) shuffles
    "q98_length_band",      // one window pass per lang, integer rank cuts
    // round-9 late additions (q99–q110)
    "q99_containment",      // capped inverted index (planted dups: super-linear output by design)
    "q100_budget_select",   // one cumsum window over (id, tokens)
    "q102_source_cap",      // per-source rank window
    "q103_nb_confusion",    // broadcast token-weight table train+score
    "q106_pagerank",        // long-arithmetic power iteration, O(1) plan depth
    "q108_corpus_drift",    // two (token,n) collapses + tiny join
    "q109_datacard",        // one scan feeding a cube
    "q110_pq_ann",          // PQ train (1+iters scans) + codes-only ADC scan
    "q111_boilerplate_lines", // line df on hash keys, verbatim passthrough
    "q112_ann_recall",      // broadcast probe table + two rank windows
    "q113_kmv_shards",      // per-shard min-k heaps, corpus-free merge
    // round-9 final additions (q133–q136)
    "q134_length_batches",  // banded/sharded batch windows, (id,count) shuffles
    "q135_bpe_merges",      // corpus→dictionary collapse + 4 vocab-sized rounds
    "q136_decontaminate_spans", // benchmark semi-join + splice (planted copies cut)
    "q137_cms_counts",      // (shard,row,bucket) map-side combine, sketch-row work
    "q138_collocations",    // bigram/unigram count tables, minCount prefilter
    // round-9 continuation additions (q139–q153)
    "q139_priority_sample", // scan + TakeOrderedAndProject weighted top-k
    "q143_rrf_fusion",      // BM25 + int8-cosine rankers, corpus-free fuse
    "q144_ngram_diversity", // 3 shingle-hash passes + count-distinct + entropy fold
    "q146_stream_cms",      // streaming sketch maintenance (state = depth x width)
    "q147_skew_report",     // count-per-key + broadcast stats + top-k heap
    "q149_user_sequences",  // bounded per-user collect_list + fingerprint
    "q150_leakage_safe_split", // LSH -> CC -> rep-hash split (planted pairs)
    "q151_tfidf_keywords",  // (doc,token,tf) collapse + per-doc top-k heap
    "q152_volume_anomalies",// day rollup + 3-long broadcast integer test
    "q153_ann_append",      // bucketed write + append + pruned probe
    "q155_normalized_dedup",// normalize chain + fingerprint groupBy
    "q158_decayed_trending",// (term,day,count) collapse + shift weights
    "q160_ivfpq_ann",       // IVF cell prune + PQ ADC scoring
    "q161_stream_ingest",   // 3-stage stateless stream + exact batch gate
    "q165_canonical_select",// capped pairs + CC + quality winner window
    "q166_frequent_pairs",  // basket-keyed pair join + nano lift
    // round-9 continuation (this session's additions)
    "q167_cross_source_dups", // (fp, source) rollup + fp-keyed self-join
    "q168_histogram_quantiles", // counter-sum merge + integer rank cuts
    "q169_soft_dedup",      // fingerprint count + re-join (reweight path)
    "q170_sorted_neighborhood", // globalRank range shuffle + rank-diff join
    "q171_label_propagation", // 3 vote rounds over the click graph
    "q172_margin_alignment",// cross-score + two direction windows
    "q173_calibration",     // NB class scores + integer bucket grid
    "q174_systematic_resample", // globalScan + marker arithmetic
    "q175_kcenter_coreset", // k sequential scans, driver-literal centers
    "q176_blocklist_gate",  // broadcast-literal token-set gate + rollup
    "q177_lateness_audit",  // globalRunningMax range shuffle + tiny histogram
    "q178_threshold_curve", // one jaccard pair pass + decile fan-out
    "q179_paired_bootstrap", // two rank windows + (reps x n) integer join
    "q180_precision_thresholds", // globalScan + target fan + rank-key join
    "q181_water_fill",      // group-table globalScan + two-scalar broadcast
    "q182_srp_health",      // bucket scan + 36-key literal-fan rollup
    "q183_sparse_cosine",   // hashed-TF postings dot join, df-capped
    "q184_quantile_normalize", // per-group rank window, (id,score) only
    "q185_budget_admit",    // stateful stream: one long per group + batch gate
    // round-9 continuation II (this session's additions)
    "q186_triangle_counts", // degree-ordered wedge join, O(√m) fan-out bound
    "q187_conformal_gate",  // score-grid quantile + broadcast threshold
    "q188_pareto_skyline",  // per-x maxima + grid suffix-max + broadcast join
    "q189_corpus_checksum", // one codegen'd md5 scan + commutative folds
    "q190_rendezvous_shards", // n inline md5s per row, no shuffle at all
    "q192_touch_attribution", // two user-partitioned window passes
    "q193_mmr_select",      // k argmax rounds, driver state = k rows
    "q194_clustering_coeff", // triangle core + degree join
    "q195_mad_outliers",    // two per-group rank passes + broadcast medians
    "q196_stream_conformal", // literal-threshold stateless stream gate
    "q197_path_trigrams",   // two leads in one window + count + top-k heap
    "q198_matched_controls", // per-group sort + two ignore-null windows
    "q199_retrieval_metrics", // 3 BM25 runs + (qid,doc) equi-join rollup
    "q200_auc_report",      // (group,score)-grid counts + grid window
    "q203_balanced_shards", // globalRank range shuffle + shard rollup
    "q204_cluster_merge",   // old assignment-as-edges + delta CC merge
    "q205_cusum_alarms",    // (type,day) collapse + two day-grid windows
    "q206_stratified_folds",// per-stratum rank window on (hash,id)
    "q207_prefix_cache",    // one md5 scan + map-side group rollup
    "q208_rolling_distinct",// day-grid register fan + register-wise max
    "q209_join_preflight",  // two count-per-key passes + 1-row broadcast
    "q210_ivf_health",      // k cosines per row + cell-key rollup
    "q212_cluster_provenance", // prefix-fp pairs + CC + per-rep rollup
    // round-10 additions: the r9/r10 operators that had no recorded ratio
    "q201_funnel_window",   // per-step groupBy chain with anchor-bound filter
    "q213_matched_global",  // two globalRunningLast range shuffles
    "q214_dedup_impact",    // fp pairs + CC + per-source rollup
    "q215_pair_reuse",      // pair mine write ONCE + keep-best from parquet
    "q216_ivf_append",      // IVF write + append + pruned probe
    "q217_bm25_append",     // postings append + additive stats merge + probe
    "q218_embedding_drift", // posexplode -> dim-grid collapse, decimal sums
    "q219_pair_append",     // batch-touched shingles only; old pairs untouched
    "q220_stream_reservoir", // shards*k bounded state, Update emissions + gate
    "q221_ingest_loop",     // index -> dedupe -> append survivors -> dedupe
    // round-11 additions: the lifecycle verbs (planted-dup output caveats
    // apply to the dedup-family ones, as above)
    "q222_ingest_compact",  // q221 + manifest-swap band compaction mid-loop
    "q223_index_delete",    // tombstone anti-join + purge-at-compact
    "q224_pair_retention",  // prune rewrite + curve from pruned evidence
    "q225_bm25_delete",     // per-bucket anti-join rewrite + exact stats
    "q226_ivf_delete",      // per-cell anti-join rewrite, pinned assignment
    "q227_pair_delete",     // pairwise-evidence delete ≡ survivor scratch mine
    "q228_ingest_retry",    // tag short-circuit + member-replay semi-join
    "q229_index_repair",    // fsck: bands rebuilt from stored shingle hashes
    "q230_stream_exactly_once", // epoch-tagged foreachBatch ingest + replay
    // round-12 additions
    "q231_srp_lifecycle",   // SRP write/append/compact x2 + path-pruned probe
    "q232_bm25_daily_loop", // append+compact+vacuum x2 + manifest-read probe
    "q233_stream_bm25_ingest", // epoch-tagged BM25 stream ingest + replay
    "q234_stream_ivf_ingest",  // epoch-tagged IVF stream ingest + audit
    "q235_ivf_retrain",     // blue/green re-cluster + new-centroid probe
    "q236_pair_undo",       // prune + previous-generation threshold curve
    "q237_stream_pair_ingest", // epoch-tagged pair stream ingest + replay
    "q238_ivf_undo",        // takedown + previous-generation ANN probe
    "q239_minor_compact",   // size-tiered debris merge + manifest-read probe
    "q240_auto_maintain",   // fs-metadata planner + policy pass + full read
    "q241_layout_fsck",     // per-leaf heal/sweep + manifest-read probe
    "q242_stream_maintained", // stream ingest + in-loop autoMaintain + replay
    "q243_bm25_fsck",       // manufactured damage + content repair + probe
    "q244_ivf_fsck")        // misrouted-cell repair + planted-copy probe

  def generate(spark: SparkSession, srcDir: String, outDir: String, factor: Int): Unit = {
    def copies(df: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => shift(df, i)).reduce(_.unionByName(_))
    def t(name: String) = spark.read.parquet(s"$srcDir/$name.parquet")
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    def off(df: DataFrame, c: String): Long = df.agg(max(col(c))).head().getLong(0) + 1

    // dimensions: unchanged
    Seq("region", "nation", "supplier", "part").foreach(n => write(t(n), n))

    val (custOff, ordOff) = (off(t("customer"), "c_custkey"), off(t("orders"), "o_orderkey"))
    write(copies(t("customer")) { (df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + i * custOff) }, "customer")
    write(copies(t("orders")) { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + i * ordOff)
        .withColumn("o_custkey", col("o_custkey") + i * custOff) }, "orders")
    write(copies(t("lineitem")) { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + i * ordOff) }, "lineitem")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = t("events") // ts stays raw int64 nanos; SparkEntry.events handles both
    val (evOff, userOff) = (off(ev, "event_id"), off(ev, "user_id"))
    write(copies(ev) { (df, i) =>
      df.withColumn("event_id", col("event_id") + i * evOff)
        .withColumn("user_id", col("user_id") + i * userOff) }, "events")

    val docs = t("documents")
    val docOff = off(docs, "doc_id")
    write(copies(docs) { (df, i) =>
      df.withColumn("doc_id", col("doc_id") + i * docOff)
        .withColumn("text", concat(col("text"), lit(s" cpy$i"))) }, "documents")

    val emb = t("embeddings")
    val vecOff = off(emb, "vec_id")
    write(copies(emb) { (df, i) =>
      df.withColumn("vec_id", col("vec_id") + i * vecOff) }, "embeddings")
  }

  private def time(spark: SparkSession, name: String, dir: String): Double = {
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
    val dt = (System.nanoTime() - t0) / 1e9
    // Deterministic inter-query block release (same rationale as Bench):
    // lingering localCheckpoint blocks from a prior query would otherwise
    // surface as GC pressure inside the NEXT query's timed window.
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    spark.catalog.clearCache()
    dt
  }

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft_sf1")
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    TmpHygiene.sweep()

    if (!new java.io.File(s"$outDir/lineitem.parquet").isDirectory) {
      System.err.println(s"[probe] generating ${factor}x corpus at $outDir")
      generate(spark, srcDir, outDir, factor)
    }
    // optional probe subset (dev loops): comma-separated name substrings,
    // the graft.Verify convention
    val probeQueries = sys.env.get("SPARK_GRAFT_PROBE_ONLY") match {
      case Some(f) =>
        val pats = f.split(",").toSeq
        ScaleProbe.probeQueries.filter(q => pats.exists(q.contains))
      case None => ScaleProbe.probeQueries
    }
    // warm both scales once (codegen/JIT), then measure
    probeQueries.foreach { q =>
      try { time(spark, q, srcDir); time(spark, q, outDir) }
      catch { case t: Throwable => System.err.println(s"[probe] warm $q: $t") }
    }
    val rows = probeQueries.map { q =>
      val small = time(spark, q, srcDir)
      val big = time(spark, q, outDir)
      val ratio = big / small
      println(f"""{"query":"$q","sf01_sec":$small%.3f,"sf1_sec":$big%.3f,"ratio":$ratio%.2f}""")
      (q, small, big, ratio)
    }
    val totS = rows.map(_._2).sum; val totB = rows.map(_._3).sum
    println(f"""{"metric":"scale_probe","factor":$factor,"sf01_total":$totS%.2f,"sf1_total":$totB%.2f,"ratio":${totB / totS}%.2f}""")
    spark.stop()
  }
}
