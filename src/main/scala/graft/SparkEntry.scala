package graft

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.query.{Clauses, GQuery}
import graft.store.KeyedStore
import graft.functions.GraftFunctions._
import graft.ops.{Audit, Dedup, Multimodal, Sampling, Similarity, TextOps}

/**
 * Driver contract — the operator inventory of SURVEY.md §2 (+ the north-star
 * LLM-pipeline operators) as named queries, each with a DuckDB oracle where the
 * semantics are ANSI-SQL-expressible.
 *
 * FP-parity rules for oracles (hash-compared against DuckDB):
 *  - Large price sums aggregate in DECIMAL (exact at any scale factor — double
 *    summation drift crossed a round-4 boundary at sf0.1), then cast to double
 *    once at the end, identically on both engines.
 *  - Remaining floating aggregates round to the decimal grid their inputs live
 *    on, so bounded error cannot flip a rounding boundary.
 *  - Ranks/top-k order by exact (decimal/grid-rounded) values with unique-key
 *    tie-breaks, never by raw doubles; timestamps compare in epoch-µs.
 */
object SparkEntry {

  /** Shared constants of the relational HyperLogLog (q37): m=4096 registers,
    * registers capped at 40 so the harmonic sum stays an exact integer
    * (max 4096·2^40 = 2^52 < 2^63). `C` = α_m·m²·2^40 is interpolated into BOTH
    * the Spark plan and the DuckDB SQL from this one value — `Double.toString`
    * round-trips, so the two engines parse the identical IEEE double and the
    * estimate (one multiply + one divide + floor) is bit-identical. */
  private[graft] object Hll {
    val m = 4096
    val alpha: Double = 0.7213 / (1 + 1.079 / m)
    val C: Double = alpha * m.toDouble * m.toDouble * (1L << 40).toDouble
  }

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** The events table's `ts` encoding is layout-dependent (int64 nanos under
    * `nanosAsLong`, or native TIMESTAMP_NTZ micros); normalize through the
    * one shared contract in [[graft.streaming.Streaming.normalizeEventTs]]. */
  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.streaming.Streaming.normalizeEventTs(
      s.read.parquet(s"$dir/events.parquet"))
  }

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  // =========================================================================
  // Queries. Names sort in execution-group order; every key here either has an
  // oracleSql twin (strong check) or is verified by ScalaTest (rows-only check).
  // =========================================================================
  def queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(

    // --- G3/G4: scan → group → aggregate (partial agg = combiner) ------------
    "q01_pricing_summary" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).cast("bigint").as("sum_qty"),
          round(sum(col("l_extendedprice").cast("decimal(18,2)")), 2)
            .cast("double").as("sum_base_price"),
          round(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount").cast("decimal(18,2)"))), 4)
            .cast("double").as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),

    // --- P2-P9: the predicate algebra (Clauses), pushed into the parquet scan
    "q02_filter_predicates" -> ((s, dir) => {
      GQuery(T(s, dir, "part"))
        .filter(
          Clauses.mustBeIn(col("p_type"), "STANDARD", "SMALL", "PROMO"),
          Clauses.mustContain(col("p_name"), "widget"),
          Clauses.mustBeGreaterThan(col("p_size"), 10),
          Clauses.mustNotEqual(col("p_brand"), "Brand#13"),
          Clauses.mustPassRegex(col("p_brand"), "^Brand#[0-9]$"))
        .toDF
        .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"))
    }),

    // --- joins + group + deterministic top-k (broadcast the dimension) ------
    "q03_top_orders" -> ((s, dir) => {
      val c = T(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
      val o = T(s, dir, "orders")
      val l = T(s, dir, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(18,2)"))), 4)
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // --- semi-join (EXISTS) --------------------------------------------------
    "q04_exists_orders" -> ((s, dir) => {
      val o = T(s, dir, "orders")
      val l = T(s, dir, "lineitem").where(col("l_returnflag") === "R")
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    }),

    // --- 5-way star join through region/nation (broadcast small dims) -------
    "q05_region_revenue" -> ((s, dir) => {
      val r = T(s, dir, "region")
      val n = T(s, dir, "nation")
      val c = T(s, dir, "customer")
      val o = T(s, dir, "orders")
      val l = T(s, dir, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(18,2)"))), 4)
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // --- pushdown-friendly filter + single aggregate -------------------------
    "q06_forecast_revenue" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)") *
          col("l_discount").cast("decimal(18,2)")), 4).cast("double").as("revenue"))
    }),

    // --- window: rank-per-group on grid-rounded measure ----------------------
    "q07_rank_customers" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      val o = T(s, dir, "orders")
      val rev = o.groupBy(col("o_custkey"))
        .agg(round(sum(col("o_totalprice")), 2).as("rev"))
      val joined = c.join(rev, c("c_custkey") === rev("o_custkey"))
      val w = Window.partitionBy(col("c_nationkey")).orderBy(col("rev").desc, col("c_custkey"))
      joined.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("c_nationkey"), col("rn"), col("c_custkey"), col("rev"))
    }),

    // --- grouping sets / rollup ----------------------------------------------
    "q08_rollup" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).cast("bigint").as("sum_qty"),
          count(lit(1)).as("n"))
    }),

    // --- set ops: INTERSECT / EXCEPT (distinct semantics) --------------------
    "q09_setops" -> ((s, dir) => {
      val o = T(s, dir, "orders")
      def buyers(yr: Int) =
        o.where(year(col("o_orderdate")) === yr).select(col("o_custkey")).distinct()
      val both = buyers(1995).intersect(buyers(1996))
        .withColumn("cohort", lit("both"))
      val only95 = buyers(1995).except(buyers(1996))
        .withColumn("cohort", lit("only_1995"))
      both.unionAll(only95)
    }),

    // --- S3: multi-get (withKeys), routed through the graft DSv2 connector:
    //     the IN-set reaches GraftScan as a pushed filter for key-range split
    //     pruning + parquet row-group pruning (ConnectorSpec proves both) -----
    "q10_multiget" -> ((s, dir) => {
      new GQuery(KeyedStore.readKeyed(s, s"$dir/customer.parquet", "c_custkey"),
        keyCol = "c_custkey")
        .withKeys(Seq(1L, 2L, 3L, 5L, 8L, 13L, 21L, 34L, 55L, 89L))
        .toDF
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    }),

    // --- S5/P17: range scan with start/end row + time-range predicate, over
    //     the graft connector (start/end become pushed range filters) ---------
    "q11_range_scan" -> ((s, dir) => {
      new GQuery(KeyedStore.readKeyed(s, s"$dir/orders.parquet", "o_orderkey"),
        keyCol = "o_orderkey")
        .withStartRow(1000L).withEndRow(2000L)
        .betweenDates("o_orderdate", java.sql.Timestamp.valueOf("1995-01-01 00:00:00"),
          java.sql.Timestamp.valueOf("1999-01-01 00:00:00"))
        .filter(Clauses.mustEqual(col("o_orderstatus"), "F"))
        .toDF
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          round(col("o_totalprice"), 2).as("price"))
    }),

    // --- time-bucketed aggregation over the events stream table --------------
    "q12_events_daily" -> ((s, dir) => {
      events(s, dir)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
    }),

    // --- sessionization via window lag (30-min inactivity gap) ---------------
    "q13_sessionize" -> ((s, dir) => {
      val e = events(s, dir)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      e.withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))) > 1800, 1L)
            .otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("new_sess")).as("n_sessions"), count(lit(1)).as("n_events"))
    }),

    // --- the WebSearchAggregation slice (SURVEY §3.3): events → dynamic-family
    //     map<day,long> per user (the searchesByDay model) → exploded back for
    //     the oracle. Exercises map_from_entries / explode round-trip.
    "q14_family_rollup" -> ((s, dir) => {
      val perDay = events(s, dir)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val asFamily = perDay.groupBy(col("user_id"))
        .agg(map_from_entries(collect_list(struct(col("day"), col("n")))).as("byDay"))
      asFamily.select(col("user_id"), explode(col("byDay")).as(Seq("day", "searches")))
    }),

    // --- P13: per-family column pagination (page 2 of 5, qualifier-sorted) ---
    "q15_family_pagination" -> ((s, dir) => {
      val perDay = events(s, dir)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val asFamily = perDay.groupBy(col("user_id"))
        .agg(map_from_entries(collect_list(struct(col("day"), col("n")))).as("byDay"))
      asFamily
        .select(col("user_id"),
          Clauses.paginateFamily(col("byDay"), 5, 5).as("page2"))
        .select(col("user_id"), explode(col("page2")).as(Seq("day", "searches")))
    }),

    // --- M4: increment merge (coalesce(old,0)+delta, batch pre-summed) -------
    "q16_increment_merge" -> ((s, dir) => {
      val current = T(s, dir, "customer").select(col("c_custkey").as("key"), col("c_acctbal"))
      val deltas = T(s, dir, "orders").select(col("o_custkey").as("key"),
        col("o_totalprice").as("c_acctbal"))
      KeyedStore.increment(current, deltas)
        .select(col("key").as("c_custkey"), round(col("c_acctbal"), 2).as("acctbal_new"))
    }),

    // --- M1/M5: last-write-wins upsert merge ---------------------------------
    "q17_upsert_merge" -> ((s, dir) => {
      val current = T(s, dir, "customer")
        .select(col("c_custkey").as("key"), col("c_name"), col("c_mktsegment"))
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey").desc)
      val puts = T(s, dir, "orders")
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("o_custkey").as("key"),
          concat(lit("P:"), col("o_orderpriority")).as("c_mktsegment"))
      KeyedStore.upsert(current, puts)
        .select(col("key").as("c_custkey"), col("c_name"), col("c_mktsegment"))
    }),

    // --- M3: delete merge (anti-join) ----------------------------------------
    "q18_delete_merge" -> ((s, dir) => {
      val current = T(s, dir, "customer")
      val noOrders = current.join(T(s, dir, "orders"),
        current("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"))
      KeyedStore.deleteRows(current, noOrders, keyCol = "c_custkey")
        .select(col("c_custkey"), col("c_name"))
    }),

    // --- text analysis: token counting ---------------------------------------
    "q19_token_count" -> ((s, dir) => {
      T(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(sum(token_count(col("text"))).cast("bigint").as("total_tokens"),
          round(avg(token_count(col("text"))), 4).as("avg_tokens"),
          count(lit(1)).as("n_docs"))
    }),

    // --- text analysis: language-ID heuristic vs labeled lang ----------------
    "q20_lang_id" -> ((s, dir) => {
      T(s, dir, "documents")
        .withColumn("toks", tokens(lower(col("text")))) // tokenize once
        .select(col("lang"), TextOps.langIdFromTokens(col("toks")).as("lang_pred"))
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))
    }),

    // --- text analysis: quality scoring --------------------------------------
    "q21_quality_score" -> ((s, dir) => {
      T(s, dir, "documents")
        .select(col("source"), TextOps.qualityScore(col("text")).as("q"))
        .groupBy(col("source"))
        .agg(round(sum(col("q")), 4).as("sum_quality"), count(lit(1)).as("n_docs"))
    }),

    // --- text analysis: content fingerprinting (md5, cross-engine stable) ----
    "q22_fingerprint" -> ((s, dir) => {
      T(s, dir, "documents")
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        .where(col("doc_id") < 100)
    }),

    // --- dedup: exact (hash-groupBy on content) ------------------------------
    "q23_dedup_exact" -> ((s, dir) => {
      Dedup.exact(T(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("n_dups"))
    }),

    // --- dedup: exact n-gram Jaccard via inverted-index join. Shipped with
    //     the stop-shingle cap active (maxDf=1000 — no shingle reaches it at
    //     these SFs, but the oracle replays the identical rule, so the gate
    //     checks the CAPPED configuration a 100 TB run would use) ------------
    "q24_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccard(T(s, dir, "documents"), "doc_id", "text",
        shingleSize = 3, threshold = 0.2, maxDf = Some(1000))
    }),

    // --- similarity: brute-force cosine top-k (native codegen expression) ----
    "q25_cosine_topk" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val q = emb.where(col("vec_id") === 0).select(col("embedding"))
        .head().getSeq[Float](0)
      Similarity.bruteForceTopK(emb.where(col("vec_id") =!= 0), "vec_id", "embedding", q, 10)
        .select(col("vec_id"), round(col("cos"), 4).as("cos"))
    }),

    // --- similarity: threshold scan aggregated by label ----------------------
    "q26_cosine_by_label" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val q = emb.where(col("vec_id") === 0).select(col("embedding"))
        .head().getSeq[Float](0)
      val qc = array(q.map(v => lit(v)): _*)
      emb.where(col("vec_id") =!= 0)
        .groupBy(col("label"))
        .agg(round(avg(cosine_sim(col("embedding"), qc)), 4).as("avg_cos"),
          count(lit(1)).as("n"))
    }),

    // --- dedup: MinHash-LSH candidate pairs. Oracle-checked: at threshold 0.8
    //     with 32 bands x 4 rows the planted duplicates are caught by every
    //     band (verified exhaustively at sf0.01 AND sf0.1 — LSH output equals
    //     the exact-Jaccard pair set, deterministic because the hash seeds are
    //     fixed), so DuckDB's exact inverted-index Jaccard is a true oracle. --
    "q27_minhash_pairs" -> ((s, dir) => {
      Dedup.minHashLSH(T(s, dir, "documents"), "doc_id", "text",
        shingleSize = 3, numHashes = 128, rowsPerBand = 4, threshold = 0.8)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
    }),

    // --- dedup: transitive duplicate clustering — connected components over
    //     the near-dup pair graph (min-label propagation + pointer jumping,
    //     O(log n) rounds). Edges come from the EXACT inverted-index Jaccard
    //     (ngramJaccard), so the oracle's recursive CTE over the same exact
    //     pair set is a structural equivalence, not a banding-recall bet
    //     (round-4 advisory); reps AND sizes are cross-engine checked. The
    //     LSH pair generator remains the stated 100 TB edge source — the
    //     clustering loop is agnostic to which generator feeds it. ----------
    "q72_dup_clusters" -> ((s, dir) => {
      val pairs = Dedup.ngramJaccard(T(s, dir, "documents"), "doc_id", "text",
        shingleSize = 3, threshold = 0.8, maxDf = Some(1000))
      Dedup.clusterDuplicates(pairs)
        .select(col("id").as("doc_id"), col("rep"), col("cluster_size"))
    }),

    // --- dedup: SimHash near-dup pairs, oracle-checked end to end. Token
    //     hashes are the md5-60-bit scheme (DuckDB-replayable); pigeonhole
    //     banding GUARANTEES recall for Hamming ≤ 3 (3 differing bits touch at
    //     most 3 of the 4 chunks), so the output is exactly the set of pairs
    //     the oracle's all-pairs bit_count(xor) scan finds — no recall gamble.
    "q28_simhash_pairs" -> ((s, dir) => {
      Dedup.simHash(T(s, dir, "documents"), "doc_id", "text", maxHamming = 3,
        tokenHasher = md5_token_hashes)
        .select(col("id_a"), col("id_b"), col("hamming").cast("bigint").as("hamming"))
    }),

    // --- similarity: LSH-bucketed ANN, oracle-checked end to end. ANN output
    //     is approximate BY CONTRACT (it differs from brute-force top-k on
    //     near-uniform data), so the oracle replays the algorithm itself: the
    //     md5 SRP scheme quantizes vectors to integers and derives plane
    //     weights from md5, making bucket + probes + cosine top-k exactly
    //     computable in DuckDB SQL. Recall vs brute force stays spec-tested. --
    "q29_ann_topk" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val q = emb.where(col("vec_id") === 0).select(col("embedding"))
        .head().getSeq[Float](0)
      Similarity.annTopK(emb.where(col("vec_id") =!= 0), "vec_id", "embedding",
          q, 10, nBits = 8, scheme = Similarity.SrpScheme.md5)
        .select(col("vec_id"), round(col("cos"), 4).as("cos"))
    }),

    // --- multimodal: REAL decode metadata rollup — synthesize genuine PNG +
    //     WAV payloads, decode BOTH back (image + audio stats joined per doc),
    //     and aggregate corpus-level media statistics. The DuckDB oracle
    //     recomputes every decoded quantity in closed form from the synthesis
    //     formulas, so a single corrupted pixel or sample anywhere in either
    //     codec path breaks the hash. Blobs never shuffle: each decode is a
    //     partition-local mapPartitions and only per-doc scalars reach the
    //     join/aggregate -----------------------------------------------------
    "q30_multimodal_meta" -> ((s, dir) => {
      val ids = T(s, dir, "documents").where(col("doc_id") < 256).select(col("doc_id"))
      val media = Multimodal.synthesizeMedia(ids, "doc_id")
      val img = Multimodal.decodeImageStats(media, "doc_id", "image")
      val aud = Multimodal.decodeAudioStats(media, "doc_id", "audio")
      img.join(aud, "doc_id")
        .groupBy(col("format"))
        .agg(count(lit(1)).as("n"),
          sum(col("width").cast("long") * col("height")).cast("bigint").as("total_pixels"),
          sum(col("pixel_sum")).cast("bigint").as("total_pixel_sum"),
          sum(col("n_samples")).cast("bigint").as("total_samples"),
          sum(col("duration_us")).cast("bigint").as("total_duration_us"))
    }),

    // --- Structured Streaming: watermarked windowed agg, drained via
    //     AvailableNow (file replay is deterministic) ------------------------
    "q31_stream_hourly" -> ((s, dir) => {
      graft.streaming.Streaming.runToTable(
        graft.streaming.Streaming.hourlyRollup(
          graft.streaming.Streaming.eventsStream(s, dir)),
        "q31_mem_" + java.util.UUID.randomUUID().toString.replace("-", ""),
        statePartitions = Some(4)) // ~3.6k state keys; see runToTable scaladoc
    }),

    // --- as-of join (operator Spark lacks; composed union+window, one shuffle)
    "q32_asof_join" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("ts"), col("event_id"))
      val o = T(s, dir, "orders").select(col("o_custkey"), col("o_orderdate"))
      // union trick: interleave both sides on the time axis, carry the last
      // order date forward; rows from the order side sort first on ties
      // (inclusive as-of: event at t matches order at t).
      val tagged = e.select(col("user_id"), col("ts").as("t"), lit(1).as("is_event"),
          col("event_id"), lit(null).cast("timestamp").as("odate"))
        .unionByName(o.select(col("o_custkey").as("user_id"),
          col("o_orderdate").as("t"), lit(0).as("is_event"),
          lit(null).cast("long").as("event_id"), col("o_orderdate").as("odate")))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t"), col("is_event"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("asof_date", last(col("odate"), ignoreNulls = true).over(w))
        .where(col("is_event") === 1)
        .select(col("event_id"), col("user_id"), col("asof_date"))
    }),

    // --- distinct aggregation (exact) ----------------------------------------
    "q33_distinct_agg" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n_rows"))
    }),

    // --- semi-structured extraction from the events props JSON ---------------
    "q34_json_props" -> ((s, dir) => {
      events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("bigint").as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), max(col("k")).as("max_k"),
          count(lit(1)).as("n"))
    }),

    // --- G5: secondary sort — first 3 shipments per supplier chronologically -
    "q35_secondary_sort" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      T(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w).cast("int"))
        .where(col("rn") <= 3)
        .select(col("l_suppkey"), col("rn"), col("l_orderkey"), col("l_linenumber"))
    }),

    // --- text: BPE-ish subword token counting --------------------------------
    "q36_subword_tokens" -> ((s, dir) => {
      T(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(sum(size(subword_tokens(col("text"), 4))).cast("bigint").as("n_subwords"),
          count(lit(1)).as("n_docs"))
    }),

    // --- sketch: HyperLogLog distinct-count as pure relational algebra, so the
    //     sketch itself is oracle-checkable. Register hash = top 60 bits of
    //     md5 (cross-engine stable); p=12 (4096 registers); rho via the binary
    //     string length (exact integer op, no log2 rounding hazard); harmonic
    //     sum kept in integer-scaled form sum(2^(40-M)) so addition order
    //     cannot drift; the final estimate uses only IEEE-exact * and /. ------
    "q37_hll_sketch" -> ((s, dir) => {
      val h = md5_prefix60(col("l_orderkey").cast("string"))
      val rho = least(
        when(col("w") === 0L, lit(49))
          .otherwise(lit(49) - length(bin(col("w")))), lit(40))
      val byBucket = T(s, dir, "lineitem")
        .select(col("l_returnflag"), pmod(h, lit(4096L)).as("bucket"),
          shiftrightunsigned(h, 12).as("w"))
        .select(col("l_returnflag"), col("bucket"), rho.as("rho"))
        .groupBy(col("l_returnflag"), col("bucket"))
        .agg(max(col("rho")).as("m"), count(lit(1)).as("cnt"))
      byBucket
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("nb"),
          sum(expr("shiftleft(cast(1 as bigint), 40 - m)")).as("sp"),
          sum(col("cnt")).as("n"))
        .select(col("l_returnflag"),
          floor(lit(Hll.C) /
            (col("sp") + (lit(4096L) - col("nb")) * lit(1L << 40)).cast("double"))
            .cast("bigint").as("approx_orders"),
          col("n"))
    }),

    // --- dedup: embedding near-dup via hyperplane LSH + cosine verify.
    //     Ten 2x-scaled copies are planted (float doubling is exact, so
    //     cosine rounds to exactly 1.0 and the LSH bucket is identical);
    //     the operator must recover precisely those ten pairs -> oracle.
    "q38_embedding_neardup" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val copies = emb.where(col("vec_id") < 10)
        .select((col("vec_id") + 9000L).as("vec_id"),
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
      Dedup.embeddingNearDup(emb.unionByName(copies), "vec_id", "embedding",
        threshold = 0.999, nBits = 8)
        .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
    }),

    // --- text: rolling Karp-Rabin fingerprint (rows-only; law-tested in spec) -
    "q39_rolling_fingerprint" -> ((s, dir) => {
      T(s, dir, "documents")
        .select(col("doc_id"), rolling_hash(col("text")).as("rfp"))
        .where(col("doc_id") < 100)
    }),

    // --- versioned cells: "maxVersions=1" read = latest value per cell ------
    "q40_latest_version" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(unix_micros(col("ts")).desc, col("event_id").desc)
      events(s, dir)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("user_id"), col("event_type"),
          col("event_id").as("latest_event_id"),
          round(col("value"), 2).as("latest_value"))
    }),

    // --- SQL surface: the native expressions registered via GraftExtensions,
    //     driven through plain spark.sql with a scalar subquery --------------
    "q42_sql_cosine" -> ((s, dir) => {
      org.apache.spark.sql.graft.GraftExtensions.register(s)
      T(s, dir, "embeddings").createOrReplaceTempView("emb_v")
      s.sql(
        """SELECT vec_id,
          |  round(cosine_sim(embedding,
          |    (SELECT embedding FROM emb_v WHERE vec_id = 1)), 4) AS cos
          |FROM emb_v WHERE vec_id <> 1
          |ORDER BY cosine_sim(embedding,
          |    (SELECT embedding FROM emb_v WHERE vec_id = 1)) DESC, vec_id
          |LIMIT 5""".stripMargin)
    }),

    // --- training-data hygiene: deterministic hash split (train/test) --------
    "q43_train_split" -> ((s, dir) => {
      graft.ops.Sampling.hashSplit(T(s, dir, "documents"), "doc_id", 80)
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"))
    }),

    // --- G5 skew path: two-phase salted aggregation — salting is internally
    //     invisible (phase 2 merges partials exactly), so the plain group-sum
    //     is a true oracle -------------------------------------------------
    "q60_salted_agg" -> ((s, dir) => {
      graft.jobs.GJob.saltedSum(T(s, dir, "lineitem"),
          Seq("l_suppkey"), "l_quantity", numSalts = 16)
        .select(col("l_suppkey"),
          col("sum_l_quantity").cast("bigint").as("sum_qty"))
    }),

    // --- compile-time-checked column references: the query is written purely
    //     against graft.schema.DocTable's typed refs (a typo in any of them
    //     fails compilation — TypedSchemaSpec pins that with assertTypeError);
    //     the family struct is built from the flat corpus, then filtered and
    //     projected through `DocTable.meta.*` (reference HbaseTable.scala:
    //     333-361, the (T) => Column compiler-checked projections) -----------
    "q61_typed_refs" -> ((s, dir) => {
      import graft.schema.DocTable
      T(s, dir, "documents")
        .select(col("doc_id").as("key"),
          struct(col("lang"), col("source"), col("n_chars")).as("meta"))
        .where(DocTable.meta.lang === "en" && DocTable.meta.nChars > 500L)
        .select(DocTable.key.as("key"), DocTable.meta.source.as("source"),
          DocTable.meta.nChars.as("n_chars"))
    }),

    // --- the indexed keyed-store round trip, end-to-end: range-sorted write
    //     with sidecar index, an index-pruned upsert (only files containing
    //     put keys rewrite — ConnectorSpec proves the pruning), read back
    //     through the DSv2 connector. The oracle replays the merge in SQL ----
    "q62_indexed_upsert" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q62_")
        .resolve("t").toString
      val c = T(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      KeyedStore.writeIndexed(c, tmp, "c_custkey", numRanges = 8)
      val updates = c.where(pmod(col("c_custkey"), lit(97)) === 0)
        .withColumn("c_name", concat(lit("UPD_"), col("c_name")))
      val inserts = c.where(pmod(col("c_custkey"), lit(131)) === 0)
        .withColumn("c_custkey", col("c_custkey") + 10000000L)
        .withColumn("c_name", concat(lit("NEW_"), col("c_name")))
      KeyedStore.upsertIndexed(s, tmp, updates.unionByName(inserts), "c_custkey")
      KeyedStore.readKeyed(s, tmp, "c_custkey")
        .select(col("c_custkey").as("key"), col("c_name").as("name"),
          col("c_mktsegment").as("segment"))
    }),

    // --- REAL image decode, oracle-checked end to end: synthesize genuine PNG
    //     bytes (ImageIO's DEFLATE codec), decode them back, and also resize
    //     through decode→nearest-neighbor→re-encode. The DuckDB oracle
    //     recomputes every decoded statistic in closed form from the synthesis
    //     formulas — one flipped pixel anywhere in the codec path breaks the
    //     hash. The blob itself never shuffles (the 64-row join carries only
    //     id + sums) ---------------------------------------------------------
    "q63_image_decode" -> ((s, dir) => {
      val ids = T(s, dir, "documents").where(col("doc_id") < 64).select(col("doc_id"))
      val media = Multimodal.synthesizeMedia(ids, "doc_id")
      val decoded = Multimodal.decodeImageStats(media, "doc_id", "image")
      val resized = Multimodal.decodeImageStats(
          Multimodal.resizeMedia(media, "image", 5, 4), "doc_id", "image")
        .select(col("doc_id"), col("pixel_sum").as("resized_sum"))
      decoded.join(broadcast(resized), "doc_id")
        .select(col("doc_id"), col("format"), col("width"), col("height"),
          col("pixel_sum"), col("resized_sum"))
    }),

    // --- REAL audio decode: RIFF chunk walk + PCM16 fold; duration derives
    //     from the parsed header's sample rate, not metadata ------------------
    "q64_audio_decode" -> ((s, dir) => {
      val ids = T(s, dir, "documents").where(col("doc_id") < 100).select(col("doc_id"))
      Multimodal.decodeAudioStats(
        Multimodal.synthesizeMedia(ids, "doc_id"), "doc_id", "audio")
    }),

    // --- train/test contamination audit: distinct test shingles probed
    //     against the train split's global shingle set (equi-join on 64-bit
    //     hashes; only 8-byte keys shuffle). Split is the deterministic
    //     md5-bucket split, so both engines draw identical train sets --------
    "q65_contamination" -> ((s, dir) => {
      val sp = graft.ops.Sampling.hashSplit(T(s, dir, "documents"), "doc_id", 80)
      TextOps.contamination(
        sp.where(col("split") === "train"),
        sp.where(col("split") === "test"),
        "doc_id", "text", shingleSize = 3)
    }),

    // --- the bloom fast path, oracle-gated: the sketch side can't be
    //     replayed in SQL (filter bits depend on Spark's bloom impl), so the
    //     query checks it RELATIONALLY against the exact operator — the
    //     superset contract `n_bloom >= n_exact` (bloom filters never
    //     undercount) folds into a boolean column that must be TRUE for
    //     every doc — while the exact side is value-checked by the DuckDB
    //     replay of q65's contamination SQL --------------------------------
    "q79_contamination_bloom" -> ((s, dir) => {
      val sp = graft.ops.Sampling.hashSplit(T(s, dir, "documents"), "doc_id", 80)
      val train = sp.where(col("split") === "train")
      val test = sp.where(col("split") === "test")
      val exact = TextOps.contamination(train, test, "doc_id", "text", shingleSize = 3)
        .select(col("doc_id"), col("n_shingles"), col("n_contaminated").as("n_exact"))
      val bloom = TextOps.contaminationBloom(train, test, "doc_id", "text", shingleSize = 3)
        .select(col("doc_id"), col("n_contaminated").as("n_bloom"))
      exact.join(bloom, "doc_id")
        .select(col("doc_id"), col("n_shingles"), col("n_exact"),
          (col("n_bloom") >= col("n_exact")).as("bloom_ge_exact"))
    }),

    // --- streaming MinHash near-dup dedup: documents replayed in 4
    //     micro-batches (ntile over doc_id — oracle-reconstructible); a doc
    //     is dropped iff an EARLIER-batch doc reaches exact Jaccard >= 0.8
    //     (verified in-stream on the band collision, so drops == the exact
    //     pair rule via q27's proven LSH==exact equivalence). Output: per-lang
    //     survivor rollup, the streaming twin of q75's application ----------
    "q80_stream_near_dedup" -> ((s, dir) => {
      val replay = graft.streaming.Streaming.docsReplay(s, dir, 4)
      // 30-day watermark >> the 3-hour replay span: nothing evicts mid-drain,
      // so every earlier batch is a valid partner source (the oracle's rule);
      // eviction semantics are spec-pinned separately with a tight watermark
      val drops = graft.streaming.Streaming.nearDupDropStream(
        replay, "doc_id", "text", "ts", watermark = "30 days",
        shingleSize = 3, numHashes = 128, rowsPerBand = 4, threshold = 0.8)
      val dropped = graft.streaming.Streaming.runToTable(
        drops.toDF(),
        "q80_mem_" + java.util.UUID.randomUUID().toString.replace("-", ""),
        mode = org.apache.spark.sql.streaming.OutputMode.Append(),
        statePartitions = Some(4), noDataBatch = false)
      T(s, dir, "documents")
        .join(dropped.select(col("id").as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
    }),

    // --- stratified data mixing: deterministic per-language keep rates
    //     (down-sample en to 25%, zh to 50%, drop de entirely) as one
    //     scan-level literal-CASE filter — the corpus-reweighting stage of a
    //     training pipeline, stable across engines/partitionings ------------
    "q81_stratified_mix" -> ((s, dir) =>
      graft.ops.Sampling.stratifiedSample(T(s, dir, "documents"), "doc_id",
          "lang", Map("en" -> 250, "zh" -> 500, "de" -> 0))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))),

    // --- context-window chunking: every doc cut into 128-token windows;
    //     the oracle md5-hashes every chunk's text, so one off-by-one in any
    //     window boundary anywhere in the corpus breaks the hash -------------
    "q82_context_chunks" -> ((s, dir) =>
      TextOps.chunkDocuments(T(s, dir, "documents"), "doc_id", "text", 128)
        .select(col("id").as("doc_id"), col("chunk_idx"), col("n_tokens"),
          md5(col("chunk_text").cast("binary")).as("chunk_md5"))),

    // --- sequence packing (concat-then-cut per language, 2048-token budget):
    //     pack manifests with doc counts and token totals ---------------------
    "q83_sequence_packs" -> ((s, dir) =>
      TextOps.packDocuments(T(s, dir, "documents"), "doc_id", "text",
          "lang", 2048)
        .groupBy(col("stratum").as("lang"), col("pack_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("pack_tokens"))),

    // --- int8 embedding quantization (the 4x storage cut of a 100 TB vector
    //     store): floor arithmetic on promoted doubles is IEEE-identical in
    //     both engines, so the oracle value-checks every vector's quantized
    //     sum/sq-sum and its scale to the microunit ---------------------------
    "q85_quantized_embeddings" -> ((s, dir) =>
      graft.ops.Similarity.quantizeInt8(
          T(s, dir, "embeddings"), "vec_id", "embedding")
        .select(col("id").as("vec_id"),
          floor(col("scale") * 1000000.0d).cast("bigint").as("scale_micro"),
          aggregate(col("qvec"), lit(0L),
            (acc, y) => acc + y.cast("long")).as("q_sum"),
          aggregate(col("qvec"), lit(0L),
            (acc, y) => acc + y.cast("long") * y.cast("long")).as("q_sqsum"))),

    // --- ingest decontamination soundness, oracle-gated like q79: the
    //     per-row bloom probe (contaminationBloomFlags — the stateless form
    //     decontaminateStream deploys on streams) must overcount-only vs
    //     exact; keep-soundness at any maxRate is a direct COROLLARY
    //     (bloom-keep ⇒ bloom rate ≤ maxRate ⇒ exact rate ≤ maxRate), and the
    //     second clause spells that corollary out at maxRate=0.2 in INTEGER
    //     form (5·n vs n_shingles — no float-division ambiguity) so the
    //     shipped contract is asserted verbatim, not just derivable. The
    //     exact side is value-checked by the DuckDB replay ------------------
    "q84_stream_decontaminate" -> ((s, dir) => {
      val sp = graft.ops.Sampling.hashSplit(T(s, dir, "documents"), "doc_id", 80)
      val train = sp.where(col("split") === "train")
      val test = sp.where(col("split") === "test")
      val flags = TextOps.contaminationBloomFlags(
          test.select(col("doc_id"), col("text")), train, "doc_id", "text", 3)
        .select(col("doc_id"), col("n_shingles"), col("n_contaminated").as("n_bloom"))
      val exact = TextOps.contamination(train, test, "doc_id", "text", 3)
        .select(col("doc_id"), col("n_contaminated").as("n_exact"))
      flags.join(exact, "doc_id")
        .select(col("doc_id"), col("n_shingles"), col("n_exact"),
          // NULL text ⇒ NULL counts ⇒ the relation is vacuously sound (the
          // stream keeps such rows); without the guard the boolean would be
          // NULL where the oracle pins TRUE
          when(col("n_shingles").isNull, lit(true))
            .otherwise(col("n_bloom") >= col("n_exact") &&
              (col("n_bloom") * 5 > col("n_shingles") ||
                col("n_exact") * 5 <= col("n_shingles")))
            .as("decontamination_sound"))
    }),

    // --- repetition quality profile: per-row native expressions only — the
    //     whole operator is a scan with zero exchanges (PlanAudit-checked) ----
    "q66_repetition" -> ((s, dir) =>
      TextOps.repetitionProfile(T(s, dir, "documents"), "doc_id", "text")),

    // --- corpus-trained bigram LM quality score (the perplexity-filter
    //     mechanism): add-1-smoothed bigram log-probs, integer-quantized per
    //     distinct bigram so the per-doc sum is partition-order-exact --------
    "q73_lm_score" -> ((s, dir) =>
      TextOps.lmScore(T(s, dir, "documents"), "doc_id", "text")),

    // --- min-wise sampling: exact-size uniform sample as a pure function of
    //     the id set (same sample on any engine/partitioning; k-row heap per
    //     partition, no global sort) -----------------------------------------
    "q59_minwise_sample" -> ((s, dir) => {
      graft.ops.Sampling.minWiseSample(T(s, dir, "documents"), "doc_id", 100)
        .select(col("doc_id"), col("lang"), col("source"))
    }),

    // --- the full dedup pipeline applied: corpus minus near-duplicates -------
    //     (minhash-LSH pairs -> keep-first removal -> per-lang survivor count)
    "q44_dedup_apply" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val pairs = Dedup.minHashLSH(docs, "doc_id", "text",
        shingleSize = 3, numHashes = 128, rowsPerBand = 4, threshold = 0.8)
      Dedup.removeDuplicates(docs, pairs, "doc_id")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"))
    }),

    // --- k-NN join: top-3 corpus neighbors for each of 5 query vectors -------
    "q45_knn_join" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      Similarity.crossTopK(emb, emb.where(col("vec_id") < 5),
          "vec_id", "embedding", 3)
        .select(col("query_id"), col("corpus_id"), col("rank").cast("int").as("rank"),
          round(col("cos"), 4).as("cos"))
    }),

    // --- per-label embedding centroids, quantized-exact (bit-identical under
    //     any partitioning — floor(v·1e6) bigint sums, no float-order drift) --
    "q46_label_centroid" -> ((s, dir) => {
      Similarity.centroids(T(s, dir, "embeddings"), "label", "embedding")
    }),

    // --- vocabulary: top-20 tokens across the corpus, count-desc/token ties --
    "q47_vocab_topk" -> ((s, dir) => {
      T(s, dir, "documents")
        .select(explode(tokens(lower(col("text")))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20)
    }),

    // --- streaming sessionize (flatMapGroupsWithState) — the custom-state
    //     operator drained deterministically and checked against the BATCH
    //     sessionization oracle (q13's SQL): stream and batch agree exactly. --
    "q48_stream_sessionize" -> ((s, dir) => {
      graft.streaming.Streaming.runToTable(
        graft.streaming.Streaming.sessionize(
          graft.streaming.Streaming.eventsStream(s, dir)).toDF(),
        "q48_mem_" + java.util.UUID.randomUUID().toString.replace("-", ""),
        mode = org.apache.spark.sql.streaming.OutputMode.Append(),
        statePartitions = Some(4)) // user-key state is tiny at any SF
    }),

    // --- P-algebra OR groups: filterOr (OR list) composed with filter (AND) --
    "q57_filter_or" -> ((s, dir) => {
      GQuery(T(s, dir, "part"))
        .filterOr(
          Clauses.mustStartWith(col("p_name"), "large"),
          Clauses.mustContain(col("p_name"), "gadget"))
        .filter(Clauses.mustBeGreaterThan(col("p_size"), 25))
        .toDF
        .select(col("p_partkey"), col("p_name"), col("p_size"))
    }),

    // --- P10/P13 on a dynamic family: qualifier-range filter over the map
    //     column (betweenColumnKeys), exploded back for the oracle ------------
    "q58_family_qualifier_range" -> ((s, dir) => {
      val perDay = events(s, dir)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val asFamily = perDay.groupBy(col("user_id"))
        .agg(map_from_entries(collect_list(struct(col("day"), col("n")))).as("byDay"))
      asFamily
        .select(col("user_id"),
          Clauses.betweenColumnKeys(col("byDay"),
            java.sql.Date.valueOf("2024-01-10"),
            java.sql.Date.valueOf("2024-01-20")).as("midJan"))
        .select(col("user_id"), explode(col("midJan")).as(Seq("day", "searches")))
    }),

    // --- Spark's native session_window operator (merge events within a 30-min
    //     gap): start/end/count per (user, session), vs a lag-derived oracle --
    "q56_session_window" -> ((s, dir) => {
      events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("w.start")).as("start_us"),
          unix_micros(col("w.end")).as("end_us"),
          col("n_events"))
    }),

    // --- statistics from exact moments: mean/stddev/corr computed from
    //     DECIMAL sums (grid inputs → exact, order-invariant) with ONE final
    //     double formula — built-in corr/stddev float-accumulate in partition
    //     order and are not reproducible across partitionings; this is. ------
    "q54_exact_stats" -> ((s, dir) => {
      val qd = col("l_quantity").cast("decimal(18,2)")
      val pd = col("l_extendedprice").cast("decimal(18,2)")
      val g = T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n0"),
          sum(qd).as("sx"), sum(pd).as("sy"),
          sum(qd * qd).as("sxx"), sum(pd * pd).as("syy"),
          sum(qd * pd).as("sxy"))
      val n = col("n0").cast("double")
      val (sx, sy, sxx, syy, sxy) = (col("sx").cast("double"),
        col("sy").cast("double"), col("sxx").cast("double"),
        col("syy").cast("double"), col("sxy").cast("double"))
      g.select(col("l_returnflag"),
        (sx / n).as("mean_qty"),
        sqrt((n * sxx - sx * sx) / (n * (n - 1))).as("stddev_qty"),
        ((n * sxy - sx * sy) /
          (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))).as("corr_qty_price"),
        col("n0").as("n"))
    }),

    // --- pivot: per-linestatus quantity totals fanned out by returnflag ------
    "q55_pivot" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(col("l_quantity")).cast("bigint"))
        .select(col("l_linestatus"), col("A").as("a_qty"),
          col("N").as("n_qty"), col("R").as("r_qty"))
    }),

    // --- exact percentiles (continuous interpolation on integer grid) --------
    "q51_percentiles" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.5)").as("p50_qty"),
          expr("percentile(l_quantity, 0.95)").as("p95_qty"),
          count(lit(1)).as("n"))
    }),

    // --- CUBE over two dimensions (all 4 grouping sets) ----------------------
    "q52_cube" -> ((s, dir) => {
      T(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double").as("total"))
    }),

    // --- scalar-function sampler: string/date library parity -----------------
    "q53_scalar_funcs" -> ((s, dir) => {
      T(s, dir, "customer").where(col("c_custkey") <= 200)
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("uname"),
          length(col("c_name")).cast("bigint").as("name_len"),
          substring(col("c_mktsegment"), 1, 3).as("seg3"),
          concat_ws("-", col("c_mktsegment"), col("c_custkey").cast("string"))
            .as("seg_key"),
          levenshtein(col("c_mktsegment"), lit("BUILDING")).cast("bigint")
            .as("lev"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("padded"))
    }),

    // --- IVF ANN: deterministic k-means coarse quantizer + cell probing.
    //     Five exact copies of the query vector are planted: identical vectors
    //     share the query's cell under any centroid set, and cosine rounds to
    //     exactly 1.0, so the top-5 is provably the planted ids -> oracle. ----
    "q50_ivf_ann" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val q = emb.where(col("vec_id") === 7).select(col("embedding"))
        .head().getSeq[Float](0)
      val planted = emb.where(col("vec_id") === 7)
        .select(explode(sequence(lit(0), lit(4))).as("i"), col("embedding"))
        .select((col("i") + 9100L).as("vec_id"), col("embedding"))
      val corpus = emb.where(col("vec_id") =!= 7).unionByName(planted)
      val cents = Similarity.ivfCentroids(corpus, "vec_id", "embedding", k = 8)
      Similarity.ivfTopK(corpus, "vec_id", "embedding", q, 5, cents, nProbe = 2)
        .select(col("vec_id"), round(col("cos"), 4).as("cos"))
    }),

    // --- persisted IVF layout (the 100 TB deployment of q50): the corpus is
    //     written ONCE partitioned by cell, and the probe becomes a literal
    //     IN-list on the partition column — pruning at the scan, before any
    //     row is read. Same planted-copy construction as q50, so the top-5 is
    //     provably the planted ids regardless of centroid placement. ---------
    "q86_ivf_partitioned" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val q = emb.where(col("vec_id") === 7).select(col("embedding"))
        .head().getSeq[Float](0)
      val planted = emb.where(col("vec_id") === 7)
        .select(explode(sequence(lit(0), lit(4))).as("i"), col("embedding"))
        .select((col("i") + 9200L).as("vec_id"), col("embedding"))
      val corpus = emb.where(col("vec_id") =!= 7).unionByName(planted)
      val cents = Similarity.ivfCentroids(corpus, "vec_id", "embedding", k = 8)
      // deterministic temp location, overwrite mode: repeated invocations
      // (verify + 3 bench reps) reuse one directory instead of accumulating
      val path = sys.props("java.io.tmpdir") + "/graft_q86_ivf_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      Similarity.writeIvfCorpus(corpus, "vec_id", "embedding", path, cents)
      Similarity.ivfTopKFromPartitioned(s, path, "vec_id", "embedding",
          q, 5, cents, nProbe = 2)
        .select(col("vec_id"), round(col("cos"), 4).as("cos"))
    }),

    // --- deterministic epoch shuffle: shard + dense within-shard position,
    //     both pure functions of (salt, id) — the training-shuffle stage;
    //     the oracle replays the md5 order key and the per-shard row_number
    //     exactly, so every row's (shard, pos) is value-checked -------------
    "q87_epoch_shuffle" -> ((s, dir) =>
      graft.ops.Sampling.shuffleAssign(
          T(s, dir, "documents").select(col("doc_id")), "doc_id", 8,
          salt = "epoch1")
        .select(col("doc_id"), col("shard").cast("bigint").as("shard"),
          col("pos"))),

    // --- KMV corpus-overlap sketch: "how much of corpus B is already in
    //     corpus A" WITHOUT joining them — min-k md5 shingle hashes per side,
    //     classic KMV Jaccard estimator. Everything is a pure function of
    //     the text, so the oracle computes the IDENTICAL sketch (no
    //     tolerance): inter/union-k counts and the estimate, value-exact ----
    "q89_overlap_sketch" -> ((s, dir) => {
      val sp = graft.ops.Sampling.hashSplit(T(s, dir, "documents"), "doc_id", 50)
      TextOps.overlapSketch(sp.where(col("split") === "train"),
        sp.where(col("split") === "test"), "text", shingleSize = 3, k = 1024)
    }),

    // --- snapshot delta: CDC between two crawl snapshots by content
    //     fingerprint — downstream stages re-process only added ∪ changed.
    //     Old = ids % 7 != 0; new = ids % 11 != 3 with % 5 == 0 texts
    //     edited: exercises all four statuses -----------------------------
    "q93_snapshot_delta" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val oldSnap = docs.where(col("doc_id") % 7 =!= 0)
      val newSnap = docs.where(col("doc_id") % 11 =!= 3)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" updated")))
            .otherwise(col("text")).as("text"))
      Dedup.snapshotDelta(oldSnap, newSnap, "doc_id", "text")
    }),

    // --- containment dedup: planted 15-token "quotes" of every 17th doc are
    //     invisible to Jaccard (13 shared shingles vs ~100-doc size) but
    //     score containment 1.0 — the asymmetric catch Broder's resemblance
    //     misses; exact integer inter/min division replays in SQL ----------
    "q99_containment" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val quotes = docs.where(col("doc_id") % 17 === 0)
        .select((col("doc_id") + 50000).as("doc_id"),
          concat_ws(" ", slice(split(col("text"), " "), 1, 15)).as("text"))
      Dedup.shingleContainment(
        docs.select(col("doc_id"), col("text")).unionAll(quotes),
        "doc_id", "text", shingleSize = 3, threshold = 0.9)
    }),

    // --- token-budget selection: absolute per-language token budgets filled
    //     in deterministic hash order — en capped mid-stratum, de's budget
    //     exceeds its total (whole stratum kept), rest on the default -------
    "q100_budget_select" -> ((s, dir) => {
      import graft.functions.GraftFunctions.token_count
      val docs = T(s, dir, "documents")
        .withColumn("n_tokens", token_count(col("text")).cast("bigint"))
      Sampling.budgetSelect(docs, "doc_id", "lang", "n_tokens",
        Map("en" -> 5000L, "de" -> 10000L), defaultBudget = 2000L)
        .select(col("doc_id"), col("lang"), col("n_tokens"))
    }),

    // --- repeat-to-budget epoching: en gets 1 full epoch + a prefix, zh 2 +
    //     prefix, the rest fill 4000 tokens — the materialized up-sampling
    //     schedule, one row per (doc, epoch) -------------------------------
    "q101_repeat_epochs" -> ((s, dir) => {
      import graft.functions.GraftFunctions.token_count
      val docs = T(s, dir, "documents")
        .withColumn("n_tokens", token_count(col("text")).cast("bigint"))
      Sampling.repeatToBudget(docs, "doc_id", "lang", "n_tokens",
        Map("en" -> 15000L, "zh" -> 10000L), defaultTarget = 4000L)
        .select(col("doc_id"), col("lang"), col("epoch"))
    }),

    // --- per-source cap: at most 10 docs per source, min-wise — the
    //     per-domain page cap of web-corpus curation ------------------------
    "q102_source_cap" -> ((s, dir) =>
      Sampling.capPerGroup(T(s, dir, "documents"), "doc_id", "source", 10)
        .select(col("doc_id"), col("source"))),

    // --- Naive Bayes classifier trained AND applied in one plan: hashed
    //     unigrams, nano-quantized ln weights, exact integer argmax. The
    //     corpus's langs share one unigram distribution (verified: no token
    //     deviates 1% between langs), so the learnable signal is PLANTED —
    //     every 3rd doc gets marker tokens and the classifier must recover
    //     the split. score_sum makes all per-doc argmax scores hash-checked -
    "q103_nb_confusion" -> ((s, dir) => {
      val labeled = T(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 3 === 0,
            concat(col("text"), lit(" alpha beta alpha")))
          .otherwise(col("text")).as("text"),
        when(col("doc_id") % 3 === 0, lit("aug")).otherwise(lit("plain"))
          .as("cls"))
      TextOps.nbTrainScore(labeled, "doc_id", "text", "cls")
        .groupBy(col("cls"), col("pred"))
        .agg(count(lit(1)).as("n"), sum(col("score_nano")).as("score_sum"))
    }),

    // --- multimodal near-dup: REAL PNG decode → perceptual aHash → banded
    //     Hamming pairs. Planted one-pixel watermarks (every 4th image,
    //     +100 at (0,0)) land within hamming ≤ 6 of their source; unrelated
    //     images disagree on ~half the bits ---------------------------------
    "q104_image_neardup" -> ((s, dir) => {
      val ids = T(s, dir, "documents").where(col("doc_id") < 64)
        .select(col("doc_id"))
      val media = Multimodal.synthesizeMedia(ids, "doc_id")
        .select(col("doc_id"), col("image"))
      val edited = Multimodal.editImage(
          media.where(col("doc_id") % 4 === 0), "image", 0, 0, 100)
        .select((col("doc_id") + 100000).as("doc_id"), col("image"))
      val hashes = Multimodal.imageAHash(
        media.unionByName(edited), "doc_id", "image")
      Dedup.hammingPairs(hashes, "doc_id", "ahash", maxHamming = 6)
    }),

    // --- streaming per-source admission quota: first 10 docs per source
    //     across a 4-batch replay, one counter per source — the ingest-time
    //     twin of q102's cap; rank is part of the output so the oracle
    //     value-checks the admission ORDER, not just the set ----------------
    "q105_stream_quota" -> ((s, dir) => {
      val replay = graft.streaming.Streaming.docsReplay(s, dir, 4)
      val admits = graft.streaming.Streaming.quotaAdmitStream(
        replay, "doc_id", "source", quota = 10)
      graft.streaming.Streaming.runToTable(
        admits.toDF(),
        "q105_mem_" + java.util.UUID.randomUUID().toString.replace("-", ""),
        mode = org.apache.spark.sql.streaming.OutputMode.Append(),
        statePartitions = Some(4), noDataBatch = false)
        .select(col("group").as("source"), col("id").as("doc_id"), col("rank"))
    }),

    // --- integer PageRank over the click-transition graph: consecutive
    //     events per user link their "k" pages; 8 damping-0.85 rounds in
    //     exact long arithmetic — every node's rank value-checked -----------
    "q106_pagerank" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("page",
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long"))
      val edges = graft.ops.Graph.transitionEdges(
        ev, "user_id", "ts", "event_id", "page")
      graft.ops.Graph.pageRank(edges, iterations = 8)
    }),

    // --- streaming trending terms: windowed token counts over the 4-batch
    //     replay (Complete drain keeps the open tail windows), then batch
    //     top-5 per window — the vocabulary monitor ------------------------
    "q107_trending_terms" -> ((s, dir) => {
      val replay = graft.streaming.Streaming.docsReplay(s, dir, 4)
      val counts = graft.streaming.Streaming.termTrends(replay, "text", "ts")
      val drained = graft.streaming.Streaming.runToTable(
        counts,
        "q107_mem_" + java.util.UUID.randomUUID().toString.replace("-", ""),
        statePartitions = Some(4))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("window_start"))
        .orderBy(col("n").desc, col("tok"))
      drained.withColumn("rk", row_number().over(w)).where(col("rk") <= 5)
        .select(unix_timestamp(col("window_start")).as("window_start_s"),
          col("tok"), col("n"))
    }),

    // --- corpus drift monitor: chi-square bucket divergence between the
    //     deterministic 50/50 hash halves — every bucket's nano contribution
    //     value-checked, plus the corpus-level statistic ---------------------
    "q108_corpus_drift" -> ((s, dir) => {
      val sp = graft.ops.Sampling.hashSplit(T(s, dir, "documents"),
        "doc_id", 50)
      TextOps.distributionDrift(
        sp.where(col("split") === "train"),
        sp.where(col("split") === "test"), "text")
    }),

    // --- corpus datacard: one cube over (lang, source) with volume, token
    //     mass, and exact-dup counts — the per-slice reporting rollup -------
    "q109_datacard" -> ((s, dir) => {
      import graft.functions.GraftFunctions.token_count
      val docs = T(s, dir, "documents")
      val flagged = docs
        .withColumn("n_tokens", token_count(col("text")).cast("bigint"))
        .withColumn("fp", md5(coalesce(col("text"), lit("")).cast("binary")))
        .withColumn("dup", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))) > 1)
      flagged.cube(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          sum(col("n_chars")).as("n_chars"),
          sum(when(col("dup"), 1L).otherwise(0L)).as("dup_docs"))
    }),

    // --- product-quantization ANN (the 32× compression tier under int8):
    //     deterministic per-subspace codebooks, ADC scoring over m-int codes.
    //     Planted exact copies of the query achieve the global ADC minimum
    //     (their code IS the per-subspace argmin), and no organic vector
    //     shares that code at these SFs (verified at sf0.01 AND sf0.1), so
    //     the top-5 is provably the planted ids in id order ----------------
    "q110_pq_ann" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val q = emb.where(col("vec_id") === 11).select(col("embedding"))
        .head().getSeq[Float](0)
      val planted = emb.where(col("vec_id") === 11)
        .select(explode(sequence(lit(0), lit(4))).as("i"), col("embedding"))
        .select((col("i") + 9200L).as("vec_id"), col("embedding"))
      val corpus = emb.where(col("vec_id") =!= 11).unionByName(planted)
      val cb = Similarity.pqTrain(corpus, "vec_id", "embedding",
        m = 8, ksub = 16, iters = 2)
      val codes = Similarity.pqEncode(corpus, "vec_id", "embedding", cb)
      val top = Similarity.pqTopK(codes, "vec_id", "code", cb, q, 5)
      top.withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("adc_dist").asc, col("vec_id"))))
        .select(col("rank").cast("bigint").as("rank"), col("vec_id"))
    }),

    // --- C4-style line-level boilerplate removal: composite multi-line docs
    //     from %40 groups (line order = doc_id order), three planted footer
    //     lines at corpus-df 40/20/3 vs maxDf=10 — the first two must vanish
    //     from EVERY doc, the rare one must survive; every cleaned text is
    //     md5'd so one wrong splice anywhere breaks the hash ---------------
    "q111_boilerplate_lines" -> ((s, dir) => {
      val base = T(s, dir, "documents").where(col("text").isNotNull)
        .select((col("doc_id") % 40).as("gid"), col("doc_id"), col("text"))
      val comp = base.groupBy(col("gid")).agg(
        concat_ws("\n", transform(
          array_sort(collect_list(struct(col("doc_id"), col("text")))),
          x => x.getField("text"))).as("body"))
      val docs = comp.select(col("gid").as("id"),
        concat(col("body"), lit("\nsubscribe now for updates"),
          when(col("gid") < 20, lit("\nall rights reserved")).otherwise(lit("")),
          when(col("gid") < 3, lit("\nrare footer line")).otherwise(lit("")))
          .as("text"))
      TextOps.removeBoilerplateLines(docs, "id", "text", maxDf = 10)
        .select(col("id"), md5(col("text")).as("text_md5"),
          col("n_lines"), col("n_dropped"))
    }),

    // --- ANN recall evaluation: the index-quality loop an ANN deployment
    //     runs continuously — exact top-10 (crossTopK) vs multi-probe LSH
    //     (annCrossTopK, md5 scheme so DuckDB replays the buckets), recall
    //     per query. Both result sets AND the gauge are value-checked ------
    "q112_ann_recall" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val queries = emb.where(col("vec_id") < 5)
      val corpus = emb.where(col("vec_id") >= 5)
      val approx = Similarity.annCrossTopK(corpus, queries, "vec_id",
        "embedding", k = 10, nBits = 8, scheme = Similarity.SrpScheme.md5)
      val exact = Similarity.crossTopK(corpus, queries, "vec_id", "embedding", 10)
      Similarity.recallAtK(
          exact.select(col("query_id"), col("corpus_id")),
          approx.select(col("query_id"), col("corpus_id")),
          "query_id", "corpus_id")
        .orderBy(col("query_id"))
    }),

    // --- mergeable per-shard KMV sketches: per-source distinct-token
    //     sketches merged in sketch space; the merge≡direct identity is
    //     value-checked (list equality), the estimate's exact IEEE
    //     arithmetic is value-checked, and the exact NDV rides along -------
    "q113_kmv_shards" -> ((s, dir) => {
      val toks = T(s, dir, "documents").where(col("text").isNotNull)
        .select(col("source"), explode(tokens(col("text"))).as("tok"))
      val sk = TextOps.kmvSketchShards(toks, "source", "tok", k = 512)
      val merged = TextOps.kmvMergeEstimate(sk, k = 512)
      val direct = toks.select(md5_prefix60(col("tok")).as("h")).distinct()
        .orderBy(col("h")).limit(512)
        .agg(sort_array(collect_list(col("h"))).as("kmv_d"))
      val stats = toks.agg(
        countDistinct(col("tok")).as("ndv_exact"),
        countDistinct(col("source")).as("n_sources"))
      merged.crossJoin(direct).crossJoin(stats)
        .select(col("n_sources"), col("k_actual"), col("hk"), col("ndv_est"),
          col("ndv_exact"), (col("kmv") === col("kmv_d")).as("merge_eq"))
    }),

    // --- robust per-language length trim: drop each language's shortest and
    //     longest 5% by RANK (integer cuts — no interpolated-percentile
    //     cross-engine hazard), one window pass per group ------------------
    "q98_length_band" -> ((s, dir) =>
      graft.ops.Sampling.quantileBand(
          T(s, dir, "documents"), "lang", "n_chars", "doc_id", 50, 950)
        .select(col("doc_id"), col("lang"), col("n_chars"))),

    // --- DSIR importance scores: every doc ranked by target-likeness from
    //     hashed unigram log-ratios (target = lang 'en', background = all);
    //     nano-quantized contributions make the ln-based score replay
    //     exactly (q90's contract) ------------------------------------------
    "q97_importance_scores" -> ((s, dir) =>
      TextOps.importanceScores(T(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en", buckets = 256)),

    // --- BPE first-merge statistics: adjacent char-pair counts weighted by
    //     word frequency — corpus collapses to its vocabulary first, pairs
    //     explode over DISTINCT words only (dictionary-sized, not corpus-
    //     sized work) ---------------------------------------------------------
    "q96_bpe_pairs" -> ((s, dir) =>
      TextOps.bpePairStats(T(s, dir, "documents"), "text", 30)),

    // --- filter-funnel attrition report: four cumulative quality gates
    //     (length, token count, quality score, known language) counted in
    //     ONE scan + one k-long aggregate — the per-stage survivor report a
    //     corpus pipeline publishes, at the cost of a count(*) -------------
    "q95_filter_funnel" -> ((s, dir) =>
      TextOps.filterFunnel(T(s, dir, "documents"), Seq(
        "has_text" -> (col("text").isNotNull && length(col("text")) >= 100),
        "min_tokens" -> (size(tokens(lower(col("text")))) >= 20),
        // 0.45 clears the nearest corpus score by >3e-5 at every test SF —
        // no cross-engine boundary row exists (checked at sf0.01/sf0.1)
        "quality" -> (TextOps.qualityScore(col("text")) >= 0.45),
        "lang_known" -> (TextOps.langId(col("text")) =!= "und")))),

    // --- semantic dedup (SemDeDup): hash-seeded cells over the int8-
    //     quantized space, within-cell pair scan at tau=0.99, drop the
    //     member nearer its centroid. Planted near-dups (an exact copy and
    //     a *1.001 float-rescale, both quantizing to ~cos 1) exercise the
    //     drop path; integer dot/norm arithmetic makes every cosine — and
    //     therefore every cell and every victim — bit-identical in SQL ----
    "q94_semantic_dedup" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val perturbed = emb.where(col("vec_id") % 20 === 0)
        .select((col("vec_id") + 10000).as("vec_id"),
          transform(col("embedding"),
            x => (x.cast("double") * lit(1.001d)).cast("float")).as("embedding"))
      val copies = emb.where(col("vec_id") % 30 === 7)
        .select((col("vec_id") + 20000).as("vec_id"), col("embedding"))
      val corpus = emb.select(col("vec_id"), col("embedding"))
        .unionAll(perturbed).unionAll(copies)
      graft.ops.Similarity.semanticDedup(corpus, "vec_id", "embedding",
          k = 10, tau = 0.99)
        .select(col("vec_id"), col("cell").cast("bigint").as("cell"),
          round(col("cent_cos"), 6).as("cent_cos"))
    }),

    // --- temperature-based mixture sampling: per-stratum budget shares
    //     computed from the corpus's own counts (∝ n^tau; tau=0.5 → sqrt,
    //     IEEE-correctly-rounded on every engine, so the sample replays
    //     EXACTLY in SQL), selection = min-wise per stratum ----------------
    "q92_temperature_mix" -> ((s, dir) =>
      graft.ops.Sampling.temperatureSample(
          T(s, dir, "documents"), "doc_id", "lang", budget = 200L, tau = 0.5)
        .select(col("doc_id"), col("lang"))),

    // --- incremental ingest dedup: a NEW batch dedups against a PERSISTED
    //     LSH index of the reference corpus (the daily-crawl deployment:
    //     corpus signatures computed once at index build; candidate ids
    //     runtime-prune the keyed shingle-set read; exact Jaccard verified
    //     before any drop). Oracle = the exact cross-corpus rule, the same
    //     recall-proven-by-q27 equivalence. --------------------------------
    "q91_ingest_dedup" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      // per-PROCESS unique temp location (pid-salted): a deterministic
      // dir-hash path is a write/read race if another graft process (bench
      // alongside verify) rebuilds the same index concurrently — the one
      // query absent from driver CORRECTNESS records through round 9
      val path = sys.props("java.io.tmpdir") + "/graft_q91_idx_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      Dedup.writeNearDupIndex(docs.where(col("source") =!= "src0"),
        "doc_id", "text", path)
      Dedup.dedupeAgainstIndex(s, docs.where(col("source") === "src0"),
          path, "doc_id", "text")
        .select(col("doc_id"), col("lang"))
    }),

    // --- BM25 ranked retrieval: Okapi keyword search as one relational plan
    //     (query terms filtered INSIDE the token array before any explode;
    //     per-(doc,term) contributions quantized to integer nano-units so the
    //     ln-based score replays exactly in SQL) --------------------------
    "q90_bm25_search" -> ((s, dir) =>
      TextOps.bm25TopK(T(s, dir, "documents"), "doc_id", "text",
        Seq("spark", "window", "merge"), 15)),

    // --- Johnson-Lindenstrauss projection (md5 signed planes, integer
    //     arithmetic end to end): every projected coordinate of every vector
    //     is value-checked by the SQL replay — the reduced-space prefilter
    //     of the two-stage ANN (Similarity.projectedTopK) ------------------
    "q88_jl_projection" -> ((s, dir) =>
      graft.ops.Similarity.projectCorpus(
          T(s, dir, "embeddings"), "vec_id", "embedding", outDim = 16)
        .where(col("proj").isNotNull)
        .select(col("id").as("vec_id"),
          posexplode(col("proj")).as(Seq("proj_dim", "proj")))
        .select(col("vec_id"), col("proj_dim").cast("bigint").as("proj_dim"),
          col("proj"))),

    // --- stream-stream interval join: the streaming twin of q41's range join,
    //     watermark-bounded state on both sides, drained deterministically and
    //     checked against the BATCH inner-pair oracle --------------------------
    "q49_stream_interval_join" -> ((s, dir) => {
      val errors = graft.streaming.Streaming.eventsStream(s, dir)
        .where(col("event_type") === "error")
        .select(col("user_id"), col("event_id"), col("ts").as("err_ts"))
      val clicks = graft.streaming.Streaming.eventsStream(s, dir)
        .where(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("clk_ts"))
      val joined = graft.streaming.Streaming.intervalJoin(
        errors, clicks, "user_id", "err_ts", "clk_ts", "6 hours")
      graft.streaming.Streaming.runToTable(
        joined.select(col("event_id"), col("user_id"),
          unix_micros(col("clk_ts")).as("clk_us")),
        "q49_mem_" + java.util.UUID.randomUUID().toString.replace("-", ""),
        mode = org.apache.spark.sql.streaming.OutputMode.Append(),
        // a stream-stream join runs FOUR state stores per partition, each with
        // per-batch maintenance IO; 150 user keys need very few partitions
        // (measured at sf0.1: 8 partitions 9.8s, 2 → 5.0s, 1 → 4.4s), and an
        // inner join emits matches eagerly so the finite drain can skip the
        // trailing no-data state-cleanup batch (4.4s → ~3.1s)
        statePartitions = Some(1), noDataBatch = false)
    }),

    // --- streaming dedup: every 7th event is planted to arrive TWICE inside
    //     the replay; watermark-bounded dropDuplicatesWithinWatermark must
    //     emit exactly the original stream (oracle = the raw events table).
    //     Dedup emits eagerly on first sight (drops, never holds rows back),
    //     so the finite drain skips the trailing no-data batch ---------------
    "q67_stream_dedup" -> ((s, dir) => {
      // 2 replay splits: proves cross-batch dedup (the spec pins the
      // semantics) at half the per-batch state-maintenance rounds of a
      // finer replay — measured 6.0 s → ~3 s at sf0.1
      val replay = graft.streaming.Streaming.eventsReplay(s, dir, 2)
      val withDups = replay
        .select(col("event_id"), col("user_id"), col("ts"),
          explode(when(pmod(col("event_id"), lit(7)) === 0,
            array(lit(0), lit(1))).otherwise(array(lit(0)))).as("dup_copy"))
        .drop("dup_copy")
      val deduped = graft.streaming.Streaming.dedupStream(
        withDups, Seq("event_id"), "ts", "1 hour")
      graft.streaming.Streaming.runToTable(
        deduped.select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us")),
        "q67_mem_" + java.util.UUID.randomUUID().toString.replace("-", ""),
        mode = org.apache.spark.sql.streaming.OutputMode.Append(),
        statePartitions = Some(4), noDataBatch = false)
    }),

    // --- the V2 catalog SQL lifecycle, end to end: CREATE TABLE / INSERT INTO
    //     / DELETE FROM (one key-ranged, index-pruned; one content predicate)
    //     / SELECT, all in plain SQL over the keyed store. The oracle replays
    //     both deletes as negated predicates over the raw table ---------------
    "q68_catalog_sql" -> ((s, dir) => {
      if (s.conf.getOption("spark.sql.catalog.gcat").isEmpty) {
        s.conf.set("spark.sql.catalog.gcat",
          "org.apache.spark.sql.graft.GraftTableCatalog")
        s.conf.set("spark.sql.catalog.gcat.warehouse",
          java.nio.file.Files.createTempDirectory("graft_cat_q68_").toString)
      }
      s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
      val t = "gcat.db.parts_" + java.util.UUID.randomUUID().toString.replace("-", "")
      s.sql(s"""CREATE TABLE $t (p_partkey BIGINT, p_name STRING,
               |p_brand STRING, p_size INT) TBLPROPERTIES ('key'='p_partkey')""".stripMargin)
      T(s, dir, "part").select(col("p_partkey"), col("p_name"), col("p_brand"),
          col("p_size"))
        .repartitionByRange(8, col("p_partkey")).sortWithinPartitions("p_partkey")
        .writeTo(t).append()
      s.sql(s"DELETE FROM $t WHERE p_partkey <= 50") // key range: prunes to 1 file
      s.sql(s"DELETE FROM $t WHERE p_size < 10 OR p_brand = 'Brand#21'")
      s.sql(s"SELECT p_partkey, p_name, p_size FROM $t WHERE p_partkey % 3 = 0")
    }),

    // --- PII redaction: deterministic emails + digit runs injected per doc,
    //     scrubbed by the codegen'd regexp chain; the md5 of every cleaned
    //     text must match DuckDB's replay (patterns are RE2-safe on purpose) --
    "q69_pii_redact" -> ((s, dir) => {
      val inj = T(s, dir, "documents").where(col("doc_id") < 200)
        .select(col("doc_id"),
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com or id "),
            lpad((col("doc_id") % 10000).cast("string"), 8, "0")).as("t"))
      val clean = TextOps.redactPII(col("t"))
      inj.select(col("doc_id"),
        fingerprint_md5(clean).as("fp"),
        regexp_count(col("t"), lit(TextOps.emailRe)).cast("bigint")
          .as("n_emails_before"),
        regexp_count(clean, lit(TextOps.emailRe)).cast("bigint")
          .as("n_emails_after"),
        contains(clean, lit("<NUM>")).cast("int").as("has_num"))
    }),

    // --- streaming read THROUGH the connector: stage a keyed table, tail it
    //     as a micro-batch stream, aggregate — batch/stream agreement oracle --
    "q70_stream_keyed_read" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q70_")
        .resolve("t").toString
      val c = T(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
      KeyedStore.writeIndexed(c, tmp, "c_custkey", numRanges = 8)
      val stream = s.readStream.format("graft").option("key", "c_custkey").load(tmp)
      graft.streaming.Streaming.runToTable(
        stream.groupBy(col("c_mktsegment").as("segment"))
          .agg(count(lit(1)).as("n")),
        "q70_mem_" + java.util.UUID.randomUUID().toString.replace("-", ""),
        statePartitions = Some(4))
    }),

    // --- SQL UPDATE + MERGE INTO through the catalog (row-level copy-on-
    //     write); the oracle replays both mutations as CASE/anti-join algebra -
    "q71_sql_update_merge" -> ((s, dir) => {
      if (s.conf.getOption("spark.sql.catalog.gcat").isEmpty) {
        s.conf.set("spark.sql.catalog.gcat",
          "org.apache.spark.sql.graft.GraftTableCatalog")
        s.conf.set("spark.sql.catalog.gcat.warehouse",
          java.nio.file.Files.createTempDirectory("graft_cat_q71_").toString)
      }
      s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
      val t = "gcat.db.cust_" + java.util.UUID.randomUUID().toString.replace("-", "")
      s.sql(s"""CREATE TABLE $t (c_custkey BIGINT, c_name STRING,
               |c_acctbal DOUBLE) TBLPROPERTIES ('key'='c_custkey')""".stripMargin)
      T(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"),
          col("c_acctbal").cast("double").as("c_acctbal"))
        .repartitionByRange(4, col("c_custkey")).sortWithinPartitions("c_custkey")
        .writeTo(t).append()
      s.sql(s"UPDATE $t SET c_acctbal = c_acctbal + 100.0 WHERE c_custkey % 7 = 0")
      // MERGE source: %5 keys unchanged (WHEN MATCHED → bal := -1) plus the
      // same rows key-shifted (WHEN NOT MATCHED → insert)
      val src = T(s, dir, "customer").select(col("c_custkey"), col("c_name"))
        .where(col("c_custkey") % 5 === 0)
        .withColumn("c_acctbal", lit(-1.0))
      src.unionByName(src
          .withColumn("c_custkey", col("c_custkey") + 5000000L)
          .withColumn("c_name", concat(lit("NEW_"), col("c_name"))))
        .createOrReplaceTempView("q71_src")
      s.sql(s"""MERGE INTO $t g USING q71_src s ON g.c_custkey = s.c_custkey
               |WHEN MATCHED THEN UPDATE SET g.c_acctbal = s.c_acctbal
               |WHEN NOT MATCHED THEN INSERT (c_custkey, c_name, c_acctbal)
               |VALUES (s.c_custkey, s.c_name, s.c_acctbal)""".stripMargin)
      s.sql(s"""SELECT c_custkey, c_name, round(c_acctbal, 2) AS bal
               |FROM $t WHERE c_custkey % 3 = 0""".stripMargin)
    }),

    // --- range join: clicks within 10 min after each error, binned equi-join -
    "q41_range_join" -> ((s, dir) => {
      val e = events(s, dir).select(col("event_id"), col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("us"))
      val errors = e.where(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("us"))
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("us").as("us_b"))
      graft.ops.Joins.pointInWindow(errors, clicks, "user_id", "us", "us_b",
          windowUs = 600000000L)
        .groupBy(col("event_id"))
        .agg(count(col("us_b")).as("n_clicks_10m"))
    }),

    // --- exact-substring dedup pairs (Lee et al.): docs sharing a ≥20-token
    //     contiguous run, via the k-shingle ⟺ ≥k-token-run identity over the
    //     same join-free postings machinery as q24. Oracle replays the
    //     postings on shingle STRINGS (Spark joins 64-bit hashes — identical
    //     counts barring a 2^-64 collision, the q24/q27 precedent) and
    //     applies the SAME maxDf stop-shingle cap, so the oracle-gated
    //     configuration is the capped one a 100 TB run needs (round-6
    //     verdict: the uncapped default was the suite's scale-killer) -------
    "q74_shared_substring" -> ((s, dir) =>
      Dedup.sharedSubstringPairs(T(s, dir, "documents"), "doc_id", "text",
        minTokens = 20, maxDf = 1000)),

    // --- the 100 TB dedup composition END TO END: LSH candidate pairs →
    //     transitive clustering → keep one representative PER CLUSTER (not
    //     per pair — a chain A~B~C with no A~C pair must still collapse to
    //     one survivor, which pair-based keep-first q44 cannot guarantee).
    //     LSH ≡ the exact-Jaccard pair set at these SFs (q27's proven
    //     equivalence), so the oracle's recursive-CTE clustering over exact
    //     pairs is a true oracle for the full pipeline ----------------------
    "q75_dedup_pipeline" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val pairs = Dedup.minHashLSH(docs, "doc_id", "text",
        shingleSize = 3, numHashes = 128, rowsPerBand = 4, threshold = 0.8)
      val clusters = Dedup.clusterDuplicates(pairs)
      docs.join(clusters.where(col("id") =!= col("rep"))
            .select(col("id").as("doc_id")),
          Seq("doc_id"), "left_anti")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
    }),

    // --- shared-substring SPANS: longest shared run length per pair
    //     (gaps-and-islands over (pair, diagonal) in both engines). Both
    //     caps active and replayed by the oracle: maxDf (stop-shingles by
    //     doc frequency) and maxOccurrences (bounds the in-row occurrence-
    //     pair build — round-6 advisory) --------------------------------------
    "q76_shared_spans" -> ((s, dir) =>
      Dedup.sharedSubstringSpans(T(s, dir, "documents"), "doc_id", "text",
        minTokens = 20, maxDf = 1000, maxOccurrences = 4000)),

    // --- span-CUT dedup application (Lee et al.'s actual transform): splice
    //     every ≥20-token run already seen in an earlier (smaller-id) doc out
    //     of later docs, keeping the first occurrence. Oracle replays the cut
    //     rule on shingle strings and md5-hashes the reassembled text, so a
    //     single mis-cut token anywhere in the corpus breaks the hash --------
    "q77_span_cut" -> ((s, dir) =>
      Dedup.cutSharedSpans(T(s, dir, "documents"), "doc_id", "text",
          minTokens = 20, maxDf = 1000, maxOccurrences = 4000)
        .select(col("doc_id"), col("n_tokens"),
          md5(col("text_clean").cast("binary")).as("clean_md5"))),

    // --- corpus novelty profile: fraction of each doc's distinct shingles
    //     occurring nowhere else (boilerplate flags low; unique content
    //     high). Postings on 64-bit hashes, oracle on strings (q24/q74
    //     precedent) ---------------------------------------------------------
    "q78_novelty" -> ((s, dir) =>
      TextOps.noveltyProfile(T(s, dir, "documents"), "doc_id", "text",
        shingleSize = 3)),

    // --- URL canonicalization + URL-level dedup (the FIRST dedup stage of a
    //     crawl pipeline — cheaper than any content hash because it prunes
    //     refetches before the text is even parsed). URLs synthesized with
    //     every normalization hazard (scheme case, www, default port,
    //     trailing slash, tracking params, unsorted params, fragments);
    //     canonical keys and the keep-first rule replay verbatim in SQL ----
    "q114_url_dedup" -> ((s, dir) => {
      val urls = T(s, dir, "documents").select(col("doc_id"), col("source"),
        concat(
          when(col("doc_id") % 3 === 0, lit("https://"))
            .when(col("doc_id") % 3 === 1, lit("HTTPS://www."))
            .otherwise(lit("https://WWW.")),
          col("source"), lit(".example.com"),
          when(col("doc_id") % 5 === 0, lit(":443")).otherwise(lit("")),
          lit("/Pages/"), (col("doc_id") % 37).cast("string"),
          when(col("doc_id") % 2 === 0, lit("/")).otherwise(lit("")),
          when(col("doc_id") % 4 === 0, lit("?utm_source=feed&b=2&a=1"))
            .when(col("doc_id") % 4 === 1, lit("?b=2&a=1&gclid=xyz"))
            .otherwise(lit("")),
          when(col("doc_id") % 7 === 0, lit("#frag")).otherwise(lit("")))
          .as("url"))
      urls.select(col("doc_id"), col("source"),
          TextOps.canonicalizeUrl(col("url")).as("canonical"))
        .groupBy(col("canonical"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))
        .orderBy(col("canonical"))
    }),

    // --- paragraph-level exact dedup with reassembly (RefinedWeb rule: the
    //     web duplicates PARAGRAPHS — syndicated ledes, quoted posts — not
    //     whole pages). Composite docs share paragraphs across gid groups by
    //     construction; the oracle replays winner selection (min (doc,pos)
    //     per hash) and md5-hashes every reassembled text, so one mis-spliced
    //     paragraph anywhere breaks the hash ---------------------------------
    "q115_para_dedup" -> ((s, dir) => {
      val base = T(s, dir, "documents").where(col("text").isNotNull)
        .select((col("doc_id") % 60).as("gid"), col("doc_id"), col("text"))
      val docs = base.groupBy(col("gid")).agg(
        concat_ws("\n", transform(
          array_sort(collect_list(struct(col("doc_id"), col("text")))),
          x => x.getField("text"))).as("text"))
        .select(col("gid").as("id"),
          // plant cross-doc duplicate paragraphs: every third group opens
          // with the same syndicated lede; every fourth repeats a disclaimer
          concat(
            when(col("gid") % 3 === 0,
              lit("breaking syndicated lede paragraph\n")).otherwise(lit("")),
            col("text"),
            when(col("gid") % 4 === 0,
              lit("\nstandard disclaimer applies")).otherwise(lit("")))
            .as("text"))
      TextOps.dedupParagraphs(docs, "id", "text")
        .select(col("id"), md5(col("text")).as("text_md5"),
          col("n_paras"), col("n_dropped"))
    }),

    // --- HTML → text extraction (the WET stage of a crawl pipeline). Docs
    //     wrapped in full HTML templates with every extraction hazard:
    //     comments (multi-line), style/script blocks whose CONTENT must
    //     drop (incl. a case-variant <SCRIPT> and a '<' inside js), tags
    //     that must become token boundaries, all five entities. Every
    //     cleaned text md5'd — one leaked tag or swallowed word breaks it --
    "q116_html_extract" -> ((s, dir) => {
      val docs = T(s, dir, "documents").where(col("text").isNotNull)
      val html = docs.select(col("doc_id"),
        concat(
          lit("<html><head><title>Doc "), col("doc_id").cast("string"),
          lit("</title><style type=\"text/css\">body { color: #333; }</style>"),
          lit("<script>var x = 1 < 2 && \"a\";</script></head><body>"),
          when(col("doc_id") % 3 === 0,
            lit("<!-- nav\nboilerplate\n<p>not text</p> -->")).otherwise(lit("")),
          lit("<h1>Title &amp; Header</h1><p>"),
          col("text"),
          lit("</p><ul><li>A&nbsp;&lt;tag&gt;</li><li>B &#39;q&#39; &quot;r&quot;</li></ul>"),
          when(col("doc_id") % 4 === 0,
            lit("<SCRIPT type=\"text/javascript\">alert(1)</SCRIPT>"))
            .otherwise(lit("")),
          lit("</body></html>")).as("html"))
      html.select(col("doc_id"),
          TextOps.extractHtmlText(col("html")).as("clean"))
        .select(col("doc_id"), md5(col("clean")).as("clean_md5"),
          token_count(col("clean")).cast("bigint").as("n_tokens"))
    }),

    // --- the full Gopher rule battery (Rae et al. A1.1) as a per-doc
    //     report. Hazards planted by doc_id residue: bullet blocks,
    //     ellipsis lines, symbol-noise runs. Integer cross-multiplied
    //     rationals — every boolean replays exactly in SQL -----------------
    "q117_gopher_rules" -> ((s, dir) => {
      val base = T(s, dir, "documents").where(col("text").isNotNull)
      val docs = base.select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 5 === 0,
            lit("\n- bullet one\n- bullet two\n* bullet three")).otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            lit("\nto be continued...\nand more...")).otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            lit(" ### 123 456 $$$ 789 42 7 99 100")).otherwise(lit("")))
          .as("text"))
      TextOps.gopherQuality(docs, "doc_id", "text", minWords = 10)
    }),

    // --- registered-domain extraction (the per-site datacard key):
    //     subdomain depth × multi-level public suffixes × a dotless host,
    //     rolled up per registered domain ---------------------------------
    "q118_registered_domain" -> ((s, dir) => {
      val hosts = T(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 13 === 0, lit("localhost"))
          .otherwise(concat(
            when(col("doc_id") % 4 === 0, lit("cdn.assets."))
              .when(col("doc_id") % 4 === 1, lit("blog."))
              .otherwise(lit("")),
            col("source"), lit("-site"),
            when(col("doc_id") % 5 === 0, lit(".co.uk"))
              .when(col("doc_id") % 5 === 1, lit(".com.au"))
              .when(col("doc_id") % 5 === 2, lit(".org"))
              .when(col("doc_id") % 5 === 3, lit(".io"))
              .otherwise(lit(".com")))).as("host"))
      hosts.select(col("doc_id"),
          TextOps.registeredDomain(col("host")).as("rdomain"))
        .groupBy(col("rdomain"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_id"))
        .orderBy(col("rdomain"))
    }),

    // --- CCNet perplexity bucketing: per-language head/middle/tail thirds
    //     by in-corpus LM score — integer rank cuts over q73's oracle-exact
    //     scores, every bucket label value-checked ------------------------
    "q119_ccnet_buckets" -> ((s, dir) =>
      TextOps.perplexityBuckets(T(s, dir, "documents"), "doc_id", "text",
        "lang")),

    // --- hard-negative mining: ANN candidates below the positive band.
    //     The corpus deliberately CONTAINS the queries and planted exact
    //     copies (cos 1.0) — the posThreshold filter must exclude all of
    //     them, so a regression that leaks positives breaks rows, not just
    //     ranks. md5 scheme ⇒ buckets, cosines, and ranks all replay ------
    "q120_hard_negatives" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val queries = emb.where(col("vec_id") < 5)
      val copies = queries.select((col("vec_id") + 50000).as("vec_id"),
        col("embedding"))
      val corpus = emb.unionAll(copies)
      Similarity.hardNegatives(corpus, queries, "vec_id", "embedding",
          k = 10, posThreshold = 0.95, nBits = 8,
          scheme = Similarity.SrpScheme.md5)
        .select(col("query_id"), col("corpus_id"),
          round(col("cos"), 4).as("cos"), col("rank").cast("int").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // --- pairwise source-overlap matrix from per-source KMV sketches: the
    //     k-min coincidence estimator is a pure function of the sketches,
    //     so every (union_k, inter_k, estimate) cell replays exactly -------
    "q121_overlap_matrix" -> ((s, dir) => {
      val toks = T(s, dir, "documents").where(col("text").isNotNull)
        .select(col("source"), explode(tokens(col("text"))).as("tok"))
      val sk = TextOps.kmvSketchShards(toks, "source", "tok", k = 256)
      TextOps.kmvOverlapMatrix(sk, k = 256)
        .orderBy(col("shard_a"), col("shard_b"))
    }),

    // --- video frame sampling: REAL RIFF/GVID containers of real PNG
    //     frames, every 2nd frame chunk-walked out and pixel-decoded. The
    //     oracle recomputes each sampled frame's pixel sum in closed form
    //     from the synthesis formula — one corrupt byte anywhere in the
    //     container→frame→pixel path breaks the hash --------------------
    "q122_video_frames" -> ((s, dir) => {
      val ids = T(s, dir, "documents").where(col("doc_id") < 60)
        .select(col("doc_id"))
      Multimodal.sampleVideoFrames(
        Multimodal.synthesizeVideo(ids, "doc_id"), "doc_id", "video",
        stride = 2)
    }),

    // --- declarative data-quality audit (the ingest validation gate):
    //     independent invariant counts in ONE scan + a referential check
    //     against orders. Violations planted by orderkey residue so every
    //     counter is nonzero and exactly replayable --------------------------
    "q123_data_quality" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      val delivery = li.select(
        // orphan references planted LAST (off the original key) so the
        // rule-violation planting below keys off unmutated residues
        when(col("l_orderkey") % 103 === 0 && col("l_linenumber") === 1,
          col("l_orderkey") + 1000000000L).otherwise(col("l_orderkey"))
          .as("l_orderkey"),
        when(col("l_orderkey") % 97 === 0 && col("l_linenumber") === 1,
          lit(-5.0)).otherwise(col("l_quantity")).as("l_quantity"),
        when(col("l_orderkey") % 89 === 0 && col("l_linenumber") === 1,
          lit(1.5)).otherwise(col("l_discount")).as("l_discount"),
        when(col("l_orderkey") % 101 === 0 && col("l_linenumber") === 1,
          lit("X")).otherwise(col("l_returnflag")).as("l_returnflag"),
        col("l_tax"), col("l_linenumber"))
      val report = graft.ops.Audit.auditRules(delivery, Seq(
        "quantity_positive" -> (col("l_quantity") > 0),
        "discount_range" -> (col("l_discount") >= 0 && col("l_discount") <= 0.1),
        "tax_nonneg" -> (col("l_tax") >= 0),
        "returnflag_domain" -> col("l_returnflag").isin("A", "N", "R"),
        "linenumber_positive" -> (col("l_linenumber") >= 1)))
      val fk = graft.ops.Audit.auditForeignKey(
        delivery, "l_orderkey", T(s, dir, "orders"), "o_orderkey")
      report.crossJoin(broadcast(fk.select(col("n_orphans"))))
        .orderBy(col("rule"))
    }),

    // --- Z-order layout + box query: lineitem written partitioned by the
    //     Morton bucket of (orderkey, partkey); a rectangle query probes
    //     only intersecting buckets (literal IN-list on the partition
    //     column — directory pruning before any file opens). The oracle is
    //     the plain filter — layout must never change results ---------------
    "q124_zorder_box" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      val mx = li.agg(max(col("l_orderkey")), max(col("l_partkey"))).head()
      val (aMax, bMax) = (mx.getLong(0), mx.getLong(1))
      val bits = 3
      def shiftFor(m: Long) =
        math.max(0, 64 - java.lang.Long.numberOfLeadingZeros(m) - bits)
      val (aShift, bShift) = (shiftFor(aMax), shiftFor(bMax))
      val path = sys.props("java.io.tmpdir") + "/graft_q124_z_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      graft.ops.Layout.writeZOrdered(li, path, "l_orderkey", "l_partkey",
        aShift, bShift, bits)
      graft.ops.Layout.zBoxQuery(s, path, "l_orderkey", "l_partkey",
          0L, aMax / 5, 0L, bMax / 5, aShift, bShift, bits)
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          min(col("l_orderkey")).as("min_ok"),
          max(col("l_orderkey")).as("max_ok"),
          max(col("l_partkey")).as("max_pk"))
    }),

    // --- exact phrase search: a k-token phrase IS a k-shingle, so lookup
    //     is one native shingle-hash pass + array_contains — scan
    //     bandwidth, zero shuffle, no index. Hashes Spark-side, token-
    //     window strings oracle-side (q24/q74 precedent) -------------------
    "q125_phrase_search" -> ((s, dir) =>
      TextOps.phraseSearch(T(s, dir, "documents"), "doc_id", "text",
        "table value")),

    // --- ordered conversion funnel over the events stream: step k counts
    //     a user only on an event strictly after their step-(k-1) time —
    //     one declarative plan, k aggregates over (user, ts) pairs ---------
    "q126_event_funnel" -> ((s, dir) =>
      graft.ops.EventOps.funnel(events(s, dir), "user_id", "event_type",
        "ts", Seq("view", "click", "purchase"))),

    // --- retention cohort grid: users cohorted by first active day; the
    //     event log reduces to distinct (user, day) pairs in its only
    //     full pass ------------------------------------------------------
    "q127_retention" -> ((s, dir) =>
      graft.ops.EventOps.retentionCohorts(events(s, dir), "user_id", "ts")
        .orderBy(col("cohort_day"), col("day_offset"))),

    // --- corpus novelty curve: per synthetic snapshot day, the fraction
    //     of that day's distinct shingles first seen that day — the
    //     crawl-growth monitor; hash-width rows only past the scan --------
    "q128_novelty_curve" -> ((s, dir) => {
      val snaps = T(s, dir, "documents").where(col("text").isNotNull)
        .select((col("doc_id") % 8).as("day"), col("text"))
      TextOps.noveltyCurve(snaps, "day", "text", shingleSize = 3)
        .orderBy(col("day"))
    }),

    // --- hopping (sliding) windows: the overlap twin of q31's tumbling
    //     rollup — every event lands in exactly two 2h/1h-slide windows ----
    "q129_hopping_windows" -> ((s, dir) =>
      events(s, dir)
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n"), col("total_value"))),

    // --- tokenizer-vocabulary OOV coverage per language (top-200 corpus
    //     vocabulary; count-desc/token-asc boundary is deterministic) ------
    "q130_oov_report" -> ((s, dir) =>
      TextOps.oovReport(T(s, dir, "documents"), "lang", "text", 200)),

    // --- the BUILT-IN gap-session operator (session_window), value-checked
    //     against the window-lag sessionization rule — a third independent
    //     sessionize implementation (q13 batch lag, q48 stateful stream) ---
    "q131_session_window" -> ((s, dir) =>
      events(s, dir)
        .groupBy(session_window(col("ts"), "30 minutes").as("sw"),
          col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("sw.start").as("session_start"),
          col("sw.end").as("session_end"), col("n_events"))),

    // --- feature-store point-in-time join with max staleness: latest order
    //     at-or-before each event, nulled when older than 30 days — the
    //     union/carry-forward shape, one shuffle, no inequality join -------
    "q132_asof_tolerance" -> ((s, dir) => {
      val e = events(s, dir).select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ets"))
      val o = T(s, dir, "orders").select(col("o_custkey").as("user_id"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("ots"),
        col("o_orderdate"))
      graft.ops.Joins.asOfBackward(e, o, "user_id", "ets", "ots",
        Seq("o_orderdate"), toleranceUs = 30L * 86400L * 1000000L)
    }),

    // --- encoding-quality gate: mojibake artifacts, control chars, and
    //     U+FFFD replacement chars planted by doc_id residue; every counter
    //     a codegen'd string primitive, every rule an integer rational ------
    "q133_encoding_gate" -> ((s, dir) => {
      val docs = T(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 6 === 0, lit(" cafÃ© donâ€™t")).otherwise(lit("")),
          when(col("doc_id") % 9 === 0, lit("\u0007\u0001\u0007")).otherwise(lit("")),
          when(col("doc_id") % 10 === 0, lit("��")).otherwise(lit("")))
          .as("text"))
      TextOps.encodingQuality(docs, "doc_id", "text")
    }),

    // --- length-bucketed inference batching: 64-token bands, 16-doc batches,
    //     2 skew shards; manifests carry the padding-waste the bucketing
    //     exists to minimize. Only (id, n_tokens) pairs ever shuffle ---------
    "q134_length_batches" -> ((s, dir) =>
      TextOps.lengthBatches(T(s, dir, "documents"), "doc_id", "text",
        batchSize = 16, bandTokens = 64, shards = 2)),

    // --- iterative BPE merge training: 4 greedy rounds over the word-
    //     frequency dictionary; each round's argmax + merge replays exactly
    //     in SQL (identical replace semantics) -----------------------------
    "q135_bpe_merges" -> ((s, dir) =>
      TextOps.bpeMerges(T(s, dir, "documents"), "text", rounds = 4)),

    // --- surgical benchmark decontamination: ≥8-token runs shared with the
    //     benchmark slice (doc_id % 11 = 0) spliced out of training docs;
    //     unique content around the contamination survives. Oracle replays
    //     the cut rule on shingle strings and md5-hashes every cleaned text -
    "q136_decontaminate_spans" -> ((s, dir) => {
      val all = T(s, dir, "documents")
      val bench = all.where(col("doc_id") % 11 === 0).select(col("text"))
      val train = all.where(col("doc_id") % 11 =!= 0)
      Dedup.cutContaminatedSpans(train, "doc_id", "text", bench, "text",
          minTokens = 8)
        .select(col("doc_id"), col("n_tokens"),
          md5(col("text_clean").cast("binary")).as("clean_md5"), col("was_cut"))
    }),

    // --- mergeable per-source Count-Min sketches (the frequency twin of
    //     q113's KMV distinct sketches): merge is counter-wise sum (exact
    //     identity), estimates can only overcount — `sound` pins est>=exact
    //     for every probe including an unseen token ------------------------
    "q137_cms_counts" -> ((s, dir) => {
      val probes = Seq("join", "hash", "scan", "filter", "merge",
        "zzz_unseen_token")
      val sk = TextOps.cmsSketchShards(T(s, dir, "documents"), "source",
        "text", depth = 4, width = 512)
      val est = TextOps.cmsEstimate(sk, probes, depth = 4, width = 512)
      val exact = T(s, dir, "documents")
        .select(explode(tokens(lower(col("text")))).as("token"))
        .where(col("token").isin(probes: _*))
        .groupBy(col("token")).agg(count(lit(1)).as("exact"))
      est.join(exact, Seq("token"), "left")
        .select(col("token"), col("est"),
          coalesce(col("exact"), lit(0L)).as("exact"),
          (col("est") >= coalesce(col("exact"), lit(0L))).as("sound"))
    }),

    // --- PMI collocation extraction: adjacent-pair counts vs chance,
    //     min-count floor, nano-quantized ln (q73's parity contract),
    //     deterministic top-25 --------------------------------------------
    "q138_collocations" -> ((s, dir) =>
      TextOps.collocations(T(s, dir, "documents"), "text",
        minCount = 5, topK = 25)),

    // --- weighted sampling without replacement (priority sampling, Duffield–
    //     Lund–Thorup): top-200 docs by w/u priority, w = n_chars, u = md5
    //     id hash — long docs proportionally likelier, selection replays
    //     exactly on any engine (IEEE-exact cast+divide ordering) ----------
    "q139_priority_sample" -> ((s, dir) =>
      graft.ops.Sampling.prioritySample(T(s, dir, "documents"), "doc_id",
          "n_chars", 200)
        .select(col("doc_id"), col("n_chars"), col("lang"))),

    // --- exact windowed COUNT(DISTINCT) in a stream: chained stateful
    //     aggregations ((window,key) collapse → window_time re-window),
    //     append semantics — the final in-flight window is withheld and the
    //     oracle replays the exclusion --------------------------------------
    "q140_stream_distinct" -> ((s, dir) => {
      val ev = graft.streaming.Streaming.eventsReplay(s, dir, 4)
      graft.streaming.Streaming.runToTable(
        graft.streaming.Streaming.windowDistinct(ev, "user_id"),
        "q140_mem_" + java.util.UUID.randomUUID().toString.replace("-", ""),
        mode = org.apache.spark.sql.streaming.OutputMode.Append(),
        statePartitions = Some(4))
    }),

    // --- blocked fuzzy entity matching: collapse to the 64-name dictionary,
    //     candidate pairs by first-token block, levenshtein<=4 verify —
    //     record linkage without all-pairs ---------------------------------
    "q141_fuzzy_match" -> ((s, dir) =>
      graft.ops.Joins.fuzzyNamePairs(T(s, dir, "part"), "p_partkey", "p_name",
        split(col("p_name"), " ").getItem(0), maxDist = 4)),

    // --- tokenizer evaluation loop: train 4 BPE merges (q135's exact rule),
    //     ENCODE the dictionary with them, report per-language fertility +
    //     compression — the tokenizer-equity metric -------------------------
    "q142_bpe_fertility" -> ((s, dir) =>
      TextOps.bpeFertility(T(s, dir, "documents"), "lang", "text", rounds = 4)),

    // --- hybrid retrieval: BM25 top-100 (lexical) fused with int8-quantized
    //     cosine top-100 (vector) by reciprocal-rank fusion. Both rank lists
    //     are exact cross-engine (nano-quantized BM25; integer int8 dots),
    //     so the fused order replays in SQL. Stores are id-aligned
    //     (vec_id == doc_id, the derived-embedding layout) -----------------
    "q143_rrf_fusion" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val lex = TextOps.bm25TopK(T(s, dir, "documents"), "doc_id", "text",
          Seq("spark", "window", "merge"), 100)
        .select(col("doc_id"),
          row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
            .cast("long").as("rank"))
      val emb = T(s, dir, "embeddings")
      val qRaw = emb.where(col("vec_id") === 0).select(col("embedding"))
        .head().getSeq[Float](0)
      // driver-side quantization of the query with quantizeInt8's formula
      val qMax = qRaw.map(v => math.abs(v.toDouble)).max
      val qQ: Seq[Byte] =
        if (qMax == 0) qRaw.map(_ => 0.toByte)
        else qRaw.map(v => math.floor(v.toDouble * 127.0 / qMax).toByte)
      val vec = graft.ops.Similarity.quantizeInt8(
          emb.where(col("vec_id") =!= 0), "vec_id", "embedding")
        .select(col("id").as("doc_id"),
          graft.functions.GraftFunctions.cosine_sim_int8_pair(
            col("qvec"), array(qQ.map(b => lit(b)): _*)).as("cos"))
        .orderBy(col("cos").desc, col("doc_id")).limit(100)
        .select(col("doc_id"),
          row_number().over(Window.orderBy(col("cos").desc, col("doc_id")))
            .cast("long").as("rank"))
      graft.ops.Similarity.rrfFuse(Seq(lex, vec), "doc_id", kConst = 60,
        topK = 20)
    }),

    // --- n-gram diversity report: distinct-n ratios (n=1..3) + unigram
    //     Shannon entropy per language — template collapse and crawl loops
    //     show up as falling ratios; entropy_nano replays exactly ----------
    "q144_ngram_diversity" -> ((s, dir) =>
      TextOps.ngramDiversity(T(s, dir, "documents"), "lang", "text")),

    // --- stream-static enrichment: the streaming events feed inner-joined
    //     to the static customer dim (broadcast — stateless, no watermark,
    //     no state store), rolled up per market segment after the drain.
    //     Value sums in integer cents: exact in any accumulation order -----
    "q145_stream_enrich" -> ((s, dir) => {
      val ev = graft.streaming.Streaming.eventsStream(s, dir)
      val cust = T(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val joined = ev.join(broadcast(cust),
          ev("user_id") === cust("c_custkey"))
        .select(col("c_mktsegment"),
          round(col("value") * 100.0, 0).cast("long").as("cents"))
      val drained = graft.streaming.Streaming.runToTable(joined,
        "q145_mem_" + java.util.UUID.randomUUID().toString.replace("-", ""),
        mode = org.apache.spark.sql.streaming.OutputMode.Append(),
        statePartitions = Some(4), noDataBatch = false)
      drained.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("cents")).as("value_cents"))
    }),

    // --- streaming CM-sketch maintenance: the sketch IS the state (exactly
    //     depth x width counter rows forever); CM linearity makes the live
    //     sketch == the batch sketch, so probing it gives batch-identical
    //     estimates — sound (overcount-only) vs exact, q137's gate ---------
    "q146_stream_cms" -> ((s, dir) => {
      val probes = Seq("join", "hash", "scan", "filter", "merge",
        "zzz_unseen_token")
      val replay = graft.streaming.Streaming.docsReplay(s, dir, 4)
      val sk = graft.streaming.Streaming.cmsMaintainStream(
        replay, "text", depth = 4, width = 512)
      val drained = graft.streaming.Streaming.runToTable(sk,
        "q146_mem_" + java.util.UUID.randomUUID().toString.replace("-", ""),
        mode = org.apache.spark.sql.streaming.OutputMode.Complete(),
        statePartitions = Some(4))
      val est = TextOps.cmsEstimate(drained, probes, depth = 4, width = 512)
      val exact = T(s, dir, "documents")
        .select(explode(tokens(lower(col("text")))).as("token"))
        .where(col("token").isin(probes: _*))
        .groupBy(col("token")).agg(count(lit(1)).as("exact"))
      est.join(exact, Seq("token"), "left")
        .select(col("token"), col("est"),
          coalesce(col("exact"), lit(0L)).as("exact"),
          (col("est") >= coalesce(col("exact"), lit(0L))).as("sound"))
    }),

    // --- join-key skew diagnosis: top heavy keys + integer per-mille share
    //     + recommended salt factor — run BEFORE the join that needs it ----
    "q147_skew_report" -> ((s, dir) =>
      graft.ops.Audit.skewReport(T(s, dir, "lineitem"), "l_suppkey",
        topK = 10)),

    // --- log2-bucketed length histogram per source: the datacard length
    //     curve via exact bit-length buckets (no float log2) ---------------
    "q148_length_histogram" -> ((s, dir) =>
      TextOps.lengthHistogram(T(s, dir, "documents"), "source", "text")),

    // --- behavioral-sequence export: per-user ordered event sequences,
    //     truncated to 32 and fingerprinted — any ordering/truncation drift
    //     anywhere breaks a hash -----------------------------------------
    "q149_user_sequences" -> ((s, dir) =>
      graft.ops.EventOps.userSequences(events(s, dir), "user_id", "ts",
        "event_id", "event_type", maxLen = 32)),

    // --- leakage-safe train/test split: near-dup CLUSTERS split atomically
    //     (every member inherits its cluster representative's hash bucket),
    //     so no near-dup pair can cross the split — the pinned
    //     n_cross_pairs = 0 is the hygiene contract train/test splits
    //     without cluster awareness violate --------------------------------
    "q150_leakage_safe_split" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val pairs = Dedup.minHashLSH(docs, "doc_id", "text", threshold = 0.8)
      val clusters = Dedup.clusterDuplicates(pairs)
        .select(col("id").as("doc_id"), col("rep"))
      val assigned = docs.select(col("doc_id"))
        .join(clusters, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("rep"), col("doc_id")).as("rep"))
        .withColumn("split",
          when(graft.ops.Sampling.hashBucket(col("rep")) < 80, "train")
            .otherwise("test"))
      val sp = assigned.select(col("doc_id"), col("split"))
      val cross = pairs
        .join(sp.select(col("doc_id").as("id_a"), col("split").as("sa")),
          Seq("id_a"))
        .join(sp.select(col("doc_id").as("id_b"), col("split").as("sb")),
          Seq("id_b"))
        .where(col("sa") =!= col("sb"))
        .agg(count(lit(1)).as("n_cross_pairs"))
      assigned.groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("rep")).as("n_clusters"),
          sum(col("doc_id")).as("id_sum"))
        .crossJoin(broadcast(cross))
    }),

    // --- per-doc tf-idf keywords: integer tf x nano-quantized idf — exact
    //     per-doc rankings, per-group top-k heap (no sort per doc). Sampled
    //     doc slice keeps the report output bounded -------------------------
    "q151_tfidf_keywords" -> ((s, dir) =>
      TextOps.tfidfKeywords(
        T(s, dir, "documents").where(col("doc_id") % 25 === 0),
        "doc_id", "text", k = 3)),

    // --- daily-volume anomaly gate: |x-mean| > 2 sigma decided by integer
    //     cross-multiplication — the flag can never flip on float drift ----
    "q152_volume_anomalies" -> ((s, dir) =>
      graft.ops.EventOps.volumeAnomalies(events(s, dir), "ts", sigmaK = 2)),

    // --- incremental ANN index append: base corpus written bucketed, a new
    //     batch (with planted exact copies of the query) APPENDED into the
    //     same partitioned layout; the probe's partition-pruned scan finds
    //     the appended vectors — provable top-5 ------------------------------
    "q153_ann_append" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val q = emb.where(col("vec_id") === 7).select(col("embedding"))
        .head().getSeq[Float](0)
      val planted = emb.where(col("vec_id") === 7)
        .select(explode(sequence(lit(0), lit(4))).as("i"), col("embedding"))
        .select((col("i") + 9300L).as("vec_id"), col("embedding"))
      val base = emb.where(col("vec_id") =!= 7 && col("vec_id") % 20 =!= 3)
      val newBatch = emb.where(col("vec_id") =!= 7 && col("vec_id") % 20 === 3)
        .unionByName(planted)
      val path = sys.props("java.io.tmpdir") + "/graft_q153_ann_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      // overwrite-then-append per invocation: repeated runs never accumulate.
      // 5 bucket bits (32 partition dirs): the write cost is dir/file
      // creation, not data, at this corpus size — fewer, larger buckets keep
      // the timed window measuring the append semantics, not mkdir calls
      Similarity.writeBucketedCorpus(base, "vec_id", "embedding", path,
        nBits = 5)
      Similarity.appendBucketedCorpus(newBatch, "vec_id", "embedding", path,
        nBits = 5)
      Similarity.annTopKFromBucketed(s, path, "vec_id", "embedding", q, 5,
          nBits = 5)
        .select(col("vec_id"), round(col("cos"), 4).as("cos"))
    }),

    // --- matryoshka truncation gauge: recall@10 of prefix-width cosine
    //     rankings vs the full 64-dim ranking, int8-exact end to end — the
    //     evidence behind a truncate-then-rerank ANN deployment -------------
    "q154_matryoshka_recall" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val qRaw = emb.where(col("vec_id") === 0).select(col("embedding"))
        .head().getSeq[Float](0)
      val qMax = qRaw.map(v => math.abs(v.toDouble)).max
      val qQ: Seq[Byte] =
        if (qMax == 0) qRaw.map(_ => 0.toByte)
        else qRaw.map(v => math.floor(v.toDouble * 127.0 / qMax).toByte)
      val qz = Similarity.quantizeInt8(
        emb.where(col("vec_id") =!= 0), "vec_id", "embedding")
      Similarity.matryoshkaRecall(qz, "id", "qvec", qQ, k = 10,
        dims = Seq(8, 16, 32))
    }),

    // --- normalized exact dedup: planted case/punctuation variants collapse
    //     onto their originals (keep-first), which byte-exact dedup misses —
    //     one shuffle on 16-byte normalized fingerprints -------------------
    "q155_normalized_dedup" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"))
      val variants = docs.where(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"),
          concat(upper(col("text")), lit(" !!")).as("text"), col("lang"))
      Dedup.dedupNormalized(docs.unionByName(variants), "doc_id", "text")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_survivors"),
          sum(col("doc_id")).as("id_sum"),
          sum(col("n_variants")).as("n_docs"))
    }),

    // --- nDCG@10 of the BM25 ranking against term-coverage relevance
    //     grades (0-3 query terms present) — position- and grade-weighted
    //     retrieval quality, integer-exact ---------------------------------
    "q156_ndcg" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = T(s, dir, "documents")
      val terms = Seq("spark", "window", "merge")
      val ranking = TextOps.bm25TopK(docs, "doc_id", "text", terms, 10)
        .select(col("doc_id"),
          row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
            .cast("long").as("rank"))
      val toks = tokens(lower(col("text")))
      val rel = docs.select(col("doc_id"),
        terms.map(t =>
            coalesce(array_contains(toks, t), lit(false)).cast("long"))
          .reduce(_ + _).as("rel"))
      Similarity.ndcgAt(ranking, rel, "doc_id", k = 10)
    }),

    // --- k-anonymity audit over (nation, segment) quasi-identifiers: the
    //     re-identification gate, all exact integers -----------------------
    "q157_k_anonymity" -> ((s, dir) =>
      graft.ops.Audit.kAnonymityAudit(T(s, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment"), k = 5)),

    // --- exponentially decayed trending terms over the q128 snapshot days:
    //     half-life one day, weights are integer powers of two — the whole
    //     ranking is 64-bit integer arithmetic ------------------------------
    "q158_decayed_trending" -> ((s, dir) =>
      TextOps.decayedTrendingTerms(
        T(s, dir, "documents").where(col("text").isNotNull)
          .select((col("doc_id") % 8).as("day"), col("text")),
        "day", "text", maxAge = 7, topK = 20)),

    // --- coverage-guaranteed eval split: every language contributes >= 20
    //     min-wise docs to test (a pure hash split can starve small cells);
    //     coverage_ok pins the guarantee per cell ---------------------------
    "q159_coverage_split" -> ((s, dir) => {
      val split = graft.ops.Sampling.coverageSplit(
        T(s, dir, "documents"), "doc_id", "lang",
        minTest = 20, trainPermille = 900)
      val per = split.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"),
          sum(when(col("split") === "train", col("doc_id"))).as("train_id_sum"))
      per.select(col("lang"), col("n_docs"), col("n_test"),
        coalesce(col("train_id_sum"), lit(0L)).as("train_id_sum"),
        (col("n_test") >= least(lit(20L), col("n_docs"))).as("coverage_ok"))
    }),

    // --- IVF-PQ two-stage ANN (the faiss-default composition): IVF cells
    //     prune candidates, PQ codes score survivors by ADC. Planted exact
    //     copies of the query share its argmax cell (always probed first)
    //     and encode to the per-subspace argmin codes — provable top-5 ----
    "q160_ivfpq_ann" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val q = emb.where(col("vec_id") === 13).select(col("embedding"))
        .head().getSeq[Float](0)
      val planted = emb.where(col("vec_id") === 13)
        .select(explode(sequence(lit(0), lit(4))).as("i"), col("embedding"))
        .select((col("i") + 9400L).as("vec_id"), col("embedding"))
      val corpus = emb.where(col("vec_id") =!= 13).unionByName(planted)
      val cents = Similarity.ivfCentroids(corpus, "vec_id", "embedding", k = 8)
      val cb = Similarity.pqTrain(corpus, "vec_id", "embedding",
        m = 8, ksub = 16, iters = 2)
      Similarity.ivfPqTopK(corpus, "vec_id", "embedding", q, 5, cents, cb,
          nProbe = 2)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("adc_dist").asc, col("vec_id"))))
        .select(col("rank").cast("bigint").as("rank"), col("vec_id"))
    }),

    // --- full streaming ingest pre-filter, three stages on ONE stateless
    //     stream: encoding gate -> stratified mix -> bloom decontamination.
    //     Gate + mix replay exactly; the bloom stage keeps a SUBSET of the
    //     exact-kept set (overcount-only), pinned by n_bloom_outside_exact
    //     = 0 — q84's gating discipline applied to the composed pipeline --
    "q161_stream_ingest" -> ((s, dir) => {
      val train = T(s, dir, "documents").where(col("doc_id") % 7 === 0)
        .select(col("doc_id"), col("text"))
      def plant(df: DataFrame) = df.withColumn("text", concat(col("text"),
        when(col("doc_id") % 6 === 0, lit(" cafÃ© donâ€™t")).otherwise(lit("")),
        when(col("doc_id") % 9 === 0, lit(""))
          .otherwise(lit(""))))
      def gateMix(df: DataFrame) = graft.ops.Sampling.stratifiedSample(
        plant(df).where(TextOps.encodingKeep(col("text"))),
        "doc_id", "lang", Map("en" -> 250, "de" -> 0))
      val streamed = graft.streaming.Streaming.runToTable(
        graft.streaming.Streaming.decontaminateStream(
          gateMix(graft.streaming.Streaming.docsReplay(s, dir, 4)),
          train, "doc_id", "text", shingleSize = 3,
          maxRateNum = 1, maxRateDen = 2),
        "q161_mem_" + java.util.UUID.randomUUID().toString.replace("-", ""),
        mode = org.apache.spark.sql.streaming.OutputMode.Append(),
        statePartitions = Some(4), noDataBatch = false)
      val gm = gateMix(T(s, dir, "documents"))
      val exact = TextOps.contamination(train,
          gm.select(col("doc_id"), col("text")), "doc_id", "text", 3)
        .select(col("doc_id"), col("n_shingles"), col("n_contaminated"))
      val exactKept = gm.join(exact, Seq("doc_id"))
        .where(col("n_contaminated") * 2 <= col("n_shingles"))
      val outside = streamed.select(col("doc_id"))
        .join(exactKept.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .agg(count(lit(1)).as("n_bloom_outside_exact"))
      gm.groupBy(col("lang")).agg(count(lit(1)).as("n_gated"))
        .join(exactKept.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_kept_exact")), Seq("lang"), "left")
        .na.fill(0L, Seq("n_kept_exact"))
        .crossJoin(broadcast(outside))
    }),

    // --- time-travel snapshot read: the versioned-cell table reconstructed
    //     AS OF max(ts) − 1 day — q40's latest-version rule bounded by a
    //     snapshot timestamp (the store's M1-versioning read back in time) --
    "q162_snapshot_read" -> ((s, dir) => {
      val ev = events(s, dir)
      val bound = ev.agg(
        (max(unix_micros(col("ts"))) - 86400000000L).as("t0"))
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(unix_micros(col("ts")).desc, col("event_id").desc)
      ev.crossJoin(broadcast(bound))
        .where(unix_micros(col("ts")) <= col("t0"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("user_id"), col("event_type"),
          col("event_id").as("event_id_asof"),
          round(col("value"), 2).as("value_asof"))
    }),

    // --- search snippets: ±5-token context around the first occurrence —
    //     the highlighted-preview stage after retrieval picks the docs -----
    "q163_search_snippets" -> ((s, dir) =>
      TextOps.searchSnippets(
        T(s, dir, "documents").where(col("doc_id") % 10 === 0),
        "doc_id", "text", "merge", window = 5)),

    // --- column profiling (the ANALYZE report): exact distincts, null
    //     counts, min/max per key column ----------------------------------
    "q164_column_profile" -> ((s, dir) =>
      graft.ops.Audit.profileColumns(T(s, dir, "lineitem"),
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity"))),

    // --- quality-canonical dedup: each near-dup cluster keeps its BEST
    //     member by the replayable quality score (ties → min id), not the
    //     arbitrary first — survivors rolled up per lang -------------------
    "q165_canonical_select" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val scored = docs.select(col("doc_id"), col("lang"),
        TextOps.qualityScore(col("text")).as("q"))
      val pairs = Dedup.ngramJaccard(docs, "doc_id", "text",
        shingleSize = 3, threshold = 0.8, maxDf = Some(1000))
      Dedup.removeDuplicatesKeepBest(scored, "doc_id", pairs, "q")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
    }),

    // --- market-basket frequent pairs (A-Priori k=2): brand pairs
    //     co-ordered above a support floor, ranked with nano-exact lift;
    //     the pair build joins on the BASKET key — never corpus² ----------
    "q166_frequent_pairs" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
        .join(T(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("basket"), col("p_brand").as("item"))
      graft.ops.EventOps.frequentPairs(li, "basket", "item",
        minSupport = 50, topK = 20)
    }),

    // --- cross-source duplicate attribution ("who copies whom"): exact-dup
    //     clusters spanning source pairs, fingerprint-keyed — crawl
    //     forensics at Σ C(sources-per-cluster, 2) cost --------------------
    "q167_cross_source_dups" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("source"))
      // planted mirror site: every 17th doc re-posted verbatim under a
      // mirror source (plus every 51st ALSO under a second mirror — a
      // three-way syndication cluster)
      val mirror1 = docs.where(col("doc_id") % 17 === 0)
        .select((col("doc_id") + 200000L).as("doc_id"), col("text"),
          concat(lit("mirror_"), col("source")).as("source"))
      val mirror2 = docs.where(col("doc_id") % 51 === 0)
        .select((col("doc_id") + 300000L).as("doc_id"), col("text"),
          lit("aggregator").as("source"))
      Dedup.crossSourceDuplication(
        docs.unionByName(mirror1).unionByName(mirror2), "text", "source")
    }),

    // --- mergeable histogram quantile bounds: per-source equi-width
    //     histograms merged by counter sum (exact identity); p50/p90/p99
    //     get guaranteed width-256 bounds from pure integer ranks ----------
    "q168_histogram_quantiles" -> ((s, dir) => {
      val h = TextOps.histogramShards(T(s, dir, "documents"), "source",
        "n_chars", width = 256L)
      TextOps.histogramQuantileBounds(h, width = 256L,
        permilles = Seq(500, 900, 990))
    }),

    // --- soft dedup: reweight-instead-of-remove — every copy kept, each
    //     exact-dup cluster's training mass preserved at exactly one unit
    //     (weight_nano = floor(1e9/n); pure integers, no float ratio).
    //     Planted copies (every 13th doc once, every 39th twice) give the
    //     corpus dup_count values of 1, 2 and 3 ---------------------------
    "q169_soft_dedup" -> ((s, dir) => {
      val docs = T(s, dir, "documents").select(col("doc_id"), col("text"))
      val copies = docs.where(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 400000L).as("doc_id"), col("text"))
      val copies2 = docs.where(col("doc_id") % 39 === 0)
        .select((col("doc_id") + 500000L).as("doc_id"), col("text"))
      Dedup.softDedupWeights(docs.unionByName(copies).unionByName(copies2),
        "doc_id", "text")
    }),

    // --- sorted-neighborhood near-dup: the linear-candidate blocking
    //     alternative to band joins — n·window candidate pairs regardless of
    //     corpus skew. Rank replay is exact: globalRank(sig, id) ≡ SQL
    //     row_number() OVER (ORDER BY sig, doc_id); md5-60-bit token hashes
    //     make the SimHash signatures engine-identical --------------------
    "q170_sorted_neighborhood" -> ((s, dir) => {
      Dedup.sortedNeighborhood(T(s, dir, "documents"), "doc_id", "text",
        window = 10, maxHamming = 6, tokenHasher = md5_token_hashes)
        .select(col("id_a"), col("id_b"),
          col("hamming").cast("bigint").as("hamming"))
    }),

    // --- label propagation: seed labels spread over the q106 click graph —
    //     3 synchronous rounds, integer votes (edge multiplicity), smallest-
    //     label tie-break, seeds clamped; every arithmetic step replayable --
    "q171_label_propagation" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("page",
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long"))
      val edges = graft.ops.Graph.transitionEdges(
        ev, "user_id", "ts", "event_id", "page")
      val seeds = edges.select(col("src").as("node"))
        .unionByName(edges.select(col("dst").as("node"))).distinct()
        .where(col("node") % 7 === 0)
        .withColumn("label", col("node") % 3)
      graft.ops.Graph.labelPropagation(edges, seeds, iterations = 3)
    }),

    // --- margin-based mutual-NN alignment (bitext-mining criterion): the
    //     even/odd vec_id halves act as the two embedding views; int8-nano
    //     cosines, integer top-4 neighborhood sums, integer margin ratio —
    //     selection and scores replay exactly ----------------------------
    "q172_margin_alignment" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      Similarity.marginAlignment(
        emb.where(col("vec_id") % 2 === 0),
        emb.where(col("vec_id") % 2 === 1),
        "vec_id", "embedding", k = 4, minMarginNano = 1000000000L)
    }),

    // --- score calibration: the q103 NB classifier's log-odds margin
    //     bucketed against the planted ground truth — the reliability
    //     diagram deciding whether the margin is a usable confidence.
    //     Margin and rates are pure integers ------------------------------
    "q173_calibration" -> ((s, dir) => {
      val labeled = T(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 3 === 0,
            concat(col("text"), lit(" alpha beta alpha")))
          .otherwise(col("text")).as("text"),
        when(col("doc_id") % 3 === 0, lit("aug")).otherwise(lit("plain"))
          .as("cls"))
      val margins = TextOps.nbLogOdds(labeled, "doc_id", "text", "cls", "aug")
      Audit.reliabilityReport(
        margins.withColumn("is_aug", col("cls") === "aug"),
        "margin_nano", "is_aug",
        lo = -10000000000L, hi = 20000000000L, bins = 15)
    }),

    // --- systematic importance resampling: 1000 training slots ∝ n_chars,
    //     equally-spaced markers on the md5-ordered cumulative-weight line —
    //     Σ copies = 1000 exactly, zero RNG, pure integer ceil-divs --------
    "q174_systematic_resample" -> ((s, dir) => {
      Sampling.systematicResample(
        T(s, dir, "documents").where(col("n_chars") > 0)
          .select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", n = 1000L)
    }),

    // --- k-center coreset: 6 farthest-point exemplars over the embedding
    //     corpus — exact integer squared distances on int8 vectors make the
    //     greedy selection and the covering-radius curve replayable --------
    "q175_kcenter_coreset" -> ((s, dir) => {
      Similarity.kCenterCoreset(T(s, dir, "embeddings"), "vec_id",
        "embedding", k = 6)
    }),

    // --- blocklist gate audit (the C4 bad-words rule): token-granular
    //     drop-if-any-hit per doc, per-source drop rates in integer
    //     permille; matching by token set, never substring ----------------
    "q176_blocklist_gate" -> ((s, dir) => {
      TextOps.blocklistReport(T(s, dir, "documents"), "source", "text",
        blocklist = Seq("slow", "vector"))
    }),

    // --- event-time lateness audit: replay the log as daily user-bucketed
    //     dumps (arrival = (day, user, event)) and histogram event-time
    //     lateness vs the high-water mark — the table a watermark is sized
    //     from. Integer log2 buckets, integer cumulative permilles --------
    "q177_lateness_audit" -> ((s, dir) => {
      graft.ops.EventOps.latenessAudit(events(s, dir), "ts",
        Seq(expr("unix_micros(ts) div 86400000000"), col("user_id"),
          col("event_id")))
    }),

    // --- dedup threshold tuning curve: one exact-jaccard pair pass down to
    //     0.2, each pair fanned into every decile it satisfies — the
    //     removal-cost table for every candidate threshold at once --------
    "q178_threshold_curve" -> ((s, dir) =>
      Dedup.thresholdCurve(T(s, dir, "documents"), "doc_id", "text")),

    // --- paired bootstrap ranker comparison: tf-rank vs density-rank MRR
    //     over 12 term queries, 1000 md5-seeded replicas — the significance
    //     verdict ("A beats B in k/1000 replicas") with zero RNG ----------
    "q179_paired_bootstrap" -> ((s, dir) => {
      val terms = Seq("spark", "window", "merge", "join", "hash", "scan",
        "filter", "batch", "query", "table", "vector", "stream")
      val docs = T(s, dir, "documents")
      val base = docs
        .select(col("doc_id"), tokens(lower(col("text"))).as("tk"))
        .select(col("doc_id"), size(col("tk")).cast("long").as("len"),
          explode(col("tk")).as("tok"))
        .where(col("tok").isin(terms: _*))
        .groupBy(col("tok"), col("doc_id"))
        .agg(count(lit(1)).as("c"), max(col("len")).as("len"))
        .select(col("tok"), col("doc_id"), col("c"),
          expr("c * cast(1000000000 as bigint) div len").as("dens"),
          (col("c") >= 2).as("rel"))
      def rrBy(orderCol: String, out: String) = {
        val w = Window.partitionBy(col("tok"))
          .orderBy(col(orderCol).desc, col("doc_id"))
        base.withColumn("rk", row_number().over(w))
          .where(col("rk") <= 10 && col("rel"))
          .groupBy(col("tok")).agg(min(col("rk").cast("long")).as("fr"))
          .select(col("tok"),
            expr("cast(1000000000 as bigint) div fr").as(out))
      }
      import s.implicits._
      val perQuery = terms.toDF("tok")
        .join(rrBy("c", "rr_a"), Seq("tok"), "left")
        .join(rrBy("dens", "rr_b"), Seq("tok"), "left")
        .na.fill(0L, Seq("rr_a", "rr_b"))
      Similarity.pairedBootstrap(perQuery, "tok", "rr_a", "rr_b",
        resamples = 1000)
    }),

    // --- precision-guaranteed auto-thresholding: the deepest NB-margin cut
    //     meeting each precision target (maximize recall subject to the
    //     floor) — the operating-point picker for a corpus gate -----------
    "q180_precision_thresholds" -> ((s, dir) => {
      val labeled = T(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 3 === 0,
            concat(col("text"), lit(" alpha beta alpha")))
          .otherwise(col("text")).as("text"),
        when(col("doc_id") % 3 === 0, lit("aug")).otherwise(lit("plain"))
          .as("cls"))
      val margins = TextOps.nbLogOdds(labeled, "doc_id", "text", "cls", "aug")
      Audit.precisionThresholds(
        margins.withColumn("is_aug", col("cls") === "aug"),
        "doc_id", "margin_nano", "is_aug", Seq(800, 900, 950, 990))
    }),

    // --- water-filling token-budget allocation: the max-min-fair split of
    //     a 24k-token budget across the 20 sources — small sources fully
    //     taken, the surplus re-spreads equally; all integer, closed form --
    "q181_water_fill" -> ((s, dir) => {
      Sampling.waterFill(
        T(s, dir, "documents")
          .select(col("source"), token_count(col("text")).cast("long").as("t")),
        "source", "t", budget = 24000L)
    }),

    // --- SRP index-health audit: per-plane-bit balance and pairwise
    //     co-activation over the md5 hyperplane scheme — the wasted-bit /
    //     correlated-plane detector for the q29 LSH index ----------------
    "q182_srp_health" -> ((s, dir) => {
      Similarity.srpIndexHealth(T(s, dir, "embeddings"), "vec_id",
        "embedding", nBits = 8)
    }),

    // --- sparse cosine all-pairs join (Bayardo-style) over hashed-TF text
    //     vectors — model-free cosine near-dup; postings join on bucket
    //     keys, integer dots, one IEEE division --------------------------
    "q183_sparse_cosine" -> ((s, dir) => {
      Similarity.sparseCosinePairs(T(s, dir, "documents"), "doc_id", "text",
        dim = 512, threshold = 0.95)
    }),

    // --- within-source quantile normalization of the quality score: rank
    //     permille makes "top 20% of EACH source" one global predicate —
    //     raw-score thresholds over-select whole sources -----------------
    "q184_quantile_normalize" -> ((s, dir) => {
      val scored = T(s, dir, "documents").select(col("doc_id"), col("source"),
        floor(TextOps.qualityScore(col("text")) * 1000).cast("long").as("q"))
      Sampling.quantileNormalize(scored, "source", "q", "doc_id")
    }),

    // --- streaming token-budget admission: the q181 water-fill plan
    //     ENFORCED at ingest — first-fit per source over the 4-batch
    //     replay; oversized docs drop without consuming budget ------------
    "q185_budget_admit" -> ((s, dir) => {
      val batchDocs = T(s, dir, "documents")
        .select(col("source"), token_count(col("text")).cast("long").as("t"))
      val budgets = Sampling.waterFill(batchDocs, "source", "t", 24000L)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      val replay = graft.streaming.Streaming.docsReplay(s, dir, 4)
        .select(col("doc_id"), col("source"),
          token_count(col("text")).cast("long").as("t"))
      val admits = graft.streaming.Streaming.budgetAdmitStream(
        replay, "doc_id", "source", "t", budgets)
      graft.streaming.Streaming.runToTable(
        admits.toDF(),
        "q185_mem_" + java.util.UUID.randomUUID().toString.replace("-", ""),
        mode = org.apache.spark.sql.streaming.OutputMode.Append(),
        statePartitions = Some(4), noDataBatch = false)
        .select(col("group").as("source"), col("id").as("doc_id"),
          col("tokens"), col("cum_tokens"))
    }),

    // --- per-node triangle counts over the q106 click graph: degree-ordered
    //     orientation bounds every wedge fan-out at O(√m) — the cohesion
    //     audit that survives power-law degree skew ----------------------
    "q186_triangle_counts" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("page",
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long"))
      val edges = graft.ops.Graph.transitionEdges(
        ev, "user_id", "ts", "event_id", "page")
      graft.ops.Graph.triangleCounts(edges)
    }),

    // --- split-conformal admission: the k-th-smallest calibration
    //     nonconformity (k = ⌈(n+1)·0.9⌉) becomes the gate threshold —
    //     distribution-free ≥90% admission under exchangeability ---------
    "q187_conformal_gate" -> ((s, dir) => {
      val scored = T(s, dir, "documents").select(col("doc_id"),
        (lit(1000L) - floor(TextOps.qualityScore(col("text")) * 1000)
          .cast("long")).as("nonconformity"))
      graft.ops.Audit.conformalGate(scored, "doc_id", "nonconformity",
        calibPct = 50, alphaPermille = 100)
    }),

    // --- Pareto skyline of (token count, quality): the non-dominated
    //     curation frontier with no self-join — per-x maxima + one
    //     grid-sized suffix-max window -----------------------------------
    "q188_pareto_skyline" -> ((s, dir) => {
      val scored = T(s, dir, "documents").select(col("doc_id"),
        token_count(col("text")).cast("long").as("n_tokens"),
        floor(TextOps.qualityScore(col("text")) * 1000).cast("long").as("q"))
      Sampling.paretoSkyline(scored, "doc_id", "n_tokens", "q")
    }),

    // --- order-independent per-source corpus checksum: the stage-boundary
    //     integrity certificate (xor + modular sum + min/max of 60-bit row
    //     digests) — pure function of the row multiset -------------------
    "q189_corpus_checksum" -> ((s, dir) =>
      graft.ops.Audit.corpusChecksum(T(s, dir, "documents"), "source",
        Seq("doc_id", "text", "lang", "n_chars"))),

    // --- rendezvous-hash resharding plan: HRW argmax per doc under 8 and
    //     9 shards; `moved` rows are the migration's exact byte bill
    //     (expected 1/9 — vs mod-hash's 8/9) -----------------------------
    "q190_rendezvous_shards" -> ((s, dir) =>
      Sampling.rendezvousShards(
        T(s, dir, "documents").select(col("doc_id")), "doc_id",
        nOld = 8, nNew = 9)),

    // --- frame-energy VAD over real WAV blobs: 16-sample frames, exact
    //     integer energies, voiced-run segmentation — the speech triage
    //     stats (q64's decode path, frame-level) ------------------------
    "q191_audio_vad" -> ((s, dir) => {
      val ids = T(s, dir, "documents").where(col("doc_id") < 100)
        .select(col("doc_id"))
      Multimodal.audioVadStats(
        Multimodal.synthesizeMedia(ids, "doc_id"), "doc_id", "audio",
        frameLen = 16, energyThreshold = 500000000L)
    }),

    // --- first-/last-touch conversion attribution: purchase cents credited
    //     to the first and last preceding non-purchase touch per user
    //     timeline; integer cents — exact in any accumulation order ------
    "q192_touch_attribution" -> ((s, dir) =>
      graft.ops.EventOps.touchAttribution(
        events(s, dir).withColumn("cents",
          round(col("value") * 100.0, 0).cast("long")),
        "user_id", "ts", "event_id", "event_type", "cents",
        conversionType = "purchase")),

    // --- MMR diversified top-5 around query vector 0: greedy argmax of
    //     700·rel − 300·maxsim in division-free integer permille-nano —
    //     relevance with a redundancy penalty, every round replayable ----
    "q193_mmr_select" -> ((s, dir) =>
      Similarity.mmrSelect(T(s, dir, "embeddings"), "vec_id", "embedding",
        queryId = 0L, k = 5, lambdaPermille = 700)),

    // --- local clustering coefficients over the click graph: triangles ÷
    //     wedges per node in integer nano — the transitivity audit whose
    //     near-zero hubs are the false-positive glue nodes ---------------
    "q194_clustering_coeff" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("page",
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long"))
      graft.ops.Graph.clusteringCoefficients(
        graft.ops.Graph.transitionEdges(ev, "user_id", "ts", "event_id",
          "page"))
    }),

    // --- MAD robust outlier gate on per-source token counts: lower-median
    //     and MAD are values FROM the data (50% breakdown), flag at
    //     |x − med| > 3·mad — all integer, replayable ---------------------
    "q195_mad_outliers" -> ((s, dir) =>
      graft.ops.Audit.madOutliers(
        T(s, dir, "documents").select(col("doc_id"), col("source"),
          token_count(col("text")).cast("long").as("n_tokens")),
        "doc_id", "source", "n_tokens", k = 3)),

    // --- q187's conformal gate ENFORCED at ingest: threshold collected
    //     once from the batch calibration side, applied as a literal on a
    //     stateless stream — calibrated admission at scan bandwidth ------
    "q196_stream_conformal" -> ((s, dir) => {
      val nc = (c: Column) =>
        lit(1000L) - floor(TextOps.qualityScore(c) * 1000).cast("long")
      val calib = T(s, dir, "documents")
        .where(Sampling.hashBucket(col("doc_id"), 100) < 50)
        .select(col("doc_id"), nc(col("text")).as("nonconformity"))
      val replay = graft.streaming.Streaming.docsReplay(s, dir, 4)
        .where(Sampling.hashBucket(col("doc_id"), 100) >= 50)
        .select(col("doc_id"), nc(col("text")).as("nonconformity"))
      val admits = graft.streaming.Streaming.conformalAdmitStream(
        replay, calib, "doc_id", "nonconformity", alphaPermille = 100)
      graft.streaming.Streaming.runToTable(
        admits,
        "q196_mem_" + java.util.UUID.randomUUID().toString.replace("-", ""),
        mode = org.apache.spark.sql.streaming.OutputMode.Append(),
        statePartitions = Some(4), noDataBatch = false)
    }),

    // --- top click-paths of length 3: two leads in one user-partitioned
    //     window, exact counts, total-order tie-break ---------------------
    "q197_path_trigrams" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("page",
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long"))
      graft.ops.EventOps.pathTrigrams(ev, "user_id", "ts", "event_id",
        "page", topK = 20)
    }),

    // --- nearest-control matching on token count within source (en docs
    //     vs the rest): adjacent-in-sort candidates, ties to the earlier —
    //     with-replacement, order-free, replayable ------------------------
    "q198_matched_controls" -> ((s, dir) =>
      Sampling.matchedControls(
        T(s, dir, "documents").select(col("doc_id"), col("source"),
          token_count(col("text")).cast("long").as("n_tokens"),
          (col("lang") === "en").as("treated")),
        "doc_id", "source", "n_tokens", "treated")),

    // --- per-query MRR / recall@10 over three BM25 runs: binary qrels =
    //     any-term match; integer reciprocal ranks and permilles ---------
    "q199_retrieval_metrics" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = T(s, dir, "documents")
      val qs = Seq(1 -> Seq("spark", "window", "merge"),
        2 -> Seq("table", "scan"), 3 -> Seq("slow", "fast", "key"))
      val results = qs.map { case (qid, terms) =>
        TextOps.bm25TopK(docs, "doc_id", "text", terms, 10)
          .select(lit(qid).as("query_id"), col("doc_id"),
            row_number().over(Window.orderBy(col("score").desc,
              col("doc_id"))).cast("long").as("rank"))
      }.reduce(_.unionByName(_))
      val qrels = qs.map { case (qid, terms) =>
        docs.where(arrays_overlap(tokens(lower(col("text"))),
            array(terms.map(lit): _*)))
          .select(lit(qid).as("query_id"), col("doc_id"))
      }.reduce(_.unionByName(_))
      Similarity.retrievalMetrics(results, qrels, k = 10)
    }),

    // --- exact ROC-AUC per source: does the quality score rank long docs
    //     above short ones? Mann–Whitney U with doubled midranks — every
    //     step integer, undefined groups report null ---------------------
    "q200_auc_report" -> ((s, dir) =>
      graft.ops.Audit.aucReport(
        T(s, dir, "documents").select(col("source"),
          floor(TextOps.qualityScore(col("text")) * 1000).cast("long")
            .as("q"),
          (col("n_chars") > 300).as("label")),
        "source", "q", "label")),

    // --- conversion-window funnel: view → click → purchase with the whole
    //     journey bound to 1 day of the user's first view -----------------
    "q201_funnel_window" -> ((s, dir) =>
      graft.ops.EventOps.funnelWithin(events(s, dir), "user_id",
        "event_type", "ts", Seq("view", "click", "purchase"),
        windowSeconds = 86400L)),

    // --- scene-change detection on real GVID blobs: adjacent-frame pixel
    //     L1 diffs, exact integers, cuts at ≥2500 -------------------------
    "q202_video_cuts" -> ((s, dir) => {
      val ids = T(s, dir, "documents").where(col("doc_id") < 100)
        .select(col("doc_id"))
      Multimodal.videoSceneCuts(
        Multimodal.synthesizeVideo(ids, "doc_id"), "doc_id", "video",
        threshold = 2500L)
    }),

    // --- size-balanced sharding plan: LPT-style round-robin on the
    //     token-weight descending total order (globalRank, no global
    //     sort); per-shard loads land within one max-weight of average ---
    "q203_balanced_shards" -> ((s, dir) =>
      Sampling.balancedShards(
        T(s, dir, "documents").select(col("doc_id"),
          token_count(col("text")).cast("long").as("n_tokens")),
        "doc_id", "n_tokens", k = 8)),

    // --- incremental cluster maintenance: yesterday's assignment (its
    //     (id, rep) rows ARE connectivity-preserving edges) merges with a
    //     delta pair batch — identical clusters to a full re-run ----------
    "q204_cluster_merge" -> ((s, dir) => {
      val fp = T(s, dir, "documents").select(col("doc_id"),
        md5(substring(col("text"), 1, 40).cast("binary")).as("fp"))
      val pairs = fp.as("a").join(fp.as("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      val isOld = (c: Column) => Sampling.hashBucket(c, 100) < 50
      val oldPairs = pairs.where(isOld(col("id_a")) && isOld(col("id_b")))
      val delta = pairs.where(!(isOld(col("id_a")) && isOld(col("id_b"))))
      val assign = graft.ops.Dedup.clusterDuplicates(oldPairs)
      graft.ops.Dedup.mergeClusterAssignments(assign, delta)
    }),

    // --- CUSUM changepoint alarms on daily per-type volumes: sustained
    //     drift the single-day sigma test misses; cumsum − running min,
    //     all ×n integer units ------------------------------------------
    "q205_cusum_alarms" -> ((s, dir) =>
      graft.ops.EventOps.cusumAlarms(events(s, dir), "ts", "event_type",
        meanDays = 3)),

    // --- stratified 5-fold assignment: md5-shuffled rank mod k within
    //     each language — exact per-stratum balance, run-stable ----------
    "q206_stratified_folds" -> ((s, dir) =>
      Sampling.stratifiedFolds(T(s, dir, "documents"), "doc_id", "lang",
        k = 5)),

    // --- shared-prefix cache savings: docs grouped by first-5-token
    //     prefix; (n−1)·prefix_tokens prefill tokens saved per group -----
    "q207_prefix_cache" -> ((s, dir) =>
      TextOps.prefixCacheSavings(T(s, dir, "documents"), "doc_id", "text",
        k = 5)),

    // --- trailing-7-day distinct users per day: per-day HLL register
    //     tables merged register-wise across the window — the mergeability
    //     exact distinct doesn't have; q37's integer arithmetic ----------
    "q208_rolling_distinct" -> ((s, dir) =>
      graft.ops.EventOps.rollingDistinct(events(s, dir), "ts", "user_id",
        windowDays = 7)),

    // --- join-explosion preflight for the events×events self-join: per
    //     user-key exact output products, topK heaviest + share ----------
    "q209_join_preflight" -> ((s, dir) => {
      val ev = events(s, dir)
      graft.ops.Audit.joinExplosionReport(ev, "user_id", ev, "user_id",
        topK = 10)
    }),

    // --- IVF index health on the md5-seed layout (iters=0 ⇒ the seed
    //     vectors ARE the centroids — SQL-replayable assignment): per-cell
    //     occupancy incl. empty cells, exact permille shares -------------
    "q210_ivf_health" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding",
        k = 8, iters = 0)
      Similarity.ivfIndexHealth(emb, "vec_id", "embedding", cents)
    }),

    // --- LAION-style image-caption joint gate: REAL PNG decode (dims from
    //     the payload, not metadata) × caption token count × integer
    //     cross-multiplied aspect-ratio bound ---------------------------
    "q211_caption_gate" -> ((s, dir) => {
      val docs = T(s, dir, "documents").where(col("doc_id") < 200)
      val media = Multimodal.synthesizeMedia(
        docs.select(col("doc_id")), "doc_id")
      Multimodal.decodeImageStats(media, "doc_id", "image")
        .join(docs.select(col("doc_id"),
          token_count(col("text")).cast("long").as("n_tokens")), "doc_id")
        .select(col("doc_id"), col("width"), col("height"), col("n_tokens"),
          (col("n_tokens").between(5, 100) &&
            col("width") <= col("height") * 2 &&
            col("height") <= col("width") * 2).as("keep"))
    }),

    // --- provenance rollup over the q204 dup clusters: per representative,
    //     member count and the canonical sorted source list — the
    //     compliance record dedup must not destroy ------------------------
    "q212_cluster_provenance" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val fp = docs.select(col("doc_id"),
        md5(substring(col("text"), 1, 40).cast("binary")).as("fp"))
      val pairs = fp.as("a").join(fp.as("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      graft.ops.Dedup.clusterProvenance(
        graft.ops.Dedup.clusterDuplicates(pairs), docs, "doc_id", "source")
    }),

    // --- q198's matching in the giant-stratum shape: one population,
    //     globalRunningLast boundary-stitched carries (two range shuffles,
    //     partition-width parallelism) — identical pick semantics --------
    "q213_matched_global" -> ((s, dir) =>
      Sampling.matchedControlsGlobal(
        T(s, dir, "documents").select(col("doc_id"),
          token_count(col("text")).cast("long").as("n_tokens"),
          (col("lang") === "en").as("treated")),
        "doc_id", "n_tokens", "treated")),

    // --- dedup impact per source: what keep-first over the q204 clusters
    //     COSTS each source — docs and exact tokens dropped, integer
    //     permille; the report a mixing plan is re-balanced from ---------
    "q214_dedup_impact" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val fp = docs.select(col("doc_id"),
        md5(substring(col("text"), 1, 40).cast("binary")).as("fp"))
      val pairs = fp.as("a").join(fp.as("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      graft.ops.Dedup.dedupImpact(
        docs.withColumn("t", token_count(col("text")).cast("long")),
        "doc_id", "source", "t", pairs)
    }),

    // --- persisted pair-table reuse: the n-gram-Jaccard pair mine runs
    //     ONCE (writePairs at the 0.2 domain floor), then keep-best dedup
    //     reads the parquet evidence back at 0.8 — bit-identical to the
    //     inline mine (oracle = q165's exact SQL), at O(1) shingle passes
    //     per report cycle instead of O(reports) ---------------------------
    "q215_pair_reuse" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val path = sys.props("java.io.tmpdir") + "/graft_q215_pairs_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      Dedup.writePairs(docs, "doc_id", "text", path,
        shingleSize = 3, minJaccard = 0.2, maxDf = Some(1000))
      val pairs = Dedup.readPairs(s, path, threshold = 0.8)
      val scored = docs.select(col("doc_id"), col("lang"),
        TextOps.qualityScore(col("text")).as("q"))
      Dedup.removeDuplicatesKeepBest(scored, "doc_id", pairs, "q")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
    }),

    // --- incremental IVF append: base corpus written with trained
    //     centroids, a NEW batch (carrying 5 planted exact copies of the
    //     query vector) routed through the SAME pinned centroids with
    //     mode(append) — the probe reads old + new through one
    //     partition-pruned scan and must surface exactly the planted
    //     ground truth ----------------------------------------------------
    "q216_ivf_append" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val q = emb.where(col("vec_id") === 7).select(col("embedding"))
        .head().getSeq[Float](0)
      val planted = emb.where(col("vec_id") === 7)
        .select(explode(sequence(lit(0), lit(4))).as("i"), col("embedding"))
        .select((col("i") + 9400L).as("vec_id"), col("embedding"))
      val base = emb.where(col("vec_id") =!= 7 && col("vec_id") % 10 =!= 3)
      val newBatch = emb.where(col("vec_id") =!= 7 && col("vec_id") % 10 === 3)
        .unionByName(planted)
      // centroids train on the BASE only — the append-time reality: new
      // data routes through pinned centroids, never retrains them
      val cents = Similarity.ivfCentroids(base, "vec_id", "embedding", k = 8)
      val path = sys.props("java.io.tmpdir") + "/graft_q216_ivf_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      Similarity.writeIvfCorpus(base, "vec_id", "embedding", path, cents)
      Similarity.appendIvfCorpus(newBatch, "vec_id", "embedding", path, cents,
        batchId = Some("day-1"))
      // the blind crash-retry: the commit tag makes it an exact no-op (a
      // double-append would put duplicate planted ids in the top-5)
      Similarity.appendIvfCorpus(newBatch, "vec_id", "embedding", path, cents,
        batchId = Some("day-1"))
      // full lifecycle: compact the appended cell dirs before probing —
      // the probe must be oblivious to when compaction ran (same oracle)
      Similarity.compactIvfCorpus(s, path, targetFiles = 1): Unit
      Similarity.ivfTopKFromPartitioned(s, path, "vec_id", "embedding",
          q, 5, cents, nProbe = 2)
        .select(col("vec_id"), round(col("cos"), 4).as("cos"))
    }),

    // --- persisted BM25 index with incremental append: postings append
    //     under the pure-md5 term bucketing, the one-row stats sidecar
    //     merges additively, per-term df recomputes at query time — the
    //     probe over build-half + append-half must equal the from-scratch
    //     direct scan (oracle = q90's SQL verbatim) ------------------------
    "q217_bm25_append" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val path = sys.props("java.io.tmpdir") + "/graft_q217_bm25_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      TextOps.writeBm25Index(docs.where(col("doc_id") % 2 === 0),
        "doc_id", "text", path)
      TextOps.appendBm25Index(docs.where(col("doc_id") % 2 =!= 0),
        "doc_id", "text", path, batchId = Some("day-1"))
      // the blind crash-retry: commit tags no-op both appends, the stats
      // sidecar re-derives from membership (doubled postings would shift
      // every df and idf in the probe)
      TextOps.appendBm25Index(docs.where(col("doc_id") % 2 =!= 0),
        "doc_id", "text", path, batchId = Some("day-1"))
      // full lifecycle: compact the appended posting buckets before the
      // probe — scores must be oblivious to when compaction ran
      TextOps.compactBm25Index(s, path, targetFiles = 1): Unit
      TextOps.bm25TopKFromIndex(s, path, Seq("spark", "window", "merge"), 15)
        .withColumnRenamed("id", "doc_id")
    }),

    // --- embedding-distribution drift between two snapshots: per-dim
    //     integer micro-unit means (decimal-accumulated), nano mean shift —
    //     the retrain gate for the IVF/PQ layouts ------------------------
    "q218_embedding_drift" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      Similarity.embeddingDrift(
        emb.where(col("vec_id") % 2 === 0),
        emb.where(col("vec_id") % 2 === 1), "embedding")
    }),

    // --- the COMPLETE daily-crawl ingest loop: index the corpus once;
    //     day 1 (src0) dedups against it and its SURVIVORS append into
    //     the index (bands + index-pruned keyed upsert); day 2 (src1)
    //     then dedups against corpus ∪ day-1 survivors. Oracle = the
    //     exact two-stage cross-corpus rule --------------------------------
    "q221_ingest_loop" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val path = sys.props("java.io.tmpdir") + "/graft_q221_idx_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      Dedup.writeNearDupIndex(
        docs.where(col("source") =!= "src0" && col("source") =!= "src1"),
        "doc_id", "text", path)
      // day 1 runs the FUSED step (one shingle pass dedups AND appends
      // the survivors); day 2 is a plain probe of the grown index
      Dedup.ingestBatch(s,
        docs.where(col("source") === "src0"), path, "doc_id", "text")
      Dedup.dedupeAgainstIndex(s,
          docs.where(col("source") === "src1"), path, "doc_id", "text")
        .select(col("doc_id"), col("lang"))
    }),

    // --- deterministic streaming k-sample: the k smallest md5 priorities
    //     over the whole replay — a pure function of the id set (no RNG,
    //     no arrival-order dependence); per-shard bounded state, Update-
    //     mode membership emissions, latest-version gate ------------------
    "q220_stream_reservoir" -> ((s, dir) => {
      val replay = graft.streaming.Streaming.docsReplay(s, dir, 4)
      val res = graft.streaming.Streaming.reservoirSampleStream(
        replay, "doc_id", k = 50, shards = 8)
      val sink = graft.streaming.Streaming.runToTable(
        res.toDF(),
        "q220_mem_" + java.util.UUID.randomUUID().toString.replace("-", ""),
        mode = org.apache.spark.sql.streaming.OutputMode.Update(),
        statePartitions = Some(4), noDataBatch = false)
      // finite-stream gate: each shard's LATEST membership, then the
      // global k smallest (priority, id) — shards×k×batches rows, tiny
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("shard"))
      sink.withColumn("__maxv", max(col("version")).over(w))
        .where(col("version") === col("__maxv"))
        .orderBy(col("priority"), col("id"))
        .limit(50)
        .select(col("id").as("doc_id"), col("priority"))
    }),

    // --- incremental pair-table append: the old half's pairs + postings
    //     persist once; the new half mines only new×new and new×old pairs
    //     against the stored 8-byte postings (old text never re-read, old
    //     pairs never re-mined), then COMPACTED (write → append → compact,
    //     the full lifecycle), with the PRODUCTION maxDf stop-shingle cap
    //     active (round-15 fix: the bench must exercise the capped plan a
    //     100 TB deployment runs; at this corpus max shingle df is 25, so
    //     the cap provably drops nothing and increment ≡ scratch exactly —
    //     the uncapped oracle stays verbatim) ---------------------------
    "q219_pair_append" -> ((s, dir) => {
      val docs = T(s, dir, "documents").where(col("doc_id") % 4 <= 1)
      val path = sys.props("java.io.tmpdir") + "/graft_q219_pairs_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      Dedup.writePairs(docs.where(col("doc_id") % 4 === 0), "doc_id", "text",
        path, shingleSize = 3, minJaccard = 0.2, maxDf = Some(1000))
      Dedup.appendPairs(docs.where(col("doc_id") % 4 === 1), "doc_id", "text",
        path, shingleSize = 3, minJaccard = 0.2, maxDf = Some(1000),
        batchId = Some("day-1"))
      // the blind crash-retry a production loop will eventually do: the
      // per-table commit tags make it an exact no-op (a skipped FIRST
      // append or a re-mined double-append would both break the oracle)
      Dedup.appendPairs(docs.where(col("doc_id") % 4 === 1), "doc_id", "text",
        path, shingleSize = 3, minJaccard = 0.2, maxDf = Some(1000),
        batchId = Some("day-1"))
      // compact the appended layout before reading: the report must be
      // oblivious to when compaction ran (same oracle either way)
      Dedup.compactPairs(s, path, targetFiles = 4)
      val scored = docs.select(col("doc_id"), col("lang"),
        TextOps.qualityScore(col("text")).as("q"))
      // capped==uncapped exactness check (round-16 advisory): every capped
      // mine's oracle is UNCAPPED SQL, valid only while no shingle's df
      // reaches the cap. Measure the FULL corpus's max shingle df (a
      // superset of every %4-slice corpus the pair queries mine) and ride
      // the verdict: at a larger SF where the assumption breaks, this
      // column flips false against the oracle's literal true — a named
      // diagnostic instead of a confusing hash mismatch.
      val maxDf = Dedup.hashedShingles(T(s, dir, "documents"),
          "doc_id", "text", 3)
        .select(explode(col("th")).as("sh"))
        .groupBy(col("sh")).agg(count(lit(1)).as("df"))
        .agg(coalesce(max(col("df")), lit(0L))).head().getLong(0)
      import s.implicits._
      Dedup.removeDuplicatesKeepBest(scored, "doc_id",
          Dedup.readPairs(s, path, threshold = 0.8), "q")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
        .crossJoin(broadcast(Seq(maxDf <= 1000L).toDF("df_cap_ok")))
    }),

    // --- the ingest loop WITH its compaction step: index the corpus, run
    //     the day-1 fused ingest, COMPACT the band table (manifest swap +
    //     keyed-store minor compaction) mid-loop, then run the day-2
    //     probe over the compacted layout — drops must equal the exact
    //     two-stage rule regardless of when compaction ran (oracle =
    //     q221's SQL verbatim) ------------------------------------------
    "q222_ingest_compact" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val path = sys.props("java.io.tmpdir") + "/graft_q222_idx_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      Dedup.writeNearDupIndex(
        docs.where(col("source") =!= "src0" && col("source") =!= "src1"),
        "doc_id", "text", path)
      Dedup.ingestBatch(s,
        docs.where(col("source") === "src0"), path, "doc_id", "text")
      Dedup.compactNearDupIndex(s, path, targetFiles = 4)
      Dedup.dedupeAgainstIndex(s,
          docs.where(col("source") === "src1"), path, "doc_id", "text")
        .select(col("doc_id"), col("lang"))
    }),

    // --- deletion from the near-dup index (the takedown/opt-out verb):
    //     index the corpus, remove one wave of docs and COMPACT (physical
    //     band purge + tombstone clear), remove a second wave left as
    //     LIVE tombstones, then probe — near-copies of removed docs must
    //     survive, copies of still-indexed docs must drop, through both
    //     deletion mechanisms at once -----------------------------------
    "q223_index_delete" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val path = sys.props("java.io.tmpdir") + "/graft_q223_idx_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      val corpus = docs.where(col("source") =!= "src0")
      Dedup.writeNearDupIndex(corpus, "doc_id", "text", path)
      // wave 1: tombstone + keyed delete, then physically purged by the
      // compaction; wave 2 stays as live tombstones at probe time. The
      // residue classes are chosen so deletion CHANGES the drop set (a
      // planted near-dup's corpus veto dies: id 332 at sf0.01 via wave 1,
      // id 391 at sf0.001 via wave 2) while other vetoes stay intact —
      // an oracle a no-op deletion cannot pass.
      Dedup.removeFromNearDupIndex(s, path,
        corpus.where(col("doc_id") % 100 === 32).select(col("doc_id")))
      Dedup.compactNearDupIndex(s, path, targetFiles = 4)
      Dedup.removeFromNearDupIndex(s, path,
        corpus.where(col("doc_id") % 100 === 91).select(col("doc_id")))
      Dedup.dedupeAgainstIndex(s, docs.where(col("source") === "src0"),
          path, "doc_id", "text")
        .select(col("doc_id"), col("lang"))
    }),

    // --- pair-table retention: mine the full 0.2-floor pair table once,
    //     PRUNE it to a 0.5 floor (irreversible rewrite through the
    //     manifest swap), then serve the threshold curve from the pruned
    //     evidence — deciles at or above the new floor must match the
    //     fresh full-table curve exactly --------------------------------
    "q224_pair_retention" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val path = sys.props("java.io.tmpdir") + "/graft_q224_pairs_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      Dedup.writePairs(docs, "doc_id", "text", path,
        shingleSize = 3, minJaccard = 0.2, maxDf = Some(1000))
      Dedup.prunePairs(s, path, newMinJaccard = 0.5)
      Dedup.thresholdCurveFromPairs(Dedup.readPairs(s, path, threshold = 0.5))
        .where(col("threshold_permille") >= 500)
    }),

    // --- takedown on the SEARCH index: build over the full corpus, delete
    //     a residue class (ghost postings purged per bucket, stats
    //     decremented exactly from the docs membership sidecar — deleting
    //     ANY doc moves N and so every idf), probe must equal a
    //     from-scratch index of the survivors (oracle = q90's SQL over the
    //     surviving corpus) ------------------------------------------------
    "q225_bm25_delete" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val path = sys.props("java.io.tmpdir") + "/graft_q225_bm25_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      TextOps.writeBm25Index(docs, "doc_id", "text", path)
      TextOps.removeFromBm25Index(s, path,
        docs.where(col("doc_id") % 7 === 3).select(col("doc_id")))
      TextOps.bm25TopKFromIndex(s, path, Seq("spark", "window", "merge"), 15)
        .withColumnRenamed("id", "doc_id")
    }),

    // --- takedown on the ANN index: plant SEVEN exact copies of the query
    //     vector, delete four, probe top-3 — exactly the three surviving
    //     planted ids must surface (cos 1.0 at the 4-decimal grid), the
    //     deleted ghosts must not --------------------------------------
    "q226_ivf_delete" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val q = emb.where(col("vec_id") === 7).select(col("embedding"))
        .head().getSeq[Float](0)
      val planted = emb.where(col("vec_id") === 7)
        .select(explode(sequence(lit(0), lit(6))).as("i"), col("embedding"))
        .select((col("i") + 9500L).as("vec_id"), col("embedding"))
      val base = emb.where(col("vec_id") =!= 7)
      val cents = Similarity.ivfCentroids(base, "vec_id", "embedding", k = 8)
      val path = sys.props("java.io.tmpdir") + "/graft_q226_ivf_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      Similarity.writeIvfCorpus(base.unionByName(planted), "vec_id",
        "embedding", path, cents)
      Similarity.removeFromIvfCorpus(s, path,
        s.range(4).select((col("id") * 2 + 9500L).as("vec_id")),
        idCol = "vec_id")
      Similarity.ivfTopKFromPartitioned(s, path, "vec_id", "embedding",
          q, 3, cents, nProbe = 2)
        .select(col("vec_id"), round(col("cos"), 4).as("cos"))
    }),

    // --- takedown on the pair table: UNCAPPED mine over the half corpus,
    //     delete a residue class (pairs naming a ghost on either side
    //     drop, ghost postings purge), keep-best over the survivors must
    //     hash-match a from-scratch mine of the surviving corpus (pair
    //     evidence is pairwise, so the rewrite ≡ scratch exactly; maxDf
    //     cap active and unreachable at this corpus, oracle verbatim) ---
    "q227_pair_delete" -> ((s, dir) => {
      val docs = T(s, dir, "documents").where(col("doc_id") % 4 <= 1)
      val path = sys.props("java.io.tmpdir") + "/graft_q227_pairs_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      Dedup.writePairs(docs, "doc_id", "text", path,
        shingleSize = 3, minJaccard = 0.2, maxDf = Some(1000))
      Dedup.removeFromPairs(s, path,
        docs.where(col("doc_id") % 8 === 1).select(col("doc_id")))
      val survivors = docs.where(col("doc_id") % 8 =!= 1)
      val scored = survivors.select(col("doc_id"), col("lang"),
        TextOps.qualityScore(col("text")).as("q"))
      Dedup.removeDuplicatesKeepBest(scored, "doc_id",
          Dedup.readPairs(s, path, threshold = 0.8), "q")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
    }),

    // --- idempotent ingest: the day-1 fused ingest carries a batchId (a
    //     ManifestTable commit tag); a BLIND re-run of the whole step —
    //     the crash-retry a production loop will eventually do — must be
    //     an exact no-op. The replayed survivors join their band-row
    //     counts: 32 per survivor (64 would betray a double-append, 0 a
    //     wrongly-skipped first run, and a non-short-circuited retry
    //     would self-match every survivor and return nothing) -----------
    "q228_ingest_retry" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val path = sys.props("java.io.tmpdir") + "/graft_q228_idx_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      Dedup.writeNearDupIndex(
        docs.where(col("source") =!= "src0" && col("source") =!= "src1"),
        "doc_id", "text", path)
      val day1 = docs.where(col("source") === "src0")
      Dedup.ingestBatch(s, day1, path, "doc_id", "text",
        batchId = Some("day-1")): Unit
      // the blind retry: tag short-circuits, survivors replay as members
      val replay = Dedup.ingestBatch(s, day1, path, "doc_id", "text",
        batchId = Some("day-1"))
      val counts = graft.store.ManifestTable.read(s, path + "/bands")
        .groupBy(col("id")).agg(count(lit(1)).as("band_rows"))
        .withColumnRenamed("id", "doc_id")
      replay.select(col("doc_id"), col("lang")).join(counts, Seq("doc_id"))
    }),

    // --- index fsck: manufacture every inconsistency class a crashed or
    //     blindly-retried maintenance op can leave (orphan band rows,
    //     members with no band rows, duplicate band rows), repair — bands
    //     rebuild deterministically from the authoritative docs store, no
    //     text re-read — then probe. The report counts ride along as
    //     constant columns; the regenerated members' vetoes are the
    //     probe-visible proof the rebuild actually happened --------------
    "q229_index_repair" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val path = sys.props("java.io.tmpdir") + "/graft_q229_idx_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      val src0 = docs.where(col("source") === "src0")
      Dedup.writeNearDupIndex(
        docs.where(col("source") =!= "src0" && col("source") =!= "src1"),
        "doc_id", "text", path)
      Dedup.appendNearDupIndex(src0, "doc_id", "text", path)
      // orphans: docs entries deleted outside the takedown verb
      graft.store.KeyedStore.deleteIndexed(s, path + "/docs",
        src0.where(col("doc_id") % 10 === 3).select(col("doc_id").as("key")))
      // duplicates: a blind untagged re-append
      Dedup.appendNearDupIndex(src0.where(col("doc_id") % 10 === 5),
        "doc_id", "text", path)
      // missing: members whose bands never landed (docs-first crash window)
      graft.store.KeyedStore.upsertIndexed(s, path + "/docs",
        Dedup.hashedShingles(
          docs.where(col("source") === "src1" && col("doc_id") % 10 === 7),
          "doc_id", "text", 3).select(col("id").as("key"), col("th")))
      val report = Dedup.repairNearDupIndex(s, path)
      Dedup.dedupeAgainstIndex(s,
          docs.where(col("source") === "src1" && col("doc_id") % 10 =!= 7),
          path, "doc_id", "text")
        .select(col("doc_id"), col("lang"))
        .crossJoin(broadcast(report))
    }),

    // --- exactly-once STREAMING ingest: micro-batches dedupe against the
    //     index and fold survivors in, each tagged with its epoch id; the
    //     WHOLE stream then re-runs from a fresh checkpoint — replaying
    //     epochs 0..n under the same tags, the failure-recovery path
    //     foreachBatch contracts for — and must be an exact no-op. Every
    //     member carries exactly 32 band rows (the q228 audit): a replayed
    //     epoch that re-appended would read 64, one that re-ran the drop
    //     rule would self-match its survivors out of membership ----------
    "q230_stream_exactly_once" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val path = sys.props("java.io.tmpdir") + "/graft_q230_idx_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      Dedup.writeNearDupIndex(
        docs.where(col("source") =!= "src0" && col("source") =!= "src1"),
        "doc_id", "text", path)
      def run(): Unit = graft.streaming.Streaming.ingestIntoNearDupIndex(
        graft.streaming.Streaming.docsReplay(s, dir, 2)
          .where(col("source") === "src0" || col("source") === "src1")
          .select(col("doc_id"), col("text")),
        path, "doc_id", "text").awaitTermination()
      run()
      run() // full replay, same epoch tags: every batch short-circuits
      val counts = graft.store.ManifestTable.read(s, path + "/bands")
        .groupBy(col("id")).agg(count(lit(1)).as("band_rows"))
        .withColumnRenamed("id", "doc_id")
      docs.where(col("source") === "src0" || col("source") === "src1")
        .join(counts, Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("band_rows"))
    }),

    // --- SRP ANN layout FULL lifecycle (round 12): write → append →
    //     COMPACT → append (planted exact copies) → COMPACT again. After
    //     the second rewrite every touched bucket leaf holds TWO live
    //     generations (keep-one-back retention); the probe resolves each
    //     leaf's live generation by path selection and must surface
    //     exactly the planted copies — a partitioned-root scan would read
    //     both generations and duplicate every surviving row -------------
    "q231_srp_lifecycle" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val q = emb.where(col("vec_id") === 7).select(col("embedding"))
        .head().getSeq[Float](0)
      val planted = emb.where(col("vec_id") === 7)
        .select(explode(sequence(lit(0), lit(4))).as("i"), col("embedding"))
        .select((col("i") + 9500L).as("vec_id"), col("embedding"))
      val base = emb.where(col("vec_id") =!= 7 && col("vec_id") % 20 =!= 3 &&
        col("vec_id") % 20 =!= 9)
      val day1 = emb.where(col("vec_id") =!= 7 && col("vec_id") % 20 === 3)
      val day2 = emb.where(col("vec_id") =!= 7 && col("vec_id") % 20 === 9)
        .unionByName(planted)
      val path = sys.props("java.io.tmpdir") + "/graft_q231_srp_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      Similarity.writeBucketedCorpus(base, "vec_id", "embedding", path,
        nBits = 5)
      Similarity.appendBucketedCorpus(day1, "vec_id", "embedding", path,
        nBits = 5)
      Similarity.compactBucketedCorpus(s, path, targetFiles = 1): Unit
      Similarity.appendBucketedCorpus(day2, "vec_id", "embedding", path,
        nBits = 5)
      Similarity.compactBucketedCorpus(s, path, targetFiles = 1): Unit
      Similarity.annTopKFromBucketed(s, path, "vec_id", "embedding", q, 5,
          nBits = 5)
        .select(col("vec_id"), round(col("cos"), 4).as("cos"))
    }),

    // --- BM25 index DAILY loop (round 12): write → (append → compact →
    //     VACUUM) ×2 → probe. The second compaction of a bucket leaf
    //     leaves two generations coexisting — the state the round-11
    //     root-scan reader double-counted every posting in (df, tf and
    //     every idf wrong) — and the drain-rule vacuum then GCs the
    //     retired generation with no data rewrite; neither may move a
    //     score. Probe must hash-match the from-scratch direct scan:
    //     oracle = q90's SQL verbatim ------------------------------------
    "q232_bm25_daily_loop" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val path = sys.props("java.io.tmpdir") + "/graft_q232_bm25_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      TextOps.writeBm25Index(docs.where(col("doc_id") % 4 === 0),
        "doc_id", "text", path)
      def day(batch: org.apache.spark.sql.DataFrame): Unit = {
        TextOps.appendBm25Index(batch, "doc_id", "text", path)
        TextOps.compactBm25Index(s, path, targetFiles = 1): Unit
        graft.store.Compaction.vacuumPartitions(s, path + "/postings",
          keepPrevious = false): Unit
      }
      day(docs.where(col("doc_id") % 4 === 1))
      day(docs.where(col("doc_id") % 4 === 2 || col("doc_id") % 4 === 3))
      TextOps.bm25TopKFromIndex(s, path, Seq("spark", "window", "merge"), 15)
        .withColumnRenamed("id", "doc_id")
    }),

    // --- exactly-once STREAMING ingest into the BM25 search index: the
    //     src0/src1 half arrives as a two-epoch stream, each micro-batch
    //     appended under its epoch tag; the WHOLE stream re-runs from a
    //     fresh checkpoint (every epoch replays under its original tag —
    //     must be an exact no-op: a re-appended epoch doubles df/tf and
    //     shifts every idf). Probe = q90's from-scratch SQL verbatim ------
    "q233_stream_bm25_ingest" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val path = sys.props("java.io.tmpdir") + "/graft_q233_bm25_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      TextOps.writeBm25Index(
        docs.where(col("source") =!= "src0" && col("source") =!= "src1"),
        "doc_id", "text", path)
      def run(): Unit = graft.streaming.Streaming.ingestIntoBm25Index(
        graft.streaming.Streaming.docsReplay(s, dir, 2)
          .where(col("source") === "src0" || col("source") === "src1")
          .select(col("doc_id"), col("text")),
        path, "doc_id", "text").awaitTermination()
      run()
      run() // full replay, same epoch tags: every batch short-circuits
      TextOps.bm25TopKFromIndex(s, path, Seq("spark", "window", "merge"), 15)
        .withColumnRenamed("id", "doc_id")
    }),

    // --- exactly-once STREAMING ingest into the IVF ANN layout: odd
    //     vec_ids arrive as a two-epoch stream routed through the PINNED
    //     centroids, each micro-batch a tagged partitioned append; the
    //     stream re-runs from a fresh checkpoint and must no-op. Audit =
    //     q228's pattern on the layout: every corpus vector appears in
    //     exactly ONE cell row (2 betrays a replayed append, 0 a skipped
    //     epoch) ----------------------------------------------------------
    "q234_stream_ivf_ingest" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
        .where(col("embedding").isNotNull)
        .select(col("vec_id"), col("embedding"))
      val base = emb.where(col("vec_id") % 2 === 0)
      val cents = Similarity.ivfCentroids(base, "vec_id", "embedding", k = 8)
      val path = sys.props("java.io.tmpdir") + "/graft_q234_ivf_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      Similarity.writeIvfCorpus(base, "vec_id", "embedding", path, cents)
      def run(): Unit = graft.streaming.Streaming.ingestIntoIvfCorpus(
        graft.streaming.Streaming.tableReplay(s, dir, "embeddings",
            "vec_id", 2)
          .where(col("embedding").isNotNull && col("vec_id") % 2 === 1)
          .select(col("vec_id"), col("embedding")),
        path, "vec_id", "embedding", cents).awaitTermination()
      run()
      run() // full replay, same epoch tags: every batch short-circuits
      graft.store.Compaction.readPartitioned(s, path, "cell").get
        .groupBy(col("vec_id")).agg(count(lit(1)).as("n_copies"))
    }),

    // --- blue/green IVF RETRAIN: base layout + appended batch (planted
    //     exact copies of the query ride the append), then the drift
    //     discipline's ending — re-cluster the LIVE corpus into a fresh
    //     layout under NEW pinned centroids; the probe through those
    //     centroids must surface exactly the planted copies (closed-form
    //     oracle, q216's pattern through a retrain instead of a write) ----
    "q235_ivf_retrain" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
        .where(col("embedding").isNotNull)
        .select(col("vec_id"), col("embedding"))
      val q = emb.where(col("vec_id") === 7).select(col("embedding"))
        .head().getSeq[Float](0)
      val planted = emb.where(col("vec_id") === 7)
        .select(explode(sequence(lit(0), lit(4))).as("i"), col("embedding"))
        .select((col("i") + 9600L).as("vec_id"), col("embedding"))
      val base = emb.where(col("vec_id") =!= 7 && col("vec_id") % 2 === 0)
      val batch = emb.where(col("vec_id") =!= 7 && col("vec_id") % 2 === 1)
        .unionByName(planted)
      val cents = Similarity.ivfCentroids(base, "vec_id", "embedding", k = 6)
      val root = sys.props("java.io.tmpdir") + "/graft_q235_ivf_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      Similarity.writeIvfCorpus(base, "vec_id", "embedding", root + "/v1",
        cents)
      Similarity.appendIvfCorpus(batch, "vec_id", "embedding", root + "/v1",
        cents)
      val cents2 = Similarity.retrainIvfCorpus(s, root + "/v1", root + "/v2",
        "vec_id", "embedding", k = 8)
      Similarity.ivfTopKFromPartitioned(s, root + "/v2", "vec_id",
          "embedding", q, 5, cents2, nProbe = 3)
        .select(col("vec_id"), round(col("cos"), 4).as("cos"))
    }),

    // --- the UNDO WINDOW as a user feature: q224's retention prune runs,
    //     the LIVE table now lacks every 0.2–0.5 pair — but keep-one-back
    //     still funds the pre-prune generation, and the full threshold
    //     curve audit reads THROUGH it (readPairsPrevious). Oracle = the
    //     from-scratch curve over the whole 0.2-floor mine: only the
    //     retired-but-retained generation can produce it, so a hash match
    //     certifies the undo view is the exact pre-maintenance table -----
    "q236_pair_undo" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val path = sys.props("java.io.tmpdir") + "/graft_q236_pairs_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      Dedup.writePairs(docs, "doc_id", "text", path,
        shingleSize = 3, minJaccard = 0.2, maxDf = Some(1000))
      Dedup.prunePairs(s, path, newMinJaccard = 0.5)
      Dedup.thresholdCurveFromPairs(
        Dedup.readPairsPrevious(s, path, threshold = 0.2).get)
    }),

    // --- exactly-once STREAMING ingest into the persisted PAIR table —
    //     the last of the four persisted layouts gets its streaming verb:
    //     q219's day-1 half arrives as a two-epoch stream, each micro-batch
    //     an appendPairs under its epoch tag (pairs-first/postings-second);
    //     the WHOLE stream re-runs from a fresh checkpoint and must no-op.
    //     Oracle = q219's scratch-mine SQL verbatim: batch ingest, streamed
    //     ingest, and a from-scratch mine are indistinguishable ------------
    "q237_stream_pair_ingest" -> ((s, dir) => {
      val docs = T(s, dir, "documents").where(col("doc_id") % 4 <= 1)
      val path = sys.props("java.io.tmpdir") + "/graft_q237_pairs_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      Dedup.writePairs(docs.where(col("doc_id") % 4 === 0), "doc_id", "text",
        path, shingleSize = 3, minJaccard = 0.2, maxDf = Some(1000))
      def run(): Unit = graft.streaming.Streaming.ingestIntoPairs(
        graft.streaming.Streaming.docsReplay(s, dir, 2)
          .where(col("doc_id") % 4 === 1).select(col("doc_id"), col("text")),
        path, "doc_id", "text", shingleSize = 3, minJaccard = 0.2,
        maxDf = Some(1000)).awaitTermination()
      run()
      run() // full replay, same epoch tags: every batch short-circuits
      val scored = docs.select(col("doc_id"), col("lang"),
        TextOps.qualityScore(col("text")).as("q"))
      Dedup.removeDuplicatesKeepBest(scored, "doc_id",
          Dedup.readPairs(s, path, threshold = 0.8), "q")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
    }),

    // --- the undo window on the ANN layout: q226's takedown runs (the
    //     LIVE index can never again surface the 4 deleted planted
    //     copies), then the PREVIOUS-generation probe reads the index as
    //     of just before the delete — all SEVEN planted copies at cos 1.0,
    //     the takedown audit ("what did the delete remove from this
    //     query's neighborhood?") in closed form --------------------------
    "q238_ivf_undo" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val q = emb.where(col("vec_id") === 7).select(col("embedding"))
        .head().getSeq[Float](0)
      val planted = emb.where(col("vec_id") === 7)
        .select(explode(sequence(lit(0), lit(6))).as("i"), col("embedding"))
        .select((col("i") + 9500L).as("vec_id"), col("embedding"))
      val base = emb.where(col("vec_id") =!= 7)
      val cents = Similarity.ivfCentroids(base, "vec_id", "embedding", k = 8)
      val path = sys.props("java.io.tmpdir") + "/graft_q238_ivf_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      Similarity.writeIvfCorpus(base.unionByName(planted), "vec_id",
        "embedding", path, cents)
      Similarity.removeFromIvfCorpus(s, path,
        s.range(4).select((col("id") * 2 + 9500L).as("vec_id")),
        idCol = "vec_id")
      Similarity.ivfTopKFromPartitionedPrevious(s, path, "vec_id",
          "embedding", q, 7, cents, nProbe = 2)
        .select(col("vec_id"), round(col("cos"), 4).as("cos"))
    }),

    // --- MINOR compaction (size-tiered small-file merge) on the search
    //     index: three daily appends leave small-file debris in every
    //     posting bucket; minorCompactPartitions merges ONLY the debris —
    //     the base generation's large files carry by _RETAINS reference,
    //     never copied — and the probe must be oblivious (q90's SQL
    //     verbatim). The steady-state maintenance verb: at 100 TB the daily
    //     bill is O(appended debris), not O(index) ------------------------
    "q239_minor_compact" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val path = sys.props("java.io.tmpdir") + "/graft_q239_bm25_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      TextOps.writeBm25Index(docs.where(col("doc_id") % 4 === 0),
        "doc_id", "text", path)
      (1 to 3).foreach { d =>
        TextOps.appendBm25Index(docs.where(col("doc_id") % 4 === d),
          "doc_id", "text", path, batchId = Some(s"day-$d"))
      }
      graft.store.Compaction.minorCompactPartitions(
        s, path + "/postings", smallBytes = 32L << 10): Unit
      TextOps.bm25TopKFromIndex(s, path, Seq("spark", "window", "merge"), 15)
        .withColumnRenamed("id", "doc_id")
    }),

    // --- the maintenance SCHEDULER: layoutReport (per-leaf fs-metadata
    //     planner stats, no data read) + autoMaintain (per leaf: major
    //     fold when the tier degenerates past majorAt open files, minor
    //     debris merge past minorAt, else nothing) — HBase's server-side
    //     compaction chooser as one idempotent daily verb. Deterministic
    //     action/file counts + the postings row count ties the maintained
    //     layout's MULTISET to the from-scratch tokenization ------------
    "q240_auto_maintain" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val path = sys.props("java.io.tmpdir") + "/graft_q240_bm25_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      TextOps.writeBm25Index(docs.where(col("doc_id") % 4 === 0),
        "doc_id", "text", path)
      (1 to 3).foreach { d =>
        TextOps.appendBm25Index(docs.where(col("doc_id") % 4 === d),
          "doc_id", "text", path, batchId = Some(s"day-$d"))
      }
      val posts = path + "/postings"
      val beforeRep = graft.store.Compaction.layoutReport(
        s, posts, smallBytes = Long.MaxValue)
      val (minors, majors) = graft.store.Compaction.autoMaintain(
        s, posts, smallBytes = Long.MaxValue, minorAt = 4, majorAt = 64)
      val afterRep = graft.store.Compaction.layoutReport(
        s, posts, smallBytes = Long.MaxValue)
      import s.implicits._
      Seq((beforeRep.length.toLong,
          minors == beforeRep.length && majors == 0,
          afterRep.map(_.liveFiles).max.toLong,
          afterRep.map(_.retainedFiles).sum.toLong))
        .toDF("n_leaves", "all_minored", "max_files_after", "retained_after")
        .crossJoin(graft.store.Compaction.readPartitioned(s, posts, "bucket")
          .get.agg(count(lit(1)).as("n_postings")))
    }),

    // --- layout FSCK: crash debris is manufactured on EVERY posting leaf
    //     (lost MANIFEST + a half-written orphan generation + a dead stage
    //     dir); fsckPartitions heals the pointers durably and sweeps the
    //     debris, and the probe over the healed index must still match
    //     q90's from-scratch SQL — with the heal/sweep counts riding along
    //     as columns (one heal and one sweep per occupied leaf) ----------
    "q241_layout_fsck" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val path = sys.props("java.io.tmpdir") + "/graft_q241_bm25_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      TextOps.writeBm25Index(docs.where(col("doc_id") % 2 === 0),
        "doc_id", "text", path)
      TextOps.appendBm25Index(docs.where(col("doc_id") % 2 =!= 0),
        "doc_id", "text", path, batchId = Some("day-1"))
      val posts = path + "/postings"
      // debris is manufactured through the Hadoop fs API — the fsck demo
      // must not assume a local filesystem
      val postsPath = new org.apache.hadoop.fs.Path(posts)
      val fs = postsPath.getFileSystem(s.sessionState.newHadoopConf())
      fs.listStatus(postsPath)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("bucket="))
        .foreach { leaf =>
          // "lost pointer" = every pointer version gone (MANIFEST legacy +
          // MANIFEST.v<seq> fenced commits alike)
          fs.listStatus(leaf.getPath)
            .filter(st => st.isFile && st.getPath.getName.startsWith("MANIFEST"))
            .foreach(st => fs.delete(st.getPath, false): Unit)
          fs.mkdirs(new org.apache.hadoop.fs.Path(leaf.getPath,
            "gen-000000097/_temporary")): Unit
          fs.mkdirs(new org.apache.hadoop.fs.Path(leaf.getPath, ".stage-dead")): Unit
        }
      fs.mkdirs(new org.apache.hadoop.fs.Path(postsPath, ".stage-dead")): Unit
      val stats = graft.store.Compaction.fsckPartitions(s, posts)
      import s.implicits._
      TextOps.bm25TopKFromIndex(s, path, Seq("spark", "window", "merge"), 15)
        .withColumnRenamed("id", "doc_id")
        .crossJoin(Seq((stats.count(_.healedManifest).toLong,
            stats.map(_.sweptOrphans).sum.toLong,
            stats.forall(_.ok)))
          .toDF("healed_manifests", "swept_orphans", "all_ok"))
    }),

    // --- the FULL production loop in one verb chain: exactly-once
    //     streaming ingest with IN-LOOP scheduled maintenance (autoMaintain
    //     after every epoch, inside foreachBatch where the single-
    //     maintainer contract holds by construction), then a FULL REPLAY —
    //     the replay must no-op on commit tags even though maintenance
    //     folded the tagged files into anonymous generations. Probe = q90's
    //     SQL verbatim: stream + maintenance + replay, indistinguishable
    //     from a from-scratch build ---------------------------------------
    "q242_stream_maintained" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val path = sys.props("java.io.tmpdir") + "/graft_q242_bm25_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      TextOps.writeBm25Index(
        docs.where(col("source") =!= "src0" && col("source") =!= "src1"),
        "doc_id", "text", path)
      def run(): Unit = graft.streaming.Streaming.ingestIntoBm25Index(
        graft.streaming.Streaming.docsReplay(s, dir, 2)
          .where(col("source") === "src0" || col("source") === "src1")
          .select(col("doc_id"), col("text")),
        path, "doc_id", "text",
        afterBatch = _ => graft.store.Compaction.autoMaintain(
          s, path + "/postings", smallBytes = Long.MaxValue,
          minorAt = 2, majorAt = 64): Unit).awaitTermination()
      run()
      run() // full replay across the MAINTAINED layout: tags still no-op
      TextOps.bm25TopKFromIndex(s, path, Seq("spark", "window", "merge"), 15)
        .withColumnRenamed("id", "doc_id")
    }),

    // --- search-index fsck: the two takedown/overwrite crash windows are
    //     manufactured (every doc_id % 97 == 0 loses its postings while
    //     staying a member; three ghost postings land for an id that is no
    //     member), repairBm25Index purges the ghosts, quarantines the
    //     under-posted members into the re-ingest worklist and rederives
    //     stats — the repaired probe must match the from-scratch SQL over
    //     the post-repair membership, with the repair counts riding along --
    "q243_bm25_fsck" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val path = sys.props("java.io.tmpdir") + "/graft_q243_bm25_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      TextOps.writeBm25Index(docs, "doc_id", "text", path)
      graft.store.Compaction.rewritePartitions(s, path + "/postings", 4,
        p => p.where(pmod(col("id"), lit(97L)) =!= 0L),
        onlyIfOverTarget = false): Unit
      import s.implicits._
      val ghost = Seq((-1L, 3L, "spark", 1L), (-1L, 3L, "window", 1L),
          (-1L, 3L, "merge", 1L)).toDF("id", "dl", "term", "tf")
        .withColumn("bucket", pmod(
          graft.functions.GraftFunctions.md5_prefix60(col("term")), lit(64L)))
      graft.store.Compaction.appendPartitions(
        ghost, path + "/postings", "bucket"): Unit
      val rep = TextOps.repairBm25Index(s, path)
      TextOps.bm25TopKFromIndex(s, path, Seq("spark", "window", "merge"), 15)
        .withColumnRenamed("id", "doc_id")
        .crossJoin(rep)
    }),

    // --- ANN-layout fsck: q238's seven planted copies are appended through
    //     PERMUTED centroids (the documented pinned-assignment contract
    //     violation) — all seven land in one wrong cell, invisible to the
    //     probe; repairIvfCorpus re-routes them (one wrong cell rewritten,
    //     rows re-appended under the pinned assignment) and the probe
    //     surfaces all seven at cos 1.0 with the repair counts riding along --
    "q244_ivf_fsck" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val q = emb.where(col("vec_id") === 7).select(col("embedding"))
        .head().getSeq[Float](0)
      val planted = emb.where(col("vec_id") === 7)
        .select(explode(sequence(lit(0), lit(6))).as("i"), col("embedding"))
        .select((col("i") + 9500L).as("vec_id"), col("embedding"))
      val base = emb.where(col("vec_id") =!= 7)
      val cents = Similarity.ivfCentroids(base, "vec_id", "embedding", k = 8)
      val path = sys.props("java.io.tmpdir") + "/graft_q244_ivf_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      Similarity.writeIvfCorpus(base, "vec_id", "embedding", path, cents)
      Similarity.appendIvfCorpus(planted, "vec_id", "embedding", path,
        cents.tail :+ cents.head)
      val rep = Similarity.repairIvfCorpus(s, path, cents,
        idCol = "vec_id", vecCol = "embedding")
      Similarity.ivfTopKFromPartitioned(s, path, "vec_id", "embedding",
          q, 7, cents, nProbe = 2)
        .select(col("vec_id"), round(col("cos"), 4).as("cos"))
        .crossJoin(rep)
    }),

    // --- UNDO-WINDOW probe on the SEARCH index (q238's BM25 twin,
    //     completing takedown-audit parity across all four persisted
    //     layouts): build + tagged append, then a takedown deletes a fifth
    //     of the corpus — and the PREVIOUS-generation probe (postings AND
    //     stats resolve one generation back) must score exactly what q90's
    //     from-scratch SQL computes over the FULL pre-delete corpus --------
    "q245_bm25_undo" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val path = sys.props("java.io.tmpdir") + "/graft_q245_bm25_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      TextOps.writeBm25Index(docs.where(col("doc_id") % 2 === 0),
        "doc_id", "text", path)
      TextOps.appendBm25Index(docs.where(col("doc_id") % 2 =!= 0),
        "doc_id", "text", path, batchId = Some("day-1"))
      TextOps.removeFromBm25Index(s, path,
        docs.where(col("doc_id") % 5 === 0).select(col("doc_id")))
      TextOps.bm25TopKFromIndexPrevious(s, path,
          Seq("spark", "window", "merge"), 15)
        .withColumnRenamed("id", "doc_id")
    }),

    // --- UNDO-WINDOW probe on the SRP ANN index (q238's bucketed twin):
    //     seven exact copies of the query vector are planted, a takedown
    //     removes four — and the previous-generation probe still finds all
    //     SEVEN at cosine 1.0, the pre-delete neighborhood ----------------
    "q246_srp_undo" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val q = emb.where(col("vec_id") === 7).select(col("embedding"))
        .head().getSeq[Float](0)
      val planted = emb.where(col("vec_id") === 7)
        .select(explode(sequence(lit(0), lit(6))).as("i"), col("embedding"))
        .select((col("i") + 9500L).as("vec_id"), col("embedding"))
      val base = emb.where(col("vec_id") =!= 7)
      val path = sys.props("java.io.tmpdir") + "/graft_q246_srp_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      // 64 buckets: the undo semantics are bucket-count-oblivious (the
      // planted copies share the query's bucket by construction) and the
      // layout-build + takedown demo shouldn't pay 256 leaves at this SF
      Similarity.writeBucketedCorpus(base.unionByName(planted), "vec_id",
        "embedding", path, nBits = 6)
      Similarity.removeFromBucketedCorpus(s, path,
        s.range(4).select((col("id") * 2 + 9500L).as("vec_id")),
        idCol = "vec_id"): Unit
      Similarity.annTopKFromBucketedPrevious(s, path, "vec_id",
          "embedding", q, 7, nBits = 6)
        .select(col("vec_id"), round(col("cos"), 4).as("cos"))
    }),

    // --- keyed-store FSCK, oracle-checked end to end (q241's twin for the
    //     flat indexed layout): an index-pruned upsert, then crash debris
    //     planted through the Hadoop fs API — a stray data file carrying
    //     DUPLICATE rows under a never-committed m-name, a torn index tmp,
    //     a dead staging sibling. The manifest-dialect read must be exact
    //     THROUGH the debris (strays invisible), fsckIndexed must sweep all
    //     three classes and report nothing unhealable, and the healed read
    //     must still hash-match the SQL replay of the upsert --------------
    "q247_keyed_fsck" -> ((s, dir) => {
      val c = T(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"))
      val path = sys.props("java.io.tmpdir") + "/graft_q247_keyed_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      KeyedStore.writeIndexed(c, path, "c_custkey", numRanges = 8)
      val upd = c.where(pmod(col("c_custkey"), lit(101)) === 0)
        .withColumn("c_name", concat(lit("UPD_"), col("c_name")))
      KeyedStore.upsertIndexed(s, path, upd, "c_custkey")
      val dirPath = new org.apache.hadoop.fs.Path(path)
      val fs = dirPath.getFileSystem(s.sessionState.newHadoopConf())
      // stray with DUPLICATE rows: a copy of a live m-file under a name no
      // index version references — visible to a naive dir listing, invisible
      // to the manifest read, swept by fsck
      val live = fs.listStatus(dirPath).map(_.getPath)
        .filter(p => p.getName.startsWith("m") && p.getName.endsWith(".parquet"))
        .minBy(_.getName)
      org.apache.hadoop.fs.FileUtil.copy(fs, live, fs,
        new org.apache.hadoop.fs.Path(dirPath, "m0-crashdebris.parquet"),
        false, fs.getConf): Unit
      val tmpIx = new org.apache.hadoop.fs.Path(dirPath,
        "._graft_index.tmp-crash")
      val out = fs.create(tmpIx, true)
      out.write("graft-index\tv2\ttruncated".getBytes("UTF-8")); out.close()
      fs.mkdirs(new org.apache.hadoop.fs.Path(path + "__staging")): Unit
      val st = KeyedStore.fsckIndexed(s, path, "c_custkey")
      import s.implicits._
      KeyedStore.readKeyed(s, path, "c_custkey")
        .select(col("c_custkey").as("key"), col("c_name").as("name"))
        .crossJoin(broadcast(Seq((st.sweptStrays.toLong,
            st.sweptDirs.toLong, st.sweptTmpFiles.toLong, st.ok))
          .toDF("swept_strays", "swept_dirs", "swept_tmp", "all_ok")))
    }),

    // --- UNDO-WINDOW read on the KEYED STORE itself (completing as-of
    //     parity across every persisted layout — the previous retained
    //     index version IS the pre-mutation snapshot's manifest): after an
    //     index-pruned upsert rewrote some ranges, the previous view must
    //     hash-match the UNTOUCHED base table --------------------------
    "q248_keyed_undo" -> ((s, dir) => {
      val c = T(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"))
      val path = sys.props("java.io.tmpdir") + "/graft_q248_keyed_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      KeyedStore.writeIndexed(c, path, "c_custkey", numRanges = 8)
      KeyedStore.upsertIndexed(s, path,
        c.where(pmod(col("c_custkey"), lit(97)) === 0)
          .withColumn("c_name", concat(lit("UPD_"), col("c_name"))),
        "c_custkey")
      KeyedStore.readKeyedPrevious(s, path, "c_custkey").get
        .select(col("c_custkey").as("key"), col("c_name").as("name"))
    }),

    // --- COMPOSITE I/O + query-surface round trip (closes the spec-only §2
    //     operators behind oracle rows): S13 TSV sink+source, S9/S15 text
    //     line reads, S10/S14 parquet stage, S11 table sink, S12 multi-table
    //     sink + pruned read-back, S2 point get, P6 prefix, P9 existence,
    //     P11 qualifier-gated row skip, P14 exact row limit ------------------
    "q249_io_composite" -> ((s, dir) => {
      import graft.sources.Sources
      import s.implicits._
      val base = sys.props("java.io.tmpdir") + "/graft_q249_io_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      val c = T(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
          col("c_acctbal"))
      // S13: TSV out + back (types stringify; cast on re-entry)
      Sources.writeTsv(c, base + "/tsv")
      val fromTsv = Sources.readTsv(s, base + "/tsv")
        .toDF("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
        .select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"),
          col("c_mktsegment"),
          col("c_acctbal").cast("double").as("c_acctbal"))
      // S9/S15: the same directory as raw text lines (one line per row)
      val lineCnt = Sources.readLines(s, base + "/tsv").count()
      // S10/S14: inter-stage persistence round trip
      Sources.stageWrite(fromTsv, base + "/stage")
      val staged = Sources.stageRead(s, base + "/stage")
      // S12: multi-table sink routed by segment + pruned single-table read
      Sources.writeMultiTable(staged, "c_mktsegment", base + "/multi")
      val segCnt = Sources.readFromMultiTable(s, base + "/multi",
        "c_mktsegment", "BUILDING").count()
      // S11: table sink; its read-back is the query surface below
      val famed = staged.withColumn("fam",
        map(col("c_mktsegment"), col("c_acctbal").cast("double")))
      Sources.writeTable(famed, base + "/table")
      val table = KeyedStore.read(s, base + "/table")
      // S2: point get
      val pointName = GQuery(table, "c_custkey").withKey(42L)
        .singleOption().map(_.getAs[String]("c_name")).getOrElse("")
      // P14: exact row limit — the witness is the limited scan's cardinality
      // (content-independent, so the oracle compare stays deterministic)
      val limitedCnt = GQuery(table, "c_custkey").limit(7).toDF.count()
      // P6 + P9 + P11 over the table sink's read-back
      GQuery(table, "c_custkey")
        .filter(
          Clauses.mustStartWith(col("c_name"), "Customer#00000014"),
          Clauses.mustBePresent(col("c_acctbal")),
          Clauses.familyHasKeyGreaterThan(col("fam"), "B"))
        .withColumns(col("c_name"), col("c_acctbal"))
        .toDF
        .select(col("c_custkey").as("key"), col("c_name").as("name"),
          col("c_acctbal").as("bal"))
        .crossJoin(broadcast(Seq((lineCnt, segCnt, limitedCnt, pointName))
          .toDF("line_cnt", "seg_cnt", "limited_cnt", "point_name")))
    }),

    // --- M5: MutationBatch chain (delete/put/put/increment in the
    //     reference's precedence; OpsResult counts ride as columns) + M2:
    //     dynamic-family puts (new qualifiers add, overlapping replace,
    //     untouched survive) + G6: group-by-extractor over the result ------
    "q250_mutation_batch" -> ((s, dir) => {
      import graft.store.MutationBatch
      import s.implicits._
      val base = T(s, dir, "customer")
        .select(col("c_custkey").as("key"),
          map(lit("base"), round(col("c_acctbal") * 100).cast("long")).as("fam"),
          col("c_nationkey").cast("long").as("nat"))
      val dels = base.select(col("key")).where(pmod(col("key"), lit(101)) === 0)
      val put1 = base.where(pmod(col("key"), lit(7)) === 0)
        .select(col("key"), map(lit("d1"), lit(100L)).as("fam"))
      val put2 = base.where(pmod(col("key"), lit(14)) === 0)
        .select(col("key"),
          map(lit("d1"), lit(200L), lit("d2"), lit(5L)).as("fam"))
      val incs = base.where(pmod(col("key"), lit(11)) === 0)
        .select(col("key"), lit(1000L).as("nat"))
      val (merged, ops) = MutationBatch("key")
        .delete(dels).put(put1).put(put2).increment(incs)
        .execute(base)
      // G6: group-by-extractor (a derived key expression, not a column)
      val buckets = graft.jobs.GJob.groupByExtractor(
          merged.select(col("key"), col("nat")),
          pmod(col("key"), lit(10)),
          count(lit(1)).as("n"), sum(col("nat")).as("nat_sum"))
        .withColumnRenamed("group_key", "bucket")
      merged.select(col("key"), explode(col("fam")).as(Seq("qual", "cell")),
          col("nat"))
        .join(broadcast(buckets), pmod(col("key"), lit(10)) === col("bucket"))
        .select(col("key"), col("qual"), col("cell"), col("nat"),
          col("bucket"), col("n"), col("nat_sum"))
        .crossJoin(broadcast(Seq((ops.numDeletes, ops.numPuts, ops.numIncrements))
          .toDF("n_del", "n_put", "n_inc")))
    }),

    // --- KEEP-N UNDO on the keyed store: graft.keepVersions=4 funds three
    //     steps; two mutations later, back=2 is the UNTOUCHED base — served
    //     through the connector (graft.asofVersion) with key pruning -------
    "q251_keyed_undo2" -> ((s, dir) => {
      val c = T(s, dir, "customer").select(col("c_custkey"), col("c_name"))
      val path = sys.props("java.io.tmpdir") + "/graft_q251_keyed_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      val prevKeep = s.conf.getOption("graft.keepVersions")
      s.conf.set("graft.keepVersions", "4")
      try {
        KeyedStore.writeIndexed(c, path, "c_custkey", numRanges = 8)
        KeyedStore.upsertIndexed(s, path,
          c.where(pmod(col("c_custkey"), lit(97)) === 0)
            .withColumn("c_name", concat(lit("U1_"), col("c_name"))),
          "c_custkey")
        KeyedStore.upsertIndexed(s, path,
          c.where(pmod(col("c_custkey"), lit(89)) === 0)
            .withColumn("c_name", concat(lit("U2_"), col("c_name"))),
          "c_custkey")
        KeyedStore.readKeyedPrevious(s, path, "c_custkey", back = 2).get
          .select(col("c_custkey").as("key"), col("c_name").as("name"))
      } finally prevKeep match {
        case Some(v) => s.conf.set("graft.keepVersions", v)
        case None => s.conf.unset("graft.keepVersions")
      }
    }),

    // --- KEEP-N UNDO on the manifest layout: two retention rewrites later,
    //     readPrevious(back = 2) walks the _PARENT chain to the original ---
    "q252_manifest_undo2" -> ((s, dir) => {
      import graft.store.ManifestTable
      val c = T(s, dir, "customer").select(col("c_custkey"), col("c_name"))
      val path = sys.props("java.io.tmpdir") + "/graft_q252_mani_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      val prevKeep = s.conf.getOption("graft.keepVersions")
      s.conf.set("graft.keepVersions", "4")
      try {
        ManifestTable.write(c, path)
        ManifestTable.compact(s, path, 2,
          df => df.where(pmod(col("c_custkey"), lit(3)) =!= 0))
        ManifestTable.compact(s, path, 2,
          df => df.where(pmod(col("c_custkey"), lit(5)) =!= 0))
        ManifestTable.readPrevious(s, path, back = 2).get
          .select(col("c_custkey").as("key"), col("c_name").as("name"))
      } finally prevKeep match {
        case Some(v) => s.conf.set("graft.keepVersions", v)
        case None => s.conf.unset("graft.keepVersions")
      }
    }),

    // --- FENCED-RACE DEBRIS + FSCK (round 14's writer fencing behind an
    //     oracle row): a losing maintainer's stranded state — a claimed
    //     never-committed generation and a torn (unsealed) pointer version
    //     — is invisible to readers BEFORE any heal, swept by fsck, and the
    //     committed snapshot is untouched throughout ------------------------
    "q253_fence_debris_fsck" -> ((s, dir) => {
      import graft.store.ManifestTable
      val c = T(s, dir, "customer").select(col("c_custkey"), col("c_name"))
      val path = sys.props("java.io.tmpdir") + "/graft_q253_fence_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      ManifestTable.write(c, path)
      ManifestTable.compact(s, path, 2,
        df => df.where(pmod(col("c_custkey"), lit(7)) =!= 0))
      // manufacture the loser's exact on-disk state through the Hadoop fs
      // API (no local-fs assumption): a generation it claimed and staged
      // but never committed, plus a pointer commit that died mid-write
      // (sealed header missing — reads as absent)
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(s.sessionState.newHadoopConf())
      fs.mkdirs(new org.apache.hadoop.fs.Path(p, "gen-000000077")): Unit
      org.apache.spark.sql.graft.GraftIndex.createExclusive(fs,
        new org.apache.hadoop.fs.Path(p, ".genclaim-gen-000000077")).close()
      val torn = fs.create(new org.apache.hadoop.fs.Path(p, "MANIFEST.v99"), true)
      try torn.write("gen-000000077\n".getBytes("UTF-8")) finally torn.close()
      // torn pointer + claimed orphan are INVISIBLE before any heal
      val preN = ManifestTable.read(s, path).count()
      val st = ManifestTable.fsck(s, path)
      import s.implicits._
      ManifestTable.read(s, path)
        .select(col("c_custkey").as("key"), col("c_name").as("name"))
        .crossJoin(broadcast(Seq((preN, st.healedManifest,
            st.sweptOrphans.toLong, st.sweptTmpFiles.toLong, st.ok))
          .toDF("pre_n", "healed", "swept_orphans", "swept_tmp", "all_ok")))
    }),

    // --- S16 + G7/G8 + G12 + P12 composite: the DDL-driven MR job the
    //     reference's schema tests run end-to-end (golden DDL,
    //     ExampleSchema.scala:172-198; MR job + counter readback,
    //     WebCrawlSchemaTest.scala:246-281). TableDef.createScript DDL
    //     creates a real catalog table (S16, delete+create both executed);
    //     a typed per-row mapper tokenizes (G7); Counters.observed metrics
    //     ride the insert's plan and read back post-action (G12); a typed
    //     mapGroups reducer folds per language (G8 — the MR-reducer
    //     analogue, deliberately no partial agg; the Catalyst-agg twin is
    //     q01); results INSERT OVERWRITE the DDL table and come back
    //     through a GQuery family-selector projection (P12). Scale: one
    //     typed shuffle of (lang, n_tokens) pairs — text never shuffles;
    //     the counters are plan-riding metrics, not a second scan. -------
    "q254_ddl_mr_counters" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.types.{LongType, StringType}
      val docs = T(s, dir, "documents")
      val suffix = Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      val tdef = new graft.schema.TableDef(s"graft_q254_stats_$suffix", StringType)
        .family("stats", ttlSeconds = 86400)
        .col("stats", "n_docs", LongType)
        .col("stats", "tok_sum", LongType)
      val loc = sys.props("java.io.tmpdir") + s"/graft_q254_$suffix"
      s.sql(tdef.deleteScript): Unit // S16 deleteScript, executed as-is
      val script = tdef.createScript(loc) // S16 createScript, executed as-is
      s.sql(script): Unit
      val obs = org.apache.spark.sql.Observation(
        "q254_" + java.util.UUID.randomUUID().toString.take(8))
      // G7 mapper base: a typed per-row Dataset lambda
      val mapped = docs.select(col("lang"), col("text")).as[(String, String)]
        .map { case (lang, text) =>
          (lang, text.split(' ').count(_.nonEmpty).toLong) }
        .toDF("lang", "n_tokens")
      // G12: counters ride the plan (one pass); read back after the action
      val counted = graft.jobs.Counters.observed(mapped, obs,
        count(lit(1)).as("mapper_rows"),
        sum(col("n_tokens")).as("mapper_tokens"))
      // G8 reducer base: typed mapGroups fold per language key
      val reduced = counted.as[(String, Long)].groupByKey(_._1)
        .mapGroups { (lang, it) =>
          var n = 0L; var tok = 0L
          it.foreach { case (_, t) => n += 1; tok += t }
          (lang, n, tok)
        }.toDF("key", "n_docs", "tok_sum")
      reduced
        .select(col("key"), struct(col("n_docs"), col("tok_sum")).as("stats"))
        .write.mode("overwrite").insertInto(tdef.name) // the action: obs lands
      val m = obs.get
      // P12: family-selector projection over the catalog read-back
      val back = graft.query.GQuery(s.table(tdef.name))
        .withFamilies("stats").toDF
      back.select(col("key").as("lang"),
          col("stats.n_docs").as("n_docs"), col("stats.tok_sum").as("tok_sum"))
        .crossJoin(broadcast(Seq((
            m("mapper_rows").asInstanceOf[Long],
            m("mapper_tokens").asInstanceOf[Long],
            script.contains("'graft.family.stats.ttlSeconds'='86400'")))
          .toDF("mapper_rows", "mapper_tokens", "ddl_has_ttl")))
    }),

    // --- PERSISTED cluster table + incremental maintenance (round 15):
    //     day-0 mines + clusters + persists half the corpus; day-1's pair
    //     increment folds in through the REP-GRAPH contraction
    //     (appendToClusters clusters only touched-reps + new-docs and
    //     upserts only rows whose representative changes — O(delta), not
    //     O(corpus)); a blind retry of the same delta must be an exact
    //     no-op (rides as retry_n = 0). Oracle = from-scratch transitive
    //     clustering of the union pair set at the same threshold: the
    //     maintained table must be indistinguishable from re-clustering
    //     everything. ------------------------------------------------------
    "q255_cluster_maintain" -> ((s, dir) => {
      val docs = T(s, dir, "documents").where(col("doc_id") % 4 <= 1)
      val salt = Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      val pairsPath = sys.props("java.io.tmpdir") + s"/graft_q255_pairs_$salt"
      val clustersPath =
        sys.props("java.io.tmpdir") + s"/graft_q255_clusters_$salt"
      Dedup.writePairs(docs.where(col("doc_id") % 4 === 0), "doc_id", "text",
        pairsPath, shingleSize = 3, minJaccard = 0.2, maxDf = Some(1000))
      Dedup.writeClusters(s, pairsPath, clustersPath, threshold = 0.8)
      Dedup.appendPairs(docs.where(col("doc_id") % 4 === 1), "doc_id", "text",
        pairsPath, shingleSize = 3, minJaccard = 0.2, maxDf = Some(1000),
        batchId = Some("day-1"))
      val delta = Dedup.readPairs(s, pairsPath, threshold = 0.8)
        .where(pmod(col("id_a"), lit(4)) === 1 || pmod(col("id_b"), lit(4)) === 1)
      val n1 = Dedup.appendToClusters(s, clustersPath, delta)
      val n2 = Dedup.appendToClusters(s, clustersPath, delta) // blind retry
      import s.implicits._
      Dedup.readClusters(s, clustersPath)
        .crossJoin(broadcast(Seq((n1 > 0, n2)).toDF("applied", "retry_n")))
    }),

    // --- TAKEDOWN + content-fsck on the persisted cluster table (round
    //     16): the corpus is the %4==2 slice plus an id-shifted MIRROR of
    //     itself (every doc gains an exact twin, near-dup pairs become
    //     4-clusters — so the takedown exercises rep RE-ELECTION, not just
    //     deletes), clustered and persisted; removeFromClusters purges
    //     doc_id%7==0 from pairs AND clusters, re-clustering only touched
    //     components; repairClusters then verifies rep closure and must
    //     heal NOTHING (an exact takedown leaves no debris — the counts
    //     ride). Oracle = from-scratch transitive clustering of the
    //     surviving corpus: the maintained-then-takendown table must be
    //     indistinguishable from never having ingested the removed docs.
    //     (Reference analogue: the delete-op surface, DeleteOp.scala:21-39.)
    "q256_cluster_takedown" -> ((s, dir) => {
      val base = T(s, dir, "documents").where(col("doc_id") % 4 === 2)
        .select(col("doc_id"), col("text"))
      val corpus = base.unionByName(
        base.withColumn("doc_id", col("doc_id") + lit(10000000L)))
      val salt = Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      val pairsPath = sys.props("java.io.tmpdir") + s"/graft_q256_pairs_$salt"
      val clustersPath =
        sys.props("java.io.tmpdir") + s"/graft_q256_clusters_$salt"
      Dedup.writePairs(corpus, "doc_id", "text", pairsPath,
        shingleSize = 3, minJaccard = 0.2, maxDf = Some(1000))
      Dedup.writeClusters(s, pairsPath, clustersPath, threshold = 0.8)
      val removed = corpus.where(col("doc_id") % 7 === 0)
        .select(col("doc_id"))
      val (nDel, nUp) = Dedup.removeFromClusters(s, clustersPath, pairsPath,
        removed, threshold = 0.8)
      val st = Dedup.repairClusters(s, clustersPath)
      // the mirrored corpus doubles every shingle's df — check the capped
      // mine's exactness assumption on THIS corpus, not the base one
      val maxDf = Dedup.hashedShingles(corpus, "doc_id", "text", 3)
        .select(explode(col("th")).as("sh"))
        .groupBy(col("sh")).agg(count(lit(1)).as("df"))
        .agg(coalesce(max(col("df")), lit(0L))).head().getLong(0)
      import s.implicits._
      Dedup.readClusters(s, clustersPath)
        .crossJoin(broadcast(Seq((nDel > 0 && nUp > 0,
            st.danglingReps, st.minRepViolations, st.healedRows,
            maxDf <= 1000L))
          .toDF("applied", "dangling", "min_viol", "healed", "df_cap_ok")))
    }),

    // --- the production near-dup loop END-TO-END as a stream (round 16):
    //     day-0 mines + clusters + persists the %4==0 corpus; the %4==1
    //     docs arrive as TWO micro-batches whose foreachBatch mines pairs
    //     under epoch tags AND folds each epoch's pairs into the persisted
    //     cluster table (appendToClusters' O(delta) maintenance); the
    //     whole stream then REPLAYS — every epoch must no-op (tag
    //     short-circuit + empty rep graph). Oracle = q255's: from-scratch
    //     transitive clustering of the union pair set; the twice-run
    //     stream's table must be indistinguishable from it. ---------------
    "q257_stream_cluster_ingest" -> ((s, dir) => {
      val salt = Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      val pairsPath = sys.props("java.io.tmpdir") + s"/graft_q257_pairs_$salt"
      val clustersPath =
        sys.props("java.io.tmpdir") + s"/graft_q257_clusters_$salt"
      val docs = T(s, dir, "documents")
      Dedup.writePairs(docs.where(col("doc_id") % 4 === 0), "doc_id", "text",
        pairsPath, shingleSize = 3, minJaccard = 0.2, maxDf = Some(1000))
      Dedup.writeClusters(s, pairsPath, clustersPath, threshold = 0.8)
      def run(): Unit = graft.streaming.Streaming.ingestIntoClusters(
        graft.streaming.Streaming.docsReplay(s, dir, 2)
          .where(col("doc_id") % 4 === 1).select(col("doc_id"), col("text")),
        pairsPath, clustersPath, "doc_id", "text", shingleSize = 3,
        minJaccard = 0.2, maxDf = Some(1000), threshold = 0.8)
        .awaitTermination()
      run()
      run() // full replay: tags no-op the mines, the cluster folds are no-ops
      Dedup.readClusters(s, clustersPath)
    }),

    // --- S16 alterScript EXECUTED against the live catalog (round 16 —
    //     the one DDL verb q254 left spec-gated; reference golden strings
    //     ExampleSchema.scala:172-198): a v1 table (stats family, TTL
    //     86400) is created and populated; the v2 declaration adds a NEW
    //     family and retunes the TTL to 3600; alterScript reconciles —
    //     ADD COLUMNS + SET TBLPROPERTIES, executed statement by
    //     statement. Proof obligations riding: the emitted script carries
    //     both clauses, the catalog's TTL property reads back 3600, and
    //     OLD files read through the WIDENED schema as nulls (the
    //     readAligned semantics the scaladoc promises). Oracle replays the
    //     per-lang rollup the altered table then serves. -------------------
    "q258_ddl_alter" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.types.{LongType, StringType}
      val suffix = Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      val loc = sys.props("java.io.tmpdir") + s"/graft_q258_$suffix"
      val v1 = new graft.schema.TableDef(s"graft_q258_stats_$suffix", StringType)
        .family("stats", ttlSeconds = 86400)
        .col("stats", "n_docs", LongType)
      s.sql(v1.deleteScript): Unit
      s.sql(v1.createScript(loc)): Unit
      val perLang = T(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(expr("size(filter(split(text, ' '), x -> x != ''))")
            .cast("long")).as("tok_sum"))
      perLang.select(col("lang").as("key"),
          struct(col("n_docs")).as("stats"))
        .write.mode("overwrite").insertInto(v1.name)
      val v2 = new graft.schema.TableDef(v1.name, StringType)
        .family("stats", ttlSeconds = 3600)
        .col("stats", "n_docs", LongType)
        .family("extra")
        .col("extra", "tok_sum", LongType)
      val script = v2.alterScript(s.table(v1.name).schema) // S16 alterScript
      script.split(";\n").filter(_.trim.nonEmpty).foreach(st => s.sql(st): Unit)
      // v1-written files read through the WIDENED schema with null extras
      val nLangs = s.table(v1.name).count()
      val nullsAfterAdd = s.table(v1.name)
        .where(col("extra.tok_sum").isNull).count()
      val ttlApplied = s.sql(s"SHOW TBLPROPERTIES ${v1.name}")
        .where(col("key") === "graft.family.stats.ttlSeconds")
        .collect().headOption.exists(_.getString(1) == "3600")
      perLang.select(col("lang").as("key"),
          struct(col("n_docs")).as("stats"),
          struct(col("tok_sum")).as("extra"))
        .write.mode("overwrite").insertInto(v1.name)
      s.table(v1.name).select(col("key").as("lang"),
          col("stats.n_docs").as("n_docs"), col("extra.tok_sum").as("tok_sum"))
        .crossJoin(broadcast(Seq((
            script.contains("ADD COLUMNS (extra"),
            script.contains("'graft.family.stats.ttlSeconds'='3600'"),
            ttlApplied, nullsAfterAdd == nLangs && nLangs > 0))
          .toDF("alter_adds_family", "alter_sets_ttl", "ttl_applied",
            "old_reads_null")))
    }),

    // --- decimal-keyed store lifecycle (round 16): the q62 twin on
    //     decimal(12,2) keys — the one key family whose index router was
    //     natived in round 15 (expressions.scala decimal router) but had
    //     no oracle row writing/merging/deleting through it end-to-end.
    //     Fractional keys (custkey + 0.25) exercise the decimal binary-
    //     search path; the oracle replays the merge in SQL. ----------------
    "q259_decimal_store" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q259_")
        .resolve("t").toString
      val c = T(s, dir, "customer")
        .select((col("c_custkey").cast("decimal(12,2)") + lit(0.25))
            .cast("decimal(12,2)").as("key"),
          col("c_name"), col("c_mktsegment"))
      KeyedStore.writeIndexed(c, tmp, "key", numRanges = 8)
      val updates = c.where(pmod(col("key"), lit(97)) === lit(0.25))
        .withColumn("c_name", concat(lit("UPD_"), col("c_name")))
      val inserts = c.where(pmod(col("key"), lit(131)) === lit(0.25))
        .withColumn("key",
          (col("key") + lit(10000000)).cast("decimal(12,2)"))
        .withColumn("c_name", concat(lit("NEW_"), col("c_name")))
      KeyedStore.upsertIndexed(s, tmp, updates.unionByName(inserts), "key")
      KeyedStore.deleteIndexed(s, tmp,
        c.where(pmod(col("key"), lit(113)) === lit(0.25)).select(col("key")),
        "key")
      // the store holds decimal(12,2) keys end-to-end (the router's
      // exercise); the OUTPUT casts to double only because the comparison
      // harness normalizes floats but not Decimal objects
      KeyedStore.readKeyed(s, tmp, "key")
        .select(col("key").cast("double").as("key"), col("c_name").as("name"),
          col("c_mktsegment").as("segment"))
    }),

    // --- LAZY takedown on the pairs layout (round 16): at 100 TB a GDPR
    //     delete cannot afford removeFromPairs' synchronous full-table
    //     rewrite — tombstonePairs appends the ids in O(|ids|), readPairs
    //     is takedown-exact IMMEDIATELY (masked rows never surface), and
    //     the next compactPairs applies the delete physically during the
    //     rewrite it was doing anyway, draining the sidecar (the LSM
    //     delete discipline). Mirrored corpus (every doc has an exact
    //     twin) so the masking really changes reports. The keep-best
    //     report is taken BOTH before and after the physical apply and
    //     pinned equal; oracle = the same report from a scratch mine of
    //     the survivors. -------------------------------------------------
    "q260_pair_tombstone" -> ((s, dir) => {
      val base = T(s, dir, "documents").where(col("doc_id") % 4 === 3)
        .select(col("doc_id"), col("lang"), col("text"))
      val corpus = base.unionByName(
        base.withColumn("doc_id", col("doc_id") + lit(20000000L)))
      val salt = Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      val path = sys.props("java.io.tmpdir") + s"/graft_q260_pairs_$salt"
      Dedup.writePairs(corpus, "doc_id", "text", path,
        shingleSize = 3, minJaccard = 0.2, maxDf = Some(1000))
      val nTs = Dedup.tombstonePairs(s, path,
        corpus.where(col("doc_id") % 9 === 0).select(col("doc_id")))
      val scored = corpus.where(col("doc_id") % 9 =!= 0)
        .select(col("doc_id"), col("lang"),
          TextOps.qualityScore(col("text")).as("q"))
      def report() = Dedup.removeDuplicatesKeepBest(scored, "doc_id",
          Dedup.readPairs(s, path, threshold = 0.8), "q")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
      val pre = report().collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      Dedup.compactPairs(s, path, targetFiles = 4) // physical apply + drain
      val drained = Dedup.pairTombstones(s, path).isEmpty
      val post = report().collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      import s.implicits._
      post.toSeq.toDF("lang", "n_docs", "id_sum")
        .crossJoin(broadcast(Seq((nTs > 0, drained, post.toSet == pre))
          .toDF("tombstoned", "drained", "pre_post_equal")))
    }),

    // --- LAZY takedown on the ANN layout (round 16, q226's tombstone
    //     twin): same planted-copy setup, but the delete is an O(|ids|)
    //     tombstone append — the probe must stop surfacing the deleted
    //     copies IMMEDIATELY (zero cell rewrites), and after the next
    //     compactIvfCorpus (which applies the anti-join physically and
    //     drains the sidecar) the same probe must be unchanged. Both
    //     probes ride: pre==post pinned, drain pinned. ---------------------
    "q261_ivf_tombstone" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val q = emb.where(col("vec_id") === 7).select(col("embedding"))
        .head().getSeq[Float](0)
      val planted = emb.where(col("vec_id") === 7)
        .select(explode(sequence(lit(0), lit(6))).as("i"), col("embedding"))
        .select((col("i") + 9500L).as("vec_id"), col("embedding"))
      val base = emb.where(col("vec_id") =!= 7)
      val cents = Similarity.ivfCentroids(base, "vec_id", "embedding", k = 8)
      val path = sys.props("java.io.tmpdir") + "/graft_q261_ivf_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      Similarity.writeIvfCorpus(base.unionByName(planted), "vec_id",
        "embedding", path, cents)
      val nTs = Similarity.tombstoneIvfCorpus(s, path,
        s.range(4).select((col("id") * 2 + 9500L).as("vec_id")))
      def probe() = Similarity.ivfTopKFromPartitioned(s, path, "vec_id",
          "embedding", q, 3, cents, nProbe = 2)
        .select(col("vec_id"), round(col("cos"), 4).as("cos"))
      val pre = probe().collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      Similarity.compactIvfCorpus(s, path, targetFiles = 4): Unit
      val drained = Similarity.ivfTombstones(s, path).isEmpty
      val post = probe().collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      import s.implicits._
      post.toSeq.toDF("vec_id", "cos")
        .crossJoin(broadcast(Seq((nTs > 0, drained, post.toSet == pre))
          .toDF("tombstoned", "drained", "pre_post_equal")))
    }),

    // --- LAZY takedown on the search index (round 16, q225's tombstone
    //     twin): O(|ids|) tombstone append + ONE stats generation — zero
    //     posting-bucket and zero docs-row rewrites. The probe must be
    //     survivor-exact IMMEDIATELY (masked postings shift every df, the
    //     fresh stats generation shifts every idf), and after
    //     compactBm25Index applies the delete physically and drains, the
    //     same probe must be unchanged. Both probes ride. ------------------
    "q262_bm25_tombstone" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val path = sys.props("java.io.tmpdir") + "/graft_q262_bm25_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      TextOps.writeBm25Index(docs, "doc_id", "text", path)
      val nTs = TextOps.tombstoneBm25Index(s, path,
        docs.where(col("doc_id") % 7 === 5).select(col("doc_id")))
      def probe() = TextOps.bm25TopKFromIndex(s, path,
        Seq("spark", "window", "merge"), 15)
      val pre = probe().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      TextOps.compactBm25Index(s, path): Unit // physical apply + drain
      val drained = TextOps.bm25Tombstones(s, path).isEmpty
      val post = probe().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      import s.implicits._
      post.toSeq.toDF("doc_id", "n_terms", "score")
        .crossJoin(broadcast(Seq((nTs > 0, drained, post.toSet == pre))
          .toDF("tombstoned", "drained", "pre_post_equal")))
    }),

    // --- LAZY takedown on the SRP bucketed layout (round 17, q246/q231's
    //     tombstone twin — the last heavy persisted layout to gain it):
    //     the delete is an O(|ids|) sidecar append with ZERO bucket-leaf
    //     rewrites — the probe must stop surfacing the deleted planted
    //     copies IMMEDIATELY, and after compactBucketedCorpus (which
    //     applies the anti-join physically in every leaf and drains the
    //     sidecar) the same probe must be unchanged. Pre==post pinned,
    //     drain pinned. ----------------------------------------------------
    "q263_srp_tombstone" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val q = emb.where(col("vec_id") === 7).select(col("embedding"))
        .head().getSeq[Float](0)
      val planted = emb.where(col("vec_id") === 7)
        .select(explode(sequence(lit(0), lit(6))).as("i"), col("embedding"))
        .select((col("i") + 9500L).as("vec_id"), col("embedding"))
      val base = emb.where(col("vec_id") =!= 7)
      val path = sys.props("java.io.tmpdir") + "/graft_q263_srp_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      Similarity.writeBucketedCorpus(base.unionByName(planted), "vec_id",
        "embedding", path, nBits = 6)
      val nTs = Similarity.tombstoneBucketedCorpus(s, path,
        s.range(4).select((col("id") * 2 + 9500L).as("vec_id")))
      def probe() = Similarity.annTopKFromBucketed(s, path, "vec_id",
          "embedding", q, 3, nBits = 6)
        .select(col("vec_id"), round(col("cos"), 4).as("cos"))
      val pre = probe().collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      Similarity.compactBucketedCorpus(s, path, targetFiles = 4): Unit
      val drained = Similarity.srpTombstones(s, path).isEmpty
      val post = probe().collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      import s.implicits._
      post.toSeq.toDF("vec_id", "cos")
        .crossJoin(broadcast(Seq((nTs > 0, drained, post.toSet == pre))
          .toDF("tombstoned", "drained", "pre_post_equal")))
    }),

    // --- SNAPSHOT EXPORT (round 17 — HBase ExportSnapshot analogue): a
    //     maintained table (write → append → minor compact, so the live
    //     snapshot spans a merged output PLUS a retained-by-reference
    //     file) exports file-level to an independent backup table; the
    //     source is then OVERWRITTEN — the backup read must still equal
    //     the pre-overwrite content exactly, with the copy-count and the
    //     moved-on source row count riding as proof columns. ---------------
    "q264_snapshot_clone" -> ((s, dir) => {
      val c = T(s, dir, "customer").select(col("c_custkey"), col("c_acctbal"))
      val salt = Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      val src = sys.props("java.io.tmpdir") + s"/graft_q264_src_$salt"
      val dst = sys.props("java.io.tmpdir") + s"/graft_q264_dst_$salt"
      val dp = new org.apache.hadoop.fs.Path(dst)
      dp.getFileSystem(s.sessionState.newHadoopConf()).delete(dp, true): Unit
      graft.store.ManifestTable.write(
        c.where(col("c_custkey") % 3 === 0), src)
      graft.store.ManifestTable.append(
        c.where(col("c_custkey") % 3 === 1), src)
      graft.store.ManifestTable.minorCompact(s, src): Unit
      val nFiles = graft.store.ManifestTable.cloneSnapshot(s, src, dst)
      // the source moves on: the backup must not
      graft.store.ManifestTable.write(
        c.where(col("c_custkey") % 3 === 2), src)
      val srcRows = graft.store.ManifestTable.read(s, src).count()
      import s.implicits._
      graft.store.ManifestTable.read(s, dst)
        .crossJoin(broadcast(Seq((nFiles > 0, srcRows))
          .toDF("copied", "src_rows")))
    }),

    // --- LAYOUT-level snapshot export (round 17): a BM25 search index
    //     with a PENDING lazy takedown is cloned whole — postings leaves,
    //     docs, stats, AND the tombstone sidecar. The source then moves on
    //     (physical drain + a second takedown); the probe runs against the
    //     CLONE, which must still rank exactly like a from-scratch index
    //     of the FIRST takedown's survivors: any dropped sidecar, stale
    //     pointer, or share with the live layout moves a score. ------------
    "q265_layout_clone" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val salt = Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      val src = sys.props("java.io.tmpdir") + s"/graft_q265_src_$salt"
      val dst = sys.props("java.io.tmpdir") + s"/graft_q265_dst_$salt"
      val dp = new org.apache.hadoop.fs.Path(dst)
      dp.getFileSystem(s.sessionState.newHadoopConf()).delete(dp, true): Unit
      TextOps.writeBm25Index(docs, "doc_id", "text", src)
      TextOps.tombstoneBm25Index(s, src,
        docs.where(col("doc_id") % 7 === 5).select(col("doc_id"))): Unit
      val n = graft.store.Compaction.cloneLayout(s, src, dst)
      // the source moves on: physical drain, then a SECOND takedown —
      // neither may reach the backup
      TextOps.compactBm25Index(s, src): Unit
      TextOps.tombstoneBm25Index(s, src,
        docs.where(col("doc_id") % 7 === 1).select(col("doc_id"))): Unit
      import s.implicits._
      TextOps.bm25TopKFromIndex(s, dst, Seq("spark", "window", "merge"), 15)
        .withColumnRenamed("id", "doc_id")
        .crossJoin(broadcast(Seq(n > 0).toDF("copied")))
    }),

    // --- exactly-once STREAMING ingest into the SRP bucketed ANN layout
    //     (round 17 — q234's SRP twin, completing streaming-ingest parity
    //     across every persisted ANN layout): the odd half arrives as a
    //     two-epoch stream, each micro-batch appended under its epoch
    //     tag; the WHOLE stream re-runs from a fresh checkpoint — every
    //     replayed epoch must be an exact no-op (a re-appended batch
    //     doubles its vectors' copies; a skipped one loses them). ----------
    "q266_stream_srp_ingest" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
        .where(col("embedding").isNotNull)
        .select(col("vec_id"), col("embedding"))
      val base = emb.where(col("vec_id") % 2 === 0)
      val path = sys.props("java.io.tmpdir") + "/graft_q266_srp_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      Similarity.writeBucketedCorpus(base, "vec_id", "embedding", path,
        nBits = 5)
      def run(): Unit = graft.streaming.Streaming.ingestIntoBucketedCorpus(
        graft.streaming.Streaming.tableReplay(s, dir, "embeddings",
            "vec_id", 2)
          .where(col("embedding").isNotNull && col("vec_id") % 2 === 1)
          .select(col("vec_id"), col("embedding")),
        path, "vec_id", "embedding", nBits = 5).awaitTermination()
      run()
      run() // full replay, same epoch tags: every batch short-circuits
      graft.store.Compaction.readPartitioned(s, path, "bucket").get
        .groupBy(col("vec_id")).agg(count(lit(1)).as("n_copies"))
    }),

    // --- ROLLBACK (round 17): a bad overwrite is undone by PROMOTING the
    //     undo window to live — one fenced pointer commit, zero data
    //     movement (the previous restore path was a full rewrite of
    //     readPrevious's content). The restored generation then takes an
    //     append like any live table; the read must equal the v1 slice
    //     plus the appended rows, with the restored-generation proof
    //     riding. ----------------------------------------------------------
    "q267_rollback" -> ((s, dir) => {
      val c = T(s, dir, "customer").select(col("c_custkey"), col("c_name"))
      val path = sys.props("java.io.tmpdir") + "/graft_q267_rb_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      graft.store.ManifestTable.write(
        c.where(col("c_custkey") % 2 === 0), path) // v1
      graft.store.ManifestTable.write(
        c.where(col("c_custkey") % 2 === 1), path) // v2: the bad overwrite
      val restored = graft.store.ManifestTable.rollback(s, path)
      graft.store.ManifestTable.append(
        c.where(col("c_custkey") % 4 === 1), path)
      import s.implicits._
      graft.store.ManifestTable.read(s, path)
        .crossJoin(broadcast(Seq(restored.nonEmpty).toDF("rolled_back")))
    }),

    // --- TAKEDOWN WITHDRAWAL (round 17): the lazy-takedown inverse — a
    //     tombstoned id set is fully withdrawn (the request filed in
    //     error), which must leave every report indistinguishable from
    //     never having filed it: q260's corpus and keep-best report, but
    //     the oracle replays the FULL corpus (no survivor filter), with
    //     the withdrawal proofs riding. ------------------------------------
    "q268_untombstone" -> ((s, dir) => {
      val base = T(s, dir, "documents").where(col("doc_id") % 4 === 3)
        .select(col("doc_id"), col("lang"), col("text"))
      val corpus = base.unionByName(
        base.withColumn("doc_id", col("doc_id") + lit(20000000L)))
      val salt = Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      val path = sys.props("java.io.tmpdir") + s"/graft_q268_pairs_$salt"
      Dedup.writePairs(corpus, "doc_id", "text", path,
        shingleSize = 3, minJaccard = 0.2, maxDf = Some(1000))
      val rm = corpus.where(col("doc_id") % 9 === 0).select(col("doc_id"))
      val nTs = Dedup.tombstonePairs(s, path, rm)
      val nBack = Dedup.untombstonePairs(s, path, rm)
      val empty = Dedup.pairTombstones(s, path).isEmpty
      val scored = corpus.select(col("doc_id"), col("lang"),
        TextOps.qualityScore(col("text")).as("q"))
      import s.implicits._
      Dedup.removeDuplicatesKeepBest(scored, "doc_id",
          Dedup.readPairs(s, path, threshold = 0.8), "q")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
        .crossJoin(broadcast(Seq((nTs > 0, nTs == nBack, empty))
          .toDF("tombstoned", "withdrawn_all", "sidecar_empty")))
    }),

    // --- LAYOUT-WIDE ROLLBACK (round 17): a mistaken eager takedown on
    //     the IVF layout (q226's setup — 4 of 7 planted copies deleted,
    //     every cell rewritten) is undone by rollbackPartitions — one
    //     fenced pointer commit per leaf, zero data movement. The LIVE
    //     probe must surface all seven planted copies again (q238's
    //     closed form, but on the live view, not the audit view). ----------
    "q269_layout_rollback" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val q = emb.where(col("vec_id") === 7).select(col("embedding"))
        .head().getSeq[Float](0)
      val planted = emb.where(col("vec_id") === 7)
        .select(explode(sequence(lit(0), lit(6))).as("i"), col("embedding"))
        .select((col("i") + 9500L).as("vec_id"), col("embedding"))
      val base = emb.where(col("vec_id") =!= 7)
      val cents = Similarity.ivfCentroids(base, "vec_id", "embedding", k = 8)
      val path = sys.props("java.io.tmpdir") + "/graft_q269_ivf_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      Similarity.writeIvfCorpus(base.unionByName(planted), "vec_id",
        "embedding", path, cents)
      Similarity.removeFromIvfCorpus(s, path,
        s.range(4).select((col("id") * 2 + 9500L).as("vec_id")),
        idCol = "vec_id"): Unit
      val moved = graft.store.Compaction.rollbackPartitions(s, path)
      import s.implicits._
      Similarity.ivfTopKFromPartitioned(s, path, "vec_id", "embedding",
          q, 7, cents, nProbe = 2)
        .select(col("vec_id"), round(col("cos"), 4).as("cos"))
        .crossJoin(broadcast(Seq(moved > 0).toDF("rolled_back")))
    }),

    // --- TAGGED REPLAY ACROSS A ROLLBACK (round 18): the exactly-once
    //     ledger is INCARNATION-stamped, closing round 17's one
    //     silent-duplication window. Two tagged epochs land and a
    //     compaction FOLDS them (the retry sweep can no longer identify
    //     them by file prefix); a bad overwrite starts a new incarnation;
    //     rollback restores the old one; then the ingest loop blindly
    //     replays ALL its epochs. Epochs 0/1 must no-op (their marker
    //     matches the restored incarnation), epoch 2 must append — every
    //     customer ends up in the table EXACTLY once, which the n_copies
    //     audit (q234's shape) proves row-by-row. ---------------------------
    "q270_tagged_replay_rollback" -> ((s, dir) => {
      val c = T(s, dir, "customer").select(col("c_custkey"), col("c_name"))
      val path = sys.props("java.io.tmpdir") + "/graft_q270_tags_" +
        Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      // the first verb is an append: reset the dir so a bench rep or a
      // re-run starts the lifecycle from scratch (tags persist on disk)
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(s.sessionState.newHadoopConf()).delete(p, true): Unit
      val epoch = (i: Int) => c.where(col("c_custkey") % 3 === i)
      graft.store.ManifestTable.appendTagged(epoch(0), path, "epoch-0"): Unit
      graft.store.ManifestTable.appendTagged(epoch(1), path, "epoch-1"): Unit
      graft.store.ManifestTable.compact(s, path) // folds the tagged files
      graft.store.ManifestTable.write(
        c.where(col("c_custkey") < 0), path) // bad overwrite: new incarnation
      graft.store.ManifestTable.rollback(s, path): Unit
      // the blind replay loop, straddling the rollback
      val r0 = graft.store.ManifestTable.appendTagged(epoch(0), path, "epoch-0")
      val r1 = graft.store.ManifestTable.appendTagged(epoch(1), path, "epoch-1")
      val r2 = graft.store.ManifestTable.appendTagged(epoch(2), path, "epoch-2")
      import s.implicits._
      graft.store.ManifestTable.read(s, path)
        .groupBy(col("c_custkey")).agg(count(lit(1)).as("n_copies"))
        .crossJoin(broadcast(Seq((!r0 && !r1, r2))
          .toDF("replay_noop", "new_epoch_landed")))
    }),

    // --- DISTRIBUTED snapshot export (round 18): the same cloneSnapshot
    //     verb with the copy engine FORCED to the executor-parallel Spark
    //     job (graft.clone.mode=spark — the 100 TB backup path: copy
    //     bandwidth scales with the executor count instead of one driver
    //     host's NIC, HBase ExportSnapshot economics). Every copied file
    //     is length-verified in-task; the backup must read exactly the
    //     snapshot content (multi-generation: an overwrite plus an
    //     append, minor-compacted so retained references flatten in). ------
    "q271_distributed_clone" -> ((s, dir) => {
      val o = T(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
      val salt = Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      val src = sys.props("java.io.tmpdir") + s"/graft_q271_src_$salt"
      val dst = sys.props("java.io.tmpdir") + s"/graft_q271_dst_$salt"
      val dp = new org.apache.hadoop.fs.Path(dst)
      dp.getFileSystem(s.sessionState.newHadoopConf()).delete(dp, true): Unit
      graft.store.ManifestTable.write(
        o.where(col("o_orderkey") % 2 === 0), src)
      graft.store.ManifestTable.append(
        o.where(col("o_orderkey") % 2 === 1), src)
      graft.store.ManifestTable.minorCompact(s, src): Unit
      val prev = s.conf.getOption("graft.clone.mode")
      s.conf.set("graft.clone.mode", "spark")
      val nFiles =
        try graft.store.ManifestTable.cloneSnapshot(s, src, dst)
        finally prev match {
          case Some(v) => s.conf.set("graft.clone.mode", v)
          case None => s.conf.unset("graft.clone.mode")
        }
      import s.implicits._
      graft.store.ManifestTable.read(s, dst)
        .crossJoin(broadcast(Seq(nFiles > 0).toDF("copied")))
    }),

    // --- INCREMENTAL backup (round 18): nightly backups of a 100 TB table
    //     cannot re-copy everything — syncSnapshot moves only the delta
    //     (new/changed files by immutable name+length identity), carries
    //     the rest into the new backup generation by _RETAINS reference,
    //     and no-ops entirely when the backup is current. The rider proves
    //     the economics (full first, strictly-smaller delta, zero no-op)
    //     and the rows prove the backup equals the synced snapshot even
    //     after the source moved on. -------------------------------------
    "q272_incremental_backup" -> ((s, dir) => {
      val c = T(s, dir, "customer").select(col("c_custkey"), col("c_name"))
      val salt = Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      val src = sys.props("java.io.tmpdir") + s"/graft_q272_src_$salt"
      val dst = sys.props("java.io.tmpdir") + s"/graft_q272_dst_$salt"
      val hc = s.sessionState.newHadoopConf()
      Seq(src, dst).foreach { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(hc).delete(hp, true): Unit
      }
      graft.store.ManifestTable.write(
        c.where(col("c_custkey") % 3 === 0).repartition(4), src)
      val full = graft.store.ManifestTable.syncSnapshot(s, src, dst)
      graft.store.ManifestTable.append(
        c.where(col("c_custkey") % 3 === 1).coalesce(1), src)
      val delta = graft.store.ManifestTable.syncSnapshot(s, src, dst)
      val noop = graft.store.ManifestTable.syncSnapshot(s, src, dst)
      // the source moves on: the synced backup must not
      graft.store.ManifestTable.write(
        c.where(col("c_custkey") % 3 === 2), src)
      import s.implicits._
      graft.store.ManifestTable.read(s, dst)
        .crossJoin(broadcast(
          Seq((full >= 4, delta > 0 && delta < full, noop == 0))
            .toDF("full_copied", "delta_smaller", "noop_noop")))
    }),

    // --- BACKUPS CARRY THE EXACTLY-ONCE LEDGER (round 18): a DR cutover
    //     points the ingest loop at the backup, and the loop blindly
    //     replays its epochs. The backup mirrors the source's
    //     incarnation-stamped commit tags (and the incarnation itself), so
    //     a committed epoch no-ops at the cutover target even after a
    //     compaction FOLDED its files, while a new epoch lands — every
    //     customer exactly once, proven row-by-row. --------------------------
    "q273_backup_ledger_cutover" -> ((s, dir) => {
      val c = T(s, dir, "customer").select(col("c_custkey"), col("c_name"))
      val salt = Integer.toHexString(dir.hashCode) + "_" +
        java.lang.ProcessHandle.current().pid()
      val src = sys.props("java.io.tmpdir") + s"/graft_q273_src_$salt"
      val dst = sys.props("java.io.tmpdir") + s"/graft_q273_dst_$salt"
      val hc = s.sessionState.newHadoopConf()
      Seq(src, dst).foreach { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(hc).delete(hp, true): Unit
      }
      graft.store.ManifestTable.write(
        c.where(col("c_custkey") % 3 === 0), src)
      graft.store.ManifestTable.appendTagged(
        c.where(col("c_custkey") % 3 === 1), src, "epoch-1"): Unit
      // fold the tagged files: only the mirrored ledger protects the replay
      graft.store.ManifestTable.compact(s, src)
      graft.store.ManifestTable.syncSnapshot(s, src, dst): Unit
      // DR cutover: the blind replay loop runs against the BACKUP
      val r1 = graft.store.ManifestTable.appendTagged(
        c.where(col("c_custkey") % 3 === 1), dst, "epoch-1")
      val r2 = graft.store.ManifestTable.appendTagged(
        c.where(col("c_custkey") % 3 === 2), dst, "epoch-2")
      import s.implicits._
      graft.store.ManifestTable.read(s, dst)
        .groupBy(col("c_custkey")).agg(count(lit(1)).as("n_copies"))
        .crossJoin(broadcast(Seq((!r1, r2))
          .toDF("replay_noop", "new_epoch_landed")))
    }),

    // --- CROSS-DOCUMENT duplicated-n-gram ratio (round 18): the
    //     exact-substring dedup SIGNAL — per doc, the fraction of its
    //     distinct word 3-grams appearing in ≥2 docs corpus-wide. One
    //     hashing pass + two shuffles on the shingle hash; no all-pairs. --
    "q274_ngram_dup_ratio" -> ((s, dir) =>
      TextOps.crossDocNgramDupRatio(
        T(s, dir, "documents"), "doc_id", "text", n = 3, minDocs = 2)),

    // --- Corpus-wide CHUNK dedup (round 18): first-occurrence-wins exact
    //     dedup at sub-document granularity (20-word windows) — the
    //     tractable form of exact-substring dedup; repeated spans survive
    //     exactly once corpus-wide, docs reassemble in position order. ----
    "q275_chunk_dedup" -> ((s, dir) =>
      TextOps.dedupeChunks(
        T(s, dir, "documents"), "doc_id", "text", chunkWords = 20))
  )

  // =========================================================================
  // DuckDB oracles. Same column names as the Spark side (the driver sorts
  // columns by name and hashes values). Tables are the raw parquet files.
  // =========================================================================
  // q90 / q217 / q239 share one oracle: the from-scratch full-corpus BM25 —
  // a freshly-built index, an appended one, and a minor-compacted one must
  // all be indistinguishable from the direct scan.
  private val bm25FullScratchSql: String =
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, cast(len(toks) as bigint) AS dl,
        |    list_filter(toks, x -> x IN ('spark', 'window', 'merge')) AS qt
        |  FROM t),
        |g AS (
        |  SELECT doc_id, dl, unnest(qt) AS term FROM d),
        |tfs AS (
        |  SELECT doc_id, dl, term, count(*) AS tf FROM g GROUP BY 1, 2, 3),
        |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM d),
        |wdf AS (
        |  SELECT tfs.*, count(*) OVER (PARTITION BY term) AS df FROM tfs),
        |scored AS (
        |  SELECT doc_id,
        |    cast(round(
        |      ln(1.0 + ((n_docs - df) + 0.5) / (df + 0.5)) *
        |      ((tf * (1.2 + 1.0)) /
        |       (tf + 1.2 * (1.0 - 0.75 +
        |          0.75 * dl / (cast(sum_dl as double) / n_docs)))) *
        |      1e9) as bigint) AS qs
        |  FROM wdf CROSS JOIN stats)
        |SELECT doc_id, count(*) AS n_terms,
        |  round(cast(sum(qs) as double) / 1e9, 6) AS score
        |FROM scored GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin

  // q219 / q237 share one oracle: append ≡ scratch over the quarter corpus
  // — batch vs streamed-epoch ingest must be indistinguishable. The Spark
  // side mines WITH the production maxDf=1000 stop-shingle cap; max shingle
  // df at sf0.01/sf0.1 is 7/25, so capped and uncapped mines are
  // row-identical and this uncapped SQL stays exact.
  private val pairAppendScratchSql: String =
      """WITH RECURSIVE t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents WHERE doc_id % 4 <= 1),
        |sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks) - 2)] END) AS s
        |  FROM t),
        |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
        |inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |cand AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |pairs AS (
        |  SELECT id_a, id_b FROM cand
        |  JOIN sizes na ON na.doc_id = id_a
        |  JOIN sizes nb ON nb.doc_id = id_b
        |  WHERE inter / cast(na.n + nb.n - inter as double) >= 0.8),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
        |labels AS (
        |  SELECT src AS doc_id, least(src, min(dst)) AS rep
        |  FROM reach GROUP BY src),
        |qual AS (
        |  SELECT doc_id, lang,
        |    round(
        |      least(length(text) / 500.0, 1.0) * 0.4 +
        |      least(len(list_filter(tk, x -> x IN
        |        ('the','a','of','and','to','der','die','das','und',
        |         'le','la','les','et','el','los','y','que')))
        |        / greatest(len(tk), 1.0) * 10.0, 1.0) * 0.3 +
        |      (CASE WHEN len(tk) = 0 THEN 0.0
        |            ELSE len(list_distinct(tk)) / cast(len(tk) as double)
        |       END) * 0.3,
        |    6) AS q
        |  FROM (SELECT doc_id, lang, text,
        |          list_filter(string_split(lower(text), ' '), x -> x <> '')
        |            AS tk
        |        FROM documents WHERE doc_id % 4 <= 1)),
        |winners AS (
        |  SELECT doc_id FROM (
        |    SELECT q.doc_id,
        |      row_number() OVER (PARTITION BY l.rep
        |        ORDER BY q.q DESC, q.doc_id) AS rn
        |    FROM qual q JOIN labels l USING (doc_id))
        |  WHERE rn = 1),
        |surv AS (
        |  SELECT doc_id FROM qual
        |  WHERE doc_id NOT IN (SELECT doc_id FROM labels)
        |  UNION ALL SELECT doc_id FROM winners)
        |SELECT q.lang, count(*) AS n_docs,
        |  cast(sum(s.doc_id) AS bigint) AS id_sum
        |FROM surv s JOIN qual q USING (doc_id)
        |GROUP BY q.lang""".stripMargin

  def oracleSql: Map[String, String] = ListMap(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | cast(sum(l_quantity) as bigint) AS sum_qty,
        | cast(round(sum(cast(l_extendedprice as decimal(18,2))), 2) as double)
        |   AS sum_base_price,
        | cast(round(sum(cast(l_extendedprice as decimal(18,2)) *
        |   (1 - cast(l_discount as decimal(18,2)))), 4) as double) AS sum_disc_price,
        | round(avg(l_quantity), 4) AS avg_qty,
        | count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    // The appended layout must surface the planted exact copies as the
    // exact top-5 (cos 1.0 at the 4-decimal grid) — q86's ground-truth
    // pattern through an APPEND instead of one write.
    "q216_ivf_append" ->
      """SELECT cast(i + 9400 as bigint) AS vec_id, 1.0 AS cos
        |FROM range(5) t(i)""".stripMargin,

// The append path must hash-match the from-scratch direct scan:
    // q217 is q90's SQL verbatim; q239 (minor-compacted index) likewise.
    "q217_bm25_append" -> bm25FullScratchSql,
    "q239_minor_compact" -> bm25FullScratchSql,
    "q242_stream_maintained" -> bm25FullScratchSql,

    // q90's arithmetic over the POST-REPAIR membership: members that lost
    // their postings (doc_id % 97 = 0 with tokens) are quarantined out;
    // token-less members stay (they legally have no postings). Ghost
    // purge = 3 rows, quarantine count derived from the same filter.
    "q243_bm25_fsck" ->
      """WITH t AS (
        |  SELECT doc_id, toks FROM (
        |    SELECT doc_id,
        |      list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
        |    FROM documents) z
        |  WHERE NOT (doc_id % 97 = 0 AND len(toks) > 0)),
        |d AS (
        |  SELECT doc_id, cast(len(toks) as bigint) AS dl,
        |    list_filter(toks, x -> x IN ('spark', 'window', 'merge')) AS qt
        |  FROM t),
        |g AS (
        |  SELECT doc_id, dl, unnest(qt) AS term FROM d),
        |tfs AS (
        |  SELECT doc_id, dl, term, count(*) AS tf FROM g GROUP BY 1, 2, 3),
        |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM d),
        |wdf AS (
        |  SELECT tfs.*, count(*) OVER (PARTITION BY term) AS df FROM tfs),
        |scored AS (
        |  SELECT doc_id,
        |    cast(round(
        |      ln(1.0 + ((n_docs - df) + 0.5) / (df + 0.5)) *
        |      ((tf * (1.2 + 1.0)) /
        |       (tf + 1.2 * (1.0 - 0.75 +
        |          0.75 * dl / (cast(sum_dl as double) / n_docs)))) *
        |      1e9) as bigint) AS qs
        |  FROM wdf CROSS JOIN stats),
        |topk AS (
        |  SELECT doc_id, count(*) AS n_terms,
        |    round(cast(sum(qs) as double) / 1e9, 6) AS score
        |  FROM scored GROUP BY doc_id
        |  ORDER BY score DESC, doc_id LIMIT 15)
        |SELECT topk.*, cast(3 as bigint) AS orphan_rows,
        |  (SELECT count(*) FROM (
        |    SELECT doc_id,
        |      list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
        |    FROM documents) z
        |   WHERE doc_id % 97 = 0 AND len(toks) > 0) AS quarantined_docs
        |FROM topk""".stripMargin,

    // All seven misrouted copies resurface at cos 1.0 after the repair;
    // they shared one (wrong) cell, so exactly one cell rewrites.
    "q244_ivf_fsck" ->
      """SELECT cast(i + 9500 as bigint) AS vec_id, 1.0 AS cos,
        |  cast(7 as bigint) AS misrouted_rows,
        |  cast(1 as bigint) AS cells_rewritten
        |FROM range(7) t(i)""".stripMargin,

    // Occupied-leaf count replayed from the term -> md5-60-bit -> %64
    // bucket function (q87's hex idiom); every occupied leaf must take
    // exactly one MINOR action and end at one live file, nothing retained;
    // n_postings ties the maintained layout's row multiset to the
    // from-scratch tokenization.
    "q240_auto_maintain" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
        |  FROM documents),
        |g AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM t),
        |b AS (SELECT DISTINCT
        |        ('0x' || substr(md5(term), 1, 15))::BIGINT % 64 AS bucket
        |      FROM g)
        |SELECT (SELECT count(*) FROM b) AS n_leaves,
        |  TRUE AS all_minored,
        |  cast(1 as bigint) AS max_files_after,
        |  cast(0 as bigint) AS retained_after,
        |  (SELECT count(*) FROM g) AS n_postings""".stripMargin,

    // q90's probe SQL wrapped with the heal/sweep constants: one healed
    // MANIFEST and one swept orphan per occupied term bucket.
    "q241_layout_fsck" ->
      s"""WITH p AS ($bm25FullScratchSql),
        |terms AS (
        |  SELECT DISTINCT unnest(list_filter(
        |    string_split(lower(text), ' '), x -> x <> '')) AS term
        |  FROM documents),
        |b AS (SELECT DISTINCT
        |        ('0x' || substr(md5(term), 1, 15))::BIGINT % 64 AS bucket
        |      FROM terms)
        |SELECT p.*, (SELECT count(*) FROM b) AS healed_manifests,
        |  (SELECT count(*) FROM b) AS swept_orphans, TRUE AS all_ok
        |FROM p""".stripMargin,

    "q218_embedding_drift" ->
      """WITH g AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
        |    cast(round(cast(unnest(embedding) as double) * 1e6) as bigint)
        |      AS xm
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |o AS (
        |  SELECT dim, count(*) AS n_old, sum(cast(xm as hugeint)) AS s_old
        |  FROM g WHERE vec_id % 2 = 0 GROUP BY 1),
        |n AS (
        |  SELECT dim, count(*) AS n_new, sum(cast(xm as hugeint)) AS s_new
        |  FROM g WHERE vec_id % 2 = 1 GROUP BY 1)
        |SELECT cast(dim as bigint) AS dim,
        |  coalesce(o.n_old, 0) AS n_old, coalesce(n.n_new, 0) AS n_new,
        |  cast((1000 * s_old) // n_old as bigint) AS mean_old_nano,
        |  cast((1000 * s_new) // n_new as bigint) AS mean_new_nano,
        |  cast((1000 * s_new) // n_new - (1000 * s_old) // n_old as bigint)
        |    AS shift_nano
        |FROM o FULL JOIN n USING (dim)""".stripMargin,

    // q219: append ≡ scratch (uncapped) — q165's SQL over the quarter
    // corpus with the cap CTE removed.
    // q219 additionally rides the capped==uncapped assumption check: the
    // oracle pins the LITERAL true, the Spark side measures the corpus
    "q219_pair_append" ->
      s"SELECT *, true AS df_cap_ok FROM (\n$pairAppendScratchSql\n)",

    // Streamed-epoch ingest with a full replay ≡ the same scratch mine:
    // q219's oracle verbatim.
    "q237_stream_pair_ingest" -> pairAppendScratchSql,

    // The pre-delete index in closed form: every planted copy, including
    // the 4 the takedown removed from the live index (q226's inverse).
    "q238_ivf_undo" ->
      """SELECT cast(i + 9500 as bigint) AS vec_id, 1.0 AS cos
        |FROM range(7) t(i)""".stripMargin,

    // The undo probe scores the FULL pre-delete corpus: q90's from-scratch
    // SQL verbatim (build + append + takedown must leave the previous view
    // indistinguishable from never having deleted).
    "q245_bm25_undo" -> bm25FullScratchSql,

    // Same closed form as q238: the previous view still holds all seven
    // planted exact copies of the query vector.
    "q246_srp_undo" ->
      """SELECT cast(i + 9500 as bigint) AS vec_id, 1.0 AS cos
        |FROM range(7) t(i)""".stripMargin,

    // The upsert replayed in SQL; exactly one planted stray, one dead
    // staging dir and one torn index tmp are swept, nothing unhealable.
    // A read that saw the stray would double every row of its key range
    // and break the hash.
    "q247_keyed_fsck" ->
      """SELECT c_custkey AS key,
        |  CASE WHEN c_custkey % 101 = 0 THEN 'UPD_' || c_name
        |       ELSE c_name END AS name,
        |  cast(1 as bigint) AS swept_strays, cast(1 as bigint) AS swept_dirs,
        |  cast(1 as bigint) AS swept_tmp, true AS all_ok
        |FROM customer""".stripMargin,

    // The undo view is the UNTOUCHED base table: the upsert rewrote some
    // ranges, the previous index version still names their originals.
    "q248_keyed_undo" ->
      "SELECT c_custkey AS key, c_name AS name FROM customer",

    // Composite I/O round trip: the TSV/stage/table/multi-table hops are
    // lossless, so the filtered rows are plain customer algebra; the
    // ride-along witnesses (line/segment/limit counts, the point get) are
    // scalar subqueries over the same table.
    "q249_io_composite" ->
      """SELECT c_custkey AS key, c_name AS name, c_acctbal AS bal,
        |  (SELECT count(*) FROM customer) AS line_cnt,
        |  (SELECT count(*) FROM customer WHERE c_mktsegment = 'BUILDING')
        |    AS seg_cnt,
        |  least(7, (SELECT count(*) FROM customer)) AS limited_cnt,
        |  (SELECT c_name FROM customer WHERE c_custkey = 42) AS point_name
        |FROM customer
        |WHERE c_name LIKE 'Customer#00000014%'
        |  AND c_acctbal IS NOT NULL
        |  AND c_mktsegment >= 'B'""".stripMargin,

    // MutationBatch precedence replayed in SQL: deletes (key%101) remove
    // rows, puts re-insert their keys (key%7 / key%14) with family cells
    // merged LAST-WIN per qualifier, increments (key%11) add 1000 with
    // missing-as-zero semantics (so nat is never NULL after the step on a
    // row the increment touched OR that survived with a base value; put-
    // reinserted untouched rows read 0 through the increment's coalesce).
    "q250_mutation_batch" ->
      """WITH base AS (
        |  SELECT c_custkey AS key,
        |    cast(round(c_acctbal * 100) AS bigint) AS bal,
        |    cast(c_nationkey AS bigint) AS nat0
        |  FROM customer),
        |kept AS (SELECT * FROM base WHERE key % 101 <> 0),
        |mkeys AS (
        |  SELECT key FROM kept
        |  UNION SELECT key FROM base WHERE key % 7 = 0
        |  UNION SELECT key FROM base WHERE key % 11 = 0),
        |merged AS (
        |  SELECT m.key,
        |    CASE WHEN k.key IS NOT NULL THEN k.nat0 ELSE 0 END +
        |    CASE WHEN m.key % 11 = 0 THEN 1000 ELSE 0 END AS nat,
        |    k.bal, (k.key IS NOT NULL) AS has_base
        |  FROM mkeys m LEFT JOIN kept k USING (key)),
        |cells AS (
        |  SELECT key, 'base' AS qual, bal AS cell FROM merged WHERE has_base
        |  UNION ALL
        |  SELECT key, 'd1',
        |    CASE WHEN key % 14 = 0 THEN 200 ELSE 100 END
        |  FROM merged WHERE key % 7 = 0
        |  UNION ALL
        |  SELECT key, 'd2', 5 FROM merged WHERE key % 14 = 0),
        |buckets AS (
        |  SELECT key % 10 AS bucket, count(*) AS n,
        |    cast(sum(nat) AS bigint) AS nat_sum
        |  FROM merged GROUP BY 1)
        |SELECT c.key, c.qual, cast(c.cell AS bigint) AS cell, m.nat,
        |  b.bucket, b.n, b.nat_sum,
        |  (SELECT count(*) FROM base WHERE key % 101 = 0) AS n_del,
        |  (SELECT count(*) FROM base WHERE key % 7 = 0) +
        |    (SELECT count(*) FROM base WHERE key % 14 = 0) AS n_put,
        |  (SELECT count(*) FROM base WHERE key % 11 = 0) AS n_inc
        |FROM cells c
        |JOIN merged m USING (key)
        |JOIN buckets b ON c.key % 10 = b.bucket""".stripMargin,

    // Keep-N undo, keyed store: two mutations back is the untouched base.
    "q251_keyed_undo2" ->
      "SELECT c_custkey AS key, c_name AS name FROM customer",

    // Keep-N undo, manifest layout: two rewrites back is the original write.
    "q252_manifest_undo2" ->
      "SELECT c_custkey AS key, c_name AS name FROM customer",

    // Fenced-race debris: reads exact before AND after the heal; fsck
    // sweeps one claimed orphan generation and two dead artifacts (the
    // torn pointer version + the stale claim) without touching the
    // pointer (healed = false — the live pointer was never invalid).
    "q253_fence_debris_fsck" ->
      """SELECT c_custkey AS key, c_name AS name,
        |  (SELECT count(*) FROM customer WHERE c_custkey % 7 <> 0) AS pre_n,
        |  false AS healed,
        |  cast(1 as bigint) AS swept_orphans,
        |  cast(2 as bigint) AS swept_tmp,
        |  true AS all_ok
        |FROM customer
        |WHERE c_custkey % 7 <> 0""".stripMargin,

    // DDL + typed MR + counters composite: per-language token rollup must
    // equal the direct SQL; the plan-riding counters must equal the global
    // scan stats; the DDL round-trip is pinned by ddl_has_ttl (the Spark
    // side computes it from the EMITTED script text).
    "q254_ddl_mr_counters" ->
      """WITH tok AS (
        |  SELECT lang,
        |    cast(len(list_filter(string_split(text, ' '), x -> x <> ''))
        |      as bigint) AS n
        |  FROM documents),
        |g AS (SELECT lang, count(*) AS n_docs,
        |        cast(sum(n) as bigint) AS tok_sum FROM tok GROUP BY lang),
        |c AS (SELECT count(*) AS mapper_rows,
        |        cast(sum(n) as bigint) AS mapper_tokens FROM tok)
        |SELECT g.lang, g.n_docs, g.tok_sum,
        |  c.mapper_rows, c.mapper_tokens, true AS ddl_has_ttl
        |FROM g CROSS JOIN c""".stripMargin,

    // Persisted-cluster maintenance: the incrementally-maintained table
    // must equal the from-scratch transitive clustering of the union pair
    // set at threshold 0.8 (min-id representatives, sizes re-derived);
    // the blind retry applied nothing (retry_n = 0).
    "q255_cluster_maintain" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents WHERE doc_id % 4 <= 1),
        |sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks) - 2)] END) AS s
        |  FROM t),
        |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
        |inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |cand AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |pairs AS (
        |  SELECT id_a, id_b FROM cand
        |  JOIN sizes na ON na.doc_id = id_a
        |  JOIN sizes nb ON nb.doc_id = id_b
        |  WHERE inter / cast(na.n + nb.n - inter as double) >= 0.8),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
        |labels AS (
        |  SELECT src AS doc_id, least(src, min(dst)) AS rep
        |  FROM reach GROUP BY src),
        |csize AS (SELECT rep, count(*) AS cluster_size FROM labels GROUP BY rep)
        |SELECT l.doc_id, l.rep, c.cluster_size,
        |  true AS applied, cast(0 as bigint) AS retry_n
        |FROM labels l JOIN csize c USING (rep)""".stripMargin,

    // Cluster takedown: the maintained-then-takendown table must equal the
    // from-scratch transitive clustering of the SURVIVING corpus (the
    // %4==2 slice plus its id-shifted mirror, minus doc_id%7==0) — and an
    // exact takedown leaves repairClusters nothing to heal (all-zero
    // counts riding).
    "q256_cluster_takedown" ->
      """WITH RECURSIVE b AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 4 = 2),
        |corpus AS (
        |  SELECT doc_id, text FROM b
        |  UNION ALL SELECT doc_id + 10000000, text FROM b),
        |surv AS (SELECT doc_id, text FROM corpus WHERE doc_id % 7 <> 0),
        |t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM surv),
        |sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks) - 2)] END) AS s
        |  FROM t),
        |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
        |inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |cand AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |pairs AS (
        |  SELECT id_a, id_b FROM cand
        |  JOIN sizes na ON na.doc_id = id_a
        |  JOIN sizes nb ON nb.doc_id = id_b
        |  WHERE inter / cast(na.n + nb.n - inter as double) >= 0.8),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
        |labels AS (
        |  SELECT src AS doc_id, least(src, min(dst)) AS rep
        |  FROM reach GROUP BY src),
        |csize AS (SELECT rep, count(*) AS cluster_size FROM labels GROUP BY rep)
        |SELECT l.doc_id, l.rep, c.cluster_size,
        |  true AS applied, cast(0 as bigint) AS dangling,
        |  cast(0 as bigint) AS min_viol, cast(0 as bigint) AS healed,
        |  true AS df_cap_ok
        |FROM labels l JOIN csize c USING (rep)""".stripMargin,

    // Streamed cluster ingest replayed twice must be indistinguishable
    // from one from-scratch clustering of the union pair set — q255's
    // oracle without the riding columns.
    "q257_stream_cluster_ingest" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents WHERE doc_id % 4 <= 1),
        |sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks) - 2)] END) AS s
        |  FROM t),
        |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
        |inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |cand AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |pairs AS (
        |  SELECT id_a, id_b FROM cand
        |  JOIN sizes na ON na.doc_id = id_a
        |  JOIN sizes nb ON nb.doc_id = id_b
        |  WHERE inter / cast(na.n + nb.n - inter as double) >= 0.8),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
        |labels AS (
        |  SELECT src AS doc_id, least(src, min(dst)) AS rep
        |  FROM reach GROUP BY src),
        |csize AS (SELECT rep, count(*) AS cluster_size FROM labels GROUP BY rep)
        |SELECT l.doc_id, l.rep, c.cluster_size
        |FROM labels l JOIN csize c USING (rep)""".stripMargin,

    // DDL alter: the altered table serves the per-lang rollup through the
    // widened schema; the three executed-DDL proofs ride as booleans the
    // Spark side computes from the LIVE catalog and the emitted script.
    "q258_ddl_alter" ->
      """WITH tok AS (
        |  SELECT lang,
        |    cast(len(list_filter(string_split(text, ' '), x -> x <> ''))
        |      as bigint) AS n
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs, cast(sum(n) as bigint) AS tok_sum,
        |  true AS alter_adds_family, true AS alter_sets_ttl,
        |  true AS ttl_applied, true AS old_reads_null
        |FROM tok GROUP BY lang""".stripMargin,

    // Decimal-keyed lifecycle: replay the upsert + insert + delete merge
    // over decimal(12,2) keys in SQL.
    "q259_decimal_store" ->
      """WITH c AS (
        |  SELECT cast(c_custkey as decimal(12,2)) + 0.25 AS key,
        |         c_custkey, c_name, c_mktsegment FROM customer),
        |upd AS (SELECT c_custkey, 'UPD_' || c_name AS c_name FROM c
        |        WHERE c_custkey % 97 = 0),
        |merged AS (
        |  SELECT c.key, coalesce(u.c_name, c.c_name) AS name,
        |         c.c_mktsegment AS segment, c.c_custkey
        |  FROM c LEFT JOIN upd u ON c.c_custkey = u.c_custkey
        |  UNION ALL
        |  SELECT cast(c.key + 10000000 as decimal(12,2)) AS key,
        |         'NEW_' || c_name AS name, c_mktsegment AS segment,
        |         c_custkey + 10000000 AS c_custkey
        |  FROM c WHERE c_custkey % 131 = 0)
        |SELECT cast(key as double) AS key, name, segment FROM merged
        |WHERE c_custkey % 113 <> 0 OR c_custkey > 10000000""".stripMargin,

    // Lazy pair takedown: the tombstone-masked (and then physically
    // compacted) layout's keep-best report must equal the same report
    // from a scratch mine of the SURVIVING corpus (mirrored %4==3 slice
    // minus doc_id%9==0); the lifecycle proofs ride as literals.
    "q260_pair_tombstone" ->
      """WITH RECURSIVE b AS (
        |  SELECT doc_id, lang, text FROM documents WHERE doc_id % 4 = 3),
        |corpus AS (
        |  SELECT doc_id, lang, text FROM b
        |  UNION ALL SELECT doc_id + 20000000, lang, text FROM b),
        |surv AS (SELECT * FROM corpus WHERE doc_id % 9 <> 0),
        |t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM surv),
        |sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks) - 2)] END) AS s
        |  FROM t),
        |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
        |inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |cand AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |pairs AS (
        |  SELECT id_a, id_b FROM cand
        |  JOIN sizes na ON na.doc_id = id_a
        |  JOIN sizes nb ON nb.doc_id = id_b
        |  WHERE inter / cast(na.n + nb.n - inter as double) >= 0.8),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
        |labels AS (
        |  SELECT src AS doc_id, least(src, min(dst)) AS rep
        |  FROM reach GROUP BY src),
        |qual AS (
        |  SELECT doc_id, lang,
        |    round(
        |      least(length(text) / 500.0, 1.0) * 0.4 +
        |      least(len(list_filter(tk, x -> x IN
        |        ('the','a','of','and','to','der','die','das','und',
        |         'le','la','les','et','el','los','y','que')))
        |        / greatest(len(tk), 1.0) * 10.0, 1.0) * 0.3 +
        |      (CASE WHEN len(tk) = 0 THEN 0.0
        |            ELSE len(list_distinct(tk)) / cast(len(tk) as double)
        |       END) * 0.3,
        |    6) AS q
        |  FROM (SELECT doc_id, lang, text,
        |          list_filter(string_split(lower(text), ' '), x -> x <> '')
        |            AS tk
        |        FROM surv)),
        |winners AS (
        |  SELECT doc_id FROM (
        |    SELECT q.doc_id,
        |      row_number() OVER (PARTITION BY l.rep
        |        ORDER BY q.q DESC, q.doc_id) AS rn
        |    FROM qual q JOIN labels l USING (doc_id))
        |  WHERE rn = 1),
        |kept AS (
        |  SELECT doc_id FROM qual
        |  WHERE doc_id NOT IN (SELECT doc_id FROM labels)
        |  UNION ALL SELECT doc_id FROM winners)
        |SELECT q.lang, count(*) AS n_docs,
        |  cast(sum(k.doc_id) AS bigint) AS id_sum,
        |  true AS tombstoned, true AS drained, true AS pre_post_equal
        |FROM kept k JOIN qual q USING (doc_id)
        |GROUP BY q.lang""".stripMargin,

    // q268: the withdrawal inverse — same report machinery as q260 but the
    // oracle replays the FULL corpus: a fully-withdrawn takedown must be
    // indistinguishable from never having filed it.
    "q268_untombstone" ->
      """WITH RECURSIVE b AS (
        |  SELECT doc_id, lang, text FROM documents WHERE doc_id % 4 = 3),
        |corpus AS (
        |  SELECT doc_id, lang, text FROM b
        |  UNION ALL SELECT doc_id + 20000000, lang, text FROM b),
        |surv AS (SELECT * FROM corpus),
        |t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM surv),
        |sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks) - 2)] END) AS s
        |  FROM t),
        |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
        |inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |cand AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |pairs AS (
        |  SELECT id_a, id_b FROM cand
        |  JOIN sizes na ON na.doc_id = id_a
        |  JOIN sizes nb ON nb.doc_id = id_b
        |  WHERE inter / cast(na.n + nb.n - inter as double) >= 0.8),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
        |labels AS (
        |  SELECT src AS doc_id, least(src, min(dst)) AS rep
        |  FROM reach GROUP BY src),
        |qual AS (
        |  SELECT doc_id, lang,
        |    round(
        |      least(length(text) / 500.0, 1.0) * 0.4 +
        |      least(len(list_filter(tk, x -> x IN
        |        ('the','a','of','and','to','der','die','das','und',
        |         'le','la','les','et','el','los','y','que')))
        |        / greatest(len(tk), 1.0) * 10.0, 1.0) * 0.3 +
        |      (CASE WHEN len(tk) = 0 THEN 0.0
        |            ELSE len(list_distinct(tk)) / cast(len(tk) as double)
        |       END) * 0.3,
        |    6) AS q
        |  FROM (SELECT doc_id, lang, text,
        |          list_filter(string_split(lower(text), ' '), x -> x <> '')
        |            AS tk
        |        FROM surv)),
        |winners AS (
        |  SELECT doc_id FROM (
        |    SELECT q.doc_id,
        |      row_number() OVER (PARTITION BY l.rep
        |        ORDER BY q.q DESC, q.doc_id) AS rn
        |    FROM qual q JOIN labels l USING (doc_id))
        |  WHERE rn = 1),
        |kept AS (
        |  SELECT doc_id FROM qual
        |  WHERE doc_id NOT IN (SELECT doc_id FROM labels)
        |  UNION ALL SELECT doc_id FROM winners)
        |SELECT q.lang, count(*) AS n_docs,
        |  cast(sum(k.doc_id) AS bigint) AS id_sum,
        |  true AS tombstoned, true AS withdrawn_all, true AS sidecar_empty
        |FROM kept k JOIN qual q USING (doc_id)
        |GROUP BY q.lang""".stripMargin,

    // The streaming reservoir is a pure function of the id set: the
    // oracle is simply the k smallest md5 priorities over the corpus.
    "q220_stream_reservoir" ->
      """SELECT doc_id,
        |  ('0x' || substr(md5(cast(doc_id as varchar)), 1, 15))::BIGINT
        |    AS priority
        |FROM documents
        |ORDER BY priority, doc_id
        |LIMIT 50""".stripMargin,

    // q221: the two-stage ingest loop replayed exactly — day-2 drops are
    // vs corpus PLUS day-1 survivors (survivors defined by the day-1 rule).
    "q221_ingest_loop" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, source, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks) - 2)] END) AS s
        |  FROM t),
        |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
        |inv AS (SELECT doc_id, source, unnest(s) AS g FROM sh),
        |p1 AS (
        |  SELECT a.doc_id AS bid, b.doc_id AS cid, count(*) AS inter
        |  FROM inv a JOIN inv b
        |    ON a.g = b.g AND a.source = 'src0'
        |    AND b.source NOT IN ('src0', 'src1')
        |  GROUP BY 1, 2),
        |drop1 AS (
        |  SELECT DISTINCT bid FROM p1
        |  JOIN sizes na ON na.doc_id = bid
        |  JOIN sizes nb ON nb.doc_id = cid
        |  WHERE inter / cast(na.n + nb.n - inter as double) >= 0.8),
        |p2 AS (
        |  SELECT a.doc_id AS bid, b.doc_id AS cid, count(*) AS inter
        |  FROM inv a JOIN inv b
        |    ON a.g = b.g AND a.source = 'src1'
        |    AND (b.source NOT IN ('src0', 'src1')
        |         OR (b.source = 'src0'
        |             AND b.doc_id NOT IN (SELECT bid FROM drop1)))
        |  GROUP BY 1, 2),
        |drop2 AS (
        |  SELECT DISTINCT bid FROM p2
        |  JOIN sizes na ON na.doc_id = bid
        |  JOIN sizes nb ON nb.doc_id = cid
        |  WHERE inter / cast(na.n + nb.n - inter as double) >= 0.8)
        |SELECT doc_id, lang FROM documents
        |WHERE source = 'src1'
        |  AND doc_id NOT IN (SELECT bid FROM drop2)""".stripMargin,

    // q222 proves the day-2 probe is OBLIVIOUS to the mid-loop band/docs
    // compaction: the oracle is q221's exact two-stage rule, verbatim.
    "q222_ingest_compact" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, source, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks) - 2)] END) AS s
        |  FROM t),
        |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
        |inv AS (SELECT doc_id, source, unnest(s) AS g FROM sh),
        |p1 AS (
        |  SELECT a.doc_id AS bid, b.doc_id AS cid, count(*) AS inter
        |  FROM inv a JOIN inv b
        |    ON a.g = b.g AND a.source = 'src0'
        |    AND b.source NOT IN ('src0', 'src1')
        |  GROUP BY 1, 2),
        |drop1 AS (
        |  SELECT DISTINCT bid FROM p1
        |  JOIN sizes na ON na.doc_id = bid
        |  JOIN sizes nb ON nb.doc_id = cid
        |  WHERE inter / cast(na.n + nb.n - inter as double) >= 0.8),
        |p2 AS (
        |  SELECT a.doc_id AS bid, b.doc_id AS cid, count(*) AS inter
        |  FROM inv a JOIN inv b
        |    ON a.g = b.g AND a.source = 'src1'
        |    AND (b.source NOT IN ('src0', 'src1')
        |         OR (b.source = 'src0'
        |             AND b.doc_id NOT IN (SELECT bid FROM drop1)))
        |  GROUP BY 1, 2),
        |drop2 AS (
        |  SELECT DISTINCT bid FROM p2
        |  JOIN sizes na ON na.doc_id = bid
        |  JOIN sizes nb ON nb.doc_id = cid
        |  WHERE inter / cast(na.n + nb.n - inter as double) >= 0.8)
        |SELECT doc_id, lang FROM documents
        |WHERE source = 'src1'
        |  AND doc_id NOT IN (SELECT bid FROM drop2)""".stripMargin,

    // q223: q91's cross-corpus rule with every REMOVED corpus doc
    // (doc_id % 100 in (32, 91) — both takedown waves) excluded from the
    // veto side — a deleted doc must stop vetoing whether its band rows
    // were physically purged (wave 1, compacted) or only tombstoned
    // (wave 2). The classes hit real vetoers (332 at sf0.01, 391 at
    // sf0.001), so the expected survivor set DIFFERS from q91's.
    "q223_index_delete" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, source, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks) - 2)] END) AS s
        |  FROM t),
        |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
        |inv AS (SELECT doc_id, source, unnest(s) AS g FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS bid, b.doc_id AS cid, count(*) AS inter
        |  FROM inv a JOIN inv b
        |    ON a.g = b.g AND a.source = 'src0' AND b.source <> 'src0'
        |    AND b.doc_id % 100 NOT IN (32, 91)
        |  GROUP BY 1, 2),
        |dropped AS (
        |  SELECT DISTINCT bid FROM pairs
        |  JOIN sizes na ON na.doc_id = bid
        |  JOIN sizes nb ON nb.doc_id = cid
        |  WHERE inter / cast(na.n + nb.n - inter as double) >= 0.8)
        |SELECT doc_id, lang FROM documents
        |WHERE source = 'src0'
        |  AND doc_id NOT IN (SELECT bid FROM dropped)""".stripMargin,

    // q224: the fresh full-mine curve restricted to deciles >= the raised
    // 0.5 floor — the pruned table must serve those rows exactly (pairs
    // between the old 0.2 floor and 0.5 never reach decile 5, so pruning
    // them is invisible here; quotient >= 0.5 and the integer decile test
    // 2*inter >= uni agree exactly because 0.5 is a power of two).
    "q224_pair_retention" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks) - 2)] END) AS s
        |  FROM t),
        |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
        |inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |keep AS (SELECT g FROM inv GROUP BY g HAVING count(*) <= 1000),
        |invk AS (SELECT inv.* FROM inv JOIN keep USING (g)),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM invk a JOIN invk b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |j AS (
        |  SELECT id_b, inter, na.n + nb.n - inter AS uni
        |  FROM pairs
        |  JOIN sizes na ON na.doc_id = id_a
        |  JOIN sizes nb ON nb.doc_id = id_b
        |  WHERE inter / cast(na.n + nb.n - inter as double) >= 0.2),
        |x AS (
        |  SELECT id_b, d FROM j CROSS JOIN
        |    (SELECT unnest(generate_series(5, 10)) AS d)
        |  WHERE inter * 10 >= d * uni)
        |SELECT cast(d * 100 as bigint) AS threshold_permille,
        |  count(*) AS n_pairs,
        |  cast(count(DISTINCT id_b) as bigint) AS n_victims
        |FROM x GROUP BY d""".stripMargin,

    // q225: q90's BM25 arithmetic verbatim over the SURVIVING corpus —
    // deleting any doc moves N (and so every idf), so a ghost posting or a
    // stale stats row cannot pass this.
    "q225_bm25_delete" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
        |  FROM documents WHERE doc_id % 7 <> 3),
        |d AS (
        |  SELECT doc_id, cast(len(toks) as bigint) AS dl,
        |    list_filter(toks, x -> x IN ('spark', 'window', 'merge')) AS qt
        |  FROM t),
        |g AS (
        |  SELECT doc_id, dl, unnest(qt) AS term FROM d),
        |tfs AS (
        |  SELECT doc_id, dl, term, count(*) AS tf FROM g GROUP BY 1, 2, 3),
        |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM d),
        |wdf AS (
        |  SELECT tfs.*, count(*) OVER (PARTITION BY term) AS df FROM tfs),
        |scored AS (
        |  SELECT doc_id,
        |    cast(round(
        |      ln(1.0 + ((n_docs - df) + 0.5) / (df + 0.5)) *
        |      ((tf * (1.2 + 1.0)) /
        |       (tf + 1.2 * (1.0 - 0.75 +
        |          0.75 * dl / (cast(sum_dl as double) / n_docs)))) *
        |      1e9) as bigint) AS qs
        |  FROM wdf CROSS JOIN stats)
        |SELECT doc_id, count(*) AS n_terms,
        |  round(cast(sum(qs) as double) / 1e9, 6) AS score
        |FROM scored GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin,

    // Exactly the three SURVIVING planted copies (cos 1.0 at the 4-decimal
    // grid); the four deleted ghosts must not surface.
    "q226_ivf_delete" ->
      """SELECT cast(9501 + i * 2 as bigint) AS vec_id, 1.0 AS cos
        |FROM range(3) t(i)""".stripMargin,

    // q261: the lazy-takedown twin — same surviving planted copies at cos
    // 1.0, with the tombstone-lifecycle proofs riding as literals.
    "q261_ivf_tombstone" ->
      """SELECT cast(9501 + i * 2 as bigint) AS vec_id, 1.0 AS cos,
        |  true AS tombstoned, true AS drained, true AS pre_post_equal
        |FROM range(3) t(i)""".stripMargin,

    // q263: the SRP bucketed layout's lazy-takedown twin — same closed
    // form (the three surviving planted copies at cos 1.0), with the
    // tombstone-lifecycle proofs riding as literals.
    "q263_srp_tombstone" ->
      """SELECT cast(9501 + i * 2 as bigint) AS vec_id, 1.0 AS cos,
        |  true AS tombstoned, true AS drained, true AS pre_post_equal
        |FROM range(3) t(i)""".stripMargin,

    // q264: the backup holds exactly the pre-overwrite content (%3 in 0,1)
    // while the source moved on to the %3==2 slice — any stale pointer,
    // dropped retained ref, or accidental share with the live table breaks
    // either the row set or the rider.
    "q264_snapshot_clone" ->
      """SELECT c_custkey, c_acctbal, true AS copied,
        |  (SELECT count(*) FROM customer WHERE c_custkey % 3 = 2) AS src_rows
        |FROM customer WHERE c_custkey % 3 IN (0, 1)""".stripMargin,

    // q265: the CLONE still ranks like a from-scratch index of the first
    // takedown's survivors (doc_id % 7 <> 5) — q262's BM25 arithmetic over
    // that slice — even after the source drained and took down % 7 == 1.
    "q265_layout_clone" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
        |  FROM documents WHERE doc_id % 7 <> 5),
        |d AS (
        |  SELECT doc_id, cast(len(toks) as bigint) AS dl,
        |    list_filter(toks, x -> x IN ('spark', 'window', 'merge')) AS qt
        |  FROM t),
        |g AS (
        |  SELECT doc_id, dl, unnest(qt) AS term FROM d),
        |tfs AS (
        |  SELECT doc_id, dl, term, count(*) AS tf FROM g GROUP BY 1, 2, 3),
        |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM d),
        |wdf AS (
        |  SELECT tfs.*, count(*) OVER (PARTITION BY term) AS df FROM tfs),
        |scored AS (
        |  SELECT doc_id,
        |    cast(round(
        |      ln(1.0 + ((n_docs - df) + 0.5) / (df + 0.5)) *
        |      ((tf * (1.2 + 1.0)) /
        |       (tf + 1.2 * (1.0 - 0.75 +
        |          0.75 * dl / (cast(sum_dl as double) / n_docs)))) *
        |      1e9) as bigint) AS qs
        |  FROM wdf CROSS JOIN stats)
        |SELECT doc_id, count(*) AS n_terms,
        |  round(cast(sum(qs) as double) / 1e9, 6) AS score,
        |  true AS copied
        |FROM scored GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin,

    // q262: q225's lazy-takedown twin — q90's BM25 arithmetic verbatim
    // over the surviving corpus (doc_id % 7 <> 5), with the
    // tombstone-lifecycle proofs riding as literals.
    "q262_bm25_tombstone" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
        |  FROM documents WHERE doc_id % 7 <> 5),
        |d AS (
        |  SELECT doc_id, cast(len(toks) as bigint) AS dl,
        |    list_filter(toks, x -> x IN ('spark', 'window', 'merge')) AS qt
        |  FROM t),
        |g AS (
        |  SELECT doc_id, dl, unnest(qt) AS term FROM d),
        |tfs AS (
        |  SELECT doc_id, dl, term, count(*) AS tf FROM g GROUP BY 1, 2, 3),
        |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM d),
        |wdf AS (
        |  SELECT tfs.*, count(*) OVER (PARTITION BY term) AS df FROM tfs),
        |scored AS (
        |  SELECT doc_id,
        |    cast(round(
        |      ln(1.0 + ((n_docs - df) + 0.5) / (df + 0.5)) *
        |      ((tf * (1.2 + 1.0)) /
        |       (tf + 1.2 * (1.0 - 0.75 +
        |          0.75 * dl / (cast(sum_dl as double) / n_docs)))) *
        |      1e9) as bigint) AS qs
        |  FROM wdf CROSS JOIN stats)
        |SELECT doc_id, count(*) AS n_terms,
        |  round(cast(sum(qs) as double) / 1e9, 6) AS score,
        |  true AS tombstoned, true AS drained, true AS pre_post_equal
        |FROM scored GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin,

    // q227: q219's uncapped keep-best SQL over the SURVIVING half corpus —
    // pair evidence is pairwise, so the post-delete table must replay the
    // scratch mine of the survivors bit-for-bit.
    "q227_pair_delete" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents WHERE doc_id % 4 <= 1 AND doc_id % 8 <> 1),
        |sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks) - 2)] END) AS s
        |  FROM t),
        |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
        |inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |cand AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |pairs AS (
        |  SELECT id_a, id_b FROM cand
        |  JOIN sizes na ON na.doc_id = id_a
        |  JOIN sizes nb ON nb.doc_id = id_b
        |  WHERE inter / cast(na.n + nb.n - inter as double) >= 0.8),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
        |labels AS (
        |  SELECT src AS doc_id, least(src, min(dst)) AS rep
        |  FROM reach GROUP BY src),
        |qual AS (
        |  SELECT doc_id, lang,
        |    round(
        |      least(length(text) / 500.0, 1.0) * 0.4 +
        |      least(len(list_filter(tk, x -> x IN
        |        ('the','a','of','and','to','der','die','das','und',
        |         'le','la','les','et','el','los','y','que')))
        |        / greatest(len(tk), 1.0) * 10.0, 1.0) * 0.3 +
        |      (CASE WHEN len(tk) = 0 THEN 0.0
        |            ELSE len(list_distinct(tk)) / cast(len(tk) as double)
        |       END) * 0.3,
        |    6) AS q
        |  FROM (SELECT doc_id, lang, text,
        |          list_filter(string_split(lower(text), ' '), x -> x <> '')
        |            AS tk
        |        FROM documents WHERE doc_id % 4 <= 1 AND doc_id % 8 <> 1)),
        |winners AS (
        |  SELECT doc_id FROM (
        |    SELECT q.doc_id,
        |      row_number() OVER (PARTITION BY l.rep
        |        ORDER BY q.q DESC, q.doc_id) AS rn
        |    FROM qual q JOIN labels l USING (doc_id))
        |  WHERE rn = 1),
        |surv AS (
        |  SELECT doc_id FROM qual
        |  WHERE doc_id NOT IN (SELECT doc_id FROM labels)
        |  UNION ALL SELECT doc_id FROM winners)
        |SELECT q.lang, count(*) AS n_docs,
        |  cast(sum(s.doc_id) AS bigint) AS id_sum
        |FROM surv s JOIN qual q USING (doc_id)
        |GROUP BY q.lang""".stripMargin,

    // q228: the day-1 fused-ingest survivor rule (q221's drop1 stage),
    // each survivor carrying exactly 32 band rows — a double-appending
    // retry reads 64, a wrongly-skipped first run reads 0 (inner join
    // drops the row), and a retry that re-ran the drop rule against the
    // grown index would self-match every survivor and return nothing.
    "q228_ingest_retry" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, source, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks) - 2)] END) AS s
        |  FROM t),
        |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
        |inv AS (SELECT doc_id, source, unnest(s) AS g FROM sh),
        |p1 AS (
        |  SELECT a.doc_id AS bid, b.doc_id AS cid, count(*) AS inter
        |  FROM inv a JOIN inv b
        |    ON a.g = b.g AND a.source = 'src0'
        |    AND b.source NOT IN ('src0', 'src1')
        |  GROUP BY 1, 2),
        |drop1 AS (
        |  SELECT DISTINCT bid FROM p1
        |  JOIN sizes na ON na.doc_id = bid
        |  JOIN sizes nb ON nb.doc_id = cid
        |  WHERE inter / cast(na.n + nb.n - inter as double) >= 0.8)
        |SELECT doc_id, lang, CAST(32 AS BIGINT) AS band_rows
        |FROM documents
        |WHERE source = 'src0'
        |  AND doc_id NOT IN (SELECT bid FROM drop1)""".stripMargin,

    // q229: the post-repair membership rule — veto side = corpus ∪
    // (src0 minus the orphaned class) ∪ the regenerated members — plus
    // the repair report's exact counts as constants (32 band rows per
    // doc: numHashes 128 / rowsPerBand 4).
    "q229_index_repair" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, source, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks) - 2)] END) AS s
        |  FROM t),
        |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
        |inv AS (SELECT doc_id, source, unnest(s) AS g FROM sh),
        |mem AS (
        |  SELECT doc_id FROM documents
        |  WHERE source NOT IN ('src0', 'src1')
        |     OR (source = 'src0' AND doc_id % 10 <> 3)
        |     OR (source = 'src1' AND doc_id % 10 = 7)),
        |p AS (
        |  SELECT a.doc_id AS bid, b.doc_id AS cid, count(*) AS inter
        |  FROM inv a JOIN inv b
        |    ON a.g = b.g AND a.source = 'src1'
        |    AND b.doc_id IN (SELECT doc_id FROM mem)
        |  WHERE a.doc_id % 10 <> 7
        |  GROUP BY 1, 2),
        |dropped AS (
        |  SELECT DISTINCT bid FROM p
        |  JOIN sizes na ON na.doc_id = bid
        |  JOIN sizes nb ON nb.doc_id = cid
        |  WHERE inter / cast(na.n + nb.n - inter as double) >= 0.8),
        |cnt AS (
        |  SELECT
        |    32 * (SELECT count(*) FROM documents
        |          WHERE source = 'src0' AND doc_id % 10 = 5) AS duplicate_rows,
        |    32 * (SELECT count(*) FROM documents
        |          WHERE source = 'src0' AND doc_id % 10 = 3) AS orphan_rows,
        |    (SELECT count(*) FROM documents
        |     WHERE source = 'src1' AND doc_id % 10 = 7) AS regenerated_docs,
        |    32 * (SELECT count(*) FROM mem) AS band_rows)
        |SELECT d.doc_id, d.lang,
        |  duplicate_rows, orphan_rows, regenerated_docs, band_rows
        |FROM documents d, cnt
        |WHERE d.source = 'src1' AND d.doc_id % 10 <> 7
        |  AND d.doc_id NOT IN (SELECT bid FROM dropped)""".stripMargin,

    // q230: the two-epoch streaming ingest rule. The replay stages the
    // corpus with ntile(2) over doc_id order (Streaming.stageDocsReplay),
    // so epoch membership is reconstructible exactly; epoch 1 dedups
    // against the corpus, epoch 2 against corpus + epoch-1 survivors —
    // q221's two-stage rule with ntile in place of source. 32 band rows
    // per member = the q228 idempotence audit through the full stream
    // replay.
    "q230_stream_exactly_once" ->
      """WITH base AS (
        |  SELECT doc_id, source, lang, text,
        |    ntile(2) OVER (ORDER BY doc_id) AS tile
        |  FROM documents),
        |t AS (
        |  SELECT doc_id, source, tile,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM base),
        |sh AS (
        |  SELECT doc_id, source, tile, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks) - 2)] END) AS s
        |  FROM t),
        |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
        |inv AS (SELECT doc_id, source, tile, unnest(s) AS g FROM sh),
        |p1 AS (
        |  SELECT a.doc_id AS bid, b.doc_id AS cid, count(*) AS inter
        |  FROM inv a JOIN inv b
        |    ON a.g = b.g AND a.source IN ('src0', 'src1') AND a.tile = 1
        |    AND b.source NOT IN ('src0', 'src1')
        |  GROUP BY 1, 2),
        |drop1 AS (
        |  SELECT DISTINCT bid FROM p1
        |  JOIN sizes na ON na.doc_id = bid
        |  JOIN sizes nb ON nb.doc_id = cid
        |  WHERE inter / cast(na.n + nb.n - inter as double) >= 0.8),
        |p2 AS (
        |  SELECT a.doc_id AS bid, b.doc_id AS cid, count(*) AS inter
        |  FROM inv a JOIN inv b
        |    ON a.g = b.g AND a.source IN ('src0', 'src1') AND a.tile = 2
        |    AND (b.source NOT IN ('src0', 'src1')
        |         OR (b.source IN ('src0', 'src1') AND b.tile = 1
        |             AND b.doc_id NOT IN (SELECT bid FROM drop1)))
        |  GROUP BY 1, 2),
        |drop2 AS (
        |  SELECT DISTINCT bid FROM p2
        |  JOIN sizes na ON na.doc_id = bid
        |  JOIN sizes nb ON nb.doc_id = cid
        |  WHERE inter / cast(na.n + nb.n - inter as double) >= 0.8)
        |SELECT doc_id, lang, CAST(32 AS BIGINT) AS band_rows
        |FROM base
        |WHERE source IN ('src0', 'src1')
        |  AND ((tile = 1 AND doc_id NOT IN (SELECT bid FROM drop1))
        |    OR (tile = 2 AND doc_id NOT IN (SELECT bid FROM drop2)))""".stripMargin,

    // Planted exact copies of the query vector ride the LAST append, after
    // a compaction and before another — provable top-5 through the
    // double-generation probe (q153's closed form, shifted ids).
    "q231_srp_lifecycle" ->
      """SELECT cast(i + 9500 as bigint) AS vec_id, 1.0 AS cos
        |FROM range(5) t(i)""".stripMargin,

    // The replayed streaming ingest must leave the index identical to a
    // from-scratch build of the whole corpus: q90's SQL verbatim again.
    "q233_stream_bm25_ingest" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, cast(len(toks) as bigint) AS dl,
        |    list_filter(toks, x -> x IN ('spark', 'window', 'merge')) AS qt
        |  FROM t),
        |g AS (
        |  SELECT doc_id, dl, unnest(qt) AS term FROM d),
        |tfs AS (
        |  SELECT doc_id, dl, term, count(*) AS tf FROM g GROUP BY 1, 2, 3),
        |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM d),
        |wdf AS (
        |  SELECT tfs.*, count(*) OVER (PARTITION BY term) AS df FROM tfs),
        |scored AS (
        |  SELECT doc_id,
        |    cast(round(
        |      ln(1.0 + ((n_docs - df) + 0.5) / (df + 0.5)) *
        |      ((tf * (1.2 + 1.0)) /
        |       (tf + 1.2 * (1.0 - 0.75 +
        |          0.75 * dl / (cast(sum_dl as double) / n_docs)))) *
        |      1e9) as bigint) AS qs
        |  FROM wdf CROSS JOIN stats)
        |SELECT doc_id, count(*) AS n_terms,
        |  round(cast(sum(qs) as double) / 1e9, 6) AS score
        |FROM scored GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin,

    // Exactly-once audit on the streamed IVF layout: every non-null vector
    // sits in exactly one cell row — 2 betrays a replayed epoch that
    // re-appended, 0 a skipped one.
    "q234_stream_ivf_ingest" ->
      """SELECT vec_id, cast(1 as bigint) AS n_copies
        |FROM embeddings WHERE embedding IS NOT NULL""".stripMargin,

    // q266: the same exactly-once audit on the streamed SRP bucketed
    // layout — one copy per vector however many times the stream replays.
    "q266_stream_srp_ingest" ->
      """SELECT vec_id, cast(1 as bigint) AS n_copies
        |FROM embeddings WHERE embedding IS NOT NULL""".stripMargin,

    // q267: the restored table is the v1 slice (even keys) plus the
    // post-rollback append (%4==1 — disjoint from v1); any pointer that
    // still sees the bad overwrite (odd keys outside %4==1) or lost the
    // append breaks the row set.
    "q267_rollback" ->
      """SELECT c_custkey, c_name, true AS rolled_back
        |FROM customer
        |WHERE c_custkey % 2 = 0 OR c_custkey % 4 = 1""".stripMargin,

    // q269: after the layout-wide rollback the LIVE probe surfaces all
    // seven planted copies again (q238's closed form on the live view).
    "q269_layout_rollback" ->
      """SELECT cast(i + 9500 as bigint) AS vec_id, 1.0 AS cos,
        |  true AS rolled_back
        |FROM range(7) t(i)""".stripMargin,

    // q270: the tagged replay straddling a rollback converges — every
    // customer exactly once (a re-appended epoch would read 2, a wrongly
    // no-op'd new epoch would drop its third of the keys), epochs 0/1
    // no-op, epoch 2 lands.
    "q270_tagged_replay_rollback" ->
      """SELECT c_custkey, cast(1 as bigint) AS n_copies,
        |  true AS replay_noop, true AS new_epoch_landed
        |FROM customer""".stripMargin,

    // q271: the executor-parallel clone is byte-faithful — the backup reads
    // exactly the two-generation snapshot (every order, both parity
    // slices), length-verified per file in-task.
    "q271_distributed_clone" ->
      """SELECT o_orderkey, o_totalprice, true AS copied
        |FROM orders""".stripMargin,

    // q272: the incremental backup equals the synced snapshot (%3 in 0,1)
    // after the source moved on to %3==2, the delta sync moved strictly
    // fewer files than the full one, and the current-backup sync was a
    // true no-op.
    "q272_incremental_backup" ->
      """SELECT c_custkey, c_name, true AS full_copied,
        |  true AS delta_smaller, true AS noop_noop
        |FROM customer WHERE c_custkey % 3 IN (0, 1)""".stripMargin,

    // q273: the cutover replay against the backup converges — every
    // customer exactly once (epoch-1 no-ops on the mirrored ledger despite
    // its files being compaction-folded; epoch-2 lands fresh).
    "q273_backup_ledger_cutover" ->
      """SELECT c_custkey, cast(1 as bigint) AS n_copies,
        |  true AS replay_noop, true AS new_epoch_landed
        |FROM customer""".stripMargin,

    // q274: per-doc duplicated-3-gram ratio vs the whole corpus (distinct
    // shingles, whole-text shingle for short docs — q65's tokenization).
    "q274_ngram_dup_ratio" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split(text,' '), x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks,' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks)-2)] END) AS s
        |  FROM t),
        |g AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |dfreq AS (SELECT g, count(*) AS ndocs FROM g GROUP BY 1),
        |j AS (SELECT doc_id, cast(count(*) as bigint) AS n_ngrams,
        |        cast(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) as bigint)
        |          AS n_duplicated
        |      FROM g JOIN dfreq USING (g) GROUP BY 1)
        |SELECT doc_id, n_ngrams, n_duplicated,
        |  round(n_duplicated / cast(n_ngrams as double), 6) AS dup_ratio
        |FROM j""".stripMargin,

    // q275: 20-word-window corpus dedup, first occurrence (doc_id, pos)
    // wins; survivors reassemble in position order.
    "q275_chunk_dedup" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split(text,' '), x -> x <> '') AS toks
        |  FROM documents),
        |c0 AS (SELECT doc_id,
        |    [array_to_string(toks[(i*20+1):(i*20+20)], ' ')
        |     FOR i IN generate_series(0,
        |       cast(ceil(len(toks)/20.0) as int)-1)] AS cl
        |  FROM t WHERE len(toks) > 0),
        |c AS (SELECT doc_id, unnest(cl) AS chunk,
        |    unnest(generate_series(1, len(cl))) - 1 AS pos FROM c0),
        |w AS (SELECT *, row_number() OVER
        |    (PARTITION BY chunk ORDER BY doc_id, pos) AS rn FROM c)
        |SELECT doc_id, cast(count(*) as bigint) AS n_chunks,
        |  cast(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) as bigint)
        |    AS n_dropped,
        |  coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END,
        |    ' ' ORDER BY pos), '') AS text_deduped
        |FROM w GROUP BY 1""".stripMargin,

    // Planted exact copies survive the retrain and surface through the NEW
    // pinned centroids — q216's closed form, shifted ids.
    "q235_ivf_retrain" ->
      """SELECT cast(i + 9600 as bigint) AS vec_id, 1.0 AS cos
        |FROM range(5) t(i)""".stripMargin,

    // The undo window after the q224 prune: the full 0.2-floor threshold
    // curve — the LIVE (0.5-pruned) table cannot produce the d=2..4 rows,
    // only the retired-but-retained pre-prune generation can.
    "q236_pair_undo" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks) - 2)] END) AS s
        |  FROM t),
        |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
        |inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |keep AS (SELECT g FROM inv GROUP BY g HAVING count(*) <= 1000),
        |invk AS (SELECT inv.* FROM inv JOIN keep USING (g)),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM invk a JOIN invk b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |j AS (
        |  SELECT id_b, inter, na.n + nb.n - inter AS uni
        |  FROM pairs
        |  JOIN sizes na ON na.doc_id = id_a
        |  JOIN sizes nb ON nb.doc_id = id_b
        |  WHERE inter / cast(na.n + nb.n - inter as double) >= 0.2),
        |x AS (
        |  SELECT id_b, d FROM j CROSS JOIN
        |    (SELECT unnest(generate_series(2, 10)) AS d)
        |  WHERE inter * 10 >= d * uni)
        |SELECT cast(d * 100 as bigint) AS threshold_permille,
        |  count(*) AS n_pairs,
        |  cast(count(DISTINCT id_b) as bigint) AS n_victims
        |FROM x GROUP BY d""".stripMargin,

    // The daily append+compact loop must hash-match the from-scratch
    // direct scan: q232 is q90's SQL verbatim (q217's oracle).
    "q232_bm25_daily_loop" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, cast(len(toks) as bigint) AS dl,
        |    list_filter(toks, x -> x IN ('spark', 'window', 'merge')) AS qt
        |  FROM t),
        |g AS (
        |  SELECT doc_id, dl, unnest(qt) AS term FROM d),
        |tfs AS (
        |  SELECT doc_id, dl, term, count(*) AS tf FROM g GROUP BY 1, 2, 3),
        |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM d),
        |wdf AS (
        |  SELECT tfs.*, count(*) OVER (PARTITION BY term) AS df FROM tfs),
        |scored AS (
        |  SELECT doc_id,
        |    cast(round(
        |      ln(1.0 + ((n_docs - df) + 0.5) / (df + 0.5)) *
        |      ((tf * (1.2 + 1.0)) /
        |       (tf + 1.2 * (1.0 - 0.75 +
        |          0.75 * dl / (cast(sum_dl as double) / n_docs)))) *
        |      1e9) as bigint) AS qs
        |  FROM wdf CROSS JOIN stats)
        |SELECT doc_id, count(*) AS n_terms,
        |  round(cast(sum(qs) as double) / 1e9, 6) AS score
        |FROM scored GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin,

        // q215 proves the persisted pair table replays the inline mine
    // bit-for-bit: the oracle is q165's SQL verbatim.
    "q215_pair_reuse" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks) - 2)] END) AS s
        |  FROM t),
        |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
        |inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |keep AS (SELECT g FROM inv GROUP BY g HAVING count(*) <= 1000),
        |invk AS (SELECT inv.* FROM inv JOIN keep USING (g)),
        |cand AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM invk a JOIN invk b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |pairs AS (
        |  SELECT id_a, id_b FROM cand
        |  JOIN sizes na ON na.doc_id = id_a
        |  JOIN sizes nb ON nb.doc_id = id_b
        |  WHERE inter / cast(na.n + nb.n - inter as double) >= 0.8),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
        |labels AS (
        |  SELECT src AS doc_id, least(src, min(dst)) AS rep
        |  FROM reach GROUP BY src),
        |qual AS (
        |  SELECT doc_id, lang,
        |    round(
        |      least(length(text) / 500.0, 1.0) * 0.4 +
        |      least(len(list_filter(tk, x -> x IN
        |        ('the','a','of','and','to','der','die','das','und',
        |         'le','la','les','et','el','los','y','que')))
        |        / greatest(len(tk), 1.0) * 10.0, 1.0) * 0.3 +
        |      (CASE WHEN len(tk) = 0 THEN 0.0
        |            ELSE len(list_distinct(tk)) / cast(len(tk) as double)
        |       END) * 0.3,
        |    6) AS q
        |  FROM (SELECT doc_id, lang, text,
        |          list_filter(string_split(lower(text), ' '), x -> x <> '')
        |            AS tk
        |        FROM documents)),
        |winners AS (
        |  SELECT doc_id FROM (
        |    SELECT q.doc_id,
        |      row_number() OVER (PARTITION BY l.rep
        |        ORDER BY q.q DESC, q.doc_id) AS rn
        |    FROM qual q JOIN labels l USING (doc_id))
        |  WHERE rn = 1),
        |surv AS (
        |  SELECT doc_id FROM qual
        |  WHERE doc_id NOT IN (SELECT doc_id FROM labels)
        |  UNION ALL SELECT doc_id FROM winners)
        |SELECT q.lang, count(*) AS n_docs,
        |  cast(sum(s.doc_id) AS bigint) AS id_sum
        |FROM surv s JOIN qual q USING (doc_id)
        |GROUP BY q.lang""".stripMargin,

    "q02_filter_predicates" ->
      """SELECT p_partkey, p_name, p_brand, p_size FROM part
        |WHERE p_type IN ('STANDARD','SMALL','PROMO')
        |  AND p_name LIKE '%widget%'
        |  AND p_size > 10
        |  AND p_brand <> 'Brand#13'
        |  AND regexp_matches(p_brand, '^Brand#[0-9]$')""".stripMargin,

    "q03_top_orders" ->
      """SELECT o_orderkey, o_orderdate,
        | cast(round(sum(cast(l_extendedprice as decimal(18,2)) *
        |   (1 - cast(l_discount as decimal(18,2)))), 4) as double) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q04_exists_orders" ->
      """SELECT o_orderpriority, count(*) AS order_count FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority""".stripMargin,

    "q05_region_revenue" ->
      """SELECT r_name,
        | cast(round(sum(cast(l_extendedprice as decimal(18,2)) *
        |   (1 - cast(l_discount as decimal(18,2)))), 4) as double) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,

    "q06_forecast_revenue" ->
      """SELECT cast(round(sum(cast(l_extendedprice as decimal(18,2)) *
        |   cast(l_discount as decimal(18,2))), 4) as double) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q07_rank_customers" ->
      """WITH rev AS (
        |  SELECT o_custkey, round(sum(o_totalprice), 2) AS rev
        |  FROM orders GROUP BY o_custkey)
        |SELECT c_nationkey, rn, c_custkey, rev FROM (
        |  SELECT c_nationkey, c_custkey, rev,
        |    cast(row_number() OVER (PARTITION BY c_nationkey
        |                       ORDER BY rev DESC, c_custkey) as integer) AS rn
        |  FROM customer JOIN rev ON c_custkey = o_custkey)
        |WHERE rn <= 3""".stripMargin,

    "q08_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | cast(sum(l_quantity) as bigint) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q09_setops" ->
      """SELECT o_custkey, 'both' AS cohort FROM (
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
        |UNION ALL
        |SELECT o_custkey, 'only_1995' AS cohort FROM (
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)""".stripMargin,

    "q10_multiget" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_custkey IN (1,2,3,5,8,13,21,34,55,89)""".stripMargin,

    "q11_range_scan" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        | round(o_totalprice, 2) AS price
        |FROM orders
        |WHERE o_orderkey >= 1000 AND o_orderkey < 2000
        |  AND o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1999-01-01'
        |  AND o_orderstatus = 'F'""".stripMargin,

    "q12_events_daily" ->
      """SELECT cast(ts as date) AS day, event_type,
        | count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q13_sessionize" ->
      """WITH g AS (
        |  SELECT user_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR date_diff('second', lag(ts) OVER w, ts) > 1800
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, cast(sum(new_sess) as bigint) AS n_sessions, count(*) AS n_events
        |FROM g GROUP BY user_id""".stripMargin,

    "q14_family_rollup" ->
      """SELECT user_id, cast(ts as date) AS day, count(*) AS searches
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q15_family_pagination" ->
      """SELECT user_id, day, searches FROM (
        |  SELECT user_id, cast(ts as date) AS day, count(*) AS searches,
        |    row_number() OVER (PARTITION BY user_id ORDER BY cast(ts as date)) AS rn
        |  FROM events GROUP BY user_id, cast(ts as date))
        |WHERE rn BETWEEN 6 AND 10""".stripMargin,

    "q16_increment_merge" ->
      """SELECT c_custkey, round(c_acctbal + coalesce(d.total, 0), 2) AS acctbal_new
        |FROM customer LEFT JOIN (
        |  SELECT o_custkey, sum(o_totalprice) AS total FROM orders GROUP BY o_custkey
        |) d ON c_custkey = d.o_custkey""".stripMargin,

    "q17_upsert_merge" ->
      """SELECT c_custkey, c_name,
        | coalesce('P:' || p.pri, c_mktsegment) AS c_mktsegment
        |FROM customer LEFT JOIN (
        |  SELECT o_custkey, o_orderpriority AS pri FROM (
        |    SELECT o_custkey, o_orderpriority,
        |      row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey DESC) AS rn
        |    FROM orders) WHERE rn = 1
        |) p ON c_custkey = p.o_custkey""".stripMargin,

    "q18_delete_merge" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q19_token_count" ->
      """SELECT lang,
        | cast(sum(len(list_filter(string_split(text, ' '), t -> t <> ''))) as bigint)
        |   AS total_tokens,
        | round(avg(len(list_filter(string_split(text, ' '), t -> t <> ''))), 4)
        |   AS avg_tokens,
        | count(*) AS n_docs
        |FROM documents GROUP BY lang""".stripMargin,

    "q20_lang_id" ->
      """WITH scored AS (
        |  SELECT lang,
        |    len(list_filter(list_filter(string_split(lower(text), ' '), t -> t <> ''),
        |        t -> t IN ('the','a','of','and','to'))) AS s_en,
        |    len(list_filter(list_filter(string_split(lower(text), ' '), t -> t <> ''),
        |        t -> t IN ('der','die','das','und'))) AS s_de,
        |    len(list_filter(list_filter(string_split(lower(text), ' '), t -> t <> ''),
        |        t -> t IN ('le','la','les','et'))) AS s_fr,
        |    len(list_filter(list_filter(string_split(lower(text), ' '), t -> t <> ''),
        |        t -> t IN ('el','los','y','que'))) AS s_es
        |  FROM documents),
        |pred AS (
        |  SELECT lang, CASE
        |    WHEN greatest(s_en, s_de, s_fr, s_es) <= 0 THEN 'und'
        |    WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
        |    WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
        |    WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
        |    ELSE 'es' END AS lang_pred
        |  FROM scored)
        |SELECT lang, lang_pred, count(*) AS n FROM pred GROUP BY lang, lang_pred""".stripMargin,

    "q21_quality_score" ->
      """WITH toks AS (
        |  SELECT source, text,
        |    list_filter(string_split(lower(text), ' '), t -> t <> '') AS tk
        |  FROM documents),
        |q AS (
        |  SELECT source,
        |    round(
        |      least(length(text) / 500.0, 1.0) * 0.4 +
        |      least(len(list_filter(tk, t -> t IN
        |        ('the','a','of','and','to','der','die','das','und',
        |         'le','la','les','et','el','los','y','que')))
        |        / greatest(len(tk), 1.0) * 10.0, 1.0) * 0.3 +
        |      (CASE WHEN len(tk) = 0 THEN 0.0
        |            ELSE len(list_distinct(tk)) / cast(len(tk) as double) END) * 0.3,
        |    6) AS q
        |  FROM toks)
        |SELECT source, round(sum(q), 4) AS sum_quality, count(*) AS n_docs
        |FROM q GROUP BY source""".stripMargin,

    "q22_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id < 100""".stripMargin,

    "q23_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_dups
        |FROM documents GROUP BY text""".stripMargin,

    "q24_ngram_jaccard" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks) - 2)] END) AS s
        |  FROM t),
        |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
        |inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |keep AS (SELECT g FROM inv GROUP BY g HAVING count(*) <= 1000),
        |invk AS (SELECT inv.* FROM inv JOIN keep USING (g)),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM invk a JOIN invk b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT id_a, id_b,
        |  round(inter / cast(na.n + nb.n - inter as double), 6) AS jaccard
        |FROM pairs
        |JOIN sizes na ON na.doc_id = id_a
        |JOIN sizes nb ON nb.doc_id = id_b
        |WHERE inter / cast(na.n + nb.n - inter as double) >= 0.2""".stripMargin,

    "q25_cosine_topk" ->
      """SELECT vec_id,
        | round(list_cosine_similarity(cast(embedding as double[]),
        |   (SELECT cast(embedding as double[]) FROM embeddings WHERE vec_id = 0)), 4) AS cos
        |FROM embeddings WHERE vec_id <> 0
        |ORDER BY list_cosine_similarity(cast(embedding as double[]),
        |   (SELECT cast(embedding as double[]) FROM embeddings WHERE vec_id = 0)) DESC, vec_id
        |LIMIT 10""".stripMargin,

    "q26_cosine_by_label" ->
      """SELECT label,
        | round(avg(list_cosine_similarity(cast(embedding as double[]),
        |   (SELECT cast(embedding as double[]) FROM embeddings WHERE vec_id = 0))), 4) AS avg_cos,
        | count(*) AS n
        |FROM embeddings WHERE vec_id <> 0 GROUP BY label""".stripMargin,

    // Real-codec rollup: every decoded quantity recomputed in closed form
    // from the synthesis formulas (see q63/q64 — same PNG pixel(x,y) and WAV
    // sample(i) functions, here aggregated corpus-wide over both modalities).
    "q30_multimodal_meta" ->
      """WITH p AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h,
        |             64 + doc_id % 64 AS ns
        |           FROM documents WHERE doc_id < 256)
        |SELECT 'png' AS format, count(*) AS n,
        | cast(sum(w * h) as bigint) AS total_pixels,
        | cast(sum(list_sum([(doc_id*31 + (i % w)*7 + (i // w)*13) % 256
        |   FOR i IN generate_series(0, w*h - 1)])) as bigint) AS total_pixel_sum,
        | cast(sum(ns) as bigint) AS total_samples,
        | cast(sum(ns * 125) as bigint) AS total_duration_us
        |FROM p GROUP BY 1""".stripMargin,

    "q31_stream_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        | count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q32_asof_join" ->
      """SELECT e.event_id, e.user_id, o.o_orderdate AS asof_date
        |FROM events e ASOF LEFT JOIN orders o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""".stripMargin,

    "q33_distinct_agg" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_suppkey) AS n_supp,
        | count(DISTINCT l_partkey) AS n_part,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q34_json_props" ->
      """SELECT event_type,
        | cast(sum(cast(regexp_extract(props, '[0-9]+') as bigint)) as bigint) AS sum_k,
        | cast(max(cast(regexp_extract(props, '[0-9]+') as bigint)) as bigint) AS max_k,
        | count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,

    "q35_secondary_sort" ->
      """SELECT l_suppkey, rn, l_orderkey, l_linenumber FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber,
        |    cast(row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber) as integer) AS rn
        |  FROM lineitem)
        |WHERE rn <= 3""".stripMargin,

    "q36_subword_tokens" ->
      """SELECT lang,
        | cast(sum(list_sum(list_transform(
        |   list_filter(string_split(lower(text), ' '), t -> t <> ''),
        |   t -> (length(t) - 1) // 4 + 1))) as bigint) AS n_subwords,
        | count(*) AS n_docs
        |FROM documents GROUP BY lang""".stripMargin,

    // LSH at 32 bands × 4 rows recovers every exact pair at ≥0.8 on this corpus
    // (verified at sf0.01 and sf0.1; deterministic — fixed hash seeds), so the
    // exact inverted-index Jaccard is a true oracle for the candidate pipeline.
    "q27_minhash_pairs" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks) - 2)] END) AS s
        |  FROM t),
        |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
        |inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT id_a, id_b,
        |  round(inter / cast(na.n + nb.n - inter as double), 4) AS jaccard
        |FROM pairs
        |JOIN sizes na ON na.doc_id = id_a
        |JOIN sizes nb ON nb.doc_id = id_b
        |WHERE inter / cast(na.n + nb.n - inter as double) >= 0.8""".stripMargin,

    // Connected components replayed with a recursive CTE over the exact
    // Jaccard pair set (≡ the LSH output at threshold 0.8, q27's proven
    // equivalence): rep = min reachable id, size = members per rep.
    "q72_dup_clusters" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks) - 2)] END) AS s
        |  FROM t),
        |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
        |inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |keep AS (SELECT g FROM inv GROUP BY g HAVING count(*) <= 1000),
        |invk AS (SELECT inv.* FROM inv JOIN keep USING (g)),
        |cand AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM invk a JOIN invk b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |pairs AS (
        |  SELECT id_a, id_b FROM cand
        |  JOIN sizes na ON na.doc_id = id_a
        |  JOIN sizes nb ON nb.doc_id = id_b
        |  WHERE inter / cast(na.n + nb.n - inter as double) >= 0.8),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
        |labels AS (
        |  SELECT src AS doc_id, least(src, min(dst)) AS rep
        |  FROM reach GROUP BY src),
        |csize AS (SELECT rep, count(*) AS cluster_size FROM labels GROUP BY rep)
        |SELECT l.doc_id, l.rep, c.cluster_size
        |FROM labels l JOIN csize c USING (rep)""".stripMargin,

    // The ANN pipeline replayed in SQL: md5-derived integer plane weights,
    // floor-quantized integer dot products (bit b set iff dot > 0), the query
    // vector's bucket plus its 1-bit-flip probes, cosine top-k inside probes.
    "q29_ann_topk" ->
      """WITH e AS (
        |  SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
        |bk AS (
        |  SELECT vec_id, v,
        |    CAST(list_sum(
        |      [CASE WHEN list_sum(
        |         [(floor(v[d + 1] * 1000000))::BIGINT *
        |            ((('0x' || substr(md5(pb::VARCHAR || ':' || d::VARCHAR), 1, 15))::BIGINT
        |              % 1000001) - 500000)
        |          FOR d IN generate_series(0, len(v) - 1)]) > 0
        |       THEN 1::BIGINT << pb ELSE 0::BIGINT END
        |       FOR pb IN generate_series(0, 7)]) AS BIGINT) AS bucket
        |  FROM e),
        |q AS (SELECT bucket AS qb, v AS qv FROM bk WHERE vec_id = 0),
        |probes AS (
        |  SELECT qb AS p FROM q
        |  UNION ALL
        |  SELECT xor(qb, 1::BIGINT << i) AS p
        |  FROM q, generate_series(0, 7) t(i))
        |SELECT vec_id,
        |  round(list_cosine_similarity(v, (SELECT qv FROM q)), 4) AS cos
        |FROM bk
        |WHERE vec_id <> 0 AND bucket IN (SELECT p FROM probes)
        |ORDER BY list_cosine_similarity(v, (SELECT qv FROM q)) DESC, vec_id
        |LIMIT 10""".stripMargin,

    // SimHash replayed in SQL: same md5-60-bit token hashes, same bit-vote
    // (bit set iff 2·ones > n), then an all-pairs Hamming scan. Pigeonhole
    // banding makes the Spark side's recall exact, so the sets are identical.
    "q28_simhash_pairs" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_transform(list_filter(string_split(text, ' '), t -> t <> ''),
        |      t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS hs
        |  FROM documents),
        |sig AS (
        |  SELECT doc_id,
        |    CAST(list_sum(
        |      [CASE WHEN 2 * len(list_filter(hs, h -> ((h >> b) & 1) = 1)) > len(hs)
        |            THEN 1::BIGINT << b ELSE 0::BIGINT END
        |       FOR b IN generate_series(0, 59)]) AS BIGINT) AS sig
        |  FROM tk)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sig, b.sig)) <= 3""".stripMargin,

    "q37_hll_sketch" ->
      s"""WITH h AS (
        |  SELECT l_returnflag,
        |    ('0x' || substr(md5(cast(l_orderkey as varchar)), 1, 15))::BIGINT AS h
        |  FROM lineitem),
        |r AS (
        |  SELECT l_returnflag, h % 4096 AS bucket,
        |    least(CASE WHEN h // 4096 = 0 THEN 49
        |               ELSE 49 - length(bin(h // 4096)) END, 40) AS rho
        |  FROM h),
        |b AS (
        |  SELECT l_returnflag, bucket, max(rho) AS m, count(*) AS cnt
        |  FROM r GROUP BY l_returnflag, bucket)
        |SELECT l_returnflag,
        |  CAST(floor(${SparkEntry.Hll.C} /
        |    (CAST(sum(1::BIGINT << (40 - m)) AS BIGINT)
        |      + (4096 - count(*)) * 1099511627776)) AS BIGINT) AS approx_orders,
        |  CAST(sum(cnt) AS BIGINT) AS n
        |FROM b GROUP BY l_returnflag""".stripMargin,

    "q39_rolling_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(0::BIGINT,
        |      list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)),
        |    (a, b) -> (a * 31 + b) % 2147483647) AS rfp
        |FROM documents WHERE doc_id < 100""".stripMargin,

    "q38_embedding_neardup" ->
      """SELECT cast(i as bigint) AS id_a, cast(i + 9000 as bigint) AS id_b,
        | 1.0 AS cos
        |FROM range(10) t(i)""".stripMargin,

    "q40_latest_version" ->
      """SELECT user_id, event_type,
        | event_id AS latest_event_id,
        | round(value, 2) AS latest_value
        |FROM (
        |  SELECT user_id, event_type, event_id, value,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1""".stripMargin,

    "q42_sql_cosine" ->
      """SELECT vec_id,
        | round(list_cosine_similarity(cast(embedding as double[]),
        |   (SELECT cast(embedding as double[]) FROM embeddings WHERE vec_id = 1)), 4) AS cos
        |FROM embeddings WHERE vec_id <> 1
        |ORDER BY list_cosine_similarity(cast(embedding as double[]),
        |   (SELECT cast(embedding as double[]) FROM embeddings WHERE vec_id = 1)) DESC, vec_id
        |LIMIT 5""".stripMargin,

    "q43_train_split" ->
      """SELECT lang,
        |  CASE WHEN ('0x' || substr(md5(cast(doc_id as varchar)), 1, 15))::BIGINT
        |            % 100 < 80
        |       THEN 'train' ELSE 'test' END AS split,
        |  count(*) AS n_docs
        |FROM documents GROUP BY 1, 2""".stripMargin,

    // Survivors after keep-first near-dup removal. The LSH pair set equals the
    // exact-Jaccard >= 0.8 pair set on this corpus (verified both SFs), so the
    // exact inverted-index pairs define the removed id_b side.
    "q44_dedup_apply" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks) - 2)] END) AS s
        |  FROM t),
        |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
        |inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |dups AS (
        |  SELECT DISTINCT id_b FROM pairs
        |  JOIN sizes na ON na.doc_id = id_a
        |  JOIN sizes nb ON nb.doc_id = id_b
        |  WHERE inter / cast(na.n + nb.n - inter as double) >= 0.8)
        |SELECT lang, count(*) AS n_docs FROM documents
        |WHERE doc_id NOT IN (SELECT id_b FROM dups)
        |GROUP BY lang""".stripMargin,

    "q45_knn_join" ->
      """SELECT query_id, corpus_id, rank, cos FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |    round(list_cosine_similarity(cast(c.embedding as double[]),
        |      cast(q.embedding as double[])), 4) AS cos,
        |    cast(row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(cast(c.embedding as double[]),
        |        cast(q.embedding as double[])) DESC, c.vec_id) as integer) AS rank
        |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 5)
        |WHERE rank <= 3""".stripMargin,

    "q46_label_centroid" ->
      """SELECT label, dim,
        |  CAST(sum(q) AS BIGINT) / (count(*) * 1000000.0) AS centroid
        |FROM (
        |  SELECT label, generate_subscripts(embedding, 1) AS dim,
        |    (floor(unnest(embedding)::DOUBLE * 1000000))::BIGINT AS q
        |  FROM embeddings)
        |GROUP BY label, dim""".stripMargin,

    "q47_vocab_topk" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(list_filter(string_split(lower(text), ' '),
        |    t -> t <> '')) AS token
        |  FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,

    // Stream/batch agreement: the stateful streaming sessionizer must produce
    // exactly the batch sessionization (same SQL as q13).
    "q48_stream_sessionize" ->
      """WITH g AS (
        |  SELECT user_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR date_diff('second', lag(ts) OVER w, ts) > 1800
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, cast(sum(new_sess) as bigint) AS n_sessions, count(*) AS n_events
        |FROM g GROUP BY user_id""".stripMargin,

    "q50_ivf_ann" ->
      """SELECT cast(i + 9100 as bigint) AS vec_id, 1.0 AS cos
        |FROM range(5) t(i)""".stripMargin,

    // Same provable-top-5 construction as q50, through the persisted
    // partitioned-by-cell layout (write once, probe via partition pruning).
    "q86_ivf_partitioned" ->
      """SELECT cast(i + 9200 as bigint) AS vec_id, 1.0 AS cos
        |FROM range(5) t(i)""".stripMargin,

    // The identical KMV sketch rebuilt in SQL (q84's shingle construction,
    // 50/50 md5 split): min-1024 distinct shingle md5s per side, union-k,
    // and the exact integer intersection count — the estimate is one
    // division of exact integers, so it hash-matches without tolerance.
    "q89_overlap_sketch" ->
      """WITH t AS (
        |  SELECT ('0x' || substr(md5(cast(doc_id as varchar)), 1, 15))::BIGINT
        |      % 100 < 50 AS in_a,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT in_a, unnest(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks) - 2)] END) AS g
        |  FROM t),
        |hh AS (SELECT DISTINCT in_a,
        |         ('0x' || substr(md5(g), 1, 15))::BIGINT AS h FROM sh),
        |ka AS (SELECT h FROM hh WHERE in_a ORDER BY h LIMIT 1024),
        |kb AS (SELECT h FROM hh WHERE NOT in_a ORDER BY h LIMIT 1024),
        |u AS (SELECT DISTINCT h FROM
        |        (SELECT h FROM ka UNION ALL SELECT h FROM kb)
        |      ORDER BY h LIMIT 1024),
        |i AS (SELECT count(*) AS inter_k FROM u
        |      WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)),
        |n AS (SELECT count(*) AS n_union_k FROM u)
        |SELECT inter_k, n_union_k,
        |  cast(inter_k as double) / n_union_k AS jaccard_est
        |FROM i, n""".stripMargin,

    // The identical integer rank cut: row_number by (n_chars, doc_id) per
    // lang, count per lang, keep (n·50//1000, n·950//1000].
    // Provable-top-5 construction (q50's discipline): the planted copies'
    // rank order is closed-form; the spec pins the ADC machinery itself.
    "q110_pq_ann" ->
      """SELECT cast(i + 1 as bigint) AS rank, cast(i + 9200 as bigint) AS vec_id
        |FROM range(5) t(i)""".stripMargin,

    // The identical C4 rule: same composites, same 60-bit line hashes, df by
    // distinct docs, >= 10 dropped, kept lines re-joined in position order.
    "q111_boilerplate_lines" ->
      """WITH base AS (
        |  SELECT doc_id % 40 AS gid, doc_id, text
        |  FROM documents WHERE text IS NOT NULL),
        |comp AS (
        |  SELECT gid, string_agg(text, chr(10) ORDER BY doc_id) AS body
        |  FROM base GROUP BY gid),
        |docs AS (
        |  SELECT gid AS id,
        |    body || chr(10) || 'subscribe now for updates'
        |      || CASE WHEN gid < 20 THEN chr(10) || 'all rights reserved' ELSE '' END
        |      || CASE WHEN gid < 3 THEN chr(10) || 'rare footer line' ELSE '' END
        |      AS text
        |  FROM comp),
        |split_docs AS (
        |  SELECT id, string_split(text, chr(10)) AS parts FROM docs),
        |lines AS (
        |  SELECT id, unnest(generate_series(1, len(parts))) AS pos, parts
        |  FROM split_docs),
        |hashed AS (
        |  SELECT id, pos,
        |    ('0x' || substr(md5(parts[pos]), 1, 15))::BIGINT AS h
        |  FROM lines),
        |boiler AS (
        |  SELECT h FROM hashed GROUP BY h HAVING count(DISTINCT id) >= 10),
        |kept AS (
        |  SELECT id, pos FROM hashed WHERE h NOT IN (SELECT h FROM boiler)),
        |cleaned AS (
        |  SELECT k.id, string_agg(s.parts[k.pos], chr(10) ORDER BY k.pos) AS text
        |  FROM kept k JOIN split_docs s USING (id) GROUP BY k.id),
        |counts AS (SELECT id, count(*) AS n_kept FROM kept GROUP BY id)
        |SELECT s.id, md5(coalesce(c.text, '')) AS text_md5,
        |  cast(len(s.parts) AS bigint) AS n_lines,
        |  cast(len(s.parts) - coalesce(n.n_kept, 0) AS bigint) AS n_dropped
        |FROM split_docs s
        |LEFT JOIN cleaned c USING (id) LEFT JOIN counts n USING (id)""".stripMargin,

    // q29's md5 hyperplane-bucket replay, generalized to 5 queries, plus the
    // exact window rank (q45's idiom) and the intersection gauge.
    "q112_ann_recall" ->
      """WITH e AS (
        |  SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
        |bk AS (
        |  SELECT vec_id, v,
        |    CAST(list_sum(
        |      [CASE WHEN list_sum(
        |         [(floor(v[d + 1] * 1000000))::BIGINT *
        |            ((('0x' || substr(md5(pb::VARCHAR || ':' || d::VARCHAR), 1, 15))::BIGINT
        |              % 1000001) - 500000)
        |          FOR d IN generate_series(0, len(v) - 1)]) > 0
        |       THEN 1::BIGINT << pb ELSE 0::BIGINT END
        |       FOR pb IN generate_series(0, 7)]) AS BIGINT) AS bucket
        |  FROM e),
        |q AS (SELECT vec_id AS query_id, bucket AS qb, v AS qv
        |      FROM bk WHERE vec_id < 5),
        |c AS (SELECT vec_id AS corpus_id, bucket AS cb, v AS cv
        |      FROM bk WHERE vec_id >= 5),
        |probes AS (
        |  SELECT query_id, qv, qb AS p FROM q
        |  UNION ALL
        |  SELECT query_id, qv, xor(qb, 1::BIGINT << i) AS p
        |  FROM q, generate_series(0, 7) t(i)),
        |approx AS (
        |  SELECT query_id, corpus_id FROM (
        |    SELECT p.query_id, c.corpus_id,
        |      row_number() OVER (PARTITION BY p.query_id
        |        ORDER BY list_cosine_similarity(c.cv, p.qv) DESC, c.corpus_id)
        |        AS rank
        |    FROM probes p JOIN c ON c.cb = p.p)
        |  WHERE rank <= 10),
        |exact AS (
        |  SELECT query_id, corpus_id FROM (
        |    SELECT q.query_id, c.corpus_id,
        |      row_number() OVER (PARTITION BY q.query_id
        |        ORDER BY list_cosine_similarity(c.cv, q.qv) DESC, c.corpus_id)
        |        AS rank
        |    FROM q CROSS JOIN c)
        |  WHERE rank <= 10)
        |SELECT x.query_id,
        |  cast(count(a.corpus_id) AS bigint) AS n_hit,
        |  cast(count(*) AS bigint) AS n_exact,
        |  count(a.corpus_id) / cast(count(*) AS double) AS recall
        |FROM exact x
        |LEFT JOIN approx a USING (query_id, corpus_id)
        |GROUP BY x.query_id
        |ORDER BY x.query_id""".stripMargin,

    // The identical KMV pipeline: per-source min-512 over distinct 60-bit
    // token hashes, merged min-512 of the union, vs the direct global
    // min-512; estimate arithmetic replayed with the same double ops.
    "q113_kmv_shards" ->
      """WITH toks AS (
        |  SELECT source,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
        |  FROM documents WHERE text IS NOT NULL),
        |hashed AS (
        |  SELECT DISTINCT source,
        |    ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
        |  FROM toks),
        |shard_k AS (
        |  SELECT source, h FROM (
        |    SELECT source, h,
        |      row_number() OVER (PARTITION BY source ORDER BY h) AS rn
        |    FROM hashed)
        |  WHERE rn <= 512),
        |merged AS (
        |  SELECT DISTINCT h FROM shard_k ORDER BY h LIMIT 512),
        |direct AS (
        |  SELECT DISTINCT h FROM hashed ORDER BY h LIMIT 512),
        |m AS (
        |  SELECT list_sort(list(h)) AS kmv, count(*) AS k_actual,
        |    max(h) AS hk
        |  FROM merged),
        |d AS (SELECT list_sort(list(h)) AS kmv_d FROM direct),
        |x AS (
        |  SELECT count(DISTINCT tok) AS ndv_exact,
        |    count(DISTINCT source) AS n_sources
        |  FROM toks)
        |SELECT cast(x.n_sources AS bigint) AS n_sources,
        |  cast(m.k_actual AS bigint) AS k_actual, m.hk,
        |  CASE WHEN m.k_actual < 512 THEN m.k_actual::DOUBLE
        |       ELSE 511.0 * 1152921504606846976.0 / m.hk::DOUBLE END AS ndv_est,
        |  cast(x.ndv_exact AS bigint) AS ndv_exact,
        |  (m.kmv = d.kmv_d) AS merge_eq
        |FROM m, d, x""".stripMargin,

    // The replay's batch→hour mapping in closed form (ntile + the staged
    // 1700000000 + batch·3600 clock), epoch-aligned tumbling windows, then
    // the identical (n desc, tok) rank.
    "q107_trending_terms" ->
      """WITH bat AS (
        |  SELECT doc_id, text, ntile(4) OVER (ORDER BY doc_id) AS batch
        |  FROM documents),
        |tk AS (
        |  SELECT ((1700000000 + batch * 3600) // 3600) * 3600 AS ws,
        |    unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
        |      AS tok
        |  FROM bat),
        |c AS (SELECT ws, tok, count(*) AS n FROM tk GROUP BY 1, 2),
        |r AS (
        |  SELECT ws, tok, n,
        |    row_number() OVER (PARTITION BY ws ORDER BY n DESC, tok) AS rk
        |  FROM c)
        |SELECT cast(ws as bigint) AS window_start_s, tok, n
        |FROM r WHERE rk <= 5""".stripMargin,

    // The identical md5 halves, bucket counts, and IEEE op tree — each
    // bucket's nano contribution is one division chain, value-exact.
    "q108_corpus_drift" ->
      """WITH d AS (
        |  SELECT CASE WHEN ('0x' || substr(md5(cast(doc_id as varchar)), 1, 15))
        |                   ::BIGINT % 100 < 50
        |              THEN 'a' ELSE 'b' END AS side,
        |    unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
        |      AS tok
        |  FROM documents),
        |c AS (
        |  SELECT ('0x' || substr(md5(tok), 1, 15))::BIGINT % 256 AS b,
        |    sum(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS n_a,
        |    sum(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS n_b
        |  FROM d GROUP BY 1),
        |t AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb FROM c)
        |SELECT b, cast(n_a as bigint) AS n_a, cast(n_b as bigint) AS n_b,
        |  cast(round(
        |    ((n_a / cast(ta as double) - n_b / cast(tb as double)) *
        |     (n_a / cast(ta as double) - n_b / cast(tb as double)) /
        |     (n_a / cast(ta as double) + n_b / cast(tb as double))) * 1e9, 0)
        |    as bigint) AS contrib_nano
        |FROM c CROSS JOIN t""".stripMargin,

    // CUBE with the same four aggregates; dup flag = content-fingerprint
    // multiplicity (NULL text fingerprints as the empty string, both sides).
    "q109_datacard" ->
      """WITH f AS (
        |  SELECT lang, source, n_chars,
        |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
        |    md5(coalesce(text, '')) AS fp
        |  FROM documents),
        |g AS (
        |  SELECT f.*, count(*) OVER (PARTITION BY fp) > 1 AS dup FROM f)
        |SELECT lang, source, count(*) AS n_docs,
        |  cast(sum(n_tokens) as bigint) AS n_tokens,
        |  cast(sum(n_chars) as bigint) AS n_chars,
        |  cast(sum(CASE WHEN dup THEN 1 ELSE 0 END) as bigint) AS dup_docs
        |FROM g GROUP BY CUBE (lang, source)""".stripMargin,

    // Every update unrolled: the same integer arithmetic per round (// and
    // coalesce(inflow, 0) for nodes with no in-edges), micro-truncated ts
    // ordering mirroring the Spark reader, all node ranks value-exact.
    "q106_pagerank" -> {
      val rounds = (1 to 8).map { i =>
        s"""i$i AS (
           |  SELECT e.dst AS node, sum(e.w * (r.r // d.deg)) AS inflow
           |  FROM ew e JOIN r${i - 1} r ON r.node = e.src
           |  JOIN deg d ON d.src = e.src GROUP BY 1),
           |r$i AS (
           |  SELECT nd.node,
           |    (SELECT jump FROM c0) + (85 * coalesce(i.inflow, 0)) // 100 AS r
           |  FROM nodes nd LEFT JOIN i$i i ON i.node = nd.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH ev AS (
         |  SELECT user_id, epoch_ns(ts) // 1000 AS tus, event_id,
         |    cast(regexp_extract(props, '"k": (\\d+)', 1) as bigint) AS page
         |  FROM events),
         |ed AS (
         |  SELECT src, dst FROM (
         |    SELECT page AS src,
         |      lead(page) OVER (PARTITION BY user_id ORDER BY tus, event_id)
         |        AS dst
         |    FROM ev)
         |  WHERE dst IS NOT NULL),
         |ew AS (SELECT src, dst, count(*) AS w FROM ed GROUP BY 1, 2),
         |deg AS (SELECT src, sum(w) AS deg FROM ew GROUP BY 1),
         |nodes AS (SELECT DISTINCT node FROM
         |  (SELECT src AS node FROM ew UNION ALL SELECT dst FROM ew)),
         |par AS (SELECT count(*) AS n FROM nodes),
         |c0 AS (SELECT 1000000000000 // n AS init,
         |  (15 * (1000000000000 // n)) // 100 AS jump FROM par),
         |r0 AS (SELECT node, (SELECT init FROM c0) AS r FROM nodes),
         |$rounds
         |SELECT node, cast(r as bigint) AS rank_nano FROM r8""".stripMargin
    },

    // The deterministic admission order (batch via the replay's ntile rule,
    // then id) replayed as one window: admitted iff rank ≤ quota, and the
    // emitted rank must EQUAL the row_number — order, not just membership.
    "q105_stream_quota" ->
      """WITH bat AS (
        |  SELECT doc_id, source, ntile(4) OVER (ORDER BY doc_id) AS batch
        |  FROM documents),
        |r AS (
        |  SELECT source, doc_id, row_number() OVER (
        |    PARTITION BY source ORDER BY batch, doc_id) AS rank
        |  FROM bat)
        |SELECT source, doc_id, rank FROM r WHERE rank <= 10""".stripMargin,

    // The whole perceptual pipeline in closed form (q30's discipline): the
    // synthesis pixel formula, the one-pixel edit, the 8×8 nearest-sample
    // grid, the integer-mean bit rule, and pairwise Hamming — any decode or
    // resample drift anywhere breaks the pair set.
    "q104_image_neardup" ->
      """WITH base AS (SELECT doc_id FROM documents WHERE doc_id < 64),
        |imgs AS (
        |  SELECT doc_id AS id, doc_id * 31 AS c, 8 + doc_id % 9 AS w,
        |    8 + doc_id % 7 AS h, FALSE AS ed FROM base
        |  UNION ALL
        |  SELECT doc_id + 100000, doc_id * 31, 8 + doc_id % 9,
        |    8 + doc_id % 7, TRUE FROM base WHERE doc_id % 4 = 0),
        |px AS (
        |  SELECT id, [
        |    CASE WHEN ed AND ((j % 8) * w) // 8 = 0 AND ((j // 8) * h) // 8 = 0
        |         THEN (c + 100) % 256
        |         ELSE (c + (((j % 8) * w) // 8) * 7 +
        |               (((j // 8) * h) // 8) * 13) % 256 END
        |    FOR j IN generate_series(0, 63)] AS p
        |  FROM imgs),
        |bv AS (
        |  SELECT id, [CASE WHEN p[k] * 64 > list_sum(p) THEN 1 ELSE 0 END
        |              FOR k IN generate_series(1, 64)] AS bits
        |  FROM px)
        |SELECT x.id AS id_a, y.id AS id_b,
        |  CAST(list_sum([abs(x.bits[k] - y.bits[k])
        |                 FOR k IN generate_series(1, 64)]) AS BIGINT) AS hamming
        |FROM bv x JOIN bv y ON x.id < y.id
        |WHERE list_sum([abs(x.bits[k] - y.bits[k])
        |                FOR k IN generate_series(1, 64)]) <= 6""".stripMargin,

    // The identical estimator end-to-end: planted markers, md5 % 256
    // buckets, add-one smoothed ln weights nano-quantized per cell (q97's
    // idiom), exact integer score sums, argmax by (score desc, class asc).
    "q103_nb_confusion" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN text || ' alpha beta alpha'
        |         ELSE text END AS text,
        |    CASE WHEN doc_id % 3 = 0 THEN 'aug' ELSE 'plain' END AS cls
        |  FROM documents),
        |tk AS (
        |  SELECT doc_id, cls,
        |    ('0x' || substr(md5(tok), 1, 15))::BIGINT % 256 AS b
        |  FROM (
        |    SELECT doc_id, cls,
        |      unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
        |        AS tok
        |    FROM base)),
        |cls AS (SELECT cls AS c, count(*) AS n_docs FROM base GROUP BY 1),
        |tot AS (SELECT sum(n_docs) AS nd FROM cls),
        |pri AS (
        |  SELECT c, cast(round(ln(n_docs / cast(nd as double)) * 1e9, 0)
        |    as bigint) AS pn
        |  FROM cls CROSS JOIN tot),
        |cnts AS (SELECT cls AS c, b, count(*) AS cnt FROM tk GROUP BY 1, 2),
        |ctot AS (SELECT c, sum(cnt) AS tc FROM cnts GROUP BY 1),
        |grid AS (
        |  SELECT c, gs.b FROM cls,
        |    (SELECT unnest(generate_series(0, 255)) AS b) gs),
        |w AS (
        |  SELECT grid.c, grid.b, cast(round(
        |    ln((coalesce(cnt, 0) + 1) / cast(coalesce(tc, 0) + 256 as double))
        |      * 1e9, 0) as bigint) AS wn
        |  FROM grid
        |  LEFT JOIN cnts ON cnts.c = grid.c AND cnts.b = grid.b
        |  LEFT JOIN ctot ON ctot.c = grid.c),
        |sc AS (
        |  SELECT tk.doc_id, tk.cls, w.c, sum(wn) AS sw
        |  FROM tk JOIN w ON tk.b = w.b GROUP BY 1, 2, 3),
        |fin AS (
        |  SELECT doc_id, cls, c, sw + pn AS score,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY sw + pn DESC, c)
        |      AS rk
        |  FROM sc JOIN pri USING (c))
        |SELECT cls, c AS pred, count(*) AS n,
        |  cast(sum(score) as bigint) AS score_sum
        |FROM fin WHERE rk = 1 GROUP BY 1, 2""".stripMargin,

    // The running-sum prefix rule replayed verbatim: same md5 order key as
    // every sampler, RANGE default frame is safe because (h, doc_id) is
    // unique — the ≤-budget prefix is identical arithmetic on both engines.
    "q100_budget_select" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
        |    ('0x' || substr(md5(cast(doc_id as varchar)), 1, 15))::BIGINT AS h
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lang, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id) AS cum
        |  FROM t)
        |SELECT doc_id, lang, n_tokens FROM c
        |WHERE cum <= CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 10000
        |                       ELSE 2000 END""".stripMargin,

    // Integer div/mod epochs + the same prefix rule for the remainder; the
    // epoch fan-out replays as unnest(generate_series).
    "q101_repeat_epochs" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
        |    ('0x' || substr(md5(cast(doc_id as varchar)), 1, 15))::BIGINT AS h
        |  FROM documents),
        |s AS (SELECT lang, sum(n_tokens) AS tot FROM t GROUP BY lang),
        |c AS (
        |  SELECT doc_id, lang, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id) AS cum,
        |    cast(CASE lang WHEN 'en' THEN 15000 WHEN 'zh' THEN 10000
        |                   ELSE 4000 END as bigint) AS tgt
        |  FROM t),
        |r AS (
        |  SELECT doc_id, lang,
        |    cast((tgt // tot) +
        |      CASE WHEN cum <= tgt % tot THEN 1 ELSE 0 END as bigint) AS rep
        |  FROM c JOIN s USING (lang))
        |SELECT doc_id, lang, unnest(generate_series(1, rep)) AS epoch
        |FROM r WHERE rep >= 1""".stripMargin,

    // One row_number window per source in the identical hash order.
    "q102_source_cap" ->
      """WITH r AS (
        |  SELECT doc_id, source, row_number() OVER (
        |    PARTITION BY source
        |    ORDER BY ('0x' || substr(md5(cast(doc_id as varchar)), 1, 15))::BIGINT,
        |      doc_id) AS rk
        |  FROM documents)
        |SELECT doc_id, source FROM r WHERE rk <= 10""".stripMargin,

    // Same inverted-index construction as q24's jaccard oracle (string
    // shingles stand in for the hashed ones — collision-free at these SFs),
    // with least() in the denominator and the planted 15-token quotes
    // replayed by the identical slice arithmetic.
    "q99_containment" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 50000 AS doc_id,
        |    array_to_string(string_split(text, ' ')[1:15], ' ') AS text
        |  FROM documents WHERE doc_id % 17 = 0),
        |t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM base),
        |sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks) - 2)] END) AS s
        |  FROM t),
        |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
        |inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |keep AS (SELECT g FROM inv GROUP BY g HAVING count(*) <= 1000),
        |invk AS (SELECT inv.* FROM inv JOIN keep USING (g)),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM invk a JOIN invk b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT id_a, id_b, na.n AS n_a, nb.n AS n_b, inter,
        |  round(inter / cast(least(na.n, nb.n) as double), 6) AS containment
        |FROM pairs
        |JOIN sizes na ON na.doc_id = id_a
        |JOIN sizes nb ON nb.doc_id = id_b
        |WHERE inter / cast(least(na.n, nb.n) as double) >= 0.9""".stripMargin,

    "q98_length_band" ->
      """WITH r AS (
        |  SELECT doc_id, lang, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rk,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents)
        |SELECT doc_id, lang, n_chars FROM r
        |WHERE rk > (n * 50) // 1000 AND rk <= (n * 950) // 1000""".stripMargin,

    // The identical estimator: 60-bit md5 buckets mod 256, add-one smoothed
    // ln ratios nano-quantized per token (q90's round-then-bigint idiom),
    // exact integer sums per doc.
    "q97_importance_scores" ->
      """WITH e AS (
        |  SELECT doc_id, coalesce(lang = 'en', FALSE) AS is_t,
        |    ('0x' || substr(md5(tok), 1, 15))::BIGINT % 256 AS b
        |  FROM (
        |    SELECT doc_id, lang,
        |      unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
        |        AS tok
        |    FROM documents)),
        |stats AS (
        |  SELECT b, sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS tb,
        |    count(*) AS gb
        |  FROM e GROUP BY b),
        |tot AS (SELECT sum(tb) AS tt, sum(gb) AS gt FROM stats),
        |w AS (
        |  SELECT b, cast(round(
        |    (ln((tb + 1) / cast(tt + 256 as double)) -
        |     ln((gb + 1) / cast(gt + 256 as double))) * 1e9, 0) as bigint)
        |    AS wn
        |  FROM stats CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(cast(sum(wn) as double) / 1e9, 6) AS score
        |FROM e JOIN w USING (b) GROUP BY doc_id""".stripMargin,

    // The same two-level shape: word-frequency dictionary, then char pairs
    // via list comprehension over the distinct words (q91's construction
    // idiom), weighted sum, count-desc/pair ties.
    "q96_bpe_pairs" ->
      """WITH w AS (
        |  SELECT word, count(*) AS wn FROM (
        |    SELECT unnest(list_filter(string_split(lower(text), ' '),
        |      t -> t <> '')) AS word
        |    FROM documents)
        |  GROUP BY word),
        |p AS (
        |  SELECT unnest([substr(word, i, 2)
        |                 FOR i IN generate_series(1, length(word) - 1)]) AS pair,
        |    wn
        |  FROM w WHERE length(word) >= 2)
        |SELECT pair, cast(sum(wn) as bigint) AS n FROM p
        |GROUP BY pair ORDER BY n DESC, pair LIMIT 30""".stripMargin,

    // The funnel's four gates replayed from their proven fragments (q21's
    // quality arithmetic, q20's marker scores), cumulative-AND'd with
    // NULL→fail coalesce, then the stage rows assembled by UNION ALL over
    // one aggregate — counts must match Spark's exactly.
    "q95_filter_funnel" ->
      """WITH t AS (
        |  SELECT text,
        |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
        |  FROM documents),
        |c AS (
        |  SELECT
        |    coalesce(text IS NOT NULL AND length(text) >= 100, FALSE) AS c1x,
        |    coalesce(len(tk) >= 20, FALSE) AS p2,
    |    coalesce(round(
        |      least(length(text) / 500.0, 1.0) * 0.4 +
        |      least(len(list_filter(tk, x -> x IN
        |        ('the','a','of','and','to','der','die','das','und',
        |         'le','la','les','et','el','los','y','que')))
        |        / greatest(len(tk), 1.0) * 10.0, 1.0) * 0.3 +
        |      (CASE WHEN len(tk) = 0 THEN 0.0
        |            ELSE len(list_distinct(tk)) / cast(len(tk) as double) END)
        |        * 0.3, 6) >= 0.45, FALSE) AS p3,
        |    coalesce(greatest(
        |      len(list_filter(tk, x -> x IN ('the','a','of','and','to'))),
        |      len(list_filter(tk, x -> x IN ('der','die','das','und'))),
        |      len(list_filter(tk, x -> x IN ('le','la','les','et'))),
        |      len(list_filter(tk, x -> x IN ('el','los','y','que')))) > 0,
        |      FALSE) AS p4
        |  FROM t),
        |agg AS (
        |  SELECT count(*) AS n0,
        |    sum(CASE WHEN c1x THEN 1 ELSE 0 END) AS n1,
        |    sum(CASE WHEN c1x AND p2 THEN 1 ELSE 0 END) AS n2,
        |    sum(CASE WHEN c1x AND p2 AND p3 THEN 1 ELSE 0 END) AS n3,
        |    sum(CASE WHEN c1x AND p2 AND p3 AND p4 THEN 1 ELSE 0 END) AS n4
        |  FROM c)
        |SELECT cast(stage as bigint) AS stage, stage_name,
        |  cast(n_entered as bigint) AS n_entered,
        |  cast(n_passed as bigint) AS n_passed,
        |  cast(n_entered - n_passed as bigint) AS n_dropped
        |FROM (
        |  SELECT 1 AS stage, 'has_text' AS stage_name, n0 AS n_entered, n1 AS n_passed FROM agg
        |  UNION ALL SELECT 2, 'min_tokens', n1, n2 FROM agg
        |  UNION ALL SELECT 3, 'quality', n2, n3 FROM agg
        |  UNION ALL SELECT 4, 'lang_known', n3, n4 FROM agg)""".stripMargin,

    // The full SemDeDup replay, every step exact: q85's quantization, seed
    // cells by (md5, id), cosine as integer dot/norm sums through one
    // dot/(sqrt·sqrt) — bit-identical doubles, so argmax assignment, the
    // tau threshold, and the keep-peripheral victim rule all agree with
    // Spark without tolerance.
    "q94_semantic_dedup" ->
      """WITH base AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 10000,
        |    list_transform(embedding, x -> cast(cast(x as double) * 1.001 as float))
        |  FROM embeddings WHERE vec_id % 20 = 0
        |  UNION ALL
        |  SELECT vec_id + 20000, embedding FROM embeddings WHERE vec_id % 30 = 7),
        |q AS (
        |  SELECT vec_id, list_transform(embedding, x -> CASE WHEN maxabs = 0 THEN 0
        |      ELSE cast(floor(cast(x as double) * 127.0 / maxabs) as bigint) END) AS qv
        |  FROM (SELECT vec_id, embedding,
        |          cast(list_max(list_transform(embedding, x -> abs(x))) as double) AS maxabs
        |        FROM base WHERE embedding IS NOT NULL)),
        |seeds AS (
        |  SELECT qv AS sv,
        |    row_number() OVER (ORDER BY
        |      ('0x' || substr(md5(cast(vec_id as varchar)), 1, 15))::BIGINT, vec_id) - 1 AS cell
        |  FROM q QUALIFY cell < 10),
        |assign AS (
        |  SELECT vec_id, qv, cell, c AS cent_cos FROM (
        |    SELECT q.vec_id, q.qv, s.cell,
        |      CASE WHEN l.na = 0 OR l.nb = 0 THEN 0.0
        |           ELSE l.dot / (sqrt(l.na) * sqrt(l.nb)) END AS c,
        |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |        CASE WHEN l.na = 0 OR l.nb = 0 THEN 0.0
        |             ELSE l.dot / (sqrt(l.na) * sqrt(l.nb)) END DESC, s.cell) AS rk
        |    FROM q CROSS JOIN seeds s CROSS JOIN LATERAL (
        |      SELECT list_dot_product(cast(q.qv as double[]), cast(s.sv as double[])) AS dot,
        |             list_dot_product(cast(q.qv as double[]), cast(q.qv as double[])) AS na,
        |             list_dot_product(cast(s.sv as double[]), cast(s.sv as double[])) AS nb) l)
        |  WHERE rk = 1),
        |pairs AS (
        |  SELECT a.vec_id AS aid, b.vec_id AS bid, a.cent_cos AS ac, b.cent_cos AS bc,
        |    CASE WHEN l.na = 0 OR l.nb = 0 THEN 0.0
        |         ELSE l.dot / (sqrt(l.na) * sqrt(l.nb)) END AS c
        |  FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  CROSS JOIN LATERAL (
        |    SELECT list_dot_product(cast(a.qv as double[]), cast(b.qv as double[])) AS dot,
        |           list_dot_product(cast(a.qv as double[]), cast(a.qv as double[])) AS na,
        |           list_dot_product(cast(b.qv as double[]), cast(b.qv as double[])) AS nb) l),
        |victims AS (
        |  SELECT DISTINCT CASE WHEN ac > bc THEN aid ELSE bid END AS v
        |  FROM pairs WHERE c >= 0.99)
        |SELECT vec_id, cell, round(cent_cos, 6) AS cent_cos
        |FROM assign WHERE vec_id NOT IN (SELECT v FROM victims)""".stripMargin,

    // Presence via the join sides (not fingerprint nullness), null-safe
    // fingerprint equality for the changed/unchanged split — the exact
    // contract of Dedup.snapshotDelta.
    "q93_snapshot_delta" ->
      """WITH oldd AS (
        |  SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 7 <> 0),
        |newd AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 5 = 0 THEN text || ' updated'
        |             ELSE text END) AS fp
        |  FROM documents WHERE doc_id % 11 <> 3)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.fp IS NOT DISTINCT FROM n.fp THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM oldd o FULL OUTER JOIN newd n ON o.doc_id = n.doc_id""".stripMargin,

    // The identical arithmetic: w = floor(sqrt(n)·1e6) (sqrt is IEEE
    // correctly-rounded — bit-identical across engines), share = floor
    // ((w/Σw)·budget) through exact-integer doubles, min-wise rank per
    // stratum on the md5 key. Every selected id is value-checked.
    "q92_temperature_mix" ->
      """WITH stats AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |wts AS (
        |  SELECT lang, n,
        |    cast(floor(sqrt(cast(n as double)) * 1000000.0) as bigint) AS w
        |  FROM stats),
        |tot AS (SELECT sum(w) AS tw FROM wts),
        |targets AS (
        |  SELECT lang,
        |    least(n, cast(floor((cast(w as double) / tw) * 200) as bigint)) AS c
        |  FROM wts CROSS JOIN tot),
        |ranked AS (
        |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
        |    ORDER BY ('0x' || substr(md5(cast(doc_id as varchar)), 1, 15))::BIGINT,
        |      doc_id) AS rk
        |  FROM documents)
        |SELECT r.doc_id, r.lang FROM ranked r
        |JOIN targets t ON r.lang = t.lang
        |WHERE r.rk <= t.c""".stripMargin,

    // The exact cross-corpus near-dup rule (q27's shingle construction and
    // the LSH-equals-exact equivalence q27 proves on this corpus): a batch
    // doc survives unless some corpus doc shares Jaccard >= 0.8 with it.
    "q91_ingest_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, source, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks) - 2)] END) AS s
        |  FROM t),
        |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
        |inv AS (SELECT doc_id, source, unnest(s) AS g FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS bid, b.doc_id AS cid, count(*) AS inter
        |  FROM inv a JOIN inv b
        |    ON a.g = b.g AND a.source = 'src0' AND b.source <> 'src0'
        |  GROUP BY 1, 2),
        |dropped AS (
        |  SELECT DISTINCT bid FROM pairs
        |  JOIN sizes na ON na.doc_id = bid
        |  JOIN sizes nb ON nb.doc_id = cid
        |  WHERE inter / cast(na.n + nb.n - inter as double) >= 0.8)
        |SELECT doc_id, lang FROM documents
        |WHERE source = 'src0'
        |  AND doc_id NOT IN (SELECT bid FROM dropped)""".stripMargin,

    // BM25 replayed with the identical arithmetic SHAPE (operator-for-
    // operator: (N-df)+0.5 in double, (tf*(1.2+1.0)), (0.75*dl/avgdl) all
    // associate the same way), contributions quantized to nano-units
    // (q73's ln-parity contract), exact integer sum, ties broken by id.
    "q90_bm25_search" -> bm25FullScratchSql,

    // The md5 order key replayed verbatim; shard = key % 8 (the key is
    // non-negative top-60-md5-bits, so % == pmod), pos = per-shard
    // row_number over (key, id).
    "q87_epoch_shuffle" ->
      """WITH k AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5('epoch1' || ':' || cast(doc_id as varchar)),
        |      1, 15))::BIGINT AS key
        |  FROM documents)
        |SELECT doc_id, key % 8 AS shard,
        |  cast(row_number() OVER (PARTITION BY key % 8 ORDER BY key, doc_id)
        |    as bigint) AS pos
        |FROM k""".stripMargin,

    // Every projected coordinate replayed exactly: integer weights from
    // md5("b:d") (same scheme as q29's hyperplane buckets), vector
    // floor-quantized to micro-units, bigint dot products. The dims CTE
    // derives d from the data (no fixed cap: a regenerated corpus with wider
    // embeddings keeps the oracle exact instead of silently truncating).
    "q88_jl_projection" ->
      """WITH dims AS (
        |  SELECT b, d,
        |    ((('0x' || substr(md5(b || ':' || d), 1, 15))::BIGINT % 1000001)
        |      - 500000) AS w
        |  FROM range(16) t1(b),
        |    (SELECT DISTINCT generate_subscripts(embedding, 1) - 1 AS d
        |     FROM embeddings) t2(d)),
        |expl AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
        |    cast(floor(cast(unnest(embedding) as double) * 1000000.0)
        |      as bigint) AS q
        |  FROM embeddings),
        |pr AS (
        |  SELECT e.vec_id, dims.b, sum(e.q * dims.w) AS proj
        |  FROM expl e JOIN dims ON e.d = dims.d GROUP BY 1, 2)
        |SELECT v.vec_id, t.b AS proj_dim,
        |  cast(coalesce(pr.proj, 0) as bigint) AS proj
        |FROM (SELECT vec_id FROM embeddings WHERE embedding IS NOT NULL) v
        |CROSS JOIN range(16) t(b)
        |LEFT JOIN pr ON pr.vec_id = v.vec_id AND pr.b = t.b""".stripMargin,

    "q60_salted_agg" ->
      """SELECT l_suppkey, cast(sum(l_quantity) as bigint) AS sum_qty
        |FROM lineitem GROUP BY l_suppkey""".stripMargin,

    "q61_typed_refs" ->
      """SELECT doc_id AS key, source, n_chars FROM documents
        |WHERE lang = 'en' AND n_chars > 500""".stripMargin,

    "q62_indexed_upsert" ->
      """WITH c AS (SELECT c_custkey, c_name, c_mktsegment FROM customer),
        |upd AS (SELECT c_custkey, 'UPD_' || c_name AS c_name FROM c
        |        WHERE c_custkey % 97 = 0)
        |SELECT c.c_custkey AS key, coalesce(u.c_name, c.c_name) AS name,
        |       c.c_mktsegment AS segment
        |FROM c LEFT JOIN upd u ON c.c_custkey = u.c_custkey
        |UNION ALL
        |SELECT c_custkey + 10000000 AS key, 'NEW_' || c_name AS name,
        |       c_mktsegment AS segment
        |FROM c WHERE c_custkey % 131 = 0""".stripMargin,

    // Closed-form replay of the decoded statistics: pixel(x,y) =
    // (id·31+x·7+y·13) mod 256 over w×h, and the 5×4 nearest-neighbor resample
    // src(x·w//5, y·h//4). Matching Spark's output proves ImageIO's PNG
    // round-trip (and the resize resample) is bit-exact.
    "q63_image_decode" ->
      """WITH p AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
        |           FROM documents WHERE doc_id < 64)
        |SELECT doc_id, 'png' AS format,
        |  cast(w as int) AS width, cast(h as int) AS height,
        |  cast(list_sum([(doc_id*31 + (i % w)*7 + (i // w)*13) % 256
        |    FOR i IN generate_series(0, w*h - 1)]) as bigint) AS pixel_sum,
        |  cast(list_sum([(doc_id*31 + ((i % 5) * w // 5)*7 +
        |      ((i // 5) * h // 4)*13) % 256
        |    FOR i IN generate_series(0, 19)]) as bigint) AS resized_sum
        |FROM p""".stripMargin,

    "q64_audio_decode" ->
      """WITH p AS (SELECT doc_id, 64 + doc_id % 64 AS n
        |           FROM documents WHERE doc_id < 100)
        |SELECT doc_id, 8000 AS sample_rate, cast(n as bigint) AS n_samples,
        |  cast(list_sum([abs((doc_id*7919 + i*104729) % 20001 - 10000)
        |    FOR i IN generate_series(0, n - 1)]) as bigint) AS sum_abs,
        |  cast(n * 125 as bigint) AS duration_us
        |FROM p""".stripMargin,

    // Shingle replay matches q24's tokenization (split on single space, drop
    // empties, len<n ⇒ one whole-text shingle); the join is on shingle STRINGS
    // where Spark joins 64-bit hashes — identical counts barring a 2^-64
    // collision.
    "q65_contamination" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(cast(doc_id as varchar)), 1, 15))::BIGINT
        |      % 100 < 80 AS is_train,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, is_train, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks) - 2)] END) AS s
        |  FROM t),
        |tr AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE is_train),
        |te AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE NOT is_train),
        |hit AS (SELECT doc_id, count(*) AS n_cont FROM te JOIN tr USING (g)
        |        GROUP BY 1)
        |SELECT z.doc_id, cast(len(z.s) as bigint) AS n_shingles,
        |  coalesce(h.n_cont, 0) AS n_contaminated,
        |  round(coalesce(h.n_cont, 0) / cast(len(z.s) as double), 6)
        |    AS contamination_rate
        |FROM sh z LEFT JOIN hit h USING (doc_id) WHERE NOT z.is_train""".stripMargin,

    // q65's exact replay for the bloom gate: the exact columns are
    // value-checked here; the bloom relation (n_bloom >= n_exact) was folded
    // into `bloom_ge_exact` inside the Spark query, so the oracle just pins
    // it TRUE for every test doc.
    "q79_contamination_bloom" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(cast(doc_id as varchar)), 1, 15))::BIGINT
        |      % 100 < 80 AS is_train,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, is_train, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks) - 2)] END) AS s
        |  FROM t),
        |tr AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE is_train),
        |te AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE NOT is_train),
        |hit AS (SELECT doc_id, count(*) AS n_cont FROM te JOIN tr USING (g)
        |        GROUP BY 1)
        |SELECT z.doc_id, cast(len(z.s) as bigint) AS n_shingles,
        |  coalesce(h.n_cont, 0) AS n_exact,
        |  TRUE AS bloom_ge_exact
        |FROM sh z LEFT JOIN hit h USING (doc_id) WHERE NOT z.is_train""".stripMargin,

    // The streaming near-dup replayed relationally: exact Jaccard pairs
    // (q27's inverted-index formulation — the LSH band layer has proven
    // equal recall on this corpus) + ntile batch assignment; a doc drops
    // iff some exact partner sits in a STRICTLY EARLIER batch (same-batch
    // ties admit both, matching the stream's same-batch no-compare rule).
    "q80_stream_near_dedup" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks) - 2)] END) AS s
        |  FROM t),
        |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
        |inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |near AS (
        |  SELECT id_a, id_b FROM pairs
        |  JOIN sizes na ON na.doc_id = id_a
        |  JOIN sizes nb ON nb.doc_id = id_b
        |  WHERE inter / cast(na.n + nb.n - inter as double) >= 0.8),
        |bat AS (SELECT doc_id, ntile(4) OVER (ORDER BY doc_id) AS batch
        |        FROM documents),
        |dropped AS (
        |  SELECT DISTINCT CASE WHEN ba.batch < bb.batch THEN p.id_b
        |                       ELSE p.id_a END AS doc_id
        |  FROM near p
        |  JOIN bat ba ON ba.doc_id = p.id_a
        |  JOIN bat bb ON bb.doc_id = p.id_b
        |  WHERE ba.batch <> bb.batch)
        |SELECT d.lang, count(*) AS n_docs,
        |  cast(sum(d.doc_id) as bigint) AS id_sum
        |FROM documents d
        |WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)
        |GROUP BY 1""".stripMargin,

    "q81_stratified_mix" ->
      """SELECT lang, count(*) AS n_docs,
        |  cast(sum(doc_id) as bigint) AS id_sum
        |FROM documents
        |WHERE ('0x' || substr(md5(cast(doc_id as varchar)), 1, 15))::BIGINT
        |    % 1000 <
        |  CASE lang WHEN 'en' THEN 250 WHEN 'zh' THEN 500 WHEN 'de' THEN 0
        |       ELSE 1000 END
        |GROUP BY 1""".stripMargin,

    "q82_context_chunks" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    unnest(generate_series(0, (len(toks) - 1) // 128)) AS chunk_idx,
        |    toks
        |  FROM t WHERE len(toks) > 0)
        |SELECT doc_id, chunk_idx,
        |  cast(len(toks[chunk_idx*128+1 : least((chunk_idx+1)*128, len(toks))])
        |    as bigint) AS n_tokens,
        |  md5(array_to_string(
        |    toks[chunk_idx*128+1 : least((chunk_idx+1)*128, len(toks))], ' '))
        |    AS chunk_md5
        |FROM c""".stripMargin,

    // Quantization replayed value-exactly: float->double promotion, one
    // multiply, one divide, explicit floor — identical IEEE ops in both
    // engines (the reason the operator uses floor, never round).
    "q85_quantized_embeddings" ->
      """WITH t AS (
        |  SELECT vec_id, embedding AS v,
        |    cast(list_max(list_transform(embedding, x -> abs(x))) as double)
        |      AS maxabs
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id, maxabs, v,
        |    list_transform(v, x -> CASE WHEN maxabs = 0 THEN 0
        |      ELSE cast(floor(cast(x as double) * 127.0 / maxabs) as bigint)
        |      END) AS qv
        |  FROM t)
        |SELECT vec_id,
        |  cast(floor(maxabs / 127.0 * 1000000.0) as bigint) AS scale_micro,
        |  CASE WHEN v IS NULL THEN NULL
        |       ELSE cast(coalesce(list_sum(qv), 0) as bigint) END AS q_sum,
        |  CASE WHEN v IS NULL THEN NULL
        |       ELSE cast(coalesce(list_sum(list_transform(qv, y -> y * y)), 0)
        |         as bigint) END AS q_sqsum
        |FROM q""".stripMargin,

    // q65's exact replay once more (the q79 pattern): exact columns
    // value-checked; the bloom-probe relations are folded into
    // `decontamination_sound` inside the Spark query, pinned TRUE here.
    "q84_stream_decontaminate" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(cast(doc_id as varchar)), 1, 15))::BIGINT
        |      % 100 < 80 AS is_train,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, is_train, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks) - 2)] END) AS s
        |  FROM t),
        |tr AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE is_train),
        |te AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE NOT is_train),
        |hit AS (SELECT doc_id, count(*) AS n_cont FROM te JOIN tr USING (g)
        |        GROUP BY 1)
        |SELECT z.doc_id, cast(len(z.s) as bigint) AS n_shingles,
        |  coalesce(h.n_cont, 0) AS n_exact,
        |  TRUE AS decontamination_sound
        |FROM sh z LEFT JOIN hit h USING (doc_id) WHERE NOT z.is_train""".stripMargin,

    "q83_sequence_packs" ->
      """WITH t AS (
        |  SELECT lang, doc_id,
        |    cast(len(list_filter(string_split(text, ' '), x -> x <> ''))
        |      as bigint) AS n
        |  FROM documents),
        |p AS (
        |  SELECT lang, doc_id, n,
        |    sum(n) OVER (PARTITION BY lang ORDER BY doc_id
        |                 ROWS UNBOUNDED PRECEDING) - n AS start_tok
        |  FROM t)
        |SELECT lang, cast(start_tok // 2048 as bigint) AS pack_id,
        |  count(*) AS n_docs, cast(sum(n) as bigint) AS pack_tokens
        |FROM p GROUP BY 1, 2""".stripMargin,

    // The bigram LM replayed on token STRINGS where Spark uses 64-bit hashes
    // (counts identical barring a 2^-64 collision). Two same-length unnests
    // zip positionally, giving consecutive-token pairs; each distinct
    // bigram's log-prob quantizes to an integer before the per-doc sum, so
    // summation order can't perturb the hash.
    "q73_lm_score" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, unnest(toks[1:len(toks)-1]) AS w1,
        |         unnest(toks[2:len(toks)]) AS w2
        |  FROM t WHERE len(toks) >= 2),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM b GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM b GROUP BY 1),
        |v AS (SELECT count(DISTINCT w) AS v FROM
        |        (SELECT unnest(toks) AS w FROM t WHERE len(toks) >= 2)),
        |model AS (
        |  SELECT w1, w2,
        |    cast(round(ln((c12 + 1.0) / (c1 + 1.0 * v)) * 1e9) AS BIGINT) AS qlp
        |  FROM c12 JOIN c1 USING (w1) CROSS JOIN v)
        |SELECT b.doc_id, count(*) AS n_bigrams,
        |  round(cast(sum(qlp) as double) / (count(*) * 1000000000.0), 6)
        |    AS avg_logprob
        |FROM b JOIN model USING (w1, w2)
        |GROUP BY b.doc_id""".stripMargin,

    "q66_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) < 2 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+1], ' ')
        |               FOR i IN generate_series(1, len(toks) - 1)] END AS g2,
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks) - 2)] END AS g3
        |  FROM t),
        |c2 AS (SELECT doc_id, g, count(*) AS c
        |       FROM (SELECT doc_id, unnest(g2) AS g FROM g) GROUP BY 1, 2),
        |a2 AS (SELECT doc_id, max(c) AS maxc, cast(sum(c) as bigint) AS tot
        |       FROM c2 GROUP BY 1)
        |SELECT g.doc_id, a2.tot AS n_2grams,
        |  round(a2.maxc / cast(a2.tot as double), 6) AS top2gram_frac,
        |  round(1.0 - len(list_distinct(g.g3)) / cast(len(g.g3) as double), 6)
        |    AS dup3gram_frac
        |FROM g JOIN a2 USING (doc_id)""".stripMargin,

    "q59_minwise_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |ORDER BY ('0x' || substr(md5(cast(doc_id as varchar)), 1, 15))::BIGINT,
        |  doc_id
        |LIMIT 100""".stripMargin,

    "q57_filter_or" ->
      """SELECT p_partkey, p_name, p_size FROM part
        |WHERE (p_name LIKE 'large%' OR p_name LIKE '%gadget%')
        |  AND p_size > 25""".stripMargin,

    "q58_family_qualifier_range" ->
      """SELECT user_id, cast(ts as date) AS day, count(*) AS searches
        |FROM events
        |WHERE cast(ts as date) >= DATE '2024-01-10'
        |  AND cast(ts as date) < DATE '2024-01-20'
        |GROUP BY 1, 2""".stripMargin,

    // session_window semantics: a session extends while consecutive events are
    // within the gap; end = last event + gap. Replayed via lag-gap numbering.
    // Tie rule (verified empirically, pinned in StreamingSpec): Spark MERGES an
    // event at exactly lastTs+gap into the session — the merge condition is
    // start <= previousEnd, inclusive — so the oracle's strict `>` (exact gap
    // = same session) is the correct mirror.
    "q56_session_window" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, new_sess DESC
        |      ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM g)
        |SELECT user_id,
        |  epoch_us(min(ts)) AS start_us,
        |  epoch_us(max(ts)) + 1800000000 AS end_us,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, sess_id""".stripMargin,

    // Identical one-shot double formulas over exact decimal moments: every
    // operand reaches the formula bit-identical, and *, /, sqrt are correctly
    // rounded, so the unrounded doubles hash-match.
    "q54_exact_stats" ->
      """WITH m AS (
        |  SELECT l_returnflag, count(*) AS n0,
        |    sum(cast(l_quantity as decimal(18,2))) AS sx,
        |    sum(cast(l_extendedprice as decimal(18,2))) AS sy,
        |    sum(cast(l_quantity as decimal(18,2)) *
        |        cast(l_quantity as decimal(18,2))) AS sxx,
        |    sum(cast(l_extendedprice as decimal(18,2)) *
        |        cast(l_extendedprice as decimal(18,2))) AS syy,
        |    sum(cast(l_quantity as decimal(18,2)) *
        |        cast(l_extendedprice as decimal(18,2))) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  cast(sx as double) / cast(n0 as double) AS mean_qty,
        |  sqrt((cast(n0 as double) * cast(sxx as double)
        |        - cast(sx as double) * cast(sx as double))
        |       / (cast(n0 as double) * (cast(n0 as double) - 1))) AS stddev_qty,
        |  (cast(n0 as double) * cast(sxy as double)
        |     - cast(sx as double) * cast(sy as double))
        |  / (sqrt(cast(n0 as double) * cast(sxx as double)
        |          - cast(sx as double) * cast(sx as double))
        |     * sqrt(cast(n0 as double) * cast(syy as double)
        |            - cast(sy as double) * cast(sy as double))) AS corr_qty_price,
        |  n0 AS n
        |FROM m""".stripMargin,

    "q55_pivot" ->
      """SELECT l_linestatus,
        | cast(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END) as bigint) AS a_qty,
        | cast(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END) as bigint) AS n_qty,
        | cast(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END) as bigint) AS r_qty
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,

    "q51_percentiles" ->
      """SELECT l_returnflag,
        | quantile_cont(l_quantity, 0.5) AS p50_qty,
        | quantile_cont(l_quantity, 0.95) AS p95_qty,
        | count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q52_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        | cast(round(sum(cast(o_totalprice as decimal(18,2))), 2) as double) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,

    "q53_scalar_funcs" ->
      """SELECT c_custkey,
        | upper(c_name) AS uname,
        | cast(length(c_name) as bigint) AS name_len,
        | substr(c_mktsegment, 1, 3) AS seg3,
        | concat_ws('-', c_mktsegment, cast(c_custkey as varchar)) AS seg_key,
        | cast(levenshtein(c_mktsegment, 'BUILDING') as bigint) AS lev,
        | lpad(cast(c_custkey as varchar), 8, '0') AS padded
        |FROM customer WHERE c_custkey <= 200""".stripMargin,

    // Stream/batch agreement: the interval join must emit exactly the batch
    // range join's inner pairs.
    "q49_stream_interval_join" ->
      """SELECT a.event_id, a.user_id, epoch_us(b.ts) AS clk_us
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'error') a
        |JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') b
        |  ON a.user_id = b.user_id
        | AND epoch_us(b.ts) > epoch_us(a.ts)
        | AND epoch_us(b.ts) <= epoch_us(a.ts) + 21600000000""".stripMargin,

    // Stream dedup must reduce the planted-duplicate stream back to exactly
    // the original event set.
    "q67_stream_dedup" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events""".stripMargin,

    "q69_pii_redact" ->
      """WITH inj AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id || '@example.com or id ' ||
        |      lpad(cast(doc_id % 10000 as varchar), 8, '0') AS t
        |  FROM documents WHERE doc_id < 200),
        |red AS (
        |  SELECT doc_id, t,
        |    regexp_replace(regexp_replace(t,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '[0-9]{7,}', '<NUM>', 'g') AS clean
        |  FROM inj)
        |SELECT doc_id, md5(clean) AS fp,
        |  cast(len(regexp_extract_all(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) as bigint)
        |    AS n_emails_before,
        |  cast(len(regexp_extract_all(clean,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) as bigint)
        |    AS n_emails_after,
        |  cast(contains(clean, '<NUM>') as int) AS has_num
        |FROM red""".stripMargin,

    "q70_stream_keyed_read" ->
      """SELECT c_mktsegment AS segment, count(*) AS n
        |FROM customer GROUP BY 1""".stripMargin,

    // UPDATE-then-MERGE replayed as CASE algebra (MERGE's update branch wins
    // over the earlier UPDATE for %35 keys) + the inserted key-shifted rows.
    "q71_sql_update_merge" ->
      """SELECT c_custkey, c_name,
        |  round(CASE WHEN c_custkey % 5 = 0 THEN cast(-1.0 as double)
        |             WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0
        |             ELSE c_acctbal END, 2) AS bal
        |FROM customer WHERE c_custkey % 3 = 0
        |UNION ALL
        |SELECT c_custkey + 5000000 AS c_custkey, 'NEW_' || c_name AS c_name,
        |  cast(-1.0 as double) AS bal
        |FROM customer
        |WHERE c_custkey % 5 = 0 AND (c_custkey + 5000000) % 3 = 0""".stripMargin,

    // Both DELETEs replayed as negated predicates (part has no null brands/
    // sizes, so NOT(pred) is the exact survivor set).
    "q68_catalog_sql" ->
      """SELECT p_partkey, p_name, p_size FROM part
        |WHERE p_partkey > 50
        |  AND NOT (p_size < 10 OR p_brand = 'Brand#21')
        |  AND p_partkey % 3 = 0""".stripMargin,

    "q41_range_join" ->
      """SELECT a.event_id, count(b.user_id) AS n_clicks_10m
        |FROM (SELECT event_id, user_id, epoch_us(ts) AS us FROM events
        |      WHERE event_type = 'error') a
        |LEFT JOIN (SELECT user_id, epoch_us(ts) AS us_b FROM events
        |           WHERE event_type = 'click') b
        |  ON a.user_id = b.user_id AND b.us_b > a.us AND b.us_b <= a.us + 600000000
        |GROUP BY a.event_id""".stripMargin,

    // Shared ≥20-token runs via the k-shingle identity, replayed on shingle
    // STRINGS (Spark joins 64-bit hashes; identical counts barring 2^-64).
    // Tokenization matches q24: split on single space, drop empties, len<k ⇒
    // one whole-text shingle. The keep CTE replays the Spark side's maxDf
    // stop-shingle cap (inv is distinct-per-doc, so count(*) = doc freq).
    "q74_shared_substring" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) < 20 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+19], ' ')
        |               FOR i IN generate_series(1, len(toks) - 19)] END) AS s
        |  FROM t),
        |inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |keep AS (SELECT g FROM inv GROUP BY g HAVING count(*) <= 1000),
        |invk AS (SELECT inv.* FROM inv JOIN keep USING (g))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
        |FROM invk a JOIN invk b ON a.g = b.g AND a.doc_id < b.doc_id
        |GROUP BY 1, 2""".stripMargin,

    // The full dedup pipeline: exact-Jaccard pairs (≡ the LSH candidate set
    // at threshold 0.8 — q27's proven equivalence) → recursive-CTE connected
    // components → survivors are cluster representatives (min id) plus every
    // unpaired doc.
    "q75_dedup_pipeline" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks) - 2)] END) AS s
        |  FROM t),
        |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
        |inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |cand AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |pairs AS (
        |  SELECT id_a, id_b FROM cand
        |  JOIN sizes na ON na.doc_id = id_a
        |  JOIN sizes nb ON nb.doc_id = id_b
        |  WHERE inter / cast(na.n + nb.n - inter as double) >= 0.8),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
        |labels AS (
        |  SELECT src AS doc_id, least(src, min(dst)) AS rep
        |  FROM reach GROUP BY src),
        |dropped AS (SELECT doc_id FROM labels WHERE doc_id <> rep)
        |SELECT d.lang, count(*) AS n_docs,
        |  cast(sum(d.doc_id) as bigint) AS id_sum
        |FROM documents d ANTI JOIN dropped USING (doc_id)
        |GROUP BY d.lang""".stripMargin,

    // Longest shared run per pair: positional shingle postings (two parallel
    // unnests zip value+offset), occurrence pairs, then gaps-and-islands per
    // (pair, diagonal) — max island + k−1 tokens. Same window algebra as the
    // Spark plan, on shingle strings instead of hashes. The keep CTE replays
    // BOTH Spark-side caps: maxDf on distinct docs and maxOccurrences on
    // total occurrences per shingle (inv here is positional, NOT distinct).
    "q76_shared_spans" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) < 20 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+19], ' ')
        |               FOR i IN generate_series(1, len(toks) - 19)] END AS s
        |  FROM t),
        |inv AS (SELECT doc_id, unnest(s) AS g,
        |          unnest(range(len(s))) AS pos FROM sh),
        |keep AS (SELECT g FROM inv GROUP BY g
        |         HAVING count(DISTINCT doc_id) <= 1000 AND count(*) <= 4000),
        |invk AS (SELECT inv.* FROM inv JOIN keep USING (g)),
        |op AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |         a.pos AS pos_a, b.pos AS pos_b, a.g AS g
        |  FROM invk a JOIN invk b ON a.g = b.g AND a.doc_id < b.doc_id),
        |runs AS (
        |  SELECT id_a, id_b,
        |    pos_a - row_number() OVER (PARTITION BY id_a, id_b, pos_a - pos_b
        |                               ORDER BY pos_a) AS isl,
        |    pos_a - pos_b AS diag
        |  FROM op),
        |rl AS (SELECT id_a, id_b, count(*) AS run_len FROM runs
        |       GROUP BY id_a, id_b, diag, isl),
        |mx AS (SELECT id_a, id_b, cast(max(run_len) + 19 as bigint)
        |         AS max_run_tokens FROM rl GROUP BY 1, 2),
        |ns AS (SELECT id_a, id_b, count(DISTINCT g) AS n_shared FROM op
        |       GROUP BY 1, 2)
        |SELECT ns.id_a, ns.id_b, ns.n_shared, mx.max_run_tokens
        |FROM ns JOIN mx USING (id_a, id_b)""".stripMargin,

    // Span-cut replay: same positional postings + caps as q76; b-side
    // occurrences (doc_id > the shingle's min doc) expand to k covered token
    // offsets; cut docs reassemble from their uncovered tokens in order
    // (empty string when fully covered), untouched docs hash their ORIGINAL
    // text verbatim — the Spark side's pass-through contract.
    "q77_span_cut" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) < 20 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+19], ' ')
        |               FOR i IN generate_series(1, len(toks) - 19)] END AS s
        |  FROM t),
        |inv AS (SELECT doc_id, unnest(s) AS g,
        |          unnest(range(len(s))) AS pos FROM sh),
        |keep AS (SELECT g FROM inv GROUP BY g
        |         HAVING count(DISTINCT doc_id) BETWEEN 2 AND 1000
        |            AND count(*) <= 4000),
        |invk AS (SELECT inv.* FROM inv JOIN keep USING (g)),
        |minid AS (SELECT g, min(doc_id) AS min_id FROM invk GROUP BY g),
        |cov AS (
        |  SELECT DISTINCT i.doc_id, i.pos + o.off AS pos
        |  FROM invk i JOIN minid m USING (g)
        |  CROSS JOIN (SELECT unnest(generate_series(0, 19)) AS off) o
        |  WHERE i.doc_id > m.min_id),
        |cutdocs AS (SELECT DISTINCT doc_id FROM cov),
        |tok AS (
        |  SELECT t.doc_id, unnest(t.toks) AS tok,
        |         unnest(range(len(t.toks))) AS pos
        |  FROM t JOIN cutdocs USING (doc_id)),
        |kept AS (SELECT tok.* FROM tok ANTI JOIN cov USING (doc_id, pos)),
        |rebuilt AS (
        |  SELECT c.doc_id,
        |    coalesce(r.text_clean, '') AS text_clean,
        |    coalesce(r.n_tokens, 0) AS n_tokens
        |  FROM cutdocs c LEFT JOIN (
        |    SELECT doc_id,
        |      array_to_string(list(tok ORDER BY pos), ' ') AS text_clean,
        |      count(*) AS n_tokens
        |    FROM kept GROUP BY doc_id) r USING (doc_id))
        |SELECT d.doc_id, cast(len(t.toks) as bigint) AS n_tokens,
        |  md5(d.text) AS clean_md5
        |FROM documents d JOIN t USING (doc_id)
        |ANTI JOIN cutdocs USING (doc_id)
        |UNION ALL
        |SELECT doc_id, cast(n_tokens as bigint) AS n_tokens,
        |  md5(text_clean) AS clean_md5
        |FROM rebuilt""".stripMargin,

    // Novelty replay on shingle strings: per-shingle corpus document
    // frequency (inv is distinct-per-doc, so count(*) = df), then per-doc
    // counts of df=1 shingles.
    "q78_novelty" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks) - 2)] END) AS s
        |  FROM t),
        |inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |dfreq AS (SELECT g, count(*) AS df FROM inv GROUP BY g)
        |SELECT doc_id, count(*) AS n_shingles,
        |  cast(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) as bigint) AS n_unique,
        |  round(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) /
        |    cast(count(*) as double), 6) AS novelty_rate
        |FROM inv JOIN dfreq USING (g)
        |GROUP BY doc_id""".stripMargin,

    // The identical canonicalization chain (RE2-safe patterns, single-match
    // replaces so DuckDB's replace-first == Spark's replace-all) and the
    // identical keep-first rule.
    "q114_url_dedup" ->
      """WITH urls AS (
        |  SELECT doc_id, source,
        |    (CASE WHEN doc_id % 3 = 0 THEN 'https://'
        |          WHEN doc_id % 3 = 1 THEN 'HTTPS://www.'
        |          ELSE 'https://WWW.' END)
        |    || source || '.example.com'
        |    || CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END
        |    || '/Pages/' || (doc_id % 37)::VARCHAR
        |    || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
        |    || CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&b=2&a=1'
        |            WHEN doc_id % 4 = 1 THEN '?b=2&a=1&gclid=xyz' ELSE '' END
        |    || CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END AS url
        |  FROM documents),
        |steps AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(url, '#.*$', ''),
        |      '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
        |  FROM urls),
        |parts AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(
        |      lower(regexp_extract(rest, '^([^/?]+)', 1)),
        |      '^www\.', ''), ':(80|443)$', '') AS host,
        |    regexp_replace(
        |      regexp_extract(rest, '^[^/?]*(/[^?]*)', 1), '/+$', '') AS path,
        |    list_sort(list_filter(
        |      string_split(regexp_extract(rest, '\?(.*)$', 1), '&'),
        |      p -> p <> '' AND NOT regexp_matches(p,
        |        '^(utm_[^=]*|fbclid|gclid|ref)='))) AS kept
        |  FROM steps),
        |canon AS (
        |  SELECT doc_id,
        |    host || path ||
        |      CASE WHEN len(kept) > 0
        |           THEN '?' || array_to_string(kept, '&') ELSE '' END
        |      AS canonical
        |  FROM parts)
        |SELECT canonical, count(*) AS n_docs, min(doc_id) AS keep_id
        |FROM canon GROUP BY canonical ORDER BY canonical""".stripMargin,

    // q111's composite-doc scaffold; winner = row_number() = 1 over
    // (id, pos) per paragraph hash — the exact min(struct) rule — and every
    // reassembled text md5-hashed.
    "q115_para_dedup" ->
      """WITH base AS (
        |  SELECT doc_id % 60 AS gid, doc_id, text
        |  FROM documents WHERE text IS NOT NULL),
        |comp AS (
        |  SELECT gid, string_agg(text, chr(10) ORDER BY doc_id) AS body
        |  FROM base GROUP BY gid),
        |docs AS (
        |  SELECT gid AS id,
        |    CASE WHEN gid % 3 = 0
        |         THEN 'breaking syndicated lede paragraph' || chr(10)
        |         ELSE '' END
        |    || body
        |    || CASE WHEN gid % 4 = 0
        |            THEN chr(10) || 'standard disclaimer applies'
        |            ELSE '' END AS text
        |  FROM comp),
        |split_docs AS (
        |  SELECT id, string_split(text, chr(10)) AS parts FROM docs),
        |paras AS (
        |  SELECT id, unnest(generate_series(1, len(parts))) AS pos, parts
        |  FROM split_docs),
        |hashed AS (
        |  SELECT id, pos,
        |    ('0x' || substr(md5(parts[pos]), 1, 15))::BIGINT AS h
        |  FROM paras),
        |ranked AS (
        |  SELECT id, pos,
        |    row_number() OVER (PARTITION BY h ORDER BY id, pos) AS rn
        |  FROM hashed),
        |kept AS (SELECT id, pos FROM ranked WHERE rn = 1),
        |cleaned AS (
        |  SELECT k.id, string_agg(s.parts[k.pos], chr(10) ORDER BY k.pos) AS text
        |  FROM kept k JOIN split_docs s USING (id) GROUP BY k.id),
        |counts AS (
        |  SELECT id, count(*) AS n_dropped FROM ranked WHERE rn > 1 GROUP BY id)
        |SELECT s.id, md5(coalesce(c.text, '')) AS text_md5,
        |  cast(len(s.parts) AS bigint) AS n_paras,
        |  cast(coalesce(n.n_dropped, 0) AS bigint) AS n_dropped
        |FROM split_docs s
        |LEFT JOIN cleaned c USING (id) LEFT JOIN counts n USING (id)""".stripMargin,

    // the exact extractHtmlText chain: comments, script/style (content and
    // all), tags → space, the five entities (&amp; last), collapse + trim
    "q116_html_extract" ->
      """WITH html AS (
        |  SELECT doc_id,
        |    '<html><head><title>Doc ' || doc_id::VARCHAR ||
        |    '</title><style type="text/css">body { color: #333; }</style>' ||
        |    '<script>var x = 1 < 2 && "a";</script></head><body>' ||
        |    CASE WHEN doc_id % 3 = 0
        |         THEN '<!-- nav' || chr(10) || 'boilerplate' || chr(10) ||
        |              '<p>not text</p> -->' ELSE '' END ||
        |    '<h1>Title &amp; Header</h1><p>' || text ||
        |    '</p><ul><li>A&nbsp;&lt;tag&gt;</li><li>B &#39;q&#39; &quot;r&quot;</li></ul>' ||
        |    CASE WHEN doc_id % 4 = 0
        |         THEN '<SCRIPT type="text/javascript">alert(1)</SCRIPT>'
        |         ELSE '' END ||
        |    '</body></html>' AS html
        |  FROM documents WHERE text IS NOT NULL),
        |c1 AS (SELECT doc_id,
        |  regexp_replace(html, '(?s)<!--.*?-->', ' ', 'g') AS s FROM html),
        |c2 AS (SELECT doc_id,
        |  regexp_replace(s, '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS s FROM c1),
        |c3 AS (SELECT doc_id,
        |  regexp_replace(s, '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS s FROM c2),
        |c4 AS (SELECT doc_id, regexp_replace(s, '<[^>]*>', ' ', 'g') AS s FROM c3),
        |c5 AS (SELECT doc_id,
        |  replace(replace(replace(replace(replace(replace(s,
        |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |    '&nbsp;', ' '), '&amp;', '&') AS s FROM c4),
        |clean AS (SELECT doc_id,
        |  trim(regexp_replace(s, '\s+', ' ', 'g')) AS clean FROM c5)
        |SELECT doc_id, md5(clean) AS clean_md5,
        |  cast(len(list_filter(string_split(clean, ' '), x -> x <> ''))
        |    AS bigint) AS n_tokens
        |FROM clean""".stripMargin,

    // every Gopher counter rebuilt from the same string primitives, every
    // rule the same integer cross-multiplication
    "q117_gopher_rules" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    text ||
        |    CASE WHEN doc_id % 5 = 0
        |         THEN chr(10) || '- bullet one' || chr(10) || '- bullet two' ||
        |              chr(10) || '* bullet three' ELSE '' END ||
        |    CASE WHEN doc_id % 7 = 0
        |         THEN chr(10) || 'to be continued...' || chr(10) || 'and more...'
        |         ELSE '' END ||
        |    CASE WHEN doc_id % 11 = 0
        |         THEN ' ### 123 456 $$$ 789 42 7 99 100' ELSE '' END AS text
        |  FROM documents WHERE text IS NOT NULL),
        |m AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_words,
        |    len(string_split(text, chr(10))) AS n_lines,
        |    length(replace(text, ' ', '')) AS n_chars,
        |    length(text) - length(replace(text, '#', '')) AS n_hash,
        |    (length(text) - length(replace(text, '...', ''))) // 3 AS n_ell,
        |    len(list_filter(string_split(
        |      regexp_replace(text, '[^ ]*[A-Za-z][^ ]*', '', 'g'), ' '),
        |      x -> x <> '')) AS n_nonalpha,
        |    len(regexp_extract_all(text, '(?m)^(- |\* )')) AS n_bullet,
        |    len(regexp_extract_all(text, '(?m)\.\.\.$')) AS n_ellline,
        |    len(list_filter(string_split(lower(text), ' '), x -> x IN
        |      ('the','be','to','of','and','that','have','with'))) AS n_stop
        |  FROM docs)
        |SELECT doc_id,
        |  cast(n_words AS bigint) AS n_words,
        |  cast(n_lines AS bigint) AS n_lines,
        |  (n_words >= 10 AND n_words <= 100000) AS r_word_count,
        |  (3 * n_words <= n_chars AND n_chars <= 10 * n_words) AS r_mean_word_len,
        |  (10 * (n_hash + n_ell) < n_words) AS r_symbol_ratio,
        |  (10 * n_bullet <= 9 * n_lines) AS r_bullet_lines,
        |  (10 * n_ellline <= 3 * n_lines) AS r_ellipsis_lines,
        |  (5 * (n_words - n_nonalpha) > 4 * n_words) AS r_alpha_words,
        |  (n_stop >= 2) AS r_stop_words,
        |  ((n_words >= 10 AND n_words <= 100000) AND
        |   (3 * n_words <= n_chars AND n_chars <= 10 * n_words) AND
        |   (10 * (n_hash + n_ell) < n_words) AND
        |   (10 * n_bullet <= 9 * n_lines) AND
        |   (10 * n_ellline <= 3 * n_lines) AND
        |   (5 * (n_words - n_nonalpha) > 4 * n_words) AND
        |   (n_stop >= 2)) AS keep
        |FROM m""".stripMargin,

    "q118_registered_domain" ->
      """WITH hosts AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 13 = 0 THEN 'localhost'
        |         ELSE (CASE WHEN doc_id % 4 = 0 THEN 'cdn.assets.'
        |                    WHEN doc_id % 4 = 1 THEN 'blog.' ELSE '' END)
        |              || source || '-site'
        |              || (CASE WHEN doc_id % 5 = 0 THEN '.co.uk'
        |                       WHEN doc_id % 5 = 1 THEN '.com.au'
        |                       WHEN doc_id % 5 = 2 THEN '.org'
        |                       WHEN doc_id % 5 = 3 THEN '.io'
        |                       ELSE '.com' END)
        |    END AS host
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, host, string_split(host, '.') AS labels,
        |    len(string_split(host, '.')) AS n
        |  FROM hosts),
        |d AS (
        |  SELECT doc_id,
        |    CASE WHEN n >= 3 AND array_to_string(labels[-2:], '.') IN
        |           ('co.uk','org.uk','ac.uk','gov.uk','com.au','net.au',
        |            'org.au','co.jp','ne.jp','or.jp','co.nz','com.br',
        |            'com.mx','co.in','co.kr','com.sg','co.za','com.cn',
        |            'com.tr','com.ar')
        |         THEN array_to_string(labels[-3:], '.')
        |         WHEN n >= 2 THEN array_to_string(labels[-2:], '.')
        |         ELSE host END AS rdomain
        |  FROM r)
        |SELECT rdomain, count(*) AS n_docs, min(doc_id) AS first_id
        |FROM d GROUP BY rdomain ORDER BY rdomain""".stripMargin,

    // q73's bigram-LM CTEs verbatim, then the lang join and the integer
    // rank cuts (3·rk ≤ n / 3·rk ≤ 2n) over (score desc, doc_id)
    "q119_ccnet_buckets" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, unnest(toks[1:len(toks)-1]) AS w1,
        |         unnest(toks[2:len(toks)]) AS w2
        |  FROM t WHERE len(toks) >= 2),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM b GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM b GROUP BY 1),
        |v AS (SELECT count(DISTINCT w) AS v FROM
        |        (SELECT unnest(toks) AS w FROM t WHERE len(toks) >= 2)),
        |model AS (
        |  SELECT w1, w2,
        |    cast(round(ln((c12 + 1.0) / (c1 + 1.0 * v)) * 1e9) AS BIGINT) AS qlp
        |  FROM c12 JOIN c1 USING (w1) CROSS JOIN v),
        |scored AS (
        |  SELECT b.doc_id, count(*) AS n_bigrams,
        |    round(cast(sum(qlp) as double) / (count(*) * 1000000000.0), 6)
        |      AS avg_logprob
        |  FROM b JOIN model USING (w1, w2)
        |  GROUP BY b.doc_id),
        |j AS (
        |  SELECT s.doc_id, d.lang, s.n_bigrams, s.avg_logprob
        |  FROM scored s JOIN documents d USING (doc_id)),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY avg_logprob DESC, doc_id) AS rk,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM j)
        |SELECT doc_id, lang, n_bigrams, avg_logprob,
        |  CASE WHEN rk * 3 <= n THEN 'head'
        |       WHEN rk * 3 <= 2 * n THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM r""".stripMargin,

    // q112's md5-plane bucket + multi-probe scaffold; positives (cos >=
    // 0.95 — self and the planted +50000 copies) filtered BEFORE the rank
    "q120_hard_negatives" ->
      """WITH e0 AS (
        |  SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
        |e AS (
        |  SELECT vec_id, v FROM e0
        |  UNION ALL
        |  SELECT vec_id + 50000 AS vec_id, v FROM e0 WHERE vec_id < 5),
        |bk AS (
        |  SELECT vec_id, v,
        |    CAST(list_sum(
        |      [CASE WHEN list_sum(
        |         [(floor(v[d + 1] * 1000000))::BIGINT *
        |            ((('0x' || substr(md5(pb::VARCHAR || ':' || d::VARCHAR), 1, 15))::BIGINT
        |              % 1000001) - 500000)
        |          FOR d IN generate_series(0, len(v) - 1)]) > 0
        |       THEN 1::BIGINT << pb ELSE 0::BIGINT END
        |       FOR pb IN generate_series(0, 7)]) AS BIGINT) AS bucket
        |  FROM e),
        |q AS (SELECT vec_id AS query_id, bucket AS qb, v AS qv
        |      FROM bk WHERE vec_id < 5),
        |c AS (SELECT vec_id AS corpus_id, bucket AS cb, v AS cv FROM bk),
        |probes AS (
        |  SELECT query_id, qv, qb AS p FROM q
        |  UNION ALL
        |  SELECT query_id, qv, xor(qb, 1::BIGINT << i) AS p
        |  FROM q, generate_series(0, 7) t(i)),
        |cand AS (
        |  SELECT p.query_id, c.corpus_id,
        |    list_cosine_similarity(c.cv, p.qv) AS cos
        |  FROM probes p JOIN c ON c.cb = p.p),
        |ranked AS (
        |  SELECT query_id, corpus_id, cos,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos DESC, corpus_id) AS rank
        |  FROM cand WHERE cos < 0.95)
        |SELECT query_id, corpus_id, round(cos, 4) AS cos, cast(rank AS int) AS rank
        |FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,

    // q113's per-source sketches, then the pure-sketch pair arithmetic:
    // union min-k via list merge, intersection by membership in both
    "q121_overlap_matrix" ->
      """WITH toks AS (
        |  SELECT source,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
        |  FROM documents WHERE text IS NOT NULL),
        |hashed AS (
        |  SELECT DISTINCT source,
        |    ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
        |  FROM toks),
        |shard_k AS (
        |  SELECT source, h FROM (
        |    SELECT source, h,
        |      row_number() OVER (PARTITION BY source ORDER BY h) AS rn
        |    FROM hashed)
        |  WHERE rn <= 256),
        |sk AS (
        |  SELECT source, list_sort(list(h)) AS kmv FROM shard_k GROUP BY source),
        |pairs AS (
        |  SELECT a.source AS shard_a, b.source AS shard_b,
        |    a.kmv AS ka, b.kmv AS kb
        |  FROM sk a JOIN sk b ON a.source < b.source),
        |u AS (
        |  SELECT shard_a, shard_b, ka, kb,
        |    list_sort(list_distinct(ka || kb))[1:256] AS un
        |  FROM pairs)
        |SELECT shard_a, shard_b,
        |  cast(len(un) AS bigint) AS union_k,
        |  cast(len(list_filter(un, h -> list_contains(ka, h)
        |    AND list_contains(kb, h))) AS bigint) AS inter_k,
        |  round(len(list_filter(un, h -> list_contains(ka, h)
        |    AND list_contains(kb, h))) / cast(len(un) AS double), 6)
        |    AS jaccard_est
        |FROM u ORDER BY shard_a, shard_b""".stripMargin,

    // q63's closed-form discipline over the video synthesis formula:
    // frame f of doc d has pixel (x,y) = (d·31 + f·17 + x·7 + y·13) % 256
    "q122_video_frames" ->
      """WITH p AS (
        |  SELECT doc_id, cast(3 + doc_id % 4 AS int) AS nf,
        |    cast(8 + doc_id % 5 AS int) AS w, cast(8 + doc_id % 3 AS int) AS h
        |  FROM documents WHERE doc_id < 60),
        |f AS (
        |  SELECT doc_id, nf, w, h, unnest(generate_series(0, nf - 1)) AS fi
        |  FROM p)
        |SELECT doc_id, cast(fi AS int) AS frame_idx, nf AS n_frames,
        |  w AS width, h AS height,
        |  cast(list_sum([(doc_id*31 + fi*17 + (i % w)*7 + (i // w)*13) % 256
        |    FOR i IN generate_series(0, w*h - 1)]) AS bigint) AS pixel_sum
        |FROM f WHERE fi % 2 = 0""".stripMargin,

    // the same planted delivery, each invariant counted independently, the
    // FK orphan count from an anti-join against orders
    "q123_data_quality" ->
      """WITH delivery AS (
        |  SELECT
        |    CASE WHEN l_orderkey % 103 = 0 AND l_linenumber = 1
        |         THEN l_orderkey + 1000000000 ELSE l_orderkey END AS l_orderkey,
        |    CASE WHEN l_orderkey % 97 = 0 AND l_linenumber = 1
        |         THEN -5.0 ELSE l_quantity END AS l_quantity,
        |    CASE WHEN l_orderkey % 89 = 0 AND l_linenumber = 1
        |         THEN 1.5 ELSE l_discount END AS l_discount,
        |    CASE WHEN l_orderkey % 101 = 0 AND l_linenumber = 1
        |         THEN 'X' ELSE l_returnflag END AS l_returnflag,
        |    l_tax, l_linenumber
        |  FROM lineitem),
        |counts AS (
        |  SELECT count(*) AS n_rows,
        |    [sum(CASE WHEN l_quantity > 0 THEN 1 ELSE 0 END),
        |     sum(CASE WHEN l_discount >= 0 AND l_discount <= 0.1
        |              THEN 1 ELSE 0 END),
        |     sum(CASE WHEN l_tax >= 0 THEN 1 ELSE 0 END),
        |     sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 1 ELSE 0 END),
        |     sum(CASE WHEN l_linenumber >= 1 THEN 1 ELSE 0 END)] AS passed
        |  FROM delivery),
        |names AS (
        |  SELECT ['quantity_positive','discount_range','tax_nonneg',
        |          'returnflag_domain','linenumber_positive'] AS nm),
        |fk AS (
        |  SELECT count(*) AS n_orphans FROM delivery d
        |  WHERE d.l_orderkey IS NOT NULL
        |    AND NOT EXISTS (SELECT 1 FROM orders o
        |                    WHERE o.o_orderkey = d.l_orderkey))
        |SELECT cast(i AS bigint) AS rule, nm[i] AS rule_name,
        |  c.n_rows, cast(c.n_rows - passed[i] AS bigint) AS n_violations,
        |  fk.n_orphans
        |FROM counts c, names, fk, generate_series(1, 5) t(i)
        |ORDER BY rule""".stripMargin,

    // the layout cannot change answers: the oracle is the plain box filter
    // with the same data-derived bounds
    "q124_zorder_box" ->
      """WITH m AS (
        |  SELECT max(l_orderkey) AS am, max(l_partkey) AS bm FROM lineitem)
        |SELECT count(*) AS n_rows,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok,
        |  max(l_partkey) AS max_pk
        |FROM lineitem, m
        |WHERE l_orderkey >= 0 AND l_orderkey <= am // 5
        |  AND l_partkey >= 0 AND l_partkey <= bm // 5""".stripMargin,

    // the phrase's token windows as strings (the hash-side twin)
    "q125_phrase_search" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |w AS (
        |  SELECT doc_id,
        |    [array_to_string(toks[i:i+1], ' ')
        |     FOR i IN generate_series(1, len(toks) - 1)] AS wins
        |  FROM t WHERE len(toks) >= 2)
        |SELECT doc_id,
        |  cast(len(list_filter(wins, s -> s = 'table value')) AS bigint)
        |    AS n_occurrences
        |FROM w
        |WHERE len(list_filter(wins, s -> s = 'table value')) > 0""".stripMargin,

    // the same strictly-after chaining, one CTE per step
    "q126_event_funnel" ->
      """WITH e AS (SELECT user_id AS u, event_type AS t, ts FROM events),
        |s1 AS (SELECT u, min(ts) AS st FROM e WHERE t = 'view' GROUP BY u),
        |s2 AS (SELECT e.u, min(e.ts) AS st FROM e JOIN s1 ON e.u = s1.u
        |       WHERE e.t = 'click' AND e.ts > s1.st GROUP BY e.u),
        |s3 AS (SELECT e.u, min(e.ts) AS st FROM e JOIN s2 ON e.u = s2.u
        |       WHERE e.t = 'purchase' AND e.ts > s2.st GROUP BY e.u)
        |SELECT cast(1 AS bigint) AS step, 'view' AS step_name,
        |  (SELECT count(*) FROM s1) AS n_users
        |UNION ALL
        |SELECT cast(2 AS bigint), 'click', (SELECT count(*) FROM s2)
        |UNION ALL
        |SELECT cast(3 AS bigint), 'purchase', (SELECT count(*) FROM s3)""".stripMargin,

    "q127_retention" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id AS u, cast(ts AS date) AS d FROM events),
        |coh AS (SELECT u, min(d) AS c FROM days GROUP BY u)
        |SELECT c AS cohort_day,
        |  cast(date_diff('day', c, d) AS bigint) AS day_offset,
        |  count(*) AS n_users
        |FROM days JOIN coh USING (u)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // shingle strings play the hashes (q24/q74/q78 precedent); DISTINCT
    // (day, shingle) then min(day) first-seen attribution
    "q128_novelty_curve" ->
      """WITH t AS (
        |  SELECT doc_id % 8 AS day,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |sh AS (
        |  SELECT DISTINCT day, s FROM (
        |    SELECT day, unnest([array_to_string(toks[i:i+2], ' ')
        |      FOR i IN generate_series(1, len(toks) - 2)]) AS s
        |    FROM t WHERE len(toks) >= 3)),
        |fs AS (SELECT s, min(day) AS fd FROM sh GROUP BY s)
        |SELECT day, count(*) AS n_shingles,
        |  cast(sum(CASE WHEN day = fd THEN 1 ELSE 0 END) AS bigint) AS n_new,
        |  round(cast(sum(CASE WHEN day = fd THEN 1 ELSE 0 END) AS double)
        |    / count(*), 6) AS novelty_rate
        |FROM sh JOIN fs USING (s)
        |GROUP BY day ORDER BY day""".stripMargin,

    // every event contributes to exactly two 2h windows sliding by 1h:
    // the one starting at its truncated hour and the one an hour earlier
    "q129_hopping_windows" ->
      """WITH x AS (
        |  SELECT date_trunc('hour', ts) - k * INTERVAL 1 HOUR AS window_start,
        |    event_type, value
        |  FROM events, generate_series(0, 1) t(k))
        |SELECT window_start, event_type, count(*) AS n,
        |  round(sum(value), 2) AS total_value
        |FROM x GROUP BY 1, 2""".stripMargin,

    "q130_oov_report" ->
      """WITH toks AS (
        |  SELECT lang AS g,
        |    unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
        |      AS tok
        |  FROM documents),
        |vocab AS (
        |  SELECT tok FROM (
        |    SELECT tok, count(*) AS n FROM toks GROUP BY tok
        |    ORDER BY n DESC, tok LIMIT 200)),
        |j AS (
        |  SELECT t.g, CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
        |  FROM toks t LEFT JOIN vocab v USING (tok))
        |SELECT g AS lang, count(*) AS n_tokens,
        |  cast(sum(oov) AS bigint) AS n_oov,
        |  round(cast(sum(oov) AS double) / count(*), 6) AS oov_rate
        |FROM j GROUP BY g""".stripMargin,

    // session_window semantics: a new session starts when the gap to the
    // previous event is >= 30 min; session end = last event + 30 min
    "q131_session_window" ->
      """WITH l AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |           IS NULL
        |         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |           >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM l)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin,

    // DuckDB's native ASOF join plays the carry-forward window; staleness
    // nulls both the carried value and the age in lockstep
    "q132_asof_tolerance" ->
      """WITH a AS (
        |  SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ets, o.o_orderdate
        |  FROM events e ASOF LEFT JOIN orders o
        |    ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate)
        |SELECT event_id, user_id, ets,
        |  CASE WHEN o_orderdate IS NOT NULL
        |        AND ets - epoch_us(o_orderdate) <= 2592000000000
        |       THEN o_orderdate END AS o_orderdate,
        |  CASE WHEN o_orderdate IS NOT NULL
        |        AND ets - epoch_us(o_orderdate) <= 2592000000000
        |       THEN ets - epoch_us(o_orderdate) END AS asof_age_us
        |FROM a""".stripMargin,

    // Encoding gate replay: same planted artifacts (|| keeps NULL text NULL,
    // unlike concat()), same codegen'd counters as length/replace deltas and
    // RE2 regexp extracts, same integer cross-multiplied rules.
    "q133_encoding_gate" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    text ||
        |    CASE WHEN doc_id % 6 = 0 THEN ' cafÃ© donâ€™t' ELSE '' END ||
        |    CASE WHEN doc_id % 9 = 0 THEN chr(7) || chr(1) || chr(7)
        |         ELSE '' END ||
        |    CASE WHEN doc_id % 10 = 0 THEN chr(65533) || chr(65533)
        |         ELSE '' END AS text
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, length(text) AS n_chars,
        |    length(text) - length(replace(text, chr(65533), '')) AS n_repl,
        |    len(regexp_extract_all(text,
        |      '[\x00-\x08\x0B\x0C\x0E-\x1F]')) AS n_ctl,
        |    len(regexp_extract_all(text, 'Ã[©¨¤¶¼]|â€[™œ]')) AS n_moji
        |  FROM docs)
        |SELECT doc_id,
        |  cast(n_chars AS bigint) AS n_chars,
        |  cast(n_repl AS bigint) AS n_replacement,
        |  cast(n_ctl AS bigint) AS n_control,
        |  cast(n_moji AS bigint) AS n_mojibake,
        |  coalesce(1000 * n_repl <= n_chars, FALSE) AS r_replacement,
        |  coalesce(1000 * n_ctl <= 2 * n_chars, FALSE) AS r_control,
        |  coalesce(n_moji <= 0, FALSE) AS r_mojibake,
        |  (coalesce(1000 * n_repl <= n_chars, FALSE) AND
        |   coalesce(1000 * n_ctl <= 2 * n_chars, FALSE) AND
        |   coalesce(n_moji <= 0, FALSE)) AS keep
        |FROM m""".stripMargin,

    // Length-batch replay: the md5-prefix-60 hash order, the band/shard
    // assignment, and the windowed batch cut are all engine-portable integer
    // arithmetic — the manifest is value-exact.
    "q134_length_batches" ->
      """WITH t AS (
        |  SELECT doc_id, coalesce(len(list_filter(string_split(text, ' '),
        |    x -> x <> '')), 0) AS n_tokens
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, cast(n_tokens AS bigint) AS n_tokens,
        |    cast(n_tokens // 64 AS bigint) AS band,
        |    ('0x' || substr(md5(cast(doc_id AS varchar)), 1, 15))::BIGINT AS hk
        |  FROM t),
        |s AS (SELECT *, hk % 2 AS shard FROM b),
        |r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY band, shard ORDER BY hk, doc_id) AS rk
        |  FROM s)
        |SELECT band,
        |  cast(((rk - 1) // 16) * 2 + shard AS bigint) AS batch_id,
        |  count(*) AS n_docs,
        |  max(n_tokens) AS batch_max_tokens,
        |  cast(sum(n_tokens) AS bigint) AS batch_tokens,
        |  cast(count(*) * max(n_tokens) - sum(n_tokens) AS bigint)
        |    AS padding_waste
        |FROM r GROUP BY band, batch_id""".stripMargin,

    // BPE merge replay: 4 explicit rounds, each the same deterministic
    // argmax (count desc, left asc, right asc) + the same leftmost-
    // non-overlapping replace over the previous round's dictionary. The
    // parallel-unnest zip extracts adjacent symbol pairs positionally.
    "q135_bpe_merges" ->
      """WITH w AS (
        |  SELECT word, count(*) AS wn FROM (
        |    SELECT unnest(list_filter(string_split(lower(text), ' '),
        |      t -> t <> '')) AS word
        |    FROM documents)
        |  WHERE regexp_matches(word, '^[a-z]+$') AND length(word) >= 2
        |  GROUP BY word),
        |enc0 AS (
        |  SELECT '|' || regexp_replace(word, '(.)', '\1|', 'g') AS enc, wn
        |  FROM w),
        |p1 AS (
        |  SELECT unnest(s[1:len(s)-1]) AS la, unnest(s[2:len(s)]) AS ra, wn
        |  FROM (SELECT list_filter(string_split(enc, '|'), x -> x <> '') AS s,
        |        wn FROM enc0)),
        |m1 AS (SELECT la, ra, sum(wn) AS n FROM p1 GROUP BY la, ra
        |       ORDER BY n DESC, la, ra LIMIT 1),
        |enc1 AS (
        |  SELECT replace(enc,
        |    '|' || (SELECT la FROM m1) || '|' || (SELECT ra FROM m1) || '|',
        |    '|' || (SELECT la FROM m1) || '@' || (SELECT ra FROM m1) || '|')
        |    AS enc, wn FROM enc0),
        |p2 AS (
        |  SELECT unnest(s[1:len(s)-1]) AS la, unnest(s[2:len(s)]) AS ra, wn
        |  FROM (SELECT list_filter(string_split(enc, '|'), x -> x <> '') AS s,
        |        wn FROM enc1)),
        |m2 AS (SELECT la, ra, sum(wn) AS n FROM p2 GROUP BY la, ra
        |       ORDER BY n DESC, la, ra LIMIT 1),
        |enc2 AS (
        |  SELECT replace(enc,
        |    '|' || (SELECT la FROM m2) || '|' || (SELECT ra FROM m2) || '|',
        |    '|' || (SELECT la FROM m2) || '@' || (SELECT ra FROM m2) || '|')
        |    AS enc, wn FROM enc1),
        |p3 AS (
        |  SELECT unnest(s[1:len(s)-1]) AS la, unnest(s[2:len(s)]) AS ra, wn
        |  FROM (SELECT list_filter(string_split(enc, '|'), x -> x <> '') AS s,
        |        wn FROM enc2)),
        |m3 AS (SELECT la, ra, sum(wn) AS n FROM p3 GROUP BY la, ra
        |       ORDER BY n DESC, la, ra LIMIT 1),
        |enc3 AS (
        |  SELECT replace(enc,
        |    '|' || (SELECT la FROM m3) || '|' || (SELECT ra FROM m3) || '|',
        |    '|' || (SELECT la FROM m3) || '@' || (SELECT ra FROM m3) || '|')
        |    AS enc, wn FROM enc2),
        |p4 AS (
        |  SELECT unnest(s[1:len(s)-1]) AS la, unnest(s[2:len(s)]) AS ra, wn
        |  FROM (SELECT list_filter(string_split(enc, '|'), x -> x <> '') AS s,
        |        wn FROM enc3)),
        |m4 AS (SELECT la, ra, sum(wn) AS n FROM p4 GROUP BY la, ra
        |       ORDER BY n DESC, la, ra LIMIT 1)
        |SELECT cast(1 AS int) AS round,
        |  replace(la, '@', '') AS merge_left,
        |  replace(ra, '@', '') AS merge_right, cast(n AS bigint) AS pair_count
        |FROM m1
        |UNION ALL SELECT 2, replace(la, '@', ''), replace(ra, '@', ''),
        |  cast(n AS bigint) FROM m2
        |UNION ALL SELECT 3, replace(la, '@', ''), replace(ra, '@', ''),
        |  cast(n AS bigint) FROM m3
        |UNION ALL SELECT 4, replace(la, '@', ''), replace(ra, '@', ''),
        |  cast(n AS bigint) FROM m4""".stripMargin,

    // Surgical decontamination replay (the q77 splice shape with the
    // benchmark slice as the cut authority): benchmark 8-shingles as
    // strings, covered-position expansion, anti-join splice, md5 of every
    // reassembled text.
    "q136_decontaminate_spans" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |tr AS (SELECT * FROM t WHERE doc_id % 11 <> 0),
        |be AS (SELECT * FROM t WHERE doc_id % 11 = 0),
        |bsh AS (
        |  SELECT DISTINCT unnest(
        |    CASE WHEN len(toks) < 8 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+7], ' ')
        |               FOR i IN generate_series(1, len(toks) - 7)] END) AS g
        |  FROM be WHERE toks IS NOT NULL),
        |tsh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) < 8 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+7], ' ')
        |               FOR i IN generate_series(1, len(toks) - 7)] END AS s
        |  FROM tr),
        |inv AS (SELECT doc_id, unnest(s) AS g,
        |          unnest(range(len(s))) AS pos FROM tsh),
        |hit AS (SELECT inv.* FROM inv JOIN bsh USING (g)),
        |cov AS (
        |  SELECT DISTINCT doc_id, pos + off AS pos
        |  FROM hit CROSS JOIN
        |    (SELECT unnest(generate_series(0, 7)) AS off) o),
        |cutdocs AS (SELECT DISTINCT doc_id FROM cov),
        |tok AS (
        |  SELECT t2.doc_id, unnest(t2.toks) AS tok,
        |         unnest(range(len(t2.toks))) AS pos
        |  FROM tr t2 JOIN cutdocs USING (doc_id)),
        |kept AS (SELECT tok.* FROM tok ANTI JOIN cov USING (doc_id, pos)),
        |rebuilt AS (
        |  SELECT c.doc_id,
        |    coalesce(r.text_clean, '') AS text_clean,
        |    coalesce(r.n_tokens, 0) AS n_tokens
        |  FROM cutdocs c LEFT JOIN (
        |    SELECT doc_id,
        |      array_to_string(list(tok ORDER BY pos), ' ') AS text_clean,
        |      count(*) AS n_tokens
        |    FROM kept GROUP BY doc_id) r USING (doc_id))
        |SELECT d.doc_id, cast(len(d.toks) AS bigint) AS n_tokens,
        |  md5(dd.text) AS clean_md5, FALSE AS was_cut
        |FROM tr d JOIN documents dd USING (doc_id)
        |ANTI JOIN cutdocs USING (doc_id)
        |UNION ALL
        |SELECT doc_id, cast(n_tokens AS bigint) AS n_tokens,
        |  md5(text_clean) AS clean_md5, TRUE AS was_cut
        |FROM rebuilt""".stripMargin,

    // CMS replay: merge linearity means the global counter table IS the
    // merged per-shard table (the identity the spec pins), so the oracle
    // counts buckets globally with the same md5 row-hash arithmetic; the
    // `sound` column pins the overcount-only guarantee in value form.
    "q137_cms_counts" ->
      """WITH ex AS (
        |  SELECT unnest(list_filter(string_split(lower(text), ' '),
        |    x -> x <> '')) AS tok
        |  FROM documents),
        |cnt AS (
        |  SELECT r,
        |    ('0x' || substr(md5(cast(r AS varchar) || ':' || tok), 1, 15))
        |      ::BIGINT % 512 AS bucket,
        |    count(*) AS n
        |  FROM ex CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS r) g
        |  GROUP BY r, bucket),
        |probes AS (
        |  SELECT unnest(['join', 'hash', 'scan', 'filter', 'merge',
        |    'zzz_unseen_token']) AS token),
        |pb AS (
        |  SELECT token, r,
        |    ('0x' || substr(md5(cast(r AS varchar) || ':' || token), 1, 15))
        |      ::BIGINT % 512 AS bucket
        |  FROM probes CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS r) g),
        |est AS (
        |  SELECT token, min(coalesce(n, 0)) AS est
        |  FROM pb LEFT JOIN cnt USING (r, bucket) GROUP BY token),
        |exact AS (
        |  SELECT tok AS token, count(*) AS exact FROM ex
        |  WHERE tok IN ('join', 'hash', 'scan', 'filter', 'merge',
        |    'zzz_unseen_token')
        |  GROUP BY tok)
        |SELECT token, cast(est AS bigint) AS est,
        |  cast(coalesce(exact, 0) AS bigint) AS exact,
        |  est >= coalesce(exact, 0) AS sound
        |FROM est LEFT JOIN exact USING (token)""".stripMargin,

    // Collocation replay: same bigram/unigram counts, same nano-quantized
    // ln arithmetic, same deterministic (pmi desc, pair asc) top-k.
    "q138_collocations" ->
      """WITH tk AS (
        |  SELECT list_filter(string_split(lower(text), ' '), x -> x <> '')
        |    AS tk
        |  FROM documents),
        |uni AS (SELECT unnest(tk) AS w FROM tk),
        |uc AS (SELECT w, count(*) AS cw FROM uni GROUP BY w),
        |tot AS (SELECT count(*) AS n FROM uni),
        |bg AS (
        |  SELECT unnest(tk[1:len(tk)-1]) AS w1, unnest(tk[2:len(tk)]) AS w2
        |  FROM tk WHERE len(tk) >= 2),
        |cb AS (
        |  SELECT w1, w2, count(*) AS c12 FROM bg
        |  GROUP BY w1, w2 HAVING count(*) >= 5)
        |SELECT w1, w2, cast(c12 AS bigint) AS c12,
        |  cast(round(ln(cast(c12 AS double) * (SELECT n FROM tot) /
        |    (cast(u1.cw AS double) * cast(u2.cw AS double))) * 1e9, 0)
        |    AS bigint) AS pmi_nano
        |FROM cb
        |JOIN uc u1 ON cb.w1 = u1.w
        |JOIN uc u2 ON cb.w2 = u2.w
        |ORDER BY pmi_nano DESC, w1, w2 LIMIT 25""".stripMargin,

    // Priority sampling: the top-k by w/u replays exactly — both operands are
    // exact integers, and IEEE 754 makes the double cast + divide correctly
    // rounded in every engine, so the order (and the selected set) agree.
    "q139_priority_sample" ->
      """SELECT doc_id, n_chars, lang FROM documents
        |ORDER BY CAST(n_chars AS DOUBLE) /
        |  CAST(('0x' || substr(md5(cast(doc_id as varchar)), 1, 15))::BIGINT
        |       + 1 AS DOUBLE) DESC, doc_id
        |LIMIT 200""".stripMargin,

    // Append-mode exclusion rule: a window emits only once the watermark
    // (max ts, delay 0) passes its END — the final in-flight hour never
    // finalizes in a finite replay, so the oracle excludes it.
    "q140_stream_distinct" ->
      """SELECT date_trunc('hour', ts) AS hour,
        | count(DISTINCT user_id) AS n_distinct,
        | count(*) AS n_events
        |FROM events GROUP BY 1
        |HAVING hour + INTERVAL 1 HOUR <= (SELECT max(ts) FROM events)""".stripMargin,

    // Same dictionary collapse + block + levenshtein verify; DuckDB's
    // levenshtein is the same unit-cost edit distance as Spark's.
    "q141_fuzzy_match" ->
      """WITH d AS (
        |  SELECT p_name AS name, count(*) AS n,
        |    split_part(p_name, ' ', 1) AS bk
        |  FROM part GROUP BY p_name)
        |SELECT a.name AS name_a, b.name AS name_b,
        |  cast(levenshtein(a.name, b.name) AS int) AS dist,
        |  a.n AS n_a, b.n AS n_b, a.n * b.n AS entity_pairs
        |FROM d a JOIN d b ON a.bk = b.bk AND a.name < b.name
        |WHERE levenshtein(a.name, b.name) <= 4""".stripMargin,

    // q135's training replay (same m1..m4), then the merges APPLIED to the
    // word dictionary and rolled up per language. replace() is left-to-right
    // non-overlapping in both engines, so encodings agree byte-for-byte.
    "q142_bpe_fertility" ->
      """WITH wl AS (
        |  SELECT lang, word, count(*) AS wn FROM (
        |    SELECT lang, unnest(list_filter(string_split(lower(text), ' '),
        |      t -> t <> '')) AS word
        |    FROM documents)
        |  WHERE regexp_matches(word, '^[a-z]+$') AND length(word) >= 2
        |  GROUP BY lang, word),
        |w AS (SELECT word, sum(wn) AS wn FROM wl GROUP BY word),
        |enc0 AS (
        |  SELECT '|' || regexp_replace(word, '(.)', '\1|', 'g') AS enc, wn
        |  FROM w),
        |p1 AS (
        |  SELECT unnest(s[1:len(s)-1]) AS la, unnest(s[2:len(s)]) AS ra, wn
        |  FROM (SELECT list_filter(string_split(enc, '|'), x -> x <> '') AS s,
        |        wn FROM enc0)),
        |m1 AS (SELECT la, ra, sum(wn) AS n FROM p1 GROUP BY la, ra
        |       ORDER BY n DESC, la, ra LIMIT 1),
        |enc1 AS (
        |  SELECT replace(enc,
        |    '|' || (SELECT la FROM m1) || '|' || (SELECT ra FROM m1) || '|',
        |    '|' || (SELECT la FROM m1) || '@' || (SELECT ra FROM m1) || '|')
        |    AS enc, wn FROM enc0),
        |p2 AS (
        |  SELECT unnest(s[1:len(s)-1]) AS la, unnest(s[2:len(s)]) AS ra, wn
        |  FROM (SELECT list_filter(string_split(enc, '|'), x -> x <> '') AS s,
        |        wn FROM enc1)),
        |m2 AS (SELECT la, ra, sum(wn) AS n FROM p2 GROUP BY la, ra
        |       ORDER BY n DESC, la, ra LIMIT 1),
        |enc2 AS (
        |  SELECT replace(enc,
        |    '|' || (SELECT la FROM m2) || '|' || (SELECT ra FROM m2) || '|',
        |    '|' || (SELECT la FROM m2) || '@' || (SELECT ra FROM m2) || '|')
        |    AS enc, wn FROM enc1),
        |p3 AS (
        |  SELECT unnest(s[1:len(s)-1]) AS la, unnest(s[2:len(s)]) AS ra, wn
        |  FROM (SELECT list_filter(string_split(enc, '|'), x -> x <> '') AS s,
        |        wn FROM enc2)),
        |m3 AS (SELECT la, ra, sum(wn) AS n FROM p3 GROUP BY la, ra
        |       ORDER BY n DESC, la, ra LIMIT 1),
        |enc3 AS (
        |  SELECT replace(enc,
        |    '|' || (SELECT la FROM m3) || '|' || (SELECT ra FROM m3) || '|',
        |    '|' || (SELECT la FROM m3) || '@' || (SELECT ra FROM m3) || '|')
        |    AS enc, wn FROM enc2),
        |p4 AS (
        |  SELECT unnest(s[1:len(s)-1]) AS la, unnest(s[2:len(s)]) AS ra, wn
        |  FROM (SELECT list_filter(string_split(enc, '|'), x -> x <> '') AS s,
        |        wn FROM enc3)),
        |m4 AS (SELECT la, ra, sum(wn) AS n FROM p4 GROUP BY la, ra
        |       ORDER BY n DESC, la, ra LIMIT 1),
        |d AS (SELECT DISTINCT word FROM wl),
        |e0 AS (SELECT word,
        |  '|' || regexp_replace(word, '(.)', '\1|', 'g') AS enc FROM d),
        |e1 AS (SELECT word, replace(enc,
        |    '|' || (SELECT la FROM m1) || '|' || (SELECT ra FROM m1) || '|',
        |    '|' || (SELECT la FROM m1) || '@' || (SELECT ra FROM m1) || '|')
        |    AS enc FROM e0),
        |e2 AS (SELECT word, replace(enc,
        |    '|' || (SELECT la FROM m2) || '|' || (SELECT ra FROM m2) || '|',
        |    '|' || (SELECT la FROM m2) || '@' || (SELECT ra FROM m2) || '|')
        |    AS enc FROM e1),
        |e3 AS (SELECT word, replace(enc,
        |    '|' || (SELECT la FROM m3) || '|' || (SELECT ra FROM m3) || '|',
        |    '|' || (SELECT la FROM m3) || '@' || (SELECT ra FROM m3) || '|')
        |    AS enc FROM e2),
        |e4 AS (SELECT word, replace(enc,
        |    '|' || (SELECT la FROM m4) || '|' || (SELECT ra FROM m4) || '|',
        |    '|' || (SELECT la FROM m4) || '@' || (SELECT ra FROM m4) || '|')
        |    AS enc FROM e3),
        |nt AS (SELECT word,
        |  len(list_filter(string_split(enc, '|'), x -> x <> '')) AS nt
        |  FROM e4)
        |SELECT lang,
        |  cast(sum(wn) AS bigint) AS n_words,
        |  cast(sum(wn * nt.nt) AS bigint) AS n_tokens,
        |  round(cast(sum(wn * nt.nt) AS double) / cast(sum(wn) AS double), 6)
        |    AS fertility,
        |  round(cast(sum(wn * length(word)) AS double) /
        |        cast(sum(wn * nt.nt) AS double), 6) AS chars_per_token
        |FROM wl JOIN nt USING (word)
        |GROUP BY lang""".stripMargin,

    // Lexical leg = q90's BM25 replay (top-100 + rank); vector leg = q94's
    // int8 quantization replay + exact integer-dot cosine (top-100 + rank);
    // fusion = floor-quantized 1e9/(60+rank) integer sums.
    "q143_rrf_fusion" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, cast(len(toks) as bigint) AS dl,
        |    list_filter(toks, x -> x IN ('spark', 'window', 'merge')) AS qt
        |  FROM t),
        |g AS (SELECT doc_id, dl, unnest(qt) AS term FROM d),
        |tfs AS (
        |  SELECT doc_id, dl, term, count(*) AS tf FROM g GROUP BY 1, 2, 3),
        |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM d),
        |wdf AS (
        |  SELECT tfs.*, count(*) OVER (PARTITION BY term) AS df FROM tfs),
        |scored AS (
        |  SELECT doc_id,
        |    cast(round(
        |      ln(1.0 + ((n_docs - df) + 0.5) / (df + 0.5)) *
        |      ((tf * (1.2 + 1.0)) /
        |       (tf + 1.2 * (1.0 - 0.75 +
        |          0.75 * dl / (cast(sum_dl as double) / n_docs)))) *
        |      1e9) as bigint) AS qs
        |  FROM wdf CROSS JOIN stats),
        |lexs AS (
        |  SELECT doc_id, round(cast(sum(qs) as double) / 1e9, 6) AS score
        |  FROM scored GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 100),
        |lex AS (
        |  SELECT doc_id,
        |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank
        |  FROM lexs),
        |q AS (
        |  SELECT vec_id, list_transform(embedding,
        |      x -> CASE WHEN maxabs = 0 THEN 0
        |        ELSE cast(floor(cast(x as double) * 127.0 / maxabs) as bigint)
        |        END) AS qv
        |  FROM (SELECT vec_id, embedding,
        |          cast(list_max(list_transform(embedding, x -> abs(x)))
        |            as double) AS maxabs
        |        FROM embeddings WHERE embedding IS NOT NULL)),
        |qq AS (SELECT qv AS sv FROM q WHERE vec_id = 0),
        |cosd AS (
        |  SELECT q.vec_id AS doc_id,
        |    CASE WHEN l.na = 0 OR l.nb = 0 THEN 0.0
        |         ELSE l.dot / (sqrt(l.na) * sqrt(l.nb)) END AS cos
        |  FROM q CROSS JOIN qq CROSS JOIN LATERAL (
        |    SELECT list_dot_product(cast(q.qv as double[]),
        |             cast(qq.sv as double[])) AS dot,
        |           list_dot_product(cast(q.qv as double[]),
        |             cast(q.qv as double[])) AS na,
        |           list_dot_product(cast(qq.sv as double[]),
        |             cast(qq.sv as double[])) AS nb) l
        |  WHERE q.vec_id <> 0),
        |vecs AS (
        |  SELECT doc_id, cos FROM cosd ORDER BY cos DESC, doc_id LIMIT 100),
        |vec AS (
        |  SELECT doc_id,
        |    row_number() OVER (ORDER BY cos DESC, doc_id) AS rank
        |  FROM vecs),
        |u AS (
        |  SELECT doc_id, rank FROM lex UNION ALL SELECT doc_id, rank FROM vec)
        |SELECT doc_id,
        |  cast(sum(cast(floor(1e9 / (60.0 + rank)) as bigint)) as bigint)
        |    AS rrf_nano,
        |  count(*) AS n_lists,
        |  cast(min(rank) as bigint) AS best_rank
        |FROM u GROUP BY doc_id
        |ORDER BY rrf_nano DESC, doc_id LIMIT 20""".stripMargin,

    // String shingles replay the hash-side distinct counts (q78/q128
    // precedent); entropy via the same nano-rounded c·ln(c) terms + integer
    // division.
    "q144_ngram_diversity" ->
      """WITH base AS (
        |  SELECT lang,
        |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
        |  FROM documents),
        |b AS (SELECT lang, tk FROM base WHERE len(tk) > 0),
        |g1 AS (SELECT lang, 1 AS n, unnest(tk) AS g FROM b),
        |g2 AS (SELECT lang, 2 AS n, unnest(
        |    CASE WHEN len(tk) < 2 THEN [array_to_string(tk, ' ')]
        |         ELSE [array_to_string(tk[i:i+1], ' ')
        |               FOR i IN generate_series(1, len(tk) - 1)] END) AS g
        |  FROM b),
        |g3 AS (SELECT lang, 3 AS n, unnest(
        |    CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
        |         ELSE [array_to_string(tk[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(tk) - 2)] END) AS g
        |  FROM b),
        |gr AS (SELECT * FROM g1 UNION ALL SELECT * FROM g2
        |       UNION ALL SELECT * FROM g3),
        |dv AS (
        |  SELECT lang, n, count(*) AS total, count(DISTINCT g) AS n_distinct
        |  FROM gr GROUP BY lang, n),
        |uc AS (SELECT lang, g, count(*) AS c FROM g1 GROUP BY lang, g),
        |ent AS (
        |  SELECT lang, sum(c) AS nn,
        |    sum(cast(round(c * ln(cast(c as double)) * 1e9) as bigint)) AS s
        |  FROM uc GROUP BY lang)
        |SELECT dv.lang, dv.n, dv.total, dv.n_distinct,
        |  round(cast(dv.n_distinct as double) / dv.total, 6) AS distinct_ratio,
        |  cast(cast(round(ln(cast(ent.nn as double)) * 1e9) as bigint)
        |    - (ent.s // ent.nn) as bigint) AS entropy_nano
        |FROM dv JOIN ent ON dv.lang = ent.lang""".stripMargin,

    // Stateless stream-static inner join = the batch join; integer-cents sums
    // are exact in any order.
    "q145_stream_enrich" ->
      """SELECT c_mktsegment, count(*) AS n_events,
        | cast(sum(cast(round(value * 100.0) as bigint)) as bigint)
        |   AS value_cents
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    // The streamed sketch equals the batch global sketch (CM linearity), so
    // the oracle is q137's global-counter replay.
    "q146_stream_cms" ->
      """WITH ex AS (
        |  SELECT unnest(list_filter(string_split(lower(text), ' '),
        |    x -> x <> '')) AS tok
        |  FROM documents),
        |cnt AS (
        |  SELECT r,
        |    ('0x' || substr(md5(cast(r AS varchar) || ':' || tok), 1, 15))
        |      ::BIGINT % 512 AS bucket,
        |    count(*) AS n
        |  FROM ex CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS r) g
        |  GROUP BY r, bucket),
        |probes AS (
        |  SELECT unnest(['join', 'hash', 'scan', 'filter', 'merge',
        |    'zzz_unseen_token']) AS token),
        |pb AS (
        |  SELECT token, r,
        |    ('0x' || substr(md5(cast(r AS varchar) || ':' || token), 1, 15))
        |      ::BIGINT % 512 AS bucket
        |  FROM probes CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS r) g),
        |est AS (
        |  SELECT token, min(coalesce(n, 0)) AS est
        |  FROM pb LEFT JOIN cnt USING (r, bucket) GROUP BY token),
        |exact AS (
        |  SELECT tok AS token, count(*) AS exact FROM ex
        |  WHERE tok IN ('join', 'hash', 'scan', 'filter', 'merge',
        |    'zzz_unseen_token')
        |  GROUP BY tok)
        |SELECT token, cast(est AS bigint) AS est,
        |  cast(coalesce(exact, 0) AS bigint) AS exact,
        |  est >= coalesce(exact, 0) AS sound
        |FROM est LEFT JOIN exact USING (token)""".stripMargin,

    // Integer per-mille and ceil-div salt factor — exact replay.
    "q147_skew_report" ->
      """WITH c AS (
        |  SELECT cast(l_suppkey AS varchar) AS key, count(*) AS n
        |  FROM lineitem GROUP BY 1),
        |s AS (SELECT cast(sum(n) AS bigint) AS n_rows,
        |        count(*) AS n_keys FROM c)
        |SELECT key, n, n_rows, n_keys,
        |  (n * 1000) // n_rows AS permille,
        |  (n * n_keys + n_rows - 1) // n_rows AS salt_factor
        |FROM c CROSS JOIN s
        |ORDER BY n DESC, key LIMIT 10""".stripMargin,

    // bit-length bucket: length(bin(n)) both engines; empty/null docs → 0.
    "q148_length_histogram" ->
      """WITH d AS (
        |  SELECT source AS grp,
        |    cast(coalesce(len(list_filter(string_split(lower(text), ' '),
        |      x -> x <> '')), 0) AS bigint) AS n_tokens
        |  FROM documents)
        |SELECT grp,
        |  cast(CASE WHEN n_tokens = 0 THEN 0
        |       ELSE length(bin(n_tokens)) END AS int) AS bucket,
        |  count(*) AS n_docs,
        |  cast(sum(n_tokens) AS bigint) AS sum_tokens,
        |  cast(min(n_tokens) AS bigint) AS min_tokens,
        |  cast(max(n_tokens) AS bigint) AS max_tokens
        |FROM d GROUP BY grp, bucket""".stripMargin,

    // Ordered list + slice + md5 — the fingerprint replays byte-for-byte.
    "q149_user_sequences" ->
      """SELECT user_id, count(*) AS n_events,
        |  md5(array_to_string(
        |    (list(event_type ORDER BY ts, event_id, event_type))[1:32], ' '))
        |    AS seq_md5,
        |  min(ts) AS first_ts, max(ts) AS last_ts,
        |  count(*) > 32 AS truncated
        |FROM events GROUP BY user_id""".stripMargin,

    // q75's exact-pair + recursive-CC replay, then the rep-hash split rule
    // and an independent cross-split pair count (0 by construction — the
    // contract the query exists to enforce).
    "q150_leakage_safe_split" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks) - 2)] END) AS s
        |  FROM t),
        |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
        |inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |cand AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |pairs AS (
        |  SELECT id_a, id_b FROM cand
        |  JOIN sizes na ON na.doc_id = id_a
        |  JOIN sizes nb ON nb.doc_id = id_b
        |  WHERE inter / cast(na.n + nb.n - inter as double) >= 0.8),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
        |labels AS (
        |  SELECT src AS doc_id, least(src, min(dst)) AS rep
        |  FROM reach GROUP BY src),
        |assigned AS (
        |  SELECT d.doc_id, coalesce(l.rep, d.doc_id) AS rep,
        |    CASE WHEN ('0x' || substr(md5(cast(coalesce(l.rep, d.doc_id)
        |        AS varchar)), 1, 15))::BIGINT % 100 < 80
        |      THEN 'train' ELSE 'test' END AS split
        |  FROM documents d LEFT JOIN labels l USING (doc_id)),
        |crossed AS (
        |  SELECT count(*) AS n_cross_pairs
        |  FROM pairs p
        |  JOIN assigned a ON p.id_a = a.doc_id
        |  JOIN assigned b ON p.id_b = b.doc_id
        |  WHERE a.split <> b.split)
        |SELECT split, count(*) AS n_docs,
        |  count(DISTINCT rep) AS n_clusters,
        |  cast(sum(doc_id) AS bigint) AS id_sum,
        |  (SELECT n_cross_pairs FROM crossed) AS n_cross_pairs
        |FROM assigned GROUP BY split""".stripMargin,

    // Integer tf x once-per-token nano idf; per-doc rank with token
    // tie-break — exact replay.
    "q151_tfidf_keywords" ->
      """WITH docs25 AS (SELECT * FROM documents WHERE doc_id % 25 = 0),
        |toks AS (
        |  SELECT doc_id AS id,
        |    unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
        |      AS tok
        |  FROM docs25),
        |tf AS (SELECT id, tok, count(*) AS tf FROM toks GROUP BY id, tok),
        |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |nd AS (SELECT count(*) AS n_docs FROM docs25),
        |scored AS (
        |  SELECT id, tok, tf,
        |    tf * cast(round(ln(cast(n_docs AS double) / df) * 1e9) AS bigint)
        |      AS score_nano
        |  FROM tf JOIN dfreq USING (tok) CROSS JOIN nd),
        |ranked AS (
        |  SELECT id, tok, tf, score_nano,
        |    row_number() OVER (PARTITION BY id
        |      ORDER BY score_nano DESC, tok) AS rk
        |  FROM scored)
        |SELECT id AS doc_id, cast(rk AS int) AS rk, tok, tf, score_nano
        |FROM ranked WHERE rk <= 3""".stripMargin,

    // (n·x − Σx)² > k²·(n·Σx² − (Σx)²) — all integers, the flag cannot
    // drift.
    "q152_volume_anomalies" ->
      """WITH d AS (
        |  SELECT cast(ts AS date) AS day, count(*) AS x
        |  FROM events GROUP BY 1),
        |s AS (SELECT count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx FROM d)
        |SELECT day, x AS n_events,
        |  cast(sign(n * x - sx) AS int) AS direction,
        |  (n * x - sx) * (n * x - sx) > 4 * (n * sxx - sx * sx) AS is_anomaly
        |FROM d CROSS JOIN s""".stripMargin,

    // Planted exact copies of the query vector ride the APPENDED batch —
    // provable top-5 through the partition-pruned probe (q86's closed form).
    "q153_ann_append" ->
      """SELECT cast(i + 9300 as bigint) AS vec_id, 1.0 AS cos
        |FROM range(5) t(i)""".stripMargin,

    // q94's int8 quantization replay; full and prefix-sliced rankings, then
    // a k x k intersection per width.
    "q154_matryoshka_recall" ->
      """WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |      x -> CASE WHEN maxabs = 0 THEN 0
        |        ELSE cast(floor(cast(x as double) * 127.0 / maxabs) as bigint)
        |        END) AS qv
        |  FROM (SELECT vec_id, embedding,
        |          cast(list_max(list_transform(embedding, x -> abs(x)))
        |            as double) AS maxabs
        |        FROM embeddings WHERE embedding IS NOT NULL)),
        |qq AS (SELECT qv AS sv FROM q WHERE vec_id = 0),
        |fullc AS (
        |  SELECT q.vec_id,
        |    CASE WHEN l.na = 0 OR l.nb = 0 THEN 0.0
        |         ELSE l.dot / (sqrt(l.na) * sqrt(l.nb)) END AS cos
        |  FROM q CROSS JOIN qq CROSS JOIN LATERAL (
        |    SELECT list_dot_product(cast(q.qv as double[]),
        |             cast(qq.sv as double[])) AS dot,
        |           list_dot_product(cast(q.qv as double[]),
        |             cast(q.qv as double[])) AS na,
        |           list_dot_product(cast(qq.sv as double[]),
        |             cast(qq.sv as double[])) AS nb) l
        |  WHERE q.vec_id <> 0),
        |fulltop AS (
        |  SELECT vec_id FROM fullc ORDER BY cos DESC, vec_id LIMIT 10),
        |dms AS (SELECT unnest([8, 16, 32]) AS d),
        |tc AS (
        |  SELECT dms.d, q.vec_id,
        |    CASE WHEN l.na = 0 OR l.nb = 0 THEN 0.0
        |         ELSE l.dot / (sqrt(l.na) * sqrt(l.nb)) END AS cos
        |  FROM dms CROSS JOIN q CROSS JOIN qq CROSS JOIN LATERAL (
        |    SELECT list_dot_product(cast(q.qv[1:dms.d] as double[]),
        |             cast(qq.sv[1:dms.d] as double[])) AS dot,
        |           list_dot_product(cast(q.qv[1:dms.d] as double[]),
        |             cast(q.qv[1:dms.d] as double[])) AS na,
        |           list_dot_product(cast(qq.sv[1:dms.d] as double[]),
        |             cast(qq.sv[1:dms.d] as double[])) AS nb) l
        |  WHERE q.vec_id <> 0),
        |ttop AS (
        |  SELECT d, vec_id FROM (
        |    SELECT d, vec_id, row_number() OVER (PARTITION BY d
        |      ORDER BY cos DESC, vec_id) AS rk
        |    FROM tc) WHERE rk <= 10)
        |SELECT cast(t.d AS int) AS dims,
        |  cast(count(f.vec_id) AS bigint) AS n_common,
        |  round(count(f.vec_id) / 10.0, 6) AS recall
        |FROM ttop t LEFT JOIN fulltop f USING (vec_id)
        |GROUP BY t.d""".stripMargin,

    // Same normalization chain (RE2-safe, 'g' flag) + keep-first per
    // fingerprint; null/punct-only texts share the empty key.
    "q155_normalized_dedup" ->
      """WITH base AS (SELECT doc_id, text, lang FROM documents),
        |var AS (
        |  SELECT doc_id + 100000 AS doc_id, upper(text) || ' !!' AS text,
        |    lang
        |  FROM documents WHERE doc_id % 13 = 0),
        |ad AS (SELECT * FROM base UNION ALL SELECT * FROM var),
        |norm AS (
        |  SELECT doc_id, lang,
        |    md5(coalesce(trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), '')) AS k
        |  FROM ad),
        |cl AS (
        |  SELECT k, min(doc_id) AS doc_id, count(*) AS n_variants
        |  FROM norm GROUP BY k),
        |surv AS (
        |  SELECT n.lang, c.doc_id, c.n_variants
        |  FROM cl c JOIN norm n ON n.doc_id = c.doc_id AND n.k = c.k)
        |SELECT lang, count(*) AS n_survivors,
        |  cast(sum(doc_id) AS bigint) AS id_sum,
        |  cast(sum(n_variants) AS bigint) AS n_docs
        |FROM surv GROUP BY lang""".stripMargin,

    // q90's BM25 replay (top-10 + rank); relevance = query terms present;
    // nano-quantized positional discounts, integer DCG/IDCG sums.
    "q156_ndcg" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, cast(len(toks) as bigint) AS dl,
        |    list_filter(toks, x -> x IN ('spark', 'window', 'merge')) AS qt
        |  FROM t),
        |g AS (SELECT doc_id, dl, unnest(qt) AS term FROM d),
        |tfs AS (
        |  SELECT doc_id, dl, term, count(*) AS tf FROM g GROUP BY 1, 2, 3),
        |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM d),
        |wdf AS (
        |  SELECT tfs.*, count(*) OVER (PARTITION BY term) AS df FROM tfs),
        |scored AS (
        |  SELECT doc_id,
        |    cast(round(
        |      ln(1.0 + ((n_docs - df) + 0.5) / (df + 0.5)) *
        |      ((tf * (1.2 + 1.0)) /
        |       (tf + 1.2 * (1.0 - 0.75 +
        |          0.75 * dl / (cast(sum_dl as double) / n_docs)))) *
        |      1e9) as bigint) AS qs
        |  FROM wdf CROSS JOIN stats),
        |lexs AS (
        |  SELECT doc_id, round(cast(sum(qs) as double) / 1e9, 6) AS score
        |  FROM scored GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10),
        |ranking AS (
        |  SELECT doc_id,
        |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank
        |  FROM lexs),
        |rel AS (
        |  SELECT doc_id,
        |    cast(coalesce(list_contains(toks, 'spark'), false) AS bigint) +
        |    cast(coalesce(list_contains(toks, 'window'), false) AS bigint) +
        |    cast(coalesce(list_contains(toks, 'merge'), false) AS bigint)
        |      AS rel
        |  FROM t),
        |dcg AS (
        |  SELECT coalesce(sum(coalesce(r.rel, 0) *
        |    cast(round(1e9 / log2(k.rank + 1)) as bigint)), 0) AS dcg_nano
        |  FROM ranking k LEFT JOIN rel r USING (doc_id)
        |  WHERE k.rank <= 10),
        |itop AS (
        |  SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id) AS irank
        |  FROM (SELECT doc_id, rel FROM rel
        |        ORDER BY rel DESC, doc_id LIMIT 10)),
        |idcg AS (
        |  SELECT coalesce(sum(rel *
        |    cast(round(1e9 / log2(irank + 1)) as bigint)), 0) AS idcg_nano
        |  FROM itop)
        |SELECT cast(dcg_nano as bigint) AS dcg_nano,
        |  cast(idcg_nano as bigint) AS idcg_nano,
        |  round(cast(dcg_nano as double) / idcg_nano, 6) AS ndcg
        |FROM dcg CROSS JOIN idcg""".stripMargin,

    "q157_k_anonymity" ->
      """WITH g AS (
        |  SELECT c_nationkey, c_mktsegment, count(*) AS n
        |  FROM customer GROUP BY 1, 2)
        |SELECT count(*) AS n_groups,
        |  cast(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS bigint)
        |    AS n_violating_groups,
        |  cast(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS bigint)
        |    AS n_rows_at_risk,
        |  cast(min(n) AS bigint) AS min_group_size
        |FROM g""".stripMargin,

    // Integer power-of-two decay weights (1 << (maxAge - age)) — the whole
    // ranking replays in 64-bit integer arithmetic.
    "q158_decayed_trending" ->
      """WITH d AS (
        |  SELECT doc_id % 8 AS day, text FROM documents
        |  WHERE text IS NOT NULL),
        |c AS (
        |  SELECT tok AS term, day AS dd, count(*) AS c FROM (
        |    SELECT day, unnest(list_filter(string_split(lower(text), ' '),
        |      x -> x <> '')) AS tok
        |    FROM d)
        |  GROUP BY tok, day),
        |m AS (SELECT max(dd) AS md FROM c)
        |SELECT term,
        |  cast(sum(c * (1::BIGINT << cast(7 - (md - dd) AS int)))
        |    AS bigint) AS decayed_scaled,
        |  cast(sum(c) AS bigint) AS n_raw
        |FROM c CROSS JOIN m
        |WHERE md - dd <= 7
        |GROUP BY term
        |ORDER BY decayed_scaled DESC, term LIMIT 20""".stripMargin,

    // The md5 rank order + forced-test prefix + hash remainder, replayed
    // row-exact; coverage_ok is the guarantee the operator exists for.
    "q159_coverage_split" ->
      """WITH r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY
        |      ('0x' || substr(md5(cast(doc_id AS varchar)), 1, 15))::BIGINT,
        |      doc_id) AS rk
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN rk <= 20 THEN 'test'
        |         WHEN ('0x' || substr(md5(cast(doc_id AS varchar)), 1, 15))
        |              ::BIGINT % 1000 < 900 THEN 'train'
        |         ELSE 'test' END AS split
        |  FROM r),
        |p AS (
        |  SELECT lang, count(*) AS n_docs,
        |    cast(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS bigint)
        |      AS n_test,
        |    cast(coalesce(sum(CASE WHEN split = 'train' THEN doc_id END), 0)
        |      AS bigint) AS train_id_sum
        |  FROM s GROUP BY lang)
        |SELECT lang, n_docs, n_test, train_id_sum,
        |  n_test >= least(20, n_docs) AS coverage_ok
        |FROM p""".stripMargin,

    // Planted exact copies: same cell as the query (probed first), per-
    // subspace argmin codes → the global ADC minimum; ties rank by id and
    // no corpus vector shares the minimal code (the q110 construction).
    "q160_ivfpq_ann" ->
      """SELECT cast(i + 1 as bigint) AS rank, cast(i + 9400 as bigint)
        |  AS vec_id
        |FROM range(5) t(i)""".stripMargin,

    // Gate (q133's rules) + mix (md5 per-mille) replay exactly; the exact
    // decontamination side replays q65's shingle CTEs with the integer keep
    // rule; the bloom stage can only keep a SUBSET of the exact-kept set, so
    // n_bloom_outside_exact pins 0.
    "q161_stream_ingest" ->
      """WITH planted AS (
        |  SELECT doc_id, lang,
        |    text ||
        |    CASE WHEN doc_id % 6 = 0 THEN ' cafÃ© donâ€™t' ELSE '' END ||
        |    CASE WHEN doc_id % 9 = 0 THEN chr(7) || chr(1) || chr(7)
        |         ELSE '' END AS text
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, lang, text FROM planted
        |  WHERE coalesce(1000 * (length(text) -
        |      length(replace(text, chr(65533), ''))) <= length(text), FALSE)
        |    AND coalesce(1000 * len(regexp_extract_all(text,
        |      '[\x00-\x08\x0B\x0C\x0E-\x1F]')) <= 2 * length(text), FALSE)
        |    AND coalesce(len(regexp_extract_all(text,
        |      'Ã[©¨¤¶¼]|â€[™œ]')) <= 0, FALSE)),
        |gm AS (
        |  SELECT doc_id, lang, text FROM g
        |  WHERE ('0x' || substr(md5(cast(doc_id as varchar)), 1, 15))::BIGINT
        |    % 1000 <
        |    CASE WHEN lang = 'en' THEN 250 WHEN lang = 'de' THEN 0
        |         ELSE 1000 END),
        |tr AS (
        |  SELECT DISTINCT unnest(s) AS gg FROM (
        |    SELECT list_distinct(
        |      CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |           ELSE [array_to_string(toks[i:i+2], ' ')
        |                 FOR i IN generate_series(1, len(toks) - 2)] END) AS s
        |    FROM (SELECT list_filter(string_split(text, ' '), x -> x <> '')
        |            AS toks
        |          FROM documents WHERE doc_id % 7 = 0))),
        |te AS (
        |  SELECT doc_id, lang, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks) - 2)] END) AS s
        |  FROM (SELECT doc_id, lang,
        |          list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |        FROM gm)),
        |hit AS (
        |  SELECT doc_id, count(*) AS n_cont
        |  FROM (SELECT doc_id, unnest(s) AS gg FROM te) x JOIN tr USING (gg)
        |  GROUP BY doc_id),
        |kept AS (
        |  SELECT te.lang, te.doc_id FROM te LEFT JOIN hit USING (doc_id)
        |  WHERE coalesce(n_cont, 0) * 2 <= len(s)),
        |ng AS (SELECT lang, count(*) AS n_gated FROM gm GROUP BY lang),
        |nk AS (SELECT lang, count(*) AS n_kept_exact FROM kept GROUP BY lang)
        |SELECT ng.lang, ng.n_gated,
        |  cast(coalesce(nk.n_kept_exact, 0) AS bigint) AS n_kept_exact,
        |  cast(0 AS bigint) AS n_bloom_outside_exact
        |FROM ng LEFT JOIN nk ON ng.lang = nk.lang""".stripMargin,

    // q40's rule bounded by the snapshot timestamp.
    "q162_snapshot_read" ->
      """WITH b AS (
        |  SELECT max(epoch_us(ts)) - 86400000000 AS t0 FROM events),
        |f AS (
        |  SELECT user_id, event_type, event_id, value, ts
        |  FROM events CROSS JOIN b WHERE epoch_us(ts) <= t0),
        |r AS (
        |  SELECT user_id, event_type, event_id, value,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM f)
        |SELECT user_id, event_type, event_id AS event_id_asof,
        |  round(value, 2) AS value_asof
        |FROM r WHERE rn = 1""".stripMargin,

    // Position, clamp-at-edges slice, join — the same list arithmetic.
    "q163_search_snippets" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
        |  FROM documents WHERE doc_id % 10 = 0),
        |p AS (
        |  SELECT doc_id, tk, list_position(tk, 'merge') AS p FROM t)
        |SELECT doc_id, cast(p AS bigint) AS first_pos,
        |  array_to_string(tk[greatest(p - 5, 1):(p + 5)], ' ') AS snippet
        |FROM p WHERE p IS NOT NULL AND p > 0""".stripMargin,

    "q164_column_profile" ->
      """SELECT 'l_orderkey' AS "column", count(*) AS n_rows,
        |  cast(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
        |    AS bigint) AS n_nulls,
        |  count(DISTINCT l_orderkey) AS n_distinct,
        |  cast(min(l_orderkey) AS bigint) AS min_val,
        |  cast(max(l_orderkey) AS bigint) AS max_val
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_partkey', count(*),
        |  cast(sum(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END) AS bigint),
        |  count(DISTINCT l_partkey),
        |  cast(min(l_partkey) AS bigint), cast(max(l_partkey) AS bigint)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_suppkey', count(*),
        |  cast(sum(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END) AS bigint),
        |  count(DISTINCT l_suppkey),
        |  cast(min(l_suppkey) AS bigint), cast(max(l_suppkey) AS bigint)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_quantity', count(*),
        |  cast(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS bigint),
        |  count(DISTINCT l_quantity),
        |  cast(min(l_quantity) AS bigint), cast(max(l_quantity) AS bigint)
        |FROM lineitem""".stripMargin,

    // q72's capped-pair + recursive-CC replay, then q21's quality formula
    // picks each cluster's best member (ties → min id); non-members pass.
    "q165_canonical_select" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks) - 2)] END) AS s
        |  FROM t),
        |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
        |inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |keep AS (SELECT g FROM inv GROUP BY g HAVING count(*) <= 1000),
        |invk AS (SELECT inv.* FROM inv JOIN keep USING (g)),
        |cand AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM invk a JOIN invk b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |pairs AS (
        |  SELECT id_a, id_b FROM cand
        |  JOIN sizes na ON na.doc_id = id_a
        |  JOIN sizes nb ON nb.doc_id = id_b
        |  WHERE inter / cast(na.n + nb.n - inter as double) >= 0.8),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
        |labels AS (
        |  SELECT src AS doc_id, least(src, min(dst)) AS rep
        |  FROM reach GROUP BY src),
        |qual AS (
        |  SELECT doc_id, lang,
        |    round(
        |      least(length(text) / 500.0, 1.0) * 0.4 +
        |      least(len(list_filter(tk, x -> x IN
        |        ('the','a','of','and','to','der','die','das','und',
        |         'le','la','les','et','el','los','y','que')))
        |        / greatest(len(tk), 1.0) * 10.0, 1.0) * 0.3 +
        |      (CASE WHEN len(tk) = 0 THEN 0.0
        |            ELSE len(list_distinct(tk)) / cast(len(tk) as double)
        |       END) * 0.3,
        |    6) AS q
        |  FROM (SELECT doc_id, lang, text,
        |          list_filter(string_split(lower(text), ' '), x -> x <> '')
        |            AS tk
        |        FROM documents)),
        |winners AS (
        |  SELECT doc_id FROM (
        |    SELECT q.doc_id,
        |      row_number() OVER (PARTITION BY l.rep
        |        ORDER BY q.q DESC, q.doc_id) AS rn
        |    FROM qual q JOIN labels l USING (doc_id))
        |  WHERE rn = 1),
        |surv AS (
        |  SELECT doc_id FROM qual
        |  WHERE doc_id NOT IN (SELECT doc_id FROM labels)
        |  UNION ALL SELECT doc_id FROM winners)
        |SELECT q.lang, count(*) AS n_docs,
        |  cast(sum(s.doc_id) AS bigint) AS id_sum
        |FROM surv s JOIN qual q USING (doc_id)
        |GROUP BY q.lang""".stripMargin,

    // Distinct (basket, item) pairs, basket-keyed self-join, nano lift —
    // same arithmetic shape.
    "q166_frequent_pairs" ->
      """WITH bi AS (
        |  SELECT DISTINCT l_orderkey AS b, p_brand AS it
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |nb AS (SELECT count(DISTINCT b) AS nb FROM bi),
        |ci AS (SELECT it, count(*) AS ci FROM bi GROUP BY it),
        |pr AS (
        |  SELECT a.it AS item_a, b.it AS item_b, count(*) AS n_baskets
        |  FROM bi a JOIN bi b ON a.b = b.b AND a.it < b.it
        |  GROUP BY a.it, b.it HAVING count(*) >= 50)
        |SELECT item_a, item_b, n_baskets,
        |  cast(round(cast(n_baskets AS double) * nb /
        |    (cast(ca.ci AS double) * cb.ci) * 1e9) AS bigint) AS lift_nano
        |FROM pr
        |JOIN ci ca ON pr.item_a = ca.it
        |JOIN ci cb ON pr.item_b = cb.it
        |CROSS JOIN nb
        |ORDER BY n_baskets DESC, item_a, item_b LIMIT 20""".stripMargin,

    // Same fingerprint-keyed attribution over the mirrored corpus.
    "q167_cross_source_dups" ->
      """WITH ad AS (
        |  SELECT doc_id, text, source FROM documents
        |  UNION ALL
        |  SELECT doc_id + 200000, text, 'mirror_' || source
        |  FROM documents WHERE doc_id % 17 = 0
        |  UNION ALL
        |  SELECT doc_id + 300000, text, 'aggregator'
        |  FROM documents WHERE doc_id % 51 = 0),
        |fp AS (
        |  SELECT md5(text) AS fp, source AS src, count(*) AS n
        |  FROM ad WHERE text IS NOT NULL
        |  GROUP BY md5(text), source)
        |SELECT a.src AS source_a, b.src AS source_b,
        |  count(*) AS n_clusters,
        |  cast(sum(a.n) AS bigint) AS n_docs_a,
        |  cast(sum(b.n) AS bigint) AS n_docs_b
        |FROM fp a JOIN fp b ON a.fp = b.fp AND a.src < b.src
        |GROUP BY a.src, b.src""".stripMargin,

    // Integer div buckets, counter-sum merge, ceil-div nearest ranks.
    "q168_histogram_quantiles" ->
      """WITH h AS (
        |  SELECT n_chars // 256 AS bucket, count(*) AS n
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars >= 0
        |  GROUP BY 1),
        |c AS (
        |  SELECT bucket, n,
        |    sum(n) OVER (ORDER BY bucket) AS cum,
        |    sum(n) OVER () AS total
        |  FROM h),
        |p AS (
        |  SELECT bucket, cum, total, permille,
        |    (total * permille + 999) // 1000 AS rank
        |  FROM c CROSS JOIN (SELECT unnest([500, 900, 990]) AS permille) g)
        |SELECT cast(permille AS int) AS permille,
        |  cast(rank AS bigint) AS rank,
        |  cast(min(bucket) AS bigint) AS bucket,
        |  cast(min(bucket) * 256 AS bigint) AS lo,
        |  cast(min(bucket) * 256 + 255 AS bigint) AS hi
        |FROM p WHERE cum >= rank
        |GROUP BY permille, rank""".stripMargin,

    // Floor division on positive integers ≡ Spark's double-div + cast-to-long.
    "q169_soft_dedup" ->
      """WITH ad AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 400000, text FROM documents WHERE doc_id % 13 = 0
        |  UNION ALL
        |  SELECT doc_id + 500000, text FROM documents WHERE doc_id % 39 = 0),
        |c AS (
        |  SELECT md5(text) AS fp, count(*) AS n
        |  FROM ad WHERE text IS NOT NULL GROUP BY 1)
        |SELECT ad.doc_id, c.n AS dup_count,
        |  CAST(1000000000 // c.n AS BIGINT) AS weight_nano
        |FROM ad JOIN c ON md5(ad.text) = c.fp""".stripMargin,

    // globalRank(sig, id) ≡ row_number() OVER (ORDER BY sig, doc_id); the
    // neighbor pass is a rank-difference join, window 10, Hamming ≤ 6.
    "q170_sorted_neighborhood" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_transform(list_filter(string_split(text, ' '), t -> t <> ''),
        |      t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS hs
        |  FROM documents),
        |sig AS (
        |  SELECT doc_id,
        |    CAST(list_sum(
        |      [CASE WHEN 2 * len(list_filter(hs, h -> ((h >> b) & 1) = 1)) > len(hs)
        |            THEN 1::BIGINT << b ELSE 0::BIGINT END
        |       FOR b IN generate_series(0, 59)]) AS BIGINT) AS sig
        |  FROM tk),
        |r AS (
        |  SELECT doc_id, sig, row_number() OVER (ORDER BY sig, doc_id) AS rn
        |  FROM sig)
        |SELECT least(a.doc_id, b.doc_id) AS id_a,
        |  greatest(a.doc_id, b.doc_id) AS id_b,
        |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
        |FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 10
        |WHERE bit_count(xor(a.sig, b.sig)) <= 6""".stripMargin,

    // Three unrolled vote rounds: weighted vote sum keyed by (node, label),
    // winner by (v DESC, label), seeds clamped via coalesce priority.
    "q171_label_propagation" -> {
      val rounds = (1 to 3).map { i =>
        s"""v$i AS (
           |  SELECT e.dst AS node, l.label, sum(e.w) AS v
           |  FROM sym e JOIN l${i - 1} l ON l.node = e.src
           |  WHERE l.label IS NOT NULL GROUP BY 1, 2),
           |w$i AS (
           |  SELECT node, label FROM (
           |    SELECT node, label, row_number() OVER (
           |      PARTITION BY node ORDER BY v DESC, label) AS rn FROM v$i)
           |  WHERE rn = 1),
           |l$i AS (
           |  SELECT nd.node, coalesce(s.label, w.label) AS label
           |  FROM nodes nd LEFT JOIN seeds s ON s.node = nd.node
           |  LEFT JOIN w$i w ON w.node = nd.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH ev AS (
         |  SELECT user_id, epoch_ns(ts) // 1000 AS tus, event_id,
         |    cast(regexp_extract(props, '"k": (\\d+)', 1) as bigint) AS page
         |  FROM events),
         |ed AS (
         |  SELECT src, dst FROM (
         |    SELECT page AS src,
         |      lead(page) OVER (PARTITION BY user_id ORDER BY tus, event_id)
         |        AS dst
         |    FROM ev)
         |  WHERE dst IS NOT NULL),
         |sym AS (
         |  SELECT src, dst, count(*) AS w FROM (
         |    SELECT src, dst FROM ed UNION ALL SELECT dst, src FROM ed)
         |  GROUP BY 1, 2),
         |nodes AS (SELECT DISTINCT src AS node FROM sym),
         |seeds AS (SELECT node, node % 3 AS label FROM nodes WHERE node % 7 = 0),
         |l0 AS (
         |  SELECT nd.node, s.label FROM nodes nd
         |  LEFT JOIN seeds s ON s.node = nd.node),
         |$rounds
         |SELECT node, label FROM l3""".stripMargin
    },

    // q94's int8 replay + nano-floored cosines; margin = integer ratio over
    // top-4 nano sums; mutual argmax with (margin, c, id) tie order.
    "q172_margin_alignment" ->
      """WITH qz AS (
        |  SELECT vec_id, list_transform(embedding, x -> CASE WHEN maxabs = 0 THEN 0
        |      ELSE cast(floor(cast(x as double) * 127.0 / maxabs) as bigint) END) AS qv
        |  FROM (SELECT vec_id, embedding,
        |          cast(list_max(list_transform(embedding, x -> abs(x))) as double) AS maxabs
        |        FROM embeddings WHERE embedding IS NOT NULL)),
        |qa AS (SELECT vec_id AS ida, qv FROM qz WHERE vec_id % 2 = 0),
        |qb AS (SELECT vec_id AS idb, qv FROM qz WHERE vec_id % 2 = 1),
        |p AS (
        |  SELECT ida, idb, c FROM (
        |    SELECT ida, idb,
        |      cast(floor((CASE WHEN l.na = 0 OR l.nb = 0 THEN 0.0
        |           ELSE l.dot / (sqrt(l.na) * sqrt(l.nb)) END) * 1000000000.0)
        |        as bigint) AS c
        |    FROM qa CROSS JOIN qb CROSS JOIN LATERAL (
        |      SELECT list_dot_product(cast(qa.qv as double[]), cast(qb.qv as double[])) AS dot,
        |             list_dot_product(cast(qa.qv as double[]), cast(qa.qv as double[])) AS na,
        |             list_dot_product(cast(qb.qv as double[]), cast(qb.qv as double[])) AS nb) l)
        |  WHERE c > 0),
        |f AS (
        |  SELECT ida, sum(c) AS f FROM (
        |    SELECT ida, c, row_number() OVER (
        |      PARTITION BY ida ORDER BY c DESC, idb) AS rn FROM p)
        |  WHERE rn <= 4 GROUP BY ida),
        |g AS (
        |  SELECT idb, sum(c) AS g FROM (
        |    SELECT idb, c, row_number() OVER (
        |      PARTITION BY idb ORDER BY c DESC, ida) AS rn FROM p)
        |  WHERE rn <= 4 GROUP BY idb),
        |m AS (
        |  SELECT p.ida, p.idb, p.c,
        |    (p.c * 8 * 1000000000) // (f.f + g.g) AS margin_nano
        |  FROM p JOIN f ON f.ida = p.ida JOIN g ON g.idb = p.idb),
        |r AS (
        |  SELECT ida, idb, c, margin_nano,
        |    row_number() OVER (PARTITION BY ida
        |      ORDER BY margin_nano DESC, c DESC, idb) AS ra,
        |    row_number() OVER (PARTITION BY idb
        |      ORDER BY margin_nano DESC, c DESC, ida) AS rb
        |  FROM m)
        |SELECT ida AS id_a, idb AS id_b, c AS cos_nano,
        |  cast(margin_nano AS BIGINT) AS margin_nano
        |FROM r WHERE ra = 1 AND rb = 1 AND margin_nano >= 1000000000""".stripMargin,

    // q103's NB replay through the class scores, then margin = s_aug −
    // max(other); clamped equi-width integer buckets; floor-div rates.
    "q173_calibration" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN text || ' alpha beta alpha'
        |         ELSE text END AS text,
        |    CASE WHEN doc_id % 3 = 0 THEN 'aug' ELSE 'plain' END AS cls
        |  FROM documents),
        |tk AS (
        |  SELECT doc_id, cls,
        |    ('0x' || substr(md5(tok), 1, 15))::BIGINT % 256 AS b
        |  FROM (
        |    SELECT doc_id, cls,
        |      unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
        |        AS tok
        |    FROM base)),
        |cls AS (SELECT cls AS c, count(*) AS n_docs FROM base GROUP BY 1),
        |tot AS (SELECT sum(n_docs) AS nd FROM cls),
        |pri AS (
        |  SELECT c, cast(round(ln(n_docs / cast(nd as double)) * 1e9, 0)
        |    as bigint) AS pn
        |  FROM cls CROSS JOIN tot),
        |cnts AS (SELECT cls AS c, b, count(*) AS cnt FROM tk GROUP BY 1, 2),
        |ctot AS (SELECT c, sum(cnt) AS tc FROM cnts GROUP BY 1),
        |grid AS (
        |  SELECT c, gs.b FROM cls,
        |    (SELECT unnest(generate_series(0, 255)) AS b) gs),
        |w AS (
        |  SELECT grid.c, grid.b, cast(round(
        |    ln((coalesce(cnt, 0) + 1) / cast(coalesce(tc, 0) + 256 as double))
        |      * 1e9, 0) as bigint) AS wn
        |  FROM grid
        |  LEFT JOIN cnts ON cnts.c = grid.c AND cnts.b = grid.b
        |  LEFT JOIN ctot ON ctot.c = grid.c),
        |sc AS (
        |  SELECT tk.doc_id, tk.cls, w.c, sum(wn) AS sw
        |  FROM tk JOIN w ON tk.b = w.b GROUP BY 1, 2, 3),
        |scj AS (
        |  SELECT doc_id, cls, c, sw + pn AS score FROM sc JOIN pri USING (c)),
        |m AS (
        |  SELECT a.doc_id, a.cls, a.score - max(b.score) AS mg
        |  FROM scj a JOIN scj b ON a.doc_id = b.doc_id AND b.c <> 'aug'
        |  WHERE a.c = 'aug' GROUP BY a.doc_id, a.cls, a.score),
        |bk AS (
        |  SELECT (greatest(-10000000000, least(mg, 19999999999))
        |      + 10000000000) // 2000000000 AS bucket,
        |    CASE WHEN cls = 'aug' THEN 1 ELSE 0 END AS pos
        |  FROM m)
        |SELECT cast(bucket as bigint) AS bucket,
        |  cast(-10000000000 + bucket * 2000000000 as bigint) AS lo,
        |  cast(-10000000000 + (bucket + 1) * 2000000000 as bigint) AS hi,
        |  count(*) AS n, cast(sum(pos) as bigint) AS positives,
        |  cast((1000000000 * sum(pos)) // count(*) as bigint) AS rate_nano
        |FROM bk GROUP BY bucket""".stripMargin,

    // Markers m_j = floor(j*W/1000); copies = ceil-div difference of the
    // cumulative bounds; hash order = md5_prefix60(doc_id), then doc_id.
    "q174_systematic_resample" ->
      """WITH w AS (
        |  SELECT doc_id, n_chars AS weight,
        |    ('0x' || substr(md5(cast(doc_id as varchar)), 1, 15))::BIGINT AS h
        |  FROM documents WHERE n_chars > 0),
        |c AS (
        |  SELECT doc_id, weight,
        |    sum(weight) OVER (ORDER BY h, doc_id) AS cum,
        |    sum(weight) OVER () AS t
        |  FROM w)
        |SELECT doc_id, weight,
        |  cast(((cum * 1000 + t - 1) // t)
        |    - (((cum - weight) * 1000 + t - 1) // t) as bigint) AS copies
        |FROM c
        |WHERE ((cum * 1000 + t - 1) // t)
        |    - (((cum - weight) * 1000 + t - 1) // t) >= 1""".stripMargin,

    // Greedy farthest-point rounds unrolled; dist² = na + nb − 2·dot on
    // the int8 grid (exact integers under the double representation).
    "q175_kcenter_coreset" -> {
      def d2(a: String, b: String) =
        s"""cast(list_dot_product(cast($a as double[]), cast($a as double[]))
           |   + list_dot_product(cast($b as double[]), cast($b as double[]))
           |   - 2 * list_dot_product(cast($a as double[]), cast($b as double[]))
           |  as bigint)""".stripMargin
      val rounds = (2 to 6).map { i =>
        val upd = if (i < 6)
          s""",
             |m$i AS (
             |  SELECT a.id, a.qv, least(a.m, ${d2("a.qv", "c.qv")}) AS m
             |  FROM m${i - 1} a CROSS JOIN c$i c)""".stripMargin
        else ""
        s"""c$i AS (
           |  SELECT id, qv, m FROM m${i - 1} ORDER BY m DESC, id LIMIT 1)$upd""".stripMargin
      }.mkString(",\n")
      s"""WITH q AS (
         |  SELECT vec_id AS id, list_transform(embedding, x -> CASE WHEN maxabs = 0 THEN 0
         |      ELSE cast(floor(cast(x as double) * 127.0 / maxabs) as bigint) END) AS qv
         |  FROM (SELECT vec_id, embedding,
         |          cast(list_max(list_transform(embedding, x -> abs(x))) as double) AS maxabs
         |        FROM embeddings WHERE embedding IS NOT NULL)),
         |c1 AS (
         |  SELECT id, qv FROM (
         |    SELECT id, qv,
         |      ('0x' || substr(md5(cast(id as varchar)), 1, 15))::BIGINT AS h
         |    FROM q)
         |  ORDER BY h, id LIMIT 1),
         |m1 AS (
         |  SELECT q.id, q.qv, ${d2("q.qv", "c.qv")} AS m
         |  FROM q CROSS JOIN c1 c),
         |$rounds
         |SELECT cast(round AS BIGINT) AS round, center_id,
         |  cast(radius_sq AS BIGINT) AS radius_sq FROM (
         |  SELECT 1 AS round, id AS center_id, 0 AS radius_sq FROM c1
         |  UNION ALL SELECT 2, id, m FROM c2
         |  UNION ALL SELECT 3, id, m FROM c3
         |  UNION ALL SELECT 4, id, m FROM c4
         |  UNION ALL SELECT 5, id, m FROM c5
         |  UNION ALL SELECT 6, id, m FROM c6)""".stripMargin
    },

    // Token-set membership (never substring); floor-div permille.
    "q176_blocklist_gate" ->
      """WITH d AS (
        |  SELECT source,
        |    CASE WHEN len(list_filter(
        |        list_filter(string_split(lower(text), ' '), t -> t <> ''),
        |        t -> t IN ('slow', 'vector'))) > 0 THEN 1 ELSE 0 END AS dropped
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  cast(sum(dropped) as bigint) AS n_dropped,
        |  cast(count(*) - sum(dropped) as bigint) AS n_kept,
        |  cast((1000 * sum(dropped)) // count(*) as bigint) AS drop_permille
        |FROM d GROUP BY source""".stripMargin,

    // Arrival = (utc-day, user, event); high-water via running max; q148's
    // bit-length buckets; ceil-free integer permilles.
    "q177_lateness_audit" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS tus FROM events),
        |r AS (
        |  SELECT tus, max(tus) OVER (
        |    ORDER BY tus // 86400000000, user_id, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hw
        |  FROM e),
        |l AS (
        |  SELECT CASE WHEN hw - tus = 0 THEN 0
        |         ELSE length(bin(hw - tus)) END AS bucket
        |  FROM r),
        |b AS (SELECT bucket, count(*) AS n FROM l GROUP BY 1),
        |c AS (SELECT bucket, n, sum(n) OVER (ORDER BY bucket) AS cum,
        |       sum(n) OVER () AS tot FROM b)
        |SELECT cast(bucket as int) AS bucket, n,
        |  cast(CASE WHEN bucket = 0 THEN 0
        |       ELSE 1::BIGINT << (bucket - 1) END as bigint) AS lo_us,
        |  cast(CASE WHEN bucket = 0 THEN 0
        |       ELSE (1::BIGINT << bucket) - 1 END as bigint) AS hi_us,
        |  cast((1000 * cum) // tot as bigint) AS cum_permille
        |FROM c""".stripMargin,

    // q24's exact-jaccard pair replay at >= 0.2, fanned into deciles;
    // membership is the integer test 10*inter >= d*union — exact at every
    // decile boundary (never the rounded score vs a float cut).
    "q178_threshold_curve" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ')
        |               FOR i IN generate_series(1, len(toks) - 2)] END) AS s
        |  FROM t),
        |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
        |inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |keep AS (SELECT g FROM inv GROUP BY g HAVING count(*) <= 1000),
        |invk AS (SELECT inv.* FROM inv JOIN keep USING (g)),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM invk a JOIN invk b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |j AS (
        |  SELECT id_b, inter, na.n + nb.n - inter AS uni
        |  FROM pairs
        |  JOIN sizes na ON na.doc_id = id_a
        |  JOIN sizes nb ON nb.doc_id = id_b
        |  WHERE inter / cast(na.n + nb.n - inter as double) >= 0.2),
        |x AS (
        |  SELECT id_b, d FROM j CROSS JOIN
        |    (SELECT unnest(generate_series(2, 10)) AS d)
        |  WHERE inter * 10 >= d * uni)
        |SELECT cast(d * 100 as bigint) AS threshold_permille,
        |  count(*) AS n_pairs,
        |  cast(count(DISTINCT id_b) as bigint) AS n_victims
        |FROM x GROUP BY d""".stripMargin,

    // Two integer rank windows -> first-relevant reciprocal ranks; dense
    // query index by alphabetical term; md5(rep_slot) % 12 replica draws.
    "q179_paired_bootstrap" ->
      """WITH terms AS (
        |  SELECT unnest(['spark', 'window', 'merge', 'join', 'hash', 'scan',
        |    'filter', 'batch', 'query', 'table', 'vector', 'stream']) AS tok),
        |tk AS (
        |  SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
        |  FROM documents),
        |base AS (
        |  SELECT tok, doc_id, count(*) AS c, max(len) AS len
        |  FROM (SELECT doc_id, len(toks) AS len, unnest(toks) AS tok FROM tk)
        |  JOIN terms USING (tok)
        |  GROUP BY tok, doc_id),
        |sc AS (
        |  SELECT tok, doc_id, c,
        |    (c * 1000000000) // len AS dens, c >= 2 AS rel
        |  FROM base),
        |ra AS (
        |  SELECT tok, 1000000000 // min(rk) AS rr_a FROM (
        |    SELECT tok, rel, row_number() OVER (
        |      PARTITION BY tok ORDER BY c DESC, doc_id) AS rk FROM sc)
        |  WHERE rk <= 10 AND rel GROUP BY tok),
        |rb AS (
        |  SELECT tok, 1000000000 // min(rk) AS rr_b FROM (
        |    SELECT tok, rel, row_number() OVER (
        |      PARTITION BY tok ORDER BY dens DESC, doc_id) AS rk FROM sc)
        |  WHERE rk <= 10 AND rel GROUP BY tok),
        |pq AS (
        |  SELECT t.tok, coalesce(ra.rr_a, 0) AS a, coalesce(rb.rr_b, 0) AS b
        |  FROM terms t
        |  LEFT JOIN ra ON ra.tok = t.tok LEFT JOIN rb ON rb.tok = t.tok),
        |idx AS (
        |  SELECT row_number() OVER (ORDER BY tok) - 1 AS qidx, a - b AS d
        |  FROM pq),
        |slots AS (
        |  SELECT r.rep,
        |    ('0x' || substr(md5(r.rep || '_' || s.slot), 1, 15))::BIGINT % 12
        |      AS qidx
        |  FROM (SELECT unnest(generate_series(1, 1000)) AS rep) r,
        |       (SELECT unnest(generate_series(0, 11)) AS slot) s),
        |reps AS (
        |  SELECT sl.rep, sum(i.d) AS s
        |  FROM slots sl JOIN idx i ON i.qidx = sl.qidx GROUP BY sl.rep),
        |v AS (
        |  SELECT sum(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS wins_a,
        |    sum(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS wins_b,
        |    sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ties
        |  FROM reps)
        |SELECT cast(12 as bigint) AS n_queries,
        |  cast(1000 as bigint) AS resamples,
        |  cast(wins_a as bigint) AS wins_a, cast(wins_b as bigint) AS wins_b,
        |  cast(ties as bigint) AS ties,
        |  cast((1000 * wins_a) // 1000 as bigint) AS win_a_permille,
        |  cast((SELECT sum(d) FROM idx) as bigint) AS delta_nano_observed
        |FROM v""".stripMargin,

    // q173's NB margin replay, then descending-score running precision and
    // the deepest cut per target (max rank meeting the floor).
    "q180_precision_thresholds" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN text || ' alpha beta alpha'
        |         ELSE text END AS text,
        |    CASE WHEN doc_id % 3 = 0 THEN 'aug' ELSE 'plain' END AS cls
        |  FROM documents),
        |tk AS (
        |  SELECT doc_id, cls,
        |    ('0x' || substr(md5(tok), 1, 15))::BIGINT % 256 AS b
        |  FROM (
        |    SELECT doc_id, cls,
        |      unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
        |        AS tok
        |    FROM base)),
        |cls AS (SELECT cls AS c, count(*) AS n_docs FROM base GROUP BY 1),
        |tot AS (SELECT sum(n_docs) AS nd FROM cls),
        |pri AS (
        |  SELECT c, cast(round(ln(n_docs / cast(nd as double)) * 1e9, 0)
        |    as bigint) AS pn
        |  FROM cls CROSS JOIN tot),
        |cnts AS (SELECT cls AS c, b, count(*) AS cnt FROM tk GROUP BY 1, 2),
        |ctot AS (SELECT c, sum(cnt) AS tc FROM cnts GROUP BY 1),
        |grid AS (
        |  SELECT c, gs.b FROM cls,
        |    (SELECT unnest(generate_series(0, 255)) AS b) gs),
        |w AS (
        |  SELECT grid.c, grid.b, cast(round(
        |    ln((coalesce(cnt, 0) + 1) / cast(coalesce(tc, 0) + 256 as double))
        |      * 1e9, 0) as bigint) AS wn
        |  FROM grid
        |  LEFT JOIN cnts ON cnts.c = grid.c AND cnts.b = grid.b
        |  LEFT JOIN ctot ON ctot.c = grid.c),
        |sc AS (
        |  SELECT tk.doc_id, tk.cls, w.c, sum(wn) AS sw
        |  FROM tk JOIN w ON tk.b = w.b GROUP BY 1, 2, 3),
        |scj AS (
        |  SELECT doc_id, cls, c, sw + pn AS score FROM sc JOIN pri USING (c)),
        |m AS (
        |  SELECT a.doc_id, a.cls, a.score - max(b.score) AS mg
        |  FROM scj a JOIN scj b ON a.doc_id = b.doc_id AND b.c <> 'aug'
        |  WHERE a.c = 'aug' GROUP BY a.doc_id, a.cls, a.score),
        |r AS (
        |  SELECT doc_id, mg AS s,
        |    CASE WHEN cls = 'aug' THEN 1 ELSE 0 END AS p
        |  FROM m),
        |c2 AS (
        |  SELECT row_number() OVER (ORDER BY s DESC, doc_id) AS rank, s,
        |    sum(p) OVER (ORDER BY s DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS positives
        |  FROM r),
        |pr AS (
        |  SELECT rank, s, positives,
        |    (1000000000 * positives) // rank AS precision_nano
        |  FROM c2),
        |fan AS (
        |  SELECT t.target, max(rank) AS cut_rank
        |  FROM pr CROSS JOIN
        |    (SELECT unnest([800, 900, 950, 990]) AS target) t
        |  WHERE precision_nano >= t.target * 1000000
        |  GROUP BY t.target)
        |SELECT cast(f.target as int) AS target_permille,
        |  cast(f.cut_rank as bigint) AS cut_rank,
        |  cast(p.s as bigint) AS threshold,
        |  cast(f.cut_rank as bigint) AS kept,
        |  cast(p.positives as bigint) AS positives,
        |  cast(p.precision_nano as bigint) AS precision_nano
        |FROM fan f JOIN pr p ON p.rank = f.cut_rank""".stripMargin,

    // Supply-ascending order; fully funded iff cum + supply*(n-rank) <= B;
    // surplus splits R div m with R mod m leftover units to the smallest.
    "q181_water_fill" ->
      """WITH sup AS (
        |  SELECT source AS "group",
        |    cast(sum(len(list_filter(string_split(text, ' '), x -> x <> '')))
        |      as bigint) AS supply
        |  FROM documents GROUP BY source HAVING supply > 0),
        |r AS (
        |  SELECT "group", supply,
        |    row_number() OVER (ORDER BY supply, "group") AS rn,
        |    sum(supply) OVER (ORDER BY supply, "group"
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    count(*) OVER () AS n
        |  FROM sup),
        |cut AS (
        |  SELECT coalesce(max(rn), 0) AS jstar, coalesce(max(cum), 0) AS cstar
        |  FROM r WHERE cum + supply * (n - rn) <= 24000)
        |SELECT "group", supply,
        |  cast(CASE WHEN rn <= jstar THEN supply
        |       ELSE (24000 - cstar) // (n - jstar)
        |         + CASE WHEN rn <= jstar + (24000 - cstar) % (n - jstar)
        |                THEN 1 ELSE 0 END
        |  END as bigint) AS allocated,
        |  rn <= jstar AS fully_funded
        |FROM r CROSS JOIN cut""".stripMargin,

    // q29's md5 SRP bucket replay, then bit tests over generate_series
    // pairs; i = j rows are the per-bit ones-counts.
    "q182_srp_health" ->
      """WITH e AS (
        |  SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings
        |  WHERE embedding IS NOT NULL),
        |bk AS (
        |  SELECT vec_id,
        |    CAST(list_sum(
        |      [CASE WHEN list_sum(
        |         [(floor(v[d + 1] * 1000000))::BIGINT *
        |            ((('0x' || substr(md5(pb::VARCHAR || ':' || d::VARCHAR), 1, 15))::BIGINT
        |              % 1000001) - 500000)
        |          FOR d IN generate_series(0, len(v) - 1)]) > 0
        |       THEN 1::BIGINT << pb ELSE 0::BIGINT END
        |       FOR pb IN generate_series(0, 7)]) AS BIGINT) AS bucket
        |  FROM e),
        |pairs AS (
        |  SELECT i, j FROM generate_series(0, 7) s(i),
        |       generate_series(0, 7) t(j) WHERE i <= j)
        |SELECT cast(i as int) AS bit_a, cast(j as int) AS bit_b,
        |  cast(sum(((bucket >> i) & 1) * ((bucket >> j) & 1)) as bigint)
        |    AS n_both,
        |  count(*) AS n
        |FROM bk CROSS JOIN pairs GROUP BY i, j""".stripMargin,

    // Feature-hash counts (md5 % 512), postings dot join with the df cap on
    // the DOT side only (norms keep all buckets), one IEEE cosine chain.
    "q183_sparse_cosine" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(tok), 1, 15))::BIGINT % 512 AS bucket
        |  FROM (
        |    SELECT doc_id,
        |      unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
        |        AS tok
        |    FROM documents)),
        |cts AS (
        |  SELECT doc_id, bucket, count(*) AS c FROM tk GROUP BY 1, 2),
        |norms AS (SELECT doc_id, sum(c * c) AS nrm FROM cts GROUP BY 1),
        |keep AS (SELECT bucket FROM cts GROUP BY bucket
        |         HAVING count(*) <= 1000),
        |k AS (SELECT cts.* FROM cts JOIN keep USING (bucket)),
        |dots AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.c * b.c) AS dot
        |  FROM k a JOIN k b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, cast(dot as bigint) AS dot,
        |  round(dot / (sqrt(cast(na.nrm as double)) *
        |    sqrt(cast(nb.nrm as double))), 6) AS cos
        |FROM dots
        |JOIN norms na ON na.doc_id = id_a
        |JOIN norms nb ON nb.doc_id = id_b
        |WHERE dot / (sqrt(cast(na.nrm as double)) *
        |  sqrt(cast(nb.nrm as double))) >= 0.95""".stripMargin,

    // q21's quality formula floored to integer millis, then within-source
    // (score, id) rank permille — floor-div, engine-exact.
    "q184_quantile_normalize" ->
      """WITH toks AS (
        |  SELECT doc_id, source, text,
        |    list_filter(string_split(lower(text), ' '), t -> t <> '') AS tk
        |  FROM documents),
        |sc AS (
        |  SELECT doc_id, source AS "group",
        |    cast(floor(round(
        |      least(length(text) / 500.0, 1.0) * 0.4 +
        |      least(len(list_filter(tk, t -> t IN
        |        ('the','a','of','and','to','der','die','das','und',
        |         'le','la','les','et','el','los','y','que')))
        |        / greatest(len(tk), 1.0) * 10.0, 1.0) * 0.3 +
        |      (CASE WHEN len(tk) = 0 THEN 0.0
        |            ELSE len(list_distinct(tk)) / cast(len(tk) as double) END) * 0.3,
        |    6) * 1000) as bigint) AS score
        |  FROM toks),
        |r AS (
        |  SELECT doc_id, "group", score,
        |    row_number() OVER (PARTITION BY "group" ORDER BY score, doc_id)
        |      AS rk,
        |    count(*) OVER (PARTITION BY "group") AS n
        |  FROM sc)
        |SELECT doc_id, "group", score,
        |  cast((1000 * rk) // n as bigint) AS permille
        |FROM r""".stripMargin,

    // q181's allocation CTEs + the q105 batch rule, then a per-group
    // recursive first-fit fold: admit iff used + t <= allocated, oversize
    // drops without consuming.
    "q185_budget_admit" ->
      """WITH RECURSIVE sup AS (
        |  SELECT source AS "group",
        |    cast(sum(len(list_filter(string_split(text, ' '), x -> x <> '')))
        |      as bigint) AS supply
        |  FROM documents GROUP BY source HAVING supply > 0),
        |rw AS (
        |  SELECT "group", supply,
        |    row_number() OVER (ORDER BY supply, "group") AS rn,
        |    sum(supply) OVER (ORDER BY supply, "group"
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    count(*) OVER () AS n
        |  FROM sup),
        |cut AS (
        |  SELECT coalesce(max(rn), 0) AS jstar, coalesce(max(cum), 0) AS cstar
        |  FROM rw WHERE cum + supply * (n - rn) <= 24000),
        |alloc AS (
        |  SELECT "group",
        |    CASE WHEN rn <= jstar THEN supply
        |         ELSE (24000 - cstar) // (n - jstar)
        |           + CASE WHEN rn <= jstar + (24000 - cstar) % (n - jstar)
        |                  THEN 1 ELSE 0 END
        |    END AS allocated
        |  FROM rw CROSS JOIN cut),
        |bat AS (
        |  SELECT doc_id, source,
        |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS t,
        |    ntile(4) OVER (ORDER BY doc_id) AS batch
        |  FROM documents),
        |seq AS (
        |  SELECT doc_id, source AS g, t,
        |    row_number() OVER (PARTITION BY source ORDER BY batch, doc_id)
        |      AS rn
        |  FROM bat),
        |nmax AS (SELECT g FROM seq GROUP BY g),
        |steps AS (
        |  SELECT g, 0 AS rn, CAST(NULL AS BIGINT) AS doc_id,
        |    CAST(0 AS BIGINT) AS t, CAST(0 AS BIGINT) AS used, false AS adm
        |  FROM nmax
        |  UNION ALL
        |  SELECT s.g, s.rn, s.doc_id, s.t,
        |    CASE WHEN p.used + s.t <= a.allocated THEN p.used + s.t
        |         ELSE p.used END,
        |    p.used + s.t <= a.allocated
        |  FROM steps p
        |  JOIN seq s ON s.g = p.g AND s.rn = p.rn + 1
        |  JOIN alloc a ON a."group" = s.g)
        |SELECT g AS source, doc_id, cast(t as bigint) AS tokens,
        |  cast(used as bigint) AS cum_tokens
        |FROM steps WHERE adm""".stripMargin,

    // q106's transition-edge replay, collapsed to the simple undirected
    // graph; triangles enumerated once each via a<b<c edge chaining, then
    // unnested to the three corners for per-node counts.
    "q186_triangle_counts" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS tus, event_id,
        |    cast(regexp_extract(props, '"k": (\d+)', 1) as bigint) AS page
        |  FROM events),
        |ed AS (
        |  SELECT src, dst FROM (
        |    SELECT page AS src,
        |      lead(page) OVER (PARTITION BY user_id ORDER BY tus, event_id)
        |        AS dst
        |    FROM ev)
        |  WHERE dst IS NOT NULL),
        |ce AS (
        |  SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
        |  FROM ed WHERE src <> dst),
        |tri AS (
        |  SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
        |  FROM ce e1
        |  JOIN ce e2 ON e2.lo = e1.hi
        |  JOIN ce e3 ON e3.lo = e1.lo AND e3.hi = e2.hi)
        |SELECT node, count(*) AS triangles
        |FROM (SELECT unnest([a, b, c]) AS node FROM tri)
        |GROUP BY node""".stripMargin,

    // q184's quality replay inverted to nonconformity, then the split-
    // conformal chain: md5-bucket calibration split, k = ⌈(n+1)·900/1000⌉,
    // k-th smallest via the score-grid running count, gate on eval rows.
    "q187_conformal_gate" ->
      """WITH toks AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split(lower(text), ' '), t -> t <> '') AS tk
        |  FROM documents),
        |sc AS (
        |  SELECT doc_id,
        |    1000 - cast(floor(round(
        |      least(length(text) / 500.0, 1.0) * 0.4 +
        |      least(len(list_filter(tk, t -> t IN
        |        ('the','a','of','and','to','der','die','das','und',
        |         'le','la','les','et','el','los','y','que')))
        |        / greatest(len(tk), 1.0) * 10.0, 1.0) * 0.3 +
        |      (CASE WHEN len(tk) = 0 THEN 0.0
        |            ELSE len(list_distinct(tk)) / cast(len(tk) as double) END) * 0.3,
        |    6) * 1000) as bigint) AS score
        |  FROM toks),
        |b AS (
        |  SELECT doc_id, score,
        |    ('0x' || substr(md5(cast(doc_id as varchar)), 1, 15))::BIGINT % 100
        |      AS bk
        |  FROM sc),
        |cal AS (SELECT score FROM b WHERE bk < 50 AND score IS NOT NULL),
        |par AS (SELECT count(*) AS n_calib,
        |    ((count(*) + 1) * 900 + 999) // 1000 AS k FROM cal),
        |grid AS (SELECT score AS s, count(*) AS c FROM cal GROUP BY 1),
        |cum AS (SELECT s, sum(c) OVER (ORDER BY s) AS cumc FROM grid),
        |thr AS (SELECT min(s) AS threshold FROM cum, par WHERE cumc >= k)
        |SELECT b.doc_id, cast(b.score as bigint) AS score,
        |  cast(par.n_calib as bigint) AS n_calib,
        |  cast(thr.threshold as bigint) AS threshold,
        |  thr.threshold IS NULL OR b.score <= thr.threshold AS admitted
        |FROM b CROSS JOIN par CROSS JOIN thr
        |WHERE b.bk >= 50 AND b.score IS NOT NULL""".stripMargin,

    // Dominance collapsed to per-x maxima + a strict suffix max over the
    // distinct-x grid: skyline iff y equals its x-group max and strictly
    // beats every larger-x group's max.
    "q188_pareto_skyline" ->
      """WITH toks AS (
        |  SELECT doc_id, text,
        |    len(list_filter(string_split(text, ' '), t -> t <> '')) AS x,
        |    list_filter(string_split(lower(text), ' '), t -> t <> '') AS tk
        |  FROM documents),
        |sc AS (
        |  SELECT doc_id, cast(x as bigint) AS x,
        |    cast(floor(round(
        |      least(length(text) / 500.0, 1.0) * 0.4 +
        |      least(len(list_filter(tk, t -> t IN
        |        ('the','a','of','and','to','der','die','das','und',
        |         'le','la','les','et','el','los','y','que')))
        |        / greatest(len(tk), 1.0) * 10.0, 1.0) * 0.3 +
        |      (CASE WHEN len(tk) = 0 THEN 0.0
        |            ELSE len(list_distinct(tk)) / cast(len(tk) as double) END) * 0.3,
        |    6) * 1000) as bigint) AS y
        |  FROM toks),
        |px AS (SELECT x, max(y) AS my FROM sc GROUP BY 1),
        |sfx AS (
        |  SELECT x, my, max(my) OVER (ORDER BY x DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS sf
        |  FROM px)
        |SELECT sc.doc_id, sc.x, sc.y,
        |  (sc.y = f.my AND (f.sf IS NULL OR sc.y > f.sf)) AS skyline
        |FROM sc JOIN sfx f USING (x)""".stripMargin,

    // Length-prefixed field packing (null ≠ empty), 60-bit md5 digests,
    // commutative folds; the sum reports mod 2^60 through DuckDB's
    // hugeint accumulator exactly as Spark's decimal(38) one.
    "q189_corpus_checksum" ->
      """WITH p AS (
        |  SELECT source,
        |    length(coalesce(cast(doc_id as varchar), ''))::varchar || ':' ||
        |      coalesce(cast(doc_id as varchar), ' ') ||
        |    length(coalesce(text, ''))::varchar || ':' ||
        |      coalesce(text, ' ') ||
        |    length(coalesce(lang, ''))::varchar || ':' ||
        |      coalesce(lang, ' ') ||
        |    length(coalesce(cast(n_chars as varchar), ''))::varchar || ':' ||
        |      coalesce(cast(n_chars as varchar), ' ') AS packed
        |  FROM documents),
        |s AS (SELECT source,
        |    ('0x' || substr(md5(packed), 1, 15))::BIGINT AS sig FROM p)
        |SELECT source AS "group", count(*) AS n_rows,
        |  cast(bit_xor(sig) as bigint) AS xor_sig,
        |  cast(sum(sig) % 1152921504606846976 as bigint) AS sum_sig,
        |  min(sig) AS min_sig, max(sig) AS max_sig
        |FROM s GROUP BY source""".stripMargin,

    // HRW replay: per (doc, shard) md5 weights over generate_series; the
    // argmax (max weight, min shard) under 8 and 9 shards, joined per doc.
    "q190_rendezvous_shards" ->
      """WITH c AS (
        |  SELECT doc_id, s,
        |    ('0x' || substr(md5(cast(doc_id as varchar) || ':' ||
        |      cast(s as varchar)), 1, 15))::BIGINT AS w
        |  FROM documents CROSS JOIN generate_series(0, 8) g(s)),
        |o AS (
        |  SELECT doc_id, s FROM (
        |    SELECT doc_id, s,
        |      row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, s) AS rn
        |    FROM c WHERE s < 8) WHERE rn = 1),
        |n AS (
        |  SELECT doc_id, s FROM (
        |    SELECT doc_id, s,
        |      row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, s) AS rn
        |    FROM c) WHERE rn = 1)
        |SELECT o.doc_id, cast(o.s as int) AS shard_old,
        |  cast(n.s as int) AS shard_new, o.s <> n.s AS moved
        |FROM o JOIN n USING (doc_id)""".stripMargin,

    // q64's closed-form synth replayed at FRAME level: 16-sample frames
    // (final partial included), energy = Σ sample², voiced ≥ 5·10⁸, and
    // voiced-run starts counted via the previous frame's flag.
    "q191_audio_vad" ->
      """WITH p AS (SELECT doc_id, 64 + doc_id % 64 AS n
        |           FROM documents WHERE doc_id < 100),
        |fr AS (
        |  SELECT doc_id, f,
        |    cast(list_sum([
        |      ((doc_id*7919 + i*104729) % 20001 - 10000) *
        |      ((doc_id*7919 + i*104729) % 20001 - 10000)
        |      FOR i IN generate_series(f*16, least(n, (f+1)*16) - 1)])
        |      as bigint) AS e
        |  FROM p CROSS JOIN generate_series(0, 7) g(f)
        |  WHERE f * 16 < n),
        |v AS (
        |  SELECT doc_id, f, e, e >= 500000000 AS voiced,
        |    lag(e >= 500000000, 1, false)
        |      OVER (PARTITION BY doc_id ORDER BY f) AS pv
        |  FROM fr)
        |SELECT doc_id, count(*) AS n_frames,
        |  cast(sum(CASE WHEN voiced THEN 1 ELSE 0 END) as bigint) AS n_voiced,
        |  cast(sum(CASE WHEN voiced AND NOT pv THEN 1 ELSE 0 END) as bigint)
        |    AS n_segments,
        |  cast(coalesce(sum(CASE WHEN voiced THEN e END), 0) as bigint)
        |    AS voiced_energy
        |FROM v GROUP BY doc_id""".stripMargin,

    // Two ignore-null window passes per model over (ts, event_id)-ordered
    // user timelines; cents = round(value·100) exactly as the q127 family.
    "q192_touch_attribution" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS tus, event_id, event_type,
        |    cast(round(value * 100, 0) as bigint) AS cents
        |  FROM events),
        |t AS (
        |  SELECT user_id, event_type, cents,
        |    first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |      IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ft,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |      IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt
        |  FROM ev),
        |conv AS (SELECT * FROM t WHERE event_type = 'purchase'),
        |u AS (
        |  SELECT 'first' AS model, coalesce(ft, '(none)') AS touch_type, cents
        |  FROM conv
        |  UNION ALL
        |  SELECT 'last', coalesce(lt, '(none)'), cents FROM conv)
        |SELECT model, touch_type, count(*) AS n_conversions,
        |  cast(sum(cents) as bigint) AS attributed_cents
        |FROM u GROUP BY model, touch_type""".stripMargin,

    // q175's greedy-CTE discipline for MMR: per round, argmax of the
    // division-free 700·rel − 300·ms score, then ms updates via the q172
    // int8-cosine LATERAL against the single picked vector.
    "q193_mmr_select" -> {
      val rounds = (1 to 5).map { i =>
        val upd = if (i < 5)
          s""",
             |m$i AS (
             |  SELECT a.id, a.qv, a.rel,
             |    greatest(a.ms, cast(floor((CASE WHEN l.na = 0 OR l.nb = 0
             |      THEN 0.0 ELSE l.dot / (sqrt(l.na) * sqrt(l.nb)) END)
             |      * 1000000000.0) as bigint)) AS ms
             |  FROM m${i - 1} a CROSS JOIN s$i s CROSS JOIN LATERAL (
             |    SELECT list_dot_product(cast(a.qv as double[]),
             |             cast(s.qv as double[])) AS dot,
             |           list_dot_product(cast(a.qv as double[]),
             |             cast(a.qv as double[])) AS na,
             |           list_dot_product(cast(s.qv as double[]),
             |             cast(s.qv as double[])) AS nb) l
             |  WHERE a.id <> s.id)""".stripMargin
        else ""
        s"""s$i AS (
           |  SELECT id, qv, rel, ms, 700 * rel - 300 * ms AS score
           |  FROM m${i - 1} ORDER BY score DESC, id LIMIT 1)$upd""".stripMargin
      }.mkString(",\n")
      s"""WITH qz AS (
         |  SELECT vec_id, list_transform(embedding, x -> CASE WHEN maxabs = 0 THEN 0
         |      ELSE cast(floor(cast(x as double) * 127.0 / maxabs) as bigint) END) AS qv
         |  FROM (SELECT vec_id, embedding,
         |          cast(list_max(list_transform(embedding, x -> abs(x))) as double) AS maxabs
         |        FROM embeddings WHERE embedding IS NOT NULL)),
         |qq AS (SELECT qv FROM qz WHERE vec_id = 0),
         |m0 AS (
         |  SELECT z.vec_id AS id, z.qv,
         |    cast(floor((CASE WHEN l.na = 0 OR l.nb = 0 THEN 0.0
         |      ELSE l.dot / (sqrt(l.na) * sqrt(l.nb)) END) * 1000000000.0)
         |      as bigint) AS rel,
         |    cast(-1000000000 as bigint) AS ms
         |  FROM qz z CROSS JOIN qq q CROSS JOIN LATERAL (
         |    SELECT list_dot_product(cast(z.qv as double[]),
         |             cast(q.qv as double[])) AS dot,
         |           list_dot_product(cast(z.qv as double[]),
         |             cast(z.qv as double[])) AS na,
         |           list_dot_product(cast(q.qv as double[]),
         |             cast(q.qv as double[])) AS nb) l
         |  WHERE z.vec_id <> 0),
         |$rounds
         |SELECT cast(round as bigint) AS round, id, rel AS rel_nano,
         |  ms AS maxsim_nano, cast(score as bigint) AS score_pm FROM (
         |  SELECT 1 AS round, id, rel, ms, score FROM s1
         |  UNION ALL SELECT 2, id, rel, ms, score FROM s2
         |  UNION ALL SELECT 3, id, rel, ms, score FROM s3
         |  UNION ALL SELECT 4, id, rel, ms, score FROM s4
         |  UNION ALL SELECT 5, id, rel, ms, score FROM s5)""".stripMargin
    },

    // q186's simple-graph replay extended with per-node degrees and the
    // wedge normalization; floor-div on non-negative integers == div.
    "q194_clustering_coeff" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS tus, event_id,
        |    cast(regexp_extract(props, '"k": (\d+)', 1) as bigint) AS page
        |  FROM events),
        |ed AS (
        |  SELECT src, dst FROM (
        |    SELECT page AS src,
        |      lead(page) OVER (PARTITION BY user_id ORDER BY tus, event_id)
        |        AS dst
        |    FROM ev)
        |  WHERE dst IS NOT NULL),
        |ce AS (
        |  SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
        |  FROM ed WHERE src <> dst),
        |deg AS (
        |  SELECT node, count(*) AS deg FROM (
        |    SELECT lo AS node FROM ce UNION ALL SELECT hi FROM ce)
        |  GROUP BY node),
        |tri AS (
        |  SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
        |  FROM ce e1
        |  JOIN ce e2 ON e2.lo = e1.hi
        |  JOIN ce e3 ON e3.lo = e1.lo AND e3.hi = e2.hi),
        |tc AS (
        |  SELECT node, count(*) AS t
        |  FROM (SELECT unnest([a, b, c]) AS node FROM tri)
        |  GROUP BY node)
        |SELECT d.node, cast(d.deg as bigint) AS deg,
        |  cast((d.deg * (d.deg - 1)) // 2 as bigint) AS wedges,
        |  cast(coalesce(tc.t, 0) as bigint) AS triangles,
        |  cast(CASE WHEN d.deg >= 2
        |    THEN (1000000000 * 2 * coalesce(tc.t, 0)) // (d.deg * (d.deg - 1))
        |    ELSE 0 END as bigint) AS coeff_nano
        |FROM deg d LEFT JOIN tc ON tc.node = d.node""".stripMargin,

    // Lower medians ((n+1)//2-th smallest, ties by id) for value and
    // absolute deviation, then the strict k·mad gate.
    "q195_mad_outliers" ->
      """WITH v AS (
        |  SELECT doc_id, source AS "group",
        |    cast(len(list_filter(string_split(text, ' '), t -> t <> ''))
        |      as bigint) AS value
        |  FROM documents),
        |r AS (
        |  SELECT *, row_number() OVER (
        |      PARTITION BY "group" ORDER BY value, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY "group") AS n
        |  FROM v),
        |med AS (SELECT "group", value AS med FROM r WHERE rn = (n + 1) // 2),
        |d AS (
        |  SELECT v.doc_id, v."group", v.value, m.med,
        |    abs(v.value - m.med) AS dev
        |  FROM v JOIN med m USING ("group")),
        |r2 AS (
        |  SELECT *, row_number() OVER (
        |      PARTITION BY "group" ORDER BY dev, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY "group") AS n
        |  FROM d),
        |mad AS (SELECT "group", dev AS mad FROM r2 WHERE rn = (n + 1) // 2)
        |SELECT d.doc_id, d."group", d.value, d.med AS median, mad.mad,
        |  d.dev > 3 * mad.mad AS outlier
        |FROM d JOIN mad USING ("group")""".stripMargin,

    // q187's conformal chain with the stream's output contract: admitted
    // eval rows only, batch structure irrelevant (stateless gate).
    "q196_stream_conformal" ->
      """WITH toks AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split(lower(text), ' '), t -> t <> '') AS tk
        |  FROM documents),
        |sc AS (
        |  SELECT doc_id,
        |    1000 - cast(floor(round(
        |      least(length(text) / 500.0, 1.0) * 0.4 +
        |      least(len(list_filter(tk, t -> t IN
        |        ('the','a','of','and','to','der','die','das','und',
        |         'le','la','les','et','el','los','y','que')))
        |        / greatest(len(tk), 1.0) * 10.0, 1.0) * 0.3 +
        |      (CASE WHEN len(tk) = 0 THEN 0.0
        |            ELSE len(list_distinct(tk)) / cast(len(tk) as double) END) * 0.3,
        |    6) * 1000) as bigint) AS score
        |  FROM toks),
        |b AS (
        |  SELECT doc_id, score,
        |    ('0x' || substr(md5(cast(doc_id as varchar)), 1, 15))::BIGINT % 100
        |      AS bk
        |  FROM sc),
        |cal AS (SELECT score FROM b WHERE bk < 50 AND score IS NOT NULL),
        |par AS (SELECT count(*) AS n_calib,
        |    ((count(*) + 1) * 900 + 999) // 1000 AS k FROM cal),
        |grid AS (SELECT score AS s, count(*) AS c FROM cal GROUP BY 1),
        |cum AS (SELECT s, sum(c) OVER (ORDER BY s) AS cumc FROM grid),
        |thr AS (SELECT min(s) AS threshold FROM cum, par WHERE cumc >= k)
        |SELECT b.doc_id, cast(b.score as bigint) AS score,
        |  cast(par.n_calib as bigint) AS n_calib,
        |  cast(thr.threshold as bigint) AS threshold
        |FROM b CROSS JOIN par CROSS JOIN thr
        |WHERE b.bk >= 50 AND b.score IS NOT NULL
        |  AND (thr.threshold IS NULL OR b.score <= thr.threshold)""".stripMargin,

    // Two leads in the q106 timeline windows; top-20 cut on the total
    // order (n desc, then the path itself).
    "q197_path_trigrams" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS tus, event_id,
        |    cast(regexp_extract(props, '"k": (\d+)', 1) as bigint) AS page
        |  FROM events),
        |w AS (
        |  SELECT page AS p1,
        |    lead(page, 1) OVER (PARTITION BY user_id ORDER BY tus, event_id)
        |      AS p2,
        |    lead(page, 2) OVER (PARTITION BY user_id ORDER BY tus, event_id)
        |      AS p3
        |  FROM ev),
        |c AS (SELECT p1, p2, p3, count(*) AS n FROM w
        |      WHERE p3 IS NOT NULL GROUP BY 1, 2, 3),
        |r AS (SELECT *, row_number() OVER (ORDER BY n DESC, p1, p2, p3) AS rn
        |      FROM c)
        |SELECT p1, p2, p3, n FROM r WHERE rn <= 20""".stripMargin,

    // Adjacent-in-(value,id)-sort candidates via two ignore-null windows;
    // exact ties pick the at-or-before candidate.
    "q198_matched_controls" ->
      """WITH v AS (
        |  SELECT doc_id AS id, source AS "group",
        |    cast(len(list_filter(string_split(text, ' '), t -> t <> ''))
        |      as bigint) AS value,
        |    lang = 'en' AS treated
        |  FROM documents),
        |w AS (
        |  SELECT *,
        |    last_value(CASE WHEN NOT treated
        |        THEN struct_pack(value := value, id := id) END IGNORE NULLS)
        |      OVER (PARTITION BY "group" ORDER BY value, id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev,
        |    first_value(CASE WHEN NOT treated
        |        THEN struct_pack(value := value, id := id) END IGNORE NULLS)
        |      OVER (PARTITION BY "group" ORDER BY value, id
        |        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nxt
        |  FROM v),
        |p AS (
        |  SELECT *,
        |    nxt IS NULL OR (prev IS NOT NULL AND
        |      (value - prev.value) <= (nxt.value - value)) AS pick_prev
        |  FROM w WHERE treated)
        |SELECT id, "group", value,
        |  CASE WHEN pick_prev THEN prev.id ELSE nxt.id END AS match_id,
        |  CASE WHEN pick_prev THEN prev.value ELSE nxt.value END
        |    AS match_value,
        |  abs(value - CASE WHEN pick_prev THEN prev.value ELSE nxt.value END)
        |    AS abs_diff
        |FROM p""".stripMargin,

    // q156's BM25 replay ×3 query sets (generated CTE chains), binary
    // any-term qrels, MRR/recall in integer arithmetic.
    "q199_retrieval_metrics" -> {
      val qs = Seq(1 -> Seq("spark", "window", "merge"),
        2 -> Seq("table", "scan"), 3 -> Seq("slow", "fast", "key"))
      def lst(ts: Seq[String]) = ts.map(t => s"'$t'").mkString(", ")
      val chains = qs.map { case (qid, ts) =>
        s"""d$qid AS (
           |  SELECT doc_id, dl, list_filter(toks, x -> x IN (${lst(ts)}))
           |    AS qt FROM t0),
           |g$qid AS (SELECT doc_id, dl, unnest(qt) AS term FROM d$qid),
           |tf$qid AS (
           |  SELECT doc_id, dl, term, count(*) AS tf FROM g$qid
           |  GROUP BY 1, 2, 3),
           |wdf$qid AS (
           |  SELECT tf$qid.*, count(*) OVER (PARTITION BY term) AS df
           |  FROM tf$qid),
           |sc$qid AS (
           |  SELECT doc_id, cast(round(
           |      ln(1.0 + ((n_docs - df) + 0.5) / (df + 0.5)) *
           |      ((tf * (1.2 + 1.0)) /
           |       (tf + 1.2 * (1.0 - 0.75 +
           |          0.75 * dl / (cast(sum_dl as double) / n_docs)))) *
           |      1e9) as bigint) AS qs
           |  FROM wdf$qid CROSS JOIN stats),
           |lx$qid AS (
           |  SELECT doc_id, round(cast(sum(qs) as double) / 1e9, 6) AS score
           |  FROM sc$qid GROUP BY doc_id ORDER BY score DESC, doc_id
           |  LIMIT 10),
           |rk$qid AS (
           |  SELECT $qid AS query_id, doc_id,
           |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank
           |  FROM lx$qid),
           |qr$qid AS (
           |  SELECT $qid AS query_id, doc_id FROM t0
           |  WHERE len(list_filter(toks, x -> x IN (${lst(ts)}))) > 0)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH t0 AS (
         |  SELECT doc_id,
         |    list_filter(string_split(lower(text), ' '), x -> x <> '')
         |      AS toks,
         |    cast(len(list_filter(string_split(lower(text), ' '),
         |      x -> x <> '')) as bigint) AS dl
         |  FROM documents),
         |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM t0),
         |$chains,
         |res AS (SELECT * FROM rk1 UNION ALL SELECT * FROM rk2
         |        UNION ALL SELECT * FROM rk3),
         |qr AS (SELECT * FROM qr1 UNION ALL SELECT * FROM qr2
         |       UNION ALL SELECT * FROM qr3),
         |nrel AS (SELECT query_id, count(*) AS n_rel FROM qr GROUP BY 1),
         |hits AS (
         |  SELECT r.query_id, min(r.rank) AS frr,
         |    sum(CASE WHEN r.rank <= 10 THEN 1 ELSE 0 END) AS h
         |  FROM res r JOIN qr q
         |    ON q.query_id = r.query_id AND q.doc_id = r.doc_id
         |  GROUP BY 1)
         |SELECT n.query_id, n.n_rel,
         |  cast(h.frr as bigint) AS first_rel_rank,
         |  cast(coalesce(1000000000 // h.frr, 0) as bigint) AS rr_nano,
         |  cast(coalesce(h.h, 0) as bigint) AS hits_at_k,
         |  cast((1000 * coalesce(h.h, 0)) // n.n_rel as bigint)
         |    AS recall_permille
         |FROM nrel n LEFT JOIN hits h USING (query_id)""".stripMargin
    },

    // q184's quality replay, (group, score)-grid counts, doubled midranks:
    // S2 = Σ p(2(cum+1)+c−1), U2 = S2 − n⁺(n⁺+1), auc = 1e9·U2 // (2n⁺n⁻).
    "q200_auc_report" ->
      """WITH toks AS (
        |  SELECT doc_id, source, n_chars, text,
        |    list_filter(string_split(lower(text), ' '), t -> t <> '') AS tk
        |  FROM documents),
        |sc AS (
        |  SELECT source, n_chars > 300 AS label,
        |    cast(floor(round(
        |      least(length(text) / 500.0, 1.0) * 0.4 +
        |      least(len(list_filter(tk, t -> t IN
        |        ('the','a','of','and','to','der','die','das','und',
        |         'le','la','les','et','el','los','y','que')))
        |        / greatest(len(tk), 1.0) * 10.0, 1.0) * 0.3 +
        |      (CASE WHEN len(tk) = 0 THEN 0.0
        |            ELSE len(list_distinct(tk)) / cast(len(tk) as double) END) * 0.3,
        |    6) * 1000) as bigint) AS s
        |  FROM toks),
        |grid AS (
        |  SELECT source AS "group", s, count(*) AS c,
        |    sum(CASE WHEN label THEN 1 ELSE 0 END) AS p
        |  FROM sc GROUP BY 1, 2),
        |w AS (
        |  SELECT *, coalesce(sum(c) OVER (PARTITION BY "group" ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |  FROM grid),
        |r AS (
        |  SELECT "group", cast(sum(p) as bigint) AS n_pos,
        |    cast(sum(c) - sum(p) as bigint) AS n_neg,
        |    cast(sum(p * (2 * (cb + 1) + c - 1)) - sum(p) * (sum(p) + 1)
        |      as bigint) AS u2
        |  FROM w GROUP BY 1)
        |SELECT "group", n_pos, n_neg, u2,
        |  cast(CASE WHEN n_pos > 0 AND n_neg > 0
        |    THEN (1000000000 * u2) // (2 * n_pos * n_neg) END as bigint)
        |    AS auc_nano
        |FROM r""".stripMargin,

    // q126's per-step min-time chain with the step-1 anchor bound riding
    // each per-user row; micros arithmetic.
    "q201_funnel_window" ->
      """WITH e AS (
        |  SELECT user_id AS u, event_type AS t, epoch_ns(ts) // 1000 AS ts
        |  FROM events),
        |s1 AS (SELECT u, min(ts) AS st FROM e WHERE t = 'view' GROUP BY u),
        |s2 AS (
        |  SELECT e.u, min(e.ts) AS st FROM e
        |  JOIN s1 ON s1.u = e.u
        |  WHERE e.t = 'click' AND e.ts > s1.st
        |    AND e.ts <= s1.st + 86400000000
        |  GROUP BY e.u),
        |s3 AS (
        |  SELECT e.u, min(e.ts) AS st FROM e
        |  JOIN s2 ON s2.u = e.u JOIN s1 ON s1.u = e.u
        |  WHERE e.t = 'purchase' AND e.ts > s2.st
        |    AND e.ts <= s1.st + 86400000000
        |  GROUP BY e.u)
        |SELECT cast(1 as bigint) AS step, 'view' AS step_name,
        |  count(*) AS n_users FROM s1
        |UNION ALL SELECT 2, 'click', count(*) FROM s2
        |UNION ALL SELECT 3, 'purchase', count(*) FROM s3""".stripMargin,

    // The GVID synth formula diffed between adjacent frames in closed
    // form: per pixel |((b+17) mod 256) − (b mod 256)| — 17 or 239.
    "q202_video_cuts" ->
      """WITH p AS (
        |  SELECT doc_id, 8 + doc_id % 5 AS w, 8 + doc_id % 3 AS h,
        |    3 + doc_id % 4 AS nf
        |  FROM documents WHERE doc_id < 100),
        |fr AS (
        |  SELECT doc_id, w, h, f FROM p
        |  CROSS JOIN generate_series(1, 6) g(f) WHERE f < nf),
        |d AS (
        |  SELECT doc_id, f,
        |    cast(list_sum([
        |      abs((doc_id*31 + f*17 + (j % w)*7 + (j // w)*13) % 256
        |        - (doc_id*31 + (f-1)*17 + (j % w)*7 + (j // w)*13) % 256)
        |      FOR j IN generate_series(0, w*h - 1)]) as bigint) AS diff_sum
        |  FROM fr)
        |SELECT doc_id, cast(f as bigint) AS frame, diff_sum,
        |  diff_sum >= 2500 AS is_cut
        |FROM d""".stripMargin,

    // Round-robin on the (weight desc, id) total order; per-shard rollup.
    "q203_balanced_shards" ->
      """WITH v AS (
        |  SELECT doc_id,
        |    cast(len(list_filter(string_split(text, ' '), t -> t <> ''))
        |      as bigint) AS w
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, w,
        |    row_number() OVER (ORDER BY w DESC, doc_id) AS rn
        |  FROM v)
        |SELECT cast((rn - 1) % 8 as bigint) AS shard, count(*) AS n_rows,
        |  cast(sum(w) as bigint) AS load,
        |  cast(max(w) as bigint) AS max_row_weight
        |FROM r GROUP BY 1""".stripMargin,

    // Incremental merge ≡ from-scratch clustering of the full prefix-fp
    // pair set (the assignment edges preserve old connectivity); q72's
    // recursive-CTE CC replay.
    "q204_cluster_merge" ->
      """WITH RECURSIVE fp AS (
        |  SELECT doc_id, md5(substr(text, 1, 40)) AS fp FROM documents),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
        |labels AS (
        |  SELECT src AS id, least(src, min(dst)) AS rep
        |  FROM reach GROUP BY src),
        |csize AS (SELECT rep, count(*) AS cluster_size FROM labels GROUP BY rep)
        |SELECT l.id, l.rep, c.cluster_size
        |FROM labels l JOIN csize c USING (rep)""".stripMargin,

    // Per-type day counts zero-filled onto a DENSE grid (type's first day
    // .. global last day — gap days contribute the full −S deviation);
    // P = cumsum(n·x − S), cusum = P − min(0, run-min P); alarm past
    // meanDays·S in the same ×n units.
    "q205_cusum_alarms" ->
      """WITH o AS (
        |  SELECT event_type, cast(ts as date) AS day, count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |sp AS (SELECT event_type, min(day) AS d0 FROM o GROUP BY 1),
        |g AS (SELECT max(day) AS d1 FROM o),
        |grid AS (
        |  SELECT sp.event_type,
        |    cast(unnest(generate_series(cast(sp.d0 as timestamp),
        |      cast(g.d1 as timestamp), INTERVAL 1 DAY)) as date) AS day
        |  FROM sp CROSS JOIN g),
        |d AS (
        |  SELECT grid.event_type, grid.day, coalesce(o.x, 0) AS x
        |  FROM grid LEFT JOIN o USING (event_type, day)),
        |st AS (SELECT event_type, count(*) AS n, sum(x) AS s FROM d
        |       GROUP BY 1),
        |p AS (
        |  SELECT d.event_type, d.day, d.x, st.s,
        |    sum(st.n * d.x - st.s) OVER (PARTITION BY d.event_type
        |      ORDER BY d.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS pp
        |  FROM d JOIN st USING (event_type)),
        |m AS (
        |  SELECT *, min(least(pp, 0)) OVER (PARTITION BY event_type
        |    ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS mm
        |  FROM p)
        |SELECT event_type, day, cast(x as bigint) AS n_events,
        |  cast(pp - mm as bigint) AS cusum_scaled,
        |  pp - mm > 3 * s AS alarm
        |FROM m""".stripMargin,

    // Per-stratum (md5, id) rank mod k.
    "q206_stratified_folds" ->
      """WITH r AS (
        |  SELECT doc_id, lang AS stratum,
        |    row_number() OVER (PARTITION BY lang ORDER BY
        |      ('0x' || substr(md5(cast(doc_id as varchar)), 1, 15))::BIGINT,
        |      doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, stratum, cast((rn - 1) % 5 as bigint) AS fold
        |FROM r""".stripMargin,

    // First-5-token prefixes, 60-bit md5 group keys, (n−1)·len savings.
    "q207_prefix_cache" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> t <> '')[1:5] AS pre
        |  FROM documents WHERE text IS NOT NULL),
        |h AS (
        |  SELECT ('0x' || substr(md5(array_to_string(pre, ' ')), 1, 15))::BIGINT
        |      AS prefix_hash,
        |    cast(len(pre) as bigint) AS prefix_tokens
        |  FROM p),
        |g AS (
        |  SELECT prefix_hash, prefix_tokens, count(*) AS n_docs
        |  FROM h GROUP BY 1, 2)
        |SELECT prefix_hash, prefix_tokens, n_docs,
        |  cast((n_docs - 1) * prefix_tokens as bigint) AS tokens_saved
        |FROM g WHERE n_docs > 1""".stripMargin,

    // q37's register replay per day, fanned to the 7 window-ends each day
    // covers, merged by register-wise max, estimated with the same C.
    "q208_rolling_distinct" ->
      s"""WITH h AS (
        |  SELECT cast(ts as date) AS day,
        |    ('0x' || substr(md5(cast(user_id as varchar)), 1, 15))::BIGINT
        |      AS h
        |  FROM events),
        |r AS (
        |  SELECT day, h % 4096 AS bucket,
        |    least(CASE WHEN h // 4096 = 0 THEN 49
        |               ELSE 49 - length(bin(h // 4096)) END, 40) AS rho
        |  FROM h),
        |b AS (
        |  SELECT day, bucket, max(rho) AS m, count(*) AS cnt
        |  FROM r GROUP BY 1, 2),
        |f AS (
        |  SELECT b.bucket, b.m, b.cnt, b.day + cast(i as integer) AS wend
        |  FROM b CROSS JOIN generate_series(0, 6) g(i)),
        |days AS (SELECT DISTINCT day AS wend FROM b),
        |mg AS (
        |  SELECT wend, bucket, max(m) AS m, sum(cnt) AS cnt
        |  FROM f JOIN days USING (wend) GROUP BY 1, 2),
        |agg AS (
        |  SELECT wend, count(*) AS nb,
        |    CAST(sum(1::BIGINT << (40 - m)) AS BIGINT) AS sp,
        |    CAST(sum(cnt) AS BIGINT) AS n_events
        |  FROM mg GROUP BY 1),
        |est AS (
        |  SELECT *, CAST(floor(${SparkEntry.Hll.C} /
        |    (sp + (4096 - nb) * 1099511627776)) AS BIGINT) AS raw
        |  FROM agg)
        |SELECT wend AS day,
        |  CASE WHEN nb < 4096 AND raw <= 10240
        |    THEN (4096 * CAST(round(ln(4096.0 / (4096 - nb)) * 1e9)
        |      AS BIGINT)) // 1000000000
        |    ELSE raw END AS approx_distinct,
        |  n_events
        |FROM est""".stripMargin,

    // Two count tables joined on the key; exact products, 1-row total.
    "q209_join_preflight" ->
      """WITH c AS (
        |  SELECT cast(user_id as varchar) AS key, count(*) AS n
        |  FROM events GROUP BY 1),
        |p AS (
        |  SELECT a.key, a.n AS n_left, b.n AS n_right, a.n * b.n AS out_rows
        |  FROM c a JOIN c b USING (key)),
        |t AS (SELECT sum(out_rows) AS total_out FROM p),
        |r AS (
        |  SELECT p.*, t.total_out,
        |    row_number() OVER (ORDER BY out_rows DESC, key) AS rn
        |  FROM p CROSS JOIN t)
        |SELECT key, n_left, n_right, cast(out_rows as bigint) AS out_rows,
        |  cast(total_out as bigint) AS total_out,
        |  cast((1000 * out_rows) // total_out as bigint) AS permille
        |FROM r WHERE rn <= 10""".stripMargin,

    // iters=0 seeds = first 8 vectors by (md5, id); assignment = argmax
    // cosine vs each seed (first max on ties = smallest cell); all 8
    // cells reported, zero-filled.
    "q210_ivf_health" ->
      """WITH e AS (
        |  SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings
        |  WHERE embedding IS NOT NULL),
        |al AS (
        |  SELECT vec_id, cast(embedding as double[]) AS v,
        |    ('0x' || substr(md5(cast(vec_id as varchar)), 1, 15))::BIGINT
        |      AS h
        |  FROM embeddings),
        |seeds AS (
        |  SELECT cast(row_number() OVER (ORDER BY h, vec_id) - 1 as int)
        |      AS cell, v AS c
        |  FROM al ORDER BY h, vec_id LIMIT 8),
        |asgn AS (
        |  SELECT e.vec_id, s.cell,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      (CASE WHEN l.na = 0 OR l.nb = 0 THEN 0.0
        |            ELSE l.dot / (sqrt(l.na) * sqrt(l.nb)) END) DESC,
        |      s.cell) AS rn
        |  FROM e CROSS JOIN seeds s CROSS JOIN LATERAL (
        |    SELECT list_dot_product(e.v, s.c) AS dot,
        |           list_dot_product(e.v, e.v) AS na,
        |           list_dot_product(s.c, s.c) AS nb) l),
        |cnt AS (SELECT cell, count(*) AS n FROM asgn WHERE rn = 1
        |        GROUP BY 1),
        |cells AS (SELECT cast(i as int) AS cell
        |          FROM generate_series(0, 7) t(i)),
        |tot AS (SELECT cast(coalesce(sum(n), 0) as bigint) AS t FROM cnt)
        |SELECT cells.cell, cast(coalesce(cnt.n, 0) as bigint) AS n_vectors,
        |  cast(CASE WHEN t > 0 THEN (1000 * coalesce(cnt.n, 0)) // t
        |       ELSE 0 END as bigint) AS permille
        |FROM cells LEFT JOIN cnt USING (cell) CROSS JOIN tot""".stripMargin,

    // q30's closed-form synth dims (w = 8+id%9, h = 8+id%7) × token count
    // × cross-multiplied aspect bound.
    "q211_caption_gate" ->
      """WITH d AS (
        |  SELECT doc_id, cast(8 + doc_id % 9 as int) AS width,
        |    cast(8 + doc_id % 7 as int) AS height,
        |    cast(len(list_filter(string_split(text, ' '), t -> t <> ''))
        |      as bigint) AS n_tokens
        |  FROM documents WHERE doc_id < 200)
        |SELECT doc_id, width, height, n_tokens,
        |  (n_tokens BETWEEN 5 AND 100 AND width <= height * 2
        |    AND height <= width * 2) AS keep
        |FROM d""".stripMargin,

    // q204's recursive CC + the per-rep provenance rollup with a
    // canonically sorted source list.
    "q212_cluster_provenance" ->
      """WITH RECURSIVE fp AS (
        |  SELECT doc_id, md5(substr(text, 1, 40)) AS fp FROM documents),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
        |labels AS (
        |  SELECT src AS id, least(src, min(dst)) AS rep
        |  FROM reach GROUP BY src)
        |SELECT l.rep, count(*) AS n_docs,
        |  cast(count(DISTINCT d.source) as bigint) AS n_attrs,
        |  array_to_string(list_sort(list(DISTINCT d.source)), ',') AS attrs
        |FROM labels l JOIN documents d ON d.doc_id = l.id
        |GROUP BY l.rep""".stripMargin,

    // q198's window replay with the single global population (no
    // PARTITION BY) and the same tie rule.
    "q213_matched_global" ->
      """WITH v AS (
        |  SELECT doc_id AS id,
        |    cast(len(list_filter(string_split(text, ' '), t -> t <> ''))
        |      as bigint) AS value,
        |    lang = 'en' AS treated
        |  FROM documents),
        |w AS (
        |  SELECT *,
        |    last_value(CASE WHEN NOT treated
        |        THEN struct_pack(value := value, id := id) END IGNORE NULLS)
        |      OVER (ORDER BY value, id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev,
        |    first_value(CASE WHEN NOT treated
        |        THEN struct_pack(value := value, id := id) END IGNORE NULLS)
        |      OVER (ORDER BY value, id
        |        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nxt
        |  FROM v),
        |p AS (
        |  SELECT *,
        |    nxt IS NULL OR (prev IS NOT NULL AND
        |      (value - prev.value) <= (nxt.value - value)) AS pick_prev
        |  FROM w WHERE treated)
        |SELECT id, value,
        |  CASE WHEN pick_prev THEN prev.id ELSE nxt.id END AS match_id,
        |  CASE WHEN pick_prev THEN prev.value ELSE nxt.value END
        |    AS match_value,
        |  abs(value - CASE WHEN pick_prev THEN prev.value ELSE nxt.value END)
        |    AS abs_diff
        |FROM p""".stripMargin,

    // q204's CC + keep-first drops (non-representatives) rolled up per
    // source with exact token costs.
    "q214_dedup_impact" ->
      """WITH RECURSIVE fp AS (
        |  SELECT doc_id, md5(substr(text, 1, 40)) AS fp FROM documents),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
        |labels AS (
        |  SELECT src AS id, least(src, min(dst)) AS rep
        |  FROM reach GROUP BY src),
        |drops AS (SELECT id FROM labels WHERE id <> rep),
        |d AS (
        |  SELECT doc_id, source,
        |    cast(len(list_filter(string_split(text, ' '), t -> t <> ''))
        |      as bigint) AS t,
        |    doc_id IN (SELECT id FROM drops) AS dropped
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  cast(sum(CASE WHEN dropped THEN 1 ELSE 0 END) as bigint)
        |    AS n_dropped,
        |  cast(coalesce(sum(CASE WHEN dropped THEN t END), 0) as bigint)
        |    AS tokens_dropped,
        |  cast(sum(t) as bigint) AS tokens_total,
        |  cast((1000 * coalesce(sum(CASE WHEN dropped THEN t END), 0))
        |    // sum(t) as bigint) AS drop_permille
        |FROM d GROUP BY source""".stripMargin
  )
}
