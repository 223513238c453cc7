package graft

import org.apache.spark.sql.functions._
import graft.ops.EventOps

/** Event-sequence analytics: ordered funnels + retention cohorts. */
class EventOpsSpec extends SparkSpec {
  _quiet
  import spark.implicits._

  test("funnel: steps chain strictly-after; out-of-order events don't count") {
    val ev = Seq(
      (1L, "view", 1L), (1L, "click", 2L), (1L, "purchase", 3L), // completes
      (2L, "click", 1L), (2L, "view", 2L), (2L, "purchase", 3L), // click BEFORE view: stops at view
      (3L, "view", 1L), (3L, "click", 2L),                       // no purchase
      (4L, "purchase", 1L))                                      // never viewed
      .toDF("u", "t", "ts")
    val out = EventOps.funnel(ev, "u", "t", "ts",
        Seq("view", "click", "purchase"))
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, "view", 3L), (2L, "click", 2L), (3L, "purchase", 1L)))
    // same-timestamp events do NOT chain (strictly after)
    val tie = Seq((1L, "view", 5L), (1L, "click", 5L)).toDF("u", "t", "ts")
    val t2 = EventOps.funnel(tie, "u", "t", "ts", Seq("view", "click"))
      .orderBy("step").collect().map(_.getLong(2))
    assert(t2.toSeq == Seq(1L, 0L))
  }

  test("retentionCohorts: first-day cohorts, multiple same-day events count once") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 11:00:00"), // day 0 twice
      (1L, "2024-01-03 09:00:00"),                              // offset 2
      (2L, "2024-01-02 08:00:00"))                              // own cohort
      .toDF("u", "s")
      .select(col("u"), col("s").cast("timestamp").as("ts"))
    val out = EventOps.retentionCohorts(ev, "u", "ts")
      .orderBy("cohort_day", "day_offset").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 2L, 1L), ("2024-01-02", 0L, 1L)))
  }

  test("asOfBackward: latest at-or-before within tolerance; stale and " +
      "missing matches null value AND age together") {
    val left = Seq((1L, 100L, "e1"), (1L, 205L, "e2"), (1L, 50L, "e0"),
        (2L, 100L, "e3"))
      .toDF("k", "lt", "ev")
    val right = Seq((1L, 90L, "a"), (1L, 100L, "b"), (1L, 110L, "c"))
      .toDF("k", "rt", "v")
    val out = graft.ops.Joins.asOfBackward(left, right, "k", "lt", "rt",
        Seq("v"), toleranceUs = 100L)
      .collect().map(r => (r.getString(2),
        Option(r.getString(3)), if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .sortBy(_._1).toSeq
    assert(out == Seq(
      ("e0", None, None),              // nothing at or before t=50
      ("e1", Some("b"), Some(0L)),     // inclusive tie: value stamped 100
      ("e2", Some("c"), Some(95L)),    // latest is 110, within 100
      ("e3", None, None)))             // key 2 has no features at all
    // tolerance boundary: age exactly == tolerance is fresh, +1 is stale
    val edge = Seq((1L, 210L, "x"), (1L, 211L, "y")).toDF("k", "lt", "ev")
    val e2 = graft.ops.Joins.asOfBackward(edge, right, "k", "lt", "rt",
        Seq("v"), toleranceUs = 100L)
      .collect().map(r => (r.getString(2), Option(r.getString(3))))
      .sortBy(_._1).toSeq
    assert(e2 == Seq(("x", Some("c")), ("y", None)))
  }

  test("fuzzyNamePairs: dictionary collapse, blocking bounds candidates, " +
      "levenshtein verifies, entity counts multiply back") {
    val df = Seq((1L, "red widget"), (2L, "red widget"), (3L, "red widget"),
        (4L, "red widgot"), (5L, "red widgot"), (6L, "red bolt"),
        (7L, "blue bolt"))
      .toDF("id", "name")
    val firstTok = split(col("name"), " ").getItem(0)
    val out = graft.ops.Joins.fuzzyNamePairs(df, "id", "name", firstTok,
        maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    // only widget/widgot survives the verify; counts collapse 5 entities
    // into one name pair with 3 x 2 implied entity pairs
    assert(out == Set(("red widget", "red widgot", 1, 3L, 2L, 6L)))
    // blocking: "red bolt" vs "blue bolt" is dist 3 but never a candidate
    // (different first token), even when maxDist would admit it
    val out3 = graft.ops.Joins.fuzzyNamePairs(df, "id", "name", firstTok,
        maxDist = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(!out3.contains(("blue bolt", "red bolt")))
    assert(out3.contains(("red widget", "red widgot")))
  }

  test("frequentPairs: basket-distinct counting, support floor, exact " +
      "nano lift; within-basket repeats count once") {
    val df = Seq((1L, "x"), (1L, "y"), (1L, "z"), (1L, "x"), // repeat x
      (2L, "x"), (2L, "y"), (3L, "x")).toDF("b", "it")
    val out = graft.ops.EventOps.frequentPairs(df, "b", "it",
        minSupport = 2, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    // only (x,y) reaches support 2; lift = 2·3/(3·2) = 1.0 → 1e9 nano
    assert(out == Seq(("x", "y", 2L, 1000000000L)), s"got $out")
    // support floor 1 admits the singles with their exact lifts
    val all = graft.ops.EventOps.frequentPairs(df, "b", "it", 1, 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(all == Set(("x", "y", 2L), ("x", "z", 1L), ("y", "z", 1L)))
  }

  test("volumeAnomalies: integer cross-multiplied sigma test flags the " +
      "planted spike; normal days pass with signed direction") {
    // 9 quiet days of 10 events + 1 spike day of 100
    val rows = (1 to 9).flatMap(d =>
      (1 to 10).map(i => (s"2024-01-0$d 00:0${i % 6}:00"))) ++
      (1 to 100).map(i => s"2024-01-10 00:${i % 60}:00")
    val ev = rows.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("event_id", "t")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")
    val out = graft.ops.EventOps.volumeAnomalies(ev, "ts", sigmaK = 2)
      .collect().map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getInt(2), r.getBoolean(3)))).toMap
    // n=10, sx=190, sxx=10900: spike dev=810, 810^2=656100 >
    // 4*(109000-36100)=291600 → anomaly; quiet dev=-90, 8100 < 291600
    assert(out("2024-01-10") == ((100L, 1, true)))
    (1 to 9).foreach { d =>
      assert(out(s"2024-01-0$d") == ((10L, -1, false)), s"day $d")
    }
    // a perfectly flat series flags nothing, direction 0 everywhere
    val flat = (1 to 3).flatMap(d => (1 to 5).map(i =>
        (d * 10L + i, s"2024-02-0$d 00:0$i:00")))
      .toDF("event_id", "t")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")
    val f = graft.ops.EventOps.volumeAnomalies(flat, "ts").collect()
    assert(f.forall(r => r.getInt(2) == 0 && !r.getBoolean(3)))
  }

  test("userSequences: strict (ts, tie) order, truncation flag, fingerprint " +
      "matches a driver-side md5 of the ordered types") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ev = Seq(
      // user 1 arrives out of order; (ts, event_id) restores view→click→buy
      (1L, "2024-01-01 00:02:00", 3L, "buy"),
      (1L, "2024-01-01 00:00:00", 1L, "view"),
      (1L, "2024-01-01 00:01:00", 2L, "click"),
      // user 2: same ts — event_id breaks the tie deterministically
      (2L, "2024-01-01 00:00:00", 5L, "b"),
      (2L, "2024-01-01 00:00:00", 4L, "a"),
      (2L, "2024-01-01 00:00:00", 6L, "c"))
      .toDF("user_id", "t", "event_id", "event_type")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")
    val out = graft.ops.EventOps.userSequences(ev, "user_id", "ts",
        "event_id", "event_type", maxLen = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getBoolean(5)))).toMap
    // maxLen 2: both sequences truncate to their first two events
    assert(out(1L) == ((3L, md5hex("view click"), true)))
    assert(out(2L) == ((3L, md5hex("a b"), true)))
    // untruncated run keeps the full ordered sequence
    val full = graft.ops.EventOps.userSequences(ev, "user_id", "ts",
        "event_id", "event_type", maxLen = 32)
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getBoolean(5))))
      .toMap
    assert(full(1L) == ((md5hex("view click buy"), false)))
    assert(full(2L) == ((md5hex("a b c"), false)))
  }

  test("latenessAudit: high-water lateness in log2 buckets with exact " +
      "cumulative permilles; monotone feed is all bucket 0") {
    import spark.implicits._
    // arrival order 1..5; event-time micros: two events arrive 50 us late
    val ev = Seq((1L, 100L), (2L, 50L), (3L, 200L), (4L, 150L), (5L, 200L))
      .toDF("arr", "us").withColumn("ts", expr("timestamp_micros(us)"))
    val out = graft.ops.EventOps.latenessAudit(ev, "ts", Seq(col("arr")))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    // lateness 50 has bit length 6 -> bucket [32, 63]
    assert(out(0) == ((3L, 0L, 0L, 600L)), s"on-time row: $out")
    assert(out(6) == ((2L, 32L, 63L, 1000L)), s"late bucket: $out")
    assert(out.size == 2)
    // monotone arrival: everything lands in bucket 0 at permille 1000
    val mono = Seq((1L, 10L), (2L, 20L), (3L, 30L))
      .toDF("arr", "us").withColumn("ts", expr("timestamp_micros(us)"))
    val m = graft.ops.EventOps.latenessAudit(mono, "ts", Seq(col("arr")))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(4)))
    assert(m.toSeq == Seq((0, 3L, 1000L)))
  }

  test("touchAttribution: first/last preceding non-conversion touch per " +
      "timeline; direct conversions credit (none); exact cents") {
    val ev = Seq(
      // user 1: view → click → purchase(500) → purchase(250)
      (1L, 10L, 1L, "view", 0L), (1L, 20L, 2L, "click", 0L),
      (1L, 30L, 3L, "purchase", 500L), (1L, 40L, 4L, "purchase", 250L),
      // user 2: purchase with no preceding touch
      (2L, 10L, 5L, "purchase", 100L),
      // user 3: click → view → purchase — first=click, last=view
      (3L, 10L, 6L, "click", 0L), (3L, 20L, 7L, "view", 0L),
      (3L, 30L, 8L, "purchase", 40L))
      .toDF("user", "ts", "eid", "etype", "cents")
    val out = graft.ops.EventOps.touchAttribution(ev, "user", "ts", "eid",
        "etype", "cents", "purchase")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out(("last", "click")) == ((2L, 750L)))
    assert(out(("last", "view")) == ((1L, 40L)))
    assert(out(("last", "(none)")) == ((1L, 100L)))
    assert(out(("first", "view")) == ((2L, 750L)))
    assert(out(("first", "click")) == ((1L, 40L)))
    assert(out(("first", "(none)")) == ((1L, 100L)))
    assert(out.size == 6)
  }

  test("pathTrigrams: sliding windows per timeline, multiplicity across " +
      "users, deterministic top-k cut on the total order") {
    val ev = Seq(
      // user 1: a b c d → paths abc, bcd
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "c"),
      (1L, 40L, 4L, "d"),
      // user 2: a b c → abc again
      (2L, 10L, 5L, "a"), (2L, 20L, 6L, "b"), (2L, 30L, 7L, "c"),
      // user 3: too short for any trigram
      (3L, 10L, 8L, "a"), (3L, 20L, 9L, "b"))
      .toDF("user", "ts", "eid", "page")
    val out = graft.ops.EventOps.pathTrigrams(ev, "user", "ts", "eid",
        "page", topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(out.toSeq == Seq(("a", "b", "c", 2L), ("b", "c", "d", 1L)))
    // topK = 1 cuts after the count-then-path order
    val top1 = graft.ops.EventOps.pathTrigrams(ev, "user", "ts", "eid",
      "page", topK = 1).collect().map(r => r.getString(0))
    assert(top1.toSeq == Seq("a"))
  }

  test("funnelWithin: whole journey must fit the window from step 1; " +
      "per-step order still strictly-after") {
    val day = 86400L * 1000000L
    val ev = Seq(
      // A: completes inside the window
      (1L, 0L, "view"), (1L, 10L, "click"), (1L, 20L, "purchase"),
      // B: click lands outside the 1-day window → stops at step 1
      (2L, 0L, "view"), (2L, 2 * day, "click"),
      // C: click inside, purchase outside → stops at step 2
      (3L, 0L, "view"), (3L, 10L, "click"), (3L, 2 * day, "purchase"),
      // D: purchase BEFORE click (order violation) → stops at step 2
      (4L, 0L, "view"), (4L, 30L, "purchase"), (4L, 40L, "click"))
      .toDF("user", "us", "etype")
      .withColumn("ts", expr("timestamp_micros(us)"))
    val out = graft.ops.EventOps.funnelWithin(ev, "user", "etype", "ts",
        Seq("view", "click", "purchase"), windowSeconds = 86400L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 4L, 2L -> 3L, 3L -> 1L), s"$out")
    // same events, unbounded funnel: D still fails (order), B and C pass
    val unb = graft.ops.EventOps.funnel(ev, "user", "etype", "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(unb == Map(1L -> 4L, 2L -> 4L, 3L -> 2L))
  }

  test("cusumAlarms: sustained uplift alarms where the single-day sigma " +
      "test would not; cusum resets after the excess drains") {
    val day = 86400L * 1000000L
    // type a over 10 days: 5 baseline days at 10, then 5 days at 14 — a
    // sustained +40% shift. n=10, S=120: daily dev = 10x−120.
    // P: −20,−40,−60,−80,−100, then +20/day → −80,−60,−40,−20, 0
    // run-min caps at −100 → cusum: 0..0, 20,40,60,80,100
    val ev = (0 until 5).flatMap(d => (0 until 10).map(i =>
        (d.toLong * day + i, "a"))) ++
      (5 until 10).flatMap(d => (0 until 14).map(i =>
        (d.toLong * day + i, "a")))
    val df = ev.toDF("us", "etype").withColumn("ts",
      expr("timestamp_micros(us)"))
    val out = graft.ops.EventOps.cusumAlarms(df, "ts", "etype", meanDays = 3)
      .collect().map(r => (r.getDate(1).toString, r.getLong(2), r.getLong(3),
        r.getBoolean(4))).sortBy(_._1)
    val cusums = out.map(_._3)
    assert(cusums.toSeq ==
      Seq(0L, 0L, 0L, 0L, 0L, 20L, 40L, 60L, 80L, 100L), s"$out")
    // alarm threshold = 3·S = 360 in ×n units — never crossed here
    assert(out.forall(!_._4))
    // a 5× shift accumulates past 3 mean-days: 5 days at 50 → S=300,
    // mean 30, excess 20/day ⇒ 3.33 mean-days by day 10 > 3 → alarm fires
    // exactly once, on the final day (C = 1000 > 3·S = 900 in ×n units)
    val hot = (0 until 5).flatMap(d => (0 until 10).map(i =>
        (d.toLong * day + i, "b"))) ++
      (5 until 10).flatMap(d => (0 until 50).map(i =>
        (d.toLong * day + i, "b")))
    val hotOut = graft.ops.EventOps.cusumAlarms(
        hot.toDF("us", "etype").withColumn("ts", expr("timestamp_micros(us)")),
        "ts", "etype", meanDays = 3)
      .collect().map(r => (r.getDate(1).toString, r.getLong(3),
        r.getBoolean(4))).sortBy(_._1)
    assert(hotOut.map(_._3).toSeq ==
      Seq(false, false, false, false, false, false, false, false, false,
        true), s"sustained 5x shift must alarm on the last day: $hotOut")
  }

  test("cusumAlarms: dense day grid — gap days and the post-stop tail " +
      "drain accumulated CUSUM instead of freezing it") {
    val day = 86400L * 1000000L
    // type a: 5 days at 30/day (days 0-4), then SILENCE; type z spans the
    // full 10 days (1/day) so the global grid extends to day 9. Type a's
    // dense grid is days 0..9 with x=0 on days 5-9: n=10, S=150, daily
    // dev = 10x−150 → +150/day while emitting, −150/day after the stop.
    // P: 150,300,450,600,750 then 600,450,300,150,0; run-min(≤0) = 0 →
    // cusum = P: peaks at 750 on day 4, DRAINS to 0 by day 9. Without the
    // dense grid type a would have n=5, S=150, dev=5·30−150=0 everywhere
    // and the stop would be invisible forever.
    val ev = (0 until 5).flatMap(d => (0 until 30).map(i =>
        (d.toLong * day + i, "a"))) ++
      (0 until 10).map(d => (d.toLong * day, "z"))
    val out = graft.ops.EventOps.cusumAlarms(
        ev.toDF("us", "etype").withColumn("ts", expr("timestamp_micros(us)")),
        "ts", "etype", meanDays = 3)
      .where(col("event_type") === "a")
      .collect().map(r => (r.getDate(1).toString, r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out.length == 10, s"dense grid must cover all 10 days: $out")
    assert(out.map(_._2).toSeq ==
      Seq(30L, 30L, 30L, 30L, 30L, 0L, 0L, 0L, 0L, 0L), s"$out")
    assert(out.map(_._3).toSeq ==
      Seq(150L, 300L, 450L, 600L, 750L, 600L, 450L, 300L, 150L, 0L),
      s"post-stop days must drain the CUSUM: $out")
  }

  test("rollingDistinct: window sketch EQUALS the sketch of the window's " +
      "raw union (mergeability, bit-exact); estimate tracks truth") {
    val day = 86400L * 1000000L
    // 7 days, 100 users per day with 50% overlap between consecutive days
    val ev = (0 until 7).flatMap { d =>
      (0 until 100).map(u => (d.toLong * day + u, d.toLong * 50 + u))
    }
    val df = ev.toDF("us", "uid").withColumn("ts",
      expr("timestamp_micros(us)"))
    val out = graft.ops.EventOps.rollingDistinct(df, "ts", "uid",
        windowDays = 7)
      .collect().map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.size == 7)
    // the last day's window covers all 7 days: distinct = 50·6+100 = 400
    val (est, n) = out("1970-01-07")
    assert(n == 700L)
    // mergeability exact check: re-date every event to ONE day; a
    // 1-day window over that union must give the IDENTICAL estimate
    val union = df.withColumn("ts", expr("timestamp_micros(0)"))
    val one = graft.ops.EventOps.rollingDistinct(union, "ts", "uid", 1)
      .collect()(0)
    assert(one.getLong(1) == est,
      s"window sketch ${est} != union sketch ${one.getLong(1)}")
    assert(one.getLong(2) == 700L)
    // estimator sanity at 4096 registers: within 10% of the true 400
    assert(est > 360 && est < 440, s"estimate $est vs truth 400")
  }
}
