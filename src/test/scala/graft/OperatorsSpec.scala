package graft

import graft.operators._
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class OperatorsSpec extends SparkSuite {
  import spark.implicits._

  test("A1 countPerKey matches manual counts") {
    val df = Seq(("a", 1), ("a", 2), ("b", 1), ("a", 3)).toDF("k", "v")
    val got = Counters.countPerKey(df, "k").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 3L, "b" -> 1L))
  }

  test("A2 collectPerType sorts members deterministically") {
    val df = Seq(("t1", "z"), ("t1", "a"), ("t1", "a"), ("t2", "m")).toDF("t", "m")
    val got = Counters.collectPerType(df, "t", "m").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got("t1") == Seq("a", "z") && got("t2") == Seq("m"))
  }

  test("A3-A5 counterStats: sum/min/max/predicated count") {
    val df = Seq(
      (10L, Timestamp.valueOf("2024-01-01 00:00:00")),
      (20L, Timestamp.valueOf("2024-01-02 00:00:00")),
      (30L, Timestamp.valueOf("2024-01-03 00:00:00"))).toDF("v", "ts")
    val r = Counters.counterStats(df, col("v"), col("ts"), col("v") >= 20).collect()(0)
    assert(r.getLong(0) == 60L)
    assert(r.getTimestamp(1) == Timestamp.valueOf("2024-01-01 00:00:00"))
    assert(r.getTimestamp(2) == Timestamp.valueOf("2024-01-03 00:00:00"))
    assert(r.getLong(3) == 2L && r.getLong(4) == 3L)
  }

  test("A7 zeroFill is the full cross product with zero counts") {
    val t = Seq("x", "y").toDF("topic")
    val p = Seq(0, 1, 2).toDF("part")
    val rows = Counters.zeroFill(t, p).collect()
    assert(rows.length == 6 && rows.forall(_.getLong(2) == 0L))
  }

  test("J1 snapshotDelta: first snapshot diffs against 0") {
    val df = Seq(("k1", 1, 5L), ("k1", 2, 9L), ("k1", 3, 9L), ("k2", 1, 2L))
      .toDF("k", "snap", "cnt")
    val got = Snapshots.snapshotDelta(df, Seq("k"), "snap", "cnt")
      .orderBy("k", "snap").collect().map(_.getLong(3))
    assert(got.toSeq == Seq(5L, 4L, 0L, 2L))
  }

  test("F5 severity tier boundaries (CounterProgressCheck.java:61-66)") {
    val df = Seq(0, 179, 180, 239, 240, 10000).toDF("s")
    val got = df.select(Snapshots.severity(col("s"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("debug", "debug", "info", "info", "warn", "warn"))
  }

  test("F5 isInactive: 5 minute threshold (reference :80-88)") {
    val now = Timestamp.valueOf("2024-01-01 01:00:00")
    val df = Seq(
      Timestamp.valueOf("2024-01-01 00:54:00"),  // 6 min stale -> inactive
      Timestamp.valueOf("2024-01-01 00:56:00"))  // 4 min stale -> active
      .toDF("last")
    val got = df.select(Snapshots.isInactive(col("last"), lit(now))).collect().map(_.getBoolean(0))
    assert(got.toSeq == Seq(true, false))
  }

  test("J2 config resolve: override beats default, default fills gaps") {
    val names = Seq("acks", "linger.ms", "batch.size").toDF("name")
    val over = Seq(("acks", "all")).toDF("name", "value")
    val defs = Seq(("acks", "1"), ("linger.ms", "5")).toDF("name", "value")
    val got = ConfigResolve.resolve(names, over, defs).collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got == Map("acks" -> Some("all"), "linger.ms" -> Some("5"), "batch.size" -> None))
  }

  test("J3 assignByIndex is positional round-robin (reference :507)") {
    val df = spark.range(10).toDF("id")
    val got = Routing.assignByIndex(df, "id", 3).orderBy("id").collect().map(_.getLong(1))
    assert(got.toSeq == Seq(0L, 1L, 2L, 0L, 1L, 2L, 0L, 1L, 2L, 0L))
  }

  test("J3 assignByKey is stable and bounded") {
    val df = spark.range(100).toDF("id")
    val a = df.select(Routing.assignByKey(col("id"), 7)).collect().map(_.getLong(0))
    val b = df.select(Routing.assignByKey(col("id"), 7)).collect().map(_.getLong(0))
    assert(a.sameElements(b) && a.forall(s => s >= 0 && s < 7))
  }

  test("J3 portable hash family fills slot counts beyond 256 uniformly") {
    // the 60-bit portable hash must not cap parallelism: with one md5
    // byte, n = 1000 left slots >= 256 permanently empty
    val df = spark.range(20000).toDF("id")
    val slots = df.select(
      Routing.assignByKey(col("id"), 1000, Routing.portableHash).as("s"))
    val n = slots.distinct().count()
    assert(n == 1000, s"only $n of 1000 slots populated")
    // and non-power-of-two slot counts stay near-uniform (no mod bias)
    val counts = slots.groupBy("s").count().agg(
      min("count").as("mn"), max("count").as("mx")).collect()(0)
    assert(counts.getLong(0) >= 5 && counts.getLong(1) <= 45,
      s"skewed: min=${counts.getLong(0)} max=${counts.getLong(1)}")
  }

  test("A1-salted countPerKeySalted equals countPerKey") {
    val ev = Tables.load(spark, sf(), "events")
    val plain = Counters.countPerKey(ev, "user_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Counters.countPerKeySalted(ev, salt = 8, "user_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("interval join: inclusive bounds, bin-crossing intervals, key isolation, no dup pairs") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    val intervals = Seq(
      (1L, ts(5), ts(25), 500L), // spans 3 ten-second bins
      (2L, ts(0), ts(10), 501L)
    ).toDF("user_id", "t_start", "t_end", "event_id")
    val points = Seq(
      (1L, ts(5), 600L),  // start boundary -> in
      (1L, ts(25), 601L), // end boundary -> in
      (1L, ts(26), 602L), // just past -> out
      (2L, ts(7), 603L),  // other key's interval
      (1L, ts(7), 604L)   // interior
    ).toDF("user_id", "ts", "event_id")
    val got = RangeJoin.intervalJoin(intervals, points,
        "user_id", "t_start", "t_end", "ts", "event_id", "event_id",
        binWidthUs = 10L * 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.length == got.distinct.length, "duplicate pairs emitted")
    assert(got.toSet == Set((500L, 600L), (500L, 601L), (500L, 604L), (501L, 603L)))
  }

  test("tolerance as-of: stale matches null out, boundary staleness kept, salted agrees") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    val left = Seq(
      (1L, ts(100), 100L), // match at t=40: 60 s stale -> kept at tol=60
      (1L, ts(101), 101L), // 61 s stale -> nulled
      (2L, ts(100), 102L)  // no right at all -> null
    ).toDF("user_id", "ts", "event_id")
    val right = Seq((1L, ts(40), 200L)).toDF("user_id", "ts", "event_id")
    val tol = Some(60L * 1000000L)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    val plain = canon(AsofJoin.asofJoin(
      left, right, "user_id", "ts", "event_id", "event_id", tol))
    assert(plain == Set((100L, Some(200L)), (101L, None), (102L, None)))
    val salted = canon(AsofJoin.asofJoinSalted(
      left, right, "user_id", "ts", "event_id", "event_id",
      binWidthUs = 10L * 1000000L, maxStalenessUs = tol))
    assert(salted == plain)
  }

  test("rolling stats: inclusive trailing range, peers aggregate together, key isolation") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    // width 60 s; events at 0, 30, 60, 61 (+ a tie at 30) for key 1
    val ev = Seq(
      (1L, ts(0), 0L, 1.00), (1L, ts(30), 1L, 2.00), (1L, ts(30), 2L, 3.00),
      (1L, ts(60), 3L, 4.00), (1L, ts(61), 4L, 5.00),
      (2L, ts(30), 5L, 10.00)
    ).toDF("user_id", "ts", "event_id", "value")
    val got = Rolling.rollingStats(ev, "user_id", "ts", "event_id", "value",
        widthUs = 60L * 1000000L)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toList
    assert(got == List(
      (0L, 1L, 100L),   // just itself
      (1L, 3L, 600L),   // 0 + both peers at t=30 (RANGE peers)
      (2L, 3L, 600L),
      (3L, 4L, 1000L),  // [0, 60] inclusive lower bound
      (4L, 4L, 1400L),  // [1, 61]: t=0 aged out
      (5L, 1L, 1000L)), // other key isolated
      s"got $got")
  }

  test("salted rolling stats equals the plain form (bin-boundary frames, events fixture)") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    // width 60 s, bins 100 s: rows at 95, 99 are context-copied into
    // the next bin; rows at 100, 155 have frames crossing the boundary
    val ev = Seq(
      (1L, ts(10), 0L, 1.00), (1L, ts(95), 1L, 2.00), (1L, ts(99), 2L, 3.00),
      (1L, ts(100), 3L, 4.00), (1L, ts(155), 4L, 5.00), (1L, ts(161), 5L, 6.00),
      (2L, ts(99), 6L, 7.00), (2L, ts(101), 7L, 8.00)
    ).toDF("user_id", "ts", "event_id", "value")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    val plain = canon(Rolling.rollingStats(
      ev, "user_id", "ts", "event_id", "value", widthUs = 60L * 1000000L))
    val salted = canon(Rolling.rollingStatsSalted(
      ev, "user_id", "ts", "event_id", "value",
      widthUs = 60L * 1000000L, binWidthUs = 100L * 1000000L))
    assert(salted == plain, s"plain $plain\nsalted $salted")
    // spot-check a boundary frame: id 4 at t=155 sees {95, 99, 100, 155}
    assert(plain.find(_._1 == 4L).get._2 == 4L)
    // fixture scale
    val events = Tables.load(spark, sf(), "events")
    val fp = canon(Rolling.rollingStats(
      events, "user_id", "ts", "event_id", "value"))
    val fs = canon(Rolling.rollingStatsSalted(
      events, "user_id", "ts", "event_id", "value"))
    assert(fp.nonEmpty && fs == fp)
  }

  test("session_window: gap merge, closed-interval boundary, end = last + gap") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    // gap 60 s: 0 and 59 merge (diff < gap); 119 exactly gap after 59
    // STILL merges (Spark's session window is the closed [t, t+gap] —
    // this test pins the boundary convention the x51 oracle mirrors);
    // 300 is 181 s after 119 -> separate
    val ev = Seq(
      (1L, ts(0), 0L), (1L, ts(59), 1L), (1L, ts(119), 2L),
      (1L, ts(300), 3L), (2L, ts(0), 4L)
    ).toDF("user_id", "ts", "event_id")
    val got = SessionWindows.sessionCounts(ev, "user_id", "ts", gap = "60 seconds")
      .orderBy("k", "sess_start_us").collect()
      .map(r => (r.getLong(0), r.getLong(1) / 1000000L,
        r.getLong(2) / 1000000L, r.getLong(3))).toList
    assert(got == List(
      (1L, 0L, 179L, 3L),   // {0, 59, 119}, end = 119 + 60
      (1L, 300L, 360L, 1L),
      (2L, 0L, 60L, 1L)), s"got $got")
  }

  test("salted session counts equal the plain form (cross-bin chains, events fixture)") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    // gap 60 s, bins 100 s: {90, 140} chains ACROSS the bin-0/bin-1
    // boundary (diff 50 <= gap); 210 starts a new session (70 > gap)
    // that absorbs 230 and the boundary-exact 290 (290 - 230 = 60 =
    // gap -> merges under the closed-interval rule); 500 isolated;
    // key 2 rides along untouched
    val ev = Seq(
      (1L, ts(90), 0L), (1L, ts(140), 1L), (1L, ts(210), 2L),
      (1L, ts(230), 3L), (1L, ts(290), 4L),
      (1L, ts(500), 5L), (2L, ts(95), 6L), (2L, ts(105), 7L)
    ).toDF("user_id", "ts", "event_id")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val plain = canon(SessionWindows.sessionCounts(ev, "user_id", "ts", "60 seconds"))
    val salted = canon(SessionWindows.sessionCountsSalted(ev, "user_id", "ts",
      gapUs = 60L * 1000000L, binWidthUs = 100L * 1000000L))
    assert(salted == plain, s"plain $plain\nsalted $salted")
    // the cross-bin chain {90, 140} is ONE session; the boundary-exact
    // merge yields the 3-event session {210, 230, 290}
    assert(plain.exists(s => s._1 == 1L && s._2 == 90000000L && s._4 == 2L))
    assert(plain.exists(s => s._1 == 1L && s._2 == 210000000L && s._4 == 3L))
    // fixture scale, default gap/bins
    val events = Tables.load(spark, sf(), "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
    val fp = canon(SessionWindows.sessionCounts(events, "user_id", "ts"))
    val fs = canon(SessionWindows.sessionCountsSalted(events, "user_id", "ts"))
    assert(fp.nonEmpty && fs == fp)
  }

  test("salted interval join equals the plain form (crafted + events fixture)") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    val intervals = Seq(
      (1L, ts(5), ts(25), 500L),
      (2L, ts(0), ts(10), 501L)
    ).toDF("user_id", "t_start", "t_end", "event_id")
    val points = Seq(
      (1L, ts(5), 600L), (1L, ts(25), 601L), (1L, ts(26), 602L),
      (2L, ts(7), 603L), (1L, ts(7), 604L)
    ).toDF("user_id", "ts", "event_id")
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val plain = run(RangeJoin.intervalJoin(intervals, points,
      "user_id", "t_start", "t_end", "ts", "event_id", "event_id",
      binWidthUs = 10L * 1000000L))
    val salted = run(RangeJoin.intervalJoinSalted(intervals, points,
      "user_id", "t_start", "t_end", "ts", "event_id", "event_id",
      binWidthUs = 10L * 1000000L, salt = 4))
    assert(salted == plain && plain ==
      Set((500L, 600L), (500L, 601L), (500L, 604L), (501L, 603L)))
    // fixture scale: no dup pairs, identical pair set
    val ev = Tables.load(spark, sf(), "events").filter(col("ts").isNotNull)
    val iv = ev.filter(col("event_id") % 11 === 0)
      .select(col("event_id"), col("user_id"), col("ts").as("t_start"),
        (col("ts") + expr("INTERVAL 2 HOURS")).as("t_end"))
    val pts = ev.filter(col("event_id") % 11 =!= 0)
    val fp = run(RangeJoin.intervalJoin(iv, pts,
      "user_id", "t_start", "t_end", "ts", "event_id", "event_id"))
    val fs0 = RangeJoin.intervalJoinSalted(iv, pts,
      "user_id", "t_start", "t_end", "ts", "event_id", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(fs0.length == fs0.distinct.length, "salted join emitted dup pairs")
    assert(fp.nonEmpty && fs0.toSet == fp)
  }

  test("salted as-of join equals the plain form on boundary/carry/tie/null fixtures") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    // bins of 10 s; crafted to cover every stitch case: match in SAME
    // bin, carry from previous bin, carry across EMPTY bins, right row
    // exactly AT a bin start, tie at equal ts (max-id dedup), left row
    // before any right, key with no right rows, null key/ts both sides
    val left = Seq(
      (Option(1L), Option(ts(12)), 100L), // match in same bin (t=11)
      (Option(1L), Option(ts(25)), 101L), // carry from bin 1 (t=11)
      (Option(1L), Option(ts(47)), 102L), // carry across empty bins 2,3
      (Option(1L), Option(ts(30)), 103L), // right exactly at bin start 30
      (Option(1L), Option(ts(3)), 104L),  // before any right -> nulls
      (Option(2L), Option(ts(50)), 105L), // key with no rights -> nulls
      (Option.empty[Long], Option(ts(5)), 106L), // null key -> nulls
      (Option(1L), Option.empty[Timestamp], 107L) // null ts -> nulls
    ).toDF("user_id", "ts", "event_id")
    val right = Seq(
      (Option(1L), Option(ts(11)), 200L),
      (Option(1L), Option(ts(11)), 201L), // tie -> max id 201
      (Option(1L), Option(ts(30)), 202L), // at bin boundary
      (Option(3L), Option(ts(1)), 300L),
      (Option.empty[Long], Option(ts(2)), 400L), // null key: ignored
      (Option(1L), Option.empty[Timestamp], 401L) // null ts: ignored
    ).toDF("user_id", "ts", "event_id")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getTimestamp(4).getTime))).toSet
    val plain = canon(AsofJoin.asofJoin(
      left, right, "user_id", "ts", "event_id", "event_id"))
    val salted = canon(AsofJoin.asofJoinSalted(
      left, right, "user_id", "ts", "event_id", "event_id",
      binWidthUs = 10L * 1000000L))
    assert(salted == plain, s"salted diverged:\nplain  $plain\nsalted $salted")
    // spot-check the semantics, not just self-consistency
    val byLid = salted.map(t => t._1 -> t).toMap
    assert(byLid(100L)._2 == Some(201L)) // same-bin match, tie -> max id
    assert(byLid(102L)._2 == Some(202L)) // carried across empty bins
    assert(byLid(103L)._2 == Some(202L)) // right at bin start matches
    assert(byLid(104L)._2 == None && byLid(105L)._2 == None &&
      byLid(106L)._2 == None && byLid(107L)._2 == None)
  }

  test("salted as-of join equals the plain form on the events fixture") {
    val ev = Tables.load(spark, sf(), "events").filter(col("ts").isNotNull)
    val l = ev.filter(col("event_id") % 7 === 0)
    val r = ev.filter(col("event_id") % 7 =!= 0)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(x => (x.getLong(0),
        if (x.isNullAt(3)) None else Some(x.getLong(3)),
        if (x.isNullAt(4)) None else Some(x.getTimestamp(4).getTime))).toSet
    val plain = canon(AsofJoin.asofJoin(l, r, "user_id", "ts", "event_id", "event_id"))
    val salted = canon(AsofJoin.asofJoinSalted(l, r, "user_id", "ts", "event_id", "event_id"))
    assert(plain.nonEmpty && salted == plain)
  }

  test("interval join: degenerate span fails loudly before exploding into the shuffle") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    // one corrupt epoch-0 interval against 2024-era bounds: ~473k hourly
    // bins from a single row — must raise with the interval id, not
    // silently flood the shuffle (or hit sequence()'s 2^31 hard error)
    val corrupt = Seq(
      (1L, ts(0), Timestamp.valueOf("2024-01-01 00:00:00"), 900L)
    ).toDF("user_id", "t_start", "t_end", "event_id")
    val points = Seq((1L, ts(5), 600L)).toDF("user_id", "ts", "event_id")
    val e = intercept[Exception] {
      RangeJoin.intervalJoin(corrupt, points,
        "user_id", "t_start", "t_end", "ts", "event_id", "event_id").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("spans more than")),
      s"expected the in-plan span guard to fire, got: $e")
    // a legitimate span under the cap still runs through the same path
    val fine = Seq((1L, ts(0), ts(7200), 901L))
      .toDF("user_id", "t_start", "t_end", "event_id")
    assert(RangeJoin.intervalJoin(fine, points,
      "user_id", "t_start", "t_end", "ts", "event_id", "event_id")
      .count() == 1L)
  }

  test("as-of join: string right-id ties resolve numerically, not lexicographically") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    // '9' > '10' as strings: the max-id representative must come from
    // the LONG cast ('10'), matching the numeric oracle
    val left = Seq((1L, ts(10), 100L)).toDF("user_id", "ts", "event_id")
    val right = Seq((1L, ts(5), "9"), (1L, ts(5), "10"))
      .toDF("user_id", "ts", "event_id")
    val got = AsofJoin.asofJoin(left, right, "user_id", "ts", "event_id", "event_id")
      .collect()
    assert(got.length == 1 && got(0).getLong(3) == 10L,
      s"string-id tie broke lexicographically: ${got.mkString}")
  }

  test("as-of join: latest at-or-before match, inclusive ties, nulls when nothing precedes") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    val left = Seq(
      (1L, ts(10), 100L), // latest right before t=10 is rid 202 @ t=8
      (1L, ts(5), 101L),  // equal-ts right included; tie -> max rid 201
      (1L, ts(1), 102L),  // nothing at-or-before -> nulls
      (2L, ts(10), 103L)  // key with no right rows at all -> nulls
    ).toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts(5), 200L), (1L, ts(5), 201L), (1L, ts(8), 202L),
      (3L, ts(1), 300L)
    ).toDF("user_id", "ts", "event_id")
    val got = AsofJoin.asofJoin(left, right, "user_id", "ts", "event_id", "event_id")
      .orderBy("lid").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getTimestamp(4).getTime / 1000)))
    assert(got.toSeq == Seq(
      (100L, Some(202L), Some(8L)),
      (101L, Some(201L), Some(5L)),
      (102L, None, None),
      (103L, None, None)))
    // SQL null semantics: a null-ts right row would sort NULLS FIRST and
    // poison every left row's running last; a null-key right row would
    // meet null-key left rows in the null window partition. Both are
    // unmatchable under the SQL formulation and must be ignored, while
    // left rows always surface (left-join shape).
    val leftN = Seq(
      (Option(1L), Option(ts(10)), 100L),
      (Option.empty[Long], Option(ts(10)), 101L), // null key -> no match
      (Option(1L), Option.empty[Timestamp], 102L) // null ts -> no match
    ).toDF("user_id", "ts", "event_id")
    val rightN = Seq(
      (Option(1L), Option.empty[Timestamp], 200L), // null ts: ignored
      (Option.empty[Long], Option(ts(5)), 201L),   // null key: ignored
      (Option(1L), Option(ts(3)), 202L)
    ).toDF("user_id", "ts", "event_id")
    val gotN = AsofJoin.asofJoin(leftN, rightN, "user_id", "ts", "event_id", "event_id")
      .orderBy("lid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(gotN.toSeq == Seq(
      (100L, Some(202L)), (101L, None), (102L, None)))
  }

  test("latestByKey keeps the newest row, ties to max tie-id, drops null keys/ord") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    val df = Seq(
      (Option(1L), Option(ts(10)), Option(5L), "a", 1.0),
      (Option(1L), Option(ts(10)), Option(7L), "b", 2.0), // ts tie -> id 7
      (Option(1L), Option(ts(9)), Option(99L), "c", 3.0), // older, big id: loses
      (Option(2L), Option(ts(1)), Option(1L), "z", 4.0),
      (Option.empty[Long], Option(ts(50)), Option(2L), "x", 5.0), // null key
      (Option(2L), Option.empty[Timestamp], Option(3L), "y", 6.0) // null ts
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = Compaction.latestByKey(df, "user_id", "ts", "event_id",
      Seq("event_type", "value")).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
        r.getLong(2), r.getString(3), r.getDouble(4)))
    assert(got.toSeq == Seq((1L, 10L, 7L, "b", 2.0), (2L, 1L, 1L, "z", 4.0)),
      s"got ${got.toSeq}")
  }

  test("exportManifest: plain-JVM md5 replay of shards, masses, xor checksums") {
    import spark.implicits._
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val docs = Tables.load(spark, sf(), "documents")
      .filter(col("doc_id").isNotNull)
    val got = graft.ext.TrainSet.exportManifest(docs, "doc_id",
        graft.ext.TextStats.tokenCount(coalesce(col("text"), lit(""))),
        seed = "s1", numShards = 4)
      .orderBy("shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val exp = docs.select("doc_id", "text").collect()
      .map { r =>
        val id = r.getLong(0)
        val tok = Option(r.getString(1)).getOrElse("").toLowerCase
          .split("[^a-z0-9]+").count(_.nonEmpty).toLong
        val h = md5hex(s"s1:$id")
        (java.lang.Long.parseLong(h.take(8), 16) % 4, tok,
          java.lang.Long.parseLong(h.slice(8, 23), 16))
      }
      .groupBy(_._1).map { case (sh, rows) =>
        (sh, rows.length.toLong, rows.map(_._2).sum,
          rows.map(_._3).reduce(_ ^ _))
      }.toSeq.sortBy(_._1)
    assert(got.toSeq == exp, s"manifest replay mismatch: ${got.toSeq} vs $exp")
    // a different seed redraws the assignment
    val got2 = graft.ext.TrainSet.exportManifest(docs, "doc_id",
      lit(1L), seed = "s2", numShards = 4).orderBy("shard").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got2.map(_._2).sum == docs.count())
    assert(got2.map(_._2).toSeq != got.map(_._2).toSeq ||
      got2.length == got.length) // membership differs even if sizes collide
  }

  test("budgetFill: greedy order, exclusive cum, crossing doc kept, budget exhausts") {
    import spark.implicits._
    // ranks: b(3.0,40) a(2.0,50) c(2.0,30) d(1.0,100); greedy order is
    // (rank desc, id asc) -> b,a,c,d with cum_before 0,40,90,120
    val df = Seq(("a", 2.0, 50L), ("b", 3.0, 40L), ("c", 2.0, 30L),
      ("d", 1.0, 100L), ("e", 0.5, 10L)).toDF("id", "r", "tok")
    def fill(budget: Long) =
      graft.ext.TrainSet.budgetFill(df, "id", col("r"), col("tok"), budget)
        .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
    // budget 100: b(cum 0) a(cum 40) kept; c would start at 90 < 100 ->
    // kept and CROSSES; d starts at 120 >= 100 -> dropped
    assert(fill(100L) == Seq(("a", 50L, 40L), ("b", 40L, 0L), ("c", 30L, 90L)))
    // budget 1: only the top-ranked doc fits (any remaining budget keeps)
    assert(fill(1L) == Seq(("b", 40L, 0L)))
    // budget beyond the corpus: everything kept, cum_before exact
    assert(fill(1000000L).map(_._1) == Seq("a", "b", "c", "d", "e"))
    // null rank/token/id rows are excluded, result deterministic
    val withNulls = df.unionByName(Seq((null.asInstanceOf[String], 9.0, 5L))
      .toDF("id", "r", "tok"))
    assert(graft.ext.TrainSet.budgetFill(withNulls, "id", col("r"),
      col("tok"), 100L).count() == 3)
    // matches the single-partition window replay on the fixture corpus
    val docs = Tables.load(spark, sf(), "documents")
      .filter(col("text").isNotNull)
    val got = graft.ext.TrainSet.budgetFill(docs, "doc_id",
        graft.ext.TextStats.qualityScore(col("text")),
        graft.ext.TextStats.tokenCount(col("text")), 1500L)
      .collect().map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1).toSeq
    val replay = docs.select(col("doc_id"),
        graft.ext.TextStats.qualityScore(col("text")).as("q"),
        graft.ext.TextStats.tokenCount(col("text")).cast("long").as("tok"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy { case (id, q, _) => (-q, id) }
    var acc = 0L
    val exp = replay.flatMap { case (id, _, tok) =>
      val before = acc; acc += tok
      if (before < 1500L) Some(id -> before) else None
    }.sortBy(_._1).toSeq
    assert(got == exp, s"fixture greedy fill mismatch: got ${got.take(5)}")
  }

  test("budgetFill: kept set grows monotonically with the budget") {
    val docs = Tables.load(spark, sf(), "documents")
      .filter(col("text").isNotNull)
    def kept(b: Long): Set[Long] = graft.ext.TrainSet.budgetFill(
        docs, "doc_id",
        graft.ext.TextStats.qualityScore(col("text")),
        graft.ext.TextStats.tokenCount(col("text")), b)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val budgets = Seq(300L, 900L, 1800L, 2700L)
    val sets = budgets.map(kept)
    sets.sliding(2).foreach { case Seq(a, b) =>
      assert(a.subsetOf(b), s"budget growth shrank the kept set: ${a.diff(b)}")
    }
    assert(sets.head.nonEmpty && sets.head.size < sets.last.size,
      s"budget ladder degenerate: ${sets.map(_.size)}")
  }

  test("epochShuffle is a balanced deterministic permutation, redrawn by seed") {
    val docs = Tables.load(spark, sf(), "documents").select("doc_id")
    val n = docs.count()
    val a = graft.ext.TrainSet.epochShuffle(docs, "doc_id", "e1", 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // permutation: every doc exactly once
    assert(a.map(_._3).toSet == docs.collect().map(_.getLong(0)).toSet)
    assert(a.length.toLong == n)
    // pos is contiguous 1..size within each shard
    a.groupBy(_._1).foreach { case (shard, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length).toSeq,
        s"shard $shard positions not contiguous")
    }
    // md5 sharding is balanced: no shard above 2x the mean (500 docs / 8)
    val sizes = a.groupBy(_._1).map(_._2.length)
    assert(sizes.max < 2.0 * n / 8, s"shard sizes $sizes")
    // deterministic; a different seed draws a different order
    val b = graft.ext.TrainSet.epochShuffle(docs, "doc_id", "e1", 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.sorted.toSeq == b.sorted.toSeq)
    val c = graft.ext.TrainSet.epochShuffle(docs, "doc_id", "e2", 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(c.sorted.toSeq != a.sorted.toSeq)
  }

  test("weightedSample: per-stratum size, weight gates, determinism, heavy doc wins") {
    val docs = Tables.load(spark, sf(), "documents")
    val got = graft.ext.TrainSet.weightedSample(docs, "lang", "doc_id", "n_chars", 15)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val strata = docs.filter(col("n_chars") > 0 && col("lang").isNotNull)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got.groupBy(_._1).foreach { case (s, rows) =>
      assert(rows.length == math.min(15L, strata(s)),
        s"stratum $s: ${rows.length} of ${strata(s)}")
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length).toSeq)
    }
    val again = graft.ext.TrainSet.weightedSample(docs, "lang", "doc_id", "n_chars", 15)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.sorted.toSeq == again.sorted.toSeq)
    // a weight 10^9 above the field is effectively certain to be drawn
    // first (P(miss) ~ 1e-9, and deterministic under the fixed salt)
    val crafted = (Seq((100L, "s", 1.0e9)) ++
      (1L to 50L).map(i => (i, "s", 1.0))).toDF("doc_id", "s", "w")
    val top = graft.ext.TrainSet.weightedSample(crafted, "s", "doc_id", "w", 3)
      .filter(col("rank") === 1).collect()
    assert(top.length == 1 && top(0).getLong(2) == 100L)
    // zero/negative/null weights are never drawn
    val gated = (Seq((1L, "s", 0.0), (2L, "s", -5.0), (3L, "s", 2.0)))
      .toDF("doc_id", "s", "w")
    val kept = graft.ext.TrainSet.weightedSample(gated, "s", "doc_id", "w", 10)
      .collect().map(_.getLong(2)).toSet
    assert(kept == Set(3L))
  }

  test("dsirResample: k ranked rows, deterministic, target-like docs win the draw") {
    // the target corpus must carry enough mass that Laplace smoothing
    // doesn't hand unseen grams a p_t above tiny observed rates, and the
    // target-like docs must be RARE in raw (the whole point of the
    // importance ratio: p_t high, p_r low). 15 target-like docs hide
    // among 200 per-doc-unique noise docs; repetition amplifies the
    // per-doc weight gap (~±1 nat per occurrence) far past the Gumbel
    // noise spread (~1.3)
    val phrase = Array.fill(6)("data engine pipeline quality").mkString(" ")
    val raw = ((1L to 15L).map(i => (i, phrase)) ++
      (101L to 300L).map(i => (i, s"junk$i noise$i filler$i pad$i")))
      .toDF("doc_id", "text")
    val target = (1L to 50L).map(i =>
      (1000L + i, Array.fill(3)("data engine pipeline quality").mkString(" ")))
      .toDF("doc_id", "text")
    val got = graft.ext.TrainSet.dsirResample(raw, target, "text", "doc_id",
      k = 10, numBuckets = 256).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.map(_._1).sorted.toSeq == (1L to 10L).toSeq, "ranks not contiguous")
    assert(got.map(_._2).distinct.length == 10, "duplicate ids drawn")
    assert(got.forall(_._2 <= 15L),
      s"noise doc out-drew target-like docs: ${got.toSeq}")
    // gumbel_key strictly decreasing in rank; key = log_weight + gumbel
    val byRank = got.sortBy(_._1)
    assert(byRank.sliding(2).forall(p => p(0)._4 >= p(1)._4), "keys not sorted")
    // deterministic end-to-end; a different salt redraws
    val again = graft.ext.TrainSet.dsirResample(raw, target, "text", "doc_id",
      k = 10, numBuckets = 256).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.sorted.toSeq == again.sorted.toSeq)
    val redraw = graft.ext.TrainSet.dsirResample(raw, target, "text", "doc_id",
      k = 10, numBuckets = 256, salt = "other").collect().map(_.getLong(1))
    assert(redraw.sorted.toSeq != got.map(_._2).sorted.toSeq,
      "salt change did not redraw the Gumbel race")
    // tokenless docs produce no features and cannot be drawn
    val withEmpty = raw.union(Seq((999L, "")).toDF("doc_id", "text"))
    val k2 = graft.ext.TrainSet.dsirResample(withEmpty, target, "text", "doc_id",
      k = 300, numBuckets = 256).collect().map(_.getLong(1))
    assert(!k2.contains(999L), "empty doc was scored")
    assert(k2.length == 215, s"expected all 215 scorable docs, got ${k2.length}")
  }

  test("dsirLogWeight: plain-JVM replay, Laplace floor on unseen grams, resample consistency") {
    // independent replay via java.security MessageDigest — no Spark
    // expression reuse
    def bucket(g: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % 64
    }
    val grams = Seq("alpha", "beta", "alpha", "alpha beta", "beta alpha")
    val ratio = Map(bucket("alpha") -> 0.5, bucket("beta") -> -0.25)
    val dflt = -1.5 // bigram buckets are (very likely) unseen -> floor
    val want = grams.map(g => ratio.getOrElse(bucket(g), dflt)).sum
    val got = Seq((1L, "alpha beta alpha")).toDF("doc_id", "text")
      .select(graft.ext.TrainSet.dsirLogWeight(col("text"), ratio, dflt, 64))
      .head.getDouble(0)
    assert(math.abs(got - want) < 1e-9, s"got $got want $want")
    // tokenless document: 0.0 over 0 grams (the both-planes convention)
    val zero = Seq((2L, "")).toDF("doc_id", "text")
      .select(graft.ext.TrainSet.dsirLogWeight(col("text"), ratio, dflt, 64),
        graft.ext.TrainSet.dsirGramCount(col("text"))).head
    assert(zero.getDouble(0) == 0.0 && zero.getLong(1) == 0L)
    // the map-only scorer and the resample's recovered log_weight are
    // the same quantity (different summation orders; 1e-5 covers fp)
    val docs = Tables.load(spark, sf(), "documents")
    val en = docs.filter(col("lang") === "en")
    val (m, d) = graft.ext.TrainSet.dsirRatioMap(docs, en, "text", "doc_id", 1024)
    val scored = docs.filter(col("doc_id").isNotNull)
      .select(col("doc_id"),
        graft.ext.TrainSet.dsirLogWeight(col("text"), m, d, 1024))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val res = graft.ext.TrainSet.dsirResample(docs, en, "text", "doc_id",
      k = 60, numBuckets = 1024).collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
    assert(res.nonEmpty)
    res.foreach { case (id, lw) =>
      assert(math.abs(scored(id) - lw) < 1e-5,
        s"doc $id: scorer ${scored(id)} vs resample $lw")
    }
  }

  test("mergeByPrecedence: priority wins, in-level min id, unlisted source merges at -1, null ids excluded") {
    val docs = Seq(
      (Some(2L), "shared", "curated"),   // prio 2 wins despite larger id
      (Some(1L), "shared", "web"),
      (Some(3L), "shared", "mirror"),    // unlisted -> -1
      (None: Option[Long], "shared", "curated"), // null id: excluded from the merge
      (Some(11L), "webonly", "web"),
      (Some(10L), "webonly", "web"),     // same level: min id survives
      (Some(20L), "mirroronly", "mirror"), // unlisted source still merges
      (Some(30L), "solo", "curated")
    ).toDF("doc_id", "text", "src")
    val out = graft.ext.Dedup.mergeByPrecedence(
        docs, "text", "doc_id", "src", Map("curated" -> 2, "web" -> 1))
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(out == Set(
      ("curated", 2L, 3L, 3L),   // "shared": 3 non-null copies, 3 sources
      ("web", 10L, 2L, 1L),
      ("mirror", 20L, 1L, 1L),
      ("curated", 30L, 1L, 1L)), out)
    // negative priorities are reserved for the unlisted tier
    val err = intercept[IllegalArgumentException] {
      graft.ext.Dedup.mergeByPrecedence(docs, "text", "doc_id", "src",
        Map("curated" -> -2))
    }
    assert(err.getMessage.contains("priorities"))
  }

  test("corpusDiff classifies added/removed/changed/unchanged; null text hashes as empty") {
    val old = Seq(
      (1L, Option("same")), (2L, Option("was")), (3L, Option("gone")),
      (4L, Option.empty[String])).toDF("doc_id", "text")
    val nw = Seq(
      (1L, Option("same")), (2L, Option("now")), (5L, Option("new")),
      (4L, Option.empty[String])).toDF("doc_id", "text")
    val got = graft.ext.CorpusDiff.diff(old, nw, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(got.toSeq == Seq(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "unchanged", 5L -> "added"), s"got ${got.toSeq}")
  }

  test("negativeSample matches a pure-Scala md5 replay of the slot arithmetic") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ids = (1L to 100L)
    val corpus = ids.toDF("doc_id")
    val anchors = Seq(10L, 20L, 30L).toDF("doc_id")
    val k = 4
    val got = graft.ext.TrainSet.negativeSample(
      anchors, "doc_id", corpus, "doc_id", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // independent replay: index by (md5-shard, md5-hex, id), then draw
    val slotOf = ids.map(i => i -> md5hex(s"graft-negs:$i"))
      .sortBy { case (i, h) =>
        (BigInt(h.substring(0, 8), 16) % 32, h, i)
      }.zipWithIndex.map { case ((i, _), z) => (z + 1).toLong -> i }.toMap
    val expected = (for {
      a <- Seq(10L, 20L, 30L); j <- 1 to k
      slot = BigInt(md5hex(s"graft-negs:$a:$j").substring(0, 12), 16)
        .toLong % ids.length + 1
      neg = slotOf(slot) if neg != a
    } yield (a, j.toLong, neg)).toSet
    assert(got == expected, s"got $got\nexpected $expected")
    assert(got.forall { case (a, j, neg) =>
      j >= 1 && j <= k && ids.contains(neg) && neg != a })
  }
}
