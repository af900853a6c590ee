package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventOps

class EventOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(m * 60000L)

  test("resurrections: first day is acquisition, gap > N resurrects, boundary gap does not") {
    import org.apache.spark.sql.functions.{col, lit, when}
    def day(d: Int) = new Timestamp(d * 86400000L)
    val events = Seq(
      // user 1: days 0, 1 (gap 1), 9 (gap 8 > 7 -> resurrection)
      (1L, day(0)), (1L, day(1)), (1L, day(9)),
      // user 2: days 0, 7 — gap EXACTLY 7 is NOT dormant (> is strict)
      (2L, day(0)), (2L, day(7)),
      // user 3: first-ever day 9 — acquisition, not resurrection
      (3L, day(9)),
      // same-day duplicates collapse before the window
      (1L, new Timestamp(9 * 86400000L + 3600000L)),
      // NULL user / NULL ts excluded
      (0L, null.asInstanceOf[Timestamp]))
      .toDF("user_id", "ts")
      .withColumn("user_id", when(col("user_id") === 0L, lit(null)).otherwise(col("user_id")))
    val got = EventOps.resurrections(events, "user_id", "ts", dormantDays = 7)
      .collect().map(r => r.getTimestamp(0).getTime / 86400000L ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(0L -> ((2L, 0L)), 1L -> ((1L, 0L)), 7L -> ((1L, 0L)),
      9L -> ((2L, 1L))), got.toString)
  }

  test("gapFillHourly: dense grid, zero-count gaps, forward-filled values") {
    def hr(h: Int) = new Timestamp(h * 3600000L)
    val events = Seq(
      (1L, hr(0), Some(1.0)),                       // hour 0
      (1L, new Timestamp(3 * 3600000L + 1000), None: Option[Double]), // hour 3, NULL value
      (1L, hr(5), Some(2.5)), (1L, hr(5), Some(2.0)), // hour 5 twice: max = 2.5
      (2L, hr(7), Some(9.0)))                       // single-event user
      .toDF("user_id", "ts", "value")
    val got = EventOps.gapFillHourly(events, "user_id", "ts", "value")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime / 3600000L,
        r.getLong(2), if (r.isNullAt(3)) null else r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    val expected = Seq(
      (1L, 0L, 1L, 1.0), // observed
      (1L, 1L, 0L, 1.0), // gap: count 0, value carried forward
      (1L, 2L, 0L, 1.0),
      (1L, 3L, 1L, 1.0), // observed hour with NULL value: fill still carries
      (1L, 4L, 0L, 1.0),
      (1L, 5L, 2L, 2.5), // two events that hour: count 2, max value wins
      (2L, 7L, 1L, 9.0))
    assert(got.length == 7, got.toSeq)
    assert(got.map(t => (t._1, t._2, t._4)).sameElements(expected.map(t => (t._1, t._2, t._4))),
      got.toSeq)
    assert(got.map(_._3).toSeq == Seq(1L, 0L, 0L, 1L, 0L, 2L, 1L), "per-hour event counts")
  }

  test("funnel depth counts ordered prefixes only") {
    val events = Seq(
      // user 1: full funnel in order
      (1L, "signup", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      // user 2: purchase BEFORE first click — signup→click completes
      // (depth 2) but the purchase step fails the order check
      (2L, "signup", ts(1)), (2L, "purchase", ts(2)), (2L, "click", ts(3)),
      // user 3: signup only (plus funnel-irrelevant noise)
      (3L, "signup", ts(5)), (3L, "error", ts(6)),
      // user 4: active but never signed up
      (4L, "click", ts(1)), (4L, "purchase", ts(2)),
      // user 5: simultaneous signup/click — strict order rejects the tie
      (5L, "signup", ts(7)), (5L, "click", ts(7))
    ).toDF("user_id", "event_type", "ts")
    val depths = EventOps.funnel(events, "user_id", "event_type", "ts",
        Seq("signup", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(depths == Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 0, 5L -> 1), depths)
  }

  test("funnel: later re-occurrences cannot fake order (min per step is what counts)") {
    // user repeats click after purchase; first click is still before first
    // purchase, so the funnel completes
    val events = Seq(
      (1L, "signup", ts(1)), (1L, "click", ts(2)),
      (1L, "purchase", ts(3)), (1L, "click", ts(4))
    ).toDF("user_id", "event_type", "ts")
    val d = EventOps.funnel(events, "user_id", "event_type", "ts",
      Seq("signup", "click", "purchase")).collect().head.getInt(1)
    assert(d == 3)
  }

  test("retention: cohort by first signup week, distinct users per offset, pre-cohort dropped") {
    def day(d: Int, h: Int = 12) = Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    // weeks (Monday-start): W1 = Jan 1-7, W2 = Jan 8-14, W3 = Jan 15-21
    val events = Seq(
      // user 1: signs up W1, active W1 (twice — counts once) and W3
      (1L, "signup", day(2)), (1L, "click", day(3)), (1L, "click", day(4)),
      (1L, "purchase", day(16)),
      // user 2: signs up W2, active W2 only; has PRE-cohort activity in W1
      (2L, "click", day(5)), (2L, "signup", day(9)),
      // user 3: never signs up — no cohort, excluded entirely
      (3L, "click", day(2)))
      .toDF("user_id", "event_type", "ts")
    val got = EventOps.retention(events, "user_id", "event_type", "ts", "signup")
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("2024-01-01", 0) -> 1L, // user 1 in their signup week
      ("2024-01-01", 2) -> 1L, // user 1 again two weeks later
      ("2024-01-08", 0) -> 1L  // user 2; their W1 click is pre-cohort
    ), got)
  }

  test("retention: no cohort events anywhere yields an empty matrix, not a failure") {
    val events = Seq((1L, "click", ts(1)), (2L, "view", ts(2)))
      .toDF("user_id", "event_type", "ts")
    assert(EventOps.retention(events, "user_id", "event_type", "ts", "signup").count() == 0)
  }

  test("spikes: integer z-gate flags the burst hour, zero-variance flags any increase") {
    // UTC-pinned instants (Timestamp.valueOf would parse in the JVM's TZ)
    def hourTs(h: Int) = Timestamp.from(
      java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(h * 3600L))
    // flat 3/hour for 30 hours, except hour 28 carries 30 events
    val rows = (0 until 30).flatMap { h =>
      val n = if (h == 28) 30 else 3
      Seq.fill(n)(("a", Timestamp.from(hourTs(h).toInstant.plusSeconds(60))))
    }
    val df = rows.toDF("event_type", "ts")
    val got = EventOps.spikes(df, "event_type", "ts", window = 24, z = 3)
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
    // hours 0..23 lack a full trailing window; 24..27 and 29 are flat-vs-
    // flat (zero deviation, not flagged); 28 is the spike. NOTE hour 29's
    // baseline now contains the 30-count hour -> variance large, 3 is
    // below mean anyway.
    assert(got.length == 1 && got(0)._3 == 30L, got.mkString(","))
    assert(got(0)._2 == hourTs(28), got(0)._2)
    // zero-variance baseline: a single +1 bump IS a spike (z -> infinity limit)
    val bump = (0 until 26).flatMap { h =>
      Seq.fill(if (h == 25) 4 else 3)(("b", hourTs(h)))
    }.toDF("event_type", "ts")
    val gb = EventOps.spikes(bump, "event_type", "ts", window = 24, z = 3).collect()
    assert(gb.length == 1 && gb(0).getLong(2) == 4L, gb.mkString(","))
    intercept[IllegalArgumentException](EventOps.spikes(df, "event_type", "ts", window = 1))
    intercept[IllegalArgumentException](EventOps.spikes(df, "event_type", "ts", z = 0))
  }

  test("rollingDaily: RANGE frame ages gap days out where a ROWS frame would not") {
    def day(d: Int) = new Timestamp(d * 86400000L)
    val events = Seq(
      ("a", day(0)), ("a", day(0)), // day 0: n=2
      ("a", day(1)),                // day 1: n=1
      ("a", day(9)),                // 8-day gap: days 0-1 must have aged out
      ("b", day(4)))                // single-day key
      .toDF("event_type", "ts")
    val got = EventOps.rollingDaily(events, "event_type", "ts", windowDays = 7)
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime / 86400000L,
        r.getLong(2), r.getLong(3))).sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(
      ("a", 0L, 2L, 2L),
      ("a", 1L, 1L, 3L),  // day 0 still inside the 7-day frame
      ("a", 9L, 1L, 1L),  // gap aged everything out — a ROWS frame would report 4
      ("b", 4L, 1L, 1L)), got.toSeq)
  }

  test("rollingDaily: windowDays=1 degenerates to the daily count; bad window rejected") {
    def day(d: Int) = new Timestamp(d * 86400000L)
    val events = Seq(("a", day(0)), ("a", day(0)), ("a", day(1))).toDF("event_type", "ts")
    val got = EventOps.rollingDaily(events, "event_type", "ts", windowDays = 1)
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(got.forall { case (n, w) => n == w }, got.toSeq)
    intercept[IllegalArgumentException] {
      EventOps.rollingDaily(events, "event_type", "ts", windowDays = 0)
    }
  }

  test("slidingActiveUsers: exact distinct over the sliding span, clamped to the stream") {
    def day(d: Int) = new Timestamp(d * 86400000L)
    val events = Seq(
      (1L, day(0)), (1L, day(0)), // same user same day: counted once
      (2L, day(1)),
      (1L, day(3)),               // u1 again inside its own window
      (3L, day(9)))               // lonely late user; also sets dmax=9
      .toDF("user_id", "ts")
    val got = EventOps.slidingActiveUsers(events, "user_id", "ts", windowDays = 3)
      .collect().map(r => r.getDate(0).getTime / 86400000L -> r.getLong(1)).toMap
    // day: active users within [d-2, d]
    assert(got == Map(
      0L -> 1L,           // u1
      1L -> 2L, 2L -> 2L, // u1, u2
      3L -> 2L,           // u1 (day 3), u2 (day 1)
      4L -> 1L, 5L -> 1L, // u1's day-3 activity
      9L -> 1L), got)     // u3; days 6-8 have no active users and no row
    intercept[IllegalArgumentException](
      EventOps.slidingActiveUsers(events, "user_id", "ts", windowDays = 0))
  }

  test("transitionMatrix: per-user consecutive pairs, cross-user gaps never pair") {
    val events = Seq(
      (1L, 1L, "a", ts(0)), (2L, 1L, "b", ts(1)), (3L, 1L, "a", ts(2)), // u1: a->b, b->a
      (4L, 2L, "a", ts(0)), (5L, 2L, "b", ts(5)),                       // u2: a->b
      (6L, 3L, "c", ts(9)))                                             // single event: none
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = EventOps.transitionMatrix(events, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("a", "b") -> 2L, ("b", "a") -> 1L), got)
  }

  test("transitionMatrix: simultaneous events order by the id tiebreaker, repartition-stable") {
    val events = Seq( // same ts: order must follow event_id 1,2,3 -> a->b, b->c
      (1L, 1L, "a", ts(5)), (2L, 1L, "b", ts(5)), (3L, 1L, "c", ts(5)))
      .toDF("event_id", "user_id", "event_type", "ts")
    def run(df: org.apache.spark.sql.DataFrame) =
      EventOps.transitionMatrix(df, "user_id", "event_type", "ts", "event_id")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(run(events) == Set(("a", "b"), ("b", "c")))
    assert(run(events.repartition(5)) == Set(("a", "b"), ("b", "c")))
  }

  test("funnel rejects empty or duplicated step lists") {
    val events = Seq((1L, "signup", ts(1))).toDF("user_id", "event_type", "ts")
    intercept[IllegalArgumentException](
      EventOps.funnel(events, "user_id", "event_type", "ts", Nil))
    intercept[IllegalArgumentException](
      EventOps.funnel(events, "user_id", "event_type", "ts", Seq("a", "a")))
  }

  test("interArrivalBuckets: band edges, per-user ordering, singleton users") {
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: gaps 0s (tie, ordered by id), 9s, 59s, 3600s
      (1L, 1L, ts("2024-01-01 00:00:00")),
      (2L, 1L, ts("2024-01-01 00:00:00")),
      (3L, 1L, ts("2024-01-01 00:00:09")),
      (4L, 1L, ts("2024-01-01 00:01:08")),
      (5L, 1L, ts("2024-01-01 01:01:08")),
      // user 2: one event, contributes no gap
      (6L, 2L, ts("2024-01-01 00:00:00")),
      // user 3: gap 599s (just inside 1-10m)
      (7L, 3L, ts("2024-01-01 00:00:00")),
      (8L, 3L, ts("2024-01-01 00:09:59")))
      .toDF("event_id", "user_id", "ts")
    val got = EventOps.interArrivalBuckets(ev, "user_id", "ts", "event_id")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("0_lt_1s") == ((1L, 1L)), got.toString)
    assert(got("1_1s_10s") == ((1L, 1L)), got.toString)
    assert(got("2_10s_1m") == ((1L, 1L)), got.toString)
    assert(got("3_1m_10m") == ((1L, 1L)), "599s gap: " + got)
    assert(got("5_ge_1h") == ((1L, 1L)), "3600s is >= 1h, exclusive band edge: " + got)
    assert(!got.contains("4_10m_1h"))
    assert(got.values.map(_._1).sum == 5L, "user 2 must contribute no gap: " + got)
  }

  test("stickiness: DAU over sliding MAU, partial early window, active days only") {
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 11:00:00")),
      (1L, ts("2024-01-02 10:00:00")),
      // day 4: only user 3; days 1-2 users still inside the 30-day window
      (3L, ts("2024-01-04 09:00:00")))
      .toDF("user_id", "ts")
    val got = EventOps.stickiness(ev, "user_id", "ts", shortDays = 1, longDays = 30)
      .collect().map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // day 1: DAU {1,2}, MAU {1,2}; day 2: DAU {1}, MAU {1,2};
    // day 4: DAU {3}, MAU {1,2,3}; day 3 absent (no activity)
    assert(got == Map(
      "2024-01-01" -> ((2L, 2L, 1.0)),
      "2024-01-02" -> ((1L, 2L, 0.5)),
      "2024-01-04" -> ((1L, 3L, 1.0 / 3))), got.toString)
    intercept[IllegalArgumentException](
      EventOps.stickiness(ev, "user_id", "ts", shortDays = 7, longDays = 7))
  }

  test("cooccurrenceLift: presence-set pairs, exact lift, repeat events collapse") {
    def ts(s: String) = Timestamp.valueOf(s)
    val base = ts("2024-01-01 10:00:00")
    // users 1,2: {a,b}; user 3: {a}; user 4: {b,c} -> n_users=4
    // pair (a,b): n_ab=2, n_a=3, n_b=3 -> lift = 2*4/9
    // pair (b,c): n_ab=1, n_c=1 -> lift = 1*4/(3*1)
    // (a,c) never co-occurs -> absent
    val ev = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (4L, "b"), (4L, "c"))
      .map { case (u, t) => (u, t, base) }
      .toDF("user_id", "event_type", "ts")
    val got = EventOps.cooccurrenceLift(ev, "user_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(got.keySet == Set(("a", "b"), ("b", "c")), got.keySet.toString)
    val ab = got(("a", "b"))
    assert(ab.getLong(2) == 3L && ab.getLong(3) == 3L && ab.getLong(4) == 2L)
    assert(ab.getDouble(5) == 2.0 * 4 / 9, ab.toString)
    assert(got(("b", "c")).getDouble(5) == 4.0 / 3, got(("b", "c")).toString)
  }

  test("longestStreak: islands split on gaps, multiple same-day events count once") {
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: days 1,2,3 then 5,6 -> longest 3, active 5
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 23:00:00")),
      (1L, ts("2024-01-02 00:30:00")), (1L, ts("2024-01-03 12:00:00")),
      (1L, ts("2024-01-05 08:00:00")), (1L, ts("2024-01-06 08:00:00")),
      // user 2: one day only
      (2L, ts("2024-02-10 09:00:00")))
      .toDF("user_id", "ts")
    val got = EventOps.longestStreak(ev, "user_id", "ts")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((5L, 3L)), 2L -> ((1L, 1L))), got.toString)
  }

  test("conversionLatency: first-after-first semantics, pre-signup purchases ignored") {
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: signup 10:00, purchases at 09:00 (BEFORE: ignored) and
      // 10:30 -> converts at 1800s (0_lt_1h)
      (1L, "signup", ts("2024-01-01 10:00:00")),
      (1L, "purchase", ts("2024-01-01 09:00:00")),
      (1L, "purchase", ts("2024-01-01 10:30:00")),
      // user 2: two signups (first wins), purchase 2 days after -> 2_1d_7d
      (2L, "signup", ts("2024-01-01 00:00:00")),
      (2L, "signup", ts("2024-01-02 00:00:00")),
      (2L, "purchase", ts("2024-01-03 00:00:00")),
      // user 3: purchase only before signup -> never converts
      (3L, "signup", ts("2024-01-05 00:00:00")),
      (3L, "purchase", ts("2024-01-04 00:00:00")),
      // user 4: purchase, no signup -> not counted
      (4L, "purchase", ts("2024-01-01 00:00:00")))
      .toDF("user_id", "event_type", "ts")
    val got = EventOps.conversionLatency(ev, "user_id", "event_type", "ts",
        "signup", "purchase")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("0_lt_1h" -> 1L, "2_1d_7d" -> 1L), got.toString)
    intercept[IllegalArgumentException](
      EventOps.conversionLatency(ev, "user_id", "event_type", "ts", "signup", "signup"))
  }

  test("peakConcurrency: sweep-line peaks per day, exclusive ends, midnight clamp") {
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // day 1: three overlapping 300s presences -> peak 3
      (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 10:01:00")),
      (3L, ts("2024-01-01 10:02:00")),
      // exactly at 1's end (10:05:00): ends are exclusive, so 4 never
      // overlaps 1 — with +1 ordered before -1 at the tie, the sweep
      // would see a phantom 4-way overlap at this instant
      (4L, ts("2024-01-01 10:05:00")),
      // day 2: isolated events -> peak 1; 23:59 clamps at midnight and
      // must NOT leak a -1 into day 3
      (5L, ts("2024-01-02 08:00:00")),
      (6L, ts("2024-01-02 23:59:00")))
      .toDF("event_id", "ts")
    val got = EventOps.peakConcurrency(ev, "ts", ttlSec = 300)
      .collect().map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("2024-01-01" -> ((4L, 3L)), "2024-01-02" -> ((2L, 1L))), got.toString)
    // repartition-stable (window order is total within a day's points)
    val again = EventOps.peakConcurrency(ev.repartition(5), "ts", ttlSec = 300)
      .collect().map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(again == got)
    intercept[IllegalArgumentException](EventOps.peakConcurrency(ev, "ts", ttlSec = 0))
  }

  test("cusumDrift: closed form matches the hand-run recurrence, flags the sustained shift") {
    // type a: 4 days at 10 then 4 days at 30 (n_days=8, total=160, mean=20).
    // Hand recurrence S_i = max(0, S_{i-1} + x_i - 20): 0,0,0,0,10,20,30,40.
    // Scaled by n_days: cusum = 0,0,0,0,80,160,240,320; z=1 threshold =
    // total = 160 -> drift on the last two days only (240, 320; 160 is not >)
    def day(d: Int, i: Int) =
      new Timestamp(86400000L * d + i * 1000L)
    val rows = (0 until 4).flatMap(d => (0 until 10).map(i => ("a", day(d, i)))) ++
      (4 until 8).flatMap(d => (0 until 30).map(i => ("a", day(d, i)))) ++
      (0 until 8).map(d => ("b", day(d, 0))) :+ (("a", null: Timestamp))
    val got = EventOps.cusumDrift(rows.toDF("event_type", "ts"), "event_type", "ts", z = 1)
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 86400000L) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    val aCusum = (0L to 7L).map(d => got(("a", d))._2)
    assert(aCusum == Seq(0L, 0L, 0L, 0L, 80L, 160L, 240L, 320L), aCusum)
    assert((0L to 7L).map(d => got(("a", d))._3) ==
      Seq(false, false, false, false, false, false, true, true))
    // a constant series never accumulates and never drifts
    assert((0L to 7L).forall(d => got(("b", d)) == ((1L, 0L, false))))
    assert(got.size == 16, "NULL ts contributes no day row")
    intercept[IllegalArgumentException](
      EventOps.cusumDrift(rows.toDF("event_type", "ts"), "event_type", "ts", z = 0))
  }

  test("seasonalAnomaly: slot-relative flags, epoch slot ids, degenerate k=1") {
    def hr(h: Int, i: Int) = new Timestamp(h * 3600000L + i * 1000L)
    // type a, slot 0 (epoch hours 0, 168, 336, 504 — four "weeks" of the
    // Thursday-00:00 slot): counts 10, 10, 10, 30. k=4 tot=60 ss=1200;
    // z=1 gate (k·n−tot)² > (k·ss−tot²) = 1200: n=30 → 60² = 3600 > 1200
    // flags; n=10 → (−20)² = 400 does not.
    val rows =
      (0 until 3).flatMap(w => (0 until 10).map(i => ("a", hr(w * 168, i)))) ++
        (0 until 30).map(i => ("a", hr(3 * 168, i))) ++
        Seq(("b", hr(5, 0))) :+ (("a", null: Timestamp))
    val got = EventOps.seasonalAnomaly(rows.toDF("event_type", "ts"),
      "event_type", "ts", z = 1)
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 3600000L) ->
        ((r.getInt(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got.size == 5, "NULL ts contributes no bucket")
    assert(got(("a", 504L)) == ((0, 30L, true)), got.toString)
    (0 until 3).foreach(w => assert(got(("a", w * 168L)) == ((0, 10L, false))))
    // a single-instance slot has zero variance and n = mean: never flags
    assert(got(("b", 5L)) == ((5, 1L, false)))
    intercept[IllegalArgumentException](
      EventOps.seasonalAnomaly(rows.toDF("event_type", "ts"), "event_type", "ts", z = 0))
  }

  test("botGate: metronome CV gate, rate gate, zero-gap degenerate, minGaps floor") {
    def at(s: Long) = new Timestamp(s * 1000L)
    val rows =
      // user 1: 21 events exactly 60s apart -> 20 equal gaps, CV 0 ->
      // metronome; 21 distinct minutes so rate stays human
      (0 until 21).map(i => (1L, at(i * 60L))) ++
        // user 2: only 5 events -> n_gaps below the floor, never metronome
        Seq(0L, 7L, 300L, 301L, 5000L).map(s => (2L, at(s))) ++
        // user 3: 15 events inside one minute -> rate bot; 14 gaps < floor
        (0 until 15).map(i => (3L, at(i.toLong))) ++
        // user 4: 25 identical timestamps -> S = 0 degenerate, both gates
        Seq.fill(25)((4L, at(100000L)))
    val got = EventOps.botGate(rows.toDF("user_id", "ts"), "user_id", "ts")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4), r.getBoolean(5), r.getBoolean(6)))).toMap
    assert(got(1L) == ((21L, 21L, 20L, false, true, true)), got(1L).toString)
    assert(got(2L) == ((5L, 3L, 4L, false, false, false)), got(2L).toString)
    assert(got(3L) == ((15L, 1L, 14L, true, false, true)), got(3L).toString)
    assert(got(4L) == ((25L, 1L, 24L, true, true, true)), got(4L).toString)
    intercept[IllegalArgumentException](
      EventOps.botGate(rows.toDF("user_id", "ts"), "user_id", "ts", cvTolPercent = 0))
  }

  test("transitionAccuracy: argmax successor, tie to smallest type, exact hit rates") {
    def at(s: Long) = new Timestamp(s * 1000L)
    // user 1: a->b, b->a, a->b, b->c ; user 2: a->b
    // transitions: a->b x3 ; b->a x1, b->c x1 (tie -> predicted 'a')
    val rows = Seq(
      (1L, "a", at(0), 10L), (1L, "b", at(1), 11L), (1L, "a", at(2), 12L),
      (1L, "b", at(3), 13L), (1L, "c", at(4), 14L),
      (2L, "a", at(0), 20L), (2L, "b", at(1), 21L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = EventOps.transitionAccuracy(rows, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got("a") == (("b", 3L, 3L, 1.0)), got.toString)
    assert(got("b") == (("a", 2L, 1L, 0.5)), got.toString)
    assert(!got.contains("c"), "terminal type has no outgoing observations")
    // same-timestamp ties order by event_id: (u3: x@0#1, y@0#2) -> x->y
    val tie = Seq((3L, "y", at(0), 2L), (3L, "x", at(0), 1L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val t2 = EventOps.transitionAccuracy(tie, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(t2.toSeq == Seq(("x", "y")), t2.mkString)
  }

  test("cohortLtv: cumulative per-cohort curve, pre-signup revenue excluded, never-signed-up excluded") {
    def ts(s: String) = Timestamp.valueOf(s)
    // W0 = week of Mon 2024-01-01, W1 = 2024-01-08
    val rows = Seq(
      (1L, "signup", ts("2024-01-01 10:00:00"), 0.0),
      (1L, "purchase", ts("2024-01-02 10:00:00"), 10.0),   // W0 offset 0
      (1L, "purchase", ts("2024-01-08 10:00:00"), 20.0),   // offset 1
      (2L, "signup", ts("2024-01-03 10:00:00"), 0.0),
      (2L, "purchase", ts("2024-01-09 10:00:00"), 5.0),    // offset 1
      (3L, "signup", ts("2024-01-08 10:00:00"), 0.0),
      (3L, "purchase", ts("2024-01-10 10:00:00"), 7.5),    // W1 offset 0
      (5L, "signup", ts("2024-01-09 10:00:00"), 0.0),
      (5L, "purchase", ts("2024-01-04 10:00:00"), 99.0),   // BEFORE signup week
      (4L, "purchase", ts("2024-01-01 10:00:00"), 50.0))   // never signed up
      .toDF("user_id", "event_type", "ts", "value")
    val got = EventOps.cohortLtv(rows, "user_id", "event_type", "ts", "value",
        "signup", "purchase")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.size == 3, got.toString)
    assert(got(("2024-01-01", 0)) == ((2L, 10.0, 5.0)), got.toString)
    assert(got(("2024-01-01", 1)) == ((2L, 35.0, 17.5)))
    // u5's pre-signup purchase is excluded, but u5 still dilutes the
    // cohort denominator
    assert(got(("2024-01-08", 0)) == ((2L, 7.5, 3.75)))
  }

  test("changepoint: CUSUM maximizer localizes the shift day, constant series never drifts") {
    // s17's fixture: type a runs 4 days at 10 then 4 at 30 — cusum
    // 0,0,0,0,80,160,240,320 peaks on the LAST day (cusum grows while
    // the shift persists); drift fired (z=1: 240, 320 > 160)
    def day(d: Int, i: Int) = new Timestamp(86400000L * d + i * 1000L)
    val rows = (0 until 4).flatMap(d => (0 until 10).map(i => ("a", day(d, i)))) ++
      (4 until 8).flatMap(d => (0 until 30).map(i => ("a", day(d, i)))) ++
      (0 until 8).map(d => ("b", day(d, 0)))
    val got = EventOps.changepoint(rows.toDF("event_type", "ts"),
        "event_type", "ts", z = 1)
      .collect().map(r => r.getString(0) ->
        ((r.getTimestamp(1).getTime / 86400000L, r.getLong(2), r.getLong(3),
          r.getBoolean(4)))).toMap
    assert(got("a") == ((7L, 320L, 8L, true)), got.toString)
    // constant series: cusum all 0, tie -> EARLIEST day, no drift
    assert(got("b") == ((0L, 0L, 8L, false)), got.toString)
  }
}
