package graft


import graft.operators.Temporal
import java.sql.Timestamp

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("asofJoin: latest prior right row per key, inclusive ties, null before first") {
    val left = Seq((1L, 100L, ts(5)), (2L, 100L, ts(15)), (3L, 100L, ts(2)),
      (4L, 200L, ts(10))).toDF("event_id", "user_id", "ts")
    val right = Seq((100L, ts(5), 1.5), (100L, ts(10), 2.5), (200L, ts(20), 9.9))
      .toDF("user_id", "ts", "pval")

    val got = Temporal.asofJoin(left, right, Seq("user_id"), "ts", Seq("pval"))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.get(r.fieldIndex("pval_asof")))))

    assert(got.toSeq == Seq(
      (1L, Some(1.5)),  // tie at 10:05 matches (inclusive)
      (2L, Some(2.5)),  // latest prior is 10:10
      (3L, None),       // before any purchase
      (4L, None)))      // user 200's purchase is later
  }

  test("asofJoinTolerance: stale matches nulled, window boundary inclusive") {
    val left = Seq((1L, 100L, ts(5)), (2L, 100L, ts(15)), (3L, 100L, ts(30)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((100L, ts(5), 1.5)).toDF("user_id", "ts", "pval")

    val got = Temporal.asofJoinTolerance(left, right, Seq("user_id"), "ts",
      Seq("pval"), tolerance = "10 MINUTE")
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.get(r.fieldIndex("pval_asof")))))

    assert(got.toSeq == Seq(
      (1L, Some(1.5)),  // exact-time match
      (2L, Some(1.5)),  // 10 minutes later: boundary is inclusive
      (3L, None)))      // 25 minutes later: stale, nulled
    // the helper column must not leak into the output
    assert(!Temporal.asofJoinTolerance(left, right, Seq("user_id"), "ts",
      Seq("pval"), "10 MINUTE").columns.exists(_.contains("__rts")))
  }

  test("asofJoinForward: earliest later right row, inclusive ties, null after last") {
    val left = Seq((1L, 100L, ts(5)), (2L, 100L, ts(15)), (3L, 100L, ts(2)),
      (4L, 200L, ts(30))).toDF("event_id", "user_id", "ts")
    val right = Seq((100L, ts(5), 1.5), (100L, ts(10), 2.5), (200L, ts(20), 9.9))
      .toDF("user_id", "ts", "pval")

    val got = Temporal.asofJoinForward(left, right, Seq("user_id"), "ts", Seq("pval"))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.get(r.fieldIndex("pval_next")))))

    assert(got.toSeq == Seq(
      (1L, Some(1.5)),  // tie at 10:05 matches (inclusive)
      (2L, None),       // nothing after 10:15 for user 100
      (3L, Some(1.5)),  // next purchase is 10:05
      (4L, None)))      // user 200's purchase was earlier
  }

  test("asofJoin: null right values do NOT tear rows (no fill-through to older rows)") {
    // right rows: (ts=5, a=1.0, b=null), (ts=10, a=null, b=2.0) — the match
    // at ts=12 is the ts=10 ROW: a_asof must be null (that row's value),
    // never 1.0 borrowed from the older row
    val left = Seq((1L, 100L, ts(12))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, ts(5), Some(1.0), Option.empty[Double]),
      (100L, ts(10), Option.empty[Double], Some(2.0)))
      .toDF("user_id", "ts", "a", "b")
    val r = Temporal.asofJoin(left, right, Seq("user_id"), "ts", Seq("a", "b"))
      .collect()(0)
    assert(r.isNullAt(r.fieldIndex("a_asof")))
    assert(r.getDouble(r.fieldIndex("b_asof")) == 2.0)
  }

  test("asofJoinTolerance: a stale value cannot ride a fresher row's timestamp") {
    // latest right row (ts=10) has a NULL value; the older (ts=0) row's
    // value must NOT pass the tolerance gate via the fresh row's timestamp
    val left = Seq((1L, 100L, ts(11))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, ts(0), Some(5.0)),
      (100L, ts(10), Option.empty[Double]))
      .toDF("user_id", "ts", "pval")
    val r = Temporal.asofJoinTolerance(left, right, Seq("user_id"), "ts",
      Seq("pval"), tolerance = "5 MINUTE").collect()(0)
    assert(r.isNullAt(r.fieldIndex("pval_asof")))
  }

  test("asofJoinForward: null right values do not tear rows either") {
    val left = Seq((1L, 100L, ts(1))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, ts(5), Option.empty[Double], Some(7.0)),
      (100L, ts(10), Some(3.0), Option.empty[Double]))
      .toDF("user_id", "ts", "a", "b")
    val r = Temporal.asofJoinForward(left, right, Seq("user_id"), "ts",
      Seq("a", "b")).collect()(0)
    // earliest later row is ts=5: a null there stays null
    assert(r.isNullAt(r.fieldIndex("a_next")))
    assert(r.getDouble(r.fieldIndex("b_next")) == 7.0)
  }

  test("asofJoin preserves a left column that shares a valueCol's name") {
    val left = Seq((1L, 100L, ts(10), 111.0)).toDF("event_id", "user_id", "ts", "pval")
    val right = Seq((100L, ts(5), 2.5)).toDF("user_id", "ts", "pval")
    val out = Temporal.asofJoin(left, right, Seq("user_id"), "ts", Seq("pval"))
      .collect()(0)
    assert(out.getAs[Double]("pval") == 111.0)     // left's own column intact
    assert(out.getAs[Double]("pval_asof") == 2.5)  // fill from the right side
  }

  test("asofJoin rejects a left column that collides with the output name") {
    val left = Seq((1L, 100L, ts(10), 9.0)).toDF("event_id", "user_id", "ts", "pval_asof")
    val right = Seq((100L, ts(5), 2.5)).toDF("user_id", "ts", "pval")
    intercept[IllegalArgumentException] {
      Temporal.asofJoin(left, right, Seq("user_id"), "ts", Seq("pval"))
    }
  }

  test("resampleFill: dense grid, zero-count gaps, forward-filled values") {
    // user 1: events at 10:00 (v=5) and 10:45 (v=8) → 15-min grid of 4
    // buckets with two empty middle buckets carrying 5.0 forward
    val ev = Seq((1L, ts(0), 5.0), (1L, ts(45), 8.0), (2L, ts(30), 1.0))
      .toDF("user_id", "ts", "value")
    val got = Temporal.resampleFill(ev, "user_id", "ts", "value", bucketSec = 900L)
      .orderBy("user_id", "bucket").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 1L, 5.0), (1L, 0L, 5.0), (1L, 0L, 5.0), (1L, 1L, 8.0),
      (2L, 1L, 1.0)))
  }

  test("asofJoinNearest: closer side wins, ties backward, one-sided fallback") {
    val left = Seq((1L, 100L, ts(6)), (2L, 100L, ts(9)), (3L, 100L, ts(7)),
      (4L, 100L, ts(1)), (5L, 200L, ts(30))).toDF("event_id", "user_id", "ts")
    val right = Seq((100L, ts(5), 1.0), (100L, ts(10), 2.0),
      (200L, ts(20), 9.0)).toDF("user_id", "ts", "pval")
    val got = Temporal.asofJoinNearest(left, right, Seq("user_id"), "ts",
        Seq("pval"))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.get(r.fieldIndex("pval_near")))))
    assert(got.toSeq == Seq(
      (1L, Some(1.0)), // 10:06: back 1 min vs fwd 4 min → backward
      (2L, Some(2.0)), // 10:09: back 4 min vs fwd 1 min → forward
      (3L, Some(1.0)), // 10:07: 2 min either way — tie goes backward
      (4L, Some(1.0)), // before any purchase → only the forward match
      (5L, Some(9.0)))) // after the last purchase → only the backward match
  }

  test("asofJoin keeps all left rows and adds only the suffixed column") {
    val left = Seq((1L, 7L, ts(1))).toDF("event_id", "user_id", "ts")
    val right = Seq((7L, ts(0), 42.0)).toDF("user_id", "ts", "pval")
    val out = Temporal.asofJoin(left, right, Seq("user_id"), "ts", Seq("pval"))
    assert(out.columns.toSeq == Seq("event_id", "user_id", "ts", "pval_asof"))
    assert(out.count() == 1)
  }
}
