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

  test("asofJoin keeps all left rows and adds only the suffixed column") {
    val left = Seq((1L, 7L, ts(1))).toDF("event_id", "user_id", "ts")
    val right = Seq((7L, ts(0), 42.0)).toDF("user_id", "ts", "pval")
    val out = Temporal.asofJoin(left, right, Seq("user_id"), "ts", Seq("pval"))
    assert(out.columns.toSeq == Seq("event_id", "user_id", "ts", "pval_asof"))
    assert(out.count() == 1)
  }
}
