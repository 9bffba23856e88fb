package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively. */
object Temporal {

  /** Time-series resampling with forward fill: a dense `bucketSec` grid per
    * key spanning that key's observed range, each bucket carrying its event
    * count (0 for gaps) and the most recent non-gap bucket max carried
    * forward — the resample/ffill step feature pipelines run before
    * training on sensor/metric streams. Shape: two keyed aggregates (bucket
    * stats, per-key range), one `sequence` explode for the grid (rows ∝
    * span/bucket, generated distributed — no driver loop), a left join on
    * (key, bucket), and one fill window per key — every stage shuffles on
    * the key only, never on the grid size.
    */
  def resampleFill(events: DataFrame, byCol: String, tsCol: String,
      valCol: String, bucketSec: Long = 900L): DataFrame = {
    val us = bucketSec * 1000000L
    // floor alignment via pmod (NOT `div`, which truncates toward zero):
    // pre-epoch timestamps must land in the bucket STARTING at-or-before
    // them, matching Spark's own window() semantics
    val e = events.selectExpr(s"$byCol AS k",
      s"timestamp_micros(unix_micros($tsCol) - pmod(unix_micros($tsCol), ${us}L)) AS bucket",
      s"$valCol AS v")
    val perBucket = e.groupBy(col("k"), col("bucket"))
      .agg(count(lit(1)).as("n_events"), max(col("v")).as("bucket_max"))
    val grid = e.groupBy(col("k"))
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(col("k"),
        explode(expr(s"sequence(b0, b1, interval $bucketSec second)")).as("bucket"))
    val w = Window.partitionBy(col("k")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perBucket, Seq("k", "bucket"), "left")
      .select(col("k").as(byCol), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("bucket_max"), ignoreNulls = true).over(w).as("filled_max"))
  }

  /** As-of (point-in-time) left join: for every left row, attach `valueCols`
    * from the latest right row with the same `by` keys and
    * `right.timeCol <= left.timeCol`; null when no prior right row exists.
    *
    * Built by composition (preference tier (a) of the extension ladder —
    * no custom physical operator needed): tag and union both sides, then a
    * running `last(_, ignoreNulls)` window ordered by (time, side) carries
    * the most recent right values forward into left rows. One shuffle on the
    * `by` keys — the same cost as any keyed window, with none of the
    * unbounded range-join blowup a naive `l.ts >= r.ts` join would plan.
    * Right rows sort before left rows at equal timestamps, so the join is
    * inclusive (ties match), like DuckDB/pandas `ASOF JOIN`.
    *
    * Right rows should be unique per (by, timeCol) — pre-aggregate
    * otherwise, or ties resolve by sort order of `valueCols`.
    *
    * The fill carries ONE struct holding all of the right row's values, not
    * per-column fills: independent `last(_, ignoreNulls)` per column would
    * tear rows apart when right values contain nulls (a null field would
    * fall through to an OLDER right row's value, producing a combined row
    * that never existed — and, through [[asofJoinTolerance]], letting a
    * stale value pass the tolerance gate). A null field inside the latest
    * right row stays null, as in pandas `merge_asof`.
    */
  def asofJoin(left: DataFrame, right: DataFrame, by: Seq[String],
      timeCol: String, valueCols: Seq[String], suffix: String = "_asof"): DataFrame = {
    // right value columns are renamed to their suffixed output names BEFORE
    // the union: if the left side happens to carry a column with a valueCol's
    // name, it must neither feed the fill window nor be dropped from the
    // output (a silent-corruption hazard flagged in review)
    val outCols = valueCols.map(_ + suffix)
    outCols.foreach(c => require(!left.columns.contains(c),
      s"left side already has a column named '$c' — pick a different suffix"))
    require(!left.columns.contains("__rv"), "column __rv reserved")
    val l = left.withColumn("__side", lit(1))
    val r = right
      .select((by.map(col) :+ col(timeCol)) :+
        struct(valueCols.map(c => col(c).as(c + suffix)): _*).as("__rv"): _*)
      .withColumn("__side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window
      .partitionBy(by.map(col): _*)
      .orderBy(col(timeCol), col("__side"), col("__rv"))
      .rowsBetween(Window.unboundedPreceding, 0)
    u.withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        outCols.map(c => col(s"__rv.$c").as(c)): _*)
  }

  /** [[asofJoin]] with a match-window bound (pandas `merge_asof
    * tolerance`): the matched right row must additionally satisfy
    * `left.timeCol - right.timeCol <= tolerance` — stale quotes/events
    * older than the window do NOT carry forward. Composed on top of
    * [[asofJoin]] by filling the right row's own timestamp alongside the
    * values and nulling the values where it falls outside the window —
    * same single keyed-window shuffle, no extra join.
    */
  def asofJoinTolerance(left: DataFrame, right: DataFrame, by: Seq[String],
      timeCol: String, valueCols: Seq[String], tolerance: String,
      suffix: String = "_asof"): DataFrame = {
    val rts = "__rts"
    require(!left.columns.contains(rts + suffix), s"column $rts$suffix reserved")
    val joined = asofJoin(left, right.withColumn(rts, col(timeCol)),
      by, timeCol, valueCols :+ rts, suffix)
    val inWindow = col(rts + suffix).isNotNull &&
      col(timeCol) <= col(rts + suffix) + expr(s"INTERVAL $tolerance")
    valueCols.map(_ + suffix).foldLeft(joined) { (df, c) =>
      df.withColumn(c, when(inWindow, col(c)))
    }.drop(rts + suffix)
  }

  /** Forward as-of join: for every left row, attach `valueCols` from the
    * EARLIEST right row with the same `by` keys and
    * `right.timeCol >= left.timeCol` (next-event semantics — "the purchase
    * that followed this click"); null when no later right row exists.
    * Mirror of [[asofJoin]] with the fill window looking forward: left rows
    * sort before right rows at equal timestamps so ties match inclusively.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, by: Seq[String],
      timeCol: String, valueCols: Seq[String],
      suffix: String = "_next"): DataFrame = {
    val outCols = valueCols.map(_ + suffix)
    outCols.foreach(c => require(!left.columns.contains(c),
      s"left side already has a column named '$c' — pick a different suffix"))
    require(!left.columns.contains("__rv"), "column __rv reserved")
    val l = left.withColumn("__side", lit(0))
    val r = right
      .select((by.map(col) :+ col(timeCol)) :+
        struct(valueCols.map(c => col(c).as(c + suffix)): _*).as("__rv"): _*)
      .withColumn("__side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window
      .partitionBy(by.map(col): _*)
      .orderBy(col(timeCol), col("__side"), col("__rv"))
      .rowsBetween(0, Window.unboundedFollowing)
    u.withColumn("__rv", first(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__side") === 0)
      .select(left.columns.toIndexedSeq.map(col) ++
        outCols.map(c => col(s"__rv.$c").as(c)): _*)
  }

  /** Nearest-direction as-of join (pandas `merge_asof
    * direction='nearest'`): each left row takes whichever right row —
    * latest-at-or-before or earliest-at-or-after — is temporally closer,
    * ties to the backward match (pandas' rule). Composed from ONE backward
    * and ONE forward pass (each a single keyed-window shuffle), both
    * carrying the matched right timestamp so the pick is a plain
    * projection. Completes the backward / forward / tolerance / nearest
    * direction family.
    */
  def asofJoinNearest(left: DataFrame, right: DataFrame, by: Seq[String],
      timeCol: String, valueCols: Seq[String],
      suffix: String = "_near"): DataFrame = {
    valueCols.map(_ + suffix).foreach(c => require(!left.columns.contains(c),
      s"left side already has a column named '$c' — pick a different suffix"))
    require(!right.columns.contains("__rts"), "column __rts reserved")
    val withTs = right.withColumn("__rts", col(timeCol))
    val back = asofJoin(left, withTs, by, timeCol,
      valueCols :+ "__rts", "_b")
    val both = asofJoinForward(back, withTs, by, timeCol,
      valueCols :+ "__rts", "_f")
    // distance compare in integer MICROS for timestamps (a micros/1e6
    // double is inexact and could flip a near-tie differently than the
    // oracle's integer epoch arithmetic), plain double for numeric axes
    val isTs = both.schema(timeCol).dataType
      .isInstanceOf[org.apache.spark.sql.types.TimestampType]
    def num(c: Column): Column =
      if (isTs) unix_micros(c) else c.cast("double")
    val lts = num(col(timeCol))
    val (tb, tf) = (num(col("__rts_b")), num(col("__rts_f")))
    val pickBack = col("__rts_f").isNull ||
      (col("__rts_b").isNotNull && (lts - tb) <= (tf - lts))
    both.select(left.columns.toIndexedSeq.map(col) ++ valueCols.map(c =>
      when(pickBack, col(c + "_b")).otherwise(col(c + "_f"))
        .as(c + suffix)): _*)
  }
}
