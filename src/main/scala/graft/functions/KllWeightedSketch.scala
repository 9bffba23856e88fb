package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mutable buffer for [[KllWeightedSketch]]: the current level plus the
  * surviving rows as parallel (maxLevel, value, hash, weight) arrays.
  * Arrays start at k+1 (the insert-then-raise discipline's bound below
  * level 61) and GROW only in the documented l = 61 fallback — rows with
  * h < w survive every level (measure-zero under the md5 coin: w ≤ 2^40
  * vs a uniform 60-bit h), where the column engine likewise accepts a
  * sample larger than k rather than lose the quantile entirely.
  */
case class KllWBuf(var level: Int, var n: Int, var mls: Array[Byte],
    var vs: Array[Double], var hs: Array[Long], var ws: Array[Long])

/** Output of [[KllWeightedSketch]]: sample level/size, the sketch's
  * weight-mass estimate t_total (= Σ survivors·2^lvl; exactly Σw at
  * lvl = 0), and the weighted quantile read-offs aligned with the
  * constructor's per-mille points (empty when no valid rows).
  */
case class KllWOut(lvl: Long, n_sample: Long, t_total: Long,
    est: Seq[Double])

/** Mergeable WEIGHTED portable quantile sketch — the aggregate/streaming
  * form of [[graft.operators.Profile.kllQuantileWeighted]] (systematic
  * sampling of the weight expansion off the 60-bit md5 row coin; see
  * that operator's doc for the derivation), completing the weighted
  * family's global/grouped/windowed rack the way [[KllSketch]] does for
  * the unweighted one. Same portable contract: the JVM integer math here
  * is spec-pinned identical to the column formulation, so every output
  * value replays in the DuckDB oracle.
  *
  * State: the surviving rows at the current level — a row with weight w
  * and coin h survives level l iff h mod 2^l < w, which is MONOTONE in l
  * (h mod 2^l only grows), so each row has a closed-form max surviving
  * level `ml` and the state is exactly {rows : ml ≥ level}. Insert
  * appends rows with ml ≥ level and raises the level (dropping
  * no-longer-surviving rows in place) while more than k rows survive;
  * merge takes the max level and replays the smaller side. Level-raising
  * is forced only by count, and per-level survivor counts only grow
  * under element addition, so the final (level, survivors) pair is the
  * column path's (l*, sample) for the union multiset regardless of
  * arrival or merge order — the pure-function-of-the-multiset property
  * hash-replay requires.
  *
  * Input: (h, v, w) — the portable row coin ([[graft.operators.Dedup
  * .portableHash]] of the row id, prefix "kllw:"), the value, and the
  * integer weight. Rows with w outside [1, 2^40] DROP (the column
  * engine's contract — null/zero/negative weights contribute nothing);
  * a non-60-bit hash throws (caller bug, same as [[KllSketch]]).
  * Read-off: each survivor carries contrib = (w div 2^l* + [h mod 2^l* <
  * w mod 2^l*])·2^l* expanded units; the q-per-mille estimate is the
  * minimum v whose cumulative contrib (value-sorted) reaches rank
  * max(1, ⌈q·t_total/1000⌉) — exact weighted type-1 quantiles whenever
  * every row survives at l* = 0.
  */
class KllWeightedSketch(k: Int, qPermille: Seq[Int])
    extends Aggregator[(Long, Double, Long), KllWBuf, KllWOut] {
  require(k >= 16, s"k must be >= 16, got $k")
  require(qPermille.nonEmpty && qPermille.forall(q => q >= 1 && q <= 1000),
    "quantile points are per-mille in [1,1000]")

  private val MaxW = 1L << 40

  override def zero: KllWBuf =
    KllWBuf(0, 0, new Array[Byte](k + 1), new Array[Double](k + 1),
      new Array[Long](k + 1), new Array[Long](k + 1))

  /** Closed-form max surviving level, bit-identical to the column
    * engine's SQL projection (Profile.kllQuantileWeighted): below
    * b = bitlength(w) survival is automatic; at and above b it needs
    * h's bits [b, l) all zero plus h mod 2^b < w — so ml = b−1 when
    * h mod 2^b ≥ w, else b + (trailing zeros of h div 2^b), capped 61.
    */
  private def maxLevelOf(h: Long, w: Long): Int = {
    if (h < 0L || h >= (1L << 60))
      throw new IllegalArgumentException(
        s"kll_quantile_w input must be a 60-bit portable hash in " +
          s"[0, 2^60) — got $h; hash with graft's portable md5 family " +
          "(Dedup.portableHash), not xxhash64/hash()")
    val b = 64 - java.lang.Long.numberOfLeadingZeros(w)
    if ((h & ((1L << b) - 1)) >= w) b - 1
    else {
      val hb = h >>> b
      if (hb == 0L) 61
      else math.min(61, b + java.lang.Long.numberOfTrailingZeros(hb))
    }
  }

  /** Drop rows whose max level fell below the buffer's level, in place. */
  private def compact(b: KllWBuf): Unit = {
    var w = 0
    var i = 0
    while (i < b.n) {
      if (b.mls(i) >= b.level) {
        b.mls(w) = b.mls(i)
        b.vs(w) = b.vs(i)
        b.hs(w) = b.hs(i)
        b.ws(w) = b.ws(i)
        w += 1
      }
      i += 1
    }
    b.n = w
  }

  /** Raise the level (minimally) until ≤ k rows survive, stopping at the
    * column engine's l = 61 fallback (which accepts an oversize sample).
    */
  private def raise(b: KllWBuf): Unit =
    while (b.n > k && b.level < 61) {
      b.level += 1
      compact(b)
    }

  /** Append one surviving row, growing the arrays only in the l = 61
    * fallback where the k+1 bound no longer holds.
    */
  private def append(b: KllWBuf, ml: Int, v: Double, h: Long,
      w: Long): Unit = {
    if (b.n == b.vs.length) {
      val cap = b.vs.length * 2
      b.mls = java.util.Arrays.copyOf(b.mls, cap)
      b.vs = java.util.Arrays.copyOf(b.vs, cap)
      b.hs = java.util.Arrays.copyOf(b.hs, cap)
      b.ws = java.util.Arrays.copyOf(b.ws, cap)
    }
    b.mls(b.n) = ml.toByte
    b.vs(b.n) = v
    b.hs(b.n) = h
    b.ws(b.n) = w
    b.n += 1
    raise(b)
  }

  override def reduce(b: KllWBuf, in: (Long, Double, Long)): KllWBuf = {
    val w = in._3
    if (w >= 1L && w <= MaxW) {
      val ml = maxLevelOf(in._1, w)
      if (ml >= b.level) append(b, ml, in._2, in._1, w)
    }
    b
  }

  override def merge(a: KllWBuf, b: KllWBuf): KllWBuf = {
    if (b.level > a.level) {
      a.level = b.level
      compact(a)
    }
    var i = 0
    while (i < b.n) {
      if (b.mls(i) >= a.level) append(a, b.mls(i), b.vs(i), b.hs(i), b.ws(i))
      i += 1
    }
    a
  }

  override def finish(b: KllWBuf): KllWOut = {
    if (b.n == 0) return KllWOut(b.level.toLong, 0L, 0L, Seq.empty)
    val l = b.level
    val mask = (1L << l) - 1L
    // (value, contrib) pairs, value-sorted — same integer contrib as the
    // column engine's samp projection
    val pairs = new Array[(Double, Long)](b.n)
    var i = 0
    while (i < b.n) {
      val w = b.ws(i)
      val h = b.hs(i)
      val c = ((w >>> l) +
        (if ((h & mask) < (w & mask)) 1L else 0L)) << l
      pairs(i) = (b.vs(i), c)
      i += 1
    }
    java.util.Arrays.sort(pairs, new java.util.Comparator[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int =
        java.lang.Double.compare(a._1, b._1)
    })
    var t = 0L
    pairs.foreach(p => t += p._2)
    val est = qPermille.map { q =>
      val r = math.max(1L, (q.toLong * t + 999L) / 1000L)
      var cum = 0L
      var j = 0
      var out = pairs(b.n - 1)._1
      var found = false
      while (j < b.n && !found) {
        cum += pairs(j)._2
        if (cum >= r) { out = pairs(j)._1; found = true }
        j += 1
      }
      out
    }
    KllWOut(l.toLong, b.n.toLong, t, est)
  }

  override def bufferEncoder: Encoder[KllWBuf] = Encoders.product[KllWBuf]
  override def outputEncoder: Encoder[KllWOut] = Encoders.product[KllWOut]
}

object KllWeightedSketch {
  /** SQL-name registration (the [[KllSketch]] pattern):
    * `kll_quantile_w_k<k>(hash, value, weight)` per capacity, reading
    * off the standard (p50, p90, p99) points, for SQL-only clients.
    */
  def register(spark: org.apache.spark.sql.SparkSession,
      ks: Seq[Int] = Seq(256, 1024)): Unit =
    ks.foreach { k =>
      spark.udf.register(s"kll_quantile_w_k$k",
        org.apache.spark.sql.functions.udaf(
          new KllWeightedSketch(k, Seq(500, 900, 990))))
    }
}
