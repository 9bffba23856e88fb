package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mutable buffer for [[KllSketch]]: the current level plus the level-l*
  * sample as parallel (level, value) arrays of fixed capacity k+1 — the
  * insert-then-raise discipline never holds more than k+1 items, so the
  * arrays are allocated once and the serialized state is O(k) per group
  * regardless of input size.
  */
case class KllBuf(var level: Int, var n: Int, lvls: Array[Byte],
    vs: Array[Double])

/** Output of [[KllSketch]]: the sample's level and size plus the
  * quantile read-offs aligned with the constructor's per-mille points
  * (empty when the group had no non-null values).
  */
case class KllOut(lvl: Long, n_sample: Long, est: Seq[Double])

/** Mergeable PORTABLE QUANTILE sketch over pre-hashed 60-bit row coins —
  * the aggregate/streaming form of [[graft.operators.Profile
  * .kllQuantile]] (the KLL sampler tier, Karnin, Lang & Liberty 2016
  * §2.1, with the compactor's parity coin replaced by the hash bit so
  * the state is a pure function of the input multiset — see that
  * operator's doc for the design argument). Same portable contract as
  * [[HllSketch]]: the JVM arithmetic here is spec-pinned identical to
  * the column formulation's `bin()`/`ltrim`/integer-rank math, so every
  * output value replays in the DuckDB oracle despite being a sketch.
  *
  * State: the level-l* sample itself — at most k+1 (level, value) pairs;
  * each insert that overflows k raises the level and compacts in place
  * (drops items whose hash coin doesn't reach the new level). Merge
  * takes the max level, re-compacts, and replays the smaller side's
  * items through the same insert-raise path; the final (level, sample)
  * pair is provably the column path's (l*, S_l*) for the union multiset
  * — levels only ratchet up, and min-l*-such-that-|S_l*| ≤ k is monotone
  * under element addition, so merge ORDER cannot change the result (the
  * property a shuffle-merged aggregate needs for deterministic replay).
  *
  * Input: (h, v) — the 60-bit portable row coin ([[graft.operators.Dedup
  * .portableHash]] of the row id) and the value. Values pass through
  * untouched (ordering only — no arithmetic), so read-offs are exact
  * sample elements. Output: (lvl, n_sample, est) with est aligned to
  * `qPermille` (type-1 read-off at rank ⌈q·n⌉ of the value-sorted
  * sample; exact quantiles whenever the group fits in k).
  */
class KllSketch(k: Int, qPermille: Seq[Int])
    extends Aggregator[(Long, Double), KllBuf, KllOut] {
  require(k >= 16, s"k must be >= 16, got $k")
  require(qPermille.nonEmpty && qPermille.forall(q => q >= 1 && q <= 1000),
    "quantile points are per-mille in [1,1000]")

  override def zero: KllBuf =
    KllBuf(0, 0, new Array[Byte](k + 1), new Array[Double](k + 1))

  /** Leading-zero count of the 60-bit portable hash — the row's sampling
    * coin, bit-identical to the column path's `60 − length(ltrim(bin(h),
    * '0'))` (h = 0 defines level 60). Same input contract (and the same
    * contract message) as [[HllSketch]]: full-width or negative hashes
    * are a caller bug, named instead of corrupting the sample.
    */
  private def levelOf(h: Long): Int = {
    if (h < 0L || h >= (1L << 60))
      throw new IllegalArgumentException(
        s"kll_quantile input must be a 60-bit portable hash in [0, 2^60)" +
          s" — got $h; hash with graft's portable md5 family " +
          "(Dedup.portableHash), not xxhash64/hash()")
    if (h == 0L) 60
    else 60 - (64 - java.lang.Long.numberOfLeadingZeros(h))
  }

  /** Drop items below the buffer's current level, in place. */
  private def compact(b: KllBuf): Unit = {
    var w = 0
    var i = 0
    while (i < b.n) {
      if (b.lvls(i) >= b.level) {
        b.lvls(w) = b.lvls(i)
        b.vs(w) = b.vs(i)
        w += 1
      }
      i += 1
    }
    b.n = w
  }

  /** Raise the level (minimally) until the sample fits in k. */
  private def raise(b: KllBuf): Unit =
    while (b.n > k) {
      b.level += 1
      compact(b)
    }

  override def reduce(b: KllBuf, in: (Long, Double)): KllBuf = {
    val lvl = levelOf(in._1)
    if (lvl >= b.level) {
      b.lvls(b.n) = lvl.toByte
      b.vs(b.n) = in._2
      b.n += 1
      raise(b)
    }
    b
  }

  override def merge(a: KllBuf, b: KllBuf): KllBuf = {
    if (b.level > a.level) {
      a.level = b.level
      compact(a)
    }
    var i = 0
    while (i < b.n) {
      if (b.lvls(i) >= a.level) {
        a.lvls(a.n) = b.lvls(i)
        a.vs(a.n) = b.vs(i)
        a.n += 1
        raise(a)
      }
      i += 1
    }
    a
  }

  override def finish(b: KllBuf): KllOut = {
    if (b.n == 0) return KllOut(b.level.toLong, 0L, Seq.empty)
    val vs = java.util.Arrays.copyOf(b.vs, b.n)
    java.util.Arrays.sort(vs)
    val n = b.n.toLong
    KllOut(b.level.toLong, n, qPermille.map { q =>
      val r = math.max(1L, (q.toLong * n + 999L) / 1000L)
      vs((r - 1).toInt)
    })
  }

  override def bufferEncoder: Encoder[KllBuf] = Encoders.product[KllBuf]
  override def outputEncoder: Encoder[KllOut] = Encoders.product[KllOut]
}

object KllSketch {
  /** SQL-name registration (the [[HllSketch]]/[[TopK]] pattern):
    * `kll_quantile_k<k>(hash, value)` per capacity, reading off the
    * standard (p50, p90, p99) points, for SQL-only clients.
    */
  def register(spark: org.apache.spark.sql.SparkSession,
      ks: Seq[Int] = Seq(256, 1024)): Unit =
    ks.foreach { k =>
      spark.udf.register(s"kll_quantile_k$k",
        org.apache.spark.sql.functions.udaf(
          new KllSketch(k, Seq(500, 900, 990))))
    }
}
