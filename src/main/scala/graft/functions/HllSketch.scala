package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable HYPERLOGLOG register sketch (Flajolet et al. 2007) over
  * pre-hashed 60-bit keys — the aggregate form of
  * [[graft.operators.Profile.hllDistinct]] for per-group / per-window
  * use, where that operator's global register aggregate doesn't apply.
  * Same portable contract: register index = top `p` hash bits, ρ =
  * leftmost-1 position of the remaining 60−p bits, and the finish fold
  * is the fixed-point raw estimator (α as a micro integer, the harmonic
  * sum as an exact BIGINT), so every output value replays in the DuckDB
  * oracle despite being a sketch — [[KmvBottomK]]'s posture, at HLL's
  * O(m)-bytes-per-group state instead of bottom-k's O(k) longs.
  *
  * The buffer is the m-byte register array itself; merge is element-wise
  * max (the HLL union), so partial aggregation shuffles m bytes per
  * partition and group regardless of input size, and the same merge path
  * serves batch GROUP BY and streaming window state. JVM bit ops here
  * are bit-identical to the column formulation's `DIV`/`pmod`/`bin`
  * arithmetic (spec-pinned against [[graft.operators.Profile
  * .hllDistinct]] on the same keys).
  *
  * Input: the already-hashed long ([[graft.operators.Dedup.portableHash]]
  * output — hashing stays in codegen'd expressions). Output:
  * (v_zero, t_fx, est_raw) — the raw-regime estimate plus the fields a
  * caller needs for the small-range linear-counting branch (see
  * hllDistinct's doc for why ln() is deliberately left to the caller).
  */
class HllSketch(p: Int)
    extends Aggregator[Long, Array[Byte], (Long, Long, Long)] {
  require(p >= 4 && p <= 14, s"p must be in [4,14], got $p")

  private val m = 1 << p
  private val wBits = 60 - p
  private val wMask = (1L << wBits) - 1
  private val alphaMicro = graft.operators.Profile.hllAlphaMicro(p)

  override def zero: Array[Byte] = new Array[Byte](m)

  override def reduce(b: Array[Byte], h: Long): Array[Byte] = {
    // h must be a portableHash value: non-negative, < 2^60 (so >>> equals
    // the column path's integer DIV). Validated because the SQL-registered
    // form is reachable by clients feeding a full-width hash (xxhash64 is
    // the classic mistake) — without the check that reads as an
    // ArrayIndexOutOfBoundsException deep in the aggregate instead of a
    // contract message.
    if (h < 0L || h >= (1L << 60))
      throw new IllegalArgumentException(
        s"hll_sketch input must be a 60-bit portable hash in [0, 2^60) — " +
          s"got $h; hash with graft's portable md5 family " +
          "(Dedup.portableHash), not xxhash64/hash()")
    val reg = (h >>> wBits).toInt
    val w = h & wMask
    val rho =
      if (w == 0L) wBits + 1
      else wBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
    if (rho > b(reg)) b(reg) = rho.toByte
    b
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (b(i) > a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(b: Array[Byte]): (Long, Long, Long) = {
    var nPresent = 0L
    var tPresent = 0L
    var i = 0
    while (i < m) {
      val mj = b(i)
      if (mj > 0) {
        nPresent += 1
        tPresent += 1L << (wBits + 1 - mj)
      }
      i += 1
    }
    val tFx = tPresent + (m - nPresent) * (1L << (wBits + 1))
    // BigInt: alphaMicro·m²·2^(wBits+1) exceeds Long for p ≥ 8 (the
    // column path uses DECIMAL(38,0) for the same reason)
    val est = (BigInt(alphaMicro) * m * m * (BigInt(1) << (wBits + 1)) /
      tFx / 1000000).toLong
    (m - nPresent, tFx, est)
  }

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[(Long, Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaLong)
}

object HllSketch {
  /** SQL-name registration (the [[graft.functions.TopK]]/[[CountMin]]
    * pattern): `hll_sketch_p<p>(hash)` per precision, for SQL-only
    * clients. Input is the portableHash long; output the
    * (v_zero, t_fx, est_raw) struct.
    */
  def register(spark: org.apache.spark.sql.SparkSession,
      ps: Seq[Int] = Seq(8, 12)): Unit =
    ps.foreach { p =>
      spark.udf.register(s"hll_sketch_p$p",
        org.apache.spark.sql.functions.udaf(new HllSketch(p)))
    }
}
