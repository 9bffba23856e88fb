package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Count-Min sketch (Cormode & Muthukrishnan 2005, "An improved
  * data stream summary: the count-min sketch and its applications"):
  * `depth × width` counters; each value increments one counter per row,
  * the estimate is the MIN over its `depth` counters. Guarantees:
  * never underestimates; overestimate ≤ εN with probability 1 − δ for
  * width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉. Merge is element-wise counter
  * addition — a commutative monoid, so partial aggregation shuffles a
  * fixed `depth·width·8` bytes per partition regardless of input size
  * (the point of a sketch at 100 TB). When no two keys collide in every
  * row (always checkable, and guaranteed-ish for #distinct ≪ width) the
  * estimates are EXACT — the regime the driver's DuckDB oracle checks,
  * like [[ApproxTopK]]; the approximate regime is bound-tested in
  * `SketchSpec`.
  *
  * Row hashes use Kirsch–Mitzenmacher double hashing over the engine-free
  * [[SimHashUtil.hash64]] FNV-1a: `bucket_r = (h1 + r·h2) mod width` with
  * `h1 = hash64(v)`, `h2 = hash64(v ++ "\u0001") | 1`. The same buckets
  * are expressible as a Catalyst expression ([[CountMin.estimateCol]]), so
  * estimation runs as a broadcast join + codegen'd `least(...)` — no UDF,
  * no driver round-trip; `SketchSpec` pins Scala-vs-SQL bucket agreement.
  */
class CountMinAgg(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Seq[Long]] {
  require(depth >= 1 && width >= 2, "need depth >= 1, width >= 2")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], v: String): Array[Long] = {
    if (v != null) {
      var r = 0
      while (r < depth) {
        buf(r * width + CountMin.bucket(r, v, width)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object CountMin {

  /** Kirsch–Mitzenmacher row bucket. Each hash is reduced mod width
    * BEFORE the `h1 + r·h2` combination: the combination then never
    * overflows int64 (components < width, r < depth), which keeps the SQL
    * replica runnable under Spark's default ANSI mode (a raw `h1 + r*h2`
    * can overflow, an error there — and try_add's NULL-on-overflow would
    * not match the JVM's wrap-around) while computing the same residue.
    */
  def bucket(r: Int, v: String, width: Int): Int = {
    val w = width.toLong
    val h1 = java.lang.Math.floorMod(
      SimHashUtil.hash64(UTF8String.fromString(v)), w)
    val h2 = java.lang.Math.floorMod(
      SimHashUtil.hash64(UTF8String.fromString(v + "\u0001")) | 1L, w)
    java.lang.Math.floorMod(h1 + r.toLong * h2, w).toInt
  }

  /** Driver-side point estimate from a collected sketch. */
  def estimate(sketch: Seq[Long], v: String, depth: Int, width: Int): Long =
    (0 until depth).map(r => sketch(r * width + bucket(r, v, width))).min

  /** Column-level point estimate: `least` over the `depth` counters of
    * `sketchCol` (an ARRAY<BIGINT> from the `count_min_*` UDAF) addressed
    * by the same double-hash buckets as [[CountMinAgg.reduce]] —
    * `fnv64`-based, so the whole lookup stays in whole-stage codegen.
    */
  def estimateCol(sketchCol: Column, keyCol: Column, depth: Int,
      width: Int): Column = {
    val w = lit(width.toLong)
    val h1 = pmod(SimHash.fnv64(keyCol), w)
    val h2 = pmod(SimHash.fnv64(concat(keyCol, lit("\u0001"))).bitwiseOR(1L), w)
    (0 until depth).map { r =>
      element_at(sketchCol,
        (pmod(h1 + lit(r.toLong) * h2, w) + lit(r * width) + 1L).cast("int"))
    }.reduce(least(_, _))
  }

  /** Register `count_min_<depth>x<width>` UDAFs for the given shapes. */
  def register(spark: org.apache.spark.sql.SparkSession,
      shapes: Seq[(Int, Int)] = Seq((3, 64))): Unit =
    shapes.foreach { case (d, w) =>
      spark.udf.register(s"count_min_${d}x$w",
        org.apache.spark.sql.functions.udaf(new CountMinAgg(d, w)))
    }
}
