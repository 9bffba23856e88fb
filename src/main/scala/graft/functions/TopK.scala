package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** Mergeable Misra–Gries heavy-hitters sketch (Misra & Gries 1982;
  * merge rule from Agarwal et al., "Mergeable Summaries", PODS 2012):
  * at most `k` counters; overflow decrements all counters by the evicted
  * weight. Guarantees: reported count is a lower bound, true count ≤
  * reported + N/(k+1), and any value with frequency > N/(k+1) is present.
  * When `k` ≥ the number of distinct values the counters never decrement,
  * so the result is EXACT — which is what the driver's DuckDB oracle
  * checks; the approximate regime is spec-tested against its error bound.
  *
  * The sketch state is a bounded map (k entries), so partial aggregation
  * shuffles O(k) per partition regardless of input size — the point of a
  * sketch at 100 TB. A north-star addition; the reference contains no
  * sketches (SURVEY.md §2c).
  */
class ApproxTopK(k: Int)
    extends Aggregator[String, mutable.Map[String, Long], Seq[(String, Long)]] {
  require(k >= 1, "k must be >= 1")

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  private def offer(buf: mutable.Map[String, Long], v: String, w: Long): Unit = {
    if (w <= 0L) return
    buf.get(v) match {
      case Some(c) => buf.update(v, c + w)
      case None if buf.size < k => buf.update(v, w)
      case None =>
        // decrement-all by the smallest of (w, current min counter);
        // repeat until either the new value survives or its weight is spent
        var remaining = w
        while (remaining > 0L && !buf.contains(v) && buf.size >= k) {
          val minC = buf.values.min
          val dec = math.min(minC, remaining)
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - dec)
          buf.foreach { case (key, c) => if (c <= 0L) dead += key }
          dead.foreach(buf.remove)
          remaining -= dec
        }
        if (remaining > 0L) offer(buf, v, remaining)
    }
  }

  override def reduce(buf: mutable.Map[String, Long], v: String): mutable.Map[String, Long] = {
    if (v != null) offer(buf, v, 1L)
    buf
  }

  /** Counter-wise union then re-shrink to k (mergeable-summaries rule). */
  override def merge(a: mutable.Map[String, Long], b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    if (b.size <= a.size) { b.foreach { case (v, w) => offer(a, v, w) }; a }
    else { a.foreach { case (v, w) => offer(b, v, w) }; b }
  }

  /** Descending by count, term as the deterministic tiebreaker. */
  override def finish(buf: mutable.Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (v, c) => (-c, v) }

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}

object ApproxTopK {
  /** Register `approx_top_k_<k>` for the given k values. */
  def register(spark: org.apache.spark.sql.SparkSession, ks: Seq[Int] = Seq(5, 10)): Unit =
    ks.foreach { k =>
      spark.udf.register(s"approx_top_k_$k",
        org.apache.spark.sql.functions.udaf(new ApproxTopK(k)))
    }
}
