package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel
import scala.collection.mutable.ArrayBuffer

/** Scoped lifecycle for the persists operators create internally.
  *
  * Operators like [[Dedup.jaccardPairs]] or [[Similarity.retrieveChunks]]
  * persist subtrees their (lazy) results reference more than once — the
  * persist must therefore outlive the function, and a long-lived driver
  * chaining many operators accumulates executor storage with only the blunt
  * `spark.catalog.clearCache()` as a release valve (the documented pre-r5
  * contract). This registry makes the contract structural without touching
  * plan shapes: every operator persist routes through [[persist]], and a
  * caller that wraps "build + fully materialize" in [[scoped]] gets those
  * entries unpersisted at scope exit:
  *
  * {{{
  * val pairs = Caching.scoped {
  *   Dedup.jaccardPairs(docs, "doc_id", "text", 2, 25L, 0.5).collect()
  * } // the shingle-table persist created inside is released here
  * }}}
  *
  * Outside a scope the behavior is EXACTLY the pre-r5 one (persist and
  * leave — correct for gate queries, whose lazy results the driver
  * materializes after `queries()` returns). Scopes nest (inner scope
  * releases only its own persists) and are thread-local: a scope tracks
  * the operator calls of the thread that opened it, which is the driver
  * composition pattern; concurrent job-submission threads each manage
  * their own scopes. The caller must materialize INSIDE the scope —
  * returning a lazy DataFrame out of `scoped` and collecting later
  * recomputes the (now unpersisted) subtrees instead of crashing, so the
  * failure mode is a perf regression, never wrong answers.
  */
object Caching {

  private val stack = new ThreadLocal[ArrayBuffer[ArrayBuffer[DataFrame]]] {
    override def initialValue(): ArrayBuffer[ArrayBuffer[DataFrame]] =
      ArrayBuffer.empty
  }

  /** `df.persist(MEMORY_AND_DISK)`, registered with the innermost active
    * [[scoped]] block of this thread (no-op registration when none).
    *
    * Already-cached plans are NOT registered: CacheManager shares entries
    * by canonicalized plan, so when an operator's persist lands on a plan
    * some earlier caller already cached, this call didn't create storage —
    * and scope exit must not release an entry other consumers rely on
    * (the shared-entry unpersist footgun).
    */
  private[graft] def persist(df: DataFrame): DataFrame = {
    val s = stack.get()
    if (s.isEmpty) {
      // no scope → the pre-existence answer would be unused, and
      // lookupCachedData is a linear canonicalized-plan scan over every
      // cached entry (CacheManager runs its own copy inside persist());
      // skipping the redundant probe here halves the lookup tax a long
      // gate session pays per operator persist
      df.persist(StorageLevel.MEMORY_AND_DISK)
    } else {
      val preExisting = org.apache.spark.sql.graftshim.GraftShim.isCached(df)
      df.persist(StorageLevel.MEMORY_AND_DISK)
      if (!preExisting) s.last += df
    }
    df
  }

  /** Run `f`, then unpersist every [[persist]] this thread's operators
    * registered while it ran. Blocking unpersist: storage is actually gone
    * when `scoped` returns, so back-to-back scopes can't transiently hold
    * 2× the footprint.
    */
  def scoped[T](f: => T): T = {
    val frame = ArrayBuffer.empty[DataFrame]
    val s = stack.get()
    s += frame
    try f
    finally {
      s.remove(s.length - 1)
      frame.foreach(_.unpersist(blocking = true))
    }
  }
}
