package graft

import graft.operators.{Caching, Dedup}
import org.apache.spark.sql.functions._

class CachingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha beta gamma delta epsilon"),
    (2L, "alpha beta gamma delta zeta"),
    (3L, "one two three four five six")).toDF("doc_id", "text")

  test("scoped: operator persists are released at scope exit") {
    // compare KEY SETS, not sizes: the async ContextCleaner can collect
    // earlier suites' localCheckpoint RDDs mid-test, so absolute counts
    // are flaky in a shared long-lived session — the contract is "nothing
    // NEW survives the scope", not "the global count is frozen"
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val n = Caching.scoped {
      // jaccardPairs persists its shingle table internally; count()
      // materializes it inside the scope
      Dedup.jaccardPairs(docs, "doc_id", "text", ngram = 2,
        idWindow = 25L, threshold = 0.5).count()
    }
    assert(n == 1L) // docs 1-2 share 3 of 5 bigrams → J = 3/5
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"scope exit must unpersist what the operator persisted; leaked $leaked")
  }

  test("unscoped: pre-existing behavior — persists survive the call") {
    // key-set delta, not size: the async ContextCleaner can collect old
    // suites' RDDs mid-test (it removes keys, never adds), so NEW keys
    // are reliably the operator's own persist
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = Dedup.jaccardPairs(docs, "doc_id", "text", ngram = 2,
      idWindow = 25L, threshold = 0.5)
    assert(df.count() == 1L)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).nonEmpty,
      "outside a scope the operator's persist must stay (lazy callers)")
    spark.catalog.clearCache() // leave the suite session clean
  }

  test("scoped: a pre-cached identical plan survives scope exit") {
    // CacheManager shares entries by canonicalized plan — when the scoped
    // operator's persist lands on a plan someone else already cached, the
    // scope must NOT release that shared entry on exit
    val base = docs.select(col("doc_id"), col("text"))
    base.persist(); base.count()
    try {
      Caching.scoped {
        Caching.persist(docs.select(col("doc_id"), col("text"))).count()
      }
      assert(org.apache.spark.sql.graftshim.GraftShim.isCached(base),
        "scope exit must not unpersist an entry it did not create")
    } finally base.unpersist(blocking = true)
  }

  test("checkpoint seam: reliable mode equals localCheckpoint mode") {
    // the one seam every iterative operator (hits, k-core, CC, BPE,
    // logistic, coreset, mixture reweight) routes lineage truncation
    // through — values must be identical in both modes because
    // checkpointing replays the same deterministic plan
    import graft.operators.Graph
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 1L),
      (5L, 1L), (2L, 4L)).toDF("src", "dst")
    def run() = Caching.scoped {
      Graph.hits(edges, iters = 3)
        .orderBy("side", "node").collect().map(_.toSeq).toSeq
    }
    val local = run()
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set("spark.graft.reliableCheckpoints", "true")
    spark.conf.set("spark.graft.checkpointDir", dir)
    try {
      val reliable = run()
      assert(reliable == local,
        "reliable checkpoint mode must be value-identical to local mode")
      assert(local.nonEmpty)
      assert(spark.sparkContext.getCheckpointDir.isDefined,
        "reliable mode must have installed the configured checkpoint dir")
    } finally {
      spark.conf.unset("spark.graft.reliableCheckpoints")
      spark.conf.unset("spark.graft.checkpointDir")
    }
  }

  test("checkpoint seam: reliable mode without a dir is a clear error") {
    spark.conf.set("spark.graft.reliableCheckpoints", "true")
    try {
      // only hit the seam when no dir is installed (an earlier test may
      // have set one on the shared context — then the contract is simply
      // that the existing dir is reused, which the equality test covers)
      if (spark.sparkContext.getCheckpointDir.isEmpty) {
        val e = intercept[IllegalArgumentException] {
          Caching.checkpoint(docs.select(col("doc_id")))
        }
        assert(e.getMessage.contains("spark.graft.checkpointDir"))
      }
    } finally spark.conf.unset("spark.graft.reliableCheckpoints")
  }

  test("releaseCheckpoints: frees localCheckpoint blocks that clearCache " +
      "cannot see") {
    // the round-11 multimodal regression mechanism: localCheckpoint is an
    // RDD-level persist outside CacheManager, so a session's family-
    // boundary clearCache() never releases it and iterative operators'
    // per-round blocks accumulate for the whole session. The contract
    // here is the bench/verify lifecycle: once a query is fully
    // materialized, releaseCheckpoints() must actually drop the blocks.
    Caching.releaseCheckpoints(blocking = true) // drain earlier suites
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val ck = Caching.checkpoint(
      docs.select(col("doc_id"), length(col("text")).as("n")), eager = true)
    assert(ck.count() == 3L)
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty, "an eager localCheckpoint must persist blocks")
    // the blunt SQL-cache valve does NOT free them — this is exactly why
    // the lifecycle API exists
    spark.catalog.clearCache()
    assert(added.subsetOf(spark.sparkContext.getPersistentRDDs.keySet),
      "clearCache must not (and cannot) release checkpoint blocks")
    Caching.releaseCheckpoints(blocking = true)
    val remaining = added.intersect(
      spark.sparkContext.getPersistentRDDs.keySet)
    assert(remaining.isEmpty,
      s"releaseCheckpoints must drop checkpoint storage; kept $remaining")
    // idempotent: a second release (and operators that already released
    // their own checkpoints) is a no-op, not an error
    Caching.releaseCheckpoints(blocking = true)
  }

  test("scoped: nesting releases only the inner scope's entries") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Caching.scoped {
      val outer = Dedup.jaccardPairs(docs, "doc_id", "text", ngram = 2,
        idWindow = 25L, threshold = 0.5)
      outer.count()
      val afterOuter = spark.sparkContext.getPersistentRDDs.keySet
      Caching.scoped {
        Dedup.jaccardPairsChar(docs, "doc_id", "text",
          n = 5, idWindow = 25L, threshold = 0.6).count()
      }
      // the inner scope's char-gram persist is gone, the outer's remains
      assert((spark.sparkContext.getPersistentRDDs.keySet -- afterOuter).isEmpty)
      // "the outer's remains" asserted directly (not via count, which
      // would pass by recompute): every RDD the outer scope created must
      // still be registered — these are live cached entries, so the
      // async ContextCleaner cannot collect them mid-test
      val outerCreated = afterOuter -- before
      assert(outerCreated.subsetOf(
        spark.sparkContext.getPersistentRDDs.keySet),
        "inner scope exit must not release the outer scope's entries")
      assert(outer.count() == 1L)
    }
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty)
  }
}
