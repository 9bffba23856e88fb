package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B the two connected-components engines (min-label+pointer-jumping
  * vs alternating large-star/small-star) on the suite's heavy CC
  * consumers at bench parallelism: `q_embed_dbscan` (the #2 normalized
  * cost, whose variance is the CC critical path) and
  * `q_dedup_components`, plus a deep-chain synthetic that exposes the
  * round counts. `runMain graft.Scratch9 [sfDir]`
  */
object Scratch9 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch9] $tag rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    // deep chain: 50k-node path (diameter 50k) + 10k shallow families —
    // the adversarial round-count case
    import spark.implicits._
    val chain = spark.range(1L, 50000L)
      .select(col("id").as("id_a"), (col("id") + 1L).as("id_b"))
    val shallow = spark.range(0L, 10000L)
      .select((col("id") * 7L + 1000000L).as("id_a"),
        (col("id") * 7L + 1000003L).as("id_b"))
    val pairs = chain.unionByName(shallow)

    val chainOnly = sys.env.contains("SCRATCH9_CHAIN")
    for (rep <- 1 to 4; engine <- Seq("minlabel", "tworule")) {
      spark.conf.set("spark.graft.cc", engine)
      if (chainOnly)
        time(s"cc-$engine chain50k rep$rep")(
          graft.operators.Dedup.connectedComponents(pairs, maxIter = 40)
            .agg(countDistinct(col("family_id"))).head().getLong(0))
      else {
        time(s"$engine q_embed_dbscan rep$rep")(
          SparkEntry.queries("q_embed_dbscan")(spark, sfDir).count())
        time(s"$engine q_dedup_components rep$rep")(
          SparkEntry.queries("q_dedup_components")(spark, sfDir).count())
      }
      spark.catalog.clearCache()
      graft.operators.Caching.releaseCheckpoints()
    }
    spark.stop()
  }
}
