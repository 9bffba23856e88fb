package graft.sources

import org.apache.spark.sql.SparkSession

/** Recommended production session configuration for this library — the
  * settings a cluster deployment should start from. The driver's
  * Verify/Bench mains use their own fixed config (driver contract); this
  * builder is the library-user entry point.
  *
  * SQL-only deployments additionally set
  * `--conf spark.sql.extensions=graft.GraftExtensions` so the
  * Catalyst-native `array_reduce_*_native` aggregates resolve with no
  * driver-side registration call (see [[graft.GraftExtensions]]).
  */
object GraftSession {

  /** Apply the recommended configs to a builder. Cluster-size-dependent
    * knobs (shuffle partitions, memory) are left to the deployment.
    */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    // AQE: runtime re-planning — coalesces small shuffle partitions,
    // converts to broadcast when runtime stats allow, splits skewed
    // partitions in sort-merge joins
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    // runtime row-level filtering: selective dim-side predicates build a
    // bloom filter applied to the fact-side scan of shuffle joins
    // (PlanSpec asserts the injection fires)
    .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // deterministic timestamps for cross-engine comparisons
    .config("spark.sql.session.timeZone", "UTC")
    // the driver data's nanosecond timestamps (Tables.configure also sets
    // this per-session, but a fresh session should start correct)
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // bound scan partition size so executor memory is sized by config, not
    // by whatever file layout the input happens to have
    .config("spark.sql.files.maxPartitionBytes", 128L * 1024 * 1024)

  /** Local session with everything registered (tables + UDAF families).
    *
    * getOrCreate CAVEAT: if the JVM already has an active SparkSession,
    * that session is returned and the master / static configs requested
    * here are silently ignored (Spark only logs a warning) — `cores` then
    * has no effect. The mismatch is surfaced with a loud warning below;
    * callers needing a guaranteed core count must stop the prior session
    * first.
    */
  def local(cores: Int, sfDir: String): SparkSession = {
    val spark = configure(SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    val actual = spark.sparkContext.master
    if (actual != s"local[$cores]")
      System.err.println(
        s"[GraftSession] WARNING: local($cores) reused an existing session " +
          s"with master=$actual — the requested core count was NOT applied")
    Tables.load(spark, sfDir)
    spark
  }
}
