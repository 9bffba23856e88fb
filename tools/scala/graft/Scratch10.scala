package graft

import org.apache.spark.sql.SparkSession

/** Batch bench-context timer: for each named query (or a regex via
  * SCRATCH10_RE), run construct+count twice in ONE warm JVM with the
  * Bench session config (codegen off, cached base tables, cpus shuffle
  * partitions, family-boundary-free). Prints per-rep construct/count
  * seconds — the in-bench cost decomposition a fresh-JVM Scratch
  * overstates. `runMain graft.Scratch10 <sfDir> <query...>`
  */
object Scratch10 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names0 = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SCRATCH_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.wholeStage", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").count()
    graft.sources.Tables.load(spark, sfDir)
    graft.sources.Tables.names.foreach(n => spark.table(n).cache())
    spark.table("lineitem").limit(1000).count()
    val re = sys.env.get("SCRATCH10_RE").map(_.r)
    val names =
      if (names0.nonEmpty) names0
      else SparkEntry.queries.keys.toSeq.sorted
        .filter(n => re.forall(_.findFirstIn(n).isDefined))
    val reps = sys.env.getOrElse("SCRATCH10_REPS", "2").toInt
    // SCRATCH10_NOCLEAR=1 replicates the bench's intra-family profile:
    // operator persists accumulate across queries (cache-manager
    // sharing), only checkpoints are released per query
    val noClear = sys.env.contains("SCRATCH10_NOCLEAR")
    var warmed = Set.empty[String]
    names.foreach { name =>
      val family = name.split("_")(1)
      if (noClear && !warmed(family)) {
        // replicate the bench's untimed family warm-up
        SparkEntry.familyWarm.get(family).foreach { w =>
          try w(spark, sfDir) catch { case _: Throwable => }
        }
        warmed += family
      }
      (1 to reps).foreach { i =>
        if (!noClear) {
          spark.catalog.clearCache()
          graft.sources.Tables.names.foreach { n =>
            spark.table(n).cache(); spark.table(n).count()
          }
        }
        graft.operators.Caching.releaseCheckpoints(blocking = true)
        val tc = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val t0 = System.nanoTime()
        val n = try df.count() catch { case e: Throwable => -1L }
        val t1 = System.nanoTime()
        println(f"[s10] $name%-28s rep=$i rows=$n%-8d " +
          f"construct=${(t0 - tc) / 1e9}%7.3f count=${(t1 - t0) / 1e9}%7.3f")
      }
    }
    spark.stop()
  }
}
