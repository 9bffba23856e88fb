package graft

import org.apache.spark.sql.SparkSession

/** Bench-context replica for one query: same session config as Bench
  * (codegen off, cached table views, 32 shuffle partitions), separate
  * construction-vs-count timing, optional table-cache toggle
  * (SCRATCH6_NOCACHE=1). Diagnoses queries whose bench time diverges from
  * their Scratch time.
  */
object Scratch6 {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
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
    if (!sys.env.contains("SCRATCH6_NOCACHE")) {
      graft.sources.Tables.names.foreach(n => spark.table(n).cache())
      spark.table("lineitem").limit(1000).count()
    }
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      val n = df.count()
      val t2 = System.nanoTime()
      println(f"[scratch6] $name rep=$i rows=$n construct=${(t1 - t0) / 1e9}%.3f count=${(t2 - t1) / 1e9}%.3f")
    }
    spark.stop()
  }
}
