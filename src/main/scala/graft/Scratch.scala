package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan inspection main (dev tool, not part of the driver contract):
  * `runMain graft.Scratch <queryName> <sfDir> [explain]`
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (args.contains("explain")) df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    println(s"[scratch] $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}")
    spark.stop()
  }
}
