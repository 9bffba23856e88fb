package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan inspection main (dev tool, not part of the driver contract):
  * `runMain graft.Scratch <queryName> <sfDir> [explain]`
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SCRATCH_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // mimic Bench's session-level base-table cache for A/B forensics
    if (sys.env.contains("SCRATCH_CACHE_TABLES")) {
      graft.sources.Tables.load(spark, sfDir)
      graft.sources.Tables.names.foreach { n =>
        spark.table(n).cache(); spark.table(n).count()
      }
    }
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (args.contains("explain")) df.explain("formatted")
    if (args.contains("dump")) {
      // single-query oracle iteration: same dump shape as Verify, under
      // /tmp/scratch_out, so tools/verify_oracle.py can compare just this one
      val out = "/tmp/scratch_out"
      df.coalesce(1).write.mode("overwrite").parquet(s"$out/$name")
      val sql = SparkEntry.oracleSql.get(name)
      sql.foreach { s =>
        val esc = s.flatMap {
          case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
          case '\r' => "\\r"; case '\t' => "\\t"
          case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
        }
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$out/oracle_sql.json"),
          s"""{"$name": "$esc"}""")
      }
    }
    val reps = if (args.contains("repeat")) 3 else 1
    var n = 0L
    (1 to reps).foreach { i =>
      spark.catalog.clearCache() // fresh persist lifecycle per rep
      if (sys.env.contains("SCRATCH_CACHE_TABLES"))
        graft.sources.Tables.names.foreach { n =>
          spark.table(n).cache(); spark.table(n).count()
        }
      val tc = System.nanoTime()
      val df2 = SparkEntry.queries(name)(spark, sfDir)
      val t0 = System.nanoTime()
      n = df2.count()
      println(s"[scratch] $name rep=$i rows=$n sec=${(System.nanoTime() - t0) / 1e9}" +
        s" construct=${(t0 - tc) / 1e9}")
    }
    spark.stop()
  }
}
