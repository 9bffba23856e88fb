package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Size/stage profiler for dbscanGrid internals at a given SF. */
object Scratch8 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.wholeStage", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.load(spark, sfDir)
    val df = spark.table("embeddings")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch8] $label ${(System.nanoTime() - t0) / 1e9}%.3f")
      r
    }
    val epsFx = 2000000000L // must match the gate query's eps
    // replicate the gate entry's epsFx/minPts by reading the query source:
    // just probe a few plausible eps values' grid stats
    val proj = graft.operators.Similarity.jlProject(df, "vec_id", "embedding", 64, 2)
    val pts = proj.groupBy(col("id"))
      .agg(max(when(col("j") === 0, col("out_fx"))).as("x"),
        max(when(col("j") === 1, col("out_fx"))).as("y"))
    time("pts-count")(println("[scratch8] n_pts " + pts.count()))
    val stats = pts.agg(min("x"), max("x"), min("y"), max("y")).head()
    println("[scratch8] extent " + stats)
    Seq(100000L, 200000L, 400000L).foreach { eps =>
      val cells = pts.select(
        expr(s"(x - pmod(x, ${eps}L)) div ${eps}L").as("cx"),
        expr(s"(y - pmod(y, ${eps}L)) div ${eps}L").as("cy"))
      val occ = cells.groupBy("cx", "cy").count()
      val top = occ.orderBy(col("count").desc).limit(3).collect()
      println(s"[scratch8] eps=$eps occupied=" + occ.count() +
        " top=" + top.mkString(","))
    }
    spark.stop()
  }
}
