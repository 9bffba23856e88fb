package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe: where does a graph-iteration query's wall-clock go?
  * Times coEdges materialization, the persisted edge build, and each
  * incremental iteration count at bench parallelism.
  */
object Scratch4 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SCRATCH_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.load(spark, "/root/testdata/sf0.1")
    spark.table("lineitem").cache().count()
    def t[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[t] $tag ${(System.nanoTime() - t0) / 1e9}%.2f"); r
    }
    val li = spark.table("lineitem")
    val edges = graft.operators.Graph.coEdges(li, "l_orderkey", "l_partkey")
    t("coEdges count")(edges.count())
    t("coEdges count warm")(edges.count())
    for (k <- Seq(0, 1, 2, 5)) {
      t(s"pageRank iters=$k")(
        graft.operators.Graph.pageRank(edges, iters = k).count())
    }
    t("spamMass iters=5")(graft.operators.Graph.spamMass(
      edges, li.where(col("l_partkey") % 50 === 0)
        .select(col("l_partkey").as("node")), iters = 5).count())
    spark.stop()
  }
}
