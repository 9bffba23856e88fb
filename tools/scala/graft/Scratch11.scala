package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Step probe for the modularity-family construction cost (r14). */
object Scratch11 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SCRATCH_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.wholeStage", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").count()
    graft.sources.Tables.load(spark, sfDir)
    graft.sources.Tables.names.foreach(n => spark.table(n).cache())
    spark.table("lineitem").limit(1000).count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[s11] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    val li = spark.table("lineitem")
    val e = t("coEdges build (lazy)") {
      graft.operators.Graph.coEdges(li, "l_orderkey", "l_partkey")
    }
    t("coEdges count") { e.count() }
    val lpa = t("lpa build (lazy)") {
      graft.operators.Graph.labelPropagation(e, iters = 4)
    }
    t("lpa persist+checkpoint") {
      graft.operators.Caching.checkpoint(
        graft.operators.Caching.persist(
          lpa.select(col("node"), col("label")))).count()
    }
    val lpa2 = graft.operators.Graph.labelPropagation(e, iters = 4)
    val out = t("modularity build (lazy)") {
      graft.operators.Graph.modularity(e, lpa2)
    }
    t("modularity count") { out.count() }
    spark.stop()
  }
}
