package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase probe for betweennessSampled (r14). */
object Scratch14 {
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
      println(f"[s14] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    val li = spark.table("lineitem")
    val edges = graft.operators.Graph.coEdges(li, "l_orderkey", "l_partkey")
    t("coEdges warm count") { println("  |E0| = " + edges.count()) }
    val eSrc = t("eSrc ckpt") {
      graft.operators.Caching.checkpoint(
        edges.select(col("src"), col("dst")).repartition(col("src"))
          .distinct(), eager = true)
    }
    t("eSrc count") { println("  |E| = " + eSrc.count()) }
    val eDst = t("eDst ckpt") {
      graft.operators.Caching.checkpoint(eSrc.repartition(col("dst")),
        eager = true)
    }
    val sources = eSrc.select(col("src").as("node")).distinct()
      .where(pmod(col("node"), lit(400L)) === 0)
    val l0 = t("level0 ckpt") {
      graft.operators.Caching.checkpoint(sources
        .select(col("node").as("s"), col("node"), lit(1L).as("sigma")))
    }
    t("level0 count") { println("  |L0| = " + l0.count()) }
    var levels = Vector(l0)
    for (level <- 1 to 2) {
      val next = t(s"level $level ckpt") {
        val frontier = levels(level - 1)
          .select(col("s"), col("node").as("src"), col("sigma"))
        val reachedAll = levels.map(_.select(col("s"), col("node")))
          .reduce(_ unionByName _)
        graft.operators.Caching.checkpoint(
          eSrc.join(frontier, "src")
            .select(col("s"), col("dst").as("node"), col("sigma"))
            .join(reachedAll, Seq("s", "node"), "left_anti")
            .groupBy(col("s"), col("node"))
            .agg(sum(col("sigma")).as("sigma")))
      }
      t(s"level $level count") { println(s"  |L$level| = " + next.count()) }
      levels = levels :+ next
    }
    val lower = levels(2).withColumn("delta", lit(0L))
    val d1 = t("backward d=2 ckpt") {
      val lw = lower.select(col("s"), col("node").as("dst"),
        col("sigma").as("sw"), col("delta").as("dw"))
      val contrib = eDst.join(lw, "dst")
        .select(col("s"), col("src").as("node"), col("sw"), col("dw"))
        .join(levels(1).select(col("s"), col("node"),
          col("sigma").as("sv")), Seq("s", "node"))
        .select(col("s"), col("node"),
          expr("(sv * (1000000 + dw)) DIV sw").as("c"))
        .groupBy(col("s"), col("node")).agg(sum(col("c")).as("cd"))
      graft.operators.Caching.checkpoint(
        levels(1).join(contrib, Seq("s", "node"), "left")
          .select(col("s"), col("node"), col("sigma"),
            coalesce(col("cd"), lit(0L)).as("delta")))
    }
    t("backward d=2 count") { println("  |D1| = " + d1.count()) }
    t("final agg count") {
      Seq(lower, d1).map(_.select(col("s"), col("node"), col("delta")))
        .reduce(_ unionByName _)
        .where(col("node") =!= col("s"))
        .groupBy(col("node")).agg(sum(col("delta")).as("bc_micro")).count()
    }
    spark.stop()
  }
}
