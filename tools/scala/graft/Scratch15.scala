package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase probe for sccBounded at the gate point (r14). */
object Scratch15 {
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
      println(f"[s15] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    val li = spark.table("lineitem").where(col("l_orderkey") % 3 === 0)
    val edges0 = li.select(col("l_orderkey").as("ok"),
        col("l_linenumber").as("ln"), col("l_partkey").as("src"))
      .join(li.select(col("l_orderkey").as("ok"),
        (col("l_linenumber") - 1).as("ln"), col("l_partkey").as("dst")),
        Seq("ok", "ln"))
      .select(col("src"), col("dst"))
    var e = t("e ckpt") {
      graft.operators.Caching.checkpoint(
        edges0.select(col("src"), col("dst"))
          .where(col("src") =!= col("dst")).distinct(), eager = true)
    }
    println("  |E| = " + e.count())
    var nodes = t("nodes ckpt") {
      graft.operators.Caching.checkpoint(
        e.select(col("src").as("node"))
          .unionAll(e.select(col("dst").as("node"))).distinct(),
        eager = true)
    }
    println("  |V| = " + nodes.count())
    for (peel <- 1 to 2) {
      val rel = t(s"peel $peel rel ckpt") {
        graft.operators.Caching.checkpoint(
          e.select(lit(0L).as("side"), col("dst").as("from"),
              col("src").as("to"))
            .unionByName(e.select(lit(1L).as("side"),
              col("src").as("from"), col("dst").as("to")))
            .repartition(col("side"), col("from")), eager = true)
      }
      var st = nodes.select(explode(array(lit(0L), lit(1L))).as("side"),
        col("node"), col("node").as("lbl"))
      for (h <- 1 to 4) {
        st = t(s"peel $peel hop $h") {
          val viaEdge = rel.join(st.select(col("side"),
              col("node").as("from"), col("lbl")), Seq("side", "from"))
            .select(col("side"), col("to").as("node"), col("lbl"))
          val c = graft.operators.Caching.checkpoint(
            st.unionByName(viaEdge).groupBy(col("side"), col("node"))
              .agg(min(col("lbl")).as("lbl")), eager = true)
          c
        }
      }
      val settled = t(s"peel $peel settle") {
        val f = st.where(col("side") === 0L)
          .select(col("node"), col("lbl").as("f"))
        val b = st.where(col("side") === 1L)
          .select(col("node"), col("lbl").as("b"))
        graft.operators.Caching.checkpoint(f.join(b, "node")
          .where(col("f") === col("b"))
          .select(col("node"), col("f").as("scc_id")), eager = true)
      }
      println("  settled = " + settled.count())
      nodes = t(s"peel $peel nodes anti") {
        graft.operators.Caching.checkpoint(nodes
          .join(settled.select(col("node")), Seq("node"), "left_anti"),
          eager = true)
      }
      println("  nodes left = " + nodes.count())
      e = t(s"peel $peel e anti") {
        graft.operators.Caching.checkpoint(e
          .join(settled.select(col("node").as("src")), Seq("src"),
            "left_anti")
          .join(settled.select(col("node").as("dst")), Seq("dst"),
            "left_anti"))
      }
      println("  edges left = " + e.count())
    }
    spark.stop()
  }
}
