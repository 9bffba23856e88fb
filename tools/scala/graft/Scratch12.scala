package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Step probe for neighborhoodFunction (ANF) construction cost (r14). */
object Scratch12 {
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
      println(f"[s12] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    val li = spark.table("lineitem").where(col("l_partkey") % 3 === 0)
    val edges = t("coEdges lazy") {
      graft.operators.Graph.coEdges(li, "l_orderkey", "l_partkey")
    }
    t("edges count") { println("  |E| = " + edges.count()) }
    val e = t("e checkpoint eager") {
      graft.operators.Caching.checkpoint(
        edges.select(col("src"), col("dst")).distinct(), eager = true)
    }
    val p = 5
    val wBits = 60 - p
    var state = t("state0 checkpoint") {
      val s0 = e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node"))).distinct()
        .select(col("node"), graft.operators.Dedup.portableHash(
          concat(lit("anf:"), col("node").cast("string"))).as("h"))
        .select(col("node"), expr(s"h DIV ${1L << wBits}").as("idx"),
          when(pmod(col("h"), lit(1L << wBits)) === 0L,
              lit((wBits + 1).toLong))
            .otherwise(lit((wBits + 1).toLong) -
              length(ltrim(bin(pmod(col("h"), lit(1L << wBits))), "0")))
            .as("rho"))
      val c = graft.operators.Caching.checkpoint(s0, eager = true)
      println("  |state0| = " + c.count())
      c
    }
    for (hop <- 1 to 3) {
      state = t(s"hop $hop checkpoint") {
        val fromNeighbors = e
          .join(state.select(col("node").as("dst"), col("idx"),
            col("rho")), "dst")
          .select(col("src").as("node"), col("idx"), col("rho"))
        val c = graft.operators.Caching.checkpoint(
          state.unionByName(fromNeighbors)
            .groupBy(col("node"), col("idx"))
            .agg(max(col("rho")).as("rho")), eager = true)
        println("  |state| = " + c.count())
        c
      }
    }
    spark.stop()
  }
}
