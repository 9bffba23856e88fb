package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-profiler for the hits-loop construction cost: times each
  * checkpoint/persist/plain step separately in the Bench session config.
  */
object Scratch7 {
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
    graft.sources.Tables.names.foreach(n => spark.table(n).cache())
    spark.table("lineitem").limit(1000).count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch7] $label ${(System.nanoTime() - t0) / 1e9}%.3f")
      r
    }
    (1 to 2).foreach { rep =>
      println(s"[scratch7] --- rep $rep ---")
      val edges = time("build-edges-df") {
        spark.table("orders")
          .join(spark.table("lineitem"), col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("src"), col("l_partkey").as("dst"))
      }
      val dd = time("distinct") { edges.select(col("src"), col("dst")).distinct() }
      val e = time("checkpoint-e") { dd.localCheckpoint(false) }
      val od = time("outdeg") { e.groupBy(col("src").as("node")).agg(count(lit(1)).as("odeg")) }
      val s0 = time("scores0") { od.select(col("node"), lit(1000000000000L).as("score_u")) }
      val j1 = time("round-join-agg") {
        e.join(s0.withColumnRenamed("node", "src"), "src")
          .groupBy(col("dst").as("node")).agg(sum(col("score_u")).as("raw"))
      }
      val t1 = time("tot") { s0.join(od, "node").agg(sum(col("score_u") * col("odeg")).as("tot")) }
      val sc = time("scoreOf") {
        j1.crossJoin(broadcast(t1)).select(col("node"),
          expr("cast(raw as decimal(38,0)) * 1000000000000 div tot").as("score_u"))
      }
      val c1 = time("checkpoint-auths1") { sc.localCheckpoint(false) }
      time("count-auths1") { c1.count() }
      val c2 = time("checkpoint-again") { c1.select(col("node"), col("score_u")).localCheckpoint(false) }
      time("count-final") { c2.count() }
    }
    spark.stop()
  }
}
