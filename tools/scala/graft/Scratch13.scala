package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase probe for the unigram EM pipeline (r14): seed, DP, tight/chosen,
  * walk, M-step — each timed by forcing a count.
  */
object Scratch13 {
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
    spark.table("documents").count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[s13] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    val docs = spark.table("documents")
    val vocab = t("seed vocab count") {
      val v = graft.operators.Caching.checkpoint(
        graft.operators.TextAnalysis.unigramSeedVocab(
          docs, "doc_id", "text", 5, 120), eager = true)
      println("  |vocab| = " + v.count()); v
    }
    val r1 = t("emStep round 1") {
      val v = graft.operators.Caching.checkpoint(
        graft.operators.TextAnalysis.unigramEmStep(
          docs, "doc_id", "text", vocab, 5, 32, 30000000L), eager = true)
      println("  |vocab1| = " + v.count()); v
    }
    t("emStep round 2") {
      val v = graft.operators.Caching.checkpoint(
        graft.operators.TextAnalysis.unigramEmStep(
          docs, "doc_id", "text", r1, 5, 32, 30000000L), eager = true)
      println("  |vocab2| = " + v.count()); v
    }
    spark.stop()
  }
}
