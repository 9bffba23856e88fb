package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing for the jaccard pair pipeline (dev tool). */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(s"[t] $tag rows=$n sec=${(System.nanoTime() - t0) / 1e9}")
    }

    val toks = TextAnalysis.tokens(col("text"))
    val t = df.select(col("doc_id").as("id"),
      array_distinct(TextAnalysis.wordNgrams(toks, 2)).as("sh"))
      .where(size(col("sh")) > 0)
    val blk = expr("id div 25L")
    val a = t.select(col("id").as("id_a"), col("sh").as("sh_a"),
      explode(array(blk, blk + 1)).as("blk"))
    val b = t.select(col("id").as("id_b"), col("sh").as("sh_b"), blk.as("blk"))
    val joined = a.join(b, Seq("blk"))
      .where(col("id_a") < col("id_b") && col("id_b") - col("id_a") <= 25)

    time("shingle only")(t.count())
    time("join no-verify")(joined.count())
    time("inter only")(joined
      .select(size(array_intersect(col("sh_a"), col("sh_b"))).as("i"))
      .agg(sum("i")).count())
    val full = joined
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double"))
      .where(col("jaccard") >= 0.5)
    time("full")(full.count())
    spark.stop()
  }
}
