package graft

import org.apache.spark.sql.SparkSession

/** Micro-benchmark: Aggregator UDAF vs native TypedImperativeAggregate. */
object Scratch3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.load(spark, "/root/testdata/sf0.1")
    spark.sql(
      """SELECT l_orderkey, array(l_linenumber, l_linenumber * 2, CAST(l_quantity AS INT)) AS arr
        |FROM lineitem""".stripMargin).createOrReplaceTempView("arrs")
    spark.table("arrs").cache().count()

    def time(tag: String, q: String): Unit = {
      // warm
      spark.sql(q).count()
      val t0 = System.nanoTime()
      var i = 0
      while (i < 3) { spark.sql(q).count(); i += 1 }
      println(s"[t] $tag ${(System.nanoTime() - t0) / 3e9}")
    }
    time("aggregator grouped",
      "SELECT l_orderkey, array_reduce_sum_int(arr) FROM arrs GROUP BY l_orderkey")
    time("native grouped",
      "SELECT l_orderkey, array_reduce_sum_native(arr) FROM arrs GROUP BY l_orderkey")
    time("aggregator global", "SELECT array_reduce_sum_int(arr) FROM arrs")
    time("native global", "SELECT array_reduce_sum_native(arr) FROM arrs")
    spark.stop()
  }
}
