package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Approximate sketches have no cross-engine oracle — their contract is an
  * error bound vs the exact answer, asserted here.
  */
class SketchSpec extends SparkSpec {

  private lazy val li = spark.read.parquet(s"$sfDir/lineitem.parquet").cache()

  test("approx_count_distinct within 5% of exact") {
    val exact = li.select(countDistinct(col("l_partkey"))).collect()(0).getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"))).collect()(0).getLong(0)
    val err = math.abs(approx - exact).toDouble / exact
    assert(err <= 0.05, s"HLL error $err (approx=$approx exact=$exact)")
  }

  test("percentile_approx(0.5) within one quantile step of exact median") {
    val exact = li.stat.approxQuantile("l_quantity", Array(0.5), 0.0)(0)
    val approx = li.select(percentile_approx(col("l_quantity"), lit(0.5), lit(10000)))
      .collect()(0).getDouble(0)
    assert(math.abs(approx - exact) <= 1.0,
      s"median approx=$approx exact=$exact")
  }

  test("datasketches HLL round-trips through sketch merge") {
    Tables.load(spark, sfDir)
    // partial sketches per group, merged to a global estimate — the
    // distributed pattern a 100 TB rollup would persist
    val merged = spark.sql(
      """SELECT hll_sketch_estimate(hll_union_agg(sk)) AS est FROM (
        |  SELECT l_returnflag, hll_sketch_agg(l_partkey) AS sk
        |  FROM lineitem GROUP BY l_returnflag)""".stripMargin)
      .collect()(0).getLong(0)
    val exact = li.select(countDistinct(col("l_partkey"))).collect()(0).getLong(0)
    assert(math.abs(merged - exact).toDouble / exact <= 0.05)
  }
}
