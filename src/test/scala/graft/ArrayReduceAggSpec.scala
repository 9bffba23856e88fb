package graft

import graft.functions.ArrayReduceAgg
import graft.sources.Tables
import org.apache.spark.sql.functions.col

/** Pins the native TypedImperativeAggregate (`array_reduce_*_native`)
  * against the Aggregator-based reference implementation, and covers the
  * unsigned-emulation monoid family.
  */
class ArrayReduceAggSpec extends SparkSpec {
  import spark.implicits._

  private def sql1(q: String): Seq[Any] = {
    Tables.load(spark, sfDir)
    spark.sql(q).collect()(0).getSeq[Any](0)
  }

  test("native sum/product/max/min equal the Aggregator family (int)") {
    Seq(Seq[Integer](1, 2, 3), Seq[Integer](4, null, 6), null)
      .toDF("arrays").createOrReplaceTempView("t_native")
    for (op <- Seq("sum", "product", "max", "min")) {
      val native = spark.sql(s"SELECT array_reduce_${op}_native(arrays) FROM t_native")
        .collect()(0).getSeq[Int](0)
      val agg = spark.sql(s"SELECT array_reduce_$op(arrays) FROM t_native")
        .collect()(0).getSeq[Int](0)
      assert(native == agg, s"op=$op")
    }
  }

  test("native: empty input yields empty array; truncation; saturation") {
    Seq.empty[Seq[Integer]].toDF("arrays").createOrReplaceTempView("t_empty")
    assert(sql1("SELECT array_reduce_sum_native(arrays) FROM t_empty") == Seq())

    Seq(Seq[Integer](1, 2, 3), Seq[Integer](4, 5, 6, 7)).toDF("arrays")
      .createOrReplaceTempView("t_trunc")
    assert(sql1("SELECT array_reduce_sum_native(arrays) FROM t_trunc") == Seq(5, 7, 9))

    Seq(Seq[Integer](Int.MaxValue), Seq[Integer](1)).toDF("arrays")
      .createOrReplaceTempView("t_sat")
    assert(sql1("SELECT array_reduce_sum_native(arrays) FROM t_sat") == Seq(Int.MaxValue))
  }

  test("native over long and double element types") {
    Seq(Seq(1L, Long.MaxValue), Seq(2L, 1L)).toDF("arrays")
      .createOrReplaceTempView("t_long")
    assert(sql1("SELECT array_reduce_sum_native(arrays) FROM t_long")
      == Seq(3L, Long.MaxValue))

    Seq(Seq(1.5, 2.0), Seq(0.5, 3.0)).toDF("arrays")
      .createOrReplaceTempView("t_dbl")
    assert(sql1("SELECT array_reduce_max_native(arrays) FROM t_dbl") == Seq(1.5, 3.0))
  }

  test("native multi-partition merge across a shuffle") {
    val batch = Seq(Seq[Integer](1, 2, 3), Seq[Integer](4, 5, 6), Seq[Integer](100, 100, 100))
    (batch ++ batch ++ batch).toDF("arrays").repartition(3)
      .createOrReplaceTempView("t_parts")
    assert(sql1("SELECT array_reduce_sum_native(arrays) FROM t_parts")
      == Seq(315, 321, 327))
  }

  test("native GROUP BY + Column API") {
    val df = Seq(("a", Seq(1, 2)), ("a", Seq(10, 20)), ("b", Seq(5, 5))).toDF("k", "arrays")
    val got = df.groupBy(col("k"))
      .agg(ArrayReduceAgg.arrayReduce("sum", col("arrays")).as("s"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getSeq[Int](1)))
    assert(got.toSeq == Seq(("a", Seq(11, 22)), ("b", Seq(5, 5))))
  }

  test("unsigned emulation: u8/u16/u32 clamping and identities") {
    Seq(Seq[Integer](250, 100, 3), Seq[Integer](10, 200, 4)).toDF("arrays")
      .createOrReplaceTempView("t_u8")
    assert(sql1("SELECT array_reduce_sum_u8(arrays) FROM t_u8") == Seq(255, 255, 7))
    assert(sql1("SELECT array_reduce_product_u8(arrays) FROM t_u8") == Seq(255, 255, 12))
    assert(sql1("SELECT array_reduce_min_u8(arrays) FROM t_u8") == Seq(10, 100, 3))
    assert(sql1("SELECT array_reduce_max_u8(arrays) FROM t_u8") == Seq(250, 200, 4))

    Seq(Seq(4294967290L, 7L), Seq(10L, 8L)).toDF("arrays")
      .createOrReplaceTempView("t_u32")
    assert(sql1("SELECT array_reduce_sum_u32(arrays) FROM t_u32")
      == Seq(4294967295L, 15L))
  }

  test("native rejects non-numeric element types with a clear error") {
    Seq(Seq("a", "b")).toDF("arrays").createOrReplaceTempView("t_str")
    val ex = intercept[Exception] {
      spark.sql("SELECT array_reduce_sum_native(arrays) FROM t_str").collect()
    }
    assert(ex.getMessage.contains("unsupported element type") ||
      ex.getMessage.contains("array<numeric>"))
  }

  test("GraftExtensions injects the native aggregates at the standard " +
      "spark.sql.extensions seam") {
    import org.apache.spark.sql.SparkSessionExtensions
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext)
    // what session bootstrap does with spark.sql.extensions: first against
    // a clone (pure registration check, live session untouched)…
    import org.apache.spark.sql.graftshim.GraftShim
    val live = GraftShim.functionRegistry(spark)
    val cloned = live.clone()
    GraftShim.applyExtensionFunctions(ext, cloned)
    ArrayReduceAgg.ops.foreach { op =>
      assert(cloned.functionExists(
        FunctionIdentifier(s"array_reduce_${op}_native")),
        s"extension must register array_reduce_${op}_native")
    }
    // …then end-to-end through SQL on the live registry
    GraftShim.applyExtensionFunctions(ext, live)
    val got = spark.sql(
      "SELECT array_reduce_sum_native(arr) AS r FROM VALUES" +
        " (array(1, 2)), (array(3, 4)) AS t(arr)")
      .collect().head.getSeq[Int](0)
    assert(got == Seq(4, 6))
  }

  test("native matches Aggregator on real embeddings (floats in double fold ≈)") {
    Tables.load(spark, sfDir)
    val native = spark.sql(
      "SELECT label, array_reduce_max_native(embedding) AS m FROM embeddings GROUP BY label ORDER BY label")
      .collect().map(_.getSeq[Float](1))
    val agg = spark.sql(
      "SELECT label, array_reduce_max_float(embedding) AS m FROM embeddings GROUP BY label ORDER BY label")
      .collect().map(_.getSeq[Float](1))
    assert(native.length == agg.length)
    native.zip(agg).foreach { case (n, a) => assert(n == a) } // max is exact in any width
  }
}
