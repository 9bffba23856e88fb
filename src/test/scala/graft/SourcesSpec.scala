package graft

import org.apache.spark.sql.functions._

/** Source-format coverage: the reference inherits scans from its host engine
  * (SURVEY.md §2b); our host engine reads parquet/csv/json — prove the
  * round-trips preserve data, and that the array-reduce family runs over
  * every format's output identically.
  */
class SourcesSpec extends SparkSpec {

  private lazy val tmp = java.nio.file.Files.createTempDirectory("graft-src").toString
  private lazy val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")

  test("csv round-trip preserves rows and values") {
    li.write.mode("overwrite").option("header", "true").csv(s"$tmp/li_csv")
    val back = spark.read.option("header", "true")
      .schema(li.schema).csv(s"$tmp/li_csv")
    assert(back.count() == li.count())
    val a = li.agg(sum("l_quantity"), count(lit(1))).collect()(0)
    val b = back.agg(sum("l_quantity"), count(lit(1))).collect()(0)
    assert(a == b)
  }

  test("json round-trip preserves rows and values") {
    li.write.mode("overwrite").json(s"$tmp/li_json")
    val back = spark.read.schema(li.schema).json(s"$tmp/li_json")
    assert(back.count() == li.count())
    assert(back.agg(sum("l_quantity")).collect()(0) ==
      li.agg(sum("l_quantity")).collect()(0))
  }

  test("mergeSchema reconciles evolved parquet batches; old rows get NULLs") {
    import spark.implicits._
    val dir = s"$tmp/evolve"
    Seq((1L, "a")).toDF("k", "s").write.parquet(s"$dir/batch=1")
    Seq((2L, "b", 9.5)).toDF("k", "s", "extra").write.parquet(s"$dir/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("k", "s", "extra", "batch"))
    val rows = merged.orderBy("k").collect()
    assert(rows.length == 2)
    assert(rows(0).isNullAt(rows(0).fieldIndex("extra"))) // old batch → NULL
    assert(rows(1).getDouble(rows(1).fieldIndex("extra")) == 9.5)
  }

  test("partitionBy layout prunes to the filtered partition at plan time") {
    import spark.implicits._
    val dir = s"$tmp/parted"
    Seq((1L, "en", 10L), (2L, "en", 20L), (3L, "de", 30L), (4L, "fr", 40L))
      .toDF("doc_id", "lang", "n_chars")
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val pruned = spark.read.parquet(dir).where(col("lang") === "en")
    // the partition filter must reach the scan (directory-level skipping,
    // not a post-read row filter) ...
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan)
    assert(plan.contains("lang"), plan)
    // ... and the scan must select only the one matching directory
    val scan = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.selectedPartitions.partitionCount == 1)
    assert(pruned.agg(sum("n_chars")).collect()(0).getLong(0) == 30L)
  }

  test("array_reduce gives identical results over parquet, csv, and json sources") {
    def reduceOver(df: org.apache.spark.sql.DataFrame): Seq[Seq[Int]] = {
      df.select(array(col("l_linenumber"),
          col("l_quantity").cast("int")).as("arr"), col("l_returnflag"))
        .createOrReplaceTempView("src_fmt")
      spark.sql(
        """SELECT l_returnflag, array_reduce_sum_native(arr) AS s
          |FROM src_fmt GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
        .collect().toSeq.map(_.getSeq[Int](1))
    }
    val fromParquet = reduceOver(li)
    val fromCsv = reduceOver(spark.read.option("header", "true")
      .schema(li.schema).csv(s"$tmp/li_csv"))
    val fromJson = reduceOver(spark.read.schema(li.schema).json(s"$tmp/li_json"))
    assert(fromParquet == fromCsv)
    assert(fromParquet == fromJson)
  }

  test("binaryFile source: bytes verbatim, glob filter scopes the listing") {
    val dir = new java.io.File(s"$tmp/bin_src")
    dir.mkdirs()
    val payload = Array[Byte](0, 1, -1, 127, -128, 42) // non-UTF8 bytes too
    java.nio.file.Files.write(dir.toPath.resolve("a.bin"), payload)
    java.nio.file.Files.write(dir.toPath.resolve("skip.dat"),
      "ignored".getBytes("UTF-8"))
    val got = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin").load(dir.toString)
      .select("path", "length", "content").collect()
    assert(got.length == 1) // .dat filtered out by the glob
    assert(got(0).getLong(1) == payload.length)
    assert(got(0).getAs[Array[Byte]](2).toSeq == payload.toSeq)
  }

  test("text source: one row per line, round-trip preserves bytes") {
    val dir = s"$tmp/text_src"
    val lines = Seq("first line", "second\tkeeps tabs", "")
    import spark.implicits._
    lines.toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    val back = spark.read.text(dir).collect().map(_.getString(0))
    assert(back.sorted.toSeq == lines.sorted)
  }

  test("parquet codec round-trip writes distinct codecs and reads back equal") {
    import org.apache.spark.sql.functions._
    graft.sources.Tables.load(spark, sfDir)
    val dir = graft.sources.Tables.scratchDir(spark, "codecs_spec")
    val src = spark.table("nation").select(col("n_nationkey"), col("n_name"))
    for (c <- Seq("zstd", "gzip", "snappy")) {
      src.write.mode("overwrite").option("compression", c)
        .parquet(s"$dir/$c")
      // the codec must actually be applied, not silently defaulted: parquet
      // part files carry the codec in their name
      val suffix = if (c == "gzip") ".gz.parquet" else s".$c.parquet"
      val files = new java.io.File(s"$dir/$c")
        .listFiles().map(_.getName).filter(_.endsWith(".parquet"))
      assert(files.nonEmpty && files.forall(_.endsWith(suffix)),
        s"$c: ${files.toSeq}")
      val back = spark.read.parquet(s"$dir/$c")
      assert(back.count() == src.count())
      assert(back.agg(sum(col("n_nationkey"))).collect()(0).getLong(0) ==
        src.agg(sum(col("n_nationkey"))).collect()(0).getLong(0))
    }
  }

  test("dynamic partition overwrite touches ONLY the rewritten partition") {
    import spark.implicits._
    val dir = graft.sources.Tables.scratchDir(spark, "dyn_overwrite_spec")
    val src = Seq((1L, 10L, "a"), (2L, 20L, "a"), (3L, 30L, "b"),
      (4L, 40L, "c")).toDF("k", "v", "p")
    src.write.mode("overwrite").partitionBy("p").parquet(dir)
    // rewrite partition b only, with patched values
    Seq((3L, 999L, "b")).toDF("k", "v", "p")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("p").parquet(dir)
    val back = spark.read.parquet(dir)
      .collect().map(r => r.getAs[Long]("k") ->
        (r.getAs[Long]("v"), r.getAs[String]("p"))).toMap
    // a and c partitions intact (static mode would have dropped them)
    assert(back == Map(1L -> ((10L, "a")), 2L -> ((20L, "a")),
      3L -> ((999L, "b")), 4L -> ((40L, "c"))))
  }

}
