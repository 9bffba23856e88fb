package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source-format coverage inside the correctness gate: the same rows routed
  * parquet → csv/json → DataFrame must aggregate to the parquet answer
  * (which is exactly what the DuckDB oracle computes from the parquet).
  * Exercises writer/reader schema round-trips the way a user switching
  * formats would (SURVEY.md §2b scans/sources).
  */
object SourceQueries {

  private def roundtrip(s: SparkSession, d: String, fmt: String): DataFrame = {
    Tables.load(s, d)
    val dir = Tables.scratchDir(s, s"roundtrip_$fmt")
    val src = s.table("nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    src.write.mode("overwrite").option("header", "true").format(fmt).save(dir)
    val back = s.read.option("header", "true")
      .schema(src.schema) // explicit schema: csv would otherwise infer strings
      .format(fmt).load(dir)
    back.groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n"),
        min(col("n_name")).as("first_name"),
        sum(col("n_nationkey")).as("key_sum"))
  }

  /** Schema evolution across parquet batch writes: an old batch without
    * `o_totalprice` and a new batch with it land in the same dataset dir;
    * `mergeSchema` reconciles them on read (missing column → NULL) — the
    * append-only lifecycle of a long-lived training-data table, where new
    * extraction runs add columns without rewriting history.
    */
  private def evolution(s: SparkSession, d: String): DataFrame = {
    Tables.load(s, d)
    val dir = Tables.scratchDir(s, "evolution")
    // clear the dataset dir first: each write only overwrites its own batch
    // subdir, so a stale extra batch from an earlier run would double rows
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val v1 = s.table("orders").where(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_custkey"))
    val v2 = s.table("orders").where(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    v1.write.mode("overwrite").parquet(s"$dir/batch=1")
    v2.write.mode("overwrite").parquet(s"$dir/batch=2")
    s.read.option("mergeSchema", "true").parquet(dir)
      .groupBy((col("o_orderkey") % 10).as("bucket"))
      .agg(count(lit(1)).as("n"),
        count(col("o_totalprice")).as("n_priced"),
        sum(col("o_custkey")).as("cust_sum"))
  }

  /** Hive-style partitioned layout + partition-pruned read: documents land
    * as `lang=XX/` directories, the reader filters one language, and the
    * scan prunes to that directory from the file listing alone —
    * `PartitionFilters` in the plan, zero rows read from the other
    * partitions (asserted in SourcesSpec). At 100 TB this is the first and
    * cheapest form of data skipping: the layout, not the engine, eliminates
    * (n-1)/n of the corpus before any parquet page is opened.
    */
  private def partitionedPrune(s: SparkSession, d: String): DataFrame = {
    Tables.load(s, d)
    // dataset- AND process-scoped dir: concurrent drivers (even on the same
    // sf dir) must not overwrite each other's live layout mid-read
    val dir = Tables.scratchDir(s,
      s"partitioned_${d.replaceAll("[^A-Za-z0-9]", "_")}")
    s.table("documents")
      .select(col("doc_id"), col("source"), col("n_chars"), col("lang"))
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    s.read.parquet(dir).where(col("lang") === "en")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_chars")).as("char_sum"),
        min(col("doc_id")).as("min_doc"))
  }

  /** Plain-text source round-trip (`spark.write.text` → `spark.read.text`):
    * the one-line-per-record format raw corpus dumps arrive in. Lines are
    * `doc_id<TAB>text` (the corpus vocabulary is whitespace-separated words,
    * no embedded tabs/newlines); the reader re-parses the id off the first
    * tab and aggregates token counts — proving the round-trip preserved
    * every line byte-for-byte against the parquet-side oracle.
    */
  private def textRoundtrip(s: SparkSession, d: String): DataFrame = {
    Tables.load(s, d)
    val dir = Tables.scratchDir(s, "roundtrip_text")
    // coalesce: concat_ws SKIPS null args (no tab written), and the
    // read-back parse would then resurrect the doc_id as the text
    s.table("documents")
      .select(concat_ws("\t", col("doc_id"), coalesce(col("text"), lit("")))
        .as("value"))
      .write.mode("overwrite").text(dir)
    val back = s.read.text(dir)
      .select(
        substring_index(col("value"), "\t", 1).cast("long").as("doc_id"),
        substring_index(col("value"), "\t", -1).as("text"))
    back.groupBy((col("doc_id") % 10).as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(graft.operators.TextAnalysis.tokenCount(col("text")).cast("long"))
          .as("tok_sum"),
        sum(length(col("text")).cast("long")).as("char_sum"))
  }

  /** `binaryFile` source — the ingest path for image/audio/video corpora
    * (one opaque blob per file + metadata columns, see Multimodal): a
    * bounded set of docs is written out as raw .bin files, read back via
    * `format("binaryFile")` with a `pathGlobFilter`, and fingerprinted.
    * The md5-of-content check proves the bytes survived the filesystem
    * round-trip; at 100 TB the same reader ships blobs into
    * [[graft.operators.Multimodal]] partition-parallel (one task per file
    * group, no driver involvement — the driver loop here only WRITES the
    * 20-file fixture).
    */
  private def binaryRoundtrip(s: SparkSession, d: String): DataFrame = {
    Tables.load(s, d)
    val dir = Tables.scratchDir(s, "roundtrip_bin")
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    fs.mkdirs(p)
    val rows = s.table("documents").where(col("doc_id") < 20)
      .select(col("doc_id"), col("text")).collect()
    rows.foreach { r =>
      val out = fs.create(new org.apache.hadoop.fs.Path(p, s"doc_${r.getLong(0)}.bin"))
      out.write(r.getString(1).getBytes("UTF-8"))
      out.close()
    }
    s.read.format("binaryFile").option("pathGlobFilter", "*.bin").load(dir)
      .select(element_at(split(col("path"), "/"), -1).as("fname"),
        col("length"), md5(col("content")).as("content_md5"))
  }

  /** Dynamic partition overwrite — the backfill/compaction write path of a
    * partitioned lake table: a rewrite job recomputes ONE partition and
    * `partitionOverwriteMode=dynamic` replaces exactly the partitions the
    * job produced, leaving every other partition's files untouched (static
    * mode would truncate the whole table first — the classic
    * lost-partitions accident this option exists to prevent). Here the
    * full orders layout lands partitioned by priority, the 1-URGENT
    * partition is rewritten with patched customer keys, and the read-back
    * aggregate must show patched 1-URGENT + original everything-else —
    * which is exactly what the oracle computes from the source table.
    */
  private def dynamicOverwrite(s: SparkSession, d: String): DataFrame = {
    Tables.load(s, d)
    val dir = Tables.scratchDir(s, "dyn_overwrite")
    val src = s.table("orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
    src.write.mode("overwrite").partitionBy("o_orderpriority").parquet(dir)
    src.where(col("o_orderpriority") === "1-URGENT")
      .withColumn("o_custkey", col("o_custkey") + 1000000L)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("o_orderpriority").parquet(dir)
    s.read.parquet(dir)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_custkey")).as("cust_sum"),
        min(col("o_orderkey")).as("min_key"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_source_text_roundtrip" -> ((s, d) => textRoundtrip(s, d)),
    "q_source_binary" -> ((s, d) => binaryRoundtrip(s, d)),
    "q_source_csv_roundtrip" -> ((s, d) => roundtrip(s, d, "csv")),
    "q_source_json_roundtrip" -> ((s, d) => roundtrip(s, d, "json")),
    "q_source_orc_roundtrip" -> ((s, d) => roundtrip(s, d, "orc")),
    "q_source_codecs" -> ((s, d) => codecs(s, d)),
    "q_source_evolution" -> ((s, d) => evolution(s, d)),
    "q_source_partitioned" -> ((s, d) => partitionedPrune(s, d)),
    "q_source_dyn_overwrite" -> ((s, d) => dynamicOverwrite(s, d)),
  )

  /** Parquet compression-codec round-trip: the same slice written with
    * zstd, gzip and snappy (the three codecs a 100 TB lake actually
    * chooses between — zstd for cold storage ratio, snappy for hot-path
    * speed), each read back and aggregated; all three codec rows must
    * reproduce the source aggregate exactly. Exercises the zstd-jni /
    * codec configuration path end to end, not just the default codec.
    */
  private def codecs(s: SparkSession, d: String): DataFrame = {
    Tables.load(s, d)
    val dir = Tables.scratchDir(s, "codecs")
    val src = s.table("orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
    val names = Seq("zstd", "gzip", "snappy")
    names.foreach(c => src.write.mode("overwrite")
      .option("compression", c).parquet(s"$dir/$c"))
    names.map(c => s.read.parquet(s"$dir/$c").withColumn("codec", lit(c)))
      .reduce(_ unionAll _)
      .groupBy(col("codec"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_custkey")).as("cust_sum"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"),
        count_distinct(col("o_orderpriority")).as("n_prio"))
  }

  private val oracle =
    """SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name,
      |       sum(n_nationkey)::BIGINT AS key_sum
      |FROM nation GROUP BY n_regionkey""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_source_csv_roundtrip" -> oracle,
    "q_source_json_roundtrip" -> oracle,
    "q_source_orc_roundtrip" -> oracle,
    // three codec rows, each the plain source aggregate
    "q_source_codecs" ->
      """SELECT c.codec, count(*) AS n,
        |       sum(o_custkey)::BIGINT AS cust_sum,
        |       min(o_orderkey)::BIGINT AS min_key,
        |       max(o_orderkey)::BIGINT AS max_key,
        |       count(DISTINCT o_orderpriority)::BIGINT AS n_prio
        |FROM orders CROSS JOIN (VALUES ('zstd'), ('gzip'), ('snappy'))
        |  AS c(codec)
        |GROUP BY c.codec""".stripMargin,
    // merged read == union of the two batches with the old batch's missing
    // column NULL: n_priced counts only odd keys
    "q_source_evolution" ->
      """SELECT o_orderkey % 10 AS bucket, count(*) AS n,
        |       count(*) FILTER (o_orderkey % 2 = 1)::BIGINT AS n_priced,
        |       sum(o_custkey)::BIGINT AS cust_sum
        |FROM orders GROUP BY 1""".stripMargin,
    // pruned partitioned read == plain filtered aggregate over the source
    "q_source_partitioned" ->
      """SELECT source, count(*) AS n, sum(n_chars)::BIGINT AS char_sum,
        |       min(doc_id) AS min_doc
        |FROM documents WHERE lang = 'en' GROUP BY source""".stripMargin,
    // text round-trip == the same aggregate straight off the parquet table
    "q_source_text_roundtrip" ->
      s"""SELECT doc_id % 10 AS bucket, count(*) AS n,
        |       sum(len(${graft.operators.TextAnalysis.toksSql("coalesce(text, '')")}))::BIGINT AS tok_sum,
        |       sum(strlen(coalesce(text, '')))::BIGINT AS char_sum
        |FROM documents GROUP BY 1""".stripMargin,
    // binary files carry the docs' UTF-8 bytes verbatim: same length, same
    // md5 (ASCII corpus, so strlen == byte length)
    "q_source_binary" ->
      """SELECT 'doc_' || doc_id || '.bin' AS fname,
        |       strlen(text)::BIGINT AS length, md5(text) AS content_md5
        |FROM documents WHERE doc_id < 20""".stripMargin,
    // final layout = patched 1-URGENT partition + untouched others; a
    // static overwrite would have dropped every non-1-URGENT row
    "q_source_dyn_overwrite" ->
      """SELECT o_orderpriority, count(*) AS n,
        |       sum(o_custkey + CASE WHEN o_orderpriority = '1-URGENT'
        |                            THEN 1000000 ELSE 0 END)::BIGINT
        |         AS cust_sum,
        |       min(o_orderkey)::BIGINT AS min_key
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
  )
}
