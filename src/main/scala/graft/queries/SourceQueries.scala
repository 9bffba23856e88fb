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
    val dir = s"/tmp/graft_roundtrip_$fmt"
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_source_csv_roundtrip" -> ((s, d) => roundtrip(s, d, "csv")),
    "q_source_json_roundtrip" -> ((s, d) => roundtrip(s, d, "json")),
    "q_source_orc_roundtrip" -> ((s, d) => roundtrip(s, d, "orc")),
  )

  private val oracle =
    """SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name,
      |       sum(n_nationkey)::BIGINT AS key_sum
      |FROM nation GROUP BY n_regionkey""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_source_csv_roundtrip" -> oracle,
    "q_source_json_roundtrip" -> oracle,
    "q_source_orc_roundtrip" -> oracle,
  )
}
