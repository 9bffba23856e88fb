package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling — the QA pass a training-data pipeline runs before and
  * after every transform batch: per-column null counts, cardinalities, and
  * value ranges, computed in ONE scan regardless of column count (all stats
  * fold into a single aggregate row, then unpivot to one row per column —
  * no per-column jobs, no driver-side loops). The reference inherits
  * nothing like this; it is a north-star pipeline operator (SURVEY.md §2c).
  *
  * Two tiers, same posture as the dedup/sketch families:
  *  - [[profileExact]] — exact distinct counts (Spark plans the multi-column
  *    count(DISTINCT) as one expand + two-phase aggregate);
  *  - [[profile]] — HLL `approx_count_distinct` cardinalities for 100 TB
  *    runs, where per-column state is a fixed-size sketch instead of the
  *    distinct value set.
  */
object Profile {

  private def stats(df: DataFrame, cols: Seq[String],
      distinctOf: String => org.apache.spark.sql.Column): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, lit(1))).as(s"__null_$c"),
        distinctOf(c).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    // unpivot the single stats row into (column, …) rows — min/max are
    // rendered as strings so mixed column types share one output schema
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("column"),
        col(s"__null_$c").as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_val"),
        col(s"__max_$c").as("max_val"))): _*)).as("s"))
      .select("s.*")
  }

  /** Exact profile of `cols`: (column, n_null, n_distinct, min_val,
    * max_val), one row per column. One scan, one aggregate.
    */
  def profileExact(df: DataFrame, cols: Seq[String]): DataFrame =
    stats(df, cols, c => count_distinct(col(c)))

  /** [[profileExact]] with HLL approximate cardinalities (`rsd` standard
    * error) — the 100 TB tier.
    */
  def profile(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame =
    stats(df, cols, c => approx_count_distinct(col(c), rsd))

  /** DuckDB SQL replaying [[profileExact]] over the named table: one
    * UNION ALL branch per column (re-scans are fine at oracle scale).
    */
  def exactOracleSql(table: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS column, count(*) FILTER ($c IS NULL)::BIGINT AS n_null,
         |       count(DISTINCT $c)::BIGINT AS n_distinct,
         |       min($c)::VARCHAR AS min_val, max($c)::VARCHAR AS max_val
         |FROM $table""".stripMargin
    }.mkString("\nUNION ALL\n")
}
