package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Host-engine relational queries over the TPC-H-ish tables.
  *
  * The reference inherits its entire relational algebra from DataFusion
  * (SURVEY.md §2b — zero code in the repo for scans, joins, windows, …); the
  * Spark rebuild inherits the same surface from Spark SQL / Catalyst. These
  * queries *exercise* that inherited surface category by category, each with
  * a DuckDB oracle, so the correctness gate covers what a user of the
  * reference+DataFusion stack can run today.
  *
  * FP-determinism rules for hash-matching oracles (SURVEY.md §7):
  *  - money sums go through DECIMAL(18,2) (exact, order-independent), then
  *    one final cast to DOUBLE — identical on both engines;
  *  - l_quantity-style integral doubles sum exactly — safe as-is;
  *  - arbitrary doubles (events.value, o_totalprice) are only counted,
  *    min/max'd, or compared per-row — never accumulated;
  *  - top-k / window ORDER BYs always carry a unique key as tiebreaker.
  */
object HostQueries {

  private def q(spark: SparkSession, dir: String, sql: String): DataFrame = {
    Tables.load(spark, dir)
    spark.sql(sql)
  }

  /** Spark SQL and DuckDB share ANSI syntax for every query below, so each
    * entry is (sparkAndOracleSql). Divergences are handled per-query.
    */
  private case class Q(name: String, sparkSql: String, oracle: Option[String])
  private def same(name: String, sql: String) = Q(name, sql, Some(sql))

  private val defs: Seq[Q] = Seq(
    // --- aggregation: TPC-H Q1 shape (filter → groupBy → multi-agg) ---
    same("q_host_agg_pricing",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc,
        |       count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin),

    // --- multi-way join with broadcastable dims + agg ---
    same("q_host_join_nation_revenue",
      """SELECT n_name, r_name,
        |       count(*) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY n_name, r_name""".stripMargin),

    // --- big fact-fact shuffle join ---
    same("q_host_join_lineitem_orders",
      """SELECT o_orderpriority,
        |       count(*) AS n_lines,
        |       CAST(sum(l_quantity) AS DOUBLE) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus <> 'F'
        |GROUP BY o_orderpriority""".stripMargin),

    // --- semi / anti joins (EXISTS / NOT EXISTS) ---
    same("q_host_semi_anti",
      """SELECT
        |  (SELECT count(*) FROM customer WHERE EXISTS
        |     (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS with_orders,
        |  (SELECT count(*) FROM customer WHERE NOT EXISTS
        |     (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS without_orders""".stripMargin),

    // --- window functions: rank per partition with unique tiebreak ---
    same("q_host_window_top_orders",
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |         CAST(row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |  FROM orders) t
        |WHERE rn <= 3""".stripMargin),

    // --- running window aggregate. (l_orderkey, l_linenumber) is NOT unique
    // in this dataset, so l_quantity joins the sort key: rows tied on the
    // full ORDER BY have equal quantity, making every prefix sum
    // order-invariant ---
    same("q_host_window_running",
      """SELECT l_orderkey, l_linenumber,
        |       CAST(sum(l_quantity) OVER (PARTITION BY l_orderkey
        |         ORDER BY l_linenumber, l_quantity, l_partkey, l_suppkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        |FROM lineitem""".stripMargin),

    // --- top-k (global sort + limit, unique tiebreak) ---
    same("q_host_topk_orders",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin),

    // --- set operations ---
    same("q_host_setops",
      """SELECT 'both' AS tag, count(*) AS n FROM (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |UNION ALL
        |SELECT 'building_no_open' AS tag, count(*) AS n FROM (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')""".stripMargin),

    // --- rollup (grouping sets) ---
    same("q_host_rollup",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(l_quantity) AS DOUBLE) AS qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin),

    // --- distinct aggregation ---
    same("q_host_distinct",
      """SELECT l_returnflag,
        |       count(DISTINCT l_partkey) AS distinct_parts,
        |       count(DISTINCT l_suppkey) AS distinct_supps
        |FROM lineitem GROUP BY l_returnflag""".stripMargin),

    // --- scalar string/date/math functions + CASE, per-row (no agg) ---
    same("q_host_scalar_funcs",
      """SELECT p_partkey,
        |       upper(p_brand) AS brand_u,
        |       substr(p_name, 1, 8) AS name8,
        |       CAST(length(p_type) AS BIGINT) AS type_len,
        |       concat(p_brand, '#', p_type) AS tagged,
        |       CASE WHEN p_size > 25 THEN 'large'
        |            WHEN p_size > 10 THEN 'medium'
        |            ELSE 'small' END AS size_class,
        |       abs(p_size - 25) AS dist25,
        |       p_retailprice * 2 AS px2
        |FROM part WHERE p_size % 2 = 1""".stripMargin),

    // --- date/time bucketing over the events stream table ---
    same("q_host_events_hourly",
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |       count(*) AS n, min(value) AS mn, max(value) AS mx,
        |       count(DISTINCT user_id) AS users
        |FROM events GROUP BY date_trunc('hour', ts), event_type""".stripMargin),

    // --- regex extraction + conditional scalar functions ---
    Q("q_host_regex",
      """SELECT p_partkey,
        |       CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS INT) AS brand_num,
        |       coalesce(nullif(p_type, ''), 'unknown') AS type_nz,
        |       greatest(p_size, 10) AS size_floor10,
        |       least(p_size, 40) AS size_cap40
        |FROM part WHERE p_size BETWEEN 5 AND 45""".stripMargin,
      Some("""SELECT p_partkey,
        |       regexp_extract(p_brand, 'Brand#(\d+)', 1)::INTEGER AS brand_num,
        |       coalesce(nullif(p_type, ''), 'unknown') AS type_nz,
        |       greatest(p_size, 10)::INTEGER AS size_floor10,
        |       least(p_size, 40)::INTEGER AS size_cap40
        |FROM part WHERE p_size BETWEEN 5 AND 45""".stripMargin)),

    // --- exact percentiles (interpolated; integral doubles → deterministic)
    Q("q_host_percentile",
      """SELECT l_returnflag,
        |       percentile(l_quantity, 0.5) AS p50,
        |       percentile(l_quantity, 0.9) AS p90,
        |       CAST(min(l_quantity) AS DOUBLE) AS mn,
        |       CAST(max(l_quantity) AS DOUBLE) AS mx
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
      Some("""SELECT l_returnflag,
        |       quantile_cont(l_quantity, 0.5) AS p50,
        |       quantile_cont(l_quantity, 0.9) AS p90,
        |       min(l_quantity) AS mn, max(l_quantity) AS mx
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // --- JSON extraction over the events.props column ---
    Q("q_host_json",
      """SELECT event_type,
        |       CAST(sum(CAST(get_json_object(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |       CAST(max(CAST(get_json_object(props, '$.k') AS INT)) AS INT) AS max_k,
        |       count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,
      Some("""SELECT event_type,
        |       sum(json_extract_string(props, '$.k')::INTEGER)::BIGINT AS sum_k,
        |       max(json_extract_string(props, '$.k')::INTEGER)::INTEGER AS max_k,
        |       count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin)),

    // --- pivot (Spark .pivot ≡ conditional aggregation; oracle uses the
    // FILTER form so both engines compute identical conditional sums) ---
    same("q_host_pivot",
      """SELECT l_returnflag,
        |       CAST(sum(l_quantity) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS qty_open,
        |       CAST(sum(l_quantity) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_filled,
        |       count(*) FILTER (WHERE l_linestatus = 'O') AS n_open,
        |       count(*) FILTER (WHERE l_linestatus = 'F') AS n_filled
        |FROM lineitem GROUP BY l_returnflag""".stripMargin),

    // --- cube (all grouping-set combinations) ---
    same("q_host_cube",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(l_quantity) AS DOUBLE) AS qty, count(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin),

    // --- explode / unnest (lateral row generation) ---
    Q("q_host_explode",
      """SELECT word, count(*) AS n
        |FROM (SELECT explode(split(p_name, ' ')) AS word FROM part)
        |GROUP BY word""".stripMargin,
      Some("""SELECT word, count(*) AS n
        |FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
        |GROUP BY word""".stripMargin)),

    // --- IN / NOT IN subqueries ---
    same("q_host_in_subquery",
      """SELECT count(*) AS n_building_lines
        |FROM lineitem WHERE l_orderkey IN (
        |  SELECT o_orderkey FROM orders WHERE o_custkey IN (
        |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'))""".stripMargin),

    // --- date arithmetic / extraction ---
    same("q_host_date_arith",
      """SELECT CAST(year(o_orderdate) AS INT) AS y, CAST(month(o_orderdate) AS INT) AS m,
        |       count(*) AS n,
        |       CAST(min(o_orderdate + INTERVAL 30 DAY) AS DATE) AS min_due
        |FROM orders GROUP BY 1, 2""".stripMargin),

    // --- correlated scalar subquery (integral avg → deterministic) ---
    same("q_host_subquery_avg",
      """SELECT l_returnflag, count(*) AS n_small
        |FROM lineitem l1
        |WHERE l_quantity < (SELECT avg(l_quantity) * 0.5
        |                    FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
        |GROUP BY l_returnflag""".stripMargin),

    // --- GROUPING SETS (beyond rollup/cube: explicit set list + grouping()) ---
    same("q_host_grouping_sets",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(grouping(l_returnflag) AS INT) AS g_rf,
        |       CAST(grouping(l_linestatus) AS INT) AS g_ls,
        |       CAST(sum(l_quantity) AS DOUBLE) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin),

    // --- window frames: RANGE/ROWS BETWEEN running + sliding aggregates ---
    same("q_host_window_frames",
      """SELECT o_orderkey,
        |       CAST(sum(o_orderkey % 10 + 1) OVER (
        |         PARTITION BY o_custkey ORDER BY o_orderkey
        |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS sliding_n,
        |       CAST(count(*) OVER (
        |         PARTITION BY o_custkey ORDER BY o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_n,
        |       CAST(first_value(o_orderkey) OVER (
        |         PARTITION BY o_custkey ORDER BY o_orderkey) AS BIGINT) AS first_ok,
        |       CAST(lag(o_orderkey, 1, -1) OVER (
        |         PARTITION BY o_custkey ORDER BY o_orderkey) AS BIGINT) AS prev_ok
        |FROM orders""".stripMargin),

    // --- value-based RANGE frame over event time: trailing 30-minute
    // per-user activity count (the time-valued frame q_host_window_frames'
    // ROWS frames don't cover) ---
    same("q_host_range_frame",
      """SELECT event_id, user_id,
        |       CAST(count(*) OVER (
        |         PARTITION BY user_id ORDER BY ts
        |         RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING AND CURRENT ROW)
        |         AS BIGINT) AS n_trailing_30m
        |FROM events""".stripMargin),

    // --- conditional aggregation: FILTER clause + CASE-guarded counts ---
    same("q_host_conditional_agg",
      """SELECT l_returnflag,
        |       count(*) FILTER (WHERE l_quantity > 25) AS n_big,
        |       count(*) FILTER (WHERE l_discount = 0) AS n_nodisc,
        |       CAST(sum(CASE WHEN l_linenumber = 1 THEN l_quantity ELSE 0 END) AS DOUBLE)
        |         AS qty_first_lines,
        |       CAST(max(CASE WHEN l_tax > 0.05 THEN l_quantity END) AS DOUBLE) AS max_taxed_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin),

    // --- EXISTS / NOT EXISTS correlated subqueries ---
    same("q_host_exists",
      """SELECT c_mktsegment,
        |       count(*) FILTER (WHERE EXISTS (
        |         SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS with_orders,
        |       count(*) FILTER (WHERE NOT EXISTS (
        |         SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS without_orders
        |FROM customer GROUP BY c_mktsegment""".stripMargin),

    // --- array functions: construct, sort, slice, contains, position ---
    Q("q_host_array_funcs",
      """SELECT n_nationkey,
        |       CAST(element_at(array_sort(array(n_regionkey, n_nationkey % 3,
        |                                        n_nationkey % 7)), 1) AS INT) AS smallest,
        |       CAST(size(slice(array(n_regionkey, n_nationkey % 3, n_nationkey % 7),
        |                       1, 2)) AS BIGINT) AS sliced_n,
        |       array_contains(array(n_regionkey, n_nationkey % 3), 2) AS has_two,
        |       CAST(array_position(array_sort(array(n_regionkey, n_nationkey % 3,
        |                                            n_nationkey % 7)),
        |                           n_regionkey) AS BIGINT) AS pos_of_region
        |FROM nation""".stripMargin,
      Some(
        // DuckDB: 1-based list funcs; list_position returns NULL-able int;
        // list_sort ascending default matches array_sort
        """SELECT n_nationkey,
          |       list_sort([n_regionkey, n_nationkey % 3, n_nationkey % 7])[1]::INTEGER
          |         AS smallest,
          |       len([n_regionkey, n_nationkey % 3, n_nationkey % 7][1:2])::BIGINT
          |         AS sliced_n,
          |       list_contains([n_regionkey, n_nationkey % 3], 2) AS has_two,
          |       coalesce(list_position(list_sort([n_regionkey, n_nationkey % 3,
          |                                         n_nationkey % 7]),
          |                              n_regionkey), 0)::BIGINT AS pos_of_region
          |FROM nation""".stripMargin)),

    // --- nested struct construction + field access ---
    Q("q_host_struct_nested",
      """SELECT s.info.region AS region, count(*) AS n,
        |       CAST(min(s.info.key) AS INT) AS min_key
        |FROM (
        |  SELECT named_struct('info',
        |           named_struct('region', n_regionkey, 'key', n_nationkey),
        |         'name', n_name) AS s
        |  FROM nation)
        |GROUP BY s.info.region""".stripMargin,
      Some(
        // DuckDB spells struct construction struct_pack(field := v)
        """SELECT s.info.region AS region, count(*) AS n,
          |       min(s.info.key)::INTEGER AS min_key
          |FROM (
          |  SELECT struct_pack(info := struct_pack(region := n_regionkey,
          |                                         key := n_nationkey),
          |                     name := n_name) AS s
          |  FROM nation)
          |GROUP BY s.info.region""".stripMargin)),

    // --- recursive CTE (Spark 4 WITH RECURSIVE): month spine over the
    // orders date range, left-joined to per-month order counts ---
    same("q_host_recursive_cte",
      // the max bound rides along as a column: a subquery in the recursive
      // member would rescan orders once per iteration (80 scans)
      """WITH RECURSIVE months(m, mx) AS (
        |  SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE),
        |         CAST(date_trunc('month', max(o_orderdate)) AS DATE)
        |  FROM orders
        |  UNION ALL
        |  SELECT CAST(m + INTERVAL 1 MONTH AS DATE), mx FROM months WHERE m < mx)
        |SELECT m, count(o_orderkey) AS n
        |FROM months LEFT JOIN orders
        |  ON CAST(date_trunc('month', o_orderdate) AS DATE) = m
        |GROUP BY m""".stripMargin),

    // --- TPC-H Q3 shape: top revenue among unshipped orders (money sums
    // through DECIMAL, unique tiebreaker on the key) ---
    same("q_host_q3_shipping",
      """SELECT l_orderkey,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |                * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       CAST(min(o_orderdate) AS DATE) AS o_orderdate
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < DATE '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin),

    // --- TPC-H Q5 shape: revenue where customer and supplier share the
    // nation (join through region for the predicate chain) ---
    same("q_host_q5_local_supplier",
      """SELECT n_name,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |                * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin),

    // --- TPC-H Q10 shape: returned-item revenue per customer ---
    same("q_host_q10_returns",
      """SELECT c_custkey, c_name, n_name,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |                * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin),

    // --- ANSI-mode error-safe functions: try_divide / try_cast return NULL
    // where strict ANSI evaluation would throw ---
    Q("q_host_try_funcs",
      """SELECT l_returnflag,
        |       count(*) FILTER (WHERE try_divide(l_quantity, l_linenumber - 1) IS NULL)
        |         AS n_div_null,
        |       CAST(sum(try_divide(l_quantity, 2)) AS DOUBLE) AS half_qty,
        |       count(try_cast(l_returnflag AS INT)) AS n_numeric_flags
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
      Some(
        """SELECT l_returnflag,
          |       count(*) FILTER (WHERE l_linenumber = 1) AS n_div_null,
          |       sum(l_quantity / 2) AS half_qty,
          |       count(TRY_CAST(l_returnflag AS INT)) AS n_numeric_flags
          |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // --- ranking window functions: dense_rank / percent_rank / ntile ---
    same("q_host_ranking",
      """SELECT o_orderkey,
        |       CAST(dense_rank() OVER w AS BIGINT) AS dr,
        |       percent_rank() OVER w AS pr,
        |       CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)""".stripMargin),

    // --- inline VALUES table joined against a scan (constant dimension
    // tables without a file — common for tiny lookup/mapping tables) ---
    same("q_host_values_join",
      """SELECT v.tier, count(*) AS n,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
        |FROM (VALUES ('BUILDING', 'brick'),
        |             ('AUTOMOBILE', 'metal'),
        |             ('MACHINERY', 'metal')) AS v(seg, tier)
        |JOIN customer ON c_mktsegment = v.seg
        |GROUP BY v.tier""".stripMargin),

    // --- ordered string aggregation (listagg WITHIN GROUP; DuckDB spells
    // it string_agg with an inline ORDER BY) ---
    Q("q_host_listagg",
      """SELECT r_name, listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS members
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
      Some(
        """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS members
          |FROM nation JOIN region ON n_regionkey = r_regionkey
          |GROUP BY r_name""".stripMargin)),

    // --- lateral column aliases: a derived column referenced by later
    // select-list expressions in the same query block ---
    same("q_host_lateral_alias",
      """SELECT l_orderkey, l_linenumber,
        |       l_extendedprice * (1 - l_discount) AS net,
        |       net * 0.07 AS tax,
        |       net - tax AS net_after_tax
        |FROM lineitem
        |WHERE l_orderkey < 100""".stripMargin),

    // --- interval arithmetic + timestamp deltas over the event stream ---
    Q("q_host_interval_arith",
      """SELECT event_id,
        |       ts + INTERVAL 90 MINUTE AS ts_plus,
        |       ts - INTERVAL 1 DAY AS ts_prev_day,
        |       CAST(timestampdiff(MINUTE, TIMESTAMP '2024-01-01 00:00:00', ts) AS BIGINT) AS mins_in
        |FROM events WHERE user_id < 20""".stripMargin,
      Some(
        """SELECT event_id,
          |       ts + INTERVAL 90 MINUTE AS ts_plus,
          |       ts - INTERVAL 1 DAY AS ts_prev_day,
          |       date_diff('minute', TIMESTAMP '2024-01-01 00:00:00', ts)::BIGINT AS mins_in
          |FROM events WHERE user_id < 20""".stripMargin)),

    // --- UNPIVOT: wide → long relayout (metric columns to rows). Sums are
    // exact in DECIMAL, one final DOUBLE cast — both engines share the
    // SQL-standard UNPIVOT clause ---
    same("q_host_unpivot",
      """SELECT l_returnflag, metric, CAST(val AS DOUBLE) AS val
        |FROM (
        |  SELECT l_returnflag,
        |         CAST(sum(l_quantity) AS DECIMAL(18,2)) AS sum_qty,
        |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_price,
        |         CAST(count(*) AS DECIMAL(18,2)) AS n_rows
        |  FROM lineitem GROUP BY l_returnflag)
        |UNPIVOT (val FOR metric IN (sum_qty, sum_price, n_rows))""".stripMargin),

    // --- map construction + lookup (map_from_arrays / element access) ---
    Q("q_host_map_funcs",
      """SELECT n_nationkey,
        |       element_at(map(n_name, n_regionkey), n_name) AS looked_up,
        |       CAST(size(map(n_name, n_regionkey)) AS BIGINT) AS m_size
        |FROM nation""".stripMargin,
      Some(
        // DuckDB map extraction yields a LIST of matches — take element 1
        """SELECT n_nationkey,
          |       list_extract(map_extract(map([n_name], [n_regionkey]), n_name), 1)
          |         AS looked_up,
          |       cardinality(map([n_name], [n_regionkey]))::BIGINT AS m_size
          |FROM nation""".stripMargin)),
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> ((s: SparkSession, dir: String) => q(s, dir, d.sparkSql))).toMap ++ Map[String, (SparkSession, String) => DataFrame](
      // --- schema-aligned union (unionByName with missing columns): SQL
      // UNION is positional, so this is exercised through the DataFrame API;
      // the oracle replays it as an explicitly-ordered UNION ALL ---
      "q_host_union_by_name" -> ((s, dir) => {
        Tables.load(s, dir)
        import org.apache.spark.sql.functions.col
        val a = s.table("region")
          .select(col("r_regionkey").as("k"), col("r_name").as("name"))
        val b = s.table("nation")
          .select(col("n_name").as("name"), col("n_nationkey").as("k"),
            col("n_regionkey").as("extra"))
        a.unionByName(b, allowMissingColumns = true)
      })
    )

  val oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap ++ Map(
      "q_host_union_by_name" ->
        """SELECT r_regionkey AS k, r_name AS name, NULL::INTEGER AS extra FROM region
          |UNION ALL
          |SELECT n_nationkey, n_name, n_regionkey FROM nation""".stripMargin
    )
}
