package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 appears as a named
  * query here; each SQL-expressible one has a DuckDB oracle in
  * [[oracleSql]]. Column names/aliases are kept identical between the
  * Spark result and the oracle SQL (driver hash-compares after sorting
  * columns by name), every query ends with a total-order ORDER BY, and
  * double-valued outputs are rounded so cross-engine float noise can't
  * flip the hash (SURVEY.md §7.5 risk 1).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    reward.Reward.rewardTrajectory(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- reference analytic core (SURVEY.md §2.4-2.5) ---
    "reward_trajectory" -> ((s, d) => reward.Reward.rewardTrajectory(s, d)),
    "turn_scores" -> ((s, d) => reward.Reward.turnScores(s, d)),
    "grpo_normalize" -> ((s, d) => reward.Reward.grpoNormalize(s, d)),
    "session_termination" -> ((s, d) => session.Termination.sessionTermination(s, d)),
    // --- [EXT] relational core (SURVEY.md §2.3-2.8) ---
    "q1_pricing_summary" -> (ops.Relational.q1PricingSummary _),
    "revenue_by_nation" -> (ops.Relational.revenueByNation _),
    "top_orders_per_customer" -> (ops.Relational.topOrdersPerCustomer _),
    "moving_revenue_7d" -> (ops.Relational.movingRevenue7d _),
    "customers_without_orders" -> (ops.Relational.customersWithoutOrders _),
    "segment_order_stats" -> (ops.Relational.segmentOrderStats _),
    "range_join_quantity" -> (ops.Relational.rangeJoinQuantity _),
    "asof_latest_error" -> (ops.Relational.asofLatestError _),
    "rollup_acctbal" -> (ops.Relational.rollupAcctbal _),
    "distinct_counts" -> (ops.Relational.distinctCounts _),
    "approx_distinct_users" -> (ops.Relational.approxDistinctUsers _),
    "json_extract_events" -> (ops.Relational.jsonExtractEvents _),
    "monthly_revenue" -> (ops.Relational.monthlyRevenue _),
    "topk_parts" -> (ops.Relational.topkParts _),
    "nation_coverage" -> (ops.Relational.nationCoverage _),
    "nations_without_suppliers" -> (ops.Relational.nationsWithoutSuppliers _),
    "string_funcs_part" -> (ops.Relational.stringFuncsPart _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "reward_trajectory" ->
      """WITH turns AS (
        |  SELECT user_id AS dia_id,
        |         CAST(event_id % 5 + 1 AS INT) AS layer,
        |         CAST(event_id * 7 % 100 AS DOUBLE) / 100.0 AS confidence,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS turn
        |  FROM events
        |), lagged AS (
        |  SELECT dia_id, layer, confidence,
        |         coalesce(lag(layer) OVER (PARTITION BY dia_id ORDER BY turn), layer) AS last_layer
        |  FROM turns
        |), scored AS (
        |  SELECT dia_id,
        |         1.0/(1.0+exp(-8.0*((layer/5.0
        |           + 0.7*greatest(layer-last_layer,0)/5.0
        |           - 0.6*greatest(last_layer-layer,0)/5.0
        |           - 5.0*greatest(layer-(last_layer+1),0)/5.0) * (0.5+0.5*confidence) - 0.5))) AS score
        |  FROM lagged
        |)
        |SELECT dia_id, count(*) AS n_turns,
        |       round(CASE WHEN count(*) < 5 THEN 0.0 ELSE avg(score) END, 6) AS reward
        |FROM scored GROUP BY dia_id ORDER BY dia_id""".stripMargin,
    "turn_scores" ->
      """WITH turns AS (
        |  SELECT user_id AS dia_id,
        |         CAST(event_id % 5 + 1 AS INT) AS layer,
        |         CAST(event_id * 7 % 100 AS DOUBLE) / 100.0 AS confidence,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS turn
        |  FROM events
        |), lagged AS (
        |  SELECT dia_id, CAST(turn AS INT) AS turn, layer, confidence,
        |         coalesce(lag(layer) OVER (PARTITION BY dia_id ORDER BY turn), layer) AS last_layer
        |  FROM turns
        |)
        |SELECT dia_id, turn, layer, last_layer,
        |       round(1.0/(1.0+exp(-8.0*((layer/5.0
        |         + 0.7*greatest(layer-last_layer,0)/5.0
        |         - 0.6*greatest(last_layer-layer,0)/5.0
        |         - 5.0*greatest(layer-(last_layer+1),0)/5.0) * (0.5+0.5*confidence) - 0.5))), 6) AS score
        |FROM lagged ORDER BY dia_id, turn""".stripMargin,
    "grpo_normalize" ->
      """SELECT event_id, user_id, value,
        |       round(CASE WHEN sd IS NULL OR sd = 0.0 THEN 0.0
        |                  ELSE (value - mu) / sd END, 6) AS advantage
        |FROM (
        |  SELECT event_id, user_id, value,
        |         avg(value) OVER (PARTITION BY user_id) AS mu,
        |         stddev_samp(value) OVER (PARTITION BY user_id) AS sd
        |  FROM events
        |) ORDER BY event_id""".stripMargin,
    "session_termination" ->
      """WITH turns AS (
        |  SELECT user_id AS dia_id,
        |         CAST(event_id % 5 + 1 AS INT) AS layer,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS turn
        |  FROM events
        |), flagged AS (
        |  SELECT dia_id, turn,
        |         CASE WHEN turn >= 20 THEN 'max_turns'
        |              WHEN count(*) OVER w6 = 6
        |                   AND min(layer) OVER w6 = max(layer) OVER w6 THEN 'no_progress_6'
        |              WHEN count(*) OVER w5 = 5
        |                   AND min(layer) OVER w5 = 5 THEN 'perception_5'
        |         END AS terminate_reason
        |  FROM turns
        |  WINDOW w6 AS (PARTITION BY dia_id ORDER BY turn ROWS BETWEEN 5 PRECEDING AND CURRENT ROW),
        |         w5 AS (PARTITION BY dia_id ORDER BY turn ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |)
        |SELECT dia_id, CAST(turn AS INT) AS end_turn, terminate_reason
        |FROM (
        |  SELECT dia_id, turn, terminate_reason,
        |         row_number() OVER (PARTITION BY dia_id ORDER BY turn) AS rn
        |  FROM flagged WHERE terminate_reason IS NOT NULL
        |) WHERE rn = 1 ORDER BY dia_id""".stripMargin,
    // --- [EXT] relational core. DuckDB type notes: sum(INTEGER/BIGINT)
    // returns HUGEINT → cast to BIGINT to match Spark's LongType;
    // year()/month() return BIGINT → cast to INT. ---
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base_price,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |       round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
        |       round(avg(l_quantity), 6) AS avg_qty,
        |       round(avg(l_extendedprice), 6) AS avg_price,
        |       round(avg(l_discount), 6) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "revenue_by_nation" ->
      """SELECT r_name, n_name,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "top_orders_per_customer" ->
      """SELECT o_custkey, CAST(rn AS INT) AS rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders
        |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "moving_revenue_7d" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |         sum(o_totalprice) AS rev,
        |         datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS daynum
        |  FROM orders GROUP BY 1, 3
        |)
        |SELECT strftime(day, '%Y-%m-%d') AS day, round(rev, 2) AS revenue,
        |       round(sum(rev) OVER (ORDER BY daynum
        |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS revenue_7d
        |FROM daily ORDER BY day""".stripMargin,
    "customers_without_orders" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "segment_order_stats" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
        |       round(sum(c_acctbal), 2) AS sum_acctbal
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "range_join_quantity" ->
      """SELECT p_partkey,
        |       CAST(count(*) AS BIGINT) AS n_items,
        |       round(sum(l_quantity), 2) AS sum_qty
        |FROM part JOIN lineitem
        |  ON CAST(l_quantity AS INT) BETWEEN p_size AND p_size + 4
        |GROUP BY p_partkey ORDER BY p_partkey""".stripMargin,
    "asof_latest_error" ->
      """SELECT event_id, user_id, ts, prior_error_ts FROM (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts,
        |         last_value(CASE WHEN event_type = 'error' THEN epoch_us(ts) END
        |                    IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prior_error_ts
        |  FROM events
        |) WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "rollup_acctbal" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |       round(sum(c_acctbal), 2) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,
    "distinct_counts" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // approx_distinct_users: HLL sketch internals are engine-specific →
    // no oracle (rows-only check), per the contract comment above.
    "json_extract_events" ->
      """SELECT event_type,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |       round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 6) AS avg_k,
        |       count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "monthly_revenue" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS yr,
        |       CAST(month(o_orderdate) AS INT) AS mo,
        |       round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |FROM orders GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin,
    "topk_parts" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |ORDER BY p_retailprice DESC, p_partkey LIMIT 10""".stripMargin,
    "nation_coverage" ->
      """SELECT n_name FROM nation
        |WHERE EXISTS (SELECT 1 FROM customer WHERE c_nationkey = n_nationkey)
        |INTERSECT
        |SELECT n_name FROM nation
        |WHERE EXISTS (SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey)
        |ORDER BY n_name""".stripMargin,
    "nations_without_suppliers" ->
      """SELECT n_name FROM nation
        |WHERE EXISTS (SELECT 1 FROM customer WHERE c_nationkey = n_nationkey)
        |EXCEPT
        |SELECT n_name FROM nation
        |WHERE EXISTS (SELECT 1 FROM supplier
        |              WHERE s_nationkey = n_nationkey AND s_acctbal > 5000)
        |ORDER BY n_name""".stripMargin,
    "string_funcs_part" ->
      """SELECT p_partkey, lower(p_name) AS name_lc,
        |       substring(p_type, 1, 5) AS type5,
        |       replace(p_brand, '#', '_') AS brand_u,
        |       CAST(length(p_name) AS INT) AS name_len
        |FROM part ORDER BY p_partkey""".stripMargin,
  )
}
