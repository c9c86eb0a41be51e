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
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "reward_trajectory" ->
      """WITH turns AS (
        |  SELECT user_id AS dia_id,
        |         CAST(event_id % 5 + 1 AS INT) AS layer,
        |         CAST(event_id * 7 % 100 AS DOUBLE) / 100.0 AS confidence,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS turn
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
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS turn
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
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS turn
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
  )
}
