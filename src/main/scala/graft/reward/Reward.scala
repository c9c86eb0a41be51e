package graft.reward

import graft.Tables
import graft.functions.ColumnFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reward-shape hyperparameters — reference `reward.py:39-45` defaults.
  * k=12 from `configs/interaction_config.yaml:9` is dead (SURVEY.md §2.12). */
final case class RewardConfig(
    beta: Double = 0.7,
    delta: Double = 0.6,
    skipW: Double = 5.0,
    k: Double = 8.0,
    c: Double = 0.5,
    maxDepth: Double = 5.0,
    minTurns: Int = 5)

/** The analytic heart of the reference (SURVEY.md §2.5 W1/W2, §2.4 A1):
  * per-turn lag-difference scoring + shaped sigmoid + gated trajectory
  * mean, re-expressed as Spark window functions.
  *
  * Reference behavior: `reward.py:28-69` (sequential fold carrying
  * `last_layer`), `empathy_interaction.py:288-297` (layer history).
  * The fold only consumes the previous element, so `lag` over an
  * ordered per-dialogue window reproduces it exactly; the first turn's
  * `last_layer` defaults to its own layer (`reward.py:48`) → progress
  * and regress are 0 at t=1.
  *
  * Scale: one shuffle on dia_id (window partition), then a map-side
  * partial + final hash aggregate for the trajectory mean. At 100 TB
  * the dialogue key is high-cardinality and un-skewed by construction
  * (uuid per rollout), so the window parallelizes cleanly.
  */
object Reward {

  /** Derive a deterministic layer-history turns table
    * (FIXTURES.md §1.3 shape) from the driver `events` table:
    * user_id↔dia_id, event_id↔turn order (FIXTURES.md §2 usage
    * mapping). Ordering is by event_id ALONE (globally unique):
    * `events.ts` has sub-microsecond precision that DuckDB truncates on
    * read, so any ts-based ordering can diverge between engines on
    * same-microsecond ties (SURVEY.md §7.5 risk 1). The
    * layer/confidence derivations are plain integer arithmetic so the
    * DuckDB oracle computes bit-identical values. */
  def turnsFromEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val byDia = Window.partitionBy("dia_id").orderBy("event_id")
    ev.select(
        col("user_id").as("dia_id"),
        col("event_id"),
        (pmod(col("event_id"), lit(5L)) + lit(1L)).cast("int").as("layer"),
        (pmod(col("event_id") * lit(7L), lit(100L)).cast("double") / lit(100.0)).as("confidence"))
      .withColumn("turn", row_number().over(byDia))
  }

  /** Per-turn shaped score (W1+W2) over a turns table with columns
    * (dia_id, turn, layer, confidence). Adds `last_layer` and `score`. */
  def perTurnScores(turns: DataFrame, cfg: RewardConfig = RewardConfig()): DataFrame = {
    val w = Window.partitionBy("dia_id").orderBy("turn")
    val lastLayer = coalesce(lag(col("layer"), 1).over(w), col("layer"))
    val md = lit(cfg.maxDepth)
    val depth = col("layer").cast("double") / md
    val progress = clamp0((col("layer") - col("last_layer")).cast("double")) / md
    val regress = clamp0((col("last_layer") - col("layer")).cast("double")) / md
    val skip = clamp0((col("layer") - (col("last_layer") + lit(1))).cast("double")) / md
    val raw = (depth + lit(cfg.beta) * progress - lit(cfg.delta) * regress -
      lit(cfg.skipW) * skip) * (lit(0.5) + lit(0.5) * col("confidence"))
    turns
      .withColumn("last_layer", lastLayer)
      .withColumn("score", sigmoid(lit(cfg.k) * (raw - lit(cfg.c))))
  }

  /** Trajectory reward (A1): 0.0 if fewer than `minTurns` turns, else
    * mean per-turn score — `reward.py:24-26,69`. */
  def trajectoryReward(turns: DataFrame, cfg: RewardConfig = RewardConfig()): DataFrame =
    perTurnScores(turns, cfg)
      .groupBy("dia_id")
      .agg(count(lit(1)).as("n_turns"), avg("score").as("mean_score"))
      .select(
        col("dia_id"),
        col("n_turns"),
        round(when(col("n_turns") < cfg.minTurns, lit(0.0)).otherwise(col("mean_score")), 6)
          .as("reward"))
      .orderBy("dia_id")

  /** Flagship query (SURVEY.md §7.2): events → turns → reward. */
  def rewardTrajectory(spark: SparkSession, dir: String): DataFrame =
    trajectoryReward(turnsFromEvents(spark, dir))

  /** Per-turn score dump (W1/W2 visible per row), oracle-checkable. */
  def turnScores(spark: SparkSession, dir: String): DataFrame =
    perTurnScores(turnsFromEvents(spark, dir))
      .select(
        col("dia_id"), col("turn"), col("layer"), col("last_layer"),
        round(col("score"), 6).as("score"))
      .orderBy("dia_id", "turn")

  /** GRPO group-relative normalization (A7) — advantage =
    * (r - mean(group)) / stddev(group), group = prompt. Reference
    * selects this via `algorithm.adv_estimator: grpo`
    * (`configs/multiturn_grpo_interaction.yaml:14`). Computed over the
    * events table with user_id as the prompt group. */
  /** PREFERENCE-PAIR CONSTRUCTION ([EXT] of the reference's
    * group-relative reward surface, same prompt-group convention as
    * [[grpoNormalize]]): from each group of sampled rollouts, emit
    * ONE (chosen, rejected) pair — the best- and worst-rewarded
    * members — with the reward margin; groups whose members all tie
    * produce nothing (margin 0 carries no preference signal). This
    * is the DPO/RLHF dataset-prep step downstream of rollout scoring:
    * group → rank → pair. Ties inside a group break on the SMALLEST
    * event id, so the pairing is deterministic under any partitioning.
    * One shuffle on the group key; two in-partition sorts (best/worst
    * rank) over the same exchange — no joins against the fact table,
    * and the per-group output is exactly one row, so the result is
    * |groups|-sized at any corpus scale. */
  def preferencePairs(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val best = Window.partitionBy("user_id")
      .orderBy(col("value").desc, col("event_id").asc)
    val worst = Window.partitionBy("user_id")
      .orderBy(col("value").asc, col("event_id").asc)
    val ranked = ev.select(
      col("user_id"), col("event_id"), col("value"),
      row_number().over(best).as("rb"), row_number().over(worst).as("rw"))
    val chosen = ranked.filter(col("rb") === 1).select(
      col("user_id"), col("event_id").as("chosen_id"), col("value").as("chosen_r"))
    val rejected = ranked.filter(col("rw") === 1).select(
      col("user_id"), col("event_id").as("rejected_id"), col("value").as("rejected_r"))
    chosen.join(rejected, Seq("user_id"))
      .filter(col("chosen_id") =!= col("rejected_id"))
      .select(
        col("user_id"), col("chosen_id"), col("rejected_id"),
        round(col("chosen_r"), 6).as("chosen_r"),
        round(col("rejected_r"), 6).as("rejected_r"),
        round(col("chosen_r") - col("rejected_r"), 6).as("margin"))
      .filter(col("margin") > 0)
      .orderBy("user_id")
  }

  def grpoNormalize(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val w = Window.partitionBy("user_id")
    val mu = avg(col("value")).over(w)
    val sd = stddev_samp(col("value")).over(w)
    ev.select(
        col("event_id"), col("user_id"), col("value"),
        round(
          when(sd.isNull || sd === 0.0, lit(0.0)).otherwise((col("value") - mu) / sd),
          6).as("advantage"))
      .orderBy("event_id")
  }
}
