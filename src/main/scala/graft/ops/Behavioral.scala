package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Behavioral analytics over the events stream — funnel
  * progression and cohort retention, the two queries every
  * product-analytics engine ships. Both are single-pass aggregation
  * shapes (shuffle on user_id only), deliberately NOT driver-side:
  * the per-user sequence logic runs inside HOF folds / conditional
  * aggregates, so the plan is the same at 150 users and 150 million.
  *
  * Timestamps: all ordering/bucketing goes through Tables.tsMicros
  * (µs), the only cross-engine-comparable form of the ns column
  * (the DuckDB oracle truncates ns→µs on read); event_id breaks ts
  * ties so sequences are total-ordered in both engines.
  */
object Behavioral {

  /** FUNNEL: how far each user progresses through view → click →
    * purchase within their first 12 events, counted per reached
    * stage. One shuffle (user_id); the ordered-subsequence state
    * machine is an `aggregate` fold over the user's time-sorted
    * event-type prefix — no self-joins, no window re-sorts, no
    * per-stage passes (the three-join formulation shuffles the fact
    * table once PER STAGE; this shuffles it once, total). The
    * 12-event cap is what makes the funnel discriminating on the
    * synthetic corpus (every user eventually does everything). */
  def funnelStages(s: SparkSession, d: String): DataFrame = {
    val seq12 = slice(
      transform(
        sort_array(collect_list(struct(
          Tables.tsMicros("ts").as("ts_us"),
          col("event_id"),
          col("event_type")))),
        e => e.getField("event_type")),
      1, 12)
    val stage = aggregate(
      col("first12"), lit(0),
      (st, x) =>
        when(st === 0 && x === "view", 1)
          .when(st === 1 && x === "click", 2)
          .when(st === 2 && x === "purchase", 3)
          .otherwise(st))
    Tables.load(s, d, "events")
      .groupBy("user_id")
      .agg(seq12.as("first12"))
      .select(stage.as("stage"))
      .groupBy("stage")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("stage")
  }

  /** TIME-SERIES RESAMPLE with GAP FILL: hourly purchase sums on a
    * dense hour spine — missing hours appear with n=0 and the last
    * seen sum carried forward (the ffill every monitoring/feature
    * pipeline needs before a model sees the series). The spine is
    * generated from the aggregate's own [min, max] hour bounds; the
    * forward-fill window is global-ordered BY DESIGN: it runs over
    * the SPINE (one row per hour — bounded by elapsed time, not by
    * data volume), never over the events, so the single-partition
    * sort is a few thousand rows at any corpus size. The raw table
    * itself only ever sees a map-side filter + one hash aggregation. */
  def resampleFfill(s: SparkSession, d: String): DataFrame = {
    val hourly = Tables.load(s, d, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(Tables.tsBucket("ts", 3600000000L).as("h"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("sv"))
    val spine = hourly
      .agg(min("h").as("mn"), max("h").as("mx"))
      .select(explode(sequence(col("mn"), col("mx"))).as("h"))
    val w = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    spine
      .join(hourly, Seq("h"), "left")
      .select(
        col("h"),
        coalesce(col("n"), lit(0L)).as("n"),
        last("sv", ignoreNulls = true).over(w).as("sum_filled"))
      .orderBy("h")
  }

  /** EWMA smoothing per series: exponentially-weighted moving average
    * over each event type's DAILY revenue, α=0.3. EWMA is inherently
    * sequential (state_t = α·x_t + (1−α)·state_{t−1}), so it runs as
    * a fold over the day-sorted series INSIDE each group — the series
    * is first reduced to one row per (type, day) by a hash
    * aggregation, so the folded array is bounded by elapsed days, not
    * event volume (same spine-not-data discipline as
    * [[resampleFfill]]). Both engines fold sequentially over the
    * identical sorted list, so the result is bit-deterministic — no
    * partial-order ulp drift to round away mid-stream. */
  def ewmaDailyRevenue(s: SparkSession, d: String): DataFrame = {
    val alpha = 0.3
    val daily = Tables.load(s, d, "events")
      .groupBy(col("event_type"),
        Tables.tsBucket("ts", 86400000000L).as("day"))
      // round BEFORE the fold (as resampleFfill does before its
      // fill): the daily sums carry cross-engine partial-order ulps,
      // and only rounding makes the fold INPUTS bit-identical — the
      // sequential fold itself then stays exact on both sides
      .agg(round(sum("value"), 6).as("rev"))
    daily
      .groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("rev")))).as("series"))
      .select(
        col("event_type"),
        size(col("series")).as("n_days"),
        round(aggregate(
          col("series"),
          lit(Double.NaN),
          (acc, e) => when(isnan(acc), e.getField("rev"))
            .otherwise(lit(alpha) * e.getField("rev") + lit(1 - alpha) * acc)),
          6).as("ewma"))
      .orderBy("event_type")
  }

  /** MARKOV TRANSITION MATRIX estimation over per-user event
    * sequences: P(next type | current type) from the lag pairs of
    * each user's time-ordered stream — the behavioral model behind
    * "what do users do after a view". One user_id shuffle for the lag
    * window, one hash aggregation over the (prev, cur) pairs (25
    * cells); probabilities are rounded after the division. The
    * (µs, event_id) sort key makes every sequence total-ordered in
    * both engines. */
  def eventTransitions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(Tables.tsMicros("ts"), col("event_id"))
    val pairs = Tables.load(s, d, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev", lag("event_type", 1).over(w))
      .filter(col("prev").isNotNull)
    pairs
      .groupBy("prev", "event_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        round(col("n").cast("double") /
          sum("n").over(Window.partitionBy("prev")), 6))
      .select(col("prev"), col("event_type").as("next"), col("n"), col("p"))
      .orderBy("prev", "next")
  }

  /** PARETO / CONTRIBUTION analysis: nations ranked by revenue with
    * cumulative share — the 80/20 cut every revenue review draws. The
    * heavy work is one fact-side hash aggregation; the ranking window
    * runs over |nations| rows. Ranking, the running sum, and the
    * total all operate on the ROUNDED per-nation revenue, so both
    * engines order and fold bit-identical doubles (the raw sums carry
    * partial-order ulps that could flip a rank or the 6th decimal of
    * a share). */
  def revenuePareto(s: SparkSession, d: String): DataFrame = {
    val byNation = Tables.load(s, d, "customer")
      .join(Tables.load(s, d, "orders"), col("c_custkey") === col("o_custkey"))
      .groupBy("c_nationkey")
      .agg(round(sum("o_totalprice"), 2).as("revenue"))
    val w = Window.orderBy(col("revenue").desc, col("c_nationkey"))
    // the grand total rides the SAME 25-row (|nations|) window the
    // ranking already needs — no crossJoin, no second evaluation of
    // the customer⋈orders aggregate (the two plan branches would only
    // merge if exchange reuse happened to fire)
    byNation
      .select(
        col("c_nationkey"),
        col("revenue"),
        rank().over(w).cast("int").as("rk"),
        round(sum(col("revenue")).over(w.rowsBetween(Window.unboundedPreceding, 0)) /
          sum(col("revenue")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)),
          6).as("cum_share"))
      .orderBy("rk")
  }

  /** 7-DAY MOVING MEDIAN of daily revenue per event type — the
    * robust-statistics window the mean-based movers can't give you
    * (one outlier day doesn't drag the trend). The holistic aggregate
    * (exact percentile) runs over a RANGE frame on the daily
    * aggregate, so the window's working set is bounded by elapsed
    * days per type, never by event volume — same spine-not-data
    * discipline as [[resampleFfill]]. Daily sums are rounded BEFORE
    * the window so both engines interpolate over identical doubles. */
  def movingMedian7d(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.load(s, d, "events")
      .groupBy(col("event_type"), Tables.tsBucket("ts", 86400000000L).as("day"))
      .agg(round(sum("value"), 6).as("rev"))
    val w = Window.partitionBy("event_type").orderBy("day").rangeBetween(-6, 0)
    daily.select(
      col("event_type"), col("day"),
      count(lit(1)).over(w).cast("int").as("n_days"),
      round(expr("percentile(rev, 0.5)").over(w), 6).as("med_rev"))
      .orderBy("event_type", "day")
  }

  /** ANOMALY DETECTION by z-score: events whose value sits more than
    * 3 standard deviations from their event type's mean. Two-pass
    * shape — one hash aggregation for the per-type moments (5 rows),
    * broadcast back over the fact table for a MAP-ONLY flagging pass:
    * no second shuffle of the events at any scale. z is rounded to 6
    * before the threshold test so both engines compare the identical
    * double (mu/sigma carry partial-order ulps; the raw parquet value
    * does not). */
  def zscoreOutliers(s: SparkSession, d: String): DataFrame = {
    val events = Tables.load(s, d, "events")
    val stats = events.groupBy("event_type")
      .agg(avg("value").as("mu"), stddev("value").as("sigma"))
    events.join(broadcast(stats), Seq("event_type"))
      // sigma = 0 (a constant-valued group) leaves z UNDEFINED — and
      // under Spark 4's default ANSI mode the bare division would
      // throw DIVIDE_BY_ZERO; null z rows drop at the filter, and the
      // oracle mirrors the same NULLIF guard
      .withColumn("z",
        round((col("value") - col("mu")) / nullif(col("sigma"), lit(0.0)), 6))
      .filter(abs(col("z")) > 3.0)
      .select(col("event_id"), col("event_type"), col("z"))
      .orderBy("event_id")
  }

  /** TIME-TO-CONVERT: per user, minutes from FIRST view to FIRST
    * purchase (users who purchased before ever viewing, or never did
    * both, drop out), summarized per first-view week cohort with
    * exact percentiles. One conditional-min aggregation per user
    * (single user_id shuffle) then a tiny per-cohort percentile pass
    * — the conversion-latency read every growth dashboard wants.
    * Minutes are INTEGER (µs div 60e6) so the percentile inputs are
    * identical cross-engine. */
  def timeToConvert(s: SparkSession, d: String): DataFrame = {
    val us = Tables.tsMicros("ts")
    val perUser = Tables.load(s, d, "events")
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "view", us)).as("v_us"),
        min(when(col("event_type") === "purchase", us)).as("p_us"))
      .filter(col("v_us").isNotNull && col("p_us").isNotNull &&
        col("p_us") >= col("v_us"))
      .select(
        expr("v_us div 604800000000").as("cohort_wk"),
        expr("(p_us - v_us) div 60000000").as("mins"))
    perUser
      .groupBy("cohort_wk")
      .agg(
        count(lit(1)).as("n_converted"),
        round(avg("mins"), 6).as("avg_mins"),
        round(expr("percentile(mins, 0.5)"), 6).as("p50_mins"),
        round(expr("percentile(mins, 0.9)"), 6).as("p90_mins"),
        max("mins").as("max_mins"))
      .orderBy("cohort_wk")
  }

  /** WINSORIZED STATS: per event type, the mean of `value` after
    * clamping to the [p05, p95] range — the robust aggregate that
    * keeps one fat-fingered outlier from moving a metric. Percentile
    * bounds come from one per-type aggregation (5 rows) broadcast
    * back over the fact table; the clamp-and-mean pass is map-side
    * partial-aggregated — the same two-pass broadcast-moments shape
    * as [[zscoreOutliers]]. Bounds are rounded BEFORE the clamp so
    * both engines cut at the identical double. */
  def winsorizedStats(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.load(s, d, "events").select("event_type", "value")
    val bounds = ev.groupBy("event_type").agg(
      round(expr("percentile(value, 0.05)"), 6).as("lo"),
      round(expr("percentile(value, 0.95)"), 6).as("hi"))
    ev.join(broadcast(bounds), Seq("event_type"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        round(avg("value"), 6).as("raw_mean"),
        round(avg(least(greatest(col("value"), col("lo")), col("hi"))), 6)
          .as("winsorized_mean"),
        round(first("lo"), 6).as("p05"),
        round(first("hi"), 6).as("p95"))
      .orderBy("event_type")
  }

  /** COHORT RETENTION: users bucketed by their first-activity epoch
    * week (the cohort), counted in each later week they were active,
    * keyed by week offset — the retention-matrix query. Three
    * shuffles, all on bounded keys: distinct (user, week) pairs,
    * per-user min week, and the (cohort, offset) count; the
    * cohort-assignment join is per-user (same key as the shuffle
    * before it, no extra exchange at scale). */
  def cohortRetention(s: SparkSession, d: String): DataFrame = {
    // integer div end to end (`/` on longs is DOUBLE division)
    val week = Tables.tsBucket("ts", 604800000000L)
    val activity = Tables.load(s, d, "events")
      .select(col("user_id"), week.as("wk"))
      .distinct()
    val cohort = activity.groupBy("user_id").agg(min("wk").as("cohort_wk"))
    activity
      .join(cohort, "user_id")
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_wk", "week_offset")
  }
}
