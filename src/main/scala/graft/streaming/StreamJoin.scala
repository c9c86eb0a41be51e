package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-stream INTERVAL JOIN executed as a real Structured
  * Streaming query under the driver's correctness gate (SURVEY.md
  * §2.9 T9) — the attribution shape: every purchase joined to the
  * same user's views from the preceding hour, both sides arriving as
  * streams.
  *
  * Inner stream-stream joins emit every matched pair EXACTLY ONCE
  * (the state store pairs rows across batches), so appending each
  * micro-batch's output and aggregating the accumulated union is
  * deterministic regardless of how the files are batched — the same
  * copy-invariance argument as StreamingDedup. The watermarks plus
  * the time-bound condition are what let Spark EVICT view rows older
  * than the join window instead of buffering both streams forever —
  * the state bound that makes the plan viable on an unbounded 100 TB
  * arrival stream.
  *
  * DETERMINISM NOTE: the declared query's arrival files are split in
  * EVENT-ID space (so cross-batch pairing is genuinely exercised),
  * which means later batches carry events far OLDER than the
  * watermark a time-aware delay would have advanced to — they would
  * be late, and which pairs survive would depend on file-listing
  * order. The declared run therefore sets the delay LONGER than the
  * whole corpus timeline: no row of the finite replay can ever be
  * late, the answer is arrival-order-invariant (= the batch oracle),
  * and the eviction machinery itself is pinned by StreamJoinSpec with
  * deliberately time-ordered arrivals and a tight delay.
  */
object StreamJoin {

  /** Declared driver query: views and purchases stream in from the
    * same arrival directory (event-id-partitioned file drops, so both
    * sides genuinely span micro-batches), join on user within
    * [view_ts, view_ts + 1h], accumulate pairs via foreachBatch
    * append, then aggregate per user in batch. Oracle: the identical
    * interval self-join over the source table. */
  def intervalJoinStream(s: SparkSession, d: String): DataFrame = {
    val out = s"/tmp/graft_stream_ivjoin_${d.replaceAll("[^a-zA-Z0-9]", "_")}"
    graft.Util.rmRecursive(out) // fresh checkpoint/sink per run
    val arrivals = s"$out/arrivals"
    Tables.load(s, d, "events")
      // only the two joined types ever reach the arrival stream —
      // upstream filtering, not in-stream filtering, is the 100 TB
      // posture anyway (don't ship what you won't join)
      .filter(col("event_type").isin("view", "purchase"))
      .withColumn("tstamp", Tables.tsFromNanos("ts"))
      .select("event_id", "user_id", "event_type", "tstamp", "value")
      .withColumn("part", pmod(col("event_id"), lit(4L)))
      .repartition(4, col("part")) // one file per part dir (see semiJoinStream)
      .write.partitionBy("part").parquet(arrivals)
    val schema = s.read.parquet(arrivals).schema
    // join-state stores are per shuffle partition PER SIDE per
    // micro-batch — scope them down via a conf-isolated session (the
    // streams must be BUILT from it for the scope to bind)
    graft.Util.withIsolatedShufflePartitions(s, 8) { s8 =>
      def arriving() = s8.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(arrivals)
      val views = arriving()
        .filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("tstamp").as("v_ts"))
        .withWatermark("v_ts", "365 days")
      val purchases = arriving()
        .filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("tstamp").as("p_ts"), col("value"))
        .withWatermark("p_ts", "365 days")
      val q = views
        .join(purchases,
          col("v_user") === col("p_user") &&
            col("p_ts") >= col("v_ts") &&
            col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"))
        .select(col("v_user").as("user_id"), col("v_ts"), col("p_ts"), col("value"))
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$out/_chk")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          // append mode: each micro-batch carries only NEW pairs
          batch.write.mode("append").parquet(s"$out/pairs")
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.read.parquet(s"$out/pairs")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_attrib"), round(sum("value"), 6).as("attrib_value"))
      .orderBy("user_id")
  }

  /** Declared driver query: stream-stream LEFT OUTER interval join
    * (T13) — the attribution shape WITH the misses: every view joined
    * to the same user's purchases in the following hour, and views
    * that never converted emit once with nulls. The null emission is
    * WATERMARK-DRIVEN state eviction, not an end-of-stream flush:
    * Spark emits an unmatched left row only when the watermark passes
    * its join-window close, so a finite replay must ADVANCE the
    * watermark past the corpus to drain the state deterministically.
    *
    * The drain is a SENTINEL arrival: after the event-id-partitioned
    * corpus files, one extra file carries a single far-future row per
    * side (both sides must jump — the join's effective watermark is
    * the MIN across inputs). Its mtime is set past every corpus
    * file's so the file source (mtime-ordered admission) provably
    * delivers it LAST: the corpus pairs under a
    * longer-than-the-timeline delay exactly as the inner join, then
    * the sentinel batch advances the watermark in one jump and the
    * trailing no-data batch evicts every never-matched view with
    * nulls — arrival-order-invariant, so the accumulated union equals
    * the batch LEFT JOIN whatever the file batching. The sentinel's
    * own rows never emit (its window never closes; the purchase side
    * emits no unmatched rows) and are filtered by user_id anyway. */
  def outerJoinStream(s: SparkSession, d: String): DataFrame = {
    val out = s"/tmp/graft_stream_ojoin_${d.replaceAll("[^a-zA-Z0-9]", "_")}"
    graft.Util.rmRecursive(out)
    val arrivals = s"$out/arrivals"
    val ev = Tables.load(s, d, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .withColumn("tstamp", Tables.tsFromNanos("ts"))
      .select("event_id", "user_id", "event_type", "tstamp", "value")
    ev.withColumn("part", pmod(col("event_id"), lit(4L)))
      .repartition(4, col("part")) // one file per part dir (see semiJoinStream)
      .write.partitionBy("part").parquet(arrivals)
    val maxTs = ev.agg(max("tstamp")).collect()(0).getTimestamp(0)
    // sentinel = corpus max + delay (365 d) + 2 d: watermark after the
    // sentinel batch = sentinel - 365 d > corpus max + 1 h, so every
    // view's window is closed and the state drains
    val sentTs = new java.sql.Timestamp(maxTs.getTime + 367L * 24 * 3600 * 1000)
    import s.implicits._
    Seq((Long.MaxValue - 1L, -1L, "view", sentTs, 0.0),
        (Long.MaxValue - 2L, -1L, "purchase", sentTs, 0.0))
      .toDF("event_id", "user_id", "event_type", "tstamp", "value")
      .withColumn("part", lit(9L))
      .write.mode("append").partitionBy("part").parquet(arrivals)
    // mtime-ordered admission: corpus strictly before the sentinel
    val fs = new java.io.File(arrivals)
    def files(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(files) else Seq(f)
    val (sentF, mainF) = files(fs).filter(_.getName.endsWith(".parquet"))
      .partition(_.getPath.contains("part=9"))
    val mainMax = mainF.map(_.lastModified()).max
    sentF.foreach(f => require(f.setLastModified(mainMax + 60000L),
      s"cannot bump sentinel mtime on $f"))
    val schema = s.read.parquet(arrivals).schema
    graft.Util.withIsolatedShufflePartitions(s, 8) { s8 =>
      def arriving() = s8.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(arrivals)
      val views = arriving()
        .filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("tstamp").as("v_ts"))
        .withWatermark("v_ts", "365 days")
      val purchases = arriving()
        .filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("tstamp").as("p_ts"), col("value"))
        .withWatermark("p_ts", "365 days")
      val q = views
        .join(purchases,
          col("v_user") === col("p_user") &&
            col("p_ts") >= col("v_ts") &&
            col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"),
          "left_outer")
        .select(col("v_user").as("user_id"), col("v_ts"), col("p_ts"), col("value"))
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$out/_chk")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(s"$out/pairs")
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.read.parquet(s"$out/pairs")
      .filter(col("user_id") =!= -1L) // the sentinel never pairs; belt and braces
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("p_ts").isNull, 1L).otherwise(0L)).as("n_unmatched"),
        round(sum("value"), 6).as("matched_value"))
      .orderBy("user_id")
  }

  /** Declared driver query: stream-stream LEFT SEMI interval join
    * (T13c) — "which views converted": a view emits (its own columns
    * only) the first time a purchase lands in its hour, exactly once
    * however the files batch; never-matched views simply never emit,
    * so no sentinel drain is needed — the state machinery is the
    * inner join's, the output contract the semi's. */
  def semiJoinStream(s: SparkSession, d: String): DataFrame = {
    val out = s"/tmp/graft_stream_sjoin_${d.replaceAll("[^a-zA-Z0-9]", "_")}"
    graft.Util.rmRecursive(out)
    val arrivals = s"$out/arrivals"
    Tables.load(s, d, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .withColumn("tstamp", Tables.tsFromNanos("ts"))
      .select("event_id", "user_id", "event_type", "tstamp", "value")
      .withColumn("part", pmod(col("event_id"), lit(4L)))
      // one file per part dir: micro-batch count stays small and
      // deterministic-ish (2 data batches at maxFilesPerTrigger=2)
      // while the event-id split still forces cross-batch pairing
      .repartition(4, col("part"))
      .write.partitionBy("part").parquet(arrivals)
    val schema = s.read.parquet(arrivals).schema
    graft.Util.withIsolatedShufflePartitions(s, 8) { s8 =>
      def arriving() = s8.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(arrivals)
      val views = arriving()
        .filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("tstamp").as("v_ts"))
        .withWatermark("v_ts", "365 days")
      val purchases = arriving()
        .filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("tstamp").as("p_ts"))
        .withWatermark("p_ts", "365 days")
      val q = views
        .join(purchases,
          col("v_user") === col("p_user") &&
            col("p_ts") >= col("v_ts") &&
            col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"),
          "left_semi")
        .select(col("v_user").as("user_id"), col("v_ts"))
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$out/_chk")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(s"$out/converted")
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.read.parquet(s"$out/converted")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_converted"))
      .orderBy("user_id")
  }

  /** Declared driver query: stream-stream FULL OUTER interval join
    * (T13b) — both sides' misses surface: views that never converted
    * AND purchases no view preceded, each emitting exactly once with
    * the other side nulled when the watermark proves no match can
    * still arrive. Purchase-side eviction closes at watermark >
    * p_ts (a matching view needs v_ts in [p_ts − 1h, p_ts]), so the
    * same single sentinel jump drains BOTH state stores; the
    * sentinel's own rows never emit (their windows never close) and
    * are filtered by user anyway. Everything else — corpus-spanning
    * delay, mtime-ordered last-arrival sentinel, trailing no-data
    * eviction batch — is [[outerJoinStream]] verbatim. */
  def fullOuterJoinStream(s: SparkSession, d: String): DataFrame = {
    val out = s"/tmp/graft_stream_fojoin_${d.replaceAll("[^a-zA-Z0-9]", "_")}"
    graft.Util.rmRecursive(out)
    val arrivals = s"$out/arrivals"
    val ev = Tables.load(s, d, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .withColumn("tstamp", Tables.tsFromNanos("ts"))
      .select("event_id", "user_id", "event_type", "tstamp", "value")
    ev.withColumn("part", pmod(col("event_id"), lit(4L)))
      .repartition(4, col("part")) // one file per part dir (see semiJoinStream)
      .write.partitionBy("part").parquet(arrivals)
    val maxTs = ev.agg(max("tstamp")).collect()(0).getTimestamp(0)
    val sentTs = new java.sql.Timestamp(maxTs.getTime + 367L * 24 * 3600 * 1000)
    import s.implicits._
    Seq((Long.MaxValue - 1L, -1L, "view", sentTs, 0.0),
        (Long.MaxValue - 2L, -1L, "purchase", sentTs, 0.0))
      .toDF("event_id", "user_id", "event_type", "tstamp", "value")
      .withColumn("part", lit(9L))
      .write.mode("append").partitionBy("part").parquet(arrivals)
    val fs = new java.io.File(arrivals)
    def files(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(files) else Seq(f)
    val (sentF, mainF) = files(fs).filter(_.getName.endsWith(".parquet"))
      .partition(_.getPath.contains("part=9"))
    val mainMax = mainF.map(_.lastModified()).max
    sentF.foreach(f => require(f.setLastModified(mainMax + 60000L),
      s"cannot bump sentinel mtime on $f"))
    val schema = s.read.parquet(arrivals).schema
    graft.Util.withIsolatedShufflePartitions(s, 8) { s8 =>
      def arriving() = s8.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(arrivals)
      val views = arriving()
        .filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("tstamp").as("v_ts"))
        .withWatermark("v_ts", "365 days")
      val purchases = arriving()
        .filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("tstamp").as("p_ts"), col("value"))
        .withWatermark("p_ts", "365 days")
      val q = views
        .join(purchases,
          col("v_user") === col("p_user") &&
            col("p_ts") >= col("v_ts") &&
            col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"),
          "full_outer")
        .select(coalesce(col("v_user"), col("p_user")).as("user_id"),
          col("v_ts"), col("p_ts"), col("value"))
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$out/_chk")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(s"$out/pairs")
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.read.parquet(s"$out/pairs")
      .filter(col("user_id") =!= -1L)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("p_ts").isNull, 1L).otherwise(0L)).as("n_unmatched_views"),
        sum(when(col("v_ts").isNull, 1L).otherwise(0L)).as("n_unmatched_purchases"),
        round(sum(when(col("v_ts").isNotNull && col("p_ts").isNotNull,
          col("value"))), 6).as("matched_value"))
      .orderBy("user_id")
  }
}
