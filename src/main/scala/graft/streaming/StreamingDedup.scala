package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STREAMING exact dedup (T-surface × L1): `dropDuplicates` keyed on
  * document text, executed under a REAL Structured Streaming run —
  * dedup state lives across micro-batches, so a copy arriving three
  * batches after its original is still suppressed. This is the
  * ingest-time shape of a 100 TB training pipeline: the corpus
  * arrives as file drops, and only FIRST-SEEN content flows on to
  * the (batch) near-dup stages downstream.
  *
  * Determinism contract: which physical COPY of a text survives
  * depends on arrival order (file listing order), so the declared
  * query aggregates only COPY-INVARIANT columns — every duplicate
  * shares its text's lang and token count — making the result
  * independent of file split and batch boundaries; the DuckDB oracle
  * is the same aggregate over DISTINCT (lang, text).
  */
object StreamingDedup {

  /** Watermark-scoped ingest dedup (T7 × L1, round 9): the SAME
    * first-seen-wins pipeline as [[streamingDedupQuery]] but with
    * dedup state EVICTED once the watermark passes a key's event-time
    * horizon. At 100 TB of stream-days this is the only deployable
    * shape — plain `dropDuplicates` state grows with every distinct
    * key ever seen, unbounded; `dropDuplicatesWithinWatermark` keeps
    * exactly the keys inside the watermark window, trading global
    * exactness for windowed exactness (a copy arriving after its
    * original's horizon re-admits — the documented contract). Rows
    * older than the watermark are dropped outright, so a late
    * duplicate can neither re-emit nor corrupt state. */
  def dedupWithinWatermark(
      stream: DataFrame, eventTimeCol: String, delay: String,
      keys: String*): DataFrame =
    stream.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keys.toSeq)

  /** Originals ∪ exact copies of every 3rd doc under fresh ids — the
    * deterministic duplicate corpus the stream must collapse. */
  private def dupCorpus(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.load(s, d, "documents").select("doc_id", "lang", "text")
    docs.unionByName(
      docs.filter(pmod(col("doc_id"), lit(3L)) === 0)
        .select((col("doc_id") + 5000000L).as("doc_id"), col("lang"), col("text")))
  }

  /** Driver query: duplicate corpus written as FOUR parquet files,
    * streamed back one file per micro-batch (AvailableNow), deduped
    * by text with cross-batch state, newly-seen rows appended per
    * batch via foreachBatch; the final batch-mode read aggregates the
    * accumulated unique texts per lang. */
  def streamingDedupQuery(s: SparkSession, d: String): DataFrame = {
    val root = s"/tmp/graft_stream_dedup_${d.replaceAll("[^a-zA-Z0-9]", "_")}"
    graft.Util.rmRecursive(root) // fresh checkpoint/sink per run
    val arrivals = s"$root/arrivals"
    dupCorpus(s, d).repartition(4).write.parquet(arrivals)
    val schema = s.read.parquet(arrivals).schema
    graft.Util.withIsolatedShufflePartitions(s, 8) { s8 =>
    val q = s8.readStream
      .schema(schema)
      // 2 files per trigger over 4 files = 2 micro-batches: state
      // still crosses a batch boundary (the property under test) at
      // half the per-batch checkpoint/sink overhead of 4 batches
      .option("maxFilesPerTrigger", 2)
      .parquet(arrivals)
      .dropDuplicates("text")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$root/_chk")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // append mode emits each text exactly once, on first sight
        batch.write.mode("append").parquet(s"$root/unique")
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    }
    s.read.parquet(s"$root/unique")
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_uniq"),
        round(avg(size(graft.functions.ColumnFunctions.tokens(col("text"))).cast("double")), 6).as("avg_tokens"))
      .orderBy("lang")
  }

  /** One doc's membership in one LSH bucket, arriving on the stream. */
  private[streaming] case class BandArrival(
      band: Int, bandKey: String, docId: Long, sig: Seq[Long])
  /** Keyed state: every doc this bucket has seen so far. */
  private[streaming] case class BucketDocs(docs: Seq[(Long, Seq[Long])])
  private[streaming] case class NearDupPair(
      doc_a: Long, doc_b: Long, est_jaccard: Double)

  /** STREAMING near-dup (T-surface × L2, round 14): the banded-LSH
    * MinHash candidate join run CONTINUOUSLY. Arriving docs are
    * signed IN-STREAM with the same fused native signature expression
    * as the batch pipeline, exploded to (band, band_key) buckets, and
    * compared against every EARLIER member of their bucket held in
    * keyed state (`flatMapGroupsWithState`) — each near-dup pair
    * emits exactly once, when its LATER member arrives. The emitted
    * pair SET is arrival-order invariant (the estimate is symmetric
    * and the pair is keyed min-id/max-id), so the accumulated output
    * equals the batch pair frame by construction; multi-band
    * duplicate emissions collapse in the final distinct exactly as
    * the batch join's dropDuplicates does. Re-delivered arrivals
    * (at-least-once replay) are idempotent: a doc already in its
    * bucket's membership neither re-emits nor re-enters state.
    *
    * 100 TB posture: this is the continuous-ingest twin of the batch
    * band join — the shuffle exchange becomes a state store keyed by
    * (band, band_key), so state per bucket is its MEMBERSHIP, the
    * same rows the batch join's build side holds. A production
    * deployment bounds it exactly like [[dedupWithinWatermark]]
    * bounds exact dedup: event-time watermark + GroupStateTimeout
    * evicting buckets past their horizon (windowed exactness). The
    * finite replay here keeps NoTimeout so the oracle is the FULL
    * batch pair set. */
  def streamingNearDupPairs(
      stream: DataFrame, numPerms: Int = 16, bandSize: Int = 4,
      threshold: Double = 0.5): org.apache.spark.sql.Dataset[NearDupPair] = {
    val s8 = stream.sparkSession
    import s8.implicits._
    import graft.functions.ColumnFunctions.{minhashSigNative, tokenHashesNative}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val nBands = numPerms / bandSize
    stream
      .select(col("doc_id"),
        minhashSigNative(tokenHashesNative(col("text")), numPerms).as("sig"))
      // <3-token docs sign NULL; in batch concat_ws turns the NULL sig
      // into band_key "" so they DO band-collide, and are only dropped
      // when the NULL est_jaccard fails the threshold filter — the
      // stream drops them up front here, same outcome one stage earlier
      .filter(col("sig").isNotNull)
      .select(col("doc_id"), col("sig"),
        explode(sequence(lit(0), lit(nBands - 1))).as("band"))
      .select(col("band"),
        concat_ws(",", transform(
          slice(col("sig"), col("band") * bandSize + 1, lit(bandSize)),
          _.cast("string"))).as("bandKey"),
        col("doc_id").as("docId"), col("sig"))
      .as[BandArrival]
      .groupByKey(a => (a.band, a.bandKey))
      .flatMapGroupsWithState[BucketDocs, NearDupPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, String), rows: Iterator[BandArrival],
         state: GroupState[BucketDocs]) =>
          var seen = state.getOption.map(_.docs).getOrElse(Seq.empty)
          val out = Seq.newBuilder[NearDupPair]
          rows.foreach { r =>
            if (!seen.exists(_._1 == r.docId)) {
              seen.foreach { case (pid, psig) =>
                // k/numPerms with numPerms a power of two is exact in
                // doubles at <=4 decimal digits, so the estimate (and
                // the threshold compare) is bit-identical to the batch
                // zip_with form and to the DuckDB oracle
                val eq = psig.iterator.zip(r.sig.iterator)
                  .count { case (a, b) => a == b }
                val est = eq.toDouble / numPerms
                if (est >= threshold)
                  out += NearDupPair(
                    math.min(pid, r.docId), math.max(pid, r.docId), est)
              }
              seen = seen :+ (r.docId -> r.sig)
            }
          }
          state.update(BucketDocs(seen))
          out.result().iterator
      }
  }

  /** Driver query: near-dup corpus as FOUR file drops, streamed back
    * two files per micro-batch, pairs accumulated via foreachBatch;
    * the final batch read distinct-collapses multi-band emissions.
    * Oracle: the batch banded-LSH pair recomputation (the same SQL as
    * `minhash_near_dup`). */
  def streamingNearDupQuery(s: SparkSession, d: String): DataFrame = {
    val root = s"/tmp/graft_stream_neardup_${d.replaceAll("[^a-zA-Z0-9]", "_")}"
    graft.Util.rmRecursive(root) // fresh checkpoint/sink per run
    val arrivals = s"$root/arrivals"
    graft.llm.Dedup.nearDupCorpus(s, d).repartition(4).write.parquet(arrivals)
    val schema = s.read.parquet(arrivals).schema
    graft.Util.withIsolatedShufflePartitions(s, 8) { s8 =>
      val q = streamingNearDupPairs(
        s8.readStream.schema(schema)
          .option("maxFilesPerTrigger", 2)
          .parquet(arrivals))
        .toDF()
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$root/_chk")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(s"$root/pairs")
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.read.parquet(s"$root/pairs")
      .select(col("doc_a"), col("doc_b"),
        round(col("est_jaccard"), 6).as("est_jaccard"))
      .distinct()
      .orderBy("doc_a", "doc_b")
  }
}
