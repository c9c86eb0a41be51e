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
}
