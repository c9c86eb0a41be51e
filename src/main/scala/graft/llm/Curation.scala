package graft.llm

import graft.Tables
import graft.functions.ColumnFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] The END-TO-END CURATION PIPELINE as one declared query — the
  * composition every training-data team actually runs, chained from
  * the engine's own verified stages:
  *
  *   s0 raw          originals ∪ near-dup variants ∪ restyled copies
  *   s1 exact dedup  after C4-style normalization (restyled copies
  *                   collapse onto their originals — lowest id wins)
  *   s2 near dedup   MinHash clusters → highest-quality keeper per
  *                   cluster; docs outside the near-dup graph are
  *                   singletons and survive
  *   s3 quality      σ(w·x) logistic gate on the linear score
  *   s4 split        content-addressed 80/10/10 train/val/test
  *
  * The output is the stage-retention funnel (stage, n_docs) — the
  * number every pipeline dashboard tracks — and the DuckDB oracle
  * recomputes ALL five stages from scratch (recursive-CTE closure
  * included), so the whole composition is hash-verified end to end,
  * not just its pieces.
  *
  * Scale: each stage is the already-audited shape (one groupBy for
  * exact dedup, banded LSH + star contraction for clusters, map-only
  * gates, hash-bucket split); the funnel adds only per-stage count
  * aggregates (one row each) and never materializes anything the
  * stages themselves would not.
  */
object Curation {

  /** PER-DOMAIN CAPS — the mix-control op every large-scale corpus
    * build runs before training: no source (domain/crawl host) may
    * contribute more than `cap` documents, and within a capped source
    * the BEST documents win (here: longest text, doc_id tie-break —
    * deterministic and oracle-replayable; swap in any quality score).
    * One window partitioned BY SOURCE — at 100 TB the shuffle is on
    * the domain key and each partition ranks independently; the
    * bounded-heap TopKByScore aggregate (knn_topk_agg) is the
    * map-side-combine alternative when domains are few and huge.
    * Returns the per-source census the oracle recomputes: kept and
    * dropped counts plus the kept characters. */
  def domainCapsQuery(s: SparkSession, d: String, cap: Int = 15): DataFrame = {
    val docs = graft.Tables.load(s, d, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id"))
    docs.withColumn("rk", row_number().over(w))
      .groupBy("source")
      .agg(
        sum(when(col("rk") <= cap, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rk") > cap, 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("rk") <= cap, col("n_chars")).otherwise(0L)).as("kept_chars"))
      .orderBy("source")
  }

  /** L20 (round 14): TEMPERATURE-FLATTENED MIXTURE SAMPLING — the
    * multilingual-pretraining data-mix recipe (mT5/XLM-R shape):
    * per-domain quotas ∝ count^(1/T) with T = 2, so high-resource
    * domains stop dominating the mix while low-resource ones keep
    * proportionally MORE of their data. Every arithmetic step is
    * integer-exact cross-engine: the weight is isqrt(count) —
    * IEEE-correctly-rounded sqrt of a BIGINT floors exactly (perfect
    * squares round-trip, non-squares are irrational, never within an
    * ulp of an integer at these magnitudes) — and the quota is
    * `budget * w div Σw` in integer arithmetic, so the oracle replays
    * the mix bit for bit. Selection within a domain is best-first
    * (longest docs, id tie-break), the same one-domain-key-shuffle
    * window as [[domainCapsQuery]]; the quota frame is O(#domains)
    * and broadcasts. 100 TB posture: one shuffle on the domain key,
    * quotas from a metadata-sized aggregate — never a corpus-wide
    * window. */
  def mixtureSamplingQuery(
      s: SparkSession, d: String, budget: Long = 300L): DataFrame = {
    val docs = graft.Tables.load(s, d, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val weights = docs.groupBy("source")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("w", floor(sqrt(col("cnt"))).cast("long"))
    val totalW = weights.agg(sum("w")).head.getLong(0)
    // integer quota: `(w * budget) DIV Σw` — SQL's `/` on BIGINTs is
    // DOUBLE division; DIV keeps the arithmetic exact cross-engine
    val quotas = weights.withColumn("quota",
      expr(s"(w * ${budget}L) DIV ${totalW}L"))
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id"))
    docs.withColumn("rk", row_number().over(w))
      .join(broadcast(quotas), Seq("source"))
      .groupBy("source")
      .agg(
        max("cnt").as("n_docs"),
        max("w").as("weight"),
        max("quota").as("quota"),
        sum(when(col("rk") <= col("quota"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rk") <= col("quota"), col("n_chars"))
          .otherwise(0L)).as("kept_chars"))
      .orderBy("source")
  }

  def curationFunnel(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.load(s, d, "documents").select("doc_id", "text")
    // every stage expression below is THE stage's own shared helper
    // (styledVariants/canonicalNorm/qualityZ/splitOf) — the funnel
    // composes the verified stages, it does not re-derive them
    val raw = Dedup.nearDupCorpus(s, d)
      .unionByName(Dedup.styledVariants(docs))

    // s1: exact dedup on the canonical text; keeper = lowest doc_id
    // (lexicographic struct-min, partial-agg friendly). Materialized
    // eagerly (survivor-scale): THREE downstream consumers (the s2
    // anti-join, the s2 text join, and its own count branch) would
    // otherwise each re-run the canonicalNorm groupBy over the 3×
    // corpus — separate actions, so exchange reuse cannot merge them
    val s1 = raw
      .select(Dedup.canonicalNorm(col("text")).as("norm"),
        struct(col("doc_id"), col("text")).as("dt"))
      .groupBy("norm").agg(min(col("dt")).as("keep"))
      .select(col("keep.doc_id").as("doc_id"), col("keep.text").as("text"))
      .localCheckpoint(true)

    // s2: near-dup keep-best over the survivors. The surviving set is
    // exactly the near-dup corpus (restyled copies collapse, near
    // variants do not — dropping a token is not a restyle), so the
    // shared persisted pair frame applies; keepers come from the
    // verified keep-best stage, singletons ride through untouched.
    val keepers = Dedup.dedupKeepBest(s, d)
      .select(col("keeper_doc_id").as("doc_id"))
    val pairs = Dedup.minhashNearDupQuery(s, d)
    val graphNodes = pairs.select(col("doc_a").as("doc_id"))
      .unionByName(pairs.select(col("doc_b").as("doc_id"))).distinct()
    // the funnel emits FIVE count branches over this chain; an eager
    // materialization here (survivor ids + text — keeper-scale, tiny)
    // stops each branch re-running dedup + clustering upstream
    val s2 = keepers
      .unionByName(s1.select("doc_id").join(graphNodes, Seq("doc_id"), "left_anti"))
      .join(s1, Seq("doc_id"))
      .localCheckpoint(true)

    // s3: logistic quality gate, decided on the linear score
    val s3 = s2.filter(TextAnalysis.qualityZ(col("text")) >= 0.0)

    // s4: content-addressed split of the final corpus
    val s4 = s3.select(graft.etl.Preprocess.splitOf(col("text")).as("split"))
      .groupBy("split").agg(count(lit(1)).as("n_docs"))
      .select(concat(lit("s4_"), col("split")).as("stage"), col("n_docs"))

    def cnt(df: DataFrame, stage: String): DataFrame =
      df.agg(count(lit(1)).as("n_docs")).select(lit(stage).as("stage"), col("n_docs"))

    cnt(raw, "s0_raw")
      .unionByName(cnt(s1, "s1_exact_dedup"))
      .unionByName(cnt(s2, "s2_near_dedup"))
      .unionByName(cnt(s3, "s3_quality"))
      .unionByName(s4)
      .orderBy("stage")
  }
}
