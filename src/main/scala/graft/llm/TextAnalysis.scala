package graft.llm

import graft.Tables
import graft.functions.ColumnFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents` (SURVEY.md §2.10 L4/L6):
  * quality scoring, token statistics, language-ID, fingerprinting.
  * Everything is groupBy/window/HOF built-ins — one shuffle per
  * aggregation, no UDFs, whole-stage codegen intact.
  */
object TextAnalysis {

  private val Stopwords = Seq("the", "a", "of", "and", "in")

  /** L4/L6 per-doc quality metrics: token counts, type-token ratio,
    * average token length, stopword ratio, and a composite score
    * (log-length × lexical diversity × content ratio). */
  def textQuality(s: SparkSession, d: String): DataFrame = {
    val t = tokens(col("text"))
    val nTok = size(t).cast("double")
    val stopRatio =
      size(filter(t, tk => tk.isin(Stopwords: _*))).cast("double") / nTok
    val ttr = size(array_distinct(t)).cast("double") / nTok
    Tables.load(s, d, "documents")
      .select(
        col("doc_id"), col("lang"),
        size(t).as("n_tokens"),
        size(array_distinct(t)).as("n_uniq"),
        round(ttr, 6).as("ttr"),
        round((length(col("text")) - (size(t) - 1)).cast("double") / nTok, 6)
          .as("avg_token_len"),
        round(stopRatio, 6).as("stopword_ratio"),
        round(log(lit(1.0) + nTok) * ttr * (lit(1.0) - stopRatio), 6).as("quality"))
      .orderBy("doc_id")
  }

  /** L1/L5 BENCHMARK DECONTAMINATION by 5-gram overlap — the
    * train/eval hygiene pass every pipeline needs: flag training docs
    * sharing any word 5-gram with a benchmark set (here the doc_id %
    * 50 == 0 subset stands in for the eval corpus). Shingle the
    * benchmark side (small by construction), BROADCAST it, and count
    * distinct shared shingles per doc — a broadcast equi-join on the
    * shingle string, never a doc×doc comparison, so the fact side
    * streams map-only into one count-distinct aggregation at any
    * corpus size. Self-pairs are excluded so benchmark docs report
    * only cross-doc overlap. */
  def decontaminateOverlap(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.load(s, d, "documents")
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("tk"))
    val sh = toks
      .filter(size(col("tk")) >= 5)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(1, size(tk) - 4), i -> concat_ws(' ', slice(tk, i, 5)))")))
        .as("shingle"))
    val bench = sh.filter(pmod(col("doc_id"), lit(50L)) === 0)
      .select(col("doc_id").as("b_id"), col("shingle").as("b_shingle"))
    val overlap = sh
      .join(broadcast(bench),
        col("shingle") === col("b_shingle") && col("doc_id") =!= col("b_id"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("shingle")).cast("int").as("n_overlap"))
    docs.select(col("doc_id"), (pmod(col("doc_id"), lit(50L)) === 0).as("is_benchmark"))
      .join(overlap, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("is_benchmark"),
        coalesce(col("n_overlap"), lit(0)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0)) > 0).as("contaminated"))
      .orderBy("doc_id")
  }

  /** L4/L6 BIGRAM LM QUALITY SCORE — the n-gram stand-in for
    * LM-perplexity filtering: each doc scored by the mean log
    * probability of its bigrams under an add-one-smoothed bigram
    * model trained on the corpus itself (p(w2|w1) = (c(w1,w2)+1) /
    * (c(w1)+V); c(w1) is the plain unigram count, V the vocabulary
    * size). Three hash aggregations (bigram counts, unigram counts,
    * one scalar vocab row broadcast back) and two equi-joins on the
    * exploded bigrams — every stage is shuffle-by-key or broadcast,
    * nothing driver-side, so the model "training" IS the aggregation
    * and scales with the corpus. Scores round(…,6) after the ln-mean
    * as usual. */
  def bigramLmScore(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.load(s, d, "documents")
      .select(col("doc_id"), tokens(col("text")).as("tk"))
    val uni = toks.select(explode(col("tk")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
    val vocab = uni.agg(count(lit(1)).as("v")) // 1 row: |V|
    val big = toks.filter(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(tk) - 1),
          |  i -> struct(element_at(tk, i) AS w1, element_at(tk, i + 1) AS w2))"""
          .stripMargin)).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      // pinned exchange on the bigram key: a MATERIALIZATION BARRIER
      // keeping the interpreted transform() from being inlined into
      // each consumer (the O(|doc|²) HOF-recompute trap), and the
      // hash distribution both the count aggregation and the scoring
      // join need, so neither adds an exchange of its own. (Measured
      // honesty: ReuseExchange does NOT dedupe the two subtrees —
      // column pruning specializes them — so the explode itself runs
      // per consumer; it is the cheap map stage, the shuffles are
      // what this pin bounds.)
      .repartition(
        s.conf.get("spark.sql.shuffle.partitions", "32").toInt,
        col("w1"), col("w2"))
    val bc = big.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    big
      .join(bc, Seq("w1", "w2"))
      .join(uni.withColumnRenamed("w", "w1"), Seq("w1"))
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(avg(log((col("cb") + lit(1.0)) / (col("cw") + col("v")))), 6)
          .as("lm_score"))
      .orderBy("doc_id")
  }

  /** L4 corpus-shape histogram: documents binned by character length
    * into fixed-width buckets (100 chars, capped at bucket 19) — the
    * length-distribution profile every corpus audit starts with, plus
    * per-bucket token stats. All bucketing is INTEGER arithmetic
    * (`div`), so bin assignment is bit-identical cross-engine — no
    * float boundary can flip a doc between bins. One hash aggregation;
    * map-only before it. */
  def docLengthHistogram(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")
      .select(
        // `div`, not `/`: Spark's / is DOUBLE division on integers
        expr("least(length(text) div 100, 19)").cast("int").as("bucket"),
        length(col("text")).as("len"),
        size(tokens(col("text"))).as("n_tok"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        min("len").as("min_len"),
        max("len").as("max_len"),
        round(avg("n_tok"), 6).as("avg_tokens"))
      .orderBy("bucket")

  /** L4 global token frequency, top 20 (ties broken by token). */
  def tokenCounts(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(20)

  /** L4 language-ID via corpus-derived token profiles: build each
    * lang's top-10 token profile from the labeled corpus, classify
    * every doc to the profile with the largest distinct-token overlap
    * (ties → lexicographically first lang). Self-supervised n-gram
    * profiling shape; deterministic end to end. */
  def langId(s: SparkSession, d: String): DataFrame = {
    // Same broadcast-profile shape as [[langIdNgram]] (round-2
    // rewrite): the per-lang top-10 token profile collapses to one
    // array row per lang and classification is a map-only
    // size(array_intersect) over a 5-row broadcast — no doc-side
    // explode, no shuffle join on token strings. array_intersect
    // counts DISTINCT shared tokens (= the old explode(array_distinct)
    // + join count); filter(overlap >= 1) reproduces the inner join's
    // dropping of zero-overlap pairs.
    // No exchange barrier here (unlike the ngram variant): tk is one
    // codegen'd split() call, so recomputing it per consumer is far
    // cheaper than shuffling the whole corpus to share it.
    val docs = Tables.load(s, d, "documents")
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("tk"))
    val prof = docs
      .select(col("lang"), explode_outer(col("tk")).as("token"))
      .groupBy("lang", "token")
      .agg(count(lit(1)).as("c"))
      .withColumn("rn",
        row_number().over(Window.partitionBy("lang").orderBy(col("c").desc, col("token"))))
      .filter(col("rn") <= 10)
      .groupBy(col("lang").as("plang"))
      .agg(collect_list(col("token")).as("ptok"))
    docs.crossJoin(broadcast(prof))
      .select(
        col("doc_id"), col("lang"), col("plang"),
        size(array_intersect(col("tk"), col("ptok"))).as("overlap"))
      .filter(col("overlap") >= 1)
      .withColumn("rn",
        row_number().over(Window.partitionBy("doc_id").orderBy(col("overlap").desc, col("plang"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("plang").as("predicted"))
      .orderBy("doc_id")
  }

  /** F-family HOF predicates over token arrays — exists / forall /
    * filter-count / aggregate-fold, each mirrored by a DuckDB list
    * function. Map-only; the HOFs run once per doc over one split()
    * array (no cross-lambda indexing, so no barrier needed). */
  def tokenPredicates(s: SparkSession, d: String): DataFrame = {
    val t = tokens(col("text"))
    Tables.load(s, d, "documents")
      .select(
        col("doc_id"),
        exists(t, tk => tk.isin(Stopwords: _*)).as("has_stopword"),
        forall(t, tk => length(tk) < 15).as("all_short"),
        size(filter(t, tk => length(tk) >= 8)).as("n_long"),
        aggregate(t, lit(0), (acc, tk) => acc + length(tk)).as("sum_token_len"))
      .orderBy("doc_id")
  }

  /** L4 BPE-ish regex token counting: runs of letters, runs of
    * digits, and single other symbols — the subword-style tokenizer
    * shape — compared against plain whitespace counts per doc. */
  def bpeTokenStats(s: SparkSession, d: String): DataFrame = {
    val bpe = regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))
    Tables.load(s, d, "documents")
      .select(
        col("doc_id"),
        size(tokens(col("text"))).as("n_ws_tokens"),
        size(bpe).as("n_bpe_tokens"),
        size(array_distinct(bpe)).as("n_uniq_bpe"))
      .orderBy("doc_id")
  }

  /** L4 language-ID, char-trigram variant (the literal "n-gram
    * heuristic"): per-lang top-10 character trigram profiles from the
    * labeled corpus, classify by distinct-trigram overlap (ties →
    * lexicographically first lang). Same self-supervised shape as
    * [[langId]] at sub-word granularity. */
  def langIdNgram(s: SparkSession, d: String): DataFrame = {
    // Round-2 rewrite (was 12.35 s ≈ 17% of bench at sf0.1). Three
    // load-bearing choices:
    //  1. Trigrams come from the native CharNgramsExpr (one tight loop
    //     per doc) instead of the interpreted transform(sequence,
    //     substring) HOF whose per-element expression-tree evaluation
    //     dominated round 1.
    //  2. The array is still materialized behind an exchange barrier
    //     (Dedup.minhashSigArray pattern) so it is computed once per
    //     doc however many consumers reference it.
    //  3. The per-lang top-10 profile is collapsed to ONE ARRAY ROW PER
    //     LANG and broadcast; each doc classifies via
    //     size(array_intersect(grams, profile)) over a 5-row broadcast
    //     cross join. This removes the doc-side explode (~2.5 M rows),
    //     the shuffle join on gram strings, and the window over the
    //     exploded frame — the 100 TB shape: profiles are tiny model
    //     state, classification is a map-only pass.
    // Semantics are unchanged vs the oracle: array_intersect counts
    // DISTINCT shared grams (= the old explode(array_distinct)+join
    // count), and filter(overlap >= 1) reproduces the inner join's
    // dropping of zero-overlap (doc, plang) pairs.
    val docs = Tables.loadParallel(s, d, "documents")
      .select(col("doc_id"), col("lang"), charNgrams(col("text"), 3).as("grams"))
      .repartition(
        s.conf.get("spark.sql.shuffle.partitions", "32").toInt, col("doc_id"))
    val prof = docs
      .select(col("lang"), explode_outer(col("grams")).as("g"))
      // explode_outer (not explode) avoids the inferred size>0 filter;
      // the null row it emits for a <3-char doc is dropped HERE so it
      // can never enter a profile (the oracle's unnest emits nothing)
      .filter(col("g").isNotNull)
      .groupBy("lang", "g")
      .agg(count(lit(1)).as("c"))
      .withColumn("rn",
        row_number().over(Window.partitionBy("lang").orderBy(col("c").desc, col("g"))))
      .filter(col("rn") <= 10)
      .groupBy(col("lang").as("plang"))
      .agg(collect_list(col("g")).as("pg")) // order irrelevant to intersect size
    docs.crossJoin(broadcast(prof))
      .select(
        col("doc_id"), col("lang"), col("plang"),
        size(array_intersect(col("grams"), col("pg"))).as("overlap"))
      .filter(col("overlap") >= 1)
      .withColumn("rn",
        row_number().over(Window.partitionBy("doc_id").orderBy(col("overlap").desc, col("plang"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("plang").as("predicted"))
      .orderBy("doc_id")
  }

  /** CJK-domain fingerprint: the reference's actual corpus is Chinese
    * (`utils/data_preprocess.py:19-24`), but the driver tables are
    * ASCII — so this query derives a deterministic MIXED CJK/ASCII
    * string per doc (CJK literals + doc columns) and hashes it with
    * the native code-point PolyHashExpr. The DuckDB oracle runs the
    * identical code-point fold (`ascii(substring)` = codePointAt in
    * BOTH engines), which makes the multi-byte hash path — the
    * round-1 weak-risk — oracle-verified, not just spec-verified. */
  def cjkFingerprint(s: SparkSession, d: String): DataFrame =
    Tables.loadParallel(s, d, "documents")
      .select(
        col("doc_id"),
        polyHash(concat(lit("文档«"), col("lang"), lit("»共情¶ "), col("text")))
          .as("cjk_fp"),
        polyHash(col("text")).as("ascii_fp"))
      .orderBy("doc_id")

  /** The SQL-REGISTRY surface end-to-end: the same fingerprint math as
    * [[docFingerprint]] expressed through `spark.sql` with the
    * graft_* functions injected by GraftExtensions — proving the
    * extension point works under the driver's correctness gate, not
    * just in specs. Requires a session built with
    * `spark.sql.extensions=graft.GraftExtensions` (as Verify/Bench/
    * Explain/PlanAudit all are). */
  def sqlRegistryFingerprint(s: SparkSession, d: String): DataFrame = {
    Tables.loadParallel(s, d, "documents").createOrReplaceTempView("graft_docs_sqlreg")
    s.sql("""
      SELECT doc_id,
             graft_polyhash(text) AS content_fp,
             graft_shingle_min(graft_token_hashes(text)) AS min_fp,
             graft_simhash(graft_token_hashes(text)) AS simhash
      FROM graft_docs_sqlreg ORDER BY doc_id""")
  }

  /** L2/L4 document fingerprints: full-content rolling hash plus the
    * min-shingle-hash (the winnowing primitive — two docs sharing any
    * 3-gram window can collide on min_fp for fast candidate lookup). */
  def docFingerprint(s: SparkSession, d: String): DataFrame =
    // round 2: fused native expressions (TokenHashesExpr +
    // ShingleMinExpr) — single codegen projection, no exchange barrier
    // needed (nothing indexes an unbound array from a HOF lambda)
    Tables.loadParallel(s, d, "documents")
      .select(
        col("doc_id"),
        polyHash(col("text")).as("content_fp"),
        shingleMinNative(tokenHashesNative(col("text"))).as("min_fp"))
      .orderBy("doc_id")

  /** L4 TF-IDF: top-3 terms per doc by tf·idf with smoothed idf
    * (ln((N+1)/(df+1)) + 1, the sklearn formulation — never negative,
    * never divides by zero). Scale shape: term frequencies are ONE
    * shuffle of the exploded (doc, term) pairs; document frequencies
    * aggregate the same frame a second time and come back as a
    * BROADCAST join (vocabulary ≪ corpus — bounded by the token
    * domain, not the doc count); N is a scalar broadcast. Ranking is
    * computed on the ROUNDED score with a term tie-break, so the
    * cross-engine ulp noise of ln() cannot flip row_number (the
    * determinism contract every exp/avg query in this file follows).
    */
  def tfidfTopTerms(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.loadParallel(s, d, "documents")
    val pairs = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val tf = pairs.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // df comes from the TF AGGREGATE (one row per (doc, term) ⟹ row
    // count per term = docs containing it), not from a second
    // distinct+aggregate over the raw exploded pairs — at 100 TB that
    // second pass over the token stream is the whole corpus again
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n"))
    val scored = tf
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(n))
      .withColumn("score", round(
        col("tf").cast("double") *
          (log((col("n") + 1).cast("double") / (col("df") + 1).cast("double")) + 1.0),
        6))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk").cast("int").as("rk"), col("term"),
        col("tf").cast("int").as("tf"), col("score"))
      .orderBy("doc_id", "rk")
  }

  /** Query terms for [[bm25Retrieval]] — a fixed conjunctive bag, the
    * deterministic stand-in for a user query. */
  private[graft] val Bm25Query = Seq("spark", "vector", "stream")

  /** L4b MATERIALIZED INVERTED INDEX: the postings table (term,
    * doc_id, tf) is built once and PERSISTED as a lake-table snapshot
    * — the index-as-a-table pattern (build cost paid at ingest, every
    * later query reads postings instead of rescanning the corpus) —
    * then the same conjunctive query [[conjunctiveSearch]] answers
    * from the corpus is answered THROUGH the index read path: filter
    * postings to the query terms, intersect by counting distinct
    * terms per doc. Shares [[conjunctiveSearch]]'s oracle, so
    * build→commit→read→lookup is hash-verified end to end. At 100 TB
    * the postings table is partitioned by term prefix and the term
    * filter becomes partition pruning; the lookup plan is unchanged. */
  def invertedIndexLookup(s: SparkSession, d: String): DataFrame = {
    val path = s"/tmp/graft_lakeindex_${d.replaceAll("[^a-zA-Z0-9]", "_")}"
    graft.Util.rmRecursive(path)
    val postings = Tables.loadParallel(s, d, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"))
    graft.sources.LakeTable.overwrite(postings, path)
    graft.sources.LakeTable.read(s, path)
      .filter(col("term").isin(Bm25Query: _*))
      .groupBy("doc_id")
      .agg(countDistinct("term").as("nq"), sum("tf").as("n_hits"))
      .filter(col("nq") === Bm25Query.size)
      .select(col("doc_id"), col("n_hits"))
      .orderBy("doc_id")
  }

  /** L4 COUNT-MIN SKETCH token frequencies: the fixed-size mergeable
    * frequency summary (Spark's own `CountMinSketch`, built with a
    * deterministic seed via one distributed pass + sketch merge). The
    * sketch never under-counts and over-counts by at most ε·N with
    * probability 1−δ — the bound TokenSketchSpec asserts against the
    * exact counts. At 100 TB this is how per-token frequencies reach
    * a driver/dashboard without shuffling the vocabulary: each
    * partition folds into a KB-scale sketch, sketches merge
    * associatively (the same re-aggregation algebra as HLL). Not a
    * declared query: estimates are approximate by construction, so
    * correctness lives in the spec's ε/δ bound, exactly like the
    * recall-floored KNN family. */
  def tokenCountSketch(
      s: SparkSession, d: String,
      eps: Double = 0.001, confidence: Double = 0.99, seed: Int = 42)
      : org.apache.spark.util.sketch.CountMinSketch =
    Tables.loadParallel(s, d, "documents")
      .select(explode(tokens(col("text"))).as("token"))
      .stat.countMinSketch(col("token"), eps, confidence, seed)

  /** L4 CONJUNCTIVE search — posting-list intersection: docs
    * containing EVERY query term. The inverted-index shape without
    * materializing the index: explode to (doc, term) postings, keep
    * only query terms (the isin prunes map-side, so the shuffle
    * carries |matching postings|, not the corpus), and a doc survives
    * iff its distinct-term count equals |query| — intersection as a
    * counting aggregate, the standard distributed AND. */
  def conjunctiveSearch(s: SparkSession, d: String): DataFrame = {
    val nTerms = Bm25Query.size
    Tables.loadParallel(s, d, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .filter(col("term").isin(Bm25Query: _*))
      .groupBy("doc_id")
      .agg(countDistinct("term").as("nq"), count(lit(1)).as("n_hits"))
      .filter(col("nq") === nTerms)
      .select(col("doc_id"), col("n_hits"))
      .orderBy("doc_id")
  }

  /** L4 BM25 retrieval (k1=1.2, b=0.75): top-20 docs for a fixed
    * query-term bag. Same two-aggregate shape as [[tfidfTopTerms]]
    * (tf shuffle + broadcast df + scalar (N, avgdl)), with the probe
    * side pre-filtered to the query terms BEFORE the tf aggregation —
    * at 100 TB the isin() prunes the exploded pair stream to |query|
    * terms, so the shuffle carries only matching pairs, not the
    * corpus. Doc-length normalization uses the ORIGINAL token count
    * (computed map-side, carried through the aggregation). Final
    * ranking on the rounded score with doc_id tie-break. */
  def bm25Retrieval(s: SparkSession, d: String): DataFrame = {
    val k1 = 1.2
    val b = 0.75
    val docs = Tables.loadParallel(s, d, "documents")
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"), col("tk"), size(col("tk")).as("dl"))
    val stats = docs.select(
      count(lit(1)).as("n"), avg(col("dl").cast("double")).as("avgdl"))
    val qpairs = docs
      .select(col("doc_id"), col("dl"), explode(col("tk")).as("term"))
      .filter(col("term").isin(Bm25Query: _*))
    val tf = qpairs.groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df")) // one tf row per (doc, term)
    val idf = log(lit(1.0) +
      (col("n") - col("df") + 0.5) / (col("df") + 0.5))
    tf
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("contrib",
        idf * (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(round(sum("contrib"), 6).as("bm25"),
        count(lit(1)).cast("int").as("n_matched_terms"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)
  }

  /** TOKEN-BUDGET SELECTION — "take the best documents until the
    * budget is spent": rank by the composite quality score and keep
    * docs while the running token total stays within budget (here
    * total/4, derived from the data so the query is scale-free). The
    * global running sum is the classic scale trap — a single-partition
    * window — so this uses the engine's documented two-pass shape
    * (as `skylinePriceSize`): (1) integer quality-bucket totals, tiny
    * frame, broadcast back with each bucket's strictly-higher prefix;
    * (2) a window cumsum WITHIN each bucket, partitioned by bucket.
    * global_cumsum = bucket_prefix + within_bucket — no global
    * exchange-to-one anywhere. The bucket key is an integer truncation
    * of the ROUNDED quality (identical double product cross-engine),
    * and the running total is all-integer, so the budget boundary
    * cannot flip on float noise. */
  def tokenBudgetSelect(s: SparkSession, d: String): DataFrame = {
    val t = tokens(col("text"))
    val nTok = size(t).cast("double")
    val stopRatio =
      size(filter(t, tk => tk.isin(Stopwords: _*))).cast("double") / nTok
    val ttr = size(array_distinct(t)).cast("double") / nTok
    val qd = Tables.load(s, d, "documents")
      .select(col("doc_id"), col("lang"), size(t).as("n_tokens"),
        round(log(lit(1.0) + nTok) * ttr * (lit(1.0) - stopRatio), 6).as("quality"))
      .withColumn("qb", floor(col("quality") * 1000).cast("long"))
    val budget = qd.agg(
      expr("sum(CAST(n_tokens AS BIGINT)) div 4").as("budget"))
    // pass 1: per-bucket token totals (tiny), prefix of strictly
    // better buckets via a window over the BUCKET frame only
    val buckets = qd.groupBy("qb")
      .agg(sum(col("n_tokens").cast("long")).as("btok"))
      .withColumn("prefix",
        coalesce(sum("btok").over(
          Window.orderBy(col("qb").desc).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
    // pass 2: within-bucket running total, partitioned by bucket
    qd.join(broadcast(buckets.select("qb", "prefix")), Seq("qb"))
      .crossJoin(broadcast(budget))
      .withColumn("cum",
        col("prefix") + sum(col("n_tokens").cast("long")).over(
          Window.partitionBy("qb")
            .orderBy(col("quality").desc, col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("cum") <= col("budget"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_selected"),
        sum(col("n_tokens").cast("long")).as("tokens_selected"),
        round(min("quality"), 6).as("min_quality"))
      .orderBy("lang")
  }

  /** VOCABULARY COVERAGE CURVE — what fraction of the corpus token
    * mass the top-k most frequent types cover (the audit behind vocab
    * size / tokenizer choices). Type counts are one hash aggregation;
    * the top-k cut is `orderBy(...).limit(maxK)` — planned as
    * TakeOrderedAndProject (per-partition heaps + single merge, never
    * a global sort of the vocabulary); the k-sweep then runs on that
    * ≤maxK-row frame. Ties rank by token string so the cut is total. */
  def vocabCoverage(s: SparkSession, d: String): DataFrame = {
    val ks = Seq(10, 100, 1000)
    val counts = Tables.load(s, d, "documents")
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val total = counts.agg(sum("c").as("total_tokens"))
    val top = counts.orderBy(col("c").desc, col("w")).limit(ks.max)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("c").desc, col("w")))) // ≤ maxK rows: tiny
    top.crossJoin(broadcast(total))
      .select(explode(typedLit(ks)).as("k"), col("rk"), col("c"),
        col("total_tokens"))
      .filter(col("rk") <= col("k"))
      .groupBy("k", "total_tokens")
      .agg(count(lit(1)).as("n_types"), sum("c").as("covered_tokens"))
      .select(col("k"), col("n_types"), col("covered_tokens"),
        col("total_tokens"),
        round(col("covered_tokens").cast("double") / col("total_tokens"), 6)
          .as("coverage"))
      .orderBy("k")
  }

  /** L4 REPETITION quality signals (the Gopher/C4 filter family —
    * Rae et al. 2021 §A1.1): per-document duplicate-bigram fraction,
    * top-bigram fraction, and longest same-token run. Highly
    * repetitive documents are the classic low-quality stratum a
    * pre-training pipeline drops before dedup even starts. Shapes:
    * the bigram profile is explode + two partial-agg-friendly hash
    * aggregations (never a per-row O(n²) HOF scan); the run length is
    * a single map-side integer fold over the native token-hash array
    * with radix-packed state prev·2^20 + run·2^10 + best (hashes
    * < 2^30, runs capped at 1023, so the state stays < 2^51 — exact
    * in BIGINT on both engines). The repetitive gate uses INTEGER
    * comparisons (5·top > n, 2·dup > n) — no float threshold can
    * flip a document cross-engine. */
  def repetitionSignals(s: SparkSession, d: String): DataFrame = {
    val nParts = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val toks = Tables.load(s, d, "documents")
      .select(col("doc_id"), tokens(col("text")).as("tk"),
        tokenHashesNative(col("text")).as("th"))
      .filter(size(col("tk")) >= 2)
      // exchange barrier: tk/th are consumed by the bigram HOF and
      // the run fold — materialize once (HOF-recompute trap)
      .repartition(nParts, col("doc_id"))
    val prof = toks
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(tk) - 1),
          |  i -> concat_ws(' ', element_at(tk, i), element_at(tk, i + 1)))"""
          .stripMargin)).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_bigrams"), count(lit(1)).as("n_distinct"),
        max("c").as("top_count"))
    val runs = toks.select(col("doc_id"), expr(
      """CAST(aggregate(th, CAST(1000000007 AS BIGINT) * 1048576,
        |  (st, x) -> x * 1048576
        |    + least(CASE WHEN x = st div 1048576
        |             THEN (st div 1024) % 1024 + 1 ELSE 1 END, 1023) * 1024
        |    + greatest(st % 1024,
        |        least(CASE WHEN x = st div 1048576
        |              THEN (st div 1024) % 1024 + 1 ELSE 1 END, 1023)),
        |  st -> st % 1024) AS INT)""".stripMargin).as("max_run"))
    prof.join(runs, Seq("doc_id"))
      .select(col("doc_id"), col("n_bigrams"), col("n_distinct"), col("top_count"),
        round((col("n_bigrams") - col("n_distinct")).cast("double") /
          col("n_bigrams"), 6).as("dup2_frac"),
        round(col("top_count").cast("double") / col("n_bigrams"), 6).as("top2_frac"),
        col("max_run"),
        (lit(5) * col("top_count") > col("n_bigrams") ||
          lit(2) * (col("n_bigrams") - col("n_distinct")) > col("n_bigrams") ||
          col("max_run") >= 3).cast("int").as("repetitive"))
      .orderBy("doc_id")
  }

  /** L4 PII SCRUBBING — the redaction pass every released corpus
    * runs: detect and mask emails, phone numbers, and IPv4 addresses
    * with codegen'd `regexp_extract_all`/`regexp_replace` (map-only,
    * zero shuffles before the final sort). The driver corpus carries
    * no PII, so a deterministic injection step (pure integer
    * functions of doc_id, mirrored by the oracle) plants all three
    * kinds first — making the detector's hit counts and the scrubbed
    * text itself exactly checkable. Patterns are RE2-safe character
    * classes (no lookaround), so Java regex and DuckDB RE2 match
    * identical spans. */
  def piiScrub(s: SparkSession, d: String): DataFrame = {
    val email = "[a-z0-9]+@[a-z0-9.]+"
    val phone = "555-[0-9]{4}"
    val ip = "10\\.[0-9]+\\.[0-9]+\\.[0-9]+"
    val injected = Tables.load(s, d, "documents")
      .select(col("doc_id"), col("lang"), concat(
        col("text"),
        when(pmod(col("doc_id"), lit(5L)) === 0,
          concat(lit(" reach user"), col("doc_id").cast("string"),
            lit("@mail.example.org"))).otherwise(""),
        when(pmod(col("doc_id"), lit(7L)) === 0,
          concat(lit(" dial 555-"),
            lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0")))
          .otherwise(""),
        when(pmod(col("doc_id"), lit(11L)) === 0,
          concat(lit(" from 10."), pmod(col("doc_id"), lit(256L)).cast("string"),
            lit("."), pmod(col("doc_id") * 7, lit(256L)).cast("string"),
            lit("."), pmod(col("doc_id") * 13, lit(256L)).cast("string")))
          .otherwise("")).as("text"))
    injected
      .select(col("doc_id"), col("lang"),
        size(regexp_extract_all(col("text"), lit(email), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("text"), lit(phone), lit(0))).as("n_phones"),
        size(regexp_extract_all(col("text"), lit(ip), lit(0))).as("n_ips"),
        length(col("text")).as("len_raw"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("text"), email, "<EMAIL>"),
            ip, "<IP>"),
          phone, "<PHONE>").as("scrubbed"))
      .withColumn("len_scrubbed", length(col("scrubbed")))
      .orderBy("doc_id")
  }

  /** L4e CLASSIFIER CONFUSION MATRIX — the eval-side read of the
    * language-ID stage: declared label × predicted label counts, the
    * matrix that tells a curation team WHERE the classifier fails
    * before they gate on it. One hash aggregation over [[langId]]'s
    * per-doc predictions; output bounded by |langs|². */
  def langIdConfusion(s: SparkSession, d: String): DataFrame =
    langId(s, d)
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "predicted")

  /** L7g DETERMINISTIC TOKEN-DROPOUT AUGMENTATION — the EDA-style
    * augmentation stage of a training pipeline, made reproducible:
    * each token drops iff polyhash(token) + doc_id ≡ 0 (mod 10), so
    * the "random" 10% dropout is a pure function of (doc, token) —
    * re-running the pipeline regenerates byte-identical augmented
    * text (seeded per-partition RNG cannot promise that across
    * repartitions). Map-only HOF filter + concat, zero shuffles. */
  def augmentTokenDropout(s: SparkSession, d: String): DataFrame = {
    val kept = filter(tokens(col("text")),
      tk => pmod(polyHash(tk) + col("doc_id"), lit(10L)) =!= 0)
    Tables.load(s, d, "documents")
      .select(
        col("doc_id"),
        size(tokens(col("text"))).as("n_tokens"),
        size(kept).as("n_kept"),
        concat_ws(" ", kept).as("augmented"))
      .withColumn("len_augmented", length(col("augmented")))
      .orderBy("doc_id")
  }

  /** L4b PHRASE SEARCH — exact consecutive-phrase matching via
    * POSITIONAL postings, the index shape conjunctive (bag-of-words)
    * search cannot express: tokens explode with their position, the
    * posting stream is pruned to the phrase's terms MAP-SIDE (before
    * any shuffle), and adjacency is one equi-join on
    * (doc, position+1). Per-doc occurrence counts follow in the same
    * aggregation. At 100 TB this is the standard positional-index
    * probe: the shuffle carries matching postings only, never the
    * corpus. */
  def phraseSearch(
      s: SparkSession, d: String,
      w1: String = "table", w2: String = "scan"): DataFrame = {
    val tok = Tables.load(s, d, "documents")
      .select(col("doc_id"), posexplode(tokens(col("text"))))
      .filter(col("col").isin(w1, w2))
    val a = tok.filter(col("col") === w1).select(col("doc_id"), col("pos"))
    val b = tok.filter(col("col") === w2)
      .select(col("doc_id"), (col("pos") - 1).as("pos"))
    a.join(b, Seq("doc_id", "pos"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_occurrences"))
      .orderBy("doc_id")
  }

  /** L6 MODEL-BASED QUALITY FILTERING (inference side) — the linear
    * quality-classifier pass of a curated corpus (the fastText-style
    * "looks like reference text?" gate): p(keep) = σ(w·x) over cheap
    * per-doc features (TTR, stopword ratio, log token count). The
    * weights are fixed constants here — a trained model would arrive
    * as a broadcast weight vector and the plan would not change.
    * Map-only: one codegen'd projection per doc, zero shuffles (the
    * ORDER BY is the determinism contract). The keep decision tests
    * the LINEAR score against 0 (σ is monotone), so no exp() sits on
    * the decision boundary. */
  /** The quality model's LINEAR score over a text column — one
    * definition shared by [[qualityLogit]] and the curation funnel's
    * gate (so the composed pipeline cannot drift from the stage). */
  private[graft] def qualityZ(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val t = tokens(text)
    val nTok = size(t).cast("double")
    val ttr = size(array_distinct(t)).cast("double") / nTok
    val stopRatio = size(filter(t, tk => tk.isin(Stopwords: _*))).cast("double") / nTok
    lit(-2.0) + lit(3.0) * ttr - lit(1.5) * stopRatio +
      lit(0.3) * log(lit(1.0) + nTok)
  }

  def qualityLogit(s: SparkSession, d: String): DataFrame = {
    val z = qualityZ(col("text"))
    Tables.load(s, d, "documents")
      .select(
        col("doc_id"),
        round(z, 6).as("logit"),
        round(sigmoid(z), 6).as("p_keep"),
        (z >= 0.0).as("keep"))
      .orderBy("doc_id")
  }

  /** L8b DUPLICATE-N-GRAM FRACTION — the corpus-level repetition
    * signal (Dolma/RedPajama "fraction of duplicate n-grams"):
    * for each doc, the share of its DISTINCT word 5-grams that also
    * occur in at least one OTHER document. Where `repetitionSignals`
    * measures repetition WITHIN a doc (map-only), this measures
    * boilerplate ACROSS docs: one document-frequency aggregation on
    * the shingle key, joined back to the per-doc shingle set — both
    * stages shuffle on the shingle, never doc×doc. A doc's distinct
    * shingles mean df≥2 ⇔ some other doc shares the shingle, so no
    * self-exclusion join is needed. At 100 TB the shingle strings
    * would be polyhashed (as `setsimJoinExact` does); exact strings
    * here keep the oracle byte-identical. */
  /** L13 EXACT-SUBSTRING DUPLICATION SPANS — the positional variant
    * of n-gram dedup (the ExactSubstr shape of Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better",
    * approximated at 8-token window granularity): a position is
    * duplicated when its 8-token window occurs ANYWHERE else in the
    * corpus (another doc or another position of the same doc);
    * consecutive duplicated positions coalesce into MAXIMAL SPANS
    * (two windows at p < q merge when q ≤ p + 8 — their token
    * intervals touch), and each doc reports span count, tokens
    * covered, longest span, and covered fraction — exactly what the
    * cut-duplicated-substrings curation step consumes. Unlike
    * [[dupNgramFrac]] (distinct-shingle fraction), positions are
    * kept, so a 200-token verbatim quote counts as ONE span of 200
    * tokens, not 193 independent shingles.
    *
    * Scale shape: one |tokens|-row window explode, one count
    * aggregation on the window key, one shuffle-by-doc windowed
    * islands pass — never doc×doc. At 100 TB the window key would be
    * a 128-bit window hash instead of the spelled-out string (same
    * plan, ~8× smaller shuffle); the string key here keeps the query
    * bit-identical to the cross-engine oracle. */
  /** The exact-substring window width (tokens) shared by the spans
    * report and the cut transform. */
  private val ExactW = 8

  /** Duplicated window START positions (doc_id, pos — 1-based): a
    * position is duplicated when its [[ExactW]]-token window occurs
    * anywhere else in the corpus. ONE definition consumed by both
    * [[exactSubstringSpans]] (the report) and [[exactSubstringCut]]
    * (the transform), so the two can never disagree about what is
    * duplicated.
    *
    * The window frame feeds two consumers (count agg, position probe)
    * and the explode DOES run once per consumer — measured:
    * ReuseExchange never fires here because column pruning
    * specializes each consumer's subtree (counts prunes to `w`
    * alone), which is the better trade: the map-side explode is
    * cheap, the pruned agg shuffle is not. A pinned shared exchange
    * was tried and rejected (it forces the probe through a shuffle
    * where the planner's broadcast/SMJ choice is strictly better at
    * either scale). */
  private def exactDupPositions(docs: DataFrame): DataFrame = {
    val W = ExactW
    val toks = docs
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= W)
      // materialization barrier (dupNgramFrac's pattern): keep the
      // interpreted HOF from re-tokenizing per window index
      .repartition(col("doc_id"))
    val win = toks
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(1, size(tk) - ${W - 1}), " +
          s"i -> concat_ws(' ', slice(tk, i, $W)))")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("w"))
    val counts = win.groupBy("w").agg(count(lit(1)).as("cnt"))
    win.join(counts, Seq("w")).filter(col("cnt") >= 2)
      .select("doc_id", "pos")
  }

  def exactSubstringSpans(s: SparkSession, d: String): DataFrame = {
    val W = ExactW
    val docs = Tables.load(s, d, "documents")
    val dup = exactDupPositions(docs)
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val spans = dup
      // gaps-and-islands: a window starts a NEW span unless it
      // touches the previous window's token interval
      .withColumn("newgrp",
        when(col("pos") - lag("pos", 1).over(byDoc) <= W, 0).otherwise(1))
      .withColumn("grp", sum("newgrp").over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "grp")
      .agg(min("pos").as("s"), (max("pos") + W - 1).as("e"))
    val perDoc = spans.groupBy("doc_id").agg(
      count(lit(1)).cast("int").as("n_spans"),
      sum(col("e") - col("s") + 1).cast("int").as("dup_tokens"),
      max(col("e") - col("s") + 1).cast("int").as("longest_span"))
    docs.select(col("doc_id"), size(tokens(col("text"))).as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_tokens"),
        coalesce(col("n_spans"), lit(0)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0)).as("dup_tokens"),
        coalesce(col("longest_span"), lit(0)).as("longest_span"),
        round(coalesce(col("dup_tokens"), lit(0)).cast("double") /
          greatest(col("n_tokens"), lit(1)), 6).as("dup_frac"))
      .orderBy("doc_id")
  }

  /** L13b EXACT-SUBSTRING CUT (round-16 #4) — the TRANSFORM half of
    * Lee et al. 2021's ExactSubstr deduplication: where
    * [[exactSubstringSpans]] REPORTS the duplicated spans, this EMITS
    * the cleaned corpus a pipeline actually consumes — every token
    * covered by any duplicated [[ExactW]]-token window is cut and the
    * kept fragments re-join in order (single-space canonical form,
    * the tokenizer's inverse). A doc with no duplication passes
    * through token-identical; a fully-duplicated doc collapses to the
    * empty string (the paper keeps one copy only when cutting at the
    * SUFFIX-ARRAY level — at window granularity every occurrence of a
    * duplicated window is cut on all sides, the conservative
    * curation-side choice).
    *
    * Scale shape: the shared duplicated-position frame (one window
    * explode + one count shuffle on the window key), the covered-set
    * expansion (O(dup windows × W), shuffled on (doc, idx)), one
    * anti-join against the token-position explode, one per-doc
    * re-assembly aggregation — every stage keys on doc or window,
    * never doc×doc, and the re-join is bounded by |kept tokens|. */
  private[graft] def exactSubstringCutFrame(docs: DataFrame): DataFrame = {
    val W = ExactW
    // covered token positions: each duplicated window covers
    // [pos, pos + W - 1]; distinct because overlapping windows cover
    // the same positions many times over
    val covered = exactDupPositions(docs)
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(W - 1))).as("idx"))
      .distinct()
    val tokPos = docs
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      // materialization barrier: posexplode over an inlined split
      // would re-tokenize per index (the dupNgramFrac measurement)
      .repartition(col("doc_id"))
      .select(col("doc_id"), posexplode(col("tk")))
      .select(col("doc_id"), (col("pos") + 1).as("idx"), col("col").as("tok"))
    val kept = tokPos.join(covered, Seq("doc_id", "idx"), "left_anti")
    // order restored by idx (collect_list alone is arrival-ordered —
    // nondeterministic under shuffles; the struct sort pins it)
    val cleaned = kept.groupBy("doc_id").agg(
      count(lit(1)).cast("int").as("kept_tokens"),
      array_join(transform(
        array_sort(collect_list(struct(col("idx"), col("tok")))),
        x => x.getField("tok")), " ").as("clean_text"))
    docs.select(col("doc_id"), size(tokens(col("text"))).as("n_tokens"))
      .join(cleaned, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_tokens"),
        coalesce(col("kept_tokens"), lit(0)).as("kept_tokens"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy("doc_id")
  }

  def exactSubstringCut(s: SparkSession, d: String): DataFrame =
    exactSubstringCutFrame(Tables.load(s, d, "documents"))

  def dupNgramFrac(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.load(s, d, "documents")
    val sh = docs
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 5)
      // materialization barrier (bandFrame's pattern): without it
      // CollapseProject inlines tk = split(text) into the transform
      // lambda and the interpreted HOF re-tokenizes per shingle index
      // — O(|doc|²) per doc (measured 13 s vs 1.4 s at sf0.1)
      .repartition(col("doc_id"))
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(1, size(tk) - 4), i -> concat_ws(' ', slice(tk, i, 5)))")))
        .as("shingle"))
    val df = sh.groupBy("shingle").agg(count(lit(1)).as("ndocs"))
    val perDoc = sh
      .join(df, Seq("shingle"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast("int").as("n_shingles"),
        sum(when(col("ndocs") >= 2, 1L).otherwise(0L)).cast("int").as("n_dup"))
    docs.select("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_shingles"), lit(0)).as("n_shingles"),
        coalesce(col("n_dup"), lit(0)).as("n_dup"),
        round(coalesce(col("n_dup"), lit(0)).cast("double") /
          greatest(coalesce(col("n_shingles"), lit(0)), lit(1)), 6).as("dup_frac"))
      .orderBy("doc_id")
  }

  /** GOPHER-STYLE REPETITION SIGNALS (Rae et al. 2021, "Scaling
    * Language Models" §A1.1 — the MassiveText repetition filters):
    * per document, the duplicate-word fraction (1 − distinct/total)
    * and the TOP-BIGRAM SHARE (occurrences of the most frequent word
    * 2-gram over all 2-grams), plus the standard keep/drop flag at
    * the 0.2 threshold. Shape at 100 TB: bigrams derive from ONE
    * posexplode + a lead window inside the doc_id partition — the
    * corpus shuffles once on doc_id, then two bounded per-doc
    * aggregations; never a self-join. */
  def gopherRepetitionQuery(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.load(s, d, "documents").select("doc_id", "text")
    val w = expr("filter(split(text, ' '), x -> x <> '')")
    val toks = docs.select(col("doc_id"), posexplode(w).as(Seq("pos", "word")))
    val withNext = toks.withColumn("nxt",
      lead("word", 1).over(Window.partitionBy("doc_id").orderBy("pos")))
    val bg = withNext.filter(col("nxt").isNotNull)
      .groupBy(col("doc_id"), concat_ws(" ", col("word"), col("nxt")).as("bigram"))
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("top_c"), sum("c").as("tot_c"))
    val wd = toks.groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), countDistinct("word").as("n_distinct"))
    val share = coalesce(col("top_c").cast("double") / col("tot_c"), lit(0.0))
    wd.join(bg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_words"), 6)
          .as("dup_word_frac"),
        round(share, 6).as("top_bigram_share"),
        (share > 0.2).as("repetitive"))
      .orderBy("doc_id")
  }

  /** L15 — DSIR data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): fit two smoothed
    * unigram models — a small TARGET corpus (the distribution you
    * want more of) and the RAW pool — and score every raw document by
    * its per-token log importance ratio Σ ln(p_target(w)/p_raw(w));
    * the top-scoring docs are the selection. This is the
    * deterministic top-k variant (the paper's Gumbel-noise resample
    * is one extra seeded column on the same scores); word features
    * stand in for the paper's hashed n-gram buckets so the oracle can
    * recompute every count exactly — swapping in `graft_token_hashes`
    * buckets changes one projection, not the shape.
    *
    * Scale story: one groupBy on the word (vocabulary-bounded — with
    * hashed features a FIXED 10⁴ buckets regardless of corpus size),
    * the per-word log-ratios broadcast back onto the token stream
    * (the model is small by construction; never a shuffle of the
    * corpus against itself), one groupBy doc_id. At 100 TB that is
    * two map-side-combinable aggregations and one broadcast join. */
  def dsirSelectQuery(s: SparkSession, d: String): DataFrame = {
    val target = Seq("src0", "src1", "src2", "src3") // the wanted slice
    val docs = Tables.load(s, d, "documents").select("doc_id", "text", "source")
    val toks = docs
      .select(col("doc_id"), col("source"),
        explode(expr("filter(split(text, ' '), x -> x <> '')")).as("w"))
    val inT = col("source").isin(target: _*)
    val counts = toks.groupBy("w").agg(
      sum(when(inT, 1L).otherwise(0L)).as("ct"),
      sum(when(inT, 0L).otherwise(1L)).as("cr"))
    val totals = counts.agg(
      count(lit(1)).as("v"), sum("ct").as("tt"), sum("cr").as("rt"))
    // Laplace-smoothed log ratio per word; totals ride a one-row
    // broadcast, the per-word model broadcasts onto the token stream
    val ratios = counts.crossJoin(broadcast(totals))
      .select(col("w"),
        (log((col("ct") + lit(1.0)) / (col("tt") + col("v"))) -
          log((col("cr") + lit(1.0)) / (col("rt") + col("v")))).as("lr"))
    // orderBy+limit plans as TakeOrderedAndProject (distributed
    // top-k, no global sort); the rank window then runs over the 50
    // survivors only — never a single-partition pass over the corpus
    toks.filter(!inT)
      .join(broadcast(ratios), Seq("w"))
      .groupBy("doc_id").agg(round(sum("lr"), 6).as("dsir_score"))
      .orderBy(col("dsir_score").desc, col("doc_id"))
      .limit(50)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("dsir_score").desc, col("doc_id"))).cast("long"))
      .select("doc_id", "dsir_score", "rk")
      .orderBy("rk")
  }

  /** L17: CCNet perplexity bucketing (Wenzek et al. 2020, "CCNet:
    * Extracting high quality monolingual datasets from web crawl
    * data") — the paper's central move: score every document by LM
    * perplexity, then split EACH LANGUAGE into head / middle / tail
    * thirds by perplexity rank (head = most fluent third, the slice
    * that trains; tail = the crawl noise that gets dropped or
    * down-weighted). The LM is [[bigramLmScore]] — mean bigram
    * log-prob, the repo's n-gram stand-in for the paper's
    * Kneser-Ney model — so head = HIGHEST lm_score.
    *
    * Determinism: rank on the ROUNDED score with doc_id tie-break
    * (the repo-wide ranking contract) and tercile boundaries in
    * INTEGER arithmetic (3·rank ≤ n, 3·rank ≤ 2n — never a float
    * quantile), so bucket membership is bit-identical cross-engine
    * and the whole query is hash-green.
    *
    * Scale: the per-language rank is a window over the language
    * partition — exact, as the oracle needs. At true corpus scale a
    * language shard outgrows one partition; the production variant is
    * the paper's own: derive the two cutoff scores per language from
    * a sampled histogram (one tiny aggregate, broadcast back), and
    * bucket assignment becomes a map-only comparison. Same output
    * contract, approximate boundaries — this query keeps the exact
    * form precisely because the boundaries themselves are the
    * verification surface. */
  def ccnetBucketsQuery(s: SparkSession, d: String): DataFrame = {
    val scored = bigramLmScore(s, d).select("doc_id", "lm_score")
    val docs = Tables.load(s, d, "documents").select("doc_id", "lang")
    val w = Window.partitionBy("lang")
      .orderBy(col("lm_score").desc, col("doc_id"))
    scored.join(docs, Seq("doc_id"))
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
      .withColumn("bucket",
        when(col("rk") * 3 <= col("n"), "head")
          .when(col("rk") * 3 <= col("n") * 2, "middle")
          .otherwise("tail"))
      .groupBy("lang", "bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("doc_id").as("sum_doc_id"),
        round(sum("lm_score"), 4).as("sum_score"),
        min("lm_score").as("cutoff_score"))
      .orderBy("lang", "bucket")
  }

  /** PRODUCTION CCNet bucketing (round-11 "missing" #4): the paper's
    * own at-scale variant — per-language cutoff SCORES derived from a
    * sample's rank histogram (one tiny aggregate, broadcast back),
    * bucket assignment a map-only score comparison. The exact
    * per-language window of [[ccnetBucketsQuery]] stops scaling when
    * one language outgrows a partition; the sampled form never
    * shuffles the corpus at all.
    *
    * Gate (the proven exact-side + boolean pattern): per language,
    * the EXACT tercile counts ride the row (oracle-replayable
    * bit-for-bit — same rounded score, same integer-arithmetic
    * boundaries), and the sampled path contributes
    * `agree_floor_met`: sampled and exact assignments agree on at
    * least `floor` of the language's documents. The sample is
    * deterministic (doc_id parity — rand() is banned and the oracle
    * must replay it); 1-in-2 at test scale so the smallest language
    * still estimates its cutoffs from tens of points (measured
    * agreement 0.88–0.99 across sf0.001/0.01/0.1 — the production
    * knob is the rate, the shape is identical at 1-in-10⁴). */
  def ccnetBucketsSampledQuery(
      s: SparkSession, d: String, floor: Double = 0.8): DataFrame = {
    val scored = bigramLmScore(s, d).select("doc_id", "lm_score")
    val docs = Tables.load(s, d, "documents").select("doc_id", "lang")
    val joined = scored.join(docs, Seq("doc_id"))
    val w = Window.partitionBy("lang")
      .orderBy(col("lm_score").desc, col("doc_id"))
    val exact = joined
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
      .withColumn("bucket_exact",
        when(col("rk") * 3 <= col("n"), "head")
          .when(col("rk") * 3 <= col("n") * 2, "middle")
          .otherwise("tail"))
    // sampled cutoffs: the 1-in-2 sample's own tercile boundary
    // scores per language — at production scale this window runs over
    // the SAMPLE (bounded), and the corpus-side assignment below is
    // map-only against the broadcast cutoffs
    val cut = joined.filter(pmod(col("doc_id"), lit(2L)) === 1L)
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
      .groupBy("lang")
      .agg(
        min(when(col("rk") * 3 <= col("n"), col("lm_score"))).as("head_cut"),
        min(when(col("rk") * 3 <= col("n") * 2, col("lm_score"))).as("mid_cut"))
    exact.join(broadcast(cut), Seq("lang"), "left")
      .withColumn("bucket_sampled",
        when(col("head_cut").isNotNull && col("lm_score") >= col("head_cut"),
          "head")
          .when(col("mid_cut").isNotNull && col("lm_score") >= col("mid_cut"),
            "middle")
          .otherwise("tail"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("bucket_exact") === "head", 1L).otherwise(0L)).as("n_head"),
        sum(when(col("bucket_exact") === "middle", 1L).otherwise(0L)).as("n_middle"),
        sum(when(col("bucket_exact") === "tail", 1L).otherwise(0L)).as("n_tail"),
        (sum(when(col("bucket_sampled") === col("bucket_exact"), 1L)
          .otherwise(0L)).cast("double") >= lit(floor) * count(lit(1)))
          .as("agree_floor_met"))
      .orderBy("lang")
  }

  /** L21 BPE MERGE INDUCTION — the tokenizer-TRAINING half every
    * data pipeline runs before token counting (Sennrich et al. 2016,
    * "Neural Machine Translation of Rare Words with Subword Units"):
    * `iters` rounds of count-adjacent-symbol-pairs → merge the most
    * frequent pair, over the corpus WORD VOCABULARY (word, count).
    * The corpus pays exactly ONE word-count aggregation; every
    * iteration then runs on the |vocab|-sized frame — at 100 TB the
    * loop cost is bounded by vocabulary size, not data size (the
    * classical trainer's trick, kept intact under Spark).
    *
    * Within-word application is greedy leftmost, as ONE window pass:
    * overlapping candidate starts only arise for self-pairs (`aa` in
    * `aaaa` — for left≠right a start at p forbids one at p+1 by
    * construction), and within each island of CONSECUTIVE starts
    * (pos − row_number groups) the even offsets are exactly the
    * sequential scan's choices. Pair selection tie-breaks on
    * (count DESC, left ASC, right ASC); tokens are ASCII from the
    * `[a-z]+` word filter, so ordering agrees cross-engine. The
    * per-round best pair is a ONE-ROW collect — the broadcast-scalar
    * posture the stream-join sentinel established — and each round's
    * vocab frame is persisted AND plan-flattened to a single
    * `LogicalRDD` leaf, so plan size stays O(1) per round (the next
    * round's frame references the previous one ~5×; without the
    * flatten the plan grows ~5^iters and a real merge schedule —
    * 10³–10⁴ rounds — would OOM the driver on plan strings alone). */
  def bpeTrainMergesFrom(docs: DataFrame, iters: Int): DataFrame = {
    val s = docs.sparkSession
    val (merges, last) = bpeTrainLoop(docs, iters)
    last.release() // this entry point owns the final vocab frame
    import s.implicits._
    merges.toDF("iter", "merge_left", "merge_right", "pair_n").orderBy("iter")
  }

  /** L21b — ENCODE the corpus with the merges [[bpeTrainMergesFrom]]
    * learned: the final per-word tokenization weighted back by word
    * counts gives the corpus SUBWORD HISTOGRAM (what the embedding
    * table will actually see — the sanity read every tokenizer
    * training run ends with). Same vocabulary-bounded loop; the
    * histogram is one |vocab|-frame aggregate. */
  def bpeEncodeTokens(s: SparkSession, d: String): DataFrame = {
    val (_, toks) = bpeTrainShared(s, d)
    toks.frame.groupBy("tok").agg(sum("cnt").as("n"))
      .orderBy(desc("n"), asc("tok")).limit(20)
  }

  /** One trained-round vocab frame: `frame` is the plan-flattened view
    * (a single `LogicalRDD` leaf over the persisted blocks — reading
    * it never replays prior rounds' plans), `cached` is the persisted
    * frame that owns those blocks. Callers release via [[release]];
    * `frame.unpersist()` would be a silent no-op (its plan is not the
    * one registered with the cache manager). */
  private[graft] final case class BpeVocab(frame: DataFrame, cached: DataFrame) {
    def release(): Unit = { cached.unpersist(); () }
  }

  private[graft] def bpeTrainLoop(docs: DataFrame, iters: Int)
      : (Seq[(Int, String, String, Long)], BpeVocab) = {
    val words = docs
      .select(explode(
        expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val byPos = Window.partitionBy("w").orderBy("pos")
    // persist+count, THEN flatten the plan to one LogicalRDD leaf
    // (createDataFrame over the cached frame's row RDD): persist alone
    // does NOT truncate the logical plan, and each round's frame embeds
    // ~5 copies of the previous round's (`p` appears in `merged`, twice
    // in `carried`'s anti-joins, and in `kept`) — unflattened, plan
    // size is ~5^iters and explain/analysis OOMs by round 4. Blocks
    // are still explicitly released via BpeVocab.release once a round
    // is superseded (the FINAL frame's in clearSharedCaches), keeping
    // COLD-mode memory attribution exact — the reason this is not
    // localCheckpoint, whose blocks linger until ContextCleaner GC.
    def staged(d: DataFrame): BpeVocab = {
      val c = d.persist(); c.count()
      BpeVocab(c.sparkSession.createDataFrame(c.rdd, c.schema), c)
    }
    var toks = staged(words
      .select(col("w"), col("cnt"), posexplode(split(col("w"), "")))
      .toDF("w", "cnt", "pos", "tok")
      .filter(length(col("tok")) > 0)) // split("") vintage-proof
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var it = 1
    var exhausted = false
    while (it <= iters && !exhausted) {
      val p = staged(toks.frame.withColumn("nxt", lead("tok", 1).over(byPos)))
      val best = p.frame.filter(col("nxt").isNotNull)
        .groupBy("tok", "nxt").agg(sum("cnt").as("n"))
        .orderBy(desc("n"), asc("tok"), asc("nxt"))
        .limit(1).collect() // one row — the round's merge decision
      if (best.isEmpty) {
        // vocabulary fully merged — no adjacent pair remains; stop
        // early instead of indexing into an empty round. The SQL
        // oracle's empty b_k CTEs emit no row for the same rounds, so
        // early-stop keeps the engines' merge tables identical.
        p.release()
        exhausted = true
      } else {
        val (l, r, n) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((it, l, r, n))
        // greedy-leftmost merge starts: alternate inside islands of
        // consecutive start positions (self-pair runs), keep the rest
        val kept = p.frame.filter(col("tok") === l && col("nxt") === r)
          .withColumn("grp", col("pos") - row_number().over(byPos))
          .withColumn("off",
            col("pos") - min("pos").over(Window.partitionBy("w", "grp")))
          .filter(col("off") % 2 === 0)
          .select("w", "pos")
        val merged = p.frame.join(kept, Seq("w", "pos"))
          .select(col("w"), col("cnt"), col("pos"),
            concat(col("tok"), col("nxt")).as("tok"))
        val carried = p.frame
          .join(kept, Seq("w", "pos"), "left_anti")
          .join(kept.select(col("w"), (col("pos") + 1).as("pos")),
            Seq("w", "pos"), "left_anti")
          .select("w", "cnt", "pos", "tok")
        val next = staged(merged.unionByName(carried)
          .withColumn("pos", row_number().over(byPos) - 1))
        toks.release()
        p.release()
        toks = next
        it += 1
      }
    }
    (merges.result(), toks)
  }

  /** Driver query: 3 BPE merge rounds over `documents`. */
  def bpeTrainMerges(s: SparkSession, d: String): DataFrame = {
    val (merges, _) = bpeTrainShared(s, d)
    import s.implicits._
    merges.toDF("iter", "merge_left", "merge_right", "pair_n").orderBy("iter")
  }

  /** The trained loop, memoized per (session, sfDir) — `bpe_train_merges`
    * and `bpe_encode` both consume it, and the final vocab frame is
    * persisted + plan-flattened (materialized), so the loop runs once
    * per run: the same sanctioned materialized-view stand-in as Dedup's
    * pair frame (at 100 TB the trained merge table IS a published
    * artifact every encode job reads). Built unbenched by the
    * harnesses' prestage pass; COLD mode clears it per query. */
  private[graft] def bpeTrainShared(
      s: SparkSession, d: String): (Seq[(Int, String, String, Long)], BpeVocab) = {
    bpeCache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    bpeCache.computeIfAbsent((s, d),
      _ => bpeTrainLoop(Tables.load(s, d, "documents"), iters = 3))
  }

  def prestageShared(s: SparkSession, d: String): Unit = { bpeTrainShared(s, d); () }
  def clearSharedCaches(): Unit = {
    // release the final vocab frame's blocks like the sibling caches
    // (intermediate rounds already release inside the loop)
    bpeCache.values.forEach { case (_, toks) => toks.release() }
    bpeCache.clear()
  }

  private val bpeCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (Seq[(Int, String, String, Long)], BpeVocab)]()
}
