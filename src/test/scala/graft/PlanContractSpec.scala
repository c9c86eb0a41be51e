package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan contracts for the scale-critical queries: the shapes
  * SCALE.md promises (broadcast dims, no join explosion, map-only
  * pipelines) are asserted here so a refactor that silently degrades
  * a plan — e.g. a broadcast falling back to SMJ, or a bucket join
  * decaying to a cartesian — fails the suite, not just the bench. */
class PlanContractSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  private def count(p: String, pat: String): Int = pat.r.findAllIn(p).length

  test("lineage read: the id map joins BROADCAST below the plan threshold") {
    import spark.implicits._
    val p = "/tmp/graft_test/plan_lineage"
    SparkSpec.rmdir(p)
    graft.sources.LakeTable.overwrite(
      (0 until 50).map(i => (i.toLong, i * 1.0)).toDF("k", "v"), p)
    graft.sources.LakeTable.enableRowLineage(spark, p)
    val phys = graft.sources.LakeTable.readWithLineage(spark, p)
      .queryExecution.executedPlan.toString
    assert(count(phys, "BroadcastHashJoin") >= 1,
      s"the (file -> id base) map must broadcast:\n${phys.take(400)}")
    assert(count(phys, "SortMergeJoin") === 0,
      s"a lineage read must not shuffle the data on the id map:\n${phys.take(400)}")
  }

  test("embedding_near_dup: bucket EQUI-join, no nested-loop or cartesian") {
    val p = plan("embedding_near_dup")
    assert(count(p, "BroadcastNestedLoopJoin") === 0, p.take(400))
    assert(count(p, "CartesianProduct") === 0)
  }

  test("revenue_by_nation and q5: dimension joins stay broadcast") {
    assert(count(plan("revenue_by_nation"), "BroadcastHashJoin") >= 2)
    assert(count(plan("q5_local_supplier"), "BroadcastHashJoin") >= 1)
    assert(count(plan("q5_local_supplier"), "CartesianProduct") === 0)
  }

  test("range join is an equi-join (bucket explode), not a BNLJ") {
    val p = plan("range_join_quantity")
    assert(count(p, "BroadcastNestedLoopJoin") === 0)
    assert(count(p, "CartesianProduct") === 0)
  }

  test("simhash_docs is map-only: no joins, exchanges only for the output sort") {
    val p = plan("simhash_docs")
    assert(count(p, "Join") === 0, s"simhash must not join:\n${p.take(400)}")
    // loadParallel round-robin + final orderBy range exchange only
    assert(count(p, "Exchange") <= 2, s"simhash grew a shuffle:\n${p.take(400)}")
  }

  test("minhash_signatures: fused native signature, no join, no agg shuffle") {
    val p = plan("minhash_signatures")
    assert(p.contains("graft_minhash_sig"), "native expression missing from plan")
    assert(count(p, "Join") === 0)
  }

  test("as-of native operator is planned as AsOfJoinExec") {
    assert(plan("asof_native").contains("AsOfJoin"))
  }

  test("per-group top-k runs under WindowGroupLimit (rank filter pushed into the sort)") {
    // Spark's InferWindowGroupLimit turns rn <= k into a per-group
    // bounded sort — the difference between sorting every group fully
    // and keeping k rows per group at 100 TB
    assert(plan("top_orders_per_customer").contains("WindowGroupLimit"))
  }

  test("global top-k runs as TakeOrderedAndProject, not a full sort") {
    for (q <- Seq("topk_parts", "q10_returned_items", "q3_shipping_priority"))
      assert(plan(q).contains("TakeOrderedAndProject"), s"$q lost its top-k plan")
  }

  test("lang_id family classifies via broadcast, not a token shuffle join") {
    for (q <- Seq("lang_id", "lang_id_ngram")) {
      val p = plan(q)
      assert(count(p, "SortMergeJoin") === 0, s"$q decayed to SMJ:\n${p.take(400)}")
    }
  }

  test("salted_skew_join: forced shuffle join on (key, salt), dim not broadcast") {
    val p = plan("salted_skew_join")
    assert(count(p, "SortMergeJoin") === 1, s"salt demo needs the shuffle path:\n${p.take(400)}")
    assert(count(p, "CartesianProduct") === 0)
  }

  test("bloom_prune_lineitem: sketch prune sits in the probe scan stage") {
    val p = plan("bloom_prune_lineitem")
    assert(p.contains("might_contain"), "bloom might_contain prune missing from plan")
    assert(count(p, "CartesianProduct") === 0)
    // the exact semi-join stays broadcast (filtered build side is tiny)
    assert(count(p, "SortMergeJoin") === 0, s"bloom probe decayed to SMJ:\n${p.take(400)}")
  }

  test("hash_split is map-only classify + one 3-key aggregation") {
    val p = plan("hash_split")
    assert(count(p, "Join") === 0, s"hash_split must not join:\n${p.take(400)}")
    assert(p.contains("graft_polyhash"), "content hash must be the native expression")
  }

  test("simhash_near_dup: band-bucket EQUI-join, never all-pairs") {
    val p = plan("simhash_near_dup")
    assert(count(p, "BroadcastNestedLoopJoin") === 0, p.take(400))
    assert(count(p, "CartesianProduct") === 0)
    assert(p.contains("bit_count"), "hamming verify must be the codegen'd bit_count")
  }

  test("decontaminate_overlap: benchmark shingles broadcast, corpus side never shuffled for the probe") {
    val p = plan("decontaminate_overlap")
    assert(count(p, "BroadcastHashJoin") >= 1, s"bench side lost its broadcast:\n${p.take(400)}")
    assert(count(p, "CartesianProduct") === 0)
  }

  test("zscore_outliers: per-type moments broadcast back, fact table shuffled at most once") {
    val p = plan("zscore_outliers")
    assert(count(p, "BroadcastHashJoin") === 1, s"stats join must broadcast:\n${p.take(400)}")
    assert(count(p, "SortMergeJoin") === 0)
  }

  test("setsim_join_exact: prefix-token equi-join, never all-pairs") {
    val p = plan("setsim_join_exact")
    assert(count(p, "CartesianProduct") === 0)
    assert(count(p, "BroadcastNestedLoopJoin") === 0, s"set-sim decayed to BNLJ:\n${p.take(400)}")
  }

  test("triangle_count: wedge-close equi-joins only") {
    val p = plan("triangle_count")
    assert(count(p, "CartesianProduct") === 0)
  }

  test("tfidf/bm25: vocabulary-side joins stay broadcast, no SMJ on terms") {
    // the df (vocabulary) and scalar-stats frames are bounded by the
    // token domain / one row — shuffling the corpus-side pairs against
    // them would be the 100 TB mistake
    for (q <- Seq("tfidf_top_terms", "bm25_retrieval")) {
      val p = plan(q)
      assert(count(p, "BroadcastHashJoin") >= 1, s"$q lost its broadcast:\n${p.take(400)}")
      assert(count(p, "SortMergeJoin") === 0, s"$q decayed to SMJ:\n${p.take(400)}")
    }
  }

  test("doc_chunking and pii_scrub stay map-only (no join, no agg shuffle)") {
    for (q <- Seq("doc_chunking", "pii_scrub")) {
      val p = plan(q)
      assert(count(p, "Join") === 0, s"$q grew a join:\n${p.take(400)}")
      assert(count(p, "HashAggregate") === 0, s"$q grew an aggregate:\n${p.take(400)}")
    }
  }

  test("q9: exactly one big-big shuffle join; part/supplier/nation broadcast") {
    val p = plan("q9_product_profit")
    assert(count(p, "BroadcastHashJoin") >= 3, s"q9 dims not broadcast:\n${p.take(400)}")
    assert(count(p, "SortMergeJoin|ShuffledHashJoin") <= 1,
      s"q9 grew extra shuffle joins:\n${p.take(400)}")
    assert(count(p, "CartesianProduct") === 0)
  }

  test("q6: every predicate reaches the parquet scan") {
    val p = plan("q6_forecast_revenue")
    assert(p.contains("PushedFilters: ["), s"q6 lost pushdown:\n${p.take(600)}")
    assert(p.contains("l_shipdate"), "shipdate filter not pushed")
    assert(count(p, "Join") === 0)
  }

  test("vocab_coverage: top-k cut is TakeOrderedAndProject, never a vocab sort") {
    assert(plan("vocab_coverage").contains("TakeOrderedAndProject"))
  }

  test("token_budget_select: windows partitioned by bucket, broadcast prefix") {
    val p = plan("token_budget_select")
    // within-bucket cumsum must be a partitioned window; the bucket
    // frame and budget come back as broadcasts
    assert(count(p, "BroadcastHashJoin|BroadcastNestedLoopJoin") >= 2,
      s"bucket prefix/budget not broadcast:\n${p.take(400)}")
    assert(count(p, "SortMergeJoin") === 0, s"decayed to SMJ:\n${p.take(400)}")
  }

  test("incremental_ingest_dedup: store probe is a band EQUI-join, no cartesian") {
    val p = plan("incremental_ingest_dedup")
    assert(count(p, "CartesianProduct") === 0)
    assert(count(p, "BroadcastNestedLoopJoin") === 0, s"probe decayed:\n${p.take(400)}")
  }

  test("split_leakage_audit: split assignment joins broadcast onto sparse pairs") {
    val p = plan("split_leakage_audit")
    assert(count(p, "CartesianProduct") === 0)
    assert(count(p, "BroadcastHashJoin") >= 2, s"split frames not broadcast:\n${p.take(400)}")
  }

  test("hash_topk_sample: rank filter compiles to WindowGroupLimit") {
    assert(plan("hash_topk_sample").contains("WindowGroupLimit"))
  }

  test("q8: two fact shuffles at most, dims broadcast, no nested loop") {
    val p = plan("q8_market_share")
    assert(count(p, "BroadcastHashJoin") >= 4, s"dims decayed:\n${p.take(400)}")
    assert(count(p, "SortMergeJoin|ShuffledHashJoin") <= 2, s"extra fact shuffle:\n${p.take(400)}")
    assert(count(p, "CartesianProduct|BroadcastNestedLoopJoin") === 0)
  }

  test("q15: scalar max returns as a broadcast, lineitem never sorted globally") {
    val p = plan("q15_top_supplier")
    // rev⋈max and rev⋈supplier both broadcast; no SMJ anywhere
    assert(count(p, "BroadcastHashJoin") >= 1, s"max not broadcast:\n${p.take(400)}")
    assert(count(p, "SortMergeJoin") === 0, s"decayed to SMJ:\n${p.take(400)}")
  }

  test("quality_logit is map-only: no joins, no aggregate exchange") {
    val p = plan("quality_logit")
    assert(count(p, "Join") === 0, s"quality_logit must not join:\n${p.take(400)}")
    // loadParallel round-robin + final orderBy range exchange only
    assert(count(p, "Exchange") <= 2, s"grew a shuffle:\n${p.take(400)}")
  }

  test("dup_ngram_frac and pagerank: shingle/vertex equi-joins only, no cartesian") {
    val pd = plan("dup_ngram_frac")
    assert(count(pd, "CartesianProduct|BroadcastNestedLoopJoin") === 0, pd.take(400))
    val pr = plan("pagerank_near_dup")
    // rank⋈edge joins SHUFFLE on the vertex id (SMJ is the correct
    // 100 TB shape — the rank frame is |V| rows); the only
    // nested-loop allowed is the broadcast single-row |V| cross join
    assert(count(pr, "CartesianProduct") === 0, pr.take(400))
    assert(count(pr, "BroadcastNestedLoopJoin BuildRight, Inner") === 0, pr.take(400))
  }
}
