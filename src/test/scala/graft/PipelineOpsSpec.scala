package graft

import graft.etl.Preprocess
import graft.llm.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the training-pipeline prep operators added in round
  * 4: chunking, importance resampling, repetition signals, PII scrub. */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val dir = "/root/testdata/sf0.001"

  test("doc_chunking: chunks tile every document with stride-48 windows") {
    val chunks = Preprocess.docChunking(spark, dir)
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
    // per doc: first chunk starts at 1, consecutive starts differ by
    // 48, every chunk but the last has exactly 64 tokens, and the
    // windows cover all n tokens (last start + last size = n + 1... )
    val byDoc = chunks.groupBy("doc_id")
      .agg(min("start_tok").as("first_start"), max("start_tok").as("last_start"),
        count(lit(1)).as("n_chunks"), min("n_chunk_tokens").as("min_len"),
        max("n_chunk_tokens").as("max_len"),
        max(col("start_tok") + col("n_chunk_tokens") - 1).as("covered"))
      .join(docs, "doc_id")
    assert(byDoc.filter(col("first_start") =!= 1).count() === 0)
    assert(byDoc.filter(col("max_len") > 64).count() === 0)
    assert(byDoc.filter(col("covered") =!= col("n")).count() === 0)
    assert(byDoc.filter(
      col("last_start") =!= (col("n_chunks") - 1) * 48 + 1).count() === 0)
    // overlap really happens: some doc has > 1 chunk
    assert(byDoc.filter(col("n_chunks") > 1).count() > 0)
  }

  test("importance_sample: every group thinned to at most ~target, never grown") {
    val out = Preprocess.importanceSample(spark, dir).collect()
    assert(out.length > 1)
    val targetN = out.head.getAs[Long]("target_n")
    out.foreach { r =>
      assert(r.getAs[Long]("n_sampled") <= r.getAs[Long]("n_source"))
      // hash-Bernoulli at rate target/n keeps the expectation at
      // target; allow wide tolerance for the binomial spread
      val expected = targetN.toDouble
      assert(math.abs(r.getAs[Long]("n_sampled") - expected) <= 3 * math.sqrt(expected) + 5,
        s"lang ${r.getAs[String]("lang")} sampled far from target")
    }
    // the smallest group is kept whole: rate 1 accepts every hash
    assert(out.exists(r => r.getAs[Long]("n_source") === targetN &&
      r.getAs[Long]("n_sampled") === targetN))
  }

  test("repetition_signals: counts are consistent and runs detected exactly") {
    val out = TextAnalysis.repetitionSignals(spark, dir)
    assert(out.filter(col("n_distinct") > col("n_bigrams")).count() === 0)
    assert(out.filter(col("top_count") > col("n_bigrams") - col("n_distinct") + 1)
      .count() === 0)
    assert(out.filter(col("max_run") < 1).count() === 0)
    // cross-check max_run against a driver-side scan on a sample
    val sample = Tables.load(spark, dir, "documents")
      .filter(col("doc_id") < 50).select("doc_id", "text").collect()
    val expected = sample.map { r =>
      val toks = r.getAs[String]("text").split(" ", -1)
      var best = 1; var run = 1
      toks.sliding(2).foreach { w =>
        if (w.length == 2 && w(0) == w(1)) { run += 1; best = math.max(best, run) }
        else run = 1
      }
      r.getAs[Long]("doc_id") -> best
    }.toMap
    out.filter(col("doc_id") < 50).collect().foreach { r =>
      assert(r.getAs[Int]("max_run") === expected(r.getAs[Long]("doc_id")),
        s"doc ${r.getAs[Long]("doc_id")} max_run")
    }
  }

  test("padding_waste: bucketed batching never wastes more than naive") {
    val rows = Preprocess.paddingWaste(spark, dir).collect()
      .map(r => r.getAs[String]("strategy") -> r).toMap
    assert(rows.keySet === Set("naive", "bucketed"))
    val (n, b) = (rows("naive"), rows("bucketed"))
    // identical real token mass; padding differs only by composition
    assert(n.getAs[Long]("total_tokens") === b.getAs[Long]("total_tokens"))
    assert(b.getAs[Long]("waste_tokens") <= n.getAs[Long]("waste_tokens"))
    rows.values.foreach { r =>
      assert(r.getAs[Long]("padded_tokens") >= r.getAs[Long]("total_tokens"))
      assert(r.getAs[Long]("waste_tokens") ===
        r.getAs[Long]("padded_tokens") - r.getAs[Long]("total_tokens"))
    }
  }

  test("split_leakage_audit: hash split leaks near-dup pairs across splits") {
    import graft.llm.Dedup
    val out = Dedup.splitLeakageAudit(spark, dir).collect()
    assert(out.nonEmpty)
    // the leaky flag is exactly split_a != split_b
    out.foreach { r =>
      val cross = r.getAs[String]("split_a") != r.getAs[String]("split_b")
      assert(r.getAs[Int]("leaky") === (if (cross) 1 else 0))
    }
    // near-dups hash independently, so SOME pair must straddle splits
    assert(out.filter(_.getAs[Int]("leaky") === 1).map(_.getAs[Long]("n_pairs")).sum > 0)
    // unordered combos: split_a <= split_b always
    out.foreach(r => assert(r.getAs[String]("split_a") <= r.getAs[String]("split_b")))
  }

  test("token_budget_select: selection fits the budget and is quality-prefix") {
    val out = TextAnalysis.tokenBudgetSelect(spark, dir).collect()
    assert(out.nonEmpty)
    val total = Tables.load(spark, dir, "documents")
      .agg(sum(size(split(col("text"), " ")).cast("long"))).head().getLong(0)
    val selected = out.map(_.getAs[Long]("tokens_selected")).sum
    assert(selected <= total / 4)
    // greedy by quality: adding the next-best doc must overflow —
    // selection is maximal for the prefix rule (within one doc's size)
    val qd = TextAnalysis.textQuality(spark, dir)
      .select(col("n_tokens"), col("quality"), col("doc_id")).collect()
      .sortBy(r => (-r.getAs[Double]("quality"), r.getAs[Long]("doc_id")))
    var cum = 0L; var n = 0
    qd.foreach { r =>
      if (cum + r.getAs[Int]("n_tokens") <= total / 4) {
        cum += r.getAs[Int]("n_tokens"); n += 1
      }
    }
    // the driver-side greedy STOPS at the first overflow (prefix
    // rule), so re-walk exactly the oracle semantics: cum <= budget
    var cum2 = 0L; var n2 = 0
    var done = false
    qd.foreach { r =>
      cum2 += r.getAs[Int]("n_tokens")
      if (cum2 <= total / 4 && !done) n2 += 1 else done = true
    }
    assert(out.map(_.getAs[Long]("n_selected")).sum === n2)
    assert(selected > 0)
  }

  test("vocab_coverage: coverage is monotone in k and bounded by 1") {
    val out = TextAnalysis.vocabCoverage(spark, dir).collect()
      .sortBy(_.getAs[Int]("k"))
    assert(out.length === 3)
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("coverage") <= b.getAs[Double]("coverage"))
        assert(a.getAs[Long]("covered_tokens") <= b.getAs[Long]("covered_tokens"))
      case _ =>
    }
    out.foreach { r =>
      assert(r.getAs[Double]("coverage") <= 1.0)
      assert(r.getAs[Long]("n_types") <= r.getAs[Int]("k"))
      assert(r.getAs[Long]("total_tokens") === out.head.getAs[Long]("total_tokens"))
    }
  }

  test("incremental_ingest_dedup: store grows by novel bands; re-drop fully rejected") {
    import graft.llm.Dedup
    val out = Dedup.incrementalIngestDedup(spark, dir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // decisions partition the batch
    assert(rows.forall(r => (r.getAs[Int]("dup") == 1) ==
      (r.getAs[Long]("n_partners") > 0)))
    val novel = rows.count(_.getAs[Int]("dup") == 0)
    // the signature store holds existing + novel bands (4 bands/doc)
    val path = s"/tmp/graft_sigstore_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val store = graft.sources.LakeTable.read(spark, path)
    val nExisting = Tables.load(spark, dir, "documents").count()
    assert(store.count() === (nExisting + novel) * 4)
    // a SECOND drop of the same arrivals must match the store 100%:
    // every doc now shares all four bands with its first-drop copy...
    // except it landed under the same doc_ids, so instead assert the
    // store now rejects the original corpus' variants via re-probe
    val arrivals = Tables.load(spark, dir, "documents")
      .select((org.apache.spark.sql.functions.col("doc_id") + 1000000L).as("doc_id"),
        org.apache.spark.sql.functions.regexp_replace(
          org.apache.spark.sql.functions.col("text"), "^\\S+ ", "").as("text"))
    val reprobe = Dedup.bandFrame(arrivals).select("doc_id", "band", "band_key")
      .as("n")
      .join(store.as("e"),
        col("n.band") === col("e.band") && col("n.band_key") === col("e.band_key"))
      .select(col("n.doc_id")).distinct().count()
    assert(reprobe === arrivals.count()) // every re-dropped doc matches now
  }

  test("pii_scrub: scrubbed text contains no remaining pattern matches") {
    val out = TextAnalysis.piiScrub(spark, dir)
    val residue = out.filter(
      col("scrubbed").rlike("[a-z0-9]+@[a-z0-9.]+") ||
        col("scrubbed").rlike("555-[0-9]{4}") ||
        col("scrubbed").rlike("10\\.[0-9]+\\.[0-9]+\\.[0-9]+"))
    assert(residue.count() === 0)
    // injection actually planted PII and the detector saw it
    assert(out.filter(col("n_emails") > 0).count() > 0)
    assert(out.filter(col("n_phones") > 0).count() > 0)
    assert(out.filter(col("n_ips") > 0).count() > 0)
    // length accounting: scrubbing only ever shortens or keeps length
    // when a replacement tag is shorter than the span it replaces;
    // unscrubbed docs keep their exact length
    assert(out.filter(col("n_emails") === 0 && col("n_phones") === 0 &&
      col("n_ips") === 0 && col("len_scrubbed") =!= col("len_raw")).count() === 0)
  }

  test("normalized_dedup: restyled text collapses onto its original") {
    import spark.implicits._
    import graft.llm.Dedup
    val tmp = "/tmp/graft_test/norm_dedup"
    Seq(
      (1L, "hello world foo", "en", "s", 15L),
      (2L, "unique text here", "en", "s", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // the query manufactures "Hello world foo ." / "Unique text here ."
    // variants itself; normalization must fold them back
    val got = Dedup.normalizedDedup(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_copies")).toMap
    assert(got === Map(1L -> 2, 2L -> 2), s"got $got")
    // and genuinely different docs never merge: 2 groups, not 1
    assert(got.size === 2)
  }

  test("quality_logit: keep agrees with the sign of the logit, p in (0,1)") {
    val out = TextAnalysis.qualityLogit(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (z, p, keep) = (r.getAs[Double]("logit"), r.getAs[Double]("p_keep"),
        r.getAs[Boolean]("keep"))
      assert(p > 0.0 && p < 1.0, s"p out of range: $p")
      assert(keep === (z >= 0.0), s"keep/logit disagree: z=$z keep=$keep")
      // σ(z) ≥ 1/2 exactly when z ≥ 0 (both already rounded to 6)
      assert(keep === (p >= 0.5), s"keep/p disagree: p=$p keep=$keep")
    }
  }

  test("k_anonymity_audit: groups below k are flagged, others are not") {
    import spark.implicits._
    val tmp = "/tmp/graft_test/k_anon"
    val rows = (1L to 5L).map(i => (i, s"t$i", "en", "big", 10L)) :+
      ((6L, "t6", "zh", "small", 10L)) // singleton group → at risk
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = ops.Relational.kAnonymityAudit(spark, tmp).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Boolean]("at_risk")))).toMap
    assert(got === Map(("en", "big") -> ((5L, false)), ("zh", "small") -> ((1L, true))),
      s"got $got")
  }

  test("curation_funnel: monotone retention, splits partition the final stage") {
    import graft.llm.Curation
    val got = Curation.curationFunnel(spark, dir).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_docs")).toMap
    assert(got("s0_raw") > got("s1_exact_dedup"), s"restyled copies must collapse: $got")
    assert(got("s1_exact_dedup") > got("s2_near_dedup"), s"near-dups must collapse: $got")
    assert(got("s2_near_dedup") >= got("s3_quality"), s"gate only removes: $got")
    val splits = got.view.filterKeys(_.startsWith("s4_")).values.sum
    assert(splits === got("s3_quality"), s"splits must partition s3: $got")
  }

  test("mixture_plan: shares sum to 1, rates capped at 1, big groups thinned hardest") {
    val rows = Preprocess.mixturePlan(spark, dir).collect()
    assert(rows.length > 1)
    val shareSum = rows.map(_.getAs[Double]("current_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"shares sum to $shareSum")
    rows.foreach { r =>
      val rate = r.getAs[Double]("sample_rate")
      assert(rate > 0.0 && rate <= 1.0, s"rate out of range: $rate")
    }
    // ordering: a group with more tokens never gets a HIGHER keep rate
    val byTokens = rows.sortBy(_.getAs[Long]("n_tokens"))
    byTokens.sliding(2).foreach {
      case Array(small, big) =>
        assert(big.getAs[Double]("sample_rate") <= small.getAs[Double]("sample_rate") + 1e-9)
      case _ =>
    }
  }

  test("source_overlap_matrix: matrix mass equals the pair count exactly") {
    import graft.llm.Dedup
    val matrix = Dedup.sourceOverlapMatrix(spark, dir).collect()
    val mass = matrix.map(_.getAs[Long]("n_pairs")).sum
    val pairs = Dedup.minhashNearDupQuery(spark, dir).count()
    assert(mass === pairs, s"matrix mass $mass != pair count $pairs")
    assert(matrix.forall { r =>
      r.getAs[String]("source_a") <= r.getAs[String]("source_b")
    }, "matrix keys must be (least, greatest)-canonical")
  }

  test("dup_ngram_frac: shared 5-grams counted exactly, short docs report zero") {
    import spark.implicits._
    val tmp = "/tmp/graft_test/dup_ngram"
    Seq(
      (1L, "a b c d e f", "en", "s", 11L), // shares "a b c d e" with doc 2
      (2L, "z a b c d e", "en", "s", 11L),
      (3L, "p q r s t u", "en", "s", 11L), // all shingles unique
      (4L, "x y", "en", "s", 3L)) // < 5 tokens: no shingles at all
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextAnalysis.dupNgramFrac(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_shingles"), r.getAs[Int]("n_dup"),
          r.getAs[Double]("dup_frac")))).toMap
    assert(got === Map(
      1L -> ((2, 1, 0.5)), 2L -> ((2, 1, 0.5)),
      3L -> ((2, 0, 0.0)), 4L -> ((0, 0, 0.0))), s"got $got")
  }

  test("exact_substring_spans: overlapping windows coalesce, within-doc repeats count, separated spans stay separate") {
    import spark.implicits._
    val tmp = "/tmp/graft_test/exact_substr"
    val mid = (1 to 14).map(i => s"u$i").mkString(" ")
    Seq(
      // docs 1/2 share two overlapping 8-token windows -> ONE span
      (1L, "a b c d e f g h i j", "en", "s", 1L),
      (2L, "z a b c d e f g h i", "en", "s", 1L),
      // doc 3: within-doc repetition (both windows identical)
      (3L, "w w w w w w w w w", "en", "s", 1L),
      // doc 4: two duplicated regions separated by 14 unique tokens
      (4L, s"a b c d e f g h $mid w w w w w w w w", "en", "s", 1L),
      (5L, "x y", "en", "s", 1L)) // too short for any window
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextAnalysis.exactSubstringSpans(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_tokens"), r.getAs[Int]("n_spans"),
          r.getAs[Int]("dup_tokens"), r.getAs[Int]("longest_span"),
          r.getAs[Double]("dup_frac")))).toMap
    assert(got === Map(
      1L -> ((10, 1, 9, 9, 0.9)),
      2L -> ((10, 1, 9, 9, 0.9)),
      3L -> ((9, 1, 9, 9, 1.0)),
      4L -> ((30, 2, 16, 8, 0.533333)),
      5L -> ((2, 0, 0, 0, 0.0))), s"got $got")
  }

  test("exact_substring_cut: spans at doc start/end, adjacent spans, all-duplicated doc") {
    import spark.implicits._
    val tmp = "/tmp/graft_test/exact_substr_cut"
    val mid = (1 to 14).map(i => s"u$i").mkString(" ")
    val pRun = (1 to 8).map(i => s"p$i").mkString(" ")
    val qRun = (1 to 8).map(i => s"q$i").mkString(" ")
    Seq(
      // docs 1/2: the shared run sits at doc 1's START and doc 2's END
      (1L, "a b c d e f g h i j", "en", "s", 1L),
      (2L, "z a b c d e f g h i", "en", "s", 1L),
      // doc 3: fully duplicated (its two windows are identical) —
      // the cut collapses it to the empty string
      (3L, "w w w w w w w w w", "en", "s", 1L),
      // doc 4: two duplicated regions bracketing 14 unique tokens
      (4L, s"a b c d e f g h $mid w w w w w w w w", "en", "s", 1L),
      (5L, "x y", "en", "s", 1L), // too short for any window: kept whole
      // docs 6/7/8: ADJACENT spans — doc 6's p-run and q-run touch
      // ([1..8] and [9..16]); the covered sets union seamlessly and
      // only the trailing token survives
      (6L, s"$pRun $qRun t", "en", "s", 1L),
      (7L, s"$pRun r", "en", "s", 1L),
      (8L, s"$qRun r2", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextAnalysis.exactSubstringCut(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_tokens"), r.getAs[Int]("kept_tokens"),
          r.getAs[String]("clean_text")))).toMap
    assert(got === Map(
      1L -> ((10, 1, "j")),
      2L -> ((10, 1, "z")),
      3L -> ((9, 0, "")),
      4L -> ((30, 14, mid)),
      5L -> ((2, 2, "x y")),
      6L -> ((17, 1, "t")),
      7L -> ((9, 1, "r")),
      8L -> ((9, 1, "r2"))), s"got $got")
  }

  test("dsir_select: target slice excluded, top-50 descending, raw-pool ranks dense") {
    val out = TextAnalysis.dsirSelectQuery(spark, dir).collect()
    assert(out.length === 50)
    assert(out.map(_.getAs[Long]("rk")).toSeq === (1L to 50L),
      "ranks must be dense 1..50")
    val scores = out.map(_.getAs[Double]("dsir_score")).toSeq
    assert(scores === scores.sorted.reverse, "scores must be non-increasing by rank")
    // the selection scores the RAW pool only — no target-slice doc may appear
    val targetIds = Tables.load(spark, dir, "documents")
      .filter(col("source").isin("src0", "src1", "src2", "src3"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!out.exists(r => targetIds(r.getAs[Long]("doc_id"))),
      "DSIR selects FROM the raw pool; target docs must not select themselves")
    // sanity on the importance direction: a selected doc must score
    // strictly above the raw pool's median (top-50 of ~400 raw docs)
    val all = TextAnalysis.dsirSelectQuery(spark, dir) // deterministic re-run
    assert(all.collect().map(_.getAs[Double]("dsir_score")).min >=
      scores.last, "re-run must reproduce the same cut (deterministic)")
  }

  test("ccnet_buckets: integer terciles per language, fluency ordered") {
    val out = TextAnalysis.ccnetBucketsQuery(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("bucket"),
        r.getAs[Long]("n_docs"), r.getAs[Double]("cutoff_score")))
    val byLang = out.groupBy(_._1)
    assert(byLang.nonEmpty)
    byLang.foreach { case (lang, rows) =>
      val n = rows.map(_._3).sum
      def sz(b: String) = rows.find(_._2 == b).map(_._3).getOrElse(0L)
      // 3·rank ≤ n / 3·rank ≤ 2n boundaries ⇒ exact integer tercile sizes
      assert(sz("head") === n / 3, s"$lang head")
      assert(sz("middle") === 2 * n / 3 - n / 3, s"$lang middle")
      assert(sz("tail") === n - 2 * n / 3, s"$lang tail")
      // head = most fluent third: its WORST score still beats the
      // middle's worst, which beats the tail's worst
      def cut(b: String) = rows.find(_._2 == b).map(_._4)
      for (h <- cut("head"); m <- cut("middle")) assert(h >= m, lang)
      for (m <- cut("middle"); t <- cut("tail")) assert(m >= t, lang)
    }
  }

  test("ccnet_buckets_sampled: production cutoffs meet the agreement floor") {
    val out = TextAnalysis.ccnetBucketsSampledQuery(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("agree_floor_met"),
        s"sampled cutoffs must agree with the exact terciles: $r")
      // the exact-side counts tile the language exactly
      assert(r.getAs[Long]("n_head") + r.getAs[Long]("n_middle") +
        r.getAs[Long]("n_tail") === r.getAs[Long]("n_docs"), r.toString)
      val n = r.getAs[Long]("n_docs")
      assert(r.getAs[Long]("n_head") === n / 3, r.toString)
    }
  }

  test("domain_caps: no source exceeds the cap; kept docs are the longest") {
    val out = graft.llm.Curation.domainCapsQuery(spark, "/root/testdata/sf0.01", cap = 15)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= 15L,
        s"source ${r.getString(0)} exceeds the cap")
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped") === 25L,
        "sf0.01 has 25 docs per source")
    }
    // a tighter cap keeps strictly fewer characters (the best-first
    // order means the dropped tail is the shortest)
    val tight = graft.llm.Curation.domainCapsQuery(spark, "/root/testdata/sf0.01", cap = 5)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("kept_chars")).toMap
    out.foreach(r => assert(tight(r.getString(0)) < r.getAs[Long]("kept_chars")))
  }

  test("mixture sampling: T=2 quotas flatten the mix, integer-exact") {
    val out = graft.llm.Curation.mixtureSamplingQuery(
      spark, "/root/testdata/sf0.01", budget = 40L).collect()
    assert(out.nonEmpty)
    val totW = out.map(_.getAs[Long]("weight")).sum
    out.foreach { r =>
      val (cnt, w, quota, kept) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("weight"), r.getAs[Long]("quota"),
        r.getAs[Long]("n_kept"))
      assert(w === math.floor(math.sqrt(cnt.toDouble)).toLong,
        s"weight must be isqrt(count) for ${r.getString(0)}")
      assert(quota === w * 40L / totW, s"integer quota for ${r.getString(0)}")
      assert(kept === math.min(quota, cnt), "best-first fill up to the quota")
    }
    // flattening: the kept-share of a domain never exceeds what a
    // proportional (T=1) allocation would give it by more than the
    // sqrt compression allows — equal-count domains get equal quotas
    val quotas = out.map(r => r.getAs[Long]("n_docs") -> r.getAs[Long]("quota"))
    quotas.groupBy(_._1).values.foreach(g =>
      assert(g.map(_._2).distinct.length === 1,
        "equal-count domains must draw equal quotas"))
  }

  test("bpe_train_merges: greedy-leftmost merges match the sequential trainer") {
    import spark.implicits._
    // vocab: aaaa×3, aaa×1, ab×1. Round 1: (a,a) n = 3·3 + 2 = 11,
    // applied leftmost-greedy → aaaa = [aa,aa] (NOT [aa,a,a] — the
    // island alternation), aaa = [aa,a]. Round 2: (aa,aa) n = 3.
    // Round 3: (aa,a) and (a,b) tie at 1 — left ASC picks (a,b).
    val docs = Seq("aaaa aaaa aaaa", "aaa ab").toDF("text")
    val m = TextAnalysis.bpeTrainMergesFrom(docs, iters = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq === Seq(
      (1, "a", "a", 11L), (2, "aa", "aa", 3L), (3, "a", "b", 1L)))
    // encode with the learned merges: aaaa→[aaaa]×3, aaa→[aa,a], ab→[ab]
    val (_, toks) = TextAnalysis.bpeTrainLoop(docs, iters = 3)
    val hist = toks.frame.groupBy("tok").agg(sum("cnt").as("n"))
      .orderBy(desc("n"), asc("tok")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    toks.release()
    assert(hist.toSeq === Seq(("aaaa", 3L), ("a", 1L), ("aa", 1L), ("ab", 1L)))
    // a fully-merged vocabulary stops early instead of crashing on an
    // empty round (the SQL oracle's empty b_k emits no row either)
    val short = TextAnalysis.bpeTrainMergesFrom(
      Seq("ab ab").toDF("text"), iters = 3).collect()
    assert(short.length === 1 && short(0).getString(1) === "a"
      && short(0).getString(2) === "b")
  }

  test("bpe merges match a sequential reference trainer on random corpora") {
    import spark.implicits._
    // the classical trainer, written the OBVIOUS sequential way: count
    // adjacent pairs weighted by word count, merge the best pair
    // greedily left-to-right inside each word, repeat — the engine's
    // window-based island alternation must reproduce it exactly,
    // including self-pair runs (the 3-letter alphabet forces them)
    def applyMerge(ts: List[String], l: String, r: String): List[String] =
      ts match {
        case a :: b :: rest if a == l && b == r =>
          (a + b) :: applyMerge(rest, l, r)
        case a :: rest => a :: applyMerge(rest, l, r)
        case Nil => Nil
      }
    def refTrain(
        words: Map[String, Long], iters: Int): Seq[(String, String, Long)] = {
      var vocab: Map[List[String], Long] =
        words.groupMapReduce { case (w, _) => w.split("").toList }(_._2)(_ + _)
      (1 to iters).flatMap { _ =>
        val counts = vocab.toSeq
          .flatMap { case (ts, c) => ts.zip(ts.tail).map(p => p -> c) }
          .groupMapReduce(_._1)(_._2)(_ + _)
        if (counts.isEmpty) None
        else {
          val ((l, r), n) = counts.minBy { case ((a, b), c) => (-c, a, b) }
          vocab = vocab.toSeq
            .map { case (ts, c) => applyMerge(ts, l, r) -> c }
            .groupMapReduce(_._1)(_._2)(_ + _)
          Some((l, r, n))
        }
      }
    }
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val ws = Seq.fill(14)(
        Seq.fill(2 + rnd.nextInt(6))(('a' + rnd.nextInt(3)).toChar).mkString)
      val wordCounts = ws.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      val got = TextAnalysis.bpeTrainMergesFrom(
        Seq(ws.mkString(" ")).toDF("text"), iters = 6).collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
      assert(got === refTrain(wordCounts, 6),
        s"trial $trial diverged from the sequential trainer (words: $ws)")
    }
  }

  test("bpe trainer plan depth stays O(1) per round (lineage flattened)") {
    import spark.implicits._
    // Each round's frame references the previous round's ~5 times; if
    // lineage were not flattened to a LogicalRDD leaf per round the
    // plan would grow ~5^iters (round 4 OOM'd an 8 GB driver building
    // explain strings before the flatten). Train deep enough that an
    // exponential blow-up could not hide, then assert the final vocab
    // frame's analyzed plan is a constant-size leaf — independent of
    // how many rounds ran.
    val docs = Seq("abc abcd abcde bcde cde abab caba bacb acbc").toDF("text")
    val (m3, v3) = TextAnalysis.bpeTrainLoop(docs, iters = 3)
    val (m8, v8) = TextAnalysis.bpeTrainLoop(docs, iters = 8)
    val len3 = v3.frame.queryExecution.analyzed.toString.length
    val len8 = v8.frame.queryExecution.analyzed.toString.length
    v3.release(); v8.release()
    assert(m8.length > m3.length, "corpus must sustain 8 merge rounds")
    assert(m8.take(m3.length) === m3, "deeper training extends, not rewrites")
    assert(len8 <= len3 + 64,
      s"plan grew with rounds: iters=3 -> $len3 chars, iters=8 -> $len8")
    assert(v8.frame.queryExecution.analyzed.collectLeaves().size === 1,
      "final vocab frame must be a single flattened leaf")
  }
}
