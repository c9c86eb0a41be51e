package graft.llm

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Input to the decode stage: opaque media bytes + typed metadata. */
final case class MediaIn(doc_id: Long, bytes: Array[Byte], media_type: String)

/** Decoded features — what a real image/audio codec stage would emit. */
final case class MediaFeat(
    doc_id: Long, media_type: String, n_bytes: Int,
    width: Int, height: Int, n_frames: Int)

/** Multimodal column plumbing (SURVEY.md §2.10 L5): media as opaque
  * BinaryType columns with typed metadata, decoded in a per-partition
  * batch pass. `Dataset.mapPartitions` is the Scala analogue of a
  * pandas/Arrow batch UDF: the decoder amortizes any per-partition
  * setup (codec init, model load) across the partition's rows — the
  * genuine imperative-per-partition case (SURVEY.md §7.4) where HOFs
  * don't apply.
  *
  * The decode itself is a clearly-marked deterministic STUB (no image
  * libs in this environment); the Spark-side contract — binary column
  * in, typed feature row out, partition-batched execution — is real
  * and oracle-checked (the stub's arithmetic is SQL-expressible on
  * purpose, so the whole plumbing path gets a DuckDB oracle instead of
  * a weaker rows-only check).
  */
object Multimodal {

  /** STUB decoder — stands in for an image codec. Pure function of the
    * bytes so the pipeline is deterministic and cross-engine checkable:
    * width/height derive from byte length and first byte. A real
    * deployment replaces ONLY this function. */
  private def decodeStub(m: MediaIn): MediaFeat = {
    val n = m.bytes.length
    val first = if (n > 0) m.bytes(0) & 0xff else 0
    MediaFeat(m.doc_id, m.media_type, n, 64 + n % 576, 64 + (first * 7) % 448, 1)
  }

  /** STUB frame sampler — stands in for a video decoder emitting one
    * row per sampled frame (the 1→N decode shape). Frame count and
    * per-frame hash are pure functions of the bytes so the pipeline
    * stays deterministic and cross-engine checkable. */
  private def sampleFramesStub(m: MediaIn): Iterator[(Long, Int, Long)] = {
    val n = m.bytes.length
    val frames = math.min(1 + n / 100, 5)
    val first = if (n > 0) m.bytes(0) & 0xff else 0
    (0 until frames).iterator.map { i =>
      (m.doc_id, i, ((n.toLong * 31 + first) * 37 + i) % 1000000007L)
    }
  }

  /** L5 frame sampling: per-partition batch decode that EXPANDS each
    * media row into its sampled frames — the flatMap form of the
    * decode stage (video → frames, audio → windows). */
  def videoFrameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.loadParallel(s, d, "documents")
      .select(
        col("doc_id"),
        col("text").cast("binary").as("bytes"),
        lit("video/synthetic").as("media_type"))
      .as[MediaIn]
      .mapPartitions(_.flatMap(sampleFramesStub))
      .toDF("doc_id", "frame_idx", "frame_hash")
      .orderBy("doc_id", "frame_idx")
  }

  /** L5 pipeline: documents.text reinterpreted as opaque bytes (the
    * driver ships no true binary table), carried through a typed
    * Dataset and batch-decoded per partition. */
  def multimodalFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.loadParallel(s, d, "documents")
      .select(
        col("doc_id"),
        col("text").cast("binary").as("bytes"),
        lit("image/synthetic").as("media_type"))
      .as[MediaIn]
      .mapPartitions(_.map(decodeStub))
      .toDF()
      .select("doc_id", "media_type", "n_bytes", "width", "height", "n_frames")
      .orderBy("doc_id")
  }

  /** STUB media encoder — stands in for a CLIP-style image/audio
    * embedding model: 8 dimensions, each a seeded byte fold
    * normalized to [0, 1). Pure function of the bytes (deterministic,
    * SQL-expressible), so the retrieval path downstream is
    * hash-checkable; a real deployment replaces ONLY this function
    * with the model forward pass. */
  private def encodeStub(m: MediaIn): (Long, Array[Double]) = {
    val vec = Array.tabulate(8) { j =>
      var a = j.toLong
      var i = 0
      while (i < m.bytes.length) {
        a = (a * 31 + (m.bytes(i) & 0xff) + j) % 1000000007L
        i += 1
      }
      (a % 1000).toDouble / 1000.0
    }
    (m.doc_id, vec)
  }

  /** L5b PERCEPTUAL-HASH IMAGE NEAR-DUP — the standard FIRST pass of
    * an image-corpus dedup pipeline (before embedding dedup):
    * aHash-style 60-bit signatures over the opaque media bytes
    * ([[graft.functions.HashUtil.aHash60]]: average-pool the byte
    * stream to 60 "pixels", threshold on the global mean), banded
    * like SimHash — 4 bands of 15 bits, docs agreeing on ANY band
    * become candidates (a band-value equi-join, never O(n²)), and
    * candidates verify by Hamming distance over the full signature.
    * With maxHamming ≤ bands−1 = 3 the banding is EXACT (pigeonhole:
    * ≤3 differing bits leave ≥1 of 4 bands untouched), so the output
    * is ALL pairs at hamming ≤ 3 and the oracle can brute-force —
    * verifying the banding's losslessness every run. All arithmetic
    * integral → bit-identical cross-engine. Empty media rows are
    * dropped (no content to hash — the MinHash <3-token rule's
    * analogue). 100 TB: map-only signatures; shuffle carries only
    * (band, band_value) keys; Hamming is one codegen'd
    * `bit_count(xor)` per candidate. */
  def mediaNearDup(s: SparkSession, d: String, maxHamming: Int = 3): DataFrame =
    mediaNearDupFrame(
      Tables.loadParallel(s, d, "documents")
        // the engine hashes UTF-8 BYTES (the genuine media posture:
        // opaque binary in, signature out) while the SQL oracle can
        // only address CODE POINTS — they coincide exactly on ASCII,
        // so the parity assumption is ENFORCED here (and mirrored in
        // the oracle), never silently assumed: a non-ASCII doc drops
        // from both sides instead of diverging (round-15 ADVICE)
        .filter(octet_length(col("text")) === length(col("text")))
        .select(col("doc_id"), col("text").cast("binary").as("bytes")),
      maxHamming)

  /** Media-frame form of [[mediaNearDup]] (spec cross-checks the
    * banded join against the all-pairs brute force). */
  def mediaNearDupFrame(media: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      s"maxHamming $maxHamming > 3 breaks the 4-band pigeonhole — add bands")
    import graft.functions.ColumnFunctions.aHash60Native
    val sigs = media
      .filter(length(col("bytes")) > 0)
      .select(col("doc_id"), aHash60Native(col("bytes")).as("phash"))
    val bands = sigs.select(
      col("doc_id"), col("phash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("phash"), b * 15).bitwiseAND(lit(32767L)).as("bv"))): _*))
        .as("bb"))
      .select(col("doc_id"), col("phash"),
        col("bb.band").as("band"), col("bb.bv").as("bv"))
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash")))
          .cast("int").as("hamming"))
      // hamming is a function of the pair, so filtering BEFORE the
      // dedup is result-identical and shrinks the distinct's shuffle
      // to the survivors (band collisions at hamming > 3 dominate a
      // skewed corpus's candidate volume)
      .filter(col("hamming") <= maxHamming)
      .distinct() // a pair can agree on several bands
      .orderBy("doc_a", "doc_b")
  }

  /** L5c CROSS-MODAL ALIGNMENT GATE (round-16 #6) — the LAION-shape
    * CLIP-score keep/drop filter over (document, media) pairs: each
    * doc's TEXT-tower embedding scores against its paired MEDIA
    * embedding, pairs below the alignment threshold drop, and the
    * per-source census reports what survived — the standard quality
    * gate a multimodal corpus passes before training. Deterministic
    * stand-in, with the determinism engineered for cross-engine hash
    * parity: the text tower is the repo's published
    * [[graft.functions.ColumnFunctions.polyHash]] code-point fold
    * expanded to [[AlignDim]] integer dimensions via the MinHash
    * `seededHash` family (both already mirrored by DuckDB oracles and
    * fuzz-checked), the media embedding quantizes by `floor(x*1000)`
    * (exact IEEE ops — float values are exactly representable in
    * double), and the cosine folds INTEGER sums, so the only floating
    * step is one final division both engines perform on identical
    * integers. A real deployment replaces only the two towers with
    * model forward passes; the gate — pair join, score, threshold,
    * census — is the operator.
    *
    * 100 TB shape: one equi-join on doc_id (co-partitionable by the
    * pairing key), a single codegen projection for the score (no
    * shuffle beyond the join), one census aggregation on the source
    * key. Degenerate media (an all-zero embedding — no content)
    * drops like empty bytes in the hash pipelines. */
  private val AlignDim = 64

  def mediaTextAlignFrame(
      docs: DataFrame, media: DataFrame, minScore: Double): DataFrame = {
    import graft.functions.ColumnFunctions.{alignTerms, polyHash}
    val paired = docs
      .select(col("doc_id"), col("source"), polyHash(col("text")).as("h"))
      .join(media.select(col("doc_id"), col("embedding")), Seq("doc_id"))
      .filter(size(col("embedding")) >= AlignDim)
    // ONE native codegen loop per row (AlignTermsExpr) instead of the
    // unrolled 3·AlignDim-term Column tree this replaces: the unrolled
    // form was PLANNING-bound — 7 tasks / 1.2 task-seconds but ~2.6 s
    // warm wall in Catalyst optimization + codegen of the ~200-term
    // tree (round-16 optimization; arithmetic equality spec-pinned in
    // CodegenParitySpec, and the DuckDB oracle replays the same math)
    val at = paired.withColumn("at",
      alignTerms(col("h"), col("embedding"), AlignDim))
    val dot = col("at.dot")
    val na2 = col("at.na2")
    val nb2 = col("at.nb2")
    val score = round(dot.cast("double") /
      (sqrt(na2.cast("double")) * sqrt(nb2.cast("double"))), 6)
    at
      .select(col("doc_id"), col("source"),
        na2.as("na2"), nb2.as("nb2"), score.as("align_score"))
      .filter(col("na2") > 0L && col("nb2") > 0L)
      .withColumn("keep", col("align_score") >= lit(minScore))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("keep"), lit(1L)).otherwise(lit(0L))).as("n_keep"),
        round(min("align_score"), 6).as("min_score"),
        round(max("align_score"), 6).as("max_score"))
      .orderBy("source")
  }

  /** Driver query: the alignment gate over the real tables — the
    * embeddings table plays the media tower (vec_id IS the pairing
    * key), documents the text side. */
  def mediaTextAlign(s: SparkSession, d: String, minScore: Double = 0.05): DataFrame =
    mediaTextAlignFrame(
      Tables.load(s, d, "documents").select("doc_id", "source", "text"),
      Tables.load(s, d, "embeddings")
        .select(col("vec_id").as("doc_id"), col("embedding")),
      minScore)

  /** L5/L3 MEDIA-EMBEDDING RETRIEVAL — the cross-modal search
    * pipeline end to end: opaque media bytes → per-partition batch
    * ENCODE (the model-inference stage, stubbed) → cosine top-k
    * against a query vector. The encode amortizes model setup per
    * partition exactly like the decode stages; the search side is
    * the engine's standard shape (global top-k via
    * TakeOrderedAndProject, never a full sort). Scores are rounded
    * before the rank cut, doc_id breaks ties. */
  def mediaEmbeddingSearch(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    import s.implicits._
    val q = Array.tabulate(8)(j => ((j * 37 + 11) % 1000).toDouble / 1000.0)
    val qNorm = math.sqrt(q.map(x => x * x).sum)
    val embedded = Tables.loadParallel(s, d, "documents")
      .select(
        col("doc_id"),
        col("text").cast("binary").as("bytes"),
        lit("image/synthetic").as("media_type"))
      .as[MediaIn]
      .mapPartitions(_.map(encodeStub))
      .toDF("doc_id", "vec")
    val dot = (0 until 8).map(j => col("vec")(j) * lit(q(j))).reduce(_ + _)
    val norm = sqrt((0 until 8).map(j => col("vec")(j) * col("vec")(j)).reduce(_ + _))
    embedded
      .select(col("doc_id"), round(dot / (norm * lit(qNorm)), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("doc_id"))
      .limit(k)
  }
}
