package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reusable Column-level functions (SURVEY.md §2.8, §2.10).
  *
  * Everything here is a composition of built-in, codegen'd Catalyst
  * expressions — no Scala UDFs — so whole-stage codegen stays intact
  * and the optimizer can fold/push them (SURVEY.md §4).
  */
object ColumnFunctions {

  /** σ(x) = 1/(1+e^{-x}) — reference `empathy_interaction.py:84-86`,
    * `reward.py:64` (F8). */
  def sigmoid(x: Column): Column = lit(1.0) / (lit(1.0) + exp(-x))

  /** max(x, 0) clamp — reference `reward.py:54-56` (F9). */
  def clamp0(x: Column): Column = greatest(lit(0.0), x)

  /** Element-wise double cast for float arrays (embeddings are
    * ARRAY<FLOAT>; math is done in double). */
  def toDoubleArray(a: Column): Column = transform(a, x => x.cast("double"))

  /** Wrap a raw Catalyst expression as a Column (Spark 4 classic). */
  private def ofExpr(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.GraftSqlShim.column(e)

  private def exprOf(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.GraftSqlShim.expression(c)

  /** Dot product of two double arrays — native codegen expression
    * (one tight loop). Left-to-right summation, bit-identical to
    * [[dotHof]], which the spec cross-checks. */
  def dot(a: Column, b: Column): Column = ofExpr(DotProductExpr(exprOf(a), exprOf(b)))

  /** Interpreted HOF reference form of [[dot]] (zip_with + left fold). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Bounded top-k aggregate column (TypedImperativeAggregate): the
    * heap-based, map-side-combining alternative to a row_number window
    * for per-group top-k. Pass the ROUNDED score for cross-engine
    * rank stability. Returns array<struct<id,score>> best-first. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    ofExpr(TopKByScore(exprOf(score), exprOf(id), k).toAggregateExpression())

  /** Euclidean norm. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two double arrays (L3). Undefined (null)
    * when either vector has zero norm — the bare division would
    * THROW under Spark 4's default ANSI mode instead of scoring. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(l2norm(a) * l2norm(b), lit(0.0))

  /** Numerically-stable softmax over an array column — reference
    * `empathy_interaction.py:127` (F12). Subtracts array_max first. */
  def softmax(a: Column): Column = {
    val shifted = transform(a, x => exp(x - array_max(a)))
    val z = aggregate(shifted, lit(0.0), (acc, x) => acc + x)
    transform(shifted, x => x / z)
  }

  /** 1-based argmax over an array — reference
    * `empathy_interaction.py:128-129` (O4/F13). */
  def argmax1(a: Column): Column = array_position(a, array_max(a))

  /** Max probability after softmax without materializing the softmax
    * array: exp(max-max)/Σexp(x-max) = 1/Σexp(x-max). The softmax→max
    * composition collapses (SURVEY.md §4 optional rewrite, done here at
    * the function level rather than as a Catalyst rule). */
  def softmaxConfidence(a: Column): Column = {
    val z = aggregate(transform(a, x => exp(x - array_max(a))), lit(0.0), (acc, x) => acc + x)
    lit(1.0) / z
  }

  /** Mean of a numeric array — reference `reward.py:32,69` (F17, A2).
    * Null (not an ANSI DIVIDE_BY_ZERO throw) on an empty array. */
  def arrayMean(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x) /
      nullif(size(a).cast("double"), lit(0.0))

  // -------------------------------------------------------------------
  // Deterministic arithmetic hashing (L2 MinHash / fingerprinting).
  // Engine-portable on purpose: the DuckDB oracle must compute the SAME
  // hash, so we avoid xxhash64/murmur (engine-specific) and use a plain
  // polynomial-mod hash over code points. p < 2^31 so a*h+b stays well
  // inside Long range.
  // -------------------------------------------------------------------

  val HashP: Long = 1000000007L

  /** MinHash permutation-family constants — SINGLE definition, shared
    * by the HOF forms below, HashUtil's native loops, and mirrored by
    * the DuckDB oracles. Retuning them here is the only edit point. */
  val HashA: Long = 1103515245L % HashP
  val HashB: Long = 12345L
  /** 3-gram shingle combination multiplier. */
  val ShingleMult: Long = 37L

  /** Polynomial string hash h=(h*31+codePoint)%p — native codegen
    * expression (PolyHashExpr). Hashes UNICODE CODE POINTS, exactly
    * like [[polyHashHof]] and the DuckDB oracles, so all three agree on
    * any text — ASCII and CJK alike (spec-checked with a CJK fixture). */
  def polyHash(s: Column): Column = ofExpr(PolyHashExpr(exprOf(s)))

  /** Character n-gram array by code point — native codegen expression
    * (CharNgramsExpr); equals transform(sequence(1, length-n+1),
    * i -> substring(s, i, n)) at a fraction of the interpreted cost. */
  def charNgrams(s: Column, n: Int): Column = ofExpr(CharNgramsExpr(exprOf(s), n))

  /** Interpreted HOF reference form of [[polyHash]]: fold over
    * characters via aggregate-over-sequence (`ascii(substring)` =
    * codePointAt, the same code-point fold as the native form). */
  def polyHashHof(s: Column): Column =
    aggregate(
      sequence(lit(1), length(s)),
      lit(0L),
      (acc, i) => pmod(acc * lit(31L) + ascii(substring(s, i, lit(1))).cast("long"), lit(HashP)))

  /** Seeded re-hash for MinHash permutations: (a*h + b) mod p with
    * deterministic per-seed coefficients. */
  def seededHash(h: Column, seed: Int): Column =
    pmod(h * lit((HashA + 2 * seed + 1) % HashP) + lit(HashB + seed), lit(HashP))

  /** Column-seed variant (seed comes from an exploded perm column).
    * Must stay arithmetic-identical to the Int overload — the DuckDB
    * oracle mirrors this exact formula. h,mult < p ≈ 1e9 keeps the
    * product within Long. */
  def seededHash(h: Column, seed: Column): Column =
    pmod(
      h * pmod(lit(HashA) + lit(2L) * seed + lit(1L), lit(HashP)) + (lit(HashB) + seed),
      lit(HashP))

  /** Cross-modal alignment terms (dot, na2, nb2) as ONE native codegen
    * loop (AlignTermsExpr) — arithmetic-identical to the unrolled
    * `pmod(seededHash(h, j), 1000)` × `floor(emb[j]·1000)` Column
    * algebra (spec-asserted), whose ~3·dim-term tree was
    * planning-bound. */
  def alignTerms(h: Column, emb: Column, dim: Int): Column =
    ofExpr(AlignTermsExpr(exprOf(h), exprOf(emb), dim))

  /** Whitespace tokenization (documents.text is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Per-token polyHash array (interpreted HOF reference form of
    * [[tokenHashesNative]]). IMPORTANT: callers must materialize the
    * result (exchange boundary / already-bound column) before indexing
    * into it from another HOF lambda — interpreted HOFs re-evaluate
    * unbound array expressions per element access. */
  def tokenHashes(text: Column): Column = transform(tokens(text), t => polyHash(t))

  /** Native codegen form of [[tokenHashes]] — one pass over the UTF-8
    * bytes, split(" ", -1) semantics (spec-asserted equal). */
  def tokenHashesNative(text: Column): Column = ofExpr(TokenHashesExpr(exprOf(text)))

  /** C4-style canonicalization (lower → strip non-[a-z0-9 ] →
    * collapse spaces → trim) as ONE native byte scan — spec-asserted
    * equal to the regex pipeline it replaces. */
  def canonicalNormNative(text: Column): Column = ofExpr(CanonicalNormExpr(exprOf(text)))

  /** Fused native MinHash signature from a token-hash array —
    * arithmetic-identical to the shingleHashes3+seededHash HOF
    * pipeline (spec-asserted) and the DuckDB oracles. */
  def minhashSigNative(th: Column, numPerms: Int): Column =
    ofExpr(MinHashSigExpr(exprOf(th), numPerms))

  /** Native min 3-gram shingle hash (doc_fingerprint winnowing
    * primitive) — equals array_min(shingleHashes3(th)). */
  def shingleMinNative(th: Column): Column = ofExpr(ShingleMinExpr(exprOf(th)))

  /** Native 30-bit SimHash over a token-hash array (bit-majority with
    * multiplicity) — the map-only form of the exploded bit aggregate. */
  def simhashNative(th: Column): Column = ofExpr(SimHashExpr(exprOf(th)))

  /** Native 60-bit perceptual average-hash over a BINARY column — the
    * image near-dup signature (one byte scan per row). */
  def aHash60Native(bytes: Column): Column = ofExpr(AHash60Expr(exprOf(bytes)))

  /** |A ∩ B| of two SORTED-ascending distinct long arrays — native
    * codegen merge loop (equals size(array_intersect(a, b)) on sorted
    * inputs; spec-asserted). */
  def sortedIntersectSize(a: Column, b: Column): Column =
    ofExpr(SortedIntersectSizeExpr(exprOf(a), exprOf(b)))

  /** Code-point Levenshtein distance — native codegen expression
    * (LevenshteinCpExpr). Unlike the byte-based DuckDB builtin (and
    * matching Spark's own char semantics), distances are counted in
    * UNICODE CODE POINTS, so a CJK substitution costs 1, not 3. */
  def levenshteinCp(a: Column, b: Column): Column =
    ofExpr(LevenshteinCpExpr(exprOf(a), exprOf(b)))

  /** Native codegen form of [[shingleHashes3]] — one loop over the
    * token-hash array (spec-asserted equal to the HOF for ≥3 tokens;
    * empty array below that, where the HOF's sequence(1, n−2) is
    * undefined under ANSI). */
  def shingleHashes3Native(th: Column): Column =
    ofExpr(ShingleHashes3Expr(exprOf(th)))

  /** Word 3-gram shingle strings from a MATERIALIZED token-array
    * column (L2). Callers guarantee ≥3 tokens (driver docs have ≥10,
    * FIXTURES.md §2). */
  def shingles3From(tk: Column): Column =
    transform(
      sequence(lit(1), size(tk) - 2),
      i => concat_ws(" ", element_at(tk, i), element_at(tk, i + 1), element_at(tk, i + 2)))

  /** Word 3-gram shingle HASHES from a MATERIALIZED token-hash array:
    * combine three token hashes arithmetically instead of re-folding
    * the shingle string per character — ~16× fewer interpreted
    * expression evals, the difference between seconds and minutes at
    * bench scale. Mirrored exactly by the DuckDB oracles. */
  def shingleHashes3(th: Column): Column =
    transform(
      sequence(lit(1), size(th) - 2),
      i => pmod(
        pmod(element_at(th, i) * lit(ShingleMult) + element_at(th, i + 1), lit(HashP)) *
          lit(ShingleMult) + element_at(th, i + 2),
        lit(HashP)))
}
