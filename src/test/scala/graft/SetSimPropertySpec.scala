package graft

import graft.llm.Dedup
import graft.functions.ColumnFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized exactness properties for the filter-based near-dup
  * joins: the fixed-corpus specs prove losslessness on ONE token
  * distribution; these re-prove it on seeded random corpora whose
  * shape (tiny vocab → heavy collisions, skewed lengths, duplicate
  * docs) is chosen to stress the filters' edge cases — prefix
  * boundaries at minimal set sizes, ties in the rare-first order,
  * band boundaries at exactly maxHamming bits. */
class SetSimPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  /** Seeded random corpus: nDocs docs of 3–18 tokens over a vocab of
    * `vocab` words — small vocab forces shingle collisions and
    * high-Jaccard coincidences, the regime where a lossy filter would
    * actually lose pairs. */
  private def randomCorpus(seed: Long, nDocs: Int, vocab: Int): DataFrame = {
    val rng = new scala.util.Random(seed)
    import spark.implicits._
    val base = (0 until nDocs).map { i =>
      val n = 3 + rng.nextInt(16)
      (i.toLong, Seq.fill(n)(s"w${rng.nextInt(vocab)}"))
    }
    // plant near-dup variants (last token swapped) for every 4th LONG
    // doc so high-Jaccard pairs exist in every trial — the filters are
    // tested on random AND planted pairs alike
    val variants = base.collect {
      case (id, toks) if id % 4 == 0 && toks.size >= 12 =>
        (id + 100000L, toks.dropRight(1) :+ s"w${rng.nextInt(vocab)}")
    }
    (base ++ variants).map { case (id, toks) => (id, toks.mkString(" ")) }
      .toDF("doc_id", "text")
  }

  private def shingleSets(corpus: DataFrame): DataFrame =
    corpus
      .select(col("doc_id"),
        array_distinct(shingleHashes3(tokenHashesNative(col("text")))).as("ts"))
      .filter(size(col("ts")) >= 1)

  test("set-sim prefix+positional filters are lossless on random corpora") {
    for (seed <- Seq(1L, 42L, 20260812L)) {
      val corpus = randomCorpus(seed, nDocs = 120, vocab = 12)
      val got = Dedup.setSimJoinExact(corpus).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
      val tk = shingleSets(corpus)
      val brute = tk.as("a").join(tk.as("b"), col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id"),
          size(array_intersect(col("a.ts"), col("b.ts"))).as("i"),
          (size(col("a.ts")) + size(col("b.ts"))
            - size(array_intersect(col("a.ts"), col("b.ts")))).as("u"))
        .filter(lit(5) * col("i") >= lit(4) * col("u"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
      assert(got === brute,
        s"seed=$seed: got=${got.size} brute=${brute.size} — a filter lost or invented pairs")
      assert(brute.nonEmpty, s"seed=$seed: vacuous trial (no qualifying pairs)")
    }
  }

  test("simhash banding is lossless at threshold bands-1 on random corpora") {
    for (seed <- Seq(7L, 99L)) {
      val corpus = randomCorpus(seed, nDocs = 150, vocab = 10)
      val got = Dedup.simhashNearDupFrame(corpus).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val sigs = corpus.select(col("doc_id"),
        simhashNative(tokenHashesNative(col("text"))).as("sh"))
      val brute = sigs.as("a")
        .join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id"),
          bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).cast("int").as("h"))
        .filter(col("h") <= 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got === brute, s"seed=$seed: banded=${got.size} brute=${brute.size}")
      assert(brute.nonEmpty, s"seed=$seed: vacuous trial")
    }
  }
}
