package graft

import graft.functions.ColumnFunctions
import graft.llm.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SemDeDup (Abbas et al. 2023): cluster-bounded semantic dedup over
  * embeddings. The driver query rides the deterministic stand-in
  * centroids (oracle-replayable, hash-green); this spec pins the
  * algorithm's INVARIANTS on both that path and the kmeans-TRAINED
  * production path (float-order-sensitive, so it stays off the hash):
  * the manufactured near-dups are random vectors plus a ±4% per-dim
  * perturbed copy, so true cosine ≥ ε pairs are exactly the
  * original↔variant pairs — what gets dropped is fully predictable.
  */
class SemDeDupSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"
  private val Offset = 1000000L

  private def corpus = Similarity.semDeDupCorpus(spark, dir)

  private def standInCents(n: Int) =
    corpus.filter(col("vec_id") < n)
      .select(col("vec_id").as("cell_id"), col("v").as("cv"), col("nrm").as("cn"))

  /** (vec_id, cell_id, is_dropped) rows collected. */
  private def run(cents: DataFrame, eps: Double): Seq[(Long, Long, Boolean)] =
    Similarity.semDeDupDropped(corpus, cents, eps)
      .select("vec_id", "cell_id", "is_dropped")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))

  /** The SemDeDup contract over the manufactured corpus: only
    * original↔variant pairs clear ε, so (a) a pair sharing a cell
    * loses EXACTLY one member, (b) a pair split across cells loses
    * none (the paper's acknowledged miss mode), (c) nothing else is
    * ever dropped. */
  private def assertPairContract(rows: Seq[(Long, Long, Boolean)]): Unit = {
    val cellOf = rows.map(r => r._1 -> r._2).toMap
    val droppedOf = rows.map(r => r._1 -> r._3).toMap
    val originals = rows.map(_._1).filter(_ < Offset)
    assert(originals.nonEmpty)
    originals.foreach { id =>
      val (o, v) = (id, id + Offset)
      val nDropped = Seq(o, v).count(droppedOf)
      if (cellOf(o) == cellOf(v))
        assert(nDropped == 1, s"co-located pair ($o,$v) must lose exactly one")
      else
        assert(nDropped == 0, s"split pair ($o,$v) must lose neither")
    }
  }

  test("stand-in centroids: exactly one of each co-located pair drops") {
    val rows = run(standInCents(16), 0.95)
    assertPairContract(rows)
    // sanity: the miss mode is the exception, not the rule
    val dropped = rows.count(_._3)
    assert(dropped * 10 >= rows.size * 4,
      s"expected ~half the corpus dropped, got $dropped of ${rows.size}")
  }

  test("kmeans-trained centroids: the same contract holds") {
    val emb = corpus
    val cents = Similarity.kmeansCentroids(emb, nCells = 8, iters = 2)
      .withColumn("cn", ColumnFunctions.l2norm(col("cv")))
    assertPairContract(run(cents, 0.95))
  }

  test("semdedup_kmeans gate: exact side consistent, every boolean holds") {
    val r = Similarity.semDeDupKmeansGate(spark, dir).head()
    assert(r.getAs[Long]("n_vectors") === 2 * r.getAs[Long]("n_pairs"))
    assert(r.getAs[Long]("n_exact_caught") > 0 &&
      r.getAs[Long]("n_exact_caught") <= r.getAs[Long]("n_pairs"))
    assert(r.getAs[Boolean]("assigned_once_ok"), r.toString)
    assert(r.getAs[Boolean]("every_cell_keeps_ok"), r.toString)
    assert(r.getAs[Boolean]("recall_floor_met"), r.toString)
  }

  test("unreachable epsilon drops nothing; keep-order prefers the atypical") {
    val rows = run(standInCents(16), 1.01)
    assert(rows.forall(!_._3), "cosine never exceeds 1 — nothing can drop")
    // keep-order: among each co-located dropped pair the KEPT member
    // has the lower (rounded) centroid similarity — the paper's
    // diversity-preserving choice
    val scored = Similarity.semDeDupDropped(corpus, standInCents(16), 0.95)
      .select("vec_id", "cell_id", "cell_sim", "is_dropped")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val byId = scored.map(r => r._1 -> r).toMap
    scored.filter(r => r._1 < Offset && byId.contains(r._1 + Offset)).foreach {
      case (o, cell, _, _) =>
        val a = byId(o); val b = byId(o + Offset)
        if (cell == b._2 && (a._4 ^ b._4)) {
          val kept = if (a._4) b else a
          val droppedM = if (a._4) a else b
          assert(kept._3 < droppedM._3 ||
            (kept._3 == droppedM._3 && kept._1 < droppedM._1),
            s"kept member must precede in (cell_sim, id) order: $kept vs $droppedM")
        }
    }
  }
}
