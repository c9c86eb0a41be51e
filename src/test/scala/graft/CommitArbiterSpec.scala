package graft

import graft.sources.{CommitArbiter, InProcessCatalogArbiter, LakeTable, RenameArbiter}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The catalog-service commit protocol (S8ad, [[CommitArbiter]]):
  * claim/publish/steal mechanics on the in-process catalog stand-in,
  * and the arbitrated end-to-end commit path — refused claims drive
  * the same rebase loop as rename conflicts, crashed claims are
  * stolen after grace, and mixed arbitrated/plain writers stay
  * serialized by the rename backstop. */
class CommitArbiterSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  test("protocol: claim is exclusive per version; publish retires; abandon frees") {
    val arb = new InProcessCatalogArbiter()
    arb.observed("t", -1)
    assert(arb.tryClaim("t", 0), "first claim of v0 must win")
    assert(!arb.tryClaim("t", 0), "second claim of a held version must refuse")
    assert(arb.refusedClaims.get() === 1)
    arb.published("t", 0)
    assert(arb.headOf("t") === 0)
    // stale expectation (head moved) refuses
    assert(!arb.tryClaim("t", 0))
    assert(arb.tryClaim("t", 1))
    // a failed publish releases the version for the next committer
    arb.abandon("t", 1)
    assert(arb.tryClaim("t", 1))
    arb.published("t", 1)
  }

  test("protocol: a dangling claim of a crashed committer is stolen after grace") {
    var now = 1000L
    val arb = new InProcessCatalogArbiter(claimGraceMs = 500L, clock = () => now)
    arb.observed("t", -1)
    assert(arb.tryClaim("t", 0)) // claimant "crashes" here: no publish
    now += 100L
    assert(!arb.tryClaim("t", 0), "young claim must be honored")
    now += 1000L
    assert(arb.tryClaim("t", 0), "dangling claim past grace must be stealable")
    assert(arb.stolenClaims.get() === 1)
    arb.published("t", 0)
    assert(arb.headOf("t") === 0)
  }

  test("protocol: a late published() retires only its own claim, not a successor's") {
    val arb = new InProcessCatalogArbiter()
    arb.observed("t", -1)
    // A claims v0 and renames it into place, but has not yet reported
    // published(0)…
    assert(arb.tryClaim("t", 0))
    // …when B lists the FS, sees v0, reports it, and claims v1. The
    // observed(0) adoption drops A's now-overtaken v0 claim.
    arb.observed("t", 0)
    assert(arb.tryClaim("t", 1), "B must be able to claim the next version")
    // A's LATE published(0) must not wipe B's v1 claim — otherwise a
    // third committer could also claim v1 and two writers would hold
    // the same version with only the local rename backstop (absent on
    // S3-class stores) between them.
    arb.published("t", 0)
    assert(!arb.tryClaim("t", 1),
      "B's claim on v1 must survive A's late published(0)")
    arb.published("t", 1)
    assert(arb.headOf("t") === 1)
  }

  test("arbitrated commits: concurrent appends serialize through claims, no loss") {
    val path = "/tmp/graft_test/arb_concurrent"
    SparkSpec.rmdir(path)
    val arb = new InProcessCatalogArbiter()
    LakeTable.setCommitArbiter(path, arb)
    try {
      LakeTable.overwrite(Seq((0L, "seed")).toDF("k", "tag"), path)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val writes = (1 to 8).map { i =>
        scala.concurrent.Future {
          LakeTable.append(Seq((i.toLong, s"w$i")).toDF("k", "tag"), path)
        }
      }
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(writes),
        scala.concurrent.duration.Duration.Inf)
      pool.shutdown()
      assert(LakeTable.latestVersion(path).contains(8),
        "8 appends over the seed must land as v1..v8")
      assert(LakeTable.read(spark, path).count() === 9)
      assert(arb.headOf(path.stripPrefix("file:")) >= 0)
    } finally LakeTable.setCommitArbiter(path, RenameArbiter)
  }

  test("mixed writers: a plain (non-arbitrated) commit is observed and adopted") {
    val path = "/tmp/graft_test/arb_mixed"
    SparkSpec.rmdir(path)
    val arb = new InProcessCatalogArbiter()
    LakeTable.overwrite(Seq((0L, "seed")).toDF("k", "tag"), path) // plain v0
    LakeTable.setCommitArbiter(path, arb)
    try {
      LakeTable.append(Seq((1L, "arb")).toDF("k", "tag"), path) // arbitrated v1
      assert(arb.headOf(path) === 1)
      // a writer that bypasses the arbiter (e.g. another process with
      // no catalog configured) publishes v2 via plain rename…
      LakeTable.setCommitArbiter(path, RenameArbiter)
      LakeTable.append(Seq((2L, "plain")).toDF("k", "tag"), path)
      LakeTable.setCommitArbiter(path, arb)
      // …and the arbitrated writer adopts the moved head on its next
      // commit instead of wedging on a stale expectation
      LakeTable.append(Seq((3L, "arb2")).toDF("k", "tag"), path)
      assert(LakeTable.latestVersion(path).contains(3))
      assert(LakeTable.read(spark, path).count() === 4)
      assert(arb.headOf(path) === 3)
    } finally LakeTable.setCommitArbiter(path, RenameArbiter)
  }

  test("a refused claim surfaces as a version conflict the rebase loop retries") {
    var now = 1000L
    val path = "/tmp/graft_test/arb_refuse"
    SparkSpec.rmdir(path)
    val arb = new InProcessCatalogArbiter(claimGraceMs = 1000000L, clock = () => now)
    LakeTable.overwrite(Seq((0L, "seed")).toDF("k", "tag"), path)
    LakeTable.setCommitArbiter(path, arb)
    try {
      // a phantom committer holds v1 (and never publishes, grace huge)
      arb.observed(path, 0)
      assert(arb.tryClaim(path, 1))
      val e = intercept[Exception](
        LakeTable.append(Seq((1L, "blocked")).toDF("k", "tag"), path))
      assert(e.getMessage != null)
      // the claim is released (claimant aborted) → commit goes through
      arb.abandon(path, 1)
      LakeTable.append(Seq((1L, "ok")).toDF("k", "tag"), path)
      assert(LakeTable.read(spark, path).count() === 2)
    } finally LakeTable.setCommitArbiter(path, RenameArbiter)
  }
}
