package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{CdcApply, GraftCdcException, LakeTable}

/** CDC apply (SCD1) + SCD2 build — the APPLY-CHANGES-INTO family. */
class CdcApplySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def rmdir(p: String): Unit = graft.Util.rmRecursive(p)

  private def content(p: String): Seq[(Long, String, Long)] =
    LakeTable.read(spark, p).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("s"), r.getAs[Long]("_seq")))
      .sortBy(t => (t._1, t._2)).toSeq

  test("applyChanges: bootstrap, update, delete, insert across ordered batches") {
    val p = "/tmp/graft_test/cdc_apply"
    rmdir(p)
    def feed(rows: (Long, String, Long, String)*) =
      rows.toDF("k", "s", "_seq", "change_type")
    // batch 1 bootstraps the table (insert-only)
    CdcApply.applyChanges(feed((1L, "a", 1L, "insert"), (2L, "b", 1L, "insert")),
      p, "k", "_seq")
    assert(content(p) === Seq((1L, "a", 1L), (2L, "b", 1L)))
    // batch 2: update k=1, delete k=2, insert k=3; a delete of a
    // never-seen key is a no-op
    CdcApply.applyChanges(feed(
      (1L, "a2", 2L, "update_postimage"), (1L, "a", 2L, "update_preimage"),
      (2L, "b", 2L, "delete"), (3L, "c", 2L, "insert"),
      (9L, "ghost", 2L, "delete")),
      p, "k", "_seq")
    assert(content(p) === Seq((1L, "a2", 2L), (3L, "c", 2L)))
    // within one batch the LATEST sequence per key wins
    CdcApply.applyChanges(feed(
      (3L, "mid", 3L, "update_postimage"), (3L, "late", 4L, "update_postimage")),
      p, "k", "_seq")
    assert(content(p) === Seq((1L, "a2", 2L), (3L, "late", 4L)))
    // same-sequence delete+insert is an UPDATE (insert wins the tie)
    CdcApply.applyChanges(feed(
      (1L, "a2", 5L, "delete"), (1L, "a3", 5L, "insert")),
      p, "k", "_seq")
    assert(content(p) === Seq((1L, "a3", 5L), (3L, "late", 4L)))
    // the at-least-once retry: same batch again, content unchanged
    CdcApply.applyChanges(feed(
      (1L, "a2", 5L, "delete"), (1L, "a3", 5L, "insert")),
      p, "k", "_seq")
    assert(content(p) === Seq((1L, "a3", 5L), (3L, "late", 4L)))
    // a matched row never regresses to an OLDER sequence's value
    CdcApply.applyChanges(feed((3L, "ancient", 1L, "update_postimage")),
      p, "k", "_seq")
    assert(content(p) === Seq((1L, "a3", 5L), (3L, "late", 4L)))
    // an old delete cannot remove a newer row either
    CdcApply.applyChanges(feed((3L, "late", 2L, "delete")), p, "k", "_seq")
    assert(content(p) === Seq((1L, "a3", 5L), (3L, "late", 4L)))
  }

  test("applyChanges refusals: unknown change_type, conflicting upserts, partial payload") {
    val p = "/tmp/graft_test/cdc_apply_refuse"
    rmdir(p)
    def feed(rows: (Long, String, Long, String)*) =
      rows.toDF("k", "s", "_seq", "change_type")
    // data-dependent refusals are IN-FLOW (raise_error woven into the
    // evaluated expressions); the apply entry points re-throw them as
    // the CATCHABLE type, message intact — a caller distinguishes
    // bad-feed from infrastructure failure by type, not substring
    val e1 = intercept[GraftCdcException](CdcApply.applyChanges(
      feed((1L, "a", 1L, "upsert")), p, "k", "_seq"))
    assert(e1.getMessage.contains("unknown change_type 'upsert'"), e1.getMessage)
    val e2 = intercept[GraftCdcException](CdcApply.applyChanges(
      feed((1L, "a", 1L, "insert"), (1L, "b", 1L, "insert")), p, "k", "_seq"))
    assert(e2.getMessage.contains("conflicting upserts"), e2.getMessage)
    // a NULL sequence freezes every ordering guard — refuse by name
    val e2b = intercept[GraftCdcException](CdcApply.applyChanges(
      Seq((1L, "a", Option.empty[Long], "insert"))
        .toDF("k", "s", "_seq", "change_type"), p, "k", "_seq"))
    assert(e2b.getMessage.contains("NULL sequence"), e2b.getMessage)
    // two deletes at one (key, seq) are NOT ambiguous (same effect)
    CdcApply.applyChanges(feed(
      (1L, "a", 1L, "insert"),
      (2L, "x", 1L, "delete"), (2L, "y", 1L, "delete")), p, "k", "_seq")
    assert(content(p) === Seq((1L, "a", 1L)))
    // a feed missing a target column refuses (nulling values silently
    // is how a replica diverges)
    val e3 = intercept[IllegalArgumentException](CdcApply.applyChanges(
      Seq((1L, 2L, "insert")).toDF("k", "_seq", "change_type"), p, "k", "_seq"))
    assert(e3.getMessage.contains("lacks target column 's'"), e3.getMessage)
    // a feed lacking the sequence column refuses by name
    val e4 = intercept[IllegalArgumentException](CdcApply.applyChanges(
      Seq((1L, "a", "insert")).toDF("k", "s", "change_type"), p, "k", "_seq"))
    assert(e4.getMessage.contains("'_seq'"), e4.getMessage)
  }

  test("scd2FromChanges: versions, closes, ties, and the predating delete") {
    val ch = Seq(
      // k=1: two versions, second still open
      (1L, "v1", 10L, "insert"), (1L, "v2", 20L, "update_postimage"),
      (1L, "v1", 20L, "update_preimage"), // informational, ignored
      // k=2: one version closed by a delete
      (2L, "w1", 10L, "insert"), (2L, "w1", 30L, "delete"),
      // k=3: update represented as same-seq delete+insert: the close
      // goes to the OLD version, the new one opens at the same seq
      (3L, "x1", 10L, "insert"),
      (3L, "x1", 40L, "delete"), (3L, "x2", 40L, "insert"),
      // k=4: the first event is a delete (row predates the feed) —
      // nothing can be emitted for it
      (4L, "gone", 10L, "delete"), (4L, "y1", 50L, "insert")
    ).toDF("k", "s", "_seq", "change_type")
    val out = CdcApply.scd2FromChanges(ch, "k", "_seq")
      .collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("s"),
        r.getAs[Long]("start_seq"),
        Option(r.getAs[java.lang.Long]("end_seq")).map(_.toLong),
        r.getAs[Boolean]("is_current")))
      .sortBy(r => (r._1, r._3)).toSeq
    assert(out === Seq(
      (1L, "v1", 10L, Some(20L), false),
      (1L, "v2", 20L, None, true),
      (2L, "w1", 10L, Some(30L), false),
      (3L, "x1", 10L, Some(40L), false),
      (3L, "x2", 40L, None, true),
      (4L, "y1", 50L, None, true)))
  }

  test("applyChangesScd2: incremental maintenance equals the one-shot build") {
    val p = "/tmp/graft_test/cdc_scd2_apply"
    rmdir(p)
    def feed(rows: (Long, String, Long, String)*) =
      rows.toDF("k", "s", "_seq", "change_type")
    val b1 = feed((1L, "v1", 10L, "insert"), (2L, "w1", 10L, "insert"))
    val b2 = feed(
      (1L, "v2", 20L, "update_postimage"), // supersede k=1
      (2L, "w1", 25L, "delete"), // close k=2
      (3L, "x1", 22L, "insert"), // new key
      (5L, "z1", 21L, "insert")) // will be closed by a LATER delete
    val b3 = feed(
      (1L, "v3", 30L, "update_postimage"),
      (2L, "w2", 35L, "insert"), // k=2 reborn after its delete
      (5L, "z1", 33L, "delete")) // close k=5 — the replay trap
    Seq(b1, b2, b3).foreach(b => CdcApply.applyChangesScd2(b, p, "k", "_seq"))
    def stored(): Seq[(Long, String, Long, Option[Long], Boolean)] =
      LakeTable.read(spark, p).collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[String]("s"),
          r.getAs[Long]("start_seq"),
          Option(r.getAs[java.lang.Long]("end_seq")).map(_.toLong),
          r.getAs[Boolean]("is_current")))
        .sortBy(r => (r._1, r._3)).toSeq
    val expect = Seq(
      (1L, "v1", 10L, Some(20L), false),
      (1L, "v2", 20L, Some(30L), false),
      (1L, "v3", 30L, None, true),
      (2L, "w1", 10L, Some(25L), false),
      (2L, "w2", 35L, None, true),
      (3L, "x1", 22L, None, true),
      (5L, "z1", 21L, Some(33L), false))
    assert(stored() === expect)
    // equals the one-shot build over the concatenated feed
    val oneShot = CdcApply.scd2FromChanges(
      b1.unionByName(b2).unionByName(b3), "k", "_seq")
      .collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("s"),
        r.getAs[Long]("start_seq"),
        Option(r.getAs[java.lang.Long]("end_seq")).map(_.toLong),
        r.getAs[Boolean]("is_current")))
      .sortBy(r => (r._1, r._3)).toSeq
    assert(oneShot === expect)
    // the at-least-once retry: re-applying any already-applied batch
    // leaves the history untouched — including the closed rows of a
    // deleted key (their version ids still match)
    CdcApply.applyChangesScd2(b2, p, "k", "_seq")
    assert(stored() === expect)
    CdcApply.applyChangesScd2(b3, p, "k", "_seq")
    assert(stored() === expect)
    // a mismatched payload schema refuses by name
    val e = intercept[IllegalArgumentException](CdcApply.applyChangesScd2(
      Seq((9L, 40L, "insert")).toDF("k", "_seq", "change_type"), p, "k", "_seq"))
    assert(e.getMessage.contains("'s'"), e.getMessage)
  }

  test("composite keys: applyChangesKeys and applyChangesScd2Keys fold the full tuple") {
    val p1 = "/tmp/graft_test/cdc_comp_scd1"
    val p2 = "/tmp/graft_test/cdc_comp_scd2"
    rmdir(p1); rmdir(p2)
    def feed(rows: (Long, Int, String, Long, String)*) =
      rows.toDF("ok", "ln", "s", "_seq", "change_type")
    val keys = Seq("ok", "ln")
    // (1,1) and (1,2) share the first component — a single-key fold
    // would conflate them; the tuple keeps them distinct
    val b1 = feed(
      (1L, 1, "a", 10L, "insert"), (1L, 2, "b", 10L, "insert"),
      (2L, 1, "c", 10L, "insert"))
    val b2 = feed(
      (1L, 1, "a2", 20L, "update_postimage"), // only tuple (1,1) moves
      (2L, 1, "c", 25L, "delete"))
    // ---- SCD1: current state per tuple ----
    CdcApply.applyChangesKeys(b1, p1, keys, "_seq")
    CdcApply.applyChangesKeys(b2, p1, keys, "_seq")
    def current(): Seq[(Long, Int, String)] =
      LakeTable.read(spark, p1).collect()
        .map(r => (r.getAs[Long]("ok"), r.getAs[Int]("ln"), r.getAs[String]("s")))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(current() === Seq((1L, 1, "a2"), (1L, 2, "b")))
    CdcApply.applyChangesKeys(b2, p1, keys, "_seq") // retry: no-op
    assert(current() === Seq((1L, 1, "a2"), (1L, 2, "b")))
    // ---- SCD2: version history per tuple ----
    Seq(b1, b2).foreach(b => CdcApply.applyChangesScd2Keys(b, p2, keys, "_seq"))
    def hist(): Seq[(Long, Int, String, Long, Option[Long], Boolean)] =
      LakeTable.read(spark, p2).collect()
        .map(r => (r.getAs[Long]("ok"), r.getAs[Int]("ln"), r.getAs[String]("s"),
          r.getAs[Long]("start_seq"),
          Option(r.getAs[java.lang.Long]("end_seq")).map(_.toLong),
          r.getAs[Boolean]("is_current")))
        .sortBy(t => (t._1, t._2, t._4)).toSeq
    val expect = Seq(
      (1L, 1, "a", 10L, Some(20L), false),
      (1L, 1, "a2", 20L, None, true),
      (1L, 2, "b", 10L, None, true),
      (2L, 1, "c", 10L, Some(25L), false))
    assert(hist() === expect)
    // equals the one-shot composite build, and the retry is a no-op
    val oneShot = CdcApply.scd2FromChangesKeys(b1.unionByName(b2), keys, "_seq")
      .collect()
      .map(r => (r.getAs[Long]("ok"), r.getAs[Int]("ln"), r.getAs[String]("s"),
        r.getAs[Long]("start_seq"),
        Option(r.getAs[java.lang.Long]("end_seq")).map(_.toLong),
        r.getAs[Boolean]("is_current")))
      .sortBy(t => (t._1, t._2, t._4)).toSeq
    assert(oneShot === expect)
    CdcApply.applyChangesScd2Keys(b2, p2, keys, "_seq")
    assert(hist() === expect)
    // __scd_id NUL-joins every component: tuple ("a", "1") at start
    // "2" and ("a", "1" + NUL-ambiguous renderings) cannot collide
    val ids = LakeTable.read(spark, p2).select("__scd_id")
      .collect().map(_.getString(0)).toSeq
    assert(ids.distinct.length === ids.length, ids.mkString(", "))
  }

  test("applyChangesScd2: ':' in key or sequence cannot collide version identities") {
    val p = "/tmp/graft_test/cdc_scd2_colon"
    rmdir(p)
    // under a ':' separator these two versions share one merge
    // identity ("a:1" + start "2" ≡ "a" + start "1:2"); the NUL
    // separator keeps them distinct
    val feed = Seq(("a:1", "x", "2", "insert"), ("a", "y", "1:2", "insert"))
      .toDF("k", "s", "_seq", "change_type")
    CdcApply.applyChangesScd2(feed, p, "k", "_seq")
    val ids = LakeTable.read(spark, p).select("__scd_id")
      .collect().map(_.getString(0)).toSeq
    assert(ids.distinct.length === 2, ids.mkString(", "))
    // the retry stays idempotent through the unambiguous identity
    CdcApply.applyChangesScd2(feed, p, "k", "_seq")
    assert(LakeTable.read(spark, p).count() === 2L)
  }

  test("tombstones: out-of-order deletes converge instead of resurrecting") {
    val p = "/tmp/graft_test/cdc_tomb"
    rmdir(p)
    def feed(rows: (Long, String, Long, String)*) =
      rows.toDF("k", "s", "_seq", "change_type")
    CdcApply.applyChanges(feed((1L, "a", 1L, "insert"), (2L, "b", 1L, "insert")),
      p, "k", "_seq")
    CdcApply.applyChanges(feed((1L, "a", 10L, "delete")), p, "k", "_seq")
    // the stale pre-delete batch: an upsert STRICTLY older than the
    // applied delete — without the tombstone gate the not-matched
    // insert would resurrect k=1
    CdcApply.applyChanges(feed((1L, "stale", 5L, "update_postimage")),
      p, "k", "_seq")
    assert(content(p) === Seq((2L, "b", 1L)))
    // an upsert AT the tombstone's sequence applies (the in-feed rule:
    // upsert outranks delete at the same sequence) and revives the key
    CdcApply.applyChanges(feed((1L, "tie", 10L, "insert")), p, "k", "_seq")
    assert(content(p) === Seq((1L, "tie", 10L), (2L, "b", 1L)))
    // the applied re-insert removed the tombstone; the STORED sequence
    // is the guard again (an older upsert no-ops at the merge)
    CdcApply.applyChanges(feed((1L, "older", 7L, "update_postimage")),
      p, "k", "_seq")
    assert(content(p) === Seq((1L, "tie", 10L), (2L, "b", 1L)))
    // re-delete, then a MIXED batch: the stale upsert drops while the
    // fresh sibling applies — gating is per-row, not per-batch
    CdcApply.applyChanges(feed((1L, "tie", 12L, "delete")), p, "k", "_seq")
    CdcApply.applyChanges(feed(
      (1L, "stale2", 11L, "update_postimage"),
      (2L, "b2", 13L, "update_postimage")), p, "k", "_seq")
    assert(content(p) === Seq((2L, "b2", 13L)))
    // a FULLY-gated batch is a version no-op, and the retry of the
    // stale batch stays gated (idempotence through the store)
    val v = LakeTable.latestVersion(p).get
    CdcApply.applyChanges(feed((1L, "stale2", 11L, "update_postimage")),
      p, "k", "_seq")
    assert(LakeTable.latestVersion(p).get === v)
    // bootstrap deletes tombstone too: a key the feed closed before
    // the target ever saw it must not come back via a late insert
    val p2 = "/tmp/graft_test/cdc_tomb_boot"
    rmdir(p2)
    CdcApply.applyChanges(feed((5L, "x", 5L, "delete"), (6L, "y", 1L, "insert")),
      p2, "k", "_seq")
    CdcApply.applyChanges(feed((5L, "late", 3L, "insert")), p2, "k", "_seq")
    assert(content(p2) === Seq((6L, "y", 1L)))
  }

  test("tombstones: composite tuples gate independently; retention expiry") {
    val p = "/tmp/graft_test/cdc_tomb_comp"
    rmdir(p)
    def cfeed(rows: (Long, Int, String, Long, String)*) =
      rows.toDF("ok", "ln", "s", "_seq", "change_type")
    val keys = Seq("ok", "ln")
    CdcApply.applyChangesKeys(cfeed(
      (1L, 1, "a", 1L, "insert"), (1L, 2, "b", 1L, "insert")), p, keys, "_seq")
    CdcApply.applyChangesKeys(cfeed((1L, 1, "a", 10L, "delete")), p, keys, "_seq")
    // tuple (1,1) is tombstoned; sibling (1,2) shares the first
    // component and must NOT be caught by its tombstone
    CdcApply.applyChangesKeys(cfeed(
      (1L, 1, "stale", 5L, "insert"),
      (1L, 2, "b2", 5L, "update_postimage")), p, keys, "_seq")
    val cur = LakeTable.read(spark, p).collect()
      .map(r => (r.getAs[Long]("ok"), r.getAs[Int]("ln"), r.getAs[String]("s")))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(cur === Seq((1L, 2, "b2")))
    // ---- retention expiry: past the declared bound the tombstone
    // expires and the documented in-order boundary returns ----
    val p3 = "/tmp/graft_test/cdc_tomb_ret"
    rmdir(p3)
    def feed(rows: (Long, String, Long, String)*) =
      rows.toDF("k", "s", "_seq", "change_type")
    CdcApply.applyChanges(feed((1L, "a", 1L, "insert")), p3, "k", "_seq")
    LakeTable.setTableProperties(spark, p3,
      Map(LakeTable.CdcTombstoneRetentionKey -> "5"))
    CdcApply.applyChanges(feed((1L, "a", 10L, "delete")), p3, "k", "_seq")
    // within retention (high-water 10): gated
    CdcApply.applyChanges(feed((1L, "stale", 2L, "insert")), p3, "k", "_seq")
    assert(content(p3) === Seq.empty)
    // advance the high-water past 10 + 5 → the tombstone expires
    CdcApply.applyChanges(feed((2L, "hw", 20L, "insert")), p3, "k", "_seq")
    CdcApply.applyChanges(feed((1L, "stale", 2L, "insert")), p3, "k", "_seq")
    assert(content(p3) === Seq((1L, "stale", 2L), (2L, "hw", 20L)))
  }

  test("tombstones survive snapshot expiry (GC carries the store to the head)") {
    val p = "/tmp/graft_test/cdc_tomb_expire"
    rmdir(p)
    def feed(rows: (Long, String, Long, String)*) =
      rows.toDF("k", "s", "_seq", "change_type")
    CdcApply.applyChanges(feed((1L, "a", 1L, "insert"), (2L, "b", 1L, "insert")),
      p, "k", "_seq")
    CdcApply.applyChanges(feed((1L, "a", 10L, "delete")), p, "k", "_seq")
    // unrelated commits move the head PAST the apply that owns the
    // store, then GC drops every version dir below the head
    LakeTable.append(Seq((3L, "c", 1L)).toDF("k", "s", "_seq"), p)
    LakeTable.expireSnapshots(spark, p, retain = 1)
    // the out-of-order protection must not die with the expired dirs
    CdcApply.applyChanges(feed((1L, "stale", 5L, "insert")), p, "k", "_seq")
    assert(content(p) === Seq((2L, "b", 1L), (3L, "c", 1L)),
      "the stale pre-delete insert must stay gated after expiry")
  }

  test("applyChangesScd2: out-of-order events drop as stale, never re-open chains") {
    val p = "/tmp/graft_test/cdc_scd2_ooo"
    rmdir(p)
    def feed(rows: (Long, String, Long, String)*) =
      rows.toDF("k", "s", "_seq", "change_type")
    def stored(): Seq[(Long, String, Long, Option[Long], Boolean)] =
      LakeTable.read(spark, p).collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[String]("s"),
          r.getAs[Long]("start_seq"),
          Option(r.getAs[java.lang.Long]("end_seq")).map(_.toLong),
          r.getAs[Boolean]("is_current")))
        .sortBy(r => (r._1, r._3)).toSeq
    CdcApply.applyChangesScd2(feed(
      (1L, "v1", 10L, "insert"), (2L, "w1", 10L, "insert")), p, "k", "_seq")
    CdcApply.applyChangesScd2(feed((1L, "v1", 20L, "delete")), p, "k", "_seq")
    val closed = Seq(
      (1L, "v1", 10L, Some(20L), false), (2L, "w1", 10L, None, true))
    assert(stored() === closed)
    // the resurrection trap: an upsert BETWEEN the last version start
    // and the closing delete's end — in-order delivery would have
    // superseded it with that delete; it must drop, not re-open
    CdcApply.applyChangesScd2(feed((1L, "ghost", 15L, "insert")), p, "k", "_seq")
    assert(stored() === closed)
    // an insert AT the closing end applies (upsert outranks delete at
    // the same sequence — matches the one-shot build's tie rule)
    CdcApply.applyChangesScd2(feed((1L, "re", 20L, "insert")), p, "k", "_seq")
    val reborn = (closed :+ ((1L, "re", 20L, Option.empty[Long], true)))
      .sortBy(r => (r._1, r._3))
    assert(stored() === reborn)
    // and stale events below the NEW chain still drop
    CdcApply.applyChangesScd2(feed((1L, "old", 17L, "insert")), p, "k", "_seq")
    assert(stored() === reborn)
  }

  test("applyChangesStream: continuous replication over the lineage CDC stream") {
    val src = "/tmp/graft_test/cdc_stream_src"
    val tgt = "/tmp/graft_test/cdc_stream_tgt"
    val chk = "/tmp/graft_test/cdc_stream_chk"
    rmdir(src); rmdir(tgt); rmdir(chk)
    LakeTable.overwrite(
      (1L to 30L).map(i => (i, i * 1.0)).toDF("k", "x"), src) // v0
    LakeTable.enableRowLineage(spark, src) // v1: the initial snapshot batch
    LakeTable.update(spark, src, Map("x" -> (col("x") + 100.0)),
      col("k") % 5L === 0L) // v2
    LakeTable.delete(spark, src, col("k") % 4L === 0L) // v3
    def replicate(): Unit = {
      val q = CdcApply.applyChangesStream(
        spark.readStream.format("graftlake")
          .option("changeFeed", "lineage").load(src),
        tgt, "k", "v", chk)
      q.awaitTermination()
    }
    def drift(): Long = {
      val t = LakeTable.read(spark, tgt).select("k", "x")
      val s0 = LakeTable.read(spark, src)
      t.exceptAll(s0).count() + s0.exceptAll(t).count()
    }
    replicate()
    assert(drift() === 0L, "replica must track the source after catch-up")
    // the source keeps moving; the checkpoint resumes where it left off
    LakeTable.append((31L to 35L).map(i => (i, i * 1.0)).toDF("k", "x"), src) // v4
    LakeTable.update(spark, src, Map("x" -> (col("x") * 2.0)),
      col("k") > 30L) // v5
    replicate()
    assert(drift() === 0L, "replica must track the source across restarts")
    // the SCD2 toggle maintains the full history off the same feed
    val hist = "/tmp/graft_test/cdc_stream_hist"
    val chk2 = "/tmp/graft_test/cdc_stream_chk2"
    rmdir(hist); rmdir(chk2)
    CdcApply.applyChangesStream(
      spark.readStream.format("graftlake")
        .option("changeFeed", "lineage").load(src),
      hist, "k", "v", chk2, scd2 = true).awaitTermination()
    val open = LakeTable.read(spark, hist).filter(col("is_current"))
      .select("k", "x")
    val s1 = LakeTable.read(spark, src)
    assert(open.exceptAll(s1).count() + s1.exceptAll(open).count() === 0L,
      "the SCD2 history's open rows must equal the source's current state")
    // closed history survives: k=20 was updated then deleted
    assert(LakeTable.read(spark, hist)
      .filter(col("k") === 20L && !col("is_current")).count() >= 1L,
      "closed versions must be retained")
  }

  test("applyChanges replicates a lake table's own lineage change feed") {
    val src = "/tmp/graft_test/cdc_roundtrip_src"
    val tgt = "/tmp/graft_test/cdc_roundtrip_tgt"
    rmdir(src); rmdir(tgt)
    LakeTable.overwrite(
      (1L to 20L).map(i => (i, s"s$i", i * 10.0)).toDF("k", "s", "v"), src) // v0
    LakeTable.enableRowLineage(spark, src) // v1
    LakeTable.update(spark, src, Map("v" -> (col("v") + lit(1.0))),
      col("k") % 3L === 0L) // v2
    LakeTable.delete(spark, src, col("k") % 4L === 0L) // v3
    val feed = (2 to 3).map(v =>
      LakeTable.changesWithLineage(spark, src, v - 1, v)
        .drop("_row_id").withColumn("_seq", lit(v.toLong)))
      .reduce(_ unionByName _)
    val boot = LakeTable.read(spark, src, Some(1))
      .withColumn("change_type", lit("insert")).withColumn("_seq", lit(1L))
    CdcApply.applyChanges(boot.unionByName(feed), tgt, "k", "_seq")
    val t = LakeTable.read(spark, tgt).select("k", "s", "v")
    val s0 = LakeTable.read(spark, src)
    assert(t.exceptAll(s0).count() + s0.exceptAll(t).count() === 0L,
      "replica must equal the source's final content")
  }

  test("applyChangesByIdentity keys on the declared identifier fields") {
    val p = "/tmp/graft_test/cdc_apply_ident"
    rmdir(p)
    def feed(rows: (Long, String, Long, String)*) =
      rows.toDF("k", "s", "_seq", "change_type")
    // undeclared target refuses by name
    val undeclared = intercept[IllegalArgumentException](
      CdcApply.applyChangesByIdentity(
        feed((1L, "a", 1L, "insert")), p, "_seq"))
    assert(undeclared.getMessage.contains("no identifier fields"))
    // bootstrap through the EXPLICIT key, declare, then apply by identity
    CdcApply.applyChanges(feed((1L, "a", 1L, "insert"), (2L, "b", 1L, "insert")),
      p, "k", "_seq")
    LakeTable.addConstraint(spark, p, "k_nn", "k IS NOT NULL")
    LakeTable.setIdentifierFields(p, Seq("k"))
    CdcApply.applyChangesByIdentity(feed(
      (1L, "A", 2L, "update_postimage"), (2L, "b", 2L, "delete"),
      (3L, "c", 2L, "insert")), p, "_seq")
    assert(content(p) === Seq((1L, "A", 2L), (3L, "c", 2L)))
    // a composite declaration rides the composite apply plane: the
    // full (k, s) tuple is the identity, so a new tuple inserts even
    // though its k matches an existing row
    LakeTable.addConstraint(spark, p, "s_nn", "s IS NOT NULL")
    LakeTable.setIdentifierFields(p, Seq("k", "s"))
    CdcApply.applyChangesByIdentity(feed((1L, "d", 3L, "insert")), p, "_seq")
    assert(content(p) === Seq((1L, "A", 2L), (1L, "d", 3L), (3L, "c", 2L)))
  }
}
