package graft

import graft.sources.LakeTable
import graft.sources.LakeTable.PartitionTransform
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MANIFEST CONSOLIDATION (`rewrite_manifests`, S11a): a long-lived
  * table accumulates one manifest per commit; the op merges the small
  * live data manifests metadata-only. The invariants under test are
  * the three things a consolidated manifest must PRESERVE — data
  * sequence numbers (per-entry pins), row-lineage spans (frid pins),
  * and the exact file set — plus GC safety across the fold. */
class RewriteManifestsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def manifestCount(p: String): Int =
    LakeTable.listRefs(p, LakeTable.latestVersion(p).get)
      .count(r => r.kind == "data" && r.nFiles > 0)

  private def fileSet(p: String): Set[String] =
    LakeTable.entriesOf(p, LakeTable.latestVersion(p).get)
      .filter(_.kind == "data").map(_.file).toSet

  test("consolidation is metadata-only: fewer manifests, same files, same rows") {
    val p = "/tmp/graft_test/rwm_basic"
    SparkSpec.rmdir(p)
    (0 until 6).foreach { g =>
      LakeTable.append(
        (g * 10 until (g + 1) * 10).map(i => (i.toLong, i * 1.0)).toDF("k", "v"), p)
    }
    val before = LakeTable.read(spark, p).orderBy("k").collect().toSeq
    val filesBefore = fileSet(p)
    val vBefore = LakeTable.latestVersion(p).get
    assert(manifestCount(p) === 6)
    LakeTable.rewriteManifests(spark, p)
    assert(manifestCount(p) === 1, "six small manifests must fold into one")
    assert(fileSet(p) === filesBefore, "zero data files may move")
    assert(LakeTable.read(spark, p).orderBy("k").collect().toSeq === before)
    // time travel to the pre-consolidation snapshot is untouched
    assert(LakeTable.read(spark, p, Some(vBefore)).count() === 60)
    // the V2 connector read survives the multi-base partial manifest
    assert(spark.read.format("graftlake").load(p).count() === 60)
    // the snapshots table reports ZERO file churn for the fold (the
    // per-base counts expand partial manifests to their entry bases —
    // the single list-row base would book phantom adds+removes)
    val snap = LakeTable.snapshots(spark, p).orderBy("version").collect().last
    assert(snap.getAs[String]("operation") === "rewrite_manifests")
    assert(snap.getAs[Long]("added_data_files") === 0L &&
      snap.getAs[Long]("removed_data_files") === 0L,
      s"metadata-only consolidation must report zero churn: $snap")
  }

  test("per-entry seq pins keep equality-delete subtraction exact across the fold") {
    val p = "/tmp/graft_test/rwm_seq"
    SparkSpec.rmdir(p)
    // seq 1: key 5 lands; seq 2: equality delete of key 5;
    // seq 3: key 5 RE-lands. The delete must keep subtracting only
    // from the seq-1 vintage after both data manifests merge.
    LakeTable.append(Seq((5L, 1.0), (6L, 1.0)).toDF("k", "v"), p)
    LakeTable.deleteMoR(spark, p, "k", col("k") === 5L)
    LakeTable.append(Seq((5L, 2.0), (7L, 2.0)).toDF("k", "v"), p)
    val before = LakeTable.read(spark, p).orderBy("k", "v").collect().toSeq
    assert(before.map(r => (r.getLong(0), r.getDouble(1))) ===
      Seq((5L, 2.0), (6L, 1.0), (7L, 2.0)))
    LakeTable.rewriteManifests(spark, p)
    assert(manifestCount(p) === 1)
    val after = LakeTable.read(spark, p).orderBy("k", "v").collect().toSeq
    assert(after === before,
      "the carried equality delete must subtract exactly the pre-delete vintage")
    // the entries debug plane shows the pinned per-entry sequences
    val ent = LakeTable.entries(spark, p).collect()
      .filter(_.getAs[String]("kind") == "data")
    assert(ent.map(_.getAs[Int]("seq")).distinct.sorted.length > 1,
      "consolidated entries must keep their distinct originating seqs")
  }

  test("position deletes and DVs keep subtracting after the fold") {
    val p = "/tmp/graft_test/rwm_mor"
    SparkSpec.rmdir(p)
    (0 until 4).foreach { g =>
      LakeTable.append(
        (g * 20 until (g + 1) * 20).map(i => (i.toLong, i * 1.0)).toDF("k", "v"), p)
    }
    LakeTable.deleteMoRPositional(spark, p, col("k") % 10 === 3L)
    LakeTable.deleteMoRVector(spark, p, col("k") % 10 === 4L)
    val before = LakeTable.read(spark, p).orderBy("k").collect().toSeq
    assert(before.size === 80 - 16)
    LakeTable.rewriteManifests(spark, p)
    assert(manifestCount(p) === 1)
    assert(LakeTable.read(spark, p).orderBy("k").collect().toSeq === before)
  }

  test("row-lineage ids and last-updated survive the fold, and the next DML") {
    val p = "/tmp/graft_test/rwm_lineage"
    SparkSpec.rmdir(p)
    (0 until 5).foreach { g =>
      LakeTable.append(
        (g * 20 until (g + 1) * 20).map(i => (i.toLong, i * 1.0)).toDF("k", "v"), p)
    }
    LakeTable.enableRowLineage(spark, p)
    LakeTable.update(spark, p, Map("v" -> lit(-1.0)), col("k") === 30L)
    def lm(): Map[Long, (Long, Long)] =
      LakeTable.readWithLineage(spark, p).collect()
        .map(r => r.getAs[Long]("k") ->
          (r.getAs[Long]("_row_id"),
            r.getAs[Long]("_last_updated_sequence_number"))).toMap
    val before = lm()
    LakeTable.rewriteManifests(spark, p)
    assert(lm() === before,
      "every durable id and last-updated must survive consolidation")
    // entries expose the explicit span pins
    val ent = LakeTable.entries(spark, p).collect()
      .filter(r => r.getAs[String]("kind") == "data" &&
        r.getAs[Long]("record_count") > 0L)
    assert(ent.exists(_.getAs[Boolean]("frid_pinned")),
      "consolidated entries must pin their spans explicitly")
    // a later file-granular DML still preserves untouched rows' ids
    LakeTable.delete(spark, p, col("k") === 77L)
    val after = lm()
    assert(after.size === before.size - 1)
    assert(after === before - 77L,
      "post-consolidation DML must keep preserving ids")
  }

  test("GC across the fold never deletes files a consolidated manifest references") {
    val p = "/tmp/graft_test/rwm_gc"
    SparkSpec.rmdir(p)
    (0 until 4).foreach { g =>
      LakeTable.append(
        (g * 10 until (g + 1) * 10).map(i => (i.toLong, i * 1.0)).toDF("k", "v"), p)
    }
    LakeTable.rewriteManifests(spark, p)
    val files = fileSet(p)
    // expire everything but the consolidated head: the per-commit
    // manifests drop, their commit DIRS must survive (the consolidated
    // manifest references files inside every one of them)
    LakeTable.expireSnapshots(spark, p, retain = 1)
    assert(fileSet(p) === files)
    files.foreach(f => assert(java.nio.file.Files.exists(java.nio.file.Paths.get(f)),
      s"GC deleted a live consolidated file: $f"))
    assert(LakeTable.read(spark, p).count() === 40)
    // and a DROPPED consolidated manifest's unshared dirs do get swept:
    // fold the table to one fresh file, then expire — the old commit
    // dirs hold nothing live anymore
    LakeTable.compact(spark, p)
    LakeTable.expireSnapshots(spark, p, retain = 1)
    assert(LakeTable.read(spark, p).count() === 40)
    files.foreach(f => assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(f)),
      s"GC must sweep the folded pre-compact file: $f"))
  }

  test("hive-layout manifests are left alone; consolidation composes per generation") {
    val p = "/tmp/graft_test/rwm_hive"
    SparkSpec.rmdir(p)
    val df = (0 until 30).map(i => (i.toLong, s"t${i % 3}", i * 1.0)).toDF("k", "tag", "v")
    LakeTable.overwritePartitioned(df, p, "tag")
    val n0 = manifestCount(p)
    LakeTable.rewriteManifests(spark, p)
    assert(manifestCount(p) === n0,
      "hive-partitioned manifests must not consolidate (dir-borne values)")
    // hidden-partitioned generations DO consolidate within their spec
    val p2 = "/tmp/graft_test/rwm_hidden"
    SparkSpec.rmdir(p2)
    val spec = Seq(PartitionTransform("day", "identity"))
    (0 until 3).foreach { g =>
      LakeTable.appendHiddenPartitioned(
        (g * 10 until (g + 1) * 10).map(i => (i.toLong, (i % 2).toLong, i * 1.0))
          .toDF("k", "day", "v"), p2, spec)
    }
    val before = LakeTable.read(spark, p2).orderBy("k").collect().toSeq
    LakeTable.rewriteManifests(spark, p2)
    assert(manifestCount(p2) === 1)
    assert(LakeTable.read(spark, p2).orderBy("k").collect().toSeq === before)
    // hidden-partition pruning still works off the consolidated manifest
    assert(LakeTable.readWhere(spark, p2, Seq(("day", 1.0, 1.0)))
      .filter(col("day") === 1L).count() === 15)
  }

  test("re-consolidation composes: new commits fold into the consolidated state") {
    val p = "/tmp/graft_test/rwm_again"
    SparkSpec.rmdir(p)
    (0 until 3).foreach { g =>
      LakeTable.append(
        (g * 10 until (g + 1) * 10).map(i => (i.toLong, i * 1.0)).toDF("k", "v"), p)
    }
    LakeTable.rewriteManifests(spark, p)
    assert(manifestCount(p) === 1)
    (3 until 5).foreach { g =>
      LakeTable.append(
        (g * 10 until (g + 1) * 10).map(i => (i.toLong, i * 1.0)).toDF("k", "v"), p)
    }
    assert(manifestCount(p) === 3)
    LakeTable.rewriteManifests(spark, p)
    assert(manifestCount(p) === 1, "already-consolidated manifests re-fold")
    assert(LakeTable.read(spark, p).count() === 50)
    // CALL surface routes onto the same machinery
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", "/tmp/graft_test/rwm_wh")
    val out = spark.sql(s"CALL graft.system.rewrite_manifests(table => '$p')").collect()
    assert(out.length === 1)
  }
}
