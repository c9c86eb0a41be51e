package graft

import graft.sources.LakeTable
import graft.sources.LakeTable.PartitionTransform
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** File-granular copy-on-write DELETE (Iceberg's delete planning):
  * untouched files carry, fully-matched files drop metadata-only,
  * and only boundary files rewrite. The semantics are covered by
  * LakeTableSpec and the model property test; THIS suite pins the
  * file-set behavior that makes the delete deployable at 100 TB. */
class FileGranularDeleteSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def files(p: String, v: Int): Set[String] =
    LakeTable.entriesOf(p, v).map(_.file).toSet

  test("partition-aligned delete writes ZERO data files (pure metadata commit)") {
    val p = "/tmp/graft_test/fgdel_aligned"
    SparkSpec.rmdir(p)
    val spec = Seq(PartitionTransform("day", "identity"))
    val df = (0 until 300)
      .map(i => (i.toLong, (i % 3).toLong, i * 1.0)).toDF("k", "day", "v")
    LakeTable.overwriteHiddenPartitioned(df, p, spec)
    val v0 = LakeTable.latestVersion(p).get
    val before = files(p, v0)
    LakeTable.delete(spark, p, col("day") === 1L)
    val v1 = LakeTable.latestVersion(p).get
    val after = files(p, v1)
    assert(after.subsetOf(before),
      s"aligned delete must not write data files; new: ${after -- before}")
    assert((before -- after).nonEmpty, "the matched day's files must drop")
    assert(LakeTable.read(spark, p).filter(col("day") === 1L).count() == 0)
    assert(LakeTable.read(spark, p).count() == 200)
  }

  test("boundary delete rewrites only the touched file; others carry") {
    val p = "/tmp/graft_test/fgdel_boundary"
    SparkSpec.rmdir(p)
    val spec = Seq(PartitionTransform("day", "identity"))
    val df = (0 until 300)
      .map(i => (i.toLong, (i % 3).toLong, i * 1.0)).toDF("k", "day", "v")
    LakeTable.overwriteHiddenPartitioned(df, p, spec)
    val v0 = LakeTable.latestVersion(p).get
    val before = files(p, v0)
    // touches SOME rows of day 2 only
    LakeTable.delete(spark, p, col("day") === 2L && col("k") < 100L)
    val v1 = LakeTable.latestVersion(p).get
    val after = files(p, v1)
    assert((before intersect after).nonEmpty, "untouched days' files must carry")
    assert((after -- before).nonEmpty, "the boundary file's survivors rewrite")
    // untouched days' files carried byte-identical (not rewritten)
    val carried = before intersect after
    assert(carried.exists(_.contains("__p_identity_day=0")) &&
      carried.exists(_.contains("__p_identity_day=1")),
      s"days 0/1 must carry as-is: $carried")
    val out = LakeTable.read(spark, p)
    assert(out.count() == 300 - 33) // k in {2,5,...,98} on day 2: 33 rows
    assert(out.filter(col("day") === 2L && col("k") < 100L).count() == 0)
  }

  test("carried files keep their older MoR deletes subtracting") {
    val p = "/tmp/graft_test/fgdel_mor"
    SparkSpec.rmdir(p)
    val df = (0 until 100).map(i => (i.toLong, (i % 2).toLong, i * 1.0))
      .toDF("k", "day", "v")
    LakeTable.overwriteHiddenPartitioned(df, p,
      Seq(PartitionTransform("day", "identity")))
    LakeTable.deleteMoR(spark, p, "k", col("k") === 4L) // day-0 key, equality delete
    // CoW-delete the OTHER partition: day-0 files carry with their delete
    LakeTable.delete(spark, p, col("day") === 1L)
    val out = LakeTable.read(spark, p)
    assert(out.filter(col("k") === 4L).count() == 0,
      "carried file's equality delete must keep subtracting")
    assert(out.count() == 49) // 50 day-0 rows minus the MoR-deleted key
  }

  test("no matching rows: a carry-forward commit, nothing staged") {
    val p = "/tmp/graft_test/fgdel_none"
    SparkSpec.rmdir(p)
    LakeTable.overwrite((0 until 50).map(i => (i.toLong, i * 1.0)).toDF("k", "v"), p)
    val v0 = LakeTable.latestVersion(p).get
    val before = files(p, v0)
    LakeTable.delete(spark, p, col("k") > 1000L)
    val v1 = LakeTable.latestVersion(p).get
    assert(files(p, v1) == before)
    assert(LakeTable.read(spark, p).count() == 50)
  }
}
