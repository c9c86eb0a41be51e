package graft

import graft.etl.Preprocess
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ETL invariants (SURVEY.md §5.5 + §2.7 U1). */
class EtlRoundTripSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val dir = "/root/testdata/sf0.001"

  test("E1 round-trip: VERL rows survive a parquet write/read unchanged") {
    val out = "/tmp/graft_test/verl_rows"
    val produced = Preprocess.verlRows(spark, dir)
    produced.write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out).orderBy("dia_id")
    // parquet reads are always-nullable; compare names + types
    assert(back.schema.map(f => (f.name, f.dataType))
      === produced.schema.map(f => (f.name, f.dataType)))
    val a = produced.collect().map(_.toSeq)
    val b = back.collect().map(_.toSeq)
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) => assert(x === y) }
  }

  test("U1: positional split partitions are disjoint and reunite to the input") {
    val split = Preprocess.positionalSplit(spark, dir)
    val train = split.filter(col("split") === "train").select("dia_id")
    val test_ = split.filter(col("split") === "test").select("dia_id")
    val all = Tables.load(spark, dir, "events")
      .select(col("user_id").as("dia_id")).distinct()
    assert(train.intersect(test_).count() === 0)
    assert(train.union(test_).except(all).count() === 0)
    assert(all.except(train.union(test_)).count() === 0)
    // 70/30 with ceil: train = ceil(0.7 * n)
    val n = all.count()
    assert(train.count() === (7 * n + 9) / 10)
  }

  test("sequence packing: next-fit fold matches a driver-side reference fold") {
    val out = Preprocess.sequencePacking(spark, dir).collect()
    assert(out.nonEmpty)
    // reference: same greedy next-fit, computed imperatively per shard
    val docs = Tables.load(spark, dir, "documents")
      .select(expr("doc_id div 100").as("shard"), col("doc_id"),
        size(split(col("text"), " ")).as("len"))
      .collect()
      .groupBy(_.getAs[Long]("shard"))
      .view.mapValues(_.sortBy(_.getAs[Long]("doc_id")).map(_.getAs[Int]("len")))
      .toMap
    out.foreach { r =>
      val shard = r.getAs[Long]("shard")
      val lens = docs(shard)
      var bins = 1; var used = 0
      lens.foreach { l =>
        if (used + l > 256) { bins += 1; used = l } else used += l
      }
      assert(r.getAs[Long]("n_docs") === lens.length, s"shard $shard n_docs")
      assert(r.getAs[Long]("total_tokens") === lens.map(_.toLong).sum, s"shard $shard tokens")
      assert(r.getAs[Int]("n_bins") === bins, s"shard $shard bins")
      // next-fit never does worse than 2x the volume lower bound
      val lb = (lens.map(_.toLong).sum + 255) / 256
      assert(bins <= 2 * lb, s"shard $shard next-fit bound")
    }
  }

  test("P8 property: role swap is an involution on user/assistant histories") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val roles = Seq.fill(50)(if (rnd.nextBoolean()) "user" else "assistant")
    val df = Seq(Tuple1(roles)).toDF("roles")
    def swap(c: org.apache.spark.sql.Column) = transform(c, r =>
      when(r === "user", "assistant").when(r === "assistant", "user").otherwise(r))
    val twice = df.select(swap(swap(col("roles"))).as("r2")).collect()(0)
      .getAs[scala.collection.Seq[String]]("r2")
    assert(twice === roles)
  }
}
