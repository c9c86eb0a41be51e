package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink coverage (SURVEY.md §2.1 S1/S2/S4/S7): JSON and CSV
  * scans with explicit schemas, sink round-trips, and the reference's
  * multiLine JSON corpus shape (`utils/data_preprocess.py:86-89`). */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val sfDir = "/root/testdata/sf0.001"

  test("S4/S1: JSON sink then scan round-trips rows and values") {
    val out = "/tmp/graft_test/events_json"
    val src = Tables.load(spark, sfDir, "events")
      .select("event_id", "user_id", "event_type", "value")
    src.write.mode("overwrite").json(out)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    val back = spark.read.schema(schema).json(out)
    assert(back.count() === src.count())
    val a = src.orderBy("event_id").collect().map(_.toSeq)
    val b = back.orderBy("event_id").collect().map(_.toSeq)
    assert(a.sameElements(b) || a.zip(b).forall { case (x, y) => x == y })
  }

  test("S7/S2: CSV sink then scan with explicit schema round-trips") {
    val out = "/tmp/graft_test/part_csv"
    val src = Tables.load(spark, sfDir, "part")
      .select("p_partkey", "p_name", "p_size", "p_retailprice")
    src.write.mode("overwrite").option("header", "true").csv(out)
    val schema = StructType(Seq(
      StructField("p_partkey", LongType), StructField("p_name", StringType),
      StructField("p_size", IntegerType), StructField("p_retailprice", DoubleType)))
    val back = spark.read.schema(schema).option("header", "true").csv(out)
    assert(back.count() === src.count())
    assert(back.agg(sum("p_retailprice")).collect()(0).getDouble(0)
      === src.agg(sum("p_retailprice")).collect()(0).getDouble(0))
  }

  test("S1: multiLine JSON dialogue corpus scans with nested schema") {
    // the reference's corpus shape (FIXTURES.md §1.1), incl. unsorted
    // turn_ids and a speakerless round
    val json =
      """[
        |  {"dia_id": "d1", "seed": "s", "story": "st", "first_explanation": "fe",
        |   "dialogue": [
        |     {"turn_id": 2, "turns": [{"role": "speaker", "text": " hello2 "}]},
        |     {"turn_id": 1, "turns": [{"role": "listener", "text": "resp1"},
        |                               {"role": "speaker_x", "text": "hello1"}]},
        |     {"turn_id": 3, "turns": [{"role": "observer", "text": "nope"}]}
        |   ]}
        |]""".stripMargin
    val dir = Paths.get("/tmp/graft_test")
    Files.createDirectories(dir)
    val f = dir.resolve("corpus.json")
    Files.writeString(f, json)
    val df = spark.read.option("multiLine", "true").json(f.toString)
    // sort rounds by turn_id, pull first speaker* text per round, trim, drop misses
    val sorted = df.select(col("dia_id"),
      array_sort(col("dialogue"), (a, b) =>
        a.getField("turn_id").cast("int") - b.getField("turn_id").cast("int")).as("dialogue"))
    val script = sorted.select(col("dia_id"),
      filter(
        transform(col("dialogue"), r =>
          trim(try_element_at(
            filter(r.getField("turns"), t => lower(t.getField("role")).startsWith("speaker")),
            lit(1)).getField("text"))),
        x => x.isNotNull && length(x) > 0).as("user_script"))
    val row = script.collect()(0)
    assert(row.getAs[String]("dia_id") === "d1")
    assert(row.getAs[scala.collection.Seq[String]]("user_script") === Seq("hello1", "hello2"))
  }

  test("ORC sink then scan round-trips rows with predicate pushdown") {
    val out = "/tmp/graft_test/events_orc"
    val src = Tables.load(spark, sfDir, "events")
      .select("event_id", "user_id", "event_type", "value")
    src.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.count() === src.count())
    val filtered = back.filter(col("event_type") === "purchase")
    assert(filtered.count() === src.filter(col("event_type") === "purchase").count())
    // predicate must reach the ORC scan (pushdown intact)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("event_type"),
      s"ORC pushdown missing:\n${plan.take(600)}")
  }

  test("P9: permissive JSON read null-defaults malformed rows and captures them") {
    // file-based leg of the permissive_ingest driver query: a corrupt
    // line parses to null columns + _corrupt_record instead of failing
    // the scan (reference ingest tolerates malformed dialogue rows)
    val dir = Paths.get("/tmp/graft_test")
    Files.createDirectories(dir)
    val f = dir.resolve("permissive.jsonl")
    Files.writeString(f,
      """{"id": 1, "lang": "en"}
        |{"id": 2, "lang": BROKEN
        |{"id": 3, "lang": "de"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("lang", StringType),
      StructField("_corrupt_record", StringType)))
    val df = spark.read.schema(schema).json(f.toString).cache()
    try {
      assert(df.count() === 3, "malformed row must not kill the scan")
      assert(df.filter(col("_corrupt_record").isNotNull).count() === 1)
      assert(df.filter(col("id").isNull && col("lang").isNull).count() === 1)
      assert(df.filter(col("lang") === "de").count() === 1)
    } finally df.unpersist()
  }

  test("F16: uuid() yields RFC-4122 values, distinct per row — excluded from oracles") {
    // uuid() is nondeterministic BY DESIGN, which is exactly why no
    // driver oracle may contain it (determinism contract, SURVEY.md
    // §4); this spec is its documented coverage.
    val ids = Tables.load(spark, sfDir, "region")
      .select(expr("uuid()").as("u")).collect().map(_.getString(0))
    val re = "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$".r
    ids.foreach(u => assert(re.matches(u), s"not a v4 uuid: $u"))
    assert(ids.distinct.length === ids.length, "uuids must be unique per row")
  }
}
