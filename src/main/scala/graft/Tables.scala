package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated tables (TESTDATA.md / FIXTURES.md §2).
  *
  * All tables are parquet; schemas are inferred from the files (they are
  * driver-controlled and stable). At 100 TB these would be partitioned
  * lake tables — the loaders keep the access path behind one function so
  * a future catalog/table-format source swaps in without touching query
  * code.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables that should always be broadcast in joins.
    * region=5, nation=25, supplier≈10·sf rows — far below any sane
    * autoBroadcastJoinThreshold, but we hint explicitly so plans stay
    * broadcast even if thresholds change on a real cluster.
    */
  val broadcastDims: Set[String] = Set("region", "nation", "supplier")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts vintage drift: older driver data is parquet
    // TIMESTAMP(NANOS) (Spark 4 refuses it by default — read as
    // LongType ns-since-epoch via the legacy conf), newer driver data
    // is TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ). Both normalize to
    // the SAME canonical form — ns-since-epoch LongType, as-if-UTC —
    // so every consumer and every DuckDB oracle (epoch_ns(ts)) sees
    // one representation regardless of the vintage on disk.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** Canonicalize a `ts` column to ns-since-epoch LongType. µs-vintage
    * data arrives as TIMESTAMP_NTZ; with the session at UTC the
    * NTZ→LTZ cast is micros-identity, so `unix_micros * 1000` is the
    * exact naive instant DuckDB's `epoch_ns` reports for the same
    * file. ns-vintage data already reads as Long (no-op). */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts") match {
      case Some(f) if f.dataType == org.apache.spark.sql.types.TimestampNTZType ||
          f.dataType == org.apache.spark.sql.types.TimestampType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("unix_micros(cast(ts as timestamp)) * 1000L"))
      case _ => df
    }

  /** events.ts (ns long) → µs-since-epoch long. Integral `div`, NOT
    * `/`: float division on a ~1.7e18 ns value loses precision before
    * truncation. µs granularity is also what the DuckDB oracle sees
    * (it truncates parquet TIMESTAMP(NANOS) to µs on read), so µs is
    * the only cross-engine-comparable form of this column. */
  def tsMicros(colName: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.expr(s"$colName div 1000")

  /** events.ts (ns long) → integral time-bucket index at µs
    * granularity: (ts div 1000) div widthMicros — ONE definition for
    * every hour/day/week bucketing (integral `div` throughout; float
    * division loses precision at 1.7e18 ns). Mirrors the oracles'
    * epoch_us(ts) // width. */
  def tsBucket(colName: String, widthMicros: Long): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.expr(
      s"($colName div 1000) div ${widthMicros}L")

  /** events.ts (ns long) → microsecond TimestampType column. */
  def tsFromNanos(colName: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.timestamp_micros(tsMicros(colName))

  /** Load + spread across the session's shuffle partitions. The driver
    * parquet files are single-split at test scale, so CPU-heavy
    * expression pipelines (hashing, per-doc HOF math) would otherwise
    * run on ONE core. The shuffled payload is the small raw table; at
    * 100 TB the source has thousands of splits and this repartition is
    * a no-op to remove. */
  def loadParallel(spark: SparkSession, dir: String, name: String): DataFrame =
    load(spark, dir, name)
      .repartition(spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)

  /** Register all tables as temp views (for spark.sql paths and tests). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
