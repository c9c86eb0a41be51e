package graft.sources

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructType}
import org.apache.spark.sql.vectorized.ColumnarBatch

/** STORAGE-PARTITIONED JOIN support for the lake's V2 read path — the
  * Iceberg SPJ shape: when every live manifest of a snapshot shares
  * one hidden-partition spec whose transforms a join can key on
  * (identity of an integral column, or bucket), the scan reports
  * [[org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning]]
  * and plans ONE input partition per distinct partition value, each
  * carrying its key ([[KeyedFilePartition]]). Two lake tables
  * co-partitioned on the join key then join with ZERO shuffle
  * exchanges — at 100 TB this deletes the dominant cost of a big-big
  * join (both sides' full-table shuffle), which is why the layout was
  * bucketed in the first place.
  *
  * Engages only under `spark.sql.sources.v2.bucketing.enabled=true`
  * (Spark's own SPJ gate). Bucket transforms additionally need the
  * scan to come from a catalog exposing the `bucket` function
  * ([[GraftBucketFunction]] on [[GraftCatalog]]) — Spark resolves the
  * reported transform against the table's FunctionCatalog; path-based
  * reads can SPJ on identity transforms only. */
private[sources] object GraftLakeSpj {

  /** The keyable layout of snapshot `v`: its uniform hidden-partition
    * spec restricted to join-usable transforms, with the V2 transform
    * expressions and the key row type. None ⇒ report Unknown (mixed
    * spec generations after partition evolution, or non-integral
    * identity sources). day/truncate transforms ARE join-keyable
    * (round 8): their index is a deterministic function of the source
    * column, so rows with equal join keys land in equal partitions —
    * Spark proves it by resolving the reported `day`/`truncate`
    * transform against the catalog's FunctionCatalog
    * ([[GraftDayFunction]]/[[GraftTruncateFunction]], the exact
    * write-side floor-div arithmetic), the same route `bucket` takes.
    * Like bucket, they need a catalog read; path reads SPJ on
    * identity only. */
  final case class KeyedLayout(
      spec: Seq[LakeTable.PartitionTransform],
      transforms: Array[Transform],
      keyTypes: Seq[DataType])

  def layoutOf(path: String, v: Int, schema: StructType): Option[KeyedLayout] = {
    val live = LakeTable.listRefs(path, v)
      .filter(r => r.kind == "data" && r.nFiles > 0)
    if (live.isEmpty) return None
    val spec = live.head.pspec
    if (spec.isEmpty || live.exists(_.pspec != spec)) return None
    def longSource(t: LakeTable.PartitionTransform): Boolean =
      schema.fields.find(_.name == t.source).exists(_.dataType == LongType)
    val parts = spec.map { t =>
      t.kind match {
        case "bucket" =>
          Some((Expressions.bucket(t.param.toInt, t.source): Transform, LongType: DataType))
        case "identity" =>
          schema.fields.find(_.name == t.source).map(_.dataType).collect {
            case IntegerType => (Expressions.identity(t.source), IntegerType: DataType)
            case LongType => (Expressions.identity(t.source), LongType: DataType)
          }
        case "day" if longSource(t) =>
          Some((Expressions.apply("day",
            Expressions.column(t.source)): Transform, LongType: DataType))
        // hour/month/year indices are deterministic single-leaf
        // functions of the source column, so they are join-keyable
        // exactly like day — Spark resolves each reported transform
        // against the catalog's matching layout function
        case ("hour" | "month" | "year") if longSource(t) =>
          Some((Expressions.apply(t.kind,
            Expressions.column(t.source)): Transform, LongType: DataType))
        // truncate: prunable but NOT join-keyable on this Spark —
        // KeyGroupedPartitioning.satisfies0 requires every partition
        // expression to have exactly one leaf (the literal width
        // would be a second leaf; only bucket's literal is special-
        // cased into TransformExpression.numBucketsOpt), so a
        // reported truncate transform could never satisfy the join's
        // clustered distribution. Verified against the 4.1.2
        // bytecode; SpjSpec pins the documented fallback.
        case _ => None
      }
    }
    if (parts.exists(_.isEmpty)) None
    else Some(KeyedLayout(spec,
      parts.flatten.map(_._1).toArray, parts.flatten.map(_._2)))
  }

  /** The partition-key row of one data file, parsed from its hidden
    * `__p_…=value` dir segments per the layout — None when any
    * segment is missing/unparseable (caller falls back to Unknown;
    * correctness never depends on the key). */
  def keyOf(layout: KeyedLayout, file: String): Option[InternalRow] = {
    val segs = file.split('/')
    val vals = layout.spec.zip(layout.keyTypes).map { case (t, dt) =>
      val pre = s"${LakeTable.hiddenColName(t)}="
      segs.find(_.startsWith(pre)).map(_.drop(pre.length))
        .flatMap(s => scala.util.Try(s.toLong).toOption)
        .map(v => if (dt == IntegerType) Int.box(v.toInt) else Long.box(v))
    }
    if (vals.exists(_.isEmpty)) None
    else Some(new GenericInternalRow(vals.flatten.toArray[Any]))
  }

  /** Group a planned file set into one keyed input partition per
    * distinct partition value (sorted by key string for a
    * deterministic partition order). None if any file lacks a key. */
  def groupByKey(
      layout: KeyedLayout, files: Seq[String]): Option[Array[InputPartition]] = {
    val keyed = files.map(f => keyOf(layout, f).map(k => (k, f)))
    if (keyed.exists(_.isEmpty)) return None
    val groups = keyed.flatten
      .groupBy(_._1.toSeq(layout.keyTypes))
      .toSeq.sortBy(_._1.mkString(","))
    Some(groups.zipWithIndex.map { case ((_, kfs), i) =>
      new KeyedFilePartition(i, kfs.map(kf => partitionedFile(kf._2)).toArray,
        kfs.head._1): InputPartition
    }.toArray)
  }

  /** One keyed input partition PER FILE — the PARTIALLY-CLUSTERED
    * distribution shape (S9c): under
    * `spark.sql.sources.v2.bucketing.partiallyClusteredDistribution
    * .enabled` Spark's own SPJ machinery takes over the grouping — it
    * merges same-key splits when both sides are balanced, and on a
    * SKEWED side keeps the splits apart while REPLICATING the other
    * side's matching partition across them, so one hot partition
    * value no longer serializes into one task (Iceberg's
    * partially-clustered mode). The connector's job is only to hand
    * Spark split-granular keyed partitions; sorted (key, file) for a
    * deterministic order. None if any file lacks a key. */
  def perFileKeyed(
      layout: KeyedLayout, files: Seq[String]): Option[Array[InputPartition]] = {
    val keyed = files.map(f => keyOf(layout, f).map(k => (k, f)))
    if (keyed.exists(_.isEmpty)) return None
    Some(keyed.flatten
      .sortBy { case (k, f) => (k.toSeq(layout.keyTypes).mkString(","), f) }
      .zipWithIndex
      .map { case ((k, f), i) =>
        new KeyedFilePartition(i, Array(partitionedFile(f)), k): InputPartition
      }.toArray)
  }

  private def partitionedFile(f: String): PartitionedFile = {
    val size = java.nio.file.Files.size(java.nio.file.Paths.get(f))
    PartitionedFile(
      partitionValues = InternalRow.empty,
      filePath = SparkPath.fromPathString(f),
      start = 0L, length = size, fileSize = size)
  }
}

/** One storage partition: all files of one hidden-partition value,
  * keyed for Spark's SPJ grouping. */
class KeyedFilePartition(
    val index: Int, val files: Array[PartitionedFile], key: InternalRow)
    extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow = key
  def asFilePartition: FilePartition = FilePartition(index, files)
}

/** Delegates to the parquet reader factory, unwrapping
  * [[KeyedFilePartition]] to the [[FilePartition]] it expects. */
class KeyedReaderFactory(inner: PartitionReaderFactory)
    extends PartitionReaderFactory {
  private def unwrap(p: InputPartition): InputPartition = p match {
    case k: KeyedFilePartition => k.asFilePartition
    case other => other
  }
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    inner.createReader(unwrap(p))
  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] =
    inner.createColumnarReader(unwrap(p))
  override def supportColumnarReads(p: InputPartition): Boolean =
    inner.supportColumnarReads(unwrap(p))
}

/** The `bucket(numBuckets, col)` function of [[GraftCatalog]] —
  * Spark resolves a scan-reported bucket transform against the
  * table's FunctionCatalog to build the join-compatibility
  * expression; the semantics here are EXACTLY the write-side layout
  * function (`pmod(xxhash64(v), N)`, seed 42), so a key provably
  * lands in the partition the scan claims. */
/** The `day(col)` layout function: epoch-seconds LONG → day index by
  * exact integer floor division — bit-identical to the write-side
  * `(v − pmod(v, 86400)) DIV 86400`, so a key provably lands in the
  * partition the scan claims. */
object GraftDayFunction extends UnboundFunction {
  override def name(): String = "day"
  override def description(): String =
    "day(epochSeconds): floorDiv(v, 86400) — the lake's hidden day-partition index"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1 && inputType.fields(0).dataType == LongType,
      s"day takes (epochSeconds BIGINT), got $inputType")
    new ScalarFunction[java.lang.Long] {
      override def inputTypes(): Array[DataType] = Array(LongType)
      override def resultType(): DataType = LongType
      override def name(): String = "day"
      override def canonicalName(): String = "graftlake.day"
      override def isResultNullable: Boolean = false
      override def produceResult(input: InternalRow): java.lang.Long =
        Math.floorDiv(input.getLong(0), 86400L)
    }
  }
}

/** The `hour`/`month`/`year` layout functions: epoch-seconds LONG →
  * the transform's partition index, bit-identical to the write-side
  * expression — hour by exact floor division, month/year through the
  * timezone-free epoch-day calendar (`date_from_unix_date` on the
  * write side, `LocalDate.ofEpochDay` here — both proleptic
  * Gregorian). Deterministic single-leaf functions, so Spark can key
  * a storage-partitioned join on them exactly like `day`. */
class GraftTimeUnitFunction private (unit: String) extends UnboundFunction {
  override def name(): String = unit
  override def description(): String =
    s"$unit(epochSeconds): the lake's hidden $unit-partition index"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1 && inputType.fields(0).dataType == LongType,
      s"$unit takes (epochSeconds BIGINT), got $inputType")
    new ScalarFunction[java.lang.Long] {
      override def inputTypes(): Array[DataType] = Array(LongType)
      override def resultType(): DataType = LongType
      override def name(): String = unit
      override def canonicalName(): String = s"graftlake.$unit"
      override def isResultNullable: Boolean = false
      override def produceResult(input: InternalRow): java.lang.Long = {
        val sec = input.getLong(0)
        unit match {
          case "hour" => Math.floorDiv(sec, 3600L)
          case _ =>
            val d = java.time.LocalDate.ofEpochDay(Math.floorDiv(sec, 86400L))
            if (unit == "year") (d.getYear - 1970).toLong
            else (d.getYear - 1970).toLong * 12 + (d.getMonthValue - 1)
        }
      }
    }
  }
}

object GraftTimeUnitFunction {
  val Hour = new GraftTimeUnitFunction("hour")
  val Month = new GraftTimeUnitFunction("month")
  val Year = new GraftTimeUnitFunction("year")
}

object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, col): pmod(xxhash64(col), numBuckets) — the lake's hidden-partition layout hash"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets INT, value BIGINT), got $inputType")
    require(inputType.fields(1).dataType == LongType,
      s"bucket transform supports BIGINT sources, got ${inputType.fields(1).dataType}")
    new ScalarFunction[java.lang.Long] {
      override def inputTypes(): Array[DataType] = Array(IntegerType, LongType)
      override def resultType(): DataType = LongType
      override def name(): String = "bucket"
      override def canonicalName(): String = "graftlake.bucket"
      override def isResultNullable: Boolean = false
      override def produceResult(input: InternalRow): java.lang.Long = {
        val n = input.getInt(0)
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(input.getLong(1), 42L)
        ((h % n) + n) % n
      }
    }
  }
}
