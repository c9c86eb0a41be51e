package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{GraftSqlShim, SparkSession}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.{FileStatusCache, InMemoryFileIndex}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The lake CHANGE FEED as a native V2 streaming source —
  *
  * {{{
  *   spark.readStream.format("graftlake")
  *     .option("changeFeed", "true").load(path)
  * }}}
  *
  * Offsets are VERSION numbers (the natural CDC cursor of a
  * versioned table): each micro-batch delivers exactly the row-level
  * change-data of one commit, read from the `_changelog/v=N` files
  * that [[LakeTable.materializeChanges]] writes once per version
  * (compute-once, any number of consumers — the Delta `_change_data`
  * design). The actual reading is Spark's own vectorized
  * [[ParquetScan]] over the version directories, so the streaming
  * path shares the batch path's reader, schema clipping across
  * rename generations, and the `v` partition column from dir names.
  *
  * Admission control steps ONE VERSION PER BATCH: at 100 TB a commit
  * is the natural bounded unit of progress (a batch can never grow
  * past the largest single commit), and restart resumes from the
  * checkpointed version offset — exactly-once without any file-level
  * bookkeeping. `Trigger.AvailableNow` pins the materialized head at
  * prepare time and drains version by version to it. */
class GraftLakeChangeScan(
    spark: SparkSession, path: String, fullSchema: StructType,
    lineage: Boolean = false, maxVersions: Int = 1,
    allowDataLoss: Boolean = false)
    extends Scan {
  override def readSchema(): StructType = fullSchema
  override def description(): String =
    s"GraftLakeChangeScan(${if (lineage) "lineage " else ""}changeFeed of $path)"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftLakeMicroBatchStream(
      spark, path, fullSchema, lineage, maxVersions, allowDataLoss)
}

/** `lineage = true` serves the LINEAGE change feed (S11e,
  * `.option("changeFeed", "lineage")`): the same version-offset
  * machinery over `_changelog_lineage/v=N` files, whose rows key on
  * the durable `_row_id` and pair updates as preimage/postimage
  * ([[LakeTable.changesWithLineage]] per version) — Delta-CDF-style
  * streaming update pairs with a stable row identity. */
class GraftLakeMicroBatchStream(
    spark: SparkSession, path: String, fullSchema: StructType,
    lineage: Boolean = false,
    // versions admitted per micro-batch (`maxVersionsPerTrigger`):
    // 1 = the strict bounded-progress default; raising it trades
    // per-batch boundedness for catch-up throughput on a lagging
    // consumer — batches stay version-ALIGNED either way (an offset
    // is always a whole version, never a partial commit)
    maxVersions: Int = 1,
    // DATA-LOSS CONTRACT (round-11 "wrong" #1): a version in range
    // with no materialized changelog (its parent snapshot was expired
    // before the change-data could be computed) REFUSES at offset
    // admission, naming the versions — "deliver what exists" silently
    // loses committed changes for a lagging consumer resuming after a
    // retention run. `option("allowDataLoss", "true")` is the
    // explicit opt-out (Delta's failOnDataLoss shape): the gap is
    // skipped and delivery continues from the first version that
    // still has change-data.
    allowDataLoss: Boolean = false)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  require(maxVersions >= 1,
    s"maxVersionsPerTrigger must be >= 1, got $maxVersions")

  private case class VOffset(v: Int) extends Offset {
    override def json(): String = v.toString
  }

  private val changelog = LakeTable.changelogDirOf(path, lineage)

  // the changelog's layout splits the schema: `v` comes from dir
  // names (partition column), everything else from the files
  private val partSchema = StructType(fullSchema.fields.filter(_.name == "v"))
  private val dataSchema = StructType(fullSchema.fields.filterNot(_.name == "v"))

  private def materializedMax(): Int = {
    val dir = Paths.get(changelog)
    if (!Files.isDirectory(dir)) return -1
    val ls = Files.list(dir)
    try ls.iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toInt)
      .foldLeft(-1)(math.max)
    finally ls.close()
  }

  // AvailableNow contract: pin the head ONCE at prepare time; the
  // engine then drains batches until offsets reach it
  @volatile private var pinned: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    LakeTable.materializeChanges(spark, path, lineage)
    pinned = Some(materializedMax())
  }

  private def head(): Int = pinned.getOrElse {
    LakeTable.materializeChanges(spark, path, lineage)
    materializedMax()
  }

  /** Versions in (from, to] whose change-data is UNOBTAINABLE: no
    * materialized changelog slot AND the snapshot (or its diff
    * parent) is expired. A missing slot whose snapshot and parent are
    * both live is merely PENDING — the next materializer pass fills
    * it — and is not a gap. */
  private def unmaterializable(from: Int, to: Int): Seq[Int] =
    ((from + 1) to to).filter { v =>
      !Files.isDirectory(Paths.get(s"$changelog/v=$v")) &&
        (!LakeTable.snapshotLive(path, v) ||
          (v > 0 && !LakeTable.snapshotLive(path, v - 1)))
    }

  /** Refuse (by version, pointing at the expire) instead of silently
    * delivering a gap — unless the consumer opted into data loss. */
  private def requireNoGap(from: Int, to: Int): Unit = {
    if (allowDataLoss) return
    val gap = unmaterializable(from, to)
    if (gap.nonEmpty) throw new IllegalStateException(
      s"graftlake ${if (lineage) "lineage " else ""}changeFeed at $path: " +
        s"version${if (gap.size > 1) "s" else ""} ${gap.mkString(", ")} in " +
        s"($from, $to] ${if (gap.size > 1) "have" else "has"} no " +
        "materializable changelog — the parent snapshot was expired " +
        "(expire_snapshots) before the change-data could be computed, so " +
        "delivering this range would silently skip committed changes. " +
        "Restart from a fresh checkpoint to take a new initial snapshot, " +
        "or opt into the gap explicitly with " +
        "option(\"allowDataLoss\", \"true\"). Tables with live change-feed " +
        "consumers avoid this entirely: expire_snapshots materializes " +
        "pending changelog versions before removing their parents whenever " +
        "the changelog directory exists.")
  }

  override def initialOffset(): Offset = VOffset(-1)

  // the no-arg form carries no START, so it cannot know whether a
  // gap lies ahead of THIS consumer — the admission-control form
  // below (which the engine uses: SupportsTriggerAvailableNow extends
  // SupportsAdmissionControl) and planInputPartitions enforce the
  // contract against the consumer's actual position
  override def latestOffset(): Offset = VOffset(head())

  /** At most `maxVersions` versions per micro-batch (default 1 — the
    * bounded-progress contract; offsets are whole versions always).
    * ADMISSION is where the data-loss contract bites: an offset range
    * containing an unmaterializable version is refused before it can
    * enter the offset log. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[VOffset].v
    val to = math.min(from + maxVersions, math.max(head(), from))
    // probe past the MATERIALIZED head to the TABLE head: when every
    // materializable version is behind an expired gap the materialized
    // head never advances, and a consumer below the gap would
    // otherwise idle silently forever instead of refusing
    val tableHead = LakeTable.latestVersion(path).getOrElse(-1)
    requireNoGap(from, math.max(to, math.min(from + maxVersions, tableHead)))
    VOffset(to)
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def reportLatestOffset(): Offset = VOffset(head())

  private def scanFor(versions: Seq[Int]): ParquetScan = {
    val dirs = versions.map(v => new Path(s"$changelog/v=$v"))
    val index = new InMemoryFileIndex(
      spark, dirs, Map("basePath" -> changelog), Some(dataSchema),
      FileStatusCache.getOrCreate(spark))
    ParquetScan(
      spark, GraftSqlShim.hadoopConf(spark), index,
      dataSchema = dataSchema, readDataSchema = dataSchema,
      readPartitionSchema = partSchema,
      pushedFilters = Array.empty,
      options = CaseInsensitiveStringMap.empty())
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[VOffset].v
    val to = end.asInstanceOf[VOffset].v
    // admission already refused gaps, but an ALREADY-ADMITTED batch
    // replayed from the checkpoint after a concurrent expire must
    // refuse here too (same contract, same opt-out)
    requireNoGap(from, to)
    val versions = ((from + 1) to to)
      .filter(v => Files.isDirectory(Paths.get(s"$changelog/v=$v")))
    if (versions.isEmpty) return Array.empty
    scanFor(versions.toSeq).toBatch.planInputPartitions()
  }

  /** One factory serves every batch: all batches share the changelog's
    * (data, partition) schema split, and the factory reads whatever
    * FilePartition it is handed. */
  override def createReaderFactory(): PartitionReaderFactory =
    scanFor(((0 to materializedMax())
      .filter(v => Files.isDirectory(Paths.get(s"$changelog/v=$v")))).toSeq match {
      case Nil => throw new IllegalStateException(
        s"graftlake changeFeed at $path: no materialized changelog versions")
      case vs => vs
    }).toBatch.createReaderFactory()

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def deserializeOffset(json: String): Offset = VOffset(json.trim.toInt)
}

/** The lake TABLE as a native V2 streaming SOURCE (the Delta-shaped
  * append-following read, complementing the change feed):
  *
  * {{{
  *   spark.readStream.format("graftlake").load(path)
  * }}}
  *
  * Offsets are VERSION numbers; micro-batch `v` delivers exactly the
  * files the FRESH data manifests of commit `v` reference — an
  * append-only tail of the table, with the initial snapshot arriving
  * as version 0's batch. Admission control steps one version per
  * batch (bounded progress: a batch can never outgrow the largest
  * single commit), and the engine's offset checkpoint gives
  * exactly-once resume across restarts.
  *
  * HONEST CONTRACT for non-append commits: a version that CHANGES
  * rows (overwrite past v0, delete, merge — anything whose fresh
  * files do not purely ADD rows) REFUSES loudly, because delivering
  * its fresh files would double-count rewritten rows and silently
  * skip deletions. `option("skipChangeCommits", "true")` opts into
  * skipping such versions wholesale (Delta's semantics: downstream
  * sees appends only, never retractions). Row-PRESERVING maintenance
  * (compact/z-order/binpack/bloom) and pure metadata commits
  * (constraints, add_column) deliver as EMPTY batches — no row
  * changed, so a follower has nothing to see and nothing to die
  * over (round-7 ADVICE). rename/drop column still refuse: the
  * stream's schema is pinned at start and post-rename appends would
  * null-fill through it. Hive-partitioned commits refuse too — their
  * dir-encoded partition values cannot ride a bare file scan. */
class GraftLakeTableStream(
    spark: SparkSession, path: String, tableSchema: StructType,
    skipChangeCommits: Boolean,
    // see GraftLakeMicroBatchStream: whole-version offsets, at most
    // this many versions admitted per micro-batch
    maxVersions: Int = 1)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  require(maxVersions >= 1,
    s"maxVersionsPerTrigger must be >= 1, got $maxVersions")

  private case class VOffset(v: Int) extends Offset {
    override def json(): String = v.toString
  }

  // S9d guard inputs, pinned at STREAM START like the schema itself:
  // the question is "does the PINNED schema contain a defaulted
  // column whose constant this file scan cannot fill" — so the
  // defaults in force when the schema was pinned decide it. Reading
  // a DELIVERED version's own defaults would pass pre-add versions
  // vacuously (their defaults map is empty — exactly the manifests
  // that omit the field id) and silently null-fill a post-compact
  // historical replay.
  private val pinnedDefaults: Seq[(Int, String, String)] =
    LakeTable.latestVersion(path).toSeq.flatMap { v =>
      val names = LakeTable.schemaOf(path, v).getOrElse(Nil).toMap
      LakeTable.defaultsOf(path, v).toSeq.flatMap { case (id, d) =>
        names.get(id).filter(tableSchema.fieldNames.contains)
          .map(n => (id, n, d))
      }
    }

  // append ops deliver; v0's initial content (plain overwrite or an
  // atomic CTAS — both purely additive at v0) is the snapshot batch
  private def deliverable(v: Int): Boolean =
    LakeTable.operationOf(path, v) match {
      // a cherry-pick commit adds fresh manifests and nothing else
      // ([[LakeTable.cherryPick]]) — to a follower it IS an append
      case "append" | "streaming-append" | "cherrypick" => true
      case "overwrite" | "ctas" if v == 0 => true
      case _ => false
    }

  /** Ops whose commit changes no ROW of the table — maintenance
    * rewrites (row-preserving) and pure metadata commits. A follower
    * stream sees them as EMPTY batches instead of dying (round-7
    * ADVICE: a constraint added mid-stream killed every follower
    * unless skipChangeCommits was set; Delta delivers metadata
    * commits as empty batches). Deliberately NOT here: rename/drop
    * column (the stream's schema is pinned at start, and appends
    * AFTER a rename would silently null-fill the renamed column
    * through the old schema), and ANY op outside this list —
    * rollback / delete-all / overwrite-to-empty also carry no fresh
    * manifests but REMOVE rows, so a generic no-fresh-manifests test
    * would silently swallow retractions (round-8 review catch).
    * Enumerated allow-list only. */
  private val emptyBatchOps = Set(
    "compact", "optimize", "zorder", "binpack", "bloom",
    "add_constraint", "drop_constraint", "add_column",
    // a DEFAULTED add (S9d) is also a zero-file metadata commit; the
    // stream's pinned schema predates the column, so deliveries never
    // need the constant filled (files carrying it are schema-clipped,
    // exactly like a plain add_column) — the hole only exists for
    // streams whose PINNED schema includes a defaulted column, and
    // filesOf refuses those per delivered version below
    "add_column_default")

  /** Fresh DATA manifests of commit `v` (not carried from `v-1`). */
  private def freshRefs(v: Int): Seq[LakeTable.ManifestRef] = {
    val prev: Set[String] =
      if (v == 0) Set.empty
      else LakeTable.listRefs(path, v - 1).map(_.manifest).toSet
    LakeTable.listRefs(path, v).filterNot(r => prev.contains(r.manifest))
  }

  private def filesOf(v: Int): Seq[String] = {
    if (!deliverable(v)) {
      val op = LakeTable.operationOf(path, v)
      // ONLY the enumerated row-preserving/metadata ops deliver empty
      // batches. A generic "no fresh manifests" test would be wrong:
      // rollback, delete-all and overwrite-to-empty also carry no
      // fresh manifests yet REMOVE rows — those must keep refusing
      // loudly (round-8 review catch).
      if (emptyBatchOps(op)) return Nil
      if (skipChangeCommits) return Nil
      if (op == "promote_type") throw new UnsupportedOperationException(
        s"graftlake stream at $path: version $v is a 'promote_type' metadata " +
          "commit — the stream's schema is pinned at start and cannot adopt " +
          "the widened type (files written wide afterwards would not read " +
          "through the narrow pinned schema). Restart the stream to pick up " +
          "the promoted schema, or skipChangeCommits to keep the narrow view " +
          "of pre-promotion data only.")
      throw new UnsupportedOperationException(
        s"graftlake stream at $path: version $v is a " +
          s"'${LakeTable.operationOf(path, v)}' commit — its files rewrite or " +
          "remove rows, which an append-following stream cannot represent. " +
          "Use option(\"skipChangeCommits\", \"true\") to skip such versions, " +
          "or the change feed (option(\"changeFeed\", \"true\")) for row-level " +
          "change data.")
    }
    val fresh = freshRefs(v)
    // S9d: when the PINNED schema includes a DEFAULTED column, a
    // fresh manifest that omits its field id serves the constant on
    // the library read — a raw file scan would silently null-fill it.
    // Refuse exactly like the batch V2 scan (compact materializes
    // defaults and lifts this); streams pinned BEFORE the add are
    // unaffected (the column is not in their schema at all). The
    // defaults are the stream-start set ([[pinnedDefaults]]) so a
    // historical replay of PRE-ADD versions refuses too.
    for {
      (id, n, d) <- pinnedDefaults
      r <- fresh if r.nFiles > 0 && !r.cols.values.exists(_ == id)
    } throw new UnsupportedOperationException(
      s"graftlake stream at $path: version $v delivers files that omit " +
        s"defaulted column '$n' (default $d) — constant fill is a " +
        "library-read feature a bare file scan cannot apply; " +
        "LakeTable.compact(...) materializes defaults, or read the change " +
        "feed (option(\"changeFeed\", \"true\"))")
    fresh.foreach { r =>
      require(r.kind == "data",
        s"graftlake stream at $path: version $v carries a fresh '${r.kind}' " +
          "manifest (merge-on-read) — not an append")
    }
    val entries = fresh.flatMap(LakeTable.readManifest)
    entries.map(_.file).filter { f =>
      // hive layout check: a file under a non-hidden `col=value` dir
      // would read its partition column back as null
      val bad = f.split('/').exists(seg =>
        seg.contains('=') && !seg.startsWith("__p_") && !seg.endsWith(".parquet"))
      if (bad) throw new UnsupportedOperationException(
        s"graftlake stream at $path: version $v holds hive-partitioned file " +
          s"$f — dir-encoded values cannot ride a bare file scan; read the " +
          "change feed instead")
      true
    }
  }

  @volatile private var pinned: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    pinned = Some(LakeTable.latestVersion(path).getOrElse(-1))

  private def head(): Int =
    pinned.getOrElse(LakeTable.latestVersion(path).getOrElse(-1))

  override def initialOffset(): Offset = VOffset(-1)
  override def latestOffset(): Offset = VOffset(head())

  /** At most `maxVersions` versions per micro-batch (default 1). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[VOffset].v
    VOffset(math.min(from + maxVersions, math.max(head(), from)))
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def reportLatestOffset(): Offset = VOffset(head())

  private def scanFor(files: Seq[String]): ParquetScan = {
    val index = new InMemoryFileIndex(
      spark, files.map(new Path(_)), Map.empty, Some(tableSchema),
      FileStatusCache.getOrCreate(spark))
    ParquetScan(
      spark, GraftSqlShim.hadoopConf(spark), index,
      dataSchema = tableSchema, readDataSchema = tableSchema,
      readPartitionSchema = new StructType(),
      pushedFilters = Array.empty,
      options = CaseInsensitiveStringMap.empty())
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[VOffset].v
    val to = end.asInstanceOf[VOffset].v
    val files = ((from + 1) to to).flatMap(filesOf)
    if (files.isEmpty) Array.empty
    else scanFor(files).toBatch.planInputPartitions()
  }

  /** One factory serves every batch: all versions share the table
    * schema (older vintages null-extend through schema clipping). */
  override def createReaderFactory(): PartitionReaderFactory =
    scanFor(Nil).toBatch.createReaderFactory()

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def deserializeOffset(json: String): Offset = VOffset(json.trim.toInt)
}
