package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One Iceberg-style SQL maintenance procedure, served through
  * Spark 4's NATIVE `ProcedureCatalog` route — `CALL cat.system.p(…)`
  * parses in stock grammar, the analyzer binds named/positional
  * arguments and fills declared defaults against [[parameters]], and
  * the result surfaces as a one-row [[LocalScan]] (the honest plan
  * for a driver-computed summary). No custom parsing anywhere. */
private[sources] final class GraftProcedure(
    procName: String,
    params: Seq[ProcedureParameter],
    outSchema: StructType,
    desc: String)(
    body: Seq[Option[Any]] => Seq[Seq[Any]])
  extends UnboundProcedure with BoundProcedure {
  override def name(): String = procName
  override def description(): String = desc
  override def bind(inputType: StructType): BoundProcedure = this
  override def parameters(): Array[ProcedureParameter] = params.toArray
  override def isDeterministic: Boolean = false
  override def call(input: InternalRow): util.Iterator[Scan] = {
    val args = params.zipWithIndex.map { case (p, i) =>
      if (input.numFields <= i || input.isNullAt(i)) None
      else Some(input.get(i, p.dataType()) match {
        case s: UTF8String => s.toString
        case other => other
      })
    }
    val out = body(args)
    val scan: Scan = new LocalScan {
      override def readSchema(): StructType = outSchema
      override def rows(): Array[InternalRow] = out.map { r =>
        new GenericInternalRow(r.map {
          case s: String => UTF8String.fromString(s)
          case x => x.asInstanceOf[Any]
        }.toArray[Any])
      }.toArray
      override def description(): String = s"CALL $procName"
    }
    util.Collections.singletonList(scan).iterator()
  }
}

/** The `system` namespace procedure registry (Iceberg's procedure
  * names onto the lake's existing maintenance machinery — one commit
  * protocol whatever surface the op arrives through):
  *
  * {{{
  *   CALL cat.system.expire_snapshots(table => 'db.t', retain_last => 2)
  *   CALL cat.system.expire_snapshots(table => 'db.t', older_than => '2026-01-01')
  *   CALL cat.system.remove_orphan_files(table => 'db.t')
  *   CALL cat.system.rewrite_data_files(table => 'db.t')      -- binpack, 128 MiB
  *   CALL cat.system.rollback_to_snapshot(table => 'db.t', version => 3)
  *   CALL cat.system.rollback_to_timestamp(table => 'db.t', timestamp => '…')
  *   CALL cat.system.fast_forward(table => 'db.t', branch => 'audit')
  *   CALL cat.system.compute_table_stats(table => 'db.t' [, columns => 'a,b'])
  * }}}
  *
  * `table` resolves inside the calling catalog (`db.t`) or as an
  * absolute lake path. Unknown procedures fail loudly with the
  * supported list. */
private[sources] object GraftProcedures {

  private def in(n: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(n, dt).build()
  private def opt(n: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(n, dt).defaultValue("NULL").build()

  private def one(vs: Any*): Seq[Seq[Any]] = Seq(vs.toSeq)

  /** A `where` string → the repo's (column, lo, hi) stat boxes.
    * Supported: conjunctions of numeric `>= > <= < = BETWEEN` over
    * plain columns (BETWEEN parses to the >=/<= pair). Strict
    * bounds widen to inclusive — FILE selection is conservative by
    * contract, so admitting a boundary-only file is correct (its
    * rows are untouched either way). Anything else refuses by name:
    * silently ignoring a predicate would "compact everything" when
    * the caller asked for a slice. */
  private def whereBoxes(
      spark: SparkSession, where: String): Seq[(String, Double, Double)] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions._
    def num(l: Any): Option[Double] = l match {
      case n: java.lang.Number => Some(n.doubleValue)
      case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
      case _ => None
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def nameOf(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.name)
      case _ => None
    }
    val parsed = spark.sessionState.sqlParser.parseExpression(where)
    conjuncts(parsed).flatMap { c =>
      val box: Option[Seq[(String, Double, Double)]] = c match {
        // Spark 4 parses BETWEEN to an unresolved function call
        case org.apache.spark.sql.catalyst.analysis.UnresolvedFunction(
            Seq("between"), Seq(a, Literal(lo, _), Literal(hi, _)), _, _, _, _, _) =>
          nameOf(a).flatMap(n => num(lo).zip(num(hi)).map { case (l, h) =>
            Seq((n, l, Double.PositiveInfinity), (n, Double.NegativeInfinity, h))
          })
        case GreaterThanOrEqual(a, Literal(v, _)) =>
          nameOf(a).zip(num(v)).map { case (n, d) => Seq((n, d, Double.PositiveInfinity)) }
        case GreaterThan(a, Literal(v, _)) =>
          nameOf(a).zip(num(v)).map { case (n, d) => Seq((n, d, Double.PositiveInfinity)) }
        case LessThanOrEqual(a, Literal(v, _)) =>
          nameOf(a).zip(num(v)).map { case (n, d) => Seq((n, Double.NegativeInfinity, d)) }
        case LessThan(a, Literal(v, _)) =>
          nameOf(a).zip(num(v)).map { case (n, d) => Seq((n, Double.NegativeInfinity, d)) }
        case EqualTo(a, Literal(v, _)) =>
          nameOf(a).zip(num(v)).map { case (n, d) => Seq((n, d, d)) }
        case _ => None
      }
      box.getOrElse(throw new IllegalArgumentException(
        s"rewrite_data_files where-clause: unsupported predicate '${c.sql}' — " +
          "use conjunctions of numeric >=, >, <=, <, =, BETWEEN over " +
          "plain columns (file selection works from manifest stat ranges)"))
    }
  }

  def names: Seq[String] = Seq(
    "expire_snapshots", "remove_orphan_files", "rewrite_data_files",
    "rewrite_position_delete_files", "rewrite_manifests", "add_files",
    "convert_equality_deletes", "refresh_materialized_view",
    "rollback_to_snapshot", "rollback_to_timestamp", "fast_forward",
    "cherrypick_snapshot", "compute_table_stats", "ancestors_of",
    "snapshot", "migrate", "register_table")

  def load(cat: GraftCatalog, spark: => SparkSession, name: String)
      : Option[UnboundProcedure] = {
    def pathOf(t: Any): String = {
      val s = t.toString
      if (s.startsWith("/")) s
      else cat.lakeTablePath(s.split('.').toSeq).getOrElse(
        throw new IllegalArgumentException(
          s"CALL system.$name: '$s' is not a lake table of this catalog " +
            "(use 'ns.table' or an absolute lake path)"))
    }
    // snapshot/migrate DESTINATION: an absolute path, or a fresh
    // 'ns.table' ident resolved to its warehouse path (path mode; a
    // uri-mode catalog's locations are server-assigned — use an
    // absolute path there)
    def destPathOf(s: String): String =
      if (s.startsWith("/")) s
      else cat.newLakeTablePath(s.split('.').toSeq).getOrElse(
        throw new IllegalArgumentException(
          s"CALL system.$name: '$s' cannot name a NEW table in a " +
            "uri-mode catalog (locations are server-assigned) — pass an " +
            "absolute destination path"))
    def str(a: Option[Any]): Option[String] = a.map(_.toString)
    def int(a: Option[Any]): Option[Int] = a.map {
      case i: Int => i
      case l: Long => l.toInt
      case o => o.toString.toInt
    }
    def long(a: Option[Any]): Option[Long] = a.map {
      case i: Int => i.toLong
      case l: Long => l
      case o => o.toString.toLong
    }
    val p = name.toLowerCase(java.util.Locale.ROOT) match {
      case "expire_snapshots" => Some(new GraftProcedure(
        "expire_snapshots",
        Seq(in("table", StringType),
          opt("older_than", StringType), opt("retain_last", IntegerType)),
        StructType(Seq(StructField("deleted_data_files_count", LongType))),
        "Expire old snapshots (older_than timestamp and/or retain_last count; " +
          "with neither, the table's own history.expire.* retention policy " +
          "properties apply); tagged snapshots and the head are always " +
          "pinned.")(args => {
        val path = pathOf(args(0).get)
        // arg-less form: the RETENTION POLICY lives on the table
        // itself (Iceberg's history.expire.* keys via S12f versioned
        // properties) — a maintenance scheduler then runs ONE
        // parameterless CALL per table and each table keeps its own
        // policy, audited and time-travelable like any property. The
        // pass covers the BRANCHES too, each under its OWN declared
        // policy (round-16 #9) — a long-lived audit branch keeps its
        // history while main expires on schedule.
        val props = LakeTable.latestVersion(path)
          .map(v => LakeTable.tablePropsOf(path, v))
          .getOrElse(Map.empty[String, String])
        if (str(args(1)).isEmpty && int(args(2)).isEmpty) {
          require(props.contains("history.expire.max-snapshot-age-ms") ||
              props.contains("history.expire.min-snapshots-to-keep"),
            "CALL system.expire_snapshots: pass older_than => '<ts>' and/or " +
              "retain_last => n, or set the table's retention policy " +
              "(history.expire.max-snapshot-age-ms / min-snapshots-to-keep)")
          one(LakeTable.expireByPolicy(spark, path).size.toLong)
        } else {
          // explicit args target THIS root; an absent arg falls back
          // to the root's own policy, as before
          val older = str(args(1)).orElse(
            props.get("history.expire.max-snapshot-age-ms").map(age =>
              (System.currentTimeMillis() - age.toLong).toString))
          val retain = int(args(2)).orElse(
            props.get("history.expire.min-snapshots-to-keep").map(_.toInt))
          val a = older.map(ts =>
            LakeTable.expireOlderThan(spark, path, LakeTable.timestampMillisOf(ts)))
            .getOrElse(Nil)
          val b = retain.map(r => LakeTable.expireSnapshots(spark, path, r))
            .getOrElse(Nil)
          one((a.size + b.size).toLong)
        }
      }))
      case "remove_orphan_files" => Some(new GraftProcedure(
        "remove_orphan_files",
        Seq(in("table", StringType)),
        StructType(Seq(StructField("orphan_file_count", LongType))),
        "Delete data files referenced by no live manifest (grace-gated).")(args => {
        one(LakeTable.removeOrphans(spark, pathOf(args(0).get)).size.toLong)
      }))
      case "rewrite_data_files" => Some(new GraftProcedure(
        "rewrite_data_files",
        Seq(in("table", StringType), opt("target_file_size_bytes", LongType),
          opt("where", StringType), opt("strategy", StringType)),
        StructType(Seq(StructField("version", IntegerType))),
        "strategy => 'binpack' (default): fold files smaller than the " +
          "target (default 128 MiB) within the table's partition layout; " +
          "right-sized files carry untouched. strategy => 'sort': re-sort " +
          "the selected files by the table's DECLARED sort order (WRITE " +
          "ORDERED BY) — the remedy for an order declared after data " +
          "loaded; refuses when no order is declared. Optional `where` " +
          "scopes WHICH FILES rewrite (Iceberg semantics: a file that may " +
          "hold matching rows is selected, from manifest stats alone) — " +
          "numeric range/equality conjunctions only, anything else " +
          "refuses by name.")(args => {
        val path = pathOf(args(0).get)
        val preds = str(args(2)).map(whereBoxes(spark, _)).getOrElse(Nil)
        str(args(3)).getOrElse("binpack") match {
          case "sort" =>
            require(long(args(1)).isEmpty,
              "rewrite_data_files: target_file_size_bytes is a binpack " +
                "knob — the sort strategy rewrites every selected file")
            one(LakeTable.rewriteSorted(spark, path, preds))
          case "binpack" =>
            // absent target → the table's own write.target-file-size-bytes
            // property (Iceberg's key) → 128 MiB
            val target = long(args(1)).getOrElse(
              LakeTable.latestVersion(path)
                .flatMap(v => LakeTable.tablePropsOf(path, v)
                  .get("write.target-file-size-bytes").map(_.toLong))
                .getOrElse(128L * 1024 * 1024))
            require(target > 0, "target_file_size_bytes must be positive")
            one(LakeTable.compactSmall(spark, path, target, preds))
          case other => throw new IllegalArgumentException(
            s"rewrite_data_files: unknown strategy '$other' — expected " +
              "binpack or sort")
        }
      }))
      case "rewrite_position_delete_files" => Some(new GraftProcedure(
        "rewrite_position_delete_files",
        Seq(in("table", StringType)),
        StructType(Seq(StructField("version", IntegerType))),
        "Consolidate accumulated position-delete and deletion-vector files " +
          "into one vector per data file — zero data rewritten.")(args => {
        one(LakeTable.rewritePositionDeletes(spark, pathOf(args(0).get)))
      }))
      case "refresh_materialized_view" => Some(new GraftProcedure(
        "refresh_materialized_view",
        Seq(in("view", StringType)),
        StructType(Seq(StructField("refreshed", BooleanType),
          StructField("mode", StringType))),
        "Recompute a materialized view's storage table under its frozen " +
          "resolution context and commit an audited view version carrying " +
          "the new per-source freshness record; false = already fresh, " +
          "nothing recomputed. mode = the path the refresh took " +
          "('incremental' for the O(delta) distributive-aggregate fold " +
          "over a pure-append range, 'full' otherwise; null when fresh).")(
        args => {
        val parts = args(0).get.toString.split('.').toSeq
        require(parts.size >= 2 || parts.nonEmpty,
          "refresh_materialized_view expects 'ns.view'")
        val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
          parts.init.toArray, parts.last)
        val refreshed = GraftMaterializedViews.refresh(spark, cat, ident)
        one(refreshed,
          if (refreshed)
            GraftMaterializedViews.lastRefreshMode(cat, ident).orNull
          else null)
      }))
      case "convert_equality_deletes" => Some(new GraftProcedure(
        "convert_equality_deletes",
        Seq(in("table", StringType)),
        StructType(Seq(StructField("version", IntegerType))),
        "Rewrite live equality deletes as one deletion vector per data " +
          "file (one scan, zero data rewritten) and retire the equality " +
          "manifests — restoring the metadata plane (partitions, count(*) " +
          "pushdown, NDV) without a full compaction.")(args => {
        one(LakeTable.convertEqualityDeletes(spark, pathOf(args(0).get)))
      }))
      case "rewrite_manifests" => Some(new GraftProcedure(
        "rewrite_manifests",
        Seq(in("table", StringType), opt("target_manifest_entries", LongType)),
        StructType(Seq(StructField("version", IntegerType))),
        "Consolidate small live data manifests into right-sized ones — " +
          "metadata-only (zero data files move); per-entry seq and " +
          "lineage-span pins preserve MoR and row-lineage semantics.")(args => {
        val target = long(args(1)).getOrElse(512L)
        one(LakeTable.rewriteManifests(spark, pathOf(args(0).get), target))
      }))
      case "add_files" => Some(new GraftProcedure(
        "add_files",
        Seq(in("table", StringType), in("source_dir", StringType)),
        StructType(Seq(StructField("version", IntegerType),
          StructField("files_added", LongType))),
        "Register existing parquet files into the table METADATA-ONLY " +
          "(zero data bytes move; one distributed stats job builds the " +
          "manifest). Ownership transfers: expire GC may later delete " +
          "the imported files in place. Refuses by name on schema " +
          "mismatch, hidden partitioning, CHECK constraints, or a " +
          "source inside the table root.")(args => {
        val path = pathOf(args(0).get)
        val src = args(1).get.toString
        val before = LakeTable.latestVersion(path)
          .map(v => LakeTable.listRefs(path, v).map(_.nFiles).sum)
          .getOrElse(0L)
        val v = LakeTable.addFiles(spark, path, src)
        val after = LakeTable.listRefs(path, v).map(_.nFiles).sum
        one(v, after - before)
      }))
      case "rollback_to_snapshot" => Some(new GraftProcedure(
        "rollback_to_snapshot",
        Seq(in("table", StringType), in("version", IntegerType)),
        StructType(Seq(StructField("version", IntegerType))),
        "Roll the table back to an earlier version as a NEW forward " +
          "commit (history never rewrites).")(args => {
        one(LakeTable.rollback(spark, pathOf(args(0).get), int(args(1)).get))
      }))
      case "rollback_to_timestamp" => Some(new GraftProcedure(
        "rollback_to_timestamp",
        Seq(in("table", StringType), in("timestamp", StringType)),
        StructType(Seq(StructField("version", IntegerType))),
        "Roll back to the snapshot current as of the timestamp.")(args => {
        val path = pathOf(args(0).get)
        one(LakeTable.rollback(spark, path, LakeTable.versionAsOf(
          spark, path, LakeTable.timestampMillisOf(str(args(1)).get))))
      }))
      case "fast_forward" => Some(new GraftProcedure(
        "fast_forward",
        Seq(in("table", StringType), in("branch", StringType)),
        StructType(Seq(StructField("version", IntegerType))),
        "Fast-forward main to a branch's head (refused on divergence).")(args => {
        one(LakeTable.fastForward(spark, pathOf(args(0).get), str(args(1)).get))
      }))
      case "cherrypick_snapshot" => Some(new GraftProcedure(
        "cherrypick_snapshot",
        Seq(in("table", StringType), in("branch", StringType),
          opt("version", IntegerType)),
        StructType(Seq(StructField("version", IntegerType))),
        "Apply ONE branch append commit (default: the branch head) onto " +
          "main's current head, metadata-only — works where fast_forward " +
          "refuses (main diverged past the fork). Appends only; row-id " +
          "spans and sequences re-assign under main; main's CHECK " +
          "constraints re-validate the picked rows.")(args => {
        one(LakeTable.cherryPick(spark, pathOf(args(0).get),
          str(args(1)).get, int(args(2))))
      }))
      case "ancestors_of" => Some(new GraftProcedure(
        "ancestors_of",
        Seq(in("table", StringType), opt("version", IntegerType)),
        StructType(Seq(StructField("version", IntegerType),
          StructField("made_current_at", StringType))),
        "Version ancestry of the table's head (or of `version`): one " +
          "row per live ancestor, oldest first — gaps where expire " +
          "removed snapshots. O(#versions) metadata.")(args => {
        val path = pathOf(args(0).get)
        val upTo = int(args(1)).getOrElse(
          LakeTable.latestVersion(path).getOrElse(-1))
        LakeTable.metadataLog(spark, path).collect()
          .filter(_.getInt(2) <= upTo)
          .map(r => Seq[Any](r.getInt(2), r.getString(0))).toSeq
      }))
      case "snapshot" => Some(new GraftProcedure(
        "snapshot",
        Seq(in("source_dir", StringType), in("table", StringType)),
        StructType(Seq(StructField("version", IntegerType),
          StructField("location", StringType))),
        "Zero-copy TRIAL lake table over an existing parquet directory: " +
          "metadata-only import (no data bytes move) + gc.enabled=false " +
          "— the snapshot table never owns the files, so file-deleting " +
          "maintenance (expire_snapshots, remove_orphan_files, VACUUM) " +
          "refuses on it by name. The onboarding try-before-you-migrate " +
          "path for an existing parquet estate.")(args => {
        val dest = destPathOf(args(1).get.toString)
        one(LakeTable.snapshotTable(spark, args(0).get.toString, dest), dest)
      }))
      case "migrate" => Some(new GraftProcedure(
        "migrate",
        Seq(in("source_table", StringType), in("table", StringType)),
        StructType(Seq(StructField("version", IntegerType),
          StructField("location", StringType))),
        "Convert an EXTERNAL session-catalog parquet table to a lake " +
          "table IN PLACE: files never move, ownership transfers, the " +
          "source registration is dropped. MANAGED sources refuse (their " +
          "DROP deletes the files the migrated table references).")(args => {
        val dest = destPathOf(args(1).get.toString)
        one(LakeTable.migrateTable(spark, args(0).get.toString, dest), dest)
      }))
      case "register_table" => Some(new GraftProcedure(
        "register_table",
        Seq(in("table", StringType), in("metadata_location", StringType)),
        StructType(Seq(StructField("location", StringType))),
        "Bind an existing lake table location to a catalog identifier. " +
          "Registry indirection only — catalog-over-HTTP (uri) sessions; " +
          "path-mode warehouses refuse (no indirection layer, Iceberg's " +
          "HadoopCatalog posture).")(args =>
        one(cat.registerLakeTable(args(0).get.toString.split('.').toSeq,
          args(1).get.toString))))
      case "compute_table_stats" => Some(new GraftProcedure(
        "compute_table_stats",
        Seq(in("table", StringType), opt("columns", StringType)),
        StructType(Seq(StructField("version", IntegerType))),
        "Attach per-file NDV sketches (ANALYZE) for the named columns, " +
          "or every sketchable column when omitted.")(args => {
        val path = pathOf(args(0).get)
        val cols = str(args(1))
          .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse {
            val all = LakeTable.read(spark, path).schema.fields
              .filter(f => LakeTable.ndvSketchable(f.dataType)).map(_.name).toSeq
            require(all.nonEmpty,
              s"compute_table_stats at $path: no sketchable column")
            all
          }
        one(LakeTable.analyzeNdv(spark, path, cols))
      }))
      case _ => None
    }
    p
  }
}
