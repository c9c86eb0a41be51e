package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** VERSIONED VIEW metadata store — the Iceberg view spec's core idea
  * (a view is an immutable sequence of versions, each freezing the
  * SQL text, the name-resolution context it was written in, and the
  * analyzed schema) re-expressed over the same
  * publish-by-atomic-rename discipline as the table format. Layout:
  *
  * {{{
  *   <warehouse>/<ns…>/<view>/_graft_view/v0.json  // CREATE VIEW
  *   <warehouse>/<ns…>/<view>/_graft_view/v1.json  // REPLACE / ALTER
  * }}}
  *
  * Every mutation — REPLACE, SET/UNSET TBLPROPERTIES — commits a NEW
  * version file (temp + ATOMIC_MOVE, the claim/publish pattern of
  * commitRefs), so `history` can answer "what did this view compute
  * last Tuesday" and a REPLACE can be audited or reverted by
  * re-committing an old version's definition. The CURRENT version is
  * simply the highest v; a racer losing the rename retries onto the
  * next number — last writer wins, no version is ever overwritten.
  *
  * Storing the resolution CONTEXT (catalog + namespace the view was
  * created under) alongside the SQL is what makes the stored text
  * stable: Spark re-parses the body under that context, so a view
  * over `t` keeps meaning `<catalog>.<ns>.t` no matter where the
  * reader's session currently sits. At 100 TB none of this touches
  * data: a view is O(1) metadata; planning cost is the one JSON read.
  */
object GraftViews {

  final case class ViewMeta(
      sql: String,
      currentCatalog: String,
      currentNamespace: Seq[String],
      schemaDdl: String,
      queryColumnNames: Seq[String],
      columnAliases: Seq[String],
      columnComments: Seq[String], // empty string = no comment (JSON has no null slot)
      properties: Map[String, String],
      committedAtMs: Long)

  private val Mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def metaDir(viewPath: String): Path =
    Paths.get(s"$viewPath/_graft_view")

  /** Is `p` a view directory (regardless of whether a reader's table
    * probe would also reject it)? Presence of the metadata dir with
    * at least one published version IS the existence test. */
  def isView(p: String): Boolean = latest(p).isDefined

  def versions(p: String): Seq[Int] = {
    val d = metaDir(p)
    if (!Files.isDirectory(d)) return Nil
    val ls = Files.list(d)
    try ls.iterator().asScala.map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
        s.stripPrefix("v").stripSuffix(".json") }
      .flatMap(_.toIntOption).toSeq.sorted
    finally ls.close()
  }

  def latest(p: String): Option[Int] = versions(p).lastOption

  def load(p: String, v: Int): ViewMeta = {
    val f = metaDir(p).resolve(s"v$v.json")
    require(Files.exists(f), s"no view version $v at $p")
    val n = Mapper.readTree(Files.readString(f))
    def arr(k: String): Seq[String] =
      Option(n.get(k)).map(_.elements().asScala.map(_.asText).toSeq).getOrElse(Nil)
    ViewMeta(
      sql = n.get("sql").asText,
      currentCatalog = n.get("current_catalog").asText,
      currentNamespace = arr("current_namespace"),
      schemaDdl = n.get("schema").asText,
      queryColumnNames = arr("query_column_names"),
      columnAliases = arr("column_aliases"),
      columnComments = arr("column_comments"),
      properties = Option(n.get("properties")).map(o =>
        o.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap)
        .getOrElse(Map.empty),
      committedAtMs = n.get("committed_at").asLong)
  }

  /** Publish `meta` as the view's next version: write to a temp file,
    * ATOMIC_MOVE onto vN — a losing racer's move fails on the
    * existing target and retries onto N+1 (same discipline as the
    * table commit; no version file is ever mutated in place). */
  def commit(p: String, meta: ViewMeta): Int = {
    val d = metaDir(p)
    Files.createDirectories(d)
    val node = Mapper.createObjectNode()
    node.put("sql", meta.sql)
    node.put("current_catalog", meta.currentCatalog)
    node.put("schema", meta.schemaDdl)
    node.put("committed_at", meta.committedAtMs)
    def putArr(k: String, vs: Seq[String]): Unit = {
      val a = node.putArray(k); vs.foreach(a.add)
    }
    putArr("current_namespace", meta.currentNamespace)
    putArr("query_column_names", meta.queryColumnNames)
    putArr("column_aliases", meta.columnAliases)
    putArr("column_comments", meta.columnComments)
    val props = node.putObject("properties")
    meta.properties.toSeq.sortBy(_._1).foreach { case (k, v) => props.put(k, v) }
    val bytes = Mapper.writeValueAsBytes(node)
    var v = latest(p).map(_ + 1).getOrElse(0)
    while (true) {
      val tmp = d.resolve(s".v$v.json.tmp-${java.util.UUID.randomUUID()}")
      Files.write(tmp, bytes)
      try {
        Files.move(tmp, d.resolve(s"v$v.json"), StandardCopyOption.ATOMIC_MOVE)
        return v
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp); v += 1 // lost the race: next number
      }
    }
    v // unreachable
  }

  def drop(p: String): Boolean = {
    if (!isView(p)) return false
    graft.Util.rmRecursive(p)
    true
  }

  def rename(from: String, to: String): Unit = {
    require(isView(from), s"no view at $from")
    require(!Files.exists(Paths.get(to)), s"rename target exists: $to")
    Files.createDirectories(Paths.get(to).getParent)
    Files.move(Paths.get(from), Paths.get(to), StandardCopyOption.ATOMIC_MOVE)
  }

  /** The view's version history as a frame — (version, committed_at,
    * sql, schema, properties): the introspection surface a REPLACE
    * audit reads. O(#versions) driver metadata, zero Spark jobs until
    * the caller acts on the frame. */
  def history(spark: SparkSession, p: String): DataFrame = {
    import spark.implicits._
    versions(p).map { v =>
      val m = load(p, v)
      (v, m.committedAtMs, m.sql, m.schemaDdl,
        m.properties.toSeq.sortBy(_._1).map { case (k, vv) => s"$k=$vv" }
          .mkString(";"))
    }.toDF("version", "committed_at", "sql", "schema", "properties")
  }

  /** Schema stored at `v`, parsed back from its DDL form. */
  def schemaAt(p: String, v: Int): StructType =
    StructType.fromDDL(load(p, v).schemaDdl)

  /** Driver query: VERSIONED VIEWS (S11g) end-to-end through SQL —
    * CREATE VIEW over a catalog table, SELECT through it, CREATE OR
    * REPLACE (version 1), SELECT the new definition, and both phases
    * aggregate into one oracle-checkable frame. The version-audit
    * contract — `versions` keeps BOTH definitions, SHOW VIEWS lists
    * the view and SHOW TABLES does not — is require'd in-query
    * (physical facts about the metadata store, not oracle-stable). */
  def versionedViewQuery(s: SparkSession, d: String): DataFrame = {
    val wh = s"/tmp/graft_lakeview_${d.replaceAll("[^a-zA-Z0-9]", "_")}"
    graft.Util.rmRecursive(wh)
    s.conf.set("spark.sql.catalog.graft_v", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft_v.warehouse", wh)
    graft.Tables.load(s, d, "events").select("event_id", "event_type", "value")
      .createOrReplaceTempView("view_ev_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_v.viewdb")
    s.sql("CREATE TABLE graft_v.viewdb.ev " +
      "(event_id BIGINT, event_type STRING, value DOUBLE) USING graftlake")
    s.sql("INSERT INTO graft_v.viewdb.ev SELECT * FROM view_ev_src")
    s.sql("CREATE VIEW graft_v.viewdb.ev_stats AS " +
      "SELECT event_type, count(*) AS n, round(sum(value), 6) AS sum_value " +
      "FROM graft_v.viewdb.ev WHERE event_id % 2 = 0 GROUP BY event_type")
    val phase0 = s.sql(
      "SELECT 'v0' AS phase, event_type, n, sum_value FROM graft_v.viewdb.ev_stats")
    // REPLACE is an audited version commit, not an overwrite
    s.sql("CREATE OR REPLACE VIEW graft_v.viewdb.ev_stats AS " +
      "SELECT event_type, count(*) AS n, round(sum(value), 6) AS sum_value " +
      "FROM graft_v.viewdb.ev WHERE event_id % 2 = 1 GROUP BY event_type")
    val phase1 = s.sql(
      "SELECT 'v1' AS phase, event_type, n, sum_value FROM graft_v.viewdb.ev_stats")
    val hist = s.sql(
      "SELECT version, sql FROM graft_v.viewdb.ev_stats.versions ORDER BY version")
      .collect()
    require(hist.map(_.getInt(0)).toSeq == Seq(0, 1),
      s"REPLACE must append version 1, got ${hist.map(_.getInt(0)).toSeq}")
    require(hist(0).getString(1).contains("% 2 = 0") &&
        hist(1).getString(1).contains("% 2 = 1"),
      "the version history must keep the replaced definition verbatim")
    require(s.sql("SHOW VIEWS IN graft_v.viewdb").collect()
        .exists(_.getString(1) == "ev_stats"),
      "SHOW VIEWS must list the view")
    require(!s.sql("SHOW TABLES IN graft_v.viewdb").collect()
        .exists(_.getString(1) == "ev_stats"),
      "SHOW TABLES must not list a view")
    phase0.unionByName(phase1).orderBy("phase", "event_type")
  }
}
