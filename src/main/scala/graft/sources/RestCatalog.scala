package graft.sources

import scala.jdk.CollectionConverters._

/** Client for the [[CatalogHttpServer]] READ PLANE (round-11
  * "missing" #3): table discovery and loadTable over HTTP, so a
  * second engine (or a second host) consumes these tables knowing
  * only the service URL — the half of real REST-catalog interop the
  * commit arbiter alone could not provide. The COMMIT plane stays on
  * [[HttpCatalogArbiter]] (raw socket, two-phase ambiguity contract);
  * this plane is read-only/idempotent, so plain
  * `java.net.HttpURLConnection` round trips are the honest transport
  * — a lost GET is safely retried by the caller, never ambiguous.
  *
  * Multi-level namespaces ride the URL as one segment joined by the
  * unit separator (Iceberg REST's `%1F` convention). */
final class RestCatalogClient(baseUri: String, timeoutMs: Int = 10000,
    // forwarded as `Authorization: Bearer <token>` on every request —
    // the pass-through half of the server's bearer-token check
    token: Option[String] = None) {
  require(baseUri.startsWith("http://"),
    s"graft REST catalog: expected an http:// uri, got '$baseUri'")
  private val base = baseUri.stripSuffix("/")
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** (status, parsed body, ETag header) — body parses as JSON or the
    * call throws (the server always answers JSON, even for errors;
    * a 304 has no body by contract and reads as `{}`). */
  private def httpFull(method: String, path: String,
      body: Option[String] = None, ifNoneMatch: Option[String] = None)
      : (Int, com.fasterxml.jackson.databind.JsonNode, Option[String]) = {
    val conn = new java.net.URI(s"$base$path").toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      conn.setRequestMethod(method)
      token.foreach(t => conn.setRequestProperty("Authorization", s"Bearer $t"))
      ifNoneMatch.foreach(e => conn.setRequestProperty("If-None-Match", e))
      body.foreach { b =>
        conn.setDoOutput(true)
        conn.setRequestProperty("Content-Type", "application/json")
        val out = conn.getOutputStream
        try { out.write(b.getBytes("UTF-8")); out.flush() } finally out.close()
      }
      val status = conn.getResponseCode
      val in = if (status < 400) conn.getInputStream else conn.getErrorStream
      val text =
        if (in == null) "{}"
        else try new String(in.readAllBytes(), "UTF-8") finally in.close()
      (status, mapper.readTree(if (text.isEmpty) "{}" else text),
        Option(conn.getHeaderField("ETag")))
    } finally conn.disconnect()
  }

  private def http(method: String, path: String, body: Option[String] = None)
      : (Int, com.fasterxml.jackson.databind.JsonNode) = {
    val (st, doc, _) = httpFull(method, path, body)
    (st, doc)
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def nsSeg(parts: Seq[String]): String =
    enc(parts.mkString("\u001f"))
  private def jStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def elems(n: com.fasterxml.jackson.databind.JsonNode)
      : Seq[com.fasterxml.jackson.databind.JsonNode] =
    if (n == null || !n.isArray) Nil else n.elements().asScala.toSeq

  def listNamespaces(pageSize: Option[Int] = None): Seq[Seq[String]] = {
    val acc = Seq.newBuilder[Seq[String]]
    var tok: Option[String] = None
    var first = true
    while (first || tok.nonEmpty) {
      first = false
      val qp = (pageSize.map(z => s"pageSize=$z") ++
        tok.map(t => s"pageToken=${enc(t)}")).mkString("&")
      val (st, doc) = http("GET", "/v1/namespaces" +
        (if (qp.isEmpty) "" else s"?$qp"))
      require(st == 200, s"graft REST catalog: list namespaces → HTTP $st $doc")
      acc ++= elems(doc.get("namespaces")).map(ns => elems(ns).map(_.asText))
      tok = Option(doc.get("next-page-token")).filterNot(_.isNull).map(_.asText)
    }
    acc.result()
  }

  /** False = the namespace already exists (the 409 answer). */
  def createNamespace(parts: Seq[String]): Boolean = {
    val body = parts.map(jStr).mkString("""{"namespace":[""", ",", "]}")
    val (st, doc) = http("POST", "/v1/namespaces", Some(body))
    st match {
      case 200 => true
      case 409 => false
      case _ => sys.error(s"graft REST catalog: create namespace → HTTP $st $doc")
    }
  }

  /** Table names in `ns`; None when the namespace does not exist.
    * PAGINATED under the hood (Iceberg REST's pageToken/pageSize):
    * with `pageSize` set the client walks `next-page-token` pages
    * until the listing is complete — identical results to the
    * one-shot form, bounded response bodies on 10⁴-table registries. */
  def listTables(ns: Seq[String], pageSize: Option[Int] = None): Option[Seq[String]] = {
    val acc = Seq.newBuilder[String]
    var tok: Option[String] = None
    var first = true
    while (first || tok.nonEmpty) {
      first = false
      val qp = (pageSize.map(z => s"pageSize=$z") ++
        tok.map(t => s"pageToken=${enc(t)}")).mkString("&")
      val (st, doc) = http("GET", s"/v1/namespaces/${nsSeg(ns)}/tables" +
        (if (qp.isEmpty) "" else s"?$qp"))
      st match {
        case 200 =>
          acc ++= elems(doc.get("identifiers")).map(_.get("name").asText)
          tok = Option(doc.get("next-page-token")).filterNot(_.isNull).map(_.asText)
        case 404 => return None
        case _ => sys.error(s"graft REST catalog: list tables → HTTP $st $doc")
      }
    }
    Some(acc.result())
  }

  /** (metadata location, server-held head version; -1 = untracked) —
    * None when unregistered. */
  def loadTable(ns: Seq[String], name: String): Option[(String, Int)] =
    loadTableConditional(ns, name, None) match {
      case LoadUnchanged => None // unreachable without an etag
      case LoadMissing => None
      case LoadOk(loc, v, _) => Some((loc, v))
    }

  sealed trait LoadResult
  case object LoadMissing extends LoadResult
  /** The cached entity is still current — the server sent an empty
    * 304 against the presented ETag; keep using what you have. */
  case object LoadUnchanged extends LoadResult
  final case class LoadOk(location: String, version: Int, etag: Option[String])
    extends LoadResult

  /** Conditional loadTable (the polling shape): present the last
    * ETag and a still-current head answers 304 with zero body bytes;
    * a moved head answers 200 with the fresh entity + new ETag. */
  def loadTableConditional(ns: Seq[String], name: String,
      ifNoneMatch: Option[String]): LoadResult = {
    val (st, doc, etag) = httpFull("GET",
      s"/v1/namespaces/${nsSeg(ns)}/tables/${enc(name)}",
      ifNoneMatch = ifNoneMatch)
    st match {
      case 200 => LoadOk(doc.get("metadata-location").asText,
        Option(doc.get("version")).map(_.asInt).getOrElse(-1), etag)
      case 304 => LoadUnchanged
      case 404 => LoadMissing
      case _ => sys.error(s"graft REST catalog: load table → HTTP $st $doc")
    }
  }

  /** Register `ns.name` (server assigns the location from its
    * warehouse unless one is given); the assigned metadata location,
    * or None when the table already exists (409). */
  def registerTable(ns: Seq[String], name: String,
      location: Option[String] = None): Option[String] = {
    val body = s"""{"name":${jStr(name)}""" +
      location.map(l => s""","location":${jStr(l)}""").getOrElse("") + "}"
    val (st, doc) = http("POST", s"/v1/namespaces/${nsSeg(ns)}/tables", Some(body))
    st match {
      case 200 => Some(doc.get("metadata-location").asText)
      case 409 => None
      case _ => sys.error(s"graft REST catalog: register table → HTTP $st $doc")
    }
  }

  /** Rename (Iceberg's POST /v1/tables/rename — registry indirection
    * only; storage never moves). "ok" | "no-source" | "exists". */
  def renameTable(srcNs: Seq[String], srcName: String,
      dstNs: Seq[String], dstName: String): String = {
    def ident(ns: Seq[String], name: String): String =
      s"""{"namespace":${ns.map(jStr).mkString("[", ",", "]")},""" +
        s""""name":${jStr(name)}}"""
    val body = s"""{"source":${ident(srcNs, srcName)},""" +
      s""""destination":${ident(dstNs, dstName)}}"""
    val (st, doc) = http("POST", "/v1/tables/rename", Some(body))
    st match {
      case 200 => "ok"
      case 404 => "no-source"
      case 409 => "exists"
      case _ => sys.error(s"graft REST catalog: rename → HTTP $st $doc")
    }
  }

  // ---- VIEWS (S16c): the Iceberg-REST view endpoints, same
  // registry contract as tables — a view row is name → the directory
  // holding its GraftViews version files on shared storage. ----

  /** View names in `ns`; None when the namespace does not exist. */
  def listViews(ns: Seq[String]): Option[Seq[String]] = {
    val (st, doc) = http("GET", s"/v1/namespaces/${nsSeg(ns)}/views")
    st match {
      case 200 => Some(elems(doc.get("identifiers")).map(_.get("name").asText))
      case 404 => None
      case _ => sys.error(s"graft REST catalog: list views → HTTP $st $doc")
    }
  }

  /** (view location, current view version; -1 = no version published
    * yet) — None when unregistered. */
  def loadView(ns: Seq[String], name: String): Option[(String, Int)] = {
    val (st, doc) = http("GET", s"/v1/namespaces/${nsSeg(ns)}/views/${enc(name)}")
    st match {
      case 200 => Some((doc.get("metadata-location").asText,
        Option(doc.get("version")).map(_.asInt).getOrElse(-1)))
      case 404 => None
      case _ => sys.error(s"graft REST catalog: load view → HTTP $st $doc")
    }
  }

  /** Register view `ns.name` (server assigns the location from its
    * warehouse unless one is given); None when the name is taken
    * (by a view OR a table — they share the namespace). */
  def registerView(ns: Seq[String], name: String,
      location: Option[String] = None): Option[String] = {
    val body = s"""{"name":${jStr(name)}""" +
      location.map(l => s""","location":${jStr(l)}""").getOrElse("") + "}"
    val (st, doc) = http("POST", s"/v1/namespaces/${nsSeg(ns)}/views", Some(body))
    st match {
      case 200 => Some(doc.get("metadata-location").asText)
      case 409 => None
      case _ => sys.error(s"graft REST catalog: register view → HTTP $st $doc")
    }
  }

  /** Rename a view (POST /v1/views/rename — registry indirection
    * only; storage never moves, exactly the tables plane's
    * contract). "ok" | "no-source" | "exists" (destination taken by
    * a view OR a table — they share the namespace). */
  def renameView(srcNs: Seq[String], srcName: String,
      dstNs: Seq[String], dstName: String): String = {
    def ident(ns: Seq[String], name: String): String =
      s"""{"namespace":${ns.map(jStr).mkString("[", ",", "]")},""" +
        s""""name":${jStr(name)}}"""
    val body = s"""{"source":${ident(srcNs, srcName)},""" +
      s""""destination":${ident(dstNs, dstName)}}"""
    val (st, doc) = http("POST", "/v1/views/rename", Some(body))
    st match {
      case 200 => "ok"
      case 404 => "no-source"
      case 409 => "exists"
      case _ => sys.error(s"graft REST catalog: rename view → HTTP $st $doc")
    }
  }

  /** Unregister a view (storage untouched). */
  def dropView(ns: Seq[String], name: String): Boolean = {
    val (st, doc) =
      http("DELETE", s"/v1/namespaces/${nsSeg(ns)}/views/${enc(name)}")
    st match {
      case 200 => true
      case 404 => false
      case _ => sys.error(s"graft REST catalog: drop view → HTTP $st $doc")
    }
  }

  /** Unregister (storage untouched — REST drop without purge). */
  def dropTable(ns: Seq[String], name: String): Boolean = {
    val (st, doc) =
      http("DELETE", s"/v1/namespaces/${nsSeg(ns)}/tables/${enc(name)}")
    st match {
      case 200 => true
      case 404 => false
      case _ => sys.error(s"graft REST catalog: drop table → HTTP $st $doc")
    }
  }
}
