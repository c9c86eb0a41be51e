package graft.sources

/** Pluggable COMMIT ARBITRATION for the lake's version claim — the
  * catalog-service protocol the format needs at 100 TB: on object
  * stores without atomic rename (S3) and across writers on different
  * nodes, the version race cannot be settled by the filesystem, so a
  * central catalog CASes the table's head pointer instead (Iceberg's
  * commit path). The protocol, as wired into
  * [[LakeTable.commitRefs]]:
  *
  *   1. the committer finishes staging (all manifests + sidecars
  *      written under a private dir — crash here leaves only
  *      grace-swept residue),
  *   2. it reports the head it OBSERVED (locally: the FS listing its
  *      base was read from) and asks the arbiter to CLAIM
  *      `head + 1`; a refused claim = a concurrent winner → the
  *      caller rebases and retries, the same loop a rename conflict
  *      already drives,
  *   3. only the claim holder publishes the version dir, then
  *      retires the claim. A committer that CRASHES between claim
  *      and publish leaves a dangling claim; a later committer may
  *      STEAL it once it is older than the claim grace (nothing was
  *      published, so nothing is lost — and locally the atomic
  *      rename remains a second line of defense should the claimant
  *      wake up after the steal).
  *
  * [[RenameArbiter]] (the default) grants every claim and lets the
  * filesystem's ErrorIfExists rename arbitrate — POSIX/HDFS-correct,
  * zero services, the behavior of rounds 1–7.
  * [[InProcessCatalogArbiter]] is the catalog-service shape run
  * in-process (one CAS'd head + claim bookkeeping per table): the
  * unit-testable stand-in for a REST/JDBC catalog that lets specs
  * drive claim refusal, crash-steal, and mixed-writer races
  * deterministically. A real deployment implements this trait over
  * the catalog service; nothing else in the commit path changes.
  */
trait CommitArbiter {

  /** Adopt an externally-observed head (locally: the FS listing the
    * committer based on). A real catalog service IS the head
    * authority and ignores this. */
  def observed(table: String, head: Int): Unit

  /** Attempt to claim `next` on top of head `next - 1`. False = a
    * concurrent committer holds the version (caller rebases). */
  def tryClaim(table: String, next: Int): Boolean

  /** Retire the claim: `next` is published and is the new head. */
  def published(table: String, next: Int): Unit

  /** Release a claim whose publish failed, so another committer (or
    * this one, rebased) can take the version. */
  def abandon(table: String, next: Int): Unit
}

/** Filesystem arbitration: every claim granted; the atomic
  * ErrorIfExists rename into the version slot is the commit point. */
object RenameArbiter extends CommitArbiter {
  override def observed(table: String, head: Int): Unit = ()
  override def tryClaim(table: String, next: Int): Boolean = true
  override def published(table: String, next: Int): Unit = ()
  override def abandon(table: String, next: Int): Unit = ()
}

/** The catalog-service commit protocol run in-process: per-table
  * head pointer CAS + claim bookkeeping with crash-steal after
  * `claimGraceMs`. Thread-safe; one instance models one catalog
  * service, shared by every "writer" registered against it. */
class InProcessCatalogArbiter(claimGraceMs: Long = 60000L,
    clock: () => Long = () => System.currentTimeMillis()) extends CommitArbiter {

  private final case class State(head: Int, claim: Option[(Int, Long)])
  private val tables = new java.util.concurrent.ConcurrentHashMap[String, State]()
  // protocol observability for specs: how many claims were refused /
  // stolen — the visible trace of contention handling
  val refusedClaims = new java.util.concurrent.atomic.AtomicInteger(0)
  val stolenClaims = new java.util.concurrent.atomic.AtomicInteger(0)

  private def update(table: String)(f: State => (State, Boolean)): Boolean = {
    var out = false
    tables.compute(table, (_, cur) => {
      val st = Option(cur).getOrElse(State(-1, None))
      val (next, ok) = f(st)
      out = ok
      next
    })
    out
  }

  override def observed(table: String, head: Int): Unit = {
    update(table) { st =>
      if (head > st.head)
        // the FS moved past us (a non-arbitrated writer, or our own
        // state predates attachment): adopt, dropping any claim that
        // the adopted head has overtaken
        (State(head, st.claim.filter(_._1 > head)), true)
      else (st, true)
    }
    ()
  }

  override def tryClaim(table: String, next: Int): Boolean =
    update(table) { st =>
      if (st.head != next - 1) { refusedClaims.incrementAndGet(); (st, false) }
      else st.claim match {
        case None => (st.copy(claim = Some((next, clock()))), true)
        case Some((v, t)) if v == next && clock() - t > claimGraceMs =>
          // dangling claim of a crashed committer: steal it
          stolenClaims.incrementAndGet()
          (st.copy(claim = Some((next, clock()))), true)
        case Some(_) => refusedClaims.incrementAndGet(); (st, false)
      }
    }

  override def published(table: String, next: Int): Unit = {
    // Retire ONLY the matching claim (mirror abandon): a late
    // published(n) from a committer whose claim was already stolen —
    // or that raced observed() — must not wipe a claim another
    // committer legitimately holds for a later version, or two
    // writers end up holding the same version claim with only the
    // local rename backstop (absent on S3-class stores) between them.
    update(table)(st =>
      (State(math.max(st.head, next), st.claim.filterNot(_._1 == next)), true))
    ()
  }

  override def abandon(table: String, next: Int): Unit = {
    update(table)(st =>
      (st.copy(claim = st.claim.filterNot(_._1 == next)), true)); ()
  }

  /** The arbiter's view of a table's head (spec observability). */
  def headOf(table: String): Int =
    Option(tables.get(table)).map(_.head).getOrElse(-1)
}

/** A failed/ambiguous arbitration round trip. A commit must NEVER
  * proceed unarbitrated: on outage or timeout the commit fails
  * loudly and the caller's retry loop (or operator) decides. */
class CommitArbitrationException(msg: String, cause: Throwable = null)
  extends RuntimeException(msg, cause)

/** The catalog service over a REAL wire: a loopback TCP server
  * speaking newline-delimited JSON requests
  * (`{"op":"tryClaim","table":"…","v":3}` → `{"ok":true}`), wrapping
  * the same [[InProcessCatalogArbiter]] state machine — so the
  * protocol a REST/JDBC catalog would run (claim CAS, publish,
  * crash-steal past the grace window) is exercised including request
  * serialization, connection lifecycle, and client timeouts, which
  * the in-process stand-in cannot test. One instance models one
  * catalog service; writers attach [[SocketCatalogArbiter]] clients.
  * Loopback-only by construction (the bind address is hardcoded). */
final class CatalogWireServer(
    claimGraceMs: Long = 60000L,
    clock: () => Long = () => System.currentTimeMillis())
  extends AutoCloseable {

  private val inner = new InProcessCatalogArbiter(claimGraceMs, clock)
  private val server = new java.net.ServerSocket(
    0, 50, java.net.InetAddress.getLoopbackAddress)
  @volatile private var running = true

  def port: Int = server.getLocalPort
  def refusedClaims: Int = inner.refusedClaims.get
  def stolenClaims: Int = inner.stolenClaims.get
  def headOf(table: String): Int = inner.headOf(table)

  private val acceptor = new Thread(() => {
    var alive = true
    while (alive && running) {
      try {
        val sock = server.accept()
        val t = new Thread(() => serve(sock), "graft-catalog-conn")
        t.setDaemon(true)
        t.start()
      } catch { case _: Throwable => alive = running && !server.isClosed }
    }
  }, "graft-catalog-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  private def serve(sock: java.net.Socket): Unit = {
    try {
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
      val out = new java.io.PrintWriter(
        new java.io.OutputStreamWriter(sock.getOutputStream, "UTF-8"), true)
      var line = in.readLine()
      while (line != null) {
        out.println(handle(line))
        line = in.readLine()
      }
    } catch { case _: Throwable => () }
    finally sock.close()
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def handle(line: String): String = {
    // the three-field request grammar, parsed with the same Jackson
    // the metadata layer uses (escapes in path-shaped table names
    // come for free); a malformed line answers an error object, never
    // kills the connection (the client surfaces it as a refused
    // commit)
    try {
      val n = mapper.readTree(line)
      def field(k: String): String = {
        val f = n.get(k)
        if (f == null || f.isNull) sys.error(s"missing $k")
        f.asText
      }
      val op = field("op")
      val table = field("table")
      val v = field("v").toInt
      val ok = op match {
        case "observed" => inner.observed(table, v); true
        case "tryClaim" => inner.tryClaim(table, v)
        case "published" => inner.published(table, v); true
        case "abandon" => inner.abandon(table, v); true
        case other => sys.error(s"unknown op '$other'")
      }
      s"""{"ok":$ok}"""
    } catch {
      case e: Throwable =>
        val m = Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
          .replace("\\", "\\\\").replace("\"", "\\\"")
        s"""{"error":"$m"}"""
    }
  }

  override def close(): Unit = {
    running = false
    server.close()
  }
}

/** [[CommitArbiter]] client over a real socket — what a writer node
  * runs against the catalog service. One persistent connection,
  * newline-delimited JSON, `timeoutMs` socket timeout on every round
  * trip. Honest outage semantics: a TIMEOUT throws immediately (the
  * server may or may not have applied the op — re-sending a claim
  * after an ambiguous timeout could double-grant, so ambiguity
  * surfaces to the commit loop instead); a dropped idle connection
  * gets ONE reconnect, then throws. A commit never proceeds
  * unarbitrated. */
final class SocketCatalogArbiter(host: String, port: Int, timeoutMs: Int = 5000)
  extends CommitArbiter with AutoCloseable {

  private var sock: java.net.Socket = _
  private var in: java.io.BufferedReader = _
  private var out: java.io.PrintWriter = _

  private def connect(): Unit = {
    sock = new java.net.Socket()
    sock.connect(new java.net.InetSocketAddress(host, port), timeoutMs)
    sock.setSoTimeout(timeoutMs)
    in = new java.io.BufferedReader(
      new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
    out = new java.io.PrintWriter(
      new java.io.OutputStreamWriter(sock.getOutputStream, "UTF-8"), true)
  }

  private def jstr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def request(op: String, table: String, v: Int): Boolean = synchronized {
    val line = s"""{"op":${jstr(op)},"table":${jstr(table)},"v":$v}"""
    // SEND phase: a failure here is unambiguous (the server accepted
    // nothing of THIS request) — connect errors throw loudly, a stale
    // idle connection whose write fails gets exactly ONE reconnect +
    // resend. PrintWriter latches errors instead of throwing, so the
    // checkError probe IS the failure signal.
    def send(): Unit = {
      out.println(line)
      if (out.checkError()) throw new java.io.IOException("write failed")
    }
    try {
      if (sock == null || sock.isClosed) connect()
      send()
    } catch {
      case _: java.io.IOException =>
        try close() catch { case _: Throwable => () }
        try { connect(); send() }
        catch {
          case e2: java.io.IOException =>
            throw new CommitArbitrationException(
              s"catalog unreachable for $op($table, $v)", e2)
        }
    }
    // RECEIVE phase: once the request is on the wire, ANY failure is
    // AMBIGUOUS — the server may have applied the op, so re-sending
    // could double-claim. Discard the connection (its late answer
    // must never pair with the next request) and refuse the commit.
    val resp =
      try {
        val r = in.readLine()
        if (r == null) throw new java.io.IOException("connection closed")
        r
      } catch {
        case e: java.net.SocketTimeoutException =>
          try close() catch { case _: Throwable => () }
          throw new CommitArbitrationException(
            s"catalog did not answer $op($table, $v) within ${timeoutMs}ms — " +
              "ambiguous outcome, commit refused", e)
        case e: java.io.IOException =>
          try close() catch { case _: Throwable => () }
          throw new CommitArbitrationException(
            s"connection lost awaiting the $op($table, $v) reply — " +
              "ambiguous outcome, commit refused", e)
      }
    if (resp.contains("\"ok\":true")) true
    else if (resp.contains("\"ok\":false")) false
    else throw new CommitArbitrationException(
      s"catalog rejected $op($table, $v): $resp")
  }

  override def observed(table: String, head: Int): Unit = {
    request("observed", table, head); ()
  }
  override def tryClaim(table: String, next: Int): Boolean =
    request("tryClaim", table, next)
  override def published(table: String, next: Int): Unit = {
    request("published", table, next); ()
  }
  override def abandon(table: String, next: Int): Unit = {
    request("abandon", table, next); ()
  }

  override def close(): Unit =
    if (sock != null) { sock.close(); sock = null }
}
