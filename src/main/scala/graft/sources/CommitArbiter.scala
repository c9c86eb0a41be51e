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
