package graft

/** Small shared local-filesystem helpers for the driver-query work
  * dirs (streaming arrival/checkpoint/sink scaffolds, lake table work
  * dirs) — one definition so a deletion-semantics fix lands once. */
object Util {

  /** Run `body` with `spark.sql.shuffle.partitions` temporarily set to
    * `n`, restoring the session value after. Streaming queries size
    * their STATE STORES off this at query start — 32 stores fsyncing a
    * checkpoint delta per micro-batch for a few thousand state rows is
    * pure overhead, so the declared streaming queries scope themselves
    * down (results are partition-count invariant; at production rates
    * you'd size this UP instead, same knob). */
  def withShufflePartitions[T](s: org.apache.spark.sql.SparkSession, n: Int)(body: => T): T = {
    // NOTE: save/restore on the SHARED session — only safe where no
    // concurrent query can observe the scoped value. The one
    // remaining caller (Dedup's star contraction) runs inside the
    // prestage pass, BEFORE Verify's pool starts; every streaming
    // query uses the conf-isolated form below instead (round-8
    // review catch: two pooled queries interleaving save/restore
    // could pin the whole session at the scoped width).
    val saved = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", saved)
  }

  /** Run `body` against a conf-ISOLATED clone of the session with
    * `spark.sql.shuffle.partitions` set to `n` — the streaming
    * queries' form: the clone's conf lives and dies with this query,
    * so concurrently-pooled queries can never observe the scoped
    * value, and nothing needs restoring. The clone shares the
    * SparkContext (same files, checkpoints, sinks); the two
    * table-vintage confs `Tables.load` relies on are carried over. */
  def withIsolatedShufflePartitions[T](
      s: org.apache.spark.sql.SparkSession, n: Int)(
      body: org.apache.spark.sql.SparkSession => T): T = {
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", n.toString)
    s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s2.conf.set("spark.sql.session.timeZone",
      s.conf.get("spark.sql.session.timeZone", "UTC"))
    body(s2)
  }

  /** Unload every cached state-store provider from executor memory
    * (round-16 #2). Structured Streaming keeps each query's loaded
    * provider maps in a JVM-wide cache after the query terminates,
    * waiting for the ~60 s maintenance tick to evict them; across a
    * long many-query run the retired state accumulates as old-gen
    * heap and the LATE queries pay it as GC wall. A finished
    * AvailableNow lifecycle never reuses its providers (each run has
    * a fresh checkpoint/runId), so dropping them eagerly is pure
    * hygiene: correctness is checkpoint-backed (a provider unloaded
    * under a LIVE query reloads from its snapshot+deltas), and a
    * no-op when nothing is loaded. */
  def drainStreamState(): Unit =
    org.apache.spark.sql.GraftSqlShim.unloadStateStores()

  /** rm -rf (no-op if absent); the walk stream is closed properly. */
  def rmRecursive(path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      } finally walk.close()
    }
  }
}
