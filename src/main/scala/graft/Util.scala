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
    val saved = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", saved)
  }

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
