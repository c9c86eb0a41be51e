package graft

/** Small shared local-filesystem helpers for the driver-query work
  * dirs (streaming arrival/checkpoint/sink scaffolds, lake table work
  * dirs) — one definition so a deletion-semantics fix lands once. */
object Util {

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
