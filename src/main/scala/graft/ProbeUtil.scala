package graft

/** Shared helpers for the ad-hoc probe mains (ProbeManifestScale,
  * ProbeDvDelete) — NOT driver surface. One spelling of the
  * recursive temp-tree delete (deepest-first; the Files.walk stream
  * closed explicitly — it holds a directory fd). */
private[graft] object ProbeUtil {
  def rmTree(root: String): Unit = {
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala.toSeq.sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
    } finally walk.close()
  }
}
