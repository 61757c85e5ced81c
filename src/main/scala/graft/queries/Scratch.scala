package graft.queries

/** Tag-keyed scratch directories for gate queries that need an
  * on-disk table (jsonl fixtures, TableLog tables): `fresh(tag)`
  * removes the previous run's tree for that tag before handing out a
  * new one — safe because every caller constructs then FULLY consumes
  * before the next construction (Bench repeats materialize run 1
  * through the noop write before run 2 starts; Verify and the specs
  * are single-shot) — and a JVM shutdown hook removes whatever is
  * live at exit. Without this, each frame construction leaked a full
  * copy of the documents table into /tmp: gigabytes per bench session
  * (the round-11 advisor caught q179/q182 re-leaking what the q121
  * fixture had already solved — hence the ONE shared spelling here).
  */
private[queries] object Scratch {
  private val live = scala.collection.mutable.HashMap.empty[String, java.nio.file.Path]
  private def rmTree(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
    }
  Runtime.getRuntime.addShutdownHook(new Thread(() => live.synchronized {
    live.values.foreach(rmTree); live.clear()
  }))
  def fresh(tag: String): java.nio.file.Path = live.synchronized {
    live.remove(tag).foreach(rmTree)
    val p = java.nio.file.Files.createTempDirectory(tag)
    live.put(tag, p)
    p
  }
}
