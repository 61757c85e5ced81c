package graft.sinks

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.{FileSystem, Path}

/** The PUT-IF-ABSENT primitive behind every [[TableLog]] commit,
  * extracted as a pluggable seam — because atomic create-exclusive is
  * the ONE piece of the log protocol that is filesystem-specific
  * (everything above it — manifests, optimistic retry, pinned reads —
  * is storage-agnostic):
  *
  *  - `file:` — write a temp file, `link(2)` it to the final name:
  *    atomic, full-content, EEXIST names the race loser. (Plain
  *    `create(overwrite = false)` on RawLocalFileSystem is a
  *    check-then-create TOCTOU; rename is only atomic-no-overwrite on
  *    HDFS.)
  *  - HDFS-like — write a temp file, `rename` it: atomic and
  *    no-overwrite there by contract.
  *  - object stores (S3 et al.) — neither primitive exists natively;
  *    production needs a conditional-put / coordination implementation
  *    (S3 `If-None-Match:*` conditional writes, DynamoDB-backed
  *    mutual exclusion — the Delta LogStore approach). Register one
  *    per scheme with [[LogStore.register]]; WITHOUT a registration
  *    TableLog REFUSES to commit on a scheme whose rename contract is
  *    unknown rather than run a silently unsafe log (the reference's
  *    actual storage is S3 — storage_manager.py:44-45 — so this
  *    failure mode is the realistic deployment, not a corner).
  *
  * Implementations must guarantee: after a `true` return the FULL
  * `body` is visible at `dst` to every subsequent reader; concurrent
  * calls for one `dst` return `true` exactly once; `false` means some
  * other writer's content is (or will momentarily be) at `dst` and
  * this writer's was discarded. Torn intermediate states are tolerated
  * one level up (the manifest sentinel), but a conforming store never
  * produces them after returning.
  */
trait LogStore {

  /** Publish `body` at `dst` iff nothing exists there; true iff this
    * writer won. */
  def putIfAbsent(f: FileSystem, dst: Path, body: Array[Byte]): Boolean
}

object LogStore {

  /** `file:` scheme: temp + hard link. link(2) is atomic, makes the
    * full content appear at once, and fails EEXIST for exactly one
    * loser of a race. */
  object FileLink extends LogStore {
    override def putIfAbsent(f: FileSystem, dst: Path, body: Array[Byte]): Boolean = {
      val tmp = new Path(dst.getParent, s".tmp-${java.util.UUID.randomUUID()}")
      val out = f.create(tmp, false)
      try out.write(body) finally out.close()
      val won =
        try { Files.createLink(Paths.get(f.makeQualified(dst).toUri),
          Paths.get(f.makeQualified(tmp).toUri)); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      f.delete(tmp, false)
      won
    }
  }

  /** HDFS-like schemes: temp + rename, which is atomic and returns
    * false when `dst` exists (the HDFS contract; NOT true of local or
    * object-store filesystems — hence the scheme gate below). */
  object RenameNoOverwrite extends LogStore {
    override def putIfAbsent(f: FileSystem, dst: Path, body: Array[Byte]): Boolean = {
      val tmp = new Path(dst.getParent, s".tmp-${java.util.UUID.randomUUID()}")
      val out = f.create(tmp, false)
      try out.write(body) finally out.close()
      val won = f.rename(tmp, dst)
      if (!won) f.delete(tmp, false)
      won
    }
  }

  /** Schemes whose FileSystem rename is atomic-no-overwrite by
    * contract. Everything else needs an explicit [[register]]. */
  private val hdfsLike = Set("hdfs", "viewfs", "webhdfs", "swebhdfs")

  @volatile private var registry: Map[String, LogStore] = Map.empty

  /** Install a store for a scheme (e.g. an S3 conditional-put
    * implementation for `s3a`). Returns the previous binding so tests
    * can restore it. */
  def register(scheme: String, store: LogStore): Option[LogStore] = synchronized {
    val prev = registry.get(scheme)
    registry = registry.updated(scheme, store)
    prev
  }

  /** Remove a registration (test cleanup). */
  def unregister(scheme: String): Unit = synchronized {
    registry = registry - scheme
  }

  /** The store for `dst`'s scheme. Throws — rather than guessing — on
    * a scheme with no safe default and no registration: a log whose
    * commits can silently double-publish is worse than no log. */
  def forPath(dst: Path): LogStore = {
    val scheme = Option(dst.toUri.getScheme).getOrElse("file")
    registry.getOrElse(scheme,
      if (scheme.equalsIgnoreCase("file")) FileLink
      else if (hdfsLike.contains(scheme.toLowerCase)) RenameNoOverwrite
      else throw new IllegalStateException(
        s"TableLog: no LogStore registered for scheme '$scheme' — its " +
          s"filesystem's create/rename primitives are not atomic-no-overwrite, " +
          s"so commits would be silently unsafe under concurrent writers. " +
          s"Register a conditional-put LogStore for '$scheme' " +
          s"(LogStore.register) backed by the store's atomic primitive " +
          s"(e.g. S3 conditional PUT, a DynamoDB mutex — the Delta LogStore " +
          s"pattern)."))
  }

  private[sinks] def utf8(s: String): Array[Byte] =
    s.getBytes(StandardCharsets.UTF_8)
}
