package graft

import java.net.URI
import org.apache.hadoop.fs.{FSDataInputStream, Path, RawLocalFileSystem}

/** In-test object-store stand-in: a Hadoop FileSystem registered under
  * the `grafts3` scheme (via `fs.grafts3.impl`) that serves local
  * files. Proves the engine's path contract is scheme-agnostic — every
  * read goes through `FileSystem.get(uri, conf)`, so pointing Tables
  * at `s3a://bucket/...` only requires the hadoop-aws module on the
  * classpath plus `fs.s3a.impl`, exactly like this fake. The static
  * open counter shows the bytes really flowed through THIS FileSystem,
  * not a silent fallback to `file:`. Instantiated reflectively by
  * Hadoop — must stay public with a no-arg constructor. */
class FakeObjectStoreFS extends RawLocalFileSystem {
  override def getScheme: String = "grafts3"
  override def getUri: URI = URI.create("grafts3:///")
  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    FakeObjectStoreFS.opens.incrementAndGet()
    super.open(f, bufferSize)
  }
}

object FakeObjectStoreFS {
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
}
