package graft.fs

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import scala.util.Random

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Seeded random folder-tree fixture (modeled on the reference's
  * TestUtils.createRandomFolderStructure, src/test/scala/TestUtils.scala:88-113,
  * but deterministic — seed is explicit).
  */
object TestTree {

  def newRoot(prefix: String): String = {
    val dir = Files.createTempDirectory(prefix).toFile
    dir.deleteOnExit()
    "file:" + dir.getAbsolutePath
  }

  /** Create a one-byte file at `p` (parents included). */
  def touch(fs: FileSystem, p: String): Unit = {
    val o = fs.create(new org.apache.hadoop.fs.Path(p), true)
    o.write(1)
    o.close()
  }

  /** Build a random tree: `width` top dirs, depth 2-4, 2-4 children per
    * node, one `<name>.txt` file per folder. Returns the root URI.
    */
  def create(rootUri: String, seed: Long, width: Int = 3)(implicit conf: Configuration): Unit = {
    val rnd = new Random(seed)
    val fs = Fs.getFileSystem(conf, rootUri)

    def writeFile(p: String, content: String): Unit = {
      val out = fs.create(new Path(p), true)
      out.write(content.getBytes(StandardCharsets.UTF_8))
      out.close()
    }

    def mkTree(dir: String, depth: Int): Unit = {
      fs.mkdirs(new Path(dir))
      writeFile(s"$dir/${new Path(dir).getName}.txt", s"content of $dir " + ("x" * rnd.nextInt(100)))
      if (depth > 0) {
        val children = 2 + rnd.nextInt(3)
        (0 until children).foreach { i =>
          mkTree(s"$dir/d${depth}_$i", depth - 1)
        }
      }
    }

    (0 until width).foreach(i => mkTree(s"$rootUri/top$i", 1 + (seed % 3).toInt))
  }

  def fsFor(uri: String)(implicit conf: Configuration): FileSystem =
    Fs.getFileSystem(conf, uri)
}
