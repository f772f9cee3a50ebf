package graft.acl

import java.net.URI
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.permission.{AclEntry, AclEntryScope, AclStatus}
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** Local-filesystem test double that records ACL state in memory —
  * `RawLocalFileSystem` ignores the ACL API, and the reference dodged
  * this by requiring a live HDFS (reference AclTest.scala:25). Registered
  * under the `acl://` scheme (SURVEY §7.6).
  */
class InMemAclFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "acl"
  override def getUri: URI = URI.create("acl:///")

  private def key(p: Path): String = p.toUri.getPath

  override def modifyAclEntries(path: Path, aclSpec: java.util.List[AclEntry]): Unit = {
    InMemAclFileSystem.modifyCalls.add((key(path), aclSpec.size))
    val cur = InMemAclFileSystem.acls.getOrDefault(key(path), Nil)
    // replace same (type,name,scope) entries, append new
    val incoming = aclSpec.asScala.toList
    val keyOf = (e: AclEntry) => (e.getType, Option(e.getName), e.getScope)
    val merged = cur.filterNot(c => incoming.exists(i => keyOf(i) == keyOf(c))) ++ incoming
    InMemAclFileSystem.acls.put(key(path), merged)
  }

  override def setAcl(path: Path, aclSpec: java.util.List[AclEntry]): Unit =
    InMemAclFileSystem.acls.put(key(path), aclSpec.asScala.toList)

  override def removeAcl(path: Path): Unit =
    InMemAclFileSystem.acls.remove(key(path))

  override def getAclStatus(path: Path): AclStatus = {
    val entries = InMemAclFileSystem.acls.getOrDefault(key(path), Nil)
    new AclStatus.Builder().owner("test").group("test")
      .addEntries(entries.asJava).build()
  }
}

object InMemAclFileSystem {
  val acls = new ConcurrentHashMap[String, List[AclEntry]]()
  /** (path, entryCount) per modifyAclEntries invocation — lets specs
    * assert the multi-entry surface batches N entries into ONE FS call.
    */
  val modifyCalls = new java.util.concurrent.ConcurrentLinkedQueue[(String, Int)]()
  def clear(): Unit = { acls.clear(); modifyCalls.clear() }
}

/** [[InMemAclFileSystem]] variant that fails each path's FIRST
  * modifyAclEntries with a transient error — exercises the distributed
  * retry's left_semi re-derivation, which a never-failing FS leaves as
  * dead code. Registered under `flakyacl://`.
  */
class FlakyAclFileSystem extends InMemAclFileSystem {
  override def getScheme: String = "flakyacl"
  override def getUri: URI = URI.create("flakyacl:///")

  override def modifyAclEntries(path: Path, aclSpec: java.util.List[AclEntry]): Unit = {
    if (FlakyAclFileSystem.failedOnce.add(path.toUri.getPath))
      throw new java.io.IOException(s"injected transient failure for $path")
    super.modifyAclEntries(path, aclSpec)
  }
}

object FlakyAclFileSystem {
  val failedOnce: java.util.Set[String] = ConcurrentHashMap.newKeySet[String]()
  def clear(): Unit = failedOnce.clear()
}
