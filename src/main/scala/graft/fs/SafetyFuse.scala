package graft.fs

import org.apache.hadoop.fs.{FileSystem, Path}

/** Marker-file transaction guard making destructive move/delete sequences
  * rerun-safe (reference: SafetyFuse.scala:5-25). `startTransaction`
  * relies on the FS-atomic `createNewFile`; a rerun that finds the marker
  * skips its target-delete step.
  */
class SafetyFuse(fs: FileSystem, folder: String, runId: String = "graft") {
  private val marker = new Path(s"$folder/${runId}_open_transaction")

  def isInProgress(): Boolean = fs.exists(marker)

  def startTransaction(): Unit = {
    if (!fs.exists(new Path(folder))) fs.mkdirs(new Path(folder))
    fs.createNewFile(marker)
  }

  def endTransaction(): Unit = fs.delete(marker, false)
}
