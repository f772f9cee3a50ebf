package graft.fs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Tree diff + rsync-lite synchronization.
  *
  * The reference computes the diff with `Array.diff` on the driver
  * (reference: Delta.scala:40-50) — O(n²) and driver-bound. Here both
  * trees become Datasets normalized to relative paths and the diff is a
  * pair of left-anti joins on (relPath, isDirectory, byteSize): O(n log n),
  * shuffled, scales to billions of entries (SURVEY §7.4.3).
  */
object Delta {

  /** Both directions of the tree diff. */
  def getDelta(sourceUri0: String, targetUri0: String)(
      implicit spark: SparkSession): (Array[DeltaEntry], Array[DeltaEntry]) = {
    import spark.implicits._
    implicit val conf = spark.sparkContext.hadoopConfiguration
    val sourceUri = sourceUri0.stripSuffix("/")
    val targetUri = targetUri0.stripSuffix("/")
    // relPath = path minus "<rootUri>/" (SQL substring is 1-based)
    val src = spark.createDataset(Fs.list(sourceUri).toIndexedSeq)
      .withColumn("relPath", expr(s"substring(path, ${sourceUri.length + 2})"))
    val trg = spark.createDataset(Fs.list(targetUri).toIndexedSeq)
      .withColumn("relPath", expr(s"substring(path, ${targetUri.length + 2})"))
    val keys = Seq("relPath", "isDirectory", "byteSize")
    val missing = src.join(trg, keys, "left_anti")
      .select($"relPath").as[String].collect()
      .map(DeltaEntry(_, DeltaEntry.MissingInTarget))
    val extra = trg.join(src, keys, "left_anti")
      .select($"relPath").as[String].collect()
      .map(DeltaEntry(_, DeltaEntry.OnlyInTarget))
    (missing, extra)
  }

  /** Make target identical to source: delete target-only paths, then
    * distributed-copy the missing files (reference Delta.scala:25-32).
    */
  def synchronize(sourceUri0: String, targetUri0: String, taskCount: Int = -1)(
      implicit spark: SparkSession): Unit = {
    implicit val conf = spark.sparkContext.hadoopConfiguration
    val sourceUri = sourceUri0.stripSuffix("/")
    val targetUri = targetUri0.stripSuffix("/")
    val (missing, extra) = getDelta(sourceUri, targetUri)
    // delete deepest-first so children go before parents
    val toDelete = extra.map(e => s"$targetUri/${e.path}").sortBy(-_.length).toIndexedSeq
    LocalExecution.deletePaths(toDelete)
    val fs = Fs.getFileSystem(conf, targetUri)
    // recreate missing directories (copy handles files only)
    val srcFs = Fs.getFileSystem(conf, sourceUri)
    missing.map(e => s"$sourceUri/${e.path}").foreach { p =>
      if (srcFs.getFileStatus(new org.apache.hadoop.fs.Path(p)).isDirectory)
        fs.mkdirs(new org.apache.hadoop.fs.Path(p.replace(sourceUri, targetUri)))
    }
    val files = missing.filter { e =>
      !srcFs.getFileStatus(new org.apache.hadoop.fs.Path(s"$sourceUri/${e.path}")).isDirectory
    }
    val pairs = files.map(e => Paths(s"$sourceUri/${e.path}", s"$targetUri/${e.path}")).toIndexedSeq
    DistributedExecution.copyFiles(pairs, taskCount)
    ()
  }
}
