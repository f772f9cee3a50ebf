package graft.promotor

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.fs._
import graft.meta.{Meta, TableMetadataValidator}

/** Table/partition promotion: move or copy data files between Hive tables
  * (or bare folders) at the filesystem level, then reconcile the catalog
  * (reference: Promotor.scala — H6-H15, M11 in SURVEY §2.9).
  *
  * Copy is a distributed Spark job (bytes stream executor↔storage);
  * move/delete are driver-side metadata calls. Target default ACLs are
  * preserved by never deleting target folders themselves, only contents.
  */
object Promotor {

  /** Source-table files → target paths by location prefix rewrite
    * (reference Assistant.scala:12-24).
    */
  def getTablesPathsList(srcDb: String, srcTable: String, trgDb: String, trgTable: String)(
      implicit spark: SparkSession): Seq[Paths] = {
    // normalize through Hadoop Path: inputFiles says file:///x while the
    // catalog location says file:/x — a raw string replace would miss
    def norm(u: String) = new Path(u).toString
    val srcLoc = norm(Meta.getTableLocation(srcDb, srcTable)).stripSuffix("/")
    val trgLoc = norm(Meta.getTableLocation(trgDb, trgTable)).stripSuffix("/")
    Meta.getListOfTableFiles(srcDb, srcTable).toIndexedSeq
      .map(f => Paths(norm(f), norm(f).replace(srcLoc, trgLoc)))
  }

  // ------------------------------------------------------------------
  // Current-database convenience overloads — the reference's primary
  // documented call shape (reference Promotor.scala:24-28,41-45,58-63,
  // 76-80,327-331,377-380): bare table names resolved against
  // spark.catalog.currentDatabase, both sides in the same database.
  // Scala allows default arguments on only ONE overload per name, so
  // the bare forms carry explicit arities and delegate to the
  // db-qualified implementations below.
  // ------------------------------------------------------------------

  /** H6 in the current database (reference Promotor.scala:24-28). */
  def copyFilesBetweenTables(srcTable: String, trgTable: String)(
      implicit spark: SparkSession): Array[FsOperationResult] =
    copyFilesBetweenTables(srcTable, trgTable, -1)

  /** H6 in the current database with an explicit task count. */
  def copyFilesBetweenTables(srcTable: String, trgTable: String, taskCount: Int)(
      implicit spark: SparkSession): Array[FsOperationResult] = {
    val db = spark.catalog.currentDatabase
    copyFilesBetweenTables(db, srcTable, db, trgTable, taskCount)
  }

  /** H8 in the current database (reference Promotor.scala:41-45). */
  def copyTablePartitions(srcTable: String, trgTable: String, matchStrings: Seq[String])(
      implicit spark: SparkSession): Array[FsOperationResult] = {
    val db = spark.catalog.currentDatabase
    copyTablePartitions(db, srcTable, db, trgTable, matchStrings)
  }

  /** H9 in the current database (reference Promotor.scala:58-63). */
  def copyOverwritePartitions(srcTable: String, trgTable: String, matchStrings: Seq[String])(
      implicit spark: SparkSession): Array[FsOperationResult] = {
    val db = spark.catalog.currentDatabase
    copyOverwritePartitions(db, srcTable, db, trgTable, matchStrings)
  }

  /** H7 in the current database (reference Promotor.scala:76-80). */
  def copyOverwriteTable(srcTable: String, trgTable: String)(
      implicit spark: SparkSession): Array[FsOperationResult] = {
    val db = spark.catalog.currentDatabase
    copyOverwriteTable(db, srcTable, db, trgTable)
  }

  /** H13 in the current database (reference Promotor.scala:327-331). */
  def moveTablePartitions(srcTable: String, trgTable: String, matchStrings: Seq[String])(
      implicit spark: SparkSession): Seq[FsOperationResult] = {
    val db = spark.catalog.currentDatabase
    moveTablePartitions(db, srcTable, db, trgTable, matchStrings)
  }

  /** H14 in the current database (reference Promotor.scala:377-380). */
  def moveFilesBetweenTables(srcTable: String, trgTable: String)(
      implicit spark: SparkSession): Seq[FsOperationResult] = {
    val db = spark.catalog.currentDatabase
    moveFilesBetweenTables(db, srcTable, db, trgTable)
  }

  /** H6: table→table file copy, no target cleanup. */
  def copyFilesBetweenTables(srcDb: String, srcTable: String, trgDb: String,
      trgTable: String, taskCount: Int = -1)(
      implicit spark: SparkSession): Array[FsOperationResult] = {
    TableMetadataValidator.validate(srcDb, srcTable, trgDb, trgTable)
    val res = DistributedExecution.copyFiles(getTablesPathsList(srcDb, srcTable, trgDb, trgTable), taskCount)
    Meta.refreshMetadata(trgDb, trgTable)
    res
  }

  /** H7: delete target content, copy all source files, refresh. */
  def copyOverwriteTable(srcDb: String, srcTable: String, trgDb: String,
      trgTable: String, taskCount: Int = -1)(
      implicit spark: SparkSession): Array[FsOperationResult] = {
    TableMetadataValidator.validate(srcDb, srcTable, trgDb, trgTable)
    implicit val conf = spark.sessionState.newHadoopConf()
    LocalExecution.deleteFolder(Meta.getTableLocation(trgDb, trgTable), deleteContentOnly = true)
    copyFilesBetweenTables(srcDb, srcTable, trgDb, trgTable, taskCount)
  }

  /** H8: copy partitions whose folder name contains any match string. */
  def copyTablePartitions(srcDb: String, srcTable: String, trgDb: String, trgTable: String,
      matchStrings: Seq[String], taskCount: Int = -1)(
      implicit spark: SparkSession): Array[FsOperationResult] = {
    TableMetadataValidator.validate(srcDb, srcTable, trgDb, trgTable)
    implicit val conf = spark.sessionState.newHadoopConf()
    val partitions = Meta.filterPartitions(srcDb, srcTable, matchStrings)
    require(partitions.nonEmpty, s"no partitions of $srcDb.$srcTable match $matchStrings")
    val srcLoc = Meta.getTableLocation(srcDb, srcTable)
    val trgLoc = Meta.getTableLocation(trgDb, trgTable)
    val files = Fs.getFilesOnlyOfFolders(partitions.toIndexedSeq)
    val pairs = files.map(e => Paths(e.path, Fs.rebase(e.path, srcLoc, trgLoc))).toIndexedSeq
    val res = DistributedExecution.copyFiles(pairs, taskCount)
    Meta.refreshMetadata(trgDb, trgTable)
    res
  }

  /** H9: delete matching target partitions, then copy matching source partitions. */
  def copyOverwritePartitions(srcDb: String, srcTable: String, trgDb: String, trgTable: String,
      matchStrings: Seq[String], taskCount: Int = -1)(
      implicit spark: SparkSession): Array[FsOperationResult] = {
    deleteTablePartitions(trgDb, trgTable, matchStrings)
    copyTablePartitions(srcDb, srcTable, trgDb, trgTable, matchStrings, taskCount)
  }

  /** H10: H8 generalized to bare folders (no metastore); target
    * subfolders auto-created (reference Promotor.scala:163-182).
    */
  def copySelectedSubFoldersContent(srcFolder: String, trgFolder: String,
      matchStrings: Seq[String], taskCount: Int = -1)(
      implicit spark: SparkSession): Array[FsOperationResult] = {
    implicit val conf = spark.sessionState.newHadoopConf()
    val src = srcFolder.stripSuffix("/")
    val subs = Meta.filterPaths(Fs.getSubfolderPaths(src), matchStrings)
    val files = Fs.getFilesOnlyOfFolders(subs.toIndexedSeq)
    val pairs = files.map(e => Paths(e.path, Fs.rebase(e.path, srcFolder, trgFolder))).toIndexedSeq
    DistributedExecution.copyFiles(pairs, taskCount)
  }

  /** H11: delete matching target subfolders then H10. */
  def copyOverwriteSelectedSubfoldersContent(srcFolder: String, trgFolder: String,
      matchStrings: Seq[String], taskCount: Int = -1)(
      implicit spark: SparkSession): Array[FsOperationResult] = {
    implicit val conf = spark.sessionState.newHadoopConf()
    val trg = trgFolder.stripSuffix("/")
    val existing = Meta.filterPaths(Fs.getSubfolderPaths(trg), matchStrings)
    LocalExecution.deletePaths(existing.toIndexedSeq)
    copySelectedSubFoldersContent(srcFolder, trgFolder, matchStrings, taskCount)
  }

  /** H12: delete matching partition folders + refresh. */
  def deleteTablePartitions(db: String, table: String, matchStrings: Seq[String])(
      implicit spark: SparkSession): Seq[FsOperationResult] = {
    implicit val conf = spark.sessionState.newHadoopConf()
    val partitions = Meta.filterPartitions(db, table, matchStrings)
    val res = LocalExecution.deletePaths(partitions.toIndexedSeq)
    Meta.refreshMetadata(db, table)
    res
  }

  /** H13: metadata-only partition move between tables — rename partition
    * dirs, no data bytes move (reference Promotor.scala:327-367).
    */
  def moveTablePartitions(srcDb: String, srcTable: String, trgDb: String, trgTable: String,
      matchStrings: Seq[String])(implicit spark: SparkSession): Seq[FsOperationResult] = {
    TableMetadataValidator.validate(srcDb, srcTable, trgDb, trgTable)
    val partitions = Meta.filterPartitions(srcDb, srcTable, matchStrings)
    require(partitions.nonEmpty, s"no partitions of $srcDb.$srcTable match $matchStrings")
    val srcLoc = Meta.getTableLocation(srcDb, srcTable)
    val trgLoc = Meta.getTableLocation(trgDb, trgTable)
    val pairs = partitions.map(p => Paths(p, Fs.rebase(p, srcLoc, trgLoc))).toIndexedSeq
    val res = moveFolders(pairs)
    Meta.refreshMetadata(srcDb, srcTable)
    Meta.refreshMetadata(trgDb, trgTable)
    res
  }

  /** H14: whole-table move via folder-content move (target cleaned,
    * source folder kept so the table stays valid), refresh both.
    */
  def moveFilesBetweenTables(srcDb: String, srcTable: String, trgDb: String, trgTable: String)(
      implicit spark: SparkSession): Seq[FsOperationResult] = {
    TableMetadataValidator.validate(srcDb, srcTable, trgDb, trgTable)
    implicit val conf = spark.sessionState.newHadoopConf()
    val res = LocalExecution.moveFolderContent(
      Meta.getTableLocation(srcDb, srcTable), Meta.getTableLocation(trgDb, trgTable),
      keepSourceFolder = true)
    Meta.refreshMetadata(srcDb, srcTable)
    Meta.refreshMetadata(trgDb, trgTable)
    res
  }

  /** H15: folder-level partition move for bare paths. */
  def moveSelectedSubFolders(srcFolder: String, trgFolder: String, matchStrings: Seq[String])(
      implicit spark: SparkSession): Seq[FsOperationResult] = {
    implicit val conf = spark.sessionState.newHadoopConf()
    val src = srcFolder.stripSuffix("/")
    val subs = Meta.filterPaths(Fs.getSubfolderPaths(src), matchStrings)
    moveFolders(subs.map(p => Paths(p, Fs.rebase(p, srcFolder, trgFolder))).toIndexedSeq)
  }

  /** M11 core folder move: per-folder safety guard, same-FS check,
    * SafetyFuse-guarded delete of existing targets, then rename — guard
    * order preserved from the reference (safety check BEFORE delete,
    * Promotor.scala:204-245).
    */
  private[graft] def moveFolders(pairs: Seq[Paths])(
      implicit spark: SparkSession): Seq[FsOperationResult] = {
    if (pairs.isEmpty) return Seq.empty
    implicit val conf = spark.sessionState.newHadoopConf()
    val fs = Fs.getFileSystem(conf, pairs.head.sourcePath)
    pairs.foreach { p =>
      require(Fs.checkIfFsIsTheSame(p.sourcePath, p.targetPath),
        s"move requires one FileSystem: $p")
      // a self-move would delete the source as the "existing target" —
      // refuse outright (defense in depth behind Fs.rebase)
      require(p.sourcePath != p.targetPath, s"refusing self-move: ${p.sourcePath}")
    }
    val trgParent = new Path(pairs.head.targetPath).getParent.toString
    val fuse = new SafetyFuse(fs, trgParent)
    val resuming = fuse.isInProgress()
    // Resuming a crashed run: pairs whose source is gone and target exists
    // already renamed — count them done. Everything else still needs its
    // move, and any target it finds in the way predates the interrupted
    // transaction's delete phase.
    val (done, toMove) =
      if (!resuming) (Seq.empty[Paths], pairs)
      else pairs.partition(p =>
        !fs.exists(new Path(p.sourcePath)) && fs.exists(new Path(p.targetPath)))
    toMove.foreach { p =>
      if (!Fs.doesMoveLookSafe(fs, p.sourcePath, p.targetPath))
        throw new IllegalStateException(s"unsafe move: $p")
    }
    if (!resuming) fuse.startTransaction()
    // Delete pre-existing targets for pairs about to move — on the resume
    // path too, else Hadoop rename(src, existingDir) silently nests the
    // partition folder INSIDE the leftover target (trg/p1/p1).
    val existing = toMove.map(_.targetPath).filter(t => fs.exists(new Path(t)))
    LocalExecution.deletePaths(existing)
    val res = done.map(p => FsOperationResult(p.sourcePath, success = true)) ++
      LocalExecution.movePaths(toMove)
    // A partial failure must leave the fuse open so a retry re-enters
    // the resume path above and counts already-renamed pairs as done
    // instead of tripping doesMoveLookSafe. Today that happens via the
    // THROW from movePaths (its retry loop only ever returns successes,
    // see Retry.retryFailed), which skips this line; the forall guard is
    // defense in depth should movePaths ever start returning failure
    // rows instead. Regression-tested in PromotorSpec.
    if (res.forall(_.success)) fuse.endTransaction()
    res
  }
}
