package graft.fs

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class MoveCopyDeleteSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = SparkTestSession.spark
  implicit lazy val conf: Configuration = spark.sparkContext.hadoopConfiguration

  private def relSet(root: String) =
    Fs.list(root).map(e => (e.path.stripPrefix(root), e.isDirectory, e.byteSize)).toSet

  test("distributed copyFolder replicates the tree's files") {
    val src = TestTree.newRoot("cp_src"); TestTree.create(src, 42)
    val trg = TestTree.newRoot("cp_trg")
    val res = DistributedExecution.copyFolder(src, trg)
    assert(res.nonEmpty && res.forall(_.success))
    val srcFiles = Fs.list(src).filter(!_.isDirectory)
      .map(e => (e.path.stripPrefix(src), e.byteSize)).toSet
    val trgFiles = Fs.list(trg).filter(!_.isDirectory)
      .map(e => (e.path.stripPrefix(trg), e.byteSize)).toSet
    assert(trgFiles == srcFiles)
  }

  test("copyFiles is idempotent (overwrite=true)") {
    val src = TestTree.newRoot("cp2_src"); TestTree.create(src, 1)
    val trg = TestTree.newRoot("cp2_trg")
    DistributedExecution.copyFolder(src, trg)
    val res2 = DistributedExecution.copyFolder(src, trg) // rerun
    assert(res2.forall(_.success))
  }

  test("movePaths renames files and repairs false negatives") {
    val root = TestTree.newRoot("mv_root"); TestTree.create(root, 3)
    val fs = TestTree.fsFor(root)
    val files = Fs.list(root).filter(!_.isDirectory).take(3)
    val pairs = files.map(e => Paths(e.path, e.path + ".moved")).toIndexedSeq
    val res = LocalExecution.movePaths(pairs)
    assert(res.forall(_.success))
    pairs.foreach { p =>
      assert(!fs.exists(new Path(p.sourcePath)))
      assert(fs.exists(new Path(p.targetPath)))
    }
  }

  test("moveFolderContent moves level-1 children and deletes source") {
    val src = TestTree.newRoot("mvf_src"); TestTree.create(src, 5)
    val trg = TestTree.newRoot("mvf_trg") + "/dest"
    val fs = TestTree.fsFor(src)
    val before = relSet(src)
    LocalExecution.moveFolderContent(src, trg)
    assert(!fs.exists(new Path(src)))
    assert(relSet(trg) == before)
  }

  test("moveFolderContent survives file:/// + trailing-slash URI spellings (ADVICE r1 high)") {
    val src0 = TestTree.newRoot("mvs_src"); TestTree.create(src0, 7)
    val trg0 = TestTree.newRoot("mvs_trg") + "/dest"
    // equivalent but differently-spelled URIs: a raw string replace on
    // listStatus output (file:/x) would miss these and self-rename
    val src = "file://" + src0.stripPrefix("file:") + "/"
    val trg = "file://" + trg0.stripPrefix("file:")
    val before = relSet(src0)
    val fs = TestTree.fsFor(src0)
    val res = LocalExecution.moveFolderContent(src, trg)
    assert(res.nonEmpty && res.forall(_.success))
    assert(!fs.exists(new Path(src0)))
    assert(relSet(trg0) == before)
  }

  test("moveFolderContent resume: leftover target twin cleared, no nesting") {
    val src = TestTree.newRoot("mvr_src"); TestTree.create(src, 5)
    val trg = TestTree.newRoot("mvr_trg") + "/dest"
    val fs = TestTree.fsFor(src)
    // simulate a crashed run: transaction open, target partially populated
    // with a stale twin of a still-unmoved child
    fs.mkdirs(new Path(trg))
    new SafetyFuse(fs, trg).startTransaction()
    val child = fs.listStatus(new Path(src)).head.getPath.getName
    fs.mkdirs(new Path(s"$trg/$child/stale"))
    val before = relSet(src)
    val res = LocalExecution.moveFolderContent(src, trg)
    assert(res.forall(_.success))
    // the child must land flat, not nested inside its stale twin
    assert(!fs.exists(new Path(s"$trg/$child/$child")))
    assert(!fs.exists(new Path(s"$trg/$child/stale")))
    assert(relSet(trg) == before)
  }

  test("moveFolderContent refuses unsafe move (empty source, non-empty target)") {
    val src = TestTree.newRoot("mvf2_src") // empty
    val trg = TestTree.newRoot("mvf2_trg"); TestTree.create(trg, 6)
    intercept[IllegalStateException] {
      LocalExecution.moveFolderContent(src, trg)
    }
  }

  test("deletePaths + deleteFolder(contentOnly)") {
    val root = TestTree.newRoot("del_root"); TestTree.create(root, 9)
    val fs = TestTree.fsFor(root)
    val res = LocalExecution.deleteFolder(root, deleteContentOnly = true)
    assert(res.forall(_.success))
    assert(fs.exists(new Path(root)))
    assert(fs.listStatus(new Path(root)).isEmpty)
    // deleting again (already absent children) is still success
    assert(LocalExecution.deletePaths(Seq(s"$root/ghost")).forall(_.success))
  }

  test("copyFolder survives caller URI spellings; self-copy is refused, not truncating") {
    val src0 = TestTree.newRoot("reb_src"); TestTree.create(src0, 31)
    val trg = TestTree.newRoot("reb_trg")
    // file:///abs + trailing slash: a raw String.replace would produce
    // target == source and the overwrite-copy would truncate every file
    val src = "file://" + src0.stripPrefix("file:") + "/"
    val res = DistributedExecution.copyFolder(src, trg)
    assert(res.nonEmpty && res.forall(_.success))
    val (m, e) = Delta.getDelta(src0, trg)
    assert(m.isEmpty && e.isEmpty, "rebased copy is not a faithful replica")
    // direct self-copy attempts fail per-file instead of destroying data
    val victim = Fs.list(src0).filter(!_.isDirectory).head
    intercept[IllegalStateException] {
      DistributedExecution.copyFiles(Seq(Paths(victim.path, victim.path)))
    }
    assert(Fs.list(src0).filter(_.path == victim.path).head.byteSize == victim.byteSize,
      "self-copy truncated the file")
  }

  test("moveFolderContent resumes after a crash that had moved every child") {
    val root = TestTree.newRoot("mvall")
    val fs = TestTree.fsFor(root)
    def touch(p: String): Unit = TestTree.touch(fs, p)
    // crashed AFTER all children moved, BEFORE source delete + fuse close:
    // source exists but is empty, target holds the content + open marker
    fs.mkdirs(new Path(s"$root/src"))
    touch(s"$root/trg/a.txt")
    new SafetyFuse(fs, s"$root/trg").startTransaction()
    val res = LocalExecution.moveFolderContent(s"$root/src", s"$root/trg")
    assert(res.isEmpty) // nothing left to move — but the run must COMPLETE
    assert(!fs.exists(new Path(s"$root/src")), "source folder not cleaned up on resume")
    assert(fs.exists(new Path(s"$root/trg/a.txt")))
    assert(!fs.exists(new Path(s"$root/trg/graft_open_transaction")), "fuse left open")
  }

  test("moveFolderContent resume: source vanished after full move (crash before fuse close)") {
    val root = TestTree.newRoot("mvv")
    val fs = TestTree.fsFor(root)
    TestTree.touch(fs, s"$root/trg/a.txt")
    // crashed AFTER the source folder delete, BEFORE endTransaction:
    // marker open (recording the move's source), source gone entirely
    new SafetyFuse(fs, s"$root/trg").startTransaction(s"$root/src")
    val res = LocalExecution.moveFolderContent(s"$root/src", s"$root/trg")
    assert(res.isEmpty)
    assert(fs.exists(new Path(s"$root/trg/a.txt")), "resume damaged the moved content")
    assert(!fs.exists(new Path(s"$root/trg/graft_open_transaction")), "fuse left open")
    // a fresh move into the now-closed target takes the normal path again
    TestTree.touch(fs, s"$root/src2/b.txt")
    val res2 = LocalExecution.moveFolderContent(s"$root/src2", s"$root/trg")
    assert(res2.forall(_.success))
  }

  test("moveFolderContent refuses to complete a DIFFERENT move's open transaction") {
    val root = TestTree.newRoot("mvx")
    val fs = TestTree.fsFor(root)
    // an interrupted move A->trg left its marker and some moved children;
    // a retry mistakenly issued with absent source B must NOT close A's
    // marker — that would unlock a fresh A->trg run's target-clear over
    // children A already moved (and can no longer re-supply)
    TestTree.touch(fs, s"$root/trg/moved_by_a.txt")
    new SafetyFuse(fs, s"$root/trg").startTransaction(s"$root/a")
    intercept[IllegalStateException] {
      LocalExecution.moveFolderContent(s"$root/b", s"$root/trg")
    }
    assert(fs.exists(new Path(s"$root/trg/graft_open_transaction")),
      "stranger's marker was closed")
    // the genuine owner's resume still completes
    val res = LocalExecution.moveFolderContent(s"$root/a", s"$root/trg")
    assert(res.isEmpty)
    assert(!fs.exists(new Path(s"$root/trg/graft_open_transaction")))
    assert(fs.exists(new Path(s"$root/trg/moved_by_a.txt")))
  }

  test("contentHash sentinel is side-distinct for unreadable files") {
    val root = TestTree.newRoot("chs")
    // two vanished counterpart files must NEVER hash equal (a shared
    // constant sentinel would report the pair as in-sync); the sentinel
    // is the FNV-1a of each side's own URI
    val a = s"$root/src/gone.bin"
    val b = s"$root/trg/gone.bin"
    assert(Delta.contentHash(conf, a) != Delta.contentHash(conf, b))
    assert(Delta.contentHash(conf, a) == Delta.fnv1a(a))
  }

  test("distributed getDeltaDataset equals the driver-listing diff") {
    val src = TestTree.newRoot("dd_src"); TestTree.create(src, 21)
    val trg = TestTree.newRoot("dd_trg")
    DistributedExecution.copyFolder(s"$src/top0", s"$trg/top0")
    val (missing, extra) = Delta.getDelta(src, trg)
    val expected = (missing.map(e => (e.path, e.message)) ++
      extra.map(e => (e.path, e.message))).toSet
    val diff = Delta.getDeltaDataset(src, trg)
    val dist = diff.collect().map(e => (e.path, e.message)).toSet
    diff.unpersist()
    assert(dist == expected)
  }

  test("relCol matches rel across URI spellings; distributed diff plan is UDF-free") {
    import spark.implicits._
    // relCol must agree with the driver-side rel() on every spelling a
    // caller or a Hadoop listing can produce
    val cases = Seq(
      ("file:/tmp/root", "file:/tmp/root/a/b.txt"),
      ("file:///tmp/root", "file:/tmp/root/a/b.txt"),
      ("file:/tmp/root/", "file:/tmp/root/deep/x/y/z"),
      ("/tmp/root", "/tmp/root/plain/path"),
      ("hdfs://nn:8020/w/t", "hdfs://nn:8020/w/t/part-0"))
    cases.foreach { case (root, p) =>
      val got = Seq(p).toDF("path")
        .select(Delta.relCol(root)($"path")).head.getString(0)
      assert(got == Delta.rel(root)(p), s"relCol($root)($p) = $got")
    }
    // the not-under-root require survives as a raise_error branch
    val err = intercept[Exception] {
      Seq("file:/elsewhere/f").toDF("path")
        .select(Delta.relCol("file:/tmp/root")($"path")).head
    }
    assert(err.getMessage.contains("is not under root"), err.getMessage)
    // the distributed diff — the form that exists for huge listings —
    // must keep its projections visible to Catalyst/codegen
    val src = TestTree.newRoot("rc_src"); TestTree.create(src, 5)
    val trg = TestTree.newRoot("rc_trg")
    val diff = Delta.getDeltaDataset(src, trg)
    try {
      val plan = diff.queryExecution.executedPlan.toString
      assert(!plan.contains("ScalaUDF"), s"relPath regressed to a UDF:\n$plan")
    } finally diff.unpersist()
  }

  test("Delta checkContent catches same-size content drift") {
    val src = TestTree.newRoot("dlc_src"); TestTree.create(src, 11)
    val trg = TestTree.newRoot("dlc_trg")
    DistributedExecution.copyFolder(src, trg)
    // corrupt one target file, SAME byte length
    val fs = TestTree.fsFor(trg)
    val victim = Fs.list(trg).filter(!_.isDirectory).head
    val size = victim.byteSize.toInt
    val out = fs.create(new Path(victim.path), true)
    out.write(Array.fill[Byte](size)('Z')); out.close()

    val (m0, e0) = Delta.getDelta(src, trg) // size-only: blind to the edit
    assert(m0.isEmpty && e0.isEmpty)
    val (m1, e1) = Delta.getDelta(src, trg, checkContent = true)
    assert(m1.length == 1 && e1.length == 1)

    Delta.synchronize(src, trg, checkContent = true)
    val (m2, e2) = Delta.getDelta(src, trg, checkContent = true)
    assert(m2.isEmpty && e2.isEmpty)
  }

  test("distributed diff + synchronize catch and heal same-size content drift") {
    val src = TestTree.newRoot("ddc_src"); TestTree.create(src, 17)
    val trg = TestTree.newRoot("ddc_trg")
    DistributedExecution.copyFolder(src, trg)
    // corrupt one target file, SAME byte length — invisible to the
    // size-only diff, caught by the distributed content hash
    val fs = TestTree.fsFor(trg)
    val victim = Fs.list(trg).filter(!_.isDirectory).head
    val out = fs.create(new Path(victim.path), true)
    out.write(Array.fill[Byte](victim.byteSize.toInt)('Z')); out.close()

    val blind = Delta.getDeltaDataset(src, trg)
    try assert(blind.isEmpty) finally blind.unpersist()
    val sharp = Delta.getDeltaDataset(src, trg, checkContent = true)
    try assert(sharp.count() == 2) finally sharp.unpersist() // missing + extra for the drifted file
    Delta.synchronizeDistributed(src, trg, checkContent = true)
    val (m, e) = Delta.getDelta(src, trg, checkContent = true)
    assert(m.isEmpty && e.isEmpty, "distributed synchronize left drift behind")
  }

  test("Delta relativizes across URI spellings; synchronize can't wipe the target root (ADVICE r1 medium)") {
    val src0 = TestTree.newRoot("dls_src"); TestTree.create(src0, 13)
    val trg0 = TestTree.newRoot("dls_trg")
    DistributedExecution.copyFolder(src0, trg0)
    // file:///abs + trailing slash spellings: raw substring offsets would
    // produce garbage relPaths, a bogus diff, and a delete of "$trg/"
    val src = "file://" + src0.stripPrefix("file:")
    val trg = "file://" + trg0.stripPrefix("file:") + "/"
    val (m, e) = Delta.getDelta(src, trg)
    assert(m.isEmpty && e.isEmpty, s"spurious diff: ${m.take(3).mkString(",")} / ${e.take(3).mkString(",")}")
    val diff = Delta.getDeltaDataset(src, trg)
    try assert(diff.isEmpty) finally diff.unpersist()
    Delta.synchronize(src, trg)
    assert(Fs.list(trg0).nonEmpty, "synchronize deleted the target tree")
  }

  test("synchronizeDistributed reconciles without driver collection") {
    val src = TestTree.newRoot("sd_src"); TestTree.create(src, 33)
    val trg = TestTree.newRoot("sd_trg")
    DistributedExecution.copyFolder(s"$src/top1", s"$trg/top1")
    val fs = TestTree.fsFor(trg)
    val out = fs.create(new Path(s"$trg/stale/junk.bin"), true); out.write(7); out.close()

    Delta.synchronizeDistributed(src, trg)
    val (m, e) = Delta.getDelta(src, trg)
    assert(m.isEmpty, s"still missing: ${m.take(5).mkString(",")}")
    assert(e.isEmpty, s"still extra: ${e.take(5).mkString(",")}")
    assert(!fs.exists(new Path(s"$trg/stale")))
  }

  test("Delta.getDelta finds missing and extra; synchronize reconciles") {
    val src = TestTree.newRoot("dl_src"); TestTree.create(src, 42)
    val trg = TestTree.newRoot("dl_trg")
    // partial copy: only top0 subtree
    DistributedExecution.copyFolder(s"$src/top0", s"$trg/top0")
    // extra junk in target
    val fs = TestTree.fsFor(trg)
    val out = fs.create(new Path(s"$trg/junk.txt"), true); out.write(1); out.close()

    val (missing, extra) = Delta.getDelta(src, trg)
    assert(missing.nonEmpty)
    assert(extra.exists(_.path == "junk.txt"))

    Delta.synchronize(src, trg)
    val (m2, e2) = Delta.getDelta(src, trg)
    assert(m2.isEmpty, s"still missing: ${m2.take(5).mkString(",")}")
    assert(e2.isEmpty, s"still extra: ${e2.take(5).mkString(",")}")
    assert(!fs.exists(new Path(s"$trg/junk.txt")))
  }
}
