package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.acl.AclManager
import graft.compact.Compactor
import graft.fs.{FsElement, FsOperationResult, FsSizes, Retry}

/** Property-based tests over the pure planning/algorithmic cores
  * (ScalaCheck, deterministic seeds come from sbt's run).
  */
object GraftProperties extends Properties("graft") {

  // ---- Compactor planning -------------------------------------------

  val sizesGen: Gen[List[Long]] = Gen.listOf(Gen.chooseNum(0L, 1L << 32))

  property("compaction plan is -1 or within [1, fileCount]") =
    forAll(sizesGen, Gen.chooseNum(1, 1024)) { (sizes, mb) =>
      val n = Compactor.figureOutNumberOfPartitions(sizes, mb)
      n == -1 || (n >= 1 && n <= sizes.size)
    }

  property("compaction skips folders with < 2 files") =
    forAll(Gen.chooseNum(0L, Long.MaxValue / 2)) { s =>
      Compactor.figureOutNumberOfPartitions(Seq(s), 100) == -1
    }

  property("compaction plan covers total bytes or is capped at fileCount") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(1L, 1L << 24)), Gen.chooseNum(1, 64)) { (sizes, mb) =>
      val n = Compactor.figureOutNumberOfPartitions(sizes, mb)
      val target = mb.toLong * 1024 * 1024
      // when it compacts: either enough target-sized files to hold the
      // data, or the plan hit the existing-file-count cap (coalesce
      // cannot increase partitions — bigger output files are accepted)
      n == -1 || n.toLong * target >= sizes.sum - target || n == sizes.size
    }

  // ---- ZOrder core --------------------------------------------------

  property("morton interleave is injective over in-range rank vectors") =
    forAll(Gen.chooseNum(1, 4)) { nCols =>
      val bits = math.min(8, 63 / nCols)
      val g = Gen.listOfN(nCols, Gen.chooseNum(0, (1 << bits) - 1)).map(_.toArray)
      forAll(g, g) { (a, b) =>
        (graft.ops.ZOrder.interleave(a, nCols) ==
          graft.ops.ZOrder.interleave(b, nCols)) == a.sameElements(b)
      }
    }

  property("rankOf equals the count of boundaries <= v, and is monotone in v") =
    forAll(Gen.listOf(Gen.chooseNum(-1e6, 1e6)),
        Gen.chooseNum(-2e6, 2e6), Gen.chooseNum(-2e6, 2e6)) { (bs, v1, v2) =>
      val bounds = bs.sorted.toArray
      val r1 = graft.ops.ZOrder.rankOf(bounds, v1)
      r1 == bounds.count(_ <= v1) &&
        (v1 > v2 || r1 <= graft.ops.ZOrder.rankOf(bounds, v2))
    }

  // ---- Retry --------------------------------------------------------

  property("retry returns one success per item when failures are transient") =
    forAll(Gen.chooseNum(1, 30), Gen.chooseNum(0, 3)) { (items, failuresPerItem) =>
      val remaining = scala.collection.mutable.Map.empty[String, Int]
      val work = (0 until items).map(_.toString)
      work.foreach(w => remaining(w) = failuresPerItem)
      val out = Retry.retryFailed[String](
        work,
        batch => batch.map { w =>
          val fails = remaining(w)
          if (fails > 0) { remaining(w) = fails - 1; FsOperationResult(w, success = false) }
          else FsOperationResult(w, success = true)
        },
        identity)
      out.size == items && out.forall(_.success)
    }

  // ---- FsSizes ------------------------------------------------------

  val elemGen: Gen[FsElement] = for {
    depth <- Gen.chooseNum(1, 4)
    parts <- Gen.listOfN(depth, Gen.oneOf("a", "b", "c", "d"))
    isDir <- Gen.oneOf(true, false)
    size <- Gen.chooseNum(0L, 1L << 20)
  } yield FsElement("/" + parts.mkString("/"), isDir, if (isDir) 0 else size)

  property("FsSizes: root prefix sum equals total") =
    forAll(Gen.listOf(elemGen)) { elems =>
      val s = FsSizes(elems.toArray)
      s.getSizeOfPath("/") == s.totalBytes
    }

  property("FsSizes: subtree sums never exceed the total") =
    forAll(Gen.nonEmptyListOf(elemGen)) { elems =>
      val s = FsSizes(elems.toArray)
      elems.forall(e => s.getSizeOfPath(e.path) <= s.totalBytes)
    }

  // ---- ACL planning -------------------------------------------------

  val relPathGen: Gen[String] = for {
    depth <- Gen.chooseNum(1, 4)
    parts <- Gen.listOfN(depth, Gen.oneOf("x", "y", "z"))
  } yield parts.mkString("/")

  property("ACL plan: every folder resolves to nearest sourced ancestor") =
    forAll(Gen.listOf(relPathGen), Gen.listOf(relPathGen)) { (srcFolders, trgFolders0) =>
      val mk = (n: String) => Seq(AclManager.getAclEntry(
        graft.acl.FsPermission("user", "rwx", "ACCESS", n)))
      val srcAcls = ("" +: srcFolders).distinct.map(p => p -> mk(if (p.isEmpty) "ROOT" else p)).toMap
      // close target set under parents so inheritance chains are complete
      val trgFolders = trgFolders0.flatMap { p =>
        val parts = p.split("/"); (1 to parts.length).map(i => parts.take(i).mkString("/"))
      }.distinct
      val plan = AclManager.planIdealAcls(srcAcls, trgFolders).toMap
      trgFolders.forall { p =>
        val ancestors = {
          val parts = p.split("/")
          (parts.length to 0 by -1).map(i => parts.take(i).mkString("/"))
        }
        val expected = ancestors.collectFirst { case a if srcAcls.contains(a) => srcAcls(a) }
          .getOrElse(srcAcls(""))
        plan(p) == expected
      }
    }

  // ---- Bench median -------------------------------------------------

  property("bench median is an element of the passes, robust to one outlier") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(0.0, 1000.0))) { xs =>
      val m = Bench.median(xs)
      // always a measured value (never an average no pass achieved), and
      // for >= 3 passes a single arbitrarily-large outlier can't move it
      // above the max of the others
      xs.contains(m) && (xs.size < 3 || {
        val spiked = xs.tail :+ 1e12
        Bench.median(spiked) <= xs.tail.max
      })
    }
}
