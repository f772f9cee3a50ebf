package graft.ext

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.compact.Compactor
import graft.fs.{Fs, SafetyFuse}

/** Operational lifecycle for the persisted similarity-index artifacts:
  * the ext/ indexes are plain parquet, so they get the SAME treatment
  * tables get on the fs surface — rebuild to a sibling path, compact +
  * z-order the rewrite ([[Compactor.doAutoCoalesce]]), and promote it
  * with a [[SafetyFuse]]-guarded atomic swap (the Promotor/Compactor
  * rename discipline: live → bak, new → live, drop bak, marker open
  * across the destructive window so a crashed swap is recoverable and
  * a rerun can't re-delete).
  *
  * Serving continuity: [[graft.streaming.StreamingSimilarity.startAt]]
  * re-reads the index path per micro-batch, so a swap that lands
  * between micro-batches is picked up by the NEXT batch with no stream
  * restart — the E2E spec pins stream == batch across a rebuild+swap.
  */
object IndexLifecycle {

  /** Rebuild the LSH index for `vectors` and atomically swap it into
    * `livePath`. The rebuild lands at `<livePath>_rebuild`, gets
    * compacted (z-ordered on (table, bucket) — the probe join's key, so
    * bucket reads cluster into contiguous row groups), has its params
    * sidecar restored (compaction rewrites the folder), and then
    * replaces the live index inside a fuse-guarded swap. Readers keep
    * probing `livePath` throughout; only the rename window (two
    * metadata ops) is exclusive.
    */
  def rebuildLshIndex(vectors: DataFrame, livePath: String, dim: Int,
      bitsPerTable: Int = 8, tables: Int = 8, seedBase: Long = 2000L,
      requestedSizeMb: Int = 100,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    implicit val spark: SparkSession = vectors.sparkSession
    val rebuild = s"${livePath}_rebuild"
    Similarity.writeLshIndex(vectors, rebuild, dim, bitsPerTable, tables, seedBase,
      idCol, vecCol)
    // compaction rewrites the folder (losing the sidecar with the old
    // dir) — restore params after, they describe the same build
    Compactor.doAutoCoalesce(rebuild, requestedSizeMb,
      zorderCols = Seq("table", "bucket"))
    Similarity.writeLshParams(spark, rebuild,
      Similarity.LshParams(dim, bitsPerTable, tables, seedBase))
    // record the build corpus's distribution fingerprint so ingest can
    // ask driftSinceBuild without keeping the corpus around
    Similarity.writeMomentsSidecar(vectors, rebuild, vecCol)
    swapIn(spark, rebuild, livePath)
  }

  /** [[rebuildLshIndex]] for the IVF family: rebuild codebook +
    * inverted lists to `<livePath>_rebuild` (lists compacted and
    * z-ordered on `centroid_id` — the probe join's key, so an nProbe
    * read touches contiguous row groups), then swap the whole index
    * directory in one fuse-guarded promotion (codebook and lists move
    * together — a probe can never see a new codebook over old lists).
    */
  def rebuildIvfIndex(corpus: DataFrame, livePath: String, nCentroids: Int = 16,
      requestedSizeMb: Int = 100,
      idCol: String = "vec_id", vecCol: String = "embedding",
      trainIters: Int = 0): Unit = {
    implicit val spark: SparkSession = corpus.sparkSession
    val rebuild = s"${livePath}_rebuild"
    // trainIters > 0 swaps the hash-sampled codebook for a Lloyd's-
    // trained one (Similarity.trainCodebook) — same index shapes, the
    // rebuild just spends trainIters extra linear passes to tighten
    // the inverted lists before the one-time layout + swap
    val index =
      if (trainIters > 0)
        Similarity.ivfIndexTrained(corpus, nCentroids, trainIters, idCol, vecCol)
      else Similarity.ivfIndex(corpus, nCentroids, idCol, vecCol)
    Similarity.writeIvfIndexParts(index, rebuild)
    Compactor.doAutoCoalesce(s"$rebuild/lists", requestedSizeMb,
      zorderCols = Seq("centroid_id"))
    Similarity.writeMomentsSidecar(corpus, rebuild, vecCol)
    swapIn(spark, rebuild, livePath)
  }

  /** [[rebuildIvfIndex]] for the PQ family: train + encode to
    * `<livePath>_rebuild`, compact + z-order the codes on the ADC
    * probe join's (sub, code) key, and promote codebook + codes +
    * sidecar together under the fuse (the sidecar lives at the index
    * ROOT, so compacting the codes subfolder can't eat it).
    */
  def rebuildPqIndex(corpus: DataFrame, livePath: String, m: Int = 4,
      k: Int = 8, iters: Int = 2, requestedSizeMb: Int = 100,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    implicit val spark: SparkSession = corpus.sparkSession
    val rebuild = s"${livePath}_rebuild"
    Similarity.writePqIndex(corpus, rebuild, m, k, iters, idCol, vecCol)
    Compactor.doAutoCoalesce(s"$rebuild/codes", requestedSizeMb,
      zorderCols = Seq("sub", "code"))
    Similarity.writeMomentsSidecar(corpus, rebuild, vecCol)
    swapIn(spark, rebuild, livePath)
  }

  /** [[rebuildLshIndex]] for the minhash text family: rebuild the
    * banded-signature index to `<livePath>_rebuild`, compact +
    * z-order on (band, bandHash) — the candidate join's key — and
    * swap it in under the fuse.
    */
  def rebuildMinhashIndex(docs: DataFrame, livePath: String,
      n: Int = 3, k: Int = 32, bands: Int = 16, requestedSizeMb: Int = 100,
      textCol: String = "text", idCol: String = "doc_id"): Unit = {
    implicit val spark: SparkSession = docs.sparkSession
    val rebuild = s"${livePath}_rebuild"
    Dedup.writeMinhashIndex(docs, rebuild, n, k, bands, textCol, idCol)
    Compactor.doAutoCoalesce(rebuild, requestedSizeMb,
      zorderCols = Seq("band", "bandHash"))
    // compaction rewrites the folder and its sidecar with it — restore
    Dedup.writeMinhashParams(spark, rebuild, Dedup.MinhashParams(n, k, bands))
    swapIn(spark, rebuild, livePath)
  }

  /** [[rebuildMinhashIndex]] for the near-dup pair-graph artifact
    * ([[Dedup.writePairGraph]]): full recompute to `<livePath>_rebuild`,
    * compacted (z-ordered on id_a — every consumer's first join/groupBy
    * key, so cluster/representative/graph reads touch contiguous row
    * groups), sidecar restored, fuse-guarded swap. The full-rebuild
    * member of the pair-graph lifecycle ([[Dedup.updatePairGraph]] /
    * [[Dedup.forgetDocs]] are the incremental ones): run it on snapshot
    * boundaries or when incremental drift warrants a clean base.
    */
  def rebuildPairGraph(docs: DataFrame, livePath: String, n: Int = 3,
      minJaccard: Double = 0.5, requestedSizeMb: Int = 100,
      textCol: String = "text", idCol: String = "doc_id",
      prefixFilter: Boolean = false, broadcastDf: Boolean = false): Unit = {
    implicit val spark: SparkSession = docs.sparkSession
    val rebuild = s"${livePath}_rebuild"
    Dedup.writePairGraph(docs, rebuild, n, minJaccard, textCol, idCol,
      prefixFilter, broadcastDf)
    Compactor.doAutoCoalesce(rebuild, requestedSizeMb, zorderCols = Seq("id_a"))
    // compaction rewrites the folder and its sidecar with it — restore
    Dedup.writePairGraphParams(spark, rebuild,
      Dedup.PairGraphParams("jaccard", n, minJaccard))
    swapIn(spark, rebuild, livePath)
  }

  /** Drift of an ingest batch against the distribution the LIVE index
    * was built from ([[Similarity.embeddingDrift]] vs the
    * `_graft_moments` sidecar every vector rebuild records): the
    * measured answer to "do the planes/codebooks still describe this
    * corpus?", thresholded by the caller —
    * `if (Similarity.maxAbsDrift(driftSinceBuild(...)) > tol)
    * rebuild…Index(...)`. Dim-row cost on the index side; one
    * map-side-combined aggregation over the batch.
    */
  def driftSinceBuild(spark: SparkSession, livePath: String, batch: DataFrame,
      vecCol: String = "embedding"): DataFrame = {
    val before = Similarity.readMomentsSidecar(spark, livePath).getOrElse(
      throw new IllegalArgumentException(
        s"$livePath has no _graft_moments sidecar — rebuild with the current " +
        "lifecycle to record the build distribution"))
    Similarity.embeddingDrift(before, Similarity.embeddingMoments(batch, vecCol))
  }

  /** Fuse-guarded atomic swap: promote `rebuildPath` over `livePath`.
    * Marker content records the rebuild path so [[recoverSwap]] can
    * verify an open transaction is its own before touching anything.
    */
  def swapIn(spark: SparkSession, rebuildPath: String, livePath: String): Unit = {
    val fs = Fs.getFileSystem(spark.sparkContext.hadoopConfiguration, livePath)
    val fuse = swapFuse(spark, livePath)
    require(!fuse.isInProgress(),
      s"unfinished swap on $livePath — run recoverSwap first")
    val bak = s"${livePath}_swap_bak"
    fuse.startTransaction(rebuildPath)
    fs.delete(new Path(bak), true)
    // no live index yet = the initial promotion; nothing to move aside
    if (fs.exists(new Path(livePath)))
      require(fs.rename(new Path(livePath), new Path(bak)),
        s"swap: cannot move $livePath aside")
    require(fs.rename(new Path(rebuildPath), new Path(livePath)),
      s"swap: cannot promote $rebuildPath")
    fs.delete(new Path(bak), true)
    fuse.endTransaction()
  }

  /** Complete or roll back a swap whose process died mid-transaction.
    * State machine over (live, bak, rebuild) existence:
    *  - no open marker → nothing to do;
    *  - live exists → the destructive renames either never started or
    *    fully completed: drop any leftover bak, close the marker;
    *  - live missing, rebuild exists → crashed between the two renames:
    *    finish the promotion (rebuild → live), drop bak, close;
    *  - live missing, rebuild gone, bak exists → promotion half-lost:
    *    restore the old index (bak → live), close — serving resumes on
    *    the previous build.
    * Returns true when a marker was found and resolved.
    */
  def recoverSwap(spark: SparkSession, livePath: String): Boolean = {
    val fs = Fs.getFileSystem(spark.sparkContext.hadoopConfiguration, livePath)
    val fuse = swapFuse(spark, livePath)
    if (!fuse.isInProgress()) return false
    val bak = s"${livePath}_swap_bak"
    val rebuild = fuse.markerContent().getOrElse("")
    val liveP = new Path(livePath)
    if (!fs.exists(liveP)) {
      if (rebuild.nonEmpty && fs.exists(new Path(rebuild))) {
        require(fs.rename(new Path(rebuild), liveP), s"recover: cannot promote $rebuild")
        fs.delete(new Path(bak), true)
      } else {
        require(fs.exists(new Path(bak)), s"recover: neither live, rebuild nor bak at $livePath")
        require(fs.rename(new Path(bak), liveP), s"recover: cannot restore $bak")
      }
    } else fs.delete(new Path(bak), true)
    fuse.endTransaction()
    true
  }

  /** Run `body`, retrying briefly while the live index is mid-[[swapIn]]:
    * between rename(live → bak) and rename(rebuild → live) the live path
    * does not exist, so a serving micro-batch firing inside that window
    * would throw and permanently fail its streaming query. The window is
    * two renames (milliseconds); this parks the batch for up to
    * `attempts × sleepMs` (default 10 s) on missing-path/missing-sidecar
    * errors before letting the failure through. Retrying the WHOLE batch
    * body — including its parquet append — is safe under Spark's default
    * commit protocol: a job that failed before commit has published no
    * files, so the re-run appends exactly once.
    */
  def retryingDuringSwap[T](attempts: Int = 100, sleepMs: Long = 100)(body: => T): T = {
    var left = attempts
    while (true) {
      try return body
      catch {
        case e: Throwable if left > 0 && isTransientMissing(e) =>
          left -= 1; Thread.sleep(sleepMs)
      }
    }
    sys.error("unreachable")
  }

  /** A missing live path / params sidecar, anywhere in the cause chain —
    * what a batch sees when it races [[swapIn]]'s rename pair.
    */
  @annotation.tailrec
  private def isTransientMissing(e: Throwable): Boolean = e match {
    case null => false
    case _: java.io.FileNotFoundException => true
    case t =>
      val m = Option(t.getMessage).getOrElse("")
      if (m.contains("PATH_NOT_FOUND") || m.contains("Path does not exist") ||
        m.contains("params sidecar")) true
      else isTransientMissing(t.getCause)
  }

  private def swapFuse(spark: SparkSession, livePath: String): SafetyFuse = {
    val p = new Path(livePath)
    new SafetyFuse(
      Fs.getFileSystem(spark.sparkContext.hadoopConfiguration, livePath),
      p.getParent.toString, s"${p.getName}_swap")
  }
}
