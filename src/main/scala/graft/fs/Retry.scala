package graft.fs

/** Retry-failed-subset loop shared by every effectful operator
  * (reference semantics: fs/DistributedExecution.scala:72-83,
  * fs/LocalExecution.scala:85-96 — up to 5 attempts, fail fast when an
  * attempt makes no progress at all, return per-path results).
  */
object Retry {
  val MaxAttempts = 5

  /** Run `op` over `work`, re-running only the failed subset, up to
    * [[MaxAttempts]] times.
    *
    * @param keyOf       identifies a work item by the path its result reports
    * @param repair      optional false-negative repair (reference
    *                    fs/LocalExecution.scala:151-157): applied to the
    *                    failed subset after each attempt; items it returns
    *                    are counted as successes (e.g. a rename that "failed"
    *                    but whose target exists and source is gone)
    * @return one result per work item
    */
  def retryFailed[W](
      work: Seq[W],
      op: Seq[W] => Seq[FsOperationResult],
      keyOf: W => String,
      repair: Seq[W] => Seq[W] = (_: Seq[W]) => Seq.empty,
      maxAttempts: Int = MaxAttempts): Seq[FsOperationResult] = {
    var pending = work
    var done = Vector.empty[FsOperationResult]
    var attempt = 0
    while (pending.nonEmpty && attempt < maxAttempts) {
      attempt += 1
      val results = op(pending)
      val failedPaths = results.filter(!_.success).map(_.path).toSet
      val (failed, succeeded) = pending.partition(w => failedPaths(keyOf(w)))
      done ++= results.filter(_.success)
      val repaired = repair(failed).map(keyOf).toSet
      done ++= failed.collect { case w if repaired(keyOf(w)) => FsOperationResult(keyOf(w), success = true) }
      val stillFailed = failed.filterNot(w => repaired(keyOf(w)))
      // two consecutive attempts with no progress at all (nothing
      // succeeded, nothing repaired) — the batch is hopeless; fail fast
      // instead of burning the remaining attempts (reference
      // fs/DistributedExecution.scala:76 throws on an all-failed batch).
      // The second chance covers a singleton item's transient error,
      // which would otherwise never be retried.
      if (stillFailed.nonEmpty && succeeded.isEmpty && repaired.isEmpty && attempt >= 2)
        throw new IllegalStateException(
          s"all ${stillFailed.size} operations failed on attempt $attempt")
      pending = stillFailed
    }
    if (pending.nonEmpty)
      throw new IllegalStateException(
        s"${pending.size} operations still failing after $maxAttempts attempts: " +
          pending.take(5).map(keyOf).mkString(", "))
    done
  }
}
