package graft.fs

/** Retry-failed-subset loop shared by every effectful operator
  * (reference shape: fs/DistributedExecution.scala:72-83,
  * fs/LocalExecution.scala:85-96 — up to 5 attempts, return per-path
  * results, throw once attempts are exhausted). One DELIBERATE
  * divergence: the reference fails fast when an attempt makes zero
  * progress (failed.length == paths.length aborts the loop); here a
  * zero-progress attempt is retried like any other, because a
  * batch-wide transient outage (storage briefly unreachable) fails
  * EVERY item in an attempt and must still recover on a later one
  * (pinned by the transient-failures property in PropertySpec).
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
      val failed = pending.filter(w => failedPaths(keyOf(w)))
      done ++= results.filter(_.success)
      val repaired = repair(failed).map(keyOf).toSet
      done ++= failed.collect { case w if repaired(keyOf(w)) => FsOperationResult(keyOf(w), success = true) }
      pending = failed.filterNot(w => repaired(keyOf(w)))
    }
    if (pending.nonEmpty)
      throw new IllegalStateException(
        s"${pending.size} operations still failing after $maxAttempts attempts: " +
          pending.take(5).map(keyOf).mkString(", "))
    done
  }
}
