package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming backward as-of join on a single keyed tick stream
  * (`side` ∈ left/right): each LEFT tick is matched to the most recent
  * RIGHT tick at or before it within the key, emitting once the
  * watermark guarantees no earlier-timestamped right tick can still
  * arrive.
  *
  * Why not the batch union+window plan: a streaming window over
  * unbounded input would buffer forever. Here per-key state holds only
  * (a) left ticks not yet matured past the watermark and (b) the single
  * latest right tick at or before the watermark plus rights newer than
  * it — everything an arbitrarily-late-but-legal future left could
  * still match. The one-retained-right floor is inherent to as-of
  * semantics (a left may arrive years after its matching right); rows
  * above it are bounded by the watermark horizon. An event-time timeout
  * wakes groups whose pending lefts matured in a batch that brought
  * them no new data.
  */
object StreamingAsOf {

  /** Input tick. `ts` must be the WATERMARKED timestamp column itself —
    * Spark's checker requires the watermark attribute to flow into the
    * stateful operator; `tsMicros` is its integer twin used for state
    * arithmetic. `isLeft` discriminates the two logical streams.
    */
  case class Tick(key: Long, ts: java.sql.Timestamp, tsMicros: Long,
      isLeft: Boolean, id: Long, value: Double)

  /** Emitted match: left tick + most recent prior right tick (None when
    * no right tick preceded it).
    */
  case class AsOfMatch(key: Long, leftId: Long, leftTsMicros: Long,
      rightId: Option[Long], rightValue: Option[Double])

  case class Buffers(lefts: List[Tick], rights: List[Tick])

  /** Tie-break shared by both directions: among the rights tied at the
    * winning timestamp, the row with the largest (value, id) payload.
    * This is exactly the row the batch twin's carry keeps when its
    * payload struct is (value, id)-ordered ([[graft.ops.AsOf]] orders
    * tied rights by the carried struct) — build batch parity checks
    * with payload Seq(value, id) and the two APIs agree on ties
    * (pinned in StreamingSpec). `cands` must be (ts, id)-sorted.
    */
  private def maxTied(cands: List[Tick]): Option[Tick] =
    cands.lastOption.map(last =>
      cands.filter(_.tsMicros == last.tsMicros).maxBy(t => (t.value, t.id)))

  /** @param ticks keyed tick stream; the upstream DataFrame MUST carry a
    *        watermark on the timestamp column tsMicros was derived from,
    *        or state never matures.
    */
  def joinBackward(ticks: Dataset[Tick]): Dataset[AsOfMatch] = {
    import ticks.sparkSession.implicits._
    ticks.groupByKey(_.key)
      .flatMapGroupsWithState[Buffers, AsOfMatch](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, rows: Iterator[Tick], state: GroupState[Buffers]) =>
          val prev = state.getOption.getOrElse(Buffers(Nil, Nil))
          val incoming = rows.toList
          val lefts = (prev.lefts ++ incoming.filter(_.isLeft)).sortBy(t => (t.tsMicros, t.id))
          val rights = (prev.rights ++ incoming.filterNot(_.isLeft)).sortBy(t => (t.tsMicros, t.id))
          val wmMicros = state.getCurrentWatermarkMs() * 1000L
          // a left tick matures once no right tick <= its ts can arrive
          val (matured, pending) = lefts.partition(_.tsMicros <= wmMicros)
          val out = matured.map { l =>
            val m = maxTied(rights.takeWhile(_.tsMicros <= l.tsMicros))
            AsOfMatch(key, l.id, l.tsMicros, m.map(_.id), m.map(_.value))
          }
          // prune rights to what a FUTURE left can still match. Future
          // lefts are only bounded below by the WATERMARK (they can be
          // older than pending lefts), so the horizon is wm, not the
          // oldest pending left: keep the rights at the latest ts at/
          // below wm (ALL of them — the tie-break needs the full tied
          // group) plus everything newer.
          val (older, newer) = rights.partition(_.tsMicros <= wmMicros)
          val keep = (if (older.isEmpty) Nil
                      else older.filter(_.tsMicros == older.last.tsMicros)) ++ newer
          if (pending.isEmpty && keep.isEmpty) {
            state.remove() // key has never seen a right tick worth remembering
          } else {
            state.update(Buffers(pending, keep))
            // wake when the watermark reaches the oldest pending left (to
            // emit without new data); else once more to compact a multi-row
            // right buffer down to its one-row floor
            val wakeMs = pending.headOption.map(_.tsMicros / 1000L)
              .orElse(if (keep.size > 1) Some(keep.map(_.tsMicros).max / 1000L) else None)
            wakeMs.foreach(w =>
              state.setTimeoutTimestamp(math.max(w, state.getCurrentWatermarkMs() + 1)))
          }
          out.iterator
      }
  }

  /** Streaming FORWARD as-of: each left tick matches the EARLIEST right
    * tick at or after it. A lookahead `toleranceMicros` is mandatory —
    * it is what makes the stream version viable: without a bound a left
    * with no following right would wait forever. A left emits when its
    * match is final: either its earliest following right is at or below
    * the watermark (no future right can be earlier), or the watermark
    * passed `ts + tolerance` (no future right can land inside the
    * window; a farther candidate is nulled per tolerance). Unlike
    * [[joinBackward]] the state has NO retained-row floor: rights at or
    * below the watermark serve only pending lefts, so once none need
    * them they drop, and fully-drained keys remove their state.
    */
  def joinForward(ticks: Dataset[Tick], toleranceMicros: Long): Dataset[AsOfMatch] = {
    require(toleranceMicros >= 0, "forward as-of needs a non-negative lookahead tolerance")
    import ticks.sparkSession.implicits._
    ticks.groupByKey(_.key)
      .flatMapGroupsWithState[Buffers, AsOfMatch](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, rows: Iterator[Tick], state: GroupState[Buffers]) =>
          val prev = state.getOption.getOrElse(Buffers(Nil, Nil))
          val incoming = rows.toList
          val lefts = (prev.lefts ++ incoming.filter(_.isLeft)).sortBy(t => (t.tsMicros, t.id))
          val rights = (prev.rights ++ incoming.filterNot(_.isLeft)).sortBy(t => (t.tsMicros, t.id))
          val wmMicros = state.getCurrentWatermarkMs() * 1000L
          // earliest right ts at/after the left; ties resolve via the
          // shared maxTied contract
          def candidate(l: Tick): Option[Tick] =
            rights.find(_.tsMicros >= l.tsMicros).map(first =>
              maxTied(rights.filter(_.tsMicros == first.tsMicros)).get)
          def isFinal(l: Tick): Boolean =
            candidate(l).exists(_.tsMicros <= wmMicros) || wmMicros >= l.tsMicros + toleranceMicros
          val (matured, pending) = lefts.partition(isFinal)
          val out = matured.map { l =>
            val m = candidate(l).filter(_.tsMicros <= l.tsMicros + toleranceMicros)
            AsOfMatch(key, l.id, l.tsMicros, m.map(_.id), m.map(_.value))
          }
          // rights above the watermark can serve future lefts; rights at or
          // below it only ever serve the still-pending ones
          val horizon = pending.headOption.map(_.tsMicros).getOrElse(Long.MaxValue)
          val keep = rights.filter(r => r.tsMicros > wmMicros || r.tsMicros >= horizon)
          if (pending.isEmpty && keep.isEmpty) state.remove()
          else {
            state.update(Buffers(pending, keep))
            // wake at worst-case left maturity (wm reaching ts+tolerance);
            // with no pending lefts, wake when the wm passes the LAST
            // retained right — the prune above then drops everything and
            // the state removes. Without that arm, a key whose stream
            // ends on right ticks is never re-invoked and its buffered
            // rights live forever.
            val wakeMicros = pending.headOption.map(_.tsMicros + toleranceMicros)
              .orElse(keep.lastOption.map(_.tsMicros))
            wakeMicros.foreach(w => state.setTimeoutTimestamp(
              math.max(w / 1000L, state.getCurrentWatermarkMs() + 1)))
          }
          out.iterator
      }
  }

  /** Drive a started streaming query to an output fixpoint: matured
    * as-of rows are emitted in timeout-driven no-data micro-batches that
    * a single processAllAvailable may not cover — poll until the sink
    * row count stops growing.
    */
  def drainToFixpoint(q: org.apache.spark.sql.streaming.StreamingQuery,
      rowCount: () => Long, maxRounds: Int = 30): Unit = {
    q.processAllAvailable()
    var prev = -1L
    var cur = rowCount()
    var i = 0
    while (cur != prev && i < maxRounds) {
      Thread.sleep(500)
      q.processAllAvailable()
      prev = cur
      cur = rowCount()
      i += 1
    }
  }

  /** Clicks-as-left / views-as-right tick stream over the events table —
    * the fixture wiring shared by StreamingSpec and StreamTour.
    */
  def clickViewTicks(events: DataFrame): Dataset[Tick] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", "10 minutes")
      .filter(col("event_type").isin("click", "view"))
      .select(col("user_id").as("key"), col("ts"), unix_micros(col("ts")).as("tsMicros"),
        (col("event_type") === "click").as("isLeft"), col("event_id").as("id"), col("value"))
      .as[Tick]
  }

  /** Batch twin of [[clickViewTicks]]+[[joinBackward]] for parity
    * checks: (click event_id → matched view event_id or None).
    */
  def clickViewBatch(spark: SparkSession, dir: String): Map[Long, Option[Long]] = {
    val ev = graft.Tables.events(spark, dir).withColumn("us", expr("ts div 1000"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("us"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("us"), col("event_id").as("view_id"))
    graft.ops.AsOf.joinBackward(clicks, views, Seq("user_id"), "us", "us", Seq("view_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
  }
}
