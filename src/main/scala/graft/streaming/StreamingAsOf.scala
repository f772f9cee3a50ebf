package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming backward as-of join on a single keyed tick stream
  * (`side` ∈ left/right): each LEFT tick is matched to the most recent
  * RIGHT tick at or before it within the key, emitting once the
  * watermark guarantees no earlier-timestamped right tick can still
  * arrive.
  *
  * Why not the batch union+window plan: a streaming window over
  * unbounded input would buffer forever. Here state is explicitly
  * bounded by the watermark — per key we hold (a) left ticks not yet
  * matured past the watermark and (b) right ticks newer than the oldest
  * pending left, plus ONE right tick at or before it (the only older
  * row a future left can still match). Both buffers shrink as the
  * watermark advances; an event-time timeout wakes groups whose pending
  * lefts matured in a batch that brought them no new data.
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
            val m = rights.takeWhile(_.tsMicros <= l.tsMicros).lastOption
            AsOfMatch(key, l.id, l.tsMicros, m.map(_.id), m.map(_.value))
          }
          if (pending.isEmpty && wmMicros >= (prev.rights ++ incoming).map(_.tsMicros)
              .foldLeft(Long.MinValue)(_ max _)) {
            state.remove() // nothing left to match and no fresher data than the watermark
          } else {
            // keep rights a future left could still match: everything after
            // the maturity horizon plus the single latest one at/before it
            val horizon = pending.headOption.map(_.tsMicros).getOrElse(wmMicros)
            val (older, newer) = rights.partition(_.tsMicros <= horizon)
            state.update(Buffers(pending, older.lastOption.toList ++ newer))
            // wake this group when the watermark reaches its oldest pending
            // left even if no new data arrives for the key
            pending.headOption.foreach(p =>
              state.setTimeoutTimestamp(math.max(p.tsMicros / 1000L, state.getCurrentWatermarkMs() + 1)))
          }
          out.iterator
      }
  }
}
