package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the e11 ordered funnel: per user, the earliest
  * view, the earliest click STRICTLY AFTER it, and the earliest
  * purchase strictly after that, maintained continuously over an
  * unbounded event stream.
  *
  * The batch query spells the sequential dependence as layered running
  * minima over one (user, ts, event_id) sort; the streaming form is
  * the SAME fold run incrementally: events buffer per user until the
  * watermark passes them (so late-but-legal arrivals slot into order),
  * then fold into three monotone minima in (ts, event_id) order —
  * view lowers v; a click with ts > v (a view exists strictly before
  * it) lowers c; a purchase with ts > c lowers p. Because matured
  * events are processed in global event-time order, the fold's minima
  * equal the batch windows' final running minima exactly
  * (stream == batch pinned in StreamingFunnelSpec).
  *
  * State per user = the three minima + the un-matured buffer — bounded
  * by the watermark horizon, the [[StreamingAsOf]] contract; an
  * event-time timeout wakes users whose buffered events matured in a
  * trigger that brought them no new data. Emission is one row per user
  * per trigger in which its fold advanced (Update semantics): minima
  * only ever decrease and the stage only ever rises, so the CURRENT
  * answer per user is the componentwise extreme of its emissions.
  */
object StreamingFunnel {

  /** Input event. `ts` must be the WATERMARKED timestamp column itself
    * (the [[StreamingAsOf.Tick]] contract); `tsNanos` is its integer
    * twin used for state arithmetic and emitted times.
    */
  case class Ev(userId: Long, ts: java.sql.Timestamp, tsNanos: Long,
      eventId: Long, eventType: String)

  case class FunnelState(firstView: Option[Long], firstClick: Option[Long],
      firstPurchase: Option[Long], pending: List[Ev])

  case class FunnelRow(userId: Long, firstView: Option[Long],
      firstClick: Option[Long], firstPurchase: Option[Long], stage: Long)

  private def stageOf(v: Option[Long], c: Option[Long], p: Option[Long]): Long =
    if (p.isDefined) 3L else if (c.isDefined) 2L else if (v.isDefined) 1L else 0L

  def funnel(events: Dataset[Ev]): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[FunnelState, FunnelRow](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[Ev], state: GroupState[FunnelState]) =>
          val prev = state.getOption.getOrElse(FunnelState(None, None, None, Nil))
          val wmNanos = state.getCurrentWatermarkMs() * 1000000L
          val all = (prev.pending ++ rows.toList).sortBy(e => (e.tsNanos, e.eventId))
          val (matured, pending) = all.partition(_.tsNanos <= wmNanos)
          var v = prev.firstView
          var c = prev.firstClick
          var p = prev.firstPurchase
          // the e11 layered-minima fold, one matured event at a time in
          // (ts, event_id) order: each minimum only ever decreases, and
          // qualification reads the minima of strictly-earlier events —
          // exactly the batch windows' running values at this position
          matured.foreach { e =>
            e.eventType match {
              case "view" =>
                if (v.forall(e.tsNanos < _)) v = Some(e.tsNanos)
              case "click" =>
                if (v.exists(_ < e.tsNanos) && c.forall(e.tsNanos < _))
                  c = Some(e.tsNanos)
              case "purchase" =>
                if (c.exists(_ < e.tsNanos) && p.forall(e.tsNanos < _))
                  p = Some(e.tsNanos)
              case _ => ()
            }
          }
          val advanced = matured.nonEmpty
          if (pending.isEmpty && v.isEmpty && c.isEmpty && p.isEmpty) {
            state.remove()
          } else {
            state.update(FunnelState(v, c, p, pending))
            // wake when the watermark reaches the oldest buffered event,
            // so it folds in even if this user never sends data again
            pending.headOption.foreach(e => state.setTimeoutTimestamp(
              math.max(e.tsNanos / 1000000L, state.getCurrentWatermarkMs() + 1)))
          }
          if (advanced) Iterator(FunnelRow(user, v, c, p, stageOf(v, c, p)))
          else Iterator.empty
      }
  }
}
