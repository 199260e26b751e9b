package graft.streaming

import graft.Schemas.ChangeEvent
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** CDC materialization with state TTL (SURVEY.md §7.4.5: streaming
  * state at 100 TB must be evictable). Built on
  * `flatMapGroupsWithState` + event-time timeout: a key whose last
  * update falls `ttlMs` behind the watermark is evicted and emits an
  * `expired = true` record — the state store never grows beyond the
  * active key set of the TTL horizon.
  *
  * Requires `withWatermark("ts", ...)` on the input stream.
  */
object StateTtl {

  final case class KeyState(content: String, ts: Long, seq: Long)
  final case class KeyOut(
      id: Long,
      content: Option[String],
      live: Boolean,
      expired: Boolean
  )

  def applyWithTtl(
      events: Dataset[ChangeEvent],
      ttlMs: Long
  ): Dataset[KeyOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.id)
      .flatMapGroupsWithState[KeyState, KeyOut](
        OutputMode.Update(),
        GroupStateTimeout.EventTimeTimeout
      ) { (id, batch, state: GroupState[KeyState]) =>
        if (state.hasTimedOut) {
          state.remove()
          Iterator(KeyOut(id, None, live = false, expired = true))
        } else {
          val incoming = batch.toSeq.sortBy(e => (e.ts.getTime, e.seq))
          val current = state.getOption
          val winner = incoming.lastOption.filter { w =>
            current.forall(c =>
              w.ts.getTime > c.ts || (w.ts.getTime == c.ts && w.seq >= c.seq)
            )
          }
          val out = winner match {
            case Some(w) if w.op == "D" =>
              state.remove()
              Iterator(KeyOut(id, None, live = false, expired = false))
            case Some(w) =>
              state.update(KeyState(w.content.getOrElse(""), w.ts.getTime, w.seq))
              Iterator(
                KeyOut(id, w.content, live = true, expired = false)
              )
            case None => Iterator.empty[KeyOut]
          }
          // arm the TTL relative to the newest event time we have kept
          state.getOption.foreach { s =>
            state.setTimeoutTimestamp(s.ts + ttlMs)
          }
          out
        }
      }
  }
}
