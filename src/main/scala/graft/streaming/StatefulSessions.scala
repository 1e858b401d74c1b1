package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Arbitrary-state streaming sessionization via
  * `flatMapGroupsWithState` — the custom-state operator family
  * (`KeyValueGroupedDataset.mapGroupsWithState` and friends) that is
  * Structured Streaming's rendition of what the reference's dynamic
  * tables would re-derive by batch re-scan (`matview.c` refresh): the
  * per-user open session lives in the state store, each micro-batch
  * folds its events in, and a session CLOSES — emits downstream —
  * only when the event-time watermark passes its last event plus the
  * gap, i.e. when no late event could reopen it. State per key is one
  * fixed-size record, evicted on timeout, so an unbounded stream runs
  * in bounded memory — the property the batch window form (e02) cannot
  * provide incrementally.
  *
  * Semantics match e02_sessionize exactly: a gap > `gapMinutes` between
  * consecutive events of a user starts a new session.
  */
object StatefulSessions {

  case class Ev(user_id: Long, ts: java.sql.Timestamp)
  case class OpenSession(start: Long, last: Long, n: Long)
  case class Closed(user_id: Long, session_start: Long, session_end: Long, n_events: Long)

  def gapMs(gapMinutes: Int): Long = gapMinutes * 60L * 1000L

  /** Fold one group's micro-batch (or its timeout tick) into the open
    * session; emit every session the batch's gaps close, plus the open
    * one when the watermark times it out. Exposed for direct unit
    * testing of the fold. */
  def fold(gapMinutes: Int)(
      userId: Long, events: Iterator[Ev], state: GroupState[OpenSession]): Iterator[Closed] = {
    val gap = gapMs(gapMinutes)
    if (state.hasTimedOut) {
      // watermark passed last+gap: no late event can extend this session
      val s = state.get
      state.remove()
      Iterator.single(Closed(userId, s.start, s.last, s.n))
    } else {
      val sorted = events.toSeq.sortBy(_.ts.getTime)
      var closed = List.empty[Closed]
      var open = state.getOption.orNull
      for (ev <- sorted) {
        val t = ev.ts.getTime
        if (open == null) open = OpenSession(t, t, 1)
        else if (t - open.last > gap) {
          closed = Closed(userId, open.start, open.last, open.n) :: closed
          open = OpenSession(t, t, 1)
        } else if (t > open.last) open = OpenSession(open.start, t, open.n + 1)
        else open = open.copy(n = open.n + 1) // late-but-in-gap event
      }
      if (open != null) {
        state.update(open)
        state.setTimeoutTimestamp(open.last + gap)
      }
      closed.reverseIterator
    }
  }

  /** Wire the fold over a (possibly streaming) Dataset[Ev]. The caller
    * sets the watermark BEFORE grouping (event-time timeout requires
    * it on streaming inputs). */
  def closedSessions(events: Dataset[Ev], gapMinutes: Int = 30): Dataset[Closed] = {
    implicit val evEnc = Encoders.product[Ev]
    implicit val closedEnc = Encoders.product[Closed]
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        fold(gapMinutes))
  }
}
