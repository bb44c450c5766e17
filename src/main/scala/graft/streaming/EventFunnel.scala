package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of [[graft.ops.Analytics.funnel]]: per-user funnel
  * progress tracked incrementally with `flatMapGroupsWithState`,
  * emitting one [[FunnelAdvance]] row the moment a user completes a
  * step. Downstream `groupBy(step).count()` reproduces the batch
  * funnel's counts (each user emits each step at most once).
  *
  * Semantics match the batch operator exactly — step i advances on the
  * FIRST step-i event STRICTLY after step i−1's completion (same
  * timestamp never advances), optionally within `withinSeconds` of the
  * step-1 time — under the engine's standard per-key ordered-delivery
  * contract (ST2): events for a user arrive in event-time order across
  * micro-batches. Within a batch, events are sorted by ts before the
  * state fold, so intra-batch order is free; EventFunnelSpec pins
  * streamed == batch across micro-batch boundaries and restarts.
  *
  * State per user is three fields (reached step, last-step ts, funnel
  * start ts) and is dropped entirely for users who never enter the
  * funnel — bounded by funnel entrants, not event volume.
  */
object EventFunnel {

  final case class UserEvent(user_id: Long, ts: Timestamp, event_type: String)
  final case class FunnelAdvance(user_id: Long, step: Int, step_name: String, ts: Timestamp)
  final case class FunnelState(reached: Int, tLast: Timestamp, t0: Timestamp)

  private def micros(t: Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L

  /** Fold one user's (ts-sorted) events into the funnel state,
    * emitting advances. Shared by the streaming operator and the spec's
    * single-pass batch cross-check.
    */
  def advance(
      user: Long,
      steps: Seq[String],
      withinSeconds: Option[Long],
      sorted: Seq[UserEvent],
      start: FunnelState
  ): (FunnelState, Seq[FunnelAdvance]) = {
    var st = start
    val out = Seq.newBuilder[FunnelAdvance]
    sorted.foreach { e =>
      if (st.reached < steps.length && e.event_type == steps(st.reached)) {
        val inWindow = withinSeconds.forall { w =>
          st.reached == 0 || micros(e.ts) - micros(st.t0) <= w * 1000000L
        }
        val strictlyAfter = st.reached == 0 || e.ts.compareTo(st.tLast) > 0
        if (strictlyAfter && inWindow) {
          val t0 = if (st.reached == 0) e.ts else st.t0
          st = FunnelState(st.reached + 1, e.ts, t0)
          out += FunnelAdvance(user, st.reached, steps(st.reached - 1), e.ts)
        }
      }
    }
    (st, out.result())
  }

  /** The streaming operator: one advance row per (user, step) as it
    * happens. No state timeout — funnel entrants persist for the run
    * (add a processing-time TTL upstream if entrants are unbounded).
    */
  def funnelStream(
      events: Dataset[UserEvent],
      steps: Seq[String],
      withinSeconds: Option[Long] = None
  ): Dataset[FunnelAdvance] = {
    import events.sparkSession.implicits._
    require(steps.nonEmpty, "funnel needs at least one step")
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelAdvance](
        OutputMode.Append,
        GroupStateTimeout.NoTimeout
      ) { (user, it, state: GroupState[FunnelState]) =>
        val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.event_type))
        val st0 = state.getOption.getOrElse(FunnelState(0, null, null))
        val (st, out) = advance(user, steps, withinSeconds, sorted, st0)
        if (st.reached > 0) state.update(st)
        out.iterator
      }
  }
}
