package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout,
  ListState, MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig,
  ValueState}

/** T7 — arbitrary stateful processing: running per-user counters kept in
  * the state store across micro-batches (SURVEY.md §2.9).
  *
  * Scale posture: state is partitioned by the group key across
  * executors; memory is O(active users), and the processing-time timeout
  * evicts idle users so abandoned keys cannot grow the store without
  * bound. This is the pattern for per-entity accumulators (counters,
  * rate limits, fraud scores) the windowed-agg operators can't express.
  */
object Stateful {

  case class UserEvent(user_id: Long, event_type: String, value: Double)
  case class UserState(n: Long, total: Double)
  case class UserRunning(user_id: Long, n: Long, total: Double, avg: Double)

  private def update(evict: Boolean)(userId: Long, events: Iterator[UserEvent],
                     state: GroupState[UserState]): UserRunning = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      UserRunning(userId, s.n, s.total, if (s.n == 0) 0 else s.total / s.n)
    } else {
      val prev = state.getOption.getOrElse(UserState(0L, 0.0))
      val (n, total) = events.foldLeft((prev.n, prev.total)) {
        case ((c, t), e) => (c + 1, t + e.value)
      }
      state.update(UserState(n, total))
      if (evict) state.setTimeoutDuration("1 hour")
      UserRunning(userId, n, total, if (n == 0) 0 else total / n)
    }
  }

  /** T7 in the Spark-4-native API: the same running per-user totals as
    * a `StatefulProcessor` for `transformWithState`. Differences that
    * matter at scale: typed per-key `ValueState` handles (multiple
    * independent states per key if needed), native TTL on the state
    * itself (`TTLConfig`) instead of hand-rolled timeout branches, and
    * the RocksDB state store requirement — which is also what makes
    * huge state (billions of keys) spill off-heap instead of OOMing
    * executors. */
  class RunningTotalsProcessor(ttl: TTLConfig = TTLConfig.NONE)
    extends StatefulProcessor[Long, UserEvent, UserRunning] {
    @transient private var state: ValueState[UserState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserState](
        "totals", Encoders.product[UserState], ttl)

    override def handleInputRows(userId: Long, rows: Iterator[UserEvent],
                                 timers: TimerValues): Iterator[UserRunning] = {
      val prev = if (state.exists()) state.get() else UserState(0L, 0.0)
      val (n, total) = rows.foldLeft((prev.n, prev.total)) {
        case ((c, t), e) => (c + 1, t + e.value)
      }
      state.update(UserState(n, total))
      Iterator.single(UserRunning(userId, n, total, if (n == 0) 0 else total / n))
    }
  }

  /** Running totals via transformWithState (requires the RocksDB state
    * store provider — set `spark.sql.streaming.stateStore.providerClass`
    * to `...RocksDBStateStoreProvider` before starting the query).
    * A non-NONE `ttl` turns on native state TTL (processing-time based:
    * a key idle past the TTL reads back as absent, so its totals restart
    * — the store-side eviction that keeps unbounded key populations from
    * growing state forever). */
  def runningUserTotalsTws(events: Dataset[UserEvent],
                           ttl: TTLConfig = TTLConfig.NONE): Dataset[UserRunning] = {
    implicit val outEnc = Encoders.product[UserRunning]
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new RunningTotalsProcessor(ttl),
        timeMode, OutputMode.Update())
  }

  case class TimedEvent(user_id: Long, ts: Timestamp, value: Double)
  case class SessionClosed(user_id: Long, n: Long, total: Double,
                           closed_by_timer: Boolean)

  /** T7 with EVENT-TIME TIMERS: a per-user session that emits NOTHING
    * while events flow and a single closing record once the watermark
    * passes (last event time + gap) — the timer-driven eviction pattern
    * for "emit on inactivity" semantics (session receipts, abandoned-cart
    * triggers) that windowed aggregation cannot express. Each input
    * moves the user's single timer forward (delete + re-register);
    * `handleExpiredTimer` emits the summary and CLEARS the state, so an
    * idle key costs nothing after its timer fires. */
  class SessionExpiryProcessor(gapMs: Long)
    extends StatefulProcessor[Long, TimedEvent, SessionClosed] {
    @transient private var state: ValueState[UserState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserState](
        "session", Encoders.product[UserState], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[TimedEvent],
                                 timers: TimerValues): Iterator[SessionClosed] = {
      val prev = if (state.exists()) state.get() else UserState(0L, 0.0)
      var n = prev.n; var total = prev.total; var maxTs = Long.MinValue
      rows.foreach { e =>
        n += 1; total += e.value; maxTs = math.max(maxTs, e.ts.getTime)
      }
      state.update(UserState(n, total))
      getHandle.listTimers().toSeq.foreach(getHandle.deleteTimer)
      getHandle.registerTimer(maxTs + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(userId: Long, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[SessionClosed] = {
      val s = state.get()
      state.clear()
      Iterator.single(SessionClosed(userId, s.n, s.total, closed_by_timer = true))
    }
  }

  case class TypeCount(user_id: Long, event_type: String, n: Long)

  /** T7e — MAP state: per-(user, event-type) running counts. The state
    * store keys the map entries individually (composite key user ×
    * map-key), so updating one event type touches ONE store entry —
    * unlike a ValueState holding a whole Map, which rewrites the full
    * blob per update and caps out at value-size limits. The right shape
    * whenever per-key sub-state grows (per-type counters, per-campaign
    * spend, per-device last-seen). */
  class PerTypeCountsProcessor extends StatefulProcessor[Long, UserEvent, TypeCount] {
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long](
        "type_counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[UserEvent],
                                 timers: TimerValues): Iterator[TypeCount] = {
      val touched = scala.collection.mutable.LinkedHashSet.empty[String]
      rows.foreach { e =>
        val cur = if (counts.containsKey(e.event_type)) counts.getValue(e.event_type) else 0L
        counts.updateValue(e.event_type, cur + 1)
        touched += e.event_type
      }
      touched.iterator.map(t => TypeCount(userId, t, counts.getValue(t)))
    }
  }

  /** Per-(user, type) running counts via MapState (emits only the
    * types a micro-batch touched). */
  def perTypeCounts(events: Dataset[UserEvent]): Dataset[TypeCount] = {
    implicit val outEnc = Encoders.product[TypeCount]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new PerTypeCountsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  case class RecentWindow(user_id: Long, recent: Seq[Double], mean: Double)

  /** T7f — LIST state: the last `n` values per user (a bounded recent-
    * events buffer — rolling features, "last 5 transactions" fraud
    * signals). ListState appends WITHOUT rereading the list (an append
    * is one store write; a ValueState[Seq[_]] would deserialize and
    * rewrite the whole buffer per event) — reads happen only when the
    * buffer must be trimmed or emitted, here once per micro-batch. */
  class RecentValuesProcessor(n: Int)
    extends StatefulProcessor[Long, UserEvent, RecentWindow] {
    @transient private var recent: ListState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      recent = getHandle.getListState[Double](
        "recent", Encoders.scalaDouble, TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[UserEvent],
                                 timers: TimerValues): Iterator[RecentWindow] = {
      rows.foreach(e => recent.appendValue(e.value))
      val kept = recent.get().toSeq.takeRight(n)
      recent.put(kept.toArray) // trim once per batch, not per event
      Iterator.single(RecentWindow(userId, kept, kept.sum / kept.size))
    }
  }

  /** Rolling last-`n` window per user via ListState. */
  def recentValues(events: Dataset[UserEvent], n: Int): Dataset[RecentWindow] = {
    implicit val outEnc = Encoders.product[RecentWindow]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new RecentValuesProcessor(n),
        TimeMode.None(), OutputMode.Update())
  }

  /** Sessions closed by event-time timers; input gains a zero-delay
    * watermark on `ts` (timers fire when the watermark passes them). */
  def timerClosedSessions(events: Dataset[TimedEvent],
                          gapMs: Long): Dataset[SessionClosed] = {
    implicit val outEnc = Encoders.product[SessionClosed]
    implicit val inEnc = Encoders.product[TimedEvent]
    events.withWatermark("ts", "0 seconds")
      .select(col("user_id"), col("ts"), col("value")).as[TimedEvent]
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new SessionExpiryProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Running (count, sum, avg) per user, updated each micro-batch.
    *
    * `timeout` defaults to NoTimeout. Production deployments with
    * unbounded key populations should pass ProcessingTimeTimeout (and
    * the update fn's timed-out branch evicts) — but note that timeout
    * handling makes Spark schedule no-data batches continuously, so
    * test harnesses using processAllAvailable() must use NoTimeout or
    * they never observe quiescence. */
  def runningUserTotals(events: Dataset[UserEvent],
                        timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout)
      : Dataset[UserRunning] = {
    implicit val stateEnc = Encoders.product[UserState]
    implicit val outEnc = Encoders.product[UserRunning]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState(timeout)(
        update(evict = timeout == GroupStateTimeout.ProcessingTimeTimeout))
  }
}
