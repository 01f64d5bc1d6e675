package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoders => SparkEncoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Structured-Streaming surface for the events table (SURVEY §2.11: the
  * reference has no streaming; this is the north-star event-analytics
  * extension, built from Spark's native stateful operators).
  *
  * Every transform takes a DataFrame with the events schema
  * `(event_id long, ts timestamp, user_id long, event_type string,
  * value double, props string)` and works identically on a batch frame or a
  * `readStream` frame — the streaming-specific pieces (watermarks, output
  * modes) are additive, which is exactly Spark's unified-model promise.
  *
  * Scale notes: all operators below keep state bounded via watermarks
  * (late data beyond the watermark is dropped, state is evicted), shuffle
  * once on their grouping keys, and use built-in stateful operators —
  * no custom state store is needed for these semantics.
  */
object EventStreams {

  /** Tumbling-window rollup per event type. Watermark bounds state. */
  def hourlyRollup(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum("value").as("sum_value"),
        avg("value").as("avg_value"))
      .select(
        col("window.start").as("hour_start"),
        col("event_type"), col("n_events"), col("sum_value"), col("avg_value"))

  /** Sliding-window rate per event type (1h window, 15m slide). */
  def slidingRate(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n_events"))

  /** Native session windows: 30-minute inactivity gap per user. */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("session_value"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Watermarked exact dedup on the natural key — the streaming analogue of
    * the batch events_dedup query (state evicted past the watermark).
    */
  def dedup(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_type", "ts")

  /** Stream-stream interval join: purchases matched to the same user's
    * views within the preceding `gapSec` seconds — the streaming analogue
    * of the batch events_attribution range join (graft.ops.RangeJoin).
    *
    * Both sides carry watermarks and the join condition bounds event time
    * from both directions, so Spark can size and evict the join state: a
    * view is held only until `watermark + gapSec` passes it. Inner join +
    * append mode — matched pairs emit as they are found. The output is the
    * raw (purchase, view) pair stream; counting views per purchase is a
    * downstream aggregation (chaining it here would add a second stateful
    * operator — supported, but the pair stream is the reusable surface).
    */
  def attributionJoin(purchases: DataFrame, views: DataFrame,
      gapSec: Long = 1800L, watermark: String = "1 hour"): DataFrame = {
    val p = purchases.select(col("event_id"), col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    val v = views.select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", watermark)
    p.join(v,
      col("user_id") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr(s"INTERVAL $gapSec SECONDS"))
      .select(col("event_id"), col("user_id"), col("p_ts"), col("v_ts"))
  }

  // ---- custom state: running per-user profile via mapGroupsWithState ----

  case class UserEvent(user_id: Long, ts: Timestamp, value: Double)
  case class UserProfile(user_id: Long, n_events: Long, total_value: Double,
      last_seen: Timestamp)

  /** Running per-user aggregate with explicit state — the
    * `KeyValueGroupedDataset.mapGroupsWithState` pattern for semantics the
    * built-in aggregates can't express (here: a live profile snapshot
    * emitted per micro-batch). State eviction at scale belongs to an
    * event-time timeout + watermark policy; kept timeout-free here because
    * a processing-time timeout makes `processAllAvailable` livelock in
    * tests (the query never drains).
    */
  def userProfiles(events: Dataset[UserEvent]): Dataset[UserProfile] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserProfile, UserProfile](
        GroupStateTimeout.NoTimeout) {
        case (uid, batch, state: GroupState[UserProfile]) =>
          val prev = state.getOption.getOrElse(
            UserProfile(uid, 0L, 0.0, new Timestamp(0L)))
          var n = prev.n_events
          var tot = prev.total_value
          var last = prev.last_seen
          batch.foreach { e =>
            n += 1; tot += e.value
            if (e.ts.after(last)) last = e.ts
          }
          val next = UserProfile(uid, n, tot, last)
          state.update(next)
          next
      }
  }

  /** State API v2 ([[userProfiles]] re-expressed on `transformWithState`,
    * Spark 4's arbitrary-state surface): typed `ValueState` via the handle,
    * explicit `TimeMode`, and per-state TTL — the knob `mapGroupsWithState`
    * lacks for bounding state without event-time timers. Requires the
    * RocksDB state-store provider (the v2 operator does not run on the
    * default HDFS-backed store).
    */
  class ProfileProcessor
      extends StatefulProcessor[Long, UserEvent, UserProfile] {
    @transient private var profile: ValueState[UserProfile] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      profile = getHandle.getValueState[UserProfile](
        "profile", SparkEncoders.product[UserProfile], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
        timerValues: TimerValues): Iterator[UserProfile] = {
      var p =
        if (profile.exists()) profile.get()
        else UserProfile(key, 0L, 0.0, new Timestamp(0L))
      rows.foreach { e =>
        p = UserProfile(key, p.n_events + 1, p.total_value + e.value,
          if (e.ts.after(p.last_seen)) e.ts else p.last_seen)
      }
      profile.update(p)
      Iterator.single(p)
    }
  }

  /** Running per-user profiles on the v2 state API; semantics match
    * [[userProfiles]] (proven in the spec).
    */
  def userProfilesV2(events: Dataset[UserEvent]): Dataset[UserProfile] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new ProfileProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Wire a streaming frame to an in-memory sink for inspection/tests.
    * Returns the query; caller stops it.
    */
  def toMemorySink(df: DataFrame, name: String, outputMode: OutputMode)
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
}
