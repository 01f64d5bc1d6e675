package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStreams

/** Streaming semantics tested against Spark's own golden outputs
  * (MemoryStream -> memory sink; no DuckDB oracle exists for watermarks —
  * SURVEY §7.3 risk 7). Each operator is also checked for batch/stream
  * result agreement where the semantics coincide.
  */
class EventStreamsSpec extends SparkTestBase {
  private val sp = SparkTestBase.spark
  import sp.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private def eventsDf(rows: (Long, Int, Long, String, Double)*) =
    rows.toSeq
      .map { case (id, m, uid, et, v) => (id, ts(m), uid, et, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("hourlyRollup on a stream matches the batch result") {
    val data = Seq(
      (1L, 10, 1L, "click", 1.0), (2L, 20, 1L, "click", 2.0),
      (3L, 70, 2L, "view", 3.0), (4L, 80, 1L, "click", 4.0),
      (5L, 130, 2L, "view", 5.0))

    val stream = MemoryStream[(Long, Timestamp, Long, String, Double, String)](sp)
    val sdf = stream.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStreams.hourlyRollup(sdf).writeStream
      .format("memory").queryName("rollup_test").outputMode(OutputMode.Append()).start()
    stream.addData(data.map { case (id, m, uid, et, v) => (id, ts(m), uid, et, v, "{}") })
    q.processAllAvailable()
    // Append emits a window only once the watermark passes its end — advance
    // it with a far-future sentinel in a second micro-batch.
    stream.addData(Seq((99L, ts(600), 9L, "sentinel", 0.0, "{}")))
    q.processAllAvailable()
    q.stop()

    val streamed = sp.table("rollup_test")
      .select("hour_start", "event_type", "n_events", "sum_value")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val batch = EventStreams.hourlyRollup(eventsDf(data: _*))
      .select("hour_start", "event_type", "n_events", "sum_value")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // all original windows ended before the advanced watermark -> exact match
    assert(streamed == batch)
  }

  test("withStatePartitions sizes the query, restores the session") {
    val key = "spark.sql.shuffle.partitions"
    val before = sp.conf.get(key)
    val data = (1L to 40L).map(i => (i, ts(i.toInt), i % 4, "c", 1.0, "{}"))
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double, String)](sp)
    val sdf = stream.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = graft.streaming.StreamSizing.withStatePartitions(sp, 3) {
      EventStreams.hourlyRollup(sdf).writeStream
        .format("memory").queryName("sized_test")
        .outputMode(OutputMode.Append()).start()
    }
    // restore happens at start(), BEFORE any batch runs — the clone must
    // still carry n for every batch of the query's lifetime
    assert(sp.conf.get(key) == before, "session conf not restored")
    stream.addData(data)
    q.processAllAvailable()
    stream.addData(Seq((99L, ts(600), 9L, "sentinel", 0.0, "{}")))
    q.processAllAvailable()
    val parts = q.lastProgress.stateOperators
      .map(_.numShufflePartitions).distinct.toSeq
    q.stop()
    assert(parts == Seq(3L), s"state partitions: $parts")
    assert(sp.table("sized_test").count() > 0)
  }

  test("sessionize groups by inactivity gap") {
    val out = EventStreams.sessionize(eventsDf(
      (1L, 0, 1L, "a", 1.0), (2L, 10, 1L, "a", 1.0),   // session 1
      (3L, 60, 1L, "a", 1.0),                           // session 2 (50m gap)
      (4L, 0, 2L, "b", 1.0)))                           // user 2, own session
      .collect()
    assert(out.length == 3)
    val u1 = out.filter(_.getAs[Long]("user_id") == 1L).sortBy(_.getAs[Timestamp]("session_start").getTime)
    assert(u1.length == 2)
    assert(u1(0).getAs[Long]("n_events") == 2L)
    assert(u1(1).getAs[Long]("n_events") == 1L)
  }

  test("streaming dedup drops duplicate natural keys within watermark") {
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double, String)](sp)
    stream.addData(Seq(
      (1L, ts(10), 1L, "click", 1.0, "{}"),
      (2L, ts(10), 1L, "click", 9.0, "{}"), // dup natural key (user, type, ts)
      (3L, ts(20), 1L, "view", 2.0, "{}")))
    val sdf = stream.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStreams.toMemorySink(EventStreams.dedup(sdf), "dedup_test", OutputMode.Append())
    q.processAllAvailable(); q.stop()
    val rows = sp.table("dedup_test").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("event_type")).toSet == Set("click", "view"))
  }

  test("userProfiles accumulates state across micro-batches") {
    val stream = MemoryStream[EventStreams.UserEvent](sp)
    val profiles = EventStreams.userProfiles(stream.toDS())
    val q = profiles.writeStream.format("memory").queryName("profiles_test")
      .outputMode(OutputMode.Update()).start()
    stream.addData(EventStreams.UserEvent(1L, ts(0), 2.0),
      EventStreams.UserEvent(1L, ts(5), 3.0))
    q.processAllAvailable()
    stream.addData(EventStreams.UserEvent(1L, ts(10), 5.0))
    q.processAllAvailable()
    val latest = sp.table("profiles_test")
      .orderBy(col("n_events").desc).head()
    q.stop()
    assert(latest.getAs[Long]("n_events") == 3L)
    assert(latest.getAs[Double]("total_value") == 10.0)
    assert(latest.getAs[Timestamp]("last_seen") == ts(10))
  }

  test("attributionJoin stream matches the batch range join") {
    val purchases = Seq(
      (10L, 35, 1L), // views at 10, 30 within 30m; view at 0 too old
      (11L, 90, 1L), // no view within [60, 90]
      (12L, 40, 2L)) // user 2's view at 40 matches (inclusive equal time)
    val views = Seq((1L, 0), (1L, 10), (1L, 30), (2L, 40), (3L, 35))

    val pStream = MemoryStream[(Long, Long, Timestamp)](sp)
    val vStream = MemoryStream[(Long, Timestamp)](sp)
    val pDf = pStream.toDF().toDF("event_id", "user_id", "ts")
    val vDf = vStream.toDF().toDF("user_id", "ts")
    val q = EventStreams.attributionJoin(pDf, vDf, gapSec = 1800L)
      .writeStream.format("memory").queryName("attr_test")
      .outputMode(OutputMode.Append()).start()
    pStream.addData(purchases.map { case (id, m, u) => (id, u, ts(m)) })
    vStream.addData(views.map { case (u, m) => (u, ts(m)) })
    q.processAllAvailable()
    q.stop()

    val streamed = sp.table("attr_test")
      .collect().map(r => (r.getLong(0), r.getTimestamp(3))).toSet
    val pBatch = purchases.map { case (id, m, u) => (id, u, ts(m)) }
      .toDF("event_id", "user_id", "ts")
      .withColumn("p_t", col("ts").cast("double"))
    val vBatch = views.map { case (u, m) => (u, ts(m)) }.toDF("user_id", "v_ts")
      .withColumn("v_start", col("v_ts").cast("double"))
      .withColumn("v_end", col("v_start") + 1800.0)
    val batch = graft.ops.RangeJoin.pointInInterval(
        pBatch, vBatch, Seq("user_id"),
        "p_t", "v_start", "v_end", 1800.0)
      .collect().map(r => (r.getAs[Long]("event_id"), r.getAs[Timestamp]("v_ts"))).toSet
    assert(streamed == batch)
    assert(streamed.map(_._1) == Set(10L, 12L))
  }

  test("userProfilesV2 (transformWithState) matches the v1 state semantics") {
    val prev = sp.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    sp.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[EventStreams.UserEvent](sp)
      val q = EventStreams.userProfilesV2(stream.toDS())
        .writeStream.format("memory").queryName("profiles_v2_test")
        .outputMode(OutputMode.Update()).start()
      stream.addData(EventStreams.UserEvent(1L, ts(0), 2.0),
        EventStreams.UserEvent(1L, ts(5), 3.0))
      q.processAllAvailable()
      stream.addData(EventStreams.UserEvent(1L, ts(10), 5.0))
      q.processAllAvailable()
      val latest = sp.table("profiles_v2_test")
        .orderBy(col("n_events").desc).head()
      q.stop()
      assert(latest.getAs[Long]("n_events") == 3L)
      assert(latest.getAs[Double]("total_value") == 10.0)
      assert(latest.getAs[Timestamp]("last_seen") == ts(10))
    } finally {
      prev match {
        case Some(v) => sp.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => sp.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("sliding windows overlap correctly (batch check)") {
    val out = EventStreams.slidingRate(eventsDf((1L, 30, 1L, "a", 1.0)))
      .collect()
    // a single event at minute 30 falls into 4 sliding 1h/15m windows
    assert(out.length == 4)
    assert(out.forall(_.getAs[Long]("n_events") == 1L))
  }

  test("stateless corpus ops run unchanged on a stream: stratified + fingerprint + langid") {
    import org.apache.spark.sql.functions._
    // the scan-side pipeline ops are pure projections/filters, so the SAME
    // column expressions drive a streaming micro-batch with no rewrite —
    // the design property that makes the corpus pipeline incrementally
    // ingestable
    def pipeline(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Sampling.stratified(df, col("lang"), col("doc_id"),
          buckets = 10, fractions = Map("en" -> 8), defaultKeep = 3)
        .select(col("doc_id"), col("lang"),
          graft.ops.TextOps.fingerprint(col("text")).as("fp"),
          graft.ops.TextOps.langGuess(graft.ops.TextOps.tokens(col("text"))).as("guess"))
    val rows = (0L until 40L).map(i =>
      (i, if (i % 2 == 0) "en" else "fr",
        if (i % 2 == 0) "the cat is here" else "le chat et la maison"))
    val stream = MemoryStream[(Long, String, String)](sp)
    val q = pipeline(stream.toDF().toDF("doc_id", "lang", "text"))
      .writeStream.format("memory").queryName("corpus_stream_test")
      .outputMode(OutputMode.Append()).start()
    stream.addData(rows)
    q.processAllAvailable()
    q.stop()
    val streamed = sp.table("corpus_stream_test").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    val batch = pipeline(rows.toDF("doc_id", "lang", "text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(streamed == batch && streamed.nonEmpty)
    assert(streamed.forall { case (_, _, _, g) => g == "en" || g == "fr" })
  }
}
