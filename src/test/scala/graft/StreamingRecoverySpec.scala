package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStreams

/** Checkpointed restart: a streaming aggregation stopped mid-stream and
  * restarted from its checkpoint must neither lose nor double-count —
  * the exactly-once state contract a production pipeline relies on.
  */
class StreamingRecoverySpec extends SparkTestBase {
  private val sp = SparkTestBase.spark
  import sp.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("windowed aggregation restarts from checkpoint without loss or double-count") {
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val sink = Files.createTempDirectory("graft_sink").toString

    val stream = MemoryStream[(Long, Timestamp, Long, String, Double, String)](sp)
    def df = stream.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    def start() = EventStreams.hourlyRollup(df, watermark = "0 seconds")
      .writeStream
      .format("parquet")
      .option("path", sink)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .start()

    // batch 1, then stop mid-stream
    val q1 = start()
    stream.addData(Seq(
      (1L, ts(10), 1L, "click", 1.0, "{}"),
      (2L, ts(20), 1L, "click", 2.0, "{}")))
    q1.processAllAvailable()
    q1.stop()

    // restart from the same checkpoint; deliver more data incl. a
    // watermark-advancing event that closes the first hour's window
    val q2 = start()
    stream.addData(Seq(
      (3L, ts(40), 2L, "view", 3.0, "{}"),
      (4L, ts(200), 9L, "sentinel", 0.0, "{}")))
    q2.processAllAvailable()
    stream.addData(Seq((5L, ts(400), 9L, "sentinel2", 0.0, "{}")))
    q2.processAllAvailable()
    q2.stop()

    val out = spark.read.parquet(sink)
      .where(col("event_type") === "click")
      .collect()
    // exactly ONE row for hour 0 clicks, counting both pre-restart events once
    assert(out.length == 1, out.mkString(";"))
    assert(out.head.getAs[Long]("n_events") == 2L)
    assert(out.head.getAs[Double]("sum_value") == 3.0)

    val view = spark.read.parquet(sink).where(col("event_type") === "view").collect()
    assert(view.length == 1 && view.head.getAs[Long]("n_events") == 1L)
  }
}
