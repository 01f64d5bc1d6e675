package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Guard against driver-side regeneration of events.parquet flipping the
  * physical `ts` type. It has shipped two ways across rounds: epoch-nanos
  * INT64 (parquet TIMESTAMP(NANOS), which Spark 4 reads as LongType under
  * the nanosAsLong legacy conf) and plain timestamp[us] (read as
  * TIMESTAMP_NTZ). `SparkEntry.eventsTable` must read BOTH — and a
  * UTC-adjusted instant variant — to the identical TimestampType frame, so
  * the next generator flip is absorbed silently (r9 lost all 14 events_*
  * gates to exactly this).
  */
class EventsSchemaDriftSpec extends SparkTestBase {

  // one logical dataset: (event_id, micros-since-epoch, user, type, value)
  private val rows = Seq(
    (1L, 1704067200000000L, 10L, "view", 1.5),
    (2L, 1704067201500000L, 10L, "click", 2.0),
    (3L, 1704153600250000L, 11L, "view", 0.25)
  )

  private def mkDir(tag: String): String =
    graft.util.TempDirs.create(s"graft_events_drift_$tag")

  /** Variant A: ts as INT64 epoch-nanos (the TIMESTAMP(NANOS) generator,
    * as Spark sees it under nanosAsLong — a plain LongType column).
    */
  private def writeNanosLong(dir: String): Unit = {
    val s = spark
    import s.implicits._
    rows.map { case (id, us, u, t, v) => (id, us * 1000L, u, t, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  /** Variant B: ts as timestamp[us] NOT adjusted to UTC → TIMESTAMP_NTZ. */
  private def writeMicrosNtz(dir: String): Unit = {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampNTZType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val data = rows.map { case (id, us, u, t, v) =>
      Row(id, java.time.LocalDateTime.ofEpochSecond(
        us / 1000000L, ((us % 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC), u, t, v)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  /** Variant C: ts as a UTC-adjusted instant → TimestampType directly. */
  private def writeMicrosInstant(dir: String): Unit = {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val data = rows.map { case (id, us, u, t, v) =>
      Row(id, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        us / 1000000L, (us % 1000000L) * 1000L)), u, t, v)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def readCanonical(dir: String): (Seq[(Long, Long)], org.apache.spark.sql.types.DataType) = {
    val df: DataFrame = SparkEntry.eventsTable(spark, dir)
    val tsType = df.schema("ts").dataType
    val got = df.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    (got, tsType)
  }

  test("eventsTable reads nanos-long, micros-NTZ, and micros-instant events identically") {
    val expected = rows.map { case (id, us, _, _, _) => (id, us) }.sorted

    val dirA = mkDir("nanos"); writeNanosLong(dirA)
    val dirB = mkDir("ntz"); writeMicrosNtz(dirB)
    val dirC = mkDir("instant"); writeMicrosInstant(dirC)

    for ((dir, tag) <- Seq((dirA, "nanos-long"), (dirB, "micros-ntz"), (dirC, "micros-instant"))) {
      val (got, tsType) = readCanonical(dir)
      assert(tsType == TimestampType, s"$tag: ts must surface as TimestampType, got $tsType")
      assert(got == expected, s"$tag: values drifted: $got")
    }
  }

  test("the probe does not leave nanosAsLong set on the session") {
    val dir = mkDir("confleak"); writeMicrosNtz(dir)
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val before = spark.conf.getOption(key)
    SparkEntry.eventsTable(spark, dir)
    assert(spark.conf.getOption(key) == before)
  }
}
