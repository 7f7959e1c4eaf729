package graft.streaming

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.graph.GraphLoader

/** Pins the layout-aware `events.ts` handling. The driver's testdata has
  * shipped the column in THREE physical layouts across generations —
  * INT64 TIMESTAMP(NANOS) surfaced as a raw long under nanosAsLong
  * (pre-r12), TIMESTAMP_NTZ micros (r12), and plain TIMESTAMP for
  * Spark-written rehearsal copies — and the r12 flip silently collapsed
  * the streamed windowed aggregation to 1970-era millis (a LongType
  * stream schema read raw micros, then the nanos→micros `div 1000` was
  * applied on top). These tests build all three layouts and assert both
  * the batch loader and the file-stream reader converge to identical
  * TimestampType micros.
  */
class TsLayoutSpec extends SparkSpec {

  // 2023-11-14T22:13:20 UTC, exactly representable in every layout
  private val baseMicros = 1700000000000000L

  private def writeEvents(dir: String, tsCol: org.apache.spark.sql.Column,
      n: Int = 6): Unit = {
    import spark.implicits._
    // one event per 30 minutes → two 1-hour windows per hour span
    (0 until n).map(i => (i.toLong, baseMicros + i * 1800L * 1000000L,
        (i % 2).toLong, "click", 1.0, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", tsCol).drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def layouts: Seq[(String, String, org.apache.spark.sql.Column)] = Seq(
    // raw long column — what nanosAsLong surfaces for TIMESTAMP(NANOS)
    ("long_nanos", "long", col("us") * 1000L),
    ("ntz_micros", "timestamp_ntz",
      to_timestamp_ntz(from_unixtime(col("us") / 1000000L,
        "yyyy-MM-dd HH:mm:ss"))),
    ("timestamp", "timestamp", timestamp_micros(col("us"))))

  test("eventsTable normalizes every physical ts layout to the same micros") {
    layouts.foreach { case (name, expectedRaw, tsCol) =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-ts-$name").toString
      writeEvents(dir, tsCol)
      val raw = spark.read.parquet(s"$dir/events.parquet")
      assert(raw.schema("ts").dataType.typeName == expectedRaw,
        s"$name: fixture wrote the wrong physical type")
      val ev = GraphLoader.eventsTable(spark, dir)
      assert(ev.schema("ts").dataType.typeName == "timestamp",
        s"$name: not normalized")
      val got = ev.select(unix_micros(col("ts")).as("us"))
        .orderBy("us").collect().map(_.getLong(0)).toSeq
      assert(got == (0 until 6).map(i => baseMicros + i * 1800L * 1000000L),
        s"$name: wrong instant values")
    }
  }

  test("streamed windowed counts equal the batch twin on every layout") {
    layouts.foreach { case (name, _, tsCol) =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-tsw-$name").toString
      writeEvents(dir, tsCol)
      val batch = EventStreams
        .windowedCounts(GraphLoader.eventsTable(spark, dir), window = "1 hour")
        .select(unix_micros(col("window_start")).as("ws"), col("cnt"))
        .orderBy("ws").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val streamed = EventStreams
        .windowedCountsStreamed(spark, dir, glob = "events.parquet",
          queryName = s"ts_layout_$name")
        .select(unix_micros(col("window_start")).as("ws"), col("cnt"))
        .orderBy("ws").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(batch.nonEmpty && batch.map(_._2).sum == 6, s"$name: batch lost rows")
      assert(streamed == batch, s"$name: stream diverges from batch")
    }
  }
}
