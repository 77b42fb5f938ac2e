package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** Layout-drift regression: the driver's `events.parquet` has shipped with
  * (at least) two physical `ts` encodings over time — TIMESTAMP(NANOS),
  * which Spark scans as nanos-long under the legacy conf, and
  * TIMESTAMP(MICROS), which scans as a real (n)tz timestamp. Round 5 lost
  * 23 queries and 17 tests to a reader that assumed exactly one of them;
  * this spec writes the same rows in every layout the probe supports and
  * asserts batch AND streaming reads are identical, so a third encoding
  * drift fails here first instead of at the correctness gate.
  */
class EventLayoutSpec extends SparkSpec {

  /** (event_id, user_id, event_type, value, micros-since-epoch) spanning
    * several hours, including an exact hour boundary. */
  private val rows = Seq(
    (1L, 10L, "click",    1.5,  1704067200000000L),  // 2024-01-01 00:00:00
    (2L, 10L, "click",    2.0,  1704067230500000L),  // 00:00:30.5
    (3L, 11L, "purchase", 9.99, 1704070800000000L),  // 01:00:00 (boundary)
    (4L, 12L, "view",     0.0,  1704074399999999L),  // 01:59:59.999999
    (5L, 11L, "click",    3.25, 1704081600000000L))  // 04:00:00

  /** Write the fixture with `ts` in one of the supported physical layouts,
    * under `<dir>/events.parquet`, and return the dir (a Tables sfDir). */
  private def writeLayout(layout: String): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"graft_layout_$layout").toString
    val base = rows.toDF("event_id", "user_id", "event_type", "value", "us")
    val df = layout match {
      // plain INT64 nanos — what TIMESTAMP(NANOS) scans as under the
      // legacy conf, and what ScaleBench's tiled copies round-trip as
      case "nanos_long" => base.withColumn("ts", col("us") * 1000L)
      // TIMESTAMP(MICROS, isAdjustedToUTC=false) — the current driver layout
      case "micros_ntz" =>
        base.withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz"))
      // utc-adjusted timestamp (micros or int96, writer's choice)
      case "micros_tz" => base.withColumn("ts", timestamp_micros(col("us")))
    }
    df.drop("us").write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val layouts = Seq("nanos_long", "micros_ntz", "micros_tz")
  private lazy val dirs: Map[String, String] =
    layouts.map(l => l -> writeLayout(l)).toMap

  private def canon(df: DataFrame): Seq[(Long, Long)] =
    df.select(col("event_id"), Tables.tsMicros(col("ts")).as("us"))
      .orderBy(col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("batch events reader normalizes every physical ts layout identically") {
    val read = layouts.map { l =>
      val df = Tables.events(spark, dirs(l))
      assert(df.schema("ts").dataType == TimestampNTZType,
        s"$l: ts should normalize to timestamp_ntz, got ${df.schema("ts").dataType}")
      l -> canon(df)
    }.toMap
    val expected = rows.map(r => (r._1, r._5))
    layouts.foreach { l =>
      assert(read(l) == expected, s"$l: batch read drifted from fixture")
    }
  }

  test("streaming events reader normalizes every physical ts layout identically") {
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val results = layouts.map { l =>
      val name = s"layout_stream_${counter.incrementAndGet()}"
      val q = Tables.eventsStream(spark, dirs(l))
        .groupBy(window(col("ts"), "1 hour").getField("start").as("hour_start"),
                 col("event_type"))
        .agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName(name).outputMode("complete")
        .start()
      try q.processAllAvailable() finally q.stop()
      l -> spark.table(name)
        .select(Tables.tsMicros(col("hour_start").cast("timestamp_ntz")).as("h"),
                col("event_type"), col("n"))
        .orderBy(col("h"), col("event_type"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    }.toMap
    // expected hourly counts from the fixture, computed off-engine
    val hourUs = 3600L * 1000000L
    val expected = rows.groupBy(r => (r._5 / hourUs * hourUs, r._3))
      .map { case ((h, et), xs) => (h, et, xs.length.toLong) }
      .toSeq.sortBy(t => (t._1, t._2))
    layouts.foreach { l =>
      assert(results(l) == expected, s"$l: streaming read drifted from fixture")
    }
  }

  test("watermarked event time still works over a normalized ntz ts") {
    // watermarks require TIMESTAMP event time; the cast seam every
    // streaming op applies must hold for each layout
    val counter = new java.util.concurrent.atomic.AtomicInteger(100)
    layouts.foreach { l =>
      val name = s"layout_wm_${counter.incrementAndGet()}"
      val q = Tables.eventsStream(spark, dirs(l))
        .withColumn("ts", col("ts").cast("timestamp"))
        .withWatermark("ts", "30 minutes")
        .groupBy(window(col("ts"), "1 hour").as("win"))
        .agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName(name).outputMode("append")
        .start()
      try q.processAllAvailable() finally q.stop()
      // max ts 04:00 − 30 min watermark closes the 00:00 and 01:00 windows
      val closed = spark.table(name).collect()
      assert(closed.length == 2, s"$l: expected 2 watermark-closed windows")
    }
  }
}
