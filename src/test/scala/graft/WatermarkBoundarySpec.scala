package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventsStream

/** Pins the ENGINE's watermark-closure comparison at exact boundaries for
  * the two append-mode oracles that model it arithmetically (ADVICE r6):
  *
  *  - q119 models unmatched-click eviction as `click_ts + 30min < wm`
  *    (STRICT) with wm = min(side maxima) − 1h, ms-floored;
  *  - q123 models session closure as `session_end ≤ wm` (NON-STRICT) with
  *    wm = max event time − 30min, ms-floored.
  *
  * Both were assumed from observed behavior, never pinned at the exact
  * microsecond/ms boundary — an event landing precisely ON the floored
  * watermark could flip a row on one side only. Like EventLayoutSpec's
  * hour-boundary row, these fixtures place one entity exactly ON the
  * boundary, one 1 ms inside, one outside, and assert the streamed set
  * equals the oracle model's — so an engine-version change in boundary
  * strictness fails HERE, not at the scoring gate.
  */
class WatermarkBoundarySpec extends SparkSpec {

  /** Write (event_id, ts-string, user_id, event_type) rows as a one-file
    * events table readable by Tables.eventsStream. */
  private def writeFixture(rows: Seq[(Long, String, Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_wm_fixture").toString
    rows.toDF("event_id", "ts_s", "user_id", "event_type")
      .select(col("event_id"), col("ts_s").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q119 eviction at the exact watermark boundary is strict (click+30min == wm stays)") {
    // wm = min(max click, max purchase) − 1h = 2024-01-02 11:00:00.000
    val dir = writeFixture(Seq(
      (980L, "2024-01-02 12:00:00", 98L, "click"),      // click-side max; in-horizon
      (990L, "2024-01-02 12:00:00", 99L, "purchase"),   // purchase-side max
      (1L,   "2024-01-02 10:30:00", 1L, "click"),       // +30min == wm EXACTLY
      (2L,   "2024-01-02 10:29:59.999", 2L, "click"),   // +30min = wm − 1ms
      (3L,   "2024-01-02 08:00:00", 3L, "click"),       // matched pair
      (31L,  "2024-01-02 08:10:00", 3L, "purchase")))
    val got = EventsStream.streamStreamLeftJoin(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("click_id"),
                 Option(r.get(r.fieldIndex("buy_id"))).map(_.asInstanceOf[Long])))
      .toSet
    // the oracle's strict `click_ts + 30min < wm`: user 2 evicts, user 1
    // (exactly ON the watermark) does NOT — and neither do the in-horizon
    // clicks; user 3 emits as a match
    assert(got == Set((3L, 3L, Some(31L)), (2L, 2L, None)),
      s"boundary semantics drifted: $got")
  }

  test("q123 session closure at the exact watermark boundary is non-strict (end == wm emits)") {
    // wm = max event time − 30min = 2024-01-02 11:30:00.000
    val dir = writeFixture(Seq(
      (990L, "2024-01-02 12:00:00", 99L, "view"),       // wm driver
      (1L,   "2024-01-02 11:00:00", 1L, "view"),        // end 11:30:00 == wm EXACTLY
      (2L,   "2024-01-02 10:00:00", 2L, "view"),        // end 10:30:00 < wm
      (3L,   "2024-01-02 11:10:00", 3L, "view")))       // end 11:40:00 > wm
    val got = EventsStream.streamingSessionWindow(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_us"),
                 r.getAs[Long]("end_us"), r.getAs[Long]("n_events"))).toSet
    def us(s: String): Long =
      java.time.Instant.parse(s).getEpochSecond * 1000000L
    // the oracle's non-strict `end ≤ wm`: users 1 (exactly ON) and 2 emit;
    // user 3 and the wm driver stay open
    assert(got == Set(
      (1L, us("2024-01-02T11:00:00Z"), us("2024-01-02T11:30:00Z"), 1L),
      (2L, us("2024-01-02T10:00:00Z"), us("2024-01-02T10:30:00Z"), 1L)),
      s"boundary semantics drifted: $got")
  }
}
