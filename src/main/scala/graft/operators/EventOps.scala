package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.PortableHash.pround

/** Time-series / event operators (SURVEY.md §2.7) in their *batch* form —
  * the same computations run as Structured Streaming in
  * [[graft.streaming.EventsStream]]; batch form is what the DuckDB oracle
  * can replay.
  *
  * Scale notes: tumbling-window aggregation is a single hash aggregate on
  * (window, type) — partial map-side combine applies. Sessionization is one
  * shuffle on user_id followed by partition-local windows; state per user is
  * bounded (the streaming twin bounds it with a watermark instead).
  */
object EventOps {

  /** q20: tumbling 1-hour windows per event type — `window()` windowing,
    * emitted as the window start timestamp (epoch-aligned ⇒ equals
    * date_trunc in the oracle).
    */
  def tumblingCounts(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.groupBy(window(col("ts"), "1 hour").getField("start").as("hour_start"),
              col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("hour_start"), col("event_type"))
  }

  /** q66: map-function surface — per-user event-type histogram as a real
    * MapType column (`map_from_entries` over a grouped collect), then
    * map_keys / element_at / size extraction. The oracle verifies the same
    * values relationally (maps are a Spark-side representation choice, not
    * a semantic one). Outputs stay scalar for the type-exact compare.
    */
  def mapOps(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val counts = e.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    counts.groupBy(col("user_id"))
      .agg(map_from_entries(collect_list(struct(col("event_type"), col("cnt")))).as("m"))
      .select(col("user_id"),
        size(col("m")).as("n_types"),
        array_join(sort_array(map_keys(col("m"))), ",").as("types_csv"),
        coalesce(element_at(col("m"), lit("click")), lit(0L)).as("n_clicks"),
        coalesce(element_at(col("m"), lit("purchase")), lit(0L)).as("n_purchases"))
      .orderBy(col("user_id"))
  }

  /** q48: sliding windows — 1-hour windows every 15 minutes (each event in 4
    * overlapping windows; Spark plans this as a window explode + hash agg).
    * The oracle reconstructs the same epoch-aligned window starts
    * arithmetically.
    */
  def slidingCounts(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.groupBy(window(col("ts"), "1 hour", "15 minutes").getField("start").as("win_start"),
              col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("win_start"), col("event_type"))
  }

  /** q21: gap-based sessionization (30-minute inactivity gap) — lag +
    * running conditional sum, the classic batch twin of
    * `session_window`/`mapGroupsWithState`. Micros arithmetic keeps the
    * oracle integer-exact.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
              unix_micros(col("ts").cast("timestamp")).as("ts_us"))
    val byUser  = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val gapUs   = 30L * 60 * 1000 * 1000
    val prev    = lag(col("ts_us"), 1).over(byUser)
    val isNew   = when(prev.isNull || col("ts_us") - prev > gapUs, 1L).otherwise(0L)
    e.withColumn("session_seq",
        sum(isNew).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
           min(col("ts_us")).as("start_us"),
           max(col("ts_us")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  /** q71: built-in `session_window` aggregation as a first-class declared
    * query (the streaming-native gap-session operator; ConnectorSpec proves
    * it equal to the lag form modulo the boundary convention). Boundary
    * semantics: a session's window extends `gap` past its LAST event and
    * windows are half-open, so a follow-up event exactly `gap` later starts
    * a NEW session — the oracle's is_new predicate is therefore `>= gap`
    * where q21's lag form uses `> gap`. Emitted as epoch micros (window end
    * = last event + gap).
    */
  def sessionWindowAgg(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.groupBy(col("user_id"), session_window(col("ts").cast("timestamp"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("start_us"),
        unix_micros(col("w.end")).as("end_us"),
        col("n_events"))
      .orderBy(col("user_id"), col("start_us"))
  }

  /** q22: semi-structured extraction — JSON path over the `props` column
    * (S1: `from_json`/schema-on-read, the engine form of `request.json`).
    */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.select(col("event_type"),
             get_json_object(col("props"), "$.k").try_cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("k")).as("sum_k"),
           count(when(col("k").isNull, 1)).as("null_k"))
      .orderBy(col("event_type"))
  }

  /** q47: salted two-phase aggregation — the skew-resilient form of a
    * hot-key groupBy: spray each key across `nSalts` partial groups, combine
    * partials, then merge per key. Result is *identical* to the direct
    * aggregation (the oracle runs the direct form), demonstrating that the
    * skew mitigation is semantics-preserving. At 100 TB this is the pattern
    * for power-law keys when AQE's skew handling isn't enough (e.g.
    * aggregating by a viral user_id).
    */
  def saltedAgg(spark: SparkSession, dir: String): DataFrame = {
    val nSalts = 16
    val e = Tables.events(spark, dir)
    val partial = e
      .withColumn("salt", (col("event_id") % nSalts).cast("int"))
      .groupBy(col("user_id"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(col("value")).as("pv"),
           min(col("ts")).as("pmin"), max(col("ts")).as("pmax"))
    partial.groupBy(col("user_id"))
      .agg(sum(col("pn")).as("n_events"),
           round(sum(col("pv")), 2).as("total_value"),
           min(col("pmin")).as("first_ts"),
           max(col("pmax")).as("last_ts"))
      .orderBy(col("user_id"))
  }

  /** q57: salted skew-safe JOIN — the join-side twin of q47's salted
    * aggregation. When one join key dominates (a celebrity user, a null-ish
    * default key), the shuffle partition holding it becomes the straggler.
    * Fix: append a salt ∈ [0, N) to the fact side's key and replicate each
    * dimension row N times (one per salt), joining on (key, salt) — every
    * hot key now spreads over N partitions. Result proven identical to the
    * direct join (the oracle runs the unsalted form). At scale N is sized to
    * the observed skew (or AQE's skew-join split handles moderate cases
    * without any rewrite).
    */
  def saltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val nSalts = 8
    val e = Tables.events(spark, dir)
      .withColumn("salt", (col("event_id") % nSalts).cast("int"))
    val dim = Tables.customer(spark, dir)
      .select(col("c_custkey").as("user_id"), col("c_name"), col("c_mktsegment"))
      .withColumn("salt", explode(array((0 until nSalts).map(lit): _*)))
    e.join(dim, Seq("user_id", "salt"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("c_name"), col("c_mktsegment"))
      .orderBy(col("event_id"))
  }

  /** q23: last-update-wins dedup — the reference's newest-wins cancellation
    * semantics (App.js:355-357) as `max_by`: latest event per (user, type).
    */
  def latestPerUserType(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.groupBy(col("user_id"), col("event_type"))
      .agg(max(col("ts")).as("last_ts"),
           max_by(col("event_id"), struct(col("ts"), col("event_id"))).as("last_event_id"),
           pround(max_by(col("value"), struct(col("ts"), col("event_id"))), 2).as("last_value"))
      .orderBy(col("user_id"), col("event_type"))
  }

}
