package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Temporal join operators — the as-of / range enrichment shapes a pipeline
  * needs when joining fact streams to slowly-changing context (the reference's
  * "enrich with the freshest session state" semantics, generalized).
  *
  * As-of join is composed from built-ins (the idiomatic distributed plan):
  * tag + union both inputs, sort within key partitions, propagate the last
  * seen right-side row with `last(ignoreNulls)` over an unbounded-preceding
  * window. One shuffle on the key, partition-local sort — exactly what a
  * custom SparkPlan would do, with AQE/skew handling for free. DuckDB's
  * native ASOF JOIN is the oracle.
  */
object Temporal {

  /** Orders deduped to one row per (custkey, orderdate) — keep max orderkey —
    * so the as-of pick is unambiguous in both engines. */
  private def dedupedOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
  }

  /** q24: as-of join — for every event, the latest order of that customer at
    * or before the event timestamp (null when none).
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id").as("k"), col("ts").as("t"),
        col("event_id"), lit(1).as("is_event"))
    val o = dedupedOrders(spark, dir)
      .select(col("o_custkey").as("k"), col("o_orderdate").as("t"),
        col("o_orderkey"), col("o_orderdate"))
    val unioned = e.select(col("k"), col("t"), col("is_event"), col("event_id"),
        lit(null).cast("long").as("o_orderkey"), lit(null).cast("timestamp_ntz").as("o_orderdate"))
      .unionByName(o.select(col("k"), col("t"), lit(0).as("is_event"),
        lit(null).cast("long").as("event_id"), col("o_orderkey"), col("o_orderdate")))
    // order rows sort before events at the same instant (is_event asc) so an
    // order dated exactly at ts is visible to that event (<= semantics)
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("is_event"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn("last_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .withColumn("last_orderdate", last(col("o_orderdate"), ignoreNulls = true).over(w))
      .filter(col("is_event") === 1)
      .select(col("event_id"), col("k").as("user_id"), col("t").as("ts"),
        col("last_orderkey"), col("last_orderdate"))
      .orderBy(col("event_id"))
  }

  /** q25: range join — events landing within 1 day after an order action by
    * the same customer (equi-key first, range predicate second → hash join +
    * filter, never a cross product).
    *
    * The raw date domains can never overlap (orders 1995–2001, events Jan
    * 2024), so the order date is REBASED deterministically into the events
    * window before the join: day-of-month from `o_orderkey % 28`, hour from
    * `o_custkey % 24` — a fixed, oracle-mirrored projection that keeps the
    * operator shape (hash join on the customer key + interval range filter)
    * while producing real matches at every scale. Until round 15 this query
    * passed VACUOUSLY (0 rows at every tested SF); the rebase is what makes
    * the range semantics actually exercised.
    */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val o = dedupedOrders(spark, dir)
      .withColumn("o_ts",
        expr("TIMESTAMP_NTZ '2024-01-01 00:00:00'" +
          " + (o_orderkey % 28) * INTERVAL '1' DAY" +
          " + (o_custkey % 24) * INTERVAL '1' HOUR"))
    o.join(e, o("o_custkey") === e("user_id")
        && e("ts") >= o("o_ts")
        && e("ts") < o("o_ts") + expr("INTERVAL 1 DAY"))
      .groupBy(col("o_custkey"), col("o_orderkey"), col("o_ts"))
      .agg(count(lit(1)).as("n_events_next_day"),
           round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }
}
