package graft

import org.apache.spark.sql.functions._
import graft.sources.ParcelLookup
import graft.operators.EventOps

/** Executor-side connector pattern + built-in session_window parity. */
class ConnectorSpec extends SparkSpec {
  import spark.implicits._

  test("connector enriches per partition with a not-found channel") {
    val reqs = (1L to 200L).map(i =>
      ParcelLookup.LookupRequest(i, s"$i Main St", s"County ${i % 7}")).toDS()
      .repartition(8)
    val results = ParcelLookup.enrich(reqs, new ParcelLookup.StubFactory).cache()
    assert(results.count() == 200)
    val found = ParcelLookup.foundOnly(results)
    val nFound = found.count()
    assert(nFound > 0 && nFound < 200, "both found and 404 channels populated")
    // determinism: same inputs → same parcel ids on a rerun
    val again = ParcelLookup.enrich(reqs, new ParcelLookup.StubFactory)
    assert(again.collect().sortBy(_.request_id).map(_.parcel_id).toSeq ==
           results.collect().sortBy(_.request_id).map(_.parcel_id).toSeq)
  }

  test("built-in session_window agrees with the lag-based sessionization (q21)") {
    val e = Tables.events(spark, sf001)
    val builtin = e
      .groupBy(session_window(col("ts").cast("timestamp"), "30 minutes"), col("user_id"))
      .count()
    val ours = EventOps.sessionize(spark, sf001)
    // same number of sessions and same per-session event counts
    assert(builtin.count() == ours.count())
    val a = builtin.select(col("user_id"), col("count").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = ours.select(col("user_id"), col("n_events").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }
}
