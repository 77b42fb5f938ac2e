package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Executor-side enrichment connector (SURVEY.md §2.1 S2/S3): the engine
  * form of the reference's authenticated scrape session
  * (crs_ui_bot.py:34-70 — one never-closed browser reused across requests).
  *
  * Two rules carried over:
  *  1. The authenticated client is **per executor/partition, never per row** —
  *     here a `@transient lazy val` inside the partition closure, initialized
  *     on first use and reused for every row the partition processes.
  *  2. The preferred plan is still a *join against a materialized snapshot*
  *     (SURVEY §2.4 J2 → q03): reach for a live connector only when the
  *     lookup target cannot be snapshotted. This class exists to keep that
  *     escape hatch shaped correctly.
  *
  * The client here is an in-process deterministic stub (no network in this
  * environment); `LookupClient` is the seam a real HTTP/session client
  * implements.
  */
object ParcelLookup {

  /** The session-holding client: expensive to open, cheap per lookup. */
  trait LookupClient extends AutoCloseable {
    def lookup(address: String, county: String): Option[String]
  }

  /** Client factory — serializable recipe, executor-side construction. */
  trait ClientFactory extends Serializable {
    def open(): LookupClient
  }

  /** Deterministic stub: "parcel id" derived from the key (md5-based, same
    * shape a scraped `Parcel ID` cell would have); `None` for a deterministic
    * slice, modeling the reference's not-found → 404 channel (app.py:56-57).
    */
  class StubFactory extends ClientFactory {
    override def open(): LookupClient = new LookupClient {
      private val md = java.security.MessageDigest.getInstance("MD5")
      override def lookup(address: String, county: String): Option[String] = {
        val hex = md.digest(s"$address|$county".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        if (hex.startsWith("0")) None                    // ~6% not-found channel
        else Some(s"${hex.substring(0, 3).toUpperCase} ${hex.substring(3, 8)}")
      }
      override def close(): Unit = ()
    }
  }

  case class LookupRequest(request_id: Long, address: String, county: String)
  case class LookupResult(request_id: Long, address: String, county: String,
                          parcel_id: Option[String])

  /** Enrich a request Dataset through the connector: one client per
    * partition, closed when the partition completes.
    */
  def enrich(requests: Dataset[LookupRequest], factory: ClientFactory): Dataset[LookupResult] = {
    import requests.sparkSession.implicits._
    requests.mapPartitions { it =>
      val client = factory.open()   // once per partition — the session reuse rule
      new Iterator[LookupResult] {
        override def hasNext: Boolean = { val h = it.hasNext; if (!h) client.close(); h }
        override def next(): LookupResult = {
          val r = it.next()
          LookupResult(r.request_id, r.address, r.county,
            client.lookup(r.address, r.county))
        }
      }
    }
  }

  /** Post-enrichment found-filter (F10) splitting the 404 channel. */
  def foundOnly(results: Dataset[LookupResult]): DataFrame =
    results.toDF().filter(col("parcel_id").isNotNull)
}
