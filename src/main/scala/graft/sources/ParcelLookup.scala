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

  /** q99: XPath extraction over an HTML-detail column — the set-oriented form
    * of the reference's core scrape step (crs_ui_bot.py:211-228 extracts the
    * parcel id from a `<th>`-labelled detail table via
    * `//th[contains(text(),'Parcel ID')]/following-sibling::td[1]//span`).
    * Here the fetched page rides a string column (synthesized
    * deterministically from `customer` — the fixture trick the letter
    * pipeline uses) and the same XPath runs as a codegen'd built-in
    * (`xpath_string` / `xpath`), a pure narrow projection: fetch-then-parse
    * parallelizes row-wise at any scale with no shuffle before the
    * presentation sort.
    */
  def xpathExtract(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val c = graft.Tables.customer(spark, dir)
    val html = concat(
      lit("<table><tr><th>Owner</th><td><span>"), col("c_name"),
      lit("</span></td></tr><tr><th>Parcel ID</th><td><span>P-"),
      ((col("c_custkey") * 7) % 100000).cast("string"),
      lit("</span></td></tr><tr><th>Acreage</th><td><span>"),
      ((col("c_custkey") % 50) + 1).cast("string"),
      lit("</span></td></tr></table>"))
    c.select(col("c_custkey"), html.as("page"))
      .select(col("c_custkey"),
        expr("xpath_string(page, \"//th[contains(text(),'Parcel ID')]/following-sibling::td[1]//span\")").as("parcel_id"),
        expr("xpath_string(page, \"//th[text()='Owner']/following-sibling::td[1]//span\")").as("owner"),
        expr("CAST(xpath_string(page, \"//th[text()='Acreage']/following-sibling::td[1]//span\") AS BIGINT)").as("acreage"),
        expr("size(xpath(page, '//th/text()'))").cast("long").as("n_fields"))
      .orderBy(col("c_custkey"))
  }
}
