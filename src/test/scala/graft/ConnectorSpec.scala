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

  test("HTTP client implements the seam: auth, re-auth on expiry, retry, 404 channel") {
    // Localhost fixture standing in for the county site: token auth with
    // forced expiry every 25 lookups, one injected 500 per address on its
    // first attempt for a flaky slice, 404 for a deterministic slice.
    val authCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val tokenUses = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicInteger]()
    val flakyOnce = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def respond(ex: com.sun.net.httpserver.HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
      ex.close()
    }
    server.createContext("/auth", ex => {
      val creds = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      if (!creds.contains("password=sekrit")) respond(ex, 403, "bad credentials")
      else {
        val tok = s"tok-${authCount.incrementAndGet()}"
        tokenUses.put(tok, new java.util.concurrent.atomic.AtomicInteger(0))
        respond(ex, 200, tok)
      }
    })
    server.createContext("/parcel", ex => {
      val tok = Option(ex.getRequestHeaders.getFirst("Authorization"))
        .map(_.stripPrefix("Bearer ")).orNull
      val uses = tokenUses.get(tok)
      if (uses == null || uses.incrementAndGet() > 25) respond(ex, 401, "session expired")
      else {
        val query = ex.getRequestURI.getRawQuery
        val addr = java.net.URLDecoder.decode(
          query.split("&").find(_.startsWith("address=")).get.drop(8), "UTF-8")
        val n = addr.split(" ")(0).toLong
        if (n % 11 == 3 && flakyOnce.add(addr)) respond(ex, 500, "transient upstream error")
        else if (n % 7 == 0) respond(ex, 404, "parcel not found")
        else respond(ex, 200, s"P-${n * 13}")
      }
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val factory = new ParcelLookup.HttpClientFactory(base, "bot", "sekrit", backoffMs = 1)
      val reqs = (1L to 120L).map(i =>
        ParcelLookup.LookupRequest(i, s"$i Main St", s"County ${i % 7}")).toDS()
        .repartition(4)
      val results = ParcelLookup.enrich(reqs, factory)
        .collect().sortBy(_.request_id)
      assert(results.length == 120)
      // 404 channel: every address with n % 7 == 0 is None, all others resolve
      results.foreach { r =>
        val n = r.request_id
        if (n % 7 == 0) assert(r.parcel_id.isEmpty, s"expected 404 for $n")
        else assert(r.parcel_id.contains(s"P-${n * 13}"), s"wrong parcel for $n")
      }
      // flaky addresses (n % 11 == 3, first attempt 500) still resolved → retry worked
      assert(results.exists(r => r.request_id % 11 == 3 && r.parcel_id.nonEmpty))
      // 120 lookups across 4 partitions with 25-use tokens forces re-auth:
      // more auth calls than partitions proves the 401→re-login→replay path ran
      assert(authCount.get() > 4, s"expected re-auth beyond the 4 per-partition logins, got ${authCount.get()}")
      // bad credentials fail fast at open()
      val bad = new ParcelLookup.HttpClientFactory(base, "bot", "wrong")
      intercept[IllegalArgumentException] { bad.open() }
    } finally server.stop(0)
  }

  test("HTTP client URL-encodes credentials and fails fast on a post-re-auth 401") {
    // Credentials with form metacharacters must survive the wire ('&', '=',
    // '+', '%'); a token the server still rejects after one re-auth must be
    // an immediate error, not a retry storm with a known-stale token.
    val parcelCalls = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def respond(ex: com.sun.net.httpserver.HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
      ex.close()
    }
    val password = "se&kri=t+100%"
    server.createContext("/auth", ex => {
      val creds = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val decoded = creds.split("&").map(_.split("=", 2)).collect {
        case Array(k, v) => k -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap
      if (decoded.get("password").contains(password)) respond(ex, 200, "tok")
      else respond(ex, 403, "bad credentials")
    })
    server.createContext("/parcel", ex => {
      parcelCalls.incrementAndGet()
      respond(ex, 401, "revoked") // rejects even freshly-issued tokens
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val client = new ParcelLookup.HttpClientFactory(
        base, "bot", password, maxRetries = 5, backoffMs = 1).open()
      val err = intercept[java.io.IOException] { client.lookup("1 Main St", "County 0") }
      assert(err.getMessage.contains("unauthorized after re-auth"))
      // exactly the original attempt + the single post-re-auth replay —
      // no maxRetries-deep loop against a token the server already rejected
      assert(parcelCalls.get() == 2, s"expected 2 parcel calls, got ${parcelCalls.get()}")
    } finally server.stop(0)
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
