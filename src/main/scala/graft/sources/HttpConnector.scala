package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper

/** Live HTTP implementations of the engine's injectable connector
  * contracts — closing the "a user must write the fetcher" gap:
  *
  *  - [[pagedJsonFetcher]] plugs into `PagedSource.fetch` (S3/S5:
  *    the reference's 4-concurrent-page crawl,
  *    restaurant-crawler/restaurant-crawler.py:270-324);
  *  - [[nominatimClient]] plugs into `Enrich.rateLimited` (O5: the
  *    reference geocodes each cleaned address through Nominatim,
  *    restaurant-crawler/restaurant-crawler.py:39-53, and Nominatim's
  *    public usage policy is what forces the 1 req/s limiter);
  *  - the POST side lives in `sinks.HttpSink.JdkHttpTransport` (K3/K4).
  *
  * Everything here is stateless and Serializable-by-construction
  * (plain functions over `HttpURLConnection`, which pools keep-alive
  * connections process-wide), so the closures ship into tasks as-is.
  * On a 1000-executor cluster the fan-out discipline is the caller's:
  * `PagedSource.fetch` gives one task per page, `Enrich.rateLimited`
  * keeps the limiter inside the task — this file only does transport.
  *
  * Verified against an in-process localhost `HttpServer` in
  * LiveHttpSpec (real sockets, real UTF-8, zero egress).
  */
object HttpConnector {

  /** GET `url`; Right(utf-8 body) for 2xx, Left(error) otherwise.
    * Errors are values, not exceptions — callers choose the policy
    * (fetcher throws to engage Spark task retry; geocoder maps to
    * None for per-row isolation). */
  def get(url: String, timeoutMs: Int = 10000): Either[String, String] =
    try {
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("GET")
      conn.setRequestProperty("Accept", "application/json")
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      val code = conn.getResponseCode
      if (code >= 200 && code < 300) {
        val in = conn.getInputStream
        try Right(new String(in.readAllBytes(), "UTF-8")) finally in.close()
      } else {
        Option(conn.getErrorStream).foreach(_.close())
        Left(s"HTTP $code")
      }
    } catch {
      // A Spark task kill interrupts the blocking read; converting
      // that into a Left would swallow cancellation (and lose the
      // interrupt flag) — restore the flag and let it propagate.
      case e: InterruptedException =>
        Thread.currentThread().interrupt(); throw e
      case e: Exception => Left(e.toString)
    }

  /** Split a JSON array payload into its elements' compact JSON
    * renderings — the raw-string rows a caller then parses with
    * `from_json` against its declared schema (schema lives in the
    * query, not the connector). Non-array payloads yield no rows. */
  def jsonArrayElements(body: String): Seq[String] = {
    val root = new ObjectMapper().readTree(body)
    if (root == null || !root.isArray) Seq.empty
    else {
      val b = Seq.newBuilder[String]
      root.elements().forEachRemaining(e => b += e.toString)
      b.result()
    }
  }

  /** Page-number → record rows, for `PagedSource.fetch`. GETs
    * `{base}?page=N` (appending with `&` when base already has a
    * query) and expects a JSON array. A non-2xx page THROWS so the
    * task fails and Spark's retry policy applies — unless the caller
    * opted into `tolerateFailures`, which catches it into an empty
    * page (the reference's failed-page skip). */
  def pagedJsonFetcher(base: String, timeoutMs: Int = 10000): Int => Seq[String] = {
    val sep = if (base.contains("?")) "&" else "?"
    (page: Int) =>
      get(s"$base${sep}page=$page", timeoutMs) match {
        case Right(body) => jsonArrayElements(body)
        case Left(err)   => throw new java.io.IOException(s"page $page: $err")
      }
  }

  /** Page-number → extracted HTML rows, for `PagedSource.fetch`: GETs
    * `{base}?page=N` like [[pagedJsonFetcher]] but parses an HTML
    * payload with [[HtmlExtract]] — `rowSelector` picks the row
    * elements (the reference's `li.UEzoS`,
    * restaurant-crawler.py:313), `fields` their per-row values
    * (`:168-178`), emitted as JSON object strings so the downstream
    * `from_json` typing is identical to the JSON-API path. Non-2xx
    * pages throw (Spark task retry) unless the caller opted into
    * PagedSource's `tolerateFailures`. */
  def pagedHtmlFetcher(base: String, rowSelector: String,
                       fields: Seq[HtmlExtract.Field],
                       timeoutMs: Int = 10000): Int => Seq[String] = {
    val sep = if (base.contains("?")) "&" else "?"
    (page: Int) =>
      get(s"$base${sep}page=$page", timeoutMs) match {
        case Right(body) => HtmlExtract.jsonRows(body, rowSelector, fields)
        case Left(err)   => throw new java.io.IOException(s"page $page: $err")
      }
  }

  /** Nominatim-shaped geocoder for `Enrich.rateLimited`: GET
    * `{base}/search?q=…&format=json&limit=1`, take the top hit's
    * (lat, lon). Nominatim serializes coordinates as JSON *strings*
    * ("37.56"), so values are read via asDouble(), which accepts
    * both string and numeric nodes. None on transport failure, empty
    * result set, or an unparsable payload — per-row isolation (F5),
    * never a task failure. */
  def nominatimClient(base: String, timeoutMs: Int = 10000): String => Option[(Double, Double)] =
    (q: String) => {
      val url = s"$base/search?q=${java.net.URLEncoder.encode(q, "UTF-8")}&format=json&limit=1"
      get(url, timeoutMs).toOption.flatMap { body =>
        try {
          val root = new ObjectMapper().readTree(body)
          if (root != null && root.isArray && root.size() > 0) {
            val hit = root.get(0)
            val (lat, lon) = (hit.path("lat"), hit.path("lon"))
            if (lat.isMissingNode || lon.isMissingNode) None
            else Some((lat.asDouble(), lon.asDouble()))
          } else None
        } catch { case _: Exception => None }
      }
    }
}
