package graft.sources.openmeteo

import com.fasterxml.jackson.databind.ObjectMapper

/** Geocoding through the [[Transport]] seam (S3 — the reference's
  * Nominatim lookup, `server.py:96-119`), completing live/offline parity
  * with the forecast/archive sources: the same retry, fail-fast, and
  * rate-limit decorators govern geocode calls.
  *
  *  - offline: [[OfflineGeocodeTransport]] answers from the places
  *    dimension file (the hermetic stand-in);
  *  - live: [[HttpTransport]] pointed at a Nominatim-compatible endpoint
  *    (`q=<name>&format=json&limit=2`), rate-limited to the reference's
  *    ≥1.1 s/call (`AsyncRateLimiter`, `server.py:108`).
  *
  * [[Geocoder.lookup]] enforces `exactly_one` (`server.py:110`): zero or
  * multiple matches are errors carrying the reference's diagnostics, not
  * silent picks.
  */
final class OfflineGeocodeTransport(placesPath: String) extends Transport {
  // Per-instance, not per-fetch: mapper construction is expensive and
  // this sits on the scan path. @transient — Transport is Serializable
  // but ObjectMapper is not; the lazy val rebuilds after deserialization.
  @transient private lazy val mapper = new ObjectMapper()
  override def fetch(params: Map[String, String]): String = {
    val q = params.getOrElse("q",
      throw new FatalTransportException("geocode: 'q' param required"))
    val file = new java.io.File(placesPath)
    if (!file.exists())
      throw new FatalTransportException(s"places file not found: $placesPath")
    CallCounters.inc("geocode")
    val src = scala.io.Source.fromFile(file, "UTF-8")
    val matches = try src.getLines().filter(_.nonEmpty)
      .map(mapper.readTree)
      .filter(n => n.get("place").asText().equalsIgnoreCase(q))
      .map(n => s"""{"latitude":${n.get("latitude").asDouble()},""" +
        s""""longitude":${n.get("longitude").asDouble()}}""")
      .toSeq
    finally src.close()
    matches.mkString("[", ",", "]")
  }
}

/** Resolve a free-text place to exactly one coordinate pair through any
  * [[Transport]] (offline places file or live HTTP). Accepts both this
  * engine's `latitude`/`longitude` keys and Nominatim's `lat`/`lon`
  * string fields.
  */
final class Geocoder(transport: Transport) extends Serializable {
  @transient private lazy val mapper = new ObjectMapper()
  def lookup(place: String): Either[String, (Double, Double)] = {
    // ANY failure — fatal transport, retries-exhausted, OR a malformed
    // 200 body (HTML error page, missing fields) — resolves to the error
    // envelope, matching the reference's catch-all around the geocode
    // call (`server.py:116-119` → error response, never a crash).
    try {
      val body = transport.fetch(
        Map("q" -> place, "format" -> "json", "limit" -> "2"))
      val root = mapper.readTree(body)
      if (root == null || !root.isArray)
        return Left(s"Geocoding failed for '$place': unexpected payload")
      def coord(i: Int, a: String, b: String): Option[Double] = {
        val n = root.get(i)
        if (n.hasNonNull(a)) Some(n.get(a).asDouble())
        else if (n.hasNonNull(b)) Some(n.get(b).asDouble())
        else None
      }
      root.size() match {
        case 0 => Left(s"Could not find coordinates for place: '$place'")
        case 1 =>
          (coord(0, "latitude", "lat"), coord(0, "longitude", "lon")) match {
            case (Some(la), Some(lo)) => Right((la, lo))
            case _ =>
              Left(s"Geocoding failed for '$place': match lacks coordinates")
          }
        case n => Left(s"Ambiguous place '$place': $n matches")
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        Left(s"Geocoding failed for '$place': ${e.getMessage}")
    }
  }
}

object Geocoder {
  /** Hermetic geocoder over the places dimension file, retry-wrapped like
    * the live path (rate limit off by default — there is no quota to
    * protect offline).
    */
  def offline(placesPath: String, maxRetries: Int = 3,
      backoffBaseMs: Long = 1000L, rateLimitMs: Long = 0L): Geocoder =
    build(new OfflineGeocodeTransport(placesPath), maxRetries, backoffBaseMs,
      rateLimitMs)

  /** Live geocoder against a Nominatim-compatible base URL; defaults
    * mirror the reference (3 retries, 1 s backoff base, ≥1.1 s between
    * calls, 15 s timeout — `server.py:106-108`).
    */
  def live(baseUrl: String, maxRetries: Int = 3, backoffBaseMs: Long = 1000L,
      rateLimitMs: Long = 1100L, timeoutMs: Long = 15000L): Geocoder =
    build(new HttpTransport(baseUrl, timeoutMs), maxRetries, backoffBaseMs,
      rateLimitMs)

  private def build(base: Transport, maxRetries: Int, backoffBaseMs: Long,
      rateLimitMs: Long): Geocoder = {
    val retried = new RetryingTransport(base, RetryPolicy(maxRetries, backoffBaseMs))
    new Geocoder(
      if (rateLimitMs > 0) new RateLimitedTransport(retried, rateLimitMs)
      else retried)
  }
}
