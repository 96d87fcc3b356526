package graft.sources.openmeteo

/** Transport layer for the connector (SURVEY.md §2.1 S1–S5, §4): the seam
  * where the live HTTP client would sit. Offline mode (the only mode in
  * this zero-egress environment) reads block payload fixture files; the
  * retry/backoff/rate-limit *policies* around it are real and mirror the
  * reference's operational behavior:
  *  - up to `maxRetries` attempts with exponential backoff (1→2→4 s) on
  *    transient errors, plus one final fallback attempt
  *    (`server.py:68-93`)
  *  - fail-fast on non-retryable (4xx-analogue) errors (`server.py:80-82`)
  *  - a minimum delay between calls (`AsyncRateLimiter(1.1 s)`,
  *    `server.py:108`)
  *  - per-category call counters (`API_CALLS`, `server.py:37`)
  */
trait Transport extends Serializable {
  /** Fetch one block payload (a JSON document) for the given params. */
  def fetch(params: Map[String, String]): String
}

/** Non-retryable failure — the analogue of an HTTP 4xx with diagnostics
  * (`server.py:263-277`).
  */
final class FatalTransportException(msg: String) extends RuntimeException(msg)

/** Transient failure — the analogue of a timeout/network error. */
final class TransientTransportException(msg: String) extends RuntimeException(msg)

/** Reads block payloads from a JSON-lines fixture file; params select the
  * block whose coordinates are nearest to (latitude, longitude). Missing
  * file → fatal (config error); no blocks → fatal (location not covered).
  */
final class OfflineTransport(path: String) extends Transport {
  override def fetch(params: Map[String, String]): String = {
    val lat = params.get("latitude").map(_.toDouble)
      .getOrElse(throw new FatalTransportException("latitude required"))
    val lon = params.get("longitude").map(_.toDouble)
      .getOrElse(throw new FatalTransportException("longitude required"))
    val file = new java.io.File(path)
    if (!file.exists())
      throw new FatalTransportException(s"fixture not found: $path")
    val lines = scala.io.Source.fromFile(file, "UTF-8")
    try {
      val blocks = lines.getLines().filter(_.nonEmpty).toVector
      if (blocks.isEmpty) throw new FatalTransportException(s"empty fixture: $path")
      // nearest block by simple lat/lon distance (offline grid resolution)
      blocks.minBy { b =>
        val bl = OfflineTransport.extractNumber(b, "latitude")
        val bo = OfflineTransport.extractNumber(b, "longitude")
        math.hypot(bl - lat, bo - lon)
      }
    } finally lines.close()
  }
}

object OfflineTransport {
  /** Cheap top-level scalar extraction without a full parse (the full
    * parse happens once per partition in the reader).
    */
  private[openmeteo] def extractNumber(json: String, key: String): Double = {
    val m = java.util.regex.Pattern
      .compile("\"" + key + "\"\\s*:\\s*(-?[0-9.]+)").matcher(json)
    if (m.find()) m.group(1).toDouble else Double.NaN
  }
}

/** Scan-path offline transport: `fetch(Map("block" -> i))` returns fixture
  * line `i` — the offline stand-in for one location×chunk HTTP request.
  * The file is streamed ONCE per instance (= once per task), retaining
  * only the lines this partition owns, so a P-partition scan costs P
  * streaming passes, not P × full-file memory.
  *
  * `failFirstAttempt` is deterministic fault injection for tests: the
  * first fetch of each block raises a transient error, proving the
  * [[RetryingTransport]] decorator actually sits on the scan path.
  */
final class LineOfflineTransport(path: String, wanted: Array[Int],
    failFirstAttempt: Boolean = false) extends Transport {

  private lazy val lines: Map[Int, String] = {
    val idxSet = wanted.toSet
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try src.getLines().filter(_.nonEmpty).zipWithIndex
      .collect { case (l, i) if idxSet(i) => i -> l }.toMap
    finally src.close()
  }
  private val attempted = scala.collection.mutable.Set.empty[Int]

  override def fetch(params: Map[String, String]): String = {
    val idx = params.get("block").map(_.toInt)
      .getOrElse(throw new FatalTransportException("block index required"))
    CallCounters.inc("forecast")
    if (failFirstAttempt && attempted.add(idx))
      throw new TransientTransportException(s"injected transient failure, block $idx")
    lines.getOrElse(idx,
      throw new FatalTransportException(s"block $idx not in partition of $path"))
  }
}

/** Live HTTP transport (S1/S2): GET `baseUrl?params` via the JDK HTTP
  * client — the drop-in production implementation of the seam the
  * offline transports stand in for. Error classification mirrors the
  * reference exactly (`server.py:68-93`):
  *  - timeouts / connection failures → [[TransientTransportException]]
  *    (retryable — [[RetryingTransport]] wraps this)
  *  - HTTP 4xx → [[FatalTransportException]] with body diagnostics
  *    (fail fast, no retry, `server.py:80-82`)
  *  - HTTP 5xx → transient (the remote may recover)
  * The client is per-instance and `@transient lazy`: each executor
  * builds its own pooled client on first fetch (the reference's single
  * shared `httpx.AsyncClient`, `server.py:39-40`, per JVM).
  */
final class HttpTransport(baseUrl: String, timeoutMs: Long = 30000L)
    extends Transport {

  @transient private lazy val client: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs))
      .build()

  override def fetch(params: Map[String, String]): String = {
    val qs = params.toSeq.sortBy(_._1).map { case (k, v) =>
      java.net.URLEncoder.encode(k, "UTF-8") + "=" +
        java.net.URLEncoder.encode(v, "UTF-8")
    }.mkString("&")
    val uri = java.net.URI.create(
      if (qs.isEmpty) baseUrl else s"$baseUrl?$qs")
    val req = java.net.http.HttpRequest.newBuilder(uri)
      .timeout(java.time.Duration.ofMillis(timeoutMs)).GET().build()
    CallCounters.inc("http")
    val resp =
      try client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      catch {
        case e: java.net.http.HttpTimeoutException =>
          throw new TransientTransportException(s"timeout: ${e.getMessage}")
        case e: java.io.IOException =>
          throw new TransientTransportException(s"network: ${e.getMessage}")
      }
    resp.statusCode() match {
      case c if c >= 200 && c < 300 => resp.body()
      case c if c >= 400 && c < 500 =>
        throw new FatalTransportException(
          s"HTTP $c: ${resp.body().take(200)}")
      case c => throw new TransientTransportException(s"HTTP $c")
    }
  }
}

/** Exponential-backoff retry policy (S4). `backoffBaseMs` is injectable so
  * tests run instantly; production default mirrors the reference (1 s base,
  * doubling, 3 retries + final fallback attempt).
  */
final case class RetryPolicy(maxRetries: Int = 3, backoffBaseMs: Long = 1000L)

final class RetryingTransport(inner: Transport, policy: RetryPolicy)
    extends Transport {
  @volatile var attempts: Int = 0

  override def fetch(params: Map[String, String]): String = {
    var delay = policy.backoffBaseMs
    var lastErr: Throwable = null
    var attempt = 0
    while (attempt < policy.maxRetries) {
      attempt += 1; attempts += 1
      try return inner.fetch(params)
      catch {
        case e: FatalTransportException => throw e // fail fast, no retry
        case e: Exception =>
          lastErr = e
          if (attempt < policy.maxRetries) {
            Thread.sleep(delay)
            delay *= 2
          }
      }
    }
    // final fallback attempt after the backoff loop (server.py:89-93);
    // fatal errors keep failing fast even here
    attempts += 1
    try inner.fetch(params)
    catch {
      case e: FatalTransportException => throw e
      case _: Exception =>
        throw new RuntimeException(
          s"transport failed after ${policy.maxRetries} retries + fallback", lastErr)
    }
  }
}

/** Minimum-delay admission control (S3): at most one call per
  * `minDelayMs` per JVM — the connector-side quota guard. Combined with a
  * cap on scan partitions, executor fan-out cannot exceed the API quota.
  */
final class RateLimitedTransport(inner: Transport, minDelayMs: Long)
    extends Transport {
  override def fetch(params: Map[String, String]): String = {
    RateLimitedTransport.acquire(minDelayMs)
    inner.fetch(params)
  }
}

object RateLimitedTransport {
  private val lastCall = new java.util.concurrent.atomic.AtomicLong(0L)

  private def acquire(minDelayMs: Long): Unit = {
    var ok = false
    while (!ok) {
      val prev = lastCall.get()
      val now = System.currentTimeMillis()
      val wait = prev + minDelayMs - now
      if (wait > 0) Thread.sleep(wait)
      else ok = lastCall.compareAndSet(prev, now)
    }
  }
}

/** Per-category call counters (S5, `API_CALLS`): JVM-wide like the
  * reference's module global; surfaced per-scan via the V2 custom metric.
  */
object CallCounters {
  private val counters =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()

  def inc(category: String): Unit =
    counters.computeIfAbsent(category, _ => new java.util.concurrent.atomic.AtomicLong())
      .incrementAndGet()

  def get(category: String): Long =
    Option(counters.get(category)).map(_.get()).getOrElse(0L)
}
