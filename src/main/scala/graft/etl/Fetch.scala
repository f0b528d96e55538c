package graft.etl

import org.apache.spark.sql.Dataset

/** S1 — live HTTP page fetch (`/root/reference/utils/extract.py:24-32`),
  * the last piece of the extraction stage: a timeout + retry aware fetcher
  * behind a transport seam, distributed as a `mapPartitions` over the URL
  * set (one transport per partition — connections are not serializable).
  *
  * Reference semantics preserved: a 10 s timeout, HTTP errors raised like
  * `raise_for_status`, and a page that still fails after retries yields
  * None → the page is SKIPPED and the crawl continues
  * (`extract.py:104-107`), never failing the job. The reference's 1.5 s
  * politeness sleep (`extract.py:131`) becomes a per-partition inter-request
  * delay — at 1000 executors that is the correct place to rate-limit.
  *
  * The harness is offline, so specs drive [[fetchPages]] with a fake
  * transport; [[JdkTransport]] is the production implementation.
  */
object Fetch {

  /** Transport seam: return the body or throw (network error / bad status). */
  trait HttpTransport extends Serializable {
    def get(url: String, timeoutMs: Int): String
  }

  /** `java.net.http` transport — the live implementation (unused by the
    * offline harness; exercised only through the seam's contract). */
  final class JdkTransport extends HttpTransport {
    @transient private lazy val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10))
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()
    def get(url: String, timeoutMs: Int): String = {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMillis(timeoutMs.toLong))
        .GET().build()
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2) // raise_for_status twin
        throw new java.io.IOException(s"HTTP ${resp.statusCode()} for $url")
      resp.body()
    }
  }

  /** timeout per request (extract.py:27), linear-backoff retries on top of
    * the reference's single attempt, optional politeness delay between
    * requests of one partition (extract.py:131). */
  final case class Config(timeoutMs: Int = 10000, retries: Int = 2,
      backoffMs: Long = 100, politenessMs: Long = 0)

  /** One page: Some(body) or — after `1 + retries` failed attempts — None
    * (the reference's log-and-return-None, `extract.py:29-32`). */
  def fetchPage(transport: HttpTransport, url: String, cfg: Config): Option[String] = {
    var attempt = 0
    var result: Option[String] = None
    var done = false
    while (!done) {
      try { result = Some(transport.get(url, cfg.timeoutMs)); done = true }
      catch { case _: Exception =>
        attempt += 1
        if (attempt > cfg.retries) done = true
        else if (cfg.backoffMs > 0) Thread.sleep(cfg.backoffMs * attempt)
      }
    }
    result
  }

  /** Distributed fetch: URL rows → (url, html) rows; failed pages are
    * dropped (skip-and-continue). Narrow `mapPartitions`, no shuffle — the
    * page space parallelizes exactly like the DSv2 scrape source. */
  def fetchPages(urls: Dataset[String], transport: () => HttpTransport,
      cfg: Config = Config()): Dataset[(String, String)] = {
    val spark = urls.sparkSession
    import spark.implicits._
    urls.mapPartitions { it =>
      val t = transport()
      var first = true
      it.flatMap { url =>
        if (!first && cfg.politenessMs > 0) Thread.sleep(cfg.politenessMs)
        first = false
        fetchPage(t, url, cfg).map(url -> _)
      }
    }
  }
}
