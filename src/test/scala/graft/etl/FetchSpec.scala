package graft.etl

import java.util.concurrent.ConcurrentHashMap

import graft.SparkSpec

/** Pins the S1 fetcher against the reference's `get_page_content`
  * (`/root/reference/utils/extract.py:24-32`): timeout-bounded attempts,
  * None after exhausted retries, skip-and-continue across the page loop
  * (`extract.py:104-107`). Transports are fakes; attempt counts live in a
  * JVM-wide map so executor-side calls are observable in local mode. */
object FetchSpecState {
  val attempts = new ConcurrentHashMap[String, Integer]()
  def bump(url: String): Int =
    attempts.merge(url, 1, (a, b) => a + b)
  def reset(): Unit = attempts.clear()

  def card(i: Int): String =
    s"""<div class="product-card"><h3 class="product-title">Item $i</h3>
       |<span class="price">$$${i}0.00</span><p>Rating: 4.$i / 5</p></div>""".stripMargin
}

class FetchSpec extends SparkSpec {

  /** Fails the first `failures` attempts per URL, then serves `body`. */
  private class FlakyTransport(failures: Int, body: String => String)
      extends Fetch.HttpTransport {
    def get(url: String, timeoutMs: Int): String = {
      val n = FetchSpecState.bump(url)
      if (n <= failures) throw new java.io.IOException(s"boom #$n for $url")
      body(url)
    }
  }

  private val cfg = Fetch.Config(backoffMs = 0)

  test("success returns the body on the first attempt") {
    FetchSpecState.reset()
    val got = Fetch.fetchPage(new FlakyTransport(0, _ => "<html>ok</html>"), "u1", cfg)
    assert(got.contains("<html>ok</html>"))
    assert(FetchSpecState.attempts.get("u1") == 1)
  }

  test("transient failures are retried up to cfg.retries, then succeed") {
    FetchSpecState.reset()
    val got = Fetch.fetchPage(new FlakyTransport(2, _ => "recovered"), "u2", cfg)
    assert(got.contains("recovered"))
    assert(FetchSpecState.attempts.get("u2") == 3)
  }

  test("persistent failure → None after 1 + retries attempts (extract.py:29-32)") {
    FetchSpecState.reset()
    val got = Fetch.fetchPage(new FlakyTransport(Int.MaxValue, _ => "never"), "u3", cfg)
    assert(got.isEmpty)
    assert(FetchSpecState.attempts.get("u3") == 3)
  }

  test("distributed fetch skips dead pages and keeps the rest (extract.py:104-107)") {
    FetchSpecState.reset()
    import spark.implicits._
    val urls = (1 to 20).map(i => s"page$i").toDS().repartition(4)
    // every 5th page is permanently down
    val transport = () => new Fetch.HttpTransport {
      def get(url: String, timeoutMs: Int): String = {
        FetchSpecState.bump(url)
        if (url.stripPrefix("page").toInt % 5 == 0)
          throw new java.io.IOException(s"down: $url")
        s"<html>$url</html>"
      }
    }
    val got = Fetch.fetchPages(urls, transport, cfg).collect().toMap
    assert(got.size == 16)
    assert((1 to 20).filter(_ % 5 != 0).forall(i => got(s"page$i") == s"<html>page$i</html>"))
    // dead pages were attempted the full 1 + retries times before skipping
    assert(FetchSpecState.attempts.get("page5") == 3)
  }

  test("end-to-end: pageUrls → fetch (one page down) → parsed cards") {
    FetchSpecState.reset()
    val transport = () => new Fetch.HttpTransport {
      def get(url: String, timeoutMs: Int): String = {
        if (url.endsWith("/page7")) throw new java.io.IOException("504")
        val page = if (url.endsWith(".dev")) 1
                   else url.substring(url.lastIndexOf("page") + 4).toInt
        s"<html><body>${FetchSpecState.card(page)}</body></html>"
      }
    }
    val df = Extract.extractFromWeb(spark, transport, "2023-10-01", cfg)
    val rows = df.collect()
    assert(rows.length == Extract.TotalPages - 1, "exactly the dead page is missing")
    val titles = rows.map(_.getString(0)).toSet
    assert(!titles.contains("Item 7") && titles.contains("Item 8"))
    assert(rows.forall(_.getString(6) == "2023-10-01"))
  }
}
