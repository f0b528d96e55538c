package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.RawProduct

/** The reference's extraction stage (S1-S5, SURVEY.md §2.1) re-shaped for
  * Spark: where `/root/reference/utils/extract.py:90-141` fetches and parses
  * 50 pages serially (1.5 s politeness sleep → ≥75 s floor), here page HTML
  * is a `Dataset[String]` and card parsing is a `flatMap` — embarrassingly
  * parallel, one task per partition of pages, no driver involvement. At
  * 100 TB of crawl data the same shape holds: `spark.read.text`/parquet over
  * pre-fetched HTML → `flatMap(parse)` is a narrow, codegen-adjacent stage.
  *
  * The HTML scanner is hand-rolled (offline jars carry no jsoup): a
  * balanced-tag element finder sufficient for the card grammar pinned by
  * `/root/reference/tests/test_extract.py:14-24` (FIXTURES.md §2).
  */
object Extract {

  /** `/root/reference/utils/extract.py:20-21`. */
  val BaseUrl = "https://fashion-studio.dicoding.dev"
  val TotalPages = 50

  // ---------------------------------------------------------------- S2
  /** Page-URL generator: page 1 is the bare base URL, later pages get
    * `/page{n}` (`/root/reference/utils/extract.py:100`). A parallelizable
    * `range` scan, unlike the reference's serial loop. */
  def pageUrls(spark: SparkSession): DataFrame =
    spark.range(1, TotalPages + 1L)
      .select(
        col("id").as("page"),
        when(col("id") === 1, BaseUrl)
          .otherwise(concat(lit(s"$BaseUrl/page"), col("id"))).as("url"))

  // ------------------------------------------------------- HTML scanner
  /** Inner text of an HTML fragment: drop tags, decode the entities the
    * fixture grammar can contain, collapse-trim. `&amp;` decodes LAST —
    * decoding it first would double-decode entity-escaped text
    * (`a &amp;lt; b` must yield `a &lt; b`, not `a < b`). */
  private[etl] def innerText(html: String): String =
    html.replaceAll("(?s)<[^>]*>", "")
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&nbsp;", " ")
      .replace("&amp;", "&")
      .trim

  /** Value of an attribute inside a start tag, or None. */
  private[etl] def attrValue(startTag: String, attr: String): Option[String] = {
    val m = s"""(?is)\\b$attr\\s*=\\s*("([^"]*)"|'([^']*)')""".r.findFirstMatchIn(startTag)
    m.map(g => Option(g.group(2)).getOrElse(g.group(3)))
  }

  private def classAttr(startTag: String): String =
    attrValue(startTag, "class").getOrElse("")

  /** Per-tag compiled patterns, cached — this runs inside the hot flatMap
    * (4 tag lookups per card × cards per page); recompiling on every call
    * measured ~2× slower at sf0.1. */
  private val tagPatterns =
    new java.util.concurrent.ConcurrentHashMap[String, (scala.util.matching.Regex, scala.util.matching.Regex)]()
  private def patternsFor(tag: String): (scala.util.matching.Regex, scala.util.matching.Regex) =
    tagPatterns.computeIfAbsent(tag, t =>
      (s"(?is)<$t\\b[^>]*>".r, s"(?is)<(/?)$t\\b[^>]*>".r))

  /** All elements `<tag ...>...</tag>` whose class attribute satisfies
    * `classPred`, in document order (nested matches included, matching
    * BeautifulSoup's `select`/`find_all`). Returns (startTagSource, innerHtml).
    *
    * ONE boundary scan + a nesting stack: the earlier formulation re-scanned
    * `html.substring(m.end)` per matched element — quadratic in page size,
    * and the dominant cost of the extract stage at sf0.1 (4.3 s → this
    * single-pass form roughly halves it). An unclosed element keeps the
    * old semantics: inner = rest of the document. */
  private[etl] def findElements(
      html: String, tag: String, classPred: String => Boolean): Seq[(String, String)] = {
    val (_, anyBoundary) = patternsFor(tag)
    // (open order, startTagSource, innerHtml) — emitted at the balancing
    // close, then restored to document order of the opens
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String)]
    var seq = 0
    var stack = List.empty[(Int, Int, String, Boolean)] // (innerStart, seq, src, wanted)
    anyBoundary.findAllMatchIn(html).foreach { b =>
      if (b.group(1) != "/") {
        val src = b.matched
        stack = (b.end, seq, src, classPred(classAttr(src))) :: stack
        seq += 1
      } else stack match {
        case (innerStart, s, src, wanted) :: rest =>
          if (wanted) out += ((s, src, html.substring(innerStart, b.start)))
          stack = rest
        case Nil => () // stray close before any open: ignore
      }
    }
    stack.foreach { case (innerStart, s, src, wanted) =>
      if (wanted) out += ((s, src, html.substring(innerStart)))
    }
    out.sortInPlaceBy(_._1).iterator.map(t => (t._2, t._3)).toSeq
  }

  private def hasClassToken(tokens: Set[String])(cls: String): Boolean =
    cls.split("\\s+").exists(tokens.contains)

  // ------------------------------------------- combined card tokenizer
  /** One element of a card fragment: tag, its start-tag source, and the
    * inner-HTML offsets (open-tag order in `seq`). */
  private[etl] final case class El(tag: String, src: String,
      innerStart: Int, innerEnd: Int, seq: Int)

  private val cardTagPattern = "(?is)<(/?)(h3|span|p)\\b[^>]*>".r

  /** All h3/span/p elements of a card in ONE scan (the per-tag
    * `findElements` calls each re-scanned the card; the card parse needs
    * three tags, so the combined alternation is a 3× scan reduction on
    * the hot path). Per-tag nesting stacks are independent, so balancing
    * matches `findElements` exactly; unclosed elements keep the
    * rest-of-fragment semantics. */
  private[etl] def tokenizeCard(html: String): IndexedSeq[El] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[El]
    var seq = 0
    val stacks = scala.collection.mutable.Map.empty[String, List[(Int, Int, String)]]
    cardTagPattern.findAllMatchIn(html).foreach { m =>
      val tag = m.group(2).toLowerCase
      if (m.group(1).isEmpty) {
        stacks(tag) = (m.end, seq, m.matched) :: stacks.getOrElse(tag, Nil)
        seq += 1
      } else stacks.getOrElse(tag, Nil) match {
        case (innerStart, s, src) :: rest =>
          out += El(tag, src, innerStart, m.start, s)
          stacks(tag) = rest
        case Nil => () // stray close: ignore
      }
    }
    stacks.foreach { case (tag, open) =>
      open.foreach { case (innerStart, s, src) =>
        out += El(tag, src, innerStart, html.length, s)
      }
    }
    out.sortInPlaceBy(_.seq).toIndexedSeq
  }

  // ---------------------------------------------------------------- S3
  /** Card selection (`/root/reference/utils/extract.py:110-118`): primary
    * selectors `div.collection-card, div.product-card, div.item-card`; if
    * none match, fall back to class-substring selectors
    * `div[class*='product'|'collection'|'item']`. */
  private[etl] def selectCards(pageHtml: String): Seq[String] = {
    val primary = findElements(pageHtml, "div",
      hasClassToken(Set("collection-card", "product-card", "item-card")))
    val cards =
      if (primary.nonEmpty) primary
      else findElements(pageHtml, "div", cls =>
        cls.contains("product") || cls.contains("collection") || cls.contains("item"))
    cards.map(_._2)
  }

  /** One card → one raw product (`/root/reference/utils/extract.py:35-87`):
    * `h3.product-title` required (card dropped if absent);
    * `span.price` defaults to `"N/A"`; every `<p>` is scanned with the
    * reference's substring if/elif chain — `"Rating:"` (prefix stripped),
    * `"Colors"` (text kept VERBATIM, `extract.py:70`), `"Size:"`/`"Gender:"`
    * (prefix stripped); a later matching `<p>` overwrites an earlier one.
    * `timestamp` is caller-supplied so tests and batch runs stay
    * deterministic (the reference stamps `datetime.now()`, `extract.py:83`).
    */
  def parseProductCard(cardHtml: String, timestamp: String): Option[RawProduct] = {
    if (cardHtml == null || cardHtml.trim.isEmpty) return None
    val els = tokenizeCard(cardHtml)
    def classHas(e: El, token: String) =
      classAttr(e.src).split("\\s+").contains(token)
    def text(e: El) = innerText(cardHtml.substring(e.innerStart, e.innerEnd))
    els.find(e => e.tag == "h3" && classHas(e, "product-title")).map(text).map { title =>
      val price = els.find(e => e.tag == "span" && classHas(e, "price"))
        .map(text).getOrElse("N/A")
      var rating = "N/A"; var colors = "N/A"; var size = "N/A"; var gender = "N/A"
      els.iterator.filter(_.tag == "p").foreach { e =>
        val t = text(e)
        if (t.contains("Rating:")) rating = t.replace("Rating:", "").trim
        else if (t.contains("Colors")) colors = t
        else if (t.contains("Size:")) size = t.replace("Size:", "").trim
        else if (t.contains("Gender:")) gender = t.replace("Gender:", "").trim
      }
      RawProduct(title, price, rating, colors, size, gender, timestamp)
    }
  }

  /** S3+S5 distributed: pages of HTML → raw-products DataFrame. The
    * reference's serial page loop becomes one narrow `flatMap` stage. */
  def extract(pages: Dataset[String], timestamp: String): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.flatMap(html => selectCards(html).flatMap(parseProductCard(_, timestamp))).toDF()
  }

  /** S1+S2+S3+S5 end-to-end: URL generation → distributed fetch (failed
    * pages skipped, `extract.py:104-107`) → card parse. The whole crawl is
    * two narrow stages; the transport is the [[Fetch.HttpTransport]] seam
    * (live: `Fetch.JdkTransport`; specs: a fake). */
  def extractFromWeb(spark: SparkSession, transport: () => Fetch.HttpTransport,
      timestamp: String, cfg: Fetch.Config = Fetch.Config()): DataFrame = {
    import spark.implicits._
    val urls = pageUrls(spark).select("url").as[String]
    extract(Fetch.fetchPages(urls, transport, cfg).map(_._2), timestamp)
  }
}
