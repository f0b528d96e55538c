package graft.etl

import graft.SparkSpec
import graft.model.RawProduct

/** Extraction semantics pinned 1:1 with
  * `/root/reference/tests/test_extract.py` (FIXTURES.md §2). */
class ExtractSpec extends SparkSpec {

  private val ts = "2023-10-01T00:00:00"

  private val fullCard =
    """<div class="product-card">
      |    <h3 class="product-title">Test Product</h3>
      |    <span class="price">$99.99</span>
      |    <p>Rating: 4.5 / 5</p>
      |    <p>3 Colors</p>
      |    <p>Size: M</p>
      |    <p>Gender: Unisex</p>
      |</div>""".stripMargin

  private def inner(card: String): String = {
    // strip the outer div so parseProductCard sees the card body, as the
    // reference's parse receives a soup element
    card.replaceFirst("(?s)^<div[^>]*>", "").replaceFirst("(?s)</div>\\s*$", "")
  }

  test("full card parses to the pinned row (test_extract.py:43-58)") {
    assert(Extract.parseProductCard(inner(fullCard), ts).contains(
      RawProduct("Test Product", "$99.99", "4.5 / 5", "3 Colors", "M", "Unisex", ts)))
  }

  test("missing title → card dropped (test_extract.py:60-69)") {
    val noTitle = inner(fullCard).replaceAll("(?s)<h3.*?</h3>", "")
    assert(Extract.parseProductCard(noTitle, ts).isEmpty)
  }

  test("missing price → \"N/A\" (test_extract.py:71-82)") {
    val noPrice = inner(fullCard).replaceAll("(?s)<span.*?</span>", "")
    assert(Extract.parseProductCard(noPrice, ts).map(_.price).contains("N/A"))
  }

  test("null / empty card → dropped (test_extract.py:84-86)") {
    assert(Extract.parseProductCard(null, ts).isEmpty)
    assert(Extract.parseProductCard("   ", ts).isEmpty)
  }

  test("missing detail <p> tags → \"N/A\" defaults (extract.py:60-63)") {
    val bare = """<h3 class="product-title">X</h3><span class="price">$1.00</span>"""
    assert(Extract.parseProductCard(bare, ts).contains(
      RawProduct("X", "$1.00", "N/A", "N/A", "N/A", "N/A", ts)))
  }

  test("primary card selectors match all three class names (extract.py:110-111)") {
    val page =
      s"""<html><body>
         |$fullCard
         |<div class="collection-card"><h3 class="product-title">B</h3></div>
         |<div class="item-card"><h3 class="product-title">C</h3></div>
         |<div class="other"><h3 class="product-title">ignored</h3></div>
         |</body></html>""".stripMargin
    assert(Extract.selectCards(page).size == 3)
  }

  test("fallback class-substring selectors (extract.py:113-118)") {
    val page =
      """<div class="product-grid-cell"><h3 class="product-title">A</h3></div>
        |<div class="plain">nope</div>""".stripMargin
    assert(Extract.selectCards(page).size == 1)
  }

  test("markup robustness: case, quote style, attribute order, nested tags") {
    val messy =
      """<DIV CLASS='product-card' data-x="1">
        |  <h3 data-idx='7' class='featured product-title'><b>Bold</b> Product</h3>
        |  <SPAN class="price old">$5.00</SPAN>
        |  <p><em>Rating:</em> 4.0 / 5</p>
        |</DIV>""".stripMargin
    val cards = Extract.selectCards(messy)
    assert(cards.size == 1)
    val parsed = Extract.parseProductCard(cards.head, ts)
    assert(parsed.map(_.title).contains("Bold Product"))
    assert(parsed.map(_.price).contains("$5.00"))
    assert(parsed.map(_.rating).contains("4.0 / 5"))
  }

  test("entity decoding: &amp; decodes last, no double-decode") {
    assert(Extract.innerText("a &amp;lt; b") == "a &lt; b")
    assert(Extract.innerText("x &lt; y &amp; z &gt; w") == "x < y & z > w")
  }

  test("end-to-end page → DataFrame (test_extract.py:88-130)") {
    import spark.implicits._
    val page =
      s"""<html><body>$fullCard
         |<div class="product-card"><p>Rating: 1 / 5</p></div>
         |</body></html>""".stripMargin
    val df = Extract.extract(Seq(page, "<html>empty</html>").toDS(), ts)
    val rows = df.collect()
    assert(rows.length == 1) // title-less card and empty page drop out
    assert(rows.head.getString(0) == "Test Product")
    assert(df.columns.toSeq ==
      Seq("title", "price", "rating", "colors", "size", "gender", "timestamp"))
  }

  test("page-URL generator (extract.py:99-100)") {
    val urls = Extract.pageUrls(spark).collect().map(_.getString(1))
    assert(urls.length == 50)
    assert(urls.head == "https://fashion-studio.dicoding.dev")
    assert(urls(1) == "https://fashion-studio.dicoding.dev/page2")
    assert(urls.last == "https://fashion-studio.dicoding.dev/page50")
  }
}
