package graft.etl

import org.scalacheck.Gen

import graft.SparkSpec

/** Property pins for the round-2 hot-path rewrites: the combined-tag card
  * tokenizer must agree with the generic per-tag `findElements` scanner on
  * arbitrary (including malformed) card-ish HTML, because `findElements`
  * is itself pinned to the reference card grammar by ExtractSpec. */
class ScannerPropSpec extends SparkSpec {

  private val word = Gen.oneOf("Rating:", "Colors", "Size:", "Gender:", "x",
    "4.5 / 5", "3 Colors", "&amp;", "<", "deep")
  private val cls = Gen.oneOf("product-title", "price", "product-card",
    "note", "", "price extra")
  private val tag = Gen.oneOf("h3", "span", "p", "div", "b")

  /** Random fragment: nested/unclosed/stray-closed tags, entities, text. */
  private def fragment(depth: Int): Gen[String] =
    if (depth <= 0) word
    else Gen.frequency(
      3 -> word,
      2 -> (for {
        t <- tag; c <- cls; inner <- fragment(depth - 1)
      } yield s"""<$t class="$c">$inner</$t>"""),
      1 -> (for { t <- tag; inner <- fragment(depth - 1) } yield s"<$t>$inner"),
      1 -> (for { t <- tag } yield s"</$t>"),
      2 -> (for {
        a <- fragment(depth - 1); b <- fragment(depth - 1)
      } yield s"$a $b"))

  test("tokenizeCard ≡ findElements for h3/span/p over 300 arbitrary fragments") {
    val cases = Gen.listOfN(300, fragment(4)).sample.get
    cases.foreach { html =>
      val els = Extract.tokenizeCard(html)
      Seq("h3", "span", "p").foreach { t =>
        val viaTokenizer = els.filter(_.tag == t)
          .map(e => (e.src, html.substring(e.innerStart, e.innerEnd)))
        val viaFindElements = Extract.findElements(html, t, _ => true)
        assert(viaTokenizer == viaFindElements,
          s"scanner divergence on tag <$t> for fragment:\n$html")
      }
    }
  }
}
