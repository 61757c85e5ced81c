package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.HtmlExtract
import graft.sources.HtmlExtract.Field

/** The selector-lite HTML parser: exactly the behaviors row
  * extraction depends on, pinned — tag/class selection, text and
  * attribute extraction, entity decoding, and the malformed-input
  * recovery rules crawl HTML actually exercises. */
class HtmlExtractSpec extends AnyFunSuite {

  private def fixture(name: String): String = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  private val restaurantFields = Seq(
    Field("name", "span.TYaxT", default = "이름 없음"),
    Field("category", "span.KCMnt"),
    Field("place_id", "a.place_bluelink", attr = Some("href"),
      pattern = Some("/place/(\\d+)")))

  test("select: tag.class steps, descendant chains, document order") {
    val doc = HtmlExtract.parse(
      """<ul class="list"><li class="row a">1</li><li class="row">2</li></ul>
        |<li class="row">outside</li>""".stripMargin)
    assert(HtmlExtract.select(doc, "li.row").map(_.innerText) == Seq("1", "2", "outside"))
    assert(HtmlExtract.select(doc, "ul.list li.row").map(_.innerText) == Seq("1", "2"))
    assert(HtmlExtract.select(doc, ".a").map(_.innerText) == Seq("1"))
    assert(HtmlExtract.selectFirst(doc, "li.missing").isEmpty)
  }

  test("attributes: quoted, single-quoted, unquoted, bare; entities decode in text and attrs") {
    val doc = HtmlExtract.parse(
      """<a href="/p?a=1&amp;b=2" data-x='y' rel=noopener hidden>R &amp; D &#44032;</a>""")
    val a = HtmlExtract.selectFirst(doc, "a").get
    assert(a.attr("href").contains("/p?a=1&b=2"))
    assert(a.attr("data-x").contains("y"))
    assert(a.attr("rel").contains("noopener"))
    assert(a.attr("hidden").contains(""))
    assert(a.innerText == "R & D 가") // &#44032; = 가
  }

  test("recovery: implied li close, stray close ignored, unclosed tags at EOF, raw script text") {
    val doc = HtmlExtract.parse(
      """<ul><li class="r">one<li class="r">two</ul></div>
        |<script>if (1 < 2) document.write("<li class='r'>fake</li>")</script>
        |<p class="tail">tail""".stripMargin)
    // the second <li> implies closing the first; neither swallows the other
    assert(HtmlExtract.select(doc, "li.r").map(_.innerText) == Seq("one", "two"))
    // script content never becomes elements
    assert(HtmlExtract.select(doc, "li.r").size == 2)
    // the unclosed trailing <p> still materializes
    assert(HtmlExtract.selectFirst(doc, "p.tail").map(_.innerText).contains("tail"))
  }

  test("fixture page 1: reference-shaped rows extract exactly (defaults on missing fields)") {
    val rows = HtmlExtract.rows(fixture("restaurants_page1.html"),
      "li.UEzoS", restaurantFields)
    assert(rows == Seq(
      Map("name" -> "김밥천국 강남점", "category" -> "분식", "place_id" -> "1129849271"),
      Map("name" -> "평양냉면 & 만두", "category" -> "", "place_id" -> "37417907"),
      Map("name" -> "순대국밥", "category" -> "한식", "place_id" -> "20030042")))
  }

  test("fixture page 2: unquoted attrs, nested markup in text, missing link -> pattern default") {
    val rows = HtmlExtract.rows(fixture("restaurants_page2.html"),
      "li.UEzoS", restaurantFields)
    assert(rows == Seq(
      Map("name" -> "할머니 손칼국수", "category" -> "국수", "place_id" -> "555"),
      Map("name" -> "비밀의 정원", "category" -> "카페", "place_id" -> "")))
  }

  test("jsonRows: valid JSON objects, UTF-8 content intact") {
    val js = HtmlExtract.jsonRows(fixture("restaurants_page2.html"),
      "li.UEzoS", restaurantFields)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val parsed = js.map(mapper.readTree)
    assert(parsed.head.get("name").asText == "할머니 손칼국수")
    assert(parsed(1).get("place_id").asText == "")
  }
}
