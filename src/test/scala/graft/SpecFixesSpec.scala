package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.html.{Decode, Entities, HtmlTokenizer}
import java.nio.charset.StandardCharsets

/** Round-2 self-review fixes on the decode/tokenize core (WHATWG-alignment
  * cases that the fixture generators never produce — pinned here so they
  * cannot regress silently).
  */
class SpecFixesSpec extends AnyFunSuite {

  private def blocks(html: String) =
    HtmlTokenizer(Decode(html.getBytes(StandardCharsets.UTF_8)).text).blocks

  test("meta-declared utf-16 label decodes as UTF-8 (WHATWG remap)") {
    val html = "<html><head><meta charset=\"utf-16\"></head><body><p>café page</p></body></html>"
    val d = Decode(html.getBytes(StandardCharsets.UTF_8))
    assert(d.charset == "meta:utf-8")
    assert(d.text.contains("café page"))
  }

  test("utf-16 BOM is still decoded as real UTF-16") {
    val body = "<html><body><p>hello</p></body></html>"
    val le = Array[Byte](0xff.toByte, 0xfe.toByte) ++ body.getBytes(StandardCharsets.UTF_16LE)
    val d = Decode(le)
    assert(d.charset == "utf-16le-bom" && d.text.contains("hello"))
  }

  test("charset= inside an unrelated attribute value is NOT a declaration") {
    val html = "<html><head><meta name=\"description\" content=\"set charset=windows-1252 in your editor\">" +
      "</head><body><p>€ café</p></body></html>"
    val d = Decode(html.getBytes(StandardCharsets.UTF_8))
    assert(d.charset == "utf-8", s"got ${d.charset}") // validation path, not meta
    assert(d.text.contains("€ café"))
  }

  test("commented-out meta is skipped; the real one wins") {
    val html = "<!-- <meta charset=\"windows-1252\"> --><meta charset=\"utf-8\"><p>é</p>"
    val d = Decode(html.getBytes(StandardCharsets.UTF_8))
    assert(d.charset == "meta:utf-8")
    assert(d.text.contains("é"))
  }

  test("http-equiv content-type charset honored; quoted '>' inside content survives") {
    val html = "<meta http-equiv=\"content-type\" content=\"text/html; a > b; charset=windows-1252\"><p>café</p>"
    val d = Decode(html.getBytes(Charset("windows-1252")))
    assert(d.charset == "meta:windows-1252")
    assert(d.text.contains("café"))
  }

  private def Charset(name: String) = java.nio.charset.Charset.forName(name)

  test("<metadata> is not <meta>") {
    val html = "<metadata charset=\"windows-1252\"></metadata><p>€</p>"
    val d = Decode(html.getBytes(StandardCharsets.UTF_8))
    assert(d.charset == "utf-8")
  }

  test("unquoted attribute value ending in '/' does not self-close the anchor") {
    val b = blocks("<body><li><a href=http://example.com/>Home</a> tail</li></body>")
    assert(b.length == 1)
    assert(b(0).nLinkChars == "Home".length, s"nLinkChars=${b(0).nLinkChars}")
  }

  test("self-closing syntax on a non-void HTML element is ignored (element stays open)") {
    val b = blocks("<body><div/><a href=\"/x\">link</a> free</body>")
    // the div stays open per WHATWG; the anchor still tracks its chars
    assert(b(0).nLinkChars == "link".length)
    // and a spurious </a> cannot pop through an outer anchor opened before a
    // "self-closed" inner one
    val b2 = blocks("<body><p><a href=\"/o\"><span><a href=http://x/>i</a>after</a></span></p></body>")
    assert(b2(0).nLinkChars == b2(0).nChars, "all text is inside some anchor")
  }

  test("tagPath is captured at the first VISIBLE char, whitespace-insensitive") {
    val a = blocks("<body><li><a href=\"/\">Home</a></li></body>")
    val b = blocks("<body><li>\n  <a href=\"/\">Home</a></li></body>")
    assert(a(0).tagPath == b(0).tagPath, s"${a(0).tagPath} vs ${b(0).tagPath}")
    assert(a(0).depth == b(0).depth)
  }

  test("overlong numeric references decode to U+FFFD; zero-padded valid refs decode") {
    assert(Entities.tryDecode("&#999999999;", 0)._1 == "�")
    assert(Entities.tryDecode("&#x000000041;", 0)._1 == "A")
    assert(Entities.tryDecode("&#x110000;", 0)._1 == "�")
    assert(Entities.tryDecode("&#65;", 0)._1 == "A")
    // still literal without the terminating semicolon
    assert(Entities.tryDecode("&#65 ", 0) == null)
  }

  test("entity scanning respects the tokenizer cost cap") {
    // reference straddles the cap: must not decode using chars past limit
    assert(Entities.tryDecode("&#65;", 0, limit = 4) == null)
    assert(Entities.tryDecode("&#65;", 0, limit = 5) != null)
  }

  test("unterminated comment in an oversized document stops at the cap") {
    val caps = HtmlTokenizer.Caps(maxChars = 1000, maxBlocks = 100, maxDepth = 32)
    val html = "<p>visible</p><!-- unterminated " + ("x" * 100000)
    val r = HtmlTokenizer(html, caps)
    assert(r.truncated)
    assert(r.blocks.map(_.text).toSeq == Seq("visible"))
  }
}
