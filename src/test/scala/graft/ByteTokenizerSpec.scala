package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.FixtureGen
import graft.html.{ByteTokenizer, Decode, HtmlTokenizer}
import graft.pipeline.Extract
import java.nio.charset.StandardCharsets
import scala.util.Random

/** Differential equivalence of the r5 byte-level fast path against the
  * decoded-String reference semantics:
  *
  *   1. tokenizer level — `ByteTokenizer(bytes) == HtmlTokenizer(Decode(bytes)
  *      .text)` block-for-block on every fixture corpus and on randomized
  *      adversarial documents (entities, non-ASCII, malformed markup,
  *      raw-text traps, astral chars);
  *   2. prescan level — utf16 length and garbage count match the decoded
  *      string's `length` / `Quality.garbageRatio` numerator;
  *   3. pipeline level — `Extract.apply == Extract.applyDecoded` on every
  *      corpus (status, text, spans, stats including charset label).
  *
  * Any future tokenizer change must keep this suite green — it is the
  * structural guard that the two implementations cannot drift.
  */
class ByteTokenizerSpec extends AnyFunSuite {

  private def assertBlocksEqual(url: String, bytes: Array[Byte]): Unit = {
    val plan = Decode.utf8Plan(bytes)
    if (plan == null) return // decoded path only; nothing to compare
    val ps = ByteTokenizer.prescan(bytes, plan.offset)
    val dec = Decode(bytes)
    if (!ps.valid || ps.utf16Len > HtmlTokenizer.DefaultCaps.maxChars) return
    // prescan equivalence
    assert(ps.utf16Len == dec.text.length, s"$url: utf16Len")
    val expBad = {
      var bad = 0
      var i = 0
      while (i < dec.text.length) {
        val c = dec.text.charAt(i)
        if (c == '\ufffd' || graft.text.Canon.isControl(c)) bad += 1
        i += 1
      }
      bad
    }
    assert(ps.garbage == expBad, s"$url: garbage count")
    // tokenizer equivalence
    val bt = ByteTokenizer(bytes, plan.offset)
    val ct = HtmlTokenizer(dec.text)
    assert(bt.truncated == ct.truncated, s"$url: truncated")
    assert(bt.blocks.length == ct.blocks.length,
      s"$url: block count ${bt.blocks.length} vs ${ct.blocks.length}")
    var i = 0
    while (i < ct.blocks.length) {
      assert(bt.blocks(i) == ct.blocks(i),
        s"$url block $i:\n byte: ${bt.blocks(i)}\n char: ${ct.blocks(i)}")
      i += 1
    }
  }

  private def assertExtractEqual(f: FixtureGen.Fixture): Unit = {
    val a = Extract(f.page)
    val b = Extract.applyDecoded(f.page)
    assert(a.status == b.status, s"${f.page.url}: status")
    assert(a.extracted_text == b.extracted_text, s"${f.page.url}: text")
    assert(a.spans.toSeq == b.spans.toSeq, s"${f.page.url}: spans")
    assert(a.stats == b.stats, s"${f.page.url}: stats\n ${a.stats}\n ${b.stats}")
  }

  test("tokenizer + prescan equivalence across all fixture corpora") {
    val all =
      FixtureGen.fixtures(500) ++ FixtureGen.adversarial(150) ++
        FixtureGen.fbsect(60) ++ FixtureGen.cocoedge(60) ++
        FixtureGen.overwrap(60) ++ FixtureGen.colflow(60) ++
        FixtureGen.ruleCorpora.flatMap { case (_, gen, _) => gen(40) }
    all.foreach(f => assertBlocksEqual(f.page.url, f.page.html))
  }

  test("Extract byte path == decoded path across all fixture corpora") {
    val all =
      FixtureGen.fixtures(500) ++ FixtureGen.adversarial(150) ++
        FixtureGen.colflow(60) ++
        FixtureGen.ruleCorpora.flatMap { case (_, gen, _) => gen(40) }
    all.foreach(assertExtractEqual)
  }

  /** Random adversarial documents aimed at the byte/char seams: multi-byte
    * UTF-8 of every length, zero-width and NBSP whitespace, C1 controls,
    * entities valid and broken, raw-text close-tag traps, nested anchors,
    * unterminated tags.
    */
  private def randomDoc(rng: Random): String = {
    val frags = Array(
      "<p>plain text</p>",
      "<div>  spaced   out\t\n</div>",
      "caf\u00e9 d\u00e9j\u00e0 vu",
      "\u00a0\u00a0nbsp lead",
      "zero\u200bwidth\u200djoin\u00ad",
      "\u4f60\u597d\u4e16\u754c",
      "emoji \ud83d\ude00 pair",
      "ctrl\u0007bell\u009cC1\u0085NEL",
      "&amp; &lt;tag&gt; &quot;q&quot;",
      "&#233; &#x20AC; &#0; &#xD800; &unknown; &brokennosemi",
      "<a href=\"/x\">link text</a>",
      "<a href=http://ex.com/>unquoted</a>",
      "<ul><li><a href='/a'>A</a></li><li><a href='/b'>B C</a></li></ul>",
      "<script>var s = \"</scri\" + \"pt>\";</script>",
      "<style>p { color: red }</style>",
      "<textarea>raw <b>not bold</b></textarea>",
      "<title>t\u00edtulo</title>",
      "<!-- comment <p>not a block</p> -->",
      "<!DOCTYPE html>",
      "<?php echo 1; ?>",
      "<table><tr><td>c1</td><td>c2</td></tr></table>",
      "<svg><circle r=\"1\"/><text>hidden</text></svg>",
      "<math><mi>x</mi></math>",
      "<br><hr><img src=x>",
      "<b><i>misnested</b></i>",
      "</div></span>stray closes",
      "<div class=unquoted id=x>attr soup</div>",
      "<p title=\"quote > inside\">quoted gt</p>",
      "< notatag",
      "lone & ampersand",
      "\ufffd literal replacement",
      "<h2>Header \u2014 dash \u2026</h2>",
      "<blockquote cite='\u00fcml'>bq</blockquote>",
      "<noscript>suppressed text</noscript>",
      "<noscript>if (a &amp;&amp; b) x &lt; y; &unknown &#233;</noscript>",
      "<noscript>amp at close&</noscript>after",
      "<custom-elem>custom</custom-elem>",
      "<p>\u2028line sep\u2029para sep</p>",
      "<head><meta charset=\"utf-8\"><title>T</title></head>",
      "tail text no tag"
    )
    val sb = new StringBuilder("<html><body>")
    val n = 3 + rng.nextInt(20)
    var i = 0
    while (i < n) {
      sb.append(frags(rng.nextInt(frags.length)))
      if (rng.nextInt(3) == 0) sb.append('\n')
      i += 1
    }
    if (rng.nextInt(4) != 0) sb.append("</body></html>")
    if (rng.nextInt(8) == 0) sb.append("<p>unterminated <b")
    sb.toString
  }

  test("tokenizer equivalence on 400 randomized adversarial documents") {
    val rng = new Random(20260817L)
    var k = 0
    while (k < 400) {
      val doc = randomDoc(rng)
      assertBlocksEqual(s"random-$k", doc.getBytes(StandardCharsets.UTF_8))
      k += 1
    }
  }

  test("whitespace-torture equivalence (hole-patched bulk copy paths)") {
    // targets the r5 fused-flush bulk path that patches ISOLATED \t..\r
    // bytes to ' ' inside the word copy: isolated vs adjacent ws of every
    // ASCII kind, ws at word-lane boundaries, leading/trailing ws, ws
    // inside links (link-counter retraction), and a >128-hole block that
    // forces the patch-buffer-full retreat branch
    val wsChars = Array(' ', '\t', '\n', '\u000b', '\f', '\r')
    val rng = new Random(20260818L)
    var k = 0
    while (k < 300) {
      val sb = new StringBuilder("<html><body>")
      val inLink = rng.nextInt(3) == 0
      if (inLink) sb.append("<p><a href=\"/x\">") else sb.append("<p>")
      val words = 1 + rng.nextInt(30)
      var w = 0
      while (w < words) {
        if (rng.nextInt(5) == 0) sb.append(wsChars(rng.nextInt(6))) // leading/extra ws
        sb.append("w").append(('a' + rng.nextInt(26)).toChar.toString * (1 + rng.nextInt(12)))
        val run = 1 + (if (rng.nextInt(4) == 0) rng.nextInt(4) else 0)
        var r = 0
        while (r < run) { sb.append(wsChars(rng.nextInt(6))); r += 1 }
        w += 1
      }
      if (inLink) sb.append("</a> tail</p>") else sb.append("</p>")
      sb.append("</body></html>")
      assertBlocksEqual(s"ws-$k", sb.toString.getBytes(StandardCharsets.UTF_8))
      k += 1
    }
    // 400 isolated newlines in ONE block: the per-run patch budget (the
    // fast path stops admitting words at length-8 = 120 recorded holes)
    // forces the bulk run to SPLIT several times mid-block; every split
    // seam must hand the trailing patched space to the next run's
    // carry/retract machinery exactly
    val big = new StringBuilder("<html><body><p>")
    var i = 0
    while (i < 400) { big.append("word").append(i % 10).append('\n'); i += 1 }
    big.append("</p></body></html>")
    assertBlocksEqual("ws-overflow", big.toString.getBytes(StandardCharsets.UTF_8))
    // same but tab-separated and with a trailing-space edge per 8-byte lane
    val lanes = new StringBuilder("<html><body><p>")
    i = 0
    while (i < 64) { lanes.append("abcdefg".substring(0, 1 + i % 7)).append('\t'); i += 1 }
    lanes.append("end</p></body></html>")
    assertBlocksEqual("ws-lanes", lanes.toString.getBytes(StandardCharsets.UTF_8))
  }

  test("byte path engages on the clean corpus (not vacuous)") {
    // the differential tests are meaningless if utf8Plan never fires;
    // assert the fast path actually covers the bulk of the bench corpus
    val fx = FixtureGen.fixtures(200)
    val eligible = fx.count { f =>
      val plan = Decode.utf8Plan(f.page.html)
      plan != null && f.page.html.nonEmpty &&
        ByteTokenizer.prescan(f.page.html, plan.offset).valid
    }
    assert(eligible >= 150, s"only $eligible/200 fixtures took the byte path")
  }

  test("prescan rejects invalid UTF-8 and over-long docs fall back") {
    val bad = Array[Byte]('a', 0xc3.toByte, 'x') // truncated 2-byte seq
    assert(!ByteTokenizer.prescan(bad, 0).valid)
    // cp1252 bytes under a utf-8 meta label: plan fires, prescan rejects,
    // Extract must fall back to REPLACE semantics identical to applyDecoded
    val html = "<html><head><meta charset=\"utf-8\"></head><body><p>" +
      "caf\u00e9 and more content here to pass the garbage gate, plus " +
      "enough words that the block is a real paragraph of text." +
      "</p></body></html>"
    val cp = html.getBytes(java.nio.charset.Charset.forName("windows-1252"))
    assert(Decode.utf8Plan(cp) != null)
    assert(!ByteTokenizer.prescan(cp, 0).valid)
    val row = graft.core.PageRow("u", new java.sql.Timestamp(0L), cp, "", "en")
    val a = Extract(row)
    val b = Extract.applyDecoded(row)
    assert(a.extracted_text == b.extracted_text && a.stats == b.stats)
    assert(a.extracted_text.contains("caf\ufffd"))
  }
}
