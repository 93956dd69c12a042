package graft.html

import graft.core.Block
import graft.text.Canon
import scala.collection.mutable.ArrayBuffer

/** HTML → block sequence. The per-row analogue of the reference's pixel grid:
  * where PRLib sees a dense `cv::Mat`, we see an ordered array of DOM text
  * blocks with density features (SURVEY.md §1.2). Also the "structural
  * normalization" stage (deskew analogue, deskew.cpp:208-251): malformed HTML
  * (unclosed/misnested tags) is normalized by deterministic stack rules so
  * downstream heuristics see upright structure.
  *
  * Fully specified, zero dependencies — byte-identity of the final extraction
  * is won or lost here (SURVEY.md §7 M0.3).
  *
  * Parsing spec (deterministic):
  *  - `<name ...>`, `</name ...>` with name = [a-zA-Z][a-zA-Z0-9-]*; ASCII
  *    lowercased. `<!--...-->` comments, `<!...>` declarations, `<?...>`
  *    processing instructions are skipped. A `<` not starting one of these is
  *    literal text.
  *  - attributes are skipped quote-aware (a `>` inside "..." or '...' does
  *    not close the tag).
  *  - RAW-TEXT elements (content never parsed as markup, text DISCARDED):
  *    script, style, textarea, title.
  *  - SUPPRESSED subtrees (tags parsed, text discarded): head, noscript,
  *    template, svg, iframe, object, embed, applet, audio, video, canvas,
  *    select, datalist.
  *  - VOID elements (never pushed): area base br col embed hr img input link
  *    meta param source track wbr.
  *  - BLOCK-boundary tags flush the current block on open AND close; all
  *    other elements are inline (text flows through).
  *  - close tag: if its name is on the stack, pop through it (implicitly
  *    closing inner unclosed elements); otherwise ignored. Either way a block
  *    tag still flushes.
  *  - `<a>` increments link depth (tracked via the stack, so unclosed
  *    anchors end with their parent).
  *  - caps (resize.cpp:29-62 analogue — bound worst-case row cost): input
  *    chars, emitted blocks, stack depth; exceeding a cap sets `truncated`
  *    and stops cleanly. Never throws.
  */
object HtmlTokenizer {

  final case class Result(blocks: Array[Block], truncated: Boolean)

  final case class Caps(maxChars: Int = 2000000, maxBlocks: Int = 50000, maxDepth: Int = 256)
  val DefaultCaps: Caps = Caps()

  private val blockTags: Set[String] = Set(
    "html", "body", "p", "div", "section", "article", "header", "footer",
    "nav", "aside", "main", "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol",
    "li", "table", "thead", "tbody", "tfoot", "tr", "td", "th", "caption",
    "blockquote", "pre", "br", "hr", "form", "fieldset", "legend", "figure",
    "figcaption", "dl", "dt", "dd", "details", "summary", "address", "center",
    "dialog", "menu")

  private val voidTags: Set[String] = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr")

  private val rawTextTags: Set[String] = Set("script", "style", "textarea", "title")

  // foreign-content roots: the ONLY elements whose self-closing solidus is
  // honored (WHATWG: for HTML elements the trailing '/' is ignored and the
  // element stays open; honoring it generally mis-parses unquoted attribute
  // values ending in '/', e.g. href=http://x/ — which silently dropped the
  // <a> push and corrupted link accounting)
  private val foreignRoots: Set[String] = Set("svg", "math")

  private val suppressTags: Set[String] = Set(
    "head", "noscript", "template", "svg", "iframe", "object", "embed",
    "applet", "audio", "video", "canvas", "select", "datalist")

  def apply(html: String, caps: Caps = DefaultCaps): Result = {
    val n = math.min(html.length, caps.maxChars)
    val truncatedInput = html.length > caps.maxChars
    val blocks = new ArrayBuffer[Block](64)
    var truncated = truncatedInput

    // element stack
    val stack = new ArrayBuffer[String](32)
    var anchorDepth = 0
    var suppressDepth = 0
    // tagPath cache: stack.mkString is per-BLOCK cost; most blocks share the
    // stack of their predecessor, so rebuild only after a stack mutation
    var cachedPath: String = ""
    var cachedPathValid = true // empty stack -> ""
    def currentPath(): String = {
      if (!cachedPathValid) {
        cachedPath = stack.mkString("/")
        cachedPathValid = true
      }
      cachedPath
    }

    // current block accumulator
    val raw = new java.lang.StringBuilder(256)
    // link segments: (startInRaw, endInRaw) ranges contributed inside <a>
    val linkRuns = new ArrayBuffer[(Int, Int)](8)
    var linkRunStart = -1 // open link run start in raw coords, -1 if none
    var firstOff = -1 // source offset of first visible char
    var lastOff = -1 // one past source offset of last visible char
    var blockDepth = 0
    var blockPath = ""
    var pathSet = false

    @inline def inLink: Boolean = anchorDepth > 0

    def beginLinkRunIfNeeded(): Unit =
      if (inLink && linkRunStart < 0) linkRunStart = raw.length
    def endLinkRunIfOpen(): Unit =
      if (linkRunStart >= 0) { linkRuns += ((linkRunStart, raw.length)); linkRunStart = -1 }

    /** Append text to the current block. `oneToOne` = chars of `s` map 1:1
      * onto source chars starting at srcStart (plain text runs); false for
      * entity replacements (whole [srcStart, srcEnd) reference). Offsets
      * recorded are those of the first/last VISIBLE char.
      */
    def appendText(s: String, srcStart: Int, srcEnd: Int, oneToOne: Boolean): Unit = {
      if (suppressDepth > 0) return
      beginLinkRunIfNeeded()
      raw.append(s)
      var i = 0
      var first = -1
      var last = -1
      while (i < s.length) {
        val c = s.charAt(i)
        if (!(Canon.isWs(c) || Canon.isStripped(c) || Canon.isControl(c))) {
          if (first < 0) first = i
          last = i
        }
        i += 1
      }
      if (first >= 0) {
        // tagPath/depth captured at the first VISIBLE char (not at leading
        // whitespace appended before an intervening tag changed the stack):
        // identical markup must yield identical paths regardless of
        // inter-tag whitespace
        if (!pathSet) {
          blockPath = currentPath()
          blockDepth = stack.length
          pathSet = true
        }
        if (firstOff < 0)
          firstOff = if (oneToOne) srcStart + first else srcStart
        lastOff = if (oneToOne) srcStart + last + 1 else srcEnd
      }
    }

    def flush(): Unit = {
      endLinkRunIfOpen()
      if (raw.length > 0) {
        val canon = Canon(raw.toString)
        if (canon.nonEmpty && blocks.length < caps.maxBlocks) {
          var linkChars = 0
          var linkTokens = 0
          var r = 0
          while (r < linkRuns.length) {
            val (s, e) = linkRuns(r)
            if (e > s) {
              // ASCII fast path: count the canonical chars/tokens of the run
              // without materializing Canon(substring) (same rules; Canon
              // fallback for non-ASCII where NFC could apply)
              val packed = canonCountAscii(raw, s, e)
              if (packed >= 0) {
                linkChars += (packed >>> 32).toInt
                linkTokens += (packed & 0xffffffffL).toInt
              } else {
                val seg = Canon(raw.substring(s, e))
                linkChars += seg.length
                linkTokens += Canon.tokenCount(seg)
              }
            }
            r += 1
          }
          val nTok = Canon.tokenCount(canon)
          blocks += Block(
            tagPath = blockPath,
            text = canon,
            startOff = if (firstOff >= 0) firstOff else 0,
            endOff = if (lastOff >= 0) lastOff else 0,
            nChars = canon.length,
            nTokens = nTok,
            nLinkChars = math.min(linkChars, canon.length),
            nLinkTokens = math.min(linkTokens, nTok),
            depth = blockDepth,
            idx = blocks.length)
        } else if (canon.nonEmpty) truncated = true
      }
      raw.setLength(0)
      linkRuns.clear()
      linkRunStart = -1
      firstOff = -1
      lastOff = -1
      blockPath = ""
      blockDepth = 0
      pathSet = false
    }

    def pushElem(name: String): Unit = {
      if (stack.length < caps.maxDepth) {
        stack += name
        cachedPathValid = false
        if (name == "a") anchorDepth += 1
        if (suppressTags.contains(name)) suppressDepth += 1
      } else truncated = true
    }

    def popThrough(name: String): Unit = {
      var j = stack.length - 1
      while (j >= 0 && stack(j) != name) j -= 1
      if (j >= 0) {
        cachedPathValid = false
        var k = stack.length - 1
        while (k >= j) {
          val popped = stack.remove(k)
          if (popped == "a") anchorDepth = math.max(0, anchorDepth - 1)
          if (suppressTags.contains(popped)) suppressDepth = math.max(0, suppressDepth - 1)
          k -= 1
        }
      }
    }

    @inline def isNameStart(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
    @inline def isNameChar(c: Char): Boolean =
      isNameStart(c) || (c >= '0' && c <= '9') || c == '-'
    @inline def lower(c: Char): Char =
      if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

    var i = 0
    while (i < n && blocks.length < caps.maxBlocks) {
      val c = html.charAt(i)
      if (c == '<') {
        if (i + 3 < n && html.charAt(i + 1) == '!' && html.charAt(i + 2) == '-' &&
          html.charAt(i + 3) == '-') {
          // comment (bounded scan: the cost caps must bound work even when
          // the underlying string is far longer than n)
          val end = boundedIndexOfStr(html, "-->", i + 4, n)
          i = if (end < 0) n else end + 3
        } else if (i + 1 < n && html.charAt(i + 1) == '!') {
          val end = boundedIndexOfChar(html, '>', i + 2, n)
          i = if (end < 0) n else end + 1
        } else if (i + 1 < n && html.charAt(i + 1) == '?') {
          val end = boundedIndexOfChar(html, '>', i + 2, n)
          i = if (end < 0) n else end + 1
        } else if (i + 1 < n &&
          (isNameStart(html.charAt(i + 1)) || html.charAt(i + 1) == '/')) {
          val closing = html.charAt(i + 1) == '/'
          var j = i + (if (closing) 2 else 1)
          if (closing && (j >= n || !isNameStart(html.charAt(j)))) {
            // `</` not followed by a name: skip to '>'
            val end = boundedIndexOfChar(html, '>', j, n)
            i = if (end < 0) n else end + 1
          } else {
            val nameSb = new java.lang.StringBuilder(8)
            while (j < n && isNameChar(html.charAt(j))) {
              nameSb.append(lower(html.charAt(j))); j += 1
            }
            val name = nameSb.toString
            // scan to '>' quote-aware
            var selfClose = false
            var quote: Char = 0
            var done = false
            while (j < n && !done) {
              val cc = html.charAt(j)
              if (quote != 0) { if (cc == quote) quote = 0; j += 1 }
              else if (cc == '"' || cc == '\'') { quote = cc; j += 1 }
              else if (cc == '>') {
                selfClose = j > 0 && html.charAt(j - 1) == '/'
                j += 1; done = true
              } else j += 1
            }
            if (!done) { i = n } // unterminated tag at EOF: drop
            else {
              if (blockTags.contains(name)) flush()
              // auto-close: <body> implicitly ends an unclosed <head>
              // (WHATWG tree-construction behavior; keeps malformed docs
              // from suppressing all body text)
              if (!closing && name == "body" && stack.contains("head"))
                popThrough("head")
              if (closing) { popThrough(name); i = j }
              else if (rawTextTags.contains(name)) {
                // raw text content: skip to matching close tag, discard.
                // WHATWG raw-text end-tag rule: the char after the tag name
                // must be '>', '/', or ASCII whitespace — otherwise it is
                // script/style content (e.g. "</scripty" or a JS string
                // holding "</scriptFoo>"), not the close tag.
                var k = indexOfIgnoreCase(html, "</" + name, j, n)
                while (k >= 0 && !isRawTextEndTag(html, k, name, n))
                  k = indexOfIgnoreCase(html, "</" + name, k + 1, n)
                if (k < 0) i = n
                else {
                  val end = boundedIndexOfChar(html, '>', k, n)
                  i = if (end < 0) n else end + 1
                }
              } else {
                if (!voidTags.contains(name) && !(selfClose && foreignRoots.contains(name)))
                  pushElem(name)
                i = j
              }
            }
          }
        } else {
          // literal '<'
          appendText("<", i, i + 1, oneToOne = true)
          i += 1
        }
      } else if (c == '&') {
        val dec = Entities.tryDecode(html, i, n)
        if (dec != null) {
          appendText(dec._1, i, i + dec._2, oneToOne = false)
          i += dec._2
        } else {
          appendText("&", i, i + 1, oneToOne = true)
          i += 1
        }
      } else {
        // plain text run up to next special char
        var j = i
        while (j < n && html.charAt(j) != '<' && html.charAt(j) != '&') j += 1
        appendText(html.substring(i, j), i, j, oneToOne = true)
        i = j
      }
      // close the current link run when leaving link context
      if (!inLink) endLinkRunIfOpen()
    }
    if (i < html.length) truncated = true
    flush()
    Result(blocks.toArray, truncated)
  }

  private def boundedIndexOfChar(s: String, ch: Char, from: Int, limit: Int): Int = {
    var i = math.max(0, from)
    while (i < limit) {
      if (s.charAt(i) == ch) return i
      i += 1
    }
    -1
  }

  private def boundedIndexOfStr(s: String, needle: String, from: Int, limit: Int): Int = {
    val nl = needle.length
    var i = math.max(0, from)
    while (i + nl <= limit) {
      var k = 0
      while (k < nl && s.charAt(i + k) == needle.charAt(k)) k += 1
      if (k == nl) return i
      i += 1
    }
    -1
  }

  /** Canonical (chars, tokens) of `sb[s, e)` under Canon's exact rules for
    * ASCII content, WITHOUT building the canonical string: whitespace runs
    * collapse to one space (leading/trailing dropped), other control chars
    * removed. Returns -1 when a non-ASCII char is present (NFC could apply
    * — caller falls back to Canon). Packed (chars << 32 | tokens).
    */
  private def canonCountAscii(sb: java.lang.StringBuilder, s: Int, e: Int): Long = {
    var chars = 0
    var spaces = 0
    var pendingSpace = false
    var i = s
    while (i < e) {
      val c = sb.charAt(i)
      if (c >= 0x80) return -1L
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == 0x0b) {
        pendingSpace = true
      } else if (c < ' ' || c == 0x7f) {
        () // control: removed
      } else {
        if (pendingSpace && chars > 0) { spaces += 1; chars += 1 }
        pendingSpace = false
        chars += 1
      }
      i += 1
    }
    val tokens = if (chars == 0) 0 else spaces + 1
    (chars.toLong << 32) | tokens.toLong
  }

  /** True when the "</name" match at `k` is a real raw-text end tag: the
    * next char is '>', '/', or ASCII whitespace (or end of input — an
    * unterminated tag at EOF ends the raw-text region anyway).
    */
  private def isRawTextEndTag(s: String, k: Int, name: String, limit: Int): Boolean = {
    val after = k + 2 + name.length
    if (after >= limit) true
    else {
      val c = s.charAt(after)
      c == '>' || c == '/' || c == ' ' || c == '\t' || c == '\n' ||
        c == '\r' || c == '\f'
    }
  }

  private def indexOfIgnoreCase(s: String, needle: String, from: Int, limit: Int): Int = {
    val nl = needle.length
    var i = from
    while (i + nl <= limit) {
      var k = 0
      var ok = true
      while (k < nl && ok) {
        val a = s.charAt(i + k); val b = needle.charAt(k)
        val al = if (a >= 'A' && a <= 'Z') (a + 32).toChar else a
        if (al != b) ok = false
        k += 1
      }
      if (ok) return i
      i += 1
    }
    -1
  }
}
