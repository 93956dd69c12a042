package graft.html

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}
import java.nio.ByteBuffer

/** Charset sniffing + decode of raw page bytes to a UTF-16 String.
  *
  * Transplant of the reference's lossless representation converters
  * (formatConvert.cpp:38-109 opencv→leptonica and :111-219 back): a
  * deterministic, fully-specified change of representation at the pipeline
  * edge. Detection order is FIXED (byte-identity depends on it):
  *
  *   1. BOM: UTF-8 / UTF-16LE / UTF-16BE
  *   2. `<meta charset=...>` / `<meta http-equiv content="...charset=...">`
  *      within the first 1024 bytes (ASCII-superset scan)
  *   3. strict whole-input UTF-8 validation
  *   4. windows-1252 fallback (every byte decodes; WHATWG-style)
  *
  * Malformed sequences under a declared charset decode to U+FFFD (REPLACE) —
  * never throw per-row (reference throws on bad input, binarizeSauvola.cpp:38-41;
  * at 10^12 rows we quarantine instead, SURVEY.md §2.1).
  */
object Decode {

  final case class Decoded(text: String, charset: String)

  private val Win1252 = Charset.forName("windows-1252")

  /** Charset label normalization (subset of the WHATWG encoding registry that
    * our fixtures + common crawl pages realistically use). ISO-8859-1 is
    * treated as windows-1252 per WHATWG.
    */
  private def resolveLabel(label: String): Option[Charset] = {
    val l = label.trim.toLowerCase(java.util.Locale.ROOT)
    l match {
      case "utf-8" | "utf8" | "unicode-1-1-utf-8" => Some(StandardCharsets.UTF_8)
      case "iso-8859-1" | "latin1" | "latin-1" | "l1" | "iso8859-1" |
          "iso_8859-1" | "windows-1252" | "cp1252" | "x-cp1252" | "ascii" |
          "us-ascii" | "ansi_x3.4-1968" =>
        Some(Win1252)
      case "utf-16" | "utf-16le" => Some(StandardCharsets.UTF_16LE)
      case "utf-16be" => Some(StandardCharsets.UTF_16BE)
      case _ => None
    }
  }

  /** Scan the ASCII-visible prefix for a meta-declared charset — the WHATWG
    * encoding-sniffing prescan shape: comments are skipped, only real
    * `<meta` tags (not `<metadata`) are inspected, attributes are parsed
    * quote-aware, and a charset is taken from the `charset` attribute or —
    * only for `http-equiv=content-type` — from `charset=` inside the
    * `content` value. A bare `charset=` inside unrelated attribute text
    * (e.g. a description) is NOT a declaration. Deterministic: first match
    * wins, scan window = first 1024 bytes.
    */
  private[html] def sniffMeta(bytes: Array[Byte]): Option[String] = {
    val n = math.min(bytes.length, 1024)
    val sb = new java.lang.StringBuilder(n)
    var k = 0
    while (k < n) { sb.append((bytes(k) & 0xff).toChar); k += 1 }
    val prefix = sb.toString.toLowerCase(java.util.Locale.ROOT)
    val len = prefix.length

    var i = 0
    while (i < len) {
      val lt = prefix.indexOf('<', i)
      if (lt < 0) return None
      if (prefix.startsWith("<!--", lt)) {
        val end = prefix.indexOf("-->", lt + 4)
        i = if (end < 0) len else end + 3
      } else if (prefix.startsWith("<meta", lt) && lt + 5 < len &&
        (isWsChar(prefix.charAt(lt + 5)) || prefix.charAt(lt + 5) == '/')) {
        // parse attributes quote-aware up to '>'
        var j = lt + 5
        var charsetAttr: String = null
        var httpEquiv: String = null
        var contentAttr: String = null
        var done = false
        while (j < len && !done) {
          val c = prefix.charAt(j)
          if (c == '>') done = true
          else if (isWsChar(c) || c == '/') j += 1
          else {
            // attribute name
            val ns = j
            while (j < len && !isWsChar(prefix.charAt(j)) &&
              prefix.charAt(j) != '=' && prefix.charAt(j) != '>' &&
              prefix.charAt(j) != '/') j += 1
            val name = prefix.substring(ns, j)
            while (j < len && isWsChar(prefix.charAt(j))) j += 1
            var value = ""
            if (j < len && prefix.charAt(j) == '=') {
              j += 1
              while (j < len && isWsChar(prefix.charAt(j))) j += 1
              if (j < len && (prefix.charAt(j) == '"' || prefix.charAt(j) == '\'')) {
                val q = prefix.charAt(j)
                val vs = j + 1
                val ve = prefix.indexOf(q, vs)
                if (ve < 0) { value = prefix.substring(vs); j = len }
                else { value = prefix.substring(vs, ve); j = ve + 1 }
              } else {
                val vs = j
                while (j < len && !isWsChar(prefix.charAt(j)) && prefix.charAt(j) != '>') j += 1
                value = prefix.substring(vs, j)
              }
            }
            name match {
              case "charset" => if (charsetAttr == null) charsetAttr = value
              case "http-equiv" => if (httpEquiv == null) httpEquiv = value
              case "content" => if (contentAttr == null) contentAttr = value
              case _ => ()
            }
          }
        }
        if (!done) return None // meta tag truncated by the 1024-byte window
        val label =
          if (charsetAttr != null && charsetAttr.nonEmpty) charsetAttr.trim
          else if (httpEquiv == "content-type" && contentAttr != null) {
            val at = contentAttr.indexOf("charset=")
            if (at < 0) null
            else {
              var s = at + "charset=".length
              if (s < contentAttr.length &&
                (contentAttr.charAt(s) == '"' || contentAttr.charAt(s) == '\'')) s += 1
              var e = s
              while (e < contentAttr.length && isLabelChar(contentAttr.charAt(e))) e += 1
              if (e > s) contentAttr.substring(s, e) else null
            }
          } else null
        if (label != null && label.nonEmpty) return Some(label)
        i = j + 1
      } else i = lt + 1
    }
    None
  }

  @inline private def isWsChar(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  private def isLabelChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
      c == '-' || c == '_' || c == '.' || c == ':'

  /** Strict UTF-8 validation without decoding twice. */
  def isValidUtf8(bytes: Array[Byte]): Boolean = {
    var i = 0
    val n = bytes.length
    while (i < n) {
      val b = bytes(i) & 0xff
      if (b < 0x80) i += 1
      else if (b < 0xc2) return false // continuation or overlong lead
      else if (b < 0xe0) { // 2-byte
        if (i + 1 >= n || (bytes(i + 1) & 0xc0) != 0x80) return false
        i += 2
      } else if (b < 0xf0) { // 3-byte
        if (i + 2 >= n) return false
        val b1 = bytes(i + 1) & 0xff; val b2 = bytes(i + 2) & 0xff
        val lo = if (b == 0xe0) 0xa0 else 0x80
        val hi = if (b == 0xed) 0x9f else 0xbf // exclude surrogates
        if (b1 < lo || b1 > hi || (b2 & 0xc0) != 0x80) return false
        i += 3
      } else if (b < 0xf5) { // 4-byte
        if (i + 3 >= n) return false
        val b1 = bytes(i + 1) & 0xff
        val lo = if (b == 0xf0) 0x90 else 0x80
        val hi = if (b == 0xf4) 0x8f else 0xbf
        if (b1 < lo || b1 > hi) return false
        if ((bytes(i + 2) & 0xc0) != 0x80 || (bytes(i + 3) & 0xc0) != 0x80) return false
        i += 4
      } else return false
    }
    true
  }

  private def decodeWith(bytes: Array[Byte], offset: Int, cs: Charset): String =
    // the String constructor REPLACEs malformed input and unmappable chars
    // exactly like the previous explicit CharsetDecoder (JLS-specified), but
    // goes through the JDK's intrinsified decode loops — measurably faster
    // than CharsetDecoder + CharBuffer.toString, with one copy fewer
    new String(bytes, offset, bytes.length - offset, cs)

  /** Charset-decision prefix of [[apply]] exposed for the byte-level fast
    * path (ByteTokenizer): when the fixed detection order lands on UTF-8,
    * returns the content offset (BOM skip) and the label [[apply]] WOULD
    * produce for valid input — the caller still owes a validity check and
    * must fall back to [[apply]] when validation fails (REPLACE semantics)
    * or when another charset is chosen (returned null).
    */
  final class Utf8Plan(val offset: Int, val label: String)

  def utf8Plan(bytes: Array[Byte]): Utf8Plan = {
    if (bytes == null || bytes.isEmpty) return null
    if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xef &&
      (bytes(1) & 0xff) == 0xbb && (bytes(2) & 0xff) == 0xbf)
      return new Utf8Plan(3, "utf-8-bom")
    if (bytes.length >= 2 && ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xfe ||
      (bytes(0) & 0xff) == 0xfe && (bytes(1) & 0xff) == 0xff)) return null // UTF-16 BOMs
    sniffMeta(bytes).flatMap(resolveLabel) match {
      case Some(cs) =>
        // meta-declared UTF-16 remaps to UTF-8 (see apply), label "meta:utf-8"
        if (cs == StandardCharsets.UTF_8 || cs == StandardCharsets.UTF_16LE ||
          cs == StandardCharsets.UTF_16BE) new Utf8Plan(0, "meta:utf-8")
        else null // windows-1252 family: decoded path
      case None => new Utf8Plan(0, "utf-8") // label iff validation passes
    }
  }

  /** Decode page bytes; returns decoded text + the charset label chosen. */
  def apply(bytes: Array[Byte]): Decoded = {
    if (bytes == null || bytes.isEmpty) return Decoded("", "empty")
    // 1. BOM
    if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xef &&
      (bytes(1) & 0xff) == 0xbb && (bytes(2) & 0xff) == 0xbf)
      return Decoded(decodeWith(bytes, 3, StandardCharsets.UTF_8), "utf-8-bom")
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xfe)
      return Decoded(decodeWith(bytes, 2, StandardCharsets.UTF_16LE), "utf-16le-bom")
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xfe && (bytes(1) & 0xff) == 0xff)
      return Decoded(decodeWith(bytes, 2, StandardCharsets.UTF_16BE), "utf-16be-bom")
    // 2. meta-declared
    sniffMeta(bytes).flatMap(resolveLabel) match {
      case Some(cs0) =>
        // WHATWG: a meta-declared UTF-16 label is remapped to UTF-8 — the
        // prescan read the label through an ASCII-superset byte scan, which
        // proves the document is NOT UTF-16; decoding as UTF-16 would garble
        // the whole page
        val cs =
          if (cs0 == StandardCharsets.UTF_16LE || cs0 == StandardCharsets.UTF_16BE)
            StandardCharsets.UTF_8
          else cs0
        val label = if (cs eq Win1252) "windows-1252" else cs.name().toLowerCase(java.util.Locale.ROOT)
        return Decoded(decodeWith(bytes, 0, cs), s"meta:$label")
      case None => ()
    }
    // 3. UTF-8 validation
    if (isValidUtf8(bytes))
      return Decoded(new String(bytes, StandardCharsets.UTF_8), "utf-8")
    // 4. fallback
    Decoded(decodeWith(bytes, 0, Win1252), "windows-1252-fallback")
  }
}
