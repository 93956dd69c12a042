package graft.text

import java.text.Normalizer

/** Canonical text minimization — transplant of the thinning fixpoint
  * (thinZhangSuen.cpp:57-108: iterate sub-passes until `absdiff(prev) == 0`).
  * The contract we keep is the FIXPOINT: `canon(canon(x)) == canon(x)`
  * (property-tested). One pass reaches the fixpoint by construction, but the
  * pipeline asserts idempotence rather than assuming it.
  *
  * Spec (deterministic, locale-free):
  *  - Unicode NFC first (so composed/decomposed inputs canonicalize equally)
  *  - ZERO-WIDTH/STRIPPED: U+200B ZWSP, U+200C ZWNJ, U+200D ZWJ, U+FEFF,
  *    U+00AD soft hyphen, U+2060 word joiner -> removed
  *  - WHITESPACE: ASCII space, tab, LF, CR, FF, U+000B, U+0085, U+00A0 NBSP,
  *    U+1680, U+2000-U+200A, U+2028, U+2029, U+202F, U+205F, U+3000 -> runs
  *    collapse to one U+0020; leading/trailing run removed
  *  - other C0/C1 control chars -> removed
  */
object Canon {

  @inline def isStripped(c: Char): Boolean =
    c == 0x200b || c == 0x200c || c == 0x200d || c == 0xfeff ||
      c == 0x00ad || c == 0x2060

  @inline def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
      c == 0x000b || c == 0x0085 || c == 0x00a0 || c == 0x1680 ||
      (c >= 0x2000 && c <= 0x200a) || c == 0x2028 || c == 0x2029 ||
      c == 0x202f || c == 0x205f || c == 0x3000

  @inline def isControl(c: Char): Boolean =
    (c < ' ' && !isWs(c)) || c == 0x007f ||
      (c >= 0x0080 && c <= 0x009f && !isWs(c))

  /** Canonicalization to fixpoint. One pass is NFC + strip + collapse +
    * trim; stripping a zero-width char (ZWJ/soft-hyphen/...) between a base
    * char and a combining mark can leave a non-NFC sequence, so we loop
    * until the output is NFC-stable — the literal loop-until-`absdiff == 0`
    * contract of the thinning reference (thinZhangSuen.cpp:90-98). A
    * NFC-normalized pass output with no stripped/control chars and single
    * spaces is a fixpoint of `onePass` by construction, so the loop guard
    * only needs the NFC check.
    */
  def apply(s: String): String = {
    // zero-copy fast path: a printable-ASCII string with single interior
    // spaces and no leading/trailing space is canonical (and NFC) by
    // definition — the dominant case for block text, worth one cheap scan
    if (s != null && isCanonicalAscii(s)) return s
    var cur = onePass(s)
    var guard = 0
    while (guard < 8 && !(isAscii(cur) ||
        Normalizer.isNormalized(cur, Normalizer.Form.NFC))) {
      cur = onePass(cur)
      guard += 1
    }
    cur
  }

  /** True for printable-ASCII content already in canonical form (trimmed,
    * single spaces): `onePass` would return an equal string.
    */
  private def isCanonicalAscii(s: String): Boolean = {
    val n = s.length
    if (n == 0) return true
    if (s.charAt(0) == ' ' || s.charAt(n - 1) == ' ') return false
    var prevSpace = false
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == ' ') {
        if (prevSpace) return false
        prevSpace = true
      } else if (c > ' ' && c < 0x7f) {
        prevSpace = false
      } else return false
      i += 1
    }
    true
  }

  private def isAscii(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) >= 0x80) return false
      i += 1
    }
    true
  }

  /** One canonicalization pass (NFC + strip + collapse + trim). */
  private def onePass(s: String): String = {
    if (s == null || s.isEmpty) return ""
    val nfc =
      if (isAscii(s) || Normalizer.isNormalized(s, Normalizer.Form.NFC)) s
      else Normalizer.normalize(s, Normalizer.Form.NFC)
    val n = nfc.length
    val out = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val c = nfc.charAt(i)
      if (c > ' ' && c < 0x7f) { // printable ASCII: the dominant branch
        if (pendingSpace && out.length > 0) out.append(' ')
        pendingSpace = false
        out.append(c)
      } else if (isWs(c)) pendingSpace = true
      else if (isStripped(c) || isControl(c)) () // removed
      else {
        if (pendingSpace && out.length > 0) out.append(' ')
        pendingSpace = false
        out.append(c)
      }
      i += 1
    }
    out.toString
  }

  /** Alternative normalization profile — the Guo-Hall twin of the default
    * Zhang-Suen-profile [[apply]] (thinGuoHall.cpp:56-108: same driver,
    * different rules, same fixpoint contract). Reduces text to a bare
    * alphanumeric skeleton: ASCII-lowercase, non-[a-z0-9] chars become
    * spaces, runs collapse. Idempotent by construction; locale-free
    * (ASCII-only case fold, no Locale-sensitive toLowerCase).
    */
  def skeleton(s: String): String = {
    val c = apply(s)
    val out = new java.lang.StringBuilder(c.length)
    var pendingSpace = false
    var i = 0
    while (i < c.length) {
      val ch0 = c.charAt(i)
      val ch = if (ch0 >= 'A' && ch0 <= 'Z') (ch0 + 32).toChar else ch0
      if ((ch >= 'a' && ch <= 'z') || (ch >= '0' && ch <= '9')) {
        if (pendingSpace && out.length > 0) out.append(' ')
        pendingSpace = false
        out.append(ch)
      } else pendingSpace = true
      i += 1
    }
    out.toString
  }

  /** Token count under the canonical whitespace model. Canonical text has
    * single-space separators, so tokens = spaces + 1 (0 for empty).
    */
  def tokenCount(canonical: String): Int = {
    if (canonical.isEmpty) 0
    else {
      var spaces = 0
      var i = 0
      while (i < canonical.length) {
        if (canonical.charAt(i) == ' ') spaces += 1
        i += 1
      }
      spaces + 1
    }
  }
}
