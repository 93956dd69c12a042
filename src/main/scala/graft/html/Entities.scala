package graft.html

/** HTML entity decoding — part of the photometric-normalization transplant
  * (reference gammaCorrection.cpp:52-106: a fixed LUT applied per value; here
  * a fixed entity table applied per reference). The table is FROZEN: adding
  * entities later changes goldens, so the supported set is spelled out.
  *
  * Rules (deterministic):
  *  - `&name;` with name in TABLE        → replacement
  *  - `&#DDD;` / `&#xHH;` numeric        → code point; out-of-range / surrogate
  *    / zero → U+FFFD; C1 range 0x80-0x9F remapped per WHATWG (windows-1252)
  *  - anything else (unknown name, missing `;`) → literal text, untouched
  */
object Entities {

  /** Common named entities (HTML4 core + frequent HTML5 names). */
  val table: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> "\u00a0", "shy" -> "\u00ad",
    "copy" -> "©", "reg" -> "®", "trade" -> "™",
    "deg" -> "°", "plusmn" -> "±", "para" -> "¶",
    "middot" -> "·", "frac12" -> "½", "frac14" -> "¼",
    "frac34" -> "¾", "sup1" -> "¹", "sup2" -> "²",
    "sup3" -> "³", "micro" -> "µ", "sect" -> "§",
    "cent" -> "¢", "pound" -> "£", "yen" -> "¥",
    "euro" -> "€", "curren" -> "¤",
    "laquo" -> "«", "raquo" -> "»",
    "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”",
    "sbquo" -> "‚", "bdquo" -> "„",
    "ndash" -> "–", "mdash" -> "—",
    "hellip" -> "…", "bull" -> "•", "dagger" -> "†",
    "Dagger" -> "‡", "permil" -> "‰", "prime" -> "′",
    "Prime" -> "″", "lsaquo" -> "‹", "rsaquo" -> "›",
    "oline" -> "‾", "frasl" -> "⁄",
    "times" -> "×", "divide" -> "÷", "minus" -> "−",
    "not" -> "¬", "iexcl" -> "¡", "iquest" -> "¿",
    "szlig" -> "ß", "agrave" -> "à", "aacute" -> "á",
    "acirc" -> "â", "atilde" -> "ã", "auml" -> "ä",
    "aring" -> "å", "aelig" -> "æ", "ccedil" -> "ç",
    "egrave" -> "è", "eacute" -> "é", "ecirc" -> "ê",
    "euml" -> "ë", "igrave" -> "ì", "iacute" -> "í",
    "icirc" -> "î", "iuml" -> "ï", "ntilde" -> "ñ",
    "ograve" -> "ò", "oacute" -> "ó", "ocirc" -> "ô",
    "otilde" -> "õ", "ouml" -> "ö", "oslash" -> "ø",
    "ugrave" -> "ù", "uacute" -> "ú", "ucirc" -> "û",
    "uuml" -> "ü", "yacute" -> "ý", "yuml" -> "ÿ",
    "Agrave" -> "À", "Aacute" -> "Á", "Auml" -> "Ä",
    "Eacute" -> "É", "Ouml" -> "Ö", "Uuml" -> "Ü",
    "alpha" -> "α", "beta" -> "β", "gamma" -> "γ",
    "delta" -> "δ", "pi" -> "π", "sigma" -> "σ",
    "omega" -> "ω", "infin" -> "∞", "ne" -> "≠",
    "le" -> "≤", "ge" -> "≥", "larr" -> "←",
    "uarr" -> "↑", "rarr" -> "→", "darr" -> "↓",
    "harr" -> "↔", "spades" -> "♠", "clubs" -> "♣",
    "hearts" -> "♥", "diams" -> "♦",
    "ensp" -> "\u2002", "emsp" -> "\u2003", "thinsp" -> "\u2009",
    "zwnj" -> "\u200c", "zwj" -> "\u200d"
  )

  /** WHATWG numeric-reference remap for 0x80-0x9F (windows-1252 glyphs). */
  private val c1Remap: Map[Int, Int] = Map(
    0x80 -> 0x20ac, 0x82 -> 0x201a, 0x83 -> 0x0192, 0x84 -> 0x201e,
    0x85 -> 0x2026, 0x86 -> 0x2020, 0x87 -> 0x2021, 0x88 -> 0x02c6,
    0x89 -> 0x2030, 0x8a -> 0x0160, 0x8b -> 0x2039, 0x8c -> 0x0152,
    0x8e -> 0x017d, 0x91 -> 0x2018, 0x92 -> 0x2019, 0x93 -> 0x201c,
    0x94 -> 0x201d, 0x95 -> 0x2022, 0x96 -> 0x2013, 0x97 -> 0x2014,
    0x98 -> 0x02dc, 0x99 -> 0x2122, 0x9a -> 0x0161, 0x9b -> 0x203a,
    0x9c -> 0x0153, 0x9e -> 0x017e, 0x9f -> 0x0178
  )

  /** 7-bit-packed name → replacement: named-reference lookup with zero
    * allocation (no subSequence/toString/boxed Map.get on the tokenizer's
    * hot path). Names are case-sensitive ASCII; every table name is ≤ 6
    * chars so ≤ 9 chars (63 bits) covers the table — longer candidate
    * names cannot match and return null directly.
    */
  private val packedTable: scala.collection.mutable.LongMap[String] = {
    val m = scala.collection.mutable.LongMap.empty[String]
    table.foreach { case (k, v) =>
      require(k.length <= 9, s"entity name too long for packed table: $k")
      var code = 0L
      var i = 0
      while (i < k.length) { code = (code << 7) | k.charAt(i).toLong; i += 1 }
      m(code) = v
    }
    m
  }

  def numericToString(cp0: Int): String = {
    val cp = c1Remap.getOrElse(cp0, cp0)
    if (cp <= 0 || cp > 0x10ffff || (cp >= 0xd800 && cp <= 0xdfff)) "�"
    else new String(Character.toChars(cp))
  }

  /** Try to decode an entity starting at `src(at) == '&'`; scanning never
    * looks past `limit` (the tokenizer's cost cap — a reference straddling
    * the cap must not read beyond it).
    * Returns (replacement, charsConsumed) or null if not a valid reference.
    */
  def tryDecode(src: CharSequence, at: Int, limit: Int = Int.MaxValue): (String, Int) = {
    val n = math.min(src.length, limit)
    if (at + 1 >= n) return null
    var i = at + 1
    if (src.charAt(i) == '#') {
      i += 1
      if (i >= n) return null
      val hex = src.charAt(i) == 'x' || src.charAt(i) == 'X'
      if (hex) i += 1
      val digitsStart = i
      // consume ALL digits (WHATWG) with saturation: zero-padded valid refs
      // decode normally, overlong values saturate out-of-range -> U+FFFD
      var cp = 0L
      while (i < n && isDigit(src.charAt(i), hex)) {
        if (cp <= 0x10ffff) {
          val d = Character.digit(src.charAt(i), if (hex) 16 else 10)
          cp = cp * (if (hex) 16 else 10) + d
        }
        i += 1
      }
      if (i == digitsStart || i >= n || src.charAt(i) != ';') return null
      (numericToString(math.min(cp, 0x110000L).toInt), i + 1 - at)
    } else {
      val nameStart = i
      var code = 0L
      while (i < n && i - nameStart < 32 && isNameChar(src.charAt(i))) {
        if (i - nameStart < 9) code = (code << 7) | src.charAt(i).toLong
        i += 1
      }
      if (i == nameStart || i >= n || src.charAt(i) != ';') return null
      if (i - nameStart > 9) return null // no table name is that long
      val rep = packedTable.getOrNull(code)
      if (rep == null) null else (rep, i + 1 - at)
    }
  }

  private def isDigit(c: Char, hex: Boolean): Boolean =
    (c >= '0' && c <= '9') ||
      (hex && ((c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')))

  private def isNameChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')
}
