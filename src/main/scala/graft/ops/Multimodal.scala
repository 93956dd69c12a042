package graft.ops

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata.
  *
  * Round-2 status of the decode paths:
  *  - container-header PARSING: real (PNG IHDR, JPEG SOF, WAV fmt — pure
  *    deterministic byte inspection, [[parseMeta]]);
  *  - IMAGE pixel decode: REAL — `javax.imageio` ships with the JDK (PNG /
  *    JPEG / GIF / BMP readers), no external libs needed ([[decodeImage]]);
  *  - AUDIO sample decode: REAL for WAV PCM16 (PCM is raw samples; the
  *    RIFF/fmt/data parse IS the codec, [[decodeWavPcm16]]);
  *  - VIDEO frame decode: REAL since round 3 for MJPEG-in-AVI (each `00dc`
  *    chunk is a complete JPEG → `ImageIO.read`) and DIB-in-AVI (`00db`
  *    chunks are raw bottom-up BGR24) — [[decodeAviFrames]]; no external
  *    codec needed because the frame payloads are formats the JDK decodes.
  */
object Multimodal {

  // ImageIO: headless, no disk-backed stream cache (Spark tasks are
  // parallel; the memory path is faster and avoids /tmp churn)
  locally {
    System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)
  }

  final case class MediaMeta(
      format: String, // png | jpeg | wav | unknown
      width: Int, // -1 when n/a
      height: Int,
      bytes: Long)

  private val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  @inline private def be32(b: Array[Byte], at: Int): Int =
    ((b(at) & 0xff) << 24) | ((b(at + 1) & 0xff) << 16) |
      ((b(at + 2) & 0xff) << 8) | (b(at + 3) & 0xff)
  @inline private def be16(b: Array[Byte], at: Int): Int =
    ((b(at) & 0xff) << 8) | (b(at + 1) & 0xff)

  /** Parse container metadata from magic bytes + header. Real parsing,
    * never throws (unknown on any malformation).
    */
  def parseMeta(bytes: Array[Byte]): MediaMeta = {
    if (bytes == null) return MediaMeta("unknown", -1, -1, 0L)
    val n = bytes.length
    // PNG: signature + IHDR (always first chunk): w/h at offsets 16/20
    if (n >= 24 && bytes.take(8).sameElements(pngSig))
      return MediaMeta("png", be32(bytes, 16), be32(bytes, 20), n.toLong)
    // JPEG: FFD8, scan markers for SOF0/SOF2 (dims at +5 height, +7 width)
    if (n >= 4 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 9 < n) {
        if ((bytes(i) & 0xff) != 0xff) return MediaMeta("jpeg", -1, -1, n.toLong)
        val marker = bytes(i + 1) & 0xff
        if (marker == 0xc0 || marker == 0xc2)
          return MediaMeta("jpeg", be16(bytes, i + 7), be16(bytes, i + 5), n.toLong)
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) i += 2
        else i += 2 + be16(bytes, i + 2)
      }
      return MediaMeta("jpeg", -1, -1, n.toLong)
    }
    // WAV: RIFF....WAVE
    if (n >= 12 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' &&
      bytes(11) == 'E')
      return MediaMeta("wav", -1, -1, n.toLong)
    // AVI: RIFF....AVI ; dims from the avih main header when findable
    if (n >= 12 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I' &&
      bytes(11) == ' ') {
      // avih lives in LIST hdrl, the first list after the RIFF header in a
      // well-formed file: LIST(12) len kind(4) avih(4) len(4) body
      var i = 12
      var w = -1; var h = -1
      var guard = 0
      while (i + 8 <= n && guard < 64 && w < 0) {
        val len = le32of(bytes, i + 4)
        if (len < 0 || i + 8 + len > n) return MediaMeta("avi", -1, -1, n.toLong)
        if (bytes(i) == 'L' && bytes(i + 1) == 'I' && bytes(i + 2) == 'S' &&
          bytes(i + 3) == 'T' && len >= 4) i += 12 // descend
        else if (bytes(i) == 'a' && bytes(i + 1) == 'v' && bytes(i + 2) == 'i' &&
          bytes(i + 3) == 'h' && len >= 40) {
          w = le32of(bytes, i + 8 + 32); h = le32of(bytes, i + 8 + 36)
        } else i += 8 + len + (len & 1)
        guard += 1
      }
      return MediaMeta("avi", w, h, n.toLong)
    }
    MediaMeta("unknown", -1, -1, n.toLong)
  }

  /** Deterministic synthetic PNG container (valid signature + IHDR layout;
    * payload is a seeded byte pattern, NOT a valid zlib stream — this is a
    * fixture generator for the metadata path, mirroring how the reference
    * ships curated image fixtures).
    */
  def fakePng(seed: Long, width: Int, height: Int, payloadBytes: Int): Array[Byte] = {
    val out = new Array[Byte](8 + 25 + payloadBytes)
    System.arraycopy(pngSig, 0, out, 0, 8)
    // IHDR: len(13) type w h bitdepth colortype ... (crc faked)
    out(11) = 13
    out(12) = 'I'; out(13) = 'H'; out(14) = 'D'; out(15) = 'R'
    out(16) = (width >>> 24).toByte; out(17) = (width >>> 16).toByte
    out(18) = (width >>> 8).toByte; out(19) = width.toByte
    out(20) = (height >>> 24).toByte; out(21) = (height >>> 16).toByte
    out(22) = (height >>> 8).toByte; out(23) = height.toByte
    out(24) = 8; out(25) = 2 // 8-bit RGB
    var i = 0
    var s = seed
    while (i < payloadBytes) {
      s = s * 6364136223846793005L + 1442695040888963407L
      out(33 + i) = (s >>> 56).toByte
      i += 1
    }
    out
  }

  // ------------------------------------------------------ real image codec

  final case class ImagePixels(width: Int, height: Int, argb: Array[Int])

  /** REAL pixel decode via the JDK's own codecs (PNG/JPEG/GIF/BMP).
    * Never throws; None on undecodable bytes.
    */
  def decodeImage(bytes: Array[Byte]): Option[ImagePixels] = {
    if (bytes == null || bytes.length == 0) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        Some(ImagePixels(w, h, img.getRGB(0, 0, w, h, null, 0, w)))
      }
    } catch { case _: Throwable => None }
  }

  /** Deterministic VALID PNG from a pixel function (fixture encoder). */
  def encodePng(width: Int, height: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb(x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Per-channel pixel sums from REAL decoded pixels (feature primitive;
    * integer math so an independent oracle can reproduce it exactly).
    */
  def channelSums(p: ImagePixels): (Long, Long, Long) = {
    var r = 0L; var g = 0L; var b = 0L
    var i = 0
    while (i < p.argb.length) {
      val v = p.argb(i)
      r += (v >>> 16) & 0xff
      g += (v >>> 8) & 0xff
      b += v & 0xff
      i += 1
    }
    (r, g, b)
  }

  /** REAL image resize (JDK Graphics2D, bilinear) — decode → resize →
    * re-extract pixels; the feature-pipeline shape for thumbnail/embedding
    * preprocessing. None on undecodable input.
    */
  def resizeImage(bytes: Array[Byte], w: Int, h: Int): Option[ImagePixels] =
    decodeImage(bytes).map { src =>
      val img = new java.awt.image.BufferedImage(
        src.width, src.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, src.width, src.height, src.argb, 0, src.width)
      val out = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      ImagePixels(w, h, out.getRGB(0, 0, w, h, null, 0, w))
    }

  // ------------------------------------------------------ real audio codec

  final case class WavPcm(sampleRate: Int, channels: Int, samples: Array[Short])

  /** REAL WAV PCM16 decode (RIFF/fmt/data walk; PCM is raw little-endian
    * samples). Never throws; None for non-PCM16 or malformed containers.
    */
  def decodeWavPcm16(bytes: Array[Byte]): Option[WavPcm] = {
    if (bytes == null || bytes.length < 44) return None
    if (parseMeta(bytes).format != "wav") return None
    @inline def le16(at: Int) = (bytes(at) & 0xff) | ((bytes(at + 1) & 0xff) << 8)
    @inline def le32(at: Int) = (bytes(at) & 0xff) | ((bytes(at + 1) & 0xff) << 8) |
      ((bytes(at + 2) & 0xff) << 16) | ((bytes(at + 3) & 0xff) << 24)
    var i = 12
    var rate = -1
    var ch = -1
    var bits = -1
    var samples: Array[Short] = null
    while (i + 8 <= bytes.length) {
      val id = new String(bytes, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val len = le32(i + 4)
      if (len < 0 || i + 8 + len > bytes.length) return None
      id match {
        case "fmt " if len >= 16 =>
          val audioFormat = le16(i + 8)
          ch = le16(i + 10)
          rate = le32(i + 12)
          bits = le16(i + 22)
          if (audioFormat != 1 || bits != 16 || ch < 1) return None
        case "data" =>
          val n = len / 2
          val out = new Array[Short](n)
          var k = 0
          while (k < n) { out(k) = le16(i + 8 + 2 * k).toShort; k += 1 }
          samples = out
        case _ => ()
      }
      i += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (rate > 0 && samples != null) Some(WavPcm(rate, ch, samples)) else None
  }

  /** Deterministic VALID WAV PCM16 mono container (fixture encoder). */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("ASCII"))
    out.put("fmt ".getBytes("ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits
    out.put("data".getBytes("ASCII")).putInt(dataLen)
    samples.foreach(out.putShort)
    out.array()
  }

  /** Audio feature primitives over REAL decoded samples (integer math). */
  def audioStats(w: WavPcm): (Long, Long, Long) = {
    var sumAbs = 0L
    var peak = 0L
    var crossings = 0L
    var i = 0
    while (i < w.samples.length) {
      val s = w.samples(i).toLong
      val a = math.abs(s)
      sumAbs += a
      if (a > peak) peak = a
      if (i > 0 && ((s >= 0) != (w.samples(i - 1) >= 0))) crossings += 1
      i += 1
    }
    (sumAbs, peak, crossings)
  }

  // ------------------------------------------------------ real video codec

  /** Per-sampled-frame decoded stats (integer channel sums — oracle-exact
    * for DIB frames, deterministic for MJPEG frames).
    */
  final case class FrameStats(frameIdx: Int, width: Int, height: Int,
      sumR: Long, sumG: Long, sumB: Long)

  @inline private def le32of(b: Array[Byte], at: Int): Int =
    (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8) |
      ((b(at + 2) & 0xff) << 16) | ((b(at + 3) & 0xff) << 24)

  private def riffChunk(id: String, body: Array[Byte]): Array[Byte] = {
    val pad = body.length & 1
    val bb = java.nio.ByteBuffer.allocate(8 + body.length + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(id.getBytes("ASCII")).putInt(body.length).put(body)
    bb.array()
  }
  private def riffList(kind: String, parts: Array[Byte]*): Array[Byte] =
    riffChunk("LIST", kind.getBytes("ASCII") ++ parts.flatten)

  /** Encode frames (row-major ARGB pixel arrays) into a minimal VALID AVI
    * container — `codec = "mjpeg"` writes `00dc` chunks each holding a full
    * ImageIO-encoded JPEG (the classic MJPEG-in-AVI layout); `codec = "dib"`
    * writes `00db` chunks holding uncompressed bottom-up BGR24 rows padded
    * to 4 bytes (BI_RGB). Deterministic fixture encoder for the REAL
    * [[decodeAviFrames]] path (reference analogue: formatConvert's multi-bpp
    * container walk, formatConvert.cpp:38-109).
    */
  def encodeAviVideo(width: Int, height: Int, fps: Int,
      frames: Seq[Array[Int]], codec: String,
      dibTopDown: Boolean = false, zeroAvihDims: Boolean = false): Array[Byte] = {
    require(codec == "mjpeg" || codec == "dib", s"codec=$codec")
    def jpegFrame(argb: Array[Int]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, width, height, argb, 0, width)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def dibFrame(argb: Array[Int]): Array[Byte] = {
      val rowBytes = (width * 3 + 3) & ~3
      val out = new Array[Byte](rowBytes * height)
      var y = 0
      while (y < height) {
        // biHeight > 0 → bottom-up storage; biHeight < 0 → top-down
        val srcRow = if (dibTopDown) y else height - 1 - y
        var x = 0
        while (x < width) {
          val v = argb(srcRow * width + x)
          out(y * rowBytes + x * 3) = (v & 0xff).toByte
          out(y * rowBytes + x * 3 + 1) = ((v >>> 8) & 0xff).toByte
          out(y * rowBytes + x * 3 + 2) = ((v >>> 16) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      out
    }
    val mjpeg = codec == "mjpeg"
    val frameChunks = frames.map { f =>
      riffChunk(if (mjpeg) "00dc" else "00db",
        if (mjpeg) jpegFrame(f) else dibFrame(f))
    }
    def le(ints: Int*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 * ints.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      ints.foreach(bb.putInt)
      bb.array()
    }
    val maxFrame = frameChunks.map(_.length).maxOption.getOrElse(0)
    val avih = riffChunk("avih", le(
      1000000 / math.max(1, fps), 0, 0, 0x10 /*HASINDEX off, keep 0x10=WASCAPTUREFILE-ish flags minimal*/,
      frames.length, 0, 1, maxFrame,
      if (zeroAvihDims) 0 else width, if (zeroAvihDims) 0 else height,
      0, 0, 0, 0))
    val handler = if (mjpeg) "MJPG" else "DIB "
    val strh = riffChunk("strh",
      "vids".getBytes("ASCII") ++ handler.getBytes("ASCII") ++
        le(0, 0, 0, 1 /*scale*/, math.max(1, fps) /*rate*/, 0,
          frames.length, maxFrame, -1 /*quality*/, 0) ++
        le(0, 0) /*rcFrame as two dwords (4 shorts)*/)
    val biCompression = if (mjpeg) fourccLe("MJPG") else 0
    val strf = riffChunk("strf", le(
      40, width, if (dibTopDown) -height else height,
      1 | (24 << 16) /*biPlanes=1, biBitCount=24*/,
      biCompression, ((width * 3 + 3) & ~3) * height, 0, 0, 0, 0))
    val hdrl = riffList("hdrl", avih, riffList("strl", strh, strf))
    val movi = riffList("movi", frameChunks: _*)
    val body = "AVI ".getBytes("ASCII") ++ hdrl ++ movi
    val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ASCII")).putInt(body.length).put(body)
    bb.array()
  }

  @inline private def fourccLe(s: String): Int =
    (s.charAt(0) & 0xff) | ((s.charAt(1) & 0xff) << 8) |
      ((s.charAt(2) & 0xff) << 16) | ((s.charAt(3) & 0xff) << 24)

  /** REAL video frame decode + sampling: RIFF walk (the same chunk
    * discipline as [[decodeWavPcm16]]) → recurse into LISTs → count `NNdc`/
    * `NNdb` video chunks as frames → every `everyN`-th frame is DECODED —
    * `dc` chunks via `ImageIO.read` (MJPEG = one full JPEG per chunk), `db`
    * chunks as uncompressed bottom-up BGR24 DIB rows — and reduced to
    * integer channel sums. Never throws; empty/partial on malformation.
    * Replaces the round-2 stub: no JDK *codec* is needed because MJPEG
    * frames ARE JPEGs and DIB frames ARE raw pixels; the container walk is
    * the video-specific part.
    */
  def decodeAviFrames(bytes: Array[Byte], everyN: Int): Seq[FrameStats] = {
    if (bytes == null || bytes.length < 12 || everyN < 1) return Seq.empty
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I' && bytes(11) == ' '))
      return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[FrameStats]
    // Dims come from the video stream's strf BITMAPINFOHEADER when present
    // (the authoritative source — biHeight < 0 means TOP-DOWN rows); the avih
    // main header is only a fallback for files missing strf (ADVICE r3:
    // avih-first sizing skipped AVIs with zeroed avih dims and mis-ordered
    // top-down DIBs).
    var avihW = -1; var avihH = -1        // fallback dims
    var strfW = 0; var strfH = 0          // authoritative when strfW>0; strfH keeps sign
    var inVideoStrl = false               // last strh seen was fccType "vids"
    var frameIdx = 0
    @inline def isDigit(c: Byte) = c >= '0' && c <= '9'
    def decodeDib(at: Int, len: Int): Option[FrameStats] = {
      val haveStrf = strfW > 0 && strfH != 0
      val topDown = haveStrf && strfH < 0
      val w = if (haveStrf) strfW else avihW
      val h = if (haveStrf) math.abs(strfH) else avihH
      // dim sanity first: rowBytes itself (w*3) must not wrap either
      if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20)) return None
      val rowBytes = (w * 3 + 3) & ~3
      // long product: malformed strf dims (now authoritative) must not wrap
      // the 32-bit multiply negative and bypass the size guard
      if (len.toLong < rowBytes.toLong * h) return None
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < h) {
        // biHeight > 0 → rows stored bottom-up; biHeight < 0 → top-down
        val srcRow = if (topDown) y else h - 1 - y
        val row = at + srcRow * rowBytes
        var x = 0
        while (x < w) {
          sb += bytes(row + x * 3) & 0xff
          sg += bytes(row + x * 3 + 1) & 0xff
          sr += bytes(row + x * 3 + 2) & 0xff
          x += 1
        }
        y += 1
      }
      Some(FrameStats(frameIdx, w, h, sr, sg, sb))
    }
    def decodeJpeg(at: Int, len: Int): Option[FrameStats] = {
      val sub = java.util.Arrays.copyOfRange(bytes, at, at + len)
      decodeImage(sub).map { px =>
        val (sr, sg, sb) = channelSums(px)
        FrameStats(frameIdx, px.width, px.height, sr, sg, sb)
      }
    }
    def scan(lo: Int, hi: Int): Unit = {
      var i = lo
      while (i + 8 <= hi) {
        val len = le32of(bytes, i + 4)
        if (len < 0 || i + 8 + len > hi) return // malformed: stop cleanly
        val c0 = bytes(i); val c1 = bytes(i + 1)
        val c2 = bytes(i + 2); val c3 = bytes(i + 3)
        if (c0 == 'L' && c1 == 'I' && c2 == 'S' && c3 == 'T' && len >= 4)
          scan(i + 12, i + 8 + len)
        else if (c0 == 'a' && c1 == 'v' && c2 == 'i' && c3 == 'h' && len >= 40) {
          avihW = le32of(bytes, i + 8 + 32)
          avihH = le32of(bytes, i + 8 + 36)
        } else if (c0 == 's' && c1 == 't' && c2 == 'r' && c3 == 'h' && len >= 4) {
          // stream header: fccType is the first 4 body bytes
          inVideoStrl = bytes(i + 8) == 'v' && bytes(i + 9) == 'i' &&
            bytes(i + 10) == 'd' && bytes(i + 11) == 's'
        } else if (c0 == 's' && c1 == 't' && c2 == 'r' && c3 == 'f' &&
          len >= 12 && inVideoStrl && strfW == 0) {
          // BITMAPINFOHEADER: biSize, biWidth, biHeight (signed), ...
          // Latched on the FIRST video stream only (ADVICE r4): in a
          // multi-video-stream AVI a later stream's strf must not override
          // the dims the 00db/00dc frames (stream 0) are decoded with.
          strfW = le32of(bytes, i + 8 + 4)
          strfH = le32of(bytes, i + 8 + 8)
        } else if (isDigit(c0) && isDigit(c1) &&
          ((c2 == 'd' && (c3 == 'c' || c3 == 'b')))) {
          if (frameIdx % everyN == 0) {
            val fs = if (c3 == 'b') decodeDib(i + 8, len) else decodeJpeg(i + 8, len)
            fs.foreach(out += _)
          }
          frameIdx += 1
        }
        i += 8 + len + (len & 1)
      }
    }
    try scan(12, bytes.length)
    catch { case scala.util.control.NonFatal(_) => () }
    out.toSeq
  }

  /** STUB — byte-histogram pixel summary kept as the swappable-codec seam
    * demo (and the legacy q_multimodal oracle); [[decodeImage]] is the real
    * path for images.
    */
  def decodePixelsStub(bytes: Array[Byte]): Array[Float] = {
    val meta = parseMeta(bytes)
    if (meta.format == "unknown" || meta.width <= 0) return Array.empty
    // deterministic "feature vector" from byte histogram — stands in for a
    // pooled embedding; REPLACE with a real decoder on a cluster
    val hist = new Array[Float](16)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1f; i += 1 }
    val n = math.max(1, bytes.length).toFloat
    hist.map(_ / n)
  }

}
