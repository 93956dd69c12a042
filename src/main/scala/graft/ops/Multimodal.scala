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
  *  - VIDEO frame decode: still a documented stub ([[sampleFrames]] keeps
  *    the partition/batch shape) — the JDK carries no video codec and the
  *    container has no external ones; the call seam is swappable.
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

  /** Deterministic frame sampling of a (fake) video byte stream: every
    * `everyN`-th 1 KiB chunk is a "frame" — the partition/batch shape of
    * real frame sampling without a codec.
    */
  def sampleFrames(bytes: Array[Byte], everyN: Int): Seq[(Int, Long)] = {
    if (bytes == null || bytes.isEmpty) return Seq.empty
    val frames = bytes.grouped(1024).zipWithIndex.collect {
      case (chunk, idx) if idx % everyN == 0 =>
        var sum = 0L
        chunk.foreach(b => sum += (b & 0xff))
        (idx, sum)
    }
    frames.toSeq
  }
}
