package graft.ops

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata. Container-header PARSING is real (PNG IHDR, JPEG SOF,
  * WAV fmt — pure deterministic byte inspection); pixel/sample DECODE is a
  * clearly-marked STUB (no image/audio libs in this container) behind the
  * same API, so the Spark-side plumbing — schema, batch shape, partitioning
  * — is real and tested while the codec call is swappable.
  */
object Multimodal {

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

  /** STUB — pixel decode. The container has no imaging libs; a real
    * deployment swaps this for an ImageIO/opencv call. The stub returns a
    * deterministic per-pixel-summary so downstream feature plumbing
    * (schema, batching) is exercised honestly.
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
