package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal
import graft.text.Canon

class MultimodalSpec extends AnyFunSuite {
  test("fake png roundtrip: header parse recovers dimensions") {
    val png = Multimodal.fakePng(seed = 7, width = 640, height = 480, payloadBytes = 100)
    val m = Multimodal.parseMeta(png)
    assert(m.format == "png" && m.width == 640 && m.height == 480)
    assert(m.bytes == png.length)
  }
  test("jpeg SOF0 header parsed") {
    // minimal jpeg: SOI + APP0(len4) + SOF0 with h=0x0100 w=0x0200
    val b = Array[Int](0xff, 0xd8, 0xff, 0xe0, 0x00, 0x04, 0x00, 0x00,
      0xff, 0xc0, 0x00, 0x0b, 0x08, 0x01, 0x00, 0x02, 0x00, 0x03, 0, 0, 0)
      .map(_.toByte)
    val m = Multimodal.parseMeta(b)
    assert(m.format == "jpeg" && m.width == 512 && m.height == 256)
  }
  test("wav and unknown formats") {
    val wav = "RIFF0000WAVEfmt ".getBytes("ASCII")
    assert(Multimodal.parseMeta(wav).format == "wav")
    assert(Multimodal.parseMeta("plain text".getBytes).format == "unknown")
    assert(Multimodal.parseMeta(null).format == "unknown")
    assert(Multimodal.parseMeta(Array.emptyByteArray).format == "unknown")
  }
  test("REAL png codec: pixel-exact roundtrip via JDK ImageIO") {
    val png = Multimodal.encodePng(16, 9) { (x, y) =>
      (((x * 7 + y * 13) % 256) << 16) | (((x * 3 + y * 5) % 256) << 8) | ((x + y) % 256)
    }
    assert(Multimodal.parseMeta(png).format == "png")
    val px = Multimodal.decodeImage(png).get
    assert(px.width == 16 && px.height == 9)
    // spot-check exact pixels (PNG is lossless)
    assert((px.argb(0) & 0xffffff) == 0)
    val v = px.argb(8 * 16 + 15) // x=15, y=8
    assert(((v >>> 16) & 0xff) == (15 * 7 + 8 * 13) % 256)
    assert(((v >>> 8) & 0xff) == (15 * 3 + 8 * 5) % 256)
    assert((v & 0xff) == (15 + 8) % 256)
    val (sr, sg, sb) = Multimodal.channelSums(px)
    // independent double-entry: recompute the sums from the pattern
    var er = 0L; var eg = 0L; var eb = 0L
    for (y <- 0 until 9; x <- 0 until 16) {
      er += (x * 7 + y * 13) % 256; eg += (x * 3 + y * 5) % 256; eb += (x + y) % 256
    }
    assert((sr, sg, sb) == ((er, eg, eb)))
  }
  test("REAL image decode handles jpeg too; garbage returns None") {
    val img = new java.awt.image.BufferedImage(12, 7, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val px = Multimodal.decodeImage(bos.toByteArray).get
    assert(px.width == 12 && px.height == 7)
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
    assert(Multimodal.decodeImage(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeImage(null).isEmpty)
  }
  test("REAL image resize: uniform image stays uniform at the new dims") {
    val png = Multimodal.encodePng(32, 16)((_, _) => 0x406080)
    val r = Multimodal.resizeImage(png, 8, 4).get
    assert(r.width == 8 && r.height == 4)
    assert(r.argb.forall(v => (v & 0xffffff) == 0x406080))
    assert(Multimodal.resizeImage("junk".getBytes, 8, 4).isEmpty)
  }
  test("REAL wav pcm16 codec: sample-exact roundtrip + stats") {
    val samples = Array.tabulate[Short](500)(i => ((i * 31) % 2003 - 1001).toShort)
    val wav = Multimodal.encodeWavPcm16(16000, samples)
    assert(Multimodal.parseMeta(wav).format == "wav")
    val dec = Multimodal.decodeWavPcm16(wav).get
    assert(dec.sampleRate == 16000 && dec.channels == 1)
    assert(dec.samples.toSeq == samples.toSeq)
    val (sumAbs, peak, crossings) = Multimodal.audioStats(dec)
    assert(sumAbs == samples.map(s => math.abs(s.toLong)).sum)
    assert(peak == samples.map(s => math.abs(s.toInt)).max)
    assert(crossings > 0)
    // non-PCM / malformed → None
    assert(Multimodal.decodeWavPcm16("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(Multimodal.decodeWavPcm16(Array.emptyByteArray).isEmpty)
  }
  test("pixel stub is deterministic and shaped") {
    val png = Multimodal.fakePng(3, 10, 10, 64)
    val a = Multimodal.decodePixelsStub(png)
    val b = Multimodal.decodePixelsStub(png)
    assert(a.toSeq == b.toSeq && a.length == 16)
    assert(math.abs(a.sum - 1.0f) < 1e-3)
  }
  test("AVI-DIB round trip is closed-form exact (container walk + raw frames)") {
    val w = 11; val h = 5 // odd width exercises the 4-byte DIB row padding
    def frame(f: Int) = Array.tabulate(w * h) { k =>
      val x = k % w; val y = k / w
      (((x * 7 + y * 13 + f * 17) % 256) << 16) |
        (((x * 3 + y * 5 + f * 11) % 256) << 8) | ((x + y + f * 7) % 256)
    }
    val frames = (0 until 7).map(frame)
    val avi = Multimodal.encodeAviVideo(w, h, 10, frames, codec = "dib")
    val meta = Multimodal.parseMeta(avi)
    assert(meta.format == "avi" && meta.width == w && meta.height == h)
    val fs = Multimodal.decodeAviFrames(avi, everyN = 3)
    assert(fs.map(_.frameIdx) == Seq(0, 3, 6), "every 3rd frame sampled")
    fs.foreach { s =>
      val px = frame(s.frameIdx)
      assert(s.width == w && s.height == h)
      assert(s.sumR == px.map(v => ((v >>> 16) & 0xff).toLong).sum)
      assert(s.sumG == px.map(v => ((v >>> 8) & 0xff).toLong).sum)
      assert(s.sumB == px.map(v => (v & 0xff).toLong).sum)
    }
  }
  test("AVI-MJPEG frames decode via ImageIO (real JPEG per 00dc chunk)") {
    val w = 16; val h = 8
    // solid-color frames: JPEG's DCT of a constant block is DC-only, so the
    // decode is near-exact — assert tight tolerance, not byte-identity
    def solid(f: Int) = Array.fill(w * h)((100 << 16) | ((50 + f * 20) << 8) | 200)
    val frames = (0 until 4).map(solid)
    val avi = Multimodal.encodeAviVideo(w, h, 10, frames, codec = "mjpeg")
    val fs = Multimodal.decodeAviFrames(avi, everyN = 1)
    assert(fs.map(_.frameIdx) == Seq(0, 1, 2, 3))
    fs.foreach { s =>
      assert(s.width == w && s.height == h)
      val n = (w * h).toLong
      assert(math.abs(s.sumR - 100 * n) <= 3 * n, s"r=${s.sumR}")
      assert(math.abs(s.sumG - (50 + s.frameIdx * 20) * n) <= 3 * n, s"g=${s.sumG}")
      assert(math.abs(s.sumB - 200 * n) <= 3 * n, s"b=${s.sumB}")
    }
    // and the MJPEG chunk decode IS ImageIO's: identical to decoding the
    // same JPEG bytes directly
    val direct = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, w, h, solid(0), 0, w)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      val px = Multimodal.decodeImage(bos.toByteArray).get
      Multimodal.channelSums(px)
    }
    assert((fs(0).sumR, fs(0).sumG, fs(0).sumB) == direct)
  }
  test("AVI-DIB dims come from strf, not avih: zeroed-avih + top-down (negative biHeight) file decodes exactly (ADVICE r3)") {
    val w = 9; val h = 4
    def frame(f: Int) = Array.tabulate(w * h) { k =>
      val x = k % w; val y = k / w
      (((x * 5 + y * 11 + f * 3) % 256) << 16) |
        (((x + y * 7 + f) % 256) << 8) | ((x * 2 + y + f * 13) % 256)
    }
    val frames = (0 until 3).map(frame)
    // avih dwWidth/dwHeight zeroed AND strf biHeight negative (top-down rows):
    // the old avih-first sizing returned no frames at all for this file
    val avi = Multimodal.encodeAviVideo(w, h, 10, frames, codec = "dib",
      dibTopDown = true, zeroAvihDims = true)
    val fs = Multimodal.decodeAviFrames(avi, everyN = 1)
    assert(fs.map(_.frameIdx) == Seq(0, 1, 2), s"frames decoded: $fs")
    fs.foreach { s =>
      val px = frame(s.frameIdx)
      assert(s.width == w && s.height == h)
      assert(s.sumR == px.map(v => ((v >>> 16) & 0xff).toLong).sum)
      assert(s.sumG == px.map(v => ((v >>> 8) & 0xff).toLong).sum)
      assert(s.sumB == px.map(v => (v & 0xff).toLong).sum)
    }
    // and a bottom-up file with present avih still decodes identically (regression)
    val classic = Multimodal.encodeAviVideo(w, h, 10, frames, codec = "dib")
    assert(Multimodal.decodeAviFrames(classic, 1).map(s => (s.sumR, s.sumG, s.sumB)) ==
      fs.map(s => (s.sumR, s.sumG, s.sumB)))
  }
  test("AVI decode never throws on malformed bytes") {
    assert(Multimodal.decodeAviFrames(null, 2).isEmpty)
    assert(Multimodal.decodeAviFrames(Array.emptyByteArray, 2).isEmpty)
    assert(Multimodal.decodeAviFrames("RIFFxxxxAVI ".getBytes, 2).isEmpty)
    val good = Multimodal.encodeAviVideo(4, 4, 10,
      Seq(Array.fill(16)(0x808080)), codec = "dib")
    // truncate mid-frame: clean stop, no throw
    assert(Multimodal.decodeAviFrames(good.take(good.length - 10), 1)
      .forall(_.width == 4))
  }
}

class SkeletonSpec extends AnyFunSuite {
  test("skeleton is idempotent and ascii-folded") {
    val s = Canon.skeleton("Hello, World! 42 -- naïve café")
    assert(s == Canon.skeleton(s))
    assert(s == "hello world 42 na ve caf") // non-ascii letters dropped
  }
  test("skeleton of empty and punctuation-only") {
    assert(Canon.skeleton("") == "")
    assert(Canon.skeleton("!!! --- ???") == "")
  }
}
