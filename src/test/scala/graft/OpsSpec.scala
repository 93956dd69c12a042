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
  test("pixel stub is deterministic and shaped") {
    val png = Multimodal.fakePng(3, 10, 10, 64)
    val a = Multimodal.decodePixelsStub(png)
    val b = Multimodal.decodePixelsStub(png)
    assert(a.toSeq == b.toSeq && a.length == 16)
    assert(math.abs(a.sum - 1.0f) < 1e-3)
  }
  test("frame sampling shape") {
    val bytes = Array.tabulate[Byte](5000)(i => i.toByte)
    val frames = Multimodal.sampleFrames(bytes, everyN = 2)
    assert(frames.map(_._1) == Seq(0, 2, 4))
    assert(Multimodal.sampleFrames(Array.emptyByteArray, 2).isEmpty)
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
