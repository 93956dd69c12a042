package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal

/** Pins the ADVICE r4 multi-video-stream AVI fix (Multimodal.scala:447):
  * dims latch on the FIRST video stream's strf; a later stream's
  * BITMAPINFOHEADER must not override the dims the stream-0 00db/00dc
  * frames are decoded with. The decoder walks chunks linearly inside LIST
  * bounds, so a flat chunk sequence after the 12-byte RIFF/AVI header is a
  * valid fixture shape for it.
  */
class AviMultiStreamSpec extends AnyFunSuite {

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    require(body.length % 2 == 0, "keep test chunks even — no pad byte")
    id.getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  /** strh with the given fccType; body padded to 16 bytes. */
  private def strh(fccType: String): Array[Byte] =
    chunk("strh", fccType.getBytes("US-ASCII") ++ new Array[Byte](12))

  /** strf BITMAPINFOHEADER prefix: biSize, biWidth, biHeight. */
  private def strf(w: Int, h: Int): Array[Byte] =
    chunk("strf", le32(40) ++ le32(w) ++ le32(h))

  private def avi(chunks: Array[Byte]*): Array[Byte] = {
    val body = chunks.flatten.toArray
    "RIFF".getBytes("US-ASCII") ++ le32(4 + body.length) ++
      "AVI ".getBytes("US-ASCII") ++ body
  }

  private val w = 9; private val h = 4
  // deterministic BGR test pattern
  private def bgr(x: Int, y: Int): (Int, Int, Int) =
    ((x * 2 + y + 7) % 256, (x + y * 5 + 3) % 256, (x * 3 + y * 11) % 256)

  /** one bottom-up DIB frame: rows padded to 4 bytes (rowBytes = 28). */
  private def dibFrame(): Array[Byte] = {
    val rowBytes = (w * 3 + 3) & ~3
    val out = new Array[Byte](rowBytes * h)
    for (y <- 0 until h; x <- 0 until w) {
      val (b, g, r) = bgr(x, y)
      val row = (h - 1 - y) * rowBytes // bottom-up storage
      out(row + x * 3) = b.toByte
      out(row + x * 3 + 1) = g.toByte
      out(row + x * 3 + 2) = r.toByte
    }
    out
  }

  private val sumR = (for (y <- 0 until h; x <- 0 until w) yield bgr(x, y)._3.toLong).sum
  private val sumG = (for (y <- 0 until h; x <- 0 until w) yield bgr(x, y)._2.toLong).sum
  private val sumB = (for (y <- 0 until h; x <- 0 until w) yield bgr(x, y)._1.toLong).sum

  test("second video stream's strf does not override stream-0 dims") {
    // stream 1: vids 9x4 (the dims the 00db frame is encoded with);
    // stream 2: vids 50x50 — with 50x50 the 112-byte frame fails the
    // rowBytes*h size guard and would be silently DROPPED, so a decoded
    // frame with w=9 proves the first-stream latch.
    val bytes = avi(strh("vids"), strf(w, h),
      strh("vids"), strf(50, 50),
      chunk("00db", dibFrame()))
    val fs = Multimodal.decodeAviFrames(bytes, everyN = 1)
    assert(fs.map(s => (s.width, s.height)) == Seq((w, h)),
      s"frame decoded with wrong dims (later strf latched?): $fs")
    assert((fs.head.sumR, fs.head.sumG, fs.head.sumB) == ((sumR, sumG, sumB)))
  }

  test("audio stream's strf never latches video dims") {
    // auds strl FIRST (strf here is WAVEFORMATEX, not dims — parsing it as
    // dims would read garbage); the vids strf after it must still win.
    val bytes = avi(strh("auds"), strf(50, 50),
      strh("vids"), strf(w, h),
      chunk("00db", dibFrame()))
    val fs = Multimodal.decodeAviFrames(bytes, everyN = 1)
    assert(fs.map(s => (s.width, s.height)) == Seq((w, h)))
    assert((fs.head.sumR, fs.head.sumG, fs.head.sumB) == ((sumR, sumG, sumB)))
  }
}

/** Pins the ADVICE r4 snapshotBatch race contract (ExtractStream.scala:157):
  * the duplicate-runId failure from SnapshotTable.append IS the
  * already-committed skip case when the runId shows as committed, so a
  * replayed micro-batch racing its own earlier commit converges to
  * exactly-once instead of failing the stream. The catch matches
  * IllegalArgumentException — this spec pins that exception TYPE so a
  * future guard change cannot silently disarm the catch.
  */
class SnapshotBatchRaceSpec extends AnyFunSuite {

  private lazy val spark: org.apache.spark.sql.SparkSession =
    org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()

  test("duplicate append throws IllegalArgumentException naming the runId (the type snapshotBatch catches)") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("snap_race_guard").toString
    val docs = graft.spark.ExtractJob.extract(
      graft.spark.PageSource.pages(spark, 10L))
    graft.table.SnapshotTable.append(docs.toDF(), dir, "batch0", buckets = 4)
    val e = intercept[IllegalArgumentException] {
      graft.table.SnapshotTable.append(docs.toDF(), dir, "batch0", buckets = 4)
    }
    assert(e.getMessage.contains("batch0"), s"guard message lost the runId: $e")
  }

  test("snapshotBatch is idempotent on replay and skips an out-of-band committed runId") {
    import java.nio.file.Files
    import graft.streaming.ExtractStream
    import graft.table.SnapshotTable
    val dir = Files.createTempDirectory("snap_race_skip").toString
    val docs = graft.spark.ExtractJob.extract(
      graft.spark.PageSource.pages(spark, 10L))

    ExtractStream.snapshotBatch(docs, 0L, dir, buckets = 4)
    assert(SnapshotTable.read(spark, dir).get.count() == 10)

    // checkpoint re-delivery replay of the same batchId: no-op, no throw
    ExtractStream.snapshotBatch(docs, 0L, dir, buckets = 4)
    assert(SnapshotTable.read(spark, dir).get.count() == 10)

    // the race winner already committed batch1 (out-of-band here); the
    // replayed snapshotBatch must SKIP, not throw or double-write
    SnapshotTable.append(docs.toDF(), dir, "batch1", buckets = 4)
    ExtractStream.snapshotBatch(docs, 1L, dir, buckets = 4)
    val table = SnapshotTable.read(spark, dir).get
    assert(table.count() == 20, "batch1 rows written exactly once")
    assert(SnapshotTable.currentSnapshot(dir).get.runIds.toSet ==
      Set("batch0", "batch1"))
  }
}
