package graft.tools

import graft.fixtures.FixtureGen
import graft.html.{ByteTokenizer, Decode}

/** Tight single-threaded loop over the byte tokenizer for JFR profiling and
  * ns/byte attribution (pair with -XX:StartFlightRecording). Modes let the
  * cost be split: prescan-only vs full tokenize vs tokenize+prescan.
  *
  * Usage: TokProfile [mode=tok|prescan|both] [docs] [seconds]
  */
object TokProfile {
  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "tok"
    val n = if (args.length > 1) args(1).toInt else 2000
    val seconds = if (args.length > 2) args(2).toDouble else 25.0
    val pages = (0 until n).map(i => FixtureGen.fixture(i.toLong).page).toArray
    val bytes = pages.map(_.html)
    val offs = bytes.map { b =>
      val p = Decode.utf8Plan(b); if (p == null) -1 else p.offset
    }
    val totalBytes = bytes.map(_.length.toLong).sum
    var sink = 0L
    // warmup
    (1 to 3).foreach { _ =>
      var i = 0
      while (i < n) {
        if (offs(i) >= 0) {
          val ps = ByteTokenizer.prescan(bytes(i), offs(i))
          if (ps.valid) sink += ByteTokenizer(bytes(i), offs(i)).blocks.length
        }
        i += 1
      }
    }
    val t0 = System.nanoTime()
    var passes = 0L
    while ((System.nanoTime() - t0) / 1e9 < seconds) {
      var i = 0
      while (i < n) {
        if (offs(i) >= 0) {
          mode match {
            case "prescan" => sink += ByteTokenizer.prescan(bytes(i), offs(i)).utf16Len
            case "tok" => sink += ByteTokenizer(bytes(i), offs(i)).blocks.length
            case _ =>
              val ps = ByteTokenizer.prescan(bytes(i), offs(i))
              if (ps.valid) sink += ByteTokenizer(bytes(i), offs(i)).blocks.length
          }
        }
        i += 1
      }
      passes += 1
    }
    val sec = (System.nanoTime() - t0) / 1e9
    val nsPerByte = sec * 1e9 / (totalBytes.toDouble * passes)
    println(f"mode=$mode passes=$passes docs=${n * passes} ns/byte=$nsPerByte%.2f " +
      f"ms/doc=${sec * 1e3 / (n * passes)}%.4f (sink=$sink)")
    if (java.lang.Boolean.getBoolean("graft.tok.diag"))
      println(s"diag: ${ByteTokenizer.Diag} totalBytes=${totalBytes * passes}")
  }
}
