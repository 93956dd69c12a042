package graft.tools

import graft.fixtures.FixtureGen
import graft.pipeline.Extract
import org.apache.spark.unsafe.types.UTF8String

/** Single-threaded attribution of the text-crossing cost (StageFloor's
  * `full` − `pipe` marginal): UTF-16→UTF-8 encode (UTF8String.fromString)
  * vs char counting (numChars) vs the Latin1/UTF-16 mix of the corpus.
  *
  * Usage: runMain graft.tools.EncProbe [docs] [seconds]
  */
object EncProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 4000
    val seconds = if (args.length > 1) args(1).toDouble else 10.0
    val docs = (0 until n).map(i => Extract(FixtureGen.fixture(i.toLong).page)).toArray
    val texts = docs.map(_.extracted_text)
    val totalChars = texts.map(_.length.toLong).sum
    val latin1 = texts.count(t => t.forall(_ < 0x100))
    val ascii = texts.count(t => t.forall(_ < 0x80))
    println(f"docs=$n avgChars=${totalChars / n} ascii=$ascii latin1=$latin1 utf16=${n - latin1}")

    var sink = 0L
    def bench(label: String)(f: String => Long): Unit = {
      // warmup
      texts.foreach(t => sink += f(t))
      val t0 = System.nanoTime()
      var passes = 0L
      while ((System.nanoTime() - t0) / 1e9 < seconds) {
        var i = 0
        while (i < n) { sink += f(texts(i)); i += 1 }
        passes += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label%-28s ${sec * 1e6 / (n * passes)}%8.3f us/doc  (${sec * 1e9 / (totalChars * passes)}%.2f ns/char)")
    }
    bench("getBytes(UTF_8)")(t => t.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong)
    bench("fromString")(t => UTF8String.fromString(t).numBytes.toLong)
    bench("fromString+numChars")(t => UTF8String.fromString(t).numChars.toLong)
    bench("numChars only (pre-encoded)") {
      val cache = new java.util.IdentityHashMap[String, UTF8String]()
      texts.foreach(t => cache.put(t, UTF8String.fromString(t)))
      t => cache.get(t).numChars.toLong
    }
    println(s"sink=$sink")
  }
}
