package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass native MinHash-4 (r6): STRING → array<string> of the four
  * signature digests, semantically identical to the q_minhash aggregation
  *
  *   min(md5(concat(w, '#i'))) over w ∈ explode(array_distinct(split(text, ' ')))
  *
  * for i ∈ 0..3. Equivalences this relies on (each pinned by
  * R6QueryEquivSpec against the explode+groupBy formulation, plus the
  * DuckDB oracle):
  *  - min over the token MULTISET == min over the distinct set, so the
  *    array_distinct step needs no hash set here;
  *  - split-on-' ' over UTF-8 bytes == split(text, ' ') (0x20 never occurs
  *    inside a multi-byte sequence; Spark's split keeps leading/trailing/
  *    empty fields — so does this scanner);
  *  - comparing 16-byte digests unsigned-bytewise == comparing their
  *    lowercase-hex strings lexicographically (hex is order-preserving),
  *    so only the four FINAL minima are hex-encoded.
  *
  * Why native: the aggregation formulation pays an interpreted-ish chain
  * per token — concat allocation, cast-to-binary copy, a fresh
  * MessageDigest per md5() call, a 32-char hex string per digest, and the
  * explode row machinery — all × 4 hashes. Here one thread-local digest is
  * reused, the scratch input buffer is reused, and per token only the four
  * 16-byte digests are computed and compared in place.
  */
case class MinHash4(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_minhash4"

  override protected def nullSafeEval(input: Any): Any =
    MinHash4.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHash4$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHash4 =
    copy(child = newChild)
}

object MinHash4 {

  private final class Scratch {
    val md = java.security.MessageDigest.getInstance("MD5")
    var buf = new Array[Byte](256)
    val digest = new Array[Byte](16)
    val mins = Array.fill(4)(new Array[Byte](16))
  }
  private val scratchTL: ThreadLocal[Scratch] =
    ThreadLocal.withInitial(() => new Scratch)

  private val HEX = "0123456789abcdef".toCharArray

  /** Unsigned byte-wise compare; negative when a < b. */
  private def cmp(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < 16) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    0
  }

  def compute(text: UTF8String): ArrayData = {
    val s = scratchTL.get()
    val bytes = text.getBytes // UTF-8; concat+cast-to-binary sees the same
    val n = bytes.length
    var i = 0
    var found = false
    while (i <= n) { // one iteration per field, including empty ones
      var j = i
      while (j < n && bytes(j) != ' ') j += 1
      val tokLen = j - i
      if (s.buf.length < tokLen + 2)
        s.buf = new Array[Byte](math.max(tokLen + 2, s.buf.length * 2))
      System.arraycopy(bytes, i, s.buf, 0, tokLen)
      s.buf(tokLen) = '#'
      var h = 0
      while (h < 4) {
        s.buf(tokLen + 1) = ('0' + h).toByte
        s.md.reset()
        s.md.update(s.buf, 0, tokLen + 2)
        s.md.digest(s.digest, 0, 16)
        if (!found || cmp(s.digest, s.mins(h)) < 0)
          System.arraycopy(s.digest, 0, s.mins(h), 0, 16)
        h += 1
      }
      found = true
      i = j + 1
    }
    val out = new Array[Any](4)
    var h = 0
    while (h < 4) {
      val hex = new Array[Byte](32)
      var k = 0
      while (k < 16) {
        val b = s.mins(h)(k) & 0xff
        hex(2 * k) = HEX(b >>> 4).toByte
        hex(2 * k + 1) = HEX(b & 0xf).toByte
        k += 1
      }
      out(h) = UTF8String.fromBytes(hex)
      h += 1
    }
    new GenericArrayData(out)
  }
}
