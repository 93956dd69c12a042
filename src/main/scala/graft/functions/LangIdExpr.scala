package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character n-gram language id as a native codegen expression
  * (STRING → STRING language code, "und" for no evidence).
  *
  * One pass: normalize (ASCII lower + ws collapse, LangProfiles.normalize
  * parity), roll a 3-codepoint window and at each position look up the
  * 1-, 2- and 3-gram (packed into Longs, 21 bits per codepoint — zero
  * allocation per n-gram) in the frozen profile maps, accumulating the
  * integer per-mille weight dot product for every language simultaneously.
  * Final score per language is cosine-squared up to the common document
  * factor: dot² / ‖w_L‖² — two IEEE double ops over exact integers, so a
  * SQL engine replaying [[graft.ops.LangProfiles.weightTable]] reproduces
  * the argmax bit-identically. Ties go to the smaller language code.
  */
case class LangIdExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_lang_id"

  override protected def nullSafeEval(input: Any): Any =
    LangIdExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LangIdExpr$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

object LangIdExpr {

  import graft.ops.LangProfiles

  private val langs: Array[String] = LangProfiles.langs
  private val nLangs = langs.length
  private val und = UTF8String.fromString("und")
  private val langU8: Array[UTF8String] = langs.map(UTF8String.fromString)
  private val norm2: Array[Double] =
    langs.map(l => LangProfiles.norm2(l).toDouble)

  /** One LongMap per n-gram order (separate maps — a 3×21-bit pack plus a
    * length tag would not fit 64 bits). Values are dense per-language
    * weight vectors in `langs` order.
    */
  private val tables: Array[scala.collection.mutable.LongMap[Array[Int]]] = {
    val ms = Array.fill(3)(new scala.collection.mutable.LongMap[Array[Int]](8192))
    val idx = langs.zipWithIndex.toMap
    LangProfiles.weightTable.foreach { case (lang, gram, w) =>
      val cps = gram.codePoints().toArray
      require(cps.length >= 1 && cps.length <= 3,
        s"profile n-gram '$gram' has ${cps.length} codepoints")
      var key = 0L
      cps.foreach(cp => key = (key << 21) | cp.toLong)
      val vec = ms(cps.length - 1).getOrElseUpdate(key, new Array[Int](nLangs))
      vec(idx(lang)) += w
    }
    ms
  }

  @inline private def accumulate(scores: Array[Long], order: Int, key: Long): Unit = {
    val vec = tables(order).getOrNull(key)
    if (vec != null) {
      var j = 0
      while (j < scores.length) { scores(j) += vec(j); j += 1 }
    }
  }

  def compute(u: UTF8String): UTF8String = {
    val s = LangProfiles.normalize(u.toString)
    val scores = new Array[Long](nLangs)
    // rolling codepoint window; at each NEW codepoint, close off the
    // 1-gram (itself), 2-gram (prev+it) and 3-gram (prev2+prev+it)
    var c0 = -1L; var c1 = -1L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      accumulate(scores, 0, cp.toLong)
      if (c1 >= 0) accumulate(scores, 1, (c1 << 21) | cp.toLong)
      if (c0 >= 0) accumulate(scores, 2, (c0 << 42) | (c1 << 21) | cp.toLong)
      c0 = c1; c1 = cp.toLong
    }
    var best = 0.0; var bestIdx = -1
    var j = 0
    while (j < nLangs) {
      if (scores(j) > 0) {
        val d = scores(j).toDouble
        val sc = d * d / norm2(j)
        if (sc > best) { best = sc; bestIdx = j } // strict > = ties to smaller code
      }
      j += 1
    }
    if (bestIdx < 0) und else langU8(bestIdx)
  }
}
