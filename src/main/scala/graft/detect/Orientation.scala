package graft.detect

import graft.core.Block
import graft.classify.Classifiers

/** Document-type gate — the findOrientation transplant (deskew.cpp:70-136).
  *
  * The reference computes two confidences (pixOrientDetectDwa's fUpConf /
  * fLeftConf) and makes a 4-way discrete orientation decision that selects
  * the downstream processing (rotate by 0/90/180/270). The webtext analogue:
  * two cheap page-profile confidences — text-richness and link-dominance —
  * make a 4-way document-TYPE decision that selects the extraction profile.
  * Like the reference, the decision is a coarse discrete gate computed from
  * a cheap whole-page statistic, not a per-block classifier, and the
  * fallback on no-signal is the identity profile (deskew.cpp:128-131:
  * UNKNOWN → angle 0).
  *
  * Types (the 0/90/180/270 analogue):
  *  - "article":  text-rich and link-light — the default profile fits.
  *  - "listing":  link-dominated with many blocks (index/category pages) —
  *                stricter link mask, higher floor (nothing on such a page
  *                is long-form content; only clearly text-rich blocks kept).
  *  - "sparse":   few blocks / little text (landing pages, forms, stubs) —
  *                lower floor, no boundary crop (cropping a 3-block page on
  *                block statistics is noise amplification).
  *  - "other":    mixed signals — default profile (UNKNOWN analogue).
  */
object Orientation {

  final case class Decision(docType: String, textConf: Double, linkConf: Double)

  /** Cheap whole-page confidences from the block sequence (the
    * pixOrientDetectDwa analogue: one pass, two floats).
    */
  def detect(blocks: Array[Block]): Decision = {
    if (blocks.isEmpty) return Decision("sparse", 0.0, 0.0)
    var chars = 0L
    var linkChars = 0L
    var textRich = 0
    var i = 0
    while (i < blocks.length) {
      val b = blocks(i)
      chars += b.nChars
      linkChars += b.nLinkChars
      if (b.nChars - b.nLinkChars >= 128) textRich += 1
      i += 1
    }
    val linkConf = if (chars == 0) 0.0 else linkChars.toDouble / chars
    val textConf = textRich.toDouble / blocks.length
    val docType =
      if (blocks.length < 4 || chars < 256) "sparse"
      else if (linkConf >= 0.5 && textRich <= blocks.length / 8) "listing"
      else if (textRich > 0 && linkConf < 0.5) "article"
      else "other"
    Decision(docType, textConf, linkConf)
  }

  /** Profile selection — the rotate-by-decided-angle analogue
    * (deskew.cpp:112-131): a discrete decision selects the downstream
    * parameters; UNKNOWN/other keeps the identity (default) profile.
    */
  def profileFor(docType: String, base: Classifiers.Config = Classifiers.Default): Classifiers.Config =
    docType match {
      case "listing" => base.copy(maxLinkDensity = 0.5, absMin = 96.0)
      case "sparse" => base.copy(absMin = 32.0)
      case _ => base
    }
}
