package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.classify.Classifiers
import graft.core.Block

/** Round-3 behavior pins. */

/** binarizeByLocalVariances mask 3 — the gaussian noise model
  * (binarizeByLocalVariances.cpp:101-137, VERDICT r2 item 4): blocks whose
  * log-intensity is explainable by the page's own background process are
  * dropped even when they clear the global level (masks 1+2).
  */
class VariancesMask3Spec extends AnyFunSuite {

  private def block(tagPath: String, nChars: Int, nLinkChars: Int, idx: Int): Block =
    Block(tagPath, "x" * nChars, 0, nChars, nChars, math.max(1, nChars / 6),
      nLinkChars, nLinkChars / 6, 3, idx)

  // page: linky nav, link-free "crumbs" (40-60 chars — the sub-absMin noise
  // population), saturated article, then link-free ~85-char taglines whose
  // log-signal sits within the noise model's ~0.66-nat kill radius of the
  // crumb mean
  private def page(): (Array[Block], Range, Range) = {
    val bs = scala.collection.mutable.ArrayBuffer.empty[Block]
    def add(tp: String, n: Int, l: Int): Int = { bs += block(tp, n, l, bs.length); bs.length - 1 }
    (0 until 4).foreach(_ => add("html/body/header/nav/ul/li/a", 12, 12))
    add("html/body/header/div", 48, 0) // crumb
    add("html/body/header/div", 55, 0) // crumb
    add("html/body/header/div", 44, 0) // crumb
    val artLo = bs.length
    (0 until 6).foreach(_ => add("html/body/article/p", 380, 0))
    val artHi = bs.length - 1
    val tagLo = bs.length
    add("html/body/div", 85, 0) // tagline
    add("html/body/div", 90, 0) // tagline
    add("html/body/div", 82, 0) // tagline
    val tagHi = bs.length - 1
    (0 until 4).foreach(_ => add("html/body/footer/ul/li/a", 10, 10))
    (bs.toArray, artLo to artHi, tagLo to tagHi)
  }

  test("mask 3 drops quasi-chrome taglines that masks 1+2 alone would keep") {
    val (blocks, art, tags) = page()
    val cfg = Classifiers.Config(kind = "variances")
    val keep = Classifiers.classify(blocks, cfg)
    art.foreach(i => assert(keep(i), s"article block $i must stay kept"))
    tags.foreach(i => assert(!keep(i), s"tagline block $i must be noise-killed"))
    // and prove mask 3 is the DECIDING mask: the taglines clear the level
    // that masks 1+2 test against (level = 0.125*(max-min)/2 + min) and the
    // absMin floor, so without mask 3 they would be kept
    val x = Classifiers.signal(blocks)
    val level = 0.125 * (x.max - x.min) / 2.0 + x.min
    tags.foreach { i =>
      assert(x(i) > level && x(i) > cfg.absMin,
        s"tagline $i must pass masks 1+2 (x=${x(i)}, level=$level)")
    }
  }

  test("mask 3 is inert without a textured background population to model") {
    // same taglines, but the page has NO sub-absMin texture (only pure-link
    // zero-signal nav): noiseCnt == 0 → N ≡ 0 → the taglines survive — the
    // kill above is attributable to the noise model, nothing else
    val bs = scala.collection.mutable.ArrayBuffer.empty[Block]
    def add(tp: String, n: Int, l: Int): Unit = bs += block(tp, n, l, bs.length)
    (0 until 7).foreach(_ => add("html/body/header/nav/ul/li/a", 12, 12))
    (0 until 6).foreach(_ => add("html/body/article/p", 380, 0))
    add("html/body/div", 85, 0)
    add("html/body/div", 90, 0)
    add("html/body/div", 82, 0)
    val tagHi = bs.length - 1
    (0 until 4).foreach(_ => add("html/body/footer/ul/li/a", 10, 10))
    val blocks = bs.toArray
    val keep = Classifiers.classify(blocks, Classifiers.Config(kind = "variances"))
    ((tagHi - 2) to tagHi).foreach(i =>
      assert(keep(i), s"tagline $i must survive with no noise evidence"))
  }
}

/** TemplateChrome joins carry no broadcast hint (VERDICT r2 item 5): AQE
  * picks broadcast at runtime when the chrome frame is actually small and
  * falls back to a shuffle join when it exceeds the broadcast budget — the
  * only plan that survives 10^8 hosts.
  */
class TemplateChromePlanSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def corpus() = {
    import spark.implicits._
    (0 until 40).flatMap { h =>
      (0 until 5).map { d =>
        (s"host$h.example", s"host$h/doc$d",
          Seq(s"© host$h footer", "nav home about", s"body text $h-$d", s"unique line $d of $h"))
      }
    }.toDF("host", "id", "units")
  }

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE finalizes the adaptive plan
    df.queryExecution.executedPlan.toString
  }

  test("above the broadcast budget the strip join degrades to a shuffle join (no BroadcastExchange)") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val df = corpus()
      val stripped = graft.ops.TemplateChrome.strip(df, "host", "id", "units")
      val plan = executedPlan(stripped)
      assert(!plan.contains("BroadcastExchange"),
        s"chrome beyond the broadcast budget must not be broadcast:\n$plan")
      // semantics identical to the broadcastable plan
      val cleaned = stripped.select(col("id"), col("units_clean"))
        .as[(String, Seq[String])](org.apache.spark.sql.Encoders.product[(String, Seq[String])])
        .collect().toMap
      assert(cleaned.size == 200)
      assert(cleaned("host3/doc2") == Seq("body text 3-2", "unique line 2 of 3"))
    }
  }

  test("small chrome is broadcast at runtime by AQE (no hint in the plan source)") {
    val df = corpus()
    val stripped = graft.ops.TemplateChrome.strip(df, "host", "id", "units")
    val plan = executedPlan(stripped)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"a tiny chrome frame should be runtime-broadcast under AQE:\n$plan")
  }
}

/** cosineNearDupPairs no longer defaults nPlanes (VERDICT r2 item 8):
  * nPlanesFor sizes the bucket count to the corpus so candidate-pair
  * generation stays bounded instead of drifting to N²/4.
  */
class NearDupScaleSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("nPlanesFor grows with the corpus and bounds the expected bucket size") {
    import graft.ops.Similarity.nPlanesFor
    assert(nPlanesFor(0) == 2 && nPlanesFor(4096) == 2)
    assert(nPlanesFor(1L << 20) == 10)   // 1M / 2^10 = 1024 = targetBucket
    assert(nPlanesFor(1L << 30) == 20)
    assert(nPlanesFor(Long.MaxValue) == 24) // capped
    (0 to 40).foreach { e =>
      val n = 1L << e
      val p = nPlanesFor(n)
      assert(p >= 2 && p <= 24 && (p == 24 || (n >> p) <= 1024))
    }
  }

  test("10k vectors: candidate pairs stay bounded under nPlanesFor sizing") {
    import spark.implicits._
    val n = 10000
    // deterministic pseudo-random 8-dim vectors (no RNG state); a DISTINCT
    // multiplier per dimension so coordinates decorrelate across i — a
    // single shared multiplier puts the whole corpus on a line, which no
    // hyperplane family can bucket
    val primes = Array(31, 131, 271, 401, 523, 653, 787, 919)
    val corpus = (0 until n).map { i =>
      (i.toLong, (0 until 8).map(d => ((i * primes(d)) % 997 - 498).toDouble))
    }.toDF("vec_id", "dv")
    val p = graft.ops.Similarity.nPlanesFor(n.toLong, targetBucket = 64)
    // candidate pairs = sum over buckets of c*(c-1)/2 — measure it directly
    val sizes = corpus
      .withColumn("bucket", graft.ops.Similarity.lshBucket(col("dv"), p))
      .groupBy("bucket").count().as[(Int, Long)].collect()
    val candidates = sizes.map { case (_, c) => c * (c - 1) / 2 }.sum
    val allPairs = n.toLong * (n - 1) / 2
    assert(candidates < allPairs / 10,
      s"bucketing must prune >90% of the pair space: $candidates vs $allPairs")
    // and the operator itself runs to completion on the bounded space
    val pairs = graft.ops.Similarity.cosineNearDupPairs(
      corpus, "vec_id", "dv", threshold = 0.999, nPlanes = p)
    assert(pairs.count() >= 0)
  }
}

/** findAngle as a real operator (VERDICT r2 item 10; deskew.cpp:139-206 via
  * graft.detect.Deskew): wrapper-nesting skew measured as the first-
  * encountered mode of per-block excess, with rotate(−angle) = collapse of
  * duplicate-segment runs.
  */
class DeskewSpec extends AnyFunSuite {

  import graft.detect.Deskew

  private def block(tagPath: String, nChars: Int, idx: Int): Block =
    Block(tagPath, "x" * nChars, 0, nChars, nChars, math.max(1, nChars / 6),
      0, 0, 3, idx)

  test("collapse removes runs of consecutive identical segments only") {
    assert(Deskew.collapse("html/body/div/div/div/article/p") == "html/body/div/article/p")
    assert(Deskew.collapse("html/body/article/p") == "html/body/article/p")
    assert(Deskew.collapse("div/div") == "div")
    assert(Deskew.collapse("div/span/div") == "div/span/div") // non-consecutive stays
    assert(Deskew.collapse("") == "")
  }

  test("angleOf counts the wrapper excess; findAngle takes the first-encountered mode over long blocks") {
    assert(Deskew.angleOf("html/body/div/div/div/p") == 2)
    assert(Deskew.angleOf("html/body/article/p") == 0)
    // mode with the reference's max_element semantics: strict > keeps the
    // FIRST cluster on ties
    val blocks = Array(
      block("html/body/div/div/article/p", 400, 0), // angle 1
      block("html/body/div/div/article/p", 400, 1), // angle 1
      block("html/body/div/div/div/aside/p", 400, 2), // angle 2
      block("html/body/div/div/div/aside/p", 400, 3), // angle 2 — tie: first wins
      block("html/body/nav/a", 10, 4)) // short: below the width/8 gate
    assert(Deskew.findAngle(blocks) == 1)
    // the short block is excluded by the minLineLength gate: make it the
    // only angle-3 evidence and it must not flip the mode
    val withShort = blocks :+ block("html/body/div/div/div/div/nav/a", 10, 5)
    assert(Deskew.findAngle(withShort) == 1)
    assert(Deskew.findAngle(Array.empty[Block]) == 0)
  }

  test("deskew(angle=0) is the exact no-op fast path; nonzero angle collapses every path") {
    val blocks = Array(block("html/body/div/div/p", 400, 0))
    assert(Deskew.deskew(blocks, 0) eq blocks)
    assert(Deskew.deskew(blocks, 1)(0).tagPath == "html/body/div/p")
  }

  test("overwrap corpus discriminates: fbcitb+deskew matches ground truth, without deskew it fails >85%") {
    import graft.fixtures.FixtureGen
    import graft.pipeline.Extract
    val cfgOn = Extract.Config(
      classifier = Classifiers.Config(kind = "fbcitb"), deskew = true)
    val cfgOff = Extract.Config(classifier = Classifiers.Config(kind = "fbcitb"))
    val fixtures = FixtureGen.overwrap(140)
    val okOn = fixtures.count(f => Extract(f.page, cfgOn).extracted_text == f.expected)
    val okOff = fixtures.count(f => Extract(f.page, cfgOff).extracted_text == f.expected)
    assert(okOn == 140, s"deskewed fbcitb must match ground truth, got $okOn/140")
    assert(okOff <= 21, s"without deskew the corpus must fail >85%, passed $okOff/140")
    // and the measured skew is nonzero on every over-wrapped page
    fixtures.take(20).foreach { f =>
      val doc = Extract(f.page, cfgOn)
      assert(doc.stats.angle >= 1, s"${f.page.url}: angle=${doc.stats.angle}")
    }
  }
}

/** Explicit salting for skewed hosts (graft.ops.Skew; BASELINE.json north
  * rule): identical results to the unsalted aggregates, measurably
  * balanced shuffle layout on a Zipf host distribution.
  */
class SkewSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  /** Zipf-ish corpus: one hot host holds 80% of all rows. */
  private def zipf() = {
    import spark.implicits._
    val hot = (0 until 8000).map(i => ("hot.example", s"url-$i", s"text body ${i % 700}"))
    val tail = (0 until 2000).map(i => (s"host${i % 40}.example", s"u-$i", s"tail text $i"))
    (hot ++ tail).toDF("host", "url", "text")
  }

  test("salted aggregates are byte-identical to the unsalted ones") {
    val df = zipf()
    val plain = df.groupBy("host").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = graft.ops.Skew.saltedCount(df, "host", "url", 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted == plain)
    val plainD = df.groupBy("host")
      .agg(org.apache.spark.sql.functions.countDistinct("text").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val saltedD = graft.ops.Skew.saltedDistinctCount(df, "host", "text", 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(saltedD == plainD)
  }

  test("salting spreads the hot key: max shuffle partition drops from ~80% to bucket-bounded") {
    import org.apache.spark.sql.functions._
    val df = zipf()
    val n = df.count().toDouble
    def maxFrac(d: org.apache.spark.sql.DataFrame): Double =
      d.withColumn("p", spark_partition_id()).groupBy("p").count()
        .collect().map(_.getLong(1)).max / n
    val keyOnly = maxFrac(df.repartition(8, col("host")))
    val saltedPart = maxFrac(df.repartition(8, col("host"),
      graft.ops.Skew.saltCol(col("url"), 16)))
    assert(keyOnly >= 0.8, s"fixture must be skewed: hot partition holds $keyOnly")
    assert(saltedPart <= 0.3, s"salted layout must spread the hot host, got $saltedPart")
  }
}

/** rotate's content (VERDICT r2 residual 5; rotate.cpp:35-72 via
  * graft.boundary.Rotate): exact 0/90/180/270 reindexing of a row-major
  * block grid — the tables-for-layout linearization.
  */
class RotateSpec extends AnyFunSuite {

  import graft.boundary.Rotate

  private def block(text: String, idx: Int): Block =
    Block("html/body/table/tr/td", text, 0, text.length, text.length, 1, 0, 0, 4, idx)

  test("closed forms: 2x3 grid transposes; 180 reverses; 270 = transpose+flip") {
    val b = (0 until 6).map(i => block(s"cell$i", i)).toArray // rows: [0 1 2] [3 4 5]
    assert(Rotate(b, 90, 3).map(_.text).toSeq ==
      Seq("cell0", "cell3", "cell1", "cell4", "cell2", "cell5"))
    assert(Rotate(b, 180, 3).map(_.text).toSeq ==
      Seq("cell5", "cell4", "cell3", "cell2", "cell1", "cell0"))
    assert(Rotate(b, 270, 3).map(_.text).toSeq ==
      Seq("cell5", "cell2", "cell4", "cell1", "cell3", "cell0"))
    // idx reassigned to the new document order
    assert(Rotate(b, 90, 3).map(_.idx).toSeq == (0 until 6))
  }

  test("identity fast paths return the SAME array; ragged grids keep every block once") {
    val b = (0 until 7).map(i => block(s"c$i", i)).toArray
    assert(Rotate(b, 0, 3) eq b)
    assert(Rotate(b, 90, 1) eq b)   // single column: transpose is identity
    assert(Rotate(b, 90, 99) eq b)  // single row
    val ragged = Rotate(b, 90, 3)   // rows [0 1 2] [3 4 5] [6]
    assert(ragged.map(_.text).toSeq == Seq("c0", "c3", "c6", "c1", "c4", "c2", "c5"))
    assert(ragged.map(_.text).sorted.toSeq == b.map(_.text).sorted.toSeq)
    intercept[IllegalArgumentException](Rotate(b, 45, 3))
  }

  test("270 of a degenerate (single-row/column) grid is the FULL REVERSE, not identity (ADVICE r3)") {
    val b = (0 until 5).map(i => block(s"c$i", i)).toArray
    // single column (cols=1): 270 = transpose+flip = reverse
    assert(Rotate(b, 270, 1).map(_.text).toSeq == b.reverse.map(_.text).toSeq)
    // single row (cols >= n): same
    assert(Rotate(b, 270, 99).map(_.text).toSeq == b.reverse.map(_.text).toSeq)
    // apply() and permutation() must agree on these shapes
    assert(Rotate(b, 270, 1).map(_.text).toSeq ==
      Rotate.permutation(5, 270, 1).map(i => b(i).text).toSeq)
    // and 180 on the same shapes still reverses (regression guard)
    assert(Rotate(b, 180, 1).map(_.text).toSeq == b.reverse.map(_.text).toSeq)
  }

  test("permutation(n, 90, 4) matches the q_rotate closed form") {
    // new_pos(rn) = c*R0 + min(c, rem) + r — the SQL formula both engines
    // compute; Rotate.permutation gives source-at-output-position, so the
    // closed form must be its inverse
    Seq(1, 3, 4, 5, 8, 13, 16, 29).foreach { n =>
      val perm = Rotate.permutation(n, 90, 4)
      val r0 = n / 4; val rem = n % 4
      (0 until n).foreach { rn =>
        val c = rn % 4; val r = rn / 4
        val newPos = c * r0 + math.min(c, rem) + r
        assert(perm(newPos) == rn, s"n=$n rn=$rn")
      }
    }
  }
}

/** CLAHE pipeline stage (VERDICT r2 item 7; EnhanceLocalContrastByCLAHE,
  * imageLibCommon.cpp:327-395): opt-in tile-wise clipped equalization of
  * the block signal before classification.
  */
class ClaheSpec extends AnyFunSuite {

  private def block(tagPath: String, text: String, nLink: Int, idx: Int): Block =
    Block(tagPath, text, 0, text.length, text.length,
      math.max(1, text.length / 6), nLink, nLink / 6, 3, idx)

  /** Long document: 3 bright tiles of saturated article, then a 64-block
    * late dim section (tiles 3-4: link-free paragraphs of signal 80..87 —
    * one CLAHE bin, real content that is just short), then a bright tile.
    * Block texts are all distinct so no artifact pass could collapse them.
    */
  private def longDoc(): (Array[Block], Range, Range) = {
    val bs = scala.collection.mutable.ArrayBuffer.empty[Block]
    def add(tp: String, text: String, l: Int): Unit = bs += block(tp, text, l, bs.length)
    (0 until 96).foreach(i => add("html/body/article/p", s"bright paragraph $i " + ("lorem ipsum dolor sit amet " * 14), 0))
    val dimLo = bs.length
    (0 until 64).foreach { i =>
      val len = 80 + (i % 8)
      add("html/body/section/p", (s"dim note $i " + ("brief line of late content " * 4)).take(len), 0)
    }
    val dimHi = bs.length - 1
    (0 until 32).foreach(i => add("html/body/article/p", s"bright tail $i " + ("sed do eiusmod tempor incididunt " * 12), 0))
    // core = dim blocks between the centers of the two all-dim tiles —
    // their CLAHE mapping interpolates two dim-tile LUTs only (the run's
    // outer edges interpolate against a bright tile and legitimately sink:
    // that is real CLAHE's bilinear behavior too)
    (bs.toArray, dimLo to dimHi, (dimLo + 16) to (dimHi - 16))
  }

  test("late dim content: plain sauvola fragments the run, CLAHE keeps its core intact") {
    val (blocks, dim, core) = longDoc()
    val base = Classifiers.Config() // sauvola defaults
    val keepPlain = Classifiers.classify(blocks, base)
    val keepClahe = Classifiers.classify(blocks, base.copy(clahe = true))
    val droppedPlainCore = core.count(i => !keepPlain(i))
    val droppedClaheCore = core.count(i => !keepClahe(i))
    assert(droppedPlainCore >= 8,
      s"fixture must demonstrate the failure: plain sauvola dropped only $droppedPlainCore/${core.size} core dim blocks")
    assert(droppedClaheCore == 0,
      s"CLAHE must keep the dim core, dropped $droppedClaheCore/${core.size}")
    // bright content is kept in both
    assert(keepPlain.indices.filterNot(dim.contains).forall(keepPlain(_)))
    assert(keepClahe.indices.filterNot(dim.contains).forall(keepClahe(_)))
  }

  test("claheEqualize invariants: zeros pinned, saturated stays bright, heavy clip degrades toward identity") {
    val x = Array.tabulate(96)(i => if (i % 5 == 0) 0.0 else if (i < 48) 255.0 else 90.0)
    val eq = Classifiers.claheEqualize(x, tile = 32, clip = 40.0)
    x.indices.foreach { i =>
      if (x(i) == 0.0) assert(eq(i) == 0.0, s"zero-signal block $i must stay background")
      else assert(eq(i) >= 0.0 && eq(i) <= 255.0)
    }
    // dim-dominant tile maps its plateau to (near-)saturation
    assert(eq(81) >= 240.0, s"in-tile dim plateau should equalize bright, got ${eq(81)}")
    // a heavy clip collapses the LUT toward the identity ramp, not a flatten
    val id = Classifiers.claheEqualize(x, tile = 32, clip = 0.0)
    x.indices.filter(i => x(i) > 0).foreach { i =>
      assert(math.abs(id(i) - x(i)) <= 16.0,
        s"clip=0 should be near-identity at $i: ${x(i)} -> ${id(i)}")
    }
  }
}

/** Real language id (VERDICT r2 item 6): char-trigram profiles over 24
  * languages incl. CJK/Cyrillic/Greek/Arabic/Hebrew/Devanagari, frozen
  * in-repo, scored in pure integer arithmetic by the native LangIdExpr.
  * The accuracy gate runs on held-out sentences DISJOINT from the profile
  * text.
  */
class LangIdSpec extends AnyFunSuite {

  import graft.ops.LangProfiles

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("profile table is well-formed: 25 languages, 1..3-codepoint n-grams, positive weights") {
    assert(LangProfiles.langs.length == 25)
    assert(Set("ru", "uk", "bg", "el", "ar", "he", "hi", "zh", "ja", "ko")
      .subsetOf(LangProfiles.langs.toSet), "non-Latin scripts must be covered")
    LangProfiles.weightTable.foreach { case (lang, g, w) =>
      val n = g.codePoints().count()
      assert(n >= 1 && n <= 3, s"'$g' ($lang) has $n codepoints")
      assert(w >= 1, s"weight for '$g' ($lang) must be positive")
    }
    LangProfiles.norm2.values.foreach(v => assert(v > 0))
    // held-out text is disjoint from profile text (no train-on-test)
    LangProfiles.heldOutText.foreach { case (lang, docs) =>
      docs.foreach(d => assert(!LangProfiles.profileText(lang).contains(d.take(40))))
    }
  }

  test("closed-form: score equals the occurrence-weight dot product; argmax + und semantics") {
    import org.apache.spark.unsafe.types.UTF8String
    def id(s: String): String =
      graft.functions.LangIdExpr.compute(UTF8String.fromString(s)).toString
    // zero evidence: empty, digits-only and symbol-only inputs share no
    // n-gram with any profile (digits/© never occur in the profile text,
    // and the lone-space unigram is excluded by construction)
    assert(id("") == "und" && id("12345 67890") == "und" && id("©©© ®®® •••") == "und")
    // hand-checked: " th" / "the" / "he " are top English n-grams
    assert(id("the theory of the matter") == "en")
    // surrogate pairs must not break the codepoint walk
    assert(id("😀😀 the quick brown fox and the lazy dog 😀") == "en")
  }

  test("accuracy >= 95% on the held-out multilingual corpus (and every script family resolves)") {
    import spark.implicits._
    val corpus = LangProfiles.heldOutText.toSeq.flatMap { case (lang, ds) =>
      ds.zipWithIndex.map { case (d, i) => (s"$lang-$i", lang, d) }
    }.toDF("doc_id", "lang_true", "text")
    val pred = graft.ops.TextStats.langIdOf(corpus, "text")
      .select(col("doc_id"), col("lang_true"), col("lang_pred"))
      .collect()
    val n = pred.length
    val wrong = pred.filter(r => r.getString(1) != r.getString(2))
    val acc = (n - wrong.length).toDouble / n
    val detail = wrong.map(r => s"${r.getString(0)}: true=${r.getString(1)} pred=${r.getString(2)}").mkString("; ")
    assert(n == 25 * 5)
    assert(acc >= 0.95, f"accuracy $acc%.3f < 0.95 — $detail")
    // every non-Latin script family must be recognized on at least 4/5 docs
    Seq("ru", "ar", "he", "hi", "zh", "ja", "ko", "el").foreach { lang =>
      val ok = pred.count(r => r.getString(1) == lang && r.getString(2) == lang)
      assert(ok >= 4, s"$lang resolved only $ok/5")
    }
  }
}
