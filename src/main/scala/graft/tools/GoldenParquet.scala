package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Freezes the golden oracle tables under /root/repo/golden/ — one parquet
  * per golden-backed pipeline query (PipelineQueries.goldenBacked). The
  * driver's DuckDB oracle reads these via `read_parquet(...)`, which puts
  * the whole extraction core under the hard rows+schema+hash gate
  * (VERDICT r1 item 1).
  *
  * Double-entry safety (the same contract as FixtureCheck write): freezing
  * REFUSES unless
  *   1. the default pipeline is byte-identical to FixtureGen's independent
  *      ground truth on the standard corpus,
  *   2. the adversarial corpus under the polarity-safe kind (nativeadaptive)
  *      is byte-identical to ITS ground truth, and
  *   3. every standard-corpus variant kind passes the VariantAnchor gate
  *      (r5): 11 kinds byte-identical to ground truth on all 400 pages, the
  *      5 borderline-delta kinds pinned to exact match counts, delta-url
  *      sets, and per-line block integrity — no golden is self-frozen.
  *
  * Usage: sbt "runMain graft.tools.GoldenParquet write [goldenDir]"
  */
object GoldenParquet {

  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "check"
    val goldenDir = if (args.length > 1) args(1) else "/root/repo/golden"

    // ---- double-entry gates (pure, no Spark needed)
    var bad = 0
    graft.fixtures.FixtureGen.fixtures(400).foreach { f =>
      if (graft.pipeline.Extract(f.page).extracted_text != f.expected) bad += 1
    }
    require(bad == 0, s"REFUSING: default pipeline != ground truth on $bad/400 fixtures")
    val advCfg = graft.pipeline.Extract.Config(
      classifier = graft.classify.Classifiers.Config(kind = "nativeadaptive"))
    graft.fixtures.FixtureGen.adversarial(200).foreach { f =>
      if (graft.pipeline.Extract(f.page, advCfg).extracted_text != f.expected) bad += 1
    }
    require(bad == 0, s"REFUSING: adversarial nativeadaptive != ground truth on $bad/200")
    // region-classifier corpora (VERDICT r2 item 3): fbcitb and cococlust
    // each anchored to generator ground truth on their own corpus
    val fbCfg = graft.pipeline.Extract.Config(
      classifier = graft.classify.Classifiers.Config(kind = "fbcitb"))
    graft.fixtures.FixtureGen.fbsect(140).foreach { f =>
      if (graft.pipeline.Extract(f.page, fbCfg).extracted_text != f.expected) bad += 1
    }
    require(bad == 0, s"REFUSING: fbsect fbcitb != ground truth on $bad/140")
    val coCfg = graft.pipeline.Extract.Config(
      classifier = graft.classify.Classifiers.Config(kind = "cococlust"))
    graft.fixtures.FixtureGen.cocoedge(140).foreach { f =>
      if (graft.pipeline.Extract(f.page, coCfg).extracted_text != f.expected) bad += 1
    }
    require(bad == 0, s"REFUSING: cocoedge cococlust != ground truth on $bad/140")
    // findAngle/deskew corpus (VERDICT r2 item 10): over-wrapped pages under
    // fbcitb + deskew anchored to generator ground truth
    val owCfg = graft.pipeline.Extract.Config(
      classifier = graft.classify.Classifiers.Config(kind = "fbcitb"),
      deskew = true)
    graft.fixtures.FixtureGen.overwrap(140).foreach { f =>
      if (graft.pipeline.Extract(f.page, owCfg).extracted_text != f.expected) bad += 1
    }
    require(bad == 0, s"REFUSING: overwrap fbcitb+deskew != ground truth on $bad/140")
    // threshold-rule corpora (VERDICT r3 item 3): each scalar rule anchored
    // to generator ground truth on the corpus where its distinctive term is
    // the deciding factor (margin analysis in FixtureGen.ruleCorpora)
    graft.fixtures.FixtureGen.ruleCorpora.foreach { case (corpus, gen, ccfg) =>
      val cfg = graft.pipeline.Extract.Config(classifier = ccfg)
      gen(140).foreach { f =>
        if (graft.pipeline.Extract(f.page, cfg).extracted_text != f.expected) bad += 1
      }
      require(bad == 0, s"REFUSING: $corpus ${ccfg.kind} != ground truth on $bad/140")
    }
    // gausstail under the gaussadaptive twin (same generator truth)
    val ggCfg = graft.pipeline.Extract.Config(
      classifier = graft.classify.Classifiers.Config(kind = "gaussadaptive"))
    graft.fixtures.FixtureGen.gausstail(140).foreach { f =>
      if (graft.pipeline.Extract(f.page, ggCfg).extracted_text != f.expected) bad += 1
    }
    require(bad == 0, s"REFUSING: gausstail gaussadaptive != ground truth on $bad/140")
    // rotate corpus (r4): column-flow grids under rotate=90/rotateCols=3
    // anchored to generator ground truth (column-major reading order)
    val rotCfg = graft.pipeline.Extract.Config(rotate = 90, rotateCols = 3)
    graft.fixtures.FixtureGen.colflow(140).foreach { f =>
      if (graft.pipeline.Extract(f.page, rotCfg).extracted_text != f.expected) bad += 1
    }
    require(bad == 0, s"REFUSING: colflow rotate != ground truth on $bad/140")
    // standard-corpus variant anchor (VERDICT r4 item 5): 11 kinds must be
    // byte-identical to generator ground truth on all 400 standard pages;
    // the 5 kinds with legitimate borderline deltas must match their pinned
    // count, pinned delta-url set, and pass block-integrity on every delta
    // page — no self-frozen variant golden remains
    graft.fixtures.VariantAnchor.allKinds.foreach { k =>
      val err = graft.fixtures.VariantAnchor.check(k)
      require(err == null, s"REFUSING: variant anchor: $err")
    }
    println("double-entry gates green (400 standard + 200 adversarial + " +
      "140 fbsect + 140 cocoedge + 140 overwrap + 10 x 140 threshold-rule " +
      "corpora (nibhi/nickdim/wolfglob/fengpoly/kuwedge/meanc/otsubi/" +
      "mokedge/gausstail/medspike) + 140 gausstail-gaussadaptive + 140 " +
      "colflow + 16-kind standard-corpus variant anchor)")
    if (mode != "write") return

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Files.createDirectories(Paths.get(goldenDir))
    val queries = graft.SparkEntry.queries
    graft.queries.PipelineQueries.goldenBacked.foreach { name =>
      val tmp = s"/tmp/golden_stage_$name"
      queries(name)(spark, "/root/testdata/sf0.001")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file for $name"))
      Files.copy(part.toPath, Paths.get(goldenDir, s"$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      println(s"froze $name.parquet")
    }
    spark.stop()
    println(s"golden tables written to $goldenDir")
  }
}
