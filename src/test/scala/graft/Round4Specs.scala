package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.classify.Classifiers
import graft.fixtures.FixtureGen
import graft.pipeline.Extract

/** Threshold-rule ground-truth corpora (VERDICT r3 item 3): each scalar
  * rule's distinctive term is THE deciding factor on its corpus — the rule
  * recovers generator ground truth on every page while a named rival rule
  * (usually the plain window-mean baseline) provably fails on (nearly)
  * every page. These corpora join fbsect/cocoedge/overwrap/standard/
  * adversarial/colflow in GoldenParquet's double-entry refuse-gate (16
  * corpora total), so the q_extract_<corpus> goldens are anchored to
  * independent truth, not self-frozen.
  */
class GroundTruthVariantsSpec extends AnyFunSuite {

  private val N = 60 // spec-time sample; the golden gate runs 140

  private def run(f: FixtureGen.Fixture, cfg: Classifiers.Config): String =
    Extract(f.page, Extract.Config(classifier = cfg)).extracted_text

  for ((corpus, gen, cfg) <- FixtureGen.ruleCorpora) {
    test(s"$corpus: ${cfg.kind} recovers ground truth on every page") {
      val bad = gen(N).count(f => run(f, cfg) != f.expected)
      assert(bad == 0, s"$corpus under ${cfg.kind}: $bad/$N mismatched")
    }
  }

  /** The discrimination matrix: for each corpus, the named rival kinds make
    * the OPPOSITE call on the probe blocks (margins derived in
    * FixtureGen's corpus comments), so they fail ground truth on >= 90% of
    * pages — the distinctive term is doing the work, not the shared
    * pipeline around it.
    */
  private val rivals: Map[String, Seq[Classifiers.Config]] = Map(
    "nibhi" -> Seq(Classifiers.Config(kind = "meanadaptive"),
      Classifiers.Config(kind = "sauvola")),
    "nickdim" -> Seq(Classifiers.Config(kind = "sauvola"),
      Classifiers.Config(kind = "feng")),
    "wolfglob" -> Seq(Classifiers.Config(kind = "meanadaptive"),
      Classifiers.Config(kind = "sauvola")),
    "fengpoly" -> Seq(Classifiers.Config(kind = "sauvola"),
      Classifiers.Config(kind = "meanadaptive"),
      Classifiers.Config(kind = "wolfjolion")),
    "kuwedge" -> Seq(Classifiers.Config(kind = "meanadaptive"),
      Classifiers.Config(kind = "sauvola"),
      Classifiers.Config(kind = "niblack")),
    // (wolfjolion is NOT a meanc rival: with s = 0 everywhere its sMax
    // clamps to 1e-9 and t degrades to 0.8m — it keeps the uniform page)
    "meanc" -> Seq(Classifiers.Config(kind = "niblack")),
    "otsubi" -> Seq(Classifiers.Config(kind = "meanadaptive"),
      Classifiers.Config(kind = "sauvola"),
      Classifiers.Config(kind = "wolfjolion")),
    "mokedge" -> Seq(Classifiers.Config(kind = "meanadaptive"),
      Classifiers.Config(kind = "sauvola")),
    "gausstail" -> Seq(Classifiers.Config(kind = "meanadaptive"),
      Classifiers.Config(kind = "sauvola")),
    "medspike" -> Seq(Classifiers.Config(kind = "meanadaptive"),
      Classifiers.Config(kind = "niblack")),
  )

  test("gausstail also anchors the gaussadaptive kind (agt's twin without the median pre-smooth)") {
    val bad = FixtureGen.gausstail(N)
      .count(f => run(f, Classifiers.Config(kind = "gaussadaptive")) != f.expected)
    assert(bad == 0, s"gausstail under gaussadaptive: $bad/$N mismatched")
  }

  for ((corpus, gen, _) <- FixtureGen.ruleCorpora; rival <- rivals(corpus)) {
    test(s"$corpus: rival ${rival.kind} fails ground truth on >= 90% of pages") {
      val bad = gen(N).count(f => run(f, rival) != f.expected)
      assert(bad >= (N * 9) / 10, s"$corpus under rival ${rival.kind}: " +
        s"only $bad/$N mismatched — the corpus does not discriminate")
    }
  }
}

/** Streaming exactly-once under a REAL kill (VERDICT r3 item 9): the
  * batch-side SnapshotSpec crash pattern lifted to foreachBatch. A
  * streaming run is killed MID-BATCH — after un-committed data files land
  * in the table directory, before the manifest commit — then restarted
  * from the same checkpoint. The replayed batch finds its runId absent
  * from the committed snapshot and re-commits atomically; the torn files
  * stay invisible to manifest-driven readers. Final table = byte-identical
  * to the batch job, exactly once.
  */
class StreamKillSpec extends org.scalatest.funsuite.AnyFunSuite {

  private lazy val spark: org.apache.spark.sql.SparkSession =
    org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()

  test("kill mid-batch -> restart from checkpoint -> exactly-once byte-identity") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions.col
    import graft.streaming.ExtractStream
    import graft.table.SnapshotTable
    import spark.implicits._

    val inDir = Files.createTempDirectory("skill_in").toString
    val tableDir = Files.createTempDirectory("skill_tbl").toString
    val ckDir = Files.createTempDirectory("skill_ck").toString

    // two input files -> two micro-batches under maxFilesPerTrigger=1
    val all = graft.spark.PageSource.pages(spark, 60L).collect().sortBy(_.url)
    val (h1, h2) = all.splitAt(30)
    spark.createDataset(h1.toSeq).coalesce(1).write.mode("append").parquet(inDir)
    spark.createDataset(h2.toSeq).coalesce(1).write.mode("append").parquet(inDir)

    def stream() = ExtractStream.extract(
      ExtractStream.pagesStream(spark, inDir, maxFilesPerTrigger = 1))

    // run 1: batch 0 commits; batch 1 is KILLED mid-flight after partial
    // uncommitted data lands in the table dir (the SnapshotSpec crash shape)
    val killed = new java.util.concurrent.atomic.AtomicBoolean(false)
    val q1 = stream().writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .option("checkpointLocation", ckDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[graft.core.ExtractedDoc], id: Long) =>
        if (id == 1L && killed.compareAndSet(false, true)) {
          b.toDF().write.mode("overwrite").parquet(s"$tableDir/data/run=batch1_killed")
          throw new RuntimeException("injected kill mid-batch")
        }
        ExtractStream.snapshotBatch(b, id, tableDir, buckets = 4)
      }
      .start()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    assert(ex.getMessage.contains("injected kill") ||
      String.valueOf(ex.getCause).contains("injected kill"))
    assert(killed.get, "the kill never fired — batch split did not happen")
    // after the kill: only batch 0 committed, torn batch-1 files on disk
    assert(SnapshotTable.read(spark, tableDir).get.count() == 30)
    assert(new java.io.File(s"$tableDir/data/run=batch1_killed").exists())

    // run 2: the PROD snapshot writer restarted on the same checkpoint
    val q2 = ExtractStream.snapshotWriter(stream(), tableDir, ckDir, buckets = 4).start()
    q2.awaitTermination()

    val table = SnapshotTable.read(spark, tableDir).get
    assert(table.count() == 60, "exactly-once row count after kill+restart")
    assert(table.select("url").distinct().count() == 60, "no duplicate urls")
    val streamed = table.select(col("url"), col("extracted_text"))
      .as[(String, String)].collect().toMap
    val batch = graft.spark.ExtractJob.extract(
      graft.spark.PageSource.pages(spark, 60L)).toDF()
      .select(col("url"), col("extracted_text")).as[(String, String)].collect().toMap
    batch.foreach { case (url, text) =>
      assert(streamed(url) == text, s"stream/batch divergence at $url after kill+restart")
    }

    // run 3: re-running the prod writer with no new input is a no-op
    val q3 = ExtractStream.snapshotWriter(stream(), tableDir, ckDir, buckets = 4).start()
    q3.awaitTermination()
    assert(SnapshotTable.read(spark, tableDir).get.count() == 60)
  }
}

/** Full 1-D anisotropic Kuwahara (VERDICT r3 item 7; kuwaharaFilter.cpp:
  * 34-125,174-234 via graft.classify.Kuwahara): coherence-shrunk
  * multi-scale radially-weighted sectors, min-variance pick. The
  * discriminating fixture: a bright/dim content edge with a 2-block bright
  * outlier (inline promo) INSIDE the dim run — the two-sector rule's right
  * sector absorbs the outlier at full weight, its variance loses to the
  * bright side, and the edge block takes the BRIGHT side's mean (threshold
  * above the dim level → content dropped: smoothing across the edge). The
  * sectored version's near-right sector radially down-weights the deep
  * outlier and wins with an almost-pure dim mean → the edge survives.
  */
class KuwaharaAnisoSpec extends AnyFunSuite {

  import graft.classify.Kuwahara

  private val aniso = Classifiers.Config(kind = "kuwahara")
  private val twoSector = Classifiers.Config(kind = "kuwahara2")

  // 9 bright, 10 dim, 2-block bright outlier, 10 dim
  private val sig: Array[Double] =
    (Array.fill(9)(255.0) ++ Array.fill(10)(135.0) ++
      Array.fill(2)(255.0) ++ Array.fill(10)(135.0))
  private val dimIdx = (9 until 19) ++ (21 until 31)

  test("two-sector smooths across the edge: first dim block thresholded above its level") {
    val t = Classifiers.thresholds(sig, twoSector)
    assert(t(9) > 135.0,
      s"expected the two-sector rule to drop the edge dim block, t(9)=${t(9)}")
  }

  test("anisotropic sectors preserve the edge the two-sector rule loses") {
    val ta = Classifiers.thresholds(sig, aniso)
    val t2 = Classifiers.thresholds(sig, twoSector)
    // the edge block itself: two-sector drops, aniso keeps
    assert(t2(9) > 135.0 && ta(9) < 135.0,
      s"edge block: two-sector t=${t2(9)}, aniso t=${ta(9)}")
    // deep dim blocks on both sides of the outlier survive under aniso
    (Seq(9, 10) ++ (25 until 31)).foreach { i =>
      assert(ta(i) < 135.0, s"aniso dropped dim block $i: t=${ta(i)}")
    }
    // and aniso keeps strictly more of the dim run than two-sector overall
    val keptA = dimIdx.count(i => ta(i) < 135.0)
    val kept2 = dimIdx.count(i => t2(i) < 135.0)
    assert(keptA > kept2, s"aniso kept $keptA dims, two-sector kept $kept2")
    // the bright run survives too (mean-c of any sector <= 255 - c)
    (0 until 9).foreach(i => assert(ta(i) < 255.0))
  }

  test("constant signal is a fixpoint of the filter (all sectors agree)") {
    val x = Array.fill(40)(200.0)
    assert(Kuwahara.filter(x, 31).forall(_ == 200.0))
    assert(Kuwahara.filter(Array.empty[Double], 31).isEmpty)
    assert(Kuwahara.filter(Array(7.0), 31).toSeq == Seq(7.0))
  }

  test("coherence shrinks the sampling support at a monotone edge") {
    // pure step: coherence A = 1 in the interior -> hEff = half/2; the
    // filtered level on each side must come from that side alone
    val x = Array.fill(16)(255.0) ++ Array.fill(16)(64.0)
    val f = Kuwahara.filter(x, 8)
    assert(f(15) == 255.0, s"last bright took ${f(15)}")
    assert(f(16) == 64.0, s"first dim took ${f(16)}")
  }

  test("filter output is always a convex combination of window values (bounds property)") {
    val rng = new scala.util.Random(7)
    (1 to 50).foreach { _ =>
      val n = 1 + rng.nextInt(60)
      val x = Array.fill(n)(rng.nextInt(256).toDouble)
      for (masked <- Seq(true, false); half <- Seq(2, 8, 31)) {
        val f = Kuwahara.filter(x, half, masked)
        val nonzero = x.filter(_ > 0)
        val (lo, hi) =
          if (masked && nonzero.nonEmpty) (0.0 min nonzero.min, nonzero.max)
          else if (x.isEmpty) (0.0, 0.0) else (x.min, x.max)
        f.indices.foreach { i =>
          assert(f(i) >= lo - 1e-9 && f(i) <= hi + 1e-9,
            s"out of bounds at $i: ${f(i)} not in [$lo, $hi] (masked=$masked half=$half)")
        }
      }
    }
    // degenerate shapes never throw
    assert(Kuwahara.filter(Array(0.0, 0.0, 0.0), 31, masked = true).length == 3)
  }
}

/** rotate wired into the pipeline (VERDICT r3 item 4; rotate.cpp:35-72 via
  * Rotate.tableRuns): on the colflow corpus — column-flow layout tables
  * emitted row-major by the DOM — extraction is WRONG on every page
  * without the 90° grid linearization and byte-identical to generator
  * ground truth with it (the q_extract_overwrap discrimination pattern).
  */
class RotatePipelineSpec extends AnyFunSuite {

  private val N = 60
  private val on = Extract.Config(rotate = 90, rotateCols = 3)

  test("colflow: rotate=90/cols=3 recovers ground truth on every page") {
    val bad = FixtureGen.colflow(N)
      .count(f => Extract(f.page, on).extracted_text != f.expected)
    assert(bad == 0, s"$bad/$N mismatched with rotate on")
  }

  test("colflow: WITHOUT rotate the row-major interleaving is wrong on every page") {
    val bad = FixtureGen.colflow(N)
      .count(f => Extract(f.page).extracted_text != f.expected)
    assert(bad == N, s"only $bad/$N mismatched without rotate — corpus too easy")
  }

  test("rotate touches ONLY table-cell runs; non-table pages are byte-identical under it") {
    val bad = FixtureGen.fixtures(40)
      .count(f => Extract(f.page, on).extracted_text != Extract(f.page).extracted_text)
    assert(bad == 0, s"$bad/40 standard (table-free) pages changed under rotate config")
  }

  test("ragged colflow grids keep every cell exactly once") {
    // ~1/3 of pages have a ragged last row; rotate must never drop or pad
    FixtureGen.colflow(N).foreach { f =>
      val got = Extract(f.page, on).extracted_text
      assert(got.split('\n').sorted.toSeq == f.expected.split('\n').sorted.toSeq,
        s"cell multiset mismatch for ${f.page.url}")
    }
  }

  test("tableRuns rotates each maximal cell run independently; th counts as a cell") {
    import graft.boundary.Rotate
    import graft.core.Block
    def cell(t: String, i: Int, leaf: String) =
      Block(s"html/body/table/tr/$leaf", t, 0, t.length, t.length, 1, 0, 0, 5, i)
    def para(t: String, i: Int) =
      Block("html/body/p", t, 0, t.length, t.length, 1, 0, 0, 3, i)
    // two separate 2x2 grids split by a paragraph: each rotates on its own
    val blocks = Array(
      cell("a0", 0, "th"), cell("b0", 1, "th"), cell("a1", 2, "td"), cell("b1", 3, "td"),
      para("mid", 4),
      cell("c0", 5, "td"), cell("d0", 6, "td"), cell("c1", 7, "td"), cell("d1", 8, "td"))
    val out = Rotate.tableRuns(blocks, 90, 2)
    assert(out.map(_.text).toSeq ==
      Seq("a0", "a1", "b0", "b1", "mid", "c0", "c1", "d0", "d1"),
      "each run transposed independently, th cells included")
    assert(out.map(_.idx).toSeq == (0 until 9), "idx rewritten to document order")
    // single-cell runs and non-cell blocks untouched; cols<=0 and angle=0 are no-ops
    assert(Rotate.tableRuns(blocks, 0, 2) eq blocks)
    assert(Rotate.tableRuns(blocks, 90, 0) eq blocks)
    val single = Array(para("x", 0), cell("only", 1, "td"), para("y", 2))
    assert(Rotate.tableRuns(single, 90, 3) eq single)
  }
}
